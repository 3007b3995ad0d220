package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Encoders}

/** Distributed WARC writer — the WET-generation half of the crawl
  * story. [[WarcDataSource]] reads a 100 TB archive in byte-range
  * slices; this writes the extracted-text DERIVATIVE back out as
  * gzip-member `WARC conversion` records (ISO 28500 §6.8 — the shape
  * Common Crawl publishes as WET), one `.warc.gz` segment per input
  * partition, written BY THE TASK that owns the partition (no driver
  * collect, no payload shuffle beyond the caller's own partitioning).
  *
  * Commit discipline: each task writes to a `_tmp` staging name
  * carrying its task attempt id, then renames to the final
  * `seg-{partition}.warc.gz` only if absent — first attempt wins.
  * Rows are sorted within the partition on (url, body) — a TOTAL
  * order even when refetch corpora repeat a URL — before
  * serialization, so a retried/speculative attempt of the same
  * partition produces byte-identical content (gzipMember is
  * deterministic, the input partition is the same set, and the sort
  * pins record order and the `urn:graft:conv` ordinals) and the
  * loser just deletes its stage. Stale `_tmp-seg-*` orphans from
  * attempts that died mid-write are swept on entry (they are already
  * excluded from reads by the `.warc.gz` suffix filter). Callers own
  * directory-level overwrite (delete first), the
  * [[graft.streaming.AtomicSwap]] precedent.
  */
object WarcSink {

  /** Write `(urlCol, textCol)` rows as conversion segments under
    * `dir` (the WET shape); every member carries the payload digest so
    * downstream dedup never re-hashes. Returns the records written. */
  def writeConversionSegments(df: DataFrame, urlCol: String,
      textCol: String, dir: String,
      date: String = "2024-01-01T00:00:00Z"): Long =
    writeSegments(df, urlCol, textCol, dir, date,
      "conversion", "text/plain", "conv")

  /** Write conversion records under a SEGMENT-SIZE ceiling (ISO
    * 28500 §5.18–5.20 record segmentation): a payload larger than
    * `maxSegmentBytes` ships as a first `conversion` member
    * (`WARC-Segment-Number: 1`, carrying the digest of the FULL
    * logical payload) plus `continuation` members chained by
    * `WARC-Segment-Origin-ID`, the last one declaring
    * `WARC-Segment-Total-Length`; smaller payloads write exactly as
    * [[writeConversionSegments]] does. [[WarcSegments.reassemble]]
    * is the read-side inverse. Same task-side commit discipline —
    * the slice loop is deterministic, so retried attempts stay
    * byte-identical. Returns LOGICAL records written (members may be
    * more). */
  def writeSegmentedConversions(df: DataFrame, urlCol: String,
      textCol: String, dir: String, maxSegmentBytes: Int,
      date: String = "2024-01-01T00:00:00Z"): Long =
    writeSegments(df, urlCol, textCol, dir, date,
      "conversion", "text/plain", "conv", Some(maxSegmentBytes))

  /** Write `(urlCol, jsonCol)` rows as `metadata` records (ISO 28500
    * §6.9) — the WAT shape: one JSON envelope per archived page (HTTP
    * headers, outlinks, ...), completing the WARC/WAT/WET derivative
    * triplet the public crawls publish. Same task-side segment
    * commit discipline as the WET writer. */
  def writeMetadataSegments(df: DataFrame, urlCol: String,
      jsonCol: String, dir: String,
      date: String = "2024-01-01T00:00:00Z"): Long =
    writeSegments(df, urlCol, jsonCol, dir, date,
      "metadata", "application/json", "meta")

  /** Write a RECRAWL's captures (ISO 28500 §6.7.2 — how real crawls
    * keep archives small): rows whose `revisitDigestCol` is non-null
    * already have their payload bytes stored under that digest in a
    * prior crawl, so they write `revisit` members (digest header,
    * EMPTY block — `crawl_revisit_backfill` resolves them back to the
    * stored bytes); the rest write full `response` members (HTTP 200
    * wrapper, payload digest computed). Same task-side segment commit
    * discipline as the WET/WAT writers; rows sort on (url, text) so
    * retried attempts stay byte-identical. Archive bytes written thus
    * shrink to CHANGED-pages-only — the recrawl sibling of digest
    * dedup. `segPrefix` namespaces segment files so SEQUENTIAL calls
    * (a micro-batched live recrawl writing per trigger) share one
    * archive directory without colliding on partition ids. Returns
    * records written. */
  def writeRecrawlSegments(df: DataFrame, urlCol: String,
      textCol: String, revisitDigestCol: String, dir: String,
      date: String = "2024-02-01T00:00:00Z",
      segPrefix: String = "seg"): Long = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    sweepStaging(df, dir)
    val counts = df.select(col(urlCol).cast("string"),
        col(textCol).cast("string"),
        col(revisitDigestCol).cast("string"))
      .filter(col(urlCol).isNotNull && col(textCol).isNotNull)
      .sortWithinPartitions(col(urlCol), col(textCol))
      .mapPartitions { rows =>
        if (!rows.hasNext) Iterator.empty
        else {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val attempt = tc.taskAttemptId()
          val fs = new Path(dir).getFileSystem(conf.value)
          val stage = new Path(dir, f"_tmp-$segPrefix-$pid%05d-$attempt")
          val out = fs.create(stage, true)
          var n = 0L
          out.write(Warc.gzipMember(Warc.record("warcinfo", null, date,
            f"urn:graft:recrawl:info:$segPrefix:$pid%05d",
            "application/warc-fields",
            ("software: graft WarcSink\r\nformat: WARC/1.0\r\n" +
              "content-kind: recrawl\r\n").getBytes("UTF-8"))))
          try rows.foreach { r =>
            val url = r.getString(0)
            if (!r.isNullAt(2)) {
              // bytes already archived: digest only, no payload
              out.write(Warc.gzipMember(Warc.record("revisit",
                url, date, s"urn:graft:recrawl:$segPrefix:$pid:$n",
                "message/http",
                Array.emptyByteArray, Some(r.getString(2)))))
            } else {
              val payload = r.getString(1).getBytes("UTF-8")
              out.write(Warc.gzipMember(Warc.record("response",
                url, date, s"urn:graft:recrawl:$segPrefix:$pid:$n",
                "application/http; msgtype=response",
                Warc.httpResponse(200, "OK", "text/html; charset=utf-8",
                  payload), Some(Warc.payloadDigest(payload)))))
            }
            n += 1
          } finally out.close()
          val dst = new Path(dir, f"$segPrefix-$pid%05d.warc.gz")
          if (!fs.rename(stage, dst)) fs.delete(stage, true)
          Iterator.single(n)
        }
      }(Encoders.scalaLong)
    counts.agg(coalesce(sum("value"), lit(0L))).head().getLong(0)
  }

  /** Sweep stale `_tmp-*` staging orphans from prior attempts that
    * died mid-write (never visible to readers — the `.warc.gz`
    * suffix filter excludes them — but never self-cleaning). Writer
    * calls are sequential per directory, so nothing in-flight can be
    * swept. */
  private def sweepStaging(df: DataFrame, dir: String): Unit = {
    val dirPath = new Path(dir)
    val dirFs = dirPath.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    if (dirFs.exists(dirPath))
      dirFs.listStatus(dirPath)
        .filter(_.getPath.getName.startsWith("_tmp-"))
        .foreach(s => dirFs.delete(s.getPath, false))
  }

  private def writeSegments(df: DataFrame, urlCol: String,
      textCol: String, dir: String, date: String,
      warcType: String, blockContentType: String, idTag: String,
      maxSegmentBytes: Option[Int] = None): Long = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    sweepStaging(df, dir)
    val counts = df.select(col(urlCol).cast("string"),
        col(textCol).cast("string"))
      .filter(col(urlCol).isNotNull && col(textCol).isNotNull)
      // pin within-partition order: hash-repartition iteration order is
      // not otherwise deterministic across attempts, and the record
      // order + per-record ordinal must be for byte-identical segments;
      // the body column breaks duplicate-URL ties (refetch corpora)
      .sortWithinPartitions(col(urlCol), col(textCol))
      .mapPartitions { rows =>
        if (!rows.hasNext) Iterator.empty
        else {
          val tc = org.apache.spark.TaskContext.get()
          val pid = tc.partitionId()
          val attempt = tc.taskAttemptId()
          val fs = new Path(dir).getFileSystem(conf.value)
          val stage = new Path(dir, f"_tmp-seg-$pid%05d-$attempt")
          val out = fs.create(stage, true)
          var n = 0L
          // each segment leads with a warcinfo member (ISO 28500 §6.1,
          // the Common Crawl derivative convention) naming the writer;
          // readers filtering on their record type skip it for free
          out.write(Warc.gzipMember(Warc.record("warcinfo", null, date,
            f"urn:graft:$idTag:info:$pid%05d", "application/warc-fields",
            (s"software: graft WarcSink\r\nformat: WARC/1.0\r\n" +
              s"content-kind: $warcType\r\n").getBytes("UTF-8"))))
          val maxSeg = maxSegmentBytes.getOrElse(Int.MaxValue)
          try rows.foreach { r =>
            val url = r.getString(0)
            val text = r.getString(1).getBytes("UTF-8")
            val originId = s"urn:graft:$idTag:$pid:$n"
            if (text.length <= maxSeg) {
              out.write(Warc.gzipMember(Warc.record(warcType,
                url, date, originId,
                blockContentType, text, Some(Warc.payloadDigest(text)))))
            } else {
              // ISO 28500 §5.18-5.20: first segment keeps the record
              // type and the digest of the FULL logical payload;
              // continuations chain by origin id; the last declares
              // the total logical length
              val nSegs = (text.length + maxSeg - 1) / maxSeg
              var k = 0
              while (k < nSegs) {
                val from = k * maxSeg
                val until = math.min(from + maxSeg, text.length)
                val slice =
                  java.util.Arrays.copyOfRange(text, from, until)
                if (k == 0)
                  out.write(Warc.gzipMember(Warc.record(warcType,
                    url, date, originId, blockContentType, slice,
                    Some(Warc.payloadDigest(text)),
                    extraWarcHeaders =
                      Seq("WARC-Segment-Number" -> "1"))))
                else
                  out.write(Warc.gzipMember(Warc.record("continuation",
                    url, date, s"$originId:$k",
                    "application/octet-stream", slice,
                    extraWarcHeaders =
                      Seq("WARC-Segment-Number" -> (k + 1).toString,
                        "WARC-Segment-Origin-ID" -> s"<$originId>") ++
                      (if (k == nSegs - 1)
                        Seq("WARC-Segment-Total-Length" ->
                          text.length.toString)
                      else Nil))))
                k += 1
              }
            }
            n += 1
          } finally out.close()
          val dst = new Path(dir, f"seg-$pid%05d.warc.gz")
          // first attempt wins; identical bytes either way
          if (!fs.rename(stage, dst)) fs.delete(stage, true)
          Iterator.single(n)
        }
      }(Encoders.scalaLong)
    counts.agg(coalesce(sum("value"), lit(0L))).head().getLong(0)
  }
}
