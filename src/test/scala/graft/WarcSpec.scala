package graft

import java.io.{ByteArrayInputStream, FileOutputStream}
import java.nio.file.Files

import graft.sources.Warc
import org.apache.spark.sql.functions._

/** gzip-member WARC source: member IO round trip, record parse, and —
  * the scale contract — byte-range splitting with boundary sync
  * (every record exactly once regardless of splitSize). */
class WarcSpec extends SparkSpec {

  private def page(i: Int): String =
    s"<html><head><title>Doc $i</title></head><body><p>Body $i</p></body></html>"

  /** n response members (+ a leading warcinfo) into one .warc.gz. */
  private def writeFixture(n: Int): String = {
    val dir = Files.createTempDirectory("warc").toString
    val f = s"$dir/test.warc.gz"
    val out = new FileOutputStream(f)
    try {
      out.write(Warc.gzipMember(Warc.record("warcinfo", null,
        "2024-01-01T00:00:00Z", "urn:uuid:info-0",
        "application/warc-fields",
        "software: graft-fixture\r\n".getBytes("UTF-8"))))
      (0 until n).foreach { i =>
        val payload = page(i).getBytes("UTF-8")
        val block = Warc.httpResponse(
          if (i % 7 == 3) 404 else 200,
          if (i % 7 == 3) "Not Found" else "OK",
          "text/html; charset=utf-8", payload)
        out.write(Warc.gzipMember(Warc.record("response",
          s"https://dom${i % 5}.com/p/$i", "2024-01-01T00:00:00Z",
          s"urn:uuid:rec-$i", "application/http; msgtype=response",
          block)))
      }
    } finally out.close()
    f
  }

  test("CDX build: the index scan never reads payload bytes, the " +
    "persisted index answers a SURT range probe with a pushed filter, " +
    "and its (file, offset) coordinates seek to the exact member") {
    import graft.operators.UrlOps
    spark.sharedState.cacheManager.clearCache()
    val f = writeFixture(30)
    val idxDf = spark.read.format("graft_warc").load(f)
      .filter(col("warc_type") === "response")
      .select(UrlOps.surt(col("url")).as("surt_key"),
        col("warc_date").as("ts"), col("url"), col("file"),
        col("member_offset"), col("member_length"))
    // column pruning reaches the member parse: payload is absent from
    // the WARC scan's output
    val plan = idxDf.queryExecution.executedPlan.toString
    assert(!plan.contains("payload"),
      "the CDX index scan must prune payload bytes")
    val root = Files.createTempDirectory("warc_cdx").toString
    idxDf.repartitionByRange(2, col("surt_key"))
      .sortWithinPartitions("surt_key").write.mode("overwrite")
      .parquet(root)
    // the range probe pushes the key predicate into the parquet scan
    val probe = spark.read.parquet(root)
      .filter(col("surt_key") >= "com,dom1)" &&
        col("surt_key") < "com,dom1*")
    val pplan = probe.queryExecution.executedPlan.toString
    assert(pplan.contains("PushedFilters") &&
      pplan.contains("GreaterThanOrEqual(surt_key"),
      "SURT range probe must push into the index scan")
    val hits = probe.select("url", "file", "member_offset").collect()
    assert(hits.nonEmpty && hits.forall(
      _.getString(0).startsWith("https://dom1.com/")))
    // coordinates are real: each seek read inflates the named member
    val fs = new org.apache.hadoop.fs.Path(f)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    hits.foreach { h =>
      val rec = Warc.readMemberAt(fs, h.getString(1), h.getLong(2))
      assert(rec.url === h.getString(0))
    }
  }

  test("readMember inflates exactly one member and reports its " +
    "compressed length (concatenated members walk by offset)") {
    val a = Warc.gzipMember("WARC/1.0\r\nA: 1\r\n\r\n".getBytes("UTF-8"))
    val b = Warc.gzipMember("WARC/1.0\r\nB: 2\r\n\r\n".getBytes("UTF-8"))
    val both = a ++ b
    val (bytesA, lenA) = Warc.readMember(new ByteArrayInputStream(both))
    assert(new String(bytesA, "UTF-8").contains("A: 1"))
    assert(lenA === a.length.toLong)
    val (bytesB, lenB) = Warc.readMember(
      new ByteArrayInputStream(both.drop(lenA.toInt)))
    assert(new String(bytesB, "UTF-8").contains("B: 2"))
    assert(lenB === b.length.toLong)
  }

  test("parseRecord: response record yields status, content-type and " +
    "the exact HTTP payload; warcinfo yields NULL status") {
    val payload = page(7).getBytes("UTF-8")
    val rec = Warc.parseRecord(Warc.record("response",
      "https://x.com/7", "2024-01-01T00:00:00Z", "urn:uuid:7",
      "application/http; msgtype=response",
      Warc.httpResponse(200, "OK", "text/html", payload)), 0L, 1L)
    assert(rec.url === "https://x.com/7")
    assert(rec.status === Some(200))
    assert(rec.httpContentType === Some("text/html"))
    assert(new String(rec.payload, "UTF-8") === page(7))
    val info = Warc.parseRecord(Warc.record("warcinfo", null,
      "2024-01-01T00:00:00Z", "urn:uuid:i", "application/warc-fields",
      "k: v\r\n".getBytes("UTF-8")), 0L, 1L)
    assert(info.status === None)
    assert(info.url === null)
    assert(info.warcType === "warcinfo")
  }

  test("split reads: every record exactly once at ANY splitSize, " +
    "offsets strictly increasing, payloads byte-exact") {
    val f = writeFixture(40)
    val whole = spark.read.format("graft_warc").load(f)
      .select("record_id", "url", "status", "payload",
        "member_offset", "member_length")
      .collect().sortBy(_.getLong(4))
    assert(whole.length === 41) // warcinfo + 40 responses
    // offsets tile the file exactly: each starts where the previous ended
    whole.sliding(2).foreach { case Array(p, q) =>
      assert(p.getLong(4) + p.getLong(5) === q.getLong(4))
    }
    val fileLen = new java.io.File(f).length()
    assert(whole.last.getLong(4) + whole.last.getLong(5) === fileLen)
    // tiny splits force many partitions and mid-member sync scans
    Seq(64L, 257L, 1021L).foreach { split =>
      val got = spark.read.format("graft_warc")
        .option("splitSize", split).load(f)
        .select("record_id").as[String](org.apache.spark.sql.Encoders.STRING)
        .collect()
      assert(got.length === 41, s"splitSize=$split")
      assert(got.toSet.size === 41, s"splitSize=$split duplicated records")
    }
    // payload round trip through the split path
    val got = spark.read.format("graft_warc").option("splitSize", 257)
      .load(f).filter(col("warc_type") === "response")
      .select(col("url"), decode(col("payload"), "UTF-8").as("html"))
      .collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    (0 until 40).foreach { i =>
      assert(got(s"https://dom${i % 5}.com/p/$i") === page(i))
    }
  }

  test("split planning contract: partition count is exactly " +
    "ceil(len / splitSize) — a 1 GiB archive at the 32 MiB default " +
    "becomes ~32 independent slices, no planner surprises") {
    val f = writeFixture(30)
    val len = new java.io.File(f).length()
    Seq(256L, 1024L, 1L << 20).foreach { sp =>
      val n = spark.read.format("graft_warc").option("splitSize", sp)
        .load(f).rdd.getNumPartitions
      assert(n === ((len + sp - 1) / sp).toInt, s"splitSize=$sp len=$len")
    }
  }

  test("column pruning reaches the scan (payload not materialized " +
    "for a governance projection)") {
    val f = writeFixture(5)
    val plan = spark.read.format("graft_warc").load(f)
      .select("url", "status").queryExecution.executedPlan.toString
    assert(plan.contains("url"), plan)
    assert(!plan.contains("payload"), plan)
  }

  test("a corrupt member mid-file is skipped with a re-sync — the " +
    "records after it still arrive (no silent range truncation)") {
    val f = writeFixture(20)
    val offsets = spark.read.format("graft_warc").load(f)
      .select("member_offset", "member_length", "record_id")
      .collect().sortBy(_.getLong(0))
    val victim = offsets(10) // a middle member
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(f))
    // trash the victim's deflate payload (past its gzip header)
    val from = victim.getLong(0).toInt + 12
    val until = (victim.getLong(0) + victim.getLong(1)).toInt - 9
    (from until until).foreach(i => bytes(i) = 0x55)
    val dir = Files.createTempDirectory("warc_bad").toString
    val bad = s"$dir/bad.warc.gz"
    Files.write(java.nio.file.Paths.get(bad), bytes)
    val got = spark.read.format("graft_warc").load(bad)
      .select("record_id")
      .as[String](org.apache.spark.sql.Encoders.STRING).collect().toSet
    val want = offsets.map(_.getString(2)).toSet - victim.getString(2)
    assert(got === want,
      s"missing after corrupt member: ${want -- got}; extra: ${got -- want}")
  }

  test("streaming drain: archives land as files, maxFilesPerTrigger " +
    "paces the batches, a restart picks up only the late arrival — " +
    "even one named below every processed archive") {
    val dir = Files.createTempDirectory("warc_stream").toString
    val data = s"$dir/in"; val ckpt = s"$dir/ckpt"; val out = s"$dir/out"
    new java.io.File(data).mkdirs()
    def writeArchive(name: String, ids: Range): Unit = {
      val f = new FileOutputStream(s"$data/$name")
      try ids.foreach { i =>
        f.write(Warc.gzipMember(Warc.record("response",
          s"https://dom${i % 5}.com/p/$i", "2024-01-01T00:00:00Z",
          s"urn:uuid:rec-$i", "application/http; msgtype=response",
          Warc.httpResponse(200, "OK", "text/html; charset=utf-8",
            page(i).getBytes("UTF-8")))))
      } finally f.close()
    }
    writeArchive("seg-001.warc.gz", 0 until 10)
    writeArchive("seg-002.warc.gz", 10 until 25)
    def drain(): Unit = {
      val q = spark.readStream.format("graft_warc")
        .option("splitSize", 1024).option("maxFilesPerTrigger", 1)
        .load(data)
        .select("record_id", "url")
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out).start()
      q.awaitTermination()
    }
    drain()
    val first = spark.read.parquet(out)
      .select("record_id").collect().map(_.getString(0))
    assert(first.length === 25 && first.toSet.size === 25)
    // a late segment lands; the restarted drain reads ONLY it
    writeArchive("seg-003.warc.gz", 25 until 31)
    drain()
    val all = spark.read.parquet(out)
      .select("record_id").collect().map(_.getString(0))
    assert(all.length === 31, s"expected 31 once-each, got ${all.length}")
    assert(all.toSet.size === 31)
    // an archive named BELOW every processed name lands while the
    // stream is DOWN (out-of-order fetcher / clock-skewed timestamp):
    // the processed-name log admits it on restart — it DRAINS, it is
    // not watermark-skipped
    writeArchive("seg-000.warc.gz", 31 until 36)
    drain()
    val withLate = spark.read.parquet(out)
      .select("record_id").collect().map(_.getString(0))
    assert(withLate.length === 36,
      s"below-watermark archive must drain, got ${withLate.length}")
    assert(withLate.toSet.size === 36)
    // and one more restart re-reads nothing
    drain()
    assert(spark.read.parquet(out).count() === 36)
  }

  test("processed-name log compacts every N batches: a restart " +
    "rebuilds the set from the newest snapshot alone (compacted " +
    "per-batch files can vanish), and a missing batch file in a " +
    "replay range fails loudly instead of dropping archives") {
    val dir = Files.createTempDirectory("warc_compact").toString
    val data = s"$dir/in"; val ckpt = s"$dir/ckpt"; val out = s"$dir/out"
    new java.io.File(data).mkdirs()
    def writeArchive(name: String, ids: Range): Unit = {
      val f = new FileOutputStream(s"$data/$name")
      try ids.foreach { i =>
        f.write(Warc.gzipMember(Warc.record("response",
          s"https://dom${i % 5}.com/p/$i", "2024-01-01T00:00:00Z",
          s"urn:uuid:rec-$i", "application/http; msgtype=response",
          Warc.httpResponse(200, "OK", "text/html; charset=utf-8",
            page(i).getBytes("UTF-8")))))
      } finally f.close()
    }
    // seven archives, one per micro-batch (ids 0..6); interval 3
    // snapshots the processed set at batch ids 2 and 5
    (0 until 7).foreach(k =>
      writeArchive(f"seg-$k%03d.warc.gz", k * 2 until k * 2 + 2))
    def drain(): Unit = {
      val q = spark.readStream.format("graft_warc")
        .option("splitSize", 1024).option("maxFilesPerTrigger", 1)
        .option("nameLogCompactInterval", 3)
        .load(data)
        .select("record_id", "url")
        .writeStream
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", out).start()
      q.awaitTermination()
    }
    drain()
    assert(spark.read.parquet(out).count() === 14)
    // the snapshot files exist under the source's name log
    val logDirs = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
      .filter(p => p.getFileName.toString == "graft_warc_names")
      .toArray.map(_.toString)
    assert(logDirs.length === 1, s"name log dirs: ${logDirs.toSeq}")
    val logDir = new java.io.File(logDirs.head)
    val compacts = logDir.listFiles()
      .filter(_.getName.endsWith(".compact"))
      .map(_.getName.stripSuffix(".compact").toLong).sorted
    assert(compacts.toSeq === Seq(2L, 5L),
      s"expected snapshots at batches 2 and 5, got ${compacts.toSeq}")
    // delete every per-batch file at-or-below the newest snapshot:
    // the restart must rebuild the processed set from the snapshot
    // plus only the tail (batch 6) — O(1) log files read
    logDir.listFiles().filter(f => !f.getName.endsWith(".compact") &&
      f.getName.forall(_.isDigit) && f.getName.toLong <= 5L)
      .foreach(f => assert(f.delete()))
    writeArchive("seg-007.warc.gz", 100 until 105)
    drain()
    val all = spark.read.parquet(out)
      .select("record_id").collect().map(_.getString(0))
    assert(all.length === 19, s"restart must drain ONLY the new " +
      s"archive on top of the snapshot, got ${all.length}")
    assert(all.toSet.size === 19)
    // loud failure: replaying a WAL'd batch whose name-log file is
    // gone must throw, never silently treat it as an empty batch
    val mb = new graft.sources.WarcMicroBatch(data, 1024, Warc.schema, 0,
      s"$dir/ckpt2", 10)
    val e = intercept[IllegalStateException] {
      mb.planInputPartitions(mb.deserializeOffset("-1"),
        mb.deserializeOffset("0"))
    }
    assert(e.getMessage.contains("no log file"))
  }

  test("WARC-Payload-Digest: sha1:BASE32 round-trips through write/" +
    "parse; identical payloads share a digest; absent header is NULL") {
    val payload = page(3).getBytes("UTF-8")
    val dig = Warc.payloadDigest(payload)
    assert(dig.matches("sha1:[A-Z2-7]{32}"), dig)
    assert(dig === Warc.payloadDigest(page(3).getBytes("UTF-8")))
    assert(dig !== Warc.payloadDigest(page(4).getBytes("UTF-8")))
    val rec = Warc.parseRecord(Warc.record("response",
      "https://x.com/3", "2024-01-01T00:00:00Z", "urn:uuid:3",
      "application/http; msgtype=response",
      Warc.httpResponse(200, "OK", "text/html", payload),
      Some(dig)), 0L, 1L)
    assert(rec.payloadDigest === Some(dig))
    val bare = Warc.parseRecord(Warc.record("response",
      "https://x.com/3", "2024-01-01T00:00:00Z", "urn:uuid:3b",
      "application/http; msgtype=response",
      Warc.httpResponse(200, "OK", "text/html", payload)), 0L, 1L)
    assert(bare.payloadDigest === None)
    // and through the source: the digest column arrives verbatim
    val dir = Files.createTempDirectory("warc_dig").toString
    val f = s"$dir/d.warc.gz"
    val out = new FileOutputStream(f)
    try {
      out.write(Warc.gzipMember(Warc.record("response",
        "https://x.com/a", "2024-01-01T00:00:00Z", "urn:uuid:a",
        "application/http; msgtype=response",
        Warc.httpResponse(200, "OK", "text/html", payload), Some(dig))))
      out.write(Warc.gzipMember(Warc.record("response",
        "https://x.com/b", "2024-01-01T00:00:00Z", "urn:uuid:b",
        "application/http; msgtype=response",
        Warc.httpResponse(200, "OK", "text/html", payload))))
    } finally out.close()
    val got = spark.read.format("graft_warc").load(f)
      .select("url", "payload_digest").collect()
      .map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(got === Map("https://x.com/a" -> Some(dig),
      "https://x.com/b" -> None))
  }

  test("trailer verification: a member that inflates but fails its " +
    "CRC32 (or ISIZE) is rejected, and the range reader re-syncs " +
    "past it instead of shipping damaged bytes") {
    val good = Warc.gzipMember("WARC/1.0\r\nA: 1\r\n\r\n".getBytes("UTF-8"))
    // flip a bit in the stored CRC (first trailer byte): deflate still
    // inflates cleanly, only the checksum lies
    val bad = good.clone()
    bad(bad.length - 8) = (bad(bad.length - 8) ^ 0x01).toByte
    val e = intercept[java.io.EOFException] {
      Warc.readMember(new ByteArrayInputStream(bad))
    }
    assert(e.getMessage.contains("CRC"), e.getMessage)
    // ISIZE corruption is caught the same way
    val badIsize = good.clone()
    badIsize(badIsize.length - 1) =
      (badIsize(badIsize.length - 1) ^ 0x01).toByte
    intercept[java.io.EOFException] {
      Warc.readMember(new ByteArrayInputStream(badIsize))
    }
    // end-to-end: the crc-corrupt member drops, neighbors survive
    val f = writeFixture(10)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(f))
    val offs = spark.read.format("graft_warc").load(f)
      .select("member_offset", "member_length", "record_id")
      .collect().sortBy(_.getLong(0))
    val victim = offs(5)
    val crcPos = (victim.getLong(0) + victim.getLong(1)).toInt - 8
    bytes(crcPos) = (bytes(crcPos) ^ 0x01).toByte
    val dir = Files.createTempDirectory("warc_crc").toString
    val fbad = s"$dir/crc.warc.gz"
    Files.write(java.nio.file.Paths.get(fbad), bytes)
    val got = spark.read.format("graft_warc").load(fbad)
      .select("record_id")
      .as[String](org.apache.spark.sql.Encoders.STRING).collect().toSet
    assert(got === offs.map(_.getString(2)).toSet - victim.getString(2))
  }

  test("chunked transfer-encoding is de-framed (extensions and " +
    "trailers dropped); WARC-Truncated rides as a governance column") {
    val chunked = ("7;ext=1\r\nchunk1 \r\n6\r\nchunk2\r\n0\r\n" +
      "X-Trailer: t\r\n\r\n").getBytes("UTF-8")
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
      "Transfer-Encoding: chunked\r\n" +
      s"Content-Length: ${chunked.length}\r\n\r\n").getBytes("UTF-8") ++
      chunked
    val rec = Warc.parseRecord(Warc.record("response", "https://x.com/c",
      "2024-01-01T00:00:00Z", "urn:uuid:c",
      "application/http; msgtype=response", http), 0L, 1L)
    assert(new String(rec.payload, "UTF-8") === "chunk1 chunk2")
    assert(rec.truncated === None)
    val cut = Warc.parseRecord(Warc.record("response", "https://x.com/t",
      "2024-01-01T00:00:00Z", "urn:uuid:t",
      "application/http; msgtype=response",
      Warc.httpResponse(200, "OK", "text/html",
        "partial".getBytes("UTF-8")),
      None, Some("length")), 0L, 1L)
    assert(cut.truncated === Some("length"))
  }

  test("bare-LF chunk framing (lenient servers / partial captures) " +
    "de-frames instead of leaving size lines in the payload") {
    val chunked = "7\nchunk1 \n6\nchunk2\n0\n\n".getBytes("UTF-8")
    val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n" +
      "Transfer-Encoding: chunked\r\n" +
      s"Content-Length: ${chunked.length}\r\n\r\n").getBytes("UTF-8") ++
      chunked
    val rec = Warc.parseRecord(Warc.record("response", "https://x.com/l",
      "2024-01-01T00:00:00Z", "urn:uuid:l",
      "application/http; msgtype=response", http), 0L, 1L)
    assert(new String(rec.payload, "UTF-8") === "chunk1 chunk2")
    // mixed framing: CRLF size line, LF data terminator
    val mixed = "7\r\nchunk1 \n6\nchunk2\r\n0\r\n\r\n".getBytes("UTF-8")
    val http2 = ("HTTP/1.1 200 OK\r\n" +
      "Transfer-Encoding: chunked\r\n" +
      s"Content-Length: ${mixed.length}\r\n\r\n").getBytes("UTF-8") ++
      mixed
    val rec2 = Warc.parseRecord(Warc.record("response", "https://x.com/m",
      "2024-01-01T00:00:00Z", "urn:uuid:m",
      "application/http; msgtype=response", http2), 0L, 1L)
    assert(new String(rec2.payload, "UTF-8") === "chunk1 chunk2")
    // truly malformed frames still fall back to raw bytes
    val bad = "zz\r\nnot-a-chunk".getBytes("UTF-8")
    val http3 = ("HTTP/1.1 200 OK\r\n" +
      "Transfer-Encoding: chunked\r\n" +
      s"Content-Length: ${bad.length}\r\n\r\n").getBytes("UTF-8") ++ bad
    val rec3 = Warc.parseRecord(Warc.record("response", "https://x.com/b",
      "2024-01-01T00:00:00Z", "urn:uuid:b",
      "application/http; msgtype=response", http3), 0L, 1L)
    assert(new String(rec3.payload, "UTF-8") === "zz\r\nnot-a-chunk")
  }

  test("Location header survives the parse: 301 records yield the " +
    "redirect target; records without one yield None") {
    val rec = Warc.parseRecord(Warc.record("response",
      "https://x.com/old", "2024-01-01T00:00:00Z", "urn:uuid:r",
      "application/http; msgtype=response",
      Warc.httpResponse(301, "Moved Permanently", "text/html",
        Array.emptyByteArray,
        Seq("Location" -> "https://x.com/new"))), 0L, 1L)
    assert(rec.status === Some(301))
    assert(rec.httpLocation === Some("https://x.com/new"))
    val ok = Warc.parseRecord(Warc.record("response",
      "https://x.com/p", "2024-01-01T00:00:00Z", "urn:uuid:p",
      "application/http; msgtype=response",
      Warc.httpResponse(200, "OK", "text/html",
        page(1).getBytes("UTF-8"))), 0L, 1L)
    assert(ok.httpLocation === None)
  }

  test("WarcSink round trip: per-partition conversion segments, task-" +
    "side writes, re-run without cleanup never duplicates records") {
    import graft.sources.WarcSink
    val dir = Files.createTempDirectory("warc_sink").toString + "/wet"
    val df = spark.range(0, 37)
      .selectExpr("'https://d.com/p/' || id AS url",
        "'text ' || id AS body")
      .repartition(5)
    val n = WarcSink.writeConversionSegments(df, "url", "body", dir)
    assert(n === 37)
    val all = spark.read.format("graft_warc").load(dir)
      .select("url", "warc_type", "payload", "payload_digest").collect()
    // each segment leads with one warcinfo member (ISO 28500 §6.1)
    val segFiles = new java.io.File(dir).listFiles
      .count(_.getName.endsWith(".warc.gz"))
    assert(all.count(_.getString(1) === "warcinfo") === segFiles)
    val back = all.filter(_.getString(1) === "conversion")
    assert(back.length === 37)
    val got = back.map(r => (r.getString(0),
      new String(r.getAs[Array[Byte]](2), "UTF-8"))).toMap
    (0 until 37).foreach { i =>
      assert(got(s"https://d.com/p/$i") === s"text $i")
    }
    assert(back.forall(_.getString(3) != null)) // digests ride along
    // a retried/speculative re-write finds its segment already
    // committed: first attempt wins, nothing duplicates
    val n2 = WarcSink.writeConversionSegments(df, "url", "body", dir)
    assert(n2 === 37)
    assert(spark.read.format("graft_warc").load(dir)
      .filter(col("warc_type") === "conversion").count() === 37)
  }

  test("HTTP parse gates on the record Content-Type, not block bytes: " +
    "a conversion payload that STARTS with 'HTTP/' keeps its bytes — " +
    "no phantom header strip") {
    import graft.sources.WarcSink
    val dir = Files.createTempDirectory("warc_httpish").toString + "/wet"
    // a captured transcript of an HTTP exchange stored as extracted
    // text — block bytes look exactly like an HTTP message, but the
    // record Content-Type is text/plain, so no HTTP parse may fire
    val body = "HTTP/1.1 200 OK\r\nX-Quoted: yes\r\n\r\ntranscript tail"
    val df = spark.createDataFrame(Seq(
      ("https://d.com/transcript", body)
    )).toDF("url", "body")
    WarcSink.writeConversionSegments(df, "url", "body", dir)
    val r = spark.read.format("graft_warc").load(dir)
      .filter(col("warc_type") === "conversion").collect()
    assert(r.length === 1)
    assert(new String(r.head.getAs[Array[Byte]]("payload"), "UTF-8")
      === body, "block bytes must survive verbatim")
    assert(r.head.getAs[Any]("status") == null,
      "no phantom HTTP status from a text/plain block")
  }

  test("WarcSink recrawl segments: digest-matched rows write revisit " +
    "members (digest header, ZERO payload bytes), the rest full " +
    "responses; re-run never duplicates") {
    import graft.sources.WarcSink
    val dir = Files.createTempDirectory("warc_sink_rev").toString + "/re"
    // even ids digest-matched the prior crawl → revisit; odd → changed
    val df = spark.range(0, 20)
      .selectExpr("'https://d.com/p/' || id AS url",
        "'<html>page ' || id || '</html>' AS body",
        "CASE WHEN id % 2 = 0 THEN 'sha1:FAKE' || id END AS rev")
      .repartition(3)
    val n = WarcSink.writeRecrawlSegments(df, "url", "body", "rev", dir)
    assert(n === 20)
    val back = spark.read.format("graft_warc").load(dir)
      .filter(col("warc_type").isin("response", "revisit"))
      .select("url", "warc_type", "payload", "payload_digest").collect()
    assert(back.length === 20)
    val rev = back.filter(_.getString(1) === "revisit")
    assert(rev.length === 10)
    rev.foreach { r =>
      assert(r.getAs[Array[Byte]](2).isEmpty,
        s"revisit must ship no payload: ${r.getString(0)}")
      val id = r.getString(0).split("/p/")(1)
      assert(r.getString(3) === s"sha1:FAKE$id")
    }
    val resp = back.filter(_.getString(1) === "response")
    assert(resp.length === 10)
    resp.foreach { r =>
      val id = r.getString(0).split("/p/")(1)
      val body = new String(r.getAs[Array[Byte]](2), "UTF-8")
      assert(body === s"<html>page $id</html>")
      assert(r.getString(3) ===
        Warc.payloadDigest(body.getBytes("UTF-8")))
    }
    // first attempt wins: a re-run commits nothing new
    assert(WarcSink.writeRecrawlSegments(df, "url", "body", "rev",
      dir) === 20)
    assert(spark.read.format("graft_warc").load(dir)
      .filter(col("warc_type").isin("response", "revisit"))
      .count() === 20)
  }

  test("readMemberAt: one seek read inflates exactly the indexed " +
    "member (the CDX random-access pattern)") {
    val f = writeFixture(12)
    val idx = spark.read.format("graft_warc").load(f)
      .filter(col("warc_type") === "response")
      .select("url", "member_offset").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val fs = new org.apache.hadoop.fs.Path(f).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val rec = Warc.readMemberAt(fs, f, idx("https://dom2.com/p/7"))
    assert(rec.url === "https://dom2.com/p/7")
    assert(new String(rec.payload, "UTF-8") === page(7))
  }

  test("record segmentation (ISO 28500 §5.18-5.20): oversized payloads " +
    "split into continuation members at write, reassemble char-exact " +
    "at read, small payloads stay unsegmented, and an incomplete " +
    "chain is flagged truncated — never silently partial") {
    import graft.sources.{WarcSegments, WarcSink}
    import spark.implicits._
    val dir = Files.createTempDirectory("warcseg").toString + "/wet"
    val rows = Seq(
      ("https://a.com/doc/1", "short"),                       // 1 member
      ("https://a.com/doc/2", "x" * 16),                      // exactly max
      ("https://a.com/doc/3", "abcdefghijklmnop" + "QRSTUV"), // 2 members
      ("https://b.com/doc/4", "y" * 40))                      // 3 members
    val n = WarcSink.writeSegmentedConversions(
      rows.toDF("url", "body").repartition(2, col("url")),
      "url", "body", dir, 16)
    assert(n === 4) // logical records
    val raw = spark.read.format("graft_warc").load(dir)
      .filter(col("warc_type").isin("conversion", "continuation"))
    val members = raw.collect()
    // 1 + 1 + 2 + 3 members; continuations chain to their origin
    assert(members.length === 7)
    val conts = members.filter(_.getAs[String]("warc_type") ===
      "continuation")
    assert(conts.length === 3)
    assert(conts.forall(r => r.getAs[String]("segment_origin_id") != null
      && r.getAs[Int]("segment_number") >= 2))
    // exactly one continuation per chain carries the total length,
    // and it equals the logical payload's byte length
    val totals = conts.flatMap(r =>
      Option(r.getAs[java.lang.Long]("segment_total_length")))
    assert(totals.map(_.toLong).sorted.toSeq === Seq(22L, 40L))
    // first segments keep the conversion type and segment number 1
    val firsts = members.filter(r =>
      r.getAs[String]("warc_type") === "conversion" &&
        r.getAs[java.lang.Integer]("segment_number") != null)
    assert(firsts.length === 2 &&
      firsts.forall(_.getAs[Int]("segment_number") === 1))
    // reassembly: char-exact logical payloads, segment columns null
    val re = WarcSegments.reassemble(raw)
      .select(col("url"), decode(col("payload"), "UTF-8").as("body"),
        col("truncated"), col("segment_number"))
      .collect()
    assert(re.length === 4)
    assert(re.forall(_.isNullAt(3)))
    assert(re.forall(_.isNullAt(2)), "complete chains are not truncated")
    val got = re.map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got === rows.toMap)
    // an incomplete chain (a lost middle member) still emits, flagged
    val lossy = raw.filter(!(col("warc_type") === "continuation" &&
      col("segment_number") === 2 &&
      col("url") === "https://b.com/doc/4"))
    val flagged = WarcSegments.reassemble(lossy)
      .filter(col("url") === "https://b.com/doc/4").collect()
    assert(flagged.length === 1 &&
      flagged.head.getAs[String]("truncated") === "unspecified")
    // a lost TRAILING segment leaves contiguous numbers 1..k but no
    // WARC-Segment-Total-Length (only the last segment carries it,
    // §5.20) — completeness must not be inferred from contiguity
    val lostTail = raw.filter(!(col("warc_type") === "continuation" &&
      col("segment_number") === 3 &&
      col("url") === "https://b.com/doc/4"))
    val tailFlagged = WarcSegments.reassemble(lostTail)
      .filter(col("url") === "https://b.com/doc/4").collect()
    assert(tailFlagged.length === 1 &&
      tailFlagged.head.getAs[String]("truncated") === "unspecified",
      "a chain missing its tail (null declared total) is truncated")
    // a lone first segment with every continuation lost: same proof
    val loneFirst = raw.filter(!(col("warc_type") === "continuation" &&
      col("url") === "https://b.com/doc/4"))
    val loneFlagged = WarcSegments.reassemble(loneFirst)
      .filter(col("url") === "https://b.com/doc/4").collect()
    assert(loneFlagged.length === 1 &&
      loneFlagged.head.getAs[String]("truncated") === "unspecified")
  }

  test("readLogicalRecordAt: one seek follows a segment chain to the " +
    "complete payload (unsegmented members unchanged), and a chain " +
    "cut before its declared total is LOUD, never silently partial") {
    import graft.sources.WarcSink
    import spark.implicits._
    val dir = Files.createTempDirectory("warcsegra").toString + "/wet"
    val rows = Seq(
      ("https://a.com/doc/1", "tiny"),
      ("https://a.com/doc/2", "abcdefghijklmnop" * 3)) // 48 B -> 3 segs
    WarcSink.writeSegmentedConversions(
      rows.toDF("url", "body").coalesce(1), "url", "body", dir, 16)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val idx = spark.read.format("graft_warc").load(dir)
      .filter(col("warc_type") === "conversion")
      .select("url", "file", "member_offset").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    val (f1, o1) = idx("https://a.com/doc/1")
    val plain = Warc.readLogicalRecordAt(fs, f1, o1)
    assert(new String(plain.payload, "UTF-8") === "tiny")
    val (f2, o2) = idx("https://a.com/doc/2")
    val chained = Warc.readLogicalRecordAt(fs, f2, o2)
    assert(new String(chained.payload, "UTF-8") ===
      "abcdefghijklmnop" * 3)
    assert(chained.segmentNumber.isEmpty,
      "the logical record is no longer segmented")
    assert(chained.payloadDigest ===
      Some(Warc.payloadDigest(("abcdefghijklmnop" * 3)
        .getBytes("UTF-8"))), "first-segment digest describes the " +
        "complete logical payload")
    // cut the file right after doc/2's second segment: the chain-follow
    // must throw, not return 32 of 48 bytes
    val seg = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head
    val all = java.nio.file.Files.readAllBytes(seg.toPath)
    val cutAt = {
      // walk members from the chain start, keep first two of the
      // chain (readMember over-consumes its buffered input, so each
      // member reads from a fresh seek — the range-reader discipline)
      val in = fs.open(new org.apache.hadoop.fs.Path(f2))
      try {
        def lenAt(p: Long): Long = {
          in.seek(p)
          Warc.readMember(new java.io.BufferedInputStream(
            new java.io.FilterInputStream(in) {
              override def close(): Unit = ()
            }, 65536))._2
        }
        val l1 = lenAt(o2)
        val l2 = lenAt(o2 + l1)
        o2 + l1 + l2
      } finally in.close()
    }
    val cut = new java.io.File(dir, "cut.warc.gz")
    java.nio.file.Files.write(cut.toPath,
      java.util.Arrays.copyOfRange(all, 0, cutAt.toInt))
    val ex = intercept[java.io.EOFException] {
      Warc.readLogicalRecordAt(fs, cut.toString, o2)
    }
    assert(ex.getMessage.contains("segment chain"))
    cut.delete()
  }

  test("request records: WARC-Concurrent-To survives the parse " +
    "(angle brackets stripped), the request block stays raw (no HTTP " +
    "status invented), and the pair joins to its response") {
    val dir = Files.createTempDirectory("warcreq").toString
    val f = s"$dir/pairs.warc.gz"
    val out = new FileOutputStream(f)
    try {
      out.write(Warc.gzipMember(Warc.record("request",
        "https://a.com/p/1", "2024-01-01T00:00:00Z", "urn:uuid:req-1",
        "application/http; msgtype=request",
        Warc.httpRequest("GET", "/p/1", "a.com",
          Seq("User-Agent" -> "graftbot/1.0")),
        extraWarcHeaders =
          Seq("WARC-Concurrent-To" -> "<urn:uuid:rec-1>"))))
      out.write(Warc.gzipMember(Warc.record("response",
        "https://a.com/p/1", "2024-01-01T00:00:00Z", "urn:uuid:rec-1",
        "application/http; msgtype=response",
        Warc.httpResponse(200, "OK", "text/html", "hi".getBytes("UTF-8")))))
    } finally out.close()
    val rows = spark.read.format("graft_warc").load(f).collect()
    assert(rows.length === 2)
    val req = rows.find(_.getAs[String]("warc_type") == "request").get
    assert(req.getAs[String]("concurrent_to") === "urn:uuid:rec-1")
    assert(req.isNullAt(req.fieldIndex("status")),
      "a request block must not parse as an HTTP response")
    val body = new String(req.getAs[Array[Byte]]("payload"), "UTF-8")
    assert(body.startsWith("GET /p/1 HTTP/1.1\r\n") &&
      body.contains("User-Agent: graftbot/1.0\r\n"))
    val resp = rows.find(_.getAs[String]("warc_type") == "response").get
    assert(resp.getAs[String]("record_id") ===
      req.getAs[String]("concurrent_to"))
    assert(resp.isNullAt(resp.fieldIndex("concurrent_to")))
  }

  test("404 statuses survive the parse (governance filters work)") {
    val f = writeFixture(21)
    val n404 = spark.read.format("graft_warc").load(f)
      .filter(col("status") === 404).count()
    assert(n404 === 3) // i = 3, 10, 17
  }
}
