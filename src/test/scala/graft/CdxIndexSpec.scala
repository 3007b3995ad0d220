package graft

import java.nio.file.Files

import graft.index.CdxIndex
import org.apache.spark.sql.functions._

/** The CDX maintenance pass ([[graft.index.CdxIndex.optimize]]):
  * micro-batch APPENDS — the mid-crawl layout where every file spans
  * the whole key space — re-sorted into the range layout. Answers
  * identical, per-file SURT key ranges disjoint afterwards (so a
  * domain probe prunes files, the property the batch build's
  * contiguity test pins), and idempotent. */
class CdxIndexSpec extends SparkSpec {
  import spark.implicits._

  /** (name, min surt_key, max surt_key) per parquet part file —
    * the min/max stats file- and row-group-level pruning skips on. */
  private def fileRanges(root: String): Seq[(String, String, String)] =
    new java.io.File(root).listFiles()
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))
      .map { f =>
        val r = spark.read.parquet(f.toString)
          .agg(min("surt_key"), max("surt_key")).head()
        (f.getName, r.getString(0), r.getString(1))
      }.toSeq

  test("optimize re-sorts appended micro-batches into the range " +
    "layout: answers identical, per-file SURT ranges disjoint (a " +
    "domain probe prunes files like the batch build), idempotent") {
    val root = Files.createTempDirectory("cdx_opt").toString + "/cdx"
    // three 'micro-batches', each spanning ALL domains — the
    // live-crawl append shape where no file can be skipped
    (0 until 3).foreach { b =>
      (0 until 40).map { i =>
        val dom = s"dom${i % 4}"
        val id = b * 100 + i
        (s"com,$dom)/p/$id", s"2024-01-0${b + 1}T00:00:00Z",
          s"https://$dom.com/p/$id", s"seg-$b.warc.gz",
          id.toLong, 10L, s"sha1:FAKE$id")
      }.toDF("surt_key", "ts", "url", "file", "member_offset",
        "member_length", "payload_digest")
        .coalesce(1).write.mode("append").parquet(root)
    }
    val pre = spark.read.parquet(root).collect().map(_.toString).sorted
    val before = fileRanges(root)
    assert(before.size >= 3)
    assert(before.forall { case (_, lo, hi) =>
      lo.startsWith("com,dom0") && hi.startsWith("com,dom3") },
      s"append fixture must span all domains per file: $before")
    CdxIndex.optimize(spark, root, 4)
    val post = spark.read.parquet(root).collect().map(_.toString).sorted
    assert(post === pre, "optimize must not change the answer set")
    // post-optimize the files partition the key space: sorted by min,
    // each file's max never passes the next file's min
    val after = fileRanges(root).sortBy(_._2)
    after.sliding(2).foreach {
      case Seq((_, _, hi1), (n2, lo2, _)) =>
        assert(hi1 <= lo2, s"file ranges overlap at $n2: $hi1 > $lo2")
      case _ => ()
    }
    // a single-domain probe now overlaps a strict subset of files —
    // the prunability the batch-built index's spec pins, recovered
    // for the maintained index
    val (probeLo, probeHi) = ("com,dom1)", "com,dom1*")
    val overlapping = after.count { case (_, lo, hi) =>
      lo < probeHi && hi >= probeLo }
    assert(overlapping > 0 && overlapping < after.size,
      s"a dom1 probe must prune files: $overlapping of ${after.size}")
    val hits = spark.read.parquet(root)
      .filter(col("surt_key") >= probeLo && col("surt_key") < probeHi)
      .select("url").collect().map(_.getString(0))
    assert(hits.length === 30 &&
      hits.forall(_.startsWith("https://dom1.com/")))
    // idempotent: a second pass leaves answers and layout converged
    val nFiles = after.size
    CdxIndex.optimize(spark, root, 4)
    assert(spark.read.parquet(root).collect()
      .map(_.toString).sorted === pre)
    assert(fileRanges(root).size === nFiles)
  }

  test("cluster.idx consumption: the text export's per-shard first " +
    "keys answer a domain probe by opening a strict subset of shards " +
    "with the full-scan answer intact (the public two-level index " +
    "pattern — a consumer never scans cdx-*.gz it can prove " +
    "irrelevant)") {
    import org.apache.spark.sql.functions.{input_file_name, min => fmin}
    val root = Files.createTempDirectory("cdx_clidx").toString + "/cdx"
    // the crawl_cdx_export layout: range-sharded, sorted text lines
    (0 until 200).map { i =>
      val dom = s"dom${i % 5}"
      (s"com,$dom)/p/$i", s"com,$dom)/p/$i rest-of-line-$i")
    }.toDF("surt_key", "value")
      .repartitionByRange(4, col("surt_key"))
      .sortWithinPartitions("surt_key")
      .select("value")
      .write.option("compression", "gzip").text(root)
    // cluster.idx = (shard file, first key), one tiny scan to build
    val cluster = spark.read.text(root)
      .withColumn("f", input_file_name())
      .groupBy("f").agg(fmin("value").as("l"))
      .select(col("f"), split(col("l"), " ").getItem(0).as("first_key"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .sortBy(_._2)
    assert(cluster.length === 4)
    // probe dom2: a shard is relevant iff its key range [first_i,
    // first_{i+1}) intersects [lo, hi)
    val (lo, hi) = ("com,dom2)", "com,dom2*")
    val relevant = cluster.zipWithIndex.filter { case ((_, fk), i) =>
      val nextFk =
        if (i + 1 < cluster.length) Some(cluster(i + 1)._2) else None
      fk < hi && nextFk.forall(_ > lo)
    }.map(_._1._1)
    assert(relevant.nonEmpty && relevant.length < cluster.length,
      s"the probe must prune shards: ${relevant.length} of 4")
    val hits = spark.read.text(relevant: _*)
      .select(split(col("value"), " ").getItem(0).as("k"), col("value"))
      .filter(col("k") >= lo && col("k") < hi)
      .collect().map(_.getString(1)).sorted
    val full = spark.read.text(root)
      .select(split(col("value"), " ").getItem(0).as("k"), col("value"))
      .filter(col("k") >= lo && col("k") < hi)
      .collect().map(_.getString(1)).sorted
    assert(hits.length === 40 && (hits sameElements full),
      "pruned probe must equal the full scan")
  }

  test("optimize with collapse: the digest fold rides the re-sort " +
    "shuffle (unchanged refetches vanish during maintenance), ranges " +
    "stay disjoint, and a second pass is a no-op") {
    val root = Files.createTempDirectory("cdx_optc").toString + "/cdx"
    // two 'crawls' appended: crawl 1 all fresh, crawl 2 refetches
    // everything unchanged except dom0 pages (new digest)
    (0 until 2).foreach { b =>
      (0 until 40).map { i =>
        val dom = s"dom${i % 4}"
        val changed = b == 1 && i % 4 == 0
        (s"com,$dom)/p/$i", s"2024-0${b + 1}-01T00:00:00Z",
          s"https://$dom.com/p/$i", s"seg-$b.warc.gz",
          i.toLong, 10L,
          if (changed) s"sha1:NEW$i" else s"sha1:OLD$i")
      }.toDF("surt_key", "ts", "url", "file", "member_offset",
        "member_length", "payload_digest")
        .coalesce(1).write.mode("append").parquet(root)
    }
    assert(spark.read.parquet(root).count() === 80)
    CdxIndex.optimize(spark, root, 4,
      CdxIndex.collapseByDigest(_, "payload_digest"))
    // 40 originals + 10 changed dom0 captures survive
    val post = spark.read.parquet(root)
    assert(post.count() === 50)
    assert(post.filter(col("ts").startsWith("2024-02")).count() === 10)
    val ranges = fileRanges(root).sortBy(_._2)
    ranges.sliding(2).foreach {
      case Seq((_, _, hi1), (n2, lo2, _)) =>
        assert(hi1 <= lo2, s"file ranges overlap at $n2")
      case _ => ()
    }
    // idempotent: the fold of a folded index is a no-op
    val pre = post.collect().map(_.toString).sorted
    CdxIndex.optimize(spark, root, 4,
      CdxIndex.collapseByDigest(_, "payload_digest"))
    assert(spark.read.parquet(root).collect()
      .map(_.toString).sorted === pre)
  }

  test("collapseByDigest: consecutive same-digest captures fold to " +
    "their first row (index linear in CHANGE), digest transitions — " +
    "including reverts — survive, and the latest-resolved content " +
    "per URL is unchanged") {
    // u1 unchanged across 3 crawls; u2 changed at t2; u3 added at t2;
    // u4 reverted at t3 (d1 -> d2 -> d1: all three rows must survive —
    // 'adjacent' semantics, never a global digest dedup); u5 has a
    // digest-LESS capture between two identical ones (nulls prove
    // nothing: all three rows must survive)
    val rows = Seq(
      ("com,a)/u1", "t1", Some("d1")), ("com,a)/u1", "t2", Some("d1")),
      ("com,a)/u1", "t3", Some("d1")),
      ("com,a)/u2", "t1", Some("d1")), ("com,a)/u2", "t2", Some("d2")),
      ("com,b)/u3", "t2", Some("d3")),
      ("com,b)/u4", "t1", Some("d1")), ("com,b)/u4", "t2", Some("d2")),
      ("com,b)/u4", "t3", Some("d1")),
      ("com,b)/u5", "t1", Some("d1")), ("com,b)/u5", "t2", None),
      ("com,b)/u5", "t3", Some("d1")))
    val full = rows.toDF("surt_key", "ts", "dig")
    val collapsed = CdxIndex.collapseByDigest(full, "dig")
    val got = collapsed.collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2))))
      .toSet
    assert(got === Set(
      ("com,a)/u1", "t1", Some("d1")),
      ("com,a)/u2", "t1", Some("d1")), ("com,a)/u2", "t2", Some("d2")),
      ("com,b)/u3", "t2", Some("d3")),
      ("com,b)/u4", "t1", Some("d1")), ("com,b)/u4", "t2", Some("d2")),
      ("com,b)/u4", "t3", Some("d1")),
      ("com,b)/u5", "t1", Some("d1")), ("com,b)/u5", "t2", None),
      ("com,b)/u5", "t3", Some("d1"))))
    // 12 captures -> 10 rows: original set + changes (and unprovables)
    assert(collapsed.count() === 10)
    // the wayback question 'what content is current?' answers the
    // same on both layouts: newest-row digest per URL is identical
    import org.apache.spark.sql.expressions.Window
    def latest(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("__rn", row_number().over(Window
        .partitionBy("surt_key").orderBy(col("ts").desc, col("dig"))))
      .filter(col("__rn") === 1).select("surt_key", "dig")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(latest(collapsed) === latest(full))
  }

  test("collapseByTimestamp: one capture per page per time bucket " +
    "(keep-first), changed captures inside a bucket fold too — " +
    "frequency thinning, not change preservation — and coarser " +
    "prefixes strictly thin further") {
    // u1 captured twice in Jan (same-day churn) and once in Feb;
    // u2 captured in Jan and CHANGED in Jan (digest differs — folds
    // anyway under timestamp collapse); u3 first seen in Feb
    val rows = Seq(
      ("com,a)/u1", "2024-01-03T00:00:00Z", "https://a.com/u1", "d1"),
      ("com,a)/u1", "2024-01-20T00:00:00Z", "https://a.com/u1", "d1"),
      ("com,a)/u1", "2024-02-01T00:00:00Z", "https://a.com/u1", "d1"),
      ("com,a)/u2", "2024-01-05T00:00:00Z", "https://a.com/u2", "d1"),
      ("com,a)/u2", "2024-01-09T00:00:00Z", "https://a.com/u2", "d2"),
      ("com,b)/u3", "2024-02-10T00:00:00Z", "https://b.com/u3", "d3"))
    val idx = rows.toDF("surt_key", "ts", "url", "dig")
    // month prefix (7 chars): one row per (page, month)
    val monthly = CdxIndex.collapseByTimestamp(idx, 7)
      .select("surt_key", "ts").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(monthly === Set(
      ("com,a)/u1", "2024-01-03T00:00:00Z"),
      ("com,a)/u1", "2024-02-01T00:00:00Z"),
      ("com,a)/u2", "2024-01-05T00:00:00Z"), // d2 capture folded
      ("com,b)/u3", "2024-02-10T00:00:00Z")))
    // year prefix (4 chars): first capture per page only
    val yearly = CdxIndex.collapseByTimestamp(idx, 4)
      .select("surt_key", "ts").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(yearly === Set(
      ("com,a)/u1", "2024-01-03T00:00:00Z"),
      ("com,a)/u2", "2024-01-05T00:00:00Z"),
      ("com,b)/u3", "2024-02-10T00:00:00Z")))
  }
}
