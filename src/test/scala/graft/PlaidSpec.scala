package graft

import graft.search.{MaxSim, Plaid}
import org.apache.spark.sql.functions._

/** Centroid-routed MaxSim (PLAID form): full-budget equivalence to the
  * exact brute force, disk == mem, and the two partition-pruning pins
  * (probed cells only; candidate `_docs` dirs only). */
class PlaidSpec extends SparkSpec {
  import spark.implicits._

  // 8 docs × 4 tokens, 8-dim, two coarse clusters (positive-heavy vs
  // negative-heavy) with per-token deterministic jitter — enough
  // structure for trained centroids to separate, small enough to
  // hand-audit
  private def docToks = {
    val rows = for {
      d <- 0 until 8
      t <- 0 until 4
    } yield {
      val sign = if (d % 2 == 0) 1.0f else -1.0f
      val v = Array.tabulate(8)(i =>
        sign * (1.0f + ((d * 31 + t * 7 + i * 3) % 5).toFloat / 8f) *
          (if (i % 2 == 0) 1f else 0.5f))
      (d.toLong, s"t$t", v.toSeq)
    }
    rows.toDF("doc_id", "ti", "tv")
  }

  private def qToks = Seq(
    (100L, "q0", Seq(1.0f, 0.5f, 1.0f, 0.5f, 1.0f, 0.5f, 1.0f, 0.5f)),
    (100L, "q1", Seq(1.2f, 0.6f, 1.0f, 0.4f, 1.1f, 0.5f, 0.9f, 0.6f)),
    (101L, "q0", Seq(-1.0f, -0.5f, -1.0f, -0.5f, -1.0f, -0.5f, -1.0f,
      -0.5f))
  ).toDF("qid", "ti", "tv")

  private def params(nProbe: Int, c: Int) = Plaid.Params(cells = 4,
    nProbe = nProbe, c = c, m = 4, pqK = 4, iters = 2, sampleN = 16)

  private def key(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
      r.getDouble(3))).toSet

  test("full probe budget (nProbe = cells, c wide) reproduces the " +
    "exact brute-force MaxSim — routing + ADC only ever PRUNE") {
    val idx = Plaid.build(docToks, "doc_id", "ti", "tv",
      params(nProbe = 4, c = 8))
    val plaid = key(Plaid.topK(idx, "doc_id", qToks, "qid", "ti", "tv",
      k = 8))
    val exact = key(MaxSim.topK(docToks, "doc_id", "tv", qToks, "qid",
      "ti", "tv", k = 8, bits = 0))
    assert(plaid === exact && exact.nonEmpty,
      s"extra=${plaid -- exact}\nmissing=${exact -- plaid}")
  }

  test("pruned budget returns exact scores for every survivor (the " +
    "refine never approximates) and keeps the cluster-matching top doc") {
    val idx = Plaid.build(docToks, "doc_id", "ti", "tv",
      params(nProbe = 1, c = 2))
    val out = Plaid.topK(idx, "doc_id", qToks, "qid", "ti", "tv", k = 3)
      .collect()
    val exact = MaxSim.topK(docToks, "doc_id", "tv", qToks, "qid", "ti",
        "tv", k = 8, bits = 0)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
      .toMap
    assert(out.nonEmpty)
    out.foreach(r => assert(
      r.getDouble(3) === exact((r.getLong(0), r.getLong(2))),
      s"survivor score must be the exact MaxSim: ${r}"))
    // the exact top-1 lives in the query's own cluster — a 1-probe
    // route over cleanly-separated clusters must keep it
    val top1 = out.filter(_.getInt(1) == 1)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val exactTop1 = MaxSim.topK(docToks, "doc_id", "tv", qToks, "qid",
        "ti", "tv", k = 1, bits = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(top1 === exactTop1, s"got $top1 expected $exactTop1")
  }

  /** Files actually opened by the executed scan of `pathFrag`. */
  private def filesRead(df: org.apache.spark.sql.DataFrame,
      pathFrag: String): Long = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    df.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString
        .endsWith(pathFrag)))
      .map(_.metrics("numFiles").value).sum
  }

  test("persisted layout: disk == mem, stage 1 opens only probed cell " +
    "dirs, the refine opens only candidate _docs dirs") {
    val dir = java.nio.file.Files.createTempDirectory("plaid_p")
      .toString + "/toks"
    val idx = Plaid.build(docToks, "doc_id", "ti", "tv",
      params(nProbe = 1, c = 2))
    val p = Plaid.persist(idx, dir, docBuckets = 8)
    val cdirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("__cell=")).map(_.getName).toSet
    assert(cdirs.size >= 2, s"cell dirs expected: $cdirs")
    spark.sharedState.cacheManager.clearCache()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q1 = qToks.filter($"qid" === 100L)
      val out = Plaid.topKPersisted(spark, p, "doc_id", q1, "qid", "ti",
        "tv", k = 3)
      val mem = Plaid.topK(idx, "doc_id", q1, "qid", "ti", "tv", k = 3)
      assert(key(out) === key(mem) && key(mem).nonEmpty,
        "persisted path must equal the in-memory path")
      val cellTotal = spark.read.parquet(dir).inputFiles.length
      val cellRead = filesRead(out, "/toks")
      assert(cellRead > 0 && cellRead < cellTotal,
        s"stage 1 read $cellRead of $cellTotal cell files")
      val docsTotal = spark.read.parquet(dir + "_docs").inputFiles.length
      val docsRead = filesRead(out, "toks_docs")
      assert(docsRead > 0 && docsRead < docsTotal,
        s"refine read $docsRead of $docsTotal _docs files")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("syncPersisted: delete + reinsert + LWW update round-trip under " +
    "frozen quantizers; deletes leave both tables; replay idempotent") {
    import graft.index.ChangeLog
    val dir = java.nio.file.Files.createTempDirectory("plaid_sync")
      .toString + "/toks"
    val idx = Plaid.build(docToks, "doc_id", "ti", "tv",
      params(nProbe = 4, c = 8))
    val p = Plaid.persist(idx, dir, docBuckets = 8)
    def bag(d: Long): Seq[Seq[Float]] = docToks
      .filter($"doc_id" === d).orderBy("ti")
      .collect().map(_.getSeq[Float](2).toSeq).toSeq
    val stale = Seq.fill(2)(Seq.fill(8)(-9.0f).toSeq)
    val changes = Seq(
      (2L, bag(2), ChangeLog.OpDelete, 1L),
      (2L, bag(2), ChangeLog.OpInsert, 2L),   // delete + reinsert
      (6L, stale, ChangeLog.OpUpdate, 1L),    // LWW: stale loses...
      (6L, bag(6), ChangeLog.OpUpdate, 2L),   // ...to the true bag
      (7L, Seq.empty[Seq[Float]], ChangeLog.OpDelete, 1L)
    ).toDF("doc_id", "toks", "__op", "__seq")
    Plaid.syncPersisted(spark, p, changes, "doc_id", "toks")
    // reference: the SAME frozen quantizers over the live corpus
    val liveIdx = idx.copy(coded = idx.coded.filter($"__did" =!= 7L))
    val mem = key(Plaid.topK(liveIdx, "doc_id", qToks, "qid", "ti",
      "tv", k = 7))
    val disk = key(Plaid.topKPersisted(spark, p, "doc_id", qToks,
      "qid", "ti", "tv", k = 7))
    assert(disk === mem && mem.nonEmpty,
      s"synced layout must equal the frozen-quantizer live index:\n" +
        s"extra=${disk -- mem}\nmissing=${mem -- disk}")
    assert(spark.read.parquet(dir).filter($"__did" === 7L).isEmpty)
    assert(spark.read.parquet(dir + "_docs")
      .filter($"__did" === 7L).isEmpty)
    Plaid.syncPersisted(spark, p, changes, "doc_id", "toks")
    assert(key(Plaid.topKPersisted(spark, p, "doc_id", qToks, "qid",
      "ti", "tv", k = 7)) === mem, "replay must be a no-op")
  }

  test("no layout-reading subtree is force-broadcast; deterministic " +
    "under repartitioning") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val dir = java.nio.file.Files.createTempDirectory("plaid_nh")
      .toString + "/toks"
    val idx = Plaid.build(docToks, "doc_id", "ti", "tv",
      params(nProbe = 2, c = 4))
    val p = Plaid.persist(idx, dir, docBuckets = 8)
    val out = Plaid.topKPersisted(spark, p, "doc_id", qToks, "qid", "ti",
      "tv", k = 3)
    out.queryExecution.analyzed
      .collect { case h: ResolvedHint => h.child.toString }
      .foreach(c => assert(!c.toLowerCase.contains("parquet"),
        s"layout subtree force-broadcast:\n$c"))
    def run(dt: org.apache.spark.sql.DataFrame) = {
      val i = Plaid.build(dt, "doc_id", "ti", "tv", params(2, 4))
      Plaid.topK(i, "doc_id", qToks, "qid", "ti", "tv", k = 3)
        .collect().toSeq.map(r => (r.getLong(0), r.getInt(1),
          r.getLong(2), r.getDouble(3)))
    }
    assert(run(docToks.repartition(7)) === run(docToks.coalesce(1)))
  }
}
