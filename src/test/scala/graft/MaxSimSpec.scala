package graft

import graft.search.MaxSim
import org.apache.spark.sql.functions._

/** MaxSim late-interaction semantics: hand-computed scores, the
  * bits=0 brute-force equivalence, bucket pruning, determinism. */
class MaxSimSpec extends SparkSpec {
  import spark.implicits._

  // 2-dim token vectors; doc 1 matches both query tokens exactly,
  // doc 2 matches one exactly and one diagonally, doc 3's only token
  // points opposite (negative bucket — prunable)
  private def docToks = Seq(
    (1L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)),
    (2L, Seq(0.5f, 0.5f)), (2L, Seq(1.0f, 0.0f)),
    (3L, Seq(-1.0f, -1.0f))
  ).toDF("doc_id", "tv")

  private def qToks = Seq(
    (0L, 0, Seq(1.0f, 0.0f)), (0L, 1, Seq(0.0f, 1.0f))
  ).toDF("qid", "ti", "tv")

  test("hand-computed MaxSim: exact-match doc scores |q| tokens, the " +
    "partial match scores 1 + cos45°") {
    val out = MaxSim.topK(docToks, "doc_id", "tv", qToks, "qid", "ti",
        "tv", k = 3, bits = 0)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    assert(math.abs(out(1L) - 2.0) < 1e-12,
      s"both query tokens find exact matches in doc 1: $out")
    assert(math.abs(out(2L) - (1.0 + math.sqrt(2) / 2)) < 1e-12,
      s"doc 2: token 0 -> exact, token 1 -> diagonal: $out")
    assert(out(1L) > out(2L))
  }

  test("bits=0 disables pruning: every doc is scored (brute force), " +
    "and a 1-bit bucket join prunes the opposite-sign doc") {
    val full = MaxSim.topK(docToks, "doc_id", "tv", qToks, "qid", "ti",
        "tv", k = 3, bits = 0)
      .collect().map(_.getLong(2)).toSet
    assert(full === Set(1L, 2L, 3L), "brute force sees every doc")
    val pruned = MaxSim.topK(docToks, "doc_id", "tv", qToks, "qid", "ti",
        "tv", k = 3, bits = 1)
      .collect()
    assert(pruned.map(_.getLong(2)).toSet === Set(1L, 2L),
      "doc 3's only token lives in the other sign bucket")
    // survivors keep their EXACT scores — pruning never approximates
    // the scoring of candidates
    val fullScores = MaxSim.topK(docToks, "doc_id", "tv", qToks, "qid",
        "ti", "tv", k = 3, bits = 0)
      .collect().map(r => r.getLong(2) -> r.getDouble(3)).toMap
    pruned.foreach(r =>
      assert(r.getDouble(3) === fullScores(r.getLong(2))))
  }

  test("persisted token layout: disk == mem, candidate scan prunes " +
    "to the query buckets' partitions, full candidate token sets " +
    "keep scores exact") {
    val dir = java.nio.file.Files.createTempDirectory("maxsim_p")
      .toString + "/toks"
    // 8-dim tokens so a 4-bit bucket has all four sign pairs
    val docs8 = Seq(
      (1L, Seq(1.0f, 0.0f, 1.0f, 0.0f, 1.0f, 0.0f, 1.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f, 0.0f, 1.0f, 0.0f, 1.0f, 0.0f, 1.0f)),
      (2L, Seq(-1.0f, 0.0f, -1.0f, 0.0f, -1.0f, 0.0f, -1.0f, 0.0f)),
      (3L, Seq(0.5f, 0.5f, -0.5f, -0.5f, 0.5f, 0.5f, -0.5f, -0.5f))
    ).toDF("doc_id", "tv")
    val q8 = Seq(
      (0L, 0, Seq(1.0f, 0.1f, 1.0f, 0.1f, 1.0f, 0.1f, 1.0f, 0.1f))
    ).toDF("qid", "ti", "tv")
    val idx = MaxSim.persistTokens(docs8, "doc_id", "tv", dir, bits = 4)
    // bucket dirs on disk
    val bdirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("__b=")).map(_.getName).toSet
    assert(bdirs.nonEmpty)
    spark.sharedState.cacheManager.clearCache()
    val out = MaxSim.topKPersisted(spark, idx, "doc_id", q8, "qid",
      "ti", "tv", k = 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__b"),
      s"candidate scan must prune by bucket partition:\n" +
        plan.take(2000))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val mem = key(MaxSim.topK(docs8, "doc_id", "tv", q8, "qid", "ti",
      "tv", k = 4, bits = 4))
    assert(key(out) === mem && mem.nonEmpty,
      "persisted path must equal the in-memory path score for score")
  }

  /** Files actually opened by the (executed) scan of `pathFrag` —
    * `inputFiles` lists the relation pre-pruning, the scan's numFiles
    * metric counts what partition pruning left. */
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
        .contains(pathFrag)))
      .map(_.metrics("numFiles").value).sum
  }

  // 8-dim fixture: doc 1 is the only doc sharing the query's sign
  // bucket (doc 2 all-negative, doc 3 alternating pairs)
  private def docs8 = Seq(
    (1L, Seq(1.0f, 0.0f, 1.0f, 0.0f, 1.0f, 0.0f, 1.0f, 0.0f)),
    (1L, Seq(0.0f, 1.0f, 0.0f, 1.0f, 0.0f, 1.0f, 0.0f, 1.0f)),
    (2L, Seq(-1.0f, 0.0f, -1.0f, 0.0f, -1.0f, 0.0f, -1.0f, 0.0f)),
    (3L, Seq(0.5f, 0.5f, -0.5f, -0.5f, 0.5f, 0.5f, -0.5f, -0.5f))
  ).toDF("doc_id", "tv")
  private def q8 = Seq(
    (0L, 0, Seq(1.0f, 0.1f, 1.0f, 0.1f, 1.0f, 0.1f, 1.0f, 0.1f))
  ).toDF("qid", "ti", "tv")

  test("persisted exact stage reads candidate token sets from the " +
    "pk-hash _docs twin, opening only candidate buckets") {
    val dir = java.nio.file.Files.createTempDirectory("maxsim_pf")
      .toString + "/toks"
    val idx = MaxSim.persistTokens(docs8, "doc_id", "tv", dir, bits = 4)
    val ddirs = new java.io.File(dir + "_docs").listFiles()
      .filter(_.getName.startsWith("__dbkt=")).map(_.getName).toSet
    assert(ddirs.size >= 2, s"pk-hash dirs expected: $ddirs")
    spark.sharedState.cacheManager.clearCache()
    // AQE wraps the plan in AdaptiveSparkPlanExec (childless until
    // final) — flip it off so the scan's numFiles metric is reachable
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val out = MaxSim.topKPersisted(spark, idx, "doc_id", q8, "qid",
        "ti", "tv", k = 4)
      val plan = out.queryExecution.executedPlan.toString
      assert(plan.contains("__dbkt"),
        s"exact stage must route through _docs:\n${plan.take(3000)}")
      // only doc 1 shares the query's bucket -> candidate fetch opens
      // ONE pk-hash dir of the _docs store, never all of them
      val total = spark.read.parquet(dir + "_docs").inputFiles.length
      val read = filesRead(out, "toks_docs")
      assert(read > 0 && read < total,
        s"candidate fetch read $read of $total _docs files")
      assert(out.collect().map(_.getLong(2)).toSet === Set(1L))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("syncPersistedTokens: delete + reinsert + update round-trips " +
    "to the fresh-build layout, tombstones leave both tables") {
    import graft.index.ChangeLog
    val dir = java.nio.file.Files.createTempDirectory("maxsim_sync")
      .toString + "/toks"
    // build WITHOUT doc 3, WITH a stale doc 1 (wrong vectors) and a
    // doomed doc 9
    val stale = Seq(
      (1L, Seq(-1.0f, -1.0f, -1.0f, -1.0f, -1.0f, -1.0f, -1.0f, -1.0f)),
      (2L, Seq(-1.0f, 0.0f, -1.0f, 0.0f, -1.0f, 0.0f, -1.0f, 0.0f)),
      (9L, Seq(1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f, 1.0f))
    ).toDF("doc_id", "tv")
    val idx = MaxSim.persistTokens(stale, "doc_id", "tv", dir, bits = 4)
    // CDF batch: doc 1 replaced with its true 2-token bag, doc 3
    // inserted, doc 9 deleted — one row per doc, token bag nested
    val changes = Seq(
      (1L, Seq(Seq(1.0f, 0.0f, 1.0f, 0.0f, 1.0f, 0.0f, 1.0f, 0.0f),
        Seq(0.0f, 1.0f, 0.0f, 1.0f, 0.0f, 1.0f, 0.0f, 1.0f)),
        ChangeLog.OpUpdate, 1L),
      (3L, Seq(Seq(0.5f, 0.5f, -0.5f, -0.5f, 0.5f, 0.5f, -0.5f, -0.5f)),
        ChangeLog.OpInsert, 2L),
      (9L, Seq.empty[Seq[Float]], ChangeLog.OpDelete, 3L)
    ).toDF("doc_id", "toks", "__op", "__seq")
    MaxSim.syncPersistedTokens(spark, idx, changes, "doc_id", "toks")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val synced = key(MaxSim.topKPersisted(spark, idx, "doc_id", q8,
      "qid", "ti", "tv", k = 4))
    val mem = key(MaxSim.topK(docs8, "doc_id", "tv", q8, "qid", "ti",
      "tv", k = 4, bits = 4))
    assert(synced === mem && synced.nonEmpty,
      "synced layout must equal a fresh build over the live corpus")
    // the tombstoned doc is gone from BOTH tables
    assert(spark.read.parquet(dir).filter($"__did" === 9L).isEmpty)
    assert(spark.read.parquet(dir + "_docs")
      .filter($"__did" === 9L).isEmpty)
    // idempotent under replay
    MaxSim.syncPersistedTokens(spark, idx, changes, "doc_id", "toks")
    assert(key(MaxSim.topKPersisted(spark, idx, "doc_id", q8, "qid",
      "ti", "tv", k = 4)) === mem)
  }

  test("bits wider than the token dimension are rejected, not " +
    "silently degenerate") {
    val err = intercept[IllegalArgumentException] {
      MaxSim.topK(docToks, "doc_id", "tv", qToks, "qid", "ti", "tv",
        k = 3, bits = 2) // 2-dim tokens: only one sign pair exists
    }
    assert(err.getMessage.contains("2*bits"))
    val dir = java.nio.file.Files.createTempDirectory("maxsim_req")
      .toString + "/toks"
    intercept[IllegalArgumentException] {
      MaxSim.persistTokens(docToks, "doc_id", "tv", dir, bits = 3)
    }
  }

  test("non-default docBuckets round-trips: the count is frozen in " +
    "_meta and queries + syncs re-derive the same pk hash") {
    import graft.index.ChangeLog
    val dir = java.nio.file.Files.createTempDirectory("maxsim_db")
      .toString + "/toks"
    val idx = MaxSim.persistTokens(docs8, "doc_id", "tv", dir, bits = 4,
      docBuckets = 5)
    val ddirs = new java.io.File(dir + "_docs").listFiles()
      .filter(_.getName.startsWith("__dbkt=")).map(_.getName).toSet
    assert(ddirs.nonEmpty && ddirs.size <= 5, s"5 pk dirs max: $ddirs")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val mem = key(MaxSim.topK(docs8, "doc_id", "tv", q8, "qid", "ti",
      "tv", k = 4, bits = 4))
    assert(key(MaxSim.topKPersisted(spark, idx, "doc_id", q8, "qid",
      "ti", "tv", k = 4)) === mem && mem.nonEmpty)
    // a sync against the 5-bucket layout keeps using the frozen count
    val changes = Seq(
      (3L, Seq(Seq(1.0f, 0.0f, 1.0f, 0.0f, 1.0f, 0.0f, 1.0f, 0.0f)),
        ChangeLog.OpUpdate, 1L)
    ).toDF("doc_id", "toks", "__op", "__seq")
    MaxSim.syncPersistedTokens(spark, idx, changes, "doc_id", "toks")
    val live = docs8.filter($"doc_id" =!= 3L).unionByName(
      Seq((3L, Seq(1.0f, 0.0f, 1.0f, 0.0f, 1.0f, 0.0f, 1.0f, 0.0f)))
        .toDF("doc_id", "tv"))
    assert(key(MaxSim.topKPersisted(spark, idx, "doc_id", q8, "qid",
      "ti", "tv", k = 4)) ===
      key(MaxSim.topK(live, "doc_id", "tv", q8, "qid", "ti", "tv",
        k = 4, bits = 4)))
  }

  test("candidate fetch carries no forced broadcast: the pk set's " +
    "size is pruning-dependent, AQE alone decides the join strategy") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val dir = java.nio.file.Files.createTempDirectory("maxsim_nh")
      .toString + "/toks"
    val idx = MaxSim.persistTokens(docs8, "doc_id", "tv", dir, bits = 4)
    val out = MaxSim.topKPersisted(spark, idx, "doc_id", q8, "qid",
      "ti", "tv", k = 4)
    val hinted = out.queryExecution.analyzed
      .collect { case h: ResolvedHint => h.child.toString }
    // the only hints left are the request-sized query-token sides —
    // nothing reading the persisted layout may be forced broadcast
    assert(hinted.nonEmpty, "query-token broadcasts are expected")
    hinted.foreach(c => assert(!c.toLowerCase.contains("parquet"),
      s"a layout-reading subtree is force-broadcast:\n$c"))
  }

  test("pre-_docs layouts migrate: the twin is derived from the " +
    "store once, then queries and syncs run normally") {
    import graft.index.ChangeLog
    val dir = java.nio.file.Files.createTempDirectory("maxsim_mig")
      .toString + "/toks"
    MaxSim.persistTokens(docs8, "doc_id", "tv", dir, bits = 4)
    // simulate a legacy layout: no _docs twin, single-column _meta
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete()
    }
    rmrf(new java.io.File(dir + "_docs"))
    Seq(4).toDF("__bits").coalesce(1)
      .write.mode("overwrite").parquet(dir + "_meta")
    val idx = MaxSim.PersistedTokens(dir, 4)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSet
    val mem = key(MaxSim.topK(docs8, "doc_id", "tv", q8, "qid", "ti",
      "tv", k = 4, bits = 4))
    assert(key(MaxSim.topKPersisted(spark, idx, "doc_id", q8, "qid",
      "ti", "tv", k = 4)) === mem && mem.nonEmpty,
      "query against a pre-_docs layout must derive the twin and match")
    assert(new java.io.File(dir + "_docs").exists(), "twin materialized")
    // and a sync on another migrated layout (twin deleted again)
    rmrf(new java.io.File(dir + "_docs"))
    val changes = Seq(
      (2L, Seq.empty[Seq[Float]], ChangeLog.OpDelete, 1L)
    ).toDF("doc_id", "toks", "__op", "__seq")
    MaxSim.syncPersistedTokens(spark, idx, changes, "doc_id", "toks")
    assert(spark.read.parquet(dir).filter($"__did" === 2L).isEmpty)
    assert(spark.read.parquet(dir + "_docs")
      .filter($"__did" === 2L).isEmpty)
  }

  test("query tokens narrower than 2*bits are rejected too, not " +
    "silently candidate-losing") {
    val wideDocs = docs8
    val narrowQ = Seq((0L, 0, Seq(1.0f, 0.1f))).toDF("qid", "ti", "tv")
    val err = intercept[IllegalArgumentException] {
      MaxSim.topK(wideDocs, "doc_id", "tv", narrowQ, "qid", "ti", "tv",
        k = 3, bits = 4)
    }
    assert(err.getMessage.contains("2*bits"))
    val dir = java.nio.file.Files.createTempDirectory("maxsim_qd")
      .toString + "/toks"
    val idx = MaxSim.persistTokens(wideDocs, "doc_id", "tv", dir, bits = 4)
    val err2 = intercept[IllegalArgumentException] {
      MaxSim.topKPersisted(spark, idx, "doc_id", narrowQ, "qid", "ti",
        "tv", k = 3)
    }
    assert(err2.getMessage.contains("2*bits"))
  }

  test("deterministic under repartitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      MaxSim.topK(df, "doc_id", "tv", qToks, "qid", "ti", "tv",
          k = 3, bits = 0)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
          r.getDouble(3))).toSeq
    assert(run(docToks.repartition(7)) === run(docToks.coalesce(1)))
  }
}
