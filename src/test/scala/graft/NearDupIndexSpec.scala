package graft

import graft.index.ChangeLog
import graft.operators.{Dedup, NearDupIndex}
import org.apache.spark.sql.functions._

class NearDupIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "text").cache()

  private def tmp(name: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_ndspec_$name"

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("corpus_id", "delta_id", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  // ground truth: in-memory LSH pairs over everything, restricted to
  // cross-block (corpus-side, delta-side) orientation
  private lazy val allPairs =
    Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .flatMap { case (a, b, j) => Seq((a, b, j), (b, a, j)) }

  private def truth(corpus: Long => Boolean, delta: Long => Boolean) =
    allPairs.collect {
      case (c, d, j) if corpus(c) && delta(d) => (c, d, j)
    }.toSet

  test("delta probe finds exactly the cross-block LSH pairs") {
    val idx = NearDupIndex.persist(docs.filter(col("doc_id") >= 60),
      "doc_id", "text", tmp("probe"))
    val got = pairs(NearDupIndex.nearDupsAgainst(spark, idx,
      docs.filter(col("doc_id") < 60), "doc_id", "text", 0.5))
    val want = truth(_ >= 60, _ < 60)
    assert(got === want && got.nonEmpty,
      s"got ${got.size} pairs, want ${want.size}")
  }

  test("probe prunes the posting scan to the delta's bucket dirs") {
    val idx = NearDupIndex.persist(docs.filter(col("doc_id") >= 400),
      "doc_id", "text", tmp("prune"), buckets = 32)
    // one tiny delta doc → ≤ 4 band buckets → ≤ 4 posting dirs in the
    // partition IN-list (the house PartitionFilters assertion:
    // inputFiles reports the unpruned listing, the executed plan shows
    // what the scan actually keeps)
    spark.sharedState.cacheManager.clearCache()
    val out = NearDupIndex.nearDupsAgainst(spark, idx,
      docs.filter(col("doc_id") === 8), "doc_id", "text", 0.5)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    val partFilters = "PartitionFilters: \\[([^\\]]*)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).filter(_.contains("__bkt"))
      .toSeq
    assert(partFilters.nonEmpty,
      s"probe must prune posting dirs by partition:\n${plan.take(3000)}")
    // 1 delta doc × 4 bands → at most 4 values in the dir IN-list
    // (a single value prints as an equality, not IN)
    val nDirs = partFilters.map { f =>
      "IN \\(([^)]*)\\)".r.findFirstMatchIn(f)
        .map(_.group(1).split(",").length).getOrElse(1)
    }.max
    assert(nDirs <= 4,
      s"probe listed $nDirs posting dirs: ${partFilters.mkString(" | ")}")
  }

  test("sync equals a fresh build on the post-change corpus") {
    val root = tmp("sync")
    val idx = NearDupIndex.persist(docs.filter(col("doc_id") >= 300),
      "doc_id", "text", root)
    val changes = docs
      .filter(col("doc_id") >= 150 && col("doc_id") < 300)
      .withColumn("__op", lit(ChangeLog.OpInsert))
      .withColumn("__seq", lit(1L))
      .unionByName(docs.filter(col("doc_id") === 360) // near-dup of 8, 12
        .withColumn("__op", lit(ChangeLog.OpDelete))
        .withColumn("__seq", lit(2L)))
    NearDupIndex.sync(spark, idx, changes, "doc_id", "text")
    val rebuilt = NearDupIndex.persist(
      docs.filter(col("doc_id") >= 150 && col("doc_id") =!= 360),
      "doc_id", "text", tmp("rebuild"))
    val delta = docs.filter(col("doc_id") < 60)
    val synced = pairs(NearDupIndex.nearDupsAgainst(spark,
      NearDupIndex.load(spark, root), delta, "doc_id", "text", 0.5))
    val fresh = pairs(NearDupIndex.nearDupsAgainst(spark, rebuilt,
      delta, "doc_id", "text", 0.5))
    assert(synced === fresh && synced.nonEmpty)
    assert(!synced.exists(_._1 == 360L), "deleted doc no longer pairs")
    assert(truth(_ >= 150, _ < 60).exists(_._1 == 360L),
      "precondition: 360 pairs with a delta doc before the delete")
    // layout-level equivalence, not just query-level: same posting rows
    val a = spark.read.parquet(root).select("band", "bucket", "id")
    val b = spark.read.parquet(tmp("rebuild"))
      .select("band", "bucket", "id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("sync replay is idempotent (at-least-once foreachBatch safe)") {
    val root = tmp("replay")
    val idx = NearDupIndex.persist(docs.filter(col("doc_id") >= 300),
      "doc_id", "text", root)
    val changes = docs.filter(col("doc_id") >= 200 && col("doc_id") < 300)
      .withColumn("__op", lit(ChangeLog.OpInsert))
      .withColumn("__seq", lit(1L))
    NearDupIndex.sync(spark, idx, changes, "doc_id", "text")
    val once = spark.read.parquet(root).count()
    NearDupIndex.sync(spark, idx, changes, "doc_id", "text")
    assert(spark.read.parquet(root).count() === once,
      "re-applied batch must not duplicate postings")
  }

  test("Maintenance.compactParquet is safe over the synced layout: " +
      "probe results unchanged, per-dir file invariant kept") {
    val root = tmp("compact")
    val idx = NearDupIndex.persist(docs.filter(col("doc_id") >= 300),
      "doc_id", "text", root)
    // two sync batches fragment the touched dirs with extra files
    Seq((200L, 250L), (250L, 300L)).foreach { case (lo, hi) =>
      NearDupIndex.sync(spark, idx,
        docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
          .withColumn("__op", lit(ChangeLog.OpInsert))
          .withColumn("__seq", lit(1L)),
        "doc_id", "text")
    }
    val delta = docs.filter(col("doc_id") < 60)
    val before = pairs(NearDupIndex.nearDupsAgainst(spark, idx, delta,
      "doc_id", "text", 0.5))
    val rep = graft.operators.Maintenance.compactParquet(spark, root)
    val repDocs = graft.operators.Maintenance
      .compactParquet(spark, root + "_docs")
    // sync's repartition-by-dir + dynamic overwrite keeps ONE file per
    // bucket dir, so there is nothing to narrow — compaction must
    // recognize the hive layout, keep the dirs (pruning depends on
    // them), and change nothing
    assert(rep.filesAfter <= rep.filesBefore, s"postings: $rep")
    assert(repDocs.filesAfter <= repDocs.filesBefore, s"docs: $repDocs")
    spark.sharedState.cacheManager.clearCache()
    val after = pairs(NearDupIndex.nearDupsAgainst(spark, idx, delta,
      "doc_id", "text", 0.5))
    assert(after === before && after.nonEmpty)
  }

  test("load round-trips the build parameters") {
    val idx = NearDupIndex.persist(docs.limit(50), "doc_id", "text",
      tmp("meta"), k = 8, bands = 2, n = 4, algo = "md5", buckets = 16)
    assert(NearDupIndex.load(spark, tmp("meta")) === idx)
  }

  test("mergeShards: shard builds + file-move merge probe == full " +
      "build probe; parameter guard rejects mismatches") {
    val corpus = docs.filter($"doc_id" >= 60)
    val delta = docs.filter($"doc_id" < 60)
    val full = NearDupIndex.persist(corpus, "doc_id", "text",
      tmp("mrg_full"))
    val shardPaths = (0 to 1).map { p =>
      val sp = tmp(s"mrg_s$p")
      NearDupIndex.persist(corpus.filter($"doc_id" % 2 === p),
        "doc_id", "text", sp)
      sp
    }
    val merged = NearDupIndex.mergeShards(spark, shardPaths,
      tmp("mrg_dest"))
    assert(merged.copy(path = full.path) === full,
      "merged handle must carry the shards' parameters")
    assert(shardPaths.forall(p => !new java.io.File(p).exists()))
    val a = pairs(NearDupIndex.nearDupsAgainst(spark, merged, delta,
      "doc_id", "text", threshold = 0.5))
    val b = pairs(NearDupIndex.nearDupsAgainst(spark, full, delta,
      "doc_id", "text", threshold = 0.5))
    assert(a.nonEmpty && a === b)
    // a shard banded differently is rejected before any file moves
    NearDupIndex.persist(corpus.filter($"doc_id" % 2 === 0),
      "doc_id", "text", tmp("mrg_bad"), bands = 8)
    NearDupIndex.persist(corpus.filter($"doc_id" % 2 === 1),
      "doc_id", "text", tmp("mrg_ok"))
    val e = intercept[IllegalArgumentException] {
      NearDupIndex.mergeShards(spark,
        Seq(tmp("mrg_bad"), tmp("mrg_ok")), tmp("mrg_dest2"))
    }
    assert(e.getMessage.contains("different parameters"))
  }
}
