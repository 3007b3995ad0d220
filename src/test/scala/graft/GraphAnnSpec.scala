package graft

import graft.functions.Metric
import graft.search.{GraphAnn, Knn}
import org.apache.spark.sql.functions._

class GraphAnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet").cache()
  private lazy val corpus = emb.filter($"vec_id" >= 10)
  private lazy val queries = emb.filter($"vec_id" < 10)

  private lazy val exactTop3: Map[Long, Seq[Long]] =
    Knn.batchQuery(corpus, queries, "embedding", "vec_id", "embedding",
      "vec_id", k = 3, Metric.L2)
      .select("query_id", "rank", "vec_id").collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank"))
        .map(_.getAs[Long]("vec_id")).toSeq)
      .toMap

  private def topkMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank"))
        .map(_.getAs[Long]("vec_id")).toSeq)
      .toMap

  test("exact graph has m rows per node, no self-loops") {
    val g = GraphAnn.buildGraphExact(corpus, "embedding", "vec_id", m = 6)
    val perSrc = g.edges.groupBy("__src").count().select("count")
      .as[Long].collect()
    assert(perSrc.nonEmpty && perSrc.forall(_ == 6L))
    assert(g.edges.filter($"__src" === $"__dst").count() === 0L)
  }

  test("beam search with a generous beam reaches recall >= 0.9") {
    // best-first expansion + mod-5 seeded entries (the coarse layer):
    // simulated mean recall on this data is 1.0; the bar stays 0.9
    val g = GraphAnn.buildGraphExact(corpus, "embedding", "vec_id", m = 8)
    val r = GraphAnn.queryGraph(g, corpus, queries, "vec_id", "embedding",
      "vec_id", "embedding", k = 3, entries = 8, beam = 8, hops = 8,
      Metric.L2, entryMod = 5L)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val recalls = exactTop3.map { case (q, exact) =>
      r.get(q).map(f => exact.count(f.contains).toDouble / exact.size)
        .getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall $mean too low")
  }

  test("layered entry holds the recall bar at a mod-squared entry scan") {
    // same layer-0 search as the generous-beam test, but the entry
    // descends mod-25 pool -> layer-1 graph walk -> seeds, instead of
    // scanning the whole mod-5 sample: entry scan cost cut ~5x
    val g = GraphAnn.buildGraphExact(corpus, "embedding", "vec_id", m = 8)
    val entry = GraphAnn.buildEntryGraphExact(corpus, "embedding",
      "vec_id", entryMod = 5L, m1 = 4)
    val l1Count = corpus.filter($"vec_id" % 5 === 0).count()
    val l2Count = corpus.filter($"vec_id" % 25 === 0).count()
    assert(l2Count * 3 < l1Count,
      s"mod-squared pool ($l2Count) must be well under the mod pool ($l1Count)")
    val r = GraphAnn.queryGraphLayered(g, entry, corpus, queries,
      "vec_id", "embedding", "vec_id", "embedding", k = 3, entries = 8,
      beam = 8, hops = 8, entryMod = 5L, Metric.L2,
      l2Entries = 2, l1Beam = 4, l1Hops = 2)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val recalls = exactTop3.map { case (q, exact) =>
      r.get(q).map(f => exact.count(f.contains).toDouble / exact.size)
        .getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean layered recall $mean too low")
  }

  test("layered entry is deterministic run to run") {
    val g = GraphAnn.buildGraphExact(corpus, "embedding", "vec_id", m = 6)
    val entry = GraphAnn.buildEntryGraphExact(corpus, "embedding",
      "vec_id", entryMod = 5L, m1 = 4)
    def run() = topkMap(GraphAnn.queryGraphLayered(g, entry, corpus,
      queries, "vec_id", "embedding", "vec_id", "embedding", k = 3,
      entries = 4, beam = 4, hops = 3, entryMod = 5L, Metric.L2))
    assert(run() === run())
  }

  test("md5 level gates: pools shrink geometrically and nest") {
    val n = corpus.count()
    val l1 = corpus.filter(GraphAnn.hnswLevelGate($"vec_id", 5, 1))
      .select("vec_id").as[Long].collect().toSet
    val l2 = corpus.filter(GraphAnn.hnswLevelGate($"vec_id", 5, 2))
      .select("vec_id").as[Long].collect().toSet
    assert(l1.nonEmpty && l2.nonEmpty)
    assert(l2.subsetOf(l1), "level-2 pool must nest inside level-1")
    assert(l1.size < n / 2 && l1.size > n / 15,
      s"level-1 draw ~n/5: ${l1.size} of $n")
    assert(l2.size * 2 < l1.size,
      s"level-2 pool must be well under level-1: ${l2.size}/${l1.size}")
  }

  test("multi-layer HNSW holds the recall bar with a base²-smaller " +
    "top scan; every layer persisted answers identically") {
    val g = GraphAnn.buildHnswExact(corpus, "embedding", "vec_id",
      m = 8, mUpper = 4, base = 5, levels = 2)
    assert(g.uppers.size === 2)
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val r = df.collect().groupBy(_.getAs[Long]("query_id"))
        .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
      val rs = exactTop3.map { case (q, exact) =>
        r.get(q).map(f => exact.count(f.contains).toDouble / exact.size)
          .getOrElse(0.0)
      }
      rs.sum / rs.size
    }
    val mem = GraphAnn.queryHnsw(g, corpus, queries, "vec_id",
      "embedding", "vec_id", "embedding", k = 3, entries = 8, beam = 8,
      hops = 8, Metric.L2, topEntries = 2, upperBeam = 4, upperHops = 2)
    val memRecall = recallOf(mem)
    assert(memRecall >= 0.9, s"mean HNSW recall $memRecall too low")
    val dir = java.nio.file.Files.createTempDirectory("hnsw_p")
      .toString + "/g"
    val ph = GraphAnn.persistHnsw(g, dir, buckets = 16)
    assert(new java.io.File(dir + "_l1").exists()
      && new java.io.File(dir + "_l2").exists(),
      "each upper layer persists as its own layout")
    val disk = GraphAnn.queryPersistedHnsw(spark, ph, corpus, queries,
      "vec_id", "embedding", "vec_id", "embedding", k = 3, entries = 8,
      beam = 8, hops = 8, Metric.L2, topEntries = 2, upperBeam = 4,
      upperHops = 2)
    assert(topkMap(disk) === topkMap(mem),
      "persisted multi-layer descent must equal the in-memory one")
  }

  test("syncPersistedHnsw routes the batch per md5-gated layer; " +
    "deletes tombstone every layer a node lives on") {
    import graft.index.ChangeLog
    val initial = corpus.filter($"vec_id" < 440)
    val batch = emb.filter($"vec_id" >= 440)
    val gate1 = GraphAnn.hnswLevelGate($"vec_id", 5, 1)
    val batchL1 = batch.filter(gate1).select("vec_id").as[Long]
      .collect().toSet
    assert(batchL1.nonEmpty, "fixture needs gate-passing batch ids")
    val g = GraphAnn.buildHnswExact(initial, "embedding", "vec_id",
      m = 6, mUpper = 4, base = 5, levels = 1)
    val dir = java.nio.file.Files.createTempDirectory("hnsw_sync")
      .toString + "/g"
    val ph = GraphAnn.persistHnsw(g, dir, buckets = 16)
    val changes = batch
      .withColumn("__op", lit(ChangeLog.OpInsert))
      .withColumn("__seq", lit(1L))
    GraphAnn.syncPersistedHnsw(spark, ph, initial, changes, "vec_id",
      "embedding")
    // layer 0 gained out-edges for EVERY batch id; the upper layout
    // for exactly the gate-passing slice (membership is a pure
    // function of the id — same slice a fresh build would draw)
    val l0Srcs = spark.read.parquet(dir).select("__src").as[Long]
      .collect().toSet
    val l1Srcs = spark.read.parquet(dir + "_l1").select("__src")
      .as[Long].collect().toSet
    val batchIds = batch.select("vec_id").as[Long].collect().toSet
    assert(batchIds.subsetOf(l0Srcs))
    assert(batchL1.subsetOf(l1Srcs))
    assert((batchIds -- batchL1).forall(!l1Srcs.contains(_)),
      "non-gated batch ids must not reach the upper layout")
    // the synced persisted descent ≡ the in-memory descent over the
    // layouts' own (tombstone-filtered) edge sets
    val merged = emb.filter($"vec_id" >= 10)
    val memG = GraphAnn.HnswGraphs(
      GraphAnn.loadGraph(spark, ph.layer0),
      ph.uppers.map(GraphAnn.loadGraph(spark, _)), ph.base)
    val disk = GraphAnn.queryPersistedHnsw(spark, ph, merged, queries,
      "vec_id", "embedding", "vec_id", "embedding", k = 3, entries = 4,
      beam = 4, hops = 3, Metric.L2)
    val mem = GraphAnn.queryHnsw(memG, merged, queries, "vec_id",
      "embedding", "vec_id", "embedding", k = 3, entries = 4, beam = 4,
      hops = 3, Metric.L2)
    assert(topkMap(disk) === topkMap(mem))
    // delete a gate-passing id: tombstoned on BOTH layers, gone from
    // results even off a stale corpus snapshot
    val victim = batchL1.min
    GraphAnn.syncPersistedHnsw(spark, ph, merged,
      emb.filter($"vec_id" === victim)
        .withColumn("__op", lit(ChangeLog.OpDelete))
        .withColumn("__seq", lit(2L)),
      "vec_id", "embedding")
    Seq(ph.layer0, ph.uppers.head).foreach { pg =>
      val t = GraphAnn.loadTombstones(spark, pg)
      assert(t.isDefined &&
        t.get.filter(col("__id") === victim).count() === 1L,
        s"victim must tombstone layer at ${pg.path}")
    }
    val after = GraphAnn.queryPersistedHnsw(spark, ph, merged, queries,
      "vec_id", "embedding", "vec_id", "embedding", k = 3, entries = 4,
      beam = 4, hops = 3, Metric.L2)
    assert(after.filter($"vec_id" === victim).count() === 0L)
  }

  test("multi-layer HNSW is deterministic run to run") {
    val g = GraphAnn.buildHnswExact(corpus, "embedding", "vec_id",
      m = 6, mUpper = 4, base = 5, levels = 2)
    def run() = topkMap(GraphAnn.queryHnsw(g, corpus, queries,
      "vec_id", "embedding", "vec_id", "embedding", k = 3, entries = 4,
      beam = 4, hops = 3, Metric.L2))
    assert(run() === run())
  }

  test("beam search is deterministic run to run") {
    val g = GraphAnn.buildGraphExact(corpus, "embedding", "vec_id", m = 6)
    def run() = topkMap(GraphAnn.queryGraph(g, corpus, queries, "vec_id",
      "embedding", "vec_id", "embedding", k = 3, entries = 4, beam = 4,
      hops = 3, Metric.L2, entryMod = 5L))
    assert(run() === run())
  }

  test("LSH-built graph edges overlap the exact graph (recall >= 0.5)") {
    val exact = GraphAnn.buildGraphExact(corpus, "embedding", "vec_id",
      m = 6).edges.as[(Long, Long)].collect().toSet
    val lsh = GraphAnn.buildGraphLsh(corpus, "embedding", "vec_id",
      m = 6, tables = 8, bits = 4).edges.as[(Long, Long)].collect().toSet
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.5, s"edge recall $recall too low")
  }

  test("LSH-built graph beam search still finds near neighbors") {
    val g = GraphAnn.buildGraphLsh(corpus, "embedding", "vec_id", m = 8,
      tables = 8, bits = 4)
    val r = GraphAnn.queryGraph(g, corpus, queries, "vec_id", "embedding",
      "vec_id", "embedding", k = 3, entries = 8, beam = 8, hops = 8,
      Metric.L2, entryMod = 5L)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val recalls = exactTop3.map { case (q, exact) =>
      r.get(q).map(f => exact.count(f.contains).toDouble / exact.size)
        .getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall $mean too low")
  }

  test("search cost is bounded: candidate set <= entries + hops*beam*m") {
    val m = 6; val entries = 4; val beam = 4; val hops = 3
    val g = GraphAnn.buildGraphExact(corpus, "embedding", "vec_id", m)
    // k large enough to return the whole candidate set
    val all = GraphAnn.queryGraph(g, corpus, queries, "vec_id", "embedding",
      "vec_id", "embedding", k = 100000, entries = entries, beam = beam,
      hops = hops, Metric.L2)
    val maxCand = all.groupBy("query_id").count()
      .agg(max("count")).as[Long].head()
    assert(maxCand <= entries + hops * beam * m,
      s"candidate set $maxCand exceeds bound")
  }
}
