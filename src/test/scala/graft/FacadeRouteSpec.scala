package graft

import graft.index.IndexKinds
import org.apache.spark.sql.functions._

/** The façade's index-kind routing: one `similarity_search` entry
  * point, engine-side dispatch to the kind's persisted layout — plan
  * shape, column contract, metadata round-trip, and sync consistency.
  * Result correctness vs the direct legs is the FacadeQueries oracle
  * gate; this spec asserts the things a hash can't see. */
class FacadeRouteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet(s"$sf/embeddings.parquet")
  private def corpus = emb.filter($"vec_id" >= 5)
  private def queries = emb.filter($"vec_id" < 5)

  private def mkIndex(name: String, kind: String,
      options: Map[String, String] = Map.empty): Index = {
    val root = java.nio.file.Files
      .createTempDirectory(s"graft_facade_$name").toString
    val vs = new VectorSearch(spark, root)
    vs.createEndpoint("ep")
    vs.createDeltaSyncIndex("ep", corpus, name, "vec_id", "embedding",
      64, kind, options)
  }

  test("ivf kind: the routed search executes against the cell-pruned " +
      "persisted layout, not a corpus scan") {
    spark.sharedState.cacheManager.clearCache()
    val idx = mkIndex("plan_ivf", "ivf",
      Map("cells" -> "16", "nProbe" -> "4"))
    val df = idx.search(queries, "vec_id", "embedding", 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("__ivf"),
      s"routed plan must read the ivf layout:\n${plan.take(1500)}")
    assert(plan.contains("PartitionFilters: [__cell"),
      s"routed plan must prune cells at the listing:\n${plan.take(1500)}")
  }

  test("signlsh kind routes to the (table, code)-partitioned layout") {
    spark.sharedState.cacheManager.clearCache()
    val idx = mkIndex("plan_slsh", "signlsh",
      Map("tables" -> "4", "bits" -> "3"))
    val df = idx.search(queries, "vec_id", "embedding", 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("__signlsh") && plan.contains("PartitionFilters"),
      s"routed plan must prune bucket dirs:\n${plan.take(1500)}")
  }

  test("sq8 kind: the routed coarse stage scans the byte-code file, " +
      "not the vectors") {
    spark.sharedState.cacheManager.clearCache()
    val idx = mkIndex("plan_sq8", "sq8", Map("c" -> "4"))
    val df = idx.search(queries, "vec_id", "embedding", 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("__sq8_codes"),
      s"routed plan must read the codes file:\n${plan.take(1500)}")
  }

  test("ivfpq kind: the routed scan prunes cells and reads the code " +
      "column") {
    spark.sharedState.cacheManager.clearCache()
    val idx = mkIndex("plan_ivfpq", "ivfpq",
      Map("cells" -> "8", "nProbe" -> "2", "m" -> "16",
        "codebookK" -> "16", "c" -> "4"))
    val df = idx.search(queries, "vec_id", "embedding", 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("__ivfpq"),
      s"routed plan must read the ivfpq layout:\n${plan.take(1500)}")
    assert(plan.contains("PartitionFilters: [__cell"),
      s"routed plan must prune cells at the listing:\n${plan.take(1500)}")
    assert(plan.contains("__codes"),
      s"coarse stage must scan the code column:\n${plan.take(1500)}")
  }

  test("pq kind splits its single cell into hash sub-cells — parallel " +
      "writers for the flat layout, results unchanged") {
    val idx = mkIndex("plan_pq", "pq",
      Map("m" -> "16", "codebookK" -> "16", "writers" -> "4"))
    val path = graft.index.IndexKinds.layoutPath(idx.meta)
    val cellDir = new java.io.File(path, "__cell=0")
    assert(cellDir.exists, "flat pq layout must keep its one cell dir")
    val subs = cellDir.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("__subcell="))
    assert(subs.length === 4,
      s"expected 4 sub-cell dirs under the flat cell, got ${subs.length}")
    assert(idx.search(queries, "vec_id", "embedding", 3)
      .groupBy("query_id").count().select(min("count"))
      .head().getLong(0) === 3, "split layout must still answer top-k")
  }

  test("trained ivf kind persists k-means centroids (different from " +
      "the deterministic first-k) and routes through them") {
    val det = mkIndex("tr_det", "ivf", Map("cells" -> "8", "nProbe" -> "8"))
    val tr = mkIndex("tr_kmeans", "ivf",
      Map("cells" -> "8", "nProbe" -> "8", "trained" -> "true",
        "iters" -> "2", "sampleN" -> "64"))
    def cents(idx: Index): Set[Seq[Float]] =
      spark.read.parquet(
          graft.index.IndexKinds.layoutPath(idx.meta) + "_centroids")
        .select("__centroid").as[Seq[Float]].collect().toSet
    assert(cents(det) !== cents(tr),
      "trained=true must persist k-means centroids, not the first-k rows")
    // full-probe search over both still agrees with exact top-k: at
    // nProbe = cells there is no pruning loss on either centroid set
    val qv = queries.orderBy("vec_id").select("embedding")
      .head().getSeq[Float](0)
    assert(tr.similaritySearch(Seq("vec_id"), qv, 3)
      .select("vec_id").as[Long].collect().toSeq ===
      det.similaritySearch(Seq("vec_id"), qv, 3)
        .select("vec_id").as[Long].collect().toSeq)
  }

  test("graph kind with layers=N builds, searches and compacts every " +
      "md5-gated layer as its own layout behind the routed call") {
    import graft.search.GraphAnn
    val idx = mkIndex("plan_hnsw", "graph",
      Map("layers" -> "2", "lbase" -> "5", "m" -> "6", "mUpper" -> "4",
        "buckets" -> "16", "entries" -> "4", "beam" -> "4",
        "hops" -> "3", "topEntries" -> "2", "upperBeam" -> "3",
        "upperHops" -> "2", "metric" -> "l2"))
    val path = IndexKinds.layoutPath(idx.meta)
    assert(new java.io.File(path + "_l1").exists()
      && new java.io.File(path + "_l2").exists(),
      "each upper layer persists beside the main layout")
    val routed = idx.search(queries, "vec_id", "embedding", 3)
      .select("query_id", "rank", "vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val direct = GraphAnn.queryPersistedHnsw(spark,
      GraphAnn.hnswHandle(path, m = 6, mUpper = 4, buckets = 16,
        base = 5, levels = 2),
      corpus, queries, "vec_id", "embedding", "vec_id", "embedding",
      k = 3, entries = 4, beam = 4, hops = 3,
      graft.functions.Metric.L2, topEntries = 2, upperBeam = 3,
      upperHops = 2)
      .select("query_id", "rank", "vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(routed === direct,
      "the routed descent must equal the direct persisted-hnsw leg")
    val touched = idx.optimize()
    assert(Set("edges", "edgesL1", "edgesL2", "corpus")
      .subsetOf(touched.keySet),
      s"optimize must compact every layer: $touched")
  }

  test("plaid kind routes token-bag build/search/sync/optimize; the " +
      "multi-vector contract rejects single-vector entry points") {
    import graft.functions.TextExpressions
    import graft.search.Plaid
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"text".isNotNull && trim($"text") =!= "")
    def bags(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"),
        transform(TextExpressions.wordShingles(col("text"), 3),
          sh => TextExpressions.md5FeatureEmbed(sh, 16)).as("toks"))
    val root = java.nio.file.Files
      .createTempDirectory("graft_facade_plaid_spec").toString
    val vs = new VectorSearch(spark, root)
    vs.createEndpoint("ep")
    val idx = vs.createDeltaSyncIndex("ep",
      bags(d.filter($"doc_id" >= 3 && $"doc_id" < 60)),
      "spec_plaid", "doc_id", "toks", 16, "plaid")
    val path = IndexKinds.layoutPath(idx.meta)
    assert(new java.io.File(path).exists()
      && new java.io.File(path + "_docs").exists()
      && new java.io.File(path + "_cents").exists(),
      "the coded store, _docs twin and centroid side file all persist")
    val q = bags(d.filter($"doc_id" < 3))
    def ranked(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "doc_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val routed = ranked(idx.search(q, "doc_id", "toks", 5))
    assert(routed.nonEmpty)
    val direct = ranked(Plaid.topKPersisted(spark,
      Plaid.Persisted(path), "doc_id",
      q.select(col("doc_id"),
        posexplode(col("toks")).as(Seq("__pi", "__tv"))),
      "doc_id", "__pi", "__tv", 5))
    assert(routed === direct,
      "the routed call must equal the direct persisted PLAID leg")
    // multi-vector guard: the single-vector similarity_search entry
    // point must refuse loudly, not feed a vector in as a bag
    intercept[IllegalArgumentException] {
      idx.similaritySearch(Seq("doc_id"), Seq.fill(16)(0.1f), 3)
    }
    // metadata filters don't survive token-level candidate generation
    intercept[IllegalArgumentException] {
      idx.search(q, "doc_id", "toks", 5, filters = Map("lang" -> "en"))
    }
    val touched = idx.optimize()
    assert(Set("store", "docs").subsetOf(touched.keySet),
      s"optimize must compact the coded store and _docs: $touched")
    val after = ranked(idx.search(q, "doc_id", "toks", 5))
    assert(after === routed, "compaction must preserve answers")
  }

  test("multi-vector prepare drops malformed tokens and empty bags; " +
      "__norm carries the bag's token count") {
    import graft.index.{IndexMeta, VectorIndex}
    import graft.functions.Metric
    val meta = IndexMeta("mv", "id", "toks", 2, Metric.Cosine,
      "/tmp/unused_mv", kind = IndexKinds.PlaidKind)
    val vi = new VectorIndex(meta)
    val src = Seq(
      (1L, Seq(Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))),
      (2L, Seq(Seq(1.0f))), // wrong-dim token -> bag empties -> row drops
      (3L, Seq.empty[Seq[Float]])).toDF("id", "toks")
    val out = vi.prepare(src).orderBy("id")
      .select($"id", size($"toks"), $"__norm").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
    assert(out.head.getInt(1) === 2 && out.head.getDouble(2) === 2.0)
  }

  test("similaritySearch returns the requested columns plus score on " +
      "a routed kind, ranked like the exact kind") {
    val ivf = mkIndex("cols_ivf", "ivf",
      Map("cells" -> "4", "nProbe" -> "4"))
    val qv = queries.orderBy("vec_id").select("embedding")
      .head().getSeq[Float](0)
    val rows = ivf.similaritySearch(Seq("vec_id", "label"), qv, 3)
    assert(rows.columns.toSeq === Seq("vec_id", "label", "score"))
    assert(rows.count() === 3)
    // nProbe = cells → no pruning loss: the routed top-k ids equal the
    // exact kind's for the same query
    val exact = mkIndex("cols_exact", "exact")
    val want = exact.similaritySearch(Seq("vec_id"), qv, 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(rows.select("vec_id").as[Long].collect().toSeq === want)
  }

  test("kind and options survive a catalog reopen (fresh session " +
      "object, same root)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_facade_reopen").toString
    val vs = new VectorSearch(spark, root)
    vs.createEndpoint("ep")
    vs.createDeltaSyncIndex("ep", corpus, "ridx", "vec_id", "embedding",
      64, "signlsh", Map("tables" -> "4", "bits" -> "3"))
    val reopened = new VectorSearch(spark, root).getIndex("ridx").get
    assert(reopened.meta.kind === "signlsh")
    assert(reopened.meta.options ===
      Map("tables" -> "4", "bits" -> "3"))
    // and it still routes: the reopened handle searches the layout
    assert(reopened.search(queries, "vec_id", "embedding", 3)
      .count() > 0)
  }

  test("sync maintains the routed layout: an upserted row becomes " +
      "retrievable, a deleted row disappears") {
    import graft.index.ChangeLog
    val idx = mkIndex("sync_ivf", "ivf",
      Map("cells" -> "4", "nProbe" -> "4"))
    // insert query-row 0 (absent from the >= 5 corpus) via CDF
    val ins = queries.filter($"vec_id" === 0)
      .withColumn("__op", lit(ChangeLog.OpInsert))
      .withColumn("__seq", lit(1L))
    idx.sync(ins)
    val qv0 = queries.filter($"vec_id" === 0).select("embedding")
      .head().getSeq[Float](0)
    val got = idx.similaritySearch(Seq("vec_id"), qv0, 1)
      .as[(Long, Double)].collect().head
    assert(got._1 === 0L, s"synced row must be its own nearest: $got")
    // delete it again — it must leave the routed results
    val del = queries.filter($"vec_id" === 0)
      .withColumn("__op", lit(ChangeLog.OpDelete))
      .withColumn("__seq", lit(2L))
    idx.sync(del)
    val after = idx.similaritySearch(Seq("vec_id"), qv0, 1)
      .as[(Long, Double)].collect().head
    assert(after._1 !== 0L, s"deleted row resurfaced: $after")
  }

  test("graph corpus sync is touched-dir-only: untouched pk-hash " +
      "bucket dirs stay byte-identical") {
    import graft.index.{ChangeLog, IndexKinds}
    val idx = mkIndex("corp_bkt", "graph",
      Map("m" -> "4", "buckets" -> "4", "entries" -> "2", "beam" -> "3",
        "hops" -> "2", "metric" -> "l2"))
    val corpusPath = IndexKinds.layoutPath(idx.meta) + "_corpus"
    // the side table is pk-hash-bucketed on disk (but the routed reads
    // never see the bucket column)
    assert(new java.io.File(corpusPath).listFiles()
      .exists(_.getName.startsWith("__cbkt=")),
      "corpus side table must be partitioned by __cbkt")
    assert(!IndexKinds.corpusTable(spark, idx.meta)
      .columns.contains("__cbkt"))
    def snapshot(): Map[String, Seq[(String, Long)]] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      new java.io.File(corpusPath).listFiles()
        .filter(_.getName.startsWith("__cbkt=")).map { d =>
          d.getName -> walk(d).filter(_.getName.endsWith(".parquet"))
            .map(f => (f.getName, f.lastModified())).sorted
        }.toMap
    }
    val before = snapshot()
    idx.sync(queries.filter($"vec_id" === 0)
      .withColumn("__op", lit(ChangeLog.OpInsert))
      .withColumn("__seq", lit(1L)))
    val after = snapshot()
    val touched = spark.range(1)
      .select(pmod(xxhash64(lit(0L)), lit(32L)).cast("int"))
      .head().getInt(0)
    val touchedDir = s"__cbkt=$touched"
    assert(after.contains(touchedDir),
      s"the synced pk's bucket dir must exist after sync")
    for ((dir, files) <- before if dir != touchedDir)
      assert(after(dir) === files,
        s"untouched corpus bucket $dir must stay byte-identical")
    // and the synced row is served by the routed corpus relation
    assert(IndexKinds.corpusTable(spark, idx.meta)
      .filter($"vec_id" === 0).count() === 1)
  }

  test("a pre-bucketing corpus side table is migrated once on sync, " +
      "then served and synced bucketed") {
    import graft.index.{ChangeLog, IndexKinds}
    val idx = mkIndex("corp_mig", "graph",
      Map("m" -> "4", "buckets" -> "4", "entries" -> "2", "beam" -> "3",
        "hops" -> "2", "metric" -> "l2"))
    val corpusPath = IndexKinds.layoutPath(idx.meta) + "_corpus"
    // regress the side table to the pre-r10 unpartitioned form
    val flat = IndexKinds.corpusTable(spark, idx.meta).localCheckpoint(true)
    val fs = new org.apache.hadoop.fs.Path(corpusPath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(corpusPath), true)
    flat.write.mode("overwrite").parquet(corpusPath)
    assert(!spark.read.parquet(corpusPath).columns.contains("__cbkt"))
    val before = flat.count()
    // the next sync migrates once, then merges touched-dir-only
    idx.sync(queries.filter($"vec_id" === 1)
      .withColumn("__op", lit(ChangeLog.OpInsert))
      .withColumn("__seq", lit(1L)))
    assert(new java.io.File(corpusPath).listFiles()
      .exists(_.getName.startsWith("__cbkt=")),
      "sync must leave the corpus bucketed")
    val served = IndexKinds.corpusTable(spark, idx.meta)
    assert(served.count() === before + 1,
      "migration must keep every row and add the synced one")
    assert(served.filter($"vec_id" === 1).count() === 1)
    // and the routed search still answers over the migrated corpus
    assert(idx.search(queries, "vec_id", "embedding", 3)
      .count() === 15)
  }

  test("hybrid kind demands query text; unknown kinds are rejected " +
      "at creation") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_facade_err").toString
    val vs = new VectorSearch(spark, root)
    vs.createEndpoint("ep")
    intercept[IllegalArgumentException] {
      vs.createDeltaSyncIndex("ep", corpus, "bad", "vec_id",
        "embedding", 64, "hnswlib")
    }
    val docs = corpus.withColumn("text",
      concat_ws(" ", lit("doc"), $"vec_id"))
    val hyb = vs.createDeltaSyncIndex("ep", docs, "hyb", "vec_id",
      "embedding", 64, "hybrid", Map("textCol" -> "text"))
    intercept[IllegalArgumentException] {
      hyb.search(queries, "vec_id", "embedding", 3).collect()
    }
  }

  test("managed-embedding mode composes with index kinds: the engine " +
      "embeds, builds the routed layout over its own embeddings, and " +
      "serves text queries through it") {
    import graft.embed.HashProjectionEmbedder
    val root = java.nio.file.Files
      .createTempDirectory("graft_facade_managed").toString
    val vs = new VectorSearch(spark, root)
    vs.createEndpoint("ep")
    val docs = Seq(
      (1L, "spark catalyst optimizer rules"),
      (2L, "parquet columnar storage format"),
      (3L, "spark catalyst optimizer rules engine"),
      (4L, "streaming watermark state store"),
      (5L, "vector search embedding index")
    ).toDF("doc_id", "text")
    // managed + ivf: the engine embeds and the routed layout indexes
    // ITS embeddings; a text query lands on the pruned ivf plan
    spark.sharedState.cacheManager.clearCache()
    val ivf = vs.createDeltaSyncIndex("ep", docs, "m_ivf", "doc_id",
      "text", new HashProjectionEmbedder(16), "ivf",
      Map("cells" -> "2", "nProbe" -> "2"))
    val hits = ivf.similaritySearch(Seq("doc_id"),
      "spark catalyst optimizer rules", 2)
    assert(hits.columns.toSeq === Seq("doc_id", "score"))
    assert(hits.select("doc_id").as[Long].collect().head === 1L ||
      hits.select("doc_id").as[Long].collect().head === 3L)
    // managed + hybrid: ONE text call fuses the keyword leg (postings
    // over the source text) with the vector leg (engine embeddings)
    val hyb = vs.createDeltaSyncIndex("ep", docs, "m_hyb", "doc_id",
      "text", new HashProjectionEmbedder(16), "hybrid",
      Map("n" -> "4", "buckets" -> "8"))
    assert(hyb.meta.options("textCol") === "text")
    val fused = hyb.similaritySearch(Seq("doc_id", "text"),
      "catalyst optimizer", 3)
    assert(fused.columns.toSeq === Seq("doc_id", "text", "rank"))
    val top = fused.select("doc_id").as[Long].collect()
    assert(top.nonEmpty && Set(1L, 3L).contains(top.head),
      s"keyword+vector fusion should surface a catalyst doc first: " +
        top.mkString(","))
  }

  test("exact kind keeps the original façade behavior byte-for-byte") {
    val idx = mkIndex("exact_compat", "exact")
    assert(idx.meta.kind === IndexKinds.Exact)
    val qv = queries.orderBy("vec_id").select("embedding")
      .head().getSeq[Float](0)
    val rows = idx.similaritySearch(Seq("vec_id"), qv, 5)
    assert(rows.columns.toSeq === Seq("vec_id", "score"))
    assert(rows.count() === 5)
  }
}
