package graft

import graft.embed.HashProjectionEmbedder
import graft.index.ChangeLog
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Drives the façade through the reference notebook's exact flow:
  * endpoint → delta-sync index (managed + self-managed modes) →
  * similarity_search (text + vector) → sync (reference
  * src/databricks/syntetic_data.py + query_endpoint.py). */
class VectorSearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val root = Files.createTempDirectory("graft_vs").toString

  test("managed-embedding index: ingest → search by query text") {
    val vs = new VectorSearch(spark, root)
    vs.createEndpoint("vector-search-endpoint")
    // the reference's 5-row synthetic corpus shape (id, text)
    val corpus = Seq(
      (1L, "spark is a distributed query engine"),
      (2L, "vector search retrieves nearest neighbors"),
      (3L, "dense embeddings encode text meaning"),
      (4L, "the cat sat on the mat"),
      (5L, "spark executes distributed dataframe queries")
    ).toDF("id", "text")
    val index = vs.createDeltaSyncIndex("vector-search-endpoint", corpus,
      "managed_idx", primaryKey = "id", embeddingSourceColumn = "text",
      embedder = new HashProjectionEmbedder(64))
    val hits = index.similaritySearch(Seq("id", "text"),
      queryText = "distributed spark query engine", numResults = 2)
    val rows = hits.collect()
    assert(rows.length === 2)
    assert(rows.map(_.getAs[Long]("id")).toSet.subsetOf(Set(1L, 5L)),
      "similar docs should be the spark/query ones")
    assert(hits.columns.toSeq === Seq("id", "text", "score"))
  }

  test("self-managed vectors index: search by query vector + sync") {
    val vs = new VectorSearch(spark, root)
    vs.createEndpoint("ep2")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val index = vs.createDeltaSyncIndex("ep2", emb.filter($"vec_id" < 100),
      "custom_idx", primaryKey = "vec_id",
      embeddingVectorColumn = "embedding", embeddingDimension = 64)
    val qv = emb.filter($"vec_id" === 0).select("embedding")
      .head().getSeq[Float](0)
    val hits = index.similaritySearch(Seq("vec_id"), qv, numResults = 3)
    assert(hits.collect().head.getAs[Long]("vec_id") === 0L,
      "self-match ranks first")
    // sync: delete 0, search again — 0 must vanish
    val del = emb.filter($"vec_id" === 0)
      .select($"vec_id", $"embedding", $"label",
        lit(ChangeLog.OpDelete).as("__op"), lit(1L).as("__seq"))
    index.sync(del)
    val after = index.similaritySearch(Seq("vec_id"), qv, numResults = 3)
    assert(!after.collect().map(_.getAs[Long]("vec_id")).contains(0L))
  }

  test("filtered similarity_search: pre-filter semantics, k matching rows") {
    val vs = new VectorSearch(spark, root)
    vs.createEndpoint("ep_filt")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter($"vec_id" < 100)
    val index = vs.createDeltaSyncIndex("ep_filt", emb, "filt_idx",
      primaryKey = "vec_id", embeddingVectorColumn = "embedding",
      embeddingDimension = 64)
    val qv = emb.filter($"vec_id" === 0).select("embedding")
      .head().getSeq[Float](0)
    val hits = index.similaritySearch(Seq("vec_id", "label"), qv,
      numResults = 3, filters = Map("label" -> 1)).collect()
    assert(hits.length === 3, "pre-filtering still fills k")
    assert(hits.forall(_.getAs[Int]("label") === 1), "every hit matches")
    // consistency: cosine is scale-invariant, so filtering the raw
    // corpus before an exact search must give the same ranking
    val expect = graft.search.Knn.singleQuery(
        spark.read.parquet(s"$sf/embeddings.parquet")
          .filter($"vec_id" < 100 && $"label" === 1),
        "embedding", "vec_id", qv, 3,
        graft.functions.Metric.Cosine, Seq("vec_id"))
      .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(hits.map(_.getAs[Long]("vec_id")).toSeq === expect)
  }

  test("fitted-embedder (TF-IDF) managed sync keeps scores in the " +
    "build-time space: sync ≡ rebuild") {
    import graft.embed.HashingTfIdfEmbedder
    val corpus = Seq(
      (1L, "spark is a distributed query engine"),
      (2L, "vector search retrieves nearest neighbors"),
      (3L, "dense embeddings encode text meaning"),
      (4L, "the cat sat on the mat"),
      (5L, "spark executes distributed dataframe queries")
    ).toDF("id", "text")
    val update = Seq((4L, "spark query planning with catalyst"))
      .toDF("id", "text")

    // sync path: build on corpus, then upsert row 4 through the index
    val vs = new VectorSearch(spark, root)
    vs.createEndpoint("ep_tfidf")
    val idx = vs.createDeltaSyncIndex("ep_tfidf", corpus, "tfidf_idx",
      primaryKey = "id", embeddingSourceColumn = "text",
      embedder = new HashingTfIdfEmbedder(64))
    idx.sync(update
      .withColumn("__op", lit(ChangeLog.OpUpdate))
      .withColumn("__seq", lit(1L)))
    val synced = idx.similaritySearch(Seq("id"),
      queryText = "distributed spark query engine", numResults = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))

    // rebuild path: embed the UPDATED corpus with the ORIGINAL fitted
    // model (the semantics delta-sync promises: same weighting space)
    val fitted = new HashingTfIdfEmbedder(64).fit(corpus, "text")
    val rebuilt = fitted.transform(
      corpus.filter($"id" =!= 4L).unionByName(update), "text")
    val vs2 = new VectorSearch(spark, root + "_rb")
    vs2.createEndpoint("ep_rb")
    val idx2 = vs2.createDeltaSyncIndex("ep_rb", rebuilt, "tfidf_rb",
      primaryKey = "id", embeddingVectorColumn = "embedding",
      embeddingDimension = 64)
    val qv = fitted.transform(
      Seq(Tuple1("distributed spark query engine")).toDF("q"), "q")
      .select("embedding").head().getSeq[Float](0)
    val rebuiltHits = idx2.similaritySearch(Seq("id"), qv, numResults = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))

    assert(synced.map(_._1).toSeq === rebuiltHits.map(_._1).toSeq,
      "rankings must agree between sync and fitted rebuild")
    synced.zip(rebuiltHits).foreach { case ((_, s1), (_, s2)) =>
      assert(math.abs(s1 - s2) < 1e-6, "scores must be comparable")
    }
  }

  test("batch query-text search: one plan, same results as the " +
    "per-query loop") {
    val vs = new VectorSearch(spark, root)
    vs.createEndpoint("ep_batch")
    val corpus = Seq(
      (1L, "spark is a distributed query engine"),
      (2L, "vector search retrieves nearest neighbors"),
      (3L, "dense embeddings encode text meaning"),
      (4L, "the cat sat on the mat"),
      (5L, "spark executes distributed dataframe queries")
    ).toDF("id", "text")
    val index = vs.createDeltaSyncIndex("ep_batch", corpus, "batch_idx",
      primaryKey = "id", embeddingSourceColumn = "text",
      embedder = new HashProjectionEmbedder(64))
    val queryTexts = Seq(
      (10L, "distributed spark query engine"),
      (11L, "nearest neighbor retrieval"),
      (12L, "a cat on a mat")
    ).toDF("qid", "qtext")
    val batch = index.similaritySearchBatch(Seq("id"), queryTexts,
      textCol = "qtext", queryIdCol = "qid", numResults = 2)
    val got = batch.collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank"))
        .map(r => (r.getAs[Long]("id"), r.getAs[Double]("score"))).toSeq)
      .toMap
    assert(got.keySet === Set(10L, 11L, 12L))
    // parity with the single-text path, scores included
    queryTexts.collect().foreach { qr =>
      val single = index.similaritySearch(Seq("id"),
        queryText = qr.getString(1), numResults = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val b = got(qr.getLong(0))
      assert(b.map(_._1) === single.map(_._1),
        s"ranking mismatch for query ${qr.getLong(0)}")
      b.zip(single).foreach { case ((_, s1), (_, s2)) =>
        assert(math.abs(s1 - s2) < 1e-9) }
    }
  }

  test("text search on a self-managed index fails with guidance") {
    val vs = new VectorSearch(spark, root)
    vs.createEndpoint("ep3")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").limit(10)
    val index = vs.createDeltaSyncIndex("ep3", emb, "custom_idx2",
      "vec_id", "embedding", 64)
    val err = intercept[IllegalStateException] {
      index.similaritySearch(Seq("vec_id"), queryText = "hi", numResults = 1)
    }
    assert(err.getMessage.contains("self-managed"))
  }

  test("persisted catalog: a fresh VectorSearch re-opens built indexes") {
    val croot = Files.createTempDirectory("graft_cat").toString
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val vs1 = new VectorSearch(spark, croot)
    vs1.createEndpoint("ep_persist")
    vs1.createDeltaSyncIndex("ep_persist", emb.filter($"vec_id" < 50),
      "persisted_idx", "vec_id", "embedding", 64)
    // a brand-new façade over the same root (fresh session state)
    val vs2 = new VectorSearch(spark, croot)
    val reopened = vs2.getIndex("persisted_idx")
    assert(reopened.isDefined, "index metadata must survive the catalog")
    val qv = emb.filter($"vec_id" === 1).select("embedding")
      .head().getSeq[Float](0)
    val hits = reopened.get.similaritySearch(Seq("vec_id"), qv, 3).collect()
    assert(hits.head.getAs[Long]("vec_id") === 1L)
    assert(reopened.get.meta.dim === 64 &&
      reopened.get.meta.metric === graft.functions.Metric.Cosine)
  }

  test("managed TF-IDF index reopened in a new session keeps its " +
    "fitted embedder") {
    import graft.embed.HashingTfIdfEmbedder
    val croot = Files.createTempDirectory("graft_cat2").toString
    val corpus = Seq(
      (1L, "spark is a distributed query engine"),
      (2L, "vector search retrieves nearest neighbors"),
      (3L, "the cat sat on the mat")
    ).toDF("id", "text")
    val vs1 = new VectorSearch(spark, croot)
    vs1.createEndpoint("ep_m")
    val built = vs1.createDeltaSyncIndex("ep_m", corpus, "m_idx",
      primaryKey = "id", embeddingSourceColumn = "text",
      embedder = new HashingTfIdfEmbedder(32))
    val orig = built.similaritySearch(Seq("id"),
      queryText = "distributed spark query", numResults = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // new façade over the same root: embedder loads from disk
    val vs2 = new VectorSearch(spark, croot)
    val reopened = vs2.getIndex("m_idx")
    assert(reopened.isDefined)
    val again = reopened.get.similaritySearch(Seq("id"),
      queryText = "distributed spark query", numResults = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(again.map(_._1) === orig.map(_._1))
    orig.zip(again).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) < 1e-9) }
  }

  test("endpoint must exist before index creation") {
    val vs = new VectorSearch(spark, root)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").limit(5)
    intercept[IllegalArgumentException] {
      vs.createDeltaSyncIndex("missing", emb, "idx", "vec_id",
        "embedding", 64)
    }
  }
}
