package graft

import graft.functions.Metric
import graft.search.{Knn, Rerank}
import org.apache.spark.sql.functions._

class RerankSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet").cache()
  private lazy val corpus = emb.filter($"vec_id" >= 10)
  private lazy val queries = emb.filter($"vec_id" < 10)

  private def collectTopK(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "rank", "vec_id").collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(
        _.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("vec_id")).toSeq)
      .toMap

  private lazy val exact = collectTopK(
    Knn.batchQuery(corpus, queries, "embedding", "vec_id", "embedding",
      "vec_id", k = 3, Metric.Cosine))

  test("c spanning the corpus degenerates to exact KNN") {
    val n = corpus.count().toInt
    val r = collectTopK(Rerank.truncated(corpus, queries, "embedding",
      "vec_id", "embedding", "vec_id", k = 3, c = n / 3 + 1,
      coarseDims = 8, Metric.Cosine))
    assert(r === exact)
  }

  test("full-dimension coarse stage degenerates to exact KNN at c=1") {
    val dim = 64
    val r = collectTopK(Rerank.truncated(corpus, queries, "embedding",
      "vec_id", "embedding", "vec_id", k = 3, c = 1,
      coarseDims = dim, Metric.Cosine))
    assert(r === exact)
  }

  test("IVF-fed rerank with full probe equals full-corpus rerank") {
    import graft.search.Ann
    val index = Ann.buildIvfDeterministic(corpus, "embedding", "vec_id",
      k = 8)
    val full = collectTopK(Rerank.truncated(corpus, queries, "embedding",
      "vec_id", "embedding", "vec_id", k = 3, c = 4, coarseDims = 8,
      Metric.Cosine))
    val ivf = collectTopK(Rerank.truncatedOverIvf(index, queries,
      "vec_id", "embedding", "vec_id", "embedding", k = 3, c = 4,
      coarseDims = 8, nProbe = 8, Metric.Cosine))
    assert(ivf === full)
  }

  test("IVF-fed rerank with real probe pruning still finds neighbors") {
    import graft.search.Ann
    val index = Ann.buildIvfDeterministic(corpus, "embedding", "vec_id",
      k = 8)
    val r = collectTopK(Rerank.truncatedOverIvf(index, queries,
      "vec_id", "embedding", "vec_id", "embedding", k = 3, c = 8,
      coarseDims = 32, nProbe = 4, Metric.Cosine))
    assert(r.nonEmpty)
    val recalls = exact.map { case (q, ex) =>
      r.get(q).map(f => ex.count(f.contains).toDouble / ex.size)
        .getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    info(s"IVF(4/8 cells) + prefix-32 rerank mean recall: $mean")
    assert(mean >= 0.3, s"mean recall $mean too low")
  }

  test("SQ8 quantized rerank: byte storage, degenerate c equals exact, " +
    "high recall at realistic c") {
    import graft.search.Sq8
    val stats = Sq8.fit(corpus, "embedding")
    // storage form really is one byte per dimension (the 4x scan win)
    val enc = corpus.select(Sq8.encode(col("embedding"), stats).as("c"))
    assert(enc.schema("c").dataType ===
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ByteType, containsNull = false))
    assert(enc.limit(5).collect().forall(_.getSeq[Byte](0).length === 64))
    // c spanning the corpus degenerates to exact KNN
    val n = corpus.count().toInt
    val degen = collectTopK(Sq8.rerank(corpus, queries, "embedding",
      "vec_id", "embedding", "vec_id", k = 3, c = n / 3 + 1, stats))
    assert(degen === exact)
    // realistic candidate multiplier: full-width 8-bit codes carry far
    // more of the cosine than a dims-prefix, so recall should be high
    val r = collectTopK(Sq8.rerank(corpus, queries, "embedding",
      "vec_id", "embedding", "vec_id", k = 3, c = 4, stats))
    val recalls = exact.map { case (q, ex) =>
      ex.count(r(q).contains).toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall $mean too low for SQ8 coarse stage")
  }

  test("realistic rerank keeps k rows per query with high recall") {
    // half-dimension coarse stage: on near-isotropic synthetic vectors a
    // short prefix carries little of the full cosine, so recall is
    // asserted at 32 of 64 dims (the oracle query pins exactness
    // separately — this test is about the recall/cost knob)
    val r = collectTopK(Rerank.truncated(corpus, queries, "embedding",
      "vec_id", "embedding", "vec_id", k = 3, c = 8,
      coarseDims = 32, Metric.Cosine))
    assert(r.keySet === exact.keySet)
    assert(r.values.forall(_.length === 3))
    val recalls = exact.map { case (q, ex) =>
      ex.count(r(q).contains).toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall $mean too low for k*c=24 coarse pass")
  }

  test("mmr: lambda=1 is plain relevance order; a duplicate of the top " +
      "pick is deferred at lower lambda") {
    // candidates for one query: doc 1 and doc 2 are IDENTICAL vectors
    // (rel 0.99/0.98), doc 3 is orthogonal-ish with lower rel
    val cand = Seq(
      (7L, 1L, 0.99, Seq(1.0f, 0.0f)),
      (7L, 2L, 0.98, Seq(1.0f, 0.0f)),
      (7L, 3L, 0.50, Seq(0.0f, 1.0f)))
      .toDF("query_id", "pk", "rel", "vec")
    def picks(lambda: Double) =
      Rerank.mmr(cand, "query_id", "pk", "rel", "vec", k = 3, lambda)
        .orderBy("rank").select("pk").as[Long].collect().toSeq
    // pure relevance: 1, 2, 3
    assert(picks(1.0) === Seq(1L, 2L, 3L))
    // diversity-weighted at lambda=0.5: doc 2 duplicates doc 1
    // (cos=1) so its mmr = 0.5*0.98 - 0.5*1 = -0.01, while orthogonal
    // doc 3 scores 0.5*0.5 - 0.5*0 = 0.25 and jumps ahead
    assert(picks(0.5) === Seq(1L, 3L, 2L),
      "the near-duplicate must be deferred behind the diverse doc")
  }
}
