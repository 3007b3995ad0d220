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
}
