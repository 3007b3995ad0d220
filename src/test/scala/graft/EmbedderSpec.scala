package graft

import graft.embed.{HashProjectionEmbedder, HashingTfIdfEmbedder}
import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.functions._

class EmbedderSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .limit(100).cache()

  test("hash-projection embedder is deterministic and unit-norm") {
    val e = new HashProjectionEmbedder(32)
    val a = e.embed(docs, "text").select("doc_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = e.embed(docs, "text").select("doc_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a === b)
    a.values.foreach { v =>
      assert(v.length === 32)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-4)
    }
  }

  test("null/empty text embeds to null (excluded at index build)") {
    val e = new HashProjectionEmbedder(16)
    val df = Seq((1L, "hello world"), (2L, ""), (3L, null))
      .toDF("id", "text")
    val out = e.embed(df, "text").select("id", "embedding").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L).isDefined && out(2L).isEmpty && out(3L).isEmpty)
  }

  test("tfidf embedder: similar texts land closer than dissimilar ones") {
    val e = new HashingTfIdfEmbedder(64)
    val df = Seq(
      (1L, "spark query engine with vectors and joins"),
      (2L, "spark query engine with vectors and aggregates"),
      (3L, "completely unrelated cooking recipe about bread")
    ).toDF("doc_id", "text")
    val out = e.embed(df, "text")
    val vecs = out.select("doc_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    assert(cos(vecs(1L), vecs(2L)) > cos(vecs(1L), vecs(3L)))
  }

  test("fitted tfidf embeds a delta batch in the build-time IDF space") {
    val e = new HashingTfIdfEmbedder(64)
    val corpus = Seq(
      (1L, "spark query engine with vectors and joins"),
      (2L, "spark query engine with vectors and aggregates"),
      (3L, "completely unrelated cooking recipe about bread"),
      (4L, "another doc about spark joins and shuffles")
    ).toDF("doc_id", "text")
    val fitted = e.fit(corpus, "text")
    val full = fitted.transform(corpus, "text")
      .select("doc_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // re-embedding doc 2 alone through the FITTED transform must produce
    // the exact build-time vector; Embedder.embed (re-fit on the 1-row
    // batch) would not — that was the sync-corruption bug
    val delta = Seq((2L, "spark query engine with vectors and aggregates"))
      .toDF("doc_id", "text")
    val deltaVec = fitted.transform(delta, "text")
      .select("embedding").head().getSeq[Float](0)
    assert(deltaVec === full(2L))
  }

  test("embedded corpus flows into index + knn end-to-end") {
    val e = new HashProjectionEmbedder(32)
    val corpus = e.embed(docs, "text")
    val qv = corpus.filter($"doc_id" === 1).select("embedding")
      .head().getSeq[Float](0)
    val top = graft.search.Knn.singleQuery(corpus, "embedding", "doc_id",
      qv, 3, graft.functions.Metric.Cosine).collect()
    assert(top.length === 3)
    // doc 1 itself must rank first with cosine ~ 1
    assert(top.head.getAs[Long]("doc_id") === 1L)
    assert(math.abs(top.head.getAs[Double]("score") - 1.0) < 1e-6)
  }
}
