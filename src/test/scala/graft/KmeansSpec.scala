package graft

import graft.functions.Metric
import graft.search.{Ann, Kmeans, Knn, Pq}
import org.apache.spark.sql.functions._

/** The deterministic quantizer trainer: reproducibility, objective
  * improvement, and its composition into the PQ / IVF legs. */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet").cache()
  private lazy val corpus = emb.filter($"vec_id" >= 10)
  private lazy val queries = emb.filter($"vec_id" < 10)

  private def distortion(points: Array[Array[Long]],
      cents: Array[Array[Long]]): Long =
    points.map { p =>
      cents.map { c =>
        p.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
      }.min
    }.sum

  test("sampleQuantized is a pure function of the corpus") {
    val s1 = Kmeans.sampleQuantized(corpus, "embedding", "vec_id", 64)
    val s2 = Kmeans.sampleQuantized(corpus, "embedding", "vec_id", 64)
    assert(s1.length === 64)
    assert(s1.map(_.toSeq).toSeq === s2.map(_.toSeq).toSeq)
  }

  test("lloyd strictly reduces the training objective vs its init") {
    val pts = Kmeans.sampleQuantized(corpus, "embedding", "vec_id", 128)
    val init = pts.take(16)
    val trained = Kmeans.lloyd(pts, 16, iters = 3)
    assert(distortion(pts, trained) < distortion(pts, init),
      "3 Lloyd iterations must beat the raw init on the sample")
  }

  test("lloyd is iteration-monotone on the training sample") {
    val pts = Kmeans.sampleQuantized(corpus, "embedding", "vec_id", 128)
    val d = (0 to 3).map(i => distortion(pts, Kmeans.lloyd(pts, 16, i)))
    assert(d.sliding(2).forall { case Seq(a, b) => b <= a },
      s"distortion must not increase across iterations: $d")
  }

  test("lloyd keeps a centroid that loses all members") {
    // two far clusters + one init centroid planted between and beyond:
    // centroid 2 (from point 2) captures nothing after the first
    // assignment shift and must survive unchanged
    val pts = Array(
      Array(0L, 0L), Array(1L, 0L), Array(1000L, 0L), Array(1001L, 0L),
      Array(0L, 1L), Array(1L, 1L))
    val cents = Kmeans.lloyd(pts, 3, iters = 2)
    assert(cents.length === 3)
    assert(cents.forall(_.length === 2))
  }

  test("trained PQ codebooks beat first-k on corpus-wide distortion") {
    val cbF = Pq.fit(corpus, "embedding", "vec_id", m = 16, k = 32)
    val cbT = Pq.fitTrained(corpus, "embedding", "vec_id", m = 16, k = 32,
      iters = 2, sampleN = 128)
    def total(cb: Pq.Codebooks): Long = corpus
      .withColumn("__d", Pq.adc(Pq.encode($"embedding", cb),
        Pq.intQuant($"embedding"), cb))
      .agg(sum("__d")).head().getLong(0)
    val (f, t) = (total(cbF), total(cbT))
    assert(t < f, s"trained distortion $t must be < firstk $f")
  }

  test("trained IVF at full probe still returns the exact top-k") {
    val idx = Ann.buildIvfTrained(corpus, "embedding", "vec_id", k = 8,
      iters = 2, sampleN = 128)
    val exact = Knn.batchQuery(corpus, queries, "embedding", "vec_id",
      "embedding", "vec_id", k = 3, Metric.Cosine)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank"))
        .map(_.getAs[Long]("vec_id")).toSeq).toMap
    val r = Ann.queryIvf(idx, queries, "vec_id", "embedding", "vec_id",
      "embedding", k = 3, nProbe = 8, Metric.Cosine)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank"))
        .map(_.getAs[Long]("vec_id")).toSeq).toMap
    assert(r === exact)
  }

  test("trained IVF centroids are exact in Float32 (no replay drift)") {
    val idx = Ann.buildIvfTrained(corpus, "embedding", "vec_id", k = 16,
      iters = 2, sampleN = 128)
    val cents = idx.centroids.select("__centroid").collect()
      .map(_.getSeq[Float](0))
    // every component is y/2^20 for integer y: scaling back must be
    // integral, or the SQL double replay would diverge from the engine
    cents.flatten.foreach { x =>
      val y = x.toDouble * Pq.Scale
      assert(y == math.rint(y), s"centroid component $x not on the grid")
    }
  }
}
