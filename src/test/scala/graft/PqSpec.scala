package graft

import graft.functions.Metric
import graft.search.{Knn, Pq}
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet").cache()
  private lazy val corpus = emb.filter($"vec_id" >= 10)
  private lazy val queries = emb.filter($"vec_id" < 10)

  private def key(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "rank", "vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("codes are m entries in [0, k)") {
    val cb = Pq.fit(corpus, "embedding", "vec_id", m = 8, k = 16)
    assert(cb.m === 8 && cb.dsub === 8 && cb.k === 16)
    val codes = corpus.select(Pq.encode($"embedding", cb).as("c"))
      .as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 8 && c.forall(j => j >= 0 && j < 16)))
  }

  test("degenerate c (all candidates survive) == exact brute force") {
    val cb = Pq.fit(corpus, "embedding", "vec_id", m = 8, k = 16)
    val n = corpus.count().toInt
    val pq = key(Pq.rerank(corpus, queries, "embedding", "vec_id",
      "embedding", "vec_id", k = 3, c = n, cb, Metric.Cosine))
    val exact = key(Knn.batchQuery(corpus, queries, "embedding", "vec_id",
      "embedding", "vec_id", k = 3, Metric.Cosine))
    assert(pq === exact)
  }

  test("realistic ADC pruning keeps useful recall") {
    // random uniform data punishes coarse subspaces — dsub=4 with a
    // 32-entry codebook measures 1.0 here (c=16 -> a ~10% coarse scan)
    val cb = Pq.fit(corpus, "embedding", "vec_id", m = 16, k = 32)
    val pq = Pq.rerank(corpus, queries, "embedding", "vec_id",
      "embedding", "vec_id", k = 3, c = 16, cb, Metric.Cosine)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val exact = Knn.batchQuery(corpus, queries, "embedding", "vec_id",
      "embedding", "vec_id", k = 3, Metric.Cosine)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val recalls = exact.map { case (q, ex) =>
      pq.get(q).map(f => ex.count(f.contains).toDouble / ex.size)
        .getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    info(s"PQ m=16 k=32 c=16 mean recall: $mean")
    assert(mean >= 0.9, s"mean recall $mean too low")
  }

  test("IVF-PQ at full probe equals flat PQ rerank") {
    import graft.search.Ann
    val cb = Pq.fit(corpus, "embedding", "vec_id", m = 16, k = 32)
    val index = Ann.buildIvfDeterministic(corpus, "embedding", "vec_id",
      k = 8)
    val flat = key(Pq.rerank(corpus, queries, "embedding", "vec_id",
      "embedding", "vec_id", k = 3, c = 4, cb, Metric.Cosine))
    val ivfpq = key(Pq.rerankOverIvf(index, queries, "vec_id",
      "embedding", "vec_id", "embedding", k = 3, c = 4, cb, nProbe = 8,
      Metric.Cosine))
    assert(ivfpq === flat)
  }

  test("IVF-PQ with real probe pruning still finds neighbors") {
    import graft.search.Ann
    val cb = Pq.fit(corpus, "embedding", "vec_id", m = 16, k = 32)
    val index = Ann.buildIvfDeterministic(corpus, "embedding", "vec_id",
      k = 8)
    val r = Pq.rerankOverIvf(index, queries, "vec_id", "embedding",
      "vec_id", "embedding", k = 3, c = 16, cb, nProbe = 4,
      Metric.Cosine)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val exact = Knn.batchQuery(corpus, queries, "embedding", "vec_id",
      "embedding", "vec_id", k = 3, Metric.Cosine)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val recalls = exact.map { case (q, ex) =>
      r.get(q).map(f => ex.count(f.contains).toDouble / ex.size)
        .getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    info(s"IVF-PQ nProbe=4/8 c=16 mean recall: $mean")
    assert(mean >= 0.3, s"mean recall $mean too low")
  }

  test("residual IVF-PQ: degenerate c at full probe equals exact " +
    "brute force (refine correctness through the residual path)") {
    import graft.search.Ann
    val index = Ann.buildIvfDeterministic(corpus, "embedding", "vec_id",
      k = 8)
    val cb = Pq.fitResidual(index, "embedding", "vec_id", m = 8, k = 16)
    val n = corpus.count().toInt
    val res = key(Pq.rerankOverIvfResidual(index, queries, "vec_id",
      "embedding", "vec_id", "embedding", k = 3, c = n, cb, nProbe = 8,
      Metric.Cosine))
    val exact = key(Knn.batchQuery(corpus, queries, "embedding", "vec_id",
      "embedding", "vec_id", k = 3, Metric.Cosine))
    assert(res === exact)
  }

  test("residual codebooks beat raw codebooks on CLUSTERED data at " +
    "equal bytes — the FAISS IVFPQ accuracy source") {
    import graft.search.Ann
    // 32 tight clusters in 64-dim (one-hot centers, ~5e-4 offsets)
    // against 16-entry codebooks: raw PQ cannot cover 32 cluster
    // positions with 16 entries per subspace, while the 32-cell
    // coarse quantizer absorbs the macro-structure and leaves the
    // fine quantizer only the tiny residual cloud — exactly the
    // division of labor that makes IVFPQ accurate at equal bytes
    val rows = (0L until 256L).map { id =>
      val c = (id % 32).toInt
      val v = Array.tabulate(64) { d =>
        val center = if (d == 2 * c) 1.0f else 0.0f
        center + (((id * 37 + d * 17) % 13).toInt - 6) * 0.0005f
      }
      (id, v.toSeq)
    }
    val cdf = rows.toDF("vec_id", "embedding")
    val index = Ann.buildIvfDeterministic(cdf, "embedding", "vec_id",
      k = 32)
    val cbRaw = Pq.fit(cdf, "embedding", "vec_id", m = 8, k = 16)
    val cbRes = Pq.fitResidual(index, "embedding", "vec_id", m = 8,
      k = 16)
    val rawD = cdf
      .select(Pq.adc(Pq.encode($"embedding", cbRaw),
        Pq.intQuant($"embedding"), cbRaw).as("d"))
      .agg(sum("d")).head().getLong(0)
    val resD = index.corpusWithCell
      .join(broadcast(index.centroids), Seq("__cell"))
      .withColumn("__ri", Pq.residualInt($"embedding", $"__centroid"))
      .select(Pq.adc(Pq.encode($"__ri", cbRes), $"__ri", cbRes).as("d"))
      .agg(sum("d")).head().getLong(0)
    info(s"clustered distortion raw=$rawD residual=$resD")
    assert(resD < rawD / 2,
      s"residual encoding must win decisively on clustered data: " +
        s"raw=$rawD residual=$resD")
    // Lloyd-trained residual codebooks minimize exactly this
    // objective — they must not lose to the first-k residual rows
    val cbResT = Pq.fitResidualTrained(index, "embedding", "vec_id",
      m = 8, k = 16, iters = 2, sampleN = 128)
    val resTD = index.corpusWithCell
      .join(broadcast(index.centroids), Seq("__cell"))
      .withColumn("__ri", Pq.residualInt($"embedding", $"__centroid"))
      .select(Pq.adc(Pq.encode($"__ri", cbResT), $"__ri", cbResT).as("d"))
      .agg(sum("d")).head().getLong(0)
    info(s"trained residual distortion=$resTD")
    assert(resTD <= resD,
      s"trained residual must not lose to first-k residuals: " +
        s"trained=$resTD firstk=$resD")
  }

  test("trained residual IVF-PQ: degenerate c at full probe equals " +
    "exact brute force") {
    import graft.search.Ann
    val index = Ann.buildIvfDeterministic(corpus, "embedding", "vec_id",
      k = 8)
    val cb = Pq.fitResidualTrained(index, "embedding", "vec_id",
      m = 8, k = 16, iters = 2, sampleN = 64)
    val n = corpus.count().toInt
    val res = key(Pq.rerankOverIvfResidual(index, queries, "vec_id",
      "embedding", "vec_id", "embedding", k = 3, c = n, cb, nProbe = 8,
      Metric.Cosine))
    val exact = key(Knn.batchQuery(corpus, queries, "embedding", "vec_id",
      "embedding", "vec_id", k = 3, Metric.Cosine))
    assert(res === exact)
  }

  test("encode + rerank are deterministic run to run") {
    val cb = Pq.fit(corpus, "embedding", "vec_id", m = 8, k = 16)
    def run() = key(Pq.rerank(corpus, queries, "embedding", "vec_id",
      "embedding", "vec_id", k = 3, c = 4, cb, Metric.Cosine))
    assert(run() === run())
  }
}
