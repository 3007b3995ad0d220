package graft

import graft.operators.KmvSketch
import org.apache.spark.sql.functions._

/** KMV sketch semantics: sub-k groups report exactly, estimates track
  * truth, degenerate overlaps hit their closed forms, and everything
  * is partitioning-invariant. */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("sub-k groups report their exact count; estimates track truth " +
      "within KMV error on larger groups") {
    val df = ((1 to 10).map(i => ("small", s"s$i")) ++
      (1 to 2000).map(i => ("big", s"b$i"))).toDF("g", "key")
    val est = KmvSketch.distinctEstimate(df, "key", "g", k = 64)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(est("small") === ((10L, 10.0)), "sketch IS the set below k")
    val (seen, e) = est("big")
    assert(seen === 64L)
    // KMV relative error ~ 1/sqrt(k-2) ≈ 13%; allow 3 sigma
    assert(math.abs(e - 2000.0) / 2000.0 < 0.4, s"estimate $e for 2000")
  }

  test("streaming fold equals the batch sketch; re-drain with the " +
      "same checkpoint is a no-op") {
    import graft.streaming.SketchStream
    val data = (1 to 300).map(i =>
      (i.toLong, if (i % 2 == 0) "g1" else "g2", s"key$i"))
      .toDF("id", "grp", "key")
    val root = java.nio.file.Files.createTempDirectory("graft_kmvs")
      .toString
    data.filter($"id" <= 150).select("grp", "key").coalesce(1)
      .write.mode("append").parquet(s"$root/j")
    data.filter($"id" > 150).select("grp", "key").coalesce(1)
      .write.mode("append").parquet(s"$root/j")
    def drain(): Unit = SketchStream.kmvSync(
      spark.readStream
        .schema(data.select("grp", "key").schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$root/j"),
      "key", "grp", k = 32, s"$root/state", s"$root/ck")
      .awaitTermination()
    drain()
    def rows() = spark.read.parquet(s"$root/state")
      .as[(String, String, Double)].collect().toSet
    val streamed = rows()
    val batch = graft.operators.KmvSketch
      .bottomK(data, "key", "grp", 32)
      .select("grp", "key", "frac")
      .as[(String, String, Double)].collect().toSet
    assert(streamed === batch,
      "bottom-k merge must fold the stream onto the batch sketch")
    drain()
    assert(rows() === streamed, "re-drain must be a no-op")
  }

  test("jaccard estimate: identical sets -> 1, disjoint -> 0; " +
      "repartition-invariant") {
    val same = ((1 to 500).map(i => ("a", s"k$i")) ++
      (1 to 500).map(i => ("b", s"k$i"))).toDF("g", "key")
    val j1 = KmvSketch.jaccardEstimate(same, "key", "g", "a", "b", 64)
      .select("jaccard_est").as[Double].head()
    assert(j1 === 1.0)
    val disj = ((1 to 500).map(i => ("a", s"x$i")) ++
      (1 to 500).map(i => ("b", s"y$i"))).toDF("g", "key")
    val j0 = KmvSketch.jaccardEstimate(disj, "key", "g", "a", "b", 64)
      .select("jaccard_est").as[Double].head()
    assert(j0 === 0.0)
    val half = ((1 to 400).map(i => ("a", s"k$i")) ++
      (201 to 600).map(i => ("b", s"k$i"))).toDF("g", "key")
    val jh = KmvSketch.jaccardEstimate(half, "key", "g", "a", "b", 64)
      .select("jaccard_est").as[Double].head()
    // true J = 200/600 = 0.333; allow generous sketch error
    assert(jh > 0.15 && jh < 0.55, s"half-overlap estimate $jh")
    val jhR = KmvSketch
      .jaccardEstimate(half.repartition(13), "key", "g", "a", "b", 64)
      .select("jaccard_est").as[Double].head()
    assert(jhR === jh, "estimate must not depend on partitioning")
  }

  test("sub-k jaccard is exact: the union sketch IS the union set, " +
      "so the denominator is its size, not k") {
    // two identical 5-key sets with k=64: J must be 1.0 (a /k
    // denominator would report 5/64 ≈ 0.078)
    val same = ((1 to 5).map(i => ("a", s"k$i")) ++
      (1 to 5).map(i => ("b", s"k$i"))).toDF("g", "key")
    val r = KmvSketch.jaccardEstimate(same, "key", "g", "a", "b", 64)
      .select("n_union_k", "n_both", "jaccard_est")
      .as[(Long, Long, Double)].head()
    assert(r === ((5L, 5L, 1.0)))
    // 3-of-6 overlap, all below k: exact 0.5
    val half = ((1 to 4).map(i => ("a", s"k$i")) ++
      (2 to 5).map(i => ("b", s"k$i"))).toDF("g", "key")
    val jh = KmvSketch.jaccardEstimate(half, "key", "g", "a", "b", 64)
      .select("jaccard_est").as[Double].head()
    assert(jh === 0.6, "|∩|=3, |∪|=5 must report exactly 0.6")
  }
}
