package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** KMV (k-minimum-values) distinct-count sketch — Bar-Yossef et al.,
  * RANDOM 2002 — the cardinality sketch whose estimates REPLAY
  * cross-engine to the digit: the sketch is just the k smallest md5
  * fractions of the distinct keys, so unlike HLL (engine-private hash
  * and bias tables) every estimate here is plain arithmetic a DuckDB
  * oracle reproduces exactly.
  *
  *   n̂ = (k−1) / h_k           (h_k = k-th smallest fraction)
  *   Ĵ(A,B) = |X ∩ A_k ∩ B_k| / k   (X = bottom-k of A_k ∪ B_k)
  *
  * Scale shape: one distinct on (group, key), a shuffle-free fraction
  * projection, then a bounded per-group rank — the sketch is k rows
  * per group, merges by union + re-rank (shard-build friendly), and
  * set overlap between two corpora costs 2k rows of driver-free
  * relational work instead of a corpus-sized intersection. */
object KmvSketch {

  /** Bottom-k md5 fractions of the DISTINCT keys per group, ranked.
    * Returns `(grp, key, frac, rn)` with rn ≤ k. */
  def bottomK(df: DataFrame, keyCol: String, groupCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"k must be at least 2, got $k")
    val f = df.select(col(groupCol).as("grp"), col(keyCol).as("key"))
      .filter(col("key").isNotNull).distinct()
      .withColumn("frac", Sampling.hashFraction(col("key")))
    val w = Window.partitionBy("grp").orderBy(col("frac"), col("key"))
    f.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Distinct-count estimate per group: (k−1)/h_k for groups holding
    * ≥ k keys, the exact bottom count for smaller groups (the sketch
    * IS the set there). `(grp, n_seen, kmv_est)`. */
  def distinctEstimate(df: DataFrame, keyCol: String, groupCol: String,
      k: Int): DataFrame =
    bottomK(df, keyCol, groupCol, k)
      .groupBy("grp")
      .agg(count(lit(1)).as("n_seen"),
        max(when(col("rn") === k, col("frac"))).as("__hk"))
      .select(col("grp"), col("n_seen"),
        round(when(col("n_seen") < k, col("n_seen").cast("double"))
          .otherwise(lit((k - 1).toDouble) / col("__hk")), 4)
          .as("kmv_est"))

  /** Jaccard estimate between two groups' key sets from their sketches
    * alone: rank the union of the two sketches' FRACTIONS, keep the
    * bottom k, score the share present in both. One tiny (≤ 2k row)
    * relational job — never touches the corpora again. */
  def jaccardEstimate(df: DataFrame, keyCol: String, groupCol: String,
      gA: String, gB: String, k: Int): DataFrame = {
    val sk = bottomK(
      df.filter(col(groupCol).isin(gA, gB)), keyCol, groupCol, k)
    val a = sk.filter(col("grp") === gA).select(col("frac").as("fa"))
    val b = sk.filter(col("grp") === gB).select(col("frac").as("fb"))
    val union = a.select(col("fa").as("frac"))
      .union(b.select(col("fb").as("frac"))).distinct()
    val w = Window.orderBy(col("frac"))
    union.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .join(a, col("frac") === col("fa"), "left")
      .join(b, col("frac") === col("fb"), "left")
      .agg(count(lit(1)).as("n_union_k"),
        sum(when(col("fa").isNotNull && col("fb").isNotNull, 1L)
          .otherwise(0L)).as("n_both"))
      .select(col("n_union_k"), col("n_both"),
        // divide by the union-sketch size actually held, not k: when
        // both groups carry < k keys the union sketch IS the union set
        // (< k fractions), and a /k denominator would bias low — two
        // identical 5-key sets must estimate 1.0, not 5/k. Mirrors
        // distinctEstimate's exact sub-k handling.
        round(col("n_both").cast("double") /
          least(lit(k.toDouble), col("n_union_k").cast("double")), 4)
          .as("jaccard_est"))
  }
}
