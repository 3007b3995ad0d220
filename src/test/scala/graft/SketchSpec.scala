package graft

import org.apache.spark.sql.functions._

/** Approximate/sketch aggregates — the cardinality/quantile estimators a
  * 100 TB pipeline uses where exact distinct/percentile would shuffle
  * everything. Not oracle-checkable (HLL/KLL implementations differ per
  * engine), so accuracy is asserted against the exact answers here. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet").cache()

  test("approx_count_distinct within 5% of exact") {
    val r = li.agg(
      countDistinct($"l_partkey").as("exact"),
      approx_count_distinct($"l_partkey", 0.02).as("approx")).head()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile brackets the exact percentile") {
    val r = li.agg(
      percentile($"l_extendedprice", lit(0.5)).as("exact_med"),
      approx_percentile($"l_extendedprice", lit(0.5), lit(1000))
        .as("approx_med")).head()
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("hll sketch survives merge across groups (sketch_agg + union)") {
    val perFlag = li.groupBy($"l_returnflag")
      .agg(hll_sketch_agg($"l_partkey").as("sk"))
    val merged = perFlag.agg(
      hll_sketch_estimate(hll_union_agg($"sk")).as("est")).head().getLong(0)
    val exact = li.agg(countDistinct($"l_partkey")).head().getLong(0)
    assert(math.abs(merged - exact).toDouble / exact <= 0.05,
      s"merged=$merged exact=$exact")
  }
}
