package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** AQE skew handling — the runtime half of the skew story (Salt covers
  * the aggregation half). A key owning most of one side of a sort-merge
  * join must be split into multiple tasks by AQE's skew-join rule, not
  * serialized into one straggler. */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join partition") {
    // isolated session: skew thresholds tuned down so a local-scale
    // dataset triggers the production behavior; confs do not leak
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // local-scale data compresses to a few hundred KB of shuffle bytes,
    // so the production-default thresholds (256MB/factor 5) are scaled
    // down to make the same code path observable
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    s.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    import s.implicits._

    // left: 200k rows, 95% on key 7; right: uniform small
    val left = s.range(200000L)
      .select(when(col("id") % 20 =!= 0, 7L).otherwise(col("id") % 100)
        .as("k"), col("id").as("v"))
    val right = s.range(100L).select(col("id").as("k"), lit("dim").as("d"))
    val joined = left.join(right, "k").agg(count(lit(1)))
    val n = joined.collect()(0).getLong(0)
    assert(n === 200000L, "every left row keeps exactly one match")

    val adaptive = joined.queryExecution.executedPlan
      .collectFirst { case a: AdaptiveSparkPlanExec => a }
    assert(adaptive.isDefined, "AQE must drive this plan")
    val finalPlan = adaptive.get.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"skewed partition was not split:\n$finalPlan")
  }
}
