package graft

import graft.operators.Salt
import org.apache.spark.sql.functions._

/** Bucketing (co-located joins) and salting (skew) — the two shuffle
  * levers the 100 TB design leans on beyond broadcast. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key needs no shuffle") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")
    val joined = spark.table("li_bucketed").join(
      spark.table("o_bucketed").hint("merge"),
      $"l_orderkey" === $"o_orderkey")
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"bucketed-bucketed equi-join must be shuffle-free:\n$p")
    assert(joined.count() === li.count())
  }

  test("salted two-phase aggregation matches the direct aggregation") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select($"event_type", $"event_id", $"value")
    val direct = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("value").as("sum"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val salted = Salt.skewSafeCountSum(ev, Seq("event_type"), "value",
      factor = 8, saltFrom = Seq("event_id"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(salted.keySet === direct.keySet)
    salted.foreach { case (k, (n, s)) =>
      assert(n === direct(k)._1, s"count mismatch for $k")
      // double sums in a different association order differ in the last
      // bits — compare with a relative tolerance
      assert(math.abs(s - direct(k)._2) <= 1e-9 * math.abs(direct(k)._2),
        s"sum mismatch for $k: $s vs ${direct(k)._2}")
    }
  }

  test("salt is deterministic across evaluations") {
    val df = spark.range(100).toDF("id")
      .withColumn("s", Salt.saltCol(16, col("id")))
    val a = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a === b)
    assert(a.values.toSet.size > 1, "salt should spread keys")
  }
}
