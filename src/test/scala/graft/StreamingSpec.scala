package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming coverage: watermark + tumbling-window aggregation
  * and custom state via mapGroupsWithState — the streaming shapes a
  * change-feed/event pipeline needs beyond the index sync drain
  * (IndexSpec covers foreachBatch sync). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("watermarked tumbling-window aggregation over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val agg = input.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("v"))
    val q = agg.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("win_agg").start()
    try {
      input.addData((ts(0), "click", 1.0), (ts(1), "click", 2.0),
        (ts(6), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("win_agg")
        .select($"window.start", $"event_type", $"n", $"v").collect()
      val byKey = rows.map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
      assert(byKey((ts(0), "click")) === ((2L, 3.0)))
      assert(byKey((ts(5), "view")) === ((1L, 5.0)))
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-key state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val counted = input.toDS()
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Double)],
         state: GroupState[Double]) =>
          val total = state.getOption.getOrElse(0.0) + rows.map(_._2).sum
          state.update(total)
          (key, total)
      }
    val q = counted.toDF("k", "total").writeStream
      .outputMode(OutputMode.Update())
      .format("memory").queryName("state_agg").start()
    try {
      input.addData(("a", 1.0), ("a", 2.0), ("b", 5.0))
      q.processAllAvailable()
      input.addData(("a", 4.0))
      q.processAllAvailable()
      val last = spark.table("state_agg").groupBy($"k")
        .agg(max($"total").as("t")).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(last("a") === 7.0 && last("b") === 5.0)
    } finally q.stop()
  }
}
