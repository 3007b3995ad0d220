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

  test("sliding-window aggregation assigns events to overlapping windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val agg = input.toDF().toDF("ts", "value")
      .withWatermark("ts", "30 minutes")
      .groupBy(window($"ts", "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("slide_agg").start()
    try {
      input.addData((ts(7), 1.0))
      q.processAllAvailable()
      val starts = spark.table("slide_agg")
        .select($"window.start").collect().map(_.getTimestamp(0)).toSet
      // an event at 10:07 belongs to [10:00,10:10) and [10:05,10:15)
      assert(starts === Set(ts(0), ts(5)))
    } finally q.stop()
  }

  test("session windows close after the gap; separate bursts separate") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val agg = input.toDF().toDF("ts", "user")
      .withWatermark("ts", "5 minutes")
      .groupBy(session_window($"ts", "5 minutes"), $"user")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_agg").start()
    try {
      input.addData((ts(0), "u1"), (ts(1), "u1"), (ts(2), "u1"),
        (ts(20), "u1"), (ts(21), "u1"))
      q.processAllAvailable()
      // advance the watermark past both sessions so Append emits them
      input.addData((ts(55), "u2"))
      q.processAllAvailable()
      val rows = spark.table("sess_agg")
        .where($"user" === "u1")
        .select($"session_window.start", $"session_window.end", $"n")
        .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1),
          r.getLong(2))).sortBy(_._1.getTime)
      assert(rows.length === 2)
      // first burst: 10:00-10:02 -> session [10:00, 10:07), 3 events
      assert(rows(0) === ((ts(0), ts(7), 3L)))
      // second burst: 10:20-10:21 -> session [10:20, 10:26), 2 events
      assert(rows(1) === ((ts(20), ts(26), 2L)))
    } finally q.stop()
  }

  test("streaming ingest dedup: dropDuplicatesWithinWatermark keeps the " +
    "first arrival of each doc id") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val deduped = input.toDF().toDF("ts", "doc_id", "text")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("doc_id")
    val q = deduped.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("stream_dedup").start()
    try {
      input.addData((ts(0), 1L, "first copy"), (ts(1), 2L, "other doc"))
      q.processAllAvailable()
      // duplicate of doc 1 arriving later inside the watermark window
      input.addData((ts(2), 1L, "second copy"), (ts(3), 3L, "third doc"))
      q.processAllAvailable()
      val rows = spark.table("stream_dedup")
        .select($"doc_id", $"text").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows === Map(1L -> "first copy", 2L -> "other doc",
        3L -> "third doc"))
    } finally q.stop()
  }

  test("stream-stream interval join: click attributes to the impression " +
    "within the window, state expires via watermarks") {
    implicit val sqlCtx = spark.sqlContext
    val impressions = MemoryStream[(Timestamp, Long)]
    val clicks = MemoryStream[(Timestamp, Long)]
    val imp = impressions.toDF().toDF("imp_ts", "ad_id")
      .withWatermark("imp_ts", "20 minutes")
    val clk = clicks.toDF().toDF("clk_ts", "c_ad_id")
      .withWatermark("clk_ts", "20 minutes")
    // click must land within 10 minutes AFTER its impression
    val joined = imp.join(clk,
      expr("""ad_id = c_ad_id AND
              clk_ts >= imp_ts AND clk_ts <= imp_ts + interval 10 minutes"""))
    val q = joined.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("attrib").start()
    try {
      impressions.addData((ts(0), 7L), (ts(0), 8L))
      clicks.addData((ts(5), 7L))   // in window for ad 7
      clicks.addData((ts(15), 8L))  // 15 min after: outside the window
      q.processAllAvailable()
      val rows = spark.table("attrib").select($"ad_id").collect()
        .map(_.getLong(0)).toSeq
      assert(rows === Seq(7L), "only the in-window click joins")
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped, not double-counted") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val agg = input.toDF().toDF("ts", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("late_agg").start()
    try {
      input.addData((ts(0), 1.0), (ts(1), 1.0))
      q.processAllAvailable()
      // advance the watermark far past the first window...
      input.addData((ts(40), 1.0))
      q.processAllAvailable()
      // ...then replay an event into the closed window: must be dropped
      input.addData((ts(2), 99.0))
      q.processAllAvailable()
      input.addData((ts(59), 1.0))
      q.processAllAvailable()
      val first = spark.table("late_agg")
        .select($"window.start", $"n").collect()
        .map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
      assert(first(ts(0)) === 2L, "late event must not reopen the window")
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits zero-or-more rows per group " +
    "(threshold alerts)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val alerts = input.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Double)],
         state: GroupState[Double]) =>
          val before = state.getOption.getOrElse(0.0)
          val total = before + rows.map(_._2).sum
          state.update(total)
          // emit only on crossing the threshold — zero rows otherwise
          if (before < 10.0 && total >= 10.0) Iterator((key, total))
          else Iterator.empty
      }
    val q = alerts.toDF("k", "total").writeStream
      .outputMode(OutputMode.Append())
      .format("memory").queryName("alerts").start()
    try {
      input.addData(("a", 6.0), ("b", 2.0))
      q.processAllAvailable()
      assert(spark.table("alerts").count() === 0)
      input.addData(("a", 5.0), ("b", 1.0))
      q.processAllAvailable()
      val rows = spark.table("alerts").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(rows === Map("a" -> 11.0)) // only a crossed 10
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

  test("DedupStream.firstWins suppresses keys across micro-batches and " +
      "picks the min-order row within a batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String)]
    val out = graft.streaming.DedupStream.firstWins(
      input.toDF().toDF("id", "k", "payload"), Seq("k"), "id")
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_stream").start()
    try {
      // batch 1: key a twice (id 7 then 3 — min wins), key b once
      input.addData((7L, "a", "a7"), (3L, "a", "a3"), (9L, "b", "b9"))
      q.processAllAvailable()
      // batch 2: key a again (suppressed), new key c; null key rows too
      input.addData((1L, "a", "a1"), (5L, "c", "c5"))
      q.processAllAvailable()
      val rows = spark.table("dedup_stream")
        .select($"id", $"k").as[(Long, String)].collect().toSet
      assert(rows === Set((3L, "a"), (9L, "b"), (5L, "c")),
        s"got $rows: min-of-batch wins, later batches suppressed")
    } finally q.stop()
  }

  test("DedupStream.firstWinsTtl: throttle within the TTL, re-admit " +
    "after it, evict state once the watermark clears the horizon") {
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    // offset from epoch 0: the stream's INITIAL watermark is 0 ms and
    // Spark's late-row filter drops event times at/below it — an edge
    // only synthetic epoch-relative fixtures can hit
    def t(sec: Long) = new Timestamp((1000L + sec) * 1000L)
    val input = MemoryStream[(Long, String, Timestamp)]
    val out = graft.streaming.DedupStream.firstWinsTtl(
      input.toDF().toDF("id", "k", "ts"), Seq("k"), "id", "ts",
      ttlMicros = 10L * 1000000L)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("ttl_stream").start()
    try {
      // batch 1: key a at +0s admitted, +5s struck; same-batch chain
      input.addData((1L, "a", t(0)), (2L, "a", t(5)))
      q.processAllAvailable()
      // batch 2: a at 9s still inside [0, 10) — struck ACROSS batches;
      // a at 12s re-admitted (clock anchored at the ADMITTED 0s row)
      input.addData((3L, "a", t(9)), (4L, "a", t(12)))
      q.processAllAvailable()
      // advance the watermark far past a's horizon via another key,
      // then fire the timeout sweep with one more batch
      input.addData((5L, "b", t(1000)))
      q.processAllAvailable()
      input.addData((6L, "b", t(2000)))
      q.processAllAvailable()
      val ids = spark.table("ttl_stream")
        .select($"id").as[Long].collect().toSet
      assert(ids === Set(1L, 4L, 5L, 6L),
        s"got $ids: throttle inside TTL, re-admit past it")
      // bounded state: a timed out (watermark 2000s >> 12s + 10s) and
      // was evicted — only b's entry may remain
      val stateRows = q.lastProgress.stateOperators
        .map(_.numRowsTotal).sum
      assert(stateRows <= 1L,
        s"evicted keys must leave the store, still holding $stateRows")
    } finally q.stop()
  }

  test("DedupStream.firstWins: null and composite keys are distinct") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Option[String], String)]
    val out = graft.streaming.DedupStream.firstWins(
      input.toDF().toDF("id", "k1", "k2"), Seq("k1", "k2"), "id")
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("dedup_stream_nulls").start()
    try {
      // (null, "x") vs ("null", "x") must be different keys
      input.addData((1L, None, "x"), (2L, Some("null"), "x"),
        (3L, None, "x"))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream_nulls")
        .select($"id").as[Long].collect().toSet
      assert(ids === Set(1L, 2L))
    } finally q.stop()
  }

  test("layoutSync's bounded-batch tuning turns AQE off inside the " +
    "batch body and restores it after the drain") {
    val dir = java.nio.file.Files.createTempDirectory("graft_aqe_tune")
      .toString
    val one = spark.range(1L).selectExpr("id")
    one.write.mode("overwrite").parquet(s"$dir/journal")
    val key = "spark.sql.adaptive.enabled"
    val before = spark.conf.get(key)
    @volatile var insideOuter: String = null
    @volatile var insideBatch: String = null
    graft.streaming.IndexSync.layoutSyncOnce(spark, s"$dir/journal",
      one.schema, s"$dir/ckpt") { batch =>
      insideOuter = spark.conf.get(key)
      insideBatch = batch.sparkSession.conf.get(key)
      batch.count()
    }
    assert(insideOuter === "false" && insideBatch === "false",
      "both the caller session and the stream's cloned session must " +
        "plan the batch body without AQE")
    assert(spark.conf.get(key) === before,
      "the drain must not leak the AQE toggle into the session")
  }
}
