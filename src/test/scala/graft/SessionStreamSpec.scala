package graft

import java.sql.Timestamp

import graft.streaming.SessionStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

class SessionStreamSpec extends SparkSpec {
  import spark.implicits._

  // offset from epoch 0: the stream's initial watermark is 0 ms and
  // event times at/below it are dropped as late
  private def t(sec: Long) = new Timestamp((1000L + sec) * 1000L)

  private val gap = 10L * 1000000L // 10 s

  test("in-stream close: a past-gap successor emits the prior session " +
    "immediately; an exactly-at-gap successor continues it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val out = SessionStream.sessionize(
      input.toDF().toDF("user", "ts"), Seq("user"), "ts", gap)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_close").start()
    try {
      // 0s, 10s: gap == threshold -> SAME session (batch recurrence
      // is break iff gap > threshold); 21s: gap 11s -> break
      input.addData((7L, t(0)), (7L, t(10)))
      q.processAllAvailable()
      input.addData((7L, t(21)))
      q.processAllAvailable()
      val got = spark.table("sess_close")
        .as[graft.streaming.Session].collect().toSeq
      assert(got === Seq(graft.streaming.Session("7",
        1000L * 1000000L, 1010L * 1000000L, 2L)))
    } finally q.stop()
  }

  test("timeout close: the watermark passing last+gap emits the open " +
    "tail and evicts its state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val out = SessionStream.sessionize(
      input.toDF().toDF("user", "ts"), Seq("user"), "ts", gap)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_timeout").start()
    try {
      input.addData((1L, t(0)), (1L, t(5)))
      q.processAllAvailable()
      // another key pushes the watermark far past 5s + 10s
      input.addData((2L, t(1000)))
      q.processAllAvailable()
      input.addData((2L, t(2000)))
      q.processAllAvailable()
      val got = spark.table("sess_timeout")
        .as[graft.streaming.Session].collect()
        .map(s => (s.key, s.n_events)).toSet
      // user 1's session flushed by timeout; user 2's first session
      // closed in-stream by its own 1000s-gap successor
      assert(got === Set(("1", 2L), ("2", 1L)))
      val stateRows = q.lastProgress.stateOperators
        .map(_.numRowsTotal).sum
      assert(stateRows <= 1L,
        s"closed sessions must leave the store, holding $stateRows")
    } finally q.stop()
  }

  test("replaying an ordered journal matches the batch recurrence " +
    "across batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val out = SessionStream.sessionize(
      input.toDF().toDF("user", "ts"), Seq("user"), "ts", gap)
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_batch_eq").start()
    try {
      // session spanning a micro-batch boundary: 0,8 | 16,24 is ONE
      // session (every gap 8s <= 10s) even split across batches
      input.addData((3L, t(0)), (3L, t(8)))
      q.processAllAvailable()
      input.addData((3L, t(16)), (3L, t(24)))
      q.processAllAvailable()
      input.addData((3L, t(100)))
      q.processAllAvailable()
      val got = spark.table("sess_batch_eq")
        .as[graft.streaming.Session].collect().toSeq
      assert(got === Seq(graft.streaming.Session("3",
        1000L * 1000000L, 1024L * 1000000L, 4L)))
    } finally q.stop()
  }

  test("gated mode (nonzero delay): an in-gap straggler in a LATER " +
    "micro-batch bridges two fragments — output equals the batch " +
    "recurrence, never a premature close") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val out = SessionStream.sessionize(
      input.toDF().toDF("user", "ts"), Seq("user"), "ts", gap,
      watermarkDelay = "30 seconds")
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_gated").start()
    try {
      // 0s,8s | 25s | straggler 16s: immediate close would have
      // emitted [0,8] at the 25s event (gap 17s > 10s); the batch
      // recurrence over {0,8,16,25} is ONE session (every adjacent
      // gap <= 10s). The straggler is inside the 30s watermark.
      input.addData((5L, t(0)), (5L, t(8)))
      q.processAllAvailable()
      input.addData((5L, t(25)))
      q.processAllAvailable()
      input.addData((5L, t(16)))
      q.processAllAvailable()
      // push the watermark past 25s + 10s (wm = maxSeen - 30s)
      input.addData((9L, t(100)))
      q.processAllAvailable()
      input.addData((9L, t(200)))
      q.processAllAvailable()
      val got = spark.table("sess_gated")
        .as[graft.streaming.Session].collect()
        .map(s => (s.key, s.start_us, s.end_us, s.n_events)).toSet
      assert(got.contains(("5",
        1000L * 1000000L, 1025L * 1000000L, 4L)),
        s"expected the bridged single session, got $got")
      // no spurious extra session for key 5
      assert(got.count(_._1 == "5") === 1, s"got $got")
    } finally q.stop()
  }

  test("gated mode: a straggler OLDER than the open fragment extends " +
    "its start downward") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val out = SessionStream.sessionize(
      input.toDF().toDF("user", "ts"), Seq("user"), "ts", gap,
      watermarkDelay = "30 seconds")
    val q = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("sess_gated_down").start()
    try {
      input.addData((6L, t(20)))
      q.processAllAvailable()
      input.addData((6L, t(12))) // 8s before the fragment start
      q.processAllAvailable()
      input.addData((8L, t(100)))
      q.processAllAvailable()
      input.addData((8L, t(200)))
      q.processAllAvailable()
      val got = spark.table("sess_gated_down")
        .as[graft.streaming.Session].collect()
        .map(s => (s.key, s.start_us, s.end_us, s.n_events)).toSet
      assert(got.contains(("6",
        1012L * 1000000L, 1020L * 1000000L, 2L)), s"got $got")
    } finally q.stop()
  }
}
