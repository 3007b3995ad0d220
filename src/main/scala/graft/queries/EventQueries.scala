package graft.queries

import graft.core.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Event-stream coverage over the `events` table (the stand-in for the
  * reference's change stream, SURVEY.md §2 rows 4/23): time-bucketed
  * aggregation, gap-based sessionization, JSON extraction. Batch
  * semantics here; the Structured Streaming path reuses the same
  * expressions (graft.streaming). */
object EventQueries {

  /** `events.ts` is parquet TIMESTAMP(NANOS). Convert it to a
    * microsecond TIMESTAMP from whatever shape THIS session read it in:
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set at session build,
    * as the test session does) yields a nanos LONG we floor-divide;
    * without it Spark 4.1 reads TIMESTAMP_NTZ, already floor-truncated
    * to µs, which casts to the identical instant under the UTC session
    * timezone. Both paths match DuckDB's floor truncation, so oracle
    * timestamps agree either way. Dispatching on the observed schema —
    * not on session conf — is the round-8 lesson: a runtime `conf.set`
    * no longer reaches the parquet schema converter, and all 9
    * events-table queries silently fell out of the correctness run. */
  def load(s: SparkSession, dir: String): DataFrame = ev(s, dir)

  private def ev(s: SparkSession, dir: String) = {
    val raw = Tables.load(s, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        // TIMESTAMP_NTZ wall clock → the same wall clock AS a UTC
        // instant, independent of the caller session's timezone: a
        // bare cast("timestamp") interprets the NTZ value in the
        // SESSION zone, silently shifting every event for any non-UTC
        // caller (the replaced nanos-long path was tz-independent).
        // cast = wall@sessionTz → instant; from_utc_timestamp adds the
        // zone offset back, landing on wall@UTC for any session zone.
        val tz = s.conf.get("spark.sql.session.timeZone")
        raw.withColumn("ts",
          from_utc_timestamp(col("ts").cast("timestamp"), tz))
    }
  }

  /** TTL for the event-dedup pair: two days of event time — at the
    * fixture's ~1.3-day per-key inter-arrival, roughly half the events
    * are throttle-struck, so both suppression and re-admission bite. */
  private val TtlMicros = 2L * 86400L * 1000000L

  private def ttlLedger(admitted: DataFrame): DataFrame =
    admitted.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_admitted"),
        sum("event_id").as("id_sum"),
        min("event_id").as("first_id"))
      .orderBy("user_id", "event_type")

  /** The 3-file stamped events journal — pure fixture prep (4 jobs:
    * the id split + three coalesced writes), built once per (JVM, sf)
    * ([[BuildCache]] contract); every streaming drain keeps a FRESH
    * checkpoint/output per invocation, so the timed work — the drain
    * itself — replays fully each run. */
  private def sharedEventJournal(s: SparkSession, dir: String): String =
    BuildCache.memo(s"ev_journal3:$dir") {
      val e = ev(s, dir).select("event_id", "ts", "user_id", "event_type")
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_evjrn/" +
        dir.replaceAll("[^0-9.]", "")
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val maxId = e.agg(max("event_id")).head().getLong(0)
      val (c1, c2) = (maxId / 3, 2 * maxId / 3)
      DedupQueries.appendStamped(fs, e.filter(col("event_id") <= c1),
        s"$root/journal", 10000L)
      DedupQueries.appendStamped(fs,
        e.filter(col("event_id") > c1 && col("event_id") <= c2),
        s"$root/journal", 20000L)
      DedupQueries.appendStamped(fs, e.filter(col("event_id") > c2),
        s"$root/journal", 30000L)
      s"$root/journal"
    }

  /** [[sharedEventJournal]] + the global-sentinel fourth batch the
    * streaming sessionizer drains. */
  private def sharedSessionJournal(s: SparkSession, dir: String): String =
    BuildCache.memo(s"ev_journal4:$dir") {
      val e = ev(s, dir).select("event_id", "ts", "user_id", "event_type")
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_evjrn4/" +
        dir.replaceAll("[^0-9.]", "")
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val maxId = e.agg(max("event_id")).head().getLong(0)
      val (c1, c2) = (maxId / 3, 2 * maxId / 3)
      DedupQueries.appendStamped(fs, e.filter(col("event_id") <= c1),
        s"$root/journal", 10000L)
      DedupQueries.appendStamped(fs,
        e.filter(col("event_id") > c1 && col("event_id") <= c2),
        s"$root/journal", 20000L)
      DedupQueries.appendStamped(fs, e.filter(col("event_id") > c2),
        s"$root/journal", 30000L)
      // ONE GLOBAL sentinel instant (global max + 2h) for every user:
      // per-user sentinel times would let the post-batch watermark
      // (global max of them) pass early users' sentinel+gap and FLUSH
      // their sentinel sessions as output; at a single shared instant
      // the watermark can never clear sentinel+gap, so sentinel
      // sessions stay in state and never emit.
      val maxUs = e.agg(max(unix_micros(col("ts")))).head().getLong(0)
      val sentinel = e.select("user_id").distinct()
        .select((col("user_id") + lit(maxId) + 1).as("event_id"),
          timestamp_micros(lit(maxUs + 7200L * 1000000L)).as("ts"),
          col("user_id"), lit("sentinel").as("event_type"))
      DedupQueries.appendStamped(fs, sentinel, s"$root/journal", 40000L)
      s"$root/journal"
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Event-time TTL dedup (throttle): per (user, type), admit a row
    // iff >= 2 days past the LAST ADMITTED occurrence — the greedy
    // recurrence runs as one key shuffle + sorted linear scan, the
    // oracle replays it as a per-key recursive CTE.
    "ev_dedup_ttl" -> ((s, dir) => {
      ttlLedger(graft.operators.Dedup.ttlFirstWins(ev(s, dir),
        Seq("user_id", "event_type"), "ts", "event_id", TtlMicros))
    }),
    // The STREAMING twin: the events table replayed as an id-ordered
    // three-file journal through DedupStream.firstWinsTtl (bounded
    // state: one timestamp per live key, watermark-evicted after the
    // TTL horizon) — the drain must land exactly on the batch
    // operator's result, so both share one oracle.
    "ev_dedup_ttl_stream" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val e = ev(s, dir).select("event_id", "ts", "user_id",
        "event_type")
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_ttlstr/" +
        dir.replaceAll("[^0-9.]", "")
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true) // fresh replay
      // id order == event-time order in the fixture, so batch-arrival
      // order matches the recurrence's (ts, id) order; the journal is
      // the shared once-per-JVM fixture, ckpt/out stay per-run
      val journal = sharedEventJournal(s, dir)
      val stream = s.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", "1").parquet(journal)
      graft.streaming.DedupStream
        .firstWinsTtl(stream, Seq("user_id", "event_type"), "event_id",
          "ts", TtlMicros)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .format("parquet").option("path", s"$root/out")
        .start().awaitTermination()
      ttlLedger(s.read.parquet(s"$root/out"))
    }),
    // STREAMING sessionization: the events journal replayed through
    // SessionStream.sessionize (custom stateful op — Spark's
    // session_window closes on gap >= threshold, the batch recurrence
    // on gap > threshold). A per-user sentinel event 2h past that
    // user's last real event closes every real session IN-STREAM (no
    // watermark-flush dependence); sentinel sessions themselves never
    // emit (nothing follows them). The drained session set must equal
    // the batch recurrence's — replayed in exact integer MICROSECONDS
    // (epoch_us) on the oracle side, never fractional epoch().
    "ev_sessionize_stream" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val e = ev(s, dir).select("event_id", "ts", "user_id", "event_type")
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_sessstr/" +
        dir.replaceAll("[^0-9.]", "")
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true) // fresh replay
      // id order == event-time order in the fixture, so batch-arrival
      // order matches the recurrence's event-time order; the stamped
      // journal incl. the global-sentinel batch is the shared
      // once-per-JVM fixture, ckpt/out stay per-run
      val journal = sharedSessionJournal(s, dir)
      val stream = s.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", "1").parquet(journal)
      graft.streaming.SessionStream
        .sessionize(stream, Seq("user_id"), "ts", 1800L * 1000000L)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/ckpt")
        .format("parquet").option("path", s"$root/out")
        .start().awaitTermination()
      s.read.parquet(s"$root/out")
        .select(col("key").cast("long").as("user_id"),
          col("start_us"), col("end_us"), col("n_events"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("sessions"),
          sum("n_events").as("n_events"),
          max(col("end_us") - col("start_us")).as("max_len_us"))
        .orderBy("user_id")
    }),
    // Row-level expectation gate (Deequ shape): deterministic
    // corruption injected on id residues, every rule evaluated in ONE
    // scan-fused projection, failed-rule names travel with the row;
    // the audit ledger counts per-rule violations + the quarantine
    // total (multi-violation rows counted once).
    "audit_quarantine" -> ((s, dir) => {
      import graft.operators.DataQuality
      val dirty = ev(s, dir).select(
        col("event_id"), col("user_id"),
        when(pmod(col("event_id"), lit(13)) === 0, -col("value"))
          .otherwise(col("value")).as("value"),
        when(pmod(col("event_id"), lit(17)) === 0, lit("clickk"))
          .otherwise(col("event_type")).as("event_type"),
        when(pmod(col("event_id"), lit(19)) === 0,
          lit(null).cast("string"))
          .otherwise(col("props")).as("props"))
      DataQuality.report(dirty, Seq(
        "nonneg_value" -> (col("value") >= 0),
        "known_type" -> col("event_type").isin(
          "click", "view", "purchase", "signup", "error"),
        "props_present" -> col("props").isNotNull))
    }),
    // Robust volume-anomaly monitor (the drift alarm a production
    // event pipeline runs): hourly counts per type -> exact median ->
    // median absolute deviation -> hours beyond 3 MADs flagged.
    // Median/MAD, not mean/stddev: one bad hour cannot drag its own
    // threshold. Three type-keyed aggregates over the hour-bounded
    // rollup — state is hours x types, never events.
    "ev_anomaly_mad" -> ((s, dir) => {
      val hourly = ev(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
      val med = hourly.groupBy("event_type")
        .agg(percentile(col("n"), lit(0.5)).as("med"))
      val dev = hourly.join(med, "event_type")
        .withColumn("adev", abs(col("n") - col("med")))
      val mad = dev.groupBy("event_type")
        .agg(percentile(col("adev"), lit(0.5)).as("mad"))
      dev.join(mad, "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_hours"),
          round(min("med"), 4).as("med"),
          round(min("mad"), 4).as("mad"),
          sum(when(col("adev") > col("mad") * 3.0, 1L).otherwise(0L))
            .as("n_outliers"))
        .orderBy("event_type")
    }),
    // Conversion-latency percentiles: each purchase as-of-joined to
    // the most recent prior click, delays in exact integer micros,
    // p50/p90 interpolated identically on both engines — the funnel
    // TIMING metric next to the count metrics.
    "ev_time_to_convert" -> ((s, dir) => {
      val e = ev(s, dir)
      val purchases = e.filter(col("event_type") === "purchase")
        .select("user_id", "ts", "event_id")
      val clicks = graft.operators.Dedup.exactFirstWins(
        e.filter(col("event_type") === "click")
          .withColumn("__neg", -col("event_id")),
        Seq("user_id", "ts"), "__neg")
        .select(col("user_id"), col("ts"), col("ts").as("c_ts"),
          col("event_id").as("c_id"))
      graft.operators.AsOfJoin.backward(purchases, clicks,
          keyCols = Seq("user_id"), leftTs = "ts", rightTs = "ts",
          leftCols = Seq("event_id"), rightCols = Seq("c_ts", "c_id"),
          tieBreak = "c_id")
        .withColumn("delay_us",
          unix_micros(col("ts")) - unix_micros(col("c_ts")))
        .agg(count(lit(1)).as("n_purchases"),
          count(col("c_id")).as("n_converted"),
          round(percentile(col("delay_us"), lit(0.5)), 1).as("p50_us"),
          round(percentile(col("delay_us"), lit(0.9)), 1).as("p90_us"))
    }),
    // Tumbling 1-hour windows: the batch shape of a streaming windowed agg.
    "ev_hourly_agg" -> ((s, dir) => {
      ev(s, dir)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .orderBy("hour", "event_type")
    }),
    // Cohort retention via the CohortOps library operator: two keyed
    // aggregations joined on the user key, NO broadcast hint — the
    // first-seen side is user-keyed and "user-bounded" is not bounded
    // (10⁸–10⁹ users at 100 TB ≈ tens of GiB); AQE broadcasts at this
    // scale on its own and shuffle-joins safely at production scale.
    "ev_cohort_retention" -> ((s, dir) => {
      graft.operators.CohortOps.retention(ev(s, dir), "user_id", "ts")
        .orderBy("cohort", "wk_off")
    }),
    // The MULTI-cohort twin: the driver fixture is cohort-degenerate
    // (every user first appears in week 1), so this query re-bases
    // each user's clock by (user_id % 4) weeks — a deterministic,
    // engine-portable shift both engines apply — giving FOUR distinct
    // cohort weeks with the full offset spread each. The groupBy-
    // cohort dimension of the operator is exercised for real here.
    "ev_cohort_multi" -> ((s, dir) => {
      val shifted = ev(s, dir).withColumn("ts",
        expr("timestampadd(DAY, CAST((user_id % 4) * 7 AS INT), ts)"))
      graft.operators.CohortOps.retention(shifted, "user_id", "ts")
        .orderBy("cohort", "wk_off")
    }),
    // Ordered funnel view → click → purchase inside the first three
    // days: each stage's event must FOLLOW the previous stage's first
    // qualifying time (not merely coexist). CohortOps.funnelSurvivors
    // chains one filtered min-aggregation + plain equi-join per stage
    // (no broadcast hints — the survivor tables are user-keyed), and
    // the three stage counts land in ONE job, not three count() jobs.
    "ev_funnel" -> ((s, dir) => {
      val e = ev(s, dir)
        .filter(col("ts") < to_timestamp(lit("2024-01-04")))
      graft.operators.CohortOps.funnelCounts(e, "user_id", "ts",
          "event_type", Seq("view", "click", "purchase"))
        .agg(
          coalesce(sum(when(col("stage") === 0, col("n_users"))), lit(0L))
            .as("n_view"),
          coalesce(sum(when(col("stage") === 1, col("n_users"))), lit(0L))
            .as("n_click_after"),
          coalesce(sum(when(col("stage") === 2, col("n_users"))), lit(0L))
            .as("n_purchase_after"))
    }),
    // The GENERIC k-stage funnel surface: four ordered stages inside a
    // two-day window (86→30→9→3 at sf0.01 — real attrition at every
    // stage; the full range converts everyone), one (stage, n_users)
    // row each — the operator's native output shape (ev_funnel pivots
    // the 3-stage form into the reference's single-row report).
    "ev_funnel_stages" -> ((s, dir) => {
      graft.operators.CohortOps.funnelCounts(
          ev(s, dir).filter(col("ts") < to_timestamp(lit("2024-01-03"))),
          "user_id", "ts", "event_type",
          Seq("signup", "view", "click", "purchase"))
        .orderBy("stage")
    }),
    // Sessionization: a new session starts after a >30-minute silence.
    "ev_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc,
        col("event_id").asc)
      ev(s, dir)
        .withColumn("gap_s",
          col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long"))
        .groupBy("user_id")
        .agg(sum(when(col("gap_s").isNull || col("gap_s") > 1800, 1L)
          .otherwise(0L)).as("sessions"))
        .orderBy("user_id")
    }),
    // JSON extraction from the props payload column.
    "ev_json_extract" -> ((s, dir) => {
      ev(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(round(avg("k"), 4).as("avg_k"), min("k").as("min_k"),
          max("k").as("max_k"))
        .orderBy("event_type")
    }),
    // As-of join: attribute each click to the most recent purchase at or
    // before it (backward as-of per user), then aggregate.
    "asof_attribution" -> ((s, dir) => {
      val e = ev(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select("user_id", "ts", "event_id", "value")
      val purchases = graft.operators.Dedup.exactFirstWins(
        e.filter(col("event_type") === "purchase")
          .withColumn("__neg", -col("event_id")),
        Seq("user_id", "ts"), "__neg")
        .select(col("user_id"), col("ts"), col("event_id").as("p_id"),
          col("value").as("p_value"))
      val joined = graft.operators.AsOfJoin.backward(
        clicks, purchases, keyCols = Seq("user_id"),
        leftTs = "ts", rightTs = "ts",
        leftCols = Seq("event_id", "value"),
        rightCols = Seq("p_id", "p_value"), tieBreak = "p_id")
      joined.groupBy("user_id")
        .agg(count(lit(1)).as("n_clicks"),
          count(col("p_id")).as("n_attributed"),
          round(coalesce(sum(col("p_value")), lit(0.0)), 2)
            .as("attributed_value"))
        .orderBy("user_id")
    }),
    // Forward as-of: each click attributed to the NEXT purchase at or
    // after it (same one-shuffle union+window composition, descending
    // scan).
    "asof_forward" -> ((s, dir) => {
      val e = ev(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select("user_id", "ts", "event_id", "value")
      val purchases = graft.operators.Dedup.exactFirstWins(
        e.filter(col("event_type") === "purchase")
          .withColumn("__neg", -col("event_id")),
        Seq("user_id", "ts"), "__neg")
        .select(col("user_id"), col("ts"), col("event_id").as("p_id"),
          col("value").as("p_value"))
      graft.operators.AsOfJoin.forward(
          clicks, purchases, keyCols = Seq("user_id"),
          leftTs = "ts", rightTs = "ts",
          leftCols = Seq("event_id", "value"),
          rightCols = Seq("p_id", "p_value"), tieBreak = "p_id")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_clicks"),
          count(col("p_id")).as("n_attributed"),
          round(coalesce(sum(col("p_value")), lit(0.0)), 2)
            .as("attributed_value"))
        .orderBy("user_id")
    }),
    // Nearest as-of: closer of the two directions, ties backward
    // (pandas merge_asof parity); both scans share one shuffle.
    "asof_nearest" -> ((s, dir) => {
      val e = ev(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select("user_id", "ts", "event_id", "value")
      val purchases = graft.operators.Dedup.exactFirstWins(
        e.filter(col("event_type") === "purchase")
          .withColumn("__neg", -col("event_id")),
        Seq("user_id", "ts"), "__neg")
        .select(col("user_id"), col("ts"), col("event_id").as("p_id"),
          col("value").as("p_value"))
      graft.operators.AsOfJoin.nearest(
          clicks, purchases, keyCols = Seq("user_id"),
          leftTs = "ts", rightTs = "ts",
          leftCols = Seq("event_id", "value"),
          rightCols = Seq("p_id", "p_value"), tieBreak = "p_id")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_clicks"),
          count(col("p_id")).as("n_attributed"),
          round(coalesce(sum(col("p_value")), lit(0.0)), 2)
            .as("attributed_value"))
        .orderBy("user_id")
    }),
    // Statistical aggregates: exact percentiles, stddev, correlation.
    "ev_stats" -> ((s, dir) => {
      ev(s, dir)
        .groupBy("event_type")
        .agg(round(percentile(col("value"), lit(0.5)), 4).as("med"),
          round(percentile(col("value"), lit(0.9)), 4).as("p90"),
          round(stddev_samp(col("value")), 4).as("sd"),
          round(corr(col("value"), col("user_id").cast("double")), 6)
            .as("cor"))
        .orderBy("event_type")
    }),
    // Misra–Gries heavy hitters over user_id (150 distinct keys forced
    // through 8 counters — real evictions, real merges). Like
    // q_approx_sketch, what's pinned is the GUARANTEE, not the sketch
    // content: est ≤ true, true − est ≤ n/(cap+1), and every key hot
    // above that line must be present; `ok` folds all three per key.
    "sketch_heavy_hitters" -> ((s, dir) => {
      val cap = 8
      val e = ev(s, dir).select(col("user_id").cast("string").as("u"))
      val sk = e.agg(
          graft.functions.MisraGries.frequentItems(col("u"), cap).as("m"),
          count(lit(1)).as("n"))
      val exact = ev(s, dir).groupBy(col("user_id"))
        .agg(count(lit(1)).as("cnt"))
      exact.crossJoin(broadcast(sk))
        .withColumn("est", element_at(col("m"),
          col("user_id").cast("string")))
        .select(col("user_id"), col("cnt"),
          (col("cnt") > col("n") / (cap + 1)).as("hot"),
          (when(col("est").isNull, col("cnt") <= col("n") / (cap + 1))
            .otherwise(col("est") <= col("cnt") &&
              col("cnt") - col("est") <= col("n") / (cap + 1))).as("ok"))
        .orderBy("user_id")
    }),
  )

  /** The TTL-dedup recurrence as a per-key recursive CTE: row n's
    * admission depends on the last ADMITTED timestamp after row n-1 —
    * exactly the operator's greedy chain, stepped one rank at a time. */
  private val ttlOracle: String =
    """WITH RECURSIVE r AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS tu, event_id,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |      ORDER BY epoch_us(ts), event_id) AS rn
      |  FROM events),
      |adm AS (
      |  SELECT user_id, event_type, rn, tu, event_id, tu AS last_adm,
      |         true AS admitted
      |  FROM r WHERE rn = 1
      |  UNION ALL
      |  SELECT r.user_id, r.event_type, r.rn, r.tu, r.event_id,
      |    CASE WHEN r.tu - a.last_adm >= 172800000000 THEN r.tu
      |         ELSE a.last_adm END,
      |    r.tu - a.last_adm >= 172800000000
      |  FROM adm a JOIN r ON r.user_id = a.user_id
      |    AND r.event_type = a.event_type AND r.rn = a.rn + 1)
      |SELECT user_id, event_type,
      |  CAST(count(*) AS BIGINT) AS n_admitted,
      |  CAST(sum(event_id) AS BIGINT) AS id_sum,
      |  CAST(min(event_id) AS BIGINT) AS first_id
      |FROM adm WHERE admitted
      |GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin

  /** Phase split for the streaming TTL cell (>3 s at sf0.1): journal
    * setup vs the stateful drain vs the ledger aggregation. */
  val phases: Map[String, (SparkSession, String) => Map[String, Double]] =
    Map(
      "ev_dedup_ttl_stream" -> ((s, dir) => {
        def timed[T](f: => T): (T, Double) = {
          val t0 = System.nanoTime()
          val r = f
          (r, (System.nanoTime() - t0) / 1e9)
        }
        import org.apache.spark.sql.streaming.Trigger
        val e = ev(s, dir).select("event_id", "ts", "user_id",
          "event_type")
        val root = s"${System.getProperty("java.io.tmpdir")}" +
          s"/graft_ttlstr_ph/${dir.replaceAll("[^0-9.]", "")}"
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        val (jrn, journal) = timed(sharedEventJournal(s, dir))
        val (_, drain) = timed {
          val stream = s.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", "1").parquet(jrn)
          graft.streaming.DedupStream
            .firstWinsTtl(stream, Seq("user_id", "event_type"),
              "event_id", "ts", TtlMicros)
            .writeStream.trigger(Trigger.AvailableNow())
            .option("checkpointLocation", s"$root/ckpt")
            .format("parquet").option("path", s"$root/out")
            .start().awaitTermination()
        }
        val (_, ledger) = timed {
          ttlLedger(s.read.parquet(s"$root/out")).count()
        }
        Map("journal" -> journal, "drain" -> drain, "ledger" -> ledger)
      }),
      "ev_sessionize_stream" -> ((s, dir) => {
        def timed[T](f: => T): (T, Double) = {
          val t0 = System.nanoTime()
          val r = f
          (r, (System.nanoTime() - t0) / 1e9)
        }
        import org.apache.spark.sql.streaming.Trigger
        val e = ev(s, dir).select("event_id", "ts", "user_id",
          "event_type")
        val root = s"${System.getProperty("java.io.tmpdir")}" +
          s"/graft_sessstr_ph/${dir.replaceAll("[^0-9.]", "")}"
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        val (jrn, journal) = timed(sharedSessionJournal(s, dir))
        val (_, drain) = timed {
          val stream = s.readStream.schema(e.schema)
            .option("maxFilesPerTrigger", "1").parquet(jrn)
          graft.streaming.SessionStream
            .sessionize(stream, Seq("user_id"), "ts", 1800L * 1000000L)
            .writeStream.trigger(Trigger.AvailableNow())
            .option("checkpointLocation", s"$root/ckpt")
            .format("parquet").option("path", s"$root/out")
            .start().awaitTermination()
        }
        val (_, ledger) = timed {
          s.read.parquet(s"$root/out").groupBy(col("key"))
            .agg(count(lit(1))).count()
        }
        Map("journal" -> journal, "drain" -> drain, "ledger" -> ledger)
      }))

  val oracleSql: Map[String, String] = Map(
    "ev_dedup_ttl" -> ttlOracle,
    // the stream drain must land exactly on the batch recurrence
    "ev_dedup_ttl_stream" -> ttlOracle,
    "sketch_heavy_hitters" ->
      """WITH t AS (SELECT count(*) AS n FROM events),
        |e AS (SELECT user_id, count(*) AS cnt FROM events
        |      GROUP BY user_id)
        |SELECT user_id, cnt,
        |  cnt > CAST(n AS DOUBLE) / 9 AS hot,
        |  TRUE AS ok
        |FROM e CROSS JOIN t ORDER BY user_id""".stripMargin,
    "asof_attribution" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, event_id, value FROM events
        |  WHERE event_type = 'click'),
        |purch AS (
        |  SELECT user_id, ts, max(event_id) AS p_id,
        |         max_by(value, event_id) AS p_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT c.user_id, count(*) AS n_clicks,
        |       count(p.p_id) AS n_attributed,
        |       round(coalesce(sum(p.p_value), 0), 2) AS attributed_value
        |FROM clicks c ASOF LEFT JOIN purch p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin,
    "asof_forward" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, event_id, value FROM events
        |  WHERE event_type = 'click'),
        |purch AS (
        |  SELECT user_id, ts, max(event_id) AS p_id,
        |         max_by(value, event_id) AS p_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT c.user_id, count(*) AS n_clicks,
        |       count(p.p_id) AS n_attributed,
        |       round(coalesce(sum(p.p_value), 0), 2) AS attributed_value
        |FROM clicks c ASOF LEFT JOIN purch p
        |  ON c.user_id = p.user_id AND c.ts <= p.ts
        |GROUP BY c.user_id ORDER BY c.user_id""".stripMargin,
    "asof_nearest" ->
      """WITH clicks AS (
        |  SELECT user_id, ts, event_id, value FROM events
        |  WHERE event_type = 'click'),
        |purch AS (
        |  SELECT user_id, ts, max(event_id) AS p_id,
        |         max_by(value, event_id) AS p_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
        |b AS (
        |  SELECT c.event_id, c.user_id, c.ts,
        |         p.ts AS b_ts, p.p_id AS b_id, p.p_value AS b_value
        |  FROM clicks c ASOF LEFT JOIN purch p
        |    ON c.user_id = p.user_id AND c.ts >= p.ts),
        |f AS (
        |  SELECT c.event_id,
        |         p.ts AS f_ts, p.p_id AS f_id, p.p_value AS f_value
        |  FROM clicks c ASOF LEFT JOIN purch p
        |    ON c.user_id = p.user_id AND c.ts <= p.ts),
        |pick AS (
        |  SELECT b.user_id,
        |    CASE WHEN f.f_id IS NULL THEN b.b_id
        |         WHEN b.b_id IS NULL THEN f.f_id
        |         WHEN abs(epoch(f.f_ts) - epoch(b.ts))
        |              < abs(epoch(b.ts) - epoch(b.b_ts)) THEN f.f_id
        |         ELSE b.b_id END AS p_id,
        |    CASE WHEN f.f_id IS NULL THEN b.b_value
        |         WHEN b.b_id IS NULL THEN f.f_value
        |         WHEN abs(epoch(f.f_ts) - epoch(b.ts))
        |              < abs(epoch(b.ts) - epoch(b.b_ts)) THEN f.f_value
        |         ELSE b.b_value END AS p_value
        |  FROM b JOIN f ON b.event_id = f.event_id)
        |SELECT user_id, count(*) AS n_clicks,
        |       count(p_id) AS n_attributed,
        |       round(coalesce(sum(p_value), 0), 2) AS attributed_value
        |FROM pick GROUP BY user_id ORDER BY user_id""".stripMargin,
    "ev_stats" ->
      """SELECT event_type, round(median(value), 4) AS med,
        |  round(quantile_cont(value, 0.9), 4) AS p90,
        |  round(stddev_samp(value), 4) AS sd,
        |  round(corr(value, CAST(user_id AS DOUBLE)), 6) AS cor
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "ev_hourly_agg" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    // Cohort replay: Monday-truncated weeks on both engines; the
    // day-difference of two week-truncated dates is an exact multiple
    // of 7, so integer division is engine-portable.
    "ev_cohort_retention" ->
      """WITH f AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort
        |  FROM events GROUP BY user_id),
        |a AS (
        |  SELECT e.user_id, f.cohort,
        |    date_diff('day', CAST(f.cohort AS DATE),
        |      CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS wk_off
        |  FROM events e JOIN f USING (user_id))
        |SELECT cohort, CAST(wk_off AS BIGINT) AS wk_off,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM a GROUP BY 1, 2 ORDER BY cohort, wk_off""".stripMargin,
    // Multi-cohort replay: the same retention rollup over the
    // (user_id % 4)-week re-based clock — four cohorts, full offset
    // spread, engine-portable day arithmetic (UTC, no DST).
    "ev_cohort_multi" ->
      """WITH s AS (
        |  SELECT user_id,
        |    ts + to_days(CAST((user_id % 4) * 7 AS INT)) AS ts
        |  FROM events),
        |f AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort
        |  FROM s GROUP BY user_id),
        |a AS (
        |  SELECT s.user_id, f.cohort,
        |    date_diff('day', CAST(f.cohort AS DATE),
        |      CAST(date_trunc('week', s.ts) AS DATE)) // 7 AS wk_off
        |  FROM s JOIN f USING (user_id))
        |SELECT cohort, CAST(wk_off AS BIGINT) AS wk_off,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM a GROUP BY 1, 2 ORDER BY cohort, wk_off""".stripMargin,
    "ev_funnel" ->
      """WITH e AS (
        |  SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-04'),
        |v AS (
        |  SELECT user_id, min(ts) AS v_ts FROM e
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(e.ts) AS c_ts
        |  FROM e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > v.v_ts
        |  GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(e.ts) AS p_ts
        |  FROM e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
        |  GROUP BY e.user_id)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
        |  (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_click_after,
        |  (SELECT CAST(count(*) AS BIGINT) FROM p)
        |    AS n_purchase_after""".stripMargin,
    // Four chained stage CTEs, each strictly after the previous
    // stage's first qualifying time.
    "ev_funnel_stages" ->
      """WITH ev AS (
        |  SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-03'),
        |s0 AS (
        |  SELECT user_id, min(ts) AS t FROM ev
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |s1 AS (
        |  SELECT e.user_id, min(e.ts) AS t
        |  FROM ev e JOIN s0 USING (user_id)
        |  WHERE e.event_type = 'view' AND e.ts > s0.t
        |  GROUP BY e.user_id),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t
        |  FROM ev e JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > s1.t
        |  GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t
        |  FROM ev e JOIN s2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t
        |  GROUP BY e.user_id)
        |SELECT CAST(0 AS BIGINT) AS stage,
        |       CAST((SELECT count(*) FROM s0) AS BIGINT) AS n_users
        |UNION ALL SELECT 1, (SELECT count(*) FROM s1)
        |UNION ALL SELECT 2, (SELECT count(*) FROM s2)
        |UNION ALL SELECT 3, (SELECT count(*) FROM s3)
        |ORDER BY stage""".stripMargin,
    "ev_sessionize" ->
      """SELECT user_id, CAST(sum(CASE WHEN gap_s IS NULL OR gap_s > 1800
        |    THEN 1 ELSE 0 END) AS BIGINT) AS sessions
        |FROM (SELECT user_id,
        |        epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id)) AS gap_s
        |      FROM events)
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    // Conversion-latency replay: DuckDB's native ASOF join + exact
    // epoch_us delays; quantile_cont interpolates like percentile.
    "ev_time_to_convert" ->
      """WITH purch AS (
        |  SELECT user_id, ts, event_id FROM events
        |  WHERE event_type = 'purchase'),
        |clicks AS (
        |  SELECT user_id, ts, max(event_id) AS c_id
        |  FROM events WHERE event_type = 'click'
        |  GROUP BY user_id, ts)
        |SELECT CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(count(c.c_id) AS BIGINT) AS n_converted,
        |  round(quantile_cont(epoch_us(p.ts) - epoch_us(c.ts), 0.5), 1)
        |    AS p50_us,
        |  round(quantile_cont(epoch_us(p.ts) - epoch_us(c.ts), 0.9), 1)
        |    AS p90_us
        |FROM purch p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin,
    // MAD replay: both exact medians (DuckDB median interpolates the
    // even-count middle pair exactly like Spark percentile(0.5)), the
    // same 3-MAD cut.
    "ev_anomaly_mad" ->
      """WITH h AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, median(n) AS med FROM h
        |      GROUP BY event_type),
        |d AS (
        |  SELECT h.event_type, n, med, abs(n - med) AS adev
        |  FROM h JOIN m USING (event_type)),
        |md AS (SELECT event_type, median(adev) AS mad FROM d
        |       GROUP BY event_type)
        |SELECT d.event_type, count(*) AS n_hours,
        |  round(min(med), 4) AS med, round(min(mad), 4) AS mad,
        |  CAST(sum(CASE WHEN adev > mad * 3.0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM d JOIN md USING (event_type)
        |GROUP BY d.event_type ORDER BY d.event_type""".stripMargin,
    // Quarantine replay: same corruption, same rules (NOT coalesce(p,
    // FALSE) — a rule that cannot evaluate did not pass), same ledger.
    "audit_quarantine" ->
      """WITH dirty AS (
        |  SELECT event_id,
        |    CASE WHEN event_id % 13 = 0 THEN -value ELSE value END
        |      AS value,
        |    CASE WHEN event_id % 17 = 0 THEN 'clickk' ELSE event_type
        |      END AS event_type,
        |    CASE WHEN event_id % 19 = 0 THEN NULL ELSE props END
        |      AS props
        |  FROM events),
        |v AS (
        |  SELECT
        |    CASE WHEN NOT coalesce(value >= 0, FALSE)
        |      THEN 1 ELSE 0 END AS b1,
        |    CASE WHEN NOT coalesce(event_type IN
        |      ('click', 'view', 'purchase', 'signup', 'error'), FALSE)
        |      THEN 1 ELSE 0 END AS b2,
        |    CASE WHEN props IS NULL THEN 1 ELSE 0 END AS b3
        |  FROM dirty)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN b1 + b2 + b3 > 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_quarantined,
        |  CAST(sum(b1) AS BIGINT) AS n_nonneg_value,
        |  CAST(sum(b2) AS BIGINT) AS n_known_type,
        |  CAST(sum(b3) AS BIGINT) AS n_props_present
        |FROM v""".stripMargin,
    // Exact-microsecond replay of the gap recurrence (break iff
    // inter-event gap > 1800s): break flags -> running session ids ->
    // per-session bounds -> per-user rollup. epoch_us keeps every
    // comparison integer-exact (epoch() is a fractional DOUBLE).
    "ev_sessionize_stream" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
        |              > 1800 * 1000000 THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sn AS (
        |  SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g),
        |sess AS (
        |  SELECT user_id, sid, min(ts) AS st, max(ts) AS en,
        |         count(*) AS n
        |  FROM sn GROUP BY user_id, sid)
        |SELECT user_id, count(*) AS sessions,
        |  CAST(sum(n) AS BIGINT) AS n_events,
        |  max(epoch_us(en) - epoch_us(st)) AS max_len_us
        |FROM sess GROUP BY user_id ORDER BY user_id""".stripMargin,
    "ev_json_extract" ->
      """SELECT event_type, round(avg(CAST(props->>'k' AS BIGINT)), 4) AS avg_k,
        |  min(CAST(props->>'k' AS BIGINT)) AS min_k,
        |  max(CAST(props->>'k' AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
  )
}
