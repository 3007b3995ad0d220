package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Encoders, Row}

/** Streaming sessionization — the continuous form of the batch
  * gap-break recurrence (`ev_sessionize`: a new session starts when the
  * per-key event-time gap EXCEEDS the threshold; a gap of exactly the
  * threshold continues the session). Clickstream/telemetry pipelines
  * run this shape permanently; the batch query answers "how many
  * sessions happened", this operator keeps emitting sessions AS THEY
  * CLOSE.
  *
  * A session closes two ways:
  *  - in-stream: a later event of the same key arrives past the gap —
  *    the previous session is emitted immediately (no watermark wait);
  *  - by timeout: no successor ever arrives — the session is emitted
  *    once the event-time watermark clears `last + gap` (the only
  *    correct "no more in-gap events can exist" proof under
  *    out-of-order delivery).
  *
  * Spark's built-in `session_window` closes sessions on a STRICT
  * overlap test (gap == threshold starts a new window), so it cannot
  * reproduce the batch recurrence exactly — hence the custom stateful
  * operator (preference order (c): built-ins can't express the
  * semantics).
  *
  * Scale shape: state is ONE open session triple (start, last, n) per
  * ACTIVE key — bounded by keys live inside a gap horizon, not the
  * all-time key universe (closed state is removed; RocksDB-backed,
  * key-hash partitioned at cluster scale). Replaying an event-time-
  * ordered journal yields EXACTLY the batch recurrence's sessions —
  * the oracle contract.
  */
/** One closed session: composite key (the DedupStream convention:
  * `\u0001`-joined key columns, `\u0000` for NULL), bounds and size in
  * event-time micros. Top-level: Spark's product-encoder codegen needs
  * a statically-instantiable class (object-nested case classes trip
  * the generated constructor lookup). */
final case class Session(key: String, start_us: Long, end_us: Long,
    n_events: Long)

/** Open-session state: (start, last, n) in event-time micros. */
final case class OpenSession(start: Long, last: Long, n: Long)

object SessionStream {

  /** Sessionize `stream` on `keyCols` by event-time column `tsCol`
    * with the batch gap recurrence (break iff gap > `gapMicros`).
    * Rows with NULL event time are dropped (as in the batch query).
    * Append-mode output of CLOSED sessions only — the open tail of
    * each key stays in state until a successor or the watermark
    * closes it. */
  def sessionize(stream: DataFrame, keyCols: Seq[String], tsCol: String,
      gapMicros: Long, watermarkDelay: String = "0 seconds"): DataFrame = {
    require(gapMicros > 0, s"gapMicros=$gapMicros must be positive")
    import org.apache.spark.sql.functions.{col, unix_micros}
    val wm = stream.filter(col(tsCol).isNotNull)
      .withColumn("__tu", unix_micros(col(tsCol)))
      .withWatermark(tsCol, watermarkDelay)
    val tuOf = (r: Row) => r.getAs[Long]("__tu")
    val keyed = wm.groupByKey { r: Row =>
      keyCols.map(c => Option(r.getAs[Any](c)).map(_.toString)
        .getOrElse("\u0000")).mkString("\u0001")
    }(Encoders.STRING)
    keyed.flatMapGroupsWithState[OpenSession, Session](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: String, rows: Iterator[Row], state: GroupState[OpenSession]) =>
        if (state.hasTimedOut) {
          // watermark cleared last+gap: no in-gap successor can exist
          val o = state.get
          state.remove()
          Iterator.single(Session(key, o.start, o.last, o.n))
        } else {
          // batch iterators carry no order guarantee — impose the
          // event-time order the recurrence is defined over
          val sorted = rows.toArray.sortBy(tuOf)
          val out = Seq.newBuilder[Session]
          var cur: Option[OpenSession] = state.getOption
          sorted.foreach { r =>
            val tu = tuOf(r)
            cur match {
              case Some(o) if tu - o.last > gapMicros =>
                out += Session(key, o.start, o.last, o.n) // in-stream close
                cur = Some(OpenSession(tu, tu, 1L))
              case Some(o) =>
                cur = Some(OpenSession(o.start, math.max(o.last, tu), o.n + 1L))
              case None =>
                cur = Some(OpenSession(tu, tu, 1L))
            }
          }
          cur.foreach { o =>
            state.update(o)
            // close once the watermark clears last+gap; CEILING to ms
            // (a floor could fire a sub-ms early, closing a session an
            // in-gap straggler should still extend), and strictly past
            // the current watermark
            state.setTimeoutTimestamp(
              math.max((o.last + gapMicros + 999L) / 1000L,
                state.getCurrentWatermarkMs + 1L))
          }
          out.result().iterator
        }
    }(Encoders.product[OpenSession], Encoders.product[Session]).toDF()
  }
}
