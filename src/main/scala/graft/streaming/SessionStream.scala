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
  * Two close disciplines, picked by the out-of-order contract:
  *
  *  - `watermarkDelay = "0 seconds"` (default): a later same-key event
  *    past the gap emits the previous session IMMEDIATELY, and an open
  *    tail is emitted once the watermark clears `last + gap`. Exact,
  *    because at zero delay the engine's late-row filter guarantees
  *    every delivered event time is >= the watermark >= every prior
  *    delivered event time — within a key the stream IS ordered, so
  *    "past the gap" is already the final verdict.
  *  - `watermarkDelay > 0`: immediate close would be WRONG — an
  *    in-gap straggler arriving in a later micro-batch (still inside
  *    the watermark) should have extended the already-emitted session.
  *    So closes are WATERMARK-GATED: state holds maximal session
  *    FRAGMENTS (pairwise gaps > threshold); each event extends,
  *    bridges (merges two fragments), or opens a fragment; a fragment
  *    is emitted only once the watermark clears its `last + gap`, the
  *    only correct "no more in-gap events can exist" proof. The
  *    emitted session set equals the batch recurrence over all
  *    non-late events exactly. Events older than the watermark are
  *    dropped by the engine (the standard watermark contract) — that
  *    is the ONLY divergence from a batch fold of the full journal.
  *
  * The mode is derived from the delay itself — a nonzero delay can
  * never construct the immediate-close plan, so the silent-divergence
  * window does not exist by construction.
  *
  * Spark's built-in `session_window` closes sessions on a STRICT
  * overlap test (gap == threshold starts a new window), so it cannot
  * reproduce the batch recurrence exactly — hence the custom stateful
  * operator (preference order (c): built-ins can't express the
  * semantics).
  *
  * Scale shape: state is ONE open session triple (start, last, n) per
  * ACTIVE key in immediate mode; in gated mode a bounded fragment list
  * per active key — fragments are pairwise more than a gap apart and
  * all live inside the (delay + gap) horizon, so the list length is
  * bounded by delay/gap + 2, a constant, not data volume.
  * (RocksDB-backed, key-hash partitioned at cluster scale.) Replaying
  * an event-time-ordered journal yields EXACTLY the batch recurrence's
  * sessions — the oracle contract.
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

/** Gated-mode state: maximal open fragments, sorted by start,
  * pairwise more than a gap apart. */
final case class SessionFrags(frags: Seq[OpenSession])

object SessionStream {

  /** Sessionize `stream` on `keyCols` by event-time column `tsCol`
    * with the batch gap recurrence (break iff gap > `gapMicros`).
    * Rows with NULL event time are dropped (as in the batch query).
    * Append-mode output of CLOSED sessions only — the open tail of
    * each key stays in state until the watermark (or, at zero delay,
    * a successor) closes it. A nonzero `watermarkDelay` switches to
    * watermark-gated closes (see the class doc). */
  def sessionize(stream: DataFrame, keyCols: Seq[String], tsCol: String,
      gapMicros: Long, watermarkDelay: String = "0 seconds"): DataFrame = {
    require(gapMicros > 0, s"gapMicros=$gapMicros must be positive")
    val gated = parseDelayMs(watermarkDelay) > 0L
    import org.apache.spark.sql.functions.{col, unix_micros}
    val wm = stream.filter(col(tsCol).isNotNull)
      .withColumn("__tu", unix_micros(col(tsCol)))
      .withWatermark(tsCol, watermarkDelay)
    val keyed = wm.groupByKey { r: Row =>
      keyCols.map(c => Option(r.getAs[Any](c)).map(_.toString)
        .getOrElse("\u0000")).mkString("\u0001")
    }(Encoders.STRING)
    if (gated) gatedPlan(keyed, gapMicros) else immediatePlan(keyed, gapMicros)
  }

  private def tuOf(r: Row): Long = r.getAs[Long]("__tu")

  /** "N (seconds|minutes|...)" -> milliseconds; the CalendarInterval
    * grammar `withWatermark` itself accepts. */
  private def parseDelayMs(delay: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .fromIntervalString(delay)
    require(iv.months == 0, s"month-based watermark delay unsupported: $delay")
    iv.days * 86400000L + iv.microseconds / 1000L
  }

  /** Zero-delay path: delivered events are per-key ordered (see class
    * doc), so a past-gap successor is a final verdict — emit at once. */
  private def immediatePlan(
      keyed: org.apache.spark.sql.KeyValueGroupedDataset[String, Row],
      gapMicros: Long): DataFrame = {
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
                // min() is unreachable at zero delay (tu >= watermark
                // >= o.last >= o.start) — kept as defense in depth
                cur = Some(OpenSession(math.min(o.start, tu),
                  math.max(o.last, tu), o.n + 1L))
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

  /** Insert one event into the maximal-fragment list: extend a
    * neighbor, bridge two, or open a new fragment. The list stays
    * sorted by start with pairwise gaps > `gapMicros` (so at most two
    * fragments can touch any event). */
  private[streaming] def insertFrag(frags: Vector[OpenSession], tu: Long,
      gapMicros: Long): Vector[OpenSession] = {
    val before = frags.filter(f => tu - f.last > gapMicros)
    val after = frags.filter(f => f.start - tu > gapMicros)
    val touch = frags.filter(f =>
      tu - f.last <= gapMicros && f.start - tu <= gapMicros)
    val merged = OpenSession(
      (touch.map(_.start) :+ tu).min,
      (touch.map(_.last) :+ tu).max,
      touch.map(_.n).sum + 1L)
    (before :+ merged) ++ after
  }

  /** Nonzero-delay path: closes gated on the watermark; see class doc
    * for the exactness argument. */
  private def gatedPlan(
      keyed: org.apache.spark.sql.KeyValueGroupedDataset[String, Row],
      gapMicros: Long): DataFrame = {
    keyed.flatMapGroupsWithState[SessionFrags, Session](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (key: String, rows: Iterator[Row], state: GroupState[SessionFrags]) =>
        var frags: Vector[OpenSession] =
          state.getOption.map(_.frags.toVector).getOrElse(Vector.empty)
        if (!state.hasTimedOut)
          rows.toArray.sortBy(tuOf).foreach { r =>
            frags = insertFrag(frags, tuOf(r), gapMicros)
          }
        // a fragment is final once the watermark clears last+gap: any
        // future delivered event has tu >= watermark > last+gap, so it
        // can neither extend (needs tu <= last+gap) nor bridge down
        // (needs its own start within gap of this last)
        val wmUs = state.getCurrentWatermarkMs * 1000L
        val (closed, open) =
          frags.partition(f => wmUs > f.last + gapMicros)
        if (open.isEmpty) {
          if (state.exists) state.remove()
        } else {
          state.update(SessionFrags(open))
          state.setTimeoutTimestamp(
            math.max((open.map(_.last).min + gapMicros + 999L) / 1000L,
              state.getCurrentWatermarkMs + 1L))
        }
        closed.sortBy(_.start)
          .map(f => Session(key, f.start, f.last, f.n)).iterator
    }(Encoders.product[SessionFrags], Encoders.product[Session]).toDF()
  }
}
