package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{DataFrame, Encoders, Row}

/** Streaming deduplication — the continuous-ingest form of
  * [[graft.operators.Dedup.exactFirstWins]]: a document stream is
  * deduplicated ACROSS micro-batches, so a crawler that re-delivers a
  * page hours later still yields exactly one surviving row. The batch
  * operator answers "dedup this corpus"; this one answers "keep the
  * corpus deduplicated as it arrives" — the shape a training-data
  * ingest pipeline actually runs (the reference's ingest loop re-fetches
  * overlapping pages, reference src/databricks/syntetic_data_arxiv.py:
  * 75-129, and relies on the managed service to absorb the repeats).
  *
  * Semantics: within a micro-batch, the minimum-`orderCol` row of each
  * key wins (deterministic — no arbitrary-row `dropDuplicates` pick);
  * across batches, a key that has already emitted is suppressed
  * forever. Replaying an `orderCol`-ordered journal therefore produces
  * EXACTLY the batch `exactFirstWins` result — which is how the oracle
  * checks it.
  *
  * Scale: state is one boolean per distinct key in the state store —
  * RocksDB-backed at cluster scale, partitioned by key hash, no
  * per-batch shuffle beyond the keyed exchange every stateful operator
  * pays. For unbounded key universes where exact forever-suppression is
  * too much state, Spark's `dropDuplicatesWithinWatermark` is the
  * bounded-state alternative (trades exactness outside the watermark
  * horizon); this operator is the exact tier.
  */
object DedupStream {

  /** Cross-batch exact first-wins dedup of `stream` on `keyCols`,
    * ties within a batch broken by minimum numeric `orderCol` (rows
    * with a NULL order sort last, matching `ORDER BY ... NULLS LAST`).
    * Returns a streaming DataFrame with the input schema (append
    * mode). */
  def firstWins(stream: DataFrame, keyCols: Seq[String],
      orderCol: String): DataFrame = {
    val rowEnc = Encoders.row(stream.schema)
    val keyed = stream.groupByKey { r: Row =>
      // null-safe composite key: \u0001 separates fields, \u0000 marks
      // SQL NULL distinctly from the string "null"
      keyCols.map(c => Option(r.getAs[Any](c)).map(_.toString)
        .getOrElse("\u0000")).mkString("\u0001")
    }(Encoders.STRING)
    keyed.flatMapGroupsWithState[Boolean, Row](
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (_: String, rows: Iterator[Row], seen: GroupState[Boolean]) =>
        if (seen.exists) Iterator.empty
        else {
          seen.update(true)
          Iterator.single(rows.minBy(r =>
            Option(r.getAs[Number](orderCol)).map(_.longValue())
              .getOrElse(Long.MaxValue)))
        }
    }(Encoders.scalaBoolean, rowEnc).toDF()
  }

  /** Event-time TTL dedup of a stream — the BOUNDED-STATE tier between
    * [[firstWins]] (exact forever-suppression: state grows with the
    * distinct-key universe) and no dedup at all: per key, a row is
    * admitted iff its event time is at least `ttlMicros` past the last
    * ADMITTED occurrence ([[graft.operators.Dedup.ttlFirstWins]]'s
    * greedy recurrence, so an id/time-ordered journal replay lands
    * EXACTLY on the batch operator's result — the oracle contract).
    *
    * State is ONE long (last admitted event-time micros) per live key,
    * and — the scale point — it is EVICTED once the watermark passes
    * `lastAdmitted + ttl`: at that point the recurrence would admit
    * any in-watermark row anyway, so eviction is semantics-preserving
    * and total state is bounded by the keys ACTIVE inside one TTL
    * horizon, not the all-time key universe. Rows later than the
    * watermark (only possible with out-of-order sources and a short
    * `watermarkDelay`) may be re-admitted after eviction — the
    * documented watermark trade every bounded-state streaming operator
    * makes. Rows with NULL event time are dropped, as in the batch
    * form. */
  def firstWinsTtl(stream: DataFrame, keyCols: Seq[String],
      orderCol: String, tsCol: String, ttlMicros: Long,
      watermarkDelay: String = "0 seconds"): DataFrame = {
    require(ttlMicros > 0, s"ttlMicros=$ttlMicros must be positive")
    import org.apache.spark.sql.functions.{col, unix_micros}
    val wm = stream.filter(col(tsCol).isNotNull)
      .withColumn("__tu", unix_micros(col(tsCol)))
      .withWatermark(tsCol, watermarkDelay)
    val rowEnc = Encoders.row(wm.schema)
    val tuOf = (r: Row) => r.getAs[Long]("__tu")
    val ordOf = (r: Row) =>
      Option(r.getAs[Number](orderCol)).map(_.longValue())
        .getOrElse(Long.MaxValue)
    val keyed = wm.groupByKey { r: Row =>
      keyCols.map(c => Option(r.getAs[Any](c)).map(_.toString)
        .getOrElse("\u0000")).mkString("\u0001")
    }(Encoders.STRING)
    keyed.flatMapGroupsWithState[Long, Row](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      (_: String, rows: Iterator[Row], state: GroupState[Long]) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          // batch iterators carry no order guarantee — impose the
          // (event time, order) sort the recurrence is defined over
          val sorted = rows.toArray.sortBy(r => (tuOf(r), ordOf(r)))
          var hasLast = state.exists
          var last = if (hasLast) state.get else 0L
          val out = sorted.filter { r =>
            val tu = tuOf(r)
            val admit = !hasLast || tu - last >= ttlMicros
            if (admit) { hasLast = true; last = tu }
            admit
          }
          if (hasLast) {
            state.update(last)
            // evict once the watermark clears last+ttl; the timeout
            // timestamp must sit strictly past the current watermark
            state.setTimeoutTimestamp(
              math.max(last / 1000L + ttlMicros / 1000L,
                state.getCurrentWatermarkMs + 1L))
          }
          out.iterator
        }
    }(Encoders.scalaLong, rowEnc).toDF().drop("__tu")
  }
}
