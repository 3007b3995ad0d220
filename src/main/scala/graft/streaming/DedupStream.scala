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
}
