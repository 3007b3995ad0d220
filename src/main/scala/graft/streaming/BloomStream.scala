package graft.streaming

import graft.operators.Bloom
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.DataFrame

/** Streaming Bloom-filter maintenance — the admission filter's history
  * side kept fresh incrementally: per micro-batch, fold the batch's
  * keys into the persisted filter artifact (word-wise OR against the
  * reopened words). Bitwise OR is associative, commutative AND
  * idempotent, so the drained artifact equals the batch build over the
  * union of all batches EXACTLY — and an at-least-once replay of any
  * micro-batch re-ORs bits that are already set, leaving the filter
  * untouched (exact semantics under the streaming engine's recovery
  * model with no dedup bookkeeping at all).
  *
  * Scale shape per batch: one explode+distinct+`bit_or` aggregation
  * bounded by m (the [[Bloom.build]] pass over the BATCH, not the
  * history), a driver merge of m/64 longs, one bounded artifact
  * rewrite. History size never appears in any per-batch cost — the
  * property that makes the cross-corpus "seen before?" gate viable
  * when the corpus grows by streaming ingest.
  */
object BloomStream {

  /** Drain `stream` (AvailableNow) into the filter artifact at
    * `statePath` (created on first batch with the given geometry;
    * reopened and OR-merged afterwards — k travels with the artifact,
    * so a caller geometry that disagrees with existing state throws
    * instead of silently false-negating). Stage-and-swap overwrite,
    * the persisted-layout crash discipline. */
  def bloomSync(stream: DataFrame, keyCol: String, mBits: Int, k: Int,
      statePath: String, checkpoint: String): StreamingQuery = {
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val add = Bloom.BloomFilter(
          Bloom.build(batch, keyCol, mBits, k), k)
        val fs = new org.apache.hadoop.fs.Path(statePath)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        // recover() first: a crash inside a prior commit must never
        // read as exists=false (that would rebuild from this batch
        // alone and silently drop all history bits).
        val merged =
          if (AtomicSwap.recover(fs, statePath))
            Bloom.load(s, statePath).merge(add) // throws on k mismatch
          else add
        val stage = AtomicSwap.stagePath(statePath)
        Bloom.save(s, merged, stage)
        AtomicSwap.commit(fs, statePath, stage)
        ()
      }
      .start()
  }
}
