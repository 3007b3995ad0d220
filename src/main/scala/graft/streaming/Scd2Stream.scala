package graft.streaming

import graft.index.ChangeLog
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.DataFrame

/** Streaming SCD2 maintenance — the dimension-history table kept fresh
  * as the change journal arrives: per micro-batch,
  * [[ChangeLog.scd2Apply]] folds the batch into the persisted interval
  * table (first batch bootstraps it with the plain [[ChangeLog.scd2]]
  * fold). Drained state equals `scd2(whole journal)` exactly — the
  * stream ≡ batch contract the oracle checks.
  *
  * Unlike the Bloom OR-fold, interval merging is NOT naturally
  * idempotent, so the artifact carries the max folded `__seq` in a
  * `_meta` sidecar and a replayed micro-batch (at-least-once recovery)
  * whose sequences are all already folded is SKIPPED — replay-safe for
  * a monotone journal delivered in sequence order (the CDF contract).
  *
  * Per-batch cost: one pk semi/anti-join pair against the interval
  * table plus a lead window over (changed open rows + batch) — the
  * table's closed history is moved, never re-folded; at production
  * scale the table is pk-bucketed so the semi/anti joins are
  * co-located.
  */
object Scd2Stream {

  // the max-seq sidecar lives INSIDE the data dir (parquet readers
  // ignore _-prefixed files), so the stage-and-swap rename commits
  // data AND watermark atomically — no window where folded data is
  // visible with a stale sidecar (which would double-fold on replay)
  private def metaPath(dataPath: String) = s"$dataPath/_max_seq"

  /** Drain `stream` (AvailableNow) into the SCD2 table at `statePath`
    * (stage-and-swap overwrite, the persisted-layout crash
    * discipline). */
  def scd2Sync(stream: DataFrame, pkCol: String, statePath: String,
      checkpoint: String): StreamingQuery = {
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val s = batch.sparkSession
          val fs = new org.apache.hadoop.fs.Path(statePath)
            .getFileSystem(s.sparkContext.hadoopConfiguration)
          val dataPath = s"$statePath/data"
          // recover() first: a crash inside a prior commit must never
          // read as exists=false (that would refold from this batch
          // alone and silently drop the entire prior interval table).
          val exists = AtomicSwap.recover(fs, dataPath)
          val batchMax = batch.agg(max("__seq")).head().getLong(0)
          val lastSeq =
            if (!exists) Long.MinValue
            else {
              val p = new org.apache.hadoop.fs.Path(metaPath(dataPath))
              val in = fs.open(p)
              val txt = try scala.io.Source.fromInputStream(in).mkString
              finally in.close()
              txt.trim.toLong
            }
          if (batchMax > lastSeq) { // replayed batch -> no-op
            val fresh = batch.filter(col("__seq") > lastSeq)
            val next = if (!exists) ChangeLog.scd2(fresh, pkCol)
            else ChangeLog.scd2Apply(s.read.parquet(dataPath), fresh,
              pkCol)
            val stage = AtomicSwap.stagePath(dataPath)
            next.write.mode("overwrite").parquet(stage)
            val out = fs.create(
              new org.apache.hadoop.fs.Path(metaPath(stage)), true)
            try out.write(batchMax.toString.getBytes("UTF-8"))
            finally out.close()
            AtomicSwap.commit(fs, dataPath, stage)
          }
        }
        ()
      }
      .start()
  }

  /** The maintained interval table (healing any interrupted swap
    * before opening it — reader-safe: a present primary is taken
    * as-is, so a concurrent in-flight commit is never swept). */
  def read(s: org.apache.spark.sql.SparkSession,
      statePath: String): DataFrame = {
    val dataPath = s"$statePath/data"
    val fs = new org.apache.hadoop.fs.Path(dataPath)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    AtomicSwap.readRecover(fs, dataPath)
    s.read.parquet(dataPath)
  }
}
