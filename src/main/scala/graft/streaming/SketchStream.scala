package graft.streaming

import graft.operators.KmvSketch
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.DataFrame

/** Streaming KMV maintenance — the sketch's mergeability made a
  * stream: per micro-batch, fold the batch's bottom-k into a persisted
  * k-row-per-group sketch table (union → distinct → re-rank → keep k).
  * Bottom-k merge is associative and order-insensitive, so the drained
  * state equals the batch sketch over the whole stream EXACTLY — the
  * `sketch_kmv_stream` oracle is the batch replay. State is bounded by
  * k rows per group forever, the property that lets a distinct-count
  * telemetry stream run for months without state growth.
  */
object SketchStream {

  /** Drain `stream` (AvailableNow) into the sketch table at
    * `statePath`. The per-batch fold stages and swaps via
    * [[AtomicSwap]] — crash-recoverable at every point. */
  def kmvSync(stream: DataFrame, keyCol: String, groupCol: String,
      k: Int, statePath: String, checkpoint: String): StreamingQuery = {
    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        val delta = KmvSketch.bottomK(batch, keyCol, groupCol, k)
          .select("grp", "key", "frac")
        val fs = new org.apache.hadoop.fs.Path(statePath)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        // recover() first: a crash inside a prior commit must never
        // read as exists=false (it would restart the sketch from this
        // batch alone and silently forget every prior group's bottom-k).
        val cur =
          if (AtomicSwap.recover(fs, statePath))
            s.read.parquet(statePath)
          else delta.limit(0)
        val w = Window.partitionBy("grp")
          .orderBy(col("frac"), col("key"))
        val merged = cur.unionByName(delta).distinct()
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k).drop("rn")
          .localCheckpoint() // sever from the state files we replace
        val stage = AtomicSwap.stagePath(statePath)
        merged.write.mode("overwrite").parquet(stage)
        AtomicSwap.commit(fs, statePath, stage)
        ()
      }
      .start()
  }

  /** Estimates from a persisted sketch table: (k−1)/h_k per group,
    * exact bottom count for sub-k groups — the same arithmetic as
    * [[KmvSketch.distinctEstimate]], read from state. */
  def estimates(sketch: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("grp").orderBy(col("frac"), col("key"))
    sketch.withColumn("rn", row_number().over(w))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_seen"),
        max(when(col("rn") === k, col("frac"))).as("__hk"))
      .select(col("grp"), col("n_seen"),
        round(when(col("n_seen") < k, col("n_seen").cast("double"))
          .otherwise(lit((k - 1).toDouble) / col("__hk")), 4)
          .as("kmv_est"))
  }
}
