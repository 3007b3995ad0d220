package graft.streaming

import graft.index.{ChangeLog, VectorIndex}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming index maintenance: the engine-native form of the reference's
  * delta-sync `TRIGGERED` pipeline (reference src/databricks/
  * syntetic_data.py:101 — batch, on-demand; the CDF feeds row-level
  * changes to the service). Here the change journal is an append-only
  * parquet directory consumed by Structured Streaming; every micro-batch
  * is merged into the index by PK via `foreachBatch` — exactly the
  * micro-batch upsert SURVEY.md §2 rows 4/23 call for.
  *
  * `Trigger.AvailableNow` reproduces TRIGGERED semantics (drain what's
  * there, then stop); swap the trigger for continuous maintenance. State
  * is only Spark's streaming file-source log — the merge itself is
  * stateless per batch, so a 1000-executor cluster scales it as a normal
  * join.
  */
object IndexSync {

  /** Start a TRIGGERED-style sync: journal dir → index merge per batch. */
  def triggeredSync(spark: SparkSession, index: VectorIndex,
      journalDir: String, journalSchema: StructType,
      checkpointDir: String): StreamingQuery = {
    val changes = spark.readStream
      .schema(journalSchema)
      .parquet(journalDir)
    changes.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) index.sync(spark, batch)
      }
      .start()
  }

  /** Synchronous drain for tests/batch jobs: start, await, stop. */
  def syncOnce(spark: SparkSession, index: VectorIndex, journalDir: String,
      journalSchema: StructType, checkpointDir: String): Unit = {
    val q = triggeredSync(spark, index, journalDir, journalSchema,
      checkpointDir)
    q.awaitTermination()
  }
}
