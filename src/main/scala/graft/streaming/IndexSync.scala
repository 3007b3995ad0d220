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
        if (!batch.isEmpty)
          withBoundedBatchTuning(spark, batch.sparkSession)(
            index.sync(spark, batch))
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

  /** Run one admission-BOUNDED micro-batch's maintenance with AQE off,
    * restoring the prior setting after. Spark itself disables AQE for
    * stateful streaming workloads; the same economics hold for these
    * foreachBatch maintenance bodies: every AQE stage materialization
    * is its own scheduler job (~70-100 ms fixed latency at local[4],
    * measured in BASELINE.md's ingest-floor analysis), and on a batch
    * bounded by admission control (maxRowsPerBatch /
    * maxFilesPerTrigger) the runtime re-planning can never pay for
    * those jobs — the plans are already small and the join sides
    * already known-tiny. Production-size unbounded batches do NOT come
    * through here (they use the one-shot sync entry points, where AQE
    * stays on for skew/broadcast re-planning). Conf scope is the
    * SESSION: ad-hoc queries planned concurrently on the same session
    * during a drain would also skip AQE — the drain-style pipelines
    * here own their session for the drain's duration. */
  private def withBoundedBatchTuning[A](sessions: SparkSession*)
      (body: => A): A = {
    // Same economics for both toggles: on an admission-bounded batch,
    // per-job scheduler latency dominates, so anything that multiplies
    // JOB COUNT loses. (1) AQE: every stage materialization is its own
    // job. (2) Incremental LIMIT execution: CollectLimitExec scans 1
    // partition, then scaleUpFactor× more per ATTEMPT — each attempt a
    // separate job, and a limit that finds NOTHING (the fresh-batch
    // replay probe, the under-cap pair sample) walks every partition
    // across ~log(n) jobs while recomputing its input plan each time.
    // initialNumPartitions=1e6 makes every limit a single scan-all
    // attempt: one job, and strictly less work whenever the limit
    // would have come up short anyway. Production-size unbounded
    // batches do NOT come through here (the one-shot sync entry points
    // keep Spark's defaults).
    val keys = Seq("spark.sql.adaptive.enabled" -> "false",
      "spark.sql.limit.initialNumPartitions" -> "1000000")
    // the micro-batch DF is bound to the stream's CLONED session
    // (sparkSessionForStream), while layout reads inside the body come
    // from the caller's session — a plan executes under whichever
    // session owns its root DF, so BOTH need the toggle
    val ss = sessions.distinct
    val prev = for (s <- ss; (k, _) <- keys)
      yield (s, k, s.conf.getOption(k))
    for (s <- ss; (k, v) <- keys) s.conf.set(k, v)
    try body
    finally prev.foreach {
      case (s, k, Some(v)) => s.conf.set(k, v)
      case (s, k, None) => s.conf.unset(k)
    }
  }

  /** TRIGGERED-style maintenance for any persisted layout — the
    * streaming driver behind [[graft.search.Ann.syncPersistedIvf]],
    * [[graft.search.Pq.syncPersistedIvfPq]],
    * [[graft.search.GraphAnn.syncPersistedGraph]] and
    * [[graft.search.Hybrid.syncPersistedPostings]]: the journal dir
    * streams ChangeLog rows and each micro-batch is handed to the
    * layout's own sync, so the frozen-artifact contract (centroids,
    * codebooks, df stats, graph edges) is preserved batch by batch and
    * only touched partition dirs rewrite per trigger. `readerOptions`
    * passes file-source admission control (e.g. `maxFilesPerTrigger`)
    * for bounded micro-batches.
    *
    * Delivery: the checkpoint makes journal consumption exactly-once
    * ACROSS CLEAN runs, but `foreachBatch` itself is at-least-once — a
    * crash between applyBatch and the batch commit re-delivers that
    * batch on restart. The IVF / IVF-PQ / postings syncs are
    * idempotent under replay (anti-join by pk, then re-add: applying
    * the same batch twice converges), so the composition is effectively
    * exactly-once for them. The graph sync's insert path appends edge
    * files — a replayed batch duplicates edges (degree inflation until
    * the next reprune); pair it with an idempotency guard or accept
    * reprune as the repair. */

  def layoutSync(spark: SparkSession, journalDir: String,
      journalSchema: StructType, checkpointDir: String,
      readerOptions: Map[String, String] = Map.empty)
      (applyBatch: DataFrame => Unit): StreamingQuery = {
    val changes = spark.readStream
      .schema(journalSchema)
      .options(readerOptions)
      .parquet(journalDir)
    changes.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          withBoundedBatchTuning(spark, batch.sparkSession)(
            applyBatch(batch))
      }
      .start()
  }

  /** Synchronous [[layoutSync]] drain: start, await completion. */
  def layoutSyncOnce(spark: SparkSession, journalDir: String,
      journalSchema: StructType, checkpointDir: String,
      readerOptions: Map[String, String] = Map.empty)
      (applyBatch: DataFrame => Unit): Unit =
    layoutSync(spark, journalDir, journalSchema, checkpointDir,
      readerOptions)(applyBatch).awaitTermination()

  /** The reference's whole ingest story as ONE streaming pipeline:
    * paginated feed → embed → delta-sync into the index, micro-batch by
    * micro-batch (reference src/databricks/syntetic_data_arxiv.py:75-129
    * fetches pages, then syntetic_data.py:68-75,101 lets the CDF-driven
    * TRIGGERED sync absorb them — here both legs are Spark-native and
    * composed).
    *
    * The embedder must be a FITTED (frozen) transform so every batch is
    * embedded in the same weighting space as the existing index — the
    * fitted-embedder contract VectorSearch.Index.sync enforces. Each
    * batch becomes an upsert change-set (`__op = 'U'`, `__seq` =
    * batch id) merged last-write-wins by PK, so a page re-delivered by
    * the source after a crash converges instead of duplicating — on top
    * of the source's own offset-tracked exactly-once admission.
    *
    * `Trigger.AvailableNow` + the source's `maxRowsPerBatch` admission
    * control drain the feed in bounded micro-batches (TRIGGERED
    * semantics); swap the trigger for continuous ingest. */
  def feedSync(spark: SparkSession, index: VectorIndex,
      embedder: graft.embed.FittedEmbedder, textCol: String,
      feedOptions: Map[String, String],
      checkpointDir: String): StreamingQuery = {
    val feed = spark.readStream.format("graft_feed")
      .options(feedOptions).load()
    feed.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
        withBoundedBatchTuning(spark, batch.sparkSession) {
          val changes = embedder.transform(batch, textCol)
            .withColumn("__op", org.apache.spark.sql.functions.lit(
              ChangeLog.OpUpdate))
            .withColumn("__seq", org.apache.spark.sql.functions.lit(batchId))
          index.sync(spark, changes)
        }
      }
      .start()
  }

  /** Synchronous [[feedSync]] drain: start, await completion. */
  def feedSyncOnce(spark: SparkSession, index: VectorIndex,
      embedder: graft.embed.FittedEmbedder, textCol: String,
      feedOptions: Map[String, String], checkpointDir: String): Unit =
    feedSync(spark, index, embedder, textCol, feedOptions, checkpointDir)
      .awaitTermination()
}
