package graft.streaming

import graft.operators.Dedup
import graft.search.Ann
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The deduplicated-ingest pipeline for EMBEDDINGS — the vector-side
  * twin of [[DedupIngest]], the admission loop a multimodal corpus
  * (image/audio embeddings) grows by: an embedding journal drains
  * micro-batch by micro-batch, and each batch is (1) near-dup-filtered
  * AGAINST the persisted sign-LSH index (bucket-pruned probe + exact
  * cosine refine — never a corpus rescan), (2) near-dup-swept WITHIN
  * itself (bucket self-join → cosine refine → connected components →
  * min-id member per group survives; exact-duplicate vectors are
  * cosine-1 pairs, so the sweep subsumes a separate exact stage), and
  * (3) its survivors are admitted INTO that same index via
  * [[Ann.syncPersistedSignLsh]], so batch k+1 is filtered against
  * everything batch k admitted.
  *
  * Semantics (deterministic, oracle-replayable): a batch row is
  * rejected iff its cosine to an INDEXED vector is ≥ `threshold`
  * among sign-LSH bucket collisions; among survivors, each
  * intra-batch near-dup group admits only its min-id member — a pair
  * arriving in one micro-batch resolves exactly like the same pair
  * split across two. Null-vector rows never enter the index.
  *
  * Scale: the probe's pruning predicate is bounded by the CODE SPACE
  * (tables × 2^bits), the intra-batch self-join is over the BATCH
  * only, and the sync rewrites only touched (table, code) dirs. State
  * lives entirely in the persisted layout — the stream is stateless
  * and a crash replays idempotently (sync's anti-join-then-add). */
object VecDedupIngest {

  /** One admission decision for an embedding batch (the per-batch body
    * of [[run]], usable standalone for a one-shot batch): returns the
    * admitted rows of `batch`. `intraBatch = false` skips the sweep.
    *
    * `maxBucket` is the intra-batch hot-bucket guard (the vector-side
    * mirror of [[graft.operators.NearDupIndex.admitBatch]]'s cap): the
    * sweep self-joins the batch on `(table, code)`, so a degenerate
    * batch of near-identical vectors — every row in the same bucket of
    * every table — goes quadratic in the bucket size. Buckets holding
    * more than `maxBucket` batch rows are skipped during candidate
    * generation: an explicit recall trade (members of a skipped bucket
    * that collide in NO other bucket are all admitted) that bounds the
    * worst batch at `maxBucket²` pairs per bucket. `None` keeps exact
    * semantics. Occupancy telemetry to pick the cap:
    * [[Ann.signLshBucketStats]]. */
  def admitBatch(spark: SparkSession, idx: Ann.PersistedSignLsh,
      batch: DataFrame, idCol: String, vecCol: String,
      threshold: Double, intraBatch: Boolean = true,
      maxBucket: Option[Int] = None): DataFrame = {
    val valid = batch.filter(col(vecCol).isNotNull).localCheckpoint(true)
    // (1) reject near-dups of the CURRENT index contents
    val flagged = Ann.nearDupsAgainstSignLsh(spark, idx, valid,
        idCol, vecCol, idCol, vecCol, threshold)
      .select(col("delta_id").as(idCol)).distinct()
    val kept = valid.join(flagged, Seq(idCol), "left_anti")
    if (!intraBatch) kept
    else {
      // (2) intra-batch sweep: bucket collisions among the survivors
      // (same code function as the index), exact cosine refine,
      // component-min admission. The code projection is one expression
      // over the bounded batch — cheap enough to not warrant the
      // shingle-sharing fusion the text pipeline needs.
      val kc = kept.localCheckpoint(true) // self-join + anti-join
      val coded0 = kc.select(col(idCol).as("__id"), col(vecCol).as("__v"),
        posexplode(graft.functions.SignLshFunctions
          .signLshCodes(col(vecCol), idx.tables, idx.bits))
          .as(Seq("__t", "__code")))
      val coded = maxBucket match {
        case None => coded0
        case Some(cap) =>
          val hot = coded0.groupBy("__t", "__code")
            .agg(count(lit(1)).as("__bn"))
            .filter(col("__bn") > cap).select("__t", "__code")
          coded0.join(broadcast(hot), Seq("__t", "__code"), "left_anti")
      }
      val cand = coded.select(col("__t"), col("__code"),
          col("__id").as("a_id"))
        .join(coded.select(col("__t"), col("__code"),
          col("__id").as("b_id")), Seq("__t", "__code"))
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct()
      val vecs = kc.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      val pairs = cand
        .join(vecs.select(col("__id").as("a_id"), col("__v").as("__va")),
          Seq("a_id"))
        .join(vecs.select(col("__id").as("b_id"), col("__v").as("__vb")),
          Seq("b_id"))
        .filter(graft.functions.VectorFunctions
          .cosine(col("__va"), col("__vb")) >= threshold)
        .select("a_id", "b_id")
        .localCheckpoint(true)
      if (pairs.isEmpty) kc
      else {
        val losers = Dedup.connectedComponents(pairs, "a_id", "b_id")
          .filter(col("id") =!= col("component"))
          .select(col("id").as(idCol))
        kc.join(losers, Seq(idCol), "left_anti")
      }
    }
  }

  /** Drain `journalDir` (AvailableNow) into the sign-LSH layout at
    * `idx`, admitting only novel embeddings. */
  def run(spark: SparkSession, idx: Ann.PersistedSignLsh,
      journalDir: String, journalSchema: StructType,
      checkpointDir: String, idCol: String, vecCol: String,
      threshold: Double,
      readerOptions: Map[String, String] = Map.empty,
      intraBatch: Boolean = true,
      maxBucket: Option[Int] = None): Unit = {
    import graft.index.ChangeLog
    IndexSync.layoutSyncOnce(spark, journalDir, journalSchema,
      checkpointDir, readerOptions) { batch =>
      val admitted = admitBatch(spark, idx, batch, idCol, vecCol,
        threshold, intraBatch, maxBucket)
      Ann.syncPersistedSignLsh(spark, idx,
        admitted.withColumn("__op", lit(ChangeLog.OpInsert))
          .withColumn("__seq", lit(0L)),
        idCol, vecCol)
    }
  }
}
