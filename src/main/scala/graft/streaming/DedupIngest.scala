package graft.streaming

import graft.operators.{Dedup, NearDupIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The deduplicated-ingest pipeline — the full training-data admission
  * story as ONE streaming job: a document journal drains micro-batch by
  * micro-batch, and each batch is (1) exact-deduplicated WITHIN itself
  * (first-wins by content hash), (2) near-dup-filtered AGAINST the
  * persisted corpus index (partition-pruned LSH probe — never a corpus
  * rescan), and (3) its surviving documents are admitted INTO that same
  * index via CDF sync, so batch k+1 is filtered against everything
  * batch k admitted. This is the loop a 100 TB corpus actually grows
  * by; the reference's ingest (reference
  * src/databricks/syntetic_data_arxiv.py:75-129) re-fetches overlapping
  * pages and leaves admission to the managed service.
  *
  * Semantics (deterministic, oracle-replayable): within a batch, the
  * min-id row of each exact content-hash group survives; a batch row is
  * rejected iff it is a near-dup (exact Jaccard ≥ threshold among LSH
  * band collisions) of a document ALREADY IN THE INDEX — two novel
  * near-dups arriving in the SAME batch are both admitted (they were
  * checked against the same index state; run [[Dedup.minhashLshPairs]]
  * periodically as the intra-batch sweep). Documents too short to
  * shingle pass the filter but never enter the index.
  *
  * Scale: per batch, one bounded-pruned posting probe + the
  * [[NearDupIndex.sync]] touched-dir rewrite; state lives entirely in
  * the persisted layout, so the stream itself is stateless and a crash
  * replays idempotently (sync's anti-join-then-add contract). */
object DedupIngest {

  /** Drain `journalDir` (AvailableNow) into the [[NearDupIndex]] at
    * `indexPath`, admitting only novel documents. */
  def run(spark: SparkSession, indexPath: String, journalDir: String,
      journalSchema: StructType, checkpointDir: String, idCol: String,
      textCol: String, threshold: Double,
      readerOptions: Map[String, String] = Map.empty): Unit = {
    import graft.index.ChangeLog
    IndexSync.layoutSyncOnce(spark, journalDir, journalSchema,
      checkpointDir, readerOptions) { batch =>
      val idx = NearDupIndex.load(spark, indexPath)
      // (1) exact first-wins within the batch, by content hash
      val exact = Dedup.exactFirstWins(
          batch.withColumn("__xh", md5(col(textCol))), Seq("__xh"), idCol)
        .drop("__xh")
        .localCheckpoint(true) // probe, anti-join and sync all consume it
      // (2) reject near-dups of the CURRENT index contents
      val flagged = NearDupIndex.nearDupsAgainst(spark, idx, exact,
          idCol, textCol, threshold)
        .select(col("delta_id").as(idCol)).distinct()
      val kept = exact.join(flagged, Seq(idCol), "left_anti")
      // (3) admit survivors — visible to the NEXT batch's probe
      NearDupIndex.sync(spark, idx,
        kept.withColumn("__op", lit(ChangeLog.OpInsert))
          .withColumn("__seq", lit(0L)),
        idCol, textCol)
    }
  }
}
