package graft.streaming

import graft.operators.NearDupIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The deduplicated-ingest pipeline — the full training-data admission
  * story as ONE streaming job: a document journal drains micro-batch by
  * micro-batch, and each batch is (1) exact-deduplicated WITHIN itself
  * (first-wins by content hash), (2) near-dup-filtered AGAINST the
  * persisted corpus index (partition-pruned LSH probe — never a corpus
  * rescan), (3) near-dup-swept WITHIN itself (LSH pairs → connected
  * components → min-id member per group survives), and (4) its
  * surviving documents are admitted INTO that same index via CDF sync,
  * so batch k+1 is filtered against everything batch k admitted. This
  * is the loop a 100 TB corpus actually grows by; the reference's
  * ingest (reference src/databricks/syntetic_data_arxiv.py:75-129)
  * re-fetches overlapping pages and leaves admission to the managed
  * service.
  *
  * Semantics (deterministic, oracle-replayable): within a batch, the
  * min-id row of each exact content-hash group survives; a batch row is
  * rejected iff it is a near-dup (exact Jaccard ≥ threshold among LSH
  * band collisions) of a document ALREADY IN THE INDEX; among the rows
  * that survive both stages, each intra-batch near-dup GROUP (connected
  * component of the pair graph, the [[Dedup.connectedComponents]]
  * closure) admits only its min-id member — so a near-dup pair arriving
  * in one micro-batch resolves exactly like the same pair split across
  * two. Documents too short to shingle pass every filter but never
  * enter the index.
  *
  * Scale: per batch, one bounded-pruned posting probe + one LSH
  * self-join over the BATCH only (never batch × corpus) + the
  * [[NearDupIndex.sync]] touched-dir rewrite; the batch is shingled
  * and banded exactly once for all stages
  * ([[NearDupIndex.admitBatch]]); state lives entirely in the
  * persisted layout, so the stream itself is stateless and a crash
  * replays idempotently (sync's anti-join-then-add contract). */
object DedupIngest {

  /** Drain `journalDir` (AvailableNow) into the [[NearDupIndex]] at
    * `indexPath`, admitting only novel documents. `intraBatch = false`
    * skips stage (3) and restores the round-7 contract (same-batch
    * near-dups both admitted). */
  def run(spark: SparkSession, indexPath: String, journalDir: String,
      journalSchema: StructType, checkpointDir: String, idCol: String,
      textCol: String, threshold: Double,
      readerOptions: Map[String, String] = Map.empty,
      intraBatch: Boolean = true): Unit = {
    // the handle is frozen LSH parameters — sync never rewrites _meta,
    // so one load serves every micro-batch
    val idx = NearDupIndex.load(spark, indexPath)
    IndexSync.layoutSyncOnce(spark, journalDir, journalSchema,
      checkpointDir, readerOptions) { batch =>
      // fused admission + merge: survivors land in the layout in the
      // same pass (visible to the NEXT batch's probe) at roughly half
      // the per-batch driver actions of admitBatch-then-sync
      NearDupIndex.admitAndSync(spark, idx, batch, idCol, textCol,
        threshold, intraBatch)
      ()
    }
  }
}
