package graft.streaming

import graft.operators.Multimodal
import graft.search.Ann
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The deduplicated-ingest pipeline for MEDIA — the admission loop a
  * multimodal corpus grows by when the journal carries RAW payloads,
  * not precomputed vectors: each micro-batch of binary media rows is
  * (1) DECODED (real codec — ImageIO for PNG/JPEG/BMP payloads) and
  * featurized partition-locally, then (2) handed to the vector
  * admission machinery ([[VecDedupIngest.admitAndSync]]): near-dup
  * filtered against the persisted sign-LSH index (bucket-pruned probe
  * + cosine refine), swept within the batch, and the survivors'
  * feature vectors admitted into that same index — so batch k+1 is
  * deduplicated against every image batch k admitted.
  *
  * Composition, not new machinery: decode is the [[Multimodal]] seam
  * (undecodable payloads drop before admission — the corrupt-file
  * contract composes with the dedup contract), admission is the
  * proven vector loop. Scale shape: decode adds one partition-local
  * projection in front of the probe; nothing else changes. */
object MediaDedupIngest {

  /** Drain `journalDir` (AvailableNow) of `(idCol, content)` media
    * rows into the sign-LSH layout at `idx`, admitting only images
    * that are novel in DECODED-feature space. */
  def run(spark: SparkSession, idx: Ann.PersistedSignLsh,
      journalDir: String, journalSchema: StructType,
      checkpointDir: String, idCol: String, threshold: Double,
      readerOptions: Map[String, String] = Map.empty,
      intraBatch: Boolean = true): Unit = {
    IndexSync.layoutSyncOnce(spark, journalDir, journalSchema,
      checkpointDir, readerOptions) { batch =>
      VecDedupIngest.admitAndSync(spark, idx,
        decodeFeatures(batch, idCol), idCol, "embedding", threshold,
        intraBatch)
      ()
    }
  }

  /** The feature grid: 4×4 block means × 3 channels = 48 dims. */
  val FeatureGrid: Int = 4

  /** Real decode → feature vector: `(idCol, embedding array<double>)`
    * in the CONTENT-SENSITIVE 4×4 block-mean space (channel means
    * alone collide any two images of equal average color — color
    * dedup, not image dedup; the block grid keeps spatial layout,
    * still integer-exact and SQL-replayable from the pixel formula).
    * Shared by [[run]] and the seed-index build so the indexed corpus
    * and the probe side live in the same space. */
  def decodeFeatures(media: org.apache.spark.sql.DataFrame,
      idCol: String): org.apache.spark.sql.DataFrame =
    Multimodal.imageBlockGrid(
        media.select(col(idCol).cast("long").as("media_id"),
          col("content")), FeatureGrid)
      .select(col("media_id").as(idCol), col("vec").as("embedding"))
}
