package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contrastive training-pair mining — the step that turns a cleaned
  * corpus into (anchor, positive, negative) triplets for embedding /
  * retriever training (the inverse-cloze-task recipe: two overlapping
  * spans of ONE document are a positive pair, a span from any OTHER
  * document is a negative — Lee et al. 2019, arXiv:1906.00300 §3.1;
  * the same corpus the reference embeds with a managed model,
  * reference src/databricks/syntetic_data.py:55-66, is here the
  * SOURCE of the training pairs).
  *
  * Everything is deterministic and engine-replayable:
  *  - anchor/positive: [[TextAnalysis.chunkSliding]] windows + one
  *    `lead` over (doc, chunk_idx) — the overlap (size > stride)
  *    guarantees lexical relatedness;
  *  - negative: the md5-argmin head chunk from a BOUNDED pool of
  *    other documents (pool = first `poolSize` docs by md5(id), a
  *    TakeOrdered heap — broadcast-sized by construction, so the
  *    candidate join is a flat constant per anchor, never corpus ×
  *    corpus). md5 keys make the pick partitioning-independent.
  *
  * Scale shape: one explode (linear in chunks), one doc-keyed window
  * shuffle, one broadcast nested-loop against a constant-size pool,
  * one per-anchor row_number over `poolSize` candidates. At 100 TB
  * the pool would be drawn per-shard or enlarged, but it stays an
  * absolute constant — in-batch negatives at training time do the
  * heavy lifting; the mined hard negative only needs to be *a*
  * confusable non-match, not a global argmin.
  */
object Triplets {

  /** Mine one triplet per overlapping chunk pair. Returns
    * `(anchor_id, chunk_idx, anchor, positive, neg_id, negative)`. */
  def mine(docs: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int, poolSize: Int): DataFrame = {
    require(size > stride, s"size=$size must exceed stride=$stride " +
      "(the overlap is what makes the successor chunk a positive)")
    require(poolSize >= 2, s"poolSize=$poolSize")
    val chunks = TextAnalysis.chunkSliding(docs, idCol, textCol, size, stride)
    val w = Window.partitionBy("id").orderBy("chunk_idx")
    val ap = chunks
      .withColumn("__pos", lead(col("chunk"), 1).over(w))
      .filter(col("__pos").isNotNull)
      .select(col("id").as("anchor_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk").as("anchor"), col("__pos").as("positive"))
    val pool = chunks.filter(col("chunk_idx") === 0)
      .select(col("id").as("neg_id"), col("chunk").as("negative"),
        md5(col("id").cast("string")).as("__mk"))
      .orderBy(col("__mk").asc, col("neg_id").asc)
      .limit(poolSize).drop("__mk")
    val wn = Window.partitionBy("anchor_id", "chunk_idx")
      .orderBy(col("__nk").asc, col("neg_id").asc)
    ap.join(broadcast(pool), col("anchor_id") =!= col("neg_id"))
      .withColumn("__nk", md5(concat_ws("|", col("anchor_id"),
        col("chunk_idx"), col("neg_id"))))
      .withColumn("__rn", row_number().over(wn))
      .filter(col("__rn") === 1)
      .select("anchor_id", "chunk_idx", "anchor", "positive",
        "neg_id", "negative")
  }
}
