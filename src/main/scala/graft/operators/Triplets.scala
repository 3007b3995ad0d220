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
  *  - negative ([[mine]]): the md5-argmin head chunk from a BOUNDED
  *    pool of other documents (pool = first `poolSize` docs by
  *    md5(id), a TakeOrdered heap — broadcast-sized by construction,
  *    so the candidate join is a flat constant per anchor, never
  *    corpus × corpus). md5 keys make the pick
  *    partitioning-independent.
  *  - HARD negative ([[mineHard]]): the pool member whose document
  *    EMBEDDING is most similar to the anchor's (argmax cosine,
  *    anchor excluded) — the confusable non-match retriever training
  *    actually wants (DPR, Karpukhin et al. 2020, arXiv:2004.04906
  *    §3.2). Same bounded-pool discipline: the argmax spans
  *    `poolSize` candidates, never the corpus.
  *
  * Scale shape: one explode (linear in chunks), one doc-keyed window
  * shuffle, one broadcast nested-loop against a constant-size pool,
  * one per-anchor rank over `poolSize` candidates. At 100 TB the pool
  * would be drawn per-shard or enlarged, but it stays an absolute
  * constant — in-batch negatives at training time do the heavy
  * lifting; the mined negative only needs to be *a* (preferably
  * confusable) non-match, not a global argmax.
  */
object Triplets {

  private def chunked(docs: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size > stride, s"size=$size must exceed stride=$stride " +
      "(the overlap is what makes the successor chunk a positive)")
    TextAnalysis.chunkSliding(docs, idCol, textCol, size, stride)
  }

  /** (anchor_id, chunk_idx, anchor, positive) — every overlapping
    * chunk pair. */
  private def anchorPositive(chunks: DataFrame): DataFrame = {
    val w = Window.partitionBy("id").orderBy("chunk_idx")
    chunks
      .withColumn("__pos", lead(col("chunk"), 1).over(w))
      .filter(col("__pos").isNotNull)
      .select(col("id").as("anchor_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk").as("anchor"), col("__pos").as("positive"))
  }

  /** The md5-first `poolSize` docs' head chunks — the bounded
    * candidate pool (TakeOrdered heap). */
  private def headPool(chunks: DataFrame, poolSize: Int): DataFrame = {
    require(poolSize >= 2, s"poolSize=$poolSize")
    chunks.filter(col("chunk_idx") === 0)
      .select(col("id").as("neg_id"), col("chunk").as("negative"),
        md5(col("id").cast("string")).as("__mk"))
      .orderBy(col("__mk").asc, col("neg_id").asc)
      .limit(poolSize).drop("__mk")
  }

  /** Mine one triplet per overlapping chunk pair, md5-argmin negative.
    * Returns `(anchor_id, chunk_idx, anchor, positive, neg_id,
    * negative)`. */
  def mine(docs: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int, poolSize: Int): DataFrame = {
    val chunks = chunked(docs, idCol, textCol, size, stride)
    val ap = anchorPositive(chunks)
    val pool = headPool(chunks, poolSize)
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

  /** [[mine]] with HARD negatives: per anchor DOCUMENT, the pool
    * member with the highest embedding cosine (ties by neg_id) —
    * computed once per doc, then joined onto its chunk pairs. Returns
    * `(anchor_id, chunk_idx, anchor, positive, neg_id, negative,
    * cos)`. `embeddings(vecIdCol, embCol)` must cover the doc ids. */
  def mineHard(docs: DataFrame, idCol: String, textCol: String,
      embeddings: DataFrame, vecIdCol: String, embCol: String,
      size: Int, stride: Int, poolSize: Int): DataFrame = {
    val chunks = chunked(docs, idCol, textCol, size, stride)
    val ap = anchorPositive(chunks)
    // No cast on the id: a lossy cast (string doc ids -> long) would
    // NULL every key and the inner joins would silently drop all
    // anchors. Equi-join type coercion handles compatible id types.
    val emb = embeddings.select(col(vecIdCol).as("__eid"),
      col(embCol).as("__emb"))
    val pool = headPool(chunks, poolSize)
      .join(emb, col("neg_id") === col("__eid"))
      .select(col("neg_id"), col("negative"),
        col("__emb").as("__neg_emb"))
    val anchorsDocs = ap.select("anchor_id").distinct()
      .join(emb, col("anchor_id") === col("__eid"))
      .select(col("anchor_id"), col("__emb").as("__a_emb"))
    val wn = Window.partitionBy("anchor_id")
      .orderBy(col("cos").desc, col("neg_id").asc)
    val hard = anchorsDocs
      .join(broadcast(pool), col("anchor_id") =!= col("neg_id"))
      .withColumn("cos",
        graft.functions.VectorFunctions.cosine(col("__a_emb"), col("__neg_emb")))
      .withColumn("__rn", row_number().over(wn))
      .filter(col("__rn") === 1)
      .select(col("anchor_id"), col("neg_id"), col("negative"),
        round(col("cos"), 4).as("cos"))
    ap.join(hard, "anchor_id")
      .select("anchor_id", "chunk_idx", "anchor", "positive",
        "neg_id", "negative", "cos")
  }
}
