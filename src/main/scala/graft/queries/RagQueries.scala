package graft.queries

import graft.core.Tables
import graft.functions.Metric
import graft.rag.Context
import graft.search.Knn
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's retrieval post-processing pipeline as oracle-checked
  * queries: top-k → falsy filter → first-wins dedup (may under-fill k) →
  * `[id] text` context assembly → empty fallback
  * (reference src/backend/main.py:56-112). Corpus = embeddings ⋈ documents
  * on vec_id = doc_id (both derive from the same synthetic corpus).
  */
object RagQueries {

  private def corpus(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "embeddings")
    val d = Tables.load(s, dir, "documents")
    e.join(d, e("vec_id") === d("doc_id"))
      .select(col("doc_id"), col("embedding"), col("text"), col("lang"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Top-10 then first-wins dedup by lang: survivors keep their original
    // rank; a query group may end with fewer rows than k (the preserved
    // reference quirk, src/backend/main.py:62-69).
    "rag_topk_dedup" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
      val hits = Knn.batchQuery(
        corpus = corpus(s, dir).filter(col("doc_id") >= 3),
        queries = e.filter(col("vec_id") < 3),
        corpusVecCol = "embedding", corpusPkCol = "doc_id",
        queryVecCol = "embedding", queryIdCol = "vec_id",
        k = 10, Metric.Cosine)
      val deduped = Context.firstWinsDedup(
        Context.falsyFilter(hits, "text"),
        groupCols = Seq("query_id"), dedupKey = "lang", rankCol = "rank")
      deduped
        .select(col("query_id"), col("rank").cast("long").as("rnk"),
          col("doc_id"), col("lang"))
        .orderBy("query_id", "rnk")
    }),
    // Context assembly for one query: `[id] text` blocks joined by blank
    // lines, rank-ordered.
    "rag_context" -> ((s, dir) => {
      val qv = VectorQueries.queryVector(s, dir, 0L)
      val top = Knn.singleQuery(corpus(s, dir).filter(col("doc_id") =!= 0),
        "embedding", "doc_id", qv, k = 3, Metric.Cosine)
      Context.assembleContext(
        top.withColumn("query_id", lit(0L)),
        groupCols = Seq("query_id"), rankCol = "rank",
        blockCol = Context.contextBlock(col("doc_id"), col("text")))
        .orderBy("query_id")
    }),
    // Empty retrieval → fallback literal (src/backend/main.py:103-104).
    "rag_fallback" -> ((s, dir) => {
      val qv = VectorQueries.queryVector(s, dir, 0L)
      val top = Knn.singleQuery(corpus(s, dir).filter(col("doc_id") =!= 0),
        "embedding", "doc_id", qv, k = 3, Metric.Cosine)
        .filter(col("score") > 0.999) // nothing survives
      val assembled = top.agg(
        trim(array_join(
          transform(
            array_sort(collect_list(struct(col("rank").as("r"),
              Context.contextBlock(col("doc_id"), col("text")).as("b")))),
            x => x.getField("b")),
          "\n\n")).as("context"))
      assembled.select(Context.withFallback(col("context")).as("context"))
    }),
    // Full RAG chain with the mock extractive generator: retrieval →
    // context → prompt → grounded answer (generation itself is the
    // pluggable seam; the extractive default is deterministic).
    "rag_generate" -> ((s, dir) => {
      val ctx = queries("rag_context")(s, dir)
        .withColumn("question", lit("what is this corpus about?"))
      graft.rag.ExtractiveGenerator.generate(ctx, "context", "question")
        .select(col("query_id"), col("answer"))
    }),
    // RAG ingestion chunking: overlapping 8-token windows every 4
    // tokens (context preserved across boundaries) — one explode, no
    // shuffle; the oracle replays window starts, slices and lengths.
    "rag_chunk_sliding" -> ((s, dir) => {
      graft.operators.TextAnalysis.chunkSliding(
          Tables.load(s, dir, "documents").filter(col("doc_id") < 20),
          "doc_id", "text", size = 8, stride = 4)
        .select(col("id").as("doc_id"),
          col("chunk_idx").cast("long").as("chunk_idx"),
          col("chunk"), col("n_tokens"))
        .orderBy("doc_id", "chunk_idx")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "rag_chunk_sliding" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents
        |  WHERE doc_id < 20 AND text IS NOT NULL AND trim(text) <> ''),
        |win AS (
        |  SELECT doc_id, t,
        |    unnest(range(0,
        |      CAST(floor(CAST(len(t) - 1 AS DOUBLE) / 4) AS BIGINT) + 1))
        |      AS chunk_idx
        |  FROM toks)
        |SELECT doc_id, chunk_idx,
        |  array_to_string(list_slice(t,
        |    CAST(chunk_idx * 4 + 1 AS BIGINT),
        |    CAST(least(chunk_idx * 4 + 8, len(t)) AS BIGINT)), ' ')
        |    AS chunk,
        |  CAST(least(chunk_idx * 4 + 8, len(t)) - chunk_idx * 4 AS BIGINT)
        |    AS n_tokens
        |FROM win ORDER BY doc_id, chunk_idx""".stripMargin,
    "rag_generate" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |corpus AS (
        |  SELECT d.doc_id, e.embedding, d.text
        |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
        |topk AS (
        |  SELECT c.doc_id, c.text,
        |         row_number() OVER (
        |           ORDER BY list_cosine_similarity(c.embedding, q.qe) DESC,
        |                    c.doc_id) AS rnk
        |  FROM corpus c, q WHERE c.doc_id <> 0
        |  ORDER BY rnk LIMIT 3),
        |ctx AS (
        |  SELECT CAST(0 AS BIGINT) AS query_id,
        |    trim(string_agg('[' || doc_id || '] ' || text,
        |         chr(10) || chr(10) ORDER BY rnk)) AS context
        |  FROM topk)
        |SELECT query_id,
        |  regexp_replace(split_part(context, chr(10) || chr(10), 1),
        |                 '^\[[^\]]*\] ', '') AS answer
        |FROM ctx""".stripMargin,
    "rag_topk_dedup" ->
      """WITH corpus AS (
        |  SELECT d.doc_id, e.embedding, d.text, d.lang
        |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
        |hits AS (
        |  SELECT q.vec_id AS query_id,
        |         CAST(row_number() OVER (PARTITION BY q.vec_id
        |           ORDER BY list_cosine_similarity(c.embedding, q.embedding) DESC,
        |                    c.doc_id) AS BIGINT) AS rnk,
        |         c.doc_id, c.lang
        |  FROM corpus c, embeddings q
        |  WHERE q.vec_id < 3 AND c.doc_id >= 3 AND c.text IS NOT NULL
        |    AND c.text <> ''),
        |topk AS (SELECT * FROM hits WHERE rnk <= 10)
        |SELECT query_id, rnk, doc_id, lang FROM (
        |  SELECT *, row_number() OVER (PARTITION BY query_id, lang
        |            ORDER BY rnk) AS rn
        |  FROM topk)
        |WHERE rn = 1
        |ORDER BY query_id, rnk""".stripMargin,
    "rag_context" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |corpus AS (
        |  SELECT d.doc_id, e.embedding, d.text
        |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
        |topk AS (
        |  SELECT c.doc_id, c.text,
        |         row_number() OVER (
        |           ORDER BY list_cosine_similarity(c.embedding, q.qe) DESC,
        |                    c.doc_id) AS rnk
        |  FROM corpus c, q WHERE c.doc_id <> 0
        |  ORDER BY rnk LIMIT 3)
        |SELECT CAST(0 AS BIGINT) AS query_id,
        |  trim(string_agg('[' || doc_id || '] ' || text,
        |       chr(10) || chr(10) ORDER BY rnk)) AS context
        |FROM topk""".stripMargin,
    "rag_fallback" ->
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |corpus AS (
        |  SELECT d.doc_id, e.embedding, d.text
        |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
        |topk AS (
        |  SELECT c.doc_id, c.text,
        |         list_cosine_similarity(c.embedding, q.qe) AS score,
        |         row_number() OVER (
        |           ORDER BY list_cosine_similarity(c.embedding, q.qe) DESC,
        |                    c.doc_id) AS rnk
        |  FROM corpus c, q WHERE c.doc_id <> 0
        |  ORDER BY rnk LIMIT 3)
        |SELECT coalesce(nullif(trim(string_agg('[' || doc_id || '] ' || text,
        |         chr(10) || chr(10) ORDER BY rnk)), ''),
        |       'No relevant context found.') AS context
        |FROM topk WHERE score > 0.999""".stripMargin,
  )
}
