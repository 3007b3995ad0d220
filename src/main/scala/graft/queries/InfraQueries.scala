package graft.queries

import graft.core.Tables
import graft.embed.{HashProjectionEmbedder, HashingTfIdfEmbedder}
import graft.functions.Metric
import graft.index.{ChangeLog, IndexMeta, VectorIndex}
import graft.operators.Multimodal
import graft.search.{Ann, Knn}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Index lifecycle, incremental sync, ANN, embedder and multimodal
  * coverage. Oracle-checked where DuckDB can express the semantics
  * (index build stats, sync merge results, multimodal metadata);
  * rows-only where the operator depends on JVM-side hashing or MLlib
  * fitting (ANN, embedders) — those get equivalence/recall assertions in
  * ScalaTest instead. */
object InfraQueries {

  private def emb(s: SparkSession, dir: String) = Tables.load(s, dir, "embeddings")
  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  private def tmpPath(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_idx/$name"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Build a vector index (normalize + norm column + persist) and report
    // its stats — oracle checks rows/pks/avg pre-normalization norm.
    "index_build_stats" -> ((s, dir) => {
      val idx = new VectorIndex(IndexMeta("emb_idx", "vec_id", "embedding",
        64, Metric.Cosine, tmpPath(s"emb_idx_${dir.replaceAll("[^0-9.]", "")}")))
      idx.rebuild(emb(s, dir), buckets = 8)
      idx.read(s).agg(
        count(lit(1)).as("n"),
        countDistinct(col("vec_id")).as("n_pk"),
        round(avg("__norm"), 4).as("avg_norm"))
    }),
    // Incremental sync: upsert pks 0-4 with the vectors of 400-404,
    // delete pks 5-9; oracle reproduces the merge relationally.
    "index_sync_incremental" -> ((s, dir) => {
      val source = emb(s, dir).filter(col("vec_id") < 400)
      val idx = new VectorIndex(IndexMeta("sync_idx", "vec_id", "embedding",
        64, Metric.Cosine, tmpPath(s"sync_idx_${dir.replaceAll("[^0-9.]", "")}")))
      idx.rebuild(source)
      val upserts = emb(s, dir)
        .filter(col("vec_id").between(400, 404))
        .select((col("vec_id") - 400).as("vec_id"), col("embedding"),
          col("label"), lit(ChangeLog.OpUpdate).as("__op"),
          col("vec_id").as("__seq"))
      val deletes = emb(s, dir)
        .filter(col("vec_id").between(5, 9))
        .select(col("vec_id"), col("embedding"), col("label"),
          lit(ChangeLog.OpDelete).as("__op"),
          (col("vec_id") + 1000).as("__seq"))
      idx.sync(s, upserts.unionByName(deletes))
      idx.read(s).agg(
        count(lit(1)).as("n"),
        sum(col("vec_id")).as("sum_pk"),
        round(avg("__norm"), 4).as("avg_norm"))
    }),
    // IVF ANN with centroid pruning (nProbe=4 of 16) — rows-only;
    // recall vs exact asserted in ScalaTest.
    "ann_ivf_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      val index = Ann.buildIvf(e.filter(col("vec_id") >= 5), "embedding", 16)
      Ann.queryIvf(index, e.filter(col("vec_id") < 5), "vec_id", "embedding",
          "vec_id", "embedding", k = 3, nProbe = 4)
        .select(col("query_id"), col("rank").cast("long").as("rnk"),
          col("vec_id"))
    }),
    // IVF at full probe (nProbe = #cells) degrades to exact KNN by
    // construction — which makes THIS ann path oracle-checkable: the
    // DuckDB oracle is the plain batch-KNN SQL. Proves the
    // cell-join + refine machinery loses nothing when nothing is pruned.
    "ann_ivf_fullprobe" -> ((s, dir) => {
      val e = emb(s, dir)
      val index = Ann.buildIvf(e.filter(col("vec_id") >= 5), "embedding", 16)
      Ann.queryIvf(index, e.filter(col("vec_id") < 5), "vec_id", "embedding",
          "vec_id", "embedding", k = 3, nProbe = 16)
        .select(col("query_id"), col("rank").cast("long").as("rnk"),
          col("vec_id"))
        .orderBy("query_id", "rnk")
    }),
    // LSH ANN — rows-only; recall asserted in ScalaTest.
    "ann_lsh_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      val index = Ann.buildLsh(e.filter(col("vec_id") >= 5), "embedding",
        bucketLength = 2.0)
      Ann.queryLsh(index, e.filter(col("vec_id") < 5), "vec_id", "embedding",
          "vec_id", k = 3, maxDistance = 2.0)
        .select(col("query_id"), col("rank").cast("long").as("rnk"),
          col("vec_id"))
    }),
    // Deterministic hash-projection embedder → self-similarity top-5 for
    // doc 0 — rows-only (xxhash64 has no DuckDB twin).
    "embed_knn" -> ((s, dir) => {
      val embedder = new HashProjectionEmbedder(64)
      val corpus = embedder.embed(docs(s, dir).filter(col("doc_id") < 200),
        "text")
      val qv = corpus.filter(col("doc_id") === 0)
        .select("embedding").head().getSeq[Float](0)
      Knn.singleQuery(corpus.filter(col("doc_id") =!= 0), "embedding",
          "doc_id", qv, k = 5, Metric.Cosine)
        .select(col("rank").cast("long").as("rnk"), col("doc_id"))
    }),
    // TF-IDF pipeline embedder smoke — rows-only (IDF fit is corpus-wide).
    "embed_tfidf_stats" -> ((s, dir) => {
      val embedder = new HashingTfIdfEmbedder(64)
      embedder.embed(docs(s, dir), "text")
        .agg(count(lit(1)).as("n"),
          sum(when(col("embedding").isNotNull, 1L).otherwise(0L))
            .as("n_embedded"),
          sum(size(col("embedding"))).as("sum_dims"))
    }),
    // Multimodal frame sampling: video rows explode to one row per
    // 250 ms frame via sequence+explode; the oracle reproduces the
    // frame grid with generate_series.
    "mm_frame_sample" -> ((s, dir) => {
      val media = Multimodal.syntheticMedia(
        docs(s, dir).filter(col("doc_id") < 60), "doc_id", "text")
      Multimodal.sampleFrames(media, everyMs = 250L)
        .select(col("media_id"), col("frame_idx"), col("ts_ms"))
        .orderBy("media_id", "frame_idx")
    }),
    // Multimodal resize: geometry + byte-budget contract on image rows.
    "mm_resize" -> ((s, dir) => {
      val media = Multimodal.syntheticMedia(
        docs(s, dir).filter(col("doc_id") < 100), "doc_id", "text")
      Multimodal.resize(media, 64, 64)
        .filter(col("kind") === "image" && col("content").isNotNull)
        .select(col("media_id"), col("width"), col("height"),
          length(col("content")).cast("long").as("n_bytes"))
        .orderBy("media_id")
    }),
    // Multimodal: binary payload column → partition-batched feature
    // extraction; metadata path oracle-checked, feature values ScalaTest'd.
    "multimodal_features" -> ((s, dir) => {
      val media = Multimodal.syntheticMedia(
        docs(s, dir).filter(col("doc_id") < 100), "doc_id", "text")
      Multimodal.extractFeatures(media, dim = 64).toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          size(col("feature")).cast("long").as("n_dims"))
        .orderBy("media_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    // identical to the exact batch-KNN oracle: at full probe the IVF
    // candidate set is the whole corpus
    "ann_ivf_fullprobe" ->
      """SELECT * FROM (
        |  SELECT q.vec_id AS query_id,
        |         CAST(row_number() OVER (
        |           PARTITION BY q.vec_id
        |           ORDER BY list_cosine_similarity(c.embedding, q.embedding) DESC,
        |                    c.vec_id) AS BIGINT) AS rnk,
        |         c.vec_id
        |  FROM embeddings c, embeddings q
        |  WHERE q.vec_id < 5 AND c.vec_id >= 5)
        |WHERE rnk <= 3
        |ORDER BY query_id, rnk""".stripMargin,
    // the embedder's aggregate shape is SQL-expressible even though the
    // vectors aren't: every non-null non-empty text embeds to exactly
    // `dim` floats, null/empty to NULL
    "embed_tfidf_stats" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN text IS NOT NULL AND text <> ''
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_embedded,
        |  CAST(64 * sum(CASE WHEN text IS NOT NULL AND text <> ''
        |                THEN 1 ELSE 0 END) AS BIGINT) AS sum_dims
        |FROM documents""".stripMargin,
    "index_build_stats" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT vec_id) AS BIGINT) AS n_pk,
        |  round(avg(sqrt(list_dot_product(embedding, embedding))), 4)
        |    AS avg_norm
        |FROM embeddings
        |WHERE embedding IS NOT NULL AND len(embedding) = 64
        |  AND list_dot_product(embedding, embedding) > 0""".stripMargin,
    "index_sync_incremental" ->
      """WITH kept AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  WHERE vec_id < 400 AND vec_id NOT BETWEEN 0 AND 9
        |    AND embedding IS NOT NULL AND len(embedding) = 64
        |    AND list_dot_product(embedding, embedding) > 0),
        |ups AS (
        |  SELECT vec_id - 400 AS vec_id, embedding FROM embeddings
        |  WHERE vec_id BETWEEN 400 AND 404
        |    AND embedding IS NOT NULL AND len(embedding) = 64
        |    AND list_dot_product(embedding, embedding) > 0),
        |merged AS (SELECT * FROM kept UNION ALL SELECT * FROM ups)
        |SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(vec_id) AS BIGINT) AS sum_pk,
        |  round(avg(sqrt(list_dot_product(embedding, embedding))), 4)
        |    AS avg_norm
        |FROM merged""".stripMargin,
    "mm_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id AS media_id,
        |    unnest(generate_series(0, CAST(10 * length(text) AS BIGINT),
        |      250)) AS ts
        |  FROM documents
        |  WHERE doc_id < 60 AND doc_id % 3 = 2 AND text IS NOT NULL)
        |SELECT media_id, CAST(ts // 250 AS BIGINT) AS frame_idx,
        |  CAST(ts AS BIGINT) AS ts_ms
        |FROM f ORDER BY media_id, frame_idx""".stripMargin,
    "mm_resize" ->
      """SELECT doc_id AS media_id,
        |  CAST(64 AS INT) AS width, CAST(64 AS INT) AS height,
        |  CAST(least(octet_length(encode(text)), 64*64*3) AS BIGINT)
        |    AS n_bytes
        |FROM documents
        |WHERE doc_id < 100 AND doc_id % 3 = 0 AND text IS NOT NULL
        |ORDER BY media_id""".stripMargin,
    "multimodal_features" ->
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(64 AS BIGINT) AS n_dims
        |FROM documents WHERE doc_id < 100 ORDER BY media_id""".stripMargin,
  )
}
