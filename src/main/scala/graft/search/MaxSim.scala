package graft.search

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Late-interaction multi-vector retrieval — MaxSim (Khattab &
  * Zaharia, "ColBERT", SIGIR 2020): documents and queries are BAGS of
  * per-token vectors, and score(q, d) = Σ_{query token} max_{doc
  * token} cos(qt, dt) — each query token independently finds its best
  * match in the doc, which preserves term-level interaction that
  * single-vector pooling erases. The first-class retriever tier for
  * training-data curation the pooled ANN legs don't cover.
  *
  * Relationally the score is a grouped join + two aggregations (max
  * per query token, ordered sum per doc), and the scale story is the
  * PLAID two-stage shape (Santhanam et al., CIKM 2022): candidate
  * docs come from ONE equi-join of query-token buckets to doc-token
  * buckets on a sign-LSH key — never an unguarded
  * queries × tokens × corpus cross product — and the exact MaxSim
  * runs only over the candidate pairs. On clustered real-token
  * embeddings the bucket join prunes hard; on uniform data it
  * degrades to most-of-corpus candidates while staying correct
  * (exact MaxSim over every doc sharing at least one bucket).
  *
  * Determinism discipline: cosines are computed in DOUBLE with
  * left-to-right component folds, the per-doc sum folds in QUERY
  * TOKEN order, and the bucket sign test runs on floor(x·2^20)
  * integers — every stage bit-reproducible and DuckDB-replayable.
  */
object MaxSim {

  /** Sign-LSH bucket of a token vector: `bits` sign tests, bit i =
    * sign of the integer-quantized sum of adjacent component pair
    * (2i, 2i+1) — axis-pair hyperplanes, exact integer arithmetic. */
  def bucket(vec: Column, bits: Int): Column = {
    val xi = transform(vec,
      x => floor(x.cast("double") * lit(1048576.0)).cast("long"))
    (0 until bits).map { i =>
      when(element_at(xi, 2 * i + 1) + element_at(xi, 2 * i + 2) >= 0,
        lit(1 << i)).otherwise(lit(0))
    }.reduceOption(_ + _).getOrElse(lit(0))
  }

  /** Exact double cosine with the zero-norm → 0 convention shared
    * with every exact leg (left-to-right folds: order-deterministic). */
  private def cosD(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), _ + _)
    val na = dot(a, a)
    val nb = dot(b, b)
    when(na === 0.0 || nb === 0.0, lit(0.0))
      .otherwise(dot(a, b) / (sqrt(na) * sqrt(nb)))
  }

  /** Handle to a [[persistTokens]] layout. */
  final case class PersistedTokens(path: String, bits: Int)

  /** Persist the token table partitioned by sign-LSH bucket — the
    * on-disk PLAID shape: candidate generation reads ONLY the query
    * tokens' bucket DIRECTORIES (partition pruning at the file
    * listing — a query batch touching b of 2^bits buckets never
    * opens the rest of a 100 TB token store), and the exact stage
    * reads candidate docs' tokens through a pk semi-join. Bucket
    * count rides a side file so queries re-derive the same hash. */
  def persistTokens(docTokens: DataFrame, docIdCol: String,
      docVecCol: String, path: String, bits: Int = 4): PersistedTokens = {
    require(bits >= 1 && bits <= 16, s"bits in [1, 16], got $bits")
    val dt = docTokens.filter(col(docVecCol).isNotNull)
      .select(col(docIdCol).as("__did"),
        transform(col(docVecCol), _.cast("double")).as("__dv"))
      .withColumn("__b", bucket(col("__dv"), bits))
    dt.repartition(col("__b"))
      .write.mode("overwrite").partitionBy("__b").parquet(path)
    val spark = docTokens.sparkSession
    import spark.implicits._
    Seq(bits).toDF("__bits").coalesce(1)
      .write.mode("overwrite").parquet(path + "_meta")
    PersistedTokens(path, bits)
  }

  /** [[topK]] over a [[persistTokens]] layout — identical scores by
    * construction (same buckets, same exact stage; shares the
    * in-memory oracle). Candidate generation scans only the query
    * buckets' dirs; the exact MaxSim joins the FULL token sets of
    * candidate docs back via the pk (so pruning never approximates a
    * candidate's score, exactly like the in-memory path). */
  def topKPersisted(spark: SparkSession, idx: PersistedTokens,
      docIdCol: String, queryTokens: DataFrame, queryIdCol: String,
      queryTokIdxCol: String, queryVecCol: String, k: Int): DataFrame = {
    val bits = spark.read.parquet(idx.path + "_meta")
      .head().getInt(0)
    val qt = queryTokens.filter(col(queryVecCol).isNotNull)
      .select(col(queryIdCol).as("query_id"),
        col(queryTokIdxCol).as("__ti"),
        transform(col(queryVecCol), _.cast("double")).as("__qv"))
      .withColumn("__b", bucket(col("__qv"), bits))
    val bs = qt.select("__b").distinct().collect().map(_.getInt(0)).toSeq
    val cand = spark.read.parquet(idx.path)
      .filter(col("__b").isin(bs: _*))
      .select("__did", "__b")
      .join(broadcast(qt.select("query_id", "__b").distinct()),
        Seq("__b"))
      .select("query_id", "__did").distinct()
    val dt = spark.read.parquet(idx.path).select("__did", "__dv")
      .join(broadcast(cand.select("__did").distinct()), Seq("__did"),
        "left_semi")
    val scored = cand
      .join(broadcast(qt.select("query_id", "__ti", "__qv")),
        Seq("query_id"))
      .join(dt, Seq("__did"))
      .withColumn("__cos", cosD(col("__qv"), col("__dv")))
      .groupBy("query_id", "__did", "__ti")
      .agg(max(col("__cos")).as("__m"))
      .groupBy("query_id", "__did")
      .agg(aggregate(
        array_sort(collect_list(struct(col("__ti"), col("__m")))),
        lit(0.0), (a, x) => a + x("__m")).as("maxsim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("maxsim").desc, col("__did").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("__did").as(docIdCol),
        col("maxsim"))
      .orderBy(col("query_id").asc, col("rank").asc)
  }

  /** MaxSim top-k. `docTokens` = one row per (doc, token vector);
    * `queryTokens` = one row per (query, token index, token vector).
    * `bits = 0` disables pruning (single bucket — the exact
    * brute-force reference). Returns (query_id, rank, <docIdCol>,
    * maxsim). */
  def topK(docTokens: DataFrame, docIdCol: String, docVecCol: String,
      queryTokens: DataFrame, queryIdCol: String, queryTokIdxCol: String,
      queryVecCol: String, k: Int, bits: Int = 4): DataFrame = {
    require(bits >= 0 && bits <= 16, s"bits in [0, 16], got $bits")
    val dt = docTokens.filter(col(docVecCol).isNotNull)
      .select(col(docIdCol).as("__did"),
        transform(col(docVecCol), _.cast("double")).as("__dv"))
      .withColumn("__b", bucket(col("__dv"), bits))
    val qt = queryTokens.filter(col(queryVecCol).isNotNull)
      .select(col(queryIdCol).as("query_id"),
        col(queryTokIdxCol).as("__ti"),
        transform(col(queryVecCol), _.cast("double")).as("__qv"))
      .withColumn("__b", bucket(col("__qv"), bits))
    // stage 1 — candidate generation: ONE equi-join on the bucket
    // key (query side broadcast: queries × tokens is request-sized)
    val cand = dt.select("__did", "__b")
      .join(broadcast(qt.select("query_id", "__b").distinct()),
        Seq("__b"))
      .select("query_id", "__did").distinct()
    // stage 2 — exact MaxSim over candidate pairs only
    val scored = cand
      .join(broadcast(qt.select("query_id", "__ti", "__qv")),
        Seq("query_id"))
      .join(dt.select("__did", "__dv"), Seq("__did"))
      .withColumn("__cos", cosD(col("__qv"), col("__dv")))
      .groupBy("query_id", "__did", "__ti")
      .agg(max(col("__cos")).as("__m"))
      .groupBy("query_id", "__did")
      .agg(aggregate(
        array_sort(collect_list(struct(col("__ti"), col("__m")))),
        lit(0.0), (a, x) => a + x("__m")).as("maxsim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("maxsim").desc, col("__did").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("__did").as(docIdCol),
        col("maxsim"))
      .orderBy(col("query_id").asc, col("rank").asc)
  }
}
