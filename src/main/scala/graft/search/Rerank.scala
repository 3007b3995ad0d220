package graft.search

import graft.functions.{Metric, VectorFunctions => VF}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Two-stage retrieve-then-rerank — the public form of the reference's
  * commented reranker hook (reference
  * src/databricks/query_endpoint.py:130:
  * `reranker=DatabricksReranker(columns_to_rerank=[...])`): retrieve a
  * candidate multiplier `c` times more rows than needed with a CHEAP
  * score, then re-score exactly those `k*c` candidates with the full
  * metric and keep `k`.
  *
  * The cheap stage here scores in a `coarseDims`-prefix subspace of the
  * embedding (the dimension-truncation trick quantized rerankers use):
  * at 768-dim production vectors an 8-dim prefix scan is ~100× less
  * arithmetic per row, and the exact metric only ever touches `k*c` rows
  * per query. Both stages are window top-k over a broadcast-NLJ — at
  * 100 TB swap stage 1's scan for an IVF/LSH candidate fetch
  * ([[Ann.queryIvf]]) and keep stage 2 unchanged.
  *
  * Everything is a pure function of the inputs (tie-break by pk at both
  * stages), so the DuckDB oracle replays BOTH stages at realistic
  * parameters — no degeneracy needed. `c` spanning the corpus
  * (`k*c >= |corpus|`) degenerates to exact KNN, the property
  * RerankSpec asserts.
  */
object Rerank {

  /** Truncated-subspace rerank. Returns
    * `(query_id, rank, <corpusPkCol>, score)` like [[Knn.batchQuery]].
    */
  def truncated(
      corpus: DataFrame,
      queries: DataFrame,
      corpusVecCol: String,
      corpusPkCol: String,
      queryVecCol: String,
      queryIdCol: String,
      k: Int,
      c: Int,
      coarseDims: Int,
      metric: Metric = Metric.Cosine): DataFrame = {
    require(k >= 1 && c >= 1 && coarseDims >= 1)
    val q = broadcast(queries.select(col(queryIdCol).as("query_id"),
      col(queryVecCol).as("__qvec")))
    val coarse = corpus
      .filter(col(corpusVecCol).isNotNull)
      .crossJoin(q)
      .withColumn("__cscore", VF.distance(
        slice(col(corpusVecCol), 1, coarseDims),
        slice(col("__qvec"), 1, coarseDims), metric))
    val w1 = Window.partitionBy("query_id")
      .orderBy(Knn.scoreOrder(col("__cscore"), metric),
        col(corpusPkCol).asc)
    val candidates = coarse.withColumn("__cr", row_number().over(w1))
      .filter(col("__cr") <= k * c)
    val rescored = candidates.withColumn("score",
      VF.distance(col(corpusVecCol), col("__qvec"), metric))
    val w2 = Window.partitionBy("query_id")
      .orderBy(Knn.scoreOrder(col("score"), metric), col(corpusPkCol).asc)
    rescored.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(corpusPkCol), col("score"))
      .orderBy(col("query_id").asc, col("rank").asc)
  }

  /** The documented 100 TB composition, realized: stage 1's full-corpus
    * scan is replaced by an IVF candidate fetch — only the `nProbe`
    * probed cells' rows are ever read (partition pruning on a
    * [[Ann.persistIvf]] layout) — the coarse dims-prefix ranking runs
    * over those candidates, and stage 2 re-scores the k·c survivors
    * with the full metric. Three prunes compose: cells → prefix rank →
    * exact refine; each stage is a pure deterministic function of the
    * inputs, so the whole composition stays oracle-checkable.
    * With `nProbe` = #cells this degenerates to [[truncated]] over the
    * full corpus (RerankSpec asserts it). */
  def truncatedOverIvf(index: Ann.IvfIndex, queries: DataFrame,
      queryIdCol: String, queryVecCol: String, corpusPkCol: String,
      corpusVecCol: String, k: Int, c: Int, coarseDims: Int, nProbe: Int,
      metric: Metric = Metric.Cosine): DataFrame = {
    require(k >= 1 && c >= 1 && coarseDims >= 1 && nProbe >= 1)
    val q = queries.filter(col(queryVecCol).isNotNull)
      .select(col(queryIdCol).as("query_id"),
        col(queryVecCol).as("__qvec"))
    val probed = q.crossJoin(broadcast(index.centroids))
      .withColumn("__cdist", VF.l2(col("__qvec"), col("__centroid")))
      .withColumn("__cr", row_number().over(
        Window.partitionBy("query_id").orderBy(col("__cdist").asc,
          col("__cell").asc)))
      .filter(col("__cr") <= nProbe)
      .select(col("query_id"), col("__qvec"), col("__cell"))
    val cand = index.corpusWithCell
      .filter(col(corpusVecCol).isNotNull)
      .join(broadcast(probed), Seq("__cell"))
    val coarse = cand.withColumn("__cscore", VF.distance(
      slice(col(corpusVecCol), 1, coarseDims),
      slice(col("__qvec"), 1, coarseDims), metric))
    val w1 = Window.partitionBy("query_id")
      .orderBy(Knn.scoreOrder(col("__cscore"), metric),
        col(corpusPkCol).asc)
    val keep = coarse.withColumn("__crk", row_number().over(w1))
      .filter(col("__crk") <= k * c)
    val rescored = keep.withColumn("score",
      VF.distance(col(corpusVecCol), col("__qvec"), metric))
    val w2 = Window.partitionBy("query_id")
      .orderBy(Knn.scoreOrder(col("score"), metric), col(corpusPkCol).asc)
    rescored.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col(corpusPkCol), col("score"))
      .orderBy(col("query_id").asc, col("rank").asc)
  }
}
