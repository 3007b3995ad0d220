package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampled k-means (seeded Lloyd) — the quantizer trainer
  * behind [[Ann.buildIvfTrained]] and [[Pq.fitTrained]].
  *
  * The managed vector-search engine the reference delegates to
  * (/root/reference/src/databricks/query_endpoint.py:126-146) TRAINS its
  * coarse and product quantizers; the first-k-rows codebooks of
  * [[Pq.fit]] / [[Ann.buildIvfDeterministic]] are perfect for oracle
  * replay but at 100× scale arbitrary-row codebooks quantize poorly and
  * ANN recall collapses. This trainer closes that gap WITHOUT giving up
  * replayability — every step is a pure function of the corpus:
  *
  *  - the training sample is the first `n` rows ordered by
  *    `(md5(cast(id as string)), id)` — an effectively uniform shuffle
  *    any engine with `md5()` reproduces, and a `TakeOrderedAndProject`
  *    (map-side top-n per partition, no global sort) at 100 TB;
  *  - coordinates are quantized to `floor(x · 2^20)` (the grid shared
  *    with [[Pq]] and SignLsh), so assignment distances are exact
  *    integer sums — order-free, no float drift between engines;
  *  - Lloyd runs a FIXED number of iterations (no convergence test —
  *    data-dependent stopping would not replay), means use
  *    `floorDiv(sum, count)`, distance ties break to the lowest
  *    centroid index, and a cluster that loses all members keeps its
  *    previous centroid.
  *
  * A SQL oracle replays training by unrolling the iterations: per
  * iteration one distance-aggregate, one argmin window, one mean
  * aggregate — see `ann_ivf_trained_topk` / `ann_pq_trained_rerank` in
  * InfraQueries. Scale shape: the sample is driver-small (n vectors,
  * like any KMeans model's centroids) and Lloyd is O(n·k·dim·iters) on
  * the driver — independent of corpus size; the corpus-sized work
  * (assignment / encode) stays distributed in the callers.
  */
object Kmeans {

  /** The first `n` corpus vectors in `(md5(id), id)` order, quantized to
    * the 2^20 integer grid. Driver-small by construction. */
  def sampleQuantized(corpus: DataFrame, vecCol: String, idCol: String,
      n: Int): Array[Array[Long]] =
    corpus.filter(col(vecCol).isNotNull)
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
      .limit(n)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).toArray
        .map(x => math.floor(x.toDouble * Pq.Scale).toLong))

  /** Fixed-iteration integer Lloyd. Init = first `k` sample points;
    * assignment = exact integer L2² argmin (ties → lowest index);
    * update = per-component `floorDiv(sum, count)`; empty cluster →
    * previous centroid. Returns `min(k, points.length)` centroids on
    * the same integer grid as the input. */
  def lloyd(points: Array[Array[Long]], k: Int, iters: Int)
      : Array[Array[Long]] = {
    require(points.nonEmpty, "k-means needs a non-empty sample")
    val dim = points.head.length
    var cents: Array[Array[Long]] = points.take(k).map(_.clone)
    var it = 0
    while (it < iters) {
      val sums = Array.ofDim[Long](cents.length, dim)
      val cnts = new Array[Long](cents.length)
      points.foreach { p =>
        var bestJ = 0
        var bestD = Long.MaxValue
        var j = 0
        while (j < cents.length) {
          var d2 = 0L
          var d = 0
          while (d < dim) {
            val diff = p(d) - cents(j)(d)
            d2 += diff * diff
            d += 1
          }
          if (d2 < bestD) { bestD = d2; bestJ = j }
          j += 1
        }
        cnts(bestJ) += 1
        var d = 0
        while (d < dim) { sums(bestJ)(d) += p(d); d += 1 }
      }
      cents = Array.tabulate(cents.length) { j =>
        if (cnts(j) == 0L) cents(j)
        else Array.tabulate(dim)(d => Math.floorDiv(sums(j)(d), cnts(j)))
      }
      it += 1
    }
    cents
  }
}
