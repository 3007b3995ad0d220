package graft.index

import graft.streaming.AtomicSwap
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, lag}

/** Maintenance for a persisted CDX archive index (the SURT-keyed
  * capture index of [[graft.queries.WebQueries]]'s crawl tier —
  * reference seam: delta-sync index maintenance, reference
  * src/databricks/syntetic_data.py:101,218-219, applied to the
  * archive index).
  *
  * A LIVE crawl maintains its index by appending each micro-batch's
  * rows — but appends carry no range layout, so a domain probe that
  * should open one partition degrades to a full index scan. This is
  * the `Index.optimize()` discipline applied to the CDX index: re-sort
  * the accumulated appends into the batch build's
  * `repartitionByRange(surt_key, ts)` + sorted-files layout, answers
  * identical, so probes prune again. A crawler schedules it
  * periodically behind the stream (Common Crawl's cdx-*.gz are the
  * same artifact: per-crawl re-sorted indexes, never raw appends).
  *
  * At 100 TB: one range shuffle of (key, coordinate) rows — the index
  * is ~1/10^4 of archive bytes (no payloads), so the pass costs
  * minutes, and fetch cost goes back to tracking HITS instead of
  * index size.
  */
object CdxIndex {

  /** Rewrite the index at `path` into the range-partitioned, sorted
    * layout, atomically (stage + [[AtomicSwap]]: readers see the old
    * or the new index, never a half-written one). Idempotent — the
    * row set is unchanged, so re-running converges on the same
    * layout. Run it from the maintenance slot between micro-batches
    * (the streamed appends must be quiescent during the swap, the
    * same contract every `optimize()` in this engine carries).
    *
    * `collapse` folds rows DURING the rewrite — pass
    * [[collapseByDigest]] / [[collapseByTimestamp]] (or their
    * composition) to run the wayback collapse options at maintenance
    * time, the way production index pipelines do: the re-sort shuffle
    * is already paid, so the fold rides it for free, and both folds
    * are idempotent (collapsing a collapsed index is a no-op), which
    * keeps the whole pass idempotent. */
  def optimize(spark: SparkSession, path: String,
      numPartitions: Int = 4,
      collapse: DataFrame => DataFrame = identity): Unit = {
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = AtomicSwap.stagePath(path)
    fs.delete(new Path(stage), true)
    collapse(spark.read.parquet(path))
      .repartitionByRange(numPartitions, col("surt_key"), col("ts"))
      .sortWithinPartitions("surt_key", "ts")
      .write.mode("overwrite").parquet(stage)
    AtomicSwap.commit(fs, path, stage)
  }

  /** Wayback-style `collapse=digest` at index build/maintenance time:
    * per SURT key, CONSECUTIVE captures carrying the same payload
    * digest fold to their first row — the index-side dedup that keeps
    * a multi-snapshot index linear in CHANGE, not in crawls run. A
    * page's resolved content history is unchanged (every digest
    * transition survives; the folded rows repeat the digest of the
    * row that stays). Key-bounded window only, never a global sort.
    * A capture folds ONLY when provably identical: a null digest on
    * either side of the comparison keeps the row (coalesce a computed
    * digest in first if digest-less captures should participate). */
  def collapseByDigest(index: DataFrame,
      digestCol: String = "payload_digest"): DataFrame = {
    val w = Window.partitionBy("surt_key")
      .orderBy(col("ts"), col(digestCol))
    index.withColumn("__prev", lag(col(digestCol), 1).over(w))
      .filter(col(digestCol).isNull || col("__prev").isNull ||
        col("__prev") =!= col(digestCol))
      .drop("__prev")
  }

  /** Wayback-style `collapse=timestamp:N` at index build/maintenance
    * time: per SURT key, a capture whose leading `prefixLen`
    * timestamp characters equal the PREVIOUS capture's folds away —
    * at most one capture per page per time bucket survives (the
    * first). This is frequency THINNING, not change preservation:
    * unlike [[collapseByDigest]] a changed capture inside the same
    * bucket folds too — the wayback option a consumer picks when the
    * question is "one representative capture per day/month/year",
    * not "every content version". The timestamp prefix is monotone
    * in the capture order, so the adjacent (`lag`) comparison is
    * exactly keep-first-per-bucket. Key-bounded window only, never a
    * global sort — the same shuffle shape as the digest fold, so the
    * two compose in one maintenance pass at any index size. */
  def collapseByTimestamp(index: DataFrame, prefixLen: Int,
      tsCol: String = "ts"): DataFrame = {
    val pfx = org.apache.spark.sql.functions.substring(
      col(tsCol), 1, prefixLen)
    val w = Window.partitionBy("surt_key")
      .orderBy(col(tsCol), col("url"))
    index.withColumn("__prevp", lag(pfx, 1).over(w))
      .filter(col("__prevp").isNull || col("__prevp") =!= pfx)
      .drop("__prevp")
  }
}
