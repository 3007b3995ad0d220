package graft.index

import graft.functions.Metric
import graft.search.{Ann, GraphAnn, Hybrid, Knn}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The engine-side realization of `IndexMeta.kind`: ONE façade
  * `similarity_search` call routes to whichever index layout the index
  * was created with — exactly how the reference's single entry point
  * works regardless of how the managed service indexed the table
  * (/root/reference/src/databricks/query_endpoint.py:126-146; SURVEY
  * §4.3 names exact-vs-ANN selection as engine logic). Build, search
  * and CDF sync all dispatch here, so a user who created an index with
  * `kind = "ivf"` gets the cell-pruned on-disk plan from the same
  * façade call that runs brute-force KNN on an `"exact"` index.
  *
  * ANN layouts index the SOURCE vectors verbatim (no normalization):
  * cosine ranking is scale-invariant, the persisted legs refine with
  * exact metric arithmetic either way, and indexing raw rows keeps the
  * façade's results bit-identical to the direct library calls — which
  * is what lets the `facade_route_*` queries share the direct legs'
  * oracles. The normalized exact artifact still serves `describe` and
  * the `"exact"` kind itself.
  *
  * Per-kind options (all frozen at creation, persisted in the meta
  * JSON): ivf `cells`/`nProbe`; signlsh `tables`/`bits`; graph
  * `m`/`buckets`/`entries`/`beam`/`hops`/`entryMod`/`metric`, plus
  * `layered=true` with `m1`/`entryBuckets`/`l2Entries`/`l1Beam`/
  * `l1Hops` for the two-layer hierarchy (a coarse entry graph over
  * the `pk % entryMod` sample persisted beside the main layout —
  * HNSW's upper layers, searched and synced together); hybrid
  * `textCol`/`buckets`/`n`.
  */
object IndexKinds {

  val Exact = "exact"
  val Ivf = "ivf"
  val SignLsh = "signlsh"
  val Graph = "graph"
  val HybridKind = "hybrid"
  val All: Set[String] = Set(Exact, Ivf, SignLsh, Graph, HybridKind)

  def layoutPath(meta: IndexMeta): String = s"${meta.path}__${meta.kind}"

  private def opt(meta: IndexMeta, key: String, dflt: Int): Int =
    meta.options.get(key).map(_.toInt).getOrElse(dflt)
  private def optL(meta: IndexMeta, key: String, dflt: Long): Long =
    meta.options.get(key).map(_.toLong).getOrElse(dflt)
  private def metricOf(meta: IndexMeta): Metric =
    meta.options.get("metric").map(Metric.of).getOrElse(meta.metric)
  private def textColOf(meta: IndexMeta): String =
    meta.options.getOrElse("textCol", throw new IllegalArgumentException(
      s"index kind '$HybridKind' needs a textCol option"))

  private def graphHandle(meta: IndexMeta): GraphAnn.PersistedGraph =
    GraphAnn.PersistedGraph(layoutPath(meta), m = opt(meta, "m", 6),
      buckets = opt(meta, "buckets", 16))
  private def entryHandle(meta: IndexMeta): GraphAnn.PersistedGraph =
    GraphAnn.PersistedGraph(layoutPath(meta) + "_entry",
      m = opt(meta, "m1", 4), buckets = opt(meta, "entryBuckets", 4))
  private def layered(meta: IndexMeta): Boolean =
    meta.options.get("layered").contains("true")

  /** The layout's own raw-corpus relation — the graph walk's scoring
    * side, the hybrid vector leg, and the column join-back of
    * `similaritySearch` all read it. No kind duplicates the corpus:
    * the IVF layout and the sign-LSH `_docs` table ARE the corpus;
    * graph and hybrid persist a `_corpus` side table at build. */
  def corpusTable(spark: SparkSession, meta: IndexMeta): DataFrame =
    meta.kind match {
      case Ivf =>
        val t = spark.read.parquet(layoutPath(meta))
        t.drop(t.columns.filter(Set("__cell", "__subcell")): _*)
      case SignLsh =>
        spark.read.parquet(layoutPath(meta) + "_docs").drop("__dbkt")
      case Graph | HybridKind =>
        spark.read.parquet(layoutPath(meta) + "_corpus")
      case _ => spark.read.parquet(meta.path)
    }

  /** Build the kind's persisted layout from the raw source (no-op for
    * `"exact"` — the normalized artifact is the layout). */
  def build(spark: SparkSession, meta: IndexMeta,
      source: DataFrame): Unit = meta.kind match {
    case Exact => ()
    case Ivf =>
      Ann.persistIvf(Ann.buildIvfDeterministic(source, meta.vecCol,
        meta.pkCol, opt(meta, "cells", 16)), layoutPath(meta))
    case SignLsh =>
      Ann.persistSignLsh(Ann.buildSignLsh(source, meta.vecCol,
        opt(meta, "tables", 8), opt(meta, "bits", 4)),
        meta.pkCol, meta.vecCol, layoutPath(meta))
    case Graph =>
      GraphAnn.persistGraph(
        GraphAnn.buildGraphExact(source, meta.vecCol, meta.pkCol,
          m = opt(meta, "m", 6)),
        layoutPath(meta), buckets = opt(meta, "buckets", 16))
      // layered = the 100 TB configuration: a coarse entry graph over
      // the pk % entryMod sample persists beside the main layout and
      // the search descends through it (HNSW's upper layers)
      if (layered(meta))
        GraphAnn.persistGraph(
          GraphAnn.buildEntryGraphExact(source, meta.vecCol, meta.pkCol,
            entryMod = optL(meta, "entryMod", 5L),
            m1 = opt(meta, "m1", 4)),
          layoutPath(meta) + "_entry",
          buckets = opt(meta, "entryBuckets", 4))
      source.write.mode("overwrite").parquet(layoutPath(meta) + "_corpus")
    case HybridKind =>
      Hybrid.persistPostings(source, meta.pkCol, textColOf(meta),
        layoutPath(meta), buckets = opt(meta, "buckets", 32))
      source.write.mode("overwrite").parquet(layoutPath(meta) + "_corpus")
    case other =>
      throw new IllegalArgumentException(s"unknown index kind '$other'")
  }

  /** Routed batch search: `(query_id, rank, <pk>, score)` for the
    * vector kinds (hybrid returns its native
    * `(query_id, rank, <pk>, in_vec, in_kw)`), metadata `rowFilter`
    * passed through to every leg with PRE-rank semantics. */
  def search(spark: SparkSession, meta: IndexMeta, queries: DataFrame,
      queryIdCol: String, queryVecCol: String, k: Int,
      rowFilter: Option[Column] = None,
      queryTextCol: Option[String] = None): DataFrame = meta.kind match {
    case Exact =>
      val corpus = spark.read.parquet(meta.path)
      Knn.batchQueryAgg(rowFilter.map(corpus.filter).getOrElse(corpus),
        queries, meta.vecCol, meta.pkCol, queryVecCol, queryIdCol, k,
        metricOf(meta))
    case Ivf =>
      Ann.queryPersistedIvf(spark, Ann.PersistedIvf(layoutPath(meta)),
        queries, queryIdCol, queryVecCol, meta.pkCol, meta.vecCol, k,
        nProbe = opt(meta, "nProbe", 4), metricOf(meta), rowFilter)
    case SignLsh =>
      Ann.queryPersistedSignLsh(spark,
        Ann.PersistedSignLsh(layoutPath(meta), opt(meta, "tables", 8),
          opt(meta, "bits", 4)),
        queries, queryIdCol, queryVecCol, meta.pkCol, meta.vecCol, k,
        metricOf(meta), rowFilter)
    case Graph if layered(meta) =>
      GraphAnn.queryPersistedGraphLayered(spark, graphHandle(meta),
        entryHandle(meta), corpusTable(spark, meta), queries,
        queryIdCol, queryVecCol, meta.pkCol, meta.vecCol, k,
        entries = opt(meta, "entries", 4), beam = opt(meta, "beam", 4),
        hops = opt(meta, "hops", 3),
        entryMod = optL(meta, "entryMod", 5L), metric = metricOf(meta),
        l2Entries = opt(meta, "l2Entries", 2),
        l1Beam = opt(meta, "l1Beam", 3), l1Hops = opt(meta, "l1Hops", 2),
        rowFilter = rowFilter)
    case Graph =>
      GraphAnn.queryPersistedGraph(spark, graphHandle(meta),
        corpusTable(spark, meta), queries, queryIdCol, queryVecCol,
        meta.pkCol, meta.vecCol, k, entries = opt(meta, "entries", 4),
        beam = opt(meta, "beam", 4), hops = opt(meta, "hops", 3),
        metric = metricOf(meta), entryMod = optL(meta, "entryMod", 0L),
        rowFilter = rowFilter)
    case HybridKind =>
      val qText = queryTextCol.getOrElse(
        throw new IllegalArgumentException(
          s"kind '$HybridKind' needs query text (queryTextCol)"))
      Hybrid.hybridTopKPersistedKw(spark,
        Hybrid.PersistedPostings(layoutPath(meta), opt(meta, "buckets", 32)),
        corpusTable(spark, meta), queries, queryIdCol, qText, queryVecCol,
        meta.pkCol, meta.vecCol, n = opt(meta, "n", 10), k = k,
        rowFilter = rowFilter)
    case other =>
      throw new IllegalArgumentException(s"unknown index kind '$other'")
  }

  /** Apply a CDF batch to the kind's layout (the exact artifact is
    * synced separately by [[VectorIndex.sync]]). Each layout keeps its
    * own frozen-at-build training state per its documented contract. */
  def sync(spark: SparkSession, meta: IndexMeta,
      changes: DataFrame): Unit = meta.kind match {
    case Exact => ()
    case Ivf =>
      Ann.syncPersistedIvf(spark, Ann.PersistedIvf(layoutPath(meta)),
        changes, meta.pkCol, meta.vecCol)
    case SignLsh =>
      Ann.syncPersistedSignLsh(spark,
        Ann.PersistedSignLsh(layoutPath(meta), opt(meta, "tables", 8),
          opt(meta, "bits", 4)),
        changes, meta.pkCol, meta.vecCol)
    case Graph =>
      // edge sync reads the PRE-change corpus (its pool), so it runs
      // before the corpus merge rewrites the side table
      if (layered(meta))
        GraphAnn.syncPersistedGraphLayered(spark, graphHandle(meta),
          entryHandle(meta), corpusTable(spark, meta), changes,
          meta.pkCol, meta.vecCol, optL(meta, "entryMod", 5L))
      else
        GraphAnn.syncPersistedGraphChanges(spark, graphHandle(meta),
          corpusTable(spark, meta), changes, meta.pkCol, meta.vecCol)
      mergeCorpus(spark, layoutPath(meta) + "_corpus", changes, meta)
    case HybridKind =>
      Hybrid.syncPersistedPostings(spark,
        Hybrid.PersistedPostings(layoutPath(meta), opt(meta, "buckets", 32)),
        changes, meta.pkCol, textColOf(meta))
      mergeCorpus(spark, layoutPath(meta) + "_corpus", changes, meta)
    case other =>
      throw new IllegalArgumentException(s"unknown index kind '$other'")
  }

  /** LWW merge of a CDF batch into an unpartitioned `_corpus` side
    * table (deletes and null-vector upserts leave it, matching
    * [[VectorIndex.sync]]), swapped in via the crash-safe
    * rename-aside protocol. */
  private def mergeCorpus(spark: SparkSession, path: String,
      changes: DataFrame, meta: IndexMeta): Unit = {
    val current = spark.read.parquet(path)
    val latest = ChangeLog.latestPerPk(changes, meta.pkCol)
    val upserts = latest.filter(col("__op") =!= ChangeLog.OpDelete)
      .drop("__op", "__seq").filter(col(meta.vecCol).isNotNull)
    val merged = current
      .join(latest.select(col(meta.pkCol)), Seq(meta.pkCol), "left_anti")
      .unionByName(upserts.select(current.columns.map(col): _*))
    val tmp = new org.apache.hadoop.fs.Path(path + "__tmp")
    merged.write.mode("overwrite").parquet(tmp.toString)
    val dst = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path + "__old")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(old, true)
    fs.rename(dst, old)
    fs.rename(tmp, dst)
    fs.delete(old, true)
  }
}
