package graft.search

import graft.functions.{Metric, SignLshFunctions, VectorFunctions => VF}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Graph-based ANN — the engine's answer to the managed service's HNSW
  * (SURVEY §4.1; the reference delegates ANN entirely to the service,
  * /root/reference/src/databricks/query_endpoint.py:126-146).
  *
  * HNSW itself is a pointer-chasing, driver-hostile structure; the
  * Spark-first re-expression keeps its two ingredients — a neighbor
  * graph and greedy beam search — but stores the graph as a plain
  * `(src, dst)` edge TABLE and runs the search as a fixed number of
  * relational hops:
  *
  *   C_0   = deterministic entry points (lowest `entries` node ids)
  *   hop h = score C_h, take the `beam` best per query, join them with
  *           the edge table, union the neighbors in, dedupe
  *   answer = exact top-k of C_H
  *
  * Every hop is one equi-join of a TINY frontier (queries × beam rows,
  * always broadcast) against the big edge/corpus tables — no O(n²)
  * pair scan at query time, no driver-side traversal. Candidate-set
  * size is bounded by entries + hops·beam·m per query, so memory is
  * constant in corpus size: exactly the property that lets the same
  * plan run against a 100 TB corpus where the edge table is just
  * another partitioned parquet table (partition by `__src` bucket →
  * each hop prunes to the frontier's buckets).
  *
  * Two graph builds:
  *  - [[buildGraphExact]]: true m-NN graph via self-join — O(n²),
  *    the bounded-block / ground-truth / oracle path (every stage is a
  *    pure function of the corpus, so DuckDB can replay build + all
  *    hops and hash-check the pruned result).
  *  - [[buildGraphLsh]]: edges from native sign-LSH bucket-mates —
  *    the 100 TB path (one equi-join on bucket codes, never n²);
  *    recall vs the exact graph is spec-checked in GraphAnnSpec.
  */
object GraphAnn {

  /** Neighbor graph: `edges` holds (`__src`, `__dst`), m rows per src. */
  final case class KnnGraph(edges: DataFrame, m: Int)

  /** Exact m-NN graph (L2, ties by id): each node's m nearest others.
    * O(n²) self-join — bound the corpus block when n is large; the
    * scale build is [[buildGraphLsh]]. */
  def buildGraphExact(corpus: DataFrame, vecCol: String, idCol: String,
      m: Int): KnnGraph = {
    val nodes = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("__src"), col(vecCol).as("__svec"))
    val others = nodes
      .select(col("__src").as("__dst"), col("__svec").as("__dvec"))
    // per-src m-NN via the bounded-heap operator: the n² pair stream is
    // reduced map-side (O(pairs·log m), never sorted), only groups×m
    // rows cross the exchange — the same result contract as
    // row_number() OVER (ORDER BY __d, __dst) <= m (TopKPlanSpec).
    val scored = nodes.join(others, col("__src") =!= col("__dst"))
      .select(col("__src"), col("__dst"),
        VF.l2(col("__svec"), col("__dvec")).as("__d"))
    val edges = graft.plans.TopK
      .perGroup(scored, "__src", "__d", "__dst", m, descending = false)
      .select("__src", "__dst")
    KnnGraph(edges, m)
  }

  /** Approximate m-NN graph from sign-LSH bucket-mates: candidates are
    * pairs sharing a (table, code) bucket — one equi-join on integer
    * codes instead of the n² cross join — then exact top-m per src.
    * The graph loses only edges whose endpoints collide in no table;
    * beam search tolerates that (recall spec'd, not assumed). */
  def buildGraphLsh(corpus: DataFrame, vecCol: String, idCol: String,
      m: Int, tables: Int = 8, bits: Int = 4): KnnGraph = {
    val nodes = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("__src"), col(vecCol).as("__svec"))
    val coded = nodes.select(col("__src"),
      posexplode(SignLshFunctions.signLshCodes(col("__svec"), tables,
        bits)).as(Seq("__t", "__code")))
    val b = coded.select(col("__src").as("__dst"), col("__t"),
      col("__code"))
    // dedupe BARE id pairs before touching vectors: the bucket join and
    // the distinct shuffle then move 16-byte rows, not 2×64-float rows
    // (the pair table is ×tables×bucket-mates larger than the corpus).
    // Vectors are re-attached afterwards by two equi-joins against the
    // node table — AQE broadcasts them when the corpus is small, and at
    // 100 TB they are ordinary shuffle joins on the pk, which is still
    // far cheaper than dragging vectors through the pair distinct.
    val pairs = coded.join(b, Seq("__t", "__code"))
      .filter(col("__src") =!= col("__dst"))
      .select("__src", "__dst").distinct()
    // bounded-heap top-m per src (see buildGraphExact) — bucket-mate
    // pair lists are skewed by construction, exactly where a full
    // window sort hurts most
    val scored = pairs
      .join(nodes, "__src")
      .join(nodes.select(col("__src").as("__dst"),
        col("__svec").as("__dvec")), "__dst")
      .select(col("__src"), col("__dst"),
        VF.l2(col("__svec"), col("__dvec")).as("__d"))
    val edges = graft.plans.TopK
      .perGroup(scored, "__src", "__d", "__dst", m, descending = false)
      .select("__src", "__dst")
    KnnGraph(edges, m)
  }

  /** Deterministic BEST-FIRST beam search over the graph — the same
    * search discipline as HNSW's layer-0 scan, expressed relationally.
    *
    * Navigability on hard (near-uniform high-dim) data needs two things
    * a naive "re-rank everything each hop" loop lacks:
    *
    *  1. **A visited set.** Each hop expands the `beam` best candidates
    *     that have NOT been expanded yet. Without it the frontier
    *     re-selects the same local optimum every hop and the search
    *     stalls after ~2 hops (measured mean recall 0.57 on random
    *     64-dim data; with the visited set + seeding it reaches 1.0).
    *  2. **Seeded entries** (`entryMod > 0`): a coarse layer. The entry
    *     points are the per-query `entries` nearest nodes among the
    *     deterministic sample `{id % entryMod == 0}` — i.e. scan a
    *     ~n/entryMod-row "layer 1", start the greedy descent near the
    *     target, exactly HNSW's upper-layer role. `entryMod = 0` keeps
    *     the legacy corpus-global lowest-id entries. The sample is a
    *     pure function of the corpus, so the whole search stays
    *     DuckDB-replayable.
    *
    * Per hop: one broadcast equi-join of the tiny frontier (queries ×
    * beam rows) against the edge table, one broadcast lookup join
    * against the corpus for vectors. Candidates per query stay bounded
    * by `entries + hops·beam·m`, constant in corpus size.
    *
    * The edge table is materialized ONCE up front (`localCheckpoint`),
    * so a lazily-built graph (the O(n²) exact build or the LSH build)
    * is not re-executed per hop; each hop is then checkpointed, which
    * keeps the iterative plan linear instead of exponential in `hops`.
    * Pass `materializeEdges = false` when `graph.edges` is already a
    * cheap scan (e.g. loaded from a [[persistGraph]] layout).
    *
    * Returns (query_id, rank, <pk>, score) top-k rows; a query can
    * return < k rows when the reachable set is smaller — standard ANN
    * semantics. */
  def queryGraph(graph: KnnGraph, corpus: DataFrame, queries: DataFrame,
      queryIdCol: String, queryVecCol: String, corpusPkCol: String,
      corpusVecCol: String, k: Int, entries: Int, beam: Int, hops: Int,
      metric: Metric = Metric.L2, entryMod: Long = 0L,
      materializeEdges: Boolean = true,
      statePartitions: Int = 4,
      materializeCorpus: Boolean = true): DataFrame = {
    val edges =
      if (materializeEdges) graph.edges.localCheckpoint(true)
      else graph.edges
    beamSearch(corpus, queries, queryIdCol, queryVecCol, corpusPkCol,
      corpusVecCol, _ => edges, k, entries, beam, hops, metric, entryMod,
      statePartitions, materializeCorpus)
  }

  /** Entry graph for [[queryGraphLayered]]: an exact m1-NN graph over
    * the `id % entryMod == 0` sample — HNSW's layer 1 as its own edge
    * table. O((n/entryMod)²) pairs through the bounded-heap top-m; at
    * 100 TB build it with [[buildGraphLsh]] over the same pool
    * instead. */
  def buildEntryGraphExact(corpus: DataFrame, vecCol: String,
      idCol: String, entryMod: Long, m1: Int): KnnGraph =
    buildGraphExact(corpus.filter(col(idCol) % entryMod === 0), vecCol,
      idCol, m1)

  /** Two-layer entry descent — HNSW's hierarchy, relationally. The
    * single-layer coarse entry ([[queryGraph]] with `entryMod`) scans
    * n/entryMod sample rows per query batch; here the scan drops to the
    * `id % entryMod² == 0` pool (n/entryMod² rows — entryMod× cheaper)
    * and a SHORT beam search over `entryGraph` (layer-1 edges among the
    * `% entryMod` pool) walks from those coarse winners to the best
    * `entries` layer-1 nodes, which seed the layer-0 search. Every
    * stage stays a pure function of the corpus — the whole descent is
    * DuckDB-replayable, unlike HNSW's randomized level draws.
    *
    * Layer-1 knobs: `l2Entries` coarse winners start the descent,
    * `l1Beam`/`l1Hops` bound its walk; candidate state stays
    * O(queries × (l2Entries + l1Hops·l1Beam·m1)) — constant in corpus
    * size, same argument as layer 0. */
  def queryGraphLayered(graph: KnnGraph, entryGraph: KnnGraph,
      corpus: DataFrame, queries: DataFrame, queryIdCol: String,
      queryVecCol: String, corpusPkCol: String, corpusVecCol: String,
      k: Int, entries: Int, beam: Int, hops: Int, entryMod: Long,
      metric: Metric = Metric.L2,
      l2Entries: Int = 2, l1Beam: Int = 3, l1Hops: Int = 2,
      statePartitions: Int = 4,
      materializeCorpus: Boolean = true,
      materializeEdges: Boolean = true): DataFrame = {
    val l1pool = corpus.filter(col(corpusPkCol) % entryMod === 0)
    val seeds = queryGraph(entryGraph, l1pool, queries, queryIdCol,
        queryVecCol, corpusPkCol, corpusVecCol, k = entries,
        entries = l2Entries, beam = l1Beam, hops = l1Hops, metric,
        entryMod = entryMod * entryMod,
        materializeEdges = materializeEdges,
        statePartitions = statePartitions,
        materializeCorpus = materializeCorpus)
      .select(col("query_id"), col(corpusPkCol).as("__nid"))
    val edges =
      if (materializeEdges) graph.edges.localCheckpoint(true)
      else graph.edges
    beamSearch(corpus, queries, queryIdCol, queryVecCol, corpusPkCol,
      corpusVecCol, _ => edges, k, entries, beam, hops, metric,
      entryMod = 0L, statePartitions, materializeCorpus,
      seedIds = Some(seeds))
  }

  // ---------------- multi-layer HNSW (md5 level draw) ----------------

  /** The deterministic analog of HNSW's geometric level draw: node
    * `id` lives on layer ≥ l iff its md5-derived 60-bit draw is
    * divisible by base^l — P ≈ base^-l per layer, so layer-l pools
    * shrink geometrically exactly like HNSW's, but membership is a
    * PURE FUNCTION of the id (DuckDB-replayable, and stable across
    * rebuilds/syncs where a stored random level would be state). */
  def hnswLevelGate(id: Column, base: Int, l: Int): Column = {
    require(base >= 2 && l >= 1 && math.pow(base.toDouble, l) <= (1L << 52),
      s"base^l must stay exactly representable, got $base^$l")
    val h = conv(substring(md5(id.cast("string")), 1, 15), 16, 10)
      .cast("long")
    pmod(h, lit(math.pow(base.toDouble, l).toLong)) === 0L
  }

  /** A multi-layer navigable graph: `layer0` spans the corpus,
    * `uppers(l-1)` spans the layer-l pool (md5 gate). */
  final case class HnswGraphs(layer0: KnnGraph, uppers: Seq[KnnGraph],
      base: Int)

  /** True multi-layer HNSW build — [[queryGraphLayered]]'s 2-layer
    * entry hierarchy generalized to `levels` upper layers with the
    * geometric [[hnswLevelGate]] pools (the real HNSW shape, for
    * corpora where one coarse layer can't cut entry distance enough).
    * Exact m-NN per layer here (the bounded/oracle path); at 100 TB
    * swap [[buildGraphLsh]] per layer — pools shrink base× per level,
    * so all upper layers together cost ≤ 1/(base−1) of layer 0. */
  def buildHnswExact(corpus: DataFrame, vecCol: String, idCol: String,
      m: Int, mUpper: Int, base: Int, levels: Int): HnswGraphs = {
    require(levels >= 1, s"levels >= 1, got $levels")
    val l0 = buildGraphExact(corpus, vecCol, idCol, m)
    val uppers = (1 to levels).map { l =>
      buildGraphExact(corpus.filter(hnswLevelGate(col(idCol), base, l)),
        vecCol, idCol, mUpper)
    }
    HnswGraphs(l0, uppers, base)
  }

  /** Exact top-`topEntries` scan of the TOP pool — HNSW's global entry
    * point(s): the layer-L pool is n/base^L rows, so the per-query
    * scan is the geometric hierarchy's cheap apex. */
  private def topPoolSeeds(pool: DataFrame, queries: DataFrame,
      queryIdCol: String, queryVecCol: String, corpusPkCol: String,
      corpusVecCol: String, topEntries: Int, metric: Metric): DataFrame = {
    val q = queries.filter(col(queryVecCol).isNotNull)
      .select(col(queryIdCol).as("query_id"),
        col(queryVecCol).as("__qvec"))
    val w = Window.partitionBy("query_id")
      .orderBy(Knn.scoreOrder(col("__score"), metric), col("__nid").asc)
    pool.filter(col(corpusVecCol).isNotNull)
      .select(col(corpusPkCol).as("__nid"), col(corpusVecCol).as("__nvec"))
      .crossJoin(broadcast(q))
      .withColumn("__score",
        VF.distance(col("__nvec"), col("__qvec"), metric))
      .withColumn("__rs", row_number().over(w))
      .filter(col("__rs") <= topEntries)
      .select("query_id", "__nid")
  }

  /** Multi-layer HNSW descent: entry = exact scan of the top pool,
    * then a SHORT beam walk on every upper layer hands its best nodes
    * down as the next layer's seeds (`topEntries` between upper
    * layers, `entries` into layer 0), and layer 0 runs the full
    * search. Every stage is a pure function of the corpus — level
    * gates, per-layer graphs, walks — so the whole descent replays in
    * the DuckDB oracle, unlike HNSW's stored random levels. Candidate
    * state per layer stays O(queries · (seeds + hops·beam·m)),
    * constant in corpus size. */
  def queryHnsw(g: HnswGraphs, corpus: DataFrame, queries: DataFrame,
      queryIdCol: String, queryVecCol: String, corpusPkCol: String,
      corpusVecCol: String, k: Int, entries: Int, beam: Int, hops: Int,
      metric: Metric = Metric.L2, topEntries: Int = 2,
      upperBeam: Int = 3, upperHops: Int = 2,
      statePartitions: Int = 4,
      materializeCorpus: Boolean = true,
      materializeEdges: Boolean = true): DataFrame = {
    val levels = g.uppers.size
    def pool(l: Int) = corpus.filter(
      hnswLevelGate(col(corpusPkCol), g.base, l))
    // pass materializeEdges=false when every layer's edge table is
    // already a cheap scan (memoized checkpointed builds, persisted
    // layouts): re-checkpointing a checkpoint is one pure extra
    // materialization job per layer per call
    def mat(df: DataFrame): DataFrame =
      if (materializeEdges) df.localCheckpoint(true) else df
    var seeds = topPoolSeeds(pool(levels), queries, queryIdCol,
      queryVecCol, corpusPkCol, corpusVecCol, topEntries, metric)
    for (l <- levels to 1 by -1) {
      val e = mat(g.uppers(l - 1).edges)
      seeds = beamSearch(pool(l), queries, queryIdCol, queryVecCol,
          corpusPkCol, corpusVecCol, _ => e,
          k = if (l == 1) entries else topEntries,
          entries = 0, beam = upperBeam, hops = upperHops, metric,
          entryMod = 0L, statePartitions, materializeCorpus,
          seedIds = Some(seeds))
        .select(col("query_id"), col(corpusPkCol).as("__nid"))
    }
    val e0 = mat(g.layer0.edges)
    beamSearch(corpus, queries, queryIdCol, queryVecCol, corpusPkCol,
      corpusVecCol, _ => e0, k, entries = 0, beam, hops, metric,
      entryMod = 0L, statePartitions, materializeCorpus,
      seedIds = Some(seeds))
  }

  /** Handle to a [[persistHnsw]] layout: layer 0 at `layer0.path`,
    * upper layer l at `path + "_l" + l` — each its own bucket-pruned
    * [[PersistedGraph]]. */
  final case class PersistedHnsw(layer0: PersistedGraph,
      uppers: Seq[PersistedGraph], base: Int)

  /** Bucket count for upper layer `l` of a [[persistHnsw]] layout:
    * pools shrink `base^l`×, so the bucket fan shrinks 4× per level
    * (floored at 4 dirs to keep writes parallel). One formula shared
    * by the writer and [[hnswHandle]] — a reader reconstructing the
    * handle from parameters can never disagree with the layout. */
  def hnswUpperBuckets(buckets: Int, l: Int): Int =
    math.max(4, buckets >> (2 * l))

  /** Reconstruct a [[PersistedHnsw]] handle from the layout's frozen
    * parameters (the façade's routing path — it stores parameters in
    * the index meta, not handles). Must mirror [[persistHnsw]]. */
  def hnswHandle(path: String, m: Int, mUpper: Int, buckets: Int,
      base: Int, levels: Int): PersistedHnsw =
    PersistedHnsw(PersistedGraph(path, m, buckets),
      (1 to levels).map(l => PersistedGraph(s"${path}_l$l", mUpper,
        hnswUpperBuckets(buckets, l))), base)

  /** Persist every layer of a [[HnswGraphs]] as its own
    * bucket-partitioned layout: each layer's hops prune to their
    * frontier's buckets exactly like the flat graph's, and upper
    * layers (base^l× smaller) stay proportionally cheap on disk. */
  def persistHnsw(g: HnswGraphs, path: String,
      buckets: Int = 64): PersistedHnsw = {
    val l0 = persistGraph(g.layer0, path, buckets)
    val uppers = g.uppers.zipWithIndex.map { case (ug, i) =>
      persistGraph(ug, s"${path}_l${i + 1}",
        hnswUpperBuckets(buckets, i + 1))
    }
    PersistedHnsw(l0, uppers, g.base)
  }

  /** CDF-batch maintenance for a [[persistHnsw]] hierarchy —
    * [[syncPersistedGraphLayered]] generalized to the md5-geometric
    * pools: layer 0 takes the whole batch; upper layer `l` takes the
    * [[hnswLevelGate]]-passing slice against its own gated pool.
    * Because level membership is a PURE FUNCTION of the id (not a
    * stored random draw), the slice a node syncs into is exactly the
    * slice a fresh build would place it in — no level bookkeeping
    * travels with the batch, and a node's delete tombstones every
    * layer it lives on. Per-layer cost shrinks base^l× with the pool,
    * so the whole hierarchy syncs for ~1/(base−1) over the flat cost. */
  def syncPersistedHnsw(spark: SparkSession, ph: PersistedHnsw,
      existing: DataFrame, changes: DataFrame, pkCol: String,
      vecCol: String): Unit = {
    syncPersistedGraphChanges(spark, ph.layer0, existing, changes,
      pkCol, vecCol)
    ph.uppers.zipWithIndex.foreach { case (pg, i) =>
      val gate = hnswLevelGate(col(pkCol), ph.base, i + 1)
      syncPersistedGraphChanges(spark, pg, existing.filter(gate),
        changes.filter(gate), pkCol, vecCol)
    }
  }

  /** [[queryHnsw]] with EVERY layer on disk — identical answers by
    * construction (each layer's walk is the same search over the same
    * edges, partition-pruned; shares the in-memory oracle). */
  def queryPersistedHnsw(spark: SparkSession, ph: PersistedHnsw,
      corpus: DataFrame, queries: DataFrame, queryIdCol: String,
      queryVecCol: String, corpusPkCol: String, corpusVecCol: String,
      k: Int, entries: Int, beam: Int, hops: Int,
      metric: Metric = Metric.L2, topEntries: Int = 2,
      upperBeam: Int = 3, upperHops: Int = 2,
      statePartitions: Int = 4,
      materializeCorpus: Boolean = true,
      rowFilter: Option[Column] = None): DataFrame = {
    val levels = ph.uppers.size
    def pool(l: Int) = corpus.filter(
      hnswLevelGate(col(corpusPkCol), ph.base, l))
    var seeds = topPoolSeeds(pool(levels), queries, queryIdCol,
      queryVecCol, corpusPkCol, corpusVecCol, topEntries, metric)
    for (l <- levels to 1 by -1) {
      seeds = queryPersistedGraph(spark, ph.uppers(l - 1), pool(l),
          queries, queryIdCol, queryVecCol, corpusPkCol, corpusVecCol,
          k = if (l == 1) entries else topEntries,
          entries = 0, beam = upperBeam, hops = upperHops, metric,
          entryMod = 0L, statePartitions, materializeCorpus,
          seedIds = Some(seeds))
        .select(col("query_id"), col(corpusPkCol).as("__nid"))
    }
    // the metadata predicate applies at the layer-0 rank only — upper
    // walks pick entry points, the walk-unfiltered/rank-filtered
    // contract shared with queryPersistedGraphLayered
    queryPersistedGraph(spark, ph.layer0, corpus, queries, queryIdCol,
      queryVecCol, corpusPkCol, corpusVecCol, k, entries = 0, beam,
      hops, metric, entryMod = 0L, statePartitions, materializeCorpus,
      seedIds = Some(seeds), rowFilter = rowFilter)
  }

  /** The shared best-first loop. `edgesFor(frontier)` supplies the edge
    * rows to expand a frontier through — the in-memory path ignores the
    * frontier (whole edge table, one checkpointed DF); the persisted
    * path prunes the edge scan to the frontier's `__src` buckets. */
  /** `statePartitions` bounds the partition count of the ITERATIVE state
    * (the per-query candidate frame). That frame is `entries +
    * hops·beam·m` rows per query — constant in corpus size — so pushing
    * it through `spark.sql.shuffle.partitions`-wide exchanges buys no
    * parallelism and costs a mostly-empty task wave per window per hop.
    * Hash-partitioning the state on `query_id` once per hop lets every
    * subsequent window REUSE that layout (ClusteredDistribution accepts
    * any partition count), collapsing each hop to one small exchange.
    * Size it to the query batch (≈ queries/1k), never to the corpus;
    * 0 inherits the session's shuffle parallelism. */
  private def beamSearch(corpus: DataFrame, queries: DataFrame,
      queryIdCol: String, queryVecCol: String, corpusPkCol: String,
      corpusVecCol: String, edgesFor: DataFrame => DataFrame,
      k: Int, entries: Int, beam: Int, hops: Int,
      metric: Metric, entryMod: Long,
      statePartitions: Int = 4,
      materializeCorpus: Boolean = true,
      seedIds: Option[DataFrame] = None,
      rowFilter: Option[Column] = None): DataFrame = {
    def bounded(df: DataFrame): DataFrame =
      if (statePartitions > 0) df.repartition(statePartitions, col("query_id"))
      else df
    // The corpus side is re-joined every hop. It is materialized
    // only when the caller says it fits (`materializeCorpus`): right for
    // the bounded blocks and for any corpus that fits cluster storage,
    // wrong at 100 TB — there, leave it false and the per-hop vector
    // lookup stays a lazy columnar scan (pushed filters + broadcast
    // semi-pruning), or better, a pk-partitioned persisted layout.
    val c0 = corpus.filter(col(corpusVecCol).isNotNull)
      .select(col(corpusPkCol).as("__nid"), col(corpusVecCol).as("__nvec"))
    val c = if (materializeCorpus) c0.localCheckpoint(true) else c0
    // no checkpoint: the state rows carry __qvec from the seeds on, so
    // `q` is consumed exactly once (seed scoring) — materializing it
    // would be one extra job for a relation read once
    val q = queries.filter(col(queryVecCol).isNotNull)
      .select(col(queryIdCol).as("query_id"),
        col(queryVecCol).as("__qvec"))
    val ord = Seq(Knn.scoreOrder(col("__score"), metric), col("__nid").asc)
    // __r ranks each query's candidates UNEXPANDED-FIRST by score: the
    // hop frontier is then a plain filter (!__exp && __r <= beam) on the
    // checkpointed state — no window, no join, no extra job per hop. The
    // rank is computed once per hop, fused into the state checkpoint.
    def ranked(df: DataFrame): DataFrame = {
      val wr = Window.partitionBy("query_id")
        .orderBy((col("__exp").asc +: ord): _*)
      df.withColumn("__r", row_number().over(wr))
    }
    def seeds0(ids: DataFrame): DataFrame =
      c.join(broadcast(ids), "__nid")
        .join(broadcast(q), "query_id")
        .withColumn("__score",
          VF.distance(col("__nvec"), col("__qvec"), metric))
        .select("query_id", "__qvec", "__nid", "__nvec", "__score")
    val seeds =
      if (seedIds.isDefined) {
        // explicit (query_id, __nid) entry points — supplied by a
        // coarser search layer (queryGraphLayered's descent)
        seeds0(seedIds.get)
      } else if (entryMod > 0L) {
        // coarse layer: per-query best `entries` of the modulo sample
        val pool = c.filter(col("__nid") % entryMod === 0L)
        val w = Window.partitionBy("query_id").orderBy(ord: _*)
        pool.crossJoin(broadcast(q))
          .withColumn("__score",
            VF.distance(col("__nvec"), col("__qvec"), metric))
          .withColumn("__rs", row_number().over(w))
          .filter(col("__rs") <= entries).drop("__rs")
          .select("query_id", "__qvec", "__nid", "__nvec", "__score")
      } else {
        val entry = c.orderBy(col("__nid").asc).limit(entries)
        q.crossJoin(broadcast(entry))
          .withColumn("__score",
            VF.distance(col("__nvec"), col("__qvec"), metric))
      }
    // cand carries __exp = "already expanded" (the HNSW visited set)
    var cand = ranked(bounded(seeds.withColumn("__exp", lit(false))))
      .localCheckpoint(true)
    for (h <- 1 to hops) {
      // the frontier CARRIES its query vector: the grown side then needs
      // no per-hop join (and broadcast stage) against `q` — one fewer
      // small job per hop, and the vector payload is only queries × beam
      // (later × m) rows wide, still trivially broadcastable
      val frontier = cand.filter(!col("__exp") && col("__r") <= beam)
        .select("query_id", "__qvec", "__nid")
      val edges = edgesFor(frontier.select("query_id", "__nid"))
      // no dropDuplicates here: a node reached from two frontier nodes
      // yields IDENTICAL (query_id, __qvec, __nid) rows, and the w2
      // dedup window below keeps exactly one of them anyway — the
      // explicit dedup was one extra exchange (and one extra job) per
      // hop for rows the next window already collapses
      val nbrs = edges.join(broadcast(frontier),
          edges("__src") === frontier("__nid"))
        .select(col("query_id"), col("__qvec"), col("__dst").as("__nid"))
      val grown = c.join(broadcast(nbrs), "__nid")
        .withColumn("__score",
          VF.distance(col("__nvec"), col("__qvec"), metric))
        .withColumn("__exp", lit(false))
        .select("query_id", "__qvec", "__nid", "__nvec", "__score", "__exp")
      // expanded rows have __exp true already, so `|| __r <= beam` only
      // flips exactly the frontier — the visited-set mark needs no join
      val marked = cand
        .withColumn("__exp", col("__exp") || col("__r") <= beam)
        .drop("__r")
      // dedupe (a grown node may already be a candidate) keeping the
      // expanded flag — row_number ordered __exp DESC picks the marked
      // row. Both this window and `ranked`'s reuse the `bounded` layout
      // (query_id clustering satisfies both), so a hop is ONE exchange.
      val w2 = Window.partitionBy("query_id", "__nid")
        .orderBy(col("__exp").desc)
      val next = ranked(bounded(marked.unionByName(grown))
        .withColumn("__rr", row_number().over(w2))
        .filter(col("__rr") === 1).drop("__rr"))
      // the state must be materialized while another hop will both
      // collect a frontier from it and extend it (two consumers, and an
      // unchecked iterative plan grows superlinearly) — but the LAST
      // hop's state feeds exactly one consumer, the final top-k window,
      // so checkpointing it would be a pure extra materialization job
      cand = if (h < hops) next.localCheckpoint(true) else next
    }
    // filtered graph search (the standard filtered-HNSW contract): the
    // WALK routes through any node — restricting traversal would
    // disconnect the graph under selective predicates — but only
    // candidates matching the metadata predicate are RANKED. The
    // predicate pushes into the corpus scan; the bounded candidate
    // state is the broadcast side.
    val finalCand = rowFilter match {
      case None => cand
      case Some(f) =>
        val keep = corpus.filter(col(corpusVecCol).isNotNull).filter(f)
          .select(col(corpusPkCol).as("__nid"))
        keep.join(broadcast(cand), "__nid")
    }
    val w = Window.partitionBy("query_id").orderBy(ord: _*)
    finalCand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("__nid").as(corpusPkCol),
        col("__score").as("score"))
      .orderBy(col("query_id").asc, col("rank").asc)
  }

  // ---------------- persisted, partition-pruned form ----------------

  /** Handle to a graph persisted by [[persistGraph]]. */
  final case class PersistedGraph(path: String, m: Int, buckets: Int)

  /** Persist the edge table partitioned by `__srcbucket = src mod
    * buckets`: each bucket is its own parquet directory, so a beam-
    * search hop turns into partition pruning — the frontier's (tiny)
    * src-id set maps to a bucket IN-list that prunes at the file
    * listing, and a 1000-executor cluster reads only the frontier's
    * buckets of a 100 TB edge table instead of rescanning all of it.
    * Plain modulo (not a seeded hash) so the driver can compute a
    * frontier's buckets without re-implementing a hash function;
    * node ids are assumed roughly uniform mod `buckets`. */
  def persistGraph(graph: KnnGraph, path: String,
      buckets: Int = 64): PersistedGraph = {
    graph.edges
      .withColumn("__srcbucket",
        pmod(col("__src"), lit(buckets.toLong)).cast("int"))
      // one writer per bucket dir (see Ann.persistSignLsh) — buckets ≫
      // executors keeps the write parallel without file spray
      .repartition(col("__srcbucket"))
      .write.mode("overwrite").partitionBy("__srcbucket").parquet(path)
    // a rebuild must not inherit a prior incarnation's tombstones: the
    // fresh graph IS the truth, and a stale tombstone would silently
    // anti-join a re-added node out of every read path forever
    val spark = graph.edges.sparkSession
    val tp = new org.apache.hadoop.fs.Path(path + "_tombstones")
    tp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(tp, true)
    PersistedGraph(path, graph.m, buckets)
  }

  /** Reload a persisted graph as a plain (unpruned) edge table, with
    * tombstoned nodes' edges removed. */
  def loadGraph(spark: SparkSession, pg: PersistedGraph): KnnGraph =
    KnnGraph(dropTombstoned(spark.read.parquet(pg.path)
      .select("__src", "__dst"), loadTombstones(spark, pg)), pg.m)

  // ---------------- deletes (tombstones) ----------------

  private def tombstonePath(pg: PersistedGraph): String =
    pg.path + "_tombstones"

  /** Dead node ids recorded by [[syncPersistedGraphChanges]] — `None`
    * until the first delete, so delete-free layouts keep their original
    * (filter-free) plans bit-identical. The table is bounded by LIVE
    * deletes, not history: an id is removed again on re-insert, and
    * [[repruneBuckets]] compacts tombstoned edges physically out of the
    * buckets. */
  def loadTombstones(spark: SparkSession,
      pg: PersistedGraph): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(tombstonePath(pg))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(tombstonePath(pg)))
    else None
  }

  /** Edges minus those touching a tombstoned node (either endpoint).
    * Two anti-joins on the (small, delete-bounded) tombstone table —
    * AQE broadcasts it; no hint so a pathological tombstone backlog
    * degrades to a shuffle join instead of a driver OOM. */
  private def dropTombstoned(edges: DataFrame,
      tombs: Option[DataFrame]): DataFrame =
    tombs.fold(edges) { t =>
      edges.join(t, edges("__src") === t("__id"), "left_anti")
        .join(t, edges("__dst") === t("__id"), "left_anti")
    }

  /** Corpus rows minus tombstoned pks — keeps entry seeding and vector
    * lookups from resurrecting deleted nodes even when the caller hands
    * in a stale corpus snapshot. */
  private def dropTombstonedNodes(corpus: DataFrame, pkCol: String,
      tombs: Option[DataFrame]): DataFrame =
    tombs.fold(corpus) { t =>
      corpus.join(t, corpus(pkCol) === t("__id"), "left_anti")
    }

  /** Edge rows for a specific src-id set, pruned at the partition level:
    * `__srcbucket IN (buckets of ids)` never opens other buckets'
    * files; the residual `__src IN ids` filter is pushed to parquet
    * row groups. Exposed for plan assertions in specs. */
  def prunedEdges(spark: SparkSession, pg: PersistedGraph,
      srcIds: Seq[Long]): DataFrame =
    prunedEdges(spark.read.parquet(pg.path), pg, srcIds)

  /** Same pruning against a pre-loaded edge relation — reusing one
    * relation across hops shares its file index, so repeated hops don't
    * re-list the partition directories or re-infer the schema. */
  def prunedEdges(loaded: DataFrame, pg: PersistedGraph,
      srcIds: Seq[Long]): DataFrame = {
    val bs = srcIds.map(id => (((id % pg.buckets) + pg.buckets)
      % pg.buckets).toInt).distinct
    loaded
      .filter(col("__srcbucket").isin(bs: _*)
        && col("__src").isin(srcIds: _*))
      .select("__src", "__dst")
  }

  /** Incremental insert into a [[persistGraph]] layout — HNSW's `add`,
    * relationally, and the graph counterpart of
    * [[Ann.syncPersistedIvf]]: each new node gets exact m-NN edges into
    * the pool (existing ∪ batch, one broadcast join of the small batch
    * against the corpus — never corpus²), PLUS the reverse edges that
    * make new nodes REACHABLE (beam search routes along out-edges; a
    * node with no in-edges would be invisible — the reason HNSW links
    * bidirectionally on insert). Reverse fan-in can push a neighbor
    * past m edges; HNSW prunes inline, we accept per-batch growth and
    * bound it with the idempotent [[repruneBuckets]] maintenance pass.
    *
    * Appends ONLY the touched buckets' files; existing files are never
    * rewritten. Search semantics afterwards ≡ beam search over
    * `base-edges ∪ new-edges` (oracled end to end). */
  def syncPersistedGraph(spark: SparkSession, pg: PersistedGraph,
      existing: DataFrame, batch: DataFrame, pkCol: String,
      vecCol: String): Unit =
    syncImpl(spark, pg, existing,
      batch.withColumn("__op", lit(graft.index.ChangeLog.OpInsert))
        .withColumn("__seq", lit(0L)),
      pkCol, vecCol, insertOnly = true)

  /** Full CDF-batch maintenance of a persisted graph — the graph
    * counterpart of [[Ann.syncPersistedIvf]] and the missing half of the
    * reference's delta-sync contract, which consumes row-level deletes
    * (/root/reference/src/databricks/syntetic_data.py:68-75).
    *
    * ChangeLog semantics (`__op`/`__seq`, last-write-wins per pk):
    *  - upserts get m-NN out-edges into the POST-change pool plus the
    *    reverse edges that make them reachable, appended to touched
    *    buckets only (never a rewrite);
    *  - deletes — and null-vector upserts, matching
    *    [[graft.index.VectorIndex.sync]] — are recorded in a tombstone
    *    table beside the buckets and anti-joined out of every read path
    *    ([[loadGraph]] / [[queryPersistedGraph]]), so a deleted document
    *    can neither be returned nor routed through;
    *  - an id deleted earlier and upserted again leaves the tombstone
    *    table (re-insert works without a rebuild).
    *
    * An UPDATED node keeps its old out-edges alongside the new ones —
    * both point at live nodes and exact scores always come from the
    * corpus vectors, so extra edges cost navigation work, not
    * correctness; [[repruneBuckets]] trims the fan back to m. */
  def syncPersistedGraphChanges(spark: SparkSession, pg: PersistedGraph,
      existing: DataFrame, changes: DataFrame, pkCol: String,
      vecCol: String): Unit =
    syncImpl(spark, pg, existing, changes, pkCol, vecCol,
      insertOnly = false)

  /** `insertOnly` marks a batch statically known to hold only inserts
    * (the [[syncPersistedGraph]] wrapper): the tombstone emptiness
    * check — a driver action — is skipped, so the common pure-insert
    * path costs zero extra jobs. Re-insert-after-delete still clears
    * its tombstone (the merge runs whenever a tombstone table exists). */
  private def syncImpl(spark: SparkSession, pg: PersistedGraph,
      existing: DataFrame, changes: DataFrame, pkCol: String,
      vecCol: String, insertOnly: Boolean): Unit = {
    import graft.index.ChangeLog
    val latest = ChangeLog.latestPerPk(changes, pkCol)
    val upserts = latest.filter(col("__op") =!= ChangeLog.OpDelete)
      .drop("__op", "__seq").filter(col(vecCol).isNotNull)
    val changedPks = latest.select(col(pkCol))
    // pool = the post-change corpus: new edges must not target rows the
    // same batch is deleting
    val pool = existing.filter(col(vecCol).isNotNull)
      .join(changedPks, Seq(pkCol), "left_anti")
      .select(col(pkCol).as("__dst"), col(vecCol).as("__dvec"))
      .unionByName(upserts
        .select(col(pkCol).as("__dst"), col(vecCol).as("__dvec")))
    val b = upserts.select(col(pkCol).as("__src"), col(vecCol).as("__svec"))
    val scored = pool.join(broadcast(b), col("__src") =!= col("__dst"))
      .select(col("__src"), col("__dst"),
        VF.l2(col("__svec"), col("__dvec")).as("__d"))
    val sel = graft.plans.TopK
      .perGroup(scored, "__src", "__d", "__dst", pg.m, descending = false)
      .select("__src", "__dst")
    val rev = sel.select(col("__dst").as("__src"), col("__src").as("__dst"))
    // distinct: reciprocal new↔new selections produce the same edge twice
    val newEdges = sel.unionByName(rev).distinct()
    newEdges
      .withColumn("__srcbucket",
        pmod(col("__src"), lit(pg.buckets.toLong)).cast("int"))
      .repartition(col("__srcbucket"))
      .write.mode("append").partitionBy("__srcbucket").parquet(pg.path)
    // tombstones: + deletes and null-vec upserts, − re-inserted ids.
    // Skipped entirely on the pure-insert path so delete-free layouts
    // never grow a tombstone dir (and never pay its read).
    val dead =
      if (insertOnly) latest.limit(0).select(col(pkCol).as("__id"))
      else latest
        .filter(col("__op") === ChangeLog.OpDelete || col(vecCol).isNull)
        .select(col(pkCol).as("__id"))
    val old = loadTombstones(spark, pg)
    if (old.isDefined || (!insertOnly && !dead.isEmpty)) {
      val merged = old.getOrElse(dead.limit(0))
        .unionByName(dead).distinct()
        .join(upserts.select(col(pkCol).as("__id")), Seq("__id"),
          "left_anti")
        .localCheckpoint(true) // materialize before overwriting the source
      merged.coalesce(1).write.mode("overwrite")
        .parquet(tombstonePath(pg))
    }
  }

  /** CDF-batch maintenance for a two-layer hierarchy: apply the change
    * batch to the main layout, then the `pk % entryMod == 0` slice of
    * it to the entry layout (whose pool and edges live over that
    * sample, so its pool is the existing corpus's sample and a layer-1
    * node's delete tombstones BOTH layers). Keeps
    * [[queryPersistedGraphLayered]] consistent across syncs without a
    * hierarchy rebuild. */
  def syncPersistedGraphLayered(spark: SparkSession, pg: PersistedGraph,
      entryPg: PersistedGraph, existing: DataFrame, changes: DataFrame,
      pkCol: String, vecCol: String, entryMod: Long): Unit = {
    syncPersistedGraphChanges(spark, pg, existing, changes, pkCol, vecCol)
    syncPersistedGraphChanges(spark, entryPg,
      existing.filter(col(pkCol) % entryMod === 0),
      changes.filter(col(pkCol) % entryMod === 0), pkCol, vecCol)
  }

  /** Maintenance re-prune — bounds the reverse-edge degree growth
    * [[syncPersistedGraphChanges]] accepts per batch (HNSW prunes on
    * insert; we defer pruning to an idempotent maintenance pass, the
    * dynamic-partition-overwrite pattern of [[Ann.syncPersistedIvf]]):
    *
    *  - buckets holding a src with more than `m + slack` stored edges
    *    are rewritten with every src's edges recomputed to the exact
    *    top-m by L2 over the live corpus (srcs already at ≤ m keep
    *    their edge set — top-m of ≤ m rows is the identity);
    *  - buckets still holding edges of tombstoned nodes are compacted
    *    (the physical delete the read-path anti-join stands in for),
    *    after which the tombstone table is dropped — the layout then
    *    carries no trace of deleted nodes, same as a rebuild;
    *  - every other bucket directory is left byte-identical.
    *
    * `corpus` must be the full LIVE (post-change) corpus: it supplies
    * both the re-scoring vectors and edge-endpoint liveness (an edge
    * whose endpoint has no corpus row is compacted away). Scale shape:
    * one degree count over the edge table, then joins and the bounded-
    * heap top-m restricted to the affected buckets' rows only.
    * Returns the number of bucket directories rewritten. */
  def repruneBuckets(spark: SparkSession, pg: PersistedGraph,
      corpus: DataFrame, pkCol: String, vecCol: String,
      slack: Int = 0): Int = {
    val layout = spark.read.parquet(pg.path) // __src, __dst, __srcbucket
    val tombs = loadTombstones(spark, pg)
    val overBuckets = layout.groupBy("__src")
      .agg(count(lit(1)).as("__deg"))
      .filter(col("__deg") > pg.m + slack)
      .select(pmod(col("__src"), lit(pg.buckets.toLong)).cast("int")
        .as("__srcbucket"))
    // two equi semi-joins (broadcast-able), not one OR-condition join
    // (which would plan as a nested-loop scan)
    val deadBuckets = tombs.map { t =>
      layout.join(t, layout("__src") === t("__id"), "left_semi")
        .select(col("__srcbucket"))
        .unionByName(
          layout.join(t, layout("__dst") === t("__id"), "left_semi")
            .select(col("__srcbucket")))
    }.getOrElse(overBuckets.limit(0))
    // distinct bucket ids — bounded by pg.buckets, driver-small
    val affected = overBuckets.unionByName(deadBuckets).distinct()
      .collect().map(_.getInt(0)).toSeq
    if (affected.nonEmpty) {
      val nodes = corpus.filter(col(vecCol).isNotNull)
        .select(col(pkCol).as("__pk"), col(vecCol).as("__v"))
      // dropDuplicates: an update batch can append an edge that already
      // exists; liveness is enforced by the inner joins against the
      // live corpus (tombstoned endpoints simply find no vector row)
      val cur = layout.filter(col("__srcbucket").isin(affected: _*))
        .select("__src", "__dst").dropDuplicates("__src", "__dst")
      val scored = cur
        .join(nodes.select(col("__pk").as("__src"),
          col("__v").as("__svec")), "__src")
        .join(nodes.select(col("__pk").as("__dst"),
          col("__v").as("__dvec")), "__dst")
        .select(col("__src"), col("__dst"),
          VF.l2(col("__svec"), col("__dvec")).as("__d"))
      val pruned = graft.plans.TopK
        .perGroup(scored, "__src", "__d", "__dst", pg.m,
          descending = false)
        .select("__src", "__dst")
        .withColumn("__srcbucket",
          pmod(col("__src"), lit(pg.buckets.toLong)).cast("int"))
        .localCheckpoint(true) // materialize before overwriting the source
      pruned
        .repartition(col("__srcbucket")) // one writer per rewritten dir
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__srcbucket").parquet(pg.path)
      // dynamic overwrite only rewrites partitions PRESENT in `pruned`:
      // an affected bucket whose every edge died (all srcs deleted, or
      // every dst dead) never appears there and would keep its stale
      // files — drop those dirs explicitly (syncPersistedIvf's
      // emptied-dir rule). Only then is dropping the tombstones safe;
      // skipping this resurrected deleted nodes' edges.
      val left = pruned.select("__srcbucket").distinct()
        .collect().map(_.getInt(0)).toSet
      val emptied = affected.filterNot(left)
      if (emptied.nonEmpty) {
        val fs = new org.apache.hadoop.fs.Path(pg.path)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        emptied.foreach { b =>
          fs.delete(new org.apache.hadoop.fs.Path(
            s"${pg.path}/__srcbucket=$b"), true)
        }
      }
    }
    // tombstoned edges are physically gone from every bucket now
    tombs.foreach { _ =>
      val p = new org.apache.hadoop.fs.Path(tombstonePath(pg))
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
    }
    affected.size
  }

  /** Best-first search over a [[persistGraph]] layout. Identical
    * semantics to [[queryGraph]]; each hop collects the (queries ×
    * beam)-bounded frontier id set on the driver and scans ONLY those
    * ids' edge buckets — the docstring's "each hop prunes to the
    * frontier's buckets", realized. Node ids must be integral (the
    * bucket is `id mod buckets`). */
  def queryPersistedGraph(spark: SparkSession, pg: PersistedGraph,
      corpus: DataFrame, queries: DataFrame, queryIdCol: String,
      queryVecCol: String, corpusPkCol: String, corpusVecCol: String,
      k: Int, entries: Int, beam: Int, hops: Int,
      metric: Metric = Metric.L2, entryMod: Long = 0L,
      statePartitions: Int = 4,
      materializeCorpus: Boolean = true,
      seedIds: Option[DataFrame] = None,
      rowFilter: Option[Column] = None): DataFrame = {
    // one relation for all hops: the file listing and schema are
    // resolved once; each hop only re-applies its partition filter.
    // Tombstones load once too — deleted nodes are neither seeded from
    // the corpus nor routed through via edges, whatever snapshot the
    // caller hands in.
    val loaded = spark.read.parquet(pg.path)
    val tombs = loadTombstones(spark, pg)
    val edgesFor: DataFrame => DataFrame = { frontier =>
      val ids = frontier.select("__nid").distinct()
        .collect().map(_.getLong(0)).toSeq
      if (ids.isEmpty) loaded.limit(0).select("__src", "__dst")
      else dropTombstoned(prunedEdges(loaded, pg, ids), tombs)
    }
    beamSearch(dropTombstonedNodes(corpus, corpusPkCol, tombs), queries,
      queryIdCol, queryVecCol, corpusPkCol,
      corpusVecCol, edgesFor, k, entries, beam, hops, metric, entryMod,
      statePartitions, materializeCorpus, seedIds, rowFilter)
  }

  /** [[queryGraphLayered]] with BOTH layers on disk — the 100 TB form:
    * at scale the layer-1 entry graph (n/entryMod nodes) is itself too
    * big to rebuild per query batch, so it lives as its own
    * [[persistGraph]] layout beside the main one and the descent's hops
    * prune to their buckets exactly like layer 0's. The coarse scan
    * still touches only the mod-squared pool, and each layer keeps its
    * own tombstones. */
  def queryPersistedGraphLayered(spark: SparkSession, pg: PersistedGraph,
      entryPg: PersistedGraph, corpus: DataFrame, queries: DataFrame,
      queryIdCol: String, queryVecCol: String, corpusPkCol: String,
      corpusVecCol: String, k: Int, entries: Int, beam: Int, hops: Int,
      entryMod: Long, metric: Metric = Metric.L2,
      l2Entries: Int = 2, l1Beam: Int = 3, l1Hops: Int = 2,
      statePartitions: Int = 4,
      materializeCorpus: Boolean = true,
      rowFilter: Option[Column] = None): DataFrame = {
    val l1pool = corpus.filter(col(corpusPkCol) % entryMod === 0)
    // NOTE: the layer-1 descent stays UNFILTERED — it only picks entry
    // points; the metadata predicate applies at the layer-0 rank (the
    // same walk-unfiltered/rank-filtered contract as the flat search)
    val seeds = queryPersistedGraph(spark, entryPg, l1pool, queries,
        queryIdCol, queryVecCol, corpusPkCol, corpusVecCol,
        k = entries, entries = l2Entries, beam = l1Beam, hops = l1Hops,
        metric, entryMod = entryMod * entryMod,
        statePartitions = statePartitions,
        materializeCorpus = materializeCorpus)
      .select(col("query_id"), col(corpusPkCol).as("__nid"))
    queryPersistedGraph(spark, pg, corpus, queries, queryIdCol,
      queryVecCol, corpusPkCol, corpusVecCol, k, entries, beam, hops,
      metric, entryMod = 0L, statePartitions, materializeCorpus,
      seedIds = Some(seeds), rowFilter = rowFilter)
  }
}
