package graft.queries

import graft.{Index, VectorSearch}
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The façade's index-kind ROUTING under the correctness gate: each
  * entry creates a [[graft.VectorSearch]] index of one kind and issues
  * the SAME routed `Index.search` call; the result must hash-match the
  * corresponding direct library leg (whose oracle it reuses verbatim) —
  * proving the one-entry-point dispatch the reference exposes
  * (query_endpoint.py:126-146) loses nothing over calling the legs
  * directly. Plan-shape assertions (the routed ivf call actually reads
  * the cell-pruned layout, etc.) live in FacadeRouteSpec. */
object FacadeQueries {

  private def emb(s: SparkSession, dir: String) =
    Tables.load(s, dir, "embeddings")

  private def root(name: String, dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_facade_$name/" +
      dir.replaceAll("[^0-9.]", "")

  /** documents ⋈ embeddings — the hybrid corpus shape (text + vector +
    * metadata), mirroring VectorQueries.hybridCorpus. */
  private def hybridCorpus(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    val e = emb(s, dir)
    d.join(e, d("doc_id") === e("vec_id"))
      .select(d("doc_id"), col("text"), col("lang"), col("embedding"))
  }

  private def rankCols(df: DataFrame): DataFrame = df
    .select(col("query_id"), col("rank").cast("long").as("rnk"),
      col("vec_id"))
    .orderBy("query_id", "rnk")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // exact kind: the routed batch search over the normalized artifact
    // — same ranking as the direct bounded-heap batch KNN (cosine is
    // scale-invariant, so the normalized space reorders nothing)
    "facade_route_exact" -> ((s, dir) => {
      val vs = new VectorSearch(s, root("exact", dir))
      vs.createEndpoint("ep")
      val idx = vs.createDeltaSyncIndex("ep",
        emb(s, dir).filter(col("vec_id") >= 5), "facade_exact",
        "vec_id", "embedding", 64, "exact")
      rankCols(idx.search(emb(s, dir).filter(col("vec_id") < 5),
        "vec_id", "embedding", 3))
    }),
    // ivf kind: the SAME search call routes to the cell-partitioned
    // persisted IVF layout (nProbe=4 of 16) — hash-equal to the direct
    // Ann.queryIvf leg
    "facade_route_ivf" -> ((s, dir) => {
      val vs = new VectorSearch(s, root("ivf", dir))
      vs.createEndpoint("ep")
      val idx = vs.createDeltaSyncIndex("ep",
        emb(s, dir).filter(col("vec_id") >= 5), "facade_ivf",
        "vec_id", "embedding", 64, "ivf",
        Map("cells" -> "16", "nProbe" -> "4"))
      rankCols(idx.search(emb(s, dir).filter(col("vec_id") < 5),
        "vec_id", "embedding", 3))
    }),
    // ivf kind + metadata filters: the managed API's `filters`
    // parameter through the routed path — pre-rank semantics on the
    // cell-pruned scan, hash-equal to the direct filtered leg
    "facade_route_filtered" -> ((s, dir) => {
      val vs = new VectorSearch(s, root("fil", dir))
      vs.createEndpoint("ep")
      val idx = vs.createDeltaSyncIndex("ep",
        emb(s, dir).filter(col("vec_id") >= 5), "facade_fil",
        "vec_id", "embedding", 64, "ivf",
        Map("cells" -> "16", "nProbe" -> "4"))
      rankCols(idx.search(emb(s, dir).filter(col("vec_id") < 5),
        "vec_id", "embedding", 3, filters = Map("label" -> 1)))
    }),
    // signlsh kind: routes to the (table, code)-partitioned layout
    "facade_route_signlsh" -> ((s, dir) => {
      val vs = new VectorSearch(s, root("slsh", dir))
      vs.createEndpoint("ep")
      val idx = vs.createDeltaSyncIndex("ep",
        emb(s, dir).filter(col("vec_id") >= 5), "facade_slsh",
        "vec_id", "embedding", 64, "signlsh",
        Map("tables" -> "8", "bits" -> "4"))
      rankCols(idx.search(emb(s, dir).filter(col("vec_id") < 5),
        "vec_id", "embedding", 3))
    }),
    // graph kind: routes to the bucket-partitioned beam search
    "facade_route_graph" -> ((s, dir) => {
      val vs = new VectorSearch(s, root("graph", dir))
      vs.createEndpoint("ep")
      val idx = vs.createDeltaSyncIndex("ep",
        emb(s, dir).filter(col("vec_id") >= 5 && col("vec_id") < 1000),
        "facade_graph", "vec_id", "embedding", 64, "graph",
        Map("m" -> "6", "buckets" -> "16", "entries" -> "4",
          "beam" -> "4", "hops" -> "3", "entryMod" -> "5",
          "metric" -> "l2"))
      rankCols(idx.search(emb(s, dir).filter(col("vec_id") < 5),
        "vec_id", "embedding", 3))
    }),
    // graph kind, LAYERED: one index carries the main edge layout AND
    // the coarse entry graph; the routed call descends through both —
    // the full HNSW-shaped hierarchy behind the single entry point
    "facade_route_graph_layered" -> ((s, dir) => {
      val vs = new VectorSearch(s, root("glay", dir))
      vs.createEndpoint("ep")
      val idx = vs.createDeltaSyncIndex("ep",
        emb(s, dir).filter(col("vec_id") >= 5 && col("vec_id") < 1000),
        "facade_glay", "vec_id", "embedding", 64, "graph",
        Map("layered" -> "true", "m" -> "6", "buckets" -> "8",
          "m1" -> "4", "entryBuckets" -> "4", "entries" -> "4",
          "beam" -> "4", "hops" -> "3", "entryMod" -> "5",
          "l2Entries" -> "2", "l1Beam" -> "3", "l1Hops" -> "2",
          "metric" -> "l2"))
      rankCols(idx.search(emb(s, dir).filter(col("vec_id") < 5),
        "vec_id", "embedding", 3))
    }),
    // graph kind SYNCED: create on the initial block, apply a CDF
    // insert batch through the routed sync — which now merges the
    // pk-hash-BUCKETED `_corpus` side table touched-dir-only
    // (IndexKinds.mergeCorpus via PartitionedLayout) — then search.
    // Hash-equal to the direct syncPersistedGraph leg, so the
    // corpus-bucketing refactor is correctness-gated end to end.
    "facade_route_graph_synced" -> ((s, dir) => {
      import graft.index.ChangeLog
      val e = emb(s, dir)
      val vs = new VectorSearch(s, root("gsync", dir))
      vs.createEndpoint("ep")
      val idx = vs.createDeltaSyncIndex("ep",
        e.filter(col("vec_id") >= 15 && col("vec_id") < 600),
        "facade_gsync", "vec_id", "embedding", 64, "graph",
        Map("m" -> "6", "buckets" -> "8", "entries" -> "4",
          "beam" -> "4", "hops" -> "3", "entryMod" -> "5",
          "metric" -> "l2"))
      idx.sync(e.filter(col("vec_id") >= 5 && col("vec_id") < 15)
        .withColumn("__op", lit(ChangeLog.OpInsert))
        .withColumn("__seq", lit(1L)))
      rankCols(idx.search(e.filter(col("vec_id") < 5),
        "vec_id", "embedding", 3))
    }),
    // graph kind, layers=2: the TRUE multi-layer HNSW behind the one
    // entry point — md5-geometric level pools, every layer its own
    // bucket-pruned layout, the routed call descends top pool → L2
    // walk → L1 walk → full layer-0 search. Same knobs as the direct
    // ann_graph_hnsw leg, whose oracle it reuses verbatim.
    "facade_route_graph_hnsw" -> ((s, dir) => {
      val idx = sharedHnswIndex(s, dir)
      rankCols(idx.search(emb(s, dir).filter(col("vec_id") < 5),
        "vec_id", "embedding", 3))
    }),
    // multi-layer HNSW + metadata filters: the managed API's `filters`
    // parameter through the layers=N routing — the walk descends
    // UNFILTERED (upper layers only pick entry points) and the
    // predicate lands at the layer-0 rank, the filtered-HNSW contract
    // shared with the flat and layered graph legs. Oracle = the hnsw
    // replay with the label predicate applied at the final rank only
    // (the filteredGraphSql derivation on the multi-layer base).
    "facade_route_graph_hnsw_filtered" -> ((s, dir) => {
      val idx = sharedHnswIndex(s, dir)
      rankCols(idx.search(emb(s, dir).filter(col("vec_id") < 5),
        "vec_id", "embedding", 3, filters = Map("label" -> 1)))
    }),
    // multi-layer HNSW SYNCED: create on [15,600), route a CDF insert
    // batch of [10,15) through the facade sync — none of those ids
    // pass the md5 level-1 gate (the pure-function membership check),
    // so the batch lands m-NN + reverse edges on layer 0 while both
    // upper layouts stay byte-identical; the descent then runs over
    // the merged corpus. The oracle derives from the hnsw replay with
    // the corpus swapped to initial ∪ batch and layer-0 edges to
    // base ∪ the insert replay (the ann_graph_synced pattern).
    "facade_route_graph_hnsw_synced" -> ((s, dir) => {
      import graft.index.ChangeLog
      val e = emb(s, dir)
      val vs = new VectorSearch(s, root("ghnsw_sync", dir))
      vs.createEndpoint("ep")
      val idx = vs.createDeltaSyncIndex("ep",
        e.filter(col("vec_id") >= 15 && col("vec_id") < 600),
        "facade_ghnsw_sync", "vec_id", "embedding", 64, "graph",
        Map("layers" -> "2", "lbase" -> "5", "m" -> "6",
          "mUpper" -> "4", "buckets" -> "16", "entries" -> "4",
          "beam" -> "4", "hops" -> "3", "topEntries" -> "2",
          "upperBeam" -> "3", "upperHops" -> "2", "metric" -> "l2"))
      idx.sync(e.filter(col("vec_id") >= 10 && col("vec_id") < 15)
        .withColumn("__op", lit(ChangeLog.OpInsert))
        .withColumn("__seq", lit(1L)))
      rankCols(idx.search(e.filter(col("vec_id") < 5),
        "vec_id", "embedding", 3))
    }),
    // sq8 kind: the routed call scans the persisted byte-code file and
    // refines the k·c survivors on the full vectors — hash-equal to
    // the direct Sq8.rerankPersisted leg (frozen stats reloaded from
    // the layout's _stats side file)
    "facade_route_sq8" -> ((s, dir) => {
      val vs = new VectorSearch(s, root("sq8", dir))
      vs.createEndpoint("ep")
      val idx = vs.createDeltaSyncIndex("ep",
        emb(s, dir).filter(col("vec_id") >= 5), "facade_sq8",
        "vec_id", "embedding", 64, "sq8", Map("c" -> "4"))
      rankCols(idx.search(emb(s, dir).filter(col("vec_id") < 5),
        "vec_id", "embedding", 3))
    }),
    // sq8 kind SYNCED: create on [15,∞) (stats FROZEN there), route a
    // CDF batch with an insert block and a delete through the façade
    // sync — the quantized layouts' frozen-stats delta contract behind
    // the one entry point. Hash-equal to the direct
    // Sq8.syncPersistedSq8 leg, whose oracle fits stats on the initial
    // corpus only and replays encode → coarse → refine live.
    "facade_route_sq8_synced" -> ((s, dir) => {
      import graft.index.ChangeLog
      val e = emb(s, dir)
      val vs = new VectorSearch(s, root("sq8sync", dir))
      vs.createEndpoint("ep")
      val idx = vs.createDeltaSyncIndex("ep",
        e.filter(col("vec_id") >= 15), "facade_sq8sync",
        "vec_id", "embedding", 64, "sq8", Map("c" -> "4"))
      idx.sync(e.filter(col("vec_id") >= 5 && col("vec_id") < 15)
        .withColumn("__op", lit(ChangeLog.OpInsert))
        .withColumn("__seq", lit(1L))
        .unionByName(e.filter(col("vec_id") === 20)
          .withColumn("__op", lit(ChangeLog.OpDelete))
          .withColumn("__seq", lit(2L))))
      rankCols(idx.search(e.filter(col("vec_id") < 5),
        "vec_id", "embedding", 3))
    }),
    // pq kind: flat ADC over the persisted code column (IVF degenerate
    // to one cell — FAISS IndexPQ), exact refine on survivors —
    // hash-equal to the direct Pq.rerank leg
    "facade_route_pq" -> ((s, dir) => {
      val vs = new VectorSearch(s, root("pq", dir))
      vs.createEndpoint("ep")
      val idx = vs.createDeltaSyncIndex("ep",
        emb(s, dir).filter(col("vec_id") >= 5), "facade_pq",
        "vec_id", "embedding", 64, "pq",
        Map("m" -> "16", "codebookK" -> "32", "c" -> "4"))
      rankCols(idx.search(emb(s, dir).filter(col("vec_id") < 5),
        "vec_id", "embedding", 3))
    }),
    // ivfpq kind: the full FAISS IVFPQ composition behind the façade —
    // cell pruning × code-column ADC × exact refine
    "facade_route_ivfpq" -> ((s, dir) => {
      val vs = new VectorSearch(s, root("ivfpq", dir))
      vs.createEndpoint("ep")
      val idx = vs.createDeltaSyncIndex("ep",
        emb(s, dir).filter(col("vec_id") >= 5), "facade_ivfpq",
        "vec_id", "embedding", 64, "ivfpq",
        Map("cells" -> "16", "nProbe" -> "4", "m" -> "16",
          "codebookK" -> "32", "c" -> "4"))
      rankCols(idx.search(emb(s, dir).filter(col("vec_id") < 5),
        "vec_id", "embedding", 3))
    }),
    // ivf kind SYNCED + OPTIMIZED: route a CDF batch through the
    // façade sync, run the maintenance entry (compaction), then
    // search — the optimize() answer-preservation contract proven
    // under the driver's hash gate, not just a spec. Hash-equal to
    // the direct Ann.syncPersistedIvf leg's oracle.
    "facade_route_ivf_optimized" -> ((s, dir) => {
      import graft.index.ChangeLog
      val e = emb(s, dir)
      val vs = new VectorSearch(s, root("ivfopt", dir))
      vs.createEndpoint("ep")
      val idx = vs.createDeltaSyncIndex("ep",
        e.filter(col("vec_id") >= 15), "facade_ivfopt",
        "vec_id", "embedding", 64, "ivf",
        Map("cells" -> "16", "nProbe" -> "4"))
      idx.sync(e.filter(col("vec_id") >= 5 && col("vec_id") < 15)
        .withColumn("__op", lit(ChangeLog.OpInsert))
        .withColumn("__seq", lit(1L))
        .unionByName(e.filter(col("vec_id") === 20)
          .withColumn("__op", lit(ChangeLog.OpDelete))
          .withColumn("__seq", lit(2L))))
      idx.optimize()
      rankCols(idx.search(e.filter(col("vec_id") < 5),
        "vec_id", "embedding", 3))
    }),
    // ivf kind with trained=true: the routed build trains k-means
    // centroids (buildIvfTrained) instead of the deterministic
    // first-k — the recall-grade codebooks from the same façade call
    "facade_route_ivf_trained" -> ((s, dir) => {
      val vs = new VectorSearch(s, root("ivftr", dir))
      vs.createEndpoint("ep")
      val idx = vs.createDeltaSyncIndex("ep",
        emb(s, dir).filter(col("vec_id") >= 5), "facade_ivftr",
        "vec_id", "embedding", 64, "ivf",
        Map("cells" -> "16", "nProbe" -> "4", "trained" -> "true",
          "iters" -> "2", "sampleN" -> "128"))
      rankCols(idx.search(emb(s, dir).filter(col("vec_id") < 5),
        "vec_id", "embedding", 3))
    }),
    // ivfpq kind with trained=true: BOTH quantizers k-means-trained
    // (centroids and codebooks) — the 100×-scale quality configuration
    // through the one entry point
    "facade_route_ivfpq_trained" -> ((s, dir) => {
      val vs = new VectorSearch(s, root("ivfpqtr", dir))
      vs.createEndpoint("ep")
      val idx = vs.createDeltaSyncIndex("ep",
        emb(s, dir).filter(col("vec_id") >= 5), "facade_ivfpqtr",
        "vec_id", "embedding", 64, "ivfpq",
        Map("cells" -> "16", "nProbe" -> "4", "m" -> "16",
          "codebookK" -> "32", "c" -> "4", "trained" -> "true",
          "iters" -> "2", "sampleN" -> "128"))
      rankCols(idx.search(emb(s, dir).filter(col("vec_id") < 5),
        "vec_id", "embedding", 3))
    }),
    // hybrid kind: one index carries the term-bucketed postings AND
    // the vector corpus; the routed call fuses both legs by RRF
    "facade_route_hybrid" -> ((s, dir) => {
      val vs = new VectorSearch(s, root("hyb", dir))
      vs.createEndpoint("ep")
      val all = hybridCorpus(s, dir)
      val idx = vs.createDeltaSyncIndex("ep",
        all.filter(col("doc_id") >= 3), "facade_hyb",
        "doc_id", "embedding", 64, "hybrid",
        Map("textCol" -> "text", "buckets" -> "32", "n" -> "10"))
      val q = all.filter(col("doc_id") < 3)
        .select(col("doc_id").as("qid"), col("text").as("qtext"),
          col("embedding").as("qvec"))
      idx.search(q, "qid", "qvec", 5, queryTextCol = Some("qtext"))
        .select(col("query_id"), col("rank").cast("long").as("rnk"),
          col("doc_id"), col("in_vec"), col("in_kw"))
        .orderBy("query_id", "rnk")
    }),
    // plaid kind: the MULTI-VECTOR leg behind the one entry point —
    // the source's vecCol holds shingle-token BAGS, the build trains
    // token centroids + residual codebooks into the cell-partitioned
    // PLAID store, and the routed search takes token-bag queries.
    // Token ids are bag POSITIONS (posexplode), so the oracle derives
    // from the direct PLAID replay with positional token ids swapped
    // into the quantizer-sample and refine orderings.
    "facade_route_plaid" -> ((s, dir) => {
      val idx = sharedPlaidIndex(s, dir)
      rankDocCols(idx.search(plaidQueryBags(s, dir), "doc_id", "toks", 5))
    }),
    // plaid kind SYNCED: build on the FULL corpus (quantizers frozen
    // there), then route a delete+reinsert batch on [20,40) plus a
    // stale-loses-LWW update pair on doc 5 through the facade sync —
    // cells and codes are pure functions of the frozen quantizers, so
    // the synced layout lands exactly the untouched build's rows and
    // the cell shares facade_route_plaid's oracle (the
    // ann_maxsim_plaid_synced discipline through the routed path).
    "facade_route_plaid_synced" -> ((s, dir) => {
      import graft.index.ChangeLog
      // clone the shared pristine facade-plaid root (same corpus and
      // knobs — byte-identical build) and re-open it via the catalog's
      // documented cross-session path: the cell's claim is the CDF
      // delete/reinsert/LWW replay, which mutates only the clone
      sharedPlaidIndex(s, dir)
      BuildCache.cloneDir(s, root("plaid", dir), root("plaid_sync", dir))
      val idx = new VectorSearch(s, root("plaid_sync", dir))
        .getIndex("facade_plaid").get
      val d = plaidDocs(s, dir)
      val victims = d.filter(col("doc_id") >= 20 && col("doc_id") < 40)
      val staleFive = d.filter(col("doc_id") === 5)
        .withColumn("text",
          concat_ws(" ", reverse(split(trim(col("text")), "\\s+"))))
      val changes = plaidBags(victims)
        .withColumn("__op", lit(ChangeLog.OpDelete))
        .withColumn("__seq", lit(1L))
        .unionByName(plaidBags(victims)
          .withColumn("__op", lit(ChangeLog.OpInsert))
          .withColumn("__seq", lit(2L)))
        .unionByName(plaidBags(staleFive)
          .withColumn("__op", lit(ChangeLog.OpUpdate))
          .withColumn("__seq", lit(1L)))
        .unionByName(plaidBags(d.filter(col("doc_id") === 5))
          .withColumn("__op", lit(ChangeLog.OpUpdate))
          .withColumn("__seq", lit(2L)))
      idx.sync(changes)
      rankDocCols(idx.search(plaidQueryBags(s, dir), "doc_id", "toks", 5))
    }))

  /** The read-only 3-layer HNSW facade index shared by the plain and
    * filtered routing cells ([[BuildCache]] contract — identical
    * corpus block and knobs build bit-identical layouts; both cells
    * only SEARCH it, the synced cell keeps its private mutable
    * build). The filter lands at the layer-0 rank, so the filtered
    * cell reads the same layouts as its unfiltered sibling. */
  private def sharedHnswIndex(s: SparkSession, dir: String): Index =
    BuildCache.memo(s"facade_ghnsw:l2:m6:$dir") {
      val vs = new VectorSearch(s, root("ghnsw", dir))
      vs.createEndpoint("ep")
      vs.createDeltaSyncIndex("ep",
        emb(s, dir).filter(col("vec_id") >= 5 && col("vec_id") < 1000),
        "facade_ghnsw", "vec_id", "embedding", 64, "graph",
        Map("layers" -> "2", "lbase" -> "5", "m" -> "6",
          "mUpper" -> "4", "buckets" -> "16", "entries" -> "4",
          "beam" -> "4", "hops" -> "3", "topEntries" -> "2",
          "upperBeam" -> "3", "upperHops" -> "2", "metric" -> "l2"))
    }

  // ---- plaid fixture shared by the route + synced cells ----

  private def plaidDocs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .filter(col("text").isNotNull && trim(col("text")) =!= "")

  /** The shingle-token BAG shape of the maxsim/plaid fixtures: one row
    * per doc, `toks` = md5-feature embeddings of its distinct 3-word
    * shingles in WordShingles' sorted-set order — so a token's bag
    * position is a pure, oracle-replayable id (its lexicographic
    * rank). */
  private def plaidBags(df: DataFrame): DataFrame = {
    import graft.functions.TextExpressions
    df.select(col("doc_id"),
      transform(TextExpressions.wordShingles(col("text"), 3),
        sh => TextExpressions.md5FeatureEmbed(sh, 16)).as("toks"))
  }

  private def plaidIndex(s: SparkSession, dir: String,
      name: String): Index = {
    val vs = new VectorSearch(s, root(name, dir))
    vs.createEndpoint("ep")
    vs.createDeltaSyncIndex("ep",
      plaidBags(plaidDocs(s, dir)
        .filter(col("doc_id") >= 3 && col("doc_id") < 120)),
      s"facade_$name", "doc_id", "toks", 16, "plaid")
  }

  /** The read-only facade PLAID index shared by the routing cell and
    * (as a cloned starting point) the synced cell ([[BuildCache]]
    * contract — one quantizer train + coded persist per JVM). */
  private def sharedPlaidIndex(s: SparkSession, dir: String): Index =
    BuildCache.memo(s"facade_plaid:$dir")(plaidIndex(s, dir, "plaid"))

  private def plaidQueryBags(s: SparkSession, dir: String): DataFrame =
    plaidBags(plaidDocs(s, dir).filter(col("doc_id") < 3)
      .select(col("doc_id"), concat_ws(" ",
        slice(split(trim(col("text")), "\\s+"), 1, 5)).as("text")))

  private def rankDocCols(df: DataFrame): DataFrame = df
    .select(col("query_id"), col("rank").cast("long").as("rnk"),
      col("doc_id"))
    .orderBy("query_id", "rnk")

  /** Build-vs-search phase timings for the bench-heaviest routed cell
    * (judge ask r9 #5): the facade queries construct whole indexes
    * inside the timed query, so a search-path regression was invisible
    * behind ~90% build cost. Bench.scala runs these after the query
    * sweep and appends `"phases"` to its JSON line — the cell's own
    * number stays comparable round over round, and the split says
    * which phase moved. */
  val phases: Map[String, (SparkSession, String) => Map[String, Double]] =
    Map(
      "facade_route_graph_layered" -> ((s, dir) => {
        def timed[T](f: => T): (T, Double) = {
          val t0 = System.nanoTime()
          val r = f
          (r, (System.nanoTime() - t0) / 1e9)
        }
        val vs = new VectorSearch(s, root("glay_ph", dir))
        vs.createEndpoint("ep")
        val (idx, build) = timed {
          vs.createDeltaSyncIndex("ep",
            emb(s, dir).filter(col("vec_id") >= 5 && col("vec_id") < 1000),
            "facade_glay_ph", "vec_id", "embedding", 64, "graph",
            Map("layered" -> "true", "m" -> "6", "buckets" -> "8",
              "m1" -> "4", "entryBuckets" -> "4", "entries" -> "4",
              "beam" -> "4", "hops" -> "3", "entryMod" -> "5",
              "l2Entries" -> "2", "l1Beam" -> "3", "l1Hops" -> "2",
              "metric" -> "l2"))
        }
        val (_, search) = timed {
          idx.search(emb(s, dir).filter(col("vec_id") < 5),
            "vec_id", "embedding", 3).count()
        }
        Map("build" -> build, "search" -> search)
      }),
      // the hnsw facade cells build a whole 3-layer hierarchy inside
      // the timed query (the O(n²) exact layer-0 build dominates) —
      // split build from the routed descent they actually measure
      "facade_route_graph_hnsw" -> ((s, dir) => {
        val vs = new VectorSearch(s, root("ghnsw_ph", dir))
        vs.createEndpoint("ep")
        val (idx, build) = timedPh {
          vs.createDeltaSyncIndex("ep",
            emb(s, dir).filter(col("vec_id") >= 5 && col("vec_id") < 1000),
            "facade_ghnsw_ph", "vec_id", "embedding", 64, "graph",
            Map("layers" -> "2", "lbase" -> "5", "m" -> "6",
              "mUpper" -> "4", "buckets" -> "16", "entries" -> "4",
              "beam" -> "4", "hops" -> "3", "topEntries" -> "2",
              "upperBeam" -> "3", "upperHops" -> "2", "metric" -> "l2"))
        }
        val (_, search) = timedPh {
          idx.search(emb(s, dir).filter(col("vec_id") < 5),
            "vec_id", "embedding", 3).count()
        }
        Map("build" -> build, "search" -> search)
      }),
      "facade_route_graph_hnsw_filtered" -> ((s, dir) => {
        val vs = new VectorSearch(s, root("ghnsw_fil_ph", dir))
        vs.createEndpoint("ep")
        val (idx, build) = timedPh {
          vs.createDeltaSyncIndex("ep",
            emb(s, dir).filter(col("vec_id") >= 5 && col("vec_id") < 1000),
            "facade_ghnsw_fil_ph", "vec_id", "embedding", 64, "graph",
            Map("layers" -> "2", "lbase" -> "5", "m" -> "6",
              "mUpper" -> "4", "buckets" -> "16", "entries" -> "4",
              "beam" -> "4", "hops" -> "3", "topEntries" -> "2",
              "upperBeam" -> "3", "upperHops" -> "2", "metric" -> "l2"))
        }
        val (_, search) = timedPh {
          idx.search(emb(s, dir).filter(col("vec_id") < 5),
            "vec_id", "embedding", 3,
            filters = Map("label" -> 1)).count()
        }
        Map("build" -> build, "search" -> search)
      }),
      "facade_route_graph_hnsw_synced" -> ((s, dir) => {
        import graft.index.ChangeLog
        val e = emb(s, dir)
        val vs = new VectorSearch(s, root("ghnsw_sync_ph", dir))
        vs.createEndpoint("ep")
        val (idx, build) = timedPh {
          vs.createDeltaSyncIndex("ep",
            e.filter(col("vec_id") >= 15 && col("vec_id") < 600),
            "facade_ghnsw_sync_ph", "vec_id", "embedding", 64, "graph",
            Map("layers" -> "2", "lbase" -> "5", "m" -> "6",
              "mUpper" -> "4", "buckets" -> "16", "entries" -> "4",
              "beam" -> "4", "hops" -> "3", "topEntries" -> "2",
              "upperBeam" -> "3", "upperHops" -> "2", "metric" -> "l2"))
        }
        val (_, sync) = timedPh {
          idx.sync(e.filter(col("vec_id") >= 10 && col("vec_id") < 15)
            .withColumn("__op", lit(ChangeLog.OpInsert))
            .withColumn("__seq", lit(1L)))
        }
        val (_, search) = timedPh {
          idx.search(e.filter(col("vec_id") < 5),
            "vec_id", "embedding", 3).count()
        }
        Map("build" -> build, "sync" -> sync, "search" -> search)
      }),
      // the plaid facade cells train quantizers + persist the coded
      // store inside the timed query — split build (and the synced
      // cell's CDF replay) from the routed late-interaction search
      "facade_route_plaid" -> ((s, dir) => {
        val vs = new VectorSearch(s, root("plaid_ph", dir))
        vs.createEndpoint("ep")
        val (idx, build) = timedPh {
          vs.createDeltaSyncIndex("ep",
            plaidBags(plaidDocs(s, dir)
              .filter(col("doc_id") >= 3 && col("doc_id") < 120)),
            "facade_plaid_ph", "doc_id", "toks", 16, "plaid")
        }
        val (_, search) = timedPh {
          idx.search(plaidQueryBags(s, dir), "doc_id", "toks", 5).count()
        }
        Map("build" -> build, "search" -> search)
      }),
      "facade_route_plaid_synced" -> ((s, dir) => {
        import graft.index.ChangeLog
        val vs = new VectorSearch(s, root("plaid_sync_ph", dir))
        vs.createEndpoint("ep")
        val d = plaidDocs(s, dir)
        val (idx, build) = timedPh {
          vs.createDeltaSyncIndex("ep",
            plaidBags(d.filter(col("doc_id") >= 3 && col("doc_id") < 120)),
            "facade_plaid_sync_ph", "doc_id", "toks", 16, "plaid")
        }
        val victims = d.filter(col("doc_id") >= 20 && col("doc_id") < 40)
        val (_, sync) = timedPh {
          idx.sync(plaidBags(victims)
            .withColumn("__op", lit(ChangeLog.OpDelete))
            .withColumn("__seq", lit(1L))
            .unionByName(plaidBags(victims)
              .withColumn("__op", lit(ChangeLog.OpInsert))
              .withColumn("__seq", lit(2L))))
        }
        val (_, search) = timedPh {
          idx.search(plaidQueryBags(s, dir), "doc_id", "toks", 5).count()
        }
        Map("build" -> build, "sync" -> sync, "search" -> search)
      }),
      // the synced graph cell is build-dominated by ITS OWN private
      // index (sync mutates, so it can never share a layout) — split
      // build+sync from the search it claims to measure
      "facade_route_graph_synced" -> ((s, dir) => {
        import graft.index.ChangeLog
        def timed[T](f: => T): (T, Double) = {
          val t0 = System.nanoTime()
          val r = f
          (r, (System.nanoTime() - t0) / 1e9)
        }
        val e = emb(s, dir)
        val vs = new VectorSearch(s, root("gsync_ph", dir))
        vs.createEndpoint("ep")
        val (idx, build) = timed {
          val i = vs.createDeltaSyncIndex("ep",
            e.filter(col("vec_id") >= 15 && col("vec_id") < 600),
            "facade_gsync_ph", "vec_id", "embedding", 64, "graph",
            Map("m" -> "6", "buckets" -> "8", "entries" -> "4",
              "beam" -> "4", "hops" -> "3", "entryMod" -> "5",
              "metric" -> "l2"))
          i.sync(e.filter(col("vec_id") >= 5 && col("vec_id") < 15)
            .withColumn("__op", lit(ChangeLog.OpInsert))
            .withColumn("__seq", lit(1L)))
          i
        }
        val (_, search) = timed {
          idx.search(e.filter(col("vec_id") < 5),
            "vec_id", "embedding", 3).count()
        }
        Map("buildAndSync" -> build, "search" -> search)
      }),
      // the hybrid cell builds postings + bucketed corpus + the exact
      // artifact inline — third of the build-heavy facade cells
      "facade_route_hybrid" -> ((s, dir) => {
        def timed[T](f: => T): (T, Double) = {
          val t0 = System.nanoTime()
          val r = f
          (r, (System.nanoTime() - t0) / 1e9)
        }
        val all = hybridCorpus(s, dir)
        val vs = new VectorSearch(s, root("hyb_ph", dir))
        vs.createEndpoint("ep")
        val (idx, build) = timed {
          vs.createDeltaSyncIndex("ep", all.filter(col("doc_id") >= 3),
            "facade_hyb_ph", "doc_id", "embedding", 64, "hybrid",
            Map("textCol" -> "text", "buckets" -> "32", "n" -> "10"))
        }
        val q = all.filter(col("doc_id") < 3)
          .select(col("doc_id").as("qid"), col("text").as("qtext"),
            col("embedding").as("qvec"))
        val (_, search) = timed {
          idx.search(q, "qid", "qvec", 5,
            queryTextCol = Some("qtext")).count()
        }
        Map("build" -> build, "search" -> search)
      }),
      // the three library-level sync cells are build+sync-dominated the
      // same way (each builds a private persisted layout, then syncs a
      // change batch, then queries): split so the bench line shows
      // which phase a drift lives in
      "ann_signlsh_synced" -> ((s, dir) => {
        import graft.index.ChangeLog
        import graft.search.Ann
        val e = emb(s, dir)
        val initial = e.filter(col("vec_id") >= 15)
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_pslsync_ph/" +
          dir.replaceAll("[^0-9.]", "")
        val (persisted, build) = timedPh {
          Ann.persistSignLsh(Ann.buildSignLsh(initial, "embedding",
            tables = 8, bits = 4), "vec_id", "embedding", path)
        }
        val changes = e.filter(col("vec_id") >= 5 && col("vec_id") < 15)
          .withColumn("__op", lit(ChangeLog.OpInsert))
          .withColumn("__seq", lit(1L))
          .unionByName(initial.filter(col("vec_id") === 20)
            .withColumn("__op", lit(ChangeLog.OpDelete))
            .withColumn("__seq", lit(2L)))
        val (_, sync) = timedPh {
          Ann.syncPersistedSignLsh(s, persisted, changes, "vec_id",
            "embedding")
        }
        val (_, search) = timedPh {
          Ann.queryPersistedSignLsh(s, persisted,
            e.filter(col("vec_id") < 5), "vec_id", "embedding",
            "vec_id", "embedding", k = 3).count()
        }
        Map("build" -> build, "sync" -> sync, "search" -> search)
      }),
      "hybrid_kw_synced" -> ((s, dir) => {
        import graft.index.ChangeLog
        import graft.search.Hybrid
        val d = graft.core.Tables.load(s, dir, "documents")
        val initial = d.filter(col("doc_id") >= 10 && col("doc_id") < 200)
          .select("doc_id", "text")
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_ppsync_ph/" +
          dir.replaceAll("[^0-9.]", "")
        val (idx, build) = timedPh {
          Hybrid.persistPostings(initial, "doc_id", "text", path,
            buckets = 32)
        }
        val changes = d.filter(col("doc_id") >= 3 && col("doc_id") < 10)
          .select("doc_id", "text")
          .withColumn("__op", lit(ChangeLog.OpInsert))
          .withColumn("__seq", lit(1L))
          .unionByName(d.filter(col("doc_id") === 20)
            .select("doc_id", "text")
            .withColumn("__op", lit(ChangeLog.OpDelete))
            .withColumn("__seq", lit(2L)))
        val (_, sync) = timedPh {
          Hybrid.syncPersistedPostings(s, idx, changes, "doc_id", "text")
        }
        val q = d.filter(col("doc_id") < 3)
          .select(col("doc_id").as("qid"), col("text").as("qtext"))
        val (_, search) = timedPh {
          Hybrid.bm25Persisted(s, idx, q, "qid", "qtext", "doc_id").count()
        }
        Map("build" -> build, "sync" -> sync, "search" -> search)
      }),
      // the trained ivfpq facade cell pays k-means training for BOTH
      // quantizers plus codebook encoding inside "build" — split it
      // from the probe+ADC+refine leg the cell actually measures
      "facade_route_ivfpq_trained" -> ((s, dir) => {
        val vs = new VectorSearch(s, root("ivfpqtr_ph", dir))
        vs.createEndpoint("ep")
        val (idx, build) = timedPh {
          vs.createDeltaSyncIndex("ep",
            emb(s, dir).filter(col("vec_id") >= 5), "facade_ivfpqtr_ph",
            "vec_id", "embedding", 64, "ivfpq",
            Map("cells" -> "16", "nProbe" -> "4", "m" -> "16",
              "codebookK" -> "32", "c" -> "4", "trained" -> "true",
              "iters" -> "2", "sampleN" -> "128"))
        }
        val (_, search) = timedPh {
          idx.search(emb(s, dir).filter(col("vec_id") < 5),
            "vec_id", "embedding", 3).count()
        }
        Map("build" -> build, "search" -> search)
      }),
      "near_dup_delta_synced" -> ((s, dir) => {
        import graft.index.ChangeLog
        import graft.operators.NearDupIndex
        val d = graft.core.Tables.load(s, dir, "documents")
        val path = s"${System.getProperty("java.io.tmpdir")}/graft_ndsync_ph/" +
          dir.replaceAll("[^0-9.]", "")
        val (idx, build) = timedPh {
          NearDupIndex.persist(d.filter(col("doc_id") >= 200),
            "doc_id", "text", path, algo = "md5")
        }
        val changes = d.filter(col("doc_id") >= 130 && col("doc_id") < 200)
          .select("doc_id", "text")
          .withColumn("__op", lit(ChangeLog.OpInsert))
          .withColumn("__seq", lit(1L))
          .unionByName(d.filter(col("doc_id") === 245)
            .select("doc_id", "text")
            .withColumn("__op", lit(ChangeLog.OpDelete))
            .withColumn("__seq", lit(2L)))
        val (_, sync) = timedPh {
          NearDupIndex.sync(s, idx, changes, "doc_id", "text")
        }
        val (_, probe) = timedPh {
          NearDupIndex.nearDupsAgainst(s, NearDupIndex.load(s, path),
            d.filter(col("doc_id") < 60), "doc_id", "text",
            threshold = 0.5).count()
        }
        Map("build" -> build, "sync" -> sync, "probe" -> probe)
      }))

  private def timedPh[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  /** Textual derivation with guarded anchors (the InfraQueries
    * derivedSql discipline): a moved anchor fails loudly instead of
    * silently yielding the base replay. */
  private def derived(base: String, edits: (String, String)*): String =
    edits.foldLeft(base) { case (sql, (anchor, repl)) =>
      require(sql.contains(anchor), s"oracle anchor '${anchor.take(40)}…' moved")
      sql.replace(anchor, repl)
    }

  /** The hnsw replay with the corpus split into initial ∪ insert batch
    * and layer-0 edges into base ∪ the sync replay (m-NN of each new
    * node into the post-change pool, plus reverse edges) — the
    * ann_graph_synced pattern lifted onto the multi-layer descent. The
    * upper-layer CTEs derive unchanged: no batch id passes the level-1
    * gate, so the post-sync gated pools equal the build pools. */
  private lazy val hnswSyncedSql: String = derived(
    InfraQueries.oracleSql("ann_graph_hnsw_topk"),
    """corpus AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |  WHERE vec_id >= 5 AND vec_id < 1000),""".stripMargin ->
      """initial AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |  WHERE vec_id >= 15 AND vec_id < 600),
        |newb AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |  WHERE vec_id >= 10 AND vec_id < 15),
        |corpus AS (
        |  SELECT * FROM initial UNION ALL SELECT * FROM newb),""".stripMargin,
    """edges AS (
      |  SELECT src, dst FROM (
      |    SELECT a.vec_id AS src, b.vec_id AS dst,
      |      row_number() OVER (PARTITION BY a.vec_id
      |        ORDER BY list_distance(a.v, b.v), b.vec_id) AS rn
      |    FROM corpus a JOIN corpus b ON a.vec_id <> b.vec_id)
      |  WHERE rn <= 6),""".stripMargin ->
      """base_edges AS (
        |  SELECT src, dst FROM (
        |    SELECT a.vec_id AS src, b.vec_id AS dst,
        |      row_number() OVER (PARTITION BY a.vec_id
        |        ORDER BY list_distance(a.v, b.v), b.vec_id) AS rn
        |    FROM initial a JOIN initial b ON a.vec_id <> b.vec_id)
        |  WHERE rn <= 6),
        |new_sel AS (
        |  SELECT src, dst FROM (
        |    SELECT a.vec_id AS src, b.vec_id AS dst,
        |      row_number() OVER (PARTITION BY a.vec_id
        |        ORDER BY list_distance(a.v, b.v), b.vec_id) AS rn
        |    FROM newb a JOIN corpus b ON a.vec_id <> b.vec_id)
        |  WHERE rn <= 6),
        |edges AS (
        |  SELECT src, dst FROM base_edges
        |  UNION ALL
        |  SELECT src, dst FROM (
        |    SELECT src, dst FROM new_sel
        |    UNION
        |    SELECT dst AS src, src AS dst FROM new_sel)),""".stripMargin)

  /** The PLAID replay with POSITIONAL token ids: the facade's bag
    * contract derives each token's id from its bag position
    * (posexplode), where the direct leg uses md5(shingle) — the
    * difference flows through the quantizer-sample order (tid =
    * 'did:pos'), the ADC groupings, and the refine's token-ordered
    * IEEE sum, so the oracle swaps the doc/query token CTEs to
    * positional ids and keeps every other stage of the replay
    * verbatim. `WordShingles` emits each doc's distinct shingles as a
    * SORTED set, so a token's bag position is its lexicographic rank
    * — `row_number() OVER (PARTITION BY doc ORDER BY sh) - 1`
    * (binary collation ≡ UTF8 byte order on this ASCII fixture). */
  private lazy val plaidPositionalSql: String =
    derived(
      InfraQueries.oracleSql("ann_maxsim_plaid"),
      """dtp AS (
        |  SELECT did, ti, CAST(did AS VARCHAR) || ':' || ti AS tid, tv
        |  FROM mdt),""".stripMargin ->
        """dshp AS (
          |  SELECT doc_id, sh,
          |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY sh)
          |      - 1 AS INT) AS pos
          |  FROM dsh),
          |qshp AS (
          |  SELECT doc_id, sh,
          |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY sh)
          |      - 1 AS INT) AS pos
          |  FROM qsh),
          |mqtp AS (
          |  SELECT p.doc_id AS query_id, p.pos AS ti, k.tv
          |  FROM qshp p JOIN shb k USING (sh)),
          |dtp AS (
          |  SELECT d.doc_id AS did, d.pos AS ti,
          |    CAST(d.doc_id AS VARCHAR) || ':' ||
          |    CAST(d.pos AS VARCHAR) AS tid, k.tv
          |  FROM dshp d JOIN shb k USING (sh)),""".stripMargin,
      "FROM mqt, pdims dd)," -> "FROM mqtp, pdims dd),",
      "FROM mqt q CROSS JOIN pcents c)," ->
        "FROM mqtp q CROSS JOIN pcents c),",
      "JOIN mqt q ON q.query_id = c.query_id" ->
        "JOIN mqtp q ON q.query_id = c.query_id")

  /** Routed results are hash-equal to the direct legs by construction,
    * so every entry reuses the direct leg's oracle verbatim. */
  val oracleSql: Map[String, String] = Map(
    "facade_route_graph_hnsw" ->
      InfraQueries.oracleSql("ann_graph_hnsw_topk"),
    // the label predicate lands at the FINAL rank only — the walk is
    // unfiltered, matching the routed rowFilter's layer-0 contract
    "facade_route_graph_hnsw_filtered" -> derived(
      InfraQueries.oracleSql("ann_graph_hnsw_topk"),
      "  FROM c3 c JOIN corpus v ON v.vec_id = c.vec_id\n" +
        "  JOIN qs q ON q.query_id = c.query_id)" ->
        ("  FROM c3 c JOIN corpus v ON v.vec_id = c.vec_id\n" +
          "  JOIN qs q ON q.query_id = c.query_id\n" +
          "  JOIN embeddings le ON le.vec_id = c.vec_id\n" +
          "  WHERE le.label = 1)")),
    "facade_route_graph_hnsw_synced" -> hnswSyncedSql,
    "facade_route_plaid" -> plaidPositionalSql,
    "facade_route_plaid_synced" -> plaidPositionalSql,
    "facade_route_exact" -> VectorQueries.oracleSql("knn_batch_topk"),
    "facade_route_ivf" -> InfraQueries.oracleSql("ann_ivf_topk"),
    "facade_route_filtered" -> InfraQueries.oracleSql("ann_ivf_filtered"),
    "facade_route_signlsh" -> InfraQueries.oracleSql("ann_signlsh_topk"),
    "facade_route_graph" -> InfraQueries.oracleSql("ann_graph_topk"),
    "facade_route_graph_layered" ->
      InfraQueries.oracleSql("ann_graph_layered_persisted"),
    "facade_route_graph_synced" -> InfraQueries.oracleSql("ann_graph_synced"),
    "facade_route_sq8" -> InfraQueries.oracleSql("ann_sq8_rerank"),
    "facade_route_sq8_synced" -> InfraQueries.oracleSql("ann_sq8_synced"),
    "facade_route_ivf_optimized" -> InfraQueries.oracleSql("ann_ivf_synced"),
    "facade_route_pq" -> InfraQueries.oracleSql("ann_pq_rerank"),
    "facade_route_ivfpq" -> InfraQueries.oracleSql("ann_ivfpq_topk"),
    "facade_route_ivf_trained" ->
      InfraQueries.oracleSql("ann_ivf_trained_topk"),
    "facade_route_ivfpq_trained" ->
      InfraQueries.oracleSql("ann_ivfpq_trained_persisted"),
    "facade_route_hybrid" -> VectorQueries.oracleSql("hybrid_rrf_topk"))
}
