package graft

/** Plan-shape assertions: correctness gates say WHAT each query returns;
  * these pin HOW — the physical plans that survive a 100 TB scale-up.
  * A regression here (lost pushdown, a surprise sort-merge join, an
  * extra shuffle) is a performance bug even while results stay right. */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String = {
    // other suites cache full-table reads of the same parquet paths;
    // cached InMemoryRelations would replace the scans under audit
    spark.sharedState.cacheManager.clearCache()
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
  }

  test("q1: filter and column pruning reach the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "shipdate filter must push into the scan")
    assert(p.contains("ReadSchema") && !p.contains("l_partkey"),
      "unused columns must be pruned from the scan")
  }

  test("q3/q5: dimension joins broadcast, never sort-merge") {
    Seq("q3_revenue_topn", "q5_revenue_by_nation").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q should broadcast dims")
      assert(!p.contains("SortMergeJoin"), s"$q must not SMJ small dims")
    }
  }

  test("q2: global top-N is TakeOrderedAndProject, not a full sort") {
    val p = plan("q2_top_orders")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("single-query knn: one scan, no data-sized shuffle") {
    val p = plan("knn_cosine_single")
    // the rank window runs on <= k rows post-limit; the corpus itself is
    // never exchanged — only TakeOrdered's singlePartition gather
    val exchanges = "Exchange (?!SinglePartition)".r
      .findAllIn(p.replaceAll("Exchange SinglePartition", "Exchange-OK"))
      .size
    assert(!p.contains("Exchange hashpartitioning"),
      "corpus must not be hash-repartitioned for a single query")
  }

  test("near-dup theta join is a broadcast NLJ, and the distance kernel " +
    "appears as the native expression") {
    val p = plan("near_dup_pairs")
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(p.toLowerCase.contains("vector_cosine"),
      "scoring must be the codegen VectorDistance, not a UDF")
  }

  test("semi/anti joins plan as semi/anti, not inner + distinct") {
    assert(plan("q_semi_join").contains("LeftSemi"))
    assert(plan("q_anti_join").contains("LeftAnti"))
  }

  test("feed source: column pruning reaches the DSv2 reader") {
    val p = SparkEntry.queries("feed_ingest")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("summary") && !p.contains("authors"),
      "unused feed columns must not be read")
  }

  test("batch knn: exactly one shuffle (the per-query window)") {
    val p = plan("knn_batch_topk")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles <= 1, s"expected <=1 hash exchange, got $shuffles:\n$p")
  }

  test("topk operator: partial below the exchange, final above, " +
    "queries broadcast") {
    val p = plan("knn_topk_operator")
    assert(p.contains("TopKPartial") && p.contains("TopKFinal"),
      s"custom exec nodes missing:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"),
      "query side must broadcast, corpus must not shuffle")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles <= 1, s"expected <=1 hash exchange, got $shuffles:\n$p")
    // order within the plan string: final ... exchange ... partial
    val (fi, ei, pi) = (p.indexOf("TopKFinal"),
      p.indexOf("Exchange hashpartitioning"), p.indexOf("TopKPartial"))
    assert(fi >= 0 && fi < ei && ei < pi,
      s"exchange must sit between final and partial:\n$p")
  }

  test("frame sampling: doc filter pushed to the scan, explode is " +
    "native Generate") {
    val p = plan("mm_frame_sample")
    assert(p.contains("PushedFilters") && p.contains("LessThan(doc_id,60"),
      s"doc_id predicate must reach the parquet scan:\n$p")
    assert(p.contains("Generate explode"),
      "frame grid must be a codegen explode, not a UDF")
  }

  test("pivot: two-phase agg + pivotfirst, values list stays explicit") {
    val p = plan("q_pivot")
    // Spark's pivot = (group, pivot) pre-agg then pivotfirst re-agg: at
    // most two hash exchanges, and the explicit value list means no
    // values-discovery collect job ran before planning
    assert(p.contains("pivotfirst"), s"expected pivotfirst agg:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles <= 2, s"expected <=2 hash exchanges:\n$p")
  }

  test("null-safe join stays a hash join, never a nested loop") {
    val p = plan("q_null_safe_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("ShuffledHashJoin")
      || p.contains("SortMergeJoin"),
      s"<=> must keep an equi-join strategy:\n$p")
    assert(!p.contains("NestedLoop"), s"must not degrade to NLJ:\n$p")
  }

  test("approx sketch: partial+final aggregation, one shuffle") {
    val p = plan("q_approx_sketch")
    assert(p.toLowerCase.contains("partial_approx_count_distinct") ||
      p.contains("partial_"),
      s"sketch agg must be map-side partial:\n$p")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles <= 2, s"expected <=2 hash exchanges, got $shuffles:\n$p")
  }

  test("chunk dedup: column pruning at the scan, window shuffles on " +
    "the chunk key only") {
    val p = plan("dedup_chunks")
    assert(p.contains("ReadSchema") && !p.contains("n_chars") &&
      !p.contains("lang"),
      s"only doc_id/source/text should be read:\n$p")
    // one exchange for the chunk window, one for the source agg; the
    // explode itself must not force an extra shuffle
    val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(shuffles <= 2, s"expected <=2 hash exchanges, got $shuffles:\n$p")
  }

  test("scrub: pure projection — no shuffle at all before the sort") {
    val p = plan("text_scrub")
    assert(!p.contains("Exchange hashpartitioning"),
      s"redaction is a projection; no hash exchange expected:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,40)]")
      || p.contains("LessThan(doc_id,40)"),
      s"doc_id<40 must push into the scan:\n$p")
  }

  test("repetition: gram counting is partial+final, dup fraction " +
    "joins without a sort-merge on the small side") {
    val p = plan("text_repetition")
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"gram counts must combine map-side:\n$p")
  }

  test("runtime bloom filter injects on a selective shuffle join " +
    "(the 100 TB fact-scan pruner)") {
    import org.apache.spark.sql.functions._
    spark.sharedState.cacheManager.clearCache()
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // force the shuffle-join + tiny-threshold regime so injection
      // triggers at test scale; at real scale the defaults (10MB/10GB)
      // pick the same plan for a selective dim filter over a huge fact
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      val ord = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val j = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .agg(sum("l_quantity"))
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("bloom_filter_might_contain") ||
        p.toLowerCase.contains("bloomfilter"),
        s"expected a runtime bloom filter on the fact side:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("filtered knn: the metadata predicate reaches the parquet scan") {
    val p = plan("knn_filtered")
    assert(p.contains("EqualTo(label,1)"),
      s"label filter must push into the scan, not evaluate post-read:\n$p")
  }

  test("hybrid: keyword leg probes postings via the term key, " +
    "query side broadcast") {
    val p = plan("hybrid_rrf_topk")
    assert(p.contains("BroadcastHashJoin"),
      "query-term probe must broadcast the tiny side")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"no unbounded cartesian anywhere in the hybrid plan:\n${p.take(1500)}")
  }

  test("semantic dedup: the pair stage is an equi-join on the cell id, " +
    "never corpus-level all-pairs") {
    import graft.functions.{VectorFunctions => VF}
    import org.apache.spark.sql.functions._
    spark.sharedState.cacheManager.clearCache()
    // audit the pair stage directly (the full operator's component
    // loop plans per-iteration): both sides key on __cell, so the
    // quadratic work is bounded by the largest cell
    val cells = graft.search.Ann.buildIvfDeterministic(
        spark.read.parquet(s"$sf/embeddings.parquet")
          .filter(col("embedding").isNotNull), "embedding", "vec_id", 16)
      .corpusWithCell
      .select(col("vec_id").as("id"), col("embedding").as("v"), col("__cell"))
    val pairs = cells.toDF("a_id", "va", "ca")
      .join(cells.toDF("b_id", "vb", "cb"), col("ca") === col("cb"))
      .filter(col("a_id") < col("b_id") &&
        VF.cosine(col("va"), col("vb")) >= 0.4)
    val p = pairs.queryExecution.executedPlan.toString.toLowerCase
    // the ONLY nested-loop allowed is the bounded k-row centroid
    // broadcast inside the cell assignment; the pair join itself must
    // key on the cell id
    assert(p.contains("join [ca") && p.contains("], [cb"),
      s"pair stage must equi-join on the cell id:\n${p.take(1500)}")
    assert(!p.contains("cartesianproduct"),
      s"no unbroadcast all-pairs anywhere:\n${p.take(1500)}")
  }

  test("dsir: the bounded ratio table broadcasts onto the token stream") {
    val p = plan("sample_dsir")
    assert(p.contains("BroadcastHashJoin"),
      s"the <=B-row log-ratio table must broadcast, not shuffle the " +
        s"token stream twice:\n${p.take(1500)}")
    assert(!p.toLowerCase.contains("cartesianproduct"),
      s"only the two 1-row totals may cross-join (broadcast):\n${p.take(1500)}")
  }

  test("media decode: the featurize plan is one scan-side projection — " +
    "no shuffle, no driver collect in the operator") {
    import graft.operators.Multimodal
    spark.sharedState.cacheManager.clearCache()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("doc_id") < 50)
    val p = Multimodal.imageFeatures(
        Multimodal.syntheticPngMedia(docs, "doc_id"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"decode+featurize must stay partition-local (mapPartitions " +
        s"over the scan):\n${p.take(1200)}")
    val pv = Multimodal.sampleGifFrames(
        Multimodal.syntheticGifVideoMedia(docs, "doc_id"), 250L)
      .queryExecution.executedPlan.toString
    assert(!pv.contains("Exchange"),
      s"GIF demux must stay partition-local:\n${pv.take(1200)}")
  }

  test("precomputed embedder: the pk lookup broadcasts the vector " +
    "table, no corpus shuffle") {
    spark.sharedState.cacheManager.clearCache()
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val em = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = new graft.embed.PrecomputedEmbedder(em, "vec_id",
        "embedding", "doc_id", 64)
      .embed(d, "text").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"small vector table must broadcast onto the corpus:\n${p.take(1200)}")
    assert(!p.contains("SortMergeJoin"),
      s"no sort-merge for the pk lookup at this size:\n${p.take(1200)}")
  }

  test("bpe fast apply: one projection node, no shuffle, flat in " +
    "merge count") {
    import graft.operators.TextAnalysis
    spark.sharedState.cacheManager.clearCache()
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val merges = (1 to 500).map(r =>
      (r, s"${('a' + r % 26).toChar}${('a' + (r / 26) % 26).toChar}", 1L))
      .distinct.filter { case (_, p, _) => true }
      .groupBy(_._2).map(_._2.head).toSeq.sortBy(_._1)
    val p = d.select(TextAnalysis.bpeApplyFast(
        org.apache.spark.sql.functions.col("text"), merges))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"encode is a pure projection:\n${p.take(1200)}")
    assert(p.contains("bpe_encode"),
      s"the single BpeEncode node must carry the table:\n${p.take(1200)}")
    // the plan string must NOT blow up linearly in merges — the chain
    // form would embed one replace() per merge
    assert(p.length < 20000,
      s"plan size must stay flat in merge count, got ${p.length}")
  }

  test("c4 cleanup: one projection pass, only the source rollup shuffles") {
    val p = plan("text_c4_stats")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"line rules + doc gates must fold into the scan-side projection; " +
        s"only the per-source aggregate may exchange:\n${p.take(1200)}")
    assert(!p.contains("Join"), "a pure projection pass needs no join")
  }

  test("frequent-line dedup: the hot-line table broadcasts, the line " +
    "set is never cartesian- or sort-merge-joined") {
    val p = plan("text_line_dedup")
    assert(p.contains("BroadcastHashJoin"),
      s"the threshold-crossing line set is small by construction and " +
        s"must broadcast:\n${p.take(1200)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("linear classifier scoring: shuffle-free, the model rides in as " +
    "an array literal") {
    import graft.operators.LangModel
    spark.sharedState.cacheManager.clearCache()
    val m = LangModel.LinearModel(Array.tabulate(65)(_.toLong), 64,
      250L, 1000L, 10000L)
    val p = LangModel.linearScore(m,
        spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      s"scoring is a projection — a (dim+1)-long model never needs a " +
        s"join or shuffle:\n${p.take(1200)}")
  }

  test("bloom probe: a shuffle-free filter, the bitmap rides as a " +
    "literal, no join") {
    import graft.operators.Bloom
    spark.sharedState.cacheManager.clearCache()
    val bits = Array.fill(16)(0x5555555555555555L)
    val p = Bloom.novel(spark.read.parquet(s"$sf/documents.parquet"),
        "text", bits, k = 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"the probe must stay a scan+filter:\n${p.take(1200)}")
    // the "*(n)" node prefix is the whole-stage-codegen marker; the
    // lambda-forall form of the probe fell back to interpreted eval
    assert("""\*\(\d+\) Filter""".r.findFirstIn(p).isDefined,
      s"probe filter must be inside a codegen stage:\n${p.take(400)}")
  }

  test("weightedSample: a bounded TakeOrdered heap, never a global sort") {
    spark.sharedState.cacheManager.clearCache()
    val p = plan("sample_weighted")
    assert(p.contains("TakeOrderedAndProject"),
      s"A-Res top-k must be a heap:\n${p.take(1200)}")
    assert(!p.contains("Exchange rangepartitioning"),
      "no range-partitioned global sort for a bounded draw")
  }

  test("epochShuffle: exactly one hash exchange (the shard key), " +
    "nothing corpus-global") {
    spark.sharedState.cacheManager.clearCache()
    // the operator itself, without the oracle query's presentation sort
    val p = graft.operators.Sampling.epochShuffle(
        spark.read.parquet(s"$sf/documents.parquet").select("doc_id"),
        "doc_id", epoch = 2, nShards = 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("Exchange hashpartitioning"),
      "the per-shard rank needs the shard exchange")
    assert(!p.contains("Exchange rangepartitioning") &&
      !p.contains("Exchange SinglePartition"),
      s"no global sort or single-partition gather:\n${p.take(1200)}")
  }

  test("url canonicalization rollup: one hash shuffle on the domain " +
    "key, no UDFs") {
    spark.sharedState.cacheManager.clearCache()
    val p = plan("url_domain_stats")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      "URL parsing must stay native expressions")
  }

  test("cohort/funnel: no forced broadcast of a user-keyed aggregate " +
    "— the build side is user-bounded, which is NOT bounded at 100 TB; " +
    "AQE alone decides the join strategy") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    spark.sharedState.cacheManager.clearCache()
    Seq("ev_cohort_retention", "ev_cohort_multi", "ev_funnel").foreach { q =>
      val lp = SparkEntry.queries(q)(spark, sf).queryExecution.analyzed
      val hints = lp.collect { case h: ResolvedHint => h }
      assert(hints.isEmpty, s"$q carries a forced join hint:\n$lp")
    }
  }

  test("html extraction: the whole synthesize+extract+witness pass is " +
    "scan-side — only the per-lang rollup exchanges, and no UDF") {
    spark.sharedState.cacheManager.clearCache()
    val p = plan("text_html_extract")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      "extraction must stay native regex expressions")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx <= 1,
      s"only the lang rollup may shuffle, found $hashEx:\n${p.take(1200)}")
  }

  test("triplet mining: the negative pool rides in as a broadcast — " +
    "the anchor stream is never shuffled for the pick") {
    spark.sharedState.cacheManager.clearCache()
    val p = plan("train_triplets")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"constant pool must broadcast:\n${p.take(1200)}")
    assert(!p.contains("SortMergeJoin"),
      "a 16-row pool must never sort-merge")
  }

  test("scd2Apply: the incremental fold plans semi/anti pk joins — " +
    "closed history is moved, never re-windowed") {
    import org.apache.spark.sql.functions._
    spark.sharedState.cacheManager.clearCache()
    val j = spark.range(100).select(col("id").as("pk"),
      concat(lit("t"), col("id")).as("text"),
      lit("I").as("__op"), col("id").as("__seq"))
    val cur = graft.index.ChangeLog.scd2(j, "pk")
    val batch = spark.range(5).select(col("id").as("pk"),
      lit("v2").as("text"), lit("U").as("__op"),
      (col("id") + 1000L).as("__seq"))
    val p = graft.index.ChangeLog.scd2Apply(cur, batch, "pk")
      .queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"),
      s"changed pks' open rows come via a semi join:\n${p.take(800)}")
    assert(p.contains("LeftAnti"),
      "untouched pks pass through via an anti join")
  }

  test("ev_cohort_multi exercises the cohort dimension for real: " +
    "several distinct cohorts, several week offsets each") {
    spark.sharedState.cacheManager.clearCache()
    val rows = SparkEntry.queries("ev_cohort_multi")(spark, sf)
      .collect()
      .map(r => (r.get(0).toString, r.getLong(1)))
    val cohorts = rows.map(_._1).distinct
    assert(cohorts.length >= 3,
      s"need >= 3 distinct cohorts, got ${cohorts.toSeq}")
    val offsetsPerCohort = rows.groupBy(_._1).values.map(_.length)
    assert(offsetsPerCohort.forall(_ >= 2),
      s"every cohort needs >= 2 week offsets, got $rows")
  }

  test("web_graph_components: no window operator at all — the " +
    "min-label closure runs on host strings directly, never a " +
    "global dense-rank (one-task sort) over the node set") {
    val p = plan("web_graph_components")
    assert(!p.contains("Window"),
      s"window operator found in the components plan:\n${p.take(3000)}")
  }
}
