package graft.tools

import graft.{GraftExtensions, SparkEntry}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dumps `explain("formatted")`-style physical plans for the flagship
  * queries into PLANS.md — the plan-shape evidence (pushdown, broadcast,
  * codegen spans, custom operators) behind the PlanAuditSpec assertions.
  * Usage: runMain graft.tools.Plans [sfDir] [outFile]. */
object Plans {

  private val flagship: Seq[(String, String)] = Seq(
    "q1_pricing_summary" -> ("Filter + column pruning pushed to the " +
      "parquet scan; partial/final hash aggregation in one codegen span"),
    "q5_revenue_by_nation" -> ("Star joins broadcast the dimensions; " +
      "the fact scan never shuffles before the aggregate"),
    "knn_cosine_single" -> ("Single-query KNN: one scan + codegen " +
      "vector_cosine + TakeOrderedAndProject; zero data-sized shuffles"),
    "knn_topk_operator" -> ("Custom operator stack: TopKPartial below " +
      "the exchange, TopKFinal above; queries broadcast via BNLJ"),
    "q_window_topk_rewrite" -> ("Declarative row_number window " +
      "rewritten by WindowTopKRewrite into the heap operator — no sort"),
    "asof_attribution" -> ("As-of join as union + running last() over " +
      "one shuffle on the key"),
    "q_approx_sketch" -> ("HLL++ and quantile digest with map-side " +
      "partial aggregation"),
    "mm_frame_sample" -> ("Frame grid via native Generate explode; " +
      "doc_id predicate reaches the scan"),
    "dedup_chunks" -> ("Chunk-level first-wins dedup: one Generate " +
      "explode, one window shuffle on the chunk key, partial+final agg"),
    "text_repetition" -> ("Gopher repetition signals: relational gram " +
      "counting (explode -> partial/final count), no nested HOF " +
      "aggregates"),
    "text_scrub" -> ("PII redaction is a pure codegen projection; " +
      "doc_id<40 pushed to the scan, no exchange before the sort"),
    "ann_ivf_topk" -> ("Deterministic-centroid IVF with real nProbe " +
      "pruning: broadcast centroids, map-side-partial min_by cell " +
      "assignment, equi-join on probed cells, window top-k refine"),
    "rerank_truncated" -> ("Two-stage rerank: broadcast-NLJ coarse " +
      "score in the dims-prefix subspace, window keeps k*c, exact " +
      "re-score only on survivors"),
    "facade_route_ivf" -> ("The routed facade call: one " +
      "similarity_search entry point whose executed plan reads the " +
      "kind's persisted IVF layout with PartitionFilters on the " +
      "probed cells — the scan never lists unprobed cell dirs"),
    "dedup_substring_spans" -> ("Cross-doc substring span dedup: " +
      "per-doc lead windows build position n-grams, ONE hash shuffle " +
      "on the 128-bit gram identity finds cross-doc dups, per-doc " +
      "windows merge islands — no cartesian, nothing unpartitioned"),
    "ann_ivf_shard_merged" -> ("Query over a file-move-merged shard " +
      "build: the merged layout is physically indistinguishable from " +
      "a full build, so the probe keeps PartitionFilters on probed " +
      "cells — shard-parallel construction costs the query plan " +
      "nothing"),
    "sample_dsir" -> ("DSIR importance scoring: the <=4096-row " +
      "hashed-feature log-ratio table broadcasts onto the raw token " +
      "stream; the only cross-joins are the two broadcast 1-row " +
      "totals — selection shuffles doc ids, never the corpus pair"),
    "dedup_semantic" -> ("SemDeDup: within-cell pair generation is an " +
      "equi-join on the frozen IVF cell id (quadratic bounded by the " +
      "largest cell), centroids broadcast at k rows; the component " +
      "closure shuffles only the pair graph"),
    "dedup_bloom_novel" -> ("Bloom admission: the probe is a codegen'd " +
      "literal-bitmap filter directly over the scan — no join, no " +
      "exchange, no broadcast; only the per-lang rollup shuffles"),
    "sample_weighted" -> ("A-Res weighted sampling: shuffle-free key " +
      "projection + one bounded TakeOrderedAndProject heap — never a " +
      "global sort"),
    "train_shard_shuffle" -> ("Epoch shard shuffle: exactly one hash " +
      "exchange on the shard key feeds the per-shard sort + rank — " +
      "the writer plan with an explicit pos column"),
    "graph_pagerank" -> ("PageRank final iteration: contribution " +
      "equi-join + node-keyed aggregate over localCheckpoint'd rank " +
      "tables — the plan stays this size at ANY iteration count"),
    "url_domain_psl" -> ("PSL registered domain: per rule-depth " +
      "broadcast equi-joins against the snapshot table + a " +
      "prevailing-rule coalesce projection — the corpus is never " +
      "exchanged; only the final presentation sort ranges"),
    "ev_cohort_retention" -> ("Cohort retention with NO forced " +
      "broadcast: the first-seen aggregate joins on the user key and " +
      "AQE picks the strategy — broadcast at this scale, a skew-safe " +
      "shuffle join at 10^9 users"),
    "text_html_extract" -> ("HTML extraction: page synthesis, block " +
      "drop, tag strip, entity decode, and the round-trip witness are " +
      "ONE codegen projection fused into the scan — the only exchange " +
      "is the per-lang rollup"),
    "web_graph_pipeline" -> ("Pages -> links -> domains -> PageRank: " +
      "the href explode is a native Generate, the domain fold happens " +
      "BEFORE distinct so the iteration state is domain-bounded, and " +
      "the rank loop reuses the audited graph_pagerank shape"),
    "train_triplets" -> ("Triplet mining: chunk Generate + one " +
      "doc-keyed window for the positive, broadcast 16-row pool NLJ + " +
      "per-anchor rank for the negative — constant work per anchor"),
    "web_frontier" -> ("Crawl scheduling: canonical collapse, " +
      "domain anti-join against the crawled set, rank join (AQE " +
      "broadcasts the domain-bounded rank table), one bounded " +
      "TakeOrdered heap — the frontier is never globally sorted"),
    "cdf_scd2" -> ("SCD2 history build: ONE pk-keyed lead window over " +
      "the journal — interval construction costs journal volume, " +
      "never versions x table"),
    "crawl_ingest_pipeline" -> ("Crawl step zero off a real WARC " +
      "archive: byte-range graft_warc scan, status/charset/meta gates " +
      "as scan-fused projections, robots rules a domain-bounded join, " +
      "the ledger crossJoin 1-row x 1-row"),
    "crawl_cdx_fetch" -> ("CDX-driven random access: the SURT range " +
      "predicate pushes into the sorted index scan (payload/digest " +
      "pruned), seek fetches run in mapPartitions, and the fetched " +
      "side broadcasts into the verify join — fetch cost tracks hits, " +
      "never archive size"))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("PLANS.md")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftExtensions.register(spark)
    graft.plans.WindowTopK.enable(spark)

    val sb = new StringBuilder
    sb.append("# PLANS — flagship physical plans at ").append(sfDir)
      .append("\n\nGenerated by `runMain graft.tools.Plans`; the shapes ")
      .append("below are pinned by PlanAuditSpec/TopKPlanSpec/")
      .append("WindowTopKSpec, so a regression fails the build, not ")
      .append("just this file.\n")
    flagship.foreach { case (name, note) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      sb.append(s"\n## $name\n\n$note.\n\n```\n")
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case p => p.toString
      }
      sb.append(plan.trim.take(4000)).append("\n```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
