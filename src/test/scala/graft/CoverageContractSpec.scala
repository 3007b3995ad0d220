package graft

/** The declared-vs-checked contract the driver's correctness run rests
  * on: every query in [[SparkEntry.queries]] must carry a DuckDB oracle
  * in [[SparkEntry.oracleSql]] (the driver hash-compares exactly the
  * intersection; a query without an oracle silently degrades to a
  * rows-only check, and an oracle without a query is dead SQL). Round 8
  * showed why this needs to be an assertion and not a convention: 9
  * declared-and-oracled queries were absent from the driver's
  * correctness window, and nothing in the repo made that visible. This
  * spec pins the full declared set so any drift between the query map
  * and the oracle map fails the build, and the count below documents
  * what "all green" must mean.
  */
class CoverageContractSpec extends SparkSpec {

  test("every declared query has an oracle and every oracle a query") {
    val queries = SparkEntry.queries.keySet
    val oracles = SparkEntry.oracleSql.keySet
    val noOracle = queries -- oracles
    val orphaned = oracles -- queries
    assert(orphaned.isEmpty,
      s"oracle SQL with no query entry: ${orphaned.toSeq.sorted}")
    assert(noOracle.isEmpty,
      s"queries with only a rows-only check: ${noOracle.toSeq.sorted}")
  }

  test("declared query count matches the documented coverage board") {
    // COVERAGE.md and the per-round correctness JSON must account for
    // exactly this many rows. Update BOTH when adding a query.
    assert(SparkEntry.queries.size >= 258,
      s"query count shrank to ${SparkEntry.queries.size} — a domain map " +
        "was probably dropped from SparkEntry.queries")
  }

  test("the round-13 additions stay declared and oracled") {
    // WARC ingest, charset sniff/transcode, robots.txt allow/deny +
    // the robots-gated frontier
    val required = Set("warc_extract", "web_charset_decode",
      "web_robots_rules", "web_frontier_robots", "crawl_ingest_pipeline")
    val missing = required -- SparkEntry.queries.keySet
    val unoracled = required -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"dropped queries: ${missing.toSeq.sorted}")
    assert(unoracled.isEmpty, s"unoracled: ${unoracled.toSeq.sorted}")
  }

  test("the round-12 additions stay declared and oracled") {
    // multi-cohort retention (the fixture's single first-seen week made
    // the cohort dimension untested), PSL-table registered domain,
    // dangling-mass PageRank, Bloom artifact round trip
    val required = Set("ev_cohort_multi", "url_domain_psl",
      "graph_pagerank_dangling", "dedup_bloom_roundtrip",
      "dedup_bloom_stream", "ev_funnel_stages", "mm_wav_windows",
      "ev_cohort_retention", "ev_funnel")
    val missing = required -- SparkEntry.queries.keySet
    val unoracled = required -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"dropped queries: ${missing.toSeq.sorted}")
    assert(unoracled.isEmpty, s"lost oracles: ${unoracled.toSeq.sorted}")
  }

  test("the round-11 corpus-cleanup additions stay declared and oracled") {
    // C4 line/doc cleaning, RefinedWeb frequent-line boilerplate
    // removal, and the fixed-point linear quality classifier (exact
    // integer GD — training weights hash-compared against a full SQL
    // replay of every step)
    val required = Set("text_c4_filters", "text_c4_stats",
      "text_line_dedup", "lm_linear_train", "lm_linear_classify",
      "corpus_pipeline_clean", "ev_dedup_ttl", "ev_dedup_ttl_stream",
      "text_unicode_normalize", "dedup_fuzzy_pairs",
      "dedup_groups_best")
    val missing = required -- SparkEntry.queries.keySet
    val unoracled = required -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"dropped queries: ${missing.toSeq.sorted}")
    assert(unoracled.isEmpty, s"lost oracles: ${unoracled.toSeq.sorted}")
  }

  test("the round-11 additions stay declared and oracled") {
    // real ImageIO PNG decode/resize/knn, trained + recall SemDeDup,
    // the end-to-end pipeline ledger
    val required = Set("mm_png_decode", "mm_png_resize", "mm_png_knn",
      "mm_bmp_decode", "mm_jpeg_decode", "mm_gif_video_frames",
      "mm_wav_resample", "mm_media_index_knn", "ingest_media_pipeline",
      "dedup_semantic_trained", "dedup_semantic_recall",
      "corpus_pipeline", "corpus_pipeline_full")
    val missing = required -- SparkEntry.queries.keySet
    val unoracled = required -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"dropped queries: ${missing.toSeq.sorted}")
    assert(unoracled.isEmpty, s"lost oracles: ${unoracled.toSeq.sorted}")
  }

  test("the round-10 facade kinds stay declared and oracled") {
    // quantized kinds + trained quantizers + the bucketed-corpus sync
    // behind the one entry point — the round-10 closure of the facade
    val required = Set("facade_route_sq8", "facade_route_pq",
      "facade_route_ivfpq", "facade_route_ivf_trained",
      "facade_route_ivfpq_trained", "facade_route_graph_synced",
      "facade_route_sq8_synced", "facade_route_ivf_optimized")
    val missing = required -- SparkEntry.queries.keySet
    val unoracled = required -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"dropped queries: ${missing.toSeq.sorted}")
    assert(unoracled.isEmpty, s"lost oracles: ${unoracled.toSeq.sorted}")
  }

  test("the round-10 scale extensions stay declared and oracled") {
    // shard-parallel build + file-move merge, substring span dedup
    val required = Set("ann_ivf_shard_merged", "ann_signlsh_shard_merged",
      "ann_sq8_shard_merged", "ann_ivfpq_shard_merged",
      "near_dup_shard_merged", "dedup_substring_spans",
      "dedup_substring_scrub", "lm_nb_classify", "dedup_semantic",
      "sample_dsir", "text_gopher_rules", "mm_ppm_decode",
      "mm_ppm_resize", "mm_wav_decode", "mm_video_frames",
      "text_gzip_blobs", "mm_ppm_knn", "text_bpe_train",
      "text_bpe_encode")
    val missing = required -- SparkEntry.queries.keySet
    val unoracled = required -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"dropped queries: ${missing.toSeq.sorted}")
    assert(unoracled.isEmpty, s"lost oracles: ${unoracled.toSeq.sorted}")
  }

  test("event/as-of/misc queries stay declared and oracled") {
    // the 9 rows absent from CORRECTNESS_r08 — they must never silently
    // drop out of the declared set again
    val required = Set("asof_attribution", "asof_forward", "asof_nearest",
      "ev_hourly_agg", "ev_json_extract", "ev_sessionize", "ev_stats",
      "json_roundtrip", "sketch_heavy_hitters")
    val missing = required -- SparkEntry.queries.keySet
    val unoracled = required -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"dropped queries: ${missing.toSeq.sorted}")
    assert(unoracled.isEmpty, s"lost oracles: ${unoracled.toSeq.sorted}")
  }
}
