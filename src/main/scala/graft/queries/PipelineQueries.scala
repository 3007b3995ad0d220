package graft.queries

import graft.CorpusPipeline
import graft.core.Tables
import graft.embed.PrecomputedEmbedder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The end-to-end corpus-preparation composition, oracled: every stage
  * of [[graft.CorpusPipeline]] chained over `documents` + `embeddings`
  * with a fixed configuration in which (almost) every stage bites, and
  * the oracle replaying the stages' existing SQL recipes as ONE chained
  * query. The output is the per-stage survivor ledger —
  * `(stage_idx, stage, n_docs, id_sum)` — so a hash match pins each
  * stage's surviving SET (count + id checksum), not just the final
  * frame: a drop in the wrong stage, or the right count with the wrong
  * members, breaks the hash. PipelineSpec additionally asserts
  * `CorpusPipeline.run`'s report equals this composed ledger, closing
  * the loop between the orchestration path and the oracle.
  */
object PipelineQueries {

  /** The pinned configuration (chosen so every stage with material to
    * act on does: quality drops the 0.88-scored docs, Gopher more than
    * halves, repetition cuts the dup-heavy tail, near-dup at 0.5
    * removes LSH-confirmed pairs, DSIR keeps the 60 most
    * target-favored, SemDeDup collapses tau-0.3 semantic groups; exact
    * dedup is pass-through only because the fixture has no
    * byte-identical texts — the stage still runs and replays). */
  private def pipeline = new CorpusPipeline(
    minQuality = 0.9,
    nearDupJaccard = 0.5,
    shingleSize = 3,
    maxDupTokenFraction = 0.65,
    useGopherRules = true,
    dsirKeep = 60,
    semanticDedupK = 16,
    semanticTau = 0.3,
    nearDupAlgo = "md5")

  /** The ALL-stages configuration: the base pipeline plus benchmark
    * decontamination (3-gram overlap ≥ 0.5 vs the `doc_id % 40 = 7`
    * eval slice — the self-contaminated members score ~1.0 and drop)
    * and per-source balancing (top-4 by quality per source, the
    * TopKPerGroup heap operator), with the DSIR budget tightened to 40
    * so selection still bites after balancing. */
  private def pipelineFull = new CorpusPipeline(
    minQuality = 0.9,
    nearDupJaccard = 0.5,
    shingleSize = 3,
    maxDupTokenFraction = 0.65,
    perSourceCap = 4,
    maxContamination = 0.5,
    useGopherRules = true,
    dsirKeep = 40,
    semanticDedupK = 16,
    semanticTau = 0.3,
    nearDupAlgo = "md5")

  /** The CLEANING-front configuration: the text-rewriting stages over
    * the deterministic multi-line corpus (the single-line base fixture
    * gives line-oriented stages nothing to bite) — frequent-line
    * boilerplate strike at 10 distinct docs, the C4 line rules + doc
    * gates, then the quality gate at 0.9 (short-after-cleaning docs
    * score 0.72 and drop) and exact dedup. */
  private def pipelineClean = new CorpusPipeline(
    minQuality = 0.9,
    boilerplateMinDocs = 10,
    useC4Rules = true)

  /** The cleaning-front frames, [[stageFrames]]-shaped. */
  def stageFramesClean(s: SparkSession,
      dir: String): Seq[(String, DataFrame)] = {
    val d = QualityQueries.multilineDocs(s, dir)
    val p = pipelineClean
    val bp = p.boilerplateStage(d, "doc_id", "text").localCheckpoint(true)
    val c4 = p.c4Filter(bp, "text").localCheckpoint(true)
    val q = p.qualityFilter(c4, "text")
    val e = p.exactDedup(q, "doc_id", "text")
    Seq("input" -> d, "linededup" -> bp, "c4" -> c4, "quality" -> q,
      "exact" -> e)
  }

  private def bloomBits(s: SparkSession, dir: String): Array[Long] = {
    val hist = Tables.load(s, dir, "documents")
      .filter(col("text").isNotNull && trim(col("text")) =!= "")
      .filter(pmod(col("doc_id"), lit(3)) =!= 0)
    BuildCache.memo(s"bloom:1024:3:$dir") {
      graft.operators.Bloom.build(hist.select("text"), "text", 1024, 3)
    }
  }

  private def pipelineBloom(s: SparkSession, dir: String) =
    new CorpusPipeline(minQuality = 0.9,
      bloomHistory = Some(bloomBits(s, dir)))

  /** The cross-corpus admission frames: the WHOLE documents table
    * arrives as the incoming batch against the history filter built
    * from the doc_id%3!=0 slice (the dedup_bloom_novel fixture), then
    * the quality gate and exact dedup run on the admitted rows. */
  def stageFramesBloom(s: SparkSession,
      dir: String): Seq[(String, DataFrame)] = {
    val d = Tables.load(s, dir, "documents")
    val p = pipelineBloom(s, dir)
    val bl = p.bloomAdmission(d, "text").localCheckpoint(true)
    val q = p.qualityFilter(bl, "text")
    val e = p.exactDedup(q, "doc_id", "text")
    Seq("input" -> d, "bloom" -> bl, "quality" -> q, "exact" -> e)
  }

  /** [[runReportClean]]'s twin at the bloom-front config. */
  def runReportBloom(s: SparkSession, dir: String): graft.PipelineReport = {
    val d = Tables.load(s, dir, "documents")
    val em = Tables.load(s, dir, "embeddings")
    pipelineBloom(s, dir).run(s, d, "doc_id", "text",
      new PrecomputedEmbedder(em, "vec_id", "embedding", "doc_id", 64))._2
  }

  /** [[runReport]] at the cleaning-front config (PipelineSpec compares
    * the run-path counts against the ledger's prefix). */
  def runReportClean(s: SparkSession, dir: String): graft.PipelineReport = {
    val d = QualityQueries.multilineDocs(s, dir)
    val em = Tables.load(s, dir, "embeddings")
    pipelineClean.run(s, d, "doc_id", "text",
      new PrecomputedEmbedder(em, "vec_id", "embedding", "doc_id", 64))._2
  }

  /** The composed per-stage frames, shared by the query and
    * PipelineSpec's run-vs-ledger assertion. */
  def stageFrames(s: SparkSession, dir: String): Seq[(String, DataFrame)] = {
    val d = Tables.load(s, dir, "documents")
    val em = Tables.load(s, dir, "embeddings")
    val p = pipeline
    val q = p.qualityFilter(d, "text")
    val g = p.gopherFilter(q, "text")
    val r = p.repetitionFilter(g, "text")
    // pin the expensive stage boundaries (run()'s single-pass
    // discipline): the ledger aggregates each stage AND feeds it to
    // the next, and without a pinned boundary every later row would
    // re-run the MinHash/DSIR chains from scratch
    val e = p.exactDedup(r, "doc_id", "text").localCheckpoint(true)
    val nd = p.nearDupRemoval(e, "doc_id", "text").localCheckpoint(true)
    val ds = p.dsirSelection(nd, "doc_id", "text",
      d.filter(col("lang") === "en")).localCheckpoint(true)
    val embedder = new PrecomputedEmbedder(em, "vec_id", "embedding",
      "doc_id", 64)
    val fin = p.semanticFilter(embedder.embed(ds, "text"), "doc_id")
    Seq("input" -> d, "quality" -> q, "gopher" -> g, "repetition" -> r,
      "exact" -> e, "neardup" -> nd, "dsir" -> ds, "semantic" -> fin)
  }

  /** The all-stages composition — the base chain with decontamination
    * after near-dup and balancing after decontamination, the order
    * [[graft.CorpusPipeline.run]] pins. */
  def stageFramesFull(s: SparkSession,
      dir: String): Seq[(String, DataFrame)] = {
    val d = Tables.load(s, dir, "documents")
    val em = Tables.load(s, dir, "embeddings")
    val p = pipelineFull
    val q = p.qualityFilter(d, "text")
    val g = p.gopherFilter(q, "text")
    val r = p.repetitionFilter(g, "text")
    val e = p.exactDedup(r, "doc_id", "text").localCheckpoint(true)
    val nd = p.nearDupRemoval(e, "doc_id", "text").localCheckpoint(true)
    val dc = p.decontaminationFilter(nd, "doc_id", "text",
      d.filter(pmod(col("doc_id"), lit(40)) === 7), "text")
      .localCheckpoint(true)
    val bal = p.balance(dc, "doc_id", "text", "source")
      .localCheckpoint(true)
    val ds = p.dsirSelection(bal, "doc_id", "text",
      d.filter(col("lang") === "en")).localCheckpoint(true)
    val embedder = new PrecomputedEmbedder(em, "vec_id", "embedding",
      "doc_id", 64)
    val fin = p.semanticFilter(embedder.embed(ds, "text"), "doc_id")
    Seq("input" -> d, "quality" -> q, "gopher" -> g, "repetition" -> r,
      "exact" -> e, "neardup" -> nd, "decontam" -> dc, "balance" -> bal,
      "dsir" -> ds, "semantic" -> fin)
  }

  /** Run [[graft.CorpusPipeline.run]] itself at the pinned config —
    * PipelineSpec compares its report against the ledger. */
  def runReport(s: SparkSession, dir: String): graft.PipelineReport = {
    val d = Tables.load(s, dir, "documents")
    val em = Tables.load(s, dir, "embeddings")
    pipeline.run(s, d, "doc_id", "text",
      new PrecomputedEmbedder(em, "vec_id", "embedding", "doc_id", 64),
      dsirTarget = Some(d.filter(col("lang") === "en")))._2
  }

  /** [[runReport]] at the all-stages config. */
  def runReportFull(s: SparkSession, dir: String): graft.PipelineReport = {
    val d = Tables.load(s, dir, "documents")
    val em = Tables.load(s, dir, "embeddings")
    pipelineFull.run(s, d, "doc_id", "text",
      new PrecomputedEmbedder(em, "vec_id", "embedding", "doc_id", 64),
      sourceCol = Some("source"),
      benchmarks = Some(d.filter(pmod(col("doc_id"), lit(40)) === 7)),
      dsirTarget = Some(d.filter(col("lang") === "en")))._2
  }

  private def ledger(frames: Seq[(String, DataFrame)]): DataFrame =
    frames.zipWithIndex
      .map { case ((name, df), i) =>
        df.agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("doc_id")).cast("long").as("id_sum"))
          .select(lit(i).as("stage_idx"), lit(name).as("stage"),
            col("n_docs"), col("id_sum"))
      }
      .reduce(_ unionByName _)
      .orderBy("stage_idx")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corpus_pipeline" -> ((s, dir) => ledger(stageFrames(s, dir))),
    // EVERY pipeline stage enabled — decontamination and balancing
    // join the chain, each oracled in the same per-stage ledger
    "corpus_pipeline_full" -> ((s, dir) => ledger(stageFramesFull(s, dir))),
    // the round-11 cleaning front: boilerplate strike → C4 → quality →
    // exact, over the multi-line corpus, same survivor-ledger contract
    "corpus_pipeline_clean" -> ((s, dir) => ledger(stageFramesClean(s, dir))),
    // the cross-corpus front: Bloom history admission (every verdict
    // incl. false positives md5-replayed) → quality → exact, same
    // survivor-ledger contract
    "corpus_pipeline_bloom" -> ((s, dir) => ledger(stageFramesBloom(s, dir))))

  /** One chained replay of the stages' proven recipes: quality score ≥
    * 0.9 (text_quality_by_source's formula), the five Gopher rules
    * (text_gopher_rules), dup-token fraction ≤ 0.65 (text_repetition's
    * dupf), first-wins on full text, the md5 MinHash/band/Jaccard
    * near-dup machinery ON the stage-4 survivors (dedup_minhash_lsh),
    * DSIR hashed-bucket log-weights of the stage-5 survivors against
    * the full-corpus English target with top-60 selection
    * (sample_dsir), a pk-join of precomputed embeddings, and the
    * SemDeDup cells/pairs/recursive-closure keep decision over the
    * embedded survivors (dedup_semantic) — aggregated to the per-stage
    * (count, id-sum) ledger. */
  /** Per-stage timing split (merged into SparkEntry.phases): the cell
    * composes eight stages, so a drift should name the stage that
    * moved. Cheap projections fold into the boundary that pins them
    * (toExact = quality+gopher+repetition+exact). */
  val phases: Map[String, (SparkSession, String) => Map[String, Double]] =
    Map(
      "corpus_pipeline" -> ((s, dir) => {
        def timed[T](f: => T): (T, Double) = {
          val t0 = System.nanoTime()
          val r = f
          (r, (System.nanoTime() - t0) / 1e9)
        }
        val d = Tables.load(s, dir, "documents")
        val em = Tables.load(s, dir, "embeddings")
        val p = pipeline
        val (e, toExact) = timed {
          p.exactDedup(p.repetitionFilter(p.gopherFilter(
            p.qualityFilter(d, "text"), "text"), "text"), "doc_id",
            "text").localCheckpoint(true)
        }
        val (nd, nearDup) = timed {
          p.nearDupRemoval(e, "doc_id", "text").localCheckpoint(true)
        }
        val (ds, dsir) = timed {
          p.dsirSelection(nd, "doc_id", "text",
            d.filter(col("lang") === "en")).localCheckpoint(true)
        }
        val (_, semantic) = timed {
          p.semanticFilter(new PrecomputedEmbedder(em, "vec_id",
            "embedding", "doc_id", 64).embed(ds, "text"), "doc_id")
            .count()
        }
        Map("toExact" -> toExact, "nearDup" -> nearDup, "dsir" -> dsir,
          "semantic" -> semantic)
      }),
      "corpus_pipeline_full" -> ((s, dir) => {
        def timed[T](f: => T): (T, Double) = {
          val t0 = System.nanoTime()
          val r = f
          (r, (System.nanoTime() - t0) / 1e9)
        }
        val d = Tables.load(s, dir, "documents")
        val em = Tables.load(s, dir, "embeddings")
        val p = pipelineFull
        val (e, toExact) = timed {
          p.exactDedup(p.repetitionFilter(p.gopherFilter(
            p.qualityFilter(d, "text"), "text"), "text"), "doc_id",
            "text").localCheckpoint(true)
        }
        val (nd, nearDup) = timed {
          p.nearDupRemoval(e, "doc_id", "text").localCheckpoint(true)
        }
        val (bal, decontamBalance) = timed {
          p.balance(p.decontaminationFilter(nd, "doc_id", "text",
            d.filter(pmod(col("doc_id"), lit(40)) === 7), "text"),
            "doc_id", "text", "source").localCheckpoint(true)
        }
        val (ds, dsir) = timed {
          p.dsirSelection(bal, "doc_id", "text",
            d.filter(col("lang") === "en")).localCheckpoint(true)
        }
        val (_, semantic) = timed {
          p.semanticFilter(new PrecomputedEmbedder(em, "vec_id",
            "embedding", "doc_id", 64).embed(ds, "text"), "doc_id")
            .count()
        }
        Map("toExact" -> toExact, "nearDup" -> nearDup,
          "decontamBalance" -> decontamBalance, "dsir" -> dsir,
          "semantic" -> semantic)
      }),
      "corpus_pipeline_clean" -> ((s, dir) => {
        def timed[T](f: => T): (T, Double) = {
          val t0 = System.nanoTime()
          val r = f
          (r, (System.nanoTime() - t0) / 1e9)
        }
        val d = QualityQueries.multilineDocs(s, dir)
        val p = pipelineClean
        val (bp, strike) = timed {
          p.boilerplateStage(d, "doc_id", "text").localCheckpoint(true)
        }
        val (_, gates) = timed {
          p.exactDedup(p.qualityFilter(p.c4Filter(bp, "text"), "text"),
            "doc_id", "text").count()
        }
        Map("strike" -> strike, "gates" -> gates)
      }))

  /** DuckDB inlines a plain CTE once PER REFERENCE, and the ledger
    * references the MinHash chain once per stage row below it — the
    * chained-reference blowup turns a sub-second replay into minutes.
    * Marking the heavy, multiply-referenced stage CTEs MATERIALIZED
    * restores evaluate-once semantics (a no-op for correctness). */
  private def materialized(sql: String): String =
    Seq("raw", "q", "g", "r", "e", "nd_d", "nd_g", "nd_bands", "nd",
      "dc", "bal", "ds", "emb", "sm_cells")
      .foldLeft(sql)((s, n) =>
        s.replace("\n" + n + " AS (", "\n" + n + " AS MATERIALIZED ("))

  /** The all-stages oracle derives from the base replay: splice the
    * decontamination + balancing CTEs between neardup and DSIR,
    * retarget DSIR at the balanced set with the tightened budget, and
    * extend the ledger — the two queries stay provably the same recipe
    * wherever they overlap. */
  private def fullOracle(base: String): String = {
    val dcBal =
      """dc_ex AS (
        |  SELECT sg.doc_id, unnest(sg.g) AS g
        |  FROM nd_g sg JOIN nd ON nd.doc_id = sg.doc_id),
        |dc_bd AS (
        |  SELECT string_split_regex(trim(text),'\s+') AS w FROM raw
        |  WHERE doc_id % 40 = 7 AND text IS NOT NULL
        |    AND trim(text) <> ''),
        |dc_bench AS (
        |  SELECT DISTINCT unnest(list_distinct(list_transform(
        |    range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS g
        |  FROM dc_bd),
        |dc_sc AS (
        |  SELECT ex.doc_id,
        |    CAST(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END)
        |      AS DOUBLE) / count(*) AS score
        |  FROM dc_ex ex LEFT JOIN dc_bench b ON ex.g = b.g
        |  GROUP BY ex.doc_id),
        |dc AS (
        |  SELECT nd.* FROM nd LEFT JOIN dc_sc ON dc_sc.doc_id = nd.doc_id
        |  WHERE dc_sc.score IS NULL OR dc_sc.score < 0.5),
        |bal AS (
        |  SELECT doc_id, text, lang, source FROM (
        |    SELECT dc.*, row_number() OVER (PARTITION BY source ORDER BY
        |      round(
        |      (CASE WHEN len(string_split_regex(trim(text),'\s+'))
        |              BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.3 END) * 0.4
        |    + (CASE WHEN CAST(len(regexp_extract_all(text,'[.!?,;:]'))
        |              AS DOUBLE)
        |              / greatest(CAST(len(string_split_regex(trim(text),
        |                  '\s+')) AS DOUBLE), 1.0) <= 0.2
        |            THEN 1.0 ELSE 0.5 END) * 0.3
        |    + (CASE WHEN CAST(len(list_filter(
        |                string_split_regex(lower(trim(text)),'\s+'),
        |                x -> x IN ('the','a','of','and','to','in')))
        |              AS DOUBLE)
        |              / greatest(CAST(len(string_split_regex(trim(text),
        |                  '\s+')) AS DOUBLE), 1.0) BETWEEN 0.01 AND 0.5
        |            THEN 1.0 ELSE 0.6 END) * 0.3, 4) DESC, doc_id)
        |      AS rn
        |    FROM dc)
        |  WHERE rn <= 4),
        |""".stripMargin
    base
      .replace("ds_rawtok AS (", dcBal + "ds_rawtok AS (")
      .replace("FROM nd WHERE text IS NOT NULL AND trim(text) <> ''),",
        "FROM bal WHERE text IS NOT NULL AND trim(text) <> ''),")
      .replace("ds AS (SELECT * FROM nd", "ds AS (SELECT * FROM bal")
      .replace("LIMIT 60", "LIMIT 40")
      .replace(
        """  UNION ALL SELECT CAST(6 AS INT), 'dsir',
          |    CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT) FROM ds
          |  UNION ALL SELECT CAST(7 AS INT), 'semantic',""".stripMargin,
        """  UNION ALL SELECT CAST(6 AS INT), 'decontam',
          |    CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT) FROM dc
          |  UNION ALL SELECT CAST(7 AS INT), 'balance',
          |    CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT) FROM bal
          |  UNION ALL SELECT CAST(8 AS INT), 'dsir',
          |    CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT) FROM ds
          |  UNION ALL SELECT CAST(9 AS INT), 'semantic',""".stripMargin)
  }

  private val baseOracle: String =
      """WITH RECURSIVE
        |raw AS (SELECT doc_id, text, lang, source FROM documents),
        |q AS (
        |  SELECT * FROM raw
        |  WHERE text IS NOT NULL AND text <> ''
        |    AND round(
        |      (CASE WHEN len(string_split_regex(trim(text),'\s+'))
        |              BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.3 END) * 0.4
        |    + (CASE WHEN CAST(len(regexp_extract_all(text,'[.!?,;:]'))
        |              AS DOUBLE)
        |              / greatest(CAST(len(string_split_regex(trim(text),
        |                  '\s+')) AS DOUBLE), 1.0) <= 0.2
        |            THEN 1.0 ELSE 0.5 END) * 0.3
        |    + (CASE WHEN CAST(len(list_filter(
        |                string_split_regex(lower(trim(text)),'\s+'),
        |                x -> x IN ('the','a','of','and','to','in')))
        |              AS DOUBLE)
        |              / greatest(CAST(len(string_split_regex(trim(text),
        |                  '\s+')) AS DOUBLE), 1.0) BETWEEN 0.01 AND 0.5
        |            THEN 1.0 ELSE 0.6 END) * 0.3, 4) >= 0.9),
        |g AS (
        |  SELECT q.* FROM q, LATERAL (
        |    SELECT string_split_regex(trim(q.text),'\s+') AS w,
        |           lower(trim(q.text)) AS lt) x
        |  WHERE len(x.w) BETWEEN 50 AND 100000
        |    AND (list_sum(list_transform(x.w,
        |           t -> CAST(len(t) AS BIGINT)))
        |         / CAST(greatest(len(x.w), 1) AS DOUBLE))
        |        BETWEEN 3.0 AND 10.0
        |    AND (CAST(len(list_filter(x.w,
        |           t -> contains(t, '#') OR contains(t, '...')))
        |          AS DOUBLE) / greatest(len(x.w), 1)) <= 0.1
        |    AND (CAST(len(list_filter(x.w,
        |           t -> regexp_matches(t, '[a-zA-Z]'))) AS DOUBLE)
        |         / greatest(len(x.w), 1)) >= 0.8
        |    AND len(list_filter(string_split_regex(x.lt,'\s+'),
        |          t -> t IN ('the','be','to','of','and','that','have',
        |                     'with'))) >= 2),
        |r AS (
        |  SELECT g.* FROM g
        |  WHERE 1.0 - CAST(len(list_distinct(
        |        string_split_regex(trim(text),'\s+'))) AS DOUBLE)
        |      / len(string_split_regex(trim(text),'\s+')) <= 0.65),
        |e AS (
        |  SELECT * FROM r
        |  QUALIFY row_number() OVER (PARTITION BY text
        |    ORDER BY doc_id) = 1),
        |nd_d AS (
        |  SELECT doc_id, string_split_regex(trim(text),'\s+') AS w
        |  FROM e WHERE text IS NOT NULL AND trim(text) <> ''),
        |nd_sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS s
        |  FROM nd_d),
        |nd_mh AS (
        |  SELECT doc_id, dd.d AS d,
        |    min(md5(CAST(dd.d AS VARCHAR) || ' ' || s)) AS m
        |  FROM nd_sh CROSS JOIN (SELECT unnest(range(0, 16)) AS d) dd
        |  GROUP BY doc_id, dd.d),
        |nd_bands AS (
        |  SELECT doc_id, CAST(d // 4 AS INT) AS band,
        |    md5(string_agg(m, '|' ORDER BY d)) AS bucket
        |  FROM nd_mh GROUP BY doc_id, d // 4),
        |nd_cand AS (
        |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM nd_bands a JOIN nd_bands b
        |    ON a.band = b.band AND a.bucket = b.bucket
        |  WHERE a.doc_id < b.doc_id),
        |nd_g AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(w) - 1, 1)),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
        |  FROM nd_d),
        |nd_losers AS (
        |  SELECT DISTINCT c.b_id FROM nd_cand c
        |  JOIN nd_g ga ON ga.doc_id = c.a_id
        |  JOIN nd_g gb ON gb.doc_id = c.b_id
        |  WHERE CAST(len(list_filter(ga.g, x -> list_contains(gb.g, x)))
        |        AS DOUBLE) /
        |    (len(ga.g) + len(gb.g)
        |      - len(list_filter(ga.g, x -> list_contains(gb.g, x))))
        |    >= 0.5),
        |nd AS (SELECT * FROM e
        |       WHERE doc_id NOT IN (SELECT b_id FROM nd_losers)),
        |ds_rawtok AS (
        |  SELECT doc_id,
        |    CAST('0x' || substr(md5(unnest(
        |      string_split_regex(trim(text),'\s+'))), 1, 3) AS BIGINT)
        |      AS bkt
        |  FROM nd WHERE text IS NOT NULL AND trim(text) <> ''),
        |ds_tgttok AS (
        |  SELECT CAST('0x' || substr(md5(unnest(
        |    string_split_regex(trim(text),'\s+'))), 1, 3) AS BIGINT)
        |    AS bkt
        |  FROM raw
        |  WHERE lang = 'en' AND text IS NOT NULL AND trim(text) <> ''),
        |ds_tgtcnt AS (SELECT bkt, count(*) AS tc FROM ds_tgttok
        |              GROUP BY bkt),
        |ds_rawcnt AS (SELECT bkt, count(*) AS rc FROM ds_rawtok
        |              GROUP BY bkt),
        |ds_tt AS (SELECT CAST(sum(tc) AS DOUBLE) AS t FROM ds_tgtcnt),
        |ds_rt AS (SELECT CAST(sum(rc) AS DOUBLE) AS rtot FROM ds_rawcnt),
        |ds_ratio AS (
        |  SELECT ds_rawcnt.bkt,
        |    ln(coalesce(tc, 0) + 1.0) - ln(t + 4096.0)
        |      - ln(rc + 1.0) + ln(rtot + 4096.0) AS lr
        |  FROM ds_rawcnt LEFT JOIN ds_tgtcnt USING (bkt)
        |  CROSS JOIN ds_tt CROSS JOIN ds_rt),
        |ds_sel AS (
        |  SELECT doc_id FROM (
        |    SELECT doc_id, sum(lr) AS lw
        |    FROM ds_rawtok JOIN ds_ratio USING (bkt) GROUP BY doc_id)
        |  ORDER BY lw DESC, doc_id LIMIT 60),
        |ds AS (SELECT * FROM nd
        |       WHERE doc_id IN (SELECT doc_id FROM ds_sel)),
        |emb AS (
        |  SELECT ds.doc_id, em.embedding FROM ds
        |  LEFT JOIN embeddings em ON em.vec_id = ds.doc_id),
        |sm_corpus AS (
        |  SELECT doc_id AS vec_id, embedding FROM emb
        |  WHERE embedding IS NOT NULL),
        |sm_cents AS (
        |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT)
        |           AS cell,
        |         embedding AS cvec
        |  FROM (SELECT vec_id, embedding FROM sm_corpus
        |        ORDER BY vec_id LIMIT 16)),
        |sm_asg AS (
        |  SELECT c.vec_id, c.embedding, t.cell,
        |    row_number() OVER (PARTITION BY c.vec_id
        |      ORDER BY list_distance(c.embedding, t.cvec), t.cell) AS rn
        |  FROM sm_corpus c CROSS JOIN sm_cents t),
        |sm_cells AS (SELECT vec_id, embedding, cell FROM sm_asg
        |             WHERE rn = 1),
        |sm_pairs AS (
        |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
        |  FROM sm_cells a JOIN sm_cells b
        |    ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.embedding, b.embedding)
        |    >= 0.3),
        |sm_edges AS (
        |  SELECT a_id AS u, b_id AS v FROM sm_pairs
        |  UNION SELECT b_id, a_id FROM sm_pairs),
        |sm_reach AS (
        |  SELECT u AS id, u AS r FROM sm_edges
        |  UNION
        |  SELECT sm_reach.id, e2.v FROM sm_reach JOIN sm_edges e2
        |    ON e2.u = sm_reach.r),
        |sm_comp AS (SELECT id, min(r) AS component FROM sm_reach
        |            GROUP BY id),
        |sm_keep AS (
        |  SELECT c.vec_id AS doc_id FROM sm_cells c
        |  LEFT JOIN sm_comp ON sm_comp.id = c.vec_id
        |  WHERE coalesce(sm_comp.component, c.vec_id) = c.vec_id),
        |fin AS (
        |  SELECT doc_id FROM emb WHERE embedding IS NULL
        |  UNION ALL SELECT doc_id FROM sm_keep)
        |SELECT * FROM (
        |  SELECT CAST(0 AS INT) AS stage_idx, 'input' AS stage,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(doc_id) AS BIGINT) AS id_sum FROM raw
        |  UNION ALL SELECT CAST(1 AS INT), 'quality',
        |    CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT) FROM q
        |  UNION ALL SELECT CAST(2 AS INT), 'gopher',
        |    CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT) FROM g
        |  UNION ALL SELECT CAST(3 AS INT), 'repetition',
        |    CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT) FROM r
        |  UNION ALL SELECT CAST(4 AS INT), 'exact',
        |    CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT) FROM e
        |  UNION ALL SELECT CAST(5 AS INT), 'neardup',
        |    CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT) FROM nd
        |  UNION ALL SELECT CAST(6 AS INT), 'dsir',
        |    CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT) FROM ds
        |  UNION ALL SELECT CAST(7 AS INT), 'semantic',
        |    CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT)
        |  FROM fin)
        |ORDER BY stage_idx""".stripMargin

  /** Cleaning-front replay: the multi-line corpus, the frequent-line
    * strike (text_line_dedup's recipe, full-row), the C4 line rules +
    * doc gates (text_c4_filters' recipe), the quality formula from the
    * base oracle, first-wins exact dedup — ledgered. */
  private val cleanOracle: String =
    s"WITH ${QualityQueries.mdocsCte},\n" +
      """ld_n AS MATERIALIZED (
        |  SELECT doc_id, lang, source, line, pos,
        |         lower(trim(line)) AS key
        |  FROM (SELECT doc_id, lang, source, unnest(arr) AS line,
        |               unnest(range(1, len(arr)+1)) AS pos
        |        FROM (SELECT doc_id, lang, source,
        |                string_split(text, chr(10)) AS arr FROM mdocs))),
        |ld_hot AS (SELECT key FROM ld_n GROUP BY key
        |           HAVING count(DISTINCT doc_id) >= 10),
        |ld AS MATERIALIZED (
        |  SELECT doc_id, lang, source,
        |    coalesce(string_agg(CASE WHEN h.key IS NULL THEN line END,
        |      chr(10) ORDER BY pos), '') AS text
        |  FROM ld_n n LEFT JOIN ld_hot h ON n.key = h.key
        |  GROUP BY doc_id, lang, source),
        |c4p AS (
        |  SELECT doc_id, lang, source, text AS raw0,
        |    list_filter(string_split(text, chr(10)), x ->
        |      regexp_matches(trim(x), '[.!?"]$')
        |      AND len(string_split_regex(trim(x), '\s+')) >= 5
        |      AND NOT contains(lower(x), 'javascript')) AS kept
        |  FROM ld),
        |c4 AS MATERIALIZED (
        |  SELECT doc_id, lang, source,
        |    coalesce(array_to_string(kept, chr(10)), '') AS text
        |  FROM c4p
        |  WHERE len(regexp_extract_all(
        |      coalesce(array_to_string(kept, chr(10)), ''), '[.!?]')) >= 3
        |    AND NOT contains(lower(raw0), 'lorem ipsum')
        |    AND NOT contains(raw0, '{')),
        |q2 AS MATERIALIZED (
        |  SELECT * FROM c4
        |  WHERE text IS NOT NULL AND text <> ''
        |    AND round(
        |      (CASE WHEN len(string_split_regex(trim(text),'\s+'))
        |              BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.3 END) * 0.4
        |    + (CASE WHEN CAST(len(regexp_extract_all(text,'[.!?,;:]'))
        |              AS DOUBLE)
        |              / greatest(CAST(len(string_split_regex(trim(text),
        |                  '\s+')) AS DOUBLE), 1.0) <= 0.2
        |            THEN 1.0 ELSE 0.5 END) * 0.3
        |    + (CASE WHEN CAST(len(list_filter(
        |                string_split_regex(lower(trim(text)),'\s+'),
        |                x -> x IN ('the','a','of','and','to','in')))
        |              AS DOUBLE)
        |              / greatest(CAST(len(string_split_regex(trim(text),
        |                  '\s+')) AS DOUBLE), 1.0) BETWEEN 0.01 AND 0.5
        |            THEN 1.0 ELSE 0.6 END) * 0.3, 4) >= 0.9),
        |e2 AS (
        |  SELECT * FROM q2
        |  QUALIFY row_number() OVER (PARTITION BY text
        |    ORDER BY doc_id) = 1)
        |SELECT * FROM (
        |  SELECT CAST(0 AS INT) AS stage_idx, 'input' AS stage,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(doc_id) AS BIGINT) AS id_sum FROM mdocs
        |  UNION ALL SELECT CAST(1 AS INT), 'linededup',
        |    CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT) FROM ld
        |  UNION ALL SELECT CAST(2 AS INT), 'c4',
        |    CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT) FROM c4
        |  UNION ALL SELECT CAST(3 AS INT), 'quality',
        |    CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT) FROM q2
        |  UNION ALL SELECT CAST(4 AS INT), 'exact',
        |    CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT) FROM e2)
        |ORDER BY stage_idx""".stripMargin

  /** Bloom-front replay: the filter's lit positions from the history
    * slice, a per-doc all-bits-lit verdict (false positives included),
    * then the quality gate and first-wins exact dedup on the admitted
    * rows — the `dedup_bloom_novel` arithmetic feeding the
    * `corpus_pipeline_clean` ledger contract. */
  private val bloomOracle: String =
    """WITH hist AS MATERIALIZED (
      |  SELECT DISTINCT text FROM documents
      |  WHERE doc_id % 3 <> 0 AND text IS NOT NULL AND trim(text) <> ''),
      |js AS (SELECT unnest(range(0, 3)) AS j),
      |pos AS MATERIALIZED (
      |  SELECT DISTINCT
      |    CAST('0x' || substr(md5(h.text || '|' || CAST(js.j AS VARCHAR)),
      |                        1, 15) AS BIGINT) % 1024 AS p
      |  FROM hist h CROSS JOIN js),
      |verd AS (
      |  SELECT d.doc_id,
      |    bool_and(
      |      CAST('0x' || substr(md5(d.text || '|' || CAST(js.j AS VARCHAR)),
      |                          1, 15) AS BIGINT) % 1024
      |        IN (SELECT p FROM pos)) AS member
      |  FROM documents d CROSS JOIN js
      |  WHERE d.text IS NOT NULL
      |  GROUP BY d.doc_id),
      |bl AS MATERIALIZED (
      |  SELECT d.* FROM documents d JOIN verd USING (doc_id)
      |  WHERE NOT member),
      |q AS MATERIALIZED (
      |  SELECT * FROM bl
      |  WHERE text <> '' AND round(
      |    (CASE WHEN len(string_split_regex(trim(text),'\s+'))
      |            BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.3 END) * 0.4
      |  + (CASE WHEN CAST(len(regexp_extract_all(text,'[.!?,;:]'))
      |            AS DOUBLE)
      |            / greatest(CAST(len(string_split_regex(trim(text),
      |                '\s+')) AS DOUBLE), 1.0) <= 0.2
      |          THEN 1.0 ELSE 0.5 END) * 0.3
      |  + (CASE WHEN CAST(len(list_filter(
      |              string_split_regex(lower(trim(text)),'\s+'),
      |              x -> x IN ('the','a','of','and','to','in')))
      |            AS DOUBLE)
      |            / greatest(CAST(len(string_split_regex(trim(text),
      |                '\s+')) AS DOUBLE), 1.0) BETWEEN 0.01 AND 0.5
      |          THEN 1.0 ELSE 0.6 END) * 0.3, 4) >= 0.9),
      |e AS (
      |  SELECT * FROM q
      |  QUALIFY row_number() OVER (PARTITION BY text
      |    ORDER BY doc_id) = 1)
      |SELECT * FROM (
      |  SELECT CAST(0 AS INT) AS stage_idx, 'input' AS stage,
      |    CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(doc_id) AS BIGINT) AS id_sum FROM documents
      |  UNION ALL SELECT CAST(1 AS INT), 'bloom',
      |    CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT) FROM bl
      |  UNION ALL SELECT CAST(2 AS INT), 'quality',
      |    CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT) FROM q
      |  UNION ALL SELECT CAST(3 AS INT), 'exact',
      |    CAST(count(*) AS BIGINT), CAST(sum(doc_id) AS BIGINT) FROM e)
      |ORDER BY stage_idx""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "corpus_pipeline" -> materialized(baseOracle),
    "corpus_pipeline_full" -> materialized(fullOracle(baseOracle)),
    "corpus_pipeline_clean" -> cleanOracle,
    "corpus_pipeline_bloom" -> bloomOracle)
}
