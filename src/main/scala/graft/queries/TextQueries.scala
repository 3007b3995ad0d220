package graft.queries

import graft.core.Tables
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Text-analysis coverage over the `documents` corpus table: token
  * counting, quality scoring, language-ID heuristic, fingerprinting,
  * string functions. All pure projections/aggregations — shuffle only at
  * the final groupBy. */
object TextQueries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  /** ONE unigram-LM training (word-count pass + driver EM) shared by
    * the train and encode cells. */
  private def sharedUnigramVocab(s: SparkSession,
      dir: String): Seq[(String, Long, Int)] =
    BuildCache.memo(s"unigram:v60:$dir") {
      TextAnalysis.unigramTrain(
        docs(s, dir).filter(col("lang") === "en"), "text",
        vocabSize = 60, seedSize = 120, maxPieceLen = 4,
        maxWordLen = 12, rounds = 2)
    }

  /** ONE trained-langid scored fold shared by the argmax-confusion
    * and margin-gate cells ([[BuildCache]] contract): train on the
    * even half, score the odd half's FULL class surface once — the
    * argmax cell derives its prediction from the same surface the
    * margin cell gates on, exactly like a production scorer that
    * materializes per-class scores once and serves both reads. */
  private def sharedLangidScores(s: SparkSession, dir: String): DataFrame =
    BuildCache.memo(s"text_langid_all:$dir") {
      import graft.operators.LangModel
      val d = docs(s, dir)
      val model = LangModel.langIdTrain(
        d.filter(col("doc_id") % 2 === 0), "text", "lang")
      LangModel.langIdScores(model,
          d.filter(col("doc_id") % 2 === 1), "doc_id", "text")
        .localCheckpoint(true)
    }

  /** Unicode-dirty suffix per doc_id residue — decomposed (e +
    * combining acute, u + diaeresis, A + ring) and precomposed (é)
    * forms plus a non-decomposable ß, so NFC genuinely rewrites and
    * strip_accents genuinely strips. Built from Scala escapes here
    * and `chr()` codes in the oracle — same code points. */
  private def unicodeSuffix = {
    val m = pmod(col("doc_id"), lit(4))
    when(m === 0, lit(" e\u0301clair"))
      .when(m === 1, lit(" caf\u00e9"))
      .when(m === 2, lit(" u\u0308ber stra\u00dfe"))
      .otherwise(lit(" A\u030arhus"))
  }

  /** train-vs-score split for the trained-langid cell (the lm_linear
    * discipline): the model DataFrames are checkpointed between the
    * phases so each side is charged its own cost. */
  val phases: Map[String, (SparkSession, String) => Map[String, Double]] =
    Map(
      "text_langid" -> ((s, dir) => {
        import graft.operators.LangModel
        def timed[T](f: => T): (T, Double) = {
          val t0 = System.nanoTime()
          val r = f
          (r, (System.nanoTime() - t0) / 1e9)
        }
        // the train+scored-fold is the shared once-per-JVM surface
        // (sharedLangidScores); the absorber pays it, the argmax
        // rollup is what the cell's own read costs on top
        val (all, stage) = timed(sharedLangidScores(s, dir))
        val (_, score) = timed {
          LangModel.argmaxScores(all, "doc_id")
            .groupBy("predicted").agg(count(lit(1))).count()
        }
        Map("stage" -> stage, "score" -> score)
      }))

  /** The trained-langid replay CTEs (char-trigram extraction, NB
    * training on the even half, trigram-ordered score fold on the odd
    * half, per-doc class ranking `pred(id, lab, score, rn)`) — shared
    * by the argmax confusion oracle and the margin-gate oracle. */
  private lazy val langidCtes: String =
    """train AS (
      |  SELECT lang AS lab, lower(trim(text)) AS t
      |  FROM documents
      |  WHERE doc_id % 2 = 0 AND text IS NOT NULL AND trim(text) <> ''),
      |ttok AS (
      |  SELECT lab, unnest([substr(t, i, 3)
      |    FOR i IN range(1, len(t) - 1)]) AS g
      |  FROM train),
      |ctok AS (SELECT lab, g, count(*) AS c FROM ttok GROUP BY 1, 2),
      |ctot AS (SELECT lab, count(*) AS tot FROM ttok GROUP BY 1),
      |vocab AS (SELECT DISTINCT g FROM ttok),
      |vs AS (SELECT count(*) AS v FROM vocab),
      |prior AS (
      |  SELECT lab, ln(CAST(count(*) AS DOUBLE) /
      |    (SELECT count(*) FROM train)) AS lp
      |  FROM train GROUP BY lab),
      |ll AS (
      |  SELECT vo.g, ct.lab,
      |    ln((coalesce(c.c, 0) + 1.0) / (ct.tot + vs.v)) AS ll
      |  FROM vocab vo CROSS JOIN ctot ct
      |  LEFT JOIN ctok c ON c.g = vo.g AND c.lab = ct.lab
      |  CROSS JOIN vs),
      |test AS (
      |  SELECT doc_id AS id, lang, lower(trim(text)) AS t
      |  FROM documents
      |  WHERE doc_id % 2 = 1 AND text IS NOT NULL AND trim(text) <> ''),
      |tf AS (
      |  SELECT id, g, count(*) AS tf FROM (
      |    SELECT id, unnest([substr(t, i, 3)
      |      FOR i IN range(1, len(t) - 1)]) AS g
      |    FROM test)
      |  GROUP BY 1, 2),
      |contrib AS (
      |  SELECT tf.id, ll.lab, tf.g, tf.tf * ll.ll AS contrib
      |  FROM tf JOIN ll ON ll.g = tf.g),
      |folded AS (
      |  SELECT id, lab,
      |    list_reduce(list_prepend(0.0, list(contrib ORDER BY g)),
      |      (a, x) -> a + x) AS s
      |  FROM contrib GROUP BY 1, 2),
      |scored AS (
      |  SELECT i.id, p.lab, p.lp + coalesce(f.s, 0.0) AS score
      |  FROM (SELECT DISTINCT id FROM test) i CROSS JOIN prior p
      |  LEFT JOIN folded f ON f.id = i.id AND f.lab = p.lab),
      |pred AS (
      |  SELECT id, lab, score, row_number() OVER (
      |    PARTITION BY id ORDER BY score DESC, lab) AS rn
      |  FROM scored)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Unicode normalization (the cleaning step BEFORE any byte-level
    // dedup — decomposed and precomposed spellings of the same word
    // must hash identically): NFC composition + diacritic strip as
    // codegen'd expressions, hash-checked against DuckDB's own
    // nfc_normalize/strip_accents, char counts included so the
    // composition is visible (n_nfc < n_raw on decomposed docs).
    "text_unicode_normalize" -> ((s, dir) => {
      val d = docs(s, dir)
        .filter(col("text").isNotNull && trim(col("text")) =!= "")
        .select(col("doc_id"), concat(col("text"), unicodeSuffix).as("raw"))
      import graft.functions.TextExpressions
      d.filter(col("doc_id") < 60)
        .select(col("doc_id"),
          length(col("raw")).cast("long").as("n_raw"),
          TextExpressions.nfcNormalize(col("raw")).as("nfc"),
          length(TextExpressions.nfcNormalize(col("raw"))).cast("long")
            .as("n_nfc"),
          TextExpressions.stripAccents(col("raw")).as("stripped"))
        .orderBy("doc_id")
    }),
    // Compressed-blob round trip, hash-checked through downstream
    // work: texts are gzip-compressed into REAL binary blobs
    // (JVM Deflater), decompressed back, and token-counted; the
    // oracle computes the same stats on the raw text, so any
    // compress/decompress corruption breaks the hash. (The corpus is
    // ASCII, so Spark's UTF-16 length == DuckDB's len char count.)
    "text_gzip_blobs" -> ((s, dir) => {
      import graft.operators.Multimodal
      val d = docs(s, dir).filter(col("text").isNotNull)
      val blobs = Multimodal.compressText(d, "doc_id", "text")
      val back = Multimodal.decompressText(blobs, "doc_id")
      back.join(d.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long"))
            .as("sum_tokens"),
          sum(length(col("text")).cast("long")).as("sum_chars"))
        .orderBy("lang")
    }),
    // BPE training, hash-checked round by round: 6 merges learned from
    // the English documents; the oracle unrolls the same 6 rounds in
    // chained CTEs (pair counting via substr over position ranges,
    // argmax with the lexicographic tiebreak, application via
    // replace-to-PUA-char — bit-identical semantics in both engines).
    "text_bpe_train" -> ((s, dir) => {
      val (merges, _) = TextAnalysis.bpeTrain(
        docs(s, dir).filter(col("lang") === "en"), "text", nMerges = 6)
      import s.implicits._
      merges.map { case (r, p, c) => (r.toLong, p, c) }
        .toDF("rank", "pair", "cnt")
        .orderBy("rank")
    }),
    // The fit/transform seam: merges trained on English, applied to
    // EVERY doc through the PRODUCTION apply path (the single
    // BpeEncode expression — QualitySpec proves it identical to the
    // replace chain the oracle unrolls); per-lang encoded lengths
    // prove the application end to end (English compresses most — the
    // point of fitting on it).
    "text_bpe_encode" -> ((s, dir) => {
      val (merges, _) = TextAnalysis.bpeTrain(
        docs(s, dir).filter(col("lang") === "en"), "text", nMerges = 6)
      docs(s, dir)
        .filter(col("text").isNotNull && trim(col("text")) =!= "")
        .select(col("lang"),
          length(TextAnalysis.bpeApplyFast(col("text"), merges))
            .cast("long").as("len_enc"),
          length(trim(col("text"))).cast("long").as("len_raw"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("len_enc").as("sum_enc"), sum("len_raw").as("sum_raw"))
        .orderBy("lang")
    }),
    // Unigram-LM (SentencePiece-family) tokenizer training — the
    // hard-EM deterministic analog: substring-seeded candidate vocab
    // (top 120 + every char) from the English word counts, two
    // Viterbi-EM rounds (segment under current ranks, re-score by
    // usage mass, prune to 60 + chars). The oracle replays the seed
    // pass and BOTH rounds — each word's Viterbi via full composition
    // enumeration ordered (k, rank sum, parts DESC), usage rollup,
    // prune — in pure integer SQL. Output: the top-40 final pieces.
    "text_unigram_train" -> ((s, dir) => {
      val vocab = sharedUnigramVocab(s, dir)
      import s.implicits._
      vocab.filter(_._3 <= 40)
        .map { case (p, c, r) => (r.toLong, p, c) }
        .toDF("rank", "piece", "score")
        .orderBy("rank")
    }),
    // The fit/transform seam for the unigram leg: vocab trained on
    // English, applied to EVERY lang's words through the production
    // UnigramEncode expression (shared Viterbi with training; OOV
    // chars segment at rank |vocab|+1). Per-lang word and piece
    // masses prove the application end to end — English compresses
    // most, matching text_bpe_encode's story. Words are capped at
    // the training maxWordLen so the oracle's composition
    // enumeration stays bounded.
    "text_unigram_encode" -> ((s, dir) => {
      val vocab = sharedUnigramVocab(s, dir)
      docs(s, dir)
        .filter(col("text").isNotNull && trim(col("text")) =!= "")
        .select(col("lang"),
          explode(split(trim(col("text")), "\\s+")).as("w"))
        .filter(length(col("w")).between(1, 12))
        .select(col("lang"),
          size(TextAnalysis.unigramApply(col("w"), vocab))
            .cast("long").as("k"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_words"), sum(col("k")).as("sum_pieces"))
        .orderBy("lang")
    }),
    "text_token_stats" -> ((s, dir) => {
      docs(s, dir)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("sum_tokens"),
          round(avg(TextAnalysis.tokenCount(col("text"))), 4).as("avg_tokens"),
          sum(TextAnalysis.subwordCount(col("text"))).as("sum_subtok"))
        .orderBy("lang")
    }),
    // The dataset "data card": the one-pass per-source profile a
    // corpus release ships — volume, integrity (null/blank share,
    // exact-dup mass via distinct-text count), token mass, language
    // spread, and the quality band. ONE groupBy shuffle; every signal
    // reuses an already-oracled formula.
    "report_data_card" -> ((s, dir) => {
      docs(s, dir).groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("text").isNull || trim(col("text")) === "", 1L)
          .otherwise(0L)).as("n_blank"),
        countDistinct(col("text")).as("n_distinct_text"),
        countDistinct(col("lang")).as("n_langs"),
        sum(when(col("text").isNotNull && trim(col("text")) =!= "",
          TextAnalysis.tokenCount(col("text")).cast("long"))
          .otherwise(0L)).as("sum_tokens"),
        round(avg(TextAnalysis.qualityScore(col("text"))), 4).as("avg_q"))
        .orderBy("source")
    }),
    "text_quality_by_source" -> ((s, dir) => {
      docs(s, dir)
        .withColumn("q", TextAnalysis.qualityScore(col("text")))
        .groupBy("source")
        .agg(round(avg("q"), 4).as("avg_q"),
          round(min("q"), 4).as("min_q"),
          round(max("q"), 4).as("max_q"))
        .orderBy("source")
    }),
    "text_lang_confusion" -> ((s, dir) => {
      docs(s, dir)
        .withColumn("predicted", TextAnalysis.langIdHeuristic(col("text")))
        .groupBy("lang", "predicted")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted")
    }),
    // TRAINED language ID (Cavnar–Trenkle char-n-gram categorization
    // via the NB algebra): char-trigram profiles per language trained
    // on the even half's labels, the odd half classified by argmax of
    // prior + Σ tf·ll, rolled to a per-(lang, predicted) confusion
    // matrix — the multilingual replacement for the stopword en/other
    // heuristic above. The oracle replays trigram extraction, training
    // AND the token-ordered score fold in SQL, so a classifier bug
    // moves matrix cells and breaks the hash. Model stays trigram-
    // vocab × languages (broadcast-bounded at any corpus scale); the
    // trigram explode is the only data-sized stage.
    "text_langid" -> ((s, dir) => {
      import graft.operators.LangModel
      val d = docs(s, dir)
      LangModel.argmaxScores(sharedLangidScores(s, dir), "doc_id")
        .join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "predicted")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted")
    }),
    // Confidence-gated language ID — the production abstain rule on
    // top of the trained classifier: a prediction whose margin (top
    // score minus runner-up, in nats) is under 1 routes to 'und'
    // instead of trusting a coin-flip argmax (the fastText
    // `predict-prob` threshold discipline). Margins integerize to
    // micro-units PER DOC before the group sum, so the rollup is
    // order-free integer math; the oracle replays train, the ordered
    // fold, the top-2 window and the gate.
    "text_langid_margin" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = docs(s, dir)
      val all = sharedLangidScores(s, dir)
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("lab"))
      val per = all.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .groupBy("doc_id")
        .agg(max(when(col("rn") === 1, col("lab"))).as("top"),
          (max(when(col("rn") === 1, col("score"))) -
            max(when(col("rn") === 2, col("score")))).as("margin"))
      per
        .withColumn("predicted",
          when(col("margin") < 1.0, lit("und")).otherwise(col("top")))
        .join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang", "predicted")
        .agg(count(lit(1)).as("n"),
          sum(round(col("margin") * 1000000).cast("long"))
            .as("sum_margin_micro"))
        .orderBy("lang", "predicted")
    }),
    // Per-doc top-3 TF-IDF keywords on a bounded block: smoothed idf
    // (ln((N+1)/(df+1)) + 1), tf·idf score, deterministic term
    // tie-break. The oracle replays tokenize → tf → df → join →
    // window rank; ranking compares the UNROUNDED double on both
    // engines (ln is bit-stable libm on both — the same contract the
    // BM25 oracles rely on), output rounds to 4 dp.
    "text_keywords" -> ((s, dir) => {
      TextAnalysis.topTfidfTerms(
          docs(s, dir).filter(col("doc_id") < 200), "doc_id", "text", 3)
        .select(col("id").as("doc_id"), col("rnk"), col("term"),
          col("score"))
        .orderBy("doc_id", "rnk")
    }),
    "text_fingerprint" -> ((s, dir) => {
      docs(s, dir)
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    }),
    "text_string_funcs" -> ((s, dir) => {
      docs(s, dir)
        .filter(col("doc_id") < 50)
        .select(
          col("doc_id"),
          upper(col("lang")).as("lang_u"),
          substring(col("text"), 1, 12).as("prefix"),
          concat_ws("|", col("lang"), col("source")).as("tag"),
          regexp_replace(col("text"), "\\s+", "_").as("snake"))
        .orderBy("doc_id")
    }),
    // Vocabulary coverage curve: per lang, the smallest
    // frequency-ranked vocabulary covering ≥90% of token mass — the
    // stat behind tokenizer vocab sizing and OOV-rate estimates.
    // One (lang, word) count shuffle + one window per lang.
    "vocab_coverage" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val words = docs(s, dir)
        .select(col("lang"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
        .filter(col("w") =!= "")
      val counts = words.groupBy("lang", "w").agg(count(lit(1)).as("c"))
      val byFreq = Window.partitionBy("lang")
        .orderBy(col("c").desc, col("w").asc)
      val ranked = counts
        .withColumn("r", row_number().over(byFreq))
        .withColumn("cum", sum("c").over(
          byFreq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("total", sum("c").over(Window.partitionBy("lang")))
      ranked.groupBy("lang")
        .agg(count(lit(1)).as("vocab"),
          max("total").as("total_tokens"),
          min(when(col("cum") >= col("total") * 0.9, col("r"))).as("v90"))
        .orderBy("lang")
    }),
  )

  /** Unigram-LM trainer replay shared by both unigram oracles: the
    * English word counts (words ≤ 12 chars), the substring seed pass
    * (top 120 + every char), all compositions with parts ≤ 4 as a
    * recursive CTE, and TWO unrolled hard-EM rounds — per-word
    * Viterbi as full composition enumeration ordered
    * (k, rank sum, parts DESC), usage rollup, prune to 60 + chars —
    * ending at the final ranked vocabulary `r2 (s, c, rank)` plus the
    * shared piece-extraction table `segp`. Pure integer arithmetic
    * throughout (the trained-kmeans replay discipline). Callers must
    * open with WITH RECURSIVE (the `comp` generator). */
  private lazy val unigramCtes: String = {
    def round(i: Int): String = {
      val (prevRank, segs, best, use, v, r) =
        (s"r${i - 1}", s"segs$i", s"best$i", s"use$i", s"v$i", s"r$i")
      s"""$segs AS (
         |  SELECT p.w, p.n, p.parts, p.k, sum(r.rank) AS rsum
         |  FROM segp p JOIN $prevRank r ON r.s = p.piece
         |  GROUP BY p.w, p.n, p.parts, p.k
         |  HAVING count(*) = p.k),
         |$best AS (
         |  SELECT w, n, parts FROM (
         |    SELECT w, n, parts, row_number() OVER (PARTITION BY w
         |      ORDER BY k, rsum, parts DESC) AS rn
         |    FROM $segs) WHERE rn = 1),
         |$use AS (
         |  SELECT p.piece AS s, CAST(sum(b.n) AS BIGINT) AS c
         |  FROM $best b JOIN segp p ON p.w = b.w AND p.parts = b.parts
         |  GROUP BY p.piece),
         |$v AS (
         |  SELECT s, c FROM (
         |    SELECT v${i - 1}.s, coalesce(u.c, 0) AS c,
         |      row_number() OVER (ORDER BY coalesce(u.c, 0) DESC,
         |        v${i - 1}.s) AS rr
         |    FROM v${i - 1} LEFT JOIN $use u USING (s))
         |  WHERE rr <= 60 OR len(s) = 1),
         |$r AS (SELECT s, c,
         |  row_number() OVER (ORDER BY c DESC, s) AS rank FROM $v)"""
        .stripMargin
    }
    s"""w0 AS (
      |  SELECT w, CAST(count(*) AS BIGINT) AS n FROM (
      |    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
      |    FROM documents
      |    WHERE lang = 'en' AND text IS NOT NULL AND trim(text) <> '')
      |  WHERE len(w) BETWEEN 1 AND 12 GROUP BY w),
      |sub AS (
      |  SELECT substr(w, CAST(i.i AS INT), CAST(j.j AS INT)) AS s,
      |    CAST(sum(n) AS BIGINT) AS c
      |  FROM w0
      |  , LATERAL (SELECT unnest(range(1, len(w) + 1)) AS i) i
      |  , LATERAL (SELECT unnest(range(1, 5)) AS j) j
      |  WHERE i.i + j.j - 1 <= len(w)
      |  GROUP BY 1),
      |v0 AS (
      |  SELECT s, c FROM (
      |    SELECT s, c, row_number() OVER (ORDER BY c DESC, s) AS rr
      |    FROM sub)
      |  WHERE rr <= 120 OR len(s) = 1),
      |r0 AS (SELECT s, c,
      |  row_number() OVER (ORDER BY c DESC, s) AS rank FROM v0),
      |comp AS (
      |  SELECT CAST(0 AS BIGINT) AS tot, CAST([] AS INT[]) AS parts
      |  UNION ALL
      |  SELECT c.tot + j.j, list_append(c.parts, j.j)
      |  FROM comp c, (VALUES (1), (2), (3), (4)) j(j)
      |  WHERE c.tot + j.j <= 12),
      |segp AS (
      |  SELECT w0.w, w0.n, c.parts, len(c.parts) AS k, ix.ix,
      |    substr(w0.w,
      |      CAST(1 + coalesce(list_sum(c.parts[1:ix.ix-1]), 0) AS INT),
      |      CAST(c.parts[ix.ix] AS INT)) AS piece
      |  FROM w0
      |  JOIN comp c ON c.tot = len(w0.w)
      |  , LATERAL (SELECT unnest(range(1, len(c.parts) + 1)) AS ix) ix),
      |${round(1)},
      |${round(2)}""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "text_unigram_train" ->
      s"""WITH RECURSIVE $unigramCtes
        |SELECT CAST(rank AS BIGINT) AS rank, s AS piece, c AS score
        |FROM r2 WHERE rank <= 40 ORDER BY rank""".stripMargin,
    // The encode replay: every lang's ≤12-char words, distinct-word
    // Viterbi by composition enumeration under the final vocab with
    // OOV single chars at rank |vocab|+1, then the per-lang word and
    // piece masses.
    "text_unigram_encode" ->
      s"""WITH RECURSIVE $unigramCtes,
        |wa AS (
        |  SELECT lang, w, CAST(count(*) AS BIGINT) AS n FROM (
        |    SELECT lang,
        |      unnest(string_split_regex(trim(text), '\\s+')) AS w
        |    FROM documents
        |    WHERE text IS NOT NULL AND trim(text) <> '')
        |  WHERE len(w) BETWEEN 1 AND 12 GROUP BY lang, w),
        |dw AS (SELECT DISTINCT w FROM wa),
        |vsz AS (SELECT count(*) AS v FROM r2),
        |esegp AS (
        |  SELECT dw.w, c.parts, len(c.parts) AS k, ix.ix,
        |    substr(dw.w,
        |      CAST(1 + coalesce(list_sum(c.parts[1:ix.ix-1]), 0) AS INT),
        |      CAST(c.parts[ix.ix] AS INT)) AS piece
        |  FROM dw
        |  JOIN comp c ON c.tot = len(dw.w)
        |  , LATERAL (SELECT unnest(range(1, len(c.parts) + 1)) AS ix)
        |      ix),
        |esegs AS (
        |  SELECT p.w, p.parts, p.k,
        |    sum(CASE WHEN r.rank IS NOT NULL THEN r.rank
        |        WHEN len(p.piece) = 1 THEN vsz.v + 1 END) AS rsum
        |  FROM esegp p LEFT JOIN r2 r ON r.s = p.piece CROSS JOIN vsz
        |  GROUP BY p.w, p.parts, p.k
        |  HAVING count(CASE WHEN r.rank IS NOT NULL
        |    OR len(p.piece) = 1 THEN 1 END) = p.k),
        |ebest AS (
        |  SELECT w, k FROM (
        |    SELECT w, k, row_number() OVER (PARTITION BY w
        |      ORDER BY k, rsum, parts DESC) AS rn
        |    FROM esegs) WHERE rn = 1)
        |SELECT wa.lang, CAST(sum(wa.n) AS BIGINT) AS n_words,
        |  CAST(sum(wa.n * b.k) AS BIGINT) AS sum_pieces
        |FROM wa JOIN ebest b USING (w)
        |GROUP BY wa.lang ORDER BY wa.lang""".stripMargin,
    // Unicode replay: same suffix code points via chr(), DuckDB's own
    // nfc_normalize/strip_accents against the engine's JDK kernels.
    "text_unicode_normalize" ->
      """WITH d AS (
        |  SELECT doc_id, text || CASE doc_id % 4
        |    WHEN 0 THEN ' e' || chr(769) || 'clair'
        |    WHEN 1 THEN ' caf' || chr(233)
        |    WHEN 2 THEN ' u' || chr(776) || 'ber stra' || chr(223) || 'e'
        |    ELSE ' A' || chr(778) || 'rhus' END AS raw
        |  FROM documents
        |  WHERE text IS NOT NULL AND trim(text) <> '')
        |SELECT doc_id, CAST(length(raw) AS BIGINT) AS n_raw,
        |  nfc_normalize(raw) AS nfc,
        |  CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_nfc,
        |  strip_accents(raw) AS stripped
        |FROM d WHERE doc_id < 60 ORDER BY doc_id""".stripMargin,
    // BPE train replay: 6 unrolled merge rounds as chained CTEs —
    // pair counts via substr over position ranges, argmax with the
    // lexicographic tiebreak, replace-to-PUA-char application.
    "text_bpe_train" ->
      """WITH w0 AS (
        |  SELECT word AS w, CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
        |        FROM documents
        |        WHERE lang = 'en' AND text IS NOT NULL AND trim(text) <> '')
        |  GROUP BY word),
        |p1 AS (SELECT substr(w, CAST(i AS INT), 2) AS pr,
        |              CAST(sum(n) AS BIGINT) AS c
        |       FROM (SELECT w, n, unnest(range(1, len(w))) AS i
        |             FROM w0 WHERE len(w) >= 2)
        |       GROUP BY pr),
        |b1 AS (SELECT pr, c FROM p1 ORDER BY c DESC, pr LIMIT 1),
        |w1 AS (SELECT replace(w, (SELECT pr FROM b1), chr(57345)) AS w, n FROM w0),
        |p2 AS (SELECT substr(w, CAST(i AS INT), 2) AS pr,
        |              CAST(sum(n) AS BIGINT) AS c
        |       FROM (SELECT w, n, unnest(range(1, len(w))) AS i
        |             FROM w1 WHERE len(w) >= 2)
        |       GROUP BY pr),
        |b2 AS (SELECT pr, c FROM p2 ORDER BY c DESC, pr LIMIT 1),
        |w2 AS (SELECT replace(w, (SELECT pr FROM b2), chr(57346)) AS w, n FROM w1),
        |p3 AS (SELECT substr(w, CAST(i AS INT), 2) AS pr,
        |              CAST(sum(n) AS BIGINT) AS c
        |       FROM (SELECT w, n, unnest(range(1, len(w))) AS i
        |             FROM w2 WHERE len(w) >= 2)
        |       GROUP BY pr),
        |b3 AS (SELECT pr, c FROM p3 ORDER BY c DESC, pr LIMIT 1),
        |w3 AS (SELECT replace(w, (SELECT pr FROM b3), chr(57347)) AS w, n FROM w2),
        |p4 AS (SELECT substr(w, CAST(i AS INT), 2) AS pr,
        |              CAST(sum(n) AS BIGINT) AS c
        |       FROM (SELECT w, n, unnest(range(1, len(w))) AS i
        |             FROM w3 WHERE len(w) >= 2)
        |       GROUP BY pr),
        |b4 AS (SELECT pr, c FROM p4 ORDER BY c DESC, pr LIMIT 1),
        |w4 AS (SELECT replace(w, (SELECT pr FROM b4), chr(57348)) AS w, n FROM w3),
        |p5 AS (SELECT substr(w, CAST(i AS INT), 2) AS pr,
        |              CAST(sum(n) AS BIGINT) AS c
        |       FROM (SELECT w, n, unnest(range(1, len(w))) AS i
        |             FROM w4 WHERE len(w) >= 2)
        |       GROUP BY pr),
        |b5 AS (SELECT pr, c FROM p5 ORDER BY c DESC, pr LIMIT 1),
        |w5 AS (SELECT replace(w, (SELECT pr FROM b5), chr(57349)) AS w, n FROM w4),
        |p6 AS (SELECT substr(w, CAST(i AS INT), 2) AS pr,
        |              CAST(sum(n) AS BIGINT) AS c
        |       FROM (SELECT w, n, unnest(range(1, len(w))) AS i
        |             FROM w5 WHERE len(w) >= 2)
        |       GROUP BY pr),
        |b6 AS (SELECT pr, c FROM p6 ORDER BY c DESC, pr LIMIT 1)
        |SELECT CAST(rank AS BIGINT) AS rank, pr AS pair, c AS cnt
        |FROM (SELECT 1 AS rank, pr, c FROM b1 UNION ALL SELECT 2 AS rank, pr, c FROM b2 UNION ALL SELECT 3 AS rank, pr, c FROM b3 UNION ALL SELECT 4 AS rank, pr, c FROM b4 UNION ALL SELECT 5 AS rank, pr, c FROM b5 UNION ALL SELECT 6 AS rank, pr, c FROM b6) ORDER BY rank""".stripMargin,
    // BPE encode replay: the same trained chain applied to every doc
    // as 6 nested replaces; per-lang encoded vs raw lengths.
    "text_bpe_encode" ->
      """WITH w0 AS (
        |  SELECT word AS w, CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
        |        FROM documents
        |        WHERE lang = 'en' AND text IS NOT NULL AND trim(text) <> '')
        |  GROUP BY word),
        |p1 AS (SELECT substr(w, CAST(i AS INT), 2) AS pr,
        |              CAST(sum(n) AS BIGINT) AS c
        |       FROM (SELECT w, n, unnest(range(1, len(w))) AS i
        |             FROM w0 WHERE len(w) >= 2)
        |       GROUP BY pr),
        |b1 AS (SELECT pr, c FROM p1 ORDER BY c DESC, pr LIMIT 1),
        |w1 AS (SELECT replace(w, (SELECT pr FROM b1), chr(57345)) AS w, n FROM w0),
        |p2 AS (SELECT substr(w, CAST(i AS INT), 2) AS pr,
        |              CAST(sum(n) AS BIGINT) AS c
        |       FROM (SELECT w, n, unnest(range(1, len(w))) AS i
        |             FROM w1 WHERE len(w) >= 2)
        |       GROUP BY pr),
        |b2 AS (SELECT pr, c FROM p2 ORDER BY c DESC, pr LIMIT 1),
        |w2 AS (SELECT replace(w, (SELECT pr FROM b2), chr(57346)) AS w, n FROM w1),
        |p3 AS (SELECT substr(w, CAST(i AS INT), 2) AS pr,
        |              CAST(sum(n) AS BIGINT) AS c
        |       FROM (SELECT w, n, unnest(range(1, len(w))) AS i
        |             FROM w2 WHERE len(w) >= 2)
        |       GROUP BY pr),
        |b3 AS (SELECT pr, c FROM p3 ORDER BY c DESC, pr LIMIT 1),
        |w3 AS (SELECT replace(w, (SELECT pr FROM b3), chr(57347)) AS w, n FROM w2),
        |p4 AS (SELECT substr(w, CAST(i AS INT), 2) AS pr,
        |              CAST(sum(n) AS BIGINT) AS c
        |       FROM (SELECT w, n, unnest(range(1, len(w))) AS i
        |             FROM w3 WHERE len(w) >= 2)
        |       GROUP BY pr),
        |b4 AS (SELECT pr, c FROM p4 ORDER BY c DESC, pr LIMIT 1),
        |w4 AS (SELECT replace(w, (SELECT pr FROM b4), chr(57348)) AS w, n FROM w3),
        |p5 AS (SELECT substr(w, CAST(i AS INT), 2) AS pr,
        |              CAST(sum(n) AS BIGINT) AS c
        |       FROM (SELECT w, n, unnest(range(1, len(w))) AS i
        |             FROM w4 WHERE len(w) >= 2)
        |       GROUP BY pr),
        |b5 AS (SELECT pr, c FROM p5 ORDER BY c DESC, pr LIMIT 1),
        |w5 AS (SELECT replace(w, (SELECT pr FROM b5), chr(57349)) AS w, n FROM w4),
        |p6 AS (SELECT substr(w, CAST(i AS INT), 2) AS pr,
        |              CAST(sum(n) AS BIGINT) AS c
        |       FROM (SELECT w, n, unnest(range(1, len(w))) AS i
        |             FROM w5 WHERE len(w) >= 2)
        |       GROUP BY pr),
        |b6 AS (SELECT pr, c FROM p6 ORDER BY c DESC, pr LIMIT 1),
        |d AS (SELECT lang, replace(replace(replace(replace(replace(replace(trim(text), (SELECT pr FROM b1), chr(57345)), (SELECT pr FROM b2), chr(57346)), (SELECT pr FROM b3), chr(57347)), (SELECT pr FROM b4), chr(57348)), (SELECT pr FROM b5), chr(57349)), (SELECT pr FROM b6), chr(57350)) AS et, trim(text) AS rt
        |      FROM documents WHERE text IS NOT NULL AND trim(text) <> '')
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(len(et)) AS BIGINT) AS sum_enc,
        |  CAST(sum(len(rt)) AS BIGINT) AS sum_raw
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,
    // gzip round-trip replay: same stats straight off the raw text —
    // equality proves decompress(compress(text)) == text for every doc
    "text_gzip_blobs" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
        |    AS sum_tokens,
        |  CAST(sum(len(text)) AS BIGINT) AS sum_chars
        |FROM documents WHERE text IS NOT NULL
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "text_token_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
        |    AS sum_tokens,
        |  round(avg(len(string_split_regex(trim(text), '\s+'))), 4)
        |    AS avg_tokens,
        |  CAST(sum(len(regexp_extract_all(text,
        |    '''[a-zA-Z]{1,2}| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+')))
        |    AS BIGINT) AS sum_subtok
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // Data-card replay: the blank predicate, distinct counts, guarded
    // token sum, and the oracled quality formula in one rollup.
    "report_data_card" ->
      """WITH q AS (
        |  SELECT source, text, lang, round(
        |    (CASE WHEN len(string_split_regex(trim(text),'\s+'))
        |            BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.3 END) * 0.4
        |  + (CASE WHEN CAST(len(regexp_extract_all(text,'[.!?,;:]')) AS DOUBLE)
        |            / greatest(CAST(len(string_split_regex(trim(text),'\s+'))
        |                AS DOUBLE), 1.0) <= 0.2
        |          THEN 1.0 ELSE 0.5 END) * 0.3
        |  + (CASE WHEN CAST(len(list_filter(string_split_regex(lower(trim(text)),'\s+'),
        |              x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE)
        |            / greatest(CAST(len(string_split_regex(trim(text),'\s+'))
        |                AS DOUBLE), 1.0) BETWEEN 0.01 AND 0.5
        |          THEN 1.0 ELSE 0.6 END) * 0.3, 4) AS q
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN text IS NULL OR trim(text) = ''
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_blank,
        |  CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_text,
        |  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(sum(CASE WHEN text IS NOT NULL AND trim(text) <> ''
        |    THEN len(string_split_regex(trim(text), '\s+'))
        |    ELSE 0 END) AS BIGINT) AS sum_tokens,
        |  round(avg(q), 4) AS avg_q
        |FROM q GROUP BY source ORDER BY source""".stripMargin,
    "text_quality_by_source" ->
      """WITH scored AS (
        |  SELECT source, round(
        |    (CASE WHEN len(string_split_regex(trim(text),'\s+'))
        |            BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.3 END) * 0.4
        |  + (CASE WHEN CAST(len(regexp_extract_all(text,'[.!?,;:]')) AS DOUBLE)
        |            / greatest(CAST(len(string_split_regex(trim(text),'\s+'))
        |                AS DOUBLE), 1.0) <= 0.2
        |          THEN 1.0 ELSE 0.5 END) * 0.3
        |  + (CASE WHEN CAST(len(list_filter(string_split_regex(lower(trim(text)),'\s+'),
        |              x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE)
        |            / greatest(CAST(len(string_split_regex(trim(text),'\s+'))
        |                AS DOUBLE), 1.0) BETWEEN 0.01 AND 0.5
        |          THEN 1.0 ELSE 0.6 END) * 0.3, 4) AS q
        |  FROM documents)
        |SELECT source, round(avg(q), 4) AS avg_q, round(min(q), 4) AS min_q,
        |       round(max(q), 4) AS max_q
        |FROM scored GROUP BY source ORDER BY source""".stripMargin,
    "text_lang_confusion" ->
      """SELECT lang,
        |  CASE WHEN len(list_filter(string_split_regex(lower(trim(text)),'\s+'),
        |         x -> x IN ('the','a','of','and','to','in'))) >= 3
        |       THEN 'en' ELSE 'other' END AS predicted,
        |  count(*) AS n
        |FROM documents GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin,
    // Full trained-langid replay: char-trigram extraction (interior
    // positions, list comprehension over 1..len-2), per-class counts /
    // totals / vocab on the even half, add-one log-likelihoods, doc
    // priors, trigram-ordered contribution fold on the odd half,
    // argmax with class-name tie-break, confusion rollup.
    "text_langid" ->
      s"""WITH $langidCtes
        |SELECT t.lang, p.lab AS predicted, CAST(count(*) AS BIGINT) AS n
        |FROM pred p
        |JOIN (SELECT DISTINCT id, lang FROM test) t ON t.id = p.id
        |WHERE p.rn = 1
        |GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin,
    // Margin-gate replay: same train/score CTEs, top-2 per doc, the
    // 1-nat abstain threshold routes low-margin docs to 'und';
    // per-doc margins integerize to micro-units BEFORE the group sum
    // (order-free integer math, the crawl_media_route discipline).
    "text_langid_margin" ->
      s"""WITH $langidCtes,
        |m AS (
        |  SELECT id,
        |    max(CASE WHEN rn = 1 THEN lab END) AS top,
        |    max(CASE WHEN rn = 1 THEN score END) -
        |      max(CASE WHEN rn = 2 THEN score END) AS margin
        |  FROM pred WHERE rn <= 2 GROUP BY id),
        |g AS (
        |  SELECT id,
        |    CASE WHEN margin < 1.0 THEN 'und' ELSE top END AS predicted,
        |    margin
        |  FROM m)
        |SELECT t.lang, g.predicted, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(g.margin * 1000000) AS BIGINT)) AS BIGINT)
        |    AS sum_margin_micro
        |FROM g
        |JOIN (SELECT DISTINCT id, lang FROM test) t ON t.id = g.id
        |GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin,
    "text_keywords" ->
      """WITH d AS (
        |  SELECT doc_id, lower(trim(text)) AS t FROM documents
        |  WHERE doc_id < 200 AND text IS NOT NULL AND trim(text) <> ''),
        |tok AS (
        |  SELECT doc_id, unnest(string_split_regex(t, '\s+')) AS term
        |  FROM d),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |       WHERE term <> '' GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n FROM d),
        |sc AS (
        |  SELECT tf.doc_id, tf.term,
        |    tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0) AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n)
        |SELECT doc_id, rnk, term, round(score, 4) AS score FROM (
        |  SELECT doc_id, term, score,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, term) AS BIGINT) AS rnk
        |  FROM sc)
        |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "text_fingerprint" ->
      """SELECT doc_id, list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(substr(text, 1, 64), ''),
        |        c -> CAST(ascii(c) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
        |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin,
    "text_string_funcs" ->
      """SELECT doc_id, upper(lang) AS lang_u, substr(text, 1, 12) AS prefix,
        |  concat_ws('|', lang, source) AS tag,
        |  regexp_replace(text, '\s+', '_', 'g') AS snake
        |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin,
    "vocab_coverage" ->
      """WITH words AS (
        |  SELECT lang,
        |    unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
        |  FROM documents),
        |counts AS (
        |  SELECT lang, w, count(*) AS c
        |  FROM words WHERE w <> '' GROUP BY 1, 2),
        |ranked AS (
        |  SELECT lang, c,
        |    CAST(row_number() OVER
        |      (PARTITION BY lang ORDER BY c DESC, w) AS INT) AS r,
        |    sum(c) OVER (PARTITION BY lang ORDER BY c DESC, w
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(c) OVER (PARTITION BY lang) AS total
        |  FROM counts)
        |SELECT lang, count(*) AS vocab,
        |  CAST(max(total) AS BIGINT) AS total_tokens,
        |  min(CASE WHEN cum >= total * 0.9 THEN r END) AS v90
        |FROM ranked GROUP BY lang ORDER BY lang""".stripMargin,
  )
}
