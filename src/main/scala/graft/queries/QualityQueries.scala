package graft.queries

import graft.core.Tables
import graft.operators.{Dedup, LangModel, Packing, TextAnalysis}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data quality signals beyond the basic token/quality stats:
  * Gopher-style repetition fractions, C4-style PII scrubbing, chunk-level
  * corpus dedup, and map-typed token histograms. All oracle-checked.
  *
  * Scale notes: repetition and chunk dedup are explode → groupBy/window
  * shapes (shuffle keys are (doc, gram) / chunk text — at 100 TB the
  * chunk key becomes its hash); scrubbing is a pure projection; the map
  * histogram shuffles once on (source, word) then once on source.
  */
object QualityQueries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Per-language repetition profile: average top-2-gram fraction (how
    // much of the doc the single most frequent bigram occupies) and
    // average duplicate-token fraction. Counting happens relationally
    // (explode → groupBy), never in a nested HOF aggregate.
    "text_repetition" -> ((s, dir) => {
      val toks = docs(s, dir)
        .select(col("doc_id"), col("lang"),
          split(trim(col("text")), "\\s+").as("t"))
        .filter(size(col("t")) >= 2)
      val grams = toks.select(col("doc_id"), col("lang"),
        explode(TextAnalysis.wordNgrams(col("t"), 2)).as("gram"))
      val counts = grams.groupBy("doc_id", "lang", "gram")
        .agg(count(lit(1)).as("c"))
      val perDoc = counts.groupBy("doc_id", "lang")
        .agg((max("c") / sum("c")).as("top2"))
      val dupf = toks.select(col("doc_id"),
        TextAnalysis.dupTokenFraction(col("t")).as("dupf"))
      perDoc.join(dupf, Seq("doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          round(avg("top2"), 4).as("avg_top2"),
          round(avg("dupf"), 4).as("avg_dupf"))
        .orderBy("lang")
    }),
    // Gopher rule-based quality gate (arXiv:2112.11446 App. A) at the
    // published thresholds: per-source doc counts, keeps, and per-rule
    // pass counts — filter decision and kill-rate report from one
    // shuffle-free projection pass.
    "text_gopher_rules" -> ((s, dir) => {
      docs(s, dir)
        .filter(col("text").isNotNull && trim(col("text")) =!= "")
        .withColumn("__g", TextAnalysis.gopherRules(col("text")))
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          sum(col("__g.keep").cast("long")).as("n_keep"),
          sum(col("__g.wc_ok").cast("long")).as("n_wc"),
          sum(col("__g.len_ok").cast("long")).as("n_len"),
          sum(col("__g.stop_ok").cast("long")).as("n_stop"))
        .orderBy("source")
    }),
    // PII scrub: deterministic synthetic contact block appended to each
    // doc, then URL/email redaction + counts. The redacted string itself
    // is part of the oracle compare.
    "text_scrub" -> ((s, dir) => {
      val raw = docs(s, dir)
        .filter(col("doc_id") < 40)
        .select(col("doc_id"),
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com via http://example.com/doc/"), col("doc_id"),
            lit(" thanks")).as("raw"))
      raw.select(col("doc_id"),
          TextAnalysis.emailCount(col("raw")).cast("long").as("n_email"),
          TextAnalysis.urlCount(col("raw")).cast("long").as("n_url"),
          TextAnalysis.redactPii(col("raw")).as("clean"))
        .orderBy("doc_id")
    }),
    // Chunk-level first-wins dedup across the corpus: per source, how
    // many 8-token chunks survive (C4 paragraph dedup at chunk
    // granularity; the synthetic corpus's tiny vocabulary makes chunk
    // collisions real).
    "dedup_chunks" -> ((s, dir) => {
      Dedup.chunkFirstWins(docs(s, dir), "doc_id", "text",
          chunkTokens = 8, carryCols = Seq("source"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_chunks"),
          sum("kept").cast("long").as("n_kept"),
          round(sum("kept").cast("double") / count(lit(1)), 4)
            .as("kept_frac"))
        .orderBy("source")
    }),
    // Map-typed token histogram per source: map_from_entries over the
    // grouped counts, probed with element_at / map_filter /
    // transform_values+map_values — the map-function surface over real
    // aggregation output.
    "q_map_funcs" -> ((s, dir) => {
      val words = docs(s, dir)
        .select(col("source"),
          explode(split(trim(col("text")), "\\s+")).as("w"))
        .filter(col("w") =!= "")
      val counts = words.groupBy("source", "w").agg(count(lit(1)).as("c"))
      counts.groupBy("source")
        .agg(map_from_entries(collect_list(struct(col("w"), col("c"))))
          .as("m"))
        .select(col("source"),
          size(col("m")).cast("long").as("n_words"),
          coalesce(element_at(col("m"), "the"), lit(0L)).as("n_the"),
          size(map_filter(col("m"), (_, v) => v >= 50)).cast("long")
            .as("n_common"),
          array_max(map_values(transform_values(col("m"),
            (_, v) => v * 2L))).as("max2x"))
        .orderBy("source")
    }),
    // GPT-style sequence packing: concat docs per bucket in id order,
    // split the token stream at 128-token boundaries; each doc's
    // placement (first/last sequence + offset) is pure window cumsum.
    "pack_concat" -> ((s, dir) => {
      Packing.concatPack(docs(s, dir), "doc_id", "text",
          capacity = 128, buckets = 8)
        .orderBy("bucket", "id")
    }),
    // No-straddle next-fit packing: sequential fill state per bucket —
    // Spark runs it as a secondary-sort mapPartitions pass, the oracle
    // replays the same recurrence as a recursive CTE.
    "pack_nextfit" -> ((s, dir) => {
      Packing.nextFitPack(docs(s, dir), "doc_id", "text",
          capacity = 128, buckets = 8)
        .orderBy("bucket", "id")
    }),
    // CCNet-style LM quality scoring: corpus-trained bigram model, each
    // doc scored by mean -ln p(w2|w1) — counts and joins only.
    "lm_bigram_xent" -> ((s, dir) => {
      LangModel.bigramCrossEntropy(docs(s, dir), "doc_id", "text")
        .orderBy("id")
    }),
    // Learned-filter tier: multinomial naive Bayes trained on the even
    // half (lang as label, Laplace smoothing), scoring the odd half —
    // the role fastText-style classifiers play in data pipelines, as
    // pure relational ops. Per-class contributions fold in token order
    // (bit-reproducible), so the oracle replays train AND score stage
    // by stage and hash-checks prediction + score + correctness.
    "lm_nb_classify" -> ((s, dir) => {
      val d = docs(s, dir)
      val model = LangModel.naiveBayesTrain(
        d.filter(col("doc_id") % 2 === 0), "text", "lang")
      LangModel.naiveBayesScore(model,
          d.filter(col("doc_id") % 2 === 1), "doc_id", "text")
        .join(d.select("doc_id", "lang"), "doc_id")
        .select(col("doc_id"), col("predicted"),
          round(col("score"), 4).as("score"),
          (col("predicted") === col("lang")).as("correct"))
        .orderBy("doc_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    // Gopher-rule replay: identical tokenization, single-fold list
    // arithmetic for each rule, BIGINT-cast counts.
    "text_gopher_rules" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    string_split_regex(trim(text), '\s+') AS w,
        |    lower(trim(text)) AS lt
        |  FROM documents
        |  WHERE text IS NOT NULL AND trim(text) <> ''),
        |r AS (
        |  SELECT source,
        |    len(w) BETWEEN 50 AND 100000 AS wc_ok,
        |    (list_sum(list_transform(w, x -> CAST(len(x) AS BIGINT)))
        |       / CAST(greatest(len(w), 1) AS DOUBLE))
        |      BETWEEN 3.0 AND 10.0 AS len_ok,
        |    (CAST(len(list_filter(w,
        |        x -> contains(x, '#') OR contains(x, '...'))) AS DOUBLE)
        |       / greatest(len(w), 1)) <= 0.1 AS sym_ok,
        |    (CAST(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
        |        AS DOUBLE) / greatest(len(w), 1)) >= 0.8 AS alpha_ok,
        |    len(list_filter(string_split_regex(lt, '\s+'),
        |      x -> x IN ('the','be','to','of','and','that','have','with')))
        |      >= 2 AS stop_ok
        |  FROM d)
        |SELECT source, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN wc_ok AND len_ok AND sym_ok AND alpha_ok
        |                     AND stop_ok THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_keep,
        |  CAST(sum(CASE WHEN wc_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_wc,
        |  CAST(sum(CASE WHEN len_ok THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_len,
        |  CAST(sum(CASE WHEN stop_ok THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_stop
        |FROM r GROUP BY source ORDER BY source""".stripMargin,
    "text_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents
        |  WHERE len(string_split_regex(trim(text), '\s+')) >= 2),
        |grams AS (
        |  SELECT doc_id, lang,
        |    unnest(list_transform(range(1, len(t)),
        |      i -> t[i] || ' ' || t[i+1])) AS gram
        |  FROM toks),
        |counts AS (
        |  SELECT doc_id, lang, gram, count(*) AS c
        |  FROM grams GROUP BY 1, 2, 3),
        |per_doc AS (
        |  SELECT doc_id, lang, CAST(max(c) AS DOUBLE) / sum(c) AS top2
        |  FROM counts GROUP BY 1, 2),
        |dupf AS (
        |  SELECT doc_id,
        |    1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS dupf
        |  FROM toks)
        |SELECT lang, count(*) AS n_docs,
        |  round(avg(top2), 4) AS avg_top2,
        |  round(avg(dupf), 4) AS avg_dupf
        |FROM per_doc JOIN dupf USING (doc_id)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "text_scrub" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id ||
        |    '@example.com via http://example.com/doc/' || doc_id ||
        |    ' thanks' AS raw
        |  FROM documents WHERE doc_id < 40)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(raw,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_email,
        |  CAST(len(regexp_extract_all(raw, 'https?://[^\s]+')) AS BIGINT)
        |    AS n_url,
        |  regexp_replace(
        |    regexp_replace(raw, 'https?://[^\s]+', '<URL>', 'g'),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g')
        |    AS clean
        |FROM raw ORDER BY doc_id""".stripMargin,
    "dedup_chunks" ->
      """WITH toks AS (
        |  SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
        |sel AS (
        |  SELECT doc_id, source,
        |    unnest(list_transform(
        |      range(0, CAST(ceil(CAST(len(t) AS DOUBLE) / 8) AS BIGINT)),
        |      i -> struct_pack(pos := i,
        |        chunk := array_to_string(
        |          list_slice(t, CAST(i*8+1 AS BIGINT),
        |            CAST(least((i+1)*8, len(t)) AS BIGINT)), ' ')))) AS pc
        |  FROM toks),
        |chunks AS (
        |  SELECT doc_id, source, pc.pos AS pos, pc.chunk AS chunk FROM sel),
        |kept AS (
        |  SELECT source,
        |    CASE WHEN row_number() OVER (
        |      PARTITION BY chunk ORDER BY doc_id, pos) = 1
        |    THEN 1 ELSE 0 END AS k
        |  FROM chunks)
        |SELECT source, count(*) AS n_chunks,
        |  CAST(sum(k) AS BIGINT) AS n_kept,
        |  round(CAST(sum(k) AS DOUBLE) / count(*), 4) AS kept_frac
        |FROM kept GROUP BY source ORDER BY source""".stripMargin,
    "q_map_funcs" ->
      """WITH words AS (
        |  SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS w
        |  FROM documents),
        |counts AS (
        |  SELECT source, w, count(*) AS c
        |  FROM words WHERE w <> '' GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(coalesce(max(CASE WHEN w = 'the' THEN c END), 0) AS BIGINT)
        |    AS n_the,
        |  CAST(sum(CASE WHEN c >= 50 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_common,
        |  CAST(max(c) * 2 AS BIGINT) AS max2x
        |FROM counts GROUP BY source ORDER BY source""".stripMargin,
    "pack_concat" ->
      """WITH d AS (
        |  SELECT CAST(doc_id % 8 AS INT) AS bucket, doc_id AS id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
        |c AS (
        |  SELECT bucket, id, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cum_before
        |  FROM d)
        |SELECT bucket, id, n_tokens,
        |  cum_before // 128 AS seq_first,
        |  (cum_before + n_tokens - 1) // 128 AS seq_last,
        |  cum_before % 128 AS start_offset
        |FROM c ORDER BY bucket, id""".stripMargin,
    "pack_nextfit" ->
      """WITH RECURSIVE d AS (
        |  SELECT CAST(doc_id % 8 AS INT) AS bucket, doc_id AS id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
        |t AS (
        |  SELECT bucket, id, n_tokens,
        |    row_number() OVER (PARTITION BY bucket ORDER BY id) AS rn
        |  FROM d),
        |p AS (
        |  SELECT bucket, id, n_tokens, rn,
        |    CAST(0 AS BIGINT) AS seq, n_tokens AS fill
        |  FROM t WHERE rn = 1
        |  UNION ALL
        |  SELECT t.bucket, t.id, t.n_tokens, t.rn,
        |    CASE WHEN p.fill + t.n_tokens <= 128
        |      THEN p.seq ELSE p.seq + 1 END,
        |    CASE WHEN p.fill + t.n_tokens <= 128
        |      THEN p.fill + t.n_tokens ELSE t.n_tokens END
        |  FROM t JOIN p ON t.bucket = p.bucket AND t.rn = p.rn + 1)
        |SELECT bucket, id, n_tokens, seq FROM p
        |ORDER BY bucket, id""".stripMargin,
    "lm_bigram_xent" ->
      """WITH d AS (
        |  SELECT doc_id AS id,
        |    string_split_regex(lower(trim(text)), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
        |bg AS (
        |  SELECT id, unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS b
        |  FROM d WHERE len(w) >= 2),
        |c2 AS (SELECT b, count(*) AS n2 FROM bg GROUP BY b),
        |c1 AS (
        |  SELECT split_part(b, ' ', 1) AS w1, count(*) AS n1
        |  FROM bg GROUP BY 1),
        |s AS (
        |  SELECT bg.id, ln(CAST(c1.n1 AS DOUBLE) / c2.n2) AS nll
        |  FROM bg JOIN c2 USING (b)
        |  JOIN c1 ON split_part(bg.b, ' ', 1) = c1.w1)
        |SELECT id, count(*) AS n_bigrams, round(avg(nll), 4) AS xent
        |FROM s GROUP BY id ORDER BY id""".stripMargin,
    // Full naive-Bayes replay: class token counts + totals + vocab on
    // the even half, add-one log-likelihoods over vocab x classes,
    // doc priors, token-ordered contribution fold on the odd half,
    // argmax with class-name tie-break.
    "lm_nb_classify" ->
      """WITH train AS (
        |  SELECT lang AS lab,
        |    string_split_regex(lower(trim(text)), '\s+') AS w
        |  FROM documents
        |  WHERE doc_id % 2 = 0 AND text IS NOT NULL AND trim(text) <> ''),
        |ttok AS (
        |  SELECT lab, t FROM (SELECT lab, unnest(w) AS t FROM train)
        |  WHERE t <> ''),
        |ctok AS (SELECT lab, t, count(*) AS c FROM ttok GROUP BY 1, 2),
        |ctot AS (SELECT lab, count(*) AS tot FROM ttok GROUP BY 1),
        |vocab AS (SELECT DISTINCT t FROM ttok),
        |vs AS (SELECT count(*) AS v FROM vocab),
        |prior AS (
        |  SELECT lab, ln(CAST(count(*) AS DOUBLE) /
        |    (SELECT count(*) FROM train)) AS lp
        |  FROM train GROUP BY lab),
        |ll AS (
        |  SELECT vo.t, ct.lab,
        |    ln((coalesce(c.c, 0) + 1.0) / (ct.tot + vs.v)) AS ll
        |  FROM vocab vo CROSS JOIN ctot ct
        |  LEFT JOIN ctok c ON c.t = vo.t AND c.lab = ct.lab
        |  CROSS JOIN vs),
        |test AS (
        |  SELECT doc_id AS id, lang,
        |    string_split_regex(lower(trim(text)), '\s+') AS w
        |  FROM documents
        |  WHERE doc_id % 2 = 1 AND text IS NOT NULL AND trim(text) <> ''),
        |tf AS (
        |  SELECT id, t, count(*) AS tf FROM (
        |    SELECT id, unnest(w) AS t FROM test)
        |  WHERE t <> '' GROUP BY 1, 2),
        |contrib AS (
        |  SELECT tf.id, ll.lab, tf.t, tf.tf * ll.ll AS contrib
        |  FROM tf JOIN ll ON ll.t = tf.t),
        |folded AS (
        |  SELECT id, lab,
        |    list_reduce(list_prepend(0.0, list(contrib ORDER BY t)),
        |      (a, x) -> a + x) AS s
        |  FROM contrib GROUP BY 1, 2),
        |scored AS (
        |  SELECT i.id, p.lab, p.lp + coalesce(f.s, 0.0) AS score
        |  FROM (SELECT DISTINCT id FROM test) i CROSS JOIN prior p
        |  LEFT JOIN folded f ON f.id = i.id AND f.lab = p.lab),
        |pred AS (
        |  SELECT id, lab, score, row_number() OVER (
        |    PARTITION BY id ORDER BY score DESC, lab) AS rn
        |  FROM scored)
        |SELECT p.id AS doc_id, p.lab AS predicted,
        |  round(p.score, 4) AS score, p.lab = t.lang AS correct
        |FROM pred p JOIN (SELECT DISTINCT id, lang FROM test) t
        |  ON t.id = p.id
        |WHERE p.rn = 1 ORDER BY doc_id""".stripMargin,
  )
}
