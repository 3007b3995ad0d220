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

  /** Shared bigram cross-entropy scores (one tiny (id, n, score) row
    * per doc) — the CCNet bucketing cells consume them several times
    * (cutoff calibration + assignment + curriculum order), so the
    * scoring pipeline runs once per dir, BuildCache-style; the cold
    * cost stays visible in the independent `lm_bigram_xent` cell. */
  private def cachedXent(s: SparkSession, dir: String) =
    BuildCache.memo(s"xent:$dir") {
      val x = LangModel
        .bigramCrossEntropy(docs(s, dir), "doc_id", "text").persist()
      x.count()
      x
    }

  /** Deterministic MULTI-LINE corpus derived from `documents` (the
    * fixture texts are single-line): tokens re-wrap into 7-word lines,
    * ~2/3 of lines get a terminal period (doc_id+line parity), and
    * boilerplate lines are injected by doc_id residue — a newsletter
    * plea (~1/4 of docs), a javascript warning (~1/5), a license
    * footer (~1/7), placeholder latin (~1/41) and a code fragment
    * (~1/53). Gives the line-oriented operators (C4 cleanup,
    * frequent-line dedup) real teeth; replayed exactly by
    * [[mdocsCte]]. */
  private[queries] def multilineDocs(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .filter(col("text").isNotNull && trim(col("text")) =!= "")
    val w = split(trim(col("text")), "\\s+")
    val nLines = ceil(size(w).cast("double") / 7.0).cast("int")
    val body = transform(sequence(lit(0), nLines - 1), i => {
      val line = concat_ws(" ", slice(w, (i * 7 + 1).cast("int"), lit(7)))
      when(pmod(col("doc_id") + i, lit(3)) =!= 0, concat(line, lit(".")))
        .otherwise(line)
    })
    def inject(m: Int, r: Int, text: String) =
      when(pmod(col("doc_id"), lit(m)) === r, array(lit(text)))
        .otherwise(array().cast("array<string>"))
    d.select(col("doc_id"), col("lang"), col("source"),
      array_join(concat(
        inject(4, 1, "subscribe to our newsletter today."),
        body,
        inject(5, 2, "click here to enable javascript."),
        inject(7, 3, "all rights reserved."),
        inject(41, 3, "lorem ipsum dolor sit amet."),
        inject(53, 5, "function() { return 0; }")), "\n").as("text"))
  }

  /** DuckDB replay of [[multilineDocs]] — identical token wrap,
    * period parity and injections. */
  private[queries] val mdocsCte: String =
    """mdocs AS MATERIALIZED (
      |  SELECT doc_id, lang, source,
      |    array_to_string(
      |      CASE WHEN doc_id % 4 = 1
      |        THEN ['subscribe to our newsletter today.'] ELSE [] END ||
      |      list_transform(range(0, CAST(ceil(len(w) / 7.0) AS INT)),
      |        i -> CASE WHEN (doc_id + i) % 3 <> 0
      |             THEN array_to_string(w[(i*7+1):(i*7+7)], ' ') || '.'
      |             ELSE array_to_string(w[(i*7+1):(i*7+7)], ' ') END) ||
      |      CASE WHEN doc_id % 5 = 2
      |        THEN ['click here to enable javascript.'] ELSE [] END ||
      |      CASE WHEN doc_id % 7 = 3
      |        THEN ['all rights reserved.'] ELSE [] END ||
      |      CASE WHEN doc_id % 41 = 3
      |        THEN ['lorem ipsum dolor sit amet.'] ELSE [] END ||
      |      CASE WHEN doc_id % 53 = 5
      |        THEN ['function() { return 0; }'] ELSE [] END,
      |      chr(10)) AS text
      |  FROM (SELECT doc_id, lang, source,
      |          string_split_regex(trim(text), '\s+') AS w
      |        FROM documents
      |        WHERE text IS NOT NULL AND trim(text) <> ''))""".stripMargin

  // Fixed-point linear classifier fixture + hyperparameters (shared by
  // the Spark queries and the SQL replay): docs with doc_id % 3 = 0
  // carry an appended spam marker and label 1 — the classifier must
  // learn the marker's hashed buckets from gradient descent alone.
  private val LinMarker =
    " click buy click buy click click buy click buy click"
  private val LinDim = 64
  private val LinIters = 16

  /** Deterministic spam-labeled corpus for the linear classifier. */
  private def spamDocs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .filter(col("text").isNotNull && trim(col("text")) =!= "")
      .select(col("doc_id"), col("source"),
        (pmod(col("doc_id"), lit(3)) === 0).cast("long").as("y"),
        concat(col("text"),
          when(pmod(col("doc_id"), lit(3)) === 0, lit(LinMarker))
            .otherwise(lit(""))).as("text"))

  /** The training replay: hashed per-mille features, then `LinIters`
    * exact integer gradient-descent steps as chained materialized
    * CTEs — every arithmetic op (per-mille floor-div, hard-sigmoid
    * clamp, truncating step division) is integer-for-integer the
    * engine's, so the final weights hash-match exactly. */
  private def linearTrainCtes: String = {
    val feat =
      s"""feat AS MATERIALIZED (
         |  SELECT doc_id, source, y,
         |    list_append(list_transform(range(0, $LinDim),
         |      j -> (1000 * len(list_filter(bs, b -> b = j))) // len(bs)),
         |      CAST(250 AS BIGINT)) AS x
         |  FROM (SELECT doc_id, source,
         |          CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS y,
         |          list_transform(w, t ->
         |            CAST('0x' || substr(md5(t),1,2) AS BIGINT) % $LinDim)
         |            AS bs
         |        FROM (SELECT doc_id, source,
         |                string_split_regex(trim(text) ||
         |                  CASE WHEN doc_id % 3 = 0 THEN '$LinMarker'
         |                       ELSE '' END, '\\s+') AS w
         |              FROM documents
         |              WHERE text IS NOT NULL AND trim(text) <> '')))"""
        .stripMargin
    val it0 = s"it0 AS (SELECT list_transform(range(0, ${LinDim + 1}), " +
      "j -> CAST(0 AS BIGINT)) AS w)"
    val iters = (1 to LinIters).map { t =>
      s"""it$t AS MATERIALIZED (
         |  SELECT list_transform(range(1, ${LinDim + 2}),
         |      j -> it.w[j] - (g.g[j] // 10000)) AS w
         |  FROM it${t - 1} it CROSS JOIN (
         |    SELECT list(gj ORDER BY j) AS g FROM (
         |      SELECT j, CAST(sum(c) AS BIGINT) AS gj FROM (
         |        SELECT unnest(list_transform(s.x,
         |                 xi -> (s.p - 1000000*s.y) * xi)) AS c,
         |               unnest(range(1, len(s.x)+1)) AS j
         |        FROM (SELECT f.y, f.x,
         |                least(greatest(500000 +
         |                  (CAST(list_dot_product(f.x, w0.w) AS BIGINT)
         |                    // 1000), 0), 1000000) AS p
         |              FROM feat f CROSS JOIN it${t - 1} w0) s)
         |      GROUP BY j)) g)""".stripMargin
    }
    (Seq(feat, it0) ++ iters).mkString(",\n")
  }

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
    // CCNet perplexity bucketing: head/middle/tail thirds by bigram
    // cross-entropy, cutoffs calibrated on a deterministic md5 half —
    // the oracle replays scoring, sample, both value-rank cutoffs, and
    // every bucket verdict. Bucket assignment itself is a shuffle-free
    // comparison projection (the 100 TB path); only the two bounded
    // TakeOrdered heaps on the sample ever order anything.
    "lm_ppl_buckets" -> ((s, dir) => {
      LangModel.pplBuckets(cachedXent(s, dir), "id", "xent",
          sampleRate = 0.5)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_bigrams").as("sum_bigrams"),
          min("xent").as("min_xent"),
          max("xent").as("max_xent"))
        .orderBy("bucket")
    }),
    // Curriculum ordering (easy→hard): head bucket first, then middle,
    // then tail, epoch-shuffled within each bucket by the md5 fraction
    // — the training-stream order a curriculum schedule feeds the
    // loader. The bounded prefix comes off a TakeOrdered heap (no
    // global sort); the oracle replays priority, shuffle key, and the
    // top-40 cut.
    "train_curriculum" -> ((s, dir) => {
      val b = LangModel.pplBuckets(cachedXent(s, dir), "id", "xent",
        sampleRate = 0.5)
      val pri = when(col("bucket") === "head", 0)
        .when(col("bucket") === "middle", 1).otherwise(2)
      val frac = graft.operators.Sampling.hashFraction(
        concat_ws("|", lit("1"), col("id").cast("string")))
      b.withColumn("pri", pri).withColumn("frac", frac)
        .orderBy(col("pri"), col("frac"), col("id"))
        .limit(40)
        .select(col("id"), col("bucket"))
        .orderBy("id")
    }),
    // Contrastive triplet mining (inverse cloze task): anchor = chunk
    // i, positive = its overlapping successor chunk, negative = the
    // md5-argmin head chunk from a bounded 16-doc pool. One chunk
    // explode + one doc-keyed window + a broadcast constant-pool pick.
    "train_triplets" -> ((s, dir) => {
      graft.operators.Triplets.mine(docs(s, dir), "doc_id", "text",
          size = 30, stride = 15, poolSize = 16)
        .filter(col("anchor_id") < 60)
        .orderBy("anchor_id", "chunk_idx")
    }),
    // HARD-negative triplets (DPR recipe): the pool member whose doc
    // EMBEDDING is most similar to the anchor's (argmax cosine over
    // the bounded pool, anchor excluded) — the confusable non-match,
    // computed once per doc then joined onto its chunk pairs.
    "train_triplets_hard" -> ((s, dir) => {
      graft.operators.Triplets.mineHard(docs(s, dir), "doc_id", "text",
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          size = 30, stride = 15, poolSize = 16)
        .filter(col("anchor_id") < 60)
        .orderBy("anchor_id", "chunk_idx")
    }),
    // KMV distinct sketch over per-language bigram sets: the
    // cardinality sketch whose estimate replays cross-engine to the
    // digit (bottom-64 md5 fractions; n-hat = 63/h_64), next to the
    // exact count it approximates.
    "sketch_kmv_bigrams" -> ((s, dir) => {
      import graft.operators.KmvSketch
      val bg = langBigrams(s, dir)
      val exact = bg.groupBy("grp").agg(count(lit(1)).as("n_exact"))
      KmvSketch.distinctEstimate(bg, "key", "grp", k = 64)
        .join(exact, "grp")
        .select(col("grp").as("lang"), col("n_exact"), col("n_seen"),
          col("kmv_est"))
        .orderBy("lang")
    }),
    // Streaming KMV: the documents replayed as a 3-file journal, each
    // micro-batch's bottom-64 folded into a persisted k-row-per-group
    // sketch (union → distinct → re-rank — bottom-k merge is
    // associative, so the drained state equals the batch sketch
    // EXACTLY and both share one replay). State stays k rows per group
    // forever — the distinct-count stream that never grows.
    "sketch_kmv_stream" -> ((s, dir) => {
      val d = docs(s, dir).select("doc_id", "lang", "text")
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_kmvstr/" +
        dir.replaceAll("[^0-9.]", "")
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      DedupQueries.appendStamped(fs,
        d.filter(pmod(col("doc_id"), lit(3)) === 0), s"$root/journal",
        10000L)
      DedupQueries.appendStamped(fs,
        d.filter(pmod(col("doc_id"), lit(3)) === 1), s"$root/journal",
        20000L)
      DedupQueries.appendStamped(fs,
        d.filter(pmod(col("doc_id"), lit(3)) === 2), s"$root/journal",
        30000L)
      val stream = s.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$root/journal")
      val bg = stream
        .filter(col("text").isNotNull && trim(col("text")) =!= "")
        .select(col("lang").as("grp"),
          split(lower(trim(col("text"))), "\\s+").as("w"))
        .filter(size(col("w")) >= 2)
        .select(col("grp"),
          explode(expr("transform(sequence(1, size(w) - 1), " +
            "i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"))
            .as("key"))
      graft.streaming.SketchStream
        .kmvSync(bg, "key", "grp", k = 64, s"$root/state", s"$root/ckpt")
        .awaitTermination()
      graft.streaming.SketchStream
        .estimates(s.read.parquet(s"$root/state"), k = 64)
        .select(col("grp").as("lang"), col("n_seen"), col("kmv_est"))
        .orderBy("lang")
    }),
    // Corpus-overlap estimation from sketches alone: Jaccard of the
    // en/de bigram sets via the merged bottom-64 (2k rows of work
    // instead of a corpus intersection), against the exact overlap.
    "sketch_kmv_overlap" -> ((s, dir) => {
      import graft.operators.KmvSketch
      val bg = langBigrams(s, dir).filter(col("grp").isin("en", "de"))
      val ex = bg.groupBy("key")
        .agg(max(when(col("grp") === "en", 1).otherwise(0)).as("a"),
          max(when(col("grp") === "de", 1).otherwise(0)).as("b"))
        .agg(sum("a").cast("long").as("n_a_exact"),
          sum("b").cast("long").as("n_b_exact"),
          sum(when(col("a") === 1 && col("b") === 1, 1L).otherwise(0L))
            .as("n_inter_exact"),
          count(lit(1)).cast("long").as("n_union_exact"))
        .withColumn("jaccard_exact",
          round(col("n_inter_exact") / col("n_union_exact"), 4))
      ex.crossJoin(KmvSketch.jaccardEstimate(langBigrams(s, dir),
        "key", "grp", "en", "de", k = 64))
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
    // C4 cleanup (arXiv:1910.10683 §2.2) per-doc detail over the
    // synthetic multi-line corpus: the cleaned text ITSELF is part of
    // the hash compare (line filters + doc gates, string-for-string).
    "text_c4_filters" -> ((s, dir) => {
      multilineDocs(s, dir)
        .withColumn("__c", TextAnalysis.c4Clean(col("text")))
        .filter(col("doc_id") < 60)
        .select(col("doc_id"), col("__c.text").as("clean"),
          col("__c.n_lines"), col("__c.n_kept"), col("__c.n_sentences"),
          col("__c.sent_ok"), col("__c.lorem_ok"), col("__c.brace_ok"),
          col("__c.keep"))
        .orderBy("doc_id")
    }),
    // C4 cleanup kill-rate report per source over the FULL corpus —
    // the filter decision and its telemetry from one shuffle-free
    // projection pass (the gopher_rules shape).
    "text_c4_stats" -> ((s, dir) => {
      multilineDocs(s, dir)
        .withColumn("__c", TextAnalysis.c4Clean(col("text")))
        .groupBy("source")
        .agg(count(lit(1)).as("n"),
          sum(col("__c.keep").cast("long")).as("n_keep"),
          sum(col("__c.n_lines")).as("n_lines"),
          sum(col("__c.n_kept")).as("n_kept"),
          sum(col("__c.lorem_ok").cast("long")).as("n_lorem_ok"),
          sum(col("__c.brace_ok").cast("long")).as("n_brace_ok"))
        .orderBy("source")
    }),
    // RefinedWeb-style frequent-line boilerplate removal: lines in
    // >= 10 distinct docs are struck everywhere; the reassembled text
    // (original line order) is hash-compared. The injected newsletter/
    // javascript/license lines cross the threshold at sf0.01; the rare
    // code fragment (~1/53 of docs) must SURVIVE.
    "text_line_dedup" -> ((s, dir) => {
      Dedup.frequentLineDedup(multilineDocs(s, dir), "doc_id", "text",
          minDocs = 10, carryCols = Seq("source"))
        .filter(col("doc_id") < 60)
        .orderBy("doc_id")
    }),
    // Fixed-point linear quality classifier, TRAINING: 16 full-batch
    // integer gradient-descent steps over md5-hashed per-mille
    // features; the final micro-unit weight vector is hash-compared
    // exactly — the oracle replays every step as a chained CTE.
    "lm_linear_train" -> ((s, dir) => {
      import s.implicits._
      val m = LangModel.linearTrain(spamDocs(s, dir), "text", col("y"),
        dim = LinDim, iters = LinIters)
      m.wMicro.toSeq.zipWithIndex
        .map { case (w, j) => (j.toLong, w) }
        .toDF("j", "w_micro").orderBy("j")
    }),
    // ...and SCORING: the trained model as an array-literal projection
    // over the corpus, per-source prediction/accuracy counts (the
    // GPT-3-style keep/drop quality gate, arXiv:2005.14165 App. A).
    // On this fixture the learned model separates the spam label
    // perfectly — n_correct = n per source.
    "lm_linear_classify" -> ((s, dir) => {
      val d = spamDocs(s, dir)
      val m = LangModel.linearTrain(d, "text", col("y"),
        dim = LinDim, iters = LinIters)
      LangModel.linearScore(m, d, "doc_id", "text",
          carryCols = Seq("source", "y"))
        .groupBy("source")
        .agg(count(lit(1)).as("n"), sum("y").as("n_pos"),
          sum("pred").as("n_pred_pos"),
          sum((col("pred") === col("y")).cast("long")).as("n_correct"))
        .orderBy("source")
    }),
  )

  /** Phase splits for the classifier cells (>3 s at sf0.1): drift
    * triage should see whether featurization or the descent loop
    * moved. */
  val phases: Map[String, (SparkSession, String) => Map[String, Double]] =
    Map(
      // journal setup vs the 3-micro-batch stateful drain vs the final
      // estimate read — a drift should name the phase that moved
      "sketch_kmv_stream" -> ((s, dir) => {
        def timed[T](f: => T): (T, Double) = {
          val t0 = System.nanoTime()
          val r = f
          (r, (System.nanoTime() - t0) / 1e9)
        }
        val d = docs(s, dir).select("doc_id", "lang", "text")
        val root = s"${System.getProperty("java.io.tmpdir")}" +
          s"/graft_kmvstr_ph/${dir.replaceAll("[^0-9.]", "")}"
        val fs = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        val (_, setup) = timed {
          (0 to 2).foreach(i => DedupQueries.appendStamped(fs,
            d.filter(pmod(col("doc_id"), lit(3)) === i),
            s"$root/journal", 10000L * (i + 1)))
        }
        val (_, drain) = timed {
          val stream = s.readStream.schema(d.schema)
            .option("maxFilesPerTrigger", "1").parquet(s"$root/journal")
          val bg = stream
            .filter(col("text").isNotNull && trim(col("text")) =!= "")
            .select(col("lang").as("grp"),
              split(lower(trim(col("text"))), "\\s+").as("w"))
            .filter(size(col("w")) >= 2)
            .select(col("grp"),
              explode(expr("transform(sequence(1, size(w) - 1), " +
                "i -> concat(element_at(w, i), ' ', " +
                "element_at(w, i + 1)))")).as("key"))
          graft.streaming.SketchStream.kmvSync(bg, "key", "grp", 64,
            s"$root/state", s"$root/ckpt").awaitTermination()
        }
        val (_, read) = timed {
          graft.streaming.SketchStream
            .estimates(s.read.parquet(s"$root/state"), 64).count()
        }
        Map("setup" -> setup, "drain" -> drain, "estimate" -> read)
      }),
      "lm_linear_train" -> ((s, dir) => {
        def timed[T](f: => T): (T, Double) = {
          val t0 = System.nanoTime()
          val r = f
          (r, (System.nanoTime() - t0) / 1e9)
        }
        val d = spamDocs(s, dir)
        val (feat, featurize) = timed {
          LangModel.linearFeatureFrame(d, "text", col("y"), LinDim, 250L)
            .localCheckpoint(true)
        }
        val (_, gd) = timed {
          LangModel.linearTrainOnFeatures(feat, LinDim, LinIters, 250L,
            1000L, 10000L)
        }
        feat.unpersist(false)
        Map("featurize" -> featurize, "gd" -> gd)
      }),
      "lm_linear_classify" -> ((s, dir) => {
        def timed[T](f: => T): (T, Double) = {
          val t0 = System.nanoTime()
          val r = f
          (r, (System.nanoTime() - t0) / 1e9)
        }
        val d = spamDocs(s, dir)
        val (m, train) = timed {
          LangModel.linearTrain(d, "text", col("y"), dim = LinDim,
            iters = LinIters)
        }
        val (_, score) = timed {
          LangModel.linearScore(m, d, "doc_id", "text",
              carryCols = Seq("source", "y"))
            .groupBy("source")
            .agg(count(lit(1)).as("n"), sum("pred").as("np")).count()
        }
        Map("train" -> train, "score" -> score)
      }))

  /** Distinct (lang, bigram) pairs — the KMV sketch fixture: same
    * tokenization as the LM queries, adjacent-token pairs, distinct
    * per language. */
  private def langBigrams(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .filter(col("text").isNotNull && trim(col("text")) =!= "")
      .select(col("lang"),
        split(lower(trim(col("text"))), "\\s+").as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("lang").as("grp"),
        explode(expr("transform(sequence(1, size(w) - 1), " +
          "i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"))
          .as("key"))
      .distinct()

  /** Shared replay chain for the CCNet bucketing queries — bigram
    * cross-entropy per doc, the md5-half calibration sample, both
    * value-rank cutoffs, and the bucket verdicts; yields
    * `b(id, n_bigrams, xent, bucket)`. A def, so map literals above or
    * below may reference it without object-init-order hazards. */
  private def xentBucketCte: String =
    """d AS (
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
      |  JOIN c1 ON split_part(bg.b, ' ', 1) = c1.w1),
      |x AS (
      |  SELECT id, count(*) AS n_bigrams, round(avg(nll), 4) AS xent
      |  FROM s GROUP BY id),
      |smp AS (
      |  SELECT xent FROM x
      |  WHERE CAST('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 8)
      |    AS BIGINT) / 4294967296.0 < 0.5),
      |rk AS (
      |  SELECT xent, row_number() OVER (ORDER BY xent) AS rn,
      |    (SELECT count(*) FROM smp) AS n
      |  FROM smp),
      |cut AS (
      |  SELECT
      |    max(CASE WHEN rn = CAST(ceil(n / 3.0) AS BIGINT)
      |        THEN xent END) AS c1,
      |    max(CASE WHEN rn = CAST(ceil(2.0 * n / 3.0) AS BIGINT)
      |        THEN xent END) AS c2
      |  FROM rk),
      |b AS (
      |  SELECT x.id, x.n_bigrams, x.xent,
      |    CASE WHEN x.xent <= cut.c1 THEN 'head'
      |         WHEN x.xent <= cut.c2 THEN 'middle'
      |         ELSE 'tail' END AS bucket
      |  FROM x, cut)""".stripMargin

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
    // Triplet replay: sliding 30/15 chunk windows, lead() positive,
    // md5-ordered 16-doc pool, per-anchor md5-argmin negative.
    "train_triplets" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents
        |  WHERE text IS NOT NULL AND trim(text) <> ''),
        |win AS (
        |  SELECT doc_id, t,
        |    unnest(range(0,
        |      CAST(floor(CAST(len(t) - 1 AS DOUBLE) / 15) AS BIGINT) + 1))
        |      AS chunk_idx
        |  FROM toks),
        |ch AS (
        |  SELECT doc_id, chunk_idx,
        |    array_to_string(list_slice(t,
        |      CAST(chunk_idx * 15 + 1 AS BIGINT),
        |      CAST(least(chunk_idx * 15 + 30, len(t)) AS BIGINT)), ' ')
        |      AS chunk
        |  FROM win),
        |ap AS (
        |  SELECT doc_id AS anchor_id, chunk_idx, chunk AS anchor,
        |    lead(chunk) OVER (PARTITION BY doc_id ORDER BY chunk_idx)
        |      AS positive
        |  FROM ch),
        |ap2 AS (
        |  SELECT * FROM ap WHERE positive IS NOT NULL AND anchor_id < 60),
        |pool AS (
        |  SELECT doc_id AS neg_id, chunk AS negative
        |  FROM ch WHERE chunk_idx = 0
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)), neg_id LIMIT 16),
        |cand AS (
        |  SELECT a.anchor_id, a.chunk_idx, a.anchor, a.positive,
        |    p.neg_id, p.negative,
        |    row_number() OVER (PARTITION BY a.anchor_id, a.chunk_idx
        |      ORDER BY md5(CAST(a.anchor_id AS VARCHAR) || '|' ||
        |        CAST(a.chunk_idx AS VARCHAR) || '|' ||
        |        CAST(p.neg_id AS VARCHAR)), p.neg_id) AS rn
        |  FROM ap2 a JOIN pool p ON a.anchor_id <> p.neg_id)
        |SELECT anchor_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  anchor, positive, neg_id, negative
        |FROM cand WHERE rn = 1
        |ORDER BY anchor_id, chunk_idx""".stripMargin,
    // Hard-negative replay: same windows/pool, embeddings joined in,
    // per-doc argmax by list_cosine_similarity with the id tiebreak.
    "train_triplets_hard" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents
        |  WHERE text IS NOT NULL AND trim(text) <> ''),
        |win AS (
        |  SELECT doc_id, t,
        |    unnest(range(0,
        |      CAST(floor(CAST(len(t) - 1 AS DOUBLE) / 15) AS BIGINT) + 1))
        |      AS chunk_idx
        |  FROM toks),
        |ch AS (
        |  SELECT doc_id, chunk_idx,
        |    array_to_string(list_slice(t,
        |      CAST(chunk_idx * 15 + 1 AS BIGINT),
        |      CAST(least(chunk_idx * 15 + 30, len(t)) AS BIGINT)), ' ')
        |      AS chunk
        |  FROM win),
        |ap AS (
        |  SELECT doc_id AS anchor_id, chunk_idx, chunk AS anchor,
        |    lead(chunk) OVER (PARTITION BY doc_id ORDER BY chunk_idx)
        |      AS positive
        |  FROM ch),
        |ap2 AS (
        |  SELECT * FROM ap WHERE positive IS NOT NULL AND anchor_id < 60),
        |pool AS (
        |  SELECT c.doc_id AS neg_id, c.chunk AS negative,
        |    e.embedding AS neg_emb
        |  FROM ch c JOIN embeddings e ON c.doc_id = e.vec_id
        |  WHERE c.chunk_idx = 0
        |  ORDER BY md5(CAST(c.doc_id AS VARCHAR)), neg_id LIMIT 16),
        |hard AS (
        |  SELECT anchor_id, neg_id, negative,
        |    round(CAST(cos AS DOUBLE), 4) AS cos
        |  FROM (
        |    SELECT a.anchor_id, p.neg_id, p.negative,
        |      list_cosine_similarity(e.embedding, p.neg_emb) AS cos,
        |      row_number() OVER (PARTITION BY a.anchor_id
        |        ORDER BY list_cosine_similarity(e.embedding, p.neg_emb)
        |          DESC, p.neg_id) AS rn
        |    FROM (SELECT DISTINCT anchor_id FROM ap2) a
        |    JOIN embeddings e ON a.anchor_id = e.vec_id
        |    JOIN pool p ON a.anchor_id <> p.neg_id)
        |  WHERE rn = 1)
        |SELECT a.anchor_id, CAST(a.chunk_idx AS BIGINT) AS chunk_idx,
        |  a.anchor, a.positive, h.neg_id, h.negative, h.cos
        |FROM ap2 a JOIN hard h USING (anchor_id)
        |ORDER BY anchor_id, chunk_idx""".stripMargin,
    // KMV replay: distinct per-lang bigrams, md5 fractions, per-lang
    // rank, the (k-1)/h_k estimate next to the exact count.
    "sketch_kmv_bigrams" ->
      """WITH d AS (
        |  SELECT lang, string_split_regex(lower(trim(text)), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
        |bg AS (
        |  SELECT DISTINCT lang, unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS b
        |  FROM d WHERE len(w) >= 2),
        |f AS (
        |  SELECT lang, b,
        |    CAST('0x' || substr(md5(b), 1, 8) AS BIGINT)
        |      / 4294967296.0 AS frac
        |  FROM bg),
        |r AS (
        |  SELECT lang, frac,
        |    row_number() OVER (PARTITION BY lang ORDER BY frac, b) AS rn
        |  FROM f),
        |e AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_seen,
        |    max(CASE WHEN rn = 64 THEN frac END) AS hk
        |  FROM r WHERE rn <= 64 GROUP BY lang),
        |x AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_exact
        |  FROM bg GROUP BY lang)
        |SELECT x.lang, x.n_exact, e.n_seen,
        |  round(CASE WHEN e.n_seen < 64 THEN CAST(e.n_seen AS DOUBLE)
        |        ELSE 63.0 / e.hk END, 4) AS kmv_est
        |FROM x JOIN e USING (lang) ORDER BY lang""".stripMargin,
    // Streaming KMV shares the batch arithmetic: bottom-k merge is
    // associative, so the drained state replays as the global
    // bottom-64 per lang.
    "sketch_kmv_stream" ->
      """WITH d AS (
        |  SELECT lang, string_split_regex(lower(trim(text)), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
        |bg AS (
        |  SELECT DISTINCT lang, unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS b
        |  FROM d WHERE len(w) >= 2),
        |f AS (
        |  SELECT lang, b,
        |    CAST('0x' || substr(md5(b), 1, 8) AS BIGINT)
        |      / 4294967296.0 AS frac
        |  FROM bg),
        |r AS (
        |  SELECT lang, frac,
        |    row_number() OVER (PARTITION BY lang ORDER BY frac, b) AS rn
        |  FROM f)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_seen,
        |  round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
        |        ELSE 63.0 / max(CASE WHEN rn = 64 THEN frac END)
        |        END, 4) AS kmv_est
        |FROM r WHERE rn <= 64 GROUP BY lang ORDER BY lang""".stripMargin,
    // Overlap replay: exact en/de intersection stats plus the merged
    // bottom-64 sketch membership estimate.
    "sketch_kmv_overlap" ->
      """WITH d AS (
        |  SELECT lang, string_split_regex(lower(trim(text)), '\s+') AS w
        |  FROM documents WHERE text IS NOT NULL AND trim(text) <> ''),
        |bg AS (
        |  SELECT DISTINCT lang, unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS b
        |  FROM d WHERE len(w) >= 2 AND lang IN ('en', 'de')),
        |p AS (
        |  SELECT b, max(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS a,
        |         max(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS bb
        |  FROM bg GROUP BY b),
        |ex AS (
        |  SELECT CAST(sum(a) AS BIGINT) AS n_a_exact,
        |    CAST(sum(bb) AS BIGINT) AS n_b_exact,
        |    CAST(sum(CASE WHEN a = 1 AND bb = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_inter_exact,
        |    CAST(count(*) AS BIGINT) AS n_union_exact
        |  FROM p),
        |f AS (
        |  SELECT lang, b,
        |    CAST('0x' || substr(md5(b), 1, 8) AS BIGINT)
        |      / 4294967296.0 AS frac
        |  FROM bg),
        |r AS (
        |  SELECT lang, frac,
        |    row_number() OVER (PARTITION BY lang ORDER BY frac, b) AS rn
        |  FROM f),
        |ska AS (SELECT frac FROM r WHERE lang = 'en' AND rn <= 64),
        |skb AS (SELECT frac FROM r WHERE lang = 'de' AND rn <= 64),
        |u AS (
        |  SELECT DISTINCT frac FROM (
        |    SELECT frac FROM ska UNION ALL SELECT frac FROM skb)),
        |ur AS (
        |  SELECT frac, row_number() OVER (ORDER BY frac) AS rn FROM u),
        |j AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_union_k,
        |    CAST(sum(CASE WHEN ska.frac IS NOT NULL
        |      AND skb.frac IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_both
        |  FROM ur LEFT JOIN ska ON ur.frac = ska.frac
        |          LEFT JOIN skb ON ur.frac = skb.frac
        |  WHERE ur.rn <= 64)
        |SELECT ex.n_a_exact, ex.n_b_exact, ex.n_inter_exact,
        |  ex.n_union_exact,
        |  round(CAST(ex.n_inter_exact AS DOUBLE) / ex.n_union_exact, 4)
        |    AS jaccard_exact,
        |  j.n_union_k, j.n_both,
        |  round(CAST(j.n_both AS DOUBLE) / least(64, j.n_union_k), 4)
        |    AS jaccard_est
        |FROM ex, j""".stripMargin,
    // CCNet bucket replay: same xent pipeline, then the md5-half
    // sample, value-rank cutoffs at ceil(n/3) and ceil(2n/3), and the
    // comparison buckets.
    "lm_ppl_buckets" -> (s"WITH $xentBucketCte\n" +
      """SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_bigrams) AS BIGINT) AS sum_bigrams,
        |  min(xent) AS min_xent, max(xent) AS max_xent
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin),
    // Curriculum replay: bucket priority head<middle<tail, epoch-1 md5
    // shuffle within priority, bounded top-40.
    "train_curriculum" -> (s"WITH $xentBucketCte,\n" +
      """f AS (
        |  SELECT id, bucket,
        |    CASE bucket WHEN 'head' THEN 0 WHEN 'middle' THEN 1
        |      ELSE 2 END AS pri,
        |    CAST('0x' || substr(md5('1|' || CAST(id AS VARCHAR)), 1, 8)
        |      AS BIGINT) / 4294967296.0 AS frac
        |  FROM b),
        |sel AS (SELECT id, bucket FROM f ORDER BY pri, frac, id LIMIT 40)
        |SELECT id, bucket FROM sel ORDER BY id""".stripMargin),
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
    // C4 replay: same line split, line filters as a list_filter
    // lambda, doc gates on retained-text terminal marks + raw-text
    // substrings.
    "text_c4_filters" -> (s"WITH $mdocsCte,\n" +
      """c AS (
        |  SELECT doc_id, text,
        |    string_split(text, chr(10)) AS ls,
        |    list_filter(string_split(text, chr(10)), x ->
        |      regexp_matches(trim(x), '[.!?"]$')
        |      AND len(string_split_regex(trim(x), '\s+')) >= 5
        |      AND NOT contains(lower(x), 'javascript')) AS kept
        |  FROM mdocs),
        |r AS (
        |  SELECT doc_id,
        |    coalesce(array_to_string(kept, chr(10)), '') AS clean,
        |    CAST(len(ls) AS BIGINT) AS n_lines,
        |    CAST(len(kept) AS BIGINT) AS n_kept,
        |    CAST(len(regexp_extract_all(
        |      coalesce(array_to_string(kept, chr(10)), ''), '[.!?]'))
        |      AS BIGINT) AS n_sentences,
        |    NOT contains(lower(text), 'lorem ipsum') AS lorem_ok,
        |    NOT contains(text, '{') AS brace_ok
        |  FROM c)
        |SELECT doc_id, clean, n_lines, n_kept, n_sentences,
        |  n_sentences >= 3 AS sent_ok, lorem_ok, brace_ok,
        |  (n_sentences >= 3) AND lorem_ok AND brace_ok AS keep
        |FROM r WHERE doc_id < 60 ORDER BY doc_id""".stripMargin),
    "text_c4_stats" -> (s"WITH $mdocsCte,\n" +
      """c AS (
        |  SELECT doc_id, source, text,
        |    string_split(text, chr(10)) AS ls,
        |    list_filter(string_split(text, chr(10)), x ->
        |      regexp_matches(trim(x), '[.!?"]$')
        |      AND len(string_split_regex(trim(x), '\s+')) >= 5
        |      AND NOT contains(lower(x), 'javascript')) AS kept
        |  FROM mdocs),
        |r AS (
        |  SELECT doc_id, source, len(ls) AS n_lines, len(kept) AS n_kept,
        |    len(regexp_extract_all(coalesce(
        |      array_to_string(kept, chr(10)), ''), '[.!?]')) >= 3
        |      AS sent_ok,
        |    NOT contains(lower(text), 'lorem ipsum') AS lorem_ok,
        |    NOT contains(text, '{') AS brace_ok
        |  FROM c)
        |SELECT source, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN sent_ok AND lorem_ok AND brace_ok
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
        |  CAST(sum(n_lines) AS BIGINT) AS n_lines,
        |  CAST(sum(n_kept) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN lorem_ok THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_lorem_ok,
        |  CAST(sum(CASE WHEN brace_ok THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_brace_ok
        |FROM r GROUP BY source ORDER BY source""".stripMargin),
    // Frequent-line dedup replay: zipped unnest keeps each line's
    // position, distinct-doc counts pick the hot set, the ordered
    // string_agg reassembles survivors.
    "text_line_dedup" -> (s"WITH $mdocsCte,\n" +
      """ls AS (
        |  SELECT doc_id, source, unnest(arr) AS line,
        |         unnest(range(1, len(arr)+1)) AS pos
        |  FROM (SELECT doc_id, source,
        |          string_split(text, chr(10)) AS arr FROM mdocs)),
        |n AS (SELECT doc_id, source, pos, line,
        |        lower(trim(line)) AS key FROM ls),
        |hot AS (SELECT key FROM n GROUP BY key
        |        HAVING count(DISTINCT doc_id) >= 10),
        |f AS (SELECT n.doc_id, n.source, n.pos, n.line,
        |             h.key IS NOT NULL AS ishot
        |      FROM n LEFT JOIN hot h ON n.key = h.key)
        |SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CASE WHEN ishot THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_removed,
        |  coalesce(string_agg(CASE WHEN NOT ishot THEN line END,
        |    chr(10) ORDER BY pos), '') AS text
        |FROM f WHERE doc_id < 60
        |GROUP BY doc_id, source ORDER BY doc_id""".stripMargin),
    // Exact integer GD replay: the final weight vector, element by
    // element.
    "lm_linear_train" -> (s"WITH $linearTrainCtes\n" +
      s"""SELECT unnest(range(0, ${LinDim + 1})) AS j,
         |  unnest(w) AS w_micro FROM it$LinIters ORDER BY j"""
        .stripMargin),
    // Score the corpus under the replayed final weights; per-source
    // prediction and accuracy counts.
    "lm_linear_classify" -> (s"WITH $linearTrainCtes\n" +
      s"""SELECT source, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(y) AS BIGINT) AS n_pos,
         |  CAST(sum(CASE WHEN p >= 500000 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_pred_pos,
         |  CAST(sum(CASE WHEN (CASE WHEN p >= 500000 THEN 1 ELSE 0 END)
         |    = y THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
         |FROM (SELECT f.source, f.y,
         |        least(greatest(500000 +
         |          (CAST(list_dot_product(f.x, it.w) AS BIGINT) // 1000),
         |          0), 1000000) AS p
         |      FROM feat f CROSS JOIN it$LinIters it) s
         |GROUP BY source ORDER BY source""".stripMargin),
  )
}
