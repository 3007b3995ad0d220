package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, language-ID heuristic, document
  * fingerprinting. All are pure column expressions (codegen'd,
  * shuffle-free, scale linearly with the corpus) — no UDFs.
  *
  * The reference's corpus is the `(id, text)` table it embeds and indexes
  * (reference src/databricks/syntetic_data.py:55-66); these operators are
  * the preprocessing stage 100 TB corpora need before embedding.
  */
object TextAnalysis {

  /** Whitespace tokenizer. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword segmentation (GPT-2-style pretokenizer, kept
    * lookaround-free so the same pattern runs under java.util.regex and
    * RE2): contraction suffixes, space-prefixed letter runs, digit
    * runs, punctuation runs. Subword counts approximate LLM token
    * budgets far better than whitespace counts on punctuation-heavy or
    * agglutinative text. */
  val subwordPattern: String =
    "'[a-zA-Z]{1,2}| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"

  def subwordCount(c: Column): Column =
    regexp_count(c, lit(subwordPattern))

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in")

  /** Count of stopword tokens (lowercased exact match). */
  def stopwordCount(c: Column, stopwords: Seq[String] = defaultStopwords): Column =
    size(filter(split(lower(trim(c)), "\\s+"),
      t => t.isInCollection(stopwords)))

  /** Count of punctuation characters. */
  def punctCount(c: Column): Column = regexp_count(c, lit("[.!?,;:]"))

  /** Heuristic language ID: stopword-hit ratio over tokens — 'en' when
    * enough English function words appear, else 'other'. The cheap
    * zero-model gate; [[graft.operators.LangModel.langIdTrain]] is the
    * trained char-n-gram classifier that replaces it when per-language
    * labels exist. */
  def langIdHeuristic(c: Column, minHits: Int = 3): Column =
    when(stopwordCount(c) >= minHits, lit("en")).otherwise(lit("other"))

  /** Character 3-grams of the lowercased trimmed text (interior
    * positions only — no padding), as an array column: the language-ID
    * feature set (char n-gram profiles survive unknown vocabulary,
    * Cavnar & Trenkle 1994's n-gram categorization). A pure expression
    * tree — `transform` over a position `sequence` — so extraction
    * fuses into the scan; texts shorter than 3 chars yield an empty
    * array. */
  def charTrigrams(c: Column): Column = {
    val t = lower(trim(c))
    when(length(t) >= 3,
      transform(sequence(lit(1), length(t) - 2), i => t.substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))
  }

  /** Quality score in [0,1]: blend of length band, punctuation ratio and
    * stopword ratio — the usual cheap junk filter before training. */
  def qualityScore(c: Column): Column = {
    val nTok = tokenCount(c).cast("double")
    val lenOk = when(nTok.between(10, 1000), 1.0).otherwise(0.3)
    val punctRatio = punctCount(c).cast("double") / greatest(nTok, lit(1.0))
    val punctOk = when(punctRatio <= 0.2, 1.0).otherwise(0.5)
    val swRatio = stopwordCount(c).cast("double") / greatest(nTok, lit(1.0))
    val swOk = when(swRatio.between(0.01, 0.5), 1.0).otherwise(0.6)
    round((lenOk * 0.4) + (punctOk * 0.3) + (swOk * 0.3), 4)
  }

  /** Gopher rule-based quality gate (Rae et al. 2021,
    * arXiv:2112.11446, Appendix A): the published per-document
    * keep/drop rules as ONE boolean projection — word-count band,
    * mean-word-length band, symbol-to-word ratio, alphabetic-word
    * ratio, and minimum stopword hits. Returns a struct of the five
    * rule booleans plus the conjunction (`keep`), so a pipeline can
    * both filter and report per-rule kill rates from one pass.
    *
    * Scale shape: a pure per-row projection over single-fold HOFs (no
    * nested re-evaluating aggregates) — codegen-friendly,
    * shuffle-free, fuses into the scan it follows at 100 TB. */
  def gopherRules(c: Column,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, minAlphaRatio: Double = 0.8,
      minStopwords: Int = 2,
      stopwords: Seq[String] = gopherStopwords): Column = {
    val toks = tokens(c)
    val n = size(toks).cast("double")
    val wcOk = n.between(minWords, maxWords)
    val meanLen = aggregate(toks, lit(0L),
      (acc, t) => acc + length(t)).cast("double") / greatest(n, lit(1.0))
    val lenOk = meanLen.between(minMeanLen, maxMeanLen)
    val symOk = (size(filter(toks,
      t => t.contains("#") || t.contains("..."))).cast("double") /
      greatest(n, lit(1.0))) <= maxSymbolRatio
    val alphaOk = (size(filter(toks, t => t.rlike("[a-zA-Z]")))
      .cast("double") / greatest(n, lit(1.0))) >= minAlphaRatio
    val stopOk = size(filter(split(lower(trim(c)), "\\s+"),
      t => t.isInCollection(stopwords))) >= minStopwords
    struct(
      wcOk.as("wc_ok"), lenOk.as("len_ok"), symOk.as("sym_ok"),
      alphaOk.as("alpha_ok"), stopOk.as("stop_ok"),
      (wcOk && lenOk && symOk && alphaOk && stopOk).as("keep"))
  }

  /** The Gopher paper's required-stopword list. */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The PUA symbol budget: merge `r` becomes U+E000+r, and U+F8FF
    * ends the BMP private-use area — past it merge symbols would
    * collide with real CJK-compatibility characters. */
  val MaxBpeMerges: Int = 0x18FF

  /** Deterministic BPE merge training (Sennrich et al. 2016,
    * arXiv:1508.07909): learn `nMerges` byte-pair merges from the
    * corpus. Classic formulation — symbols start as characters, each
    * round counts adjacent symbol pairs weighted by word frequency,
    * merges the most frequent pair (ties: lexicographically smallest),
    * and rewrites the vocabulary.
    *
    * The trick that keeps every step engine-portable: each merged pair
    * becomes ONE fresh private-use-area character (U+E000+rank), so
    * pair extraction stays `substring(w, i, 2)` and merge application
    * is plain `replace(w, pair, sym)` — whose left-to-right
    * non-overlapping semantics are exactly BPE's greedy application,
    * and identical in Spark and any SQL engine. PRECONDITION: corpus
    * text must not itself contain U+E000..U+F8FF characters (they
    * would collide with merge symbols and silently corrupt pair
    * counting); `nMerges` is capped at [[MaxBpeMerges]] for the same
    * reason.
    *
    * Scale shape — the production trainer: the corpus-sized work is
    * ONE word-count aggregation, which reduces 100 TB of text to a
    * bounded VOCABULARY (distinct words × frequencies — the same
    * reduction HF/SentencePiece trainers apply). That table is
    * collected once (capped at the `maxVocab` most frequent words, a
    * deterministic `TakeOrderedAndProject` spill guard) and the merge
    * loop runs DRIVER-LOCAL over it with an incrementally-maintained
    * pair index + lazy-deletion heap — O(affected-word length) per
    * merge, no per-round Spark jobs. 30k merges is a driver-side
    * second, not 30k sequential distributed rounds of scheduler
    * latency ([[bpeTrainPerRound]] keeps that shape for the SQL
    * replay). [[bpeApply]] stays fully distributed.
    *
    * Returns the merge table (rank, pair, count) and the final
    * rewritten (capped) vocabulary. */
  def bpeTrain(docs: org.apache.spark.sql.DataFrame, textCol: String,
      nMerges: Int, maxVocab: Int = 1 << 20): (Seq[(Int, String, Long)],
        org.apache.spark.sql.DataFrame) = {
    require(nMerges <= MaxBpeMerges,
      s"nMerges=$nMerges exceeds the U+E000..U+F8FF symbol budget")
    val spark = docs.sparkSession
    import spark.implicits._
    val vocab: Array[(String, Long)] = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc).limit(maxVocab)
      .as[(String, Long)].collect()
    val (merges, words) = bpeMergeLoop(vocab, nMerges)
    (merges, spark.createDataset(words.toSeq).toDF("w", "n"))
  }

  /** The driver-local merge loop behind [[bpeTrain]]: identical
    * semantics to the distributed round loop (overlapping adjacent
    * pairs weighted by word frequency; argmax with lexicographic
    * tie-break; greedy left-to-right `replace` application), maintained
    * incrementally — each merge touches only the words that contain the
    * merged pair, and the argmax pops a lazy-deletion max-heap instead
    * of rescanning all pair counts. */
  private def bpeMergeLoop(vocab: Array[(String, Long)], nMerges: Int)
      : (Seq[(Int, String, Long)], Array[(String, Long)]) = {
    import scala.collection.mutable
    val words = vocab.map(_._1)
    val freqs = vocab.map(_._2)
    // a pair of BMP chars packs into one Long whose numeric order IS
    // the pair string's lexicographic order (unsigned 16-bit units) —
    // so counts, the word index and the heap all avoid per-position
    // substring allocation and String hashing
    @inline def key(a: Char, b: Char): Long = (a.toLong << 16) | b.toLong
    def keyStr(k: Long): String =
      new String(Array(((k >> 16) & 0xffff).toChar, (k & 0xffff).toChar))
    val pairCounts = mutable.LongMap.empty[Long]
    val pairWords = mutable.LongMap.empty[mutable.Set[Int]]
    val dirty = mutable.Set.empty[Long]
    def bump(k: Long, delta: Long): Unit = {
      val c = pairCounts.getOrElse(k, 0L) + delta
      if (c <= 0L) pairCounts.remove(k) else pairCounts.update(k, c)
      dirty += k
    }
    def index(i: Int, add: Boolean): Unit = {
      val w = words(i)
      var j = 0
      while (j < w.length - 1) {
        val k = key(w.charAt(j), w.charAt(j + 1))
        if (add) {
          bump(k, freqs(i))
          pairWords.getOrElseUpdate(k, mutable.Set.empty) += i
        } else {
          bump(k, -freqs(i))
          pairWords.get(k).foreach(_ -= i)
        }
        j += 1
      }
    }
    words.indices.foreach(index(_, add = true))
    // heap of (count, pairKey) snapshots, refreshed ONCE per merge
    // round from the pairs that round touched (not once per position —
    // the difference between millions and billions of pushes); stale
    // snapshots are skipped at pop time. Max = highest count, ties to
    // the lexicographically smallest pair — the distributed tie-break.
    val ord: Ordering[(Long, Long)] = Ordering.by[(Long, Long), Long](_._1)
      .orElse(Ordering.by[(Long, Long), Long](_._2).reverse)
    val heap = mutable.PriorityQueue.empty[(Long, Long)](ord)
    def flushDirty(): Unit = {
      dirty.foreach { k =>
        pairCounts.get(k).foreach(c => heap.enqueue((c, k)))
      }
      dirty.clear()
    }
    flushDirty()
    val merges = Seq.newBuilder[(Int, String, Long)]
    var r = 1
    var done = false
    while (r <= nMerges && !done) {
      // pop stale snapshots until a live (count, pair) surfaces
      var top: (Long, Long) = null
      while (top == null && heap.nonEmpty) {
        val (c, k) = heap.dequeue()
        if (pairCounts.get(k).contains(c)) top = (c, k)
      }
      if (top == null) done = true
      else {
        val (c, k) = top
        val pr = keyStr(k)
        val sym = (0xE000 + r).toChar.toString
        merges += ((r, pr, c))
        val affected = pairWords.getOrElse(k, mutable.Set.empty).toArray
        affected.foreach { i =>
          index(i, add = false)
          words(i) = words(i).replace(pr, sym)
          index(i, add = true)
        }
        flushDirty()
        r += 1
      }
    }
    (merges.result(), words.zip(freqs))
  }

  /** The per-round DISTRIBUTED formulation of [[bpeTrain]] — one
    * pair-count shuffle + driver argmax + vocabulary rewrite per merge.
    * This is the shape the `text_bpe_train` oracle unrolls as chained
    * SQL CTEs, and the equivalence witness for the driver-local loop
    * (TextAnalysisSpec proves both produce identical merges); at real
    * merge counts (30k) its per-round scheduler latency makes it
    * unusable — train with [[bpeTrain]]. */
  def bpeTrainPerRound(docs: org.apache.spark.sql.DataFrame,
      textCol: String, nMerges: Int): (Seq[(Int, String, Long)],
        org.apache.spark.sql.DataFrame) = {
    require(nMerges <= MaxBpeMerges,
      s"nMerges=$nMerges exceeds the U+E000..U+F8FF symbol budget")
    var words = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, Long)]
    var r = 1
    var done = false
    while (r <= nMerges && !done) {
      val best = words.filter(length(col("w")) >= 2)
        .select(col("w"), col("n"),
          explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
        .select(expr("substring(w, i, 2)").as("pr"), col("n"))
        .groupBy("pr").agg(sum("n").as("c"))
        .orderBy(col("c").desc, col("pr").asc).limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val pr = best(0).getString(0)
        val sym = (0xE000 + r).toChar.toString
        merges += ((r, pr, best(0).getLong(1)))
        words = words.select(
            call_function("replace", col("w"), lit(pr), lit(sym)).as("w"),
            col("n"))
          .localCheckpoint(true)
        r += 1
      }
    }
    (merges.result(), words)
  }

  /** Apply trained merges to a text column, rank order, greedy
    * left-to-right (`replace` chain). Pairs never contain whitespace,
    * so applying to the whole text is identical to per-word
    * application — one pure codegen projection, no shuffle. This is
    * the SEMANTICS WITNESS and the SQL-replayable form; as an
    * expression tree it grows one `replace` node per merge, so at
    * production merge counts use [[bpeApplyFast]] (identical output,
    * one expression node regardless of merge count). */
  def bpeApply(c: Column, merges: Seq[(Int, String, Long)]): Column =
    merges.foldLeft(trim(c)) { case (acc, (rank, pr, _)) =>
      call_function("replace", acc, lit(pr),
        lit((0xE000 + rank).toChar.toString))
    }

  /** [[bpeApply]] as ONE expression node — the production apply path:
    * the merge table rides as data and each row encodes with the
    * classic linked-list + heap tokenizer algorithm
    * ([[graft.functions.BpeEncode]]), O(len·log len) per row
    * independent of merge count. QualitySpec proves output identity
    * with the replace chain. */
  def bpeApplyFast(c: Column, merges: Seq[(Int, String, Long)]): Column =
    graft.functions.TextExpressions.bpeEncode(trim(c),
      merges.map { case (r, p, _) => (r, p) })

  /** Unigram-LM (SentencePiece-family) tokenizer trainer — the OTHER
    * public subword family beside [[bpeTrain]] (Kudo 2018): seed a
    * bounded candidate vocabulary from ONE corpus word-count pass
    * (every ≤ maxPieceLen substring, weighted by word frequency, top
    * `seedSize` plus every single character), then iterate the
    * hard-EM rounds — Viterbi-segment each distinct word under the
    * current piece ranks ([[graft.functions.UnigramSeg]] — the shared
    * segmenter), re-score every piece by its usage mass, and prune to
    * the `vocabSize` best (single characters never prune, so every
    * word stays segmentable). The deterministic analog of
    * SentencePiece's EM: log-likelihoods become the pure-integer
    * (piece count, rank sum) order, random init becomes the frequency
    * seed — every round replays in integer SQL (the trained-kmeans
    * discipline), which full-EM forward-backward posteriors never
    * could.
    *
    * Scale shape (the [[bpeTrain]] contract): the corpus-sized work
    * is the ONE word-count shuffle; the EM loop runs driver-local
    * over the bounded distinct-word table (`maxVocab` cap — words
    * longer than `maxWordLen` are excluded from training, the
    * SentencePiece max-sentencepiece-length discipline) at
    * O(words · |w| · maxPieceLen) per round. Returns the final
    * vocabulary as (piece, score = usage mass, rank). */
  def unigramTrain(docs: org.apache.spark.sql.DataFrame, textCol: String,
      vocabSize: Int = 60, seedSize: Int = 120, maxPieceLen: Int = 4,
      maxWordLen: Int = 12, rounds: Int = 2,
      maxVocab: Int = 1 << 20): Seq[(String, Long, Int)] = {
    require(rounds >= 1 && vocabSize >= 1 && seedSize >= vocabSize)
    val spark = docs.sparkSession
    import spark.implicits._
    val words: Array[(String, Long)] = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")).between(1, maxWordLen))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc).limit(maxVocab)
      .as[(String, Long)].collect()
    val seed = scala.collection.mutable.Map.empty[String, Long]
    for {
      (w, n) <- words
      i <- 0 until w.length
      j <- 1 to math.min(maxPieceLen, w.length - i)
    } {
      val s = w.substring(i, i + j)
      seed.update(s, seed.getOrElse(s, 0L) + n)
    }
    // keep = top `top` by (score DESC, piece ASC) plus every single
    // char, order preserved — position+1 IS the replayed row_number
    def topPlusChars(cands: Seq[String],
        score: String => Long, top: Int): Seq[(String, Long)] = {
      val ordered = cands.map(s => (s, score(s)))
        .sortBy { case (s, c) => (-c, s) }
      val keep = ordered.take(top).map(_._1).toSet
      ordered.filter { case (s, _) => keep(s) || s.length == 1 }
    }
    var vocab: Seq[(String, Long)] =
      topPlusChars(seed.keys.toSeq, seed, seedSize)
    for (_ <- 1 to rounds) {
      val ranks = vocab.iterator.zipWithIndex
        .map { case ((s, _), i) => s -> (i + 1) }.toMap
      val usage = scala.collection.mutable.Map.empty[String, Long]
      for ((w, n) <- words)
        graft.functions.UnigramSeg
          .viterbi(w, ranks, ranks.size + 1, maxPieceLen)
          .foreach(p => usage.update(p, usage.getOrElse(p, 0L) + n))
      vocab = topPlusChars(vocab.map(_._1), usage.getOrElse(_, 0L),
        vocabSize)
    }
    vocab.zipWithIndex.map { case ((s, c), i) => (s, c, i + 1) }
  }

  /** The trained unigram vocabulary applied to a WORD column — the
    * [[graft.functions.UnigramEncode]] expression (shared Viterbi,
    * unknown single chars at rank |vocab|+1). Returns the piece
    * array. */
  def unigramApply(c: Column, vocab: Seq[(String, Long, Int)],
      maxPieceLen: Int = 4): Column =
    graft.functions.TextExpressions.unigramEncode(c,
      vocab.map { case (s, _, r) => (s, r) }, maxPieceLen)

  /** Deterministic document fingerprint: polynomial rolling hash of the
    * first `maxLen` characters, mod 1e9+7 (stays in BIGINT range on both
    * Spark and the DuckDB oracle). */
  def fingerprint(c: Column, maxLen: Int = 64): Column =
    aggregate(
      transform(split(substring(c, 1, maxLen), ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, code) => (acc * 31L + code) % 1000000007L)

  // ---- repetition signals (the Gopher-style junk filters: highly
  // repetitive documents are low-value training data) ----

  /** Non-distinct word n-grams over a pre-split token array column.
    * Returns one space-joined gram per window position (unlike
    * WordShingles, which dedups for set semantics). Intended to be
    * exploded and counted relationally — the count lives in a groupBy,
    * never in a nested HOF aggregate (the measured 30x inlining trap). */
  def wordNgrams(tokensCol: Column, n: Int): Column =
    transform(sequence(lit(0L), (size(tokensCol) - n).cast("long")),
      i => concat_ws(" ", slice(tokensCol, (i + 1).cast("int"), lit(n))))

  /** Fraction of tokens that are repeats of an earlier token:
    * 1 - distinct/total over a pre-split token array column. */
  def dupTokenFraction(tokensCol: Column): Column =
    lit(1.0) - size(array_distinct(tokensCol)).cast("double") /
      size(tokensCol).cast("double")

  // ---- PII redaction (C4-style scrubbing before training) ----
  // Patterns are lookaround-free so the same regex runs identically under
  // java.util.regex (Spark) and RE2 (DuckDB oracle).

  val emailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlPattern: String = "https?://[^\\s]+"

  def emailCount(c: Column): Column = regexp_count(c, lit(emailPattern))
  def urlCount(c: Column): Column = regexp_count(c, lit(urlPattern))

  /** Redact URLs then emails (URLs first: a URL never contains an email
    * once replaced, while an email-looking substring inside a URL path
    * must not survive as a half-redacted fragment). */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(c, urlPattern, "<URL>"),
      emailPattern, "<EMAIL>")

  /** Canonical text form for dedup/fingerprinting robustness: lowercase,
    * punctuation → space, whitespace collapsed, trimmed. Exact dedup on
    * the canonical form catches case/punctuation-only near-duplicates at
    * exact-dedup cost (one hash shuffle) — the cheap tier below MinHash.
    * Unicode classes L/N keep the transform language-agnostic, and the
    * pattern is lookaround-free so java.util.regex and RE2 agree. */
  def canonicalText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(c), "[^\\p{L}\\p{N}\\s]", " "),
      "\\s+", " "))

  /** Per-document top-k keywords by TF-IDF — the classic document
    * feature/tagging op (Sparck Jones 1972). Lower-cased whitespace
    * tokens; idf = ln((N+1)/(df+1)) + 1 (smoothed, never negative or
    * division-by-zero); score = tf · idf; deterministic tie-break by
    * term. Shape at scale: one tf groupBy (shuffle on (doc, term)),
    * one df groupBy (shuffle on term — vocabulary-sized, tiny vs the
    * corpus), an equi-join of tf against the df table on term, and
    * one per-doc window for the top-k. Returns
    * `(id, rnk, term, score)`. */
  def topTfidfTerms(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol).as("id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // N as a one-row broadcast (the Hybrid.bm25 stats pattern), not a
    // driver-side count(): keeps the operator one lazy pass — a
    // non-empty text always yields >= 1 token, so distinct ids in tf
    // equal the filtered doc count
    val n = tf.select("id").distinct().agg(count(lit(1)).as("__n"))
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("score", col("tf") *
        (log((col("__n") + 1.0) / (col("df") + lit(1.0))) + lit(1.0)))
    val w = Window.partitionBy("id")
      .orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("id"), col("rnk"), col("term"),
        round(col("score"), 4).as("score"))
  }

  /** Sliding-window chunking — RAG ingestion's shape (overlapping
    * windows keep sentence context across chunk boundaries, unlike
    * Dedup.chunkFirstWins's disjoint C4 chunks). Windows start every
    * `stride` tokens while any token remains: starts 0, stride, …,
    * the last window may be short. One explode, no shuffle; one row
    * per chunk `(id, <carry…>, chunk_idx, chunk, n_tokens)`. */
  def chunkSliding(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, size: Int, stride: Int,
      carryCols: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    require(size >= 1 && stride >= 1, s"size=$size stride=$stride")
    val toks = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol).as("id") +: carryCols.map(col) :+
        split(trim(col(textCol)), "\\s+").as("__t"): _*)
    // number of windows = ceil(n / stride) except windows that would
    // start past the end: floor((n - 1) / stride) + 1
    val nWin = (floor((org.apache.spark.sql.functions.size(col("__t")) -
      lit(1)).cast("double") / stride) + lit(1)).cast("long")
    toks.select(col("id") +: carryCols.map(col) :+
      posexplode(transform(sequence(lit(0L), nWin - 1), i =>
        slice(col("__t"), (i * stride + 1).cast("int"), lit(size))))
        .as(Seq("chunk_idx", "__w")): _*)
      .withColumn("chunk", concat_ws(" ", col("__w")))
      .withColumn("n_tokens",
        org.apache.spark.sql.functions.size(col("__w")).cast("long"))
      .drop("__w")
  }

  // ---- C4 line/document cleaning (Raffel et al. 2020,
  // arXiv:1910.10683 §2.2 — the published web-corpus cleanup every
  // large pretraining set runs before the heavier dedup stages) ----

  /** The C4 cleanup as ONE projection. Line rules (applied per
    * `\n`-separated line, all three must hold to retain the line):
    * ends in terminal punctuation (`.` `!` `?` `"`), has at least
    * `minLineWords` words (the paper uses 5), and does not mention
    * "javascript" (case-insensitive — the paper's warning-boilerplate
    * rule). Document rules (the paper evaluates these on the raw
    * page): at least `minSentences` sentences — counted here as
    * terminal marks in the RETAINED text, the paper's "at least 3
    * sentences" gate — no "lorem ipsum" placeholder text, and no `{`
    * (curly braces mean code, which C4 drops wholesale).
    *
    * Returns a struct `(text, n_lines, n_kept, n_sentences, sent_ok,
    * lorem_ok, brace_ok, keep)`: the cleaned text (retained lines
    * re-joined with `\n`) plus the per-rule booleans, so one pass both
    * filters and reports kill rates (the [[gopherRules]] shape).
    *
    * Scale shape: a pure per-row projection over single-pass HOFs —
    * codegen-friendly, shuffle-free, fuses into the scan at 100 TB.
    * The C4 stage that DOES need a shuffle (three-sentence-span dedup
    * across pages) is [[Dedup.chunkFirstWins]] /
    * [[Dedup.frequentLineDedup]]. */
  def c4Clean(c: Column, minLineWords: Int = 5,
      minSentences: Int = 3): Column = {
    val lines = split(c, "\n")
    val kept = filter(lines, l =>
      trim(l).rlike("[.!?\"]$") &&
        size(split(trim(l), "\\s+")) >= minLineWords &&
        !lower(l).contains("javascript"))
    val cleaned = array_join(kept, "\n")
    val nSent = regexp_count(cleaned, lit("[.!?]")).cast("long")
    val sentOk = nSent >= minSentences
    val loremOk = !lower(c).contains("lorem ipsum")
    val braceOk = !c.contains("{")
    struct(
      cleaned.as("text"),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      nSent.as("n_sentences"),
      sentOk.as("sent_ok"), loremOk.as("lorem_ok"),
      braceOk.as("brace_ok"),
      (sentOk && loremOk && braceOk).as("keep"))
  }
}
