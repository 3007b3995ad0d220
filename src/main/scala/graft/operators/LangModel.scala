package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language model scoring — the relational form of
  * CCNet-style perplexity filtering: train a cheap LM on the corpus, score
  * every document by its cross-entropy under that LM, and gate training
  * data on the score (fluent text scores low, boilerplate/garbage high).
  * A KenLM slots into the same operator shape; the engine contribution is
  * the distributed plan, not the model.
  *
  * Everything is counts and joins — no driver state, no UDF:
  *
  *   bigrams   = explode adjacent lowercase token pairs        (1 scan)
  *   model     = count(bigram) and count(context word)         (2 aggs)
  *   score     = per-doc mean of -ln p(w2|w1), p = n2/n1       (2 joins)
  *
  * At 100 TB the model tables are themselves large; both joins are plain
  * shuffle equi-joins on the bigram/context key, and the exploded bigram
  * projection is materialized once (it feeds both aggregations and the
  * scoring join). MLE probabilities need no smoothing here because every
  * scored bigram is, by construction, in the training counts.
  */
object LangModel {

  /** Per-document bigram cross-entropy in nats:
    * (id, n_bigrams, xent) — xent = mean over the document's bigrams of
    * -ln(count(bigram)/count(first word as context)), rounded to 4 dp.
    * Documents with fewer than two tokens have no bigrams and are
    * excluded (score undefined). */
  def bigramCrossEntropy(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val words = split(lower(trim(col(textCol))), "\\s+")
    val base = docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol).as("id"), words.as("w"))
      .filter(size(col("w")) >= 2)
    val bg = base.select(col("id"), explode(
        transform(sequence(lit(1), size(col("w")) - 1), i =>
          concat(element_at(col("w"), i), lit(" "),
            element_at(col("w"), i + 1)))).as("b"))
      .withColumn("w1", substring_index(col("b"), " ", 1))
      .localCheckpoint(true) // feeds c2, c1 AND the scoring join
    val c2 = bg.groupBy("b").agg(count(lit(1)).as("n2"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("n1"))
    bg.join(c2, "b").join(c1, "w1")
      .withColumn("nll", log(col("n1").cast("double") / col("n2")))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg("nll"), 4).as("xent"))
  }

  /** A trained [[naiveBayesTrain]] classifier: `priors` is
    * `(__lab, __logprior)` (one row per class), `loglik` is
    * `(__t, __lab, __ll)` over vocab × classes (Laplace-smoothed —
    * a vocab token absent from a class still has a finite
    * log-likelihood). Both are plain DataFrames: persist them as
    * parquet and the model round-trips like any layout — the two
    * tables ARE the whole model (scoring re-derives the class list
    * from `priors`, a model-arity collect). */
  final case class NbModel(priors: DataFrame, loglik: DataFrame)

  /** Multinomial naive Bayes text classifier — the LEARNED filter tier
    * of a training-data pipeline (the role fastText-style quality /
    * language / domain classifiers play in CCNet-descendant pipelines),
    * re-expressed as pure relational ops so training and scoring are
    * deterministic on any engine and partitioning.
    *
    * Train: per-class token counts with add-one smoothing over the
    * training vocabulary V —
    * `ll(t, c) = ln((count(t, c) + 1) / (tokens(c) + |V|))`,
    * `prior(c) = ln(docs(c) / docs)`. Everything is counts and joins:
    * one tokenize explode, two aggregations, and a vocab × classes
    * left join (classes broadcast — the only fan-out is vocab-sized,
    * exactly the model's size). No iteration, no driver state: at
    * 100 TB training is ~2 shuffles of token-count rows. */
  def naiveBayesTrain(docs: DataFrame, textCol: String,
      labelCol: String): NbModel =
    nbTrain(docs, textCol, labelCol, wordTokens)

  /** Char-trigram language identification, trained — the fastText/CLD
    * discipline as pure relational ops: the multinomial-NB algebra of
    * [[naiveBayesTrain]] with the feature extractor swapped from
    * whitespace words to character 3-grams (the language signal that
    * survives unknown vocabulary — what a stopword heuristic cannot
    * see). Model size is trigram-vocab × languages: broadcast-bounded
    * at any corpus scale. */
  def langIdTrain(docs: DataFrame, textCol: String,
      labelCol: String): NbModel =
    nbTrain(docs, textCol, labelCol, TextAnalysis.charTrigrams)

  /** Classify under a [[langIdTrain]] model: `(id, predicted, score)`
    * — [[naiveBayesScore]]'s fold over char-trigram features. */
  def langIdScore(model: NbModel, docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    nbScore(model, docs, idCol, textCol, TextAnalysis.charTrigrams)

  /** Whitespace word features (array form of the tokenize explode the
    * word-NB paths always used — explode∘filter ≡ filter∘explode). */
  private def wordTokens(c: Column): Column =
    filter(split(lower(trim(c)), "\\s+"), t => t =!= "")

  private def nbTrain(docs: DataFrame, textCol: String,
      labelCol: String, tokensOf: Column => Column): NbModel = {
    val valid = docs.filter(col(textCol).isNotNull &&
      trim(col(textCol)) =!= "")
    val toks = valid
      .select(col(labelCol).as("__lab"),
        explode(tokensOf(col(textCol))).as("__t"))
    // ONE explode pass folds straight into (class, token) counts;
    // totals, vocab and |V| all derive from that table, so the
    // checkpoint holds vocab × classes rows — model-sized — instead
    // of the corpus-sized token stream
    val classTok = toks.groupBy("__lab", "__t")
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint(true)
    val classTot = classTok.groupBy("__lab").agg(sum("__c").as("__tot"))
    val vocab = classTok.select("__t").distinct()
    val vsize = vocab.agg(count(lit(1)).as("__v"))
    val perLab = valid.groupBy(col(labelCol).as("__lab"))
      .agg(count(lit(1)).as("__nd"))
    val priors = perLab
      .crossJoin(broadcast(perLab.agg(sum("__nd").as("__ndall"))))
      .select(col("__lab"),
        log(col("__nd").cast("double") / col("__ndall")).as("__logprior"))
    val loglik = vocab.crossJoin(broadcast(classTot))
      .join(classTok, Seq("__lab", "__t"), "left")
      .crossJoin(broadcast(vsize))
      .select(col("__t"), col("__lab"),
        log((coalesce(col("__c"), lit(0L)).cast("double") + lit(1.0)) /
          (col("__tot") + col("__v"))).as("__ll"))
    NbModel(priors, loglik)
  }

  /** Score documents under a trained model:
    * `(id, predicted, score)` — predicted = argmax over classes of
    * `prior(c) + Σ_t tf(t) · ll(t, c)` (ties break by class name
    * ascending), score = that maximum. Out-of-vocabulary tokens are
    * dropped (standard multinomial NB); a document with no in-vocab
    * tokens scores on priors alone. Per-class contributions fold in
    * TOKEN ORDER (the [[graft.search.Hybrid]] sorted-array-fold rule),
    * so scores are bit-reproducible across engines and partitionings.
    * Scoring is one tokenize + one vocab equi-join + one per-doc fold —
    * a 100 TB corpus scores in two shuffles. Precondition: the ordered
    * fold buffers one struct per DISTINCT in-vocab token of a document
    * before sorting, so per-doc aggregation memory is bounded by
    * document length — run length gates (the Gopher/C4 tier) upstream;
    * an uncapped pathological document grows a single agg buffer
    * proportionally. */
  def naiveBayesScore(model: NbModel, docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    nbScore(model, docs, idCol, textCol, wordTokens)

  /** The FULL class-score surface under a [[langIdTrain]] model:
    * `(idCol, lab, score)` — one row per (document, class), the same
    * bit-reproducible ordered fold [[langIdScore]] argmaxes over.
    * This is the confidence surface: the margin between a document's
    * top two scores is the standard abstain signal (route low-margin
    * predictions to `und` instead of trusting a coin-flip argmax). */
  def langIdScores(model: NbModel, docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    nbScoreAll(model, docs, idCol, textCol, TextAnalysis.charTrigrams)

  private def nbScore(model: NbModel, docs: DataFrame, idCol: String,
      textCol: String, tokensOf: Column => Column): DataFrame =
    argmaxScores(nbScoreAll(model, docs, idCol, textCol, tokensOf),
      idCol)

  /** The argmax [[langIdScore]] applies over a [[langIdScores]]-shaped
    * frame `(idCol, lab, score)` — exposed so a consumer holding the
    * full confidence surface (one scored fold) can derive the argmax
    * prediction from it instead of re-running the fold. */
  def argmaxScores(all: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(idCol)
      .orderBy(col("score").desc, col("lab").asc)
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("lab").as("predicted"), col("score"))
  }

  /** All-classes scoring: `(idCol, lab, score)` per (doc, class). */
  private def nbScoreAll(model: NbModel, docs: DataFrame, idCol: String,
      textCol: String, tokensOf: Column => Column): DataFrame = {
    // the class list is the model arity — a bounded driver collect (a
    // classifier has a handful of classes by definition), sorted so
    // the wide-table lane order and fold order are deterministic;
    // deriving it from priors keeps the persisted (priors, loglik)
    // parquet pair a COMPLETE model
    val labs = model.priors.select("__lab").collect()
      .map(_.getString(0)).sorted.toSeq
    val valid = docs.filter(col(textCol).isNotNull &&
      trim(col(textCol)) =!= "")
    val tf = valid
      .select(col(idCol).as("__id"),
        explode(tokensOf(col(textCol))).as("__t"))
      .groupBy("__id", "__t").agg(count(lit(1)).as("__tf"))
    // ONE wide likelihood row per vocab token (classes as columns):
    // the doc-side join and fold then run over tf rows, not
    // tf × classes — the per-class contributions still fold in the
    // SAME token order with the SAME addition sequence (one struct
    // lane per class), so scores stay bit-identical to the tall
    // form while shuffling 1/|classes| of the rows. The wide table
    // is vocab-bounded; AQE broadcasts it when it fits and falls
    // back to the same __t equi-join shuffle otherwise.
    // conditional aggregation rather than pivot: lanes bind to class
    // VALUES (`when(__lab === l)`), never to generated column NAMES,
    // so labels differing only in case (or holding metachars) can't
    // collide under case-insensitive column resolution
    val lanes = labs.zipWithIndex.map { case (l, i) =>
      first(when(col("__lab") === l, col("__ll")), ignoreNulls = true)
        .as(s"__ll$i") }
    val wide = model.loglik.groupBy("__t")
      .agg(lanes.head, lanes.tail: _*)
    val contribs = tf.join(wide, Seq("__t"))
      .select(col("__id"), struct(col("__t") +:
        labs.indices.map(i => (col("__tf").cast("double") *
          col(s"__ll$i")).as(s"__c$i")): _*).as("__e"))
    val zero = struct(labs.indices.map(i => lit(0.0).as(s"__c$i")): _*)
    val folded = contribs.groupBy("__id")
      .agg(aggregate(array_sort(collect_list(col("__e"))), zero,
        (acc, x) => struct(labs.indices.map(i =>
          (acc.getField(s"__c$i") + x.getField(s"__c$i"))
            .as(s"__c$i")): _*)).as("__acc"))
      .select(col("__id"), explode(array(labs.zipWithIndex.map {
        case (l, i) => struct(lit(l).as("__lab"),
          col("__acc").getField(s"__c$i").as("__s")) }: _*)).as("__x"))
      .select(col("__id"), col("__x.__lab").as("__lab"),
        col("__x.__s").as("__s"))
    valid.select(col(idCol).as("__id")).distinct()
      .crossJoin(broadcast(model.priors))
      .join(folded, Seq("__id", "__lab"), "left")
      .withColumn("score",
        col("__logprior") + coalesce(col("__s"), lit(0.0)))
      .select(col("__id").as(idCol), col("__lab").as("lab"),
        col("score"))
  }

  // ---- fixed-point linear quality classifier (the GPT-3 pipeline's
  // model-based filter tier: Brown et al. 2020, arXiv:2005.14165
  // App. A trains a logistic-regression classifier over hashed
  // document features and keeps docs the model scores as quality;
  // LLaMA-descendant pipelines run fastText in the same seat) ----

  /** A trained [[linearTrain]] model: `(dim+1)` weights in integer
    * MICRO-units (1e-6) — the whole model is a few hundred longs, so
    * it broadcasts into the scoring projection as a literal. */
  final case class LinearModel(wMicro: Array[Long], dim: Int,
      bias: Long, slopeDiv: Long, stepDiv: Long)

  /** Truncate-toward-zero integer division as a Column. The double
    * division is EXACT here: |a| stays far below 2^53 (longs are then
    * exactly representable), IEEE division is correctly rounded, and
    * a non-divisible quotient's fractional part is at least 1/d — many
    * orders of magnitude above one ulp — so floor can never land on
    * the wrong side. Truncation (not floor) because DuckDB's `//`,
    * Spark SQL's `div` and Scala's `Long./` all truncate: one
    * semantics on every engine that replays this. */
  private def tdivCol(a: Column, d: Long): Column =
    when(a >= 0, floor(a.cast("double") / d))
      .otherwise(-floor(-a.cast("double") / d)).cast("long")

  /** md5-hashed per-mille bag-of-words features + a constant bias
    * term, all integers: `x(j) = ⌊1000 · count(tokens in bucket j) /
    * n_tokens⌋` for j < dim, `x(dim) = bias`. Buckets come from the
    * first two hex chars of `md5(token)` mod dim — the engine's
    * cross-engine hashing convention ([[graft.functions.Md5Hash]]),
    * so featurization replays bit-identically in SQL. Per-mille
    * normalization keeps feature scales comparable across document
    * lengths (raw counts condition gradient descent badly). */
  def linearFeatures(textCol: Column, dim: Int, bias: Long): Column =
    featuresFromBuckets(hashBuckets(textCol, dim), dim, bias)

  /** Per-token md5 bucket array. Stage THIS as its own projection
    * before [[featuresFromBuckets]]: handing the bucketization in as a
    * plain attribute keeps Catalyst from inlining the md5-per-token
    * array into each of the `dim` per-bucket count lambdas (the inline
    * form hashed every token `dim` times — ~20 s of the original
    * 26 s sf0.1 training cell was exactly that). */
  def hashBuckets(textCol: Column, dim: Int): Column = {
    val chars = hexCharsFor(dim)
    transform(split(trim(textCol), "\\s+"), t =>
      conv(substring(md5(t), 1, chars), 16, 10).cast("long") % dim)
  }

  /** Hex prefix length so every bucket < dim is reachable: the
    * smallest c ≥ 2 with 16^c ≥ dim (2 chars = 256 values sufficed
    * for every historical dim; a fixed 2 would leave buckets ≥ 256
    * permanently empty for larger dims — silently wasting most of the
    * weight vector). Integer loop, no floating log. */
  private def hexCharsFor(dim: Int): Int = {
    var c = 2
    var cap = 256
    while (cap < dim) { c += 1; cap *= 16 }
    c
  }

  /** Per-mille feature vector from a precomputed bucket array. */
  def featuresFromBuckets(bs: Column, dim: Int, bias: Long): Column =
    concat(
      transform(sequence(lit(0), lit(dim - 1)), j =>
        floor(size(filter(bs, b => b === j.cast("long")))
          .cast("double") * 1000.0 / size(bs)).cast("long")),
      array(lit(bias)))

  /** Full-batch gradient-descent training of a linear quality
    * classifier — ENTIRELY in integer micro-units, so training is
    * bit-reproducible on any engine, partitioning, or run: weights
    * live in micro (1e-6) longs, the link is the hard sigmoid
    * `p = clamp(1/2 + z/4, 0, 1)` (pure integer arithmetic — no
    * transcendental whose last ulp differs across libm builds), and
    * each step is `w ← w − ⌊Σ_docs (p − y)·x / stepDiv⌋` with exact
    * long sums (order-invariant, unlike float accumulation).
    *
    * Scale shape: featurization is one codegen projection persisted
    * once; each iteration is ONE map-side-combined aggregation of
    * `(dim+1)` longs (tree of partial sums — no shuffle of doc rows),
    * and the only driver state is the `(dim+1)`-long weight vector.
    * Iteration count is the [[graft.search.Kmeans]] trade: `iters`
    * sequential Spark jobs, fine at the tens-of-iterations this
    * converges in, with cost independent of corpus size beyond the
    * scan.
    *
    * Bound the TRAINING corpus: a gradient component is at most
    * `n_docs · 1e6 · 1000`, so the exact long sum can overflow past
    * ~9e9 training docs. Quality classifiers are trained on bounded
    * LABELED samples anyway (the GPT-3 recipe labels a small curated
    * positive set) — train on the sample, SCORE the full corpus
    * ([[linearScore]] has no such bound). */
  def linearTrain(docs: DataFrame, textCol: String, labelCol: Column,
      dim: Int = 64, iters: Int = 16, bias: Long = 250L,
      slopeDiv: Long = 1000L, stepDiv: Long = 10000L): LinearModel = {
    // localCheckpoint (not persist): the iteration loop re-analyzes its
    // plan every step (the weight literal changes), so the featurization
    // lineage must be TRUNCATED or each of the `iters` steps re-optimizes
    // the full dim-wide HOF expression tree — that overhead, not the
    // data, dominated the un-truncated form (~1.7 s/step at sf0.1)
    val feat = linearFeatureFrame(docs, textCol, labelCol, dim, bias)
      .localCheckpoint(true)
    try linearTrainOnFeatures(feat, dim, iters, bias, slopeDiv, stepDiv)
    finally feat.unpersist(false)
  }

  /** The `(__y, __x)` training frame [[linearTrain]] iterates over —
    * exposed so callers can stage (and time) featurization apart from
    * the descent loop. */
  def linearFeatureFrame(docs: DataFrame, textCol: String,
      labelCol: Column, dim: Int, bias: Long): DataFrame =
    docs
      .filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(labelCol.cast("long").as("__y"),
        hashBuckets(col(textCol), dim).as("__bs"))
      .select(col("__y"),
        featuresFromBuckets(col("__bs"), dim, bias).as("__x"))

  /** The descent loop over a prepared (ideally checkpointed)
    * [[linearFeatureFrame]]. */
  def linearTrainOnFeatures(feat: DataFrame, dim: Int, iters: Int,
      bias: Long, slopeDiv: Long, stepDiv: Long): LinearModel = {
    require(dim >= 2 && dim <= 4096, s"dim=$dim out of [2, 4096]")
    require(iters >= 1 && iters <= 1000, s"iters=$iters out of [1, 1000]")
    require(slopeDiv >= 1 && stepDiv >= 1, "divisors must be positive")
    locally {
      var w = Array.fill(dim + 1)(0L)
      for (_ <- 1 to iters) {
        val wl = typedLit(w.toSeq)
        val z = aggregate(zip_with(col("__x"), wl, (a, b) => a * b),
          lit(0L), (acc, v) => acc + v)
        val p = least(greatest(lit(500000L) + tdivCol(z, slopeDiv),
          lit(0L)), lit(1000000L))
        // gradient as posexplode → 65-key groupBy, NOT (dim+1) separate
        // scalar aggregates: the plan's expression count stays constant
        // in dim, so per-iteration analysis/codegen is flat (the
        // dim-wide agg cost ~1.7 s/step in planning alone) and the
        // shuffle carries (dim+1) rows per partition
        val g = feat
          .select(col("__x"), (p - col("__y") * 1000000L).as("__e"))
          .select(posexplode(transform(col("__x"),
            xi => xi * col("__e"))).as(Seq("__j", "__c")))
          .groupBy("__j").agg(sum("__c").as("__g"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        // an empty/degenerate feature frame yields no gradient rows —
        // treat missing components as zero instead of crashing the loop
        w = Array.tabulate(dim + 1)(j => w(j) - g.getOrElse(j, 0L) / stepDiv)
      }
      LinearModel(w, dim, bias, slopeDiv, stepDiv)
    }
  }

  /** Score documents under a trained linear model: `(idCol,
    * <carryCols…>, p_micro, pred)` — `p_micro` is the hard-sigmoid
    * output in micro-units (0..1000000), `pred = p_micro ≥ 500000`.
    * One shuffle-free codegen projection; the model rides in as an
    * array literal. */
  def linearScore(model: LinearModel, docs: DataFrame, idCol: String,
      textCol: String, carryCols: Seq[String] = Nil): DataFrame = {
    val wl = typedLit(model.wMicro.toSeq)
    val x = featuresFromBuckets(col("__bs"), model.dim, model.bias)
    val z = aggregate(zip_with(x, wl, (a, b) => a * b),
      lit(0L), (acc, v) => acc + v)
    val p = least(greatest(lit(500000L) + tdivCol(z, model.slopeDiv),
      lit(0L)), lit(1000000L))
    docs.filter(col(textCol).isNotNull && trim(col(textCol)) =!= "")
      .select(col(idCol) +: carryCols.map(col) :+
        hashBuckets(col(textCol), model.dim).as("__bs"): _*)
      .select(col(idCol) +: carryCols.map(col) :+ p.as("p_micro"): _*)
      .withColumn("pred", (col("p_micro") >= 500000L).cast("long"))
  }

  /** Persist a trained linear model as a plain parquet table (the
    * [[NbModel]] principle: models are DataFrames, they persist like
    * any layout): one row per weight plus the hyperparameters repeated
    * per row — trivially diffable, readable by any engine. */
  def saveLinearModel(spark: org.apache.spark.sql.SparkSession,
      m: LinearModel, path: String): Unit = {
    import spark.implicits._
    m.wMicro.toSeq.zipWithIndex
      .map { case (wj, j) =>
        (j.toLong, wj, m.dim, m.bias, m.slopeDiv, m.stepDiv) }
      .toDF("j", "w_micro", "dim", "bias", "slope_div", "step_div")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Reopen a persisted linear model; weights land back in index
    * order, hyperparameters from the first row. */
  def loadLinearModel(spark: org.apache.spark.sql.SparkSession,
      path: String): LinearModel = {
    val rows = spark.read.parquet(path)
      .select("j", "w_micro", "dim", "bias", "slope_div", "step_div")
      .collect().sortBy(_.getLong(0))
    require(rows.nonEmpty, s"no linear model at $path")
    val h = rows.head
    val m = LinearModel(rows.map(_.getLong(1)), h.getInt(2),
      h.getLong(3), h.getLong(4), h.getLong(5))
    require(m.wMicro.length == m.dim + 1,
      s"model at $path has ${m.wMicro.length} weights for dim ${m.dim}")
    m
  }

  /** CCNet-style perplexity bucketing (Wenzek et al., arXiv:1911.00359
    * §4.3): split a scored corpus into head / middle / tail thirds by
    * LM score, the standard quality gate fed to downstream sampling
    * ("keep head+middle, drop tail").
    *
    * The cutoffs are calibrated on a deterministic md5 sample — the
    * CCNet recipe itself (cutoffs fit per language on a sample, then
    * applied corpus-wide), and the scale shape that avoids a global
    * sort: the only ordered work is two bounded `TakeOrdered` heaps on
    * the sample; bucket assignment is then a shuffle-free comparison
    * projection over the full corpus. Cutoff r-th-smallest semantics
    * are value-based (ties collapse), so the result is independent of
    * partitioning and replayable as a row_number() window on any
    * engine. */
  def pplBuckets(scored: DataFrame, idCol: String, scoreCol: String,
      sampleRate: Double): DataFrame = {
    // the sample (one double per row, bounded by the calibration rate)
    // is read three times — count + both cutoff heaps; persist it so
    // the upstream scoring pipeline runs once for calibration, not 3x
    val sample = scored
      .filter(Sampling.hashFraction(col(idCol)) < sampleRate)
      .select(col(scoreCol))
      .persist()
    try {
      val n = sample.count()
      require(n >= 3, s"ppl cutoff sample too small: $n rows")
      def kthSmallest(r: Long): Double =
        sample.orderBy(col(scoreCol)).limit(r.toInt)
          .agg(max(col(scoreCol))).head().getDouble(0)
      val c1 = kthSmallest(math.ceil(n / 3.0).toLong)
      val c2 = kthSmallest(math.ceil(2.0 * n / 3.0).toLong)
      scored.withColumn("bucket",
        when(col(scoreCol) <= c1, lit("head"))
          .when(col(scoreCol) <= c2, lit("middle"))
          .otherwise(lit("tail")))
    } finally sample.unpersist()
  }
}
