package graft.operators

import org.apache.spark.sql.DataFrame
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
    * parquet and the model round-trips like any layout. */
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
      labelCol: String): NbModel = {
    val valid = docs.filter(col(textCol).isNotNull &&
      trim(col(textCol)) =!= "")
    val toks = valid
      .select(col(labelCol).as("__lab"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("__t"))
      .filter(col("__t") =!= "")
      .localCheckpoint(true) // feeds class counts, totals AND the vocab
    val classTok = toks.groupBy("__lab", "__t").agg(count(lit(1)).as("__c"))
    val classTot = toks.groupBy("__lab").agg(count(lit(1)).as("__tot"))
    val vocab = toks.select("__t").distinct()
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
    * a 100 TB corpus scores in two shuffles. */
  def naiveBayesScore(model: NbModel, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val valid = docs.filter(col(textCol).isNotNull &&
      trim(col(textCol)) =!= "")
    val tf = valid
      .select(col(idCol).as("__id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("__t"))
      .filter(col("__t") =!= "")
      .groupBy("__id", "__t").agg(count(lit(1)).as("__tf"))
    val folded = tf.join(model.loglik, Seq("__t"))
      .withColumn("__contrib", col("__tf").cast("double") * col("__ll"))
      .groupBy("__id", "__lab")
      .agg(aggregate(
        array_sort(collect_list(struct(col("__t"), col("__contrib")))),
        lit(0.0), (acc, x) => acc + x("__contrib")).as("__s"))
    val scored = valid.select(col(idCol).as("__id")).distinct()
      .crossJoin(broadcast(model.priors))
      .join(folded, Seq("__id", "__lab"), "left")
      .withColumn("score",
        col("__logprior") + coalesce(col("__s"), lit(0.0)))
    val w = Window.partitionBy("__id")
      .orderBy(col("score").desc, col("__lab").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("__id").as(idCol), col("__lab").as("predicted"),
        col("score"))
  }
}
