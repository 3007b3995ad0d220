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
}
