package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic, engine-portable sampling — the data-mixing primitive a
  * training pipeline needs that `df.sample` cannot give it: `sample`
  * draws from a per-partition seeded RNG, so the selected rows change
  * with partitioning, cluster size and Spark version. Here the
  * keep/drop decision is a pure function of the row's id (md5), so the
  * same rows are kept on any engine, any cluster, any repartitioning —
  * reproducible mixtures, diffable across pipeline versions, and
  * DuckDB-oracle-checkable.
  *
  * Scale shape: a codegen-friendly filter — no shuffle, no state; at
  * 100 TB it fuses into the scan it follows. (The reference has no
  * sampling; this extends the training-data toolkit like Dedup /
  * TextAnalysis do.)
  */
object Sampling {

  /** Uniform hash fraction in [0, 1): the first 8 md5 hex chars of the
    * id rendered as a 32-bit integer over 2^32. Exact in double, and
    * reproducible as SQL on any engine with md5(). */
  def hashFraction(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("double") /
      lit(4294967296.0)

  /** Keep each row iff hashFraction(id) < rate. Deterministic: the same
    * id set survives every run, everywhere. */
  def deterministicSample(df: DataFrame, idCol: String,
      rate: Double): DataFrame =
    df.filter(hashFraction(col(idCol)) < rate)

  /** Per-stratum rates (data mixing): a row in stratum s survives iff
    * hashFraction(id) < rates(s), `default` for unlisted strata. The
    * rate map is driver-small by nature (one entry per source). */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], default: Double = 0.0): DataFrame = {
    val rateCol = coalesce(
      element_at(typedlit(rates), col(strataCol).cast("string")),
      lit(default))
    df.filter(hashFraction(col(idCol)) < rateCol)
  }

  /** Temperature mixing — the multilingual-pretraining rebalance where
    * source s is drawn with probability ∝ n_s^alpha (alpha < 1 flattens
    * the source distribution toward small sources; alpha = 1 is plain
    * uniform thinning). A source's keep rate is
    *
    *   r_s = min(1, budget · N / Σ_t n_t^alpha · n_s^(alpha−1))
    *
    * so ~budget·N rows survive overall with the temperature-shaped mix
    * (rates clamp at 1 — a filter cannot upsample; the budget then
    * undershoots, the standard behavior). Rates are computed on the
    * cluster (one tiny per-source agg, broadcast back); the keep
    * decision stays the shuffle-free md5 predicate, so the selected id
    * set is deterministic and replayable on any engine. */
  /** Leakage-free train/holdout split: the keep decision hashes the
    * GROUP key, so every row of a group (all chunks of a document, all
    * documents of a domain) lands in the same split — the property that
    * prevents near-duplicate leakage across train/eval that row-level
    * `randomSplit` silently violates. Deterministic and shuffle-free
    * like every Sampling decision. */
  def groupSplit(df: DataFrame, groupCol: String, trainFrac: Double,
      splitCol: String = "split"): DataFrame =
    df.withColumn(splitCol,
      when(hashFraction(col(groupCol)) < trainFrac, lit("train"))
        .otherwise(lit("holdout")))

  def temperatureMix(df: DataFrame, idCol: String, strataCol: String,
      alpha: Double, budget: Double): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__ns"))
    val totals = counts.agg(sum("__ns").as("__n"),
      sum(pow(col("__ns"), alpha)).as("__z"))
    val rates = counts.crossJoin(broadcast(totals))
      .select(col(strataCol),
        least(lit(1.0), lit(budget) * col("__n") / col("__z") *
          pow(col("__ns"), alpha - 1)).as("__rate"))
    df.join(broadcast(rates), strataCol)
      .filter(hashFraction(col(idCol)) < col("__rate"))
      .drop("__rate")
  }
}
