package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level expectation gating — the data-quality front every ingest
  * pipeline puts before its tables (the Deequ/Great-Expectations
  * shape, re-expressed as pure expressions): each rule is a named
  * boolean predicate; a row's failed-rule names travel WITH the row,
  * so bad rows land in a quarantine table carrying their reasons
  * instead of silently vanishing in a WHERE clause.
  *
  * Scale shape: [[validate]] is ONE codegen projection fused into the
  * scan (every rule evaluates in the same pass — never one scan per
  * rule, which is how naive expectation suites die at 100 TB);
  * [[report]] adds a single map-side-combined aggregate. NULL
  * predicate results count as violations — a rule that cannot
  * evaluate did not pass.
  */
object DataQuality {

  /** Adds `__violations`: the array of failed rule names ('[]' when
    * the row is clean). */
  def validate(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val flags = rules.map { case (name, pred) =>
      when(coalesce(pred, lit(false)), lit(null).cast("string"))
        .otherwise(lit(name))
    }
    df.withColumn("__violations",
      filter(array(flags: _*), f => f.isNotNull))
  }

  /** (clean rows, quarantined rows-with-reasons). One shared validate
    * projection; the split is two filters over it. */
  def split(df: DataFrame, rules: Seq[(String, Column)])
      : (DataFrame, DataFrame) = {
    val v = validate(df, rules)
    (v.filter(size(col("__violations")) === 0).drop("__violations"),
      v.filter(size(col("__violations")) > 0))
  }

  /** One-row audit: per-rule violation counts plus the quarantine /
    * clean totals — the ledger a pipeline run logs. */
  def report(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    val v = validate(df, rules)
    val perRule = rules.map { case (name, _) =>
      sum(when(array_contains(col("__violations"), name), 1L)
        .otherwise(0L)).as(s"n_$name")
    }
    v.agg(count(lit(1)).as("n_rows"),
      (sum(when(size(col("__violations")) > 0, 1L).otherwise(0L))
        .as("n_quarantined") +: perRule): _*)
  }
}
