package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew mitigation: salting for hot keys. At 100 TB a handful of keys
  * (empty documents, a viral user id) can own most of a shuffle; AQE's
  * skew-join handles sort-merge cases, but aggregations and windowed
  * ranking over a hot key still serialize into one task. Salting splits
  * a hot key into `factor` subkeys, aggregates partially per subkey, and
  * merges — the classic two-phase shape, expressed so the partial agg
  * stays map-side combinable.
  */
object Salt {

  /** Deterministic salt in [0, factor) derived from stable row columns
    * (never rand(): retries and speculative tasks must agree). */
  def saltCol(factor: Int, from: Column*): Column =
    pmod(hash(from: _*), lit(factor))

  /** Two-phase skew-safe aggregation: count + sum per key. */
  def skewSafeCountSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
      factor: Int, saltFrom: Seq[String]): DataFrame = {
    val salted = df.withColumn("__salt",
      saltCol(factor, saltFrom.map(col): _*))
    salted
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum("__n").as("n"), sum("__s").as("sum"))
  }

  /** Skew-safe broadcast join: when the build side is small, salting is
    * unnecessary — broadcast sidesteps the skewed shuffle entirely. This
    * helper exists to make that decision explicit at call sites. */
  def joinSkewedLeft(left: DataFrame, smallRight: DataFrame,
      keys: Seq[String]): DataFrame =
    left.join(broadcast(smallRight), keys)
}
