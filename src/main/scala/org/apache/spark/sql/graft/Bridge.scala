package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.SparkStrategy

/** Minimal bridge into `private[sql]` API: wrap a Catalyst Expression as a
  * user-facing Column (Spark 4.x removed the public `new Column(expr)`
  * constructor in favor of ColumnNode), build a DataFrame from a custom
  * LogicalPlan, and install planner strategies on a live session. Lives
  * under org.apache.spark.sql solely to satisfy the access modifier; no
  * Spark internals are modified.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  private def classic(spark: SparkSession): org.apache.spark.sql.classic.SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.DataFrame]
      .queryExecution.analyzed

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(classic(spark), plan)

  /** Eager localCheckpoint that DROPS the origin plan's estimated
    * statistics instead of inheriting them. `Dataset.localCheckpoint`
    * copies the optimized plan's stats onto its LogicalRDD leaf, and
    * in an iterated self-join (graph rounds) the estimated
    * sizeInBytes MULTIPLIES through every join and then SURVIVES each
    * checkpoint — the BigInt's bit-length compounds geometrically
    * with the round count until Catalyst spends minutes multiplying
    * million-bit integers (stats estimation, not data, becomes the
    * bottleneck; a 9-round truss ladder is already in the death
    * zone). Rebuilding the leaf without origin stats caps the chain
    * at ONE round's join factors; AQE re-plans from REAL runtime
    * sizes at execution, so no planning quality is lost. */
  def flatCheckpoint(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint()
    val qe = ck.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution
    qe.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        ofRows(df.sparkSession,
          lr.copy()(classic(df.sparkSession), None, None))
      case _ => ck
    }
  }

  /** Idempotently append a planner strategy to the live session. */
  def addStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val exp = classic(spark).experimental
    if (!exp.extraStrategies.contains(s))
      exp.extraStrategies = exp.extraStrategies :+ s
  }

  /** Idempotently append an optimizer rule to the live session (runs in
    * the optimizer's user-provided batch, after the main batches). */
  def addOptimization(spark: SparkSession,
      r: org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]): Unit = {
    val exp = classic(spark).experimental
    if (!exp.extraOptimizations.contains(r))
      exp.extraOptimizations = exp.extraOptimizations :+ r
  }
}
