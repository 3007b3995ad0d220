package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` API: wrap a Catalyst Expression as a
  * user-facing Column (Spark 4.x removed the public `new Column(expr)`
  * constructor in favor of ColumnNode). Lives under org.apache.spark.sql
  * solely to satisfy the access modifier; no Spark internals are modified.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
