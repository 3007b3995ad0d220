package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** As-of join: for every left row, the most recent right row with
  * `right.ts <= left.ts` on the same key (backward as-of, the
  * market-data/event-attribution shape).
  *
  * Spark-first composition (preference (a) of the custom-operator ladder:
  * no custom LogicalPlan needed): tag both sides, union, and take a
  * running `last(right_payload, ignoreNulls)` over a window ordered by
  * `(ts, side, tieBreak)` with right rows sorting before left rows at
  * equal timestamps. ONE shuffle on the key — same cost as a sort-merge
  * join — instead of a range-condition NLJ, and it scales to skewed keys
  * like any windowed aggregation (salt the key upstream if one key
  * dominates).
  */
object AsOfJoin {

  /** @param leftCols  columns of `left` to carry through (must exist)
    * @param rightCols columns of `right` to attach (null when no right
    *                  row precedes the left row — left-join semantics)
    * @param tieBreak  right-side column making (key, ts) unique order */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, leftCols: Seq[String],
      rightCols: Seq[String], tieBreak: String): DataFrame = {
    val l = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast("long").as("__tie"),
        struct(leftCols.map(col): _*).as("__lpay"),
        lit(null).cast(structType(right, rightCols)).as("__rpay")): _*)
    val r = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        col(tieBreak).cast("long").as("__tie"),
        lit(null).cast(structType(left, leftCols)).as("__lpay"),
        struct(rightCols.map(col): _*).as("__rpay")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r)
      .withColumn("__asof", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    joined.select(
      keyCols.map(col) ++ Seq(col("__ts").as(leftTs)) ++
        leftCols.map(c => col(s"__lpay.$c").as(c)) ++
        rightCols.map(c => col(s"__asof.$c").as(c)): _*)
  }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c)))
}
