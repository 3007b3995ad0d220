package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of joins with pandas-`merge_asof` direction semantics:
  *
  *  - `backward`: most recent right row with `right.ts <= left.ts`
  *  - `forward`:  earliest right row with `right.ts >= left.ts`
  *  - `nearest`:  whichever of those is closer in time (tie → backward,
  *                matching pandas)
  *
  * Spark-first composition (preference (a) of the custom-operator ladder:
  * no custom LogicalPlan needed): tag both sides, union, and take a
  * running `last(right_payload, ignoreNulls)` over a window ordered by
  * `(ts, side, tieBreak)` with right rows sorting before left rows at
  * equal timestamps; forward runs the same scan in time-descending
  * order. ONE shuffle on the key — same cost as a sort-merge join —
  * instead of a range-condition NLJ, and it scales to skewed keys like
  * any windowed aggregation (salt the key upstream if one key
  * dominates). `nearest` computes both directions over the same
  * exchange (two window sorts, one shuffle).
  */
object AsOfJoin {

  /** Right payload carries its own timestamp as `__rts` so `nearest`
    * can compare distances; plain directions just drop it. */
  private def tagged(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, leftCols: Seq[String],
      rightCols: Seq[String], tieBreak: String): DataFrame = {
    val rpayType = StructType(
      StructField("__rts", right.schema(rightTs).dataType) +:
        rightCols.map(c => right.schema(c)))
    val l = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(null).cast("long").as("__tie"),
        struct(leftCols.map(col): _*).as("__lpay"),
        lit(null).cast(rpayType).as("__rpay")): _*)
    val r = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        col(tieBreak).cast("long").as("__tie"),
        lit(null).cast(StructType(leftCols.map(c => left.schema(c))))
          .as("__lpay"),
        struct(col(rightTs).as("__rts") +: rightCols.map(col): _*)
          .as("__rpay")): _*)
    l.unionByName(r)
  }

  private def project(df: DataFrame, keyCols: Seq[String], leftTs: String,
      leftCols: Seq[String], rightCols: Seq[String],
      asofCol: String): DataFrame =
    df.filter(col("__side") === 1).select(
      keyCols.map(col) ++ Seq(col("__ts").as(leftTs)) ++
        leftCols.map(c => col(s"__lpay.$c").as(c)) ++
        rightCols.map(c => col(s"$asofCol.$c").as(c)): _*)

  /** Backward scan: ascending time, right-before-left at equal ts; among
    * equal (key, ts) right rows the largest tieBreak wins (last seen). */
  private def backwardCol(keyCols: Seq[String]): Column = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last(col("__rpay"), ignoreNulls = true).over(w)
  }

  /** Forward scan: descending time; among equal (key, ts) right rows the
    * smallest tieBreak wins (first occurrence, as pandas). */
  private def forwardCol(keyCols: Seq[String]): Column = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").desc, col("__side").asc, col("__tie").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last(col("__rpay"), ignoreNulls = true).over(w)
  }

  /** @param leftCols  columns of `left` to carry through (must exist)
    * @param rightCols columns of `right` to attach (null when no right
    *                  row matches — left-join semantics)
    * @param tieBreak  right-side column making (key, ts) unique order */
  def backward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, leftCols: Seq[String],
      rightCols: Seq[String], tieBreak: String): DataFrame =
    project(
      tagged(left, right, keyCols, leftTs, rightTs, leftCols, rightCols,
        tieBreak).withColumn("__asof", backwardCol(keyCols)),
      keyCols, leftTs, leftCols, rightCols, "__asof")

  def forward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, leftCols: Seq[String],
      rightCols: Seq[String], tieBreak: String): DataFrame =
    project(
      tagged(left, right, keyCols, leftTs, rightTs, leftCols, rightCols,
        tieBreak).withColumn("__asof", forwardCol(keyCols)),
      keyCols, leftTs, leftCols, rightCols, "__asof")

  /** Nearest in time; requires a timestamp-or-numeric ts (distance is
    * compared on `cast(ts as double)`). Tie → backward, as pandas. */
  def nearest(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, leftCols: Seq[String],
      rightCols: Seq[String], tieBreak: String): DataFrame = {
    val both = tagged(left, right, keyCols, leftTs, rightTs, leftCols,
      rightCols, tieBreak)
      .withColumn("__bwd", backwardCol(keyCols))
      .withColumn("__fwd", forwardCol(keyCols))
    val ts = col("__ts").cast("double")
    val bts = col("__bwd.__rts").cast("double")
    val fts = col("__fwd.__rts").cast("double")
    val chosen = when(col("__fwd").isNull, col("__bwd"))
      .when(col("__bwd").isNull, col("__fwd"))
      .when(abs(fts - ts) < abs(ts - bts), col("__fwd"))
      .otherwise(col("__bwd"))
    project(both.withColumn("__near", chosen),
      keyCols, leftTs, leftCols, rightCols, "__near")
  }
}
