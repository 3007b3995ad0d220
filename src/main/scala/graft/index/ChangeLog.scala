package graft.index

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Append-only change journal emulating Delta Change Data Feed, which the
  * reference enables so its delta-sync index can consume row-level
  * changes (reference src/databricks/syntetic_data.py:68-75,181-191; no
  * Delta jars ship in this environment — SURVEY.md §7.4).
  *
  * Journal schema: source columns + `__op` ('I'|'U'|'D') + `__seq`
  * (monotonically increasing change sequence). Merge semantics:
  * last-write-wins per PK within a batch, deletes drop the row.
  * At scale the merge is one shuffle on the PK — and none at all when
  * both sides are pre-partitioned by pk-hash (VectorIndex.rebuild
  * buckets).
  */
object ChangeLog {
  val OpInsert = "I"
  val OpUpdate = "U"
  val OpDelete = "D"

  /** Latest change per PK within the batch (highest __seq wins). */
  def latestPerPk(changes: DataFrame, pkCol: String): DataFrame = {
    val w = Window.partitionBy(col(pkCol)).orderBy(col("__seq").desc)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Apply a change batch to a snapshot: remove every changed PK, then
    * re-insert the surviving upsert payloads. */
  def applyBatch(current: DataFrame, changes: DataFrame,
      pkCol: String): DataFrame = {
    val latest = latestPerPk(changes, pkCol)
    val upserts = latest.filter(col("__op") =!= OpDelete)
      .drop("__op", "__seq")
    val changedPks = latest.select(col(pkCol))
    current.join(changedPks, Seq(pkCol), "left_anti")
      .unionByName(upserts, allowMissingColumns = false)
  }
}
