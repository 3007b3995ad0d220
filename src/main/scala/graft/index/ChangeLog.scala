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

  /** Snapshot-as-of (Delta-style time travel re-expressed over the
    * journal): fold every change with `__seq` <= `asOfSeq` into the
    * table state — the latest surviving payload per PK. ONE pk-keyed
    * window argmax, never a sequential replay, so reconstructing any
    * historical snapshot costs the same one shuffle regardless of how
    * many versions lie between. */
  def stateAt(journal: DataFrame, pkCol: String, asOfSeq: Long): DataFrame =
    latestPerPk(journal.filter(col("__seq") <= asOfSeq), pkCol)
      .filter(col("__op") =!= OpDelete)
      .drop("__op", "__seq")

  /** Net row-level diff between two snapshot sequences — the CDF read
    * seam an incremental consumer tails: for each PK changed in
    * (fromSeq, toSeq], the effective op RELATIVE to the fromSeq state —
    * 'I' if the PK did not exist then, 'D' if it existed and the last
    * in-window change deletes it, 'U' otherwise; PKs with no net effect
    * (created AND deleted inside the window) are suppressed. Two window
    * argmaxes + one pk join — cost is the changed-row volume, never the
    * table or the version count. */
  def netChanges(journal: DataFrame, pkCol: String, fromSeq: Long,
      toSeq: Long): DataFrame = {
    val before = latestPerPk(journal.filter(col("__seq") <= fromSeq), pkCol)
      .select(col(pkCol), (col("__op") =!= OpDelete).as("__existed"))
    val win = latestPerPk(
      journal.filter(col("__seq") > fromSeq && col("__seq") <= toSeq), pkCol)
    win.join(before, Seq(pkCol), "left")
      .withColumn("__existed", coalesce(col("__existed"), lit(false)))
      .withColumn("__net",
        when(col("__op") === OpDelete,
          when(col("__existed"), lit(OpDelete)).otherwise(lit(null)))
          .otherwise(when(col("__existed"), lit(OpUpdate))
            .otherwise(lit(OpInsert))))
      .filter(col("__net").isNotNull)
      .drop("__op", "__existed")
      .withColumnRenamed("__net", "__op")
  }

  /** SCD Type-2 history build — the lakehouse dimension-table form of
    * the journal: every surviving change becomes a validity interval
    * `[__valid_from, __valid_to)` in sequence space, where
    * `__valid_to` is the NEXT change's `__seq` for the same PK (NULL
    * while current). A delete closes the prior interval (it bounds the
    * predecessor's lead) and contributes no row of its own, so a
    * deleted PK has no current version. ONE pk-keyed window (`lead`),
    * no self-join — cost is journal volume, never versions × table
    * size, and any as-of question becomes a range predicate on the
    * interval columns instead of a [[stateAt]] fold per timestamp. */
  def scd2(journal: DataFrame, pkCol: String): DataFrame = {
    val w = Window.partitionBy(col(pkCol)).orderBy(col("__seq").asc)
    journal
      .withColumn("__valid_to", lead(col("__seq"), 1).over(w))
      .filter(col("__op") =!= OpDelete)
      .withColumnRenamed("__seq", "__valid_from")
      .withColumn("__current", col("__valid_to").isNull)
      .drop("__op")
  }

  /** Incremental SCD2 merge — fold a NEW change batch (every `__seq`
    * strictly greater than any sequence already folded) into an
    * existing interval table. Only CHANGED PKs are touched: each one's
    * open interval (if any) re-enters the [[scd2]] fold as a
    * pseudo-change at its own `__valid_from`, so the refold closes it
    * at the batch's first change and chains the rest; closed intervals
    * and untouched PKs pass through verbatim. Applying batches in
    * sequence order reproduces `scd2(whole journal)` EXACTLY — the
    * stream ≡ batch contract. Cost: one pk semi/anti-join pair plus a
    * lead window over (changed open rows + the batch) — never the
    * table's history. */
  def scd2Apply(current: DataFrame, changes: DataFrame,
      pkCol: String): DataFrame = {
    val changedPks = changes.select(col(pkCol)).distinct()
    val pseudo = current
      .join(changedPks, Seq(pkCol), "left_semi")
      .filter(col("__current"))
      .drop("__valid_to", "__current")
      .withColumnRenamed("__valid_from", "__seq")
      .withColumn("__op", lit(OpInsert))
    val refolded = scd2(pseudo.unionByName(changes), pkCol)
    val untouched = current.join(changedPks, Seq(pkCol), "left_anti")
    val closedOfChanged = current
      .join(changedPks, Seq(pkCol), "left_semi")
      .filter(!col("__current"))
    untouched.unionByName(closedOfChanged).unionByName(refolded)
  }

  /** The SCD2 CONSUMPTION path: enrich fact rows with the dimension
    * version that was valid AT each fact's sequence — the classic
    * warehouse join `fact.seq ∈ [valid_from, valid_to)`. The join is
    * pk-equi-driven with the interval bounds as a residual filter (at
    * most ONE interval matches per (pk, seq), so no row blowup), LEFT
    * so facts whose pk was deleted — or not yet created — at their
    * sequence keep a NULL payload instead of vanishing. */
  def enrichAsOf(facts: DataFrame, pkCol: String, seqCol: String,
      intervals: DataFrame, payloadCols: Seq[String]): DataFrame = {
    val iv = intervals.select(
      (col(pkCol).as("__pk") +: col("__valid_from") +:
        col("__valid_to") +: payloadCols.map(col)): _*)
    facts.join(iv,
      facts(pkCol) === col("__pk") &&
        facts(seqCol) >= col("__valid_from") &&
        (col("__valid_to").isNull || facts(seqCol) < col("__valid_to")),
      "left")
      .drop("__pk")
  }

  /** Journal compaction (the Delta checkpoint analog): fold every
    * change with `__seq <= upToSeq` into one snapshot written as 'I'
    * rows AT `upToSeq`, keep the tail verbatim. [[stateAt]] /
    * [[netChanges]] / [[scd2]] answers for any sequence `>= upToSeq`
    * are IDENTICAL on the compacted journal, while its row count
    * drops from total-changes to live-rows + tail — the maintenance
    * op that keeps replay cost flat as a journal ages. History BELOW
    * the cut is intentionally gone (that is the point); one window
    * argmax + one filter, never a sequential replay. */
  def compact(journal: DataFrame, pkCol: String, upToSeq: Long): DataFrame = {
    val snapshot = stateAt(journal, pkCol, upToSeq)
      .withColumn("__op", lit(OpInsert))
      .withColumn("__seq", lit(upToSeq))
    val tail = journal.filter(col("__seq") > upToSeq)
    snapshot.unionByName(tail)
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
