package graft.rag

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** RAG post-processing: the reference's backend pipeline between
  * retrieval and generation (reference src/backend/main.py:59-112):
  * falsy-filter → first-wins dedup (after top-k, so a result may
  * under-fill k — preserved quirk) → "[id] text" context blocks joined
  * with blank lines → fallback literal when empty.
  */
object Context {

  /** Drop null/empty text rows — BE's `if not text: continue`. */
  def falsyFilter(df: DataFrame, textCol: String): DataFrame =
    df.filter(col(textCol).isNotNull && col(textCol) =!= "")

  /** First-wins dedup by `dedupKey` preserving rank order within each
    * query group; runs AFTER top-k, so fewer than k rows may survive
    * (reference src/backend/main.py:62-69). */
  def firstWinsDedup(df: DataFrame, groupCols: Seq[String],
      dedupKey: String, rankCol: String): DataFrame = {
    val w = Window.partitionBy((groupCols :+ dedupKey).map(col): _*)
      .orderBy(col(rankCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Format one retrieved doc as a context block: `[id] text`
    * (reference src/backend/main.py:101). */
  def contextBlock(idCol: Column, textCol: Column): Column =
    format_string("[%s] %s", idCol, textCol)

  /** Rank-ordered aggregation of blocks joined by blank lines. Ordered
    * deterministically by sorting (rank, block) structs inside the
    * aggregation — no WindowExec, works under any partitioning. */
  def assembleContext(df: DataFrame, groupCols: Seq[String],
      rankCol: String, blockCol: Column): DataFrame = {
    val assembled = array_join(
      transform(
        array_sort(collect_list(struct(col(rankCol).as("r"),
          blockCol.as("b")))),
        x => x.getField("b")),
      "\n\n")
    df.groupBy(groupCols.map(col): _*)
      .agg(trim(assembled).as("context"))
  }

  /** Empty-context fallback (reference src/backend/main.py:103-104). */
  def withFallback(c: Column,
      fallback: String = "No relevant context found."): Column =
    when(c.isNull || length(trim(c)) === 0, lit(fallback)).otherwise(c)

  /** Grounded prompt template (reference src/backend/main.py:107-112).
    * Generation itself stays behind the Generator seam. */
  def prompt(contextCol: Column, questionCol: Column): Column =
    format_string(
      "Answer the question using ONLY the context below.\n\nContext:\n%s\n\nQuestion: %s\nAnswer:",
      contextCol, questionCol)
}
