package graft.rag

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Generation seam: the reference answers with a local FLAN-T5 behind its
  * backend (reference src/backend/main.py:107-122, greedy, 128-token
  * budget) — an environment adapter, not an analytics operator. The
  * engine keeps the seam pluggable; the default implementation is a
  * deterministic extractive "generator" (answer = the first context
  * block, stripped of its [id] prefix), which preserves the reference's
  * grounding behavior — including refusing on empty context — without
  * a model dependency.
  */
trait Generator {
  /** Adds an `answer` column from a context column and question column. */
  def generate(df: DataFrame, contextCol: String, questionCol: String): DataFrame
}

object ExtractiveGenerator extends Generator {
  val refusal = "No relevant context found."

  /** First context block, `[id] ` prefix removed. Empty/fallback context
    * → the refusal literal (mirrors BE:103-104 grounding). */
  def answerCol(context: Column): Column =
    when(context.isNull || length(trim(context)) === 0 ||
         context === refusal, lit(refusal))
      .otherwise(regexp_replace(
        substring_index(context, "\n\n", 1), "^\\[[^\\]]*\\] ", ""))

  override def generate(df: DataFrame, contextCol: String,
      questionCol: String): DataFrame =
    df.withColumn("prompt", Context.prompt(col(contextCol), col(questionCol)))
      .withColumn("answer", answerCol(col(contextCol)))
}
