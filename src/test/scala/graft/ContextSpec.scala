package graft

import graft.rag.Context
import org.apache.spark.sql.functions._

class ContextSpec extends SparkSpec {
  import spark.implicits._

  test("falsy filter drops null and empty text") {
    val df = Seq((1L, "ok"), (2L, ""), (3L, null)).toDF("id", "text")
    assert(Context.falsyFilter(df, "text").count() === 1)
  }

  test("first-wins dedup after top-k can under-fill k (reference quirk)") {
    // 4 hits, but ranks 2 and 3 duplicate rank 1's key → 2 survivors
    val hits = Seq((0L, 1, "a", 10L), (0L, 2, "a", 11L), (0L, 3, "a", 12L),
      (0L, 4, "b", 13L)).toDF("query_id", "rank", "key", "doc")
    val out = Context.firstWinsDedup(hits, Seq("query_id"), "key", "rank")
      .orderBy("rank").collect()
    assert(out.length === 2)
    assert(out.map(_.getAs[Int]("rank")).toSeq === Seq(1, 4))
  }

  test("context assembly is rank-ordered and newline-joined") {
    val hits = Seq((0L, 2, 20L, "second"), (0L, 1, 10L, "first"))
      .toDF("query_id", "rank", "id", "text")
    val ctx = Context.assembleContext(hits, Seq("query_id"), "rank",
      Context.contextBlock(col("id"), col("text")))
      .head().getAs[String]("context")
    assert(ctx === "[10] first\n\n[20] second")
  }

  test("fallback replaces empty context") {
    val df = Seq("", "real context").toDF("c")
      .select(Context.withFallback(col("c")).as("c"))
    assert(df.collect().map(_.getString(0)).toSeq ===
      Seq("No relevant context found.", "real context"))
  }

  test("extractive generator answers from the first block, refuses on empty") {
    import graft.rag.ExtractiveGenerator
    val df = Seq(
      ("[10] first doc\n\n[20] second doc", "q1"),
      ("No relevant context found.", "q2"))
      .toDF("context", "question")
    val out = ExtractiveGenerator.generate(df, "context", "question")
      .select("answer").collect().map(_.getString(0))
    assert(out(0) === "first doc")
    assert(out(1) === "No relevant context found.")
  }

  test("prompt template embeds context and question") {
    val p = Seq(("ctx here", "why?")).toDF("c", "q")
      .select(Context.prompt(col("c"), col("q")).as("p"))
      .head().getString(0)
    assert(p.contains("ctx here") && p.contains("Question: why?") &&
      p.endsWith("Answer:"))
  }
}
