package graft.queries

import graft.core.Tables
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deduplication coverage over `documents`: exact first-wins, brute-force
  * n-gram Jaccard (oracle ground truth), MinHash+LSH and SimHash (the
  * scale paths — rows-only checks here, equivalence to the exact paths is
  * asserted in ScalaTest). */
object DedupQueries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact_firstwins" -> ((s, dir) => {
      Dedup.exactFirstWins(docs(s, dir), Seq("lang", "source"), "doc_id")
        .select(col("lang"), col("source"), col("doc_id").as("keep_id"))
        .orderBy("lang", "source")
    }),
    // Ground-truth n-gram Jaccard pairs on a bounded block (quadratic —
    // the oracle-checkable baseline the LSH path approximates).
    "dedup_jaccard_pairs" -> ((s, dir) => {
      Dedup.jaccardPairs(docs(s, dir).filter(col("doc_id") < 200),
          "doc_id", "text", threshold = 0.5)
        .orderBy("a_id", "b_id")
    }),
    // MinHash+LSH candidate generation + exact refine. Rows-only check
    // (Spark xxhash64 has no DuckDB twin); ScalaTest asserts it finds
    // exactly the brute-force pairs at the same threshold.
    "dedup_minhash_lsh" -> ((s, dir) => {
      Dedup.minhashLshPairs(docs(s, dir), "doc_id", "text", threshold = 0.5)
        .orderBy("a_id", "b_id")
    }),
    // SimHash near-dup pairs at Hamming distance <= 6 on a bounded block.
    "dedup_simhash" -> ((s, dir) => {
      val withSig = docs(s, dir).filter(col("doc_id") < 200)
        .select(col("doc_id"), Dedup.simhash64(col("text")).as("sig"))
      val a = withSig.toDF("a_id", "a_sig")
      val b = withSig.toDF("b_id", "b_sig")
      a.join(b, col("a_id") < col("b_id"))
        .withColumn("ham", Dedup.hamming64(col("a_sig"), col("b_sig")))
        .filter(col("ham") <= 6)
        .select(col("a_id"), col("b_id"), col("ham").cast("long").as("ham"))
        .orderBy("a_id", "b_id")
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "dedup_exact_firstwins" ->
      """SELECT lang, source, min(doc_id) AS keep_id
        |FROM documents GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin,
    "dedup_jaccard_pairs" ->
      """WITH sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    range(1, greatest(len(string_split_regex(trim(text), '\s+')) - 1, 1)),
        |    i -> string_split_regex(trim(text), '\s+')[i] || ' ' ||
        |         string_split_regex(trim(text), '\s+')[i+1] || ' ' ||
        |         string_split_regex(trim(text), '\s+')[i+2])) AS g
        |  FROM documents WHERE doc_id < 200)
        |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
        |  round(CAST(len(list_filter(a.g, x -> list_contains(b.g, x)))
        |          AS DOUBLE)
        |    / (len(a.g) + len(b.g)
        |       - len(list_filter(a.g, x -> list_contains(b.g, x)))), 4)
        |    AS jaccard
        |FROM sh a, sh b
        |WHERE a.doc_id < b.doc_id
        |  AND CAST(len(list_filter(a.g, x -> list_contains(b.g, x))) AS DOUBLE)
        |    / (len(a.g) + len(b.g)
        |       - len(list_filter(a.g, x -> list_contains(b.g, x)))) >= 0.5
        |ORDER BY a_id, b_id""".stripMargin,
  )
}
