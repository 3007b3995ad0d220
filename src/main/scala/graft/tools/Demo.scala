package graft.tools

import graft.VectorSearch
import graft.embed.HashProjectionEmbedder
import graft.index.ChangeLog
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end walkthrough of the reference notebook flow on the public
  * API: endpoint → managed-embedding delta-sync index over the
  * `documents` corpus → similarity_search by text → incremental sync →
  * search again. Run: `sbt "runMain graft.tools.Demo /root/testdata/sf0.001"`. */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = java.nio.file.Files.createTempDirectory("graft_demo").toString
    val vs = new VectorSearch(spark, root)
    vs.createEndpoint("vector-search-endpoint")

    val corpus = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    val index = vs.createDeltaSyncIndex("vector-search-endpoint", corpus,
      "demo_idx", primaryKey = "id", embeddingSourceColumn = "text",
      embedder = new HashProjectionEmbedder(64))

    println("== similarity_search(columns=[id,text], query_text=..., k=3)")
    index.similaritySearch(Seq("id", "text"),
        queryText = "spark query join window hash", numResults = 3)
      .show(20, 60)

    println("== index stats")
    index.describe.show()

    println("== sync: delete the previous top hit, search again")
    val top = index.similaritySearch(Seq("id"),
      queryText = "spark query join window hash", numResults = 1)
      .head().getAs[Long]("id")
    val del = corpus.filter(col("id") === top)
      .withColumn("__op", lit(ChangeLog.OpDelete))
      .withColumn("__seq", lit(1L))
    index.sync(del)
    index.similaritySearch(Seq("id", "text"),
        queryText = "spark query join window hash", numResults = 3)
      .show(20, 60)
    println(s"(doc $top deleted — must be absent above)")

    println("== corpus pipeline: quality -> dedup -> near-dup -> embed -> index")
    val (_, report) = new graft.CorpusPipeline(minQuality = 0.5,
      nearDupJaccard = 0.8)
      .run(spark, corpus.withColumnRenamed("id", "doc_id"), "doc_id", "text",
        new HashProjectionEmbedder(64), Some(s"$root/pipeline_idx"))
    println(s"   input=${report.input} afterQuality=${report.afterQuality} " +
      s"afterExactDedup=${report.afterExact} afterNearDup=${report.afterNearDup}")

    println("== hybrid search: BM25 + vector, RRF-fused")
    val emb = new HashProjectionEmbedder(64)
    val corpusVec = emb.embed(corpus.withColumnRenamed("id", "doc_id"), "text")
    val qdf = emb.embed(
      spark.createDataFrame(Seq(Tuple1("spark query join window hash")))
        .toDF("text"), "text")
      .select(lit(0L).as("qid"), col("text").as("qtext"),
        col("embedding").as("qvec"))
    graft.search.Hybrid.hybridTopK(corpusVec, qdf, "qid", "qtext", "qvec",
        "doc_id", "text", "embedding", n = 10, k = 3)
      .show(5, 60)

    println("== trainer feed: pack the corpus into 512-token sequences")
    graft.operators.Packing.nextFitPack(
        corpus.withColumnRenamed("id", "doc_id"), "doc_id", "text",
        capacity = 512, buckets = 4)
      .groupBy("bucket", "seq").agg(count(lit(1)).as("docs"),
        sum("n_tokens").as("tokens"))
      .orderBy("bucket", "seq").show(8)
    spark.stop()
  }
}
