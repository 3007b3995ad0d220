package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the crawl_corpus_langid stages. */
object LangidProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.register(spark)
    def timed[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.operators.LangModel
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
    // warm
    docs.count()
    val m = timed("train")(LangModel.langIdTrain(
      docs.filter(pmod(col("doc_id"), lit(2L)) === 0), "text", "lang"))
    val root = s"${System.getProperty("java.io.tmpdir")}/langid_prof"
    timed("persist") {
      m.priors.write.mode("overwrite").parquet(s"$root/priors")
      m.loglik.write.mode("overwrite").parquet(s"$root/loglik")
    }
    val model = LangModel.NbModel(
      spark.read.parquet(s"$root/priors"),
      spark.read.parquet(s"$root/loglik"))
    val odd = docs.filter(pmod(col("doc_id"), lit(2L)) === 1)
      .select(col("doc_id"), col("text").as("body")).localCheckpoint(true)
    (1 to 2).foreach { i =>
      timed(s"score-odd-raw rep$i")(
        LangModel.langIdScore(model, odd, "doc_id", "body")
          .groupBy("predicted").count().collect())
    }
    // the in-memory (non-reloaded) model for comparison
    (1 to 2).foreach { i =>
      timed(s"score-odd-raw-mem rep$i")(
        LangModel.langIdScore(m, odd, "doc_id", "body")
          .groupBy("predicted").count().collect())
    }
    // the synthesized expected text (longer, full survivor set)
    val all = docs.select(col("doc_id"),
      concat(lit("Doc "), col("doc_id"), lit(" Doc "), col("doc_id"),
        lit(" "), col("text"), lit(" refs refs Home & About")).as("body"))
      .localCheckpoint(true)
    (1 to 2).foreach { i =>
      timed(s"score-all-expected rep$i")(
        LangModel.langIdScore(model, all, "doc_id", "body")
          .groupBy("predicted").count().collect())
    }
    // the real cell, stage by stage
    (1 to 2).foreach { i =>
      val scored = timed(s"cell-score rep$i") {
        val sc = LangModel.langIdScore(model, all, "doc_id", "body")
          .localCheckpoint(true)
        sc.count(); sc
      }
      timed(s"cell-rollup rep$i")(
        scored.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
          .groupBy("lang", "predicted")
          .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_id"))
          .orderBy("lang", "predicted").collect())
    }
    // the shipped cells for comparison
    (1 to 2).foreach { i =>
      timed(s"q corpus_pipeline rep$i")(
        graft.SparkEntry.queries("crawl_corpus_pipeline")(spark, sfDir)
          .collect())
      timed(s"q corpus_langid rep$i")(
        graft.SparkEntry.queries("crawl_corpus_langid")(spark, sfDir)
          .collect())
    }
    spark.stop()
  }
}
