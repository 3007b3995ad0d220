package graft.tools

import graft.functions.Metric
import graft.search.Ann
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Persisted-IVF walkthrough: build → partitionBy(cell) persist →
  * probe → show that the scan prunes to the probed cell directories.
  * Run: `sbt "runMain graft.tools.IvfDemo /root/testdata/sf0.001"`. */
object IvfDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val path = java.nio.file.Files.createTempDirectory("ivfdemo").toString + "/idx"
    Ann.persistIvf(Ann.buildIvf(emb.filter(col("vec_id") >= 10),
      "embedding", 8), path)
    println("== cell directories on disk:")
    new java.io.File(path).listFiles().map(_.getName).sorted
      .foreach(n => println(s"   $n"))
    val out = Ann.queryPersistedIvf(spark, Ann.PersistedIvf(path),
      emb.filter(col("vec_id") < 3), "vec_id", "embedding",
      "vec_id", "embedding", k = 3, nProbe = 2, Metric.Cosine)
    println("== scan line from the executed plan:")
    out.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("PartitionFilters") || l.contains("Scan parquet"))
      .foreach(l => println("   " + l.trim.take(150)))
    println("== results:")
    out.show()
    spark.stop()
  }
}
