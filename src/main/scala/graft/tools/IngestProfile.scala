package graft.tools

import graft.operators.{Dedup, NearDupIndex}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage wall times for the deduplicated-ingest
  * pipeline at a given sf — where does a batch actually spend time
  * (probe vs sweep vs sync vs setup)?
  * Usage: runMain graft.tools.IngestProfile [sfDir] */
object IngestProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.index.ChangeLog
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull && trim(col("text")) =!= "")
      .select("doc_id", "text")
    val root = java.nio.file.Files
      .createTempDirectory("graft_ingprof").toString
    // warm-up round so JIT/codegen don't land on stage 1
    NearDupIndex.persist(d.filter(col("doc_id") >= 300), "doc_id",
      "text", s"$root/warm", algo = "md5")
    val wIdx = NearDupIndex.load(spark, s"$root/warm")
    NearDupIndex.admitBatch(spark, wIdx,
      d.filter(col("doc_id") < 100), "doc_id", "text", 0.5).count()

    t("persist seed") {
      NearDupIndex.persist(d.filter(col("doc_id") >= 300), "doc_id",
        "text", s"$root/idx", algo = "md5")
    }
    val idx = t("load")(NearDupIndex.load(spark, s"$root/idx"))
    for ((lo, hi) <- Seq((0, 100), (100, 200), (200, 300))) {
      val batch = d.filter(col("doc_id") >= lo && col("doc_id") < hi)
      val admitted = t(s"admit [$lo,$hi)") {
        val a = NearDupIndex.admitBatch(spark, idx, batch, "doc_id",
          "text", 0.5)
        a.count(); a
      }
      t(s"sync  [$lo,$hi)") {
        NearDupIndex.sync(spark, idx,
          admitted.withColumn("__op", lit(ChangeLog.OpInsert))
            .withColumn("__seq", lit(0L)),
          "doc_id", "text")
      }
    }
    spark.stop()
  }
}
