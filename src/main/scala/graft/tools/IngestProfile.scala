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
    // fused path on a fresh index — same batches, one call each
    t("persist seed (fused run)") {
      NearDupIndex.persist(d.filter(col("doc_id") >= 300), "doc_id",
        "text", s"$root/idx2", algo = "md5")
    }
    val idx2 = NearDupIndex.load(spark, s"$root/idx2")
    // per-job wall times inside each fused call
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(e.jobId, System.nanoTime())
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = starts.remove(e.jobId)
          if (s != 0L) jobs.add((e.jobId, System.nanoTime() - s))
        }
      })
    for ((lo, hi) <- Seq((0, 100), (100, 200), (200, 300))) {
      val batch = d.filter(col("doc_id") >= lo && col("doc_id") < hi)
      jobs.clear()
      t(s"admitAndSync [$lo,$hi)") {
        NearDupIndex.admitAndSync(spark, idx2, batch, "doc_id",
          "text", 0.5)
      }
      Thread.sleep(300)
      val snap = jobs.toArray(Array.empty[(Int, Long)])
      println(s"[profile]   jobs=${snap.length}  " + snap.sortBy(-_._2)
        .take(8).map(j => f"#${j._1}:${j._2 / 1e9}%.2fs").mkString(" "))
    }
    // end-to-end replica of the ingest_neardup_pipeline entry with
    // per-phase wall times
    val r3 = java.nio.file.Files.createTempDirectory("graft_ingprof_e2e")
      .toString
    t("e2e persist seed") {
      NearDupIndex.persist(d.filter(col("doc_id") >= 300), "doc_id",
        "text", s"$r3/idx", algo = "md5")
    }
    t("e2e journal writes") {
      d.filter(col("doc_id") < 100).coalesce(1)
        .write.mode("append").parquet(s"$r3/journal")
      d.filter(col("doc_id") >= 100 && col("doc_id") < 200).coalesce(1)
        .write.mode("append").parquet(s"$r3/journal")
      d.filter(col("doc_id") >= 200 && col("doc_id") < 300).coalesce(1)
        .write.mode("append").parquet(s"$r3/journal")
    }
    t("e2e streaming run (3 batches)") {
      graft.streaming.DedupIngest.run(spark, s"$r3/idx", s"$r3/journal",
        d.schema, s"$r3/ckpt", "doc_id", "text", threshold = 0.5,
        Map("maxFilesPerTrigger" -> "1"))
    }
    t("e2e final read") {
      spark.read.parquet(s"$r3/idx_docs").count()
    }
    // ---- vector-side twin (ingest_vec_pipeline's floor evidence) ----
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("embedding").isNotNull)
      .select("vec_id", "embedding")
    val rv = java.nio.file.Files.createTempDirectory("graft_ingprof_vec")
      .toString
    t("vec persist seed") {
      graft.search.Ann.persistSignLsh(
        graft.search.Ann.buildSignLsh(e.filter(col("vec_id") >= 300),
          "embedding", tables = 8, bits = 4),
        "vec_id", "embedding", s"$rv/idx")
    }
    val vIdx = graft.search.Ann.PersistedSignLsh(s"$rv/idx", 8, 4)
    for ((lo, hi) <- Seq((0, 100), (100, 200), (200, 300))) {
      val batch = e.filter(col("vec_id") >= lo && col("vec_id") < hi)
      jobs.clear()
      t(s"vec admitAndSync [$lo,$hi)") {
        graft.streaming.VecDedupIngest.admitAndSync(spark, vIdx, batch,
          "vec_id", "embedding", threshold = 0.95)
      }
      Thread.sleep(300)
      val snap = jobs.toArray(Array.empty[(Int, Long)])
      println(s"[profile]   jobs=${snap.length}  " + snap.sortBy(-_._2)
        .take(8).map(j => f"#${j._1}:${j._2 / 1e9}%.2fs").mkString(" "))
    }
    spark.stop()
  }
}
