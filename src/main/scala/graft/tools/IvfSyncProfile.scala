package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Dev tool: phase-level wall/job breakdown of the ann_ivf_synced
  * chain (build -> persist -> sync -> query), to localize per-action
  * fixed cost. `runMain graft.tools.IvfSyncProfile <sfDir> <reps>` */
object IvfSyncProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.get("IVFP_EXT").contains("1")) {
      graft.GraftExtensions.register(spark)
      graft.plans.WindowTopK.enable(spark)
      println("[ivfp] extensions ON")
    }
    val fixedRoot = sys.env.get("IVFP_FIXED_ROOT").contains("1")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def phase[A](label: String)(f: => A): A = {
      jobs.set(0)
      val t0 = System.nanoTime()
      val r = f
      println(f"[ivfp] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s  jobs=${jobs.get}")
      r
    }
    // warmup
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val e0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    e0.count()
    import graft.search.Ann
    import graft.index.ChangeLog
    (1 to reps).foreach { rep =>
      println(s"--- rep $rep ---")
      val e = e0
      val initial = e.filter(col("vec_id") >= 15)
      val built = phase("build")(
        Ann.buildIvfDeterministic(initial, "embedding", "vec_id", 16))
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_ivfprof/" +
        (if (fixedRoot) "fixed" else s"r$rep")
      phase("persist")(Ann.persistIvf(built, root))
      val changes = e.filter(col("vec_id") >= 5 && col("vec_id") < 15)
        .withColumn("__op", lit(ChangeLog.OpInsert))
        .withColumn("__seq", lit(1L))
        .unionByName(e.filter(col("vec_id") === 20)
          .withColumn("__op", lit(ChangeLog.OpDelete))
          .withColumn("__seq", lit(2L)))
      phase("sync")(Ann.syncPersistedIvf(spark, Ann.PersistedIvf(root),
        changes, "vec_id", "embedding"))
      phase("query")(Ann.queryPersistedIvf(spark, Ann.PersistedIvf(root),
          e.filter(col("vec_id") < 5), "vec_id", "embedding",
          "vec_id", "embedding", k = 3, nProbe = 4)
        .select(col("query_id"), col("rank").cast("long").as("rnk"),
          col("vec_id"))
        .orderBy("query_id", "rnk").count())
    }
    spark.stop()
  }
}
