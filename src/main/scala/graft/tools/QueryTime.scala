package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import java.util.concurrent.atomic.AtomicInteger

/** Dev tool: warm-time named SparkEntry queries with a job counter.
  *
  * `runMain graft.tools.QueryTime <sfDir> <reps> <name> [<name>...]`
  *
  * Runs the same warmup block Bench.main uses (JIT / codegen / parquet
  * footer / committer / streaming-engine init), then reps each named
  * query, printing per-rep wall time and the number of Spark jobs the
  * rep scheduled — the per-action fixed cost at local[N] is ~70-100 ms,
  * so job count is the first thing to read on a drifted cell. */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    // extra confs for A/B experiments: QT_CONF="k=v,k=v"
    sys.env.get("QT_CONF").foreach(_.split(',').filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.register(spark)
    graft.plans.WindowTopK.enable(spark)
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    // same warmup as Bench.main
    try {
      spark.range(1000000L).selectExpr("sum(id)").collect()
      graft.core.Tables.names.foreach { n =>
        try spark.read.parquet(s"$sfDir/$n.parquet").count()
        catch { case _: Throwable => () }
      }
      graft.SparkEntry.queries.get("knn_cosine_single")
        .foreach(fn => fn(spark, sfDir).count())
      val warm = spark.range(0, 10000L)
        .selectExpr("id % 7 AS g", "CAST(id AS DOUBLE) AS s", "id AS p")
      graft.plans.TopK.perGroup(warm, "g", "s", "p", 3,
        descending = false).count()
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions.row_number
      val w = Window.partitionBy("g").orderBy("s")
      warm.withColumn("r", row_number().over(w)).filter("r <= 3")
        .localCheckpoint(true)
        .write.mode("overwrite").parquet(
          s"${System.getProperty("java.io.tmpdir")}/graft_qt_warm")
    } catch { case _: Throwable => () }
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"[qt] $name: NOT FOUND")
        case Some(fn) =>
          (1 to reps).foreach { rep =>
            jobs.set(0)
            val t0 = System.nanoTime()
            val n = try fn(spark, sfDir).count()
                    catch { case e: Throwable =>
                      println(s"[qt] $name rep$rep FAILED: $e"); -1L }
            val secs = (System.nanoTime() - t0) / 1e9
            println(f"[qt] $name rep$rep: $secs%.2f s  jobs=${jobs.get}  rows=$n")
          }
      }
    }
    spark.stop()
  }
}
