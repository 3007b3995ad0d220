package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `explain("formatted")` physical plans of named SparkEntry
  * queries to one file per query — the before/after plan evidence for
  * optimization rounds.
  * `runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <name>...` */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args.drop(3).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftExtensions.register(spark)
    graft.plans.WindowTopK.enable(spark)
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => println(s"[plan] $name: NOT FOUND")
        case Some(fn) =>
          try {
            val df = fn(spark, sfDir)
            val plan = df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
            Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
              plan.getBytes("UTF-8"))
            println(s"[plan] $name -> $outDir/${name}_$suffix.txt")
          } catch { case e: Throwable =>
            println(s"[plan] $name FAILED: $e")
          }
      }
    }
    spark.stop()
  }
}
