package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run named SparkEntry.phases entries (the build/sync/score
  * splits the bench emits) in a warm session —
  * `runMain graft.tools.PhaseTime <sfDir> <reps> <name> [<name>...]` */
object PhaseTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftExtensions.register(spark)
    graft.plans.WindowTopK.enable(spark)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    names.foreach { name =>
      graft.SparkEntry.phases.get(name) match {
        case None => println(s"[pt] $name: NOT FOUND")
        case Some(fn) =>
          (1 to reps).foreach { rep =>
            val t0 = System.nanoTime()
            val m = fn(spark, sfDir)
            val total = (System.nanoTime() - t0) / 1e9
            val parts = m.map { case (k, v) => f"$k=$v%.2f" }.mkString(" ")
            println(f"[pt] $name rep$rep: $total%.2f s  $parts")
          }
      }
    }
    spark.stop()
  }
}
