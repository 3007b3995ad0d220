package graft.tools

import graft.plans.WindowTopK
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Evidence harness for the WindowTopK rewrite: times the identical
  * per-group top-k query with the optimizer rule OFF (WindowExec: full
  * shuffle + per-partition sort) vs ON (partial/final heaps) on a
  * synthesized table. Args: [rows] [groups] [k] [reps], defaults
  * 5e6 / 5e4 / 3 / 3. Prints per-rep seconds and the plan node used.
  */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(5000000L)
    val groups = args.lift(1).map(_.toLong).getOrElse(50000L)
    val k = args.lift(2).map(_.toInt).getOrElse(3)
    val reps = args.lift(3).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.range(rows)
      .select(
        (col("id") % groups).as("grp"),
        (hash(col("id")).cast("double") / Int.MaxValue).as("score"),
        col("id").as("pk"))
      .cache()
    base.count() // materialize

    def query() = {
      val w = Window.partitionBy("grp")
        .orderBy(col("score").desc, col("pk").asc)
      base.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= k)
        .agg(count(lit(1)), sum("score")) // consume without collect cost
    }

    def time(label: String): Unit = {
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        query().collect()
        println(f"$label rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      val plan = query().queryExecution.executedPlan.toString
      val node = if (plan.contains("WindowTopKFinal")) "WindowTopKExec"
        else "WindowExec"
      println(s"$label plan node: $node")
    }

    time("window ")
    WindowTopK.enable(spark)
    time("rewrite")
    spark.stop()
  }
}
