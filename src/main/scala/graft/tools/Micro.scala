package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: microbenchmark primitive operations to separate environment
  * cost from plan cost. */
object Micro {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    def time[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[micro] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s ($r)")
    }
    // pure JVM speed
    time("jvm-loop-1e9") { var s = 0L; var i = 0L; while (i < 1000000000L) { s += i; i += 1 }; s }
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    time("session-up") { 1 }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    time("scan-count-1") { li.count() }
    time("scan-count-2") { li.count() }
    time("agg-sum") { li.agg(sum("l_quantity")).collect()(0) }
    time("groupBy-agg") { li.groupBy("l_returnflag").agg(sum("l_quantity")).collect().length }
    (1 to 8).foreach { i =>
      time(s"range-join-bhj-$i") { spark.range(600000)
        .join(broadcast(spark.range(150000)), "id").count() }
    }
    (1 to 3).foreach { i =>
      time(s"collect-orders-$i") {
        spark.read.parquet(s"$sfDir/orders.parquet")
          .select("o_orderkey").collect().length }
    }
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
    time("join-bhj") { li.join(broadcast(o),
      li("l_orderkey") === o("o_orderkey")).count() }
    time("join-bhj-2") { li.join(broadcast(o),
      li("l_orderkey") === o("o_orderkey")).count() }
    time("shuffle-join") { li.join(o.hint("merge"),
      li("l_orderkey") === o("o_orderkey")).count() }
    spark.stop()
  }
}
