package graft.tools

import graft.functions.Metric
import graft.search.GraphAnn
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: phase-level timing of the ann_graph_synced chain. */
object TimeGraphSync {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 3).foreach { rep =>
      println(s"=== rep $rep ===")
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val initial = e.filter(col("vec_id") >= 15 && col("vec_id") < 600)
      val batch = e.filter(col("vec_id") >= 5 && col("vec_id") < 15)
      val corpus = e.filter(col("vec_id") >= 5 && col("vec_id") < 600)
      val graph = t("build")(GraphAnn.buildGraphExact(initial, "embedding",
        "vec_id", m = 6))
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_tgs/$rep"
      val pg = t("persist")(GraphAnn.persistGraph(graph, root, buckets = 16))
      t("sync")(GraphAnn.syncPersistedGraph(spark, pg, initial, batch,
        "vec_id", "embedding"))
      val out = t("query")(GraphAnn.queryPersistedGraph(spark, pg, corpus,
        e.filter(col("vec_id") < 5), "vec_id", "embedding",
        "vec_id", "embedding", k = 3, entries = 4, beam = 4, hops = 3,
        metric = Metric.L2, entryMod = 5L).collect())
      println(s"rows=${out.length}")
    }
    spark.stop()
  }
}
