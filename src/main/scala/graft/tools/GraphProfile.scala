package graft.tools

import graft.functions.Metric
import graft.search.GraphAnn
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: split ann_graph_topk's cost into edge build vs beam search
  * (each timed warm) to aim optimization at the right stage. */
object GraphProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[gprof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = e.filter(col("vec_id") >= 5 && col("vec_id") < 1000)
    val queries = e.filter(col("vec_id") < 5)
    val graph0 = GraphAnn.buildGraphExact(corpus, "embedding", "vec_id", 6)
    val edges = time("edge-build+checkpoint") {
      graph0.edges.localCheckpoint(true)
    }
    for (rep <- 1 to 3; sp <- Seq(0, 1, 4)) {
      time(s"rep$rep beam-search sp=$sp") {
        GraphAnn.queryGraph(GraphAnn.KnnGraph(edges, 6), corpus, queries,
          "vec_id", "embedding", "vec_id", "embedding",
          k = 3, entries = 4, beam = 4, hops = 3, metric = Metric.L2,
          entryMod = 5L, materializeEdges = false,
          statePartitions = sp).collect()
      }
    }
    spark.stop()
  }
}
