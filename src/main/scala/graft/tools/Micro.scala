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
    locally {
      val spark2 = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false").getOrCreate()
      val docs = spark2.read.parquet(s"$sfDir/documents.parquet")
        .filter(col("doc_id") < 200)
      val e = new graft.embed.HashProjectionEmbedder(64)
      time("embed-200-count-1") { e.embed(docs, "text").select("embedding").count() }
      time("embed-200-count-2") { e.embed(docs, "text").select("embedding").count() }
      time("embed-200-collect") { e.embed(docs, "text").select("embedding").collect().length }
      val emb = e.embed(docs, "text")
      time("embed-knn-score") {
        val qv = emb.filter(col("doc_id") === 0).select("embedding").head().getSeq[Float](0)
        graft.search.Knn.singleQuery(emb.filter(col("doc_id") =!= 0), "embedding",
          "doc_id", qv, 5, graft.functions.Metric.Cosine).collect().length
      }
      locally {
        import graft.functions.{Metric, VectorFunctions => VF}
        val qv = emb.filter(col("doc_id") === 0).select("embedding")
          .head().getSeq[Float](0)
        time("knn-head-qv") { 1 }
        val corpus = emb.filter(col("doc_id") =!= 0)
        val scored = corpus.filter(col("embedding").isNotNull)
          .withColumn("score", VF.cosine(col("embedding"), lit(qv.toArray)))
        time("knn-score-count") { scored.count() }
        time("knn-score-select-count") { scored.select("score").count() }
        val ordered = scored.orderBy(col("score").desc, col("doc_id").asc).limit(5)
        time("knn-ordered-collect") { ordered.collect().length }
        time("knn-full") { graft.search.Knn.singleQuery(corpus, "embedding",
          "doc_id", qv, 5, Metric.Cosine).collect().length }
      }
      val sh200 = graft.operators.Dedup.withShingles(docs, "doc_id", "text", 3)
      time("shingles-200") { sh200.select(size(col("sh"))).count() }
      time("minhash-sig-200") { sh200.withColumn("sig",
        graft.operators.Dedup.minhashSignature(col("sh"), 16))
        .select(size(col("sig"))).count() }
    }
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
