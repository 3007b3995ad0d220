package graft

import graft.functions.Metric
import graft.search.Knn
import org.apache.spark.sql.functions._

class KnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet").cache()
  private lazy val qv: Seq[Float] =
    emb.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0)

  test("singleQuery returns exactly k rows, rank 1..k, sorted by score") {
    val r = Knn.singleQuery(emb.filter($"vec_id" =!= 0), "embedding",
      "vec_id", qv, k = 7, Metric.Cosine).collect()
    assert(r.length === 7)
    assert(r.map(_.getAs[Int]("rank")).toSeq === (1 to 7))
    val scores = r.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("singleQuery excludes null embeddings instead of crashing") {
    val withNull = emb.limit(10).select($"vec_id", $"embedding")
      .union(Seq((9999L, null.asInstanceOf[Seq[Float]])).toDF("vec_id", "embedding"))
    val r = Knn.singleQuery(withNull, "embedding", "vec_id", qv, 20, Metric.Cosine)
    assert(!r.collect().exists(_.getAs[Long]("vec_id") == 9999L))
  }

  test("batchQuery yields k rows per query with contiguous ranks") {
    val r = Knn.batchQuery(emb.filter($"vec_id" >= 5), emb.filter($"vec_id" < 5),
      "embedding", "vec_id", "embedding", "vec_id", k = 4, Metric.Cosine)
    val perQuery = r.groupBy("query_id").agg(count(lit(1)).as("n"),
      max("rank").as("mx")).collect()
    assert(perQuery.length === 5)
    perQuery.foreach { row =>
      assert(row.getAs[Long]("n") === 4L && row.getAs[Int]("mx") === 4)
    }
  }

  test("bounded-heap batch path returns exactly the window path's rows") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "vec_id").collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
          r.getAs[Long]("vec_id"))).toSet
    val corpus = emb.filter($"vec_id" >= 5)
    val queries = emb.filter($"vec_id" < 5)
    Seq(Metric.Cosine, Metric.L2).foreach { m =>
      val window = rows(Knn.batchQuery(corpus, queries, "embedding",
        "vec_id", "embedding", "vec_id", 4, m))
      val agg = rows(Knn.batchQueryAgg(corpus, queries, "embedding",
        "vec_id", "embedding", "vec_id", 4, m))
      assert(agg === window, s"metric $m")
    }
  }

  test("bounded-heap path partially aggregates before the exchange") {
    val p = Knn.batchQueryAgg(emb.filter($"vec_id" >= 5),
      emb.filter($"vec_id" < 5), "embedding", "vec_id", "embedding",
      "vec_id", 3, Metric.Cosine)
      .queryExecution.executedPlan.toString
    // partial ObjectHashAggregate/SortAggregate must appear below the
    // shuffle: only k rows per query per partition cross the wire
    assert(p.contains("partial_topkaggregator") ||
      p.toLowerCase.contains("partial"), p)
  }

  test("top-k of a union is contained in union of top-ks") {
    val corpusA = emb.filter($"vec_id" >= 5 && $"vec_id" < 250)
    val corpusB = emb.filter($"vec_id" >= 250)
    def ids(df: org.apache.spark.sql.DataFrame, k: Int): Set[Long] =
      Knn.singleQuery(df, "embedding", "vec_id", qv, k, Metric.Cosine)
        .collect().map(_.getAs[Long]("vec_id")).toSet
    val k = 5
    val unionTopk = ids(corpusA.union(corpusB), k)
    assert(unionTopk.subsetOf(ids(corpusA, k) ++ ids(corpusB, k)))
  }

  test("l2 and cosine agree on normalized vectors (rank order)") {
    import graft.functions.{VectorFunctions => VF}
    val normed = emb.filter($"vec_id" =!= 0)
      .select($"vec_id", VF.normalize($"embedding").as("embedding"))
    val nq = {
      val n = math.sqrt(qv.map(x => x.toDouble * x).sum)
      qv.map(x => (x / n).toFloat)
    }
    def ranks(m: Metric) =
      Knn.singleQuery(normed, "embedding", "vec_id", nq, 5, m)
        .collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(ranks(Metric.Cosine) === ranks(Metric.L2))
  }
}
