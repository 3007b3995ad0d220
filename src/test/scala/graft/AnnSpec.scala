package graft

import graft.functions.Metric
import graft.search.{Ann, Knn}
import org.apache.spark.sql.functions._

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet").cache()
  private lazy val corpus = emb.filter($"vec_id" >= 10)
  private lazy val queries = emb.filter($"vec_id" < 10)

  private lazy val exactTop3: Map[Long, Seq[Long]] =
    Knn.batchQuery(corpus, queries, "embedding", "vec_id", "embedding",
      "vec_id", k = 3, Metric.Cosine)
      .select("query_id", "rank", "vec_id").collect()
      .groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("vec_id")).toSeq)
      .toMap

  test("IVF with full probe returns exactly the exact top-k") {
    val idx = Ann.buildIvf(corpus, "embedding", k = 8)
    val r = Ann.queryIvf(idx, queries, "vec_id", "embedding", "vec_id",
      "embedding", k = 3, nProbe = 8, Metric.Cosine)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("vec_id")).toSeq)
      .toMap
    assert(r === exactTop3)
  }

  test("IVF with partial probe reaches recall >= 0.5") {
    val idx = Ann.buildIvf(corpus, "embedding", k = 8)
    val r = Ann.queryIvf(idx, queries, "vec_id", "embedding", "vec_id",
      "embedding", k = 3, nProbe = 2, Metric.Cosine)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val recalls = exactTop3.map { case (q, exact) =>
      r.get(q).map(found => exact.count(found.contains).toDouble / exact.size)
        .getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall $mean too low")
  }

  test("LSH candidates refine to high recall within distance budget") {
    val idx = Ann.buildLsh(corpus, "embedding", bucketLength = 2.0,
      numTables = 4)
    val r = Ann.queryLsh(idx, queries, "vec_id", "embedding", "vec_id",
      k = 3, maxDistance = 2.0)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    // L2-based LSH vs cosine exact: compare against l2 exact instead
    val exactL2 = Knn.batchQuery(corpus, queries, "embedding", "vec_id",
      "embedding", "vec_id", k = 3, Metric.L2)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val recalls = exactL2.map { case (q, exact) =>
      r.get(q).map(found => exact.count(found.contains).toDouble / exact.size)
        .getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall $mean too low")
  }
}
