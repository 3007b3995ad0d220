package graft

import graft.functions.Metric
import graft.search.Ann
import org.apache.spark.sql.functions._
import java.nio.file.Files

class PersistedIvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet").cache()
  private lazy val corpus = emb.filter($"vec_id" >= 10)
  private lazy val queries = emb.filter($"vec_id" < 3)

  test("persisted IVF probe prunes partitions at the scan") {
    val path = Files.createTempDirectory("graft_pivf").toString + "/idx"
    val built = Ann.buildIvf(corpus, "embedding", k = 8)
    Ann.persistIvf(built, path)
    // cell dirs exist on disk
    val dirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("__cell=")).map(_.getName).toSet
    assert(dirs.size === 8)

    val out = Ann.queryPersistedIvf(spark, Ann.PersistedIvf(path), queries,
      "vec_id", "embedding", "vec_id", "embedding", k = 3, nProbe = 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__cell"),
      s"probe must prune by partition:\n${plan.take(2000)}")
    val rows = out.collect()
    assert(rows.length === queries.count() * 3)

    // matches the in-memory IVF at the same probe setting
    val mem = Ann.queryIvf(built, queries, "vec_id", "embedding",
      "vec_id", "embedding", k = 3, nProbe = 2, Metric.Cosine)
      .select("query_id", "rank", "vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val disk = out.select("query_id", "rank", "vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(disk === mem)
  }
}
