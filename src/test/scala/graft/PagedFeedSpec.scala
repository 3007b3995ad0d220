package graft

import org.apache.spark.sql.functions._

class PagedFeedSpec extends SparkSpec {

  private def feed(total: Int, pageSize: Int) =
    spark.read.format("graft_feed")
      .option("total", total).option("pageSize", pageSize).load()

  test("reads exactly `total` rows across page partitions") {
    val df = feed(1000, 250)
    assert(df.count() === 1000)
    assert(df.rdd.getNumPartitions === 4)
  }

  test("last partial page is not padded") {
    assert(feed(1001, 250).count() === 1001)
    assert(feed(1001, 250).rdd.getNumPartitions === 5)
  }

  test("column pruning reaches the reader") {
    val pruned = feed(100, 50).select("category")
    assert(pruned.schema.fieldNames.toSeq === Seq("category"))
    assert(pruned.distinct().count() === 4)
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("category") && !planStr.contains("summary"))
  }

  test("rows are deterministic and schema matches the arXiv shape") {
    val r = feed(10, 3).filter(col("id") === "arxiv:7").head()
    assert(r.getAs[String]("title") === "Paper 7")
    assert(r.getAs[String]("category") === "cs.DC")
    assert(r.getAs[String]("published") === "2020-01-08")
    assert(feed(10, 3).schema === graft.sources.PagedFeed.schema)
  }
}
