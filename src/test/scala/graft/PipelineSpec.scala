package graft

import graft.embed.HashProjectionEmbedder
import org.apache.spark.sql.functions._
import java.nio.file.Files

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("corpus pipeline: quality -> exact dedup -> near-dup -> embed -> index") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text")
    // plant an exact duplicate and an empty doc to exercise the stages
    val planted = docs
      .union(docs.filter($"doc_id" === 8).select(lit(90001L), $"text"))
      .union(Seq((90002L, "")).toDF("doc_id", "text"))
    val path = Files.createTempDirectory("graft_pipe").toString + "/idx"
    val (embedded, report) = new CorpusPipeline(minQuality = 0.5,
      nearDupJaccard = 0.8)
      .run(spark, planted, "doc_id", "text",
        new HashProjectionEmbedder(32), Some(path))

    assert(report.input === 502)
    assert(report.afterQuality < report.input, "empty/low-quality dropped")
    assert(report.afterExact === report.afterQuality - 1,
      "exactly the planted byte-identical copy is removed")
    assert(report.afterNearDup <= report.afterExact,
      "near-dup pass only removes")
    // fixture docs 8 and 12 are near-identical (jaccard 0.97): the
    // higher id must be gone, the lower kept
    val ids = embedded.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.contains(8L) && !ids.contains(12L))
    // the persisted index holds exactly the surviving docs, embedded
    val idx = spark.read.parquet(path)
    assert(idx.count() === report.afterNearDup)
    assert(idx.schema.fieldNames.contains("embedding") &&
      idx.schema.fieldNames.contains("__norm"))
  }
}
