package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet").cache()

  test("rate 0 keeps nothing, rate 1 keeps everything") {
    assert(Sampling.deterministicSample(docs, "doc_id", 0.0).count() === 0L)
    assert(Sampling.deterministicSample(docs, "doc_id", 1.0).count()
      === docs.count())
  }

  test("deterministic: identical id set across runs and repartitionings") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().toSet
    val a = ids(Sampling.deterministicSample(docs, "doc_id", 0.3))
    val b = ids(Sampling.deterministicSample(
      docs.repartition(17), "doc_id", 0.3))
    assert(a === b && a.nonEmpty)
  }

  test("kept fraction tracks the rate") {
    val n = docs.count().toDouble
    val kept = Sampling.deterministicSample(docs, "doc_id", 0.5).count()
    assert(math.abs(kept / n - 0.5) < 0.15,
      s"kept ${kept / n} at rate 0.5")
  }

  test("stratified rates apply per stratum, default elsewhere") {
    val out = Sampling.stratifiedSample(docs, "doc_id", "source",
      Map("src0" -> 1.0, "src1" -> 0.0), default = 0.5)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val all = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") === all("src0"), "rate-1.0 stratum keeps all")
    assert(!bySrc.contains("src1"), "rate-0.0 stratum keeps none")
  }
}
