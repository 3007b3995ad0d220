package graft

import graft.operators.{LangModel, Packing, TextAnalysis}
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet").cache()
  private val cap = 128

  test("concatPack: offsets chain (next start = prev start + tokens mod cap)") {
    val out = Packing.concatPack(docs, "doc_id", "text", cap, buckets = 4)
      .orderBy("bucket", "id").collect()
    out.groupBy(_.getInt(0)).foreach { case (_, rows) =>
      var cum = 0L
      rows.foreach { r =>
        assert(r.getLong(5) === cum % cap, s"start_offset at id ${r.getLong(1)}")
        assert(r.getLong(3) === cum / cap, "seq_first")
        assert(r.getLong(4) === (cum + r.getLong(2) - 1) / cap, "seq_last")
        cum += r.getLong(2)
      }
    }
  }

  test("concatPack: placement invariant under repartitioning") {
    def key(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("bucket", "id").collect().map(_.toSeq).toSeq
    assert(key(Packing.concatPack(docs, "doc_id", "text", cap, 4))
      === key(Packing.concatPack(docs.repartition(13), "doc_id", "text", cap, 4)))
  }

  test("nextFitPack: no sequence exceeds capacity unless a single doc does") {
    val out = Packing.nextFitPack(docs, "doc_id", "text", cap, buckets = 4)
    val bad = out.groupBy("bucket", "seq")
      .agg(sum("n_tokens").as("tok"), count(lit(1)).as("n"))
      .filter(col("tok") > cap && col("n") > 1)
    assert(bad.count() === 0L, "multi-doc sequence over capacity")
  }

  test("nextFitPack: replays the next-fit recurrence exactly") {
    val out = Packing.nextFitPack(docs, "doc_id", "text", cap, buckets = 4)
      .orderBy("bucket", "id").collect()
    out.groupBy(_.getInt(0)).foreach { case (_, rows) =>
      var seq = 0L; var fill = -1L
      rows.foreach { r =>
        val t = r.getLong(2)
        if (fill < 0) fill = t
        else if (fill + t <= cap) fill += t
        else { seq += 1; fill = t }
        assert(r.getLong(3) === seq, s"seq at id ${r.getLong(1)}")
      }
    }
  }

  test("nextFitPack: every doc appears exactly once") {
    val n = docs.filter(col("text").isNotNull && trim(col("text")) =!= "")
      .count()
    val out = Packing.nextFitPack(docs, "doc_id", "text", cap, buckets = 4)
    assert(out.count() === n)
    assert(out.select("id").distinct().count() === n)
  }

  test("bigramCrossEntropy: uniform text scores zero, varied text higher") {
    val df = Seq(
      (1L, "a a a a a a"),          // only bigram "a a": p=… relative
      (2L, "a b c d e f")
    ).toDF("id", "text")
    val out = LangModel.bigramCrossEntropy(df, "id", "text")
      .orderBy("id").collect()
    // doc 1: bigram "a a" has n2=5; context "a" appears as w1 in
    // "a a"×5 and "a b"×1 → n1=6 ⇒ nll = ln(6/5) ≈ 0.1823
    assert(math.abs(out(0).getDouble(2) - math.log(6.0 / 5.0)) < 1e-3)
    // doc 2's bigrams are all unique with context count 1 except "a b"
    // (context a has n1=6) → mean nll > doc 1's
    assert(out(1).getDouble(2) > out(0).getDouble(2))
  }

  test("bigramCrossEntropy: n_bigrams = tokens - 1 per doc") {
    val expect = docs
      .filter(col("text").isNotNull && trim(col("text")) =!= "")
      .select(col("doc_id").as("id"),
        (TextAnalysis.tokenCount(col("text")) - 1).cast("long").as("want"))
      .filter(col("want") >= 1)
    val got = LangModel.bigramCrossEntropy(docs, "doc_id", "text")
      .select("id", "n_bigrams")
    assert(got.join(expect, "id").filter(col("n_bigrams") =!= col("want"))
      .count() === 0L)
    assert(got.count() === expect.count())
  }
}
