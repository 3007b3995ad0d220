package graft.embed

import org.apache.spark.ml.feature.{HashingTF, IDF, Normalizer, RegexTokenizer}
import org.apache.spark.ml.linalg.{Vector => MlVector}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Text → `array<float>` embedding seam.
  *
  * The reference embeds with a Hugging Face transformer inside an
  * Arrow-batched pandas_udf (mean pooling over token embeddings,
  * reference src/databricks/syntetic_data.py:135-169); heavy models are an
  * environment adapter, so the engine ships deterministic featurizers with
  * the same contract: add `embedding: array<float>` (nullable on failure)
  * + `timestamp` to a corpus DataFrame. Everything is a distributed
  * column transform — no driver-side loops, no Python boundary.
  */
trait Embedder {
  def dim: Int
  /** Adds `embedding array<float>` and `timestamp` columns. Null/empty
    * text rows get a null embedding (excluded later at index build —
    * reference returns None rows on failure, syntetic_data.py:140,169). */
  def embed(corpus: DataFrame, textCol: String): DataFrame
}

/** MLlib HashingTF+IDF pipeline embedder: tokenizer → hashed term
  * frequencies → inverse-document-frequency weighting → L2 normalize →
  * dense `array<float>`. Deterministic given the corpus; scales as two
  * passes (IDF fit is one treeAggregate) + one map. */
final class HashingTfIdfEmbedder(override val dim: Int = 64) extends Embedder {

  override def embed(corpus: DataFrame, textCol: String): DataFrame = {
    val withId = corpus
    val tok = new RegexTokenizer().setInputCol(textCol).setOutputCol("__tokens")
      .setPattern("\\s+")
    val tf = new HashingTF().setInputCol("__tokens").setOutputCol("__tf")
      .setNumFeatures(dim)
    val tokenized = tf.transform(tok.transform(
      withId.withColumn(textCol, coalesce(col(textCol), lit("")))))
    val idf = new IDF().setInputCol("__tf").setOutputCol("__idf")
      .fit(tokenized)
    val norm = new Normalizer().setInputCol("__idf").setOutputCol("__vec")
      .setP(2.0)
    val out = norm.transform(idf.transform(tokenized))
    toFloatArray(out, "__vec", "embedding")
      .withColumn("embedding",
        when(col(textCol).isNull || col(textCol) === "", lit(null))
          .otherwise(col("embedding")))
      .withColumn("timestamp", current_timestamp())
      .drop("__tokens", "__tf", "__idf", "__vec")
  }

  /** MLlib Vector → array<float> at the operator boundary (SURVEY.md §1.2). */
  private def toFloatArray(df: DataFrame, in: String, out: String): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    df.withColumn(out, vector_to_array(col(in), "float32"))
  }
}

/** Deterministic hash-projection embedder with zero fitted state: token →
  * xxhash64(token, seed d) → signed contribution to dimension d. Pure
  * column expressions (codegen'd), single pass, fully streaming-safe —
  * the embedding path used when an index must be buildable in one scan
  * at 100 TB. */
final class HashProjectionEmbedder(override val dim: Int = 64) extends Embedder {

  /** The whole embed is ONE Catalyst expression
    * (graft.functions.TextHashEmbed): a HOF composition of the same math
    * gets inlined per downstream reference and re-evaluates inner
    * aggregates per array element — a measured ~30x blowup at bench
    * time. A single opaque node evaluates once per reference with a
    * tight loop inside. */
  override def embed(corpus: DataFrame, textCol: String): DataFrame =
    corpus
      .withColumn("embedding",
        graft.functions.TextExpressions.textHashEmbed(col(textCol), dim))
      .withColumn("timestamp", current_timestamp())
}
