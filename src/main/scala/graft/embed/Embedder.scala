package graft.embed

import org.apache.spark.ml.feature.{HashingTF, IDF, IDFModel, Normalizer, RegexTokenizer}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Text → `array<float>` embedding seam.
  *
  * The reference embeds with a Hugging Face transformer inside an
  * Arrow-batched pandas_udf (mean pooling over token embeddings,
  * reference src/databricks/syntetic_data.py:135-169); heavy models are an
  * environment adapter, so the engine ships deterministic featurizers with
  * the same contract: add `embedding: array<float>` (nullable on failure)
  * + `timestamp` to a corpus DataFrame. Everything is a distributed
  * column transform — no driver-side loops, no Python boundary.
  *
  * Fit/transform split: an `Embedder` may learn corpus-level state (IDF
  * weights). `fit` captures that state once, at index build, into a
  * [[FittedEmbedder]]; incremental sync and query-text embedding MUST go
  * through the fitted instance so a small change batch (or a single query
  * string) is embedded in the SAME weighting space as the indexed corpus.
  * Re-fitting on the delta would silently produce incomparable cosine
  * scores.
  */
trait Embedder {
  def dim: Int

  /** Learn any corpus-level state and return the transform to apply. */
  def fit(corpus: DataFrame, textCol: String): FittedEmbedder

  /** One-shot convenience: fit on `corpus` and embed it. */
  final def embed(corpus: DataFrame, textCol: String): DataFrame =
    fit(corpus, textCol).transform(corpus, textCol)
}

/** The frozen transform: applies build-time state to any batch. */
trait FittedEmbedder extends Serializable {
  def dim: Int
  /** Adds `embedding array<float>` and `timestamp` columns. Null/empty
    * text rows get a null embedding (excluded later at index build —
    * reference returns None rows on failure, syntetic_data.py:140,169). */
  def transform(df: DataFrame, textCol: String): DataFrame
}

/** MLlib HashingTF+IDF pipeline embedder: tokenizer → hashed term
  * frequencies → inverse-document-frequency weighting → L2 normalize →
  * dense `array<float>`. Deterministic given the corpus; scales as two
  * passes (IDF fit is one treeAggregate) + one map. The fitted instance
  * carries the `IDFModel` so deltas/queries reuse build-time weights. */
final class HashingTfIdfEmbedder(override val dim: Int = 64) extends Embedder {

  override def fit(corpus: DataFrame, textCol: String): FittedEmbedder = {
    val tokenized = FittedTfIdf.featurize(corpus, textCol, dim)
    val model = new IDF().setInputCol("__tf").setOutputCol("__idf")
      .fit(tokenized)
    new FittedTfIdf(dim, model)
  }
}

private object FittedTfIdf {
  def featurize(df: DataFrame, textCol: String, dim: Int): DataFrame = {
    val tok = new RegexTokenizer().setInputCol(textCol).setOutputCol("__tokens")
      .setPattern("\\s+")
    val tf = new HashingTF().setInputCol("__tokens").setOutputCol("__tf")
      .setNumFeatures(dim)
    tf.transform(tok.transform(
      df.withColumn(textCol, coalesce(col(textCol), lit("")))))
  }
}

private[embed] final class FittedTfIdf(
    override val dim: Int,
    private[embed] val model: IDFModel) extends FittedEmbedder {

  override def transform(df: DataFrame, textCol: String): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    val norm = new Normalizer().setInputCol("__idf").setOutputCol("__vec")
      .setP(2.0)
    val out = norm.transform(model.transform(
      FittedTfIdf.featurize(df, textCol, dim)))
    out
      .withColumn("embedding", vector_to_array(col("__vec"), "float32"))
      .withColumn("embedding",
        when(col(textCol).isNull || col(textCol) === "", lit(null))
          .otherwise(col("embedding")))
      .withColumn("timestamp", current_timestamp())
      .drop("__tokens", "__tf", "__idf", "__vec")
  }
}

/** Persistence for fitted embedders: a managed index saves its fitted
  * transform beside the index artifact so a fresh session can reopen
  * the index AND keep embedding queries/deltas in the build-time
  * weighting space. The IDF model rides MLlib's own writer; stateless
  * embedders persist as a marker. */
object FittedEmbedders {

  private def fs(spark: org.apache.spark.sql.SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeString(spark: org.apache.spark.sql.SparkSession,
      path: String, s: String): Unit = {
    val out = fs(spark, path).create(new org.apache.hadoop.fs.Path(path), true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  private def readString(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[String] = {
    val f = fs(spark, path)
    val p = new org.apache.hadoop.fs.Path(path)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    }
  }

  def save(spark: org.apache.spark.sql.SparkSession, fitted: FittedEmbedder,
      textCol: String, path: String): Unit = fitted match {
    case t: FittedTfIdf =>
      t.model.write.overwrite().save(s"$path/model")
      writeString(spark, s"$path/embedder.json",
        s"""{"kind":"tfidf","dim":${t.dim},"textCol":"$textCol"}""")
    case h: HashProjectionEmbedder =>
      writeString(spark, s"$path/embedder.json",
        s"""{"kind":"hashproj","dim":${h.dim},"textCol":"$textCol"}""")
    case m: Md5FeatureEmbedder =>
      writeString(spark, s"$path/embedder.json",
        s"""{"kind":"md5feat","dim":${m.dim},"textCol":"$textCol"}""")
    case other =>
      throw new IllegalArgumentException(
        s"cannot persist embedder ${other.getClass.getName}")
  }

  /** Returns (fitted embedder, text column) if one was saved here. */
  def load(spark: org.apache.spark.sql.SparkSession,
      path: String): Option[(FittedEmbedder, String)] =
    readString(spark, s"$path/embedder.json").map { json =>
      def str(k: String) = ("\"" + k + "\":\"([^\"]*)\"").r
        .findFirstMatchIn(json).map(_.group(1)).getOrElse(
          throw new IllegalStateException(s"bad embedder meta: $json"))
      val dim = "\"dim\":(\\d+)".r.findFirstMatchIn(json)
        .map(_.group(1).toInt).getOrElse(64)
      val fitted: FittedEmbedder = str("kind") match {
        case "tfidf" =>
          new FittedTfIdf(dim, IDFModel.load(s"$path/model"))
        case "hashproj" => new HashProjectionEmbedder(dim)
        case "md5feat" => new Md5FeatureEmbedder(dim)
        case other =>
          throw new IllegalStateException(s"unknown embedder kind $other")
      }
      (fitted, str("textCol"))
    }
}

/** Deterministic hash-projection embedder with zero fitted state: token →
  * xxhash64(token, seed d) → signed contribution to dimension d. Pure
  * column expressions (codegen'd), single pass, fully streaming-safe —
  * the embedding path used when an index must be buildable in one scan
  * at 100 TB. Stateless ⇒ it is its own fitted form. */
final class HashProjectionEmbedder(override val dim: Int = 64)
    extends Embedder with FittedEmbedder {

  override def fit(corpus: DataFrame, textCol: String): FittedEmbedder = this

  /** The whole embed is ONE Catalyst expression
    * (graft.functions.TextHashEmbed): a HOF composition of the same math
    * gets inlined per downstream reference and re-evaluates inner
    * aggregates per array element — a measured ~30x blowup at bench
    * time. A single opaque node evaluates once per reference with a
    * tight loop inside. */
  override def transform(corpus: DataFrame, textCol: String): DataFrame =
    corpus
      .withColumn("embedding",
        graft.functions.TextExpressions.textHashEmbed(col(textCol), dim))
      .withColumn("timestamp", current_timestamp())
}

/** MD5 feature-hashing embedder (stateless): token → md5 digest → byte 7
  * picks the dimension, bit 6 the sign (graft.functions
  * .Md5FeatureHashEmbed). Components are small exact integers and MD5 is
  * a published cross-engine standard, so downstream cosine rankings are
  * bit-reproducible by ANY engine with `md5()` — the auditable embedding
  * path (a 100 TB index build can be spot-verified row-for-row in SQL).
  * xx-hash [[HashProjectionEmbedder]] stays the throughput default. */
final class Md5FeatureEmbedder(override val dim: Int = 64)
    extends Embedder with FittedEmbedder {

  override def fit(corpus: DataFrame, textCol: String): FittedEmbedder = this

  override def transform(corpus: DataFrame, textCol: String): DataFrame =
    corpus
      .withColumn("embedding",
        graft.functions.TextExpressions.md5FeatureEmbed(col(textCol), dim))
      .withColumn("timestamp", current_timestamp())
}

/** Precomputed-embedding lookup "embedder": vectors computed upstream by
  * an external model service or batch job, joined in by primary key —
  * how a production pipeline actually attaches embeddings when the model
  * is too heavy to run inline (the reference's own corpus carries its
  * vectors in a table for exactly this reason). Implements the Embedder
  * contract so the pipeline's embed seam is interchangeable between
  * compute-inline and join-precomputed.
  *
  * Scale shape: ONE equi-join on the pk (broadcast when the vector table
  * is small, shuffle-hash otherwise — Catalyst's call); docs with no
  * vector row get a null embedding, the standard embed-failure contract
  * downstream stages already honor. Contract: `tableIdCol` must be
  * unique in `table` (a pk) — a duplicate key would multiply corpus
  * rows through the join. */
final class PrecomputedEmbedder(table: DataFrame, tableIdCol: String,
    tableVecCol: String, docIdCol: String, override val dim: Int)
    extends Embedder with FittedEmbedder {

  override def fit(corpus: DataFrame, textCol: String): FittedEmbedder =
    this

  override def transform(corpus: DataFrame, textCol: String): DataFrame =
    corpus.join(
        table.select(col(tableIdCol).as(docIdCol),
          col(tableVecCol).as("embedding")),
        Seq(docIdCol), "left")
      .withColumn("timestamp", current_timestamp())
}
