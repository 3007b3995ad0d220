package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset, Row}

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, processed partition-batched.
  *
  * The decode step itself is STUBBED (no image/audio libraries in this
  * container — marked below); everything Spark-side is real: the schema,
  * the partition-batched execution shape (`mapPartitions`, the Scala
  * analog of the reference's Arrow-batched pandas_udf,
  * reference src/databricks/syntetic_data.py:135-169), null handling,
  * and deterministic fake features so downstream operators (dedup,
  * similarity) are testable end-to-end.
  */
object Multimodal {

  /** A media row: the `binary` payload + typed metadata the pipeline
    * carries for pruning and batching decisions. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  final case class MediaFeature(media_id: Long, kind: String,
      n_bytes: Long, feature: Array[Float])

  /** Deterministic stand-in for a real decoder+featurizer.
    *
    * STUB: a real implementation would decode the payload (JPEG/PNG/WAV
    * frame extraction) and run a vision/audio encoder per batch. The
    * container has no such libraries, so features are a seeded hash
    * projection of the bytes — deterministic, dimension-correct, and
    * cheap, which keeps the distributed plumbing honest. */
  private def fakeFeature(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes == null) return out
    var h = 1125899906842597L // FNV-ish rolling state
    var i = 0
    while (i < bytes.length) {
      h = h * 31 + bytes(i); i += 1
      out((i % dim + dim) % dim) += (h % 97).toFloat / 97f
    }
    var d = 0
    var norm = 0.0
    while (d < dim) { norm += out(d) * out(d); d += 1 }
    val n = math.sqrt(norm)
    if (n > 0) { d = 0; while (d < dim) { out(d) = (out(d) / n).toFloat; d += 1 } }
    out
  }

  /** Decode + featurize, partition-batched. The `mapPartitions` shape is
    * deliberate: per-partition setup cost (model load in a real impl —
    * the reference loads its HF model once per worker via closure
    * capture) is paid once per partition, not per row. */
  def extractFeatures(media: DataFrame, dim: Int = 64): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "content")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // real impl: initialize decoder/encoder HERE, once per partition
        rows.map { case (id, kind, bytes) =>
          MediaFeature(id, kind,
            if (bytes == null) 0L else bytes.length.toLong,
            fakeFeature(bytes, dim))
        }
      }
  }

  /** Synthesize a deterministic media table from the documents corpus
    * (payload = utf-8 bytes of the text) so the multimodal path has real
    * rows to flow through in tests and oracle-checked queries. Metadata
    * is a pure function of the text so a SQL oracle can reproduce it:
    * images get a text-length-derived geometry, audio/video a
    * 10 ms-per-character duration. */
  def syntheticMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      when(pmod(col(idCol), lit(3)) === 0, "image")
        .when(pmod(col(idCol), lit(3)) === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col(textCol), "UTF-8").as("content"),
      lit("application/octet-stream").as("mime"),
      when(pmod(col(idCol), lit(3)) === 0,
        (lit(16) + pmod(length(col(textCol)), lit(64))).cast("int"))
        .otherwise(lit(null)).as("width"),
      when(pmod(col(idCol), lit(3)) === 0,
        (lit(16) + pmod(length(col(textCol)), lit(48))).cast("int"))
        .otherwise(lit(null)).as("height"),
      when(pmod(col(idCol), lit(3)) =!= 0,
        (length(col(textCol)) * 10L).cast("long"))
        .otherwise(lit(null)).as("duration_ms"))

  /** Frame sampling: one frame every `everyMs` over `[0, duration_ms]`,
    * endpoints inclusive — video rows explode to
    * `(media_id, frame_idx, ts_ms, frame)`. The explosion is pure
    * Catalyst (`sequence` + `explode`, codegen'd, fully distributed);
    * only the frame DECODE is stubbed (a deterministic byte slice —
    * a real impl would seek the container format and decode the frame
    * at ts_ms here, per partition). */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame = {
    require(everyMs > 0, s"everyMs must be positive, got $everyMs")
    media
      .filter(col("kind") === "video" && col("content").isNotNull &&
        col("duration_ms").isNotNull)
      .withColumn("ts_ms",
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))))
      .withColumn("frame_idx", (col("ts_ms") / everyMs).cast("long"))
      // STUB decode: slice of the payload at a ts-dependent offset
      .withColumn("frame",
        expr("substring(content, cast(ts_ms % 64 AS int) + 1, 64)"))
      .select("media_id", "frame_idx", "ts_ms", "frame")
  }

  /** Resize: image rows get `w x h` geometry and a payload bounded by
    * the raw RGB budget `w*h*3`; non-images pass through untouched.
    * STUB: real resampling would decode+scale per partition — the
    * byte-budget truncation keeps the metadata/size contract honest. */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val isImage = col("kind") === "image" && col("content").isNotNull
    media
      .withColumn("content",
        when(isImage, expr(s"substring(content, 1, ${w * h * 3})"))
          .otherwise(col("content")))
      .withColumn("width", when(isImage, lit(w)).otherwise(col("width")))
      .withColumn("height", when(isImage, lit(h)).otherwise(col("height")))
  }
}
