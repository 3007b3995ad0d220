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
    * rows to flow through in tests and rows-only queries. */
  def syntheticMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      when(pmod(col(idCol), lit(3)) === 0, "image")
        .when(pmod(col(idCol), lit(3)) === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col(textCol), "UTF-8").as("content"),
      lit("application/octet-stream").as("mime"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"))
}
