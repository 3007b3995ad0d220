package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Table loaders over the driver-provided parquet layout (TESTDATA.md).
  * The reference names tables `catalog.schema.table` in Unity Catalog
  * (reference src/databricks/syntetic_data.py:35); here a scale-factor
  * directory of parquet files plays the catalog role — path-based, which
  * is also the 100 TB-friendly layout (partitioned parquet/iceberg dirs).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Explicit schema of the reference's embedded-corpus shape
    * (reference src/databricks/syntetic_data.py:113,172-175): corpus cols
    * + nullable embedding + ingest timestamp. Used by the Embedder/index.
    */
  def embeddedCorpusSchema(idType: DataType = LongType): StructType =
    StructType(Seq(
      StructField("id", idType, nullable = false),
      StructField("text", StringType, nullable = true),
      StructField("embedding", ArrayType(FloatType, containsNull = false),
        nullable = true),
      StructField("timestamp", TimestampType, nullable = true)))
}
