package graft.index

import graft.functions.{Metric, VectorFunctions => VF}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Engine-level vector index: the open-primitive equivalent of the
  * reference's delta-sync index (reference src/databricks/syntetic_data.py:
  * 95-107,195-211 — endpoint + index over a source table, PK-keyed,
  * TRIGGERED sync). An index is a persisted, normalized copy of
  * `(pk, vector[, payload cols])` plus metadata; `rebuild()` recomputes it
  * from the source table, `sync()` merges a change-log batch by PK
  * (graft.index.ChangeLog). ANN variants add a bucket column on top
  * (graft.search.Ann).
  *
  * 100 TB design notes: the build is one scan + optional repartition by
  * pk-hash (co-locates later merge work); vectors are L2-normalized at
  * build so cosine queries run as dot products; rows with null vectors
  * are excluded, never crash the build (SURVEY.md §1.2).
  */
final case class IndexMeta(
    name: String,
    pkCol: String,
    vecCol: String,
    dim: Int,
    metric: Metric,
    path: String)

final class VectorIndex(val meta: IndexMeta) {

  /** Normalize + filter the source into index shape. */
  def prepare(source: DataFrame): DataFrame = {
    val valid = source.filter(col(meta.vecCol).isNotNull &&
      size(col(meta.vecCol)) === meta.dim)
    valid
      .withColumn("__norm", VF.norm(col(meta.vecCol)))
      .withColumn(meta.vecCol, VF.normalize(col(meta.vecCol)))
  }

  /** Full rebuild: recompute from the source table and overwrite the
    * persisted artifact (the TRIGGERED pipeline's batch path). */
  def rebuild(source: DataFrame, buckets: Int = 0): Unit = {
    val prepared = prepare(source)
    val placed =
      if (buckets > 0) prepared.repartition(buckets, col(meta.pkCol))
      else prepared
    placed.write.mode(SaveMode.Overwrite).parquet(meta.path)
  }

  def read(spark: SparkSession): DataFrame = spark.read.parquet(meta.path)

  /** Incremental sync: apply a change-log batch (last-write-wins by PK,
    * deletes honored, rows whose new vector is null leave the index) and
    * atomically swap the persisted artifact. Equivalent to rebuild over
    * source+log — asserted by the sync≡rebuild property test. */
  def sync(spark: SparkSession, changes: DataFrame): Unit = {
    val current = read(spark)
    val latest = ChangeLog.latestPerPk(changes, meta.pkCol)
    val upserts = prepare(latest.filter(col("__op") =!= ChangeLog.OpDelete)
      .drop("__op", "__seq"))
    val changedPks = latest.select(col(meta.pkCol))
    val merged = current.join(changedPks, Seq(meta.pkCol), "left_anti")
      .unionByName(upserts)
    // write via temp path: parquet overwrite of a path being read is unsafe
    val tmp = meta.path + "__tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(meta.path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }

  /** Index statistics — the observability a catalog needs. */
  def stats(spark: SparkSession): DataFrame =
    read(spark).agg(
      count(lit(1)).as("rows"),
      countDistinct(col(meta.pkCol)).as("distinct_pks"),
      round(avg("__norm"), 4).as("avg_norm"))
}

/** Catalog of index metadata — create/get/drop with IF-NOT-EXISTS
  * semantics mirroring the reference's try/delete/create dance
  * (syntetic_data.py:195-201). */
final class IndexCatalog(root: String) {
  private val indexes = scala.collection.mutable.Map[String, VectorIndex]()

  def create(name: String, pkCol: String, vecCol: String, dim: Int,
      metric: Metric, overwrite: Boolean = true): VectorIndex = {
    if (!overwrite && indexes.contains(name))
      throw new IllegalStateException(s"index $name exists")
    val idx = new VectorIndex(IndexMeta(name, pkCol, vecCol, dim, metric,
      s"$root/$name"))
    indexes(name) = idx
    idx
  }
  def get(name: String): Option[VectorIndex] = indexes.get(name)
  def drop(spark: SparkSession, name: String): Unit = {
    indexes.remove(name).foreach { idx =>
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(idx.meta.path), true)
    }
  }
}
