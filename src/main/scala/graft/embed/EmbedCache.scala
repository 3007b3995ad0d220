package graft.embed

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Content-addressed embedding reuse — the recompute-avoidance layer a
  * re-run 100 TB pipeline needs: embedding dominates cost, yet between
  * pipeline runs most documents are unchanged. The cache is a plain
  * parquet table `(__key, embedding)` keyed by `xxhash64(text)`; a run
  * embeds ONLY texts whose key is absent and appends them, so run N+1
  * pays for the delta, not the corpus.
  *
  * Plan shape: one key join against the cache for hits, one anti-join
  * for misses (both plain shuffles on the 8-byte key), the embedder
  * runs over distinct missing TEXTS only, and one append write. A
  * single tiny driver action (`isEmpty`) decides whether the embed
  * stage runs at all — a no-change re-run never invokes the embedder.
  *
  * Correctness contract: the embedder must be deterministic per text
  * (all graft embedders are — hashing/TF-IDF with a frozen model), and
  * the caller must key the cache per embedder (`cachePath` per model
  * tag) — reusing one cache across different embedders returns wrong
  * vectors by construction. 64-bit content keys collide with
  * probability ~n²/2⁶⁵; pair the key with a length column or switch to
  * md5 if that risk matters at your scale. One writer at a time:
  * concurrent appends can double-insert a key — serialize cache
  * maintenance the way you would any upsert target. As defense in
  * depth, [[readCache]] dedupes keys (embedders are deterministic, so
  * duplicate rows are identical and any survivor is correct — a slipped
  * double-insert degrades performance, never correctness), and
  * [[compact]] removes the duplicates physically while narrowing the
  * append-accreted file count. */
object EmbedCache {

  /** `docs` + an `embedding` column, cache-backed. Appends new
    * `(key, embedding)` rows to `cachePath` as a side effect. */
  def embedWithCache(spark: SparkSession, docs: DataFrame, textCol: String,
      embedder: FittedEmbedder, cachePath: String): DataFrame = {
    val keyed = docs.withColumn("__key", xxhash64(col(textCol)))
    val cached = readCache(spark, cachePath)
    val missTexts = keyed
      .join(cached.select("__key"), Seq("__key"), "left_anti")
      .select(col("__key"), col(textCol))
      .dropDuplicates("__key")
    if (!missTexts.isEmpty) {
      embedder.transform(missTexts, textCol)
        .filter(col("embedding").isNotNull)
        .select(col("__key"), col("embedding"))
        .write.mode(SaveMode.Append).parquet(cachePath)
    }
    keyed.join(readCache(spark, cachePath), Seq("__key"), "left")
      .drop("__key")
  }

  /** Rows currently in the cache, one per key (0 when it doesn't exist
    * yet). The key dedupe is one map-side-partial aggregation on the
    * 8-byte key — a no-op-priced guard on a healthy cache, and the
    * thing that keeps a slipped concurrent double-insert from
    * multiplying rows through the hit join. */
  def readCache(spark: SparkSession, cachePath: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(cachePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(cachePath).dropDuplicates("__key")
    else {
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("__key", LongType),
          StructField("embedding", ArrayType(FloatType)))))
    }
  }

  /** Physical cache maintenance: dedupe keys AND narrow the
    * append-accreted file count in one pass, swapped in with the same
    * hidden-sibling rename protocol as
    * [[graft.operators.Maintenance.compactParquet]]. Crash-safe (the
    * full copy survives any single failure: old is renamed aside
    * before new moves in), but NOT concurrency-safe — between the two
    * renames the cache path briefly does not exist, and a concurrent
    * [[embedWithCache]] run that reads-then-appends in that window can
    * re-embed rows or collide with the swap. Run it under the same
    * single-writer contract as the appends (quiesce readers too).
    * Unlike plain compaction this pays one shuffle on the 8-byte key —
    * that IS the dedupe. After it, [[readCache]]'s guard aggregates
    * nothing. */
  def compact(spark: SparkSession, cachePath: String,
      targetFileBytes: Long = 128L * 1024 * 1024)
      : graft.operators.CompactionReport = {
    val dir = new org.apache.hadoop.fs.Path(cachePath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return graft.operators.CompactionReport(0, 0, 0L)
    def dataFiles() = fs.listStatus(dir).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    val before = dataFiles()
    val bytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(dir.getParent,
      s".${dir.getName}__compact_tmp")
    val old = new org.apache.hadoop.fs.Path(dir.getParent,
      s".${dir.getName}__compact_old")
    spark.read.parquet(cachePath).dropDuplicates("__key")
      .coalesce(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(old, true)
    fs.rename(dir, old)
    fs.rename(tmp, dir)
    fs.delete(old, true)
    graft.operators.CompactionReport(before.length, dataFiles().length,
      bytes)
  }
}
