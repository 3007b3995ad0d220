package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Table maintenance: small-file compaction. Incremental syncs and
  * micro-batch streaming writes accrete files far below the scan-optimal
  * size; at 100 TB the file listing itself becomes a bottleneck and
  * every task pays open/footer costs. Compaction reads the directory,
  * repartitions to ~`targetFileBytes` per output file, and swaps the
  * result in with the same crash-safe rename protocol as
  * `VectorIndex.sync` (old copy aside → new into place → drop old; no
  * window where the table is missing).
  */
final case class CompactionReport(
    filesBefore: Int, filesAfter: Int, bytes: Long)

object Maintenance {

  /** List data files (ignores _SUCCESS and hidden files). */
  private def dataFiles(spark: SparkSession, dir: Path) = {
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(dir).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
  }

  /** Compact a parquet directory. PARTITION-AWARE: a `partitionBy`
    * layout (subdirectories named `key=value`, e.g. an IVF index
    * persisted by cell) is compacted per leaf directory, preserving the
    * exact directory structure partition pruning depends on — flattening
    * it through one top-level coalesce would silently destroy the
    * pruning. Leaves compact independently (each is its own small Spark
    * job — at scale, run them concurrently or only for leaves whose file
    * count exceeds a threshold). Temp/old directories are HIDDEN
    * siblings (`.name__compact_*`), so a concurrent reader's partition
    * discovery never lists a half-written leaf. */
  def compactParquet(spark: SparkSession, path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): CompactionReport = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val partDirs = fs.listStatus(dir).filter { st =>
      st.isDirectory && st.getPath.getName.contains("=")
    }
    if (partDirs.nonEmpty) {
      // hive-partitioned layout (possibly multi-level): recurse per leaf
      val reports = partDirs.map(st =>
        compactParquet(spark, st.getPath.toString, targetFileBytes))
      CompactionReport(reports.map(_.filesBefore).sum,
        reports.map(_.filesAfter).sum, reports.map(_.bytes).sum)
    } else {
      val before = dataFiles(spark, dir)
      val bytes = before.map(_.getLen).sum
      val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
      val df = spark.read.parquet(path)
      val tmp = new Path(dir.getParent, s".${dir.getName}__compact_tmp")
      val old = new Path(dir.getParent, s".${dir.getName}__compact_old")
      // coalesce, not repartition: compaction must not pay a shuffle — it
      // only narrows the file count (nOut <= current partitions in the
      // small-file case this exists for)
      df.coalesce(nOut).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      fs.delete(old, true)
      fs.rename(dir, old)
      fs.rename(tmp, dir)
      fs.delete(old, true)
      CompactionReport(before.length, dataFiles(spark, dir).length, bytes)
    }
  }
}
