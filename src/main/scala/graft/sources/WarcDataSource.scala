package graft.sources

import java.io.{BufferedInputStream, EOFException, FilterInputStream, InputStream}
import java.util

import org.apache.hadoop.fs.{FSDataInputStream, FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 for gzip-member WARC files (`graft_warc`) — the
  * crawl-archive front door ahead of graft.operators.HtmlOps.
  *
  * Splittability without an index: each file is sliced into byte-range
  * [[WarcRangePartition]]s of `splitSize`; a reader owning range
  * [a, b) SYNCS to the first gzip-member boundary at-or-after `a`
  * (magic scan + inflate-and-check validation, [[Warc.looksLikeMember]])
  * and emits every member whose START offset lies in the range —
  * members straddling `b` belong to this range and overflow-read past
  * it, members straddling `a` belong to the previous one. Exactly-once
  * per record with no coordination, the Hadoop text-split discipline
  * applied to the gzip-member contract Common Crawl guarantees.
  *
  * At 100 TB: one 1 GiB .warc.gz becomes ~32 partitions at the default
  * 32 MiB split, executors each read ONLY their slice (plus the tail
  * overflow of one member), and column pruning drops payload bytes
  * when a query only wants URL/status governance columns.
  *
  * Usage: `spark.read.format("graft_warc").load(path)` where `path`
  * is one `.warc.gz` file or a directory of them. Options:
  * `splitSize` (bytes, default 32 MiB).
  */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft_warc"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Warc.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("graft_warc requires a path"))
    val splitSize = Option(properties.get("splitsize"))
      .orElse(Option(properties.get("splitSize")))
      .map(_.toLong).getOrElse(32L * 1024 * 1024)
    require(splitSize >= 64, s"splitSize too small: $splitSize")
    val maxFiles = Option(properties.get("maxfilespertrigger"))
      .orElse(Option(properties.get("maxFilesPerTrigger")))
      .map(_.toInt).getOrElse(0)
    val compactEvery = Option(properties.get("namelogcompactinterval"))
      .orElse(Option(properties.get("nameLogCompactInterval")))
      .map(_.toInt).getOrElse(10)
    new WarcTable(path, splitSize, maxFiles, compactEvery)
  }
}

class WarcTable(path: String, splitSize: Long, maxFilesPerTrigger: Int,
    nameLogCompactInterval: Int = 10)
    extends Table with SupportsRead {
  override def name(): String = s"graft_warc($path)"
  override def schema(): StructType = Warc.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(path, splitSize, maxFilesPerTrigger,
      nameLogCompactInterval)
}

class WarcScanBuilder(path: String, splitSize: Long,
    maxFilesPerTrigger: Int, nameLogCompactInterval: Int = 10)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = Warc.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new WarcScan(path, splitSize, required, maxFilesPerTrigger,
      nameLogCompactInterval)
}

class WarcScan(path: String, splitSize: Long, required: StructType,
    maxFilesPerTrigger: Int = 0, nameLogCompactInterval: Int = 10)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Streaming form: new `.warc.gz` files landing in the directory
    * drain incrementally — the shape of a live crawl, where fetchers
    * append archives and the corpus pipeline consumes them behind.
    * Offsets index a PROCESSED-NAME LOG under the checkpoint (the
    * FileStreamSource discipline), so archives landing in ANY name
    * order drain exactly once — including names that sort below
    * already-processed ones, and across restarts. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new WarcMicroBatch(path, splitSize, required, maxFilesPerTrigger,
      checkpointLocation, nameLogCompactInterval)

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(s => s.isFile &&
          (s.getPath.getName.endsWith(".warc.gz") ||
            s.getPath.getName.endsWith(".gz")))
          .sortBy(_.getPath.getName)
      else Array(fs.getFileStatus(p))
    files.flatMap { st =>
      val len = st.getLen
      (0L until len by splitSize).map { a =>
        WarcRangePartition(st.getPath.toString, a,
          math.min(a + splitSize, len))
      }
    }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // capture the session's Hadoop conf NOW (driver side) — readers
    // run on executors where no active session exists
    new WarcReaderFactory(required.fieldNames,
      new org.apache.spark.util.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active
          .sparkContext.hadoopConfiguration))
}

case class WarcRangePartition(file: String, start: Long, end: Long)
    extends InputPartition

/** Micro-batch stream over a directory of gzip-member WARC files.
  * Offsets index a PROCESSED-NAME LOG (the FileStreamSource
  * discipline): each batch's admitted archive names are written to
  * `<checkpoint>/graft_warc_names/<batchId>` BEFORE the offset is
  * returned, so (a) replay of an uncommitted batch after a crash
  * re-plans exactly the logged names, (b) a restart folds every
  * logged batch back into the processed set, and (c) an archive
  * landing in ANY name order — including below names already
  * processed (out-of-order fetcher, retry, clock-skewed timestamp) —
  * drains exactly once instead of being watermark-skipped. Driver
  * memory holds one entry per archive ever seen (the same bound
  * FileStreamSource's seenFiles carries — archives, not records).
  * Every `nameLogCompactInterval` batches the whole processed set is
  * folded into one `<id>.compact` snapshot (the FileStreamSource
  * compact-interval discipline), so a restart reads the newest
  * snapshot plus at most interval-many per-batch files — O(1) in the
  * life of the stream, not one file per batch ever run. Within a
  * batch, files split into the same byte-range partitions as the
  * batch read. */
class WarcMicroBatch(path: String, splitSize: Long, required: StructType,
    maxFilesPerTrigger: Int, checkpointLocation: String,
    nameLogCompactInterval: Int = 10)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxFiles}

  private case class BatchOffset(id: Long) extends Offset {
    override def json(): String = id.toString
  }

  private def conf = org.apache.spark.sql.SparkSession.active
    .sparkContext.hadoopConfiguration

  private def fs = new Path(path).getFileSystem(conf)

  private def logDir = new Path(checkpointLocation, "graft_warc_names")
  private def logFs = logDir.getFileSystem(conf)

  /** Names admitted to batch `id`, from the authoritative log. */
  private def readBatch(id: Long): Option[Seq[String]] = {
    val f = new Path(logDir, id.toString)
    val l = logFs
    if (!l.exists(f)) None
    else {
      val in = l.open(f)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filter(_.nonEmpty).toVector)
      finally in.close()
    }
  }

  /** Overwrite batch `id`'s name list (a stale file from a run that
    * died before its offset committed is superseded, not appended). */
  private def writeBatch(id: Long, names: Seq[String]): Unit = {
    val l = logFs
    l.mkdirs(logDir)
    val out = l.create(new Path(logDir, id.toString), true)
    try out.write((names.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  /** Snapshot of the ENTIRE processed set as of batch `id` — what a
    * restart reads instead of replaying every per-batch file. */
  private def writeCompact(id: Long, names: Set[String]): Unit = {
    val l = logFs
    l.mkdirs(logDir)
    val out = l.create(new Path(logDir, s"$id.compact"), true)
    try out.write(
      (names.toSeq.sorted.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def readCompact(id: Long): Set[String] = {
    val in = logFs.open(new Path(logDir, s"$id.compact"))
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toSet
    finally in.close()
  }

  /** Newest compacted snapshot at-or-below `upTo`, if any. */
  private def latestCompactId(upTo: Long): Option[Long] = {
    val l = logFs
    if (!l.exists(logDir)) None
    else l.listStatus(logDir).map(_.getPath.getName)
      .filter(_.endsWith(".compact"))
      .map(_.stripSuffix(".compact").toLong)
      .filter(_ <= upTo).sorted.lastOption
  }

  private def missingBatch(id: Long): Nothing =
    throw new IllegalStateException(
      s"graft_warc processed-name log: batch $id has no log file under " +
        s"$logDir. The log is written before its offset is returned, so " +
        "every committed/WAL'd batch must have one — failing loudly " +
        "instead of silently dropping that batch's archives.")

  /** Sorted archive names currently in the directory. */
  private def listNames(): Seq[String] = {
    val p = new Path(path)
    val f = fs
    if (!f.exists(p)) Seq.empty
    else if (f.getFileStatus(p).isDirectory)
      f.listStatus(p).filter(s => s.isFile &&
        (s.getPath.getName.endsWith(".warc.gz") ||
          s.getPath.getName.endsWith(".gz")))
        .map(_.getPath.getName).sorted.toSeq
    else Seq(p.getName)
  }

  // processed = union of logged batches (-1, loadedUpTo]; rebuilt
  // from the log on restart, maintained incrementally in-run
  private var processed: Set[String] = Set.empty
  private var loadedUpTo: Long = -1L

  private def loadProcessed(upTo: Long): Unit = {
    if (loadedUpTo < 0 && upTo >= 0) {
      // restart: fold the newest compacted snapshot first — O(1)
      // files — then only the per-batch tail written since it
      latestCompactId(upTo).foreach { cid =>
        processed ++= readCompact(cid)
        loadedUpTo = cid
      }
    }
    var id = loadedUpTo + 1
    while (id <= upTo) {
      processed ++= readBatch(id).getOrElse(missingBatch(id))
      id += 1
    }
    loadedUpTo = math.max(loadedUpTo, upTo)
  }

  // Trigger.AvailableNow pins the PENDING SET at prepare time, so the
  // drain terminates even while a crawler keeps appending.
  private var availableNowSet: Option[Set[String]] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowSet = Some(listNames().toSet)
  override def reportLatestOffset(): Offset = BatchOffset(loadedUpTo)

  override def initialOffset(): Offset = BatchOffset(-1L)
  override def deserializeOffset(json: String): Offset =
    BatchOffset(json.toLong)
  override def latestOffset(): Offset = reportLatestOffset()

  override def getDefaultReadLimit: ReadLimit =
    if (maxFilesPerTrigger > 0) ReadLimit.maxFiles(maxFilesPerTrigger)
    else ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[BatchOffset].id
    loadProcessed(from)
    val names = listNames()
    val pending0 = names.filterNot(processed)
    val pending = availableNowSet match {
      case Some(cap) => pending0.filter(cap)
      case None => pending0
    }
    val admitted = limit match {
      case m: ReadMaxFiles => pending.take(m.maxFiles())
      case _ => pending
    }
    if (admitted.isEmpty) BatchOffset(from)
    else {
      val next = from + 1
      writeBatch(next, admitted)
      processed ++= admitted
      loadedUpTo = math.max(loadedUpTo, next)
      // every interval-th batch, snapshot the whole processed set —
      // written before the offset returns, like the per-batch file;
      // per-batch files stay (crash replay of an uncommitted batch
      // still reads its own file), restarts just skip them
      if (nameLogCompactInterval > 0 &&
          next % nameLogCompactInterval == nameLogCompactInterval - 1)
        writeCompact(next, processed)
      BatchOffset(next)
    }
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val from = start.asInstanceOf[BatchOffset].id
    val until = end.asInstanceOf[BatchOffset].id
    val f = fs
    val p = new Path(path)
    val dir = f.exists(p) && f.getFileStatus(p).isDirectory
    // a batch in (start, end] was WAL'd by the engine, so its name
    // log MUST exist (it was written before the offset was returned);
    // a missing file is corruption, never an empty batch
    (from + 1 to until).flatMap(id => readBatch(id)
        .getOrElse(missingBatch(id)))
      .flatMap { n =>
        val fp = if (dir) new Path(p, n) else p
        val len = f.getFileStatus(fp).getLen
        (0L until len by splitSize).map(a =>
          WarcRangePartition(fp.toString, a, math.min(a + splitSize, len)))
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new WarcReaderFactory(required.fieldNames,
      new org.apache.spark.util.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active
          .sparkContext.hadoopConfiguration))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class WarcReaderFactory(cols: Array[String],
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(p.asInstanceOf[WarcRangePartition], cols, conf)
}

/** Reads the members starting inside one byte range. Two stream
  * handles: `dataIn` seeks per member (buffered reads may overrun the
  * member — harmless, the next member re-seeks by offset), `scanIn`
  * does the one-off sequential boundary sync. */
class WarcPartitionReader(part: WarcRangePartition, cols: Array[String],
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReader[InternalRow] {

  private val fs: FileSystem =
    new Path(part.file).getFileSystem(conf.value)
  private val dataIn: FSDataInputStream = fs.open(new Path(part.file))
  private var pos: Long = if (part.start == 0L) 0L else sync(part.start)
  private var current: Warc.Record = _

  /** A view of `in` that ignores close() — BufferedInputStream
    * wrappers come and go per member, the FS handle stays open. */
  private def noClose(in: InputStream): InputStream =
    new FilterInputStream(in) { override def close(): Unit = () }

  /** First member boundary at-or-after `from` (or -1): scan for the
    * gzip magic, validate each candidate by inflating its head and
    * checking the "WARC/" prefix — magic bytes inside compressed data
    * fail validation and the scan continues. */
  private def sync(from: Long): Long = {
    val scanIn = fs.open(new Path(part.file))
    try {
      scanIn.seek(from)
      val bin = new BufferedInputStream(noClose(scanIn), 65536)
      var off = from
      var b0 = bin.read(); var b1 = bin.read(); var b2 = bin.read()
      while (b2 >= 0 && off < part.end) {
        if (b0 == 0x1f && b1 == 0x8b && b2 == 0x08 && validate(off))
          return off
        off += 1
        b0 = b1; b1 = b2; b2 = bin.read()
      }
      -1L
    } finally scanIn.close()
  }

  private def validate(off: Long): Boolean = {
    dataIn.seek(off)
    Warc.looksLikeMember(new BufferedInputStream(noClose(dataIn), 8192))
  }

  override def next(): Boolean = {
    while (pos >= 0 && pos < part.end) {
      dataIn.seek(pos)
      val bin = new BufferedInputStream(noClose(dataIn), 65536)
      try {
        val (bytes, len) = Warc.readMember(bin)
        current = Warc.parseRecord(bytes, pos, len)
        pos += len
        return true
      } catch {
        // a corrupt/truncated member must not silently end the range:
        // re-sync past it and keep reading (a crawl archive with one
        // bad record still has millions of good ones after it); sync
        // returns -1 only when no further member starts in the range
        case _: Exception => pos = sync(pos + 1)
      }
    }
    false
  }

  override def get(): InternalRow =
    InternalRow.fromSeq(cols.toSeq.map(fieldValue))

  private def fieldValue(c: String): Any = c match {
    case "url" => UTF8String.fromString(current.url)
    case "warc_type" => UTF8String.fromString(current.warcType)
    case "warc_date" => UTF8String.fromString(current.warcDate)
    case "record_id" => UTF8String.fromString(current.recordId)
    case "status" =>
      current.status.map(i => i: java.lang.Integer).orNull
    case "http_content_type" =>
      current.httpContentType.map(UTF8String.fromString).orNull
    case "http_location" =>
      current.httpLocation.map(UTF8String.fromString).orNull
    case "payload_digest" =>
      current.payloadDigest.map(UTF8String.fromString).orNull
    case "truncated" =>
      current.truncated.map(UTF8String.fromString).orNull
    case "concurrent_to" =>
      current.concurrentTo.map(UTF8String.fromString).orNull
    case "segment_number" =>
      current.segmentNumber.map(i => i: java.lang.Integer).orNull
    case "segment_origin_id" =>
      current.segmentOriginId.map(UTF8String.fromString).orNull
    case "segment_total_length" =>
      current.segmentTotalLength.map(l => l: java.lang.Long).orNull
    case "payload" => current.payload
    case "member_offset" => current.memberOffset
    case "member_length" => current.memberLength
    case "file" => UTF8String.fromString(part.file)
    case other => throw new IllegalArgumentException(s"unknown column $other")
  }

  override def close(): Unit = dataIn.close()
}
