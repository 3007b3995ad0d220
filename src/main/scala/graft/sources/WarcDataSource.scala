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
    new WarcTable(path, splitSize, maxFiles)
  }
}

class WarcTable(path: String, splitSize: Long, maxFilesPerTrigger: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_warc($path)"
  override def schema(): StructType = Warc.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(path, splitSize, maxFilesPerTrigger)
}

class WarcScanBuilder(path: String, splitSize: Long,
    maxFilesPerTrigger: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = Warc.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new WarcScan(path, splitSize, required, maxFilesPerTrigger)
}

class WarcScan(path: String, splitSize: Long, required: StructType,
    maxFilesPerTrigger: Int = 0)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Streaming form: new `.warc.gz` files landing in the directory
    * drain incrementally — the shape of a live crawl, where fetchers
    * append archives and the corpus pipeline consumes them behind.
    * The offset is the last processed file NAME, so the contract is
    * the crawler convention of lexicographically increasing names
    * (timestamped segments); a restart resumes past the committed
    * name, files named BELOW it are never revisited. */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new WarcMicroBatch(path, splitSize, required, maxFilesPerTrigger)

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
  * Offsets are the LAST PROCESSED FILE NAME (crawler segments sort
  * lexicographically by convention — timestamped names); each
  * `latestOffset` re-lists the directory and admits up to
  * `maxFilesPerTrigger` strictly-greater names, so archives dropped
  * mid-stream drain in later batches and a restart resumes exactly
  * past the committed name. Within a batch, files split into the same
  * byte-range partitions as the batch read. */
class WarcMicroBatch(path: String, splitSize: Long, required: StructType,
    maxFilesPerTrigger: Int)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxFiles}

  private case class NameOffset(name: String) extends Offset {
    override def json(): String = name
  }

  private def fs = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    new Path(path).getFileSystem(conf)
  }

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

  // Trigger.AvailableNow pins the end at prepare time, so the drain
  // terminates even while a crawler keeps appending.
  private var availableNowCap: Option[String] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(listNames().lastOption.getOrElse(""))
  override def reportLatestOffset(): Offset =
    NameOffset(listNames().lastOption.getOrElse(""))

  override def initialOffset(): Offset = NameOffset("")
  override def deserializeOffset(json: String): Offset = NameOffset(json)
  override def latestOffset(): Offset = reportLatestOffset()

  override def getDefaultReadLimit: ReadLimit =
    if (maxFilesPerTrigger > 0) ReadLimit.maxFiles(maxFilesPerTrigger)
    else ReadLimit.allAvailable()

  // Names at-or-below the committed high-water when THIS run first
  // listed the directory are assumed processed by the prior run; any
  // name that later lands BELOW the watermark (out-of-order fetcher,
  // retry, clock-skewed timestamp) would be silently skipped by the
  // name-offset contract — that skip must at least be LOUD.
  private var knownBelowWatermark: Set[String] = _

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[NameOffset].name
    val names = listNames()
    val below = names.filter(_ <= from).toSet
    if (knownBelowWatermark == null) knownBelowWatermark = below
    else {
      val late = below -- knownBelowWatermark
      if (late.nonEmpty)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"graft_warc: ${late.size} archive(s) landed BELOW the " +
            s"committed offset '$from' and will never drain " +
            s"(lexicographic-name contract): ${late.toSeq.sorted.take(5)
              .mkString(", ")}")
      knownBelowWatermark ++= late
    }
    val pending0 = names.filter(_ > from)
    val pending = availableNowCap match {
      case Some(cap) => pending0.filter(_ <= cap)
      case None => pending0
    }
    val admitted = limit match {
      case m: ReadMaxFiles => pending.take(m.maxFiles())
      case _ => pending
    }
    NameOffset(admitted.lastOption.getOrElse(from))
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val from = start.asInstanceOf[NameOffset].name
    val until = end.asInstanceOf[NameOffset].name
    val f = fs
    val p = new Path(path)
    val dir = f.getFileStatus(p).isDirectory
    listNames().filter(n => n > from && n <= until).flatMap { n =>
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
    case "payload" => current.payload
    case "member_offset" => current.memberOffset
    case "member_length" => current.memberLength
    case other => throw new IllegalArgumentException(s"unknown column $other")
  }

  override def close(): Unit = dataIn.close()
}
