package graft.sources

import java.time.LocalDate
import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 for a paginated document feed — the scale-path design for
  * the reference's driver-side arXiv pagination loop (reference
  * src/databricks/syntetic_data_arxiv.py:75-127: urllib fetch, 500/page,
  * 1 s politeness sleep, explicit schema). A driver loop caps ingest at
  * one page at a time; mapping each page window to an `InputPartition`
  * lets a cluster fetch pages concurrently with per-partition rate
  * limiting, and grows to 100 TB by adding executors, not driver hours.
  *
  * Zero-egress environment → pages are synthesized deterministically from
  * the row index (same fields as the arXiv schema), which also makes the
  * source oracle-checkable: DuckDB regenerates identical rows from
  * range(). Column pruning is pushed down (SupportsPushDownRequiredColumns).
  *
  * Usage: `spark.read.format("graft_feed").option("total", 1000)
  *   .option("pageSize", 250).load()`
  */
class PagedFeedDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft_feed"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedFeed.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val total = Option(properties.get("total")).map(_.toLong).getOrElse(1000L)
    val pageSize = Option(properties.get("pagesize")).map(_.toInt)
      .orElse(Option(properties.get("pageSize")).map(_.toInt)).getOrElse(500)
    // option("url", ...) switches from the deterministic fixture to the
    // LIVE paginated-HTTP fetch path (graft.sources.HttpPagedFetcher):
    // same page windows, each fetched with per-host politeness pacing
    val url = Option(properties.get("url"))
    val politenessMs = Option(properties.get("politenessms"))
      .orElse(Option(properties.get("politenessMs")))
      .map(_.toLong).getOrElse(1000L)
    val maxRowsPerBatch = Option(properties.get("maxrowsperbatch"))
      .orElse(Option(properties.get("maxRowsPerBatch")))
      .map(_.toLong).getOrElse(0L)
    new PagedFeedTable(total, pageSize, url, politenessMs, maxRowsPerBatch)
  }
}

object PagedFeed {
  /** Mirrors the reference's explicit arXiv StructType (SDA:117-127). */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("summary", StringType, nullable = false),
    StructField("authors", StringType, nullable = false),
    StructField("category", StringType, nullable = false),
    StructField("published", StringType, nullable = false),
    StructField("link", StringType, nullable = false)))

  private val epoch = LocalDate.of(2020, 1, 1)

  /** Deterministic field values for row i — reproducible in ANSI SQL. */
  def fieldValue(col: String, i: Long): UTF8String = UTF8String.fromString(
    col match {
      case "id"       => s"arxiv:$i"
      case "title"    => s"Paper $i"
      case "summary"  => s"Deterministic abstract number ${(i * 2654435761L) % 1000}"
      case "authors"  => s"Author ${i % 97}"
      case "category" => "cs." + (i % 4 match {
        case 0 => "DB"; case 1 => "LG"; case 2 => "IR"; case 3 => "DC" })
      case "published" => epoch.plusDays(i % 365).toString
      case "link"     => s"https://example.org/abs/$i"
    })
}

class PagedFeedTable(total: Long, pageSize: Int,
    url: Option[String] = None, politenessMs: Long = 1000L,
    maxRowsPerBatch: Long = 0L)
    extends Table with SupportsRead {
  override def name(): String = s"graft_feed(total=$total, pageSize=$pageSize)"
  override def schema(): StructType = PagedFeed.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedFeedScanBuilder(total, pageSize, url, politenessMs,
      maxRowsPerBatch)
}

class PagedFeedScanBuilder(total: Long, pageSize: Int,
    url: Option[String], politenessMs: Long, maxRowsPerBatch: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = PagedFeed.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new PagedFeedScan(total, pageSize, required, url, politenessMs,
      maxRowsPerBatch)
}

class PagedFeedScan(total: Long, pageSize: Int, required: StructType,
    url: Option[String], politenessMs: Long, maxRowsPerBatch: Long)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** One partition per page window — the unit a real HTTP fetcher would
    * rate-limit independently. `total` doubles as the reference's
    * target_total truncation cap in HTTP mode. */
  override def planInputPartitions(): Array[InputPartition] =
    PagedFeedScan.pages(0L, total, pageSize)

  override def createReaderFactory(): PartitionReaderFactory =
    PagedFeedScan.readerFactory(required, url, politenessMs)

  /** Streaming form: the feed as a micro-batch source — incremental
    * ingest with resumable offsets (row positions), the
    * Structured-Streaming leg of the ingestion story (drives
    * graft.streaming.IndexSync end-to-end from a feed). */
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new PagedFeedMicroBatch(total, pageSize, required, url, politenessMs,
      maxRowsPerBatch)
}

object PagedFeedScan {
  def pages(from: Long, until: Long, pageSize: Int): Array[InputPartition] =
    (from until until by pageSize.toLong)
      .map(start => PagePartition(start, math.min(start + pageSize, until)))
      .toArray[InputPartition]

  def readerFactory(required: StructType, url: Option[String],
      politenessMs: Long): PartitionReaderFactory = url match {
    case Some(u) =>
      new HttpPagedFeedReaderFactory(required.fieldNames, u, politenessMs)
    case None => new PagedFeedReaderFactory(required.fieldNames)
  }
}

/** Micro-batch stream over the paged feed. Offsets are ROW positions
  * (page-aligned); `maxRowsPerBatch` > 0 bounds each micro-batch via
  * admission control — the streaming analog of the fetch loop's
  * politeness pacing (don't drain the upstream feed in one giant
  * batch). Restart-safe: Spark replays from the committed offset. */
class PagedFeedMicroBatch(total: Long, pageSize: Int,
    required: StructType, url: Option[String], politenessMs: Long,
    maxRowsPerBatch: Long)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxRows}

  private case class RowOffset(rows: Long) extends Offset {
    override def json(): String = rows.toString
  }

  override def initialOffset(): Offset = RowOffset(0L)
  override def deserializeOffset(json: String): Offset =
    RowOffset(json.toLong)

  override def latestOffset(): Offset = RowOffset(total)

  override def getDefaultReadLimit: ReadLimit =
    if (maxRowsPerBatch > 0) ReadLimit.maxRows(maxRowsPerBatch)
    else ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[RowOffset].rows
    val cap = limit match {
      case m: ReadMaxRows =>
        // page-align the admission cap (at least one page per batch)
        val pages = math.max(1L, m.maxRows() / pageSize)
        from + pages * pageSize
      case _ => total
    }
    RowOffset(math.min(cap, total))
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] =
    PagedFeedScan.pages(start.asInstanceOf[RowOffset].rows,
      end.asInstanceOf[RowOffset].rows, pageSize)

  override def createReaderFactory(): PartitionReaderFactory =
    PagedFeedScan.readerFactory(required, url, politenessMs)

  // Trigger.AvailableNow: the end of the feed is static (`total`), so
  // there is nothing to snapshot — declaring support is what lets the
  // trigger honor maxRowsPerBatch across several batches instead of
  // falling back to one giant Trigger.Once batch.
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def reportLatestOffset(): Offset = RowOffset(total)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class PagePartition(start: Long, end: Long) extends InputPartition

class PagedFeedReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val page = p.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      private var i = page.start - 1
      override def next(): Boolean = { i += 1; i < page.end }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.toSeq.map(c => PagedFeed.fieldValue(c, i)))
      override def close(): Unit = ()
    }
  }
}

/** Live-HTTP partition reader: fetches this partition's page window from
  * the feed with per-host politeness pacing, applies the reference's
  * Atom field transforms, truncates to the window (target_total tail).
  * Malformed/failed pages yield no rows — the distributed analog of the
  * reference's stop-with-partial-results. Column pruning applies: only
  * requested fields are projected into rows. */
class HttpPagedFeedReaderFactory(cols: Array[String], baseUrl: String,
    politenessMs: Long) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val page = p.asInstanceOf[PagePartition]
    new PartitionReader[InternalRow] {
      private lazy val entries: Seq[FeedEntry] =
        HttpPagedFetcher.fetchPage(baseUrl, page.start,
          page.end - page.start, politenessMs)
          .take((page.end - page.start).toInt)
      private var i = -1
      override def next(): Boolean = { i += 1; i < entries.length }
      override def get(): InternalRow = {
        val e = entries(i)
        InternalRow.fromSeq(cols.toSeq.map { c =>
          UTF8String.fromString(c match {
            case "id" => e.id
            case "title" => e.title
            case "summary" => e.summary
            case "authors" => e.authors
            case "category" => e.category
            case "published" => e.published
            case "link" => e.link
          })
        })
      }
      override def close(): Unit = ()
    }
  }
}
