package graft.sources

import java.io.ByteArrayInputStream
import java.net.URI
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import scala.collection.mutable.ArrayBuffer

/** Live HTTP ingestion for the paginated feed source — the fetch-loop
  * semantics of the reference's arXiv ingestion (reference
  * src/databricks/syntetic_data_arxiv.py:75-127):
  *
  *  - pages of `batch_size` fetched as `?start=N&max_results=B`
  *  - 1 s politeness delay between calls to the same host
  *  - an EMPTY page ends the feed
  *  - a fetch/parse ERROR ends the loop (reference `except: break`)
  *  - results truncated to `target_total`
  *  - Atom entry field transforms: id = text after "/abs/", title and
  *    summary newline→space + strip, authors joined ", ", category from
  *    the primary-category term else "Unknown", link "abs/"→"pdf/"
  *
  * Two consumption shapes:
  *  - [[HttpPagedFetcher.fetchAll]]: the reference's sequential loop
  *    verbatim (driver-side or inside one task) — small feeds.
  *  - the `graft_feed` DataSourceV2 with `option("url", ...)`
  *    ([[PagedFeedDataSource]]): one `InputPartition` per page window,
  *    so a cluster fetches pages concurrently while the JVM-wide
  *    per-host [[PolitenessGate]] keeps each executor within the rate
  *    limit. A sequential "break on first error" cannot distribute;
  *    per-page failures degrade to an empty page (skip), which is the
  *    at-scale analog of the reference's partial-results-on-error.
  */
object PolitenessGate {
  private final class HostGate { var last = 0L }
  private val hosts = new ConcurrentHashMap[String, HostGate]()

  /** Run `f` under this host's politeness window: at least
    * `politenessMs` between the END of one request and the START of the
    * next (the reference sleeps AFTER each response,
    * syntetic_data_arxiv.py:108-110, so the pause is response-to-next-
    * request, not start-to-start). Serializes same-host requests within
    * the JVM — exactly what a polite fetcher owes the host. */
  def pace[T](host: String, politenessMs: Long)(f: => T): T = {
    if (politenessMs <= 0) return f
    val g = hosts.computeIfAbsent(host, _ => new HostGate)
    g.synchronized {
      val wait = g.last + politenessMs - System.currentTimeMillis()
      if (wait > 0) Thread.sleep(wait)
      try f finally g.last = System.currentTimeMillis()
    }
  }
}

final case class FeedEntry(id: String, title: String, summary: String,
    authors: String, category: String, published: String, link: String)

/** Minimal Atom parser over the JDK's built-in DOM (no added deps).
  * Returns None when the payload is not parseable XML — the malformed
  * page case. Field transforms mirror the reference exactly. */
object AtomFeed {

  private def oneLine(s: String): String =
    s.replace('\n', ' ').replace('\r', ' ').trim

  def parse(xml: String): Option[Seq[FeedEntry]] = try {
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(false)
    // hostile-input hygiene: no DTDs / external entities from a feed
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val doc = dbf.newDocumentBuilder()
      .parse(new ByteArrayInputStream(xml.getBytes(StandardCharsets.UTF_8)))
    val entries = doc.getElementsByTagName("entry")
    val out = ArrayBuffer[FeedEntry]()
    for (i <- 0 until entries.getLength) {
      val e = entries.item(i).asInstanceOf[org.w3c.dom.Element]
      def text(tag: String): String = {
        val ns = e.getElementsByTagName(tag)
        if (ns.getLength == 0) "" else ns.item(0).getTextContent
      }
      val authors = {
        val ns = e.getElementsByTagName("author")
        (0 until ns.getLength).map { j =>
          val a = ns.item(j).asInstanceOf[org.w3c.dom.Element]
          val n = a.getElementsByTagName("name")
          if (n.getLength == 0) "" else n.item(0).getTextContent.trim
        }.filter(_.nonEmpty).mkString(", ")
      }
      val category = {
        val ns = e.getElementsByTagName("arxiv:primary_category")
        if (ns.getLength == 0) "Unknown"
        else Option(ns.item(0).asInstanceOf[org.w3c.dom.Element]
          .getAttribute("term")).filter(_.nonEmpty).getOrElse("Unknown")
      }
      val link = {
        val ns = e.getElementsByTagName("link")
        val href = if (ns.getLength == 0) ""
          else ns.item(0).asInstanceOf[org.w3c.dom.Element].getAttribute("href")
        href.replace("abs/", "pdf/")
      }
      out += FeedEntry(
        id = text("id").split("/abs/").last.trim,
        title = oneLine(text("title")),
        summary = oneLine(text("summary")),
        authors = authors,
        category = category,
        published = text("published").trim,
        link = link)
    }
    Some(out.toSeq)
  } catch { case scala.util.control.NonFatal(_) => None }
}

object HttpPagedFetcher {

  /** GET one page URL with politeness pacing. Returns the raw body. */
  def politeGet(url: String, politenessMs: Long,
      timeoutMs: Int = 30000): String =
    PolitenessGate.pace(URI.create(url).getHost, politenessMs) {
      val conn = URI.create(url).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      try {
        val in = conn.getInputStream
        try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
      } finally conn.disconnect()
    }

  def pageUrl(baseUrl: String, start: Long, maxResults: Long): String = {
    val sep = if (baseUrl.contains("?")) "&" else "?"
    s"$baseUrl${sep}start=$start&max_results=$maxResults"
  }

  /** The reference's sequential pagination loop, 1:1
    * (syntetic_data_arxiv.py:80-114): accumulate pages until
    * `targetTotal`, stop on the first empty page OR the first
    * fetch/parse error, truncate to `targetTotal`. */
  def fetchAll(baseUrl: String, targetTotal: Int, batchSize: Int,
      politenessMs: Long = 1000L): Seq[FeedEntry] = {
    val all = ArrayBuffer[FeedEntry]()
    var start = 0L
    var done = false
    while (!done && all.length < targetTotal) {
      val page: Option[Seq[FeedEntry]] =
        try AtomFeed.parse(politeGet(pageUrl(baseUrl, start, batchSize),
          politenessMs))
        catch { case scala.util.control.NonFatal(_) => None }
      page match {
        case Some(entries) if entries.nonEmpty =>
          all ++= entries
          start += batchSize
        case _ => done = true // empty page = end of feed; error = stop
      }
    }
    all.take(targetTotal).toSeq
  }

  /** One page for a partition reader: error/malformed → empty (the
    * distributed skip analog — a cluster cannot serialize the
    * reference's break-on-error across concurrent pages). */
  def fetchPage(baseUrl: String, start: Long, maxResults: Long,
      politenessMs: Long): Seq[FeedEntry] =
    (try AtomFeed.parse(politeGet(pageUrl(baseUrl, start, maxResults),
      politenessMs))
    catch { case scala.util.control.NonFatal(_) => None })
      .getOrElse(Seq.empty)
}
