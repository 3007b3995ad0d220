package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.sources.{AtomFeed, HttpPagedFetcher}
import java.net.InetSocketAddress
import org.apache.spark.sql.functions._

class PagedFeedSpec extends SparkSpec {

  private def feed(total: Int, pageSize: Int) =
    spark.read.format("graft_feed")
      .option("total", total).option("pageSize", pageSize).load()

  // ---- in-process Atom feed server (arXiv-shaped) ----

  private def atomEntry(i: Long): String =
    s"""<entry>
       |  <id>http://example.org/abs/paper-$i</id>
       |  <title>Title
       | number $i</title>
       |  <summary>Abstract
       | for $i</summary>
       |  <author><name>Alice $i</name></author>
       |  <author><name>Bob</name></author>
       |  <arxiv:primary_category term="cs.${if (i % 2 == 0) "DB" else "LG"}"/>
       |  <link href="http://example.org/abs/paper-$i"/>
       |  <published>2024-01-0${i % 9 + 1}</published>
       |</entry>""".stripMargin

  private def atomPage(entries: Seq[Long]): String =
    s"""<?xml version="1.0"?><feed xmlns:arxiv="http://arxiv.org/schemas/atom">
       |${entries.map(atomEntry).mkString("\n")}
       |</feed>""".stripMargin

  /** Serves `feedSize` entries paged by start/max_results; records
    * request arrival times; page `garblePage` returns malformed XML. */
  private def withServer(feedSize: Long, garblePage: Option[Long] = None)(
      body: (String, () => Seq[Long]) => Unit): Unit = {
    val times = new java.util.concurrent.CopyOnWriteArrayList[Long]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/feed", (ex: HttpExchange) => {
      times.add(System.nanoTime())
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val params = q.split("&").filter(_.contains("="))
        .map { kv => val Array(k, v) = kv.split("=", 2); k -> v }.toMap
      val start = params.getOrElse("start", "0").toLong
      val max = params.getOrElse("max_results", "10").toLong
      val payload =
        if (garblePage.contains(start)) "<feed><entry><unclosed</feed>"
        else atomPage(start until math.min(start + max, feedSize))
      val bytes = payload.getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    val url = s"http://127.0.0.1:${server.getAddress.getPort}/feed"
    try body(url, () => { import scala.jdk.CollectionConverters._
      times.asScala.toSeq })
    finally server.stop(0)
  }

  test("reads exactly `total` rows across page partitions") {
    val df = feed(1000, 250)
    assert(df.count() === 1000)
    assert(df.rdd.getNumPartitions === 4)
  }

  test("last partial page is not padded") {
    assert(feed(1001, 250).count() === 1001)
    assert(feed(1001, 250).rdd.getNumPartitions === 5)
  }

  test("column pruning reaches the reader") {
    val pruned = feed(100, 50).select("category")
    assert(pruned.schema.fieldNames.toSeq === Seq("category"))
    assert(pruned.distinct().count() === 4)
    val planStr = pruned.queryExecution.executedPlan.toString
    assert(planStr.contains("category") && !planStr.contains("summary"))
  }

  test("rows are deterministic and schema matches the arXiv shape") {
    val r = feed(10, 3).filter(col("id") === "arxiv:7").head()
    assert(r.getAs[String]("title") === "Paper 7")
    assert(r.getAs[String]("category") === "cs.DC")
    assert(r.getAs[String]("published") === "2020-01-08")
    assert(feed(10, 3).schema === graft.sources.PagedFeed.schema)
  }

  test("streaming micro-batch read: admission control pages the feed, " +
    "every row arrives exactly once") {
    import org.apache.spark.sql.streaming.Trigger
    val q = spark.readStream.format("graft_feed")
      .option("total", 1000).option("pageSize", 100)
      .option("maxRowsPerBatch", 300).load()
      .writeStream.format("memory").queryName("feed_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("feed_stream").count() === 1000)
    assert(spark.table("feed_stream").select("id").distinct().count()
      === 1000, "exactly-once: no duplicated pages across micro-batches")
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length >= 3,
      s"admission control must page the feed (got ${batches.length} batches)")
    assert(batches.forall(_.numInputRows <= 300),
      "each micro-batch must respect maxRowsPerBatch")
  }

  // ---- live-HTTP fetch loop (reference syntetic_data_arxiv.py:75-127) ----

  test("fetchAll paginates, truncates to target_total, applies the " +
    "reference field transforms") {
    withServer(feedSize = 25) { (url, _) =>
      val got = HttpPagedFetcher.fetchAll(url, targetTotal = 17,
        batchSize = 10, politenessMs = 0)
      assert(got.length === 17, "all_data[:target_total] truncation")
      val e = got.head
      assert(e.id === "paper-0", "id split at /abs/")
      assert(e.title === "Title  number 0", "newlines flattened, stripped")
      assert(e.authors === "Alice 0, Bob", "authors joined with ', '")
      assert(e.category === "cs.DB", "primary category term")
      assert(e.link === "http://example.org/pdf/paper-0", "abs/ -> pdf/")
    }
  }

  test("fetchAll stops at the end of the feed (empty page breaks)") {
    withServer(feedSize = 12) { (url, reqs) =>
      val got = HttpPagedFetcher.fetchAll(url, targetTotal = 1000,
        batchSize = 5, politenessMs = 0)
      assert(got.length === 12)
      // pages 0,5,10 then the empty page at 15 that ends the loop
      assert(reqs().length === 4)
    }
  }

  test("fetchAll stops on a malformed page with partial results " +
    "(reference except->break)") {
    withServer(feedSize = 30, garblePage = Some(10L)) { (url, _) =>
      val got = HttpPagedFetcher.fetchAll(url, targetTotal = 30,
        batchSize = 10, politenessMs = 0)
      assert(got.length === 10, "entries before the bad page are kept")
    }
  }

  test("politeness gate paces same-host requests") {
    withServer(feedSize = 30) { (url, reqs) =>
      HttpPagedFetcher.fetchAll(url, targetTotal = 30, batchSize = 10,
        politenessMs = 120)
      val ts = reqs().sorted
      assert(ts.length >= 3)
      val gapsMs = ts.sliding(2).map(p => (p(1) - p(0)) / 1e6).toSeq
      assert(gapsMs.forall(_ >= 100.0),
        s"inter-request gaps $gapsMs violate the politeness delay")
    }
  }

  test("DSv2 url option: cluster-shaped fetch with per-page partitions, " +
    "truncation and malformed-page skip") {
    withServer(feedSize = 100, garblePage = Some(20L)) { (url, _) =>
      val df = spark.read.format("graft_feed")
        .option("total", 50).option("pageSize", 10)
        .option("url", url).option("politenessMs", 0).load()
      assert(df.rdd.getNumPartitions === 5)
      val rows = df.collect()
      // 5 pages x 10, minus the malformed page (skipped, not fatal)
      assert(rows.length === 40)
      assert(!rows.map(_.getAs[String]("id")).contains("paper-20"))
      assert(rows.map(_.getAs[String]("id")).contains("paper-35"))
      // pruning still works through the HTTP reader
      val cats = df.select("category").distinct().collect()
        .map(_.getString(0)).toSet
      assert(cats === Set("cs.DB", "cs.LG"))
    }
  }

  test("AtomFeed.parse rejects malformed XML, handles missing fields") {
    assert(AtomFeed.parse("<feed><entry><unclosed</feed>").isEmpty)
    val sparse = AtomFeed.parse(
      "<feed><entry><id>x/abs/p1</id></entry></feed>").get
    assert(sparse.head.category === "Unknown")
    assert(sparse.head.authors === "")
  }
}
