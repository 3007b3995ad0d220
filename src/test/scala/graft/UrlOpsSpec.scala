package graft

import graft.operators.UrlOps
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canonOf(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlOps.canonicalize(col("url"))).as[String].collect().toSeq

  test("parse splits every component") {
    val row = Seq("https://WWW.Example.Co.Uk:8080/a/b?z=1&a=2#frag").toDF("url")
      .select(UrlOps.scheme(col("url")).as("s"), UrlOps.host(col("url")).as("h"),
        UrlOps.port(col("url")).as("p"), UrlOps.path(col("url")).as("pa"),
        UrlOps.query(col("url")).as("q"), UrlOps.fragment(col("url")).as("f"))
      .as[(String, String, String, String, String, String)].head()
    assert(row === (("https", "www.example.co.uk", "8080", "/a/b", "z=1&a=2", "frag")))
  }

  test("parse of degenerate urls: no port, no path, no query, no fragment") {
    val row = Seq("http://example.com").toDF("url")
      .select(UrlOps.host(col("url")), UrlOps.port(col("url")),
        UrlOps.path(col("url")), UrlOps.query(col("url")),
        UrlOps.fragment(col("url")))
      .as[(String, String, String, String, String)].head()
    assert(row === (("example.com", "", "", "", "")))
  }

  test("query/fragment attached directly to the authority stays out " +
      "of the host") {
    val rows = Seq("https://Example.com?a=1&utm_source=x",
      "https://example.com#frag",
      "https://example.com:8443?b=2")
      .toDF("url")
      .select(UrlOps.host(col("url")).as("h"), UrlOps.port(col("url")).as("p"),
        UrlOps.path(col("url")).as("pa"), UrlOps.query(col("url")).as("q"),
        UrlOps.fragment(col("url")).as("f"))
      .as[(String, String, String, String, String)].collect().toSeq
    assert(rows === Seq(
      ("example.com", "", "", "a=1&utm_source=x", ""),
      ("example.com", "", "", "", "frag"),
      ("example.com", "8443", "", "b=2", "")))
    assert(canonOf("https://WWW.example.com?a=1&utm_source=x") ===
      Seq("https://example.com?a=1"))
  }

  test("scheme-less junk yields nulls, not an ANSI crash") {
    val n = Seq("not a url at all").toDF("url")
      .select(UrlOps.host(col("url"))).as[Option[String]].head()
    assert(n.isEmpty)
  }

  test("canonicalize: case, www, default port, tracking, sort, slash, fragment") {
    assert(canonOf(
      "https://WWW.Example.COM:443/news/?utm_source=x&id=7&utm_campaign=y#top",
      "https://example.com/news?id=7",
      "http://example.com:8080/a?b=2&a=1&fbclid=zz",
      "https://example.com/?utm_source=feed") === Seq(
      "https://example.com/news?id=7",
      "https://example.com/news?id=7",
      "http://example.com:8080/a?a=1&b=2",
      "https://example.com"))
  }

  test("registered domain honors the multi-label suffix list") {
    val d = Seq("a.b.examplehub.co.uk", "cdn.examplehub.com", "examplehub.net",
      "localhost").toDF("h")
      .select(UrlOps.registeredDomain(col("h"))).as[String].collect().toSeq
    assert(d === Seq("examplehub.co.uk", "examplehub.com", "examplehub.net",
      "localhost"))
  }

  test("canonicalization is idempotent") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(concat(lit("https://WWW.s"), col("doc_id").cast("string"),
        lit("hub.co.uk:443/x/article/"), col("doc_id").cast("string"),
        lit("/?utm_source=a&q=1#f")).as("url"))
    val once = docs.select(UrlOps.canonicalize(col("url")).as("c1"))
    val twice = once.select(col("c1"),
      UrlOps.canonicalize(col("c1")).as("c2"))
      .filter(col("c1") =!= col("c2"))
    assert(twice.count() === 0)
  }

  test("canonicalize plan is a shuffle-free projection") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(concat(lit("https://shub.com/a/"), col("doc_id").cast("string"))
        .as("url"))
    val plan = docs.select(UrlOps.canonicalize(col("url")))
      .queryExecution.executedPlan
    assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty)
  }

  test("surt: host reversal, canonicalization rules, case fold") {
    import spark.implicits._
    val got = Seq(
      "https://WWW.Example.COM/Path/?utm_source=x&b=2&a=1#frag",
      "https://a.b.example.co.uk:8080/x",
      "http://example.com:80/",
      "https://example.com")
      .toDF("url").select(UrlOps.surt(col("url")))
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq(
      "com,example)/path?a=1&b=2",
      "uk,co,example,b,a:8080)/x", // reversed labels, explicit port kept
      "com,example)",
      "com,example)"))
  }

  test("surt sort groups a registered domain's pages contiguously " +
    "(the property that makes a CDX index range-prunable by domain)") {
    import spark.implicits._
    val urls = (0 until 60).map { i =>
      val host = Seq("a.example.com", "example.com", "other.net",
        "example.co.uk", "b.example.com", "www.other.net")(i % 6)
      s"https://$host/p/$i"
    }
    val df = urls.toDF("url")
      .select(UrlOps.surt(col("url")).as("surt"),
        UrlOps.registeredDomain(
          regexp_replace(UrlOps.host(col("url")), "^www\\.", ""))
          .as("domain"))
      .orderBy("surt")
      .collect().map(r => r.getString(1))
    // once sorted by surt, each domain appears in ONE contiguous run
    val runs = df.foldLeft(List.empty[String]) { (acc, d) =>
      if (acc.headOption.contains(d)) acc else d :: acc
    }
    assert(runs.size === runs.distinct.size)
  }
}
