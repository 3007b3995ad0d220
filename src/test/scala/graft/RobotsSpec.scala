package graft

import graft.operators.Robots
import org.apache.spark.sql.functions._

/** RFC 9309 semantics: group parsing, wildcard/anchor patterns,
  * longest-match precedence, allow-wins-ties, agent group selection. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val robotsTxt =
    """# example file
      |User-agent: evilbot
      |Disallow: /
      |
      |User-agent: graftbot
      |User-agent: otherbot
      |Disallow: /tmp
      |
      |User-agent: *
      |Disallow: /p/1
      |Allow: /p/12$
      |Disallow: /p/*3$
      |Allow:
      |Unknown-directive: x
      |""".stripMargin

  private lazy val rules = Robots.parseRules(
    Seq(("d.com", robotsTxt)).toDF("domain", "txt"), "domain", "txt")

  test("parse: groups, consecutive UA sharing, comment/blank/empty-" +
    "pattern/unknown-directive dropout") {
    val got = rules.collect()
      .map(r => (r.getString(1), r.getBoolean(2), r.getString(3))).toSet
    assert(got === Set(
      ("evilbot", false, "/"),
      ("graftbot", false, "/tmp"),
      ("otherbot", false, "/tmp"),
      ("*", false, "/p/1"),
      ("*", true, "/p/12$"),
      ("*", false, "/p/*3$")))
  }

  test("rules before any user-agent line are group-less and ignored") {
    val r = Robots.parseRules(
      Seq(("x.com", "Disallow: /a\nUser-agent: *\nDisallow: /b"))
        .toDF("domain", "txt"), "domain", "txt").collect()
    assert(r.map(_.getString(3)).toSeq === Seq("/b"))
  }

  test("longest match with allow-wins-ties; * and $ wildcards; " +
    "unmatched paths and unknown domains are allowed") {
    val paths = Seq("/p/1", "/p/10", "/p/12", "/p/13", "/p/3", "/q",
      "/p/33").map(("d.com", _)) :+ (("nodomain.com", "/p/1"))
    val got = Robots.isAllowed(paths.toDF("domain", "path"), rules,
      "anybot").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSet
    assert(got === Set(
      ("d.com", "/p/1", false),   // Disallow /p/1
      ("d.com", "/p/10", false),  // prefix
      ("d.com", "/p/12", true),   // Allow /p/12$ (len 6) beats /p/1 (4)
      ("d.com", "/p/13", false),  // Disallow /p/*3$ (6) + /p/1 (4)
      ("d.com", "/p/3", false),   // Disallow /p/*3$
      ("d.com", "/p/33", false),  // * spans several chars
      ("d.com", "/q", true),      // no rule matches
      ("nodomain.com", "/p/1", true))) // no robots.txt at all
  }

  test("agent group selection: own group beats *, case-insensitive; " +
    "$ anchors exactly") {
    val got = Robots.isAllowed(
      Seq(("d.com", "/tmp"), ("d.com", "/p/1")).toDF("domain", "path"),
      rules, "GraftBot").collect()
      .map(r => (r.getString(1), r.getBoolean(2))).toMap
    // graftbot has its OWN group (Disallow /tmp only) -> the * group's
    // /p/1 rule does NOT apply to it
    assert(got === Map("/tmp" -> false, "/p/1" -> true))
    val evil = Robots.isAllowed(
      Seq(("d.com", "/anything")).toDF("domain", "path"), rules,
      "evilbot").collect().head.getBoolean(2)
    assert(!evil) // Disallow: / blocks everything
    // $ anchor: Allow /p/12$ must not match /p/121
    val deep = Robots.isAllowed(
      Seq(("d.com", "/p/121")).toDF("domain", "path"), rules,
      "anybot").collect().head.getBoolean(2)
    assert(!deep) // /p/1 prefix disallows, allow rule does not anchor
  }

  test("RFC 9309 §2.2.1 substring agent match: `User-agent: graft` " +
    "governs agent graftbot; the MOST SPECIFIC (longest) token wins") {
    val txt =
      """User-agent: graft
        |Disallow: /a
        |
        |User-agent: graftbot
        |Disallow: /b
        |
        |User-agent: *
        |Disallow: /c
        |""".stripMargin
    val r = Robots.parseRules(Seq(("d.com", txt)).toDF("domain", "txt"),
      "domain", "txt")
    // graftbot-super matches BOTH tokens -> longest (graftbot) governs:
    // only /b disallowed
    val got = Robots.isAllowed(
      Seq("/a", "/b", "/c").map(("d.com", _)).toDF("domain", "path"),
      r, "graftbot-super").collect()
      .map(x => (x.getString(1), x.getBoolean(2))).toMap
    assert(got === Map("/a" -> true, "/b" -> false, "/c" -> true))
    // plain graftbot: same (prefix `graft` loses to exact `graftbot`)
    val got2 = Robots.isAllowed(
      Seq("/a", "/b").map(("d.com", _)).toDF("domain", "path"),
      r, "graftbot").collect()
      .map(x => (x.getString(1), x.getBoolean(2))).toMap
    assert(got2 === Map("/a" -> true, "/b" -> false))
    // graftling matches only `graft` -> /a disallowed, not /b or /c
    val got3 = Robots.isAllowed(
      Seq("/a", "/b", "/c").map(("d.com", _)).toDF("domain", "path"),
      r, "graftling").collect()
      .map(x => (x.getString(1), x.getBoolean(2))).toMap
    assert(got3 === Map("/a" -> false, "/b" -> true, "/c" -> true))
    // unrelated agent -> the * group
    val got4 = Robots.isAllowed(
      Seq("/a", "/c").map(("d.com", _)).toDF("domain", "path"),
      r, "otherbot").collect()
      .map(x => (x.getString(1), x.getBoolean(2))).toMap
    assert(got4 === Map("/a" -> true, "/c" -> false))
  }

  test("RFC 9309 empty group: a User-agent line with NO rules means " +
    "everything allowed for that agent — it must override the * " +
    "group, not fall through to it") {
    // the empty group can only exist after another group's rules (a
    // blank line does NOT split consecutive UA lines) or at EOF
    val txt = "User-agent: *\nDisallow: /\nUser-agent: graftbot\n"
    val r = Robots.parseRules(Seq(("d.com", txt)).toDF("domain", "txt"),
      "domain", "txt")
    // the empty group survives parse as a NULL-rule row
    assert(r.filter(col("agent") === "graftbot").count() === 1)
    val got = Robots.isAllowed(
      Seq(("d.com", "/x")).toDF("domain", "path"), r, "graftbot")
      .collect().head.getBoolean(2)
    assert(got, "graftbot's own (empty) group allows everything")
    val other = Robots.isAllowed(
      Seq(("d.com", "/x")).toDF("domain", "path"), r, "otherbot")
      .collect().head.getBoolean(2)
    assert(!other, "agents without a group still hit the * Disallow /")
  }

  private val politeTxt =
    """User-agent: graftbot
      |Disallow: /tmp
      |Crawl-delay: 1
      |
      |User-agent: *
      |Disallow: /p/1
      |Crawl-delay: 10
      |Crawl-delay: junk
      |Sitemap: https://d.com/sitemap.xml
      |Sitemap: https://d.com/news.xml
      |""".stripMargin

  test("crawl-delay: per-group parse, non-numeric dropout, specific " +
    "group beats * (delay precedence)") {
    val d = Robots.parseDelays(
      Seq(("d.com", politeTxt)).toDF("domain", "txt"), "domain", "txt")
    val got = d.collect()
      .map(r => (r.getString(1), r.getDouble(2))).toSet
    assert(got === Set(("graftbot", 1.0), ("*", 10.0)))
    // precedence: graftbot's own group beats *
    val mine = Robots.crawlDelay(d, "graftbot").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(mine === Map("d.com" -> 1.0))
    // prefix match: graftbot-img inherits the graftbot group's delay
    val img = Robots.crawlDelay(d, "graftbot-img").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(img === Map("d.com" -> 1.0))
    // unrelated agent falls to *
    val other = Robots.crawlDelay(d, "otherbot").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(other === Map("d.com" -> 10.0))
  }

  test("crawl-delay lines do not leak rules across groups (a delay " +
    "line between two UA lines splits the runs)") {
    val txt = "User-agent: a\nCrawl-delay: 2\nUser-agent: b\nDisallow: /x"
    val r = Robots.parseRules(Seq(("d.com", txt)).toDF("domain", "txt"),
      "domain", "txt").collect()
      .map(x => (x.getString(1), x.getString(3))).toSet
    // a's group ended at the delay line — and, rule-less, it survives
    // as the RFC empty-group row (allow-all for agent a)
    assert(r === Set(("a", null), ("b", "/x")))
    val d = Robots.parseDelays(Seq(("d.com", txt)).toDF("domain", "txt"),
      "domain", "txt").collect()
      .map(x => (x.getString(1), x.getDouble(2))).toSet
    assert(d === Set(("a", 2.0)))
  }

  test("sitemap: group-less parse, duplicates collapsed, " +
    "comment/blank dropout") {
    val sm = Robots.parseSitemaps(
      Seq(("d.com", politeTxt + "# c\nSitemap: https://d.com/news.xml\n"))
        .toDF("domain", "txt"), "domain", "txt")
      .collect().map(_.getString(1)).toSet
    assert(sm === Set("https://d.com/sitemap.xml",
      "https://d.com/news.xml"))
  }

  test("sitemapXmlEntries: <url> elements -> (loc, lastmod) structs, " +
    "whitespace trimmed, missing lastmod empty, order preserved") {
    val xml =
      """<?xml version="1.0"?>
        |<urlset>
        |  <url><loc> https://d.com/a </loc><lastmod>2024-02-03</lastmod></url>
        |  <url><loc>https://d.com/b</loc></url>
        |  <url>
        |    <LOC>https://d.com/c</LOC>
        |    <LastMod>2024-02-05</LastMod>
        |  </url>
        |</urlset>""".stripMargin
    val got = Seq(Tuple1(xml)).toDF("xml")
      .select(explode(Robots.sitemapXmlEntries(col("xml"))).as("e"))
      .select(col("e").getField("loc"), col("e").getField("lastmod"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got === Seq(
      ("https://d.com/a", "2024-02-03"),
      ("https://d.com/b", ""),
      ("https://d.com/c", "2024-02-05")))
  }

  test("sitemapIndexEntries: <sitemapindex> yields child locs in " +
    "order; a plain <urlset> yields an empty array") {
    val idx =
      """<?xml version="1.0"?>
        |<sitemapindex>
        |  <sitemap><loc> https://d.com/a.xml </loc></sitemap>
        |  <sitemap><loc>https://d.com/b.xml.gz</loc>
        |    <lastmod>2024-01-01</lastmod></sitemap>
        |</sitemapindex>""".stripMargin
    val urlset = "<urlset><url><loc>https://d.com/p</loc></url></urlset>"
    val got = Seq(Tuple1(idx), Tuple1(urlset)).toDF("xml")
      .select(Robots.sitemapIndexEntries(col("xml")).as("c"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    assert(got === Seq(
      Seq("https://d.com/a.xml", "https://d.com/b.xml.gz"), Seq.empty))
  }

  test("a bare `User-agent:` line (empty token) never becomes a " +
    "universal group: rules and delays stay with the * group") {
    val txt =
      """User-agent:
        |Disallow: /hijacked
        |Crawl-delay: 99
        |
        |User-agent: *
        |Disallow: /blocked
        |Crawl-delay: 2
        |""".stripMargin
    val r = Robots.parseRules(Seq(("d.com", txt)).toDF("domain", "txt"),
      "domain", "txt")
    // the empty token's group is dropped entirely; * group intact
    assert(r.collect().map(x => (x.getString(1), x.getString(3))).toSet
      === Set(("*", "/blocked")))
    val got = Robots.isAllowed(
      Seq(("d.com", "/hijacked"), ("d.com", "/blocked"))
        .toDF("domain", "path"), r, "anybot").collect()
      .map(x => (x.getString(1), x.getBoolean(2))).toMap
    assert(got === Map("/hijacked" -> true, "/blocked" -> false))
    val d = Robots.crawlDelay(
      Robots.parseDelays(Seq(("d.com", txt)).toDF("domain", "txt"),
        "domain", "txt"), "anybot").collect()
    assert(d.map(x => (x.getString(0), x.getDouble(1))).toSeq
      === Seq(("d.com", 2.0)))
  }

  test("crawlDelay tie-break: equal-specificity groups resolve to the " +
    "LARGER delay (most-polite-wins, the documented semantics)") {
    // the same token declared by two groups with different delays —
    // equal specificity, the larger (more polite) delay governs
    val dup = Robots.parseDelays(
      Seq(("d.com", "User-agent: graftbot\nCrawl-delay: 3\n\n" +
        "User-agent: othergroup\nUser-agent: graftbot\nCrawl-delay: 7\n"))
        .toDF("domain", "txt"), "domain", "txt")
    val got = Robots.crawlDelay(dup, "graftbot").collect()
    assert(got.map(x => (x.getString(0), x.getDouble(1))).toSeq
      === Seq(("d.com", 7.0)))
  }
}
