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
}
