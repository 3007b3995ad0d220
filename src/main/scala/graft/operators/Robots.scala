package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** robots.txt (RFC 9309, the Robots Exclusion Protocol) — the rules a
  * polite crawler must evaluate BEFORE the first fetch. The frontier
  * queries schedule by score and per-domain budget; this adds the
  * allow/deny grammar: `User-agent` groups, `Allow`/`Disallow`
  * path-prefix rules with `*` (any run) and `$` (end anchor)
  * wildcards, longest-match precedence with Allow winning ties
  * (RFC 9309 §2.2.2: most octets wins; equivalent rules resolve to
  * allow).
  *
  * Shape follows the [[Psl]] discipline: rules are a TABLE (domain,
  * agent, allow, pattern), the corpus side joins it per-domain —
  * robots files are KiB-bounded per domain, so the rules table is
  * domain-bounded (broadcastable at web scale) and the frontier is
  * never exchanged. Parsing is a pure expression tree (line split +
  * one domain-partitioned window for User-agent grouping); matching
  * compiles each pattern to a regex column once and evaluates per
  * candidate with the longest-match fold as an ordinary max-of-struct
  * aggregation.
  */
object Robots {

  /** Parse robots.txt bodies into a rules table.
    *
    * Input: one row per domain, `txtCol` the file text. Output:
    * `(domainCol, agent, allow, pattern)` — one row per (group
    * member agent × rule). Comments (`#`), blank lines, unknown
    * directives, empty-pattern rules (an empty `Disallow:` means
    * allow-all) and rules before any `User-agent` line (group-less,
    * ignored per the RFC) all drop out. Consecutive `User-agent`
    * lines share the following rule block. */
  /** Directive lines with their User-agent GROUP id: comment strip,
    * kind/value split, group-relevant kinds only (a `Sitemap:` line is
    * group-less per the de-facto grammar and parsed separately), a UA
    * run broken by any other directive starting a new group. */
  private def groupedLines(df: DataFrame, domainCol: String,
      txtCol: String): DataFrame = {
    val w = Window.partitionBy("__dom").orderBy("__pos")
    df.select(col(domainCol).as("__dom"),
        posexplode(split(col(txtCol), "\n")).as(Seq("__pos", "__raw")))
      .withColumn("__line", trim(regexp_replace(col("__raw"), "#.*", "")))
      .withColumn("__kind",
        lower(trim(regexp_extract(col("__line"), "^([^:]+):", 1))))
      .withColumn("__val",
        trim(regexp_extract(col("__line"), "^[^:]+:(.*)$", 1)))
      .filter(col("__kind").isin("user-agent", "allow", "disallow",
        "crawl-delay"))
      // group id: +1 at every user-agent line that STARTS a UA run
      .withColumn("__ua", (col("__kind") === "user-agent").cast("int"))
      .withColumn("__start",
        when(col("__ua") === 1 && lag(col("__ua"), 1, 0).over(w) === 0, 1)
          .otherwise(0))
      .withColumn("__grp", sum("__start").over(w))
  }

  /** Parse result shape: one row per (group member agent × rule). An
    * EMPTY group (a User-agent line with no rules, RFC 9309 §2.2.1 —
    * legal, and meaningful: it declares "everything allowed" for that
    * agent, overriding any `*` rules) survives as one row with NULL
    * allow/pattern, so [[isAllowed]]'s group selection can still see
    * it; NULL patterns never match, and an unmatched path defaults to
    * allowed. */
  def parseRules(df: DataFrame, domainCol: String,
      txtCol: String): DataFrame = {
    val lines = groupedLines(df, domainCol, txtCol)
    // a bare `User-agent:` (empty token) would prefix-match EVERY
    // crawler and, as a non-* token, hijack group selection from the
    // * group — malformed lines must not become a universal group
    val agents = lines.filter(col("__kind") === "user-agent" &&
        col("__val") =!= "")
      .select(col("__dom"), col("__grp"), lower(col("__val")).as("agent"))
      .distinct()
    val rules = lines
      .filter(col("__kind").isin("allow", "disallow") && col("__val") =!= "")
      .select(col("__dom"), col("__grp"),
        (col("__kind") === "allow").as("allow"), col("__val").as("pattern"))
    agents.join(rules, Seq("__dom", "__grp"), "left")
      .select(col("__dom").as(domainCol), col("agent"), col("allow"),
        col("pattern"))
  }

  /** `Crawl-delay:` per (domain, agent) — the per-domain politeness
    * budget a frontier scheduler consumes (seconds between fetches; the
    * de-facto directive Bing/Yandex honor). Same group machinery as
    * [[parseRules]]; non-numeric values drop; duplicate delay lines in
    * one group resolve to the MAX (most polite). */
  def parseDelays(df: DataFrame, domainCol: String,
      txtCol: String): DataFrame = {
    val lines = groupedLines(df, domainCol, txtCol)
    // same blank-token guard as parseRules: a bare `User-agent:` line
    // must not claim the crawl delay for every crawler
    val agents = lines.filter(col("__kind") === "user-agent" &&
        col("__val") =!= "")
      .select(col("__dom"), col("__grp"), lower(col("__val")).as("agent"))
      .distinct()
    val delays = lines
      .filter(col("__kind") === "crawl-delay" &&
        col("__val").rlike("^[0-9]+(\\.[0-9]+)?$"))
      .select(col("__dom"), col("__grp"),
        col("__val").cast("double").as("delay_s"))
    agents.join(delays, Seq("__dom", "__grp"))
      .groupBy(col("__dom"), col("agent"))
      .agg(max(col("delay_s")).as("delay_s"))
      .select(col("__dom").as(domainCol), col("agent"), col("delay_s"))
  }

  /** The effective crawl delay per domain for `agent`: the most
    * specific applicable group wins (longest prefix-matching token
    * beats `*`, the [[isAllowed]] selection rule); domains with no
    * applicable delay are absent (callers coalesce their own
    * default). When two DISTINCT matching tokens tie on length, the
    * LARGER delay wins (most-polite-wins — the same resolution
    * [[parseDelays]] applies to duplicate delay lines inside one
    * group, extended across equally-specific groups). */
  def crawlDelay(delays: DataFrame, agent: String,
      domainCol: String = "domain",
      outCol: String = "delay_s"): DataFrame = {
    val a = agent.toLowerCase
    delays.filter(col("agent") === "*" || lit(a).startsWith(col("agent")))
      .groupBy(domainCol)
      .agg(max(struct(
        when(col("agent") === "*", lit(0))
          .otherwise(length(col("agent"))).as("spec"),
        col("delay_s").as("d"))).as("__b"))
      .select(col(domainCol), col("__b").getField("d").as(outCol))
  }

  /** `Sitemap:` URLs — group-less/global per the de-facto grammar
    * (sitemaps.org), the discovery seed channel a frontier folds in
    * ahead of link-graph expansion. One row per (domain, sitemap). */
  def parseSitemaps(df: DataFrame, domainCol: String,
      txtCol: String): DataFrame =
    df.select(col(domainCol).as("__dom"),
        explode(split(col(txtCol), "\n")).as("__raw"))
      .withColumn("__line", trim(regexp_replace(col("__raw"), "#.*", "")))
      .filter(lower(trim(regexp_extract(col("__line"), "^([^:]+):", 1)))
        === "sitemap")
      .select(col("__dom").as(domainCol),
        trim(regexp_extract(col("__line"), "^[^:]+:(.*)$", 1))
          .as("sitemap"))
      .filter(col("sitemap") =!= "")
      .distinct()

  /** Sitemap XML entries (sitemaps.org `<urlset>` grammar): the
    * `<url>` elements of a fetched sitemap as an array of
    * `(loc, lastmod)` structs — a pure regexp `Column` tree
    * (shuffle-free, fuses into the scan), the [[HtmlOps]] discipline
    * applied to the discovery channel [[parseSitemaps]] finds.
    * `lastmod` is empty when the element omits it. */
  def sitemapXmlEntries(xml: Column): Column =
    transform(regexp_extract_all(xml, lit("(?is)<url>.*?</url>"), lit(0)),
      e => struct(
        trim(regexp_extract(e, "(?is)<loc>(.*?)</loc>", 1)).as("loc"),
        trim(regexp_extract(e, "(?is)<lastmod>(.*?)</lastmod>", 1))
          .as("lastmod")))

  /** Sitemap INDEX entries (sitemaps.org `<sitemapindex>` grammar):
    * the child sitemap `<loc>` URLs of an index document, as an array
    * column — the discovery chain's middle hop (`robots.txt →
    * <sitemapindex> → *.xml[.gz] → <urlset>`), a shuffle-free regexp
    * tree like [[sitemapXmlEntries]]. A plain `<urlset>` document has
    * no `<sitemap>` elements and yields an empty array, so callers
    * can branch on document kind without sniffing. */
  def sitemapIndexEntries(xml: Column): Column =
    transform(
      regexp_extract_all(xml, lit("(?is)<sitemap>.*?</sitemap>"), lit(0)),
      e => trim(regexp_extract(e, "(?is)<loc>(.*?)</loc>", 1)))

  /** Rule pattern → anchored regex: specials quoted, `*` → `.*`, a
    * TERMINAL `$` anchors (inner `$` is literal per the RFC). */
  def patternRegex(p: Column): Column = {
    val esc = regexp_replace(p, "([.^+?(){}\\[\\]\\\\|])", "\\\\$1")
    val starred = regexp_replace(esc, "\\*", ".*")
    val dollars = regexp_replace(starred, "\\$", "\\\\\\$")
    val anchored = regexp_replace(dollars, "\\\\\\$$", "\\$")
    concat(lit("^"), anchored)
  }

  /** Longest-match verdict for each (domain, path) in `urls` against
    * `rules` (the [[parseRules]] shape) for `agent`: appends a boolean
    * `outCol`. Group selection per RFC 9309 §2.2.1: a group's product
    * token governs the agent when it is a case-insensitive PREFIX of
    * the agent name (`User-agent: graft` governs `graftbot`); the
    * MOST SPECIFIC applicable group wins (longest matching token),
    * else the `*` group; a domain with no applicable rules (or no
    * robots.txt at all) is allowed. Rule specificity within the group
    * is pattern length; ties resolve to Allow. */
  def isAllowed(urls: DataFrame, rules: DataFrame, agent: String,
      domainCol: String = "domain", pathCol: String = "path",
      outCol: String = "allowed"): DataFrame = {
    val a = agent.toLowerCase
    val r = rules.filter(col("agent") === "*" ||
      lit(a).startsWith(col("agent")))
    val specLen = r.filter(col("agent") =!= "*")
      .groupBy(domainCol).agg(max(length(col("agent"))).as("__ml"))
    val eff = r.join(specLen, Seq(domainCol), "left")
      .filter(when(col("__ml").isNotNull,
        col("agent") =!= "*" && length(col("agent")) === col("__ml"))
        .otherwise(col("agent") === "*"))
      .withColumn("__re", patternRegex(col("pattern")))
      .withColumn("__len", length(col("pattern")))
      .select(col(domainCol), col("allow"), col("__re"), col("__len"))
    val verdicts = urls.select(col(domainCol), col(pathCol)).distinct()
      .join(eff, Seq(domainCol), "left")
      .withColumn("__m", col("__re").isNotNull &&
        regexp_like(col(pathCol), col("__re")))
      .groupBy(domainCol, pathCol)
      // max of (len, allow): longest pattern wins, allow wins ties
      .agg(max(when(col("__m"),
        struct(col("__len").as("l"), col("allow").cast("int").as("a"))))
        .as("__best"))
      .select(col(domainCol), col(pathCol),
        coalesce(col("__best").getField("a") === 1, lit(true)).as(outCol))
    urls.join(verdicts, Seq(domainCol, pathCol), "left")
  }
}
