package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL parsing, canonicalization, and registered-domain extraction —
  * the provenance toolkit of a web-scale corpus pipeline.
  *
  * The reference's corpus rows carry a `link` URL column straight off
  * the arXiv feed (SDA:117–125) and never normalize it; at web-crawl
  * scale the URL is the primary dedup and governance key, and raw URLs
  * disagree on case, tracking params, default ports, and fragments —
  * the same page appears under thousands of spellings. The standard
  * cleanup (CCNet / C4 lineage): lowercase the host, strip `www.`,
  * default ports, fragments, and tracking parameters, sort what
  * remains, then fold to the registered domain for per-site policy
  * (blocklists, per-domain caps).
  *
  * Everything here is a pure `Column` expression tree — split /
  * element_at / lambda filters, no UDF, no shuffle — so it rides
  * whole-stage codegen and replays verbatim as SQL list functions on
  * any engine. Parsing is delimiter-exact rather than RFC-complete:
  * scheme `://` hostport `/` path `?` query `#` fragment, which covers
  * the crawl-pipeline contract (http/https URLs already validated at
  * fetch time).
  */
object UrlOps {

  /** `scheme://rest` → scheme. */
  def scheme(url: Column): Column = element_at(split(url, "://"), 1)

  // try_: a scheme-less junk row yields NULLs downstream instead of an
  // ANSI executor crash (the corrupt-input contract everywhere here)
  private def afterScheme(url: Column): Column =
    try_element_at(split(url, "://"), lit(2))

  /** host[:port] — the authority before the first path slash, query
    * `?`, or fragment `#` (a URL may attach a query/fragment directly
    * to the authority, `https://example.com?a=1` — a common real-crawl
    * shape). */
  def hostPort(url: Column): Column =
    element_at(split(afterScheme(url), "[/?#]"), 1)

  /** Lowercased host without the port. */
  def host(url: Column): Column =
    lower(element_at(split(hostPort(url), ":"), 1))

  /** Port as a string, '' when absent. */
  def port(url: Column): Column =
    coalesce(try_element_at(split(hostPort(url), ":"), lit(2)), lit(""))

  /** path?query#fragment — everything after the authority ('' when the
    * URL ends at the host). */
  private def pathQueryFrag(url: Column): Column = {
    val rest = afterScheme(url)
    val hp = hostPort(url)
    rest.substr(length(hp) + 1, length(rest))
  }

  /** Path without query or fragment. */
  def path(url: Column): Column =
    element_at(split(element_at(split(pathQueryFrag(url), "#"), 1), "\\?"), 1)

  /** Query string ('' when absent; fragment excluded). */
  def query(url: Column): Column =
    coalesce(
      try_element_at(split(element_at(split(pathQueryFrag(url), "#"), 1), "\\?"),
        lit(2)),
      lit(""))

  /** Fragment ('' when absent). */
  def fragment(url: Column): Column =
    coalesce(try_element_at(split(pathQueryFrag(url), "#"), lit(2)), lit(""))

  /** Tracking parameters to strip (the industry-standard set: UTM
    * campaign tags, click ids, bare ref). */
  private val trackingPrefixes = Seq("utm_", "fbclid=", "gclid=", "ref=")

  /** Surviving query params, sorted — '' when the query was empty or
    * all-tracking. */
  def cleanQuery(url: Column): Column = {
    val params = filter(split(query(url), "&"), p =>
      (p =!= "") && !trackingPrefixes
        .map(pre => p.startsWith(pre)).reduce(_ || _))
    array_join(array_sort(params), "&")
  }

  /** Canonical URL: lowercase host, `www.` stripped, default ports
    * (80/443) dropped, path's trailing slashes trimmed, tracking
    * params removed and the rest sorted, fragment dropped. The dedup
    * and provenance key — two spellings of one page collapse. */
  def canonicalize(url: Column): Column = {
    val h = regexp_replace(host(url), "^www\\.", "")
    val p = port(url)
    val keepPort = when(p === "" || p === "80" || p === "443", lit(""))
      .otherwise(concat(lit(":"), p))
    val cleanPath = rtrim(path(url), "/")
    val q = cleanQuery(url)
    concat(scheme(url), lit("://"), h, keepPort, cleanPath,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** SURT key (Sort-friendly URI Reordered Transform — the CDX index
    * key of every public web archive: OpenWayback's canonical form,
    * Common Crawl's cluster.idx/cdx-*.gz first field):
    * `com,example)/path?a=1` — host labels REVERSED and comma-joined,
    * scheme dropped, then `)` and the canonicalized path + query.
    * Host reversal is what makes a lexicographic sort group a domain's
    * pages (and all of `*.example.com`) into one contiguous key range,
    * so a range-partitioned index prunes by domain.
    *
    * Normalizations match [[canonicalize]]: lowercase host, `www.`
    * strip, default-port drop, trailing-slash trim, tracking-param
    * strip + param sort, fragment drop; the whole key lowercases
    * (archive keys are case-folded). Pure `Column` tree.
    *
    * This is the engine's INTERNAL key, aligned with [[canonicalize]]
    * so frontier and index always agree — it is NOT byte-compatible
    * with published cdx-*.gz keys (those keep a root path as `)/`
    * where this trims it, and do not strip `www.` or tracking
    * params); joining against a public index means re-keying one
    * side. */
  def surt(url: Column): Column = {
    val h = regexp_replace(host(url), "^www\\.", "")
    val revHost = array_join(reverse(split(h, "\\.")), ",")
    val p = port(url)
    val keepPort = when(p === "" || p === "80" || p === "443", lit(""))
      .otherwise(concat(lit(":"), p))
    val cleanPath = rtrim(path(url), "/")
    val q = cleanQuery(url)
    lower(concat(revHost, keepPort, lit(")"), cleanPath,
      when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }

  /** Multi-label public suffixes the sf corpora exercise; a production
    * deployment swaps in the full public-suffix list (it is a bounded
    * lookup table — broadcast-sized by nature). */
  val multiLabelSuffixes: Seq[String] = Seq("co.uk", "com.au", "co.jp")

  /** Registered domain: the public suffix plus one label —
    * `a.b.example.co.uk` → `example.co.uk`, `www.example.com` →
    * `example.com`. */
  def registeredDomain(hostCol: Column, suffixes: Seq[String] = multiLabelSuffixes): Column = {
    val parts = split(hostCol, "\\.")
    val last2 = concat_ws(".", element_at(parts, -2), element_at(parts, -1))
    val last3 = concat_ws(".", element_at(parts, -3), element_at(parts, -2),
      element_at(parts, -1))
    when(size(parts) <= 2, concat_ws(".", parts))
      .when(last2.isin(suffixes: _*), last3)
      .otherwise(last2)
  }
}
