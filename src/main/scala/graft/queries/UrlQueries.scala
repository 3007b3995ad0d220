package graft.queries

import graft.core.Tables
import graft.operators.UrlOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** URL-provenance coverage: parsing, canonicalization, registered-domain
  * rollups, and canonical-URL dedup over a deterministic crawl-shaped URL
  * column derived from `documents` (the corpus ships no URL column, so
  * both engines derive the SAME urls from doc_id/source/lang — mixed-case
  * hosts, www prefixes, default and explicit ports, tracking params,
  * fragments, trailing slashes, multi-label public suffixes).
  *
  * Everything is a shuffle-free expression tree until the final rollup;
  * the reference's corpus rows carry exactly such a `link` column off the
  * arXiv feed (SDA:117–125). */
object UrlQueries {

  private def docs(s: SparkSession, dir: String) = Tables.load(s, dir, "documents")

  /** The deterministic raw-URL fixture (Spark side; [[urlSqlCte]] is the
    * byte-identical DuckDB derivation). */
  private def urlCol: Column = {
    val id = col("doc_id")
    // page identity: (source, lang, article) — article repeats mod 13,
    // and tld/query derive from source/article, so distinct docs land
    // on the SAME canonical page and only the noise below varies
    val article = pmod(id, lit(13)).cast("string")
    val tldSel = pmod(pmod(id, lit(20)), lit(4))
    val tld = when(tldSel === 0, lit("com"))
      .when(tldSel === 1, lit("org"))
      .when(tldSel === 2, lit("co.uk"))
      .otherwise(lit("net"))
    val qs = when(pmod(id, lit(13)) % 3 === 0,
        lit("?utm_source=feed&utm_campaign=x"))
      .when(pmod(id, lit(13)) % 3 === 1,
        concat(lit("?id="), article, lit("&utm_medium=email&b=2")))
      .otherwise(lit(""))
    // canonicalization noise: spelling variants of the same page
    val scheme = when(pmod(id, lit(17)) === 0, lit("http")).otherwise(lit("https"))
    val www = when(pmod(id, lit(7)) === 0, lit("WWW.")).otherwise(lit(""))
    val srcc = when(pmod(id, lit(13)) === 0, upper(col("source")))
      .otherwise(col("source"))
    val port = when(pmod(id, lit(5)) === 0, lit(":443")).otherwise(lit(""))
    val pathTail = when(pmod(id, lit(6)) === 0, lit("/")).otherwise(lit(""))
    val frag = when(pmod(id, lit(11)) === 0, lit("#sec2")).otherwise(lit(""))
    concat(scheme, lit("://"), www, srcc, lit("hub."), tld, port,
      lit("/"), col("lang"), lit("/article/"), article, pathTail, qs, frag)
  }

  /** Same derivation as a DuckDB CTE body (`u(doc_id, lang, url)`). */
  private val urlSqlCte: String =
    """SELECT doc_id, lang,
      |  (CASE WHEN doc_id % 17 = 0 THEN 'http' ELSE 'https' END) || '://' ||
      |  (CASE WHEN doc_id % 7 = 0 THEN 'WWW.' ELSE '' END) ||
      |  (CASE WHEN doc_id % 13 = 0 THEN upper(source) ELSE source END) ||
      |  'hub.' ||
      |  (CASE (doc_id % 20) % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
      |                          WHEN 2 THEN 'co.uk' ELSE 'net' END) ||
      |  (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END) ||
      |  '/' || lang || '/article/' || CAST(doc_id % 13 AS VARCHAR) ||
      |  (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END) ||
      |  (CASE (doc_id % 13) % 3
      |     WHEN 0 THEN '?utm_source=feed&utm_campaign=x'
      |     WHEN 1 THEN '?id=' || CAST(doc_id % 13 AS VARCHAR) ||
      |                 '&utm_medium=email&b=2'
      |     ELSE '' END) ||
      |  (CASE WHEN doc_id % 11 = 0 THEN '#sec2' ELSE '' END) AS url
      |FROM documents""".stripMargin

  /** DuckDB replay of [[UrlOps.canonicalize]] + host + registered domain,
    * as CTEs over `u` — list-function arithmetic matching the engine's
    * expression tree step for step. Produces `c(doc_id, lang, url, host,
    * domain, canon)`. */
  private val canonSqlCte: String =
    """SELECT doc_id, lang, url, host, domain,
      |  scheme || '://' || h || keep_port || clean_path ||
      |    (CASE WHEN cq = '' THEN '' ELSE '?' || cq END) AS canon
      |FROM (
      |  SELECT doc_id, lang, url, scheme, host, h, clean_path,
      |    CASE WHEN port IN ('', '80', '443') THEN '' ELSE ':' || port END
      |      AS keep_port,
      |    coalesce(array_to_string(list_sort(list_filter(
      |      string_split(q, '&'),
      |      x -> x <> '' AND NOT starts_with(x, 'utm_')
      |        AND NOT starts_with(x, 'fbclid=')
      |        AND NOT starts_with(x, 'gclid=')
      |        AND NOT starts_with(x, 'ref='))), '&'), '') AS cq,
      |    CASE WHEN len(parts) <= 2 THEN array_to_string(parts, '.')
      |         WHEN parts[-2] || '.' || parts[-1]
      |              IN ('co.uk', 'com.au', 'co.jp')
      |           THEN parts[-3] || '.' || parts[-2] || '.' || parts[-1]
      |         ELSE parts[-2] || '.' || parts[-1] END AS domain
      |  FROM (
      |    SELECT doc_id, lang, url, scheme, host, h, port,
      |      rtrim(string_split(pathq, '?')[1], '/') AS clean_path,
      |      coalesce(string_split(pathq, '?')[2], '') AS q,
      |      string_split(h, '.') AS parts
      |    FROM (
      |      SELECT doc_id, lang, url, scheme, host,
      |        regexp_replace(host, '^www\.', '') AS h,
      |        coalesce(string_split(hostport, ':')[2], '') AS port,
      |        string_split(substr(rest, len(hostport) + 1), '#')[1] AS pathq
      |      FROM (
      |        SELECT doc_id, lang, url,
      |          string_split(url, '://')[1] AS scheme,
      |          string_split(url, '://')[2] AS rest,
      |          string_split_regex(string_split(url, '://')[2],
      |            '[/?#]')[1] AS hostport,
      |          lower(string_split(string_split_regex(string_split(url,
      |            '://')[2], '[/?#]')[1], ':')[1]) AS host
      |        FROM u))))""".stripMargin

  /** Host fixture for the PSL path: every rule form exercised —
    * deep subdomains, UK/BR/IN second levels, the `*.ck` wildcard
    * (both "is itself a public suffix" and "+1 label" shapes), the
    * `!www.ck` exception, the 3-label `*.sch.uk` wildcard, and an
    * unlisted single label. */
  private def pslHostCol: Column = {
    val sid = pmod(col("doc_id"), lit(7)).cast("string")
    val sel = pmod(col("doc_id"), lit(10))
    when(sel === 0, concat(lit("deep.sub"), sid, lit(".example"), sid, lit(".com")))
      .when(sel === 1, concat(lit("example"), sid, lit(".co.uk")))
      .when(sel === 2, concat(lit("a.b.example"), sid, lit(".com.br")))
      .when(sel === 3, concat(lit("cdn.example"), sid, lit(".co.in")))
      .when(sel === 4, concat(lit("x"), sid, lit(".ck")))
      .when(sel === 5, concat(lit("shop.x"), sid, lit(".ck")))
      .when(sel === 6, lit("www.ck"))
      .when(sel === 7, concat(lit("example"), sid, lit(".ac.uk")))
      .when(sel === 8, lit("localhost"))
      .otherwise(concat(lit("x.grammar"), sid, lit(".sch.uk")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Registered domain against the PSL SNAPSHOT TABLE (the production
    // path — the expression list stays the fast path for tiny embedded
    // rule sets): per rule-depth broadcast equi-joins, prevailing-rule
    // coalesce, NULL for hosts that are themselves public suffixes.
    "url_domain_psl" -> ((s, dir) => {
      val h = docs(s, dir).filter(col("doc_id") < 200)
        .select(col("doc_id"), pslHostCol.as("host"))
      graft.operators.Psl.registeredDomainByTable(h, "host",
          graft.operators.Psl.rulesDf(s), "domain")
        .orderBy("doc_id")
    }),
    // Per-URL canonicalization: every cleanup rule exercised (case,
    // www, default/explicit port, tracking strip, param sort, trailing
    // slash, fragment) and hash-checked string for string.
    "url_canonicalize" -> ((s, dir) => {
      docs(s, dir).filter(col("doc_id") < 90)
        .select(col("doc_id"), urlCol.as("url"))
        .select(col("doc_id"), col("url"),
          UrlOps.canonicalize(col("url")).as("canon"),
          UrlOps.host(col("url")).as("host"),
          UrlOps.registeredDomain(
            regexp_replace(UrlOps.host(col("url")), "^www\\.", ""))
            .as("domain"))
        .orderBy("doc_id")
    }),
    // SURT keys (the CDX index key of every public web archive):
    // host-reversed sort-friendly form, every canonicalization rule
    // riding along, hash-checked string for string. The domain-
    // contiguity property a SURT sort guarantees (all of a registered
    // domain's pages in one key range) is pinned by UrlOpsSpec.
    "url_surt" -> ((s, dir) => {
      docs(s, dir).filter(col("doc_id") < 90)
        .select(col("doc_id"), urlCol.as("url"))
        .select(col("doc_id"), col("url"),
          UrlOps.surt(col("url")).as("surt"))
        .orderBy("doc_id")
    }),
    // Registered-domain rollup + blocklist verdict: the per-site
    // governance shape (domain caps, blocklists) — one hash shuffle on
    // the domain key.
    "url_domain_stats" -> ((s, dir) => {
      val blocked = Seq("src1hub.org", "src3hub.co.uk")
      val c = docs(s, dir)
        .select(col("doc_id"), urlCol.as("url"))
        .select(col("doc_id"), col("url"),
          UrlOps.canonicalize(col("url")).as("canon"),
          UrlOps.registeredDomain(
            regexp_replace(UrlOps.host(col("url")), "^www\\.", ""))
            .as("domain"))
      c.groupBy("domain")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("canon")).as("n_pages"),
          countDistinct(col("url")).as("n_raw"))
        .withColumn("blocked", col("domain").isin(blocked: _*))
        .orderBy("domain")
    }),
    // Canonical-URL dedup: distinct raw spellings that collapse onto
    // one canonical page (article ids repeat mod 37, so true multi-doc
    // pages exist); first-wins keeper per page, collapsed groups only.
    "url_dedup_canonical" -> ((s, dir) => {
      docs(s, dir)
        .select(col("doc_id"), urlCol.as("url"))
        .select(col("doc_id"), col("url"),
          UrlOps.canonicalize(col("url")).as("canon"))
        .groupBy("canon")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("url")).as("n_spellings"),
          min(col("doc_id")).as("keeper"))
        .filter(col("n_docs") > 1)
        .orderBy("canon")
    }),
    // Per-domain document cap (crawl-pipeline domain balancing): at
    // most 3 docs per registered domain, chosen deterministically by
    // (md5 fraction, doc_id) — so the survivor set is independent of
    // partitioning and run order. One rank window per domain key; the
    // engine's heap-top-k window rewrite keeps it bounded-memory.
    "url_domain_cap" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val c = docs(s, dir)
        .select(col("doc_id"), urlCol.as("url"))
        .select(col("doc_id"),
          UrlOps.registeredDomain(
            regexp_replace(UrlOps.host(col("url")), "^www\\.", ""))
            .as("domain"))
        .withColumn("frac", graft.operators.Sampling.hashFraction(col("doc_id")))
      val w = Window.partitionBy("domain").orderBy(col("frac"), col("doc_id"))
      c.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("domain"), col("rk").cast("long").as("rk"), col("doc_id"))
        .orderBy("domain", "rk")
    }),
  )

  /** The snapshot rules as a VALUES body — the oracle replays the
    * SAME table the operator broadcasts. */
  private val pslValues: String =
    graft.operators.Psl.snapshotRules.map(r => s"('$r')").mkString(", ")

  private val pslMaxL: Int =
    graft.operators.Psl.snapshotRules
      .map(r => r.stripPrefix("!").count(_ == '.') + 1).max

  val oracleSql: Map[String, String] = Map(
    // PSL replay: candidate suffixes per depth via list_slice, rules
    // from VALUES, prevailing rule by (exception, length) precedence,
    // public suffix + 1 label — NULL when nothing is registrable.
    "url_domain_psl" ->
      s"""WITH hh AS (
         |  SELECT doc_id,
         |    CASE doc_id % 10
         |      WHEN 0 THEN 'deep.sub' || sid || '.example' || sid || '.com'
         |      WHEN 1 THEN 'example' || sid || '.co.uk'
         |      WHEN 2 THEN 'a.b.example' || sid || '.com.br'
         |      WHEN 3 THEN 'cdn.example' || sid || '.co.in'
         |      WHEN 4 THEN 'x' || sid || '.ck'
         |      WHEN 5 THEN 'shop.x' || sid || '.ck'
         |      WHEN 6 THEN 'www.ck'
         |      WHEN 7 THEN 'example' || sid || '.ac.uk'
         |      WHEN 8 THEN 'localhost'
         |      ELSE 'x.grammar' || sid || '.sch.uk' END AS host
         |  FROM (SELECT doc_id, CAST(doc_id % 7 AS VARCHAR) AS sid
         |        FROM documents WHERE doc_id < 200)),
         |rr AS (
         |  SELECT DISTINCT
         |    CASE WHEN starts_with(rule, '!') THEN substr(rule, 2)
         |         ELSE rule END AS form,
         |    CASE WHEN starts_with(rule, '!') THEN 1 ELSE 0 END AS is_exc
         |  FROM (VALUES $pslValues) t(rule)),
         |r2 AS (
         |  SELECT form, is_exc, len(string_split(form, '.')) AS n,
         |    CASE WHEN is_exc = 1 THEN len(string_split(form, '.')) - 1
         |         ELSE len(string_split(form, '.')) END AS ps_labels
         |  FROM rr),
         |h AS (
         |  SELECT doc_id, host, string_split(host, '.') AS parts,
         |    len(string_split(host, '.')) AS np
         |  FROM hh),
         |lv AS (SELECT unnest(range(1, ${pslMaxL + 1})) AS l),
         |cand AS (
         |  SELECT h.doc_id, lv.l,
         |    array_to_string(list_slice(parts, np - l + 1, np), '.') AS c,
         |    CASE WHEN lv.l >= 2 THEN
         |      '*.' || array_to_string(list_slice(parts, np - l + 2, np), '.')
         |    END AS w
         |  FROM h JOIN lv ON h.np >= lv.l),
         |m AS (
         |  SELECT cand.doc_id, r.is_exc, r.ps_labels, r.n
         |  FROM cand JOIN r2 r ON r.form = cand.c OR r.form = cand.w),
         |b AS (
         |  SELECT doc_id, ps_labels,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY is_exc DESC, n DESC) AS rn
         |  FROM m)
         |SELECT h.doc_id, h.host,
         |  CASE WHEN h.np > coalesce(b.ps_labels, 1)
         |    THEN array_to_string(list_slice(h.parts,
         |      h.np - coalesce(b.ps_labels, 1), h.np), '.') END AS domain
         |FROM h LEFT JOIN (SELECT doc_id, ps_labels FROM b WHERE rn = 1) b
         |  USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "url_canonicalize" ->
      s"""WITH u AS ($urlSqlCte),
         |c AS ($canonSqlCte)
         |SELECT doc_id, url, canon, host, domain
         |FROM c WHERE doc_id < 90 ORDER BY doc_id""".stripMargin,
    // SURT replay: the same delimiter-exact parse as the canonicalize
    // CTE, then host-label reversal + `)` + canonical path?query, all
    // lowercased — list_reverse is the DuckDB twin of the engine's
    // reverse(split(...)) tree.
    "url_surt" ->
      s"""WITH u AS ($urlSqlCte),
         |s AS (
         |  SELECT doc_id, url,
         |    lower(array_to_string(list_reverse(string_split(h, '.')),
         |        ',') ||
         |      (CASE WHEN port IN ('', '80', '443') THEN ''
         |            ELSE ':' || port END) ||
         |      ')' || clean_path ||
         |      (CASE WHEN cq = '' THEN '' ELSE '?' || cq END)) AS surt
         |  FROM (
         |    SELECT doc_id, url, h, port,
         |      rtrim(string_split(pathq, '?')[1], '/') AS clean_path,
         |      coalesce(array_to_string(list_sort(list_filter(
         |        string_split(coalesce(string_split(pathq, '?')[2], ''),
         |          '&'),
         |        x -> x <> '' AND NOT starts_with(x, 'utm_')
         |          AND NOT starts_with(x, 'fbclid=')
         |          AND NOT starts_with(x, 'gclid=')
         |          AND NOT starts_with(x, 'ref='))), '&'), '') AS cq
         |    FROM (
         |      SELECT doc_id, url,
         |        regexp_replace(host, '^www\\.', '') AS h,
         |        coalesce(string_split(hostport, ':')[2], '') AS port,
         |        string_split(substr(rest, len(hostport) + 1), '#')[1]
         |          AS pathq
         |      FROM (
         |        SELECT doc_id, url,
         |          string_split(url, '://')[2] AS rest,
         |          string_split_regex(string_split(url, '://')[2],
         |            '[/?#]')[1] AS hostport,
         |          lower(string_split(string_split_regex(string_split(url,
         |            '://')[2], '[/?#]')[1], ':')[1]) AS host
         |        FROM u))))
         |SELECT doc_id, url, surt FROM s
         |WHERE doc_id < 90 ORDER BY doc_id""".stripMargin,
    "url_domain_stats" ->
      s"""WITH u AS ($urlSqlCte),
         |c AS ($canonSqlCte)
         |SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT canon) AS BIGINT) AS n_pages,
         |  CAST(count(DISTINCT url) AS BIGINT) AS n_raw,
         |  domain IN ('src1hub.org', 'src3hub.co.uk') AS blocked
         |FROM c GROUP BY domain ORDER BY domain""".stripMargin,
    "url_dedup_canonical" ->
      s"""WITH u AS ($urlSqlCte),
         |c AS ($canonSqlCte)
         |SELECT canon, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT url) AS BIGINT) AS n_spellings,
         |  CAST(min(doc_id) AS BIGINT) AS keeper
         |FROM c GROUP BY canon HAVING count(*) > 1
         |ORDER BY canon""".stripMargin,
    "url_domain_cap" ->
      s"""WITH u AS ($urlSqlCte),
         |c AS ($canonSqlCte),
         |r AS (
         |  SELECT domain, doc_id,
         |    row_number() OVER (PARTITION BY domain ORDER BY
         |      CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
         |        AS BIGINT) / 4294967296.0, doc_id) AS rk
         |  FROM c)
         |SELECT domain, CAST(rk AS BIGINT) AS rk, doc_id
         |FROM r WHERE rk <= 3 ORDER BY domain, rk""".stripMargin,
  )
}
