package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Table-driven public-suffix-list registered-domain extraction — the
  * production form of [[UrlOps.registeredDomain]].
  *
  * The real PSL (publicsuffix.org) is ~9k rules; an `isin` of 9k
  * literals is an unplannable expression, so the rule set rides as a
  * TABLE and matching is a handful of broadcast equi-joins (the PSL is
  * a bounded lookup table — broadcast-sized by nature, the DSIR-ratio
  * precedent). A crawl user hits `.com.br`/`.co.in` on day one; this
  * path resolves them, plus the list's two special rule forms:
  *
  *  - wildcard `*.ck`: every single label under `.ck` is itself a
  *    public suffix (so `shop.x.ck` registers as `shop.x.ck`, and a
  *    bare `x.ck` has NO registrable part);
  *  - exception `!www.ck`: carves `www.ck` back out of the wildcard
  *    (registered domain of `a.www.ck` is `www.ck`).
  *
  * Matching algorithm (publicsuffix.org/list/): among all rules whose
  * labels suffix-match the host (with `*` matching exactly one
  * label), an exception rule prevails; otherwise the rule with the
  * most labels. The public suffix is the matched labels (one fewer
  * for an exception), the registered domain is the public suffix plus
  * one label — NULL when the host IS a public suffix (this is the PSL
  * contract; the expression fast path returns short hosts verbatim
  * instead, the one documented divergence).
  *
  * Scale shape: per rule-label-count level (bounded by the longest
  * rule, ≤ 5), ONE broadcast equi-join for literal forms and one for
  * wildcard forms — all shuffle-free; the prevailing-rule selection
  * is a pure coalesce projection. The corpus is never exchanged.
  * Every step replays as SQL (candidate suffixes via list_slice, the
  * rules as a VALUES table, precedence as a row_number window).
  */
object Psl {

  /** A representative snapshot of the public suffix list: the major
    * gTLDs, the ccTLDs and ccSLDs a multilingual crawl actually hits,
    * and the wildcard/exception forms. A production deployment swaps
    * in the full current list — same schema, same operator. */
  val snapshotRules: Seq[String] = Seq(
    // gTLDs / common TLDs
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz",
    "name", "pro", "mobi", "travel", "museum", "aero", "coop", "jobs",
    "cat", "tel", "xxx", "app", "dev", "io", "ai", "co", "me", "tv",
    "cc", "ws", "xyz", "site", "online", "store", "tech", "blog",
    "cloud", "page", "wiki", "news", "live", "studio", "design",
    "agency", "digital", "network", "systems", "solutions", "email",
    "zone", "world", "today", "space", "fun", "run", "codes",
    // plain ccTLDs
    "us", "ca", "mx", "de", "fr", "es", "it", "nl", "be", "ch", "at",
    "se", "no", "dk", "fi", "pl", "cz", "sk", "hu", "ro", "bg", "gr",
    "pt", "ie", "is", "lt", "lv", "ee", "ru", "ua", "by", "tr", "il",
    "sa", "ae", "eg", "ma", "tn", "ng", "ke", "za", "cn", "jp", "kr",
    "tw", "hk", "sg", "my", "id", "th", "vn", "ph", "in", "pk", "bd",
    "lk", "np", "ir", "iq", "au", "nz", "fj", "br", "ar", "cl", "pe",
    "uy", "py", "bo", "ec", "ve", "cu", "do", "gt", "cr", "pa", "uk",
    "eu", "su", "asia",
    // United Kingdom second levels
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "ac.uk",
    "gov.uk", "nhs.uk", "police.uk", "*.sch.uk",
    // Australia / New Zealand
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au",
    "id.au", "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    "school.nz", "geek.nz", "gen.nz", "maori.nz",
    // Japan / Korea / China / Taiwan / Hong Kong
    "co.jp", "ne.jp", "or.jp", "go.jp", "ac.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp", "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr",
    "ac.kr", "pe.kr", "com.cn", "net.cn", "org.cn", "gov.cn",
    "edu.cn", "ac.cn", "com.tw", "net.tw", "org.tw", "edu.tw",
    "gov.tw", "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk",
    // South / Southeast Asia
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "nic.in", "ac.in", "edu.in", "res.in", "gov.in", "mil.in",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "com.my",
    "net.my", "org.my", "edu.my", "gov.my", "co.id", "or.id", "ac.id",
    "web.id", "sch.id", "go.id", "co.th", "in.th", "ac.th", "go.th",
    "or.th", "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "com.pk",
    "net.pk", "org.pk", "edu.pk", "gov.pk", "com.bd", "net.bd",
    "org.bd", "edu.bd", "gov.bd", "com.lk", "org.lk", "edu.lk",
    "gov.lk", "com.np", "org.np", "edu.np", "gov.np",
    // Americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "art.br",
    "blog.br", "eco.br", "com.mx", "net.mx", "org.mx", "edu.mx",
    "gob.mx", "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "com.pe",
    "net.pe", "org.pe", "edu.pe", "gob.pe", "com.cl", "cl",
    "com.uy", "edu.uy", "gub.uy", "org.uy", "com.ve", "net.ve",
    "org.ve", "com.ec", "net.ec", "org.ec", "com.do", "net.do",
    "org.do", "com.gt", "net.gt", "org.gt",
    // Middle East / Africa
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "com.sa",
    "net.sa", "org.sa", "edu.sa", "gov.sa", "com.eg", "net.eg",
    "org.eg", "edu.eg", "gov.eg", "co.za", "net.za", "org.za",
    "edu.za", "gov.za", "ac.za", "web.za", "co.ke", "or.ke", "ne.ke",
    "go.ke", "ac.ke", "com.ng", "net.ng", "org.ng", "edu.ng",
    "gov.ng", "co.ma", "net.ma", "org.ma", "ac.ma", "gov.ma",
    // Europe second levels
    "co.at", "or.at", "ac.at", "gv.at", "com.pl", "net.pl", "org.pl",
    "edu.pl", "gov.pl", "waw.pl", "com.ru", "net.ru", "org.ru",
    "msk.ru", "spb.ru", "com.ua", "net.ua", "org.ua", "edu.ua",
    "gov.ua", "kiev.ua", "com.gr", "net.gr", "org.gr", "edu.gr",
    "gov.gr", "com.pt", "net.pt", "org.pt", "edu.pt", "gov.pt",
    "com.ro", "org.ro", "tm.ro", "nt.ro", "com.es", "nom.es",
    "org.es", "gob.es", "edu.es",
    // wildcard + exception forms (the .ck family is the canonical
    // publicsuffix.org example; *.bd/*.er are real current wildcards)
    "*.ck", "!www.ck", "*.er", "*.np",
  )

  /** The snapshot as a one-column `rule` DataFrame (the shape a PSL
    * snapshot table has on disk). */
  def rulesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    snapshotRules.toDF("rule")
  }

  /** Normalized rule relation: `(form, is_exc, n, ps_labels)` — form
    * is the rule without the `!` marker, n its label count, ps_labels
    * the public-suffix label count a prevailing match implies (one
    * fewer than n for exceptions). */
  private def normalized(psl: DataFrame): DataFrame = {
    val bare = when(substring(col("rule"), 1, 1) === "!",
      expr("substring(rule, 2)")).otherwise(col("rule"))
    psl.select(bare.as("form"),
        (substring(col("rule"), 1, 1) === "!").cast("int").as("is_exc"))
      // A duplicated form must not fan out the 1:<=1 joins, and the
      // survivor must be deterministic: when both `x.y` and `!x.y`
      // appear, the exception prevails (publicsuffix.org precedence),
      // so fold with max(is_exc) rather than an arbitrary-row drop.
      .groupBy("form").agg(max("is_exc").as("is_exc"))
      .withColumn("n", size(split(col("form"), "\\.")))
      .withColumn("ps_labels",
        when(col("is_exc") === 1, col("n") - 1).otherwise(col("n")))
  }

  /** Append `outCol` = registered domain of `hostCol` under the rule
    * table `psl` (one `rule` string column, PSL syntax). NULL when the
    * host is itself a public suffix (nothing registrable) or NULL. */
  def registeredDomainByTable(df: DataFrame, hostCol: String,
      psl: DataFrame, outCol: String = "domain"): DataFrame = {
    val rules = normalized(psl)
    val maxL = rules.agg(max("n")).head().getInt(0)
    require(maxL >= 1 && maxL <= 6, s"rule label depth out of range: $maxL")
    val orig = df.columns.toSeq

    var cur = df
      .withColumn("__parts", split(col(hostCol), "\\."))
      .withColumn("__np", size(col("__parts")))
    for (l <- 1 to maxL) {
      // candidate suffix of l labels, and its wildcard form (`*` over
      // the leftmost matched label); both NULL when the host is
      // shorter than the level — NULL never equi-joins.
      cur = cur.withColumn(s"__c$l",
        when(col("__np") >= l,
          concat_ws(".", slice(col("__parts"), -l, l))))
      if (l >= 2) cur = cur.withColumn(s"__w$l",
        when(col("__np") >= l,
          concat(lit("*."),
            concat_ws(".", slice(col("__parts"), -(l - 1), l - 1)))))
    }
    for (l <- 1 to maxL) {
      val plain = rules
        .filter(col("n") === l && !col("form").startsWith("*."))
        .select(col("form").as(s"__f$l"), col("is_exc").as(s"__e$l"),
          col("ps_labels").as(s"__p$l"))
      cur = cur.join(broadcast(plain),
        cur(s"__c$l") === plain(s"__f$l"), "left")
      if (l >= 2) {
        val wild = rules
          .filter(col("n") === l && col("form").startsWith("*."))
          .select(col("form").as(s"__wf$l"),
            col("ps_labels").as(s"__wp$l"))
        cur = cur.join(broadcast(wild),
          cur(s"__w$l") === wild(s"__wf$l"), "left")
      }
    }
    // prevailing rule: any exception first (PSL: exceptions beat
    // length), then the longest match (exact and wildcard of one
    // level imply the same ps_labels), then the implicit `*` default
    // (rightmost label is the public suffix).
    val psLabels = coalesce(
      (maxL to 1 by -1).map(l =>
        when(col(s"__e$l") === 1, col(s"__p$l"))) ++
      (maxL to 1 by -1).flatMap(l =>
        Seq(when(col(s"__e$l") === 0, col(s"__p$l"))) ++
          (if (l >= 2) Seq(col(s"__wp$l")) else Nil)) :+
      lit(1): _*)
    cur
      .withColumn(outCol, when(col("__np") > psLabels,
        concat_ws(".",
          slice(col("__parts"), -(psLabels + lit(1)), psLabels + lit(1)))))
      .select((orig :+ outCol).map(col): _*)
  }
}
