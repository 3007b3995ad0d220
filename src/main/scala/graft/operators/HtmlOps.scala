package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML text extraction and outlink harvesting — the step ZERO of a
  * web-scale training corpus: raw crawl pages are HTML, and everything
  * downstream here (C4 cleanup, Gopher gates, dedup, URL provenance)
  * operates on the extracted TEXT and the extracted LINKS.
  *
  * The reference ingests pre-extracted abstracts off the arXiv Atom
  * feed (reference src/databricks/syntetic_data_arxiv.py:75-129 pulls
  * `summary` already stripped), so it never needs this stage; a crawl
  * corpus hits it on page one. The pipeline implemented here is the
  * published C4/CCNet shape (Raffel et al. 2020 §2.2 extract → clean):
  * drop comment/script/style blocks, strip the remaining tags, decode
  * entities, collapse whitespace.
  *
  * Everything is a pure `Column` regex/replace expression tree — no
  * UDF, no shuffle, whole-stage-codegen'd, and fuses into the scan at
  * 100 TB (the extraction cost is exactly one pass over the page
  * bytes). Patterns are lookaround/backreference-free so java.util
  * .regex (Spark) and RE2 (the DuckDB oracle) execute them
  * identically; a full DOM parse is an external-adapter concern (like
  * torch embedding) — the regex tier is what C4 itself ran at corpus
  * scale.
  *
  * Known regex-tier boundary (shared with every regex extractor, and
  * pinned by HtmlOpsSpec so it is a contract, not a surprise): a `>`
  * INSIDE a quoted attribute value ends the tag early
  * (`<a title="a>b">` leaks `b">` into the text), and unclosed
  * `<script>`/`<style>` blocks strip as plain tags, leaking their
  * payload. Real-crawl rates for both are far below the noise the
  * downstream quality gates (Gopher/C4/`{`-rule) already absorb; a
  * corpus where they matter swaps in a DOM-parser adapter behind the
  * same Column seam.
  */
object HtmlOps {

  /** Escape the three HTML-active characters (`&` first — escaping is
    * the inverse of [[htmlUnescape]] on any text round-trip). */
  def htmlEscape(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, "&", "&amp;"),
        "<", "&lt;"),
      ">", "&gt;")

  /** Decode the common entities; `&amp;` LAST so `&amp;lt;` decodes to
    * the literal text `&lt;` (double-escaped input stays faithful). */
  def htmlUnescape(c: Column): Column = {
    val steps = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (from, to)) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(from), to)
    }
  }

  private val commentBlock = "(?s)<!--.*?-->"
  private val scriptBlock = "(?is)<script\\b[^>]*>.*?</script>"
  private val styleBlock = "(?is)<style\\b[^>]*>.*?</style>"

  /** Remove the three non-content block forms (comments, script,
    * style) — these carry code, not prose, and their payload must go
    * BEFORE tag-stripping or `if (a < b)` inside a script leaks into
    * the text as a half-eaten pseudo-tag. */
  def dropBlocks(c: Column): Column =
    Seq(commentBlock, scriptBlock, styleBlock).foldLeft(c)(
      (acc, p) => regexp_replace(acc, p, " "))

  /** Replace every remaining tag with a space (a space, not '': block
    * boundaries must not weld `...end<p>Start...` into one token). */
  def stripTags(c: Column): Column =
    regexp_replace(c, "(?s)<[^>]*>", " ")

  /** Full extraction: drop blocks → strip tags → decode entities →
    * collapse whitespace → trim. One codegen'd projection. */
  def extractText(c: Column): Column =
    trim(regexp_replace(
      htmlUnescape(stripTags(dropBlocks(c))), "\\s+", " "))

  /** First `<title>` payload ('' when the page has none). */
  def title(c: Column): Column =
    regexp_extract(c, "(?is)<title[^>]*>(.*?)</title>", 1)

  /** Every `href` attribute value (either quote style), in document
    * order — the crawl frontier / web-graph edge source. */
  def links(c: Column): Column =
    regexp_extract_all(c, lit("(?i)href\\s*=\\s*[\"']([^\"']+)[\"']"),
      lit(1))

  /** Block-STRUCTURED extraction: split at block-level closers
    * (`</p> </div> </h1..6> </li>`) and `<br>`, run the per-element
    * extraction on each piece, drop empties. [[extractText]] flattens
    * a page to one line, which starves the line-oriented cleanup tier
    * (C4 line rules, frequent-line dedup) — this is the form those
    * stages consume (`array_join(_, "\n")` re-joins it). Same pure
    * expression tree, still scan-fused. */
  def extractBlocks(c: Column): Column =
    filter(
      transform(
        split(dropBlocks(c), "(?i)</(?:p|div|h[1-6]|li)>|<br[^>]*>"),
        b => trim(regexp_replace(htmlUnescape(stripTags(b)),
          "\\s+", " "))),
      b => b =!= "")

  /** First `<meta name="…" content="…">` content for a given name
    * ('' when absent) — robots directives and descriptions, the crawl
    * governance metadata (a `noindex` page must be dropped BEFORE any
    * content lands in a training corpus). `name` is a literal. */
  def metaContent(c: Column, name: String): Column =
    regexp_extract(c,
      "(?is)<meta\\s[^>]*name=[\"']" +
        java.util.regex.Pattern.quote(name) +
        "[\"'][^>]*content=[\"']([^\"']*)[\"']", 1)

  /** Every `<a>` element as a `(href, follow)` struct — `follow` is
    * false for `rel="nofollow"` links, which a link graph must NOT
    * count as endorsements (the original PageRank-era contract;
    * sponsored/UGC links carry it). Elements without an href yield
    * href = ''. */
  def linkRels(c: Column): Column =
    transform(
      regexp_extract_all(c, lit("(?is)<a\\b[^>]*>"), lit(0)),
      a => struct(
        regexp_extract(a, "(?i)href\\s*=\\s*[\"']([^\"']+)[\"']", 1)
          .as("href"),
        (!a.rlike("(?i)rel\\s*=\\s*[\"']nofollow[\"']")).as("follow")))

  /** Every `<a>` element as a `(href, text)` struct — anchor text is
    * the classic off-page relevance signal (what OTHER pages call a
    * target). `text` runs the full extraction pipeline on the
    * element's payload; elements without an href yield href = ''. */
  def anchorPairs(c: Column): Column =
    transform(
      regexp_extract_all(c, lit("(?is)<a\\b[^>]*>.*?</a>"), lit(0)),
      a => struct(
        regexp_extract(a, "(?i)href\\s*=\\s*[\"']([^\"']+)[\"']", 1)
          .as("href"),
        extractText(a).as("text")))
}
