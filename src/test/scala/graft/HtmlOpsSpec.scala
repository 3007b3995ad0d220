package graft

import graft.operators.HtmlOps
import org.apache.spark.sql.functions._

class HtmlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(HtmlOps.extractText(col("h")))
      .as[String].head()

  test("script/style/comment payload never leaks into the text") {
    val html = "<html><!-- secret --><head>" +
      "<style>body { color: red; }</style>" +
      "<script>if (a < b && c > 0) { leak('x'); }</script></head>" +
      "<body><p>Keep this.</p></body></html>"
    assert(extract(html) === "Keep this.")
  }

  test("tags become spaces, never welds, and whitespace collapses") {
    assert(extract("<p>end.</p><p>Start</p>") === "end. Start")
    assert(extract("  <div>\n a \t b </div>\n") === "a b")
  }

  test("entities decode, &amp; last so double-escapes stay faithful") {
    assert(extract("<p>a &lt;b&gt; &quot;c&quot; &#39;d&#39;" +
      " e&nbsp;f &amp; g</p>") === "a <b> \"c\" 'd' e f & g")
    // &amp;lt; is the TEXT "&lt;", not a <
    assert(extract("<p>&amp;lt;</p>") === "&lt;")
  }

  test("escape/unescape round-trips text containing active chars") {
    val nasty = "if a<b && b>c then \"quote\" & 'tick'"
    val got = Seq(nasty).toDF("t")
      .select(HtmlOps.htmlUnescape(HtmlOps.htmlEscape(col("t"))))
      .as[String].head()
    assert(got === nasty)
    // and a full page round-trip: escaped payload survives extraction
    assert(extract(s"<body><p>${"a &amp; b"}</p></body>") === "a & b")
  }

  test("links pulls every href in order, either quote style") {
    val html = """<a href="https://x.com/1">a</a>""" +
      """<a class=z HREF='http://y.org/2?q=1'>b</a><a name=nohref>c</a>"""
    val got = Seq(html).toDF("h").select(HtmlOps.links(col("h")))
      .as[Seq[String]].head()
    assert(got === Seq("https://x.com/1", "http://y.org/2?q=1"))
  }

  test("title: first title payload; '' when absent") {
    val got = Seq(
      "<head><title>T1</title></head><title>T2</title>",
      "<head></head>").toDF("h")
      .select(HtmlOps.title(col("h"))).as[String].collect().toSeq
    assert(got === Seq("T1", ""))
  }

  test("extractBlocks keeps block structure and drops empty pieces") {
    val html = "<body><h1>Title</h1><p>Para one.</p>" +
      "<div>left<br>right</div><p>  </p></body>"
    val got = Seq(html).toDF("h")
      .select(graft.operators.HtmlOps.extractBlocks(col("h")))
      .as[Seq[String]].head()
    assert(got === Seq("Title", "Para one.", "left", "right"))
  }

  test("anchorPairs pulls (href, text) per element; no-href yields ''") {
    val html = """<a href="https://x.com/1">click <b>me</b></a>""" +
      """<a name=n>bare &amp; plain</a>"""
    val got = Seq(html).toDF("h")
      .select(graft.operators.HtmlOps.anchorPairs(col("h")))
      .as[Seq[(String, String)]].head()
    assert(got === Seq(("https://x.com/1", "click me"),
      ("", "bare & plain")))
  }

  test("regex-tier boundary is pinned: '>' inside a quoted attribute " +
    "ends the tag early; nesting and CDATA-free pages extract clean") {
    // documented contract, not a surprise: the leak is the quoted '>'
    assert(extract("""<a title="a>b">x</a>""") === "b\">x")
    // well-formed nesting (the common case) stays clean
    assert(extract("<div><p><b>deep</b> text</p></div>") === "deep text")
    assert(extract("<p>before <span class=\"x\">mid</span> after</p>")
      === "before mid after")
  }

  test("metaContent pulls the named meta tag's content; '' when " +
    "absent; attribute order within the tag is forgiving on the left") {
    val html = """<head><meta name="description" content="a page">""" +
      """<meta charset="utf-8"><meta name='robots' content='noindex'>""" +
      "</head>"
    val rows = Seq(html).toDF("h").select(
      graft.operators.HtmlOps.metaContent(col("h"), "robots").as("r"),
      graft.operators.HtmlOps.metaContent(col("h"), "description").as("d"),
      graft.operators.HtmlOps.metaContent(col("h"), "keywords").as("k"))
      .as[(String, String, String)].head()
    assert(rows === (("noindex", "a page", "")))
  }
}
