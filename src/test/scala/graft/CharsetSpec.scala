package graft

import graft.operators.{CharsetDetect, CharsetOps}
import org.apache.spark.sql.functions._

/** Charset sniff precedence (BOM > transport > meta > validity >
  * windows-1252 fallback) and transcode fidelity — the 0xE9 byte must
  * round-trip as 'é', never U+FFFD. */
class CharsetSpec extends SparkSpec {
  import spark.implicits._

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("label resolution follows the WHATWG mappings") {
    assert(CharsetDetect.resolveLabel("UTF8") === Some("UTF-8"))
    assert(CharsetDetect.resolveLabel("iso-8859-1") === Some("windows-1252"))
    assert(CharsetDetect.resolveLabel("Latin1") === Some("windows-1252"))
    assert(CharsetDetect.resolveLabel("ascii") === Some("windows-1252"))
    assert(CharsetDetect.resolveLabel("Shift_JIS") === Some("Shift_JIS"))
    assert(CharsetDetect.resolveLabel("no-such-charset") === None)
  }

  test("crawl-controlled ILLEGAL charset names never throw: the sniff " +
    "falls through to content detection") {
    // labels the sniff regexes admit ([\w.:-]+) but the JVM rejects as
    // illegal names (leading '_', ':', '.') — isSupported throws on
    // these unless guarded
    Seq("_x", ":foo", ".bad", "-dash", "8:15").foreach { l =>
      assert(CharsetDetect.resolveLabel(l) === None, l)
    }
    val page = "<meta charset=\"_x\"><p>plain ascii</p>".getBytes("UTF-8")
    assert(CharsetDetect.sniff(page, "text/html; charset=:foo") === "UTF-8")
    val w1252 = b('<', 'p', '>', 0xE9, '<', '/', 'p', '>')
    assert(CharsetDetect.sniff(w1252, "text/html; charset=_x")
      === "windows-1252")
  }

  test("BOM outranks a lying meta declaration, and is stripped") {
    val body = "<meta charset=\"windows-1252\"><p>x</p>"
    val bytes = b(0xef, 0xbb, 0xbf) ++ body.getBytes("UTF-8")
    assert(CharsetDetect.sniff(bytes, null) === "UTF-8")
    val s = CharsetDetect.decode(bytes, "UTF-8")
    assert(s.charAt(0).toInt !== 0xfeff)
    assert(s.startsWith("<meta"))
  }

  test("transport outranks meta; meta outranks content detection") {
    val page = "<meta charset=\"utf-8\"><p>plain ascii</p>".getBytes("UTF-8")
    assert(CharsetDetect.sniff(page,
      "text/html; charset=iso-8859-1") === "windows-1252")
    assert(CharsetDetect.sniff(page, "text/html") === "UTF-8")
    // http-equiv form: charset rides inside the content attribute
    val equiv = ("<meta http-equiv=\"Content-Type\" content=\"text/html; " +
      "charset=shift_jis\"><p>x</p>").getBytes("UTF-8")
    assert(CharsetDetect.sniff(equiv, null) === "Shift_JIS")
    // an unknown transport label is ignored, not fatal
    assert(CharsetDetect.sniff(page, "text/html; charset=bogus-enc")
      === "UTF-8")
  }

  test("undeclared pages: valid UTF-8 detected, invalid falls back to " +
    "windows-1252 — 0xE9 round-trips as 'é', 0x80 as '€'") {
    val utf8 = "<p>café</p>".getBytes("UTF-8")
    assert(CharsetDetect.sniff(utf8, null) === "UTF-8")
    val w1252 = b('<', 'p', '>', 0xE9, ' ', 0x80, '<', '/', 'p', '>')
    assert(CharsetDetect.sniff(w1252, null) === "windows-1252")
    assert(CharsetDetect.decode(w1252, "windows-1252") === "<p>é €</p>")
    // the blind-UTF-8 mistake this layer exists to prevent:
    assert(CharsetDetect.decode(w1252, "UTF-8").contains('�'))
  }

  test("UTF-16LE BOM pages sniff and decode") {
    val bytes = b(0xff, 0xfe) ++ "<p>hi</p>".getBytes("UTF-16LE")
    assert(CharsetDetect.sniff(bytes, null) === "UTF-16LE")
    assert(CharsetDetect.decode(bytes, "UTF-16LE") === "<p>hi</p>")
  }

  test("column pipeline: encode -> sniff -> decode -> extract is " +
    "identity on mixed charsets; the meta prescan stays in the head KiB") {
    val df = Seq(
      (1L, "résumé café", "windows-1252", "text/html"),
      (2L, "plain", "UTF-8", "text/html"),
      (3L, "naïve €", "windows-1252", "text/html; charset=windows-1252"))
      .toDF("id", "txt", "cs", "ct")
      .withColumn("html", concat(
        when(col("id") === 1, lit("<meta charset=windows-1252>"))
          .otherwise(lit("")),
        lit("<p>"), col("txt"), lit("</p>")))
      .withColumn("bytes", CharsetOps.encodeCharset(col("html"), col("cs")))
    val got = df
      .withColumn("sniffed", CharsetOps.sniffCharset(col("bytes"), col("ct")))
      .withColumn("back", graft.operators.HtmlOps.extractText(
        CharsetOps.decodeHtml(col("bytes"), col("ct"))))
      .select("id", "sniffed", "back").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set(
      (1L, "windows-1252", "résumé café"),
      (2L, "UTF-8", "plain"),
      (3L, "windows-1252", "naïve €")))
    // a charset= string PAST the prescan window is not a declaration
    val far = (" " * CharsetDetect.PrescanBytes) +
      "<meta charset=\"shift_jis\">"
    assert(CharsetDetect.sniff(far.getBytes("UTF-8"), null) === "UTF-8")
  }

  test("null contract: null bytes -> null; null transport is absence") {
    val df = Seq((1L, Some("x".getBytes("UTF-8"))), (2L, None))
      .toDF("id", "bytes")
    val got = df.select(col("id"),
      CharsetOps.sniffCharset(col("bytes"), lit(null.asInstanceOf[String]))
        .as("cs")).collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(1L) === "UTF-8")
    assert(got(2L) === null)
  }
}
