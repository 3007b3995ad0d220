package graft.operators

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction, StandardCharsets}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Charset sniff + transcode ahead of HTML extraction. [[HtmlOps]]
  * assumes its input is already a correct string; a reference-style
  * corpus never violates that (the arXiv feed is UTF-8, reference
  * src/databricks/syntetic_data_arxiv.py:75-129), but a real crawl is
  * ~10-20% Windows-1252 / Latin-1 / Shift-JIS, declared — if at all —
  * in the HTTP Content-Type header or a `<meta charset>`. Feeding
  * those bytes through a blind UTF-8 decode turns every non-ASCII
  * character into U+FFFD BEFORE the quality gates run, silently
  * corrupting exactly the non-English slice a multilingual corpus
  * exists to keep.
  *
  * Resolution order is the HTML5 encoding-sniff ordering (WHATWG
  * encoding standard): byte-order mark, then the transport-layer
  * declaration, then the in-page `<meta>` prescan over the head bytes,
  * then content detection — here strict-UTF-8 validity with a
  * Windows-1252 fallback (the WHATWG default for unlabeled legacy
  * content; per the same standard, `iso-8859-1`/`ascii` LABELS also
  * resolve to windows-1252, whose 0x80-0x9F printables are what those
  * labels mean in practice on the web).
  *
  * Spark's builtin `decode` only admits a 7-entry charset whitelist
  * (no windows-1252, no Shift-JIS), so decode/encode are custom
  * Catalyst expressions over `java.nio.charset` (preference order (b):
  * expression beats UDF). Everything is per-row, shuffle-free, and
  * fuses into the scan — the sniff reads at most the first KiB of the
  * page plus one validity pass, the transcode is the one decode the
  * pipeline was already paying for.
  */
object CharsetDetect {

  /** Max bytes the `<meta>` prescan examines (the HTML5 prescan
    * convention: declarations must appear in the first KiB). */
  val PrescanBytes = 1024

  private val transportRe =
    java.util.regex.Pattern.compile("(?i)charset\\s*=\\s*[\"']?([\\w.:-]+)")
  private val metaRe = java.util.regex.Pattern.compile(
    "(?is)<meta\\s[^>]*charset\\s*=\\s*[\"']?([\\w.:-]+)")

  /** WHATWG-style label resolution: None for unknown labels (the
    * sniff then falls through to content detection). */
  def resolveLabel(label: String): Option[String] = {
    val l = label.trim.toLowerCase
    l match {
      case "utf-8" | "utf8" | "unicode-1-1-utf-8" => Some("UTF-8")
      case "utf-16" | "utf-16le" | "unicode" => Some("UTF-16LE")
      case "utf-16be" => Some("UTF-16BE")
      case "iso-8859-1" | "iso8859-1" | "latin1" | "latin-1" | "l1" |
           "ascii" | "us-ascii" | "windows-1252" | "cp1252" | "x-cp1252" |
           "ansi_x3.4-1968" => Some("windows-1252")
      case "shift_jis" | "shift-jis" | "sjis" | "ms_kanji" |
           "windows-31j" | "x-sjis" => Some("Shift_JIS")
      case other =>
        // crawl-controlled input: labels matching the sniff regexes'
        // charset grammar can still be ILLEGAL JVM charset names
        // (leading '_', ':', '.'), and isSupported throws on those —
        // an unknown label must fall through to content detection,
        // never fail the pipeline
        try {
          if (Charset.isSupported(other))
            Some(Charset.forName(other).name())
          else None
        } catch {
          case _: java.nio.charset.IllegalCharsetNameException => None
        }
    }
  }

  /** Sniff the page charset: BOM > transport (HTTP Content-Type) >
    * meta prescan > strict-UTF-8 validity > windows-1252. */
  def sniff(bytes: Array[Byte], transport: String): String = {
    // 1. byte-order mark
    if (bytes.length >= 3 && bytes(0) == 0xef.toByte &&
      bytes(1) == 0xbb.toByte && bytes(2) == 0xbf.toByte) return "UTF-8"
    if (bytes.length >= 2 && bytes(0) == 0xfe.toByte &&
      bytes(1) == 0xff.toByte) return "UTF-16BE"
    if (bytes.length >= 2 && bytes(0) == 0xff.toByte &&
      bytes(1) == 0xfe.toByte) return "UTF-16LE"
    // 2. transport declaration
    if (transport != null) {
      val m = transportRe.matcher(transport)
      if (m.find()) resolveLabel(m.group(1)).foreach(return _)
    }
    // 3. meta prescan over the head bytes (ASCII-compatible view)
    val head = new String(bytes, 0, math.min(bytes.length, PrescanBytes),
      StandardCharsets.ISO_8859_1)
    val m = metaRe.matcher(head)
    if (m.find()) resolveLabel(m.group(1)).foreach(return _)
    // 4. content detection: strict UTF-8 validity, else the WHATWG
    // legacy default
    if (isValidUtf8(bytes)) "UTF-8" else "windows-1252"
  }

  def isValidUtf8(bytes: Array[Byte]): Boolean =
    try {
      StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
        .decode(ByteBuffer.wrap(bytes))
      true
    } catch { case _: CharacterCodingException => false }

  /** Decode with U+FFFD replacement on malformed input (never throws
    * mid-pipeline over a 100 TB crawl); strips a leading BOM char. */
  def decode(bytes: Array[Byte], charset: String): String = {
    val cs = Charset.forName(charset)
    val s = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
      .decode(ByteBuffer.wrap(bytes)).toString
    if (s.nonEmpty && s.charAt(0) == '\ufeff') s.substring(1) else s
  }

  def encode(s: String, charset: String): Array[Byte] = {
    val cs = Charset.forName(charset)
    val bb = cs.newEncoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
      .encode(java.nio.CharBuffer.wrap(s))
    val out = new Array[Byte](bb.remaining())
    bb.get(out)
    out
  }
}

/** `(binary, string?) → string`: the sniffed charset name. The
  * transport side may be NULL (no HTTP header) — only the page bytes
  * propagate NULL. */
case class SniffCharset(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "sniff_charset"
  override def nullable: Boolean = left.nullable

  override def eval(input: InternalRow): Any = {
    val b = left.eval(input)
    if (b == null) null
    else {
      val t = right.eval(input)
      UTF8String.fromString(CharsetDetect.sniff(
        b.asInstanceOf[Array[Byte]],
        if (t == null) null else t.asInstanceOf[UTF8String].toString))
    }
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** `(binary, string) → string`: decode bytes in the (possibly per-row)
  * charset, U+FFFD-replacing — the transcode Spark's whitelisted
  * builtin `decode` cannot express for windows-1252 / Shift-JIS. */
case class DecodeCharset(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "decode_charset"

  override def nullSafeEval(bytes: Any, charset: Any): Any =
    UTF8String.fromString(CharsetDetect.decode(
      bytes.asInstanceOf[Array[Byte]],
      charset.asInstanceOf[UTF8String].toString))

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** `(string, string) → binary`: the inverse, for fixture synthesis and
  * any legacy-encoding sink. */
case class EncodeCharset(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "encode_charset"

  override def nullSafeEval(s: Any, charset: Any): Any =
    CharsetDetect.encode(s.asInstanceOf[UTF8String].toString,
      charset.asInstanceOf[UTF8String].toString)

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

/** Column API. */
object CharsetOps {

  def sniffCharset(bytes: Column, transport: Column): Column =
    Bridge.column(SniffCharset(Bridge.expression(bytes),
      Bridge.expression(transport)))

  def decodeCharset(bytes: Column, charset: Column): Column =
    Bridge.column(DecodeCharset(Bridge.expression(bytes),
      Bridge.expression(charset)))

  def encodeCharset(s: Column, charset: Column): Column =
    Bridge.column(EncodeCharset(Bridge.expression(s),
      Bridge.expression(charset)))

  /** The one-shot front door: page bytes + HTTP Content-Type →
    * correctly-decoded string, ready for [[HtmlOps.extractText]]. */
  def decodeHtml(bytes: Column, transport: Column): Column =
    decodeCharset(bytes, sniffCharset(bytes, transport))
}
