package graft.sources

import java.io.{ByteArrayOutputStream, EOFException, InputStream, OutputStream}
import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.spark.sql.types._

/** WARC (ISO 28500) record IO over gzip-member files — the on-disk
  * format of every public crawl corpus (Common Crawl ships
  * `.warc.gz` where EACH record is its own gzip member, so a reader
  * can start at any member boundary without decompressing the file
  * prefix). This is the crawl-native front door the web tier
  * (graft.operators.HtmlOps) was missing: the reference ingests a
  * pre-extracted feed (reference src/databricks/syntetic_data_arxiv
  * .py:75-129), but a 100 TB crawl corpus starts as WARC.
  *
  * Reading is hand-rolled on RFC 1952 primitives because
  * `GZIPInputStream` silently concatenates members — destroying the
  * member boundaries that make the format splittable. [[readMember]]
  * inflates exactly ONE member and reports its compressed length, so
  * a reader positioned at a boundary can walk member-to-member;
  * [[sync]] finds the first member boundary at-or-after an arbitrary
  * byte offset (gzip magic scan + inflate-and-check-"WARC/"
  * validation, the standard archive-reader recovery discipline),
  * which is what lets [[WarcDataSource]] split one big file into
  * byte-range InputPartitions with no index.
  */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = true),
    StructField("warc_type", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("status", IntegerType, nullable = true),
    StructField("http_content_type", StringType, nullable = true),
    StructField("http_location", StringType, nullable = true),
    StructField("payload_digest", StringType, nullable = true),
    StructField("truncated", StringType, nullable = true),
    // request records pair to their response via WARC-Concurrent-To
    // (ISO 28500 §5.7) — the full-fidelity capture shape real crawls
    // store (Heritrix writes request+response adjacently)
    StructField("concurrent_to", StringType, nullable = true),
    // ISO 28500 §5.18-5.20 record segmentation: an oversized logical
    // record ships as a first segment (its original type,
    // WARC-Segment-Number: 1) plus `continuation` records chained by
    // WARC-Segment-Origin-ID, the last carrying
    // WARC-Segment-Total-Length; [[WarcSegments.reassemble]] folds
    // them back
    StructField("segment_number", IntegerType, nullable = true),
    StructField("segment_origin_id", StringType, nullable = true),
    StructField("segment_total_length", LongType, nullable = true),
    StructField("payload", BinaryType, nullable = true),
    StructField("member_offset", LongType, nullable = false),
    StructField("member_length", LongType, nullable = false),
    // the archive file the member lives in — with (member_offset,
    // member_length) the full random-access coordinate a CDX index
    // records (Common Crawl cdx field `filename`)
    StructField("file", StringType, nullable = false)))

  /** One parsed record plus its compressed-member provenance.
    * `payloadDigest` is the `WARC-Payload-Digest` header verbatim
    * (`sha1:BASE32`, ISO 28500 §5.9) when the archive ships one —
    * Common Crawl does, so cross-segment exact dedup of refetched
    * pages keys on it WITHOUT re-hashing payload bytes the archive
    * already hashed (and `revisit` records carry the digest with no
    * payload at all). */
  final case class Record(url: String, warcType: String, warcDate: String,
      recordId: String, status: Option[Int], httpContentType: Option[String],
      httpLocation: Option[String], payloadDigest: Option[String],
      truncated: Option[String], payload: Array[Byte],
      memberOffset: Long, memberLength: Long,
      segmentNumber: Option[Int] = None,
      segmentOriginId: Option[String] = None,
      segmentTotalLength: Option[Long] = None,
      concurrentTo: Option[String] = None)

  // ------------------------------------------------------------------
  // write side (fixture + any local producer)
  // ------------------------------------------------------------------

  /** Compress `bytes` as ONE standalone gzip member (fixed header: no
    * name/mtime, so the artifact is byte-deterministic). */
  def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(bytes.length / 2 + 64)
    // RFC 1952 header: magic, CM=deflate, FLG=0, MTIME=0, XFL=0, OS=255
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte))
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(bytes); d.finish()
    val buf = new Array[Byte](65536)
    while (!d.finished()) {
      val n = d.deflate(buf)
      out.write(buf, 0, n)
    }
    d.end()
    val crc = new CRC32(); crc.update(bytes)
    writeLe32(out, crc.getValue)
    writeLe32(out, bytes.length.toLong & 0xffffffffL)
    out.toByteArray
  }

  private def writeLe32(out: OutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }

  /** `WARC-Payload-Digest` value for an HTTP payload: `sha1:` + the
    * RFC 4648 base32 of SHA-1 (the Common Crawl convention; 20 bytes
    * = exactly 32 base32 chars, never padded). */
  def payloadDigest(payload: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1").digest(payload)
    val alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    val sb = new StringBuilder(32)
    var acc = 0L; var bits = 0
    d.foreach { b =>
      acc = (acc << 8) | (b & 0xffL); bits += 8
      while (bits >= 5) {
        bits -= 5
        sb.append(alphabet(((acc >> bits) & 0x1f).toInt))
      }
    }
    "sha1:" + sb.toString
  }

  /** Serialize one WARC record (headers + block + record separator). */
  def record(warcType: String, url: String, date: String, recordId: String,
      blockContentType: String, block: Array[Byte],
      digest: Option[String] = None,
      truncated: Option[String] = None,
      extraWarcHeaders: Seq[(String, String)] = Nil): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: $warcType\r\n")
    if (url != null) sb.append(s"WARC-Target-URI: $url\r\n")
    sb.append(s"WARC-Date: $date\r\n")
    sb.append(s"WARC-Record-ID: <$recordId>\r\n")
    digest.foreach(d => sb.append(s"WARC-Payload-Digest: $d\r\n"))
    truncated.foreach(t => sb.append(s"WARC-Truncated: $t\r\n"))
    extraWarcHeaders.foreach { case (k, v) => sb.append(s"$k: $v\r\n") }
    sb.append(s"Content-Type: $blockContentType\r\n")
    sb.append(s"Content-Length: ${block.length}\r\n\r\n")
    val head = sb.toString.getBytes("UTF-8")
    val out = new ByteArrayOutputStream(head.length + block.length + 4)
    out.write(head); out.write(block); out.write("\r\n\r\n".getBytes("UTF-8"))
    out.toByteArray
  }

  /** Serialize an HTTP REQUEST block (request line + headers, empty
    * body) — the block payload of a `WARC-Type: request` record, the
    * other half of a full-fidelity capture pair. */
  def httpRequest(method: String, path: String, host: String,
      headers: Seq[(String, String)] = Nil): Array[Byte] = {
    val extras = headers.map { case (k, v) => s"$k: $v\r\n" }.mkString
    (s"$method $path HTTP/1.1\r\nHost: $host\r\n" + extras + "\r\n")
      .getBytes("UTF-8")
  }

  /** Serialize an HTTP response block (status line, minimal headers,
    * payload) — the block payload of a `WARC-Type: response` record. */
  def httpResponse(status: Int, reason: String, contentType: String,
      payload: Array[Byte],
      extraHeaders: Seq[(String, String)] = Nil): Array[Byte] = {
    val extras = extraHeaders.map { case (k, v) => s"$k: $v\r\n" }.mkString
    val head = (s"HTTP/1.1 $status $reason\r\n" +
      s"Content-Type: $contentType\r\n" + extras +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("UTF-8")
    val out = new ByteArrayOutputStream(head.length + payload.length)
    out.write(head); out.write(payload)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // read side
  // ------------------------------------------------------------------

  private def u8(in: InputStream): Int = {
    val b = in.read()
    if (b < 0) throw new EOFException("truncated gzip member")
    b
  }

  /** Consume a gzip member header (RFC 1952, all optional fields);
    * returns its byte length. Throws on anything that is not a
    * member start. */
  private def readGzipHeader(in: InputStream): Long = {
    var n = 0L
    def b(): Int = { n += 1; u8(in) }
    if (b() != 0x1f || b() != 0x8b) throw new EOFException("bad gzip magic")
    if (b() != 8) throw new EOFException("unsupported gzip CM")
    val flg = b()
    var i = 0
    while (i < 6) { b(); i += 1 } // MTIME, XFL, OS
    if ((flg & 4) != 0) { // FEXTRA
      val xlen = b() | (b() << 8)
      var j = 0
      while (j < xlen) { b(); j += 1 }
    }
    if ((flg & 8) != 0) while (b() != 0) () // FNAME
    if ((flg & 16) != 0) while (b() != 0) () // FCOMMENT
    if ((flg & 2) != 0) { b(); b() } // FHCRC
    n
  }

  /** Inflate exactly ONE gzip member from `in` (positioned at the
    * member's first byte). Returns (inflated bytes, compressed member
    * length including header and 8-byte trailer). `in` may be read
    * PAST the member end (buffering) — callers re-seek by offset.
    *
    * The RFC 1952 trailer is VERIFIED, not skipped: a member whose
    * deflate stream inflates but whose CRC32/ISIZE disagree is
    * corrupt (bit rot, truncated-then-concatenated archives) and
    * throws — the range reader's corrupt-member handler then re-syncs
    * past it instead of shipping silently damaged payload bytes. */
  def readMember(in: InputStream): (Array[Byte], Long) = {
    val hdrLen = readGzipHeader(in)
    val inf = new Inflater(true)
    try {
      val out = new ByteArrayOutputStream(65536)
      val buf = new Array[Byte](65536)
      val outBuf = new Array[Byte](65536)
      val crc = new CRC32
      var fed = 0L
      var lastN = 0
      while (!inf.finished()) {
        if (inf.needsInput()) {
          val n = in.read(buf)
          if (n < 0) throw new EOFException("truncated gzip deflate stream")
          inf.setInput(buf, 0, n)
          fed += n
          lastN = n
        }
        val m = inf.inflate(outBuf)
        if (m > 0) { out.write(outBuf, 0, m); crc.update(outBuf, 0, m) }
        else if (m == 0 && inf.needsDictionary())
          throw new EOFException("gzip member needs preset dictionary")
      }
      val deflateLen = inf.getBytesRead
      // 8-byte trailer (CRC32+ISIZE); part may already sit in `buf`
      // as the inflater's unconsumed remainder
      val trailer = new Array[Byte](8)
      val rem = inf.getRemaining
      var got = math.min(rem, 8)
      if (got > 0) System.arraycopy(buf, lastN - rem, trailer, 0, got)
      while (got < 8) { trailer(got) = u8(in).toByte; got += 1 }
      val wantCrc = le32(trailer, 0)
      val wantIsize = le32(trailer, 4)
      if (wantCrc != crc.getValue)
        throw new EOFException(
          f"gzip CRC mismatch: trailer $wantCrc%08x != ${crc.getValue}%08x")
      if (wantIsize != (out.size.toLong & 0xffffffffL))
        throw new EOFException(
          s"gzip ISIZE mismatch: trailer $wantIsize != ${out.size}")
      (out.toByteArray, hdrLen + deflateLen + 8)
    } finally inf.end()
  }

  private def le32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** Random access: inflate the ONE member at `offset` of `file` —
    * the CDX-index fetch pattern (a consumer holding (file, offset)
    * from an index reads exactly that member, never scanning the
    * archive; Common Crawl's cluster.idx/cdx-00000.gz serve exactly
    * these coordinates). Executor-safe: callers pass a FileSystem
    * built from a serialized Hadoop conf. */
  def readMemberAt(fs: org.apache.hadoop.fs.FileSystem, file: String,
      offset: Long): Record = {
    val in = fs.open(new org.apache.hadoop.fs.Path(file))
    try {
      in.seek(offset)
      val (bytes, len) =
        readMember(new java.io.BufferedInputStream(in, 65536))
      parseRecord(bytes, offset, len)
    } finally in.close()
  }

  /** [[readMemberAt]] that follows a SEGMENT chain (ISO 28500
    * §5.18-5.20): when the member at `offset` is a first segment
    * (`WARC-Segment-Number: 1`), keep walking the members after it —
    * writers store a chain's continuations adjacently — concatenating
    * each continuation whose `WARC-Segment-Origin-ID` is the first
    * segment's record id, until the declared total length is
    * assembled. The returned record is the LOGICAL one: the first
    * segment's headers (its digest already describes the full
    * payload) with the complete payload and the chain's total
    * compressed footprint as `memberLength`. Unsegmented members
    * return exactly as [[readMemberAt]] does, so an index consumer
    * can call this unconditionally — one seek either way. Throws on a
    * chain that ends before its declared total (a truncated archive
    * must be loud on the random-access path; the scan path's
    * [[WarcSegments.reassemble]] flags instead, because a bulk job
    * must survive one bad chain). */
  def readLogicalRecordAt(fs: org.apache.hadoop.fs.FileSystem,
      file: String, offset: Long): Record = {
    val in = fs.open(new org.apache.hadoop.fs.Path(file))
    try {
      // readMember consumes its input in buffered chunks (the exact
      // COMPRESSED length comes back as its result, not as stream
      // position), so each member is read from a fresh seek — the
      // same discipline WarcDataSource's range reader uses
      def memberAt(p: Long): (Array[Byte], Long) = {
        in.seek(p)
        readMember(new java.io.BufferedInputStream(noClose(in), 65536))
      }
      val (bytes, len) = memberAt(offset)
      val first = parseRecord(bytes, offset, len)
      if (!first.segmentNumber.contains(1)) return first
      val out = new ByteArrayOutputStream(first.payload.length * 2)
      out.write(first.payload)
      var footprint = len
      var pos = offset + len
      var total = -1L
      while (total < 0 || out.size() < total) {
        val (b, l) = try memberAt(pos) catch {
          case _: EOFException => throw new EOFException(
            s"segment chain of ${first.recordId} ends at $pos before " +
              s"its declared total length")
        }
        val rec = parseRecord(b, pos, l)
        if (rec.warcType == "continuation" &&
          rec.segmentOriginId.contains(first.recordId)) {
          out.write(rec.payload)
          footprint += l
          rec.segmentTotalLength.foreach(t => total = t)
        } else if (rec.segmentNumber.isEmpty) {
          // an interleaved unsegmented member (writers may mix) — skip
        } else throw new EOFException(
          s"segment chain of ${first.recordId} interrupted by " +
            s"${rec.recordId} at $pos")
        pos += l
      }
      if (out.size() != total) throw new EOFException(
        s"segment chain of ${first.recordId}: assembled ${out.size()} " +
          s"of declared $total bytes")
      first.copy(payload = out.toByteArray, memberLength = footprint,
        segmentNumber = None, segmentTotalLength = None)
    } finally in.close()
  }

  /** A view of `in` that ignores close() — BufferedInputStream
    * wrappers come and go per member, the FS handle stays open. */
  private def noClose(in: InputStream): InputStream =
    new java.io.FilterInputStream(in) { override def close(): Unit = () }

  /** True iff a gzip member starting at the stream head inflates to
    * bytes beginning with "WARC/" — the validation that rejects magic
    * bytes occurring INSIDE compressed data during [[sync]]. */
  def looksLikeMember(in: InputStream): Boolean =
    try {
      readGzipHeader(in)
      val inf = new Inflater(true)
      try {
        val buf = new Array[Byte](4096)
        val outBuf = new Array[Byte](16)
        var got = 0
        while (got < 5 && !inf.finished()) {
          if (inf.needsInput()) {
            val n = in.read(buf)
            if (n < 0) return false
            inf.setInput(buf, 0, n)
          }
          val m = inf.inflate(outBuf, got, outBuf.length - got)
          if (m == 0 && inf.needsDictionary()) return false
          got += m
        }
        got >= 5 && new String(outBuf, 0, 5, "US-ASCII") == "WARC/"
      } finally inf.end()
    } catch { case _: Exception => false }

  /** Parse one inflated WARC record. Non-HTTP blocks (warcinfo,
    * metadata, request, ...) yield NULL status/content-type and the
    * raw block as payload. */
  def parseRecord(bytes: Array[Byte], memberOffset: Long,
      memberLength: Long): Record = {
    val sep = indexOfCrlfCrlf(bytes, 0)
    require(sep >= 0, "WARC record without header terminator")
    val head = new String(bytes, 0, sep, "UTF-8")
    val lines = head.split("\r\n")
    require(lines.nonEmpty && lines(0).startsWith("WARC/"),
      s"not a WARC record: ${lines.headOption.getOrElse("")}")
    val hdrs = lines.iterator.drop(1).flatMap { l =>
      val i = l.indexOf(':')
      if (i < 0) None
      else Some(l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim)
    }.toMap
    val clen = hdrs.get("content-length").map(_.toInt)
      .getOrElse(bytes.length - sep - 4)
    val blockStart = sep + 4
    val blockEnd = math.min(blockStart + clen, bytes.length)
    val block = java.util.Arrays.copyOfRange(bytes, blockStart, blockEnd)
    val url = hdrs.get("warc-target-uri").orNull
    val wtype = hdrs.get("warc-type").orNull
    val date = hdrs.get("warc-date").orNull
    val rid = hdrs.get("warc-record-id")
      .map(_.stripPrefix("<").stripSuffix(">")).orNull
    val digest = hdrs.get("warc-payload-digest")
    // ISO 28500 §5.13: the crawler cut this capture short (length /
    // time / disconnect) — a governance column, the payload is partial
    val trunc = hdrs.get("warc-truncated")
    // §5.18-5.20 record segmentation headers (oversized records split
    // across members; [[reassemble]] consumes these)
    val segNum = hdrs.get("warc-segment-number").flatMap(_.toIntOption)
    val segOrigin = hdrs.get("warc-segment-origin-id")
      .map(_.stripPrefix("<").stripSuffix(">"))
    val segTotal = hdrs.get("warc-segment-total-length")
      .flatMap(_.toLongOption)
    // §5.7: this record was captured concurrently with (and pairs to)
    // the referenced one — how request members point at their response
    val concTo = hdrs.get("warc-concurrent-to")
      .map(_.stripPrefix("<").stripSuffix(">"))
    // ISO 28500 §6: only records whose BLOCK is an HTTP message carry
    // `Content-Type: application/http` (msgtype=response/request).
    // Gate the HTTP parse on that header (falling back to the record
    // type for archives that omit it) rather than sniffing block
    // bytes: segmentation makes arbitrary payload offsets become
    // block starts, so a continuation/conversion slice that happens
    // to begin with "HTTP/" must NOT have a phantom header prefix
    // stripped from the reassembled logical payload.
    val recCt = hdrs.get("content-type").map(_.toLowerCase)
    val httpBlock = recCt.exists(_.startsWith("application/http")) ||
      (recCt.isEmpty &&
        (wtype == "response" || wtype == "request" || wtype == "revisit"))
    if (httpBlock && block.length >= 5 &&
      new String(block, 0, 5, "US-ASCII") == "HTTP/") {
      val hsep = indexOfCrlfCrlf(block, 0)
      if (hsep >= 0) {
        val httpHead = new String(block, 0, hsep, "UTF-8")
        val httpLines = httpHead.split("\r\n")
        val status = httpLines(0).split(" ", 3) match {
          case parts if parts.length >= 2 => parts(1).toIntOption
          case _ => None
        }
        val httpHdrs = httpLines.iterator.drop(1).flatMap { l =>
          val i = l.indexOf(':')
          if (i < 0) None
          else Some(l.substring(0, i).trim.toLowerCase ->
            l.substring(i + 1).trim)
        }.toMap
        val body =
          java.util.Arrays.copyOfRange(block, hsep + 4, block.length)
        // RFC 9112 §7.1: a chunked entity body arrives as hex-sized
        // chunks; de-chunk it so payload is the actual content. A
        // malformed chunk frame falls back to the raw bytes (a partial
        // capture must not kill the record).
        val payload =
          if (httpHdrs.get("transfer-encoding")
            .exists(_.toLowerCase.contains("chunked")))
            try dechunk(body) catch { case _: Exception => body }
          else body
        return Record(url, wtype, date, rid, status,
          httpHdrs.get("content-type"), httpHdrs.get("location"),
          digest, trunc, payload, memberOffset, memberLength,
          segNum, segOrigin, segTotal, concTo)
      }
    }
    Record(url, wtype, date, rid, None, None, None, digest, trunc, block,
      memberOffset, memberLength, segNum, segOrigin, segTotal, concTo)
  }

  /** De-frame an RFC 9112 chunked entity body (chunk extensions after
    * `;` ignored, trailers after the terminal 0-chunk dropped).
    * Bare-LF size/data line terminators are accepted alongside CRLF —
    * lenient servers and partial captures ship them, and rejecting
    * the frame would leave hex size lines embedded in the payload. */
  private def dechunk(b: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(b.length)
    // consume a CRLF or bare LF at `p`, returning the next index
    def pastEol(p: Int): Int =
      if (p < b.length && b(p) == '\r' && p + 1 < b.length &&
        b(p + 1) == '\n') p + 2
      else if (p < b.length && b(p) == '\n') p + 1
      else p
    var i = 0
    while (i < b.length) {
      var j = i
      while (j < b.length && b(j) != '\r' && b(j) != '\n') j += 1
      val size = java.lang.Integer.parseInt(
        new String(b, i, j - i, "US-ASCII").split(";")(0).trim, 16)
      i = pastEol(j) // past the size line terminator
      if (size == 0) return out.toByteArray
      out.write(b, i, math.min(size, b.length - i))
      i = pastEol(i + size) // data + its terminator
    }
    out.toByteArray
  }

  private def indexOfCrlfCrlf(bytes: Array[Byte], from: Int): Int = {
    var i = from
    val end = bytes.length - 3
    while (i < end) {
      if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
        bytes(i + 2) == '\r' && bytes(i + 3) == '\n') return i
      i += 1
    }
    -1
  }
}
