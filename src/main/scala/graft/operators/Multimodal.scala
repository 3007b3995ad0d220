package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset, Row}

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, processed partition-batched.
  *
  * The DECODE layer is real: PNG and JPEG via `javax.imageio` (part of
  * the JDK, works headless), P6 PPM / PCM16 WAV / concatenated-frame
  * video / gzip blobs in pure JVM code. Only the heavy learned
  * FEATURIZER (a vision/audio encoder network) stays a deterministic
  * stand-in — that model is an environment adapter, like the
  * reference's HF transformer inside its Arrow-batched pandas_udf
  * (reference src/databricks/syntetic_data.py:135-169). The Spark shape
  * everywhere is partition-batched `mapPartitions` with decode failures
  * surfacing as dropped/None rows, never task crashes.
  */
object Multimodal {

  /** One-time ImageIO setup, executor-safe: force headless AWT before
    * any codec touches the toolkit (no X11 in cluster containers), and
    * disable the disk-backed stream cache — decode inputs are in-memory
    * byte arrays, a per-call temp file would add IO and contend on
    * spark.local.dir under 32 concurrent tasks. */
  private lazy val imageIoReady: Unit = {
    if (System.getProperty("java.awt.headless") == null)
      System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
  }

  /** A media row: the `binary` payload + typed metadata the pipeline
    * carries for pruning and batching decisions. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  final case class MediaFeature(media_id: Long, kind: String,
      n_bytes: Long, feature: Array[Float])

  /** Deterministic stand-in for a LEARNED featurizer (vision/audio
    * encoder network — an environment adapter, like the reference's HF
    * model). Real decode lives in [[imageFeatures]] (PNG/JPEG via
    * ImageIO), [[ppmFeatures]], [[wavFeatures]], [[samplePpmFrames]];
    * this hash projection of the raw bytes is the model seam's
    * deterministic, dimension-correct, cheap placeholder, which keeps
    * the distributed plumbing honest and testable. */
  private def fakeFeature(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (bytes == null) return out
    var h = 1125899906842597L // FNV-ish rolling state
    var i = 0
    while (i < bytes.length) {
      h = h * 31 + bytes(i); i += 1
      out((i % dim + dim) % dim) += (h % 97).toFloat / 97f
    }
    var d = 0
    var norm = 0.0
    while (d < dim) { norm += out(d) * out(d); d += 1 }
    val n = math.sqrt(norm)
    if (n > 0) { d = 0; while (d < dim) { out(d) = (out(d) / n).toFloat; d += 1 } }
    out
  }

  /** Decode + featurize, partition-batched. The `mapPartitions` shape is
    * deliberate: per-partition setup cost (model load in a real impl —
    * the reference loads its HF model once per worker via closure
    * capture) is paid once per partition, not per row. */
  def extractFeatures(media: DataFrame, dim: Int = 64): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "content")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // real impl: initialize decoder/encoder HERE, once per partition
        rows.map { case (id, kind, bytes) =>
          MediaFeature(id, kind,
            if (bytes == null) 0L else bytes.length.toLong,
            fakeFeature(bytes, dim))
        }
      }
  }

  /** Synthesize a deterministic media table from the documents corpus
    * (payload = utf-8 bytes of the text) so the multimodal path has real
    * rows to flow through in tests and oracle-checked queries. Metadata
    * is a pure function of the text so a SQL oracle can reproduce it:
    * images get a text-length-derived geometry, audio/video a
    * 10 ms-per-character duration. */
  def syntheticMedia(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      when(pmod(col(idCol), lit(3)) === 0, "image")
        .when(pmod(col(idCol), lit(3)) === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col(textCol), "UTF-8").as("content"),
      lit("application/octet-stream").as("mime"),
      when(pmod(col(idCol), lit(3)) === 0,
        (lit(16) + pmod(length(col(textCol)), lit(64))).cast("int"))
        .otherwise(lit(null)).as("width"),
      when(pmod(col(idCol), lit(3)) === 0,
        (lit(16) + pmod(length(col(textCol)), lit(48))).cast("int"))
        .otherwise(lit(null)).as("height"),
      when(pmod(col(idCol), lit(3)) =!= 0,
        (length(col(textCol)) * 10L).cast("long"))
        .otherwise(lit(null)).as("duration_ms"))

  /** Frame sampling: one frame every `everyMs` over `[0, duration_ms]`,
    * endpoints inclusive — video rows explode to
    * `(media_id, frame_idx, ts_ms, frame)`. The explosion is pure
    * Catalyst (`sequence` + `explode`, codegen'd, fully distributed);
    * only the frame DECODE is stubbed (a deterministic byte slice —
    * a real impl would seek the container format and decode the frame
    * at ts_ms here, per partition). */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame = {
    require(everyMs > 0, s"everyMs must be positive, got $everyMs")
    media
      .filter(col("kind") === "video" && col("content").isNotNull &&
        col("duration_ms").isNotNull)
      .withColumn("ts_ms",
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))))
      .withColumn("frame_idx", (col("ts_ms") / everyMs).cast("long"))
      // STUB decode: slice of the payload at a ts-dependent offset
      .withColumn("frame",
        expr("substring(content, cast(ts_ms % 64 AS int) + 1, 64)"))
      .select("media_id", "frame_idx", "ts_ms", "frame")
  }

  /** Resize: image rows get `w x h` geometry and a payload bounded by
    * the raw RGB budget `w*h*3`; non-images pass through untouched.
    * STUB: real resampling would decode+scale per partition — the
    * byte-budget truncation keeps the metadata/size contract honest.
    * (For a REAL decode/resize path with no external codecs, see the
    * PPM block below.) */
  def resize(media: DataFrame, w: Int, h: Int): DataFrame = {
    val isImage = col("kind") === "image" && col("content").isNotNull
    media
      .withColumn("content",
        when(isImage, expr(s"substring(content, 1, ${w * h * 3})"))
          .otherwise(col("content")))
      .withColumn("width", when(isImage, lit(w)).otherwise(col("width")))
      .withColumn("height", when(isImage, lit(h)).otherwise(col("height")))
  }

  // ---------------------------------------------------------------
  // REAL image decode, no external codecs: binary P6 PPM (netpbm) —
  // a plain header + raw RGB bytes, decodable in pure JVM code, which
  // makes every stage of decode → featurize → resize byte-verifiable
  // without trusting any codec. (The production formats, PNG/JPEG,
  // are handled by the ImageIO block further down — this PPM path is
  // the codec-free ground truth the oracles replay pixel by pixel.)
  // Payloads are genuine image files, the decoder parses them back,
  // features come from actual pixels, and resize is true
  // nearest-neighbor resampling re-encoded as a valid PPM. The Spark
  // shape is the same partition-batched mapPartitions as
  // extractFeatures.
  // ---------------------------------------------------------------

  /** Encode raw RGB (row-major, 3 bytes/pixel) as a binary P6 PPM. */
  def ppmEncode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"need ${w * h * 3} bytes")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Parse one P6 PPM starting at `off`: returns
    * (width, height, rgb, offset-after-frame) or None on any malformed
    * input (wrong magic, maxval != 255, truncated payload). The offset
    * form is what lets a concatenated-frame "video" walk its frames. */
  private def ppmDecodeAt(bytes: Array[Byte],
      off: Int): Option[(Int, Int, Array[Byte], Int)] = {
    if (bytes == null || bytes.length - off < 11) return None
    if (bytes(off) != 'P' || bytes(off + 1) != '6') return None
    // parse 3 whitespace-separated ints after the magic (PPM comments
    // are rare and out of scope for the synthetic path; reject them)
    var i = off + 2
    val vals = new Array[Int](3)
    var v = 0
    while (v < 3) {
      while (i < bytes.length && bytes(i).toChar.isWhitespace) i += 1
      if (i >= bytes.length || !bytes(i).toChar.isDigit) return None
      var x = 0
      while (i < bytes.length && bytes(i).toChar.isDigit) {
        x = x * 10 + (bytes(i) - '0'); i += 1
        // bound during parse: an adversarial header (50000x50000)
        // would overflow w*h*3 in Int and slip past the truncation
        // check; no legitimate payload here exceeds 7 digits
        if (x > 10000000) return None
      }
      vals(v) = x; v += 1
    }
    // exactly ONE whitespace byte separates the header from the raster
    if (i >= bytes.length || !bytes(i).toChar.isWhitespace) return None
    i += 1
    val (w, h, maxv) = (vals(0), vals(1), vals(2))
    if (maxv != 255 || w <= 0 || h <= 0) return None
    // size check in Long: w*h*3 can exceed Int range even with the
    // per-value bound, and a negative overflow would pass the check
    if (bytes.length.toLong - i < w.toLong * h * 3) return None
    Some((w, h, java.util.Arrays.copyOfRange(bytes, i, i + w * h * 3),
      i + w * h * 3))
  }

  /** Decode a binary P6 PPM — decode failures surface as None, the
    * same contract as a real JPEG decoder hitting a corrupt file. */
  def ppmDecode(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    ppmDecodeAt(bytes, 0).map { case (w, h, rgb, _) => (w, h, rgb) }

  /** Deterministic REAL image corpus: one P6 PPM per doc id with
    * id-dependent geometry (`w = 8 + id%9`, `h = 8 + id%7`) and pixel
    * formula `r=(7x+13y+id)%256, g=(3x+5y+2id)%256, b=(x+y+3id)%256`
    * (x fastest, row-major) — a pure function of the id, so a SQL
    * oracle reproduces every pixel without parsing any binary. */
  def syntheticPpmMedia(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = (8 + id % 9).toInt
        val h = (8 + id % 7).toInt
        (id, "image", ppmEncode(w, h, formulaRgb(id, w, h, 0)))
      }
    }.toDF("media_id", "kind", "content")
  }

  final case class PpmFeature(media_id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** REAL decode + featurize: parse each PPM, average the actual
    * channel bytes. Undecodable payloads are dropped (the corrupt-file
    * contract). Partition-batched like [[extractFeatures]]. */
  def ppmFeatures(media: DataFrame): Dataset[PpmFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          ppmDecode(bytes).map { case (w, h, rgb) =>
            channelMeans(id, w, h, rgb)
          }
        }
      }
  }

  // -- REAL video frame extraction over a codec-free container:
  // "video" = concatenated P6 PPM frames at a fixed frame interval
  // (an MJPEG-shaped stream with PPM in place of JPEG). Frame k is
  // found by WALKING the stream — every earlier frame's header must
  // parse and its raster must be skipped — so the extraction is a
  // real demux, not an offset formula.

  /** Deterministic REAL video corpus: `3 + id%5` concatenated PPM
    * frames per doc id, 250 ms apart, geometry as in
    * [[syntheticPpmMedia]], frame f's pixel formula adds `31*f` to
    * every channel — SQL-replayable per (id, frame). */
  def syntheticPpmVideoMedia(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = (8 + id % 9).toInt
        val h = (8 + id % 7).toInt
        val nf = (3 + id % 5).toInt
        val out = new java.io.ByteArrayOutputStream()
        var f = 0
        while (f < nf) {
          out.write(ppmEncode(w, h, formulaRgb(id, w, h, f)))
          f += 1
        }
        (id, "video", out.toByteArray, (nf - 1) * 250L)
      }
    }.toDF("media_id", "kind", "content", "duration_ms")
  }

  final case class FrameFeature(media_id: Long, frame_idx: Long,
      ts_ms: Long, width: Int, height: Int, mean_r: Double,
      mean_g: Double, mean_b: Double)

  /** REAL frame sampling: one frame every `everyMs` over
    * `[0, duration_ms]` (endpoints inclusive, the [[sampleFrames]]
    * grid), but the frame itself is DEMUXED from the concatenated-PPM
    * stream — walk to frame `ts/frameMs`, parse it, average its actual
    * channels. Rows whose stream is malformed or too short drop. */
  def samplePpmFrames(media: DataFrame, everyMs: Long,
      frameMs: Long = 250L): Dataset[FrameFeature] = {
    require(everyMs > 0 && frameMs > 0, "intervals must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video" && col("content").isNotNull &&
        col("duration_ms").isNotNull)
      .select("media_id", "content", "duration_ms")
      .as[(Long, Array[Byte], Long)]
      .flatMap { case (id, bytes, durMs) =>
        (0L to durMs by everyMs).iterator.flatMap { ts =>
          val want = (ts / frameMs).toInt
          // demux: walk frames 0..want-1, then parse frame `want`
          var off = 0
          var f = 0
          var ok = true
          while (ok && f < want) {
            ppmDecodeAt(bytes, off) match {
              case Some((_, _, _, next)) => off = next; f += 1
              case None => ok = false
            }
          }
          if (!ok) None
          else ppmDecodeAt(bytes, off).map { case (w, h, rgb, _) =>
            var (sr, sg, sb) = (0L, 0L, 0L)
            var p = 0
            while (p < rgb.length) {
              sr += rgb(p) & 0xff; sg += rgb(p + 1) & 0xff
              sb += rgb(p + 2) & 0xff; p += 3
            }
            val n = (w * h).toDouble
            FrameFeature(id, ts / everyMs, ts, w, h, sr / n, sg / n,
              sb / n)
          }
        }
      }
  }

  // -- REAL compressed-blob handling: gzip ships with the JVM, so the
  // compressed-text path a 100 TB corpus store actually uses (text
  // stored as compressed binary, decompressed at read) needs no stub.

  /** Gzip-compress bytes (JVM built-in Deflater). */
  def gzipCompress(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  /** Gzip-decompress, or None on malformed input (the corrupt-blob
    * contract, like the media decoders above). */
  def gzipDecompress(bytes: Array[Byte]): Option[Array[Byte]] = {
    if (bytes == null) return None
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      Some(out.toByteArray)
    } catch { case _: java.io.IOException => None }
  }

  /** Compress a text column into a binary blob column (partition-
    * batched; a real corpus store writes these blobs once and reads
    * them many times). Null text → null blob. */
  def compressText(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, t) =>
        (id, if (t == null) null else gzipCompress(t.getBytes("UTF-8")))
      }.toDF(idCol, "blob")
  }

  /** Decompress a blob column back to text. Malformed blobs → null
    * text (surface, don't crash — the downstream falsy filter owns
    * the drop decision). */
  def decompressText(blobs: DataFrame, idCol: String): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col(idCol).cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .map { case (id, b) =>
        (id, gzipDecompress(b).map(new String(_, "UTF-8")).orNull)
      }.toDF(idCol, "text")
  }

  // -- REAL audio decode, same story: canonical PCM16 mono WAV is a
  // RIFF header + little-endian samples, parseable in pure JVM code.

  /** Encode 16-bit mono PCM as a canonical 44-byte-header WAV. */
  def wavEncode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Decode a PCM16 mono WAV by walking RIFF chunks: returns
    * (sampleRate, samples) or None on anything malformed or any
    * format other than 16-bit mono PCM. */
  def wavDecode(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
    if (bytes == null || bytes.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourCC(): String = {
      val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
    }
    if (fourCC() != "RIFF") return None
    bb.getInt // riff size (trust the chunk walk, not this)
    if (fourCC() != "WAVE") return None
    var rate = -1
    var ok = false
    var data: Array[Short] = null
    while (data == null && bb.remaining() >= 8) {
      val id = fourCC()
      val size = bb.getInt
      if (size < 0 || size > bb.remaining()) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val p = bb.position()
          val fmt = bb.getShort; val ch = bb.getShort
          rate = bb.getInt; bb.getInt; bb.getShort
          val bits = bb.getShort
          ok = fmt == 1 && ch == 1 && bits == 16
          // chunks are word-aligned, but the pad byte of an odd-sized
          // chunk ending exactly at the buffer is absent — clamp, don't
          // throw on a crafted payload
          bb.position(math.min(p + size + (size & 1), bb.limit()))
        case "data" =>
          if (!ok || rate <= 0) return None
          val n = size / 2
          val out = new Array[Short](n)
          var j = 0
          while (j < n) { out(j) = bb.getShort; j += 1 }
          data = out
        case _ =>
          bb.position(math.min(bb.position() + size + (size & 1),
            bb.limit()))
      }
    }
    if (data == null) None else Some((rate, data))
  }

  /** Deterministic REAL audio corpus: one PCM16 mono WAV per doc id,
    * `n = 64 + id%129` samples at 8 kHz, sample formula
    * `s_i = (i*(id+3) + 7*i*i) % 2003 - 1001` — a pure function of the
    * id, SQL-replayable like the PPM generator. */
  def syntheticWavMedia(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val n = (64 + id % 129).toInt
        val s = new Array[Short](n)
        var i = 0
        while (i < n) {
          s(i) = ((i * (id + 3) + 7L * i * i) % 2003 - 1001).toShort
          i += 1
        }
        (id, "audio", wavEncode(8000, s))
      }
    }.toDF("media_id", "kind", "content")
  }

  final case class WavFeature(media_id: Long, sample_rate: Int,
      n_samples: Long, duration_ms: Long, rms: Double,
      zero_crossings: Long)

  /** REAL decode + featurize: parse each WAV, compute duration from
    * the actual header, RMS and sign-change count from the actual
    * samples. Undecodable payloads drop (the corrupt-file contract). */
  def wavFeatures(media: DataFrame): Dataset[WavFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          wavDecode(bytes).map { case (rate, s) =>
            var sumSq = 0.0
            var zc = 0L
            var i = 0
            while (i < s.length) {
              sumSq += s(i).toDouble * s(i)
              if (i > 0 && s(i).toInt * s(i - 1) < 0) zc += 1
              i += 1
            }
            WavFeature(id, rate, s.length.toLong,
              s.length.toLong * 1000L / rate,
              if (s.isEmpty) 0.0 else math.sqrt(sumSq / s.length), zc)
          }
        }
      }
  }

  /** Time-envelope audio features: mean |amplitude| over `nWin` equal
    * time windows (sample i → window i·nWin div n) — the audio analog
    * of [[imageBlockGrid]]: a single global RMS is content-BLIND for
    * near-dup purposes (any two clips of equal energy collide), while
    * the envelope keeps temporal structure, so a loud-then-silent clip
    * and its reversal separate. Integer-exact (per-window |sample|
    * sums are exact longs, one IEEE division each) and SQL-replayable
    * from the synthetic sample formula. Returns `(media_id,
    * sample_rate, n_samples, vec)` with `vec(w)` = mean abs amplitude
    * of window w; undecodable payloads drop. */
  def wavWindowEnergy(media: DataFrame, nWin: Int): DataFrame = {
    require(nWin >= 1 && nWin <= 256, s"window count out of range: $nWin")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          wavDecode(bytes).map { case (rate, s) =>
            val sums = new Array[Long](nWin)
            val counts = new Array[Long](nWin)
            var i = 0
            while (i < s.length) {
              val w = (i.toLong * nWin / s.length).toInt
              sums(w) += math.abs(s(i).toLong)
              counts(w) += 1
              i += 1
            }
            (id, rate, s.length.toLong, Array.tabulate(nWin)(w =>
              if (counts(w) == 0) 0.0 else sums(w).toDouble / counts(w)))
          }
        }
      }.toDF("media_id", "sample_rate", "n_samples", "vec")
  }

  /** Nearest-neighbor raster resample (`sx = tx*w / tw`, integer
    * division — the standard NN index map), shared by the PPM and
    * PNG/JPEG resize paths. */
  private def nnResample(w: Int, h: Int, rgb: Array[Byte], tw: Int,
      th: Int): Array[Byte] = {
    val out = new Array[Byte](tw * th * 3)
    var ty = 0
    while (ty < th) {
      val sy = ty * h / th
      var tx = 0
      while (tx < tw) {
        val sx = tx * w / tw
        val s = (sy * w + sx) * 3
        val d = (ty * tw + tx) * 3
        out(d) = rgb(s); out(d + 1) = rgb(s + 1)
        out(d + 2) = rgb(s + 2)
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** REAL audio resample: decode each WAV, nearest-sample rate
    * conversion (`src_i = floor(j·srcRate / targetRate)`, the audio
    * analog of [[nnResample]]'s integer index map — a real pipeline
    * would low-pass first; NN keeps the arithmetic exact and
    * SQL-replayable), re-encode as a valid WAV at `targetRate`.
    * Output length `floor(n·targetRate/srcRate)`. Undecodable rows
    * drop. */
  def wavResample(media: DataFrame, targetRate: Int): DataFrame = {
    require(targetRate > 0, "targetRate must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          wavDecode(bytes).map { case (rate, s) =>
            val m = (s.length.toLong * targetRate / rate).toInt
            val out = new Array[Short](m)
            var j = 0
            while (j < m) {
              out(j) = s((j.toLong * rate / targetRate).toInt)
              j += 1
            }
            (id, "audio", wavEncode(targetRate, out))
          }
        }
      }.toDF("media_id", "kind", "content")
  }

  /** REAL nearest-neighbor resize: decode, [[nnResample]], re-encode as
    * a valid PPM with updated geometry. Undecodable rows are dropped. */
  def ppmResize(media: DataFrame, tw: Int, th: Int): DataFrame = {
    require(tw > 0 && th > 0, "target geometry must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          ppmDecode(bytes).map { case (w, h, rgb) =>
            (id, "image", ppmEncode(tw, th, nnResample(w, h, rgb, tw, th)),
              tw, th)
          }
        }
      }.toDF("media_id", "kind", "content", "width", "height")
  }

  // ---------------------------------------------------------------
  // REAL PNG/JPEG decode via javax.imageio — part of the JDK, works
  // headless, no external codec libraries needed. These ARE the
  // formats a training corpus's image columns actually hold. PNG is
  // lossless, so the formula-image oracle recipe from the PPM block
  // carries over exactly (encode the formula pixels → decode the real
  // PNG bytes → channel means hash-check against the SQL pixel
  // replay); JPEG is lossy and is spec-tested with tolerance instead.
  // Same partition-batched mapPartitions shape throughout.
  // ---------------------------------------------------------------

  /** Encode raw RGB (row-major, 3 bytes/pixel — the [[ppmEncode]]
    * raster contract) as PNG (lossless) or JPEG (`format` = "png" |
    * "jpg"). */
  def imageEncode(w: Int, h: Int, rgb: Array[Byte],
      format: String): Array[Byte] = {
    require(rgb.length == w * h * 3, s"need ${w * h * 3} bytes")
    imageIoReady
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](w * h)
    var p = 0
    while (p < px.length) {
      px(p) = ((rgb(p * 3) & 0xff) << 16) | ((rgb(p * 3 + 1) & 0xff) << 8) |
        (rgb(p * 3 + 2) & 0xff)
      p += 1
    }
    img.setRGB(0, 0, w, h, px, 0, w)
    val bos = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, format, bos)
    require(ok, s"no ImageIO writer for format '$format'")
    bos.toByteArray
  }

  /** Decode any ImageIO-readable payload (PNG, JPEG, GIF, BMP, …) to
    * `(width, height, row-major RGB)` — None on corrupt or unreadable
    * bytes, the same contract as [[ppmDecode]]. Alpha is dropped (RGB
    * extraction via the ARGB int form, colorspace-converted by the
    * codec if needed). */
  def imageDecode(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.length == 0) return None
    imageIoReady
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) return None // no registered reader matched
      val (w, h) = (img.getWidth, img.getHeight)
      if (w <= 0 || h <= 0) return None
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      val rgb = new Array[Byte](w * h * 3)
      var p = 0
      while (p < px.length) {
        rgb(p * 3) = ((px(p) >> 16) & 0xff).toByte
        rgb(p * 3 + 1) = ((px(p) >> 8) & 0xff).toByte
        rgb(p * 3 + 2) = (px(p) & 0xff).toByte
        p += 1
      }
      Some((w, h, rgb))
    } catch {
      case _: java.io.IOException => None
      case _: RuntimeException => None // codec internals on crafted bytes
    }
  }

  /** Deterministic REAL image corpus in any ImageIO-writable format:
    * the [[syntheticPpmMedia]] pixel formula (`w = 8 + id%9`,
    * `h = 8 + id%7`, `r=(7x+13y+id)%256, g=(3x+5y+2id)%256,
    * b=(x+y+3id)%256`) encoded as genuine PNG / BMP (both lossless, so
    * a SQL oracle reproduces every pixel without parsing any binary)
    * or JPEG (lossy — only the geometry replays; pixel fidelity is
    * spec-checked with tolerance). */
  def syntheticImageMedia(docs: DataFrame, idCol: String,
      format: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = (8 + id % 9).toInt
        val h = (8 + id % 7).toInt
        (id, "image", imageEncode(w, h, formulaRgb(id, w, h, 0), format))
      }
    }.toDF("media_id", "kind", "content")
  }

  /** [[syntheticImageMedia]] as PNG. */
  def syntheticPngMedia(docs: DataFrame, idCol: String): DataFrame =
    syntheticImageMedia(docs, idCol, "png")

  /** The shared synthetic pixel formula (frame offset `31*f` for the
    * video corpus; `f = 0` for stills). */
  private def formulaRgb(id: Long, w: Int, h: Int, f: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 3
        rgb(p) = ((7 * x + 13 * y + id + 31 * f) % 256).toByte
        rgb(p + 1) = ((3 * x + 5 * y + 2 * id + 31 * f) % 256).toByte
        rgb(p + 2) = ((x + y + 3 * id + 31 * f) % 256).toByte
        x += 1
      }
      y += 1
    }
    rgb
  }

  /** REAL PNG/JPEG decode + featurize: ImageIO-parse each payload,
    * average the actual channel bytes. Undecodable payloads drop (the
    * corrupt-file contract). Partition-batched like [[ppmFeatures]]. */
  def imageFeatures(media: DataFrame): Dataset[PpmFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          imageDecode(bytes).map { case (w, h, rgb) => channelMeans(id, w, h, rgb) }
        }
      }
  }

  /** CONTENT-SENSITIVE image featurization: decode each payload and
    * average channels over a g×g BLOCK GRID — `vec` holds g·g·3
    * doubles ordered (blockRow, blockCol, channel). Channel means
    * alone are content-BLIND for near-dup purposes (two different
    * images with the same average color collide — color-dedup, not
    * image-dedup); the block grid keeps spatial layout, so a
    * left/right split and a checkerboard of identical global means
    * land far apart. Still deterministic and integer-exact (block
    * sums are exact longs, one IEEE division each), so the whole
    * feature replays in SQL from the pixel formula: pixel (x,y) maps
    * to block (y·g div h, x·g div w) — plain integer arithmetic.
    * Undecodable payloads drop (the corrupt-file contract). */
  def imageBlockGrid(media: DataFrame, g: Int): DataFrame = {
    require(g >= 1 && g <= 16, s"grid out of range: $g")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          imageDecode(bytes).map { case (w, h, rgb) =>
            (id, w, h, blockMeans(w, h, rgb, g))
          }
        }
      }.toDF("media_id", "width", "height", "vec")
  }

  private def blockMeans(w: Int, h: Int, rgb: Array[Byte],
      g: Int): Array[Double] = {
    val sums = new Array[Long](g * g * 3)
    val counts = new Array[Long](g * g)
    var y = 0
    while (y < h) {
      val by = y * g / h
      var x = 0
      while (x < w) {
        val bx = x * g / w
        val b = by * g + bx
        val p = (y * w + x) * 3
        sums(b * 3) += rgb(p) & 0xff
        sums(b * 3 + 1) += rgb(p + 1) & 0xff
        sums(b * 3 + 2) += rgb(p + 2) & 0xff
        counts(b) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(g * g * 3) { i =>
      val n = counts(i / 3)
      if (n == 0) 0.0 else sums(i).toDouble / n
    }
  }

  private def channelMeans(id: Long, w: Int, h: Int,
      rgb: Array[Byte]): PpmFeature = {
    var (sr, sg, sb) = (0L, 0L, 0L)
    var p = 0
    while (p < rgb.length) {
      sr += rgb(p) & 0xff; sg += rgb(p + 1) & 0xff
      sb += rgb(p + 2) & 0xff; p += 3
    }
    val n = (w * h).toDouble
    PpmFeature(id, w, h, sr / n, sg / n, sb / n)
  }

  // -- REAL video through a real codec: multi-frame animated GIF.
  // GIF is LZW-compressed but LOSSLESS for frames with ≤ 256 distinct
  // colors (the synthetic formula frames have ≤ w·h ≤ 224), so the
  // per-frame pixel replay hash-checks through an actual container
  // format with palettes, LZW and frame sequencing — not a byte-offset
  // walk. Demux = ImageIO's sequence reader.

  /** Encode row-major RGB frames (all `w x h`) as one animated GIF89a
    * — hand-written container + LZW (the PPM/WAV pure-JVM encoder
    * discipline): each frame carries a LOCAL color table built from
    * its exact color set (≤ 256 required), so encoding is lossless by
    * construction. The JDK's own GIF writer is NOT used: measured, it
    * re-quantizes even explicitly indexed sub-256-color frames
    * (PropertySpec's random palettes caught it); the JDK READER
    * ([[gifDecodeFrames]]) decodes these bytes as the independent
    * codec. */
  def gifEncodeFrames(w: Int, h: Int,
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(frames.nonEmpty, "need at least one frame")
    require(w > 0 && h > 0 && w < 65536 && h < 65536, "bad geometry")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    // logical screen descriptor, no global color table
    u16(w); u16(h); out.write(0x00); out.write(0); out.write(0)
    frames.foreach { rgb =>
      require(rgb.length == w * h * 3, s"need ${w * h * 3} bytes")
      // exact per-frame palette (first-occurrence order)
      val palette = new java.util.LinkedHashMap[Integer, Integer]()
      val idx = new Array[Int](w * h)
      var p = 0
      while (p < w * h) {
        val c = ((rgb(p * 3) & 0xff) << 16) |
          ((rgb(p * 3 + 1) & 0xff) << 8) | (rgb(p * 3 + 2) & 0xff)
        var i = palette.get(c)
        if (i == null) {
          i = palette.size()
          require(i < 256,
            "GIF frames are limited to 256 distinct colors")
          palette.put(c, i)
        }
        idx(p) = i.intValue()
        p += 1
      }
      // local color table size = 2^k >= palette size, k >= 1
      var k = 1
      while ((1 << k) < palette.size()) k += 1
      // image descriptor: local color table flag + (k-1)
      out.write(0x2C); u16(0); u16(0); u16(w); u16(h)
      out.write(0x80 | (k - 1))
      val table = new Array[Int](1 << k)
      palette.forEach { (c, i) => table(i) = c }
      table.foreach { c =>
        out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff)
        out.write(c & 0xff)
      }
      out.write(gifLzw(idx, math.max(2, k)))
    }
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** GIF LZW: `minCodeSize` byte + 255-byte-max sub-blocks of the
    * LSB-first variable-width code stream (clear, dictionary growth,
    * width bumps at 2^curBits, reset at 4096, end-of-information). */
  private def gifLzw(indices: Array[Int], minCodeSize: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(minCodeSize)
    val block = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    def flushByte(): Unit = {
      while (bitCnt >= 8) {
        block.write((bitBuf & 0xff).toInt)
        bitBuf >>>= 8; bitCnt -= 8
        if (block.size() == 255) {
          out.write(255); block.writeTo(out); block.reset()
        }
      }
    }
    var curBits = minCodeSize + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += curBits
      flushByte()
    }
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    var dict = new java.util.HashMap[Long, Integer]()
    var next = eoi + 1
    emit(clear)
    var wCode = indices(0)
    var i = 1
    while (i < indices.length) {
      val kIdx = indices(i)
      val key = (wCode.toLong << 16) | kIdx.toLong
      val hit = dict.get(key)
      if (hit != null) wCode = hit.intValue()
      else {
        emit(wCode)
        dict.put(key, next)
        next += 1
        // decoder mirror with the one-step lag: the decoder derives
        // entry m from emissions (m, m+1), so when this encoder has
        // registered entries up to value next-1, the decoder reading
        // the NEXT emission knows entries up to next-2 and has widened
        // only once ITS count (next-1) filled the width
        if (next - 1 == (1 << curBits) && curBits < 12) curBits += 1
        if (next == 4096) {
          emit(clear)
          dict = new java.util.HashMap[Long, Integer]()
          next = eoi + 1
          curBits = minCodeSize + 1
        }
        wCode = kIdx
      }
      i += 1
    }
    emit(wCode)
    emit(eoi)
    // drain remaining bits
    if (bitCnt > 0) { bitCnt = 8; flushByte() }
    if (block.size() > 0) { out.write(block.size()); block.writeTo(out) }
    out.write(0) // block terminator
    out.toByteArray
  }

  /** Demux an animated GIF into `(width, height, rgb)` frames — None
    * on corrupt or non-GIF bytes (the corrupt-file contract). */
  def gifDecodeFrames(bytes: Array[Byte])
      : Option[Seq[(Int, Int, Array[Byte])]] = {
    if (bytes == null || bytes.length < 6) return None
    imageIoReady
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      if (!reader.getFormatName.equalsIgnoreCase("gif")) return None
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      if (n <= 0) return None
      val out = (0 until n).map { f =>
        val img = reader.read(f)
        val (w, h) = (img.getWidth, img.getHeight)
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        val rgb = new Array[Byte](w * h * 3)
        var p = 0
        while (p < px.length) {
          rgb(p * 3) = ((px(p) >> 16) & 0xff).toByte
          rgb(p * 3 + 1) = ((px(p) >> 8) & 0xff).toByte
          rgb(p * 3 + 2) = (px(p) & 0xff).toByte
          p += 1
        }
        (w, h, rgb)
      }
      reader.dispose()
      Some(out)
    } catch {
      case _: java.io.IOException => None
      case _: RuntimeException => None
    }
  }

  /** Deterministic REAL animated-GIF video corpus — the
    * [[syntheticPpmVideoMedia]] geometry and per-frame pixel formula
    * (`3 + id%5` frames, 250 ms apart, channel offset `31*f`) encoded
    * as genuine multi-frame GIFs. */
  def syntheticGifVideoMedia(docs: DataFrame, idCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = (8 + id % 9).toInt
        val h = (8 + id % 7).toInt
        val nf = (3 + id % 5).toInt
        val frames = (0 until nf).map(f => formulaRgb(id, w, h, f))
        (id, "video", gifEncodeFrames(w, h, frames), (nf - 1) * 250L)
      }
    }.toDF("media_id", "kind", "content", "duration_ms")
  }

  /** REAL frame sampling over animated GIF: the [[samplePpmFrames]]
    * grid and output contract, but the frame is demuxed by the actual
    * GIF codec. Rows whose payload is corrupt, or whose timestamp maps
    * past the last frame, drop. */
  def sampleGifFrames(media: DataFrame, everyMs: Long,
      frameMs: Long = 250L): Dataset[FrameFeature] = {
    require(everyMs > 0 && frameMs > 0, "intervals must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("kind") === "video" && col("content").isNotNull &&
        col("duration_ms").isNotNull)
      .select("media_id", "content", "duration_ms")
      .as[(Long, Array[Byte], Long)]
      .flatMap { case (id, bytes, durMs) =>
        gifDecodeFrames(bytes).toSeq.flatMap { frames =>
          (0L to durMs by everyMs).iterator.flatMap { ts =>
            val want = (ts / frameMs).toInt
            if (want >= frames.length) None
            else {
              val (w, h, rgb) = frames(want)
              val f = channelMeans(id, w, h, rgb)
              Some(FrameFeature(id, ts / everyMs, ts, w, h, f.mean_r,
                f.mean_g, f.mean_b))
            }
          }
        }
      }
  }

  /** REAL PNG resize: ImageIO-decode, [[nnResample]], re-encode as a
    * valid PNG with updated geometry — the lossless round-trip keeps
    * the whole decode/resample/encode chain hash-checkable.
    * Undecodable rows drop. */
  def imageResize(media: DataFrame, tw: Int, th: Int): DataFrame = {
    require(tw > 0 && th > 0, "target geometry must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          imageDecode(bytes).map { case (w, h, rgb) =>
            (id, "image",
              imageEncode(tw, th, nnResample(w, h, rgb, tw, th), "png"),
              tw, th)
          }
        }
      }.toDF("media_id", "kind", "content", "width", "height")
  }
}
