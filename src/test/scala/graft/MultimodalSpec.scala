package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .limit(50).cache()

  test("synthetic media table matches the declared schema") {
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text")
    assert(media.schema.fieldNames.toSeq ===
      Multimodal.mediaSchema.fieldNames.toSeq)
    assert(media.count() === 50)
  }

  test("feature extraction is deterministic, sized, and unit-norm") {
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text")
    val a = Multimodal.extractFeatures(media, 16).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    val b = Multimodal.extractFeatures(media, 16).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    assert(a === b)
    a.values.foreach { v =>
      assert(v.length === 16)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(n === 0.0 || math.abs(n - 1.0) < 1e-4)
    }
  }

  test("null payload yields zero feature and zero bytes, not a crash") {
    val media = Seq((1L, "image", null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "kind", "content")
    val f = Multimodal.extractFeatures(media, 8).collect().head
    assert(f.n_bytes === 0L && f.feature.forall(_ === 0f))
  }

  test("frame sampling explodes videos on the inclusive 250ms grid") {
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(media, everyMs = 250L)
    val byId = frames.groupBy("media_id").agg(
      count(lit(1)).as("n"), max("ts_ms").as("last_ts"),
      max("frame_idx").as("last_idx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val durations = media.filter($"kind" === "video" && $"duration_ms".isNotNull)
      .select("media_id", "duration_ms")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.keySet === durations.keySet)
    durations.foreach { case (id, dur) =>
      val (n, lastTs, lastIdx) = byId(id)
      assert(n === dur / 250 + 1, s"media $id duration $dur")
      assert(lastTs === (dur / 250) * 250 && lastIdx === dur / 250)
    }
    // frames carry a bounded stub payload
    val maxLen = frames.agg(max(length($"frame"))).head().getInt(0)
    assert(maxLen <= 64)
  }

  test("resize sets geometry and bounds payload; non-images untouched") {
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text")
    val resized = Multimodal.resize(media, 8, 8)
    val img = resized.filter($"kind" === "image" && $"content".isNotNull)
    assert(img.filter($"width" =!= 8 || $"height" =!= 8).count() === 0)
    assert(img.filter(length($"content") > 8 * 8 * 3).count() === 0)
    val audioBefore = media.filter($"kind" === "audio")
      .select("media_id", "content").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val audioAfter = resized.filter($"kind" === "audio")
      .select("media_id", "content").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(audioAfter === audioBefore)
  }

  test("features feed the near-dup operator end-to-end") {
    val media = Multimodal.syntheticMedia(docs, "doc_id", "text")
    val feats = Multimodal.extractFeatures(media, 32).toDF()
    val a = feats.select($"media_id".as("a_id"), $"feature".as("a_vec"))
    val b = feats.select($"media_id".as("b_id"), $"feature".as("b_vec"))
    val pairs = a.join(b, $"a_id" < $"b_id")
      .withColumn("s", graft.functions.VectorFunctions
        .cosine($"a_vec", $"b_vec"))
      .filter($"s" > 0.99)
    // identical payloads (duplicate texts) must surface as near-dups
    assert(pairs.count() >= 0) // smoke: plan executes distributed
  }

  test("ppm: encode/decode round-trips; malformed payloads decode to " +
    "None") {
    val rgb = Array.tabulate(2 * 3 * 3)(i => (i * 11 % 256).toByte)
    val bytes = Multimodal.ppmEncode(3, 2, rgb)
    val Some((w, h, back)) = Multimodal.ppmDecode(bytes)
    assert(w === 3 && h === 2 && back.toSeq === rgb.toSeq)
    assert(Multimodal.ppmDecode(null) === None)
    assert(Multimodal.ppmDecode("P5\n1 1\n255\nx".getBytes) === None,
      "wrong magic")
    assert(Multimodal.ppmDecode("P6\n2 2\n255\nab".getBytes) === None,
      "truncated raster")
    assert(Multimodal.ppmDecode("P6\n1 1\n999\nabc".getBytes) === None,
      "unsupported maxval")
  }

  test("ppm: real decode features and NN resize match a local replay") {
    val media = Multimodal.syntheticPpmMedia(
      docs.filter($"doc_id" < 20), "doc_id")
    // decode features vs a local recomputation of the pixel formula
    val feats = Multimodal.ppmFeatures(media).collect()
      .map(f => f.media_id -> f).toMap
    (0L until 20L).foreach { id =>
      val (w, h) = ((8 + id % 9).toInt, (8 + id % 7).toInt)
      val rs = for (y <- 0 until h; x <- 0 until w)
        yield (7 * x + 13 * y + id) % 256
      val f = feats(id)
      assert(f.width === w && f.height === h)
      assert(math.abs(f.mean_r - rs.sum.toDouble / rs.size) < 1e-9,
        s"decoded mean_r for image $id must equal the generator's")
    }
    // gzip blobs: round-trip identity + malformed-blob null contract
    assert(Multimodal.gzipDecompress(
      Multimodal.gzipCompress("hello world".getBytes("UTF-8")))
      .map(new String(_, "UTF-8")) === Some("hello world"))
    assert(Multimodal.gzipDecompress("not gzip".getBytes) === None)
    assert(Multimodal.gzipDecompress(null) === None)
    val texts = docs.filter($"doc_id" < 10).select($"doc_id", $"text")
    val rt = Multimodal.decompressText(
        Multimodal.compressText(texts, "doc_id", "text"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.collect().foreach { r =>
      assert(rt(r.getLong(0)) === r.getString(1),
        "distributed compress/decompress must be the identity")
    }

    // video: the demux must land on the same frames a local walk finds
    val vids = Multimodal.syntheticPpmVideoMedia(
      docs.filter($"doc_id" < 6), "doc_id")
    val frames = Multimodal.samplePpmFrames(vids, everyMs = 250L)
      .collect().map(f => (f.media_id, f.frame_idx) -> f).toMap
    (0L until 6L).foreach { id =>
      val nf = (3 + id % 5).toInt
      val (w, h) = ((8 + id % 9).toInt, (8 + id % 7).toInt)
      (0 until nf).foreach { fidx =>
        val f = frames((id, fidx.toLong))
        val rs = for (y <- 0 until h; x <- 0 until w)
          yield (7 * x + 13 * y + id + 31 * fidx) % 256
        assert(f.width === w && f.height === h && f.ts_ms === fidx * 250L)
        assert(math.abs(f.mean_r - rs.sum.toDouble / rs.size) < 1e-9,
          s"demuxed frame ($id, $fidx) must carry its own pixels, " +
            "not frame 0's")
      }
      assert(!frames.contains((id, nf.toLong)), "no frame past duration")
    }

    // audio: WAV round-trip + malformed payloads + real-decode replay
    val smp = Array.tabulate(100)(i => ((i * 37) % 2003 - 1001).toShort)
    val wav = Multimodal.wavEncode(8000, smp)
    val Some((rate, back)) = Multimodal.wavDecode(wav)
    assert(rate === 8000 && back.toSeq === smp.toSeq)
    assert(Multimodal.wavDecode(null) === None)
    assert(Multimodal.wavDecode("RIFFxxxxNOPE".getBytes) === None)
    assert(Multimodal.wavDecode(
      java.util.Arrays.copyOf(wav, 50)) === None, "truncated data chunk")
    val wf = Multimodal.wavFeatures(Multimodal.syntheticWavMedia(
      docs.filter($"doc_id" < 10), "doc_id")).collect()
      .map(f => f.media_id -> f).toMap
    (0L until 10L).foreach { id =>
      val n = (64 + id % 129).toInt
      val s = (0 until n).map(i => (i * (id + 3) + 7L * i * i) % 2003 - 1001)
      val f = wf(id)
      assert(f.n_samples === n.toLong && f.sample_rate === 8000)
      assert(math.abs(f.rms -
        math.sqrt(s.map(x => x.toDouble * x).sum / n)) < 1e-9)
      assert(f.zero_crossings ===
        (1 until n).count(i => s(i) * s(i - 1) < 0).toLong)
    }

    // resize: 1x1 NN keeps exactly pixel (0,0)
    val one = Multimodal.ppmFeatures(Multimodal.ppmResize(media, 1, 1))
      .collect().map(f => f.media_id -> f).toMap
    (0L until 20L).foreach { id =>
      val f = one(id)
      assert(f.width === 1 && f.height === 1)
      assert(f.mean_r === (id % 256).toDouble &&
        f.mean_g === ((2 * id) % 256).toDouble &&
        f.mean_b === ((3 * id) % 256).toDouble,
        s"1x1 NN resize of image $id must keep pixel (0,0)")
    }
  }

  test("png: ImageIO encode/decode is a lossless pixel round-trip; " +
    "corrupt payloads decode to None") {
    val rgb = Array.tabulate(5 * 4 * 3)(i => (i * 53 % 256).toByte)
    val png = Multimodal.imageEncode(5, 4, rgb, "png")
    // genuine PNG bytes: magic header
    assert((png(0) & 0xff) === 0x89 && png(1) === 'P'.toByte &&
      png(2) === 'N'.toByte && png(3) === 'G'.toByte)
    val Some((w, h, back)) = Multimodal.imageDecode(png)
    assert(w === 5 && h === 4 && back.toSeq === rgb.toSeq,
      "PNG is lossless — every channel byte must survive the round-trip")
    assert(Multimodal.imageDecode(null) === None)
    assert(Multimodal.imageDecode(Array.emptyByteArray) === None)
    assert(Multimodal.imageDecode("not an image at all".getBytes) === None)
    // a PNG with its tail chopped off is corrupt, not a crash
    assert(Multimodal.imageDecode(
      java.util.Arrays.copyOf(png, png.length / 2)) === None)
    // PPM is not an ImageIO format — falls through to None, and the
    // PPM decoder conversely rejects PNG bytes
    assert(Multimodal.imageDecode(
      Multimodal.ppmEncode(1, 1, Array[Byte](1, 2, 3))) === None)
    assert(Multimodal.ppmDecode(png) === None)
  }

  test("jpeg: ImageIO decode recovers a lossy-but-close raster") {
    // smooth gradient (JPEG's friendly case): per-pixel error small
    val (w, h) = (16, 16)
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      rgb(p) = (8 * x).toByte; rgb(p + 1) = (8 * y).toByte
      rgb(p + 2) = (4 * (x + y)).toByte
    }
    val jpg = Multimodal.imageEncode(w, h, rgb, "jpg")
    assert((jpg(0) & 0xff) === 0xff && (jpg(1) & 0xff) === 0xd8,
      "JPEG SOI marker")
    val Some((dw, dh, back)) = Multimodal.imageDecode(jpg)
    assert(dw === w && dh === h)
    val maxErr = rgb.indices
      .map(i => math.abs((rgb(i) & 0xff) - (back(i) & 0xff))).max
    assert(maxErr <= 24,
      s"lossy decode should stay close on a smooth gradient, off by $maxErr")
    assert(Multimodal.imageDecode(
      java.util.Arrays.copyOf(jpg, 8)) === None, "truncated JPEG")
  }

  test("wav: NN resample halves-and-maps samples exactly; re-encoded " +
    "output is a decodable WAV at the target rate") {
    val smp = Array.tabulate(101)(i => ((i * 37) % 2003 - 1001).toShort)
    val media = Seq((1L, Multimodal.wavEncode(8000, smp)))
      .toDF("media_id", "content")
    val out = Multimodal.wavResample(media, 2000).collect()(0)
    val Some((rate, back)) = Multimodal.wavDecode(
      out.getAs[Array[Byte]]("content"))
    assert(rate === 2000)
    val m = (101L * 2000 / 8000).toInt
    assert(back.length === m)
    (0 until m).foreach { j =>
      assert(back(j) === smp((j.toLong * 8000 / 2000).toInt),
        s"resampled sample $j must be the floor-index source sample")
    }
  }

  test("gif: animated multi-frame round-trip is lossless under 256 " +
    "colors/frame; corrupt payloads demux to None") {
    val (w, h) = (6, 5)
    val frames = (0 until 3).map(f =>
      Array.tabulate(w * h * 3)(i => ((i * 7 + 31 * f) % 256).toByte))
    val gif = Multimodal.gifEncodeFrames(w, h, frames)
    assert(new String(gif.take(6), "US-ASCII").startsWith("GIF8"),
      "genuine GIF magic")
    val Some(back) = Multimodal.gifDecodeFrames(gif)
    assert(back.length === 3)
    back.zip(frames).foreach { case ((dw, dh, rgb), want) =>
      assert(dw === w && dh === h && rgb.toSeq === want.toSeq,
        "GIF is lossless for <=256-color frames — every channel byte " +
          "must survive palette + LZW")
    }
    assert(Multimodal.gifDecodeFrames(null) === None)
    assert(Multimodal.gifDecodeFrames("nope".getBytes) === None)
    // a PNG is ImageIO-readable but NOT a gif — the demux must refuse
    assert(Multimodal.gifDecodeFrames(
      Multimodal.imageEncode(2, 2, new Array[Byte](12), "png")) === None)
    assert(Multimodal.gifDecodeFrames(
      java.util.Arrays.copyOf(gif, gif.length / 3)) === None,
      "truncated GIF stream")
  }

  test("png: distributed decode features equal the PPM path on the " +
    "same formula corpus") {
    val ids = docs.filter($"doc_id" < 25)
    val viaPng = Multimodal.imageFeatures(
        Multimodal.syntheticPngMedia(ids, "doc_id")).collect()
      .map(f => f.media_id -> f).toMap
    val viaPpm = Multimodal.ppmFeatures(
        Multimodal.syntheticPpmMedia(ids, "doc_id")).collect()
      .map(f => f.media_id -> f).toMap
    assert(viaPng.keySet === viaPpm.keySet)
    viaPpm.foreach { case (id, p) =>
      val g = viaPng(id)
      assert(g.width === p.width && g.height === p.height &&
        g.mean_r === p.mean_r && g.mean_g === p.mean_g &&
        g.mean_b === p.mean_b,
        s"PNG and PPM decode the same formula image $id identically")
    }
    // PNG NN resize to 1x1 keeps pixel (0,0), like the PPM leg
    val one = Multimodal.imageFeatures(Multimodal.imageResize(
        Multimodal.syntheticPngMedia(ids, "doc_id"), 1, 1)).collect()
      .map(f => f.media_id -> f).toMap
    (0L until 25L).foreach { id =>
      val f = one(id)
      assert(f.width === 1 && f.height === 1 &&
        f.mean_r === (id % 256).toDouble)
    }
  }

  test("time-envelope windows are content-sensitive: equal-RMS clips " +
    "with different envelopes separate, and reversal flips the envelope") {
    import graft.operators.Multimodal
    // clip A: loud first half then silence; clip B: the reverse —
    // identical global RMS, mirrored envelopes
    val n = 800
    val loudFirst = Array.tabulate(n)(i =>
      (if (i < n / 2) 1000 else 0).toShort)
    val loudLast = loudFirst.reverse
    val media = Seq(
      (1L, Multimodal.wavEncode(8000, loudFirst)),
      (2L, Multimodal.wavEncode(8000, loudLast))
    ).toDF("media_id", "content")
    val rms = Multimodal.wavFeatures(media).collect()
      .map(f => f.media_id -> f.rms).toMap
    assert(rms(1L) === rms(2L), s"fixture must be a real RMS collision: $rms")
    val env = Multimodal.wavWindowEnergy(media, 8)
      .select("media_id", "vec").as[(Long, Seq[Double])]
      .collect().toMap
    assert(env(1L) === Seq(1000.0, 1000.0, 1000.0, 1000.0, 0.0, 0.0, 0.0, 0.0))
    assert(env(2L) === env(1L).reverse,
      "reversal must mirror the envelope exactly")
    assert(env(1L) !== env(2L))
  }

  test("block grid is content-sensitive: two images with IDENTICAL " +
    "channel means but different layouts separate (channel means alone " +
    "are color dedup, not image dedup)") {
    // 8x8 gray images of equal global mean 100: left/right split
    // (0 | 200) vs per-row alternation of the same two values
    def gray(id: Long, value: (Int, Int) => Int): (Long, Array[Byte]) = {
      val rgb = new Array[Byte](8 * 8 * 3)
      for (y <- 0 until 8; x <- 0 until 8; c <- 0 until 3)
        rgb((y * 8 + x) * 3 + c) = value(x, y).toByte
      (id, Multimodal.imageEncode(8, 8, rgb, "png"))
    }
    val media = Seq(
      gray(1L, (x, _) => if (x < 4) 0 else 200),
      gray(2L, (_, y) => if (y % 2 == 0) 0 else 200)
    ).toDF("media_id", "content")
    // channel means collide exactly...
    val means = Multimodal.imageFeatures(media).collect()
      .map(f => f.media_id -> (f.mean_r, f.mean_g, f.mean_b)).toMap
    assert(means(1L) === means(2L),
      s"fixture must be a genuine mean collision: $means")
    // ...the 4x4 block grids do not, and their cosine is far from 1
    val grids = Multimodal.imageBlockGrid(media, 4)
      .select("media_id", "vec")
      .as[(Long, Seq[Double])].collect().toMap
    assert(grids(1L).length === 48 && grids(2L).length === 48)
    assert(grids(1L) !== grids(2L))
    val (a, b) = (grids(1L).toArray, grids(2L).toArray)
    val cos = a.zip(b).map { case (x, y) => x * y }.sum /
      (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    assert(cos < 0.99,
      f"same-mean different-layout images must separate, cosine $cos%.4f")
    // block means replay the generator arithmetic exactly: image 1's
    // left-column blocks are 0, right-column blocks are 200
    assert((0 until 4).forall(by =>
      a((by * 4 + 0) * 3) === 0.0 && a((by * 4 + 3) * 3) === 200.0))
  }
}
