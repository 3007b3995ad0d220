package graft

import graft.search.Ann
import graft.streaming.VecDedupIngest
import java.nio.file.Files
import org.apache.hadoop.fs.Path

/** The embedding-side deduplicated ingest: probe-vs-index rejection,
  * intra-batch sweep, cross-batch suppression through the synced
  * sign-LSH layout. Positive scalings share sign-LSH codes (signs are
  * scale-invariant) and have cosine 1, so the test vectors collide
  * deterministically. */
class VecDedupIngestSpec extends SparkSpec {
  import spark.implicits._

  private def vec(scale: Float, dims: Int*): Array[Float] = {
    val v = Array.fill(64)(0f)
    dims.foreach(d => v(d) = scale)
    v
  }

  private def appendStamped(df: org.apache.spark.sql.DataFrame,
      dir: String, ts: Long): Unit = {
    df.coalesce(1).write.mode("append").parquet(dir)
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).foreach { st =>
      if (st.getPath.getName.startsWith("part-") &&
          st.getModificationTime > ts)
        fs.setTimes(st.getPath, ts, -1)
    }
  }

  test("vector ingest: rejects near-dups of the index, sweeps " +
      "same-batch pairs to the min id, suppresses across batches") {
    val root = Files.createTempDirectory("graft_vingest").toString
    val corpus = Seq((100L, vec(1f, 0, 1))).toDF("vec_id", "embedding")
    val idx = Ann.persistSignLsh(
      Ann.buildSignLsh(corpus, "embedding", tables = 4, bits = 3),
      "vec_id", "embedding", s"$root/idx")
    // batch 1: 1 ~ corpus (rejected); 2 novel; 4 ~ 2 IN THE SAME BATCH
    // (swept — only min id 2 admitted)
    val b1 = Seq((1L, vec(2f, 0, 1)), (2L, vec(1f, 2, 3)),
      (4L, vec(3f, 2, 3))).toDF("vec_id", "embedding")
    // batch 2: 5 ~ 2 admitted by batch 1 (rejected); 6 novel
    val b2 = Seq((5L, vec(0.5f, 2, 3)), (6L, vec(1f, 4)))
      .toDF("vec_id", "embedding")
    appendStamped(b1, s"$root/journal", 10000L)
    appendStamped(b2, s"$root/journal", 20000L)
    VecDedupIngest.run(spark, idx, s"$root/journal", b1.schema,
      s"$root/ckpt", "vec_id", "embedding", threshold = 0.9,
      Map("maxFilesPerTrigger" -> "1"))
    val ids = spark.read.parquet(s"$root/idx_docs")
      .select("vec_id").as[Long].collect().toSet
    assert(ids === Set(100L, 2L, 6L))
    // the admitted vector is probe-able through the synced layout
    val redo = Seq((7L, vec(4f, 2, 3))).toDF("vec_id", "embedding")
    val pairs = Ann.nearDupsAgainstSignLsh(spark, idx, redo,
        "vec_id", "embedding", "vec_id", "embedding", 0.9)
      .select("corpus_id").as[Long].collect().toSet
    assert(pairs === Set(2L))
    // compaction folds the append-grown (table, code) dirs back to one
    // file each and leaves the probe's answers unchanged
    Ann.compactPersistedSignLsh(spark, idx)
    val fs = new Path(s"$root/idx")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def deepDirs(p: Path, depth: Int): Seq[Path] =
      if (depth == 0) Seq(p)
      else fs.listStatus(p).filter(_.isDirectory)
        .flatMap(s => deepDirs(s.getPath, depth - 1)).toSeq
    val worst = deepDirs(new Path(s"$root/idx"), 2).map { d =>
      fs.listStatus(d)
        .count(s => s.isFile && s.getPath.getName.startsWith("part-"))
    }.max
    assert(worst === 1, s"compaction left a dir with $worst files")
    val again = Ann.nearDupsAgainstSignLsh(spark, idx, redo,
        "vec_id", "embedding", "vec_id", "embedding", 0.9)
      .select("corpus_id").as[Long].collect().toSet
    assert(again === Set(2L))
  }

  test("maxBucket caps an adversarial same-vector batch: the sweep " +
      "completes, skipped-bucket members are admitted (recall trade), " +
      "and a generous cap changes nothing") {
    val root = Files.createTempDirectory("graft_vingest_cap").toString
    val corpus = Seq((100L, vec(1f, 0, 1))).toDF("vec_id", "embedding")
    val idx = Ann.persistSignLsh(
      Ann.buildSignLsh(corpus, "embedding", tables = 4, bits = 3),
      "vec_id", "embedding", s"$root/idx")
    // degenerate batch: 50 positive scalings of one vector — identical
    // sign-LSH codes in EVERY table, so the uncapped self-join is the
    // full 50×50 bucket square in all 4 tables
    val clones = (1L to 50L).map(i => (i, vec(i.toFloat, 2, 3)))
      .toDF("vec_id", "embedding")
    // cap below the bucket size: every bucket is hot and skipped, no
    // pairs form, ALL clones are admitted — the documented recall trade
    val capped = VecDedupIngest.admitBatch(spark, idx, clones,
      "vec_id", "embedding", threshold = 0.9, maxBucket = Some(10))
    assert(capped.count() === 50L)
    // cap above the bucket size: identical to the uncapped sweep —
    // one component, min id 1 admitted
    val generous = VecDedupIngest.admitBatch(spark, idx, clones,
      "vec_id", "embedding", threshold = 0.9, maxBucket = Some(64))
    assert(generous.select("vec_id").as[Long].collect().toSet === Set(1L))
    val uncapped = VecDedupIngest.admitBatch(spark, idx, clones,
      "vec_id", "embedding", threshold = 0.9)
    assert(uncapped.select("vec_id").as[Long].collect().toSet === Set(1L))
    // telemetry: the persisted layout's occupancy is visible (the
    // corpus vector occupies its 4 buckets once each)
    val stats = Ann.signLshBucketStats(spark, idx, minSize = 1L)
    assert(stats.count() === 4L)
  }

  test("media ingest: decodes real PNG payloads inside the loop, drops " +
    "corrupt bytes, suppresses decoded-feature near-dups across batches") {
    import graft.operators.Multimodal
    import graft.streaming.MediaDedupIngest
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft_mingest").toString
    def png(id: Long, r: Int, g: Int, b: Int): (Long, Array[Byte]) = {
      val rgb = new Array[Byte](4 * 4 * 3)
      (0 until 16).foreach { p =>
        rgb(p * 3) = r.toByte; rgb(p * 3 + 1) = g.toByte
        rgb(p * 3 + 2) = b.toByte
      }
      (id, Multimodal.imageEncode(4, 4, rgb, "png"))
    }
    // seed: one indexed image with feature direction (10, 20, 30)
    val seed = MediaDedupIngest.decodeFeatures(
      Seq(png(100L, 10, 20, 30)).toDF("media_id", "content"), "media_id")
    val idx = Ann.persistSignLsh(
      Ann.buildSignLsh(seed, "embedding", tables = 4, bits = 3),
      "media_id", "embedding", s"$root/idx")
    // batch 1: id 1 = scaled copy of the indexed image (cosine 1 ->
    // reject), id 2 = novel direction (admit), id 3 = CORRUPT payload
    // (drop at decode, never admitted)
    val b1 = (Seq(png(1L, 20, 40, 60), png(2L, 60, 20, 5)) :+
      (3L -> "not a png".getBytes)).toDF("media_id", "content")
    appendStamped(b1, s"$root/journal", 10000L)
    // batch 2: id 4 = near-dup of batch-1's ADMITTED id 2 (cross-batch
    // suppression through the synced layout), id 5 = novel
    val b2 = Seq(png(4L, 120, 40, 10), png(5L, 5, 60, 5))
      .toDF("media_id", "content")
    appendStamped(b2, s"$root/journal", 20000L)
    MediaDedupIngest.run(spark, idx, s"$root/journal", b1.schema,
      s"$root/ckpt", "media_id", threshold = 0.9999,
      Map("maxFilesPerTrigger" -> "1"))
    val admitted = spark.read.parquet(s"$root/idx_docs")
      .select(col("media_id")).as[Long].collect().toSet
    assert(admitted === Set(100L, 2L, 5L),
      s"scaled copies and corrupt payloads must never enter: $admitted")
  }

  test("intraBatch = false restores both-admitted for same-batch pairs") {
    val root = Files.createTempDirectory("graft_vingest_ns").toString
    val corpus = Seq((100L, vec(1f, 0, 1))).toDF("vec_id", "embedding")
    val idx = Ann.persistSignLsh(
      Ann.buildSignLsh(corpus, "embedding", tables = 4, bits = 3),
      "vec_id", "embedding", s"$root/idx")
    val b1 = Seq((2L, vec(1f, 2, 3)), (4L, vec(3f, 2, 3)))
      .toDF("vec_id", "embedding")
    appendStamped(b1, s"$root/journal", 10000L)
    VecDedupIngest.run(spark, idx, s"$root/journal", b1.schema,
      s"$root/ckpt", "vec_id", "embedding", threshold = 0.9,
      intraBatch = false)
    assert(spark.read.parquet(s"$root/idx_docs")
      .select("vec_id").as[Long].collect().toSet === Set(100L, 2L, 4L))
  }
}
