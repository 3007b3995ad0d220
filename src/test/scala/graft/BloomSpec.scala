package graft

import graft.operators.Bloom
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .filter(col("text").isNotNull && trim(col("text")) =!= "").cache()
  private lazy val hist = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
  private lazy val batch = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
  private lazy val bits = Bloom.build(hist.select("text"), "text", 1024, 3)

  test("no false negatives: every inserted key is a member") {
    val n = hist.count()
    val m = hist.filter(Bloom.memberCol(col("text"), bits, 3)).count()
    assert(m === n)
  }

  test("novel keeps only non-members, and every kept row is truly novel") {
    val histTexts = hist.select("text").as[String].collect().toSet
    val kept = Bloom.novel(batch, "text", bits, 3)
      .select("text").as[String].collect()
    assert(kept.forall(t => !histTexts.contains(t)),
      "a true duplicate survived the filter")
    val verdicts = batch
      .withColumn("member", Bloom.memberCol(col("text"), bits, 3))
      .select("member").as[Boolean].collect()
    assert(kept.length === verdicts.count(v => !v))
  }

  test("bitmap bit test agrees with position-set membership") {
    val posSet = hist
      .select(explode(Bloom.positions(col("text"), 1024, 3)).as("p"))
      .distinct().as[Long].collect().toSet
    val disagrees = batch
      .withColumn("member", Bloom.memberCol(col("text"), bits, 3))
      .withColumn("ps", Bloom.positions(col("text"), 1024, 3))
      .select("member", "ps").as[(Boolean, Seq[Long])].collect()
      .filter { case (m, ps) => m != ps.forall(posSet.contains) }
    assert(disagrees.isEmpty)
  }

  test("merge of shard builds equals the build of the union") {
    val a = hist.filter(col("doc_id") < 40)
    val b = hist.filter(col("doc_id") >= 40)
    val merged = Bloom.merge(
      Bloom.build(a.select("text"), "text", 1024, 3),
      Bloom.build(b.select("text"), "text", 1024, 3))
    assert(merged.toSeq === bits.toSeq)
  }

  test("broadcast-variable probe returns the literal probe's rows") {
    val viaLit = Bloom.novel(batch, "text", bits, 3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val viaBc = Bloom.novelViaBroadcast(batch, "text", bits, 3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(viaBc === viaLit && viaLit.nonEmpty)
  }

  test("fillStats counts the distinct lit positions") {
    val (set, fill, fpp) = Bloom.fillStats(bits, 3)
    val expected = hist
      .select(explode(Bloom.positions(col("text"), 1024, 3)).as("p"))
      .distinct().count()
    assert(set === expected)
    assert(fill === set * 1000L / 1024L)
    assert(fpp === set * set * set * 1000000L / (1024L * 1024L * 1024L))
  }

  test("save/load round-trips the filter AND its k; merge of loaded " +
      "shard filters equals the union build") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom")
      .toString
    Bloom.save(spark, Bloom.BloomFilter(bits, 3), s"$dir/f")
    val re = Bloom.load(spark, s"$dir/f")
    assert(re.bits.toSeq === bits.toSeq)
    assert(re.k === 3, "probe k must come FROM the artifact")

    // shard builds persisted separately, reopened, OR-merged
    val h1 = hist.filter(pmod(col("doc_id"), lit(2)) === 0)
    val h2 = hist.filter(pmod(col("doc_id"), lit(2)) === 1)
    Bloom.save(spark, Bloom.buildFilter(h1.select("text"), "text", 1024, 3),
      s"$dir/s1")
    Bloom.save(spark, Bloom.buildFilter(h2.select("text"), "text", 1024, 3),
      s"$dir/s2")
    val merged = Bloom.load(spark, s"$dir/s1")
      .merge(Bloom.load(spark, s"$dir/s2"))
    assert(merged.bits.toSeq === bits.toSeq,
      "shard-merged filter must equal the union build bit for bit")
    assert(merged.k === 3)
  }

  test("k-mismatch is impossible by construction: a k-less legacy " +
      "artifact refuses to load, and merging different-k filters throws") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloomk")
      .toString
    // a legacy artifact: words only, no (k, version) columns
    bits.zipWithIndex.map { case (w, i) => (i, w) }.toSeq
      .toDF("w", "bits")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/legacy")
    val e = intercept[IllegalArgumentException] {
      Bloom.load(spark, s"$dir/legacy")
    }
    assert(e.getMessage.contains("no (k, version) metadata"),
      s"wrong refusal: ${e.getMessage}")
    // probing a loaded filter uses ITS k: same verdicts as the build's
    Bloom.save(spark, Bloom.BloomFilter(bits, 3), s"$dir/f")
    val reopened = Bloom.load(spark, s"$dir/f")
    val direct = Bloom.novel(batch, "text", bits, 3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val viaArtifact = reopened.novel(batch, "text")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(viaArtifact === direct && direct.nonEmpty)
    intercept[IllegalArgumentException] {
      reopened.merge(Bloom.BloomFilter(bits, 5))
    }
  }

  test("broadcast probe drops NULL-key rows exactly like the codegen " +
      "path (no verdict for a keyless row)") {
    val withNulls = batch.select("doc_id", "text")
      .unionByName(Seq((-1L, null.asInstanceOf[String]),
        (-2L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val viaLit = Bloom.novel(withNulls, "text", bits, 3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val viaBc = Bloom.novelViaBroadcast(withNulls, "text", bits, 3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(viaBc === viaLit, "paths diverge on NULL keys")
    assert(!viaLit.contains(-1L) && !viaLit.contains(-2L),
      "a NULL-key row received an admission verdict")
  }

  test("streaming fold equals the batch build bit for bit; re-drain " +
      "is a no-op; a geometry mismatch on existing state throws") {
    val root = java.nio.file.Files.createTempDirectory("graft_bloomstr")
      .toString
    val d = hist.select("doc_id", "text")
    d.filter(col("doc_id") < 100).coalesce(1)
      .write.mode("append").parquet(s"$root/j")
    d.filter(col("doc_id") >= 100).coalesce(1)
      .write.mode("append").parquet(s"$root/j")
    def drain(k: Int): Unit = graft.streaming.BloomStream.bloomSync(
      spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$root/j"),
      "text", 1024, k, s"$root/f", s"$root/ck").awaitTermination()
    drain(3)
    val streamed = Bloom.load(spark, s"$root/f")
    assert(streamed.k === 3)
    assert(streamed.bits.toSeq === bits.toSeq,
      "OR-folded micro-batches must equal the batch build")
    drain(3)
    assert(Bloom.load(spark, s"$root/f").bits.toSeq === bits.toSeq,
      "re-drain must be a no-op")
    // new data + a DIFFERENT k against existing state: the artifact's
    // k wins by throwing, never by silently false-negating
    d.limit(5).coalesce(1).write.mode("append").parquet(s"$root/j")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(5)
    }
    assert(e.getMessage.contains("different k") ||
      Option(e.getCause).exists(_.getMessage.contains("different k")),
      s"wrong failure: ${e.getMessage}")
  }

  test("probe plan is a shuffle-free scan+filter (the 100 TB contract)") {
    val plan = Bloom.novel(batch, "text", bits, 3)
      .queryExecution.executedPlan
    val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty, s"probe shuffled:\n$plan")
  }
}
