package graft

import graft.functions.Metric
import graft.index.{ChangeLog, IndexMeta, VectorIndex}
import graft.streaming.IndexSync
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet").cache()

  private def newIndex(name: String): VectorIndex = {
    val dir = Files.createTempDirectory(s"graft_$name").toString
    new VectorIndex(IndexMeta(name, "vec_id", "embedding", 64,
      Metric.Cosine, s"$dir/idx"))
  }

  test("build excludes null and wrong-dimension vectors") {
    val source = emb.limit(20).select($"vec_id", $"embedding", $"label")
      .union(Seq((9000L, null.asInstanceOf[Seq[Float]], 0),
        (9001L, Seq(1f, 2f), 0)).toDF("vec_id", "embedding", "label"))
    val idx = newIndex("nulls")
    idx.rebuild(source)
    val ids = idx.read(spark).select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!ids.contains(9000L) && !ids.contains(9001L) && ids.size === 20)
  }

  test("build normalizes vectors and keeps the original norm") {
    val idx = newIndex("norms")
    idx.rebuild(emb.limit(50))
    val r = idx.read(spark).select(
      graft.functions.VectorFunctions.norm(col("embedding")).as("unit"),
      col("__norm")).collect()
    r.foreach { row =>
      assert(math.abs(row.getDouble(0) - 1.0) < 1e-5)
      assert(row.getDouble(1) > 0.0)
    }
  }

  test("sync(changes) is equivalent to rebuild(source+changes)") {
    val source = emb.filter($"vec_id" < 300)
    val idxSync = newIndex("sync")
    idxSync.rebuild(source)
    // changes: update 0-4 (vectors of 300-304), insert 500x (vector of 305),
    // delete 5-9, and a later duplicate change for pk 0 (last-write-wins)
    val upd = emb.filter($"vec_id".between(300, 304))
      .select(($"vec_id" - 300).as("vec_id"), $"embedding", $"label",
        lit(ChangeLog.OpUpdate).as("__op"), $"vec_id".as("__seq"))
    val ins = emb.filter($"vec_id" === 305)
      .select(lit(77777L).as("vec_id"), $"embedding", $"label",
        lit(ChangeLog.OpInsert).as("__op"), lit(400L).as("__seq"))
    val del = emb.filter($"vec_id".between(5, 9))
      .select($"vec_id", $"embedding", $"label",
        lit(ChangeLog.OpDelete).as("__op"), ($"vec_id" + 500).as("__seq"))
    val dupLater = emb.filter($"vec_id" === 306)
      .select(lit(0L).as("vec_id"), $"embedding", $"label",
        lit(ChangeLog.OpUpdate).as("__op"), lit(9999L).as("__seq"))
    val changes = upd.unionByName(ins).unionByName(del).unionByName(dupLater)
    idxSync.sync(spark, changes)

    // rebuild reference: apply the same semantics relationally
    val expected = ChangeLog.applyBatch(
      source.select($"vec_id", $"embedding", $"label"), changes, "vec_id")
    val idxRebuild = newIndex("rebuild")
    idxRebuild.rebuild(expected)

    def snapshot(i: VectorIndex): Set[(Long, Double)] =
      i.read(spark).select($"vec_id", round($"__norm", 6).as("n"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(snapshot(idxSync) === snapshot(idxRebuild))
    // pk 0 must carry the vector of 306 (seq 9999 beats seq 300)
    val v0 = idxSync.read(spark).filter($"vec_id" === 0)
      .select(round($"__norm", 6)).head().getDouble(0)
    val v306 = idxRebuild.read(spark).filter($"vec_id" === 0)
      .select(round($"__norm", 6)).head().getDouble(0)
    assert(v0 === v306)
  }

  test("stateAt folds the journal prefix; netChanges reports ops " +
      "relative to the older snapshot") {
    val j = Seq(
      (1L, "a1", "I", 1L),
      (2L, "b1", "I", 2L), (2L, "b2", "U", 10L), (2L, "b2", "D", 20L),
      (3L, "c1", "I", 12L), (3L, "c1", "D", 15L),
      (4L, "d1", "I", 11L), (4L, "d2", "U", 18L))
      .toDF("pk", "text", "__op", "__seq")
    def state(asOf: Long) = ChangeLog.stateAt(j, "pk", asOf)
      .select("pk", "text").as[(Long, String)].collect().toMap
    assert(state(5L) === Map(1L -> "a1", 2L -> "b1"))
    assert(state(12L) === Map(1L -> "a1", 2L -> "b2", 3L -> "c1",
      4L -> "d1"))
    assert(state(25L) === Map(1L -> "a1", 4L -> "d2"))

    val net = ChangeLog.netChanges(j, "pk", 5L, 25L)
      .select("pk", "__op").as[(Long, String)].collect().toMap
    // pk1 untouched in the window -> absent; pk2 existed then deleted
    // -> D; pk3 created AND deleted inside the window -> suppressed;
    // pk4 created then updated inside the window -> one net I
    assert(net === Map(2L -> "D", 4L -> "I"))
    // the window is half-open: the U@10 belongs to the BEFORE state,
    // so pk2's net op stays a delete of an existing row
    val net2 = ChangeLog.netChanges(j, "pk", 10L, 25L)
      .select("pk", "__op").as[(Long, String)].collect().toMap
    assert(net2 === Map(2L -> "D", 4L -> "I"))
  }

  test("scd2: intervals chain per pk, deletes close their predecessor " +
      "and leave no current row") {
    val j = Seq(
      (1L, "a1", "I", 1L),                                   // current
      (2L, "b1", "I", 2L), (2L, "b2", "U", 10L), (2L, "b2", "D", 20L),
      (3L, "c1", "I", 12L), (3L, "c1", "D", 15L),            // gone
      (4L, "d1", "I", 11L), (4L, "d2", "U", 18L))
      .toDF("pk", "text", "__op", "__seq")
    val got = ChangeLog.scd2(j, "pk")
      .select("pk", "text", "__valid_from", "__valid_to", "__current")
      .as[(Long, String, Long, Option[Long], Boolean)]
      .collect().toSet
    assert(got === Set(
      (1L, "a1", 1L, None, true),
      (2L, "b1", 2L, Some(10L), false),
      (2L, "b2", 10L, Some(20L), false),   // closed by the delete
      (3L, "c1", 12L, Some(15L), false),   // no current version
      (4L, "d1", 11L, Some(18L), false),
      (4L, "d2", 18L, None, true)))
    // intervals tile: every non-final valid_to == successor valid_from
    val byPk = got.groupBy(_._1).values
    byPk.foreach { ivs =>
      val sorted = ivs.toSeq.sortBy(_._3)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._4.contains(b._3))
        case _ => ()
      }
    }
  }

  test("compact: post-cut reads identical, pre-cut history gone, row " +
      "count shrinks to live + tail") {
    val j = Seq(
      (1L, "a1", "I", 1L), (1L, "a2", "U", 8L),
      (2L, "b1", "I", 2L), (2L, "b2", "U", 10L), (2L, "b2", "D", 20L),
      (3L, "c1", "I", 12L), (3L, "c1", "D", 15L),
      (4L, "d1", "I", 11L), (4L, "d2", "U", 18L))
      .toDF("pk", "text", "__op", "__seq")
    val c = ChangeLog.compact(j, "pk", 16L)
    def state(df: org.apache.spark.sql.DataFrame, asOf: Long) =
      ChangeLog.stateAt(df, "pk", asOf)
        .select("pk", "text").as[(Long, String)].collect().toMap
    // any post-cut sequence folds identically
    Seq(16L, 18L, 25L).foreach { s =>
      assert(state(c, s) === state(j, s), s"as-of $s diverged")
    }
    // live rows at the cut (pk 1, 2, 4 — pk3 already deleted) + the
    // two tail changes
    assert(c.count() === 5L)
    // history below the cut is gone by design: the compacted journal
    // has NOTHING before the cut (its earliest rows sit at seq 16),
    // while the original still answers
    assert(state(c, 10L) === Map.empty)
    assert(state(j, 10L) !== state(j, 16L))
  }

  test("scd2Apply: folding batches in sequence order reproduces the " +
      "one-shot fold exactly, including re-inserts after delete") {
    val j = Seq(
      (1L, "a1", "I", 1L), (1L, "a2", "U", 8L),
      (2L, "b1", "I", 2L), (2L, "b2", "U", 10L), (2L, "b2", "D", 20L),
      (2L, "b3", "I", 30L), // re-insert after delete
      (3L, "c1", "I", 12L), (3L, "c1", "D", 15L),
      (4L, "d1", "I", 11L))
      .toDF("pk", "text", "__op", "__seq")
    val whole = ChangeLog.scd2(j, "pk")
      .select("pk", "text", "__valid_from", "__valid_to", "__current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    val b1 = j.filter($"__seq" <= 10)
    val b2 = j.filter($"__seq" > 10 && $"__seq" <= 20)
    val b3 = j.filter($"__seq" > 20)
    val inc = ChangeLog.scd2Apply(
      ChangeLog.scd2Apply(ChangeLog.scd2(b1, "pk"), b2, "pk"), b3, "pk")
      .select("pk", "text", "__valid_from", "__valid_to", "__current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    assert(inc === whole)
  }

  test("scd2Sync: a full journal replay against existing state (fresh " +
      "checkpoint) is a no-op — the _meta max-seq guard absorbs it") {
    val j = Seq((1L, "a1", "I", 1L), (1L, "a2", "U", 8L),
      (2L, "b1", "I", 2L), (2L, "b1", "D", 9L))
      .toDF("pk", "text", "__op", "__seq")
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_scd2_replay"
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    j.coalesce(1).write.parquet(s"$root/journal")
    def drain(ckpt: String): Unit =
      graft.streaming.Scd2Stream.scd2Sync(
        spark.readStream.schema(j.schema).parquet(s"$root/journal"),
        "pk", s"$root/state", s"$root/$ckpt").awaitTermination()
    drain("ckpt1")
    val once = graft.streaming.Scd2Stream.read(spark, s"$root/state")
      .collect().map(_.toSeq).toSet
    drain("ckpt2") // fresh checkpoint -> the engine re-delivers
    val twice = graft.streaming.Scd2Stream.read(spark, s"$root/state")
      .collect().map(_.toSeq).toSet
    assert(twice === once, "replayed batches must be skipped")
  }

  test("enrichAsOf: exactly one version per (pk, seq); deleted and " +
      "not-yet-created probes keep NULL payloads") {
    val j = Seq(
      (1L, "a1", "I", 10L), (1L, "a2", "U", 20L),
      (2L, "b1", "I", 10L), (2L, "b1", "D", 25L))
      .toDF("pk", "text", "__op", "__seq")
    val iv = ChangeLog.scd2(j, "pk")
    val facts = Seq((1L, 5L), (1L, 15L), (1L, 25L),
      (2L, 15L), (2L, 30L)).toDF("pk", "at")
    val got = ChangeLog.enrichAsOf(facts, "pk", "at", iv, Seq("text"))
      .select("pk", "at", "text")
      .as[(Long, Long, Option[String])].collect().toSet
    assert(got === Set(
      (1L, 5L, None),          // before creation
      (1L, 15L, Some("a1")),
      (1L, 25L, Some("a2")),   // open interval
      (2L, 15L, Some("b1")),
      (2L, 30L, None)))        // deleted by then
    // row count preserved: the range residual admits at most one
    // interval per probe
    assert(ChangeLog.enrichAsOf(facts, "pk", "at", iv, Seq("text"))
      .count() === facts.count())
  }

  test("streaming triggered sync drains a journal directory") {
    val source = emb.filter($"vec_id" < 100)
    val idx = newIndex("stream")
    idx.rebuild(source)
    val journalDir = Files.createTempDirectory("graft_journal").toString
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    // journal batch: delete 0-4, upsert 100-104 as new rows
    val del = emb.filter($"vec_id" < 5)
      .select($"vec_id", $"embedding", $"label",
        lit(ChangeLog.OpDelete).as("__op"), $"vec_id".as("__seq"))
    val ins = emb.filter($"vec_id".between(100, 104))
      .select($"vec_id", $"embedding", $"label",
        lit(ChangeLog.OpInsert).as("__op"), $"vec_id".as("__seq"))
    del.unionByName(ins).write.mode("append").parquet(journalDir)
    val schema = spark.read.parquet(journalDir).schema
    IndexSync.syncOnce(spark, idx, journalDir, schema, ckpt)
    val ids = idx.read(spark).select("vec_id").collect().map(_.getLong(0)).toSet
    assert((0L until 5L).forall(!ids.contains(_)))
    assert((100L to 104L).forall(ids.contains))
    assert(ids.size === 100)
  }
}
