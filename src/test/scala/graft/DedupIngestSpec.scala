package graft

import graft.operators.NearDupIndex
import java.nio.file.Files
import org.apache.hadoop.fs.Path

class DedupIngestSpec extends SparkSpec {
  import spark.implicits._

  /** Append one journal file and pin its mtime so micro-batch replay
    * order is deterministic even on coarse-mtime filesystems (the file
    * stream source orders by modification time). */
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

  test("ingest admits novel docs, rejects near-dups of the index, " +
      "sweeps same-batch near-dup pairs to the min id, " +
      "exact-dedups within batch") {
    val root = Files.createTempDirectory("graft_ingest").toString
    // trailing-whitespace variants: identical SHINGLES (trim) but a
    // different raw md5 — they pass the exact stage and exercise the
    // near-dup stage with deterministic Jaccard 1.0
    val tCorpus = "alpha beta gamma delta epsilon zeta eta theta"
    val tNovel = "one two three four five six seven eight nine"
    val tOther = "completely different content about other things entirely"
    val corpus = Seq((100L, tCorpus)).toDF("doc_id", "text")
    NearDupIndex.persist(corpus, "doc_id", "text", s"$root/idx")
    // batch 1: 1 near-dups the corpus (rejected); 2 novel; 3 exact-dups
    // 2 (dropped by first-wins); 4 near-dups 2 IN THE SAME BATCH — the
    // intra-batch sweep admits only the min id of the {2,4} group
    val b1 = Seq((1L, tCorpus + " "), (2L, tNovel), (3L, tNovel),
      (4L, tNovel + " ")).toDF("doc_id", "text")
    // batch 2: 5 near-dups 2 admitted by batch 1 (rejected); 6 novel
    val b2 = Seq((5L, tNovel + "  "), (6L, tOther)).toDF("doc_id", "text")
    appendStamped(b1, s"$root/journal", 10000L)
    appendStamped(b2, s"$root/journal", 20000L)
    graft.streaming.DedupIngest.run(spark, s"$root/idx", s"$root/journal",
      b1.schema, s"$root/ckpt", "doc_id", "text", threshold = 0.5,
      Map("maxFilesPerTrigger" -> "1"))
    val ids = spark.read.parquet(s"$root/idx_docs")
      .select("id").as[Long].collect().toSet
    assert(ids === Set(100L, 2L, 6L))
    // the admitted doc is probe-able: a re-delivery of tNovel collides
    // with the surviving variant only (4 was swept, never admitted)
    val redo = Seq((7L, tNovel)).toDF("doc_id", "text")
    val pairs = NearDupIndex.nearDupsAgainst(spark,
        NearDupIndex.load(spark, s"$root/idx"), redo, "doc_id", "text",
        0.5)
      .select("corpus_id").as[Long].collect().toSet
    assert(pairs === Set(2L))
  }

  test("intra-batch sweep closes transitive groups (component min " +
      "survives), intraBatch = false restores both-admitted") {
    // a ~ b and b ~ c but a !~ c: component {a,b,c} admits only a.
    // Sliding 12-word windows at stride 2: consecutive windows share
    // 8/12 distinct shingles (J = 0.67 ≥ 0.5) while a vs c share only
    // 6/14 (J = 0.43 < 0.5), so the refine stage guarantees the pair
    // graph is a CHAIN. The band collisions for the two chain pairs
    // are deterministic in the word strings below (pinned by the
    // sanity assert).
    val w = (0 to 20).map(i => s"unit$i")
    def txt(off: Int) = w.slice(off, off + 12).mkString(" ")
    val batch = Seq((11L, txt(0)), (12L, txt(2)), (13L, txt(4)))
      .toDF("doc_id", "text")
    val seed = Seq((200L, "totally unrelated corpus content here"))
      .toDF("doc_id", "text")

    def runOnce(tag: String, intra: Boolean): Set[Long] = {
      val root = Files.createTempDirectory(s"graft_ingest_$tag").toString
      NearDupIndex.persist(seed, "doc_id", "text", s"$root/idx")
      appendStamped(batch, s"$root/journal", 10000L)
      graft.streaming.DedupIngest.run(spark, s"$root/idx",
        s"$root/journal", batch.schema, s"$root/ckpt", "doc_id", "text",
        threshold = 0.5, Map.empty, intraBatch = intra)
      spark.read.parquet(s"$root/idx_docs")
        .select("id").as[Long].collect().toSet
    }
    // sanity: the staircase is a chain, not a clique
    val pairs = graft.operators.Dedup.minhashLshPairs(batch, "doc_id",
        "text", 0.5).select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs === Set((11L, 12L), (12L, 13L)))
    assert(runOnce("sweep", intra = true) === Set(200L, 11L))
    assert(runOnce("nosweep", intra = false) === Set(200L, 11L, 12L, 13L))
  }

  test("compaction folds append-grown dirs back to one file each " +
      "without changing the probe's answers") {
    val root = Files.createTempDirectory("graft_ingest_cpt").toString
    val seed = (300L to 320L)
      .map(i => (i, s"seed document number $i about topic ${i % 3} " +
        s"with body text ${i * 7}"))
      .toDF("doc_id", "text")
    val idx = NearDupIndex.persist(seed, "doc_id", "text", s"$root/idx")
    // several fresh insert batches -> the append fast path stacks one
    // file per touched dir per batch
    for (b <- 0 until 3) {
      val batch = (0 until 10)
        .map(i => (b * 100L + i,
          s"novel batch $b doc $i content ${b * 31 + i} unique words"))
        .toDF("doc_id", "text")
      NearDupIndex.admitAndSync(spark, idx, batch, "doc_id", "text", 0.5)
    }
    val fs = new Path(s"$root/idx")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def maxFilesPerDir(path: String): Int =
      fs.listStatus(new Path(path)).filter(_.isDirectory).map { d =>
        fs.listStatus(d.getPath)
          .count(s => s.isFile && s.getPath.getName.startsWith("part-"))
      }.max
    assert(maxFilesPerDir(s"$root/idx") > 1,
      "appends should have stacked files")
    val probeDocs = seed.select(($"doc_id" + 1000L).as("doc_id"), $"text")
      .limit(3)
    val before = NearDupIndex.nearDupsAgainst(spark, idx, probeDocs,
        "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = NearDupIndex.compact(spark, idx)
    assert(n > 0, "compaction should rewrite the stacked dirs")
    assert(maxFilesPerDir(s"$root/idx") === 1)
    assert(maxFilesPerDir(s"$root/idx_docs") === 1)
    val after = NearDupIndex.nearDupsAgainst(spark, idx, probeDocs,
        "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after === before && after.nonEmpty)
    // idempotent: a second pass finds nothing to do
    assert(NearDupIndex.compact(spark, idx) === 0)
  }
}
