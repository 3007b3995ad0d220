package graft

import graft.operators.NearDupIndex
import java.nio.file.Files

class DedupIngestSpec extends SparkSpec {
  import spark.implicits._

  test("ingest admits novel docs, rejects near-dups of the index, " +
      "keeps same-batch near-dup pairs, exact-dedups within batch") {
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
    // 2 (dropped by first-wins); 4 near-dups 2 IN THE SAME BATCH (both
    // admitted — checked against the same index state)
    val b1 = Seq((1L, tCorpus + " "), (2L, tNovel), (3L, tNovel),
      (4L, tNovel + " ")).toDF("doc_id", "text")
    // batch 2: 5 near-dups 2/4 admitted by batch 1 (rejected); 6 novel
    val b2 = Seq((5L, tNovel + "  "), (6L, tOther)).toDF("doc_id", "text")
    b1.coalesce(1).write.mode("append").parquet(s"$root/journal")
    b2.coalesce(1).write.mode("append").parquet(s"$root/journal")
    graft.streaming.DedupIngest.run(spark, s"$root/idx", s"$root/journal",
      b1.schema, s"$root/ckpt", "doc_id", "text", threshold = 0.5,
      Map("maxFilesPerTrigger" -> "1"))
    val ids = spark.read.parquet(s"$root/idx_docs")
      .select("id").as[Long].collect().toSet
    assert(ids === Set(100L, 2L, 4L, 6L))
    // the admitted docs are probe-able: a re-delivery of tNovel now
    // collides with BOTH admitted variants
    val redo = Seq((7L, tNovel)).toDF("doc_id", "text")
    val pairs = NearDupIndex.nearDupsAgainst(spark,
        NearDupIndex.load(spark, s"$root/idx"), redo, "doc_id", "text",
        0.5)
      .select("corpus_id").as[Long].collect().toSet
    assert(pairs === Set(2L, 4L))
  }
}
