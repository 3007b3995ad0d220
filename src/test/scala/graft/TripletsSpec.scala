package graft

import graft.operators.Triplets
import org.apache.spark.sql.functions._

class TripletsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, (1 to 20).map(i => s"a$i").mkString(" ")),
    (2L, (1 to 11).map(i => s"b$i").mkString(" ")),
    (3L, "short doc"),
    (4L, (1 to 16).map(i => s"d$i").mkString(" "))
  ).toDF("doc_id", "text")

  test("anchor and positive overlap by size-stride tokens of one doc; " +
    "single-chunk docs mine nothing") {
    val got = Triplets.mine(corpus, "doc_id", "text",
      size = 8, stride = 4, poolSize = 3)
      .orderBy("anchor_id", "chunk_idx").collect()
    // doc 3 has 2 tokens -> one chunk -> no pair
    assert(!got.exists(_.getAs[Long]("anchor_id") == 3L))
    got.foreach { r =>
      val a = r.getAs[String]("anchor").split(" ")
      val p = r.getAs[String]("positive").split(" ")
      // successor chunk starts stride tokens later: suffix of anchor
      // past the stride == prefix of positive
      val overlap = a.drop(4)
      assert(p.startsWith(overlap),
        s"anchor ${a.toSeq} / positive ${p.toSeq} must overlap")
      assert(r.getAs[Long]("neg_id") != r.getAs[Long]("anchor_id"),
        "negative must come from another document")
    }
    // doc 1: 20 tokens -> 5 chunks -> 4 pairs; doc 2: 11 -> 3 -> 2;
    // doc 4: 16 -> 4 -> 3
    assert(got.map(_.getAs[Long]("anchor_id")).toSeq ===
      Seq(1L, 1L, 1L, 1L, 2L, 2L, 4L, 4L, 4L))
  }

  test("the mined set is partitioning-independent") {
    val once = Triplets.mine(corpus, "doc_id", "text", 8, 4, 3)
      .collect().map(_.toSeq).toSet
    val again = Triplets.mine(corpus.repartition(7), "doc_id", "text",
      8, 4, 3).collect().map(_.toSeq).toSet
    assert(once === again)
  }

  test("pool bound holds: every negative comes from the md5-first " +
    "poolSize documents") {
    val poolIds = corpus.select(col("doc_id"),
        md5(col("doc_id").cast("string")).as("mk"))
      .orderBy("mk").limit(2).select("doc_id").as[Long].collect().toSet
    val negIds = Triplets.mine(corpus, "doc_id", "text", 8, 4, 2)
      .select("neg_id").as[Long].collect().toSet
    assert(negIds.subsetOf(poolIds), s"$negIds not within pool $poolIds")
  }

  test("mineHard: the negative is the pool's argmax-cosine document, " +
    "never the anchor itself, constant per doc across its chunks") {
    val emb = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.9, 0.1)),
      (3L, Array(0.0, 1.0)), (4L, Array(-1.0, 0.0))
    ).toDF("vec_id", "embedding")
    val got = Triplets.mineHard(corpus, "doc_id", "text",
        emb, "vec_id", "embedding", size = 8, stride = 4, poolSize = 4)
      .select("anchor_id", "neg_id").distinct()
      .as[(Long, Long)].collect().toMap
    // doc 1 [1,0]: most similar pool member is doc 2 [0.9,0.1];
    // doc 2 likewise picks doc 1; doc 4 [-1,0] picks doc 3 [0,1]
    // (cos 0) over docs 1/2 (cos < 0)
    assert(got(1L) === 2L)
    assert(got(2L) === 1L)
    assert(got(4L) === 3L)
    got.foreach { case (a, n) => assert(a != n) }
  }
}
