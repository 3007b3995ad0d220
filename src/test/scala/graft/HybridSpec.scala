package graft

import graft.search.Hybrid
import org.apache.spark.sql.functions._

class HybridSpec extends SparkSpec {
  import spark.implicits._

  // tiny corpus with both text and (1-D, trivially cosine-orderable)
  // "embeddings": the spec pins fusion arithmetic, not vector math
  private def corpus = Seq(
    (10L, "spark shuffles data between stages", Seq(1.0f, 0.0f)),
    (11L, "spark caches hot data in memory",    Seq(0.9f, 0.1f)),
    (12L, "ducks swim on the quiet lake",       Seq(0.0f, 1.0f)),
    (13L, "the lake reflects the quiet sky",    Seq(0.1f, 0.9f))
  ).toDF("doc_id", "text", "embedding")

  test("bm25: repeated rare term outranks common-term match") {
    val q = Seq((0L, "lake spark")).toDF("qid", "qtext")
    val scores = Hybrid.bm25(corpus, q, "qid", "qtext", "doc_id", "text")
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // docs 12/13 match "lake", 10/11 match "spark" — same df(=2) each;
    // all four score positive, non-matching pairs absent
    assert(scores.keySet === Set(10L, 11L, 12L, 13L))
    assert(scores.values.forall(_ > 0.0))
  }

  test("bm25: doc matching MORE query terms scores higher") {
    val q = Seq((0L, "quiet lake")).toDF("qid", "qtext")
    val scores = Hybrid.bm25(corpus, q, "qid", "qtext", "doc_id", "text")
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(scores(12L) > scores.getOrElse(10L, 0.0),
      "two-term match beats no-match")
    assert(!scores.contains(10L) && !scores.contains(11L),
      "docs sharing no term are absent")
  }

  test("bm25f: a single field with weight 1 reduces to classic bm25, " +
    "and a title hit under field weight 2 outranks an equal body hit") {
    val q = Seq((0L, "lake spark quiet")).toDF("qid", "qtext")
    // degenerate configuration ≡ bm25 (same b, weight 1): tf̃ = tf/B
    // and idf·(tf/B)(k1+1)/(tf/B + k1) = idf·tf(k1+1)/(tf + k1·B)
    val flat = Hybrid.bm25f(corpus, q, "qid", "qtext", "doc_id",
        Seq(Hybrid.Bm25Field("text", 1.0, 0.75)))
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val classic = Hybrid.bm25(corpus, q, "qid", "qtext", "doc_id", "text")
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(flat.keySet === classic.keySet)
    flat.foreach { case (d, s) =>
      assert(math.abs(s - classic(d)) < 1e-9 * math.max(1.0, s.abs),
        s"single-field bm25f must equal bm25 for doc $d: $s ${classic(d)}")
    }
    // two-field: docs 20/21 are term-twins except WHERE the term
    // sits — the title hit must win under title weight 2
    val fielded = Seq(
      (20L, "migration", "birds fly far in autumn skies always"),
      (21L, "journey", "birds migration far in autumn skies always")
    ).toDF("doc_id", "title", "body")
    val q2 = Seq((0L, "migration")).toDF("qid", "qtext")
    val scores = Hybrid.bm25f(fielded, q2, "qid", "qtext", "doc_id",
        Seq(Hybrid.Bm25Field("title", 2.0, 0.5),
          Hybrid.Bm25Field("body", 1.0, 0.75)))
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(scores(20L) > scores(21L),
      s"weighted title hit must outrank the body hit: $scores")
    // saturation applies ONCE over the combined tf̃: a doc carrying
    // the term in BOTH fields scores less than the per-field scores
    // would sum to, but more than either alone
    val both = Seq(
      (30L, "migration", "the migration begins at dawn today ok"),
      (31L, "migration", "the journey begins at dawn today ok"),
      (32L, "passage", "the migration begins at dawn today ok")
    ).toDF("doc_id", "title", "body")
    val s3 = Hybrid.bm25f(both, q2, "qid", "qtext", "doc_id",
        Seq(Hybrid.Bm25Field("title", 2.0, 0.5),
          Hybrid.Bm25Field("body", 1.0, 0.75)))
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(s3(30L) > s3(31L) && s3(30L) > s3(32L),
      s"both-fields doc leads: $s3")
    assert(s3(30L) < s3(31L) + s3(32L),
      s"single saturation caps the both-fields doc below the sum: $s3")
  }

  test("persisted field postings: bm25f bit-identical to in-memory, " +
    "field weights retune at query time without a rebuild") {
    val fielded = Seq(
      (20L, "migration routes", "birds fly far in autumn skies"),
      (21L, "journey", "birds migration far in autumn skies always"),
      (22L, "passage", "the migration begins at dawn today")
    ).toDF("doc_id", "title", "body")
    val q = Seq((0L, "migration autumn")).toDF("qid", "qtext")
    val dir = java.nio.file.Files.createTempDirectory("pbm25f")
      .toString + "/idx"
    val idx = Hybrid.persistFieldPostings(fielded, "doc_id",
      Seq("title", "body"), dir, buckets = 8)
    val fields = Seq(Hybrid.Bm25Field("title", 2.0, 0.5),
      Hybrid.Bm25Field("body", 1.0, 0.75))
    val mem = Hybrid.bm25f(fielded, q, "qid", "qtext", "doc_id", fields)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val disk = Hybrid.bm25fPersisted(spark, idx, q, "qid", "qtext",
        "doc_id", Seq((2.0, 0.5), (1.0, 0.75)))
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(disk === mem && mem.nonEmpty,
      s"persisted scores must be bit-identical: $disk vs $mem")
    // different weights on the SAME layout: body-only emphasis makes
    // the title-only doc score strictly lower than before
    val retuned = Hybrid.bm25fPersisted(spark, idx, q, "qid", "qtext",
        "doc_id", Seq((0.1, 0.5), (1.0, 0.75)))
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(retuned(20L) < disk(20L),
      "down-weighting the title must lower the title-hit doc's score")
    // the posting scan prunes to the query terms' buckets at the
    // file listing AND pushes the term filter
    spark.sharedState.cacheManager.clearCache()
    val plan = Hybrid.bm25fPersisted(spark, idx, q, "qid", "qtext",
      "doc_id", Seq((2.0, 0.5), (1.0, 0.75)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("__tbucket"),
      s"scan must prune by term bucket:\n${plan.take(2000)}")
    // delete-only sync removes the doc's postings from EVERY field;
    // re-inserting from source restores the exact layout (frozen df,
    // frozen lengths)
    import graft.index.ChangeLog
    def snapshot() = spark.read.parquet(dir)
      .select($"__did", $"__t", $"__f", $"__tf", $"__fl", $"__df")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val before = snapshot()
    val victim = fielded.filter($"doc_id" === 21L)
    Hybrid.syncPersistedFieldPostings(spark, idx,
      victim.withColumn("__op", lit(ChangeLog.OpDelete))
        .withColumn("__seq", lit(1L)),
      "doc_id", Seq("title", "body"))
    assert(!spark.read.parquet(dir).select("__did").as[Long]
      .collect().contains(21L), "deleted doc's postings must be gone")
    Hybrid.syncPersistedFieldPostings(spark, idx,
      victim.withColumn("__op", lit(ChangeLog.OpInsert))
        .withColumn("__seq", lit(2L)),
      "doc_id", Seq("title", "body"))
    assert(snapshot() === before,
      "delete + re-insert must round-trip to the original layout")
  }

  test("rrf: a doc retrieved by both legs outranks single-leg winners") {
    // query text matches docs 12/13 ("lake"), query vector points at
    // doc 12's direction → doc 12 is in both legs and must fuse first
    val q = Seq((0L, "lake", Seq(0.0f, 1.0f))).toDF("qid", "qtext", "qvec")
    val out = Hybrid.hybridTopK(corpus, q, "qid", "qtext", "qvec",
        "doc_id", "text", "embedding", n = 2, k = 4)
      .collect()
    assert(out.head.getLong(2) === 12L, "both-legs doc fuses to rank 1")
    val r12 = out.find(_.getLong(2) == 12L).get
    assert(r12.getBoolean(3) && r12.getBoolean(4), "in_vec AND in_kw")
  }

  test("no shared terms: hybrid degenerates to the vector ranking") {
    val q = Seq((0L, "zzz qqq", Seq(1.0f, 0.0f))).toDF("qid", "qtext", "qvec")
    val out = Hybrid.hybridTopK(corpus, q, "qid", "qtext", "qvec",
        "doc_id", "text", "embedding", n = 4, k = 4)
      .collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(10L, 11L, 13L, 12L),
      "pure cosine order")
    assert(out.forall(!_.getBoolean(4)), "no keyword hits anywhere")
  }

  test("rrfFuse: generic legs compose — an ANN ranking plugs in directly") {
    // two hand-built legs; doc 5 is mid-rank in both, doc 9 tops one
    val legA = Seq((0L, 9L, 1), (0L, 5L, 2), (0L, 7L, 3))
      .toDF("query_id", "doc_id", "rank")
    val legB = Seq((0L, 5L, 1), (0L, 8L, 2))
      .toDF("query_id", "doc_id", "rank")
    val out = Hybrid.rrfFuse(Seq(legA, legB), "doc_id", k = 4)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    // 5: 1/62+1/61 ≈ .0325 beats 9: 1/61 ≈ .0164
    assert(out.toSeq === Seq((1, 5L), (2, 9L), (3, 8L), (4, 7L)))
  }

  test("persisted postings: bm25 bit-identical, scan pruned to query terms") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"doc_id" >= 3 && $"doc_id" < 200)
      .select("doc_id", "text")
    val q = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"doc_id" < 3).select($"doc_id".as("qid"), $"text".as("qtext"))
    val path = java.nio.file.Files.createTempDirectory("graft_ppost")
      .toString + "/idx"
    val idx = Hybrid.persistPostings(docs, "doc_id", "text", path,
      buckets = 32)
    val mem = Hybrid.bm25(docs, q, "qid", "qtext", "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    spark.sharedState.cacheManager.clearCache()
    val onDisk = Hybrid.bm25Persisted(spark, idx, q, "qid", "qtext",
      "doc_id")
    val disk = onDisk.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(disk === mem && disk.nonEmpty,
      "persisted BM25 must be bit-identical to the in-memory leg")
    // the posting scan prunes to the query terms' hash buckets
    val plan = onDisk.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("__tbucket"),
      s"posting scan must prune by term bucket:\n${plan.take(2000)}")
  }

  test("postings sync: frozen df, changed docs replaced, deletes gone") {
    import graft.index.ChangeLog
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val initial = d.filter($"doc_id" >= 10 && $"doc_id" < 200)
      .select("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_ppsync")
      .toString + "/idx"
    val idx = Hybrid.persistPostings(initial, "doc_id", "text", path,
      buckets = 32)
    val frozen = spark.read.parquet(path).select("__t", "__df")
      .distinct().as[(String, Long)].collect().toMap
    val statsBefore = spark.read.parquet(path + "_stats").head()
    val newText = d.filter($"doc_id" === 3).select("text")
      .head().getString(0)
    val changes = d.filter($"doc_id" >= 3 && $"doc_id" < 10)
      .select("doc_id", "text")
      .withColumn("__op", lit(ChangeLog.OpInsert))
      .withColumn("__seq", lit(1L))
      .unionByName(d.filter($"doc_id" === 20).select("doc_id", "text")
        .withColumn("__op", lit(ChangeLog.OpDelete))
        .withColumn("__seq", lit(2L)))
      .unionByName(d.filter($"doc_id" === 30)
        .select($"doc_id", lit(newText).as("text"))
        .withColumn("__op", lit(ChangeLog.OpUpdate))
        .withColumn("__seq", lit(3L)))
    Hybrid.syncPersistedPostings(spark, idx, changes, "doc_id", "text")
    val after = spark.read.parquet(path)
      .select($"__did", $"__t", $"__tf", $"__df")
      .as[(Long, String, Long, Long)].collect()
    assert(!after.exists(_._1 == 20L), "deleted doc's postings gone")
    assert((3L to 9L).forall(i => after.exists(_._1 == i)),
      "inserted docs have postings")
    // the updated doc's postings are its NEW text's — identical (t, tf)
    // set to doc 3, which was inserted with the same text
    val d3 = after.filter(_._1 == 3L).map(r => (r._2, r._3)).toSet
    val d30 = after.filter(_._1 == 30L).map(r => (r._2, r._3)).toSet
    assert(d30 === d3 && d30.nonEmpty,
      "update must replace old postings with the new text's")
    // every new posting carries its term's FROZEN df (0 if unseen)
    for ((did, t, _, df) <- after if did < 10 || did == 30L)
      assert(df === frozen.getOrElse(t, 0L),
        s"doc $did term '$t': df $df != frozen ${frozen.get(t)}")
    assert(spark.read.parquet(path + "_stats").head() === statsBefore,
      "corpus stats stay frozen across syncs")
  }

  test("syncPersistedPostings is idempotent under batch replay") {
    import graft.index.ChangeLog
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val initial = d.filter($"doc_id" >= 10 && $"doc_id" < 200)
      .select("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_pp_replay")
      .toString + "/idx"
    val idx = Hybrid.persistPostings(initial, "doc_id", "text", path,
      buckets = 16)
    val batch = d.filter($"doc_id" >= 3 && $"doc_id" < 8)
      .select("doc_id", "text")
      .withColumn("__op", lit(ChangeLog.OpInsert))
      .withColumn("__seq", lit(1L))
      .unionByName(d.filter($"doc_id" === 20).select("doc_id", "text")
        .withColumn("__op", lit(ChangeLog.OpDelete))
        .withColumn("__seq", lit(2L)))
    def snapshot() = spark.read.parquet(path)
      .select($"__did", $"__t", $"__tf", $"__df")
      .as[(Long, String, Long, Long)].collect().toSet
    Hybrid.syncPersistedPostings(spark, idx, batch, "doc_id", "text")
    val once = snapshot()
    Hybrid.syncPersistedPostings(spark, idx, batch, "doc_id", "text")
    assert(snapshot() === once && once.nonEmpty,
      "replaying a batch must be a no-op")
  }

  test("fused output is deterministic under repartitioning") {
    val q = Seq((0L, "spark lake", Seq(0.5f, 0.5f)))
      .toDF("qid", "qtext", "qvec")
    def run(c: org.apache.spark.sql.DataFrame) =
      Hybrid.hybridTopK(c, q, "qid", "qtext", "qvec",
        "doc_id", "text", "embedding", n = 3, k = 4)
        .collect().map(_.toSeq).toSeq
    assert(run(corpus) === run(corpus.repartition(7)))
  }

  /** Files actually opened by the (executed) scan of `pathFrag` —
    * the scan's numFiles metric counts what partition pruning left. */
  private def filesRead(df: org.apache.spark.sql.DataFrame,
      pathFrag: String): Long = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    df.collect()
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString
        .contains(pathFrag)))
      .map(_.metrics("numFiles").value).sum
  }

  test("sync discovery reads the (did, tbucket) sidecar pruned to the " +
    "changed pks' hash dirs, never the full layout") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"doc_id" >= 3 && $"doc_id" < 200)
      .select("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_ppdisc")
      .toString + "/idx"
    Hybrid.persistPostings(docs, "doc_id", "text", path, buckets = 32)
    val ddirs = new java.io.File(path + "_docs").listFiles()
      .filter(_.getName.startsWith("__dbkt=")).map(_.getName).toSet
    assert(ddirs.size >= 8, s"pk-hash dirs expected: ${ddirs.size}")
    spark.sharedState.cacheManager.clearCache()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val changedPks = Seq(5L).toDF("__did")
      val bkts = spark.range(1)
        .select(pmod(xxhash64(lit(5L)),
          lit(Hybrid.postingsDocBuckets.toLong)).cast("int"))
        .head().getInt(0)
      val disc = Hybrid.oldTermBuckets(spark, path, changedPks, Seq(bkts))
      val total = spark.read.parquet(path + "_docs").inputFiles.length
      val read = filesRead(disc, "idx_docs")
      assert(read > 0 && read < total,
        s"discovery read $read of $total sidecar files")
      // discovery agrees with the legacy full-layout semi-join
      val expect = spark.read.parquet(path)
        .join(changedPks, Seq("__did"), "left_semi")
        .select("__tbucket").distinct()
        .as[Int].collect().toSet
      assert(disc.distinct().as[Int].collect().toSet === expect)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("sidecar tracks the layout across syncs and migrates legacy " +
    "layouts that lack it") {
    import graft.index.ChangeLog
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val initial = d.filter($"doc_id" >= 10 && $"doc_id" < 120)
      .select("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_ppsc")
      .toString + "/idx"
    val idx = Hybrid.persistPostings(initial, "doc_id", "text", path,
      buckets = 16)
    // simulate a legacy layout: drop the sidecar; the next sync must
    // rebuild it (one-time migration) and still locate old buckets
    val fs = new org.apache.hadoop.fs.Path(path + "_docs")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path + "_docs"), true)
    val changes = d.filter($"doc_id" >= 3 && $"doc_id" < 8)
      .select("doc_id", "text")
      .withColumn("__op", lit(ChangeLog.OpInsert))
      .withColumn("__seq", lit(1L))
      .unionByName(d.filter($"doc_id" === 20).select("doc_id", "text")
        .withColumn("__op", lit(ChangeLog.OpDelete))
        .withColumn("__seq", lit(2L)))
    Hybrid.syncPersistedPostings(spark, idx, changes, "doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"__did", $"__tbucket").distinct()
        .as[(Long, Int)].collect().toSet
    val layoutPairs = pairs(spark.read.parquet(path))
    val sidecarPairs = pairs(spark.read.parquet(path + "_docs"))
    assert(sidecarPairs === layoutPairs && sidecarPairs.nonEmpty,
      "sidecar must mirror the layout's (did, tbucket) pairs")
    assert(!sidecarPairs.exists(_._1 == 20L), "deleted doc left sidecar")
    // replay: still consistent (idempotent maintenance)
    Hybrid.syncPersistedPostings(spark, idx, changes, "doc_id", "text")
    assert(pairs(spark.read.parquet(path + "_docs")) === layoutPairs)
  }
}
