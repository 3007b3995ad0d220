package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet").cache()

  test("shingles: n tokens yield n-2 distinct-capped trigrams") {
    val df = Seq("a b c d e", "x y", "").toDF("text")
      .select(size(Dedup.shingles(col("text"), 3)).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq === Seq(3, 0, 0))
  }

  test("jaccard: hand-computed value") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d")))
      .toDF("x", "y").select(Dedup.jaccard(col("x"), col("y")).as("j"))
    assert(math.abs(df.head().getDouble(0) - 0.5) < 1e-12)
  }

  test("minhash LSH finds every brute-force pair at threshold 0.5") {
    val block = docs.filter($"doc_id" < 200)
    val exact = Dedup.jaccardPairs(block, "doc_id", "text", 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(block, "doc_id", "text", 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain near-dups")
    // LSH candidates are verified with exact jaccard, so lsh ⊆ exact;
    // with 16 hashes / 4 bands recall on >=0.5 pairs should be total here.
    assert(lsh === exact)
  }

  test("LSH embedding near-dup finds the brute-force pairs on " +
    "normalized vectors") {
    import graft.functions.{VectorFunctions => VF}
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", VF.normalize($"embedding").as("embedding"))
    val brute = {
      val a = emb.toDF("a_id", "a_v")
      val b = emb.toDF("b_id", "b_v")
      a.join(b, $"a_id" < $"b_id")
        .filter(VF.cosine($"a_v", $"b_v") > 0.4)
        .select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val lsh = graft.operators.Dedup.embeddingNearDupLsh(
      emb, "vec_id", "embedding", cosineThreshold = 0.4)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty)
    assert(lsh.subsetOf(brute), "refine must keep only true pairs")
    val recall = lsh.size.toDouble / brute.size
    assert(recall >= 0.8, s"recall $recall too low (${lsh.size}/${brute.size})")
  }

  test("decontaminate flags n-gram collisions with the benchmark set") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "entirely different words about nothing shared"),
      (3L, "quick brown fox appears here too")).toDF("cid", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps high")).toDF("bid", "text")
    val hits = Dedup.decontaminate(corpus, "cid", "text",
      bench, "bid", "text", n = 3, minHits = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // doc 1 shares "the quick brown", "quick brown fox" (+"brown fox
    // jumps"); doc 3 shares "quick brown fox"; doc 2 shares nothing
    assert(hits.map(_._1) === Set(1L, 3L))
    assert(hits.find(_._1 == 1L).get._3 === 3L)
    assert(hits.find(_._1 == 3L).get._3 === 1L)
    // a doc equal to a benchmark doc is flagged with its full set
    val self = Dedup.decontaminate(bench.toDF("cid", "text"), "cid",
      "text", bench, "bid", "text", n = 3, minHits = 1)
      .head()
    assert(self.getLong(2) === 4L) // 6 tokens -> 4 trigrams
  }

  test("contaminationScore: per-doc overlap fraction, clean docs at 0") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "entirely different words about nothing shared"),
      (3L, "the quick brown fox jumps high")).toDF("cid", "text")
    val bench = Seq(
      (100L, "the quick brown fox jumps high")).toDF("bid", "text")
    val by = Dedup.contaminationScore(corpus, "cid", "text", bench,
        "text", n = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    // doc 1: 7 distinct trigrams, 3 in bench ("the quick brown",
    // "quick brown fox", "brown fox jumps")
    assert(by(1L) === ((7L, 3L, 0.4286)))
    assert(by(2L) === ((4L, 0L, 0.0)), "clean doc present at score 0")
    assert(by(3L) === ((4L, 4L, 1.0)), "doc equal to a benchmark maxes out")
  }

  test("identical texts give simhash hamming distance 0") {
    val df = Seq(("a b c d", "a b c d"), ("a b c d", "totally different words"))
      .toDF("t1", "t2")
      .select(Dedup.hamming64(Dedup.simhash64(col("t1")),
        Dedup.simhash64(col("t2"))).as("h"))
    val hs = df.collect().map(_.getInt(0))
    assert(hs(0) === 0)
    assert(hs(1) > 0)
  }

  test("connected components: chains collapse, singleton pairs stay apart") {
    // a 30-node chain (worst case for naive propagation), a triangle
    // with a chord, and an isolated pair — all in one edge list
    val chain = (100L until 129L).map(i => (i, i + 1))
    val tri = Seq((5L, 7L), (7L, 9L), (5L, 9L), (9L, 11L))
    val pair = Seq((500L, 501L))
    val pairs = spark.createDataFrame(chain ++ tri ++ pair)
      .toDF("a_id", "b_id")
    val comp = Dedup.connectedComponents(pairs, "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (100L to 129L).foreach(i => assert(comp(i) === 100L,
      s"chain node $i must resolve to 100"))
    Seq(5L, 7L, 9L, 11L).foreach(i => assert(comp(i) === 5L))
    assert(comp(500L) === 500L && comp(501L) === 500L)
    assert(comp.size === 30 + 4 + 2, "every pair node gets a component")
  }

  test("exact first-wins keeps the lowest-order row per key") {
    val df = Seq((1L, "k1"), (2L, "k1"), (3L, "k2")).toDF("id", "k")
    val kept = Dedup.exactFirstWins(df, Seq("k"), "id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L))
  }

  test("fuzzyPairs: blocked candidates, thresholded verify, viral-block " +
    "guard") {
    val df = Seq(
      (1L, "kettle"), (2L, "kattle"),  // d=1, same first-letter block
      (3L, "kettles"),                  // d=1 vs kettle, d=2 vs kattle
      (4L, "kayak"),                    // same block, d>2 from all
      (5L, "teapot"), (6L, "teapot")    // identical -> excluded
    ).toDF("id", "name")
    val blk = substring(col("name"), 1, 1)
    val pairs = Dedup.fuzzyPairs(df, "id", "name", blk, maxDist = 2)
      .select("a_id", "b_id", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs === Set((1L, 2L, 1), (1L, 3L, 1), (2L, 3L, 2)),
      s"got $pairs")
    // the viral-block cap drops the k-block (4 members), keeps the rest
    val capped = Dedup.fuzzyPairs(df, "id", "name", blk, maxDist = 2,
        maxBlock = Some(3))
      .select("a_id").collect()
    assert(capped.isEmpty,
      "every candidate pair lived in the capped block")
    // threshold edge: exactly maxDist survives, maxDist+1 does not
    val edge = Seq((1L, "abcd"), (2L, "abxy"), (3L, "axyz"))
      .toDF("id", "name")
    val d2 = Dedup.fuzzyPairs(edge, "id", "name", lit("b"), maxDist = 2)
      .select("a_id", "b_id").collect().map(r =>
        (r.getLong(0), r.getLong(1))).toSet
    assert(d2 === Set((1L, 2L), (2L, 3L)),
      "the d=2 pairs survive (abxy~axyz is delete-b + append-z); " +
        "abcd~axyz at d=3 drops")
  }

  test("ttlFirstWins: greedy per-key throttle — struck rows do not " +
    "refresh the clock; ties strike; null ts drops") {
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000L)
    val df = Seq(
      // key a at 0s, 5s, 9s, 14s with TTL 10s: admit 0 (first),
      // strike 5 and 9 (within 10 of 0), admit 14 (>= 0+10 — the
      // struck 5/9 must NOT have refreshed the clock)
      (1L, "a", t(0)), (2L, "a", t(5)), (3L, "a", t(9)), (4L, "a", t(14)),
      // exact-tie pair on key b: lower id admits, tie strikes
      (11L, "b", t(100)), (10L, "b", t(100)),
      // null ts row drops entirely
      (20L, "c", null.asInstanceOf[Timestamp])
    ).toDF("id", "k", "ts")
    val kept = Dedup.ttlFirstWins(df, Seq("k"), "ts", "id",
        ttlMicros = 10L * 1000000L)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L, 10L))
  }

  test("ttlFirstWins equals a driver-local greedy replay on the events " +
    "fixture, independent of input partitioning") {
    val ev = graft.queries.EventQueries.load(spark, sf)
      .select($"user_id", $"event_type", $"ts", $"event_id")
    val ttl = 2L * 86400L * 1000000L
    val got = Dedup.ttlFirstWins(ev.repartition(7), // adversarial split
        Seq("user_id", "event_type"), "ts", "event_id", ttl)
      .select("event_id").as[Long].collect().toSet
    val rows = ev.select($"user_id", $"event_type",
        unix_micros($"ts").as("tu"), $"event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._3, x._4))
    val last = scala.collection.mutable.Map[(Long, String), Long]()
    val want = rows.filter { case (u, et, tu, _) =>
      val k = (u, et)
      val admit = !last.contains(k) || tu - last(k) >= ttl
      if (admit) last(k) = tu
      admit
    }.map(_._4).toSet
    assert(got === want && got.nonEmpty && got.size < rows.length,
      "operator must equal the greedy reference and genuinely strike")
  }

  test("maxBucket guard drops viral-cluster candidates, keeps the rest") {
    // a 40-doc near-identical "viral" cluster (shared shingles dominate
    // every band) + one small honest near-dup pair elsewhere
    val viral = (0L until 40L).map(i =>
      (i, s"breaking news template shared body text copy number $i"))
    val pair = Seq(
      (100L, "the quick brown fox jumps over the lazy dog today"),
      (101L, "the quick brown fox jumps over the lazy dog tonight"))
    val df = (viral ++ pair).toDF("id", "text")
    val uncapped = Dedup.minhashLshPairs(df, "id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.minhashLshPairs(df, "id", "text", threshold = 0.5,
        maxBucket = Some(10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((100L, 101L)) && capped.contains((100L, 101L)),
      "the honest pair survives the cap")
    assert(uncapped.exists(p => p._1 < 40L && p._2 < 40L),
      "precondition: the viral cluster produces pairs uncapped")
    assert(!capped.exists(p => p._1 < 40L && p._2 < 40L),
      "capped run skips the hot buckets")
    assert(capped.subsetOf(uncapped), "the cap only removes candidates")
  }

  test("repeated dedup calls do not accumulate cached blocks") {
    // the internal multi-consumer projections are eager localCheckpoints
    // (never bare .persist): their blocks are reclaimed by the
    // ContextCleaner once the result is unreachable, so a long session
    // running dedup in a loop must not grow executor storage unboundedly
    val sc = spark.sparkContext
    def persisted = sc.getPersistentRDDs.size
    val base = persisted
    for (_ <- 1 to 3) {
      Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.5).count()
    }
    // ContextCleaner reclamation is async and GC-driven: poll generously
    // (a loaded host can take tens of seconds to run the reference queue)
    val deadline = System.currentTimeMillis + 90000
    var cur = persisted
    while (cur > base + 1 && System.currentTimeMillis < deadline) {
      System.gc(); Thread.sleep(500); cur = persisted
    }
    assert(cur <= base + 1,
      s"persistent RDDs grew $base -> $cur across repeated dedup calls")
  }

  test("duplicateSpans: hand-computed spans, overlaps merge, " +
      "intra-doc repeats don't count") {
    val d = Seq(
      (1L, "p q r s t u"),       // shares "p q r"/"q r s" with doc 2
      (2L, "z p q r s w"),
      (3L, "m n o"),             // unique — no spans
      (4L, "k l m k l m")        // 3-gram repeats INTRA-doc only
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(d, "doc_id", "text", n = 3, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // doc 1: grams at 0 and 1 overlap -> one span [0,3];
    // doc 2: grams at 1 and 2 -> [1,4]; docs 3/4: none
    assert(spans === Set((1L, 0, 3), (2L, 1, 4)))
  }

  test("removeDuplicateSpans: covered tokens cut, survivors rejoin " +
      "in order, untouched docs pass through") {
    val d = Seq(
      (1L, "p q r s t u"),
      (2L, "z p q r s w"),
      (3L, "m  n   o")           // extra whitespace normalizes away
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(d, "doc_id", "text",
        n = 3, minDocs = 2)
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) === ((6L, 2L, "t u")))
    assert(out(2L) === ((6L, 2L, "z w")))
    assert(out(3L) === ((3L, 3L, "m n o")))
  }

  test("duplicateSpans == brute-force covered-position reference on a " +
      "collision-rich corpus (islands-of-starts ≡ runs of covered " +
      "positions)") {
    // deterministic small-vocab corpus: 12 docs x 30 tokens over 6
    // words forces many cross-doc n-gram collisions with ragged
    // overlap patterns (the cases a hand fixture misses)
    val vocab = Array("a", "b", "c", "d", "e", "f")
    def word(doc: Int, pos: Int): String = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$doc:$pos".getBytes("UTF-8"))
      vocab(math.floorMod(h(0).toInt, vocab.length))
    }
    val corpus = (0 until 12).map(d =>
      (d.toLong, (0 until 30).map(p => word(d, p)).mkString(" ")))
    val n = 3
    // brute force: position q of doc d is DUPLICATED iff some n-window
    // covering q has a gram appearing in >= 2 distinct docs; spans are
    // maximal runs of duplicated positions
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }
    val occ = for {
      (id, ts) <- toks
      p <- 0 to ts.length - n
    } yield (id, p, ts.slice(p, p + n).mkString(" "))
    val dupGrams = occ.groupBy(_._3)
      .filter(_._2.map(_._1).distinct.size >= 2).keySet
    val covered: Map[Long, Set[Int]] = toks.map { case (id, ts) =>
      id -> occ.filter(o => o._1 == id && dupGrams(o._3))
        .flatMap(o => o._2 until o._2 + n).toSet
    }.toMap
    val expect: Set[(Long, Int, Int)] = covered.flatMap { case (id, ps) =>
      ps.toSeq.sorted.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p == e + 1 => (s, p) :: rest
        case (acc, p) => (p, p) :: acc
      }.map { case (s, e) => (id, s, e) }
    }.toSet
    assert(expect.nonEmpty, "fixture must actually collide")
    val got = Dedup.duplicateSpans(corpus.toDF("doc_id", "text"),
        "doc_id", "text", n = n, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got === expect,
      s"operator spans must equal the brute-force cover:\n" +
        s"extra=${got -- expect}\nmissing=${expect -- got}")
  }

  test("duplicateSpanStats: kill rate counts each covered token once") {
    val d = Seq(
      (1L, "p q r s t u"),  // span [0,3] -> 4 dup tokens of 6
      (2L, "z p q r s w"),  // span [1,4] -> 4 dup tokens of 6
      (3L, "m n o")         // clean, 3 tokens
    ).toDF("doc_id", "text")
    val r = Dedup.duplicateSpanStats(d, "doc_id", "text",
      n = 3, minDocs = 2).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((3L, 2L, 15L, 8L)))
    assert(math.abs(r.getDouble(4) - 0.5333) < 1e-9)
  }

  test("span dedup plans: no cartesian, no unpartitioned window — " +
      "every stage is doc-partitioned or an equi-join") {
    val spans = Dedup.duplicateSpans(docs, "doc_id", "text", n = 8)
    val p1 = spans.queryExecution.executedPlan.toString
    assert(!p1.contains("CartesianProduct") &&
      !p1.contains("BroadcastNestedLoop"),
      s"span detection must stay equi-join shaped:\n${p1.take(1500)}")
    // every window is partitioned (a global window would serialize the
    // corpus through one task — the plan smell the 100 TB story dies on)
    assert(!p1.contains("Window [")
      || !p1.matches("(?s).*Window \\[[^\\]]*\\], \\[\\].*"),
      "unpartitioned window in span detection")
    val scrub = Dedup.removeDuplicateSpans(docs, "doc_id", "text", n = 8)
    val p2 = scrub.queryExecution.executedPlan.toString
    assert(!p2.contains("CartesianProduct") &&
      !p2.contains("BroadcastNestedLoop"),
      s"span removal must stay equi-join shaped:\n${p2.take(1500)}")
  }

  test("duplicateSpans: adjacent-but-disjoint gram runs stay one span " +
      "and a whole-doc duplicate covers everything") {
    // docs 10/11 identical: every position is covered -> one full span
    val d = Seq(
      (10L, "a b c d e f"),
      (11L, "a b c d e f")
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(d, "doc_id", "text", n = 3, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(spans === Set((10L, 0, 5), (11L, 0, 5)))
  }

  test("semanticDedup: within-cell duplicate meaning collapses to the " +
    "min id; singletons keep themselves") {
    import graft.functions.{VectorFunctions => VF}
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter($"embedding".isNotNull)
    val out = Dedup.semanticDedup(emb, "vec_id", "embedding",
      k = 16, tau = 0.4)
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // every non-null-vector row comes back exactly once
    assert(rows.map(_._1).toSet === emb.select("vec_id").collect()
      .map(_.getLong(0)).toSet)
    // keep ⟺ the row IS its component's min id; exactly one keeper
    // per component
    rows.foreach { case (id, comp, keep) =>
      assert(comp <= id); assert(keep === (id === comp))
    }
    val byComp = rows.groupBy(_._2)
    byComp.foreach { case (comp, members) =>
      assert(members.count(_._3) === 1)
      assert(members.map(_._1).min === comp)
    }
    // parity with brute force: recompute the same cells' pair graph
    // exactly (same frozen centroids) and check the grouping matches
    // (see also the scale test below: k∝n keeps cells bounded)
    val cells = graft.search.Ann
      .buildIvfDeterministic(emb, "embedding", "vec_id", 16)
      .corpusWithCell
      .select($"vec_id".as("id"), $"embedding".as("v"), $"__cell")
    val brute = cells.toDF("a_id", "va", "ca")
      .join(cells.toDF("b_id", "vb", "cb"), col("ca") === col("cb"))
      .filter($"a_id" < $"b_id" && VF.cosine($"va", $"vb") >= 0.4)
      .select("a_id", "b_id")
    val bruteComp = Dedup.connectedComponents(brute, "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, comp, _) =>
      assert(bruteComp.getOrElse(id, id) === comp,
        s"row $id: operator component $comp vs brute ${bruteComp.get(id)}")
    }
    assert(rows.exists(!_._3), "fixture should contain semantic dups")
  }

  test("semanticDedup scale recipe: growing k with the corpus keeps " +
    "the quadratic cell work bounded (SemDeDup's own knob)") {
    // the operator's 100-TB claim is NOT that cells stay small at
    // fixed k — it is that k scales with n (the paper uses 50k
    // clusters at LAION scale). Blow the corpus up 4x (near-dup
    // copies, the worst case for clustering: every copy wants its
    // original's cell) and check the measured per-cell width.
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter($"embedding".isNotNull)
    def maxCell(corpus: org.apache.spark.sql.DataFrame, k: Int): Long =
      graft.search.Ann
        .buildIvfDeterministic(corpus, "embedding", "vec_id", k)
        .corpusWithCell
        .groupBy("__cell").count()
        .agg(max("count")).head().getLong(0)
    val base = maxCell(emb, 16)
    val big = graft.tools.ScaleRehearsal.blowUpEmbeddings(emb, 4)
    val scaledK = maxCell(big, 64)
    val fixedK = maxCell(big, 16)
    // fixed k: the max cell grows with the corpus (the anti-pattern);
    // k∝n: the max cell stays within ~2x of the 1x width, so the
    // within-cell pair work per cell — the operator's only quadratic
    // term — is bounded by a constant the operator controls
    assert(fixedK >= base * 3,
      s"fixed k should have grown the max cell ~4x: $base -> $fixedK")
    assert(scaledK <= base * 2,
      s"k scaled with n must hold the max cell ~flat: $base -> $scaledK")
  }

  test("semanticDedup trained=true: k-means centroids debulk the giant " +
    "cell a skewed corpus gives the first-k seeds") {
    // adversarial skew for the DETERMINISTIC build: the k lowest ids —
    // exactly the frozen centroid seeds — sit in one tight blob, so
    // all 8 deterministic cells coincide and the whole corpus lands in
    // ~one cell (the re-quadratized worst case). The md5-sampled
    // trained centroids see the full corpus spread instead.
    val dim = 8
    def vec(c: Int, j: Int): Array[Float] = {
      val v = new Array[Float](dim)
      v(c * 2) = 10f + c              // cluster direction
      v(c * 2 + 1) = 0.01f * j        // small within-cluster spread
      v
    }
    val blob = { val v = new Array[Float](dim); v(7) = 50f; v }
    // ids 0..7: eight EXACT copies (the dup-heavy head of a skewed
    // corpus) — so the 8 deterministic first-k centroids coincide and
    // every assignment tie-breaks to cell 0; ids 8..167: 4 spread
    // clusters of 40
    val rows = (0 until 8).map(j => (j.toLong, blob)) ++
      (0 until 160).map(i => ((8 + i).toLong, vec(i % 4, i / 4 + 1)))
    val emb = rows.toDF("vec_id", "embedding")
    def maxCell(trained: Boolean): Long = {
      val idx =
        if (trained) graft.search.Ann.buildIvfTrained(
          emb, "embedding", "vec_id", 8, iters = 2, sampleN = 128)
        else graft.search.Ann.buildIvfDeterministic(
          emb, "embedding", "vec_id", 8)
      idx.corpusWithCell.groupBy("__cell").count()
        .agg(max("count")).head().getLong(0)
    }
    val det = maxCell(trained = false)
    val trn = maxCell(trained = true)
    assert(det === 168L,
      s"identical seeds must collapse every deterministic cell " +
        s"assignment to cell 0, got max cell $det")
    // the md5-fixed seed draw leaves one of the four clusters without
    // a seed (2 of 8 seeds land together), so the best achievable here
    // is two merged clusters + blob = 88 — still a ~2x debulk of the
    // 168-row giant cell; assert a ≥ 1/3 drop to keep the bar about
    // the mechanism, not the draw
    assert(trn * 3 <= det * 2,
      s"trained centroids must debulk the giant cell: $det -> $trn")
    // and the trained operator still honors the dedup contract on the
    // skewed corpus: one keeper per component, keeper = min id
    val out = Dedup.semanticDedup(emb, "vec_id", "embedding", k = 8,
      tau = 0.95, trained = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.map(_._1).toSet === rows.map(_._1).toSet)
    out.groupBy(_._2).foreach { case (comp, members) =>
      assert(members.count(_._3) === 1)
      assert(members.map(_._1).min === comp)
    }
  }
}
