package graft

import graft.operators.{Dedup, LangModel, TextAnalysis}
import org.apache.spark.sql.functions._

/** Semantics of the Gopher/C4-style quality operators: n-gram generation,
  * repetition fractions, PII redaction, chunk-level first-wins dedup. */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def toks(c: org.apache.spark.sql.Column) = split(trim(c), "\\s+")

  test("wordNgrams: every window position, duplicates preserved") {
    val df = Seq("a b a b a").toDF("text")
      .select(TextAnalysis.wordNgrams(toks(col("text")), 2).as("g"))
    assert(df.head().getSeq[String](0) === Seq("a b", "b a", "a b", "b a"))
  }

  test("dupTokenFraction: hand-computed") {
    val df = Seq("a a b c", "a b c d").toDF("text")
      .select(TextAnalysis.dupTokenFraction(toks(col("text"))).as("f"))
    assert(df.collect().map(_.getDouble(0)).toSeq === Seq(0.25, 0.0))
  }

  test("redactPii replaces urls then emails; counts match") {
    val s = "see http://x.io/a?b=1 or mail bob.smith+x@ex-ample.co.uk now"
    val df = Seq(s).toDF("t").select(
      TextAnalysis.redactPii(col("t")).as("clean"),
      TextAnalysis.emailCount(col("t")).as("ne"),
      TextAnalysis.urlCount(col("t")).as("nu"))
    val r = df.head()
    assert(r.getString(0) === "see <URL> or mail <EMAIL> now")
    assert(r.getInt(1) === 1 && r.getInt(2) === 1)
  }

  test("chunkFirstWins: first occurrence wins globally, later repeats drop") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8"),        // one chunk, first
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 tail"),   // chunk 0 repeats doc 1, "tail" new
      (3L, "tail")                            // repeats doc 2's chunk 1
    ).toDF("doc_id", "text")
    val out = Dedup.chunkFirstWins(docs, "doc_id", "text", chunkTokens = 8)
      .select("id", "pos", "kept").orderBy("id", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(out === Array((1L, 0, 1), (2L, 0, 0), (2L, 1, 1), (3L, 0, 0)))
  }

  test("chunkFirstWins: short tail chunk covers remaining tokens exactly") {
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val out = Dedup.chunkFirstWins(docs, "doc_id", "text", chunkTokens = 2)
      .orderBy("pos").select("chunk").as[String].collect()
    assert(out === Array("a b", "c d", "e"))
  }

  test("canonicalText: case, punctuation and whitespace collapse") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "Hello,   World!!"),
      (2L, "hello world"),
      (3L, "Héllo wörld — ok")
    ).toDF("id", "text")
    val out = df.select(col("id"),
        TextAnalysis.canonicalText(col("text")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "hello world")
    assert(out(1L) === out(2L), "case/punct variants collapse to one key")
    assert(out(3L) === "héllo wörld ok", "unicode letters survive")
  }

  test("chunkSliding: stride overlap, full coverage, short tail") {
    import graft.operators.TextAnalysis
    val df = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val out = TextAnalysis.chunkSliding(df, "doc_id", "text",
      size = 4, stride = 2).orderBy("chunk_idx").collect()
    // windows: [a..d] [c..f] [e..h] [g..j] [i j]
    assert(out.map(_.getAs[String]("chunk")).toSeq === Seq(
      "a b c d", "c d e f", "e f g h", "g h i j", "i j"))
    assert(out.map(_.getAs[Long]("n_tokens")).toSeq ===
      Seq(4L, 4L, 4L, 4L, 2L))
    // consecutive windows overlap by size - stride tokens
    out.sliding(2).foreach { case Array(a, b) =>
      val at = a.getAs[String]("chunk").split(" ")
      val bt = b.getAs[String]("chunk").split(" ")
      assert(at.takeRight(math.min(2, bt.length)).sameElements(
        bt.take(math.min(2, at.length))) || at.length < 4)
    }
  }

  test("topTfidfTerms: rare terms outrank common ones, ties by term") {
    import graft.operators.TextAnalysis
    // "zebra" appears in 1 of 3 docs; "the" in all 3 — same tf within
    // doc 1, so the rarer term must rank first
    val docs = Seq(
      (1L, "the zebra the zebra"),
      (2L, "the cat sat"),
      (3L, "the dog ran")).toDF("doc_id", "text")
    val out = TextAnalysis.topTfidfTerms(docs, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq.contains((1L, 1L, "zebra")),
      s"zebra must be doc 1's top keyword, got ${out.toSeq}")
    // doc 2: "cat" and "sat" tie on score (same tf, same df) ->
    // lexicographic term order breaks the tie
    val d2 = out.filter(_._1 == 2L).sortBy(_._2).map(_._3).toSeq
    assert(d2 === Seq("cat", "sat"), s"tie-break by term, got $d2")
  }

  test("chunkFirstWins drops null/blank docs") {
    val docs = Seq((1L, null: String), (2L, "  "), (3L, "x"))
      .toDF("doc_id", "text")
    val out = Dedup.chunkFirstWins(docs, "doc_id", "text", chunkTokens = 4)
    assert(out.select("id").as[Long].collect() === Array(3L))
  }

  test("naive Bayes: hand-computed smoothed scores, OOV prior " +
      "fallback with class-name tie-break") {
    import graft.operators.LangModel
    val train = Seq((0L, "a a b", "x"), (2L, "b b b", "y"))
      .toDF("doc_id", "text", "lang")
    val test = Seq((1L, "a a"), (3L, "b"), (5L, "z z"))
      .toDF("doc_id", "text")
    val model = LangModel.naiveBayesTrain(train, "text", "lang")
    val out = LangModel.naiveBayesScore(model, test, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getString(1),
        r.getDouble(2)))).toMap
    // vocab {a,b} V=2; x: a=2,b=1,tot=3; y: a=0,b=3,tot=3; priors ln(1/2)
    // "a a": x = ln(1/2) + 2 ln(3/5); y = ln(1/2) + 2 ln(1/5)
    assert(out(1L)._1 === "x")
    assert(math.abs(out(1L)._2 -
      (math.log(0.5) + 2 * math.log(3.0 / 5))) < 1e-12)
    // "b": x = ln(1/2) + ln(2/5); y = ln(1/2) + ln(4/5)
    assert(out(3L)._1 === "y")
    assert(math.abs(out(3L)._2 -
      (math.log(0.5) + math.log(4.0 / 5))) < 1e-12)
    // "z z" is fully out-of-vocabulary: priors tie, class name breaks
    assert(out(5L)._1 === "x")
    assert(math.abs(out(5L)._2 - math.log(0.5)) < 1e-12)
  }

  test("naive Bayes: separable classes classify held-out docs " +
      "perfectly despite shared tokens") {
    // (the parquet fixture's lang/source labels are metadata noise —
    // its text is one shared vocabulary — so learnability is asserted
    // on a deterministic separable corpus instead; the oracle query
    // gates the fixture MACHINERY, not fixture accuracy)
    import graft.operators.LangModel
    val rows = (0 until 40).map { i =>
      val lab = if (i % 2 == 0) "p" else "q"
      val own = if (lab == "p") Seq("alpha", "beta", "gamma")
        else Seq("delta", "epsilon", "zeta")
      // class-specific tokens plus a shared one, varying mixture
      val text = (Seq.fill(3 + i % 3)(own(i % 3)) :+ "common")
        .mkString(" ")
      (i.toLong, text, lab)
    }
    val d = rows.toDF("doc_id", "text", "lang")
    val model = LangModel.naiveBayesTrain(
      d.filter($"doc_id" < 20), "text", "lang")
    val scored = LangModel.naiveBayesScore(model,
        d.filter($"doc_id" >= 20), "doc_id", "text")
      .join(d.select($"doc_id", $"lang"), "doc_id")
    val (hit, n) = scored
      .agg(sum(when($"predicted" === $"lang", 1).otherwise(0)),
        count(lit(1)))
      .as[(Long, Long)].head()
    assert(n === 20L && hit === n,
      s"separable corpus must classify perfectly, got $hit/$n")
  }

  test("charTrigrams: interior 3-grams of the lowercased text; short " +
    "and null inputs yield empty") {
    val got = Seq("Hello!", "ab", "", null)
      .toDF("t").select(TextAnalysis.charTrigrams($"t").as("g"))
      .collect().map(r => Option(r.getSeq[String](0)).map(_.toSeq))
    assert(got(0) === Some(Seq("hel", "ell", "llo", "lo!")))
    assert(got(1) === Some(Seq.empty))
    assert(got(2) === Some(Seq.empty))
    assert(got(3) === Some(Seq.empty)) // null in, empty out (callers
    // filter null text upstream; an empty feature set scores on priors)
  }

  test("langId: char-trigram profiles separate languages the word " +
    "model can't (shared words, distinct character shapes)") {
    import graft.operators.LangModel
    // two 'languages' sharing whole words but differing in character
    // composition — the trigram signal
    val rows = (0 until 40).map { i =>
      val lab = if (i % 2 == 0) "aa" else "bb"
      val text = if (lab == "aa") "szczecin przez czesc " * (2 + i % 3)
        else "ouioui beaucoup eau " * (2 + i % 3)
      (i.toLong, text.trim, lab)
    }
    val d = rows.toDF("doc_id", "text", "lang")
    val model = LangModel.langIdTrain(
      d.filter($"doc_id" < 20), "text", "lang")
    val scored = LangModel.langIdScore(model,
        d.filter($"doc_id" >= 20), "doc_id", "text")
      .join(d.select($"doc_id", $"lang"), "doc_id")
    val (hit, n) = scored
      .agg(sum(when($"predicted" === $"lang", 1).otherwise(0)),
        count(lit(1)))
      .as[(Long, Long)].head()
    assert(n === 20L && hit === n,
      s"trigram-separable corpus must classify perfectly, got $hit/$n")
  }

  test("NbModel round-trips through parquet — (priors, loglik) are the " +
    "whole model — and the per-doc fold survives a pathologically long " +
    "document (the doc-length precondition's worst case)") {
    import graft.operators.LangModel
    val rows = (0 until 20).map { i =>
      val lab = if (i % 2 == 0) "aa" else "bb"
      val text = if (lab == "aa") "szczecin przez czesc " * (2 + i % 3)
        else "ouioui beaucoup eau " * (2 + i % 3)
      (i.toLong, text.trim, lab)
    }
    val d = rows.toDF("doc_id", "text", "lang")
    val trained = LangModel.langIdTrain(d, "text", "lang")
    val root = java.nio.file.Files
      .createTempDirectory("nb_model").toString
    trained.priors.write.mode("overwrite").parquet(s"$root/priors")
    trained.loglik.write.mode("overwrite").parquet(s"$root/loglik")
    // reload: the two parquet tables reconstruct the model with no
    // side state (the class list re-derives from priors at score time)
    val reloaded = LangModel.NbModel(
      spark.read.parquet(s"$root/priors"),
      spark.read.parquet(s"$root/loglik"))
    // a ~60k-char document: far past any quality gate, the fold's
    // collect_list buffer is bounded by DISTINCT in-vocab trigrams,
    // so even this scores fine — the scaladoc's documented trade
    val long = ("szczecin przez czesc " * 3000).trim
    val test = Seq((100L, long), (101L, "ouioui beaucoup eau"))
      .toDF("doc_id", "text")
    def preds(m: LangModel.NbModel) =
      LangModel.langIdScore(m, test, "doc_id", "text")
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getDouble(2)))).toMap
    val a = preds(trained)
    val b = preds(reloaded)
    assert(a(100L)._1 === "aa" && a(101L)._1 === "bb")
    assert(a === b,
      s"reloaded model must score bit-identically: $a vs $b")
  }

  test("bpeTrain: hand-computed merges on the classic low/lower/lowest " +
    "corpus; apply is the greedy replace chain") {
    val corpus = Seq("low low low lower lowest").toDF("text")
    val (merges, vocab) = TextAnalysis.bpeTrain(corpus, "text", 2)
    // round 1: pairs lo:5 ow:5 we:2 er:1 es:1 st:1 — tie (lo, ow)
    // breaks lexicographically to "lo" -> U+E001
    // round 2: w:5 we:2 ... -> "w" -> U+E002
    assert(merges === Seq((1, "lo", 5L), (2, "w", 5L)))
    val words = vocab.collect().map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(words === Map("" -> 3L, "er" -> 1L,
      "est" -> 1L))
    val applied = Seq("low lower slow").toDF("t")
      .select(TextAnalysis.bpeApply(col("t"), merges).as("e"))
      .head().getString(0)
    assert(applied === " er s",
      "application must be the same greedy left-to-right replace chain")
  }

  test("bpeTrain: the driver-local incremental loop produces exactly " +
    "the distributed per-round loop's merges") {
    val corpus = graft.core.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
      .filter($"lang" === "en")
    val (local, _) = TextAnalysis.bpeTrain(corpus, "text", nMerges = 6)
    val (dist, _) = TextAnalysis.bpeTrainPerRound(corpus, "text",
      nMerges = 6)
    assert(local === dist,
      "incremental pair maintenance + lazy heap must replay the " +
        "recount-per-round argmax exactly (counts, ties and all)")
    // and at a merge count the per-round loop could never reach: the
    // trained ranks stay strictly consistent (every merge's recorded
    // count is positive and the pair exists when merged)
    val (deep, _) = TextAnalysis.bpeTrain(corpus, "text", nMerges = 500)
    assert(deep.size <= 500 && deep.map(_._1) === (1 to deep.size))
    assert(deep.forall(_._3 > 0L))
    // PUA budget guard
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeTrain(corpus, "text", nMerges = 0x1900)
    }
  }

  test("bpeApplyFast: the single-expression encoder is byte-identical " +
    "to the replace chain") {
    val corpus = graft.core.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
      .filter($"lang" === "en")
    val (merges, _) = TextAnalysis.bpeTrain(corpus, "text", nMerges = 6)
    // whole-corpus identity at the oracle's merge depth
    val diff = graft.core.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
      .filter($"text".isNotNull && trim($"text") =!= "")
      .select(TextAnalysis.bpeApply($"text", merges).as("chain"),
        TextAnalysis.bpeApplyFast($"text", merges).as("fast"))
      .filter($"chain" =!= $"fast").count()
    assert(diff === 0L, "fast encode must equal the replace chain on " +
      "every corpus row")
    // adversarial overlap/recreation cases, hand-checked: greedy
    // left-to-right on "aaa"; a merge symbol feeding a later merge
    val m = Seq((1, "aa", 9L), (2, "a", 5L))
    val tricky = Seq("aaa", "aaaa", "aaaaa", "baaab", "ab", "")
      .toDF("t")
      .select($"t", TextAnalysis.bpeApply($"t", m).as("chain"),
        TextAnalysis.bpeApplyFast($"t", m).as("fast"))
      .collect()
    tricky.foreach { r =>
      assert(r.getString(1) === r.getString(2),
        s"mismatch on '${r.getString(0)}'")
    }
    // deep merge table: one expression node, applies without a
    // 1000-deep plan (the replace chain would be unplannable here)
    val (deep, _) = TextAnalysis.bpeTrain(corpus, "text", nMerges = 500)
    val enc = corpus
      .select(length(TextAnalysis.bpeApplyFast($"text", deep)).as("n"),
        length(trim($"text")).as("raw"))
      .agg(sum($"n"), sum($"raw")).head()
    assert(enc.getLong(0) < enc.getLong(1),
      "deep merges must compress the corpus it was trained on")
  }

  test("gopherRules: each rule kills the doc built to violate it; a " +
    "clean doc keeps") {
    val clean = (Seq.fill(25)("the quick brown fox") :+ "ends here")
      .mkString(" ")                       // 101 words, stopwords, alpha
    val short = "the of tiny doc"          // fails word-count band
    val symbols = (Seq.fill(30)("### the of") :+ "x").mkString(" ")
    val numeric = (Seq.fill(60)("12345 the of") :+ "x").mkString(" ")
    val noStops = Seq.fill(60)("alpha beta").mkString(" ")
    val df = Seq((1L, clean), (2L, short), (3L, symbols), (4L, numeric),
      (5L, noStops)).toDF("id", "text")
      .withColumn("g", TextAnalysis.gopherRules($"text"))
      .select($"id", $"g.wc_ok", $"g.sym_ok", $"g.alpha_ok",
        $"g.stop_ok", $"g.keep")
    val m = df.collect().map(r => r.getLong(0) ->
      (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4), r.getBoolean(5))).toMap
    assert(m(1L) === ((true, true, true, true, true)))
    assert(!m(2L)._1 && !m(2L)._5, "short doc fails the word-count band")
    assert(!m(3L)._2 && !m(3L)._5, "symbol-heavy doc fails sym ratio")
    assert(!m(4L)._3 && !m(4L)._5, "numeric doc fails the alpha ratio")
    assert(!m(5L)._4 && !m(5L)._5, "stopword-free doc fails stop rule")
  }

  test("pplBuckets: thirds are ordered, roughly balanced, and " +
      "partitioning-independent") {
    val scored = LangModel.bigramCrossEntropy(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text")
    val b = LangModel.pplBuckets(scored, "id", "xent", 0.8).cache()
    val ranges = b.groupBy("bucket")
      .agg(min("xent").as("lo"), max("xent").as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    assert(ranges.keySet === Set("head", "middle", "tail"))
    assert(ranges("head")._2 <= ranges("middle")._1,
      "head overlaps middle")
    assert(ranges("middle")._2 <= ranges("tail")._1,
      "middle overlaps tail")
    val n = b.count().toDouble
    Seq("head", "middle", "tail").foreach { k =>
      assert(ranges(k)._3 / n > 0.15 && ranges(k)._3 / n < 0.55,
        s"bucket $k holds ${ranges(k)._3} of $n")
    }
    val again = LangModel
      .pplBuckets(scored.repartition(17), "id", "xent", 0.8)
      .select("id", "bucket").as[(Long, String)].collect().toSet
    assert(again === b.select("id", "bucket")
      .as[(Long, String)].collect().toSet)
    b.unpersist()
  }

  test("UnigramSeg.viterbi == brute-force composition enumeration " +
    "(min pieces, min rank sum, parts-lexicographically-largest)") {
    import graft.functions.UnigramSeg
    // rank map over a collision-rich 3-letter alphabet
    val pieces = Seq("a", "b", "c", "ab", "ba", "bc", "ca", "abc",
      "bab", "abca", "bcab")
    val ranks = pieces.zipWithIndex.map { case (p, i) => p -> (i + 1) }
      .toMap
    val unk = ranks.size + 1
    def compositions(n: Int, maxPart: Int): Seq[Seq[Int]] =
      if (n == 0) Seq(Seq.empty)
      else (1 to math.min(maxPart, n)).flatMap(j =>
        compositions(n - j, maxPart).map(j +: _))
    def brute(w: String): Seq[String] = {
      val cands = compositions(w.length, 4).flatMap { parts =>
        val ps = parts.scanLeft(0)(_ + _).zip(parts)
          .map { case (off, j) => w.substring(off, off + j) }
        val rs = ps.map(p => ranks.getOrElse(p,
          if (p.length == 1) unk else -1))
        if (rs.contains(-1)) None
        else Some((ps.length, rs.map(_.toLong).sum, parts, ps))
      }
      // min (k, rsum); ties -> parts sequence lexicographically LARGEST
      implicit val ord: Ordering[Seq[Int]] =
        Ordering.Implicits.seqOrdering[Seq, Int]
      val best = cands.minBy { case (k, r, parts, _) =>
        (k, r, parts.map(-_))
      }
      best._4
    }
    val words = for {
      len <- 1 to 9
      seed <- 0 until 12
    } yield (0 until len).map(i =>
      "abc".charAt(math.abs((seed * 31 + i * 17) % 3))).mkString
    words.distinct.foreach { w =>
      assert(UnigramSeg.viterbi(w, ranks, unk, 4) === brute(w),
        s"word '$w' segments differently")
    }
  }

  test("unigramTrain: frequent substrings become pieces, chars never " +
    "prune, encode segments with the trained vocab") {
    val corpus = Seq.fill(6)("banana band").mkString(" ") + " ban x"
    val d = Seq(corpus).toDF("text")
    val vocab = TextAnalysis.unigramTrain(d, "text", vocabSize = 8,
      seedSize = 20, maxPieceLen = 4, rounds = 2)
    val byPiece = vocab.map(v => v._1 -> v).toMap
    // 'ban' mass: banana(6) + band(6) + ban(1) = 13 usages if chosen
    assert(byPiece.contains("ban") || byPiece.contains("bana"),
      s"a frequent multi-char piece must survive: $vocab")
    for (ch <- "bandx")
      assert(byPiece.contains(ch.toString),
        s"single char '$ch' must never prune: ${vocab.map(_._1)}")
    // ranks are 1..n in (score DESC, piece ASC) order
    assert(vocab.map(_._3) === (1 to vocab.size))
    assert(vocab.sortBy(v => (-v._2, v._1)).map(_._3) === vocab.map(_._3))
    val enc = Seq("banana", "qq").toDF("w")
      .select(TextAnalysis.unigramApply(col("w"), vocab).as("p"))
      .collect().map(_.getSeq[String](0))
    assert(enc(0).mkString("") === "banana", "pieces rejoin to the word")
    assert(enc(0).length < 6, s"trained pieces compress 'banana': ${enc(0)}")
    assert(enc(1).mkString("") === "qq" && enc(1) === Seq("q", "q"),
      "OOV chars segment singly at the unk rank")
  }
}
