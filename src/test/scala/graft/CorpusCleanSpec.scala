package graft

import graft.operators.{Dedup, LangModel, TextAnalysis}
import org.apache.spark.sql.functions._

/** Semantics of the round-11 corpus-cleanup additions: C4 line/document
  * cleaning, frequent-line boilerplate removal, and the fixed-point
  * linear quality classifier (distributed training proven equal to a
  * driver-local integer reference loop).
  */
class CorpusCleanSpec extends SparkSpec {
  import spark.implicits._

  // ---- C4 cleanup ----

  private def clean(texts: String*) =
    texts.toDF("text")
      .select(TextAnalysis.c4Clean(col("text")).as("c"))
      .select("c.text", "c.n_lines", "c.n_kept", "c.n_sentences",
        "c.sent_ok", "c.lorem_ok", "c.brace_ok", "c.keep")
      .collect()

  test("c4Clean line rules: terminal punctuation, min words, javascript") {
    val doc = Seq(
      "this line has plenty of words and ends well.",  // kept
      "no terminal punctuation on this long line",      // dropped: punct
      "too short.",                                     // dropped: < 5 words
      "please enable javascript to continue reading.",  // dropped: js
      "a second proper sentence closes the document!"   // kept
    ).mkString("\n")
    val r = clean(doc).head
    assert(r.getString(0) ===
      "this line has plenty of words and ends well.\n" +
        "a second proper sentence closes the document!")
    assert(r.getLong(1) === 5L && r.getLong(2) === 2L)
  }

  test("c4Clean doc gates: sentences, lorem ipsum, braces") {
    val good = Seq.fill(3)("a full sentence with enough words here.")
      .mkString("\n")
    val short = "a full sentence with enough words here."
    val lorem = good + "\nsome Lorem Ipsum filler appeared in this doc."
    val brace = good + "\nvar f = function() { return 1; }"
    val Array(g, s0, l, b) = clean(good, short, lorem, brace)
    assert(g.getBoolean(7), "3 sentences, clean -> keep")
    assert(!s0.getBoolean(4) && !s0.getBoolean(7), "1 sentence -> drop")
    assert(!l.getBoolean(5) && !l.getBoolean(7), "lorem ipsum -> drop")
    assert(!b.getBoolean(6) && !b.getBoolean(7), "brace -> drop")
    // the lorem line itself passes the LINE rules (proper sentence) —
    // the doc still drops because the gates fire on the RAW text (the
    // paper's page-level rules); the brace line fails line rules too
    assert(l.getLong(3) === 4L && b.getLong(3) === 3L)
  }

  test("c4Clean: single-line doc and all-dropped doc") {
    val Array(one, none) = clean(
      "one single line that ends with terminal punctuation.",
      "nothing here survives")
    assert(one.getLong(1) === 1L && one.getLong(2) === 1L)
    assert(none.getString(0) === "" && none.getLong(2) === 0L)
    assert(!none.getBoolean(4) && !none.getBoolean(7))
  }

  // ---- frequent-line boilerplate removal ----

  test("frequentLineDedup strikes hot lines everywhere, keeps order") {
    val boiler = "subscribe to our newsletter"
    val docs = Seq(
      (1L, s"alpha\n$boiler\nbeta"),
      (2L, s"$boiler\ngamma"),
      (3L, s"delta\nepsilon\n$boiler"),
      (4L, "zeta\neta")
    ).toDF("doc_id", "text")
    val out = Dedup.frequentLineDedup(docs, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(out === Array(
      (1L, 3L, 1L, "alpha\nbeta"),
      (2L, 2L, 1L, "gamma"),
      (3L, 3L, 1L, "delta\nepsilon"),
      (4L, 2L, 0L, "zeta\neta")))
  }

  test("frequentLineDedup counts DISTINCT docs, not occurrences") {
    val docs = Seq(
      (1L, "refrain\nrefrain\nrefrain\nrefrain"), // one doc repeating
      (2L, "other\nlines")
    ).toDF("doc_id", "text")
    val out = Dedup.frequentLineDedup(docs, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id").collect()
    assert(out(0).getLong(2) === 0L, "4 copies in ONE doc are not hot")
    assert(out(0).getString(3) === "refrain\nrefrain\nrefrain\nrefrain")
  }

  test("frequentLineDedup: fully-boilerplate doc keeps an empty row") {
    val docs = Seq(
      (1L, "cookie banner"), (2L, "cookie banner"),
      (3L, "cookie banner"), (4L, "real content")
    ).toDF("doc_id", "text")
    val out = Dedup.frequentLineDedup(docs, "doc_id", "text", minDocs = 2)
      .orderBy("doc_id").collect()
    assert(out.length === 4)
    assert(out(0).getString(3) === "" && out(0).getLong(2) === 1L)
    assert(out(3).getString(3) === "real content")
    // normalization: case/whitespace variants of a hot line are hot too
    val variants = Seq((1L, "Cookie Banner "), (2L, "cookie banner"))
      .toDF("doc_id", "text")
    val v = Dedup.frequentLineDedup(variants, "doc_id", "text", minDocs = 2)
      .orderBy("doc_id").collect()
    assert(v.forall(_.getLong(2) === 1L))
  }

  // ---- unicode normalization kernels ----

  test("nfc/stripAccents kernels match java.text.Normalizer; ASCII " +
    "takes the zero-copy fast path; codegen and SQL surfaces work") {
    import graft.functions.UnicodeNorm
    import org.apache.spark.unsafe.types.UTF8String
    val cases = Seq("e\u0301clair", "caf\u00e9", "u\u0308ber",
      "stra\u00dfe", "A\u030arhus", "\u0141\u00f3d\u017a", "plain")
    cases.foreach { s =>
      val u = UTF8String.fromString(s)
      assert(UnicodeNorm.nfc(u).toString ===
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
      val nfd = java.text.Normalizer.normalize(s,
        java.text.Normalizer.Form.NFD)
      assert(UnicodeNorm.stripAccents(u).toString ===
        nfd.replaceAll("\\p{M}+", ""))
    }
    // ASCII fast path returns the INPUT buffer, not a copy
    val ascii = UTF8String.fromString("just ascii text")
    assert(UnicodeNorm.nfc(ascii) eq ascii)
    assert(UnicodeNorm.stripAccents(ascii) eq ascii)
    // codegen: over a real scan (a local Seq constant-folds away) the
    // projection stays inside whole-stage codegen — a fallback
    // expression would break the *(n) span
    spark.sharedState.cacheManager.clearCache()
    val df = spark.read.parquet(s"$sf/documents.parquet").select(
      graft.functions.TextExpressions.nfcNormalize(col("text")).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("nfc_normalize"), plan)
    assert(plan.contains("*(1)"),
      s"expression must not break whole-stage codegen:\n$plan")
    val viaCodegen = Seq("e\u0301clair").toDF("t")
      .repartition(1) // defeat local-relation folding, keep execution
      .select(graft.functions.TextExpressions.nfcNormalize(col("t")))
      .head().getString(0)
    assert(viaCodegen === "\u00e9clair",
      "decomposed input must come back precomposed")
    // SQL registration
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT nfc_normalize('é'), strip_accents('café')")
      .head()
    assert(r.getString(0) === "é" && r.getString(1) === "cafe")
  }

  test("deflateRatio separates templated spam from varied prose; " +
    "matches a direct java.util.zip reference") {
    import graft.functions.TextExpressions
    val spam = ("buy now click here " * 50).trim
    val prose = "the quick brown fox jumps over a lazy dog while " +
      "seventeen amused owls watched quietly from birch branches nearby"
    val rows = Seq(spam, prose, "").toDF("t")
      .select(TextExpressions.deflateRatio(col("t")).as("r"))
      .collect().map(_.getDouble(0))
    assert(rows(0) < 0.2, s"templated spam must deflate hard: ${rows(0)}")
    assert(rows(1) > rows(0) * 2, "varied prose compresses far less")
    assert(rows(2) === 1.0, "empty text scores 1.0 by contract")
    // reference: the same deflate config via java.util.zip directly
    def ref(s: String): Double = {
      val d = new java.util.zip.Deflater(6, true)
      val raw = s.getBytes("UTF-8")
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length * 2 + 64)
      var n = 0
      while (!d.finished()) n += d.deflate(buf)
      d.end()
      n.toDouble / raw.length
    }
    assert(rows(0) === ref(spam) && rows(1) === ref(prose))
    // SQL surface
    GraftExtensions.register(spark)
    assert(spark.sql(s"SELECT deflate_ratio('$prose')")
      .head().getDouble(0) === ref(prose))
  }

  test("pipeline unicode stage normalizes text before dedup; disabled " +
    "passes the same frame") {
    val docs = Seq(
      (1L, "caf\u00e9 menu"),      // precomposed
      (2L, "cafe\u0301 menu") // decomposed — same word after NFC
    ).toDF("doc_id", "text")
    val p = new CorpusPipeline(normalizeUnicode = true)
    val texts = p.unicodeStage(docs, "text")
      .select("text").as[String].collect().toSet
    assert(texts === Set("caf\u00e9 menu"),
      "both spellings must collapse to the precomposed form")
    // and exact dedup then sees them as byte-identical
    val deduped = p.exactDedup(p.unicodeStage(docs, "text"),
      "doc_id", "text")
    assert(deduped.count() === 1L)
    assert(new CorpusPipeline().unicodeStage(docs, "text") eq docs)
  }

  // ---- scale rehearsal: the cleaning front at 4x ----

  test("line dedup at 4x: the FRACTIONAL threshold makes the same " +
    "strike decision; the absolute one silently drifts") {
    // 1x: boilerplate in 6 of 10 docs; content lines unique per doc.
    // 4x: four deterministic copies — boilerplate IDENTICAL (that is
    // what boilerplate is), content suffixed per copy (fresh text).
    def corpus(copies: Int) = (0 until copies).flatMap { c =>
      (0 until 10).map { i =>
        val content = s"unique content line number $i copy $c"
        val text = if (i < 6) s"cookie banner\n$content" else content
        ((c * 1000 + i).toLong, text)
      }
    }.toDF("doc_id", "text")
    def struck(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum("n_removed")).head().getLong(0)
    // fraction 0.5: boilerplate (60% of docs) is hot at BOTH scales
    assert(struck(Dedup.frequentLineDedupFrac(corpus(1), "doc_id",
      "text", 0.5)) === 6L)
    assert(struck(Dedup.frequentLineDedupFrac(corpus(4), "doc_id",
      "text", 0.5)) === 24L)
    // absolute 10: misses at 1x (6 < 10), fires at 4x (24 >= 10) —
    // the scale drift the fractional form exists to prevent
    assert(struck(Dedup.frequentLineDedup(corpus(1), "doc_id",
      "text", 10)) === 0L)
    assert(struck(Dedup.frequentLineDedup(corpus(4), "doc_id",
      "text", 10)) === 24L)
  }

  test("linear training is exactly linear in the data: a 4x-replicated " +
    "corpus with a 4x step divisor trains bit-identically") {
    // every per-doc quantity is integer-exact, so replicating the
    // corpus scales each gradient component by exactly 4 and
    // trunc(4g / 4s) == trunc(g / s) — no float drift, no order
    // sensitivity. This is the property that makes the distributed
    // aggregation trustworthy at any partitioning or scale.
    val base = (0 until 24).map { i =>
      (i.toLong, i % 3 == 0,
        s"doc body words ${if (i % 3 == 0) "junk junk junk" else "fine"} $i")
    }
    val one = base.toDF("id", "y", "text")
    val four = (0 until 4).flatMap(c =>
      base.map { case (id, y, t) => (c * 1000 + id, y, t) })
      .toDF("id", "y", "text")
    val m1 = LangModel.linearTrain(one, "text", col("y"),
      dim = 16, iters = 6, stepDiv = 10000L)
    val m4 = LangModel.linearTrain(four, "text", col("y"),
      dim = 16, iters = 6, stepDiv = 40000L)
    assert(m1.wMicro.toSeq === m4.wMicro.toSeq)
  }

  // ---- fixed-point linear classifier ----

  test("linearTrain separates a separable corpus; scores clamp") {
    val docs = (0 until 60).map { i =>
      val spam = i % 3 == 0
      val base = s"common words shared by all documents number $i"
      (i.toLong, spam,
        if (spam) s"$base spamtok spamtok spamtok spamtok spamtok" else base)
    }.toDF("id", "y", "text")
    val m = LangModel.linearTrain(docs, "text", col("y"),
      dim = 64, iters = 16)
    val scored = LangModel.linearScore(m, docs, "id", "text",
      carryCols = Seq("y")).collect()
    assert(scored.forall(r => r.getLong(2) >= 0L && r.getLong(2) <= 1000000L))
    val acc = scored.count(r =>
      (r.getLong(3) === 1L) === r.getBoolean(1)).toDouble / scored.length
    assert(acc === 1.0, s"separable corpus must classify perfectly, got $acc")
  }

  test("distributed training == driver-local integer reference loop") {
    // same corpus the oracle uses: sf docs + spam marker on id % 3 == 0
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("text").isNotNull && trim(col("text")) =!= "")
      .select(col("doc_id"),
        (pmod(col("doc_id"), lit(3)) === 0).cast("long").as("y"),
        concat(col("text"), when(pmod(col("doc_id"), lit(3)) === 0,
          lit(" click buy click buy click")).otherwise(lit(""))).as("text"))
    val (dim, iters, bias, slope, step) = (32, 8, 250L, 1000L, 10000L)
    val m = LangModel.linearTrain(d, "text", col("y"), dim = dim,
      iters = iters, bias = bias, slopeDiv = slope, stepDiv = step)
    // reference: collect the featurized rows once, loop locally with
    // the same integer semantics (Long ops truncate toward zero)
    val rows = d.select(col("y"),
        LangModel.linearFeatures(col("text"), dim, bias).as("x"))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    def tdiv(a: Long, b: Long): Long = a / b
    var w = Array.fill(dim + 1)(0L)
    for (_ <- 1 to iters) {
      val g = Array.fill(dim + 1)(0L)
      rows.foreach { case (y, x) =>
        var z = 0L
        var j = 0
        while (j <= dim) { z += w(j) * x(j); j += 1 }
        val p = math.min(math.max(500000L + tdiv(z, slope), 0L), 1000000L)
        val e = p - y * 1000000L
        j = 0
        while (j <= dim) { g(j) += e * x(j); j += 1 }
      }
      w = Array.tabulate(dim + 1)(j => w(j) - tdiv(g(j), step))
    }
    assert(m.wMicro.toSeq === w.toSeq,
      "distributed GD must be bit-identical to the local loop")
    assert(w.exists(_ != 0L), "training must actually move the weights")
  }

  test("linear model persists as parquet and reopens bit-identically") {
    val docs = (0 until 30).map { i =>
      (i.toLong, i % 2 == 0,
        s"some words here ${if (i % 2 == 0) "marker marker marker" else ""}")
    }.toDF("id", "y", "text")
    val m = LangModel.linearTrain(docs, "text", col("y"),
      dim = 16, iters = 4)
    val path = java.nio.file.Files
      .createTempDirectory("graft_linmodel").toString + "/m"
    LangModel.saveLinearModel(spark, m, path)
    val m2 = LangModel.loadLinearModel(spark, path)
    assert(m2.wMicro.toSeq === m.wMicro.toSeq)
    assert(m2.dim === m.dim && m2.bias === m.bias &&
      m2.slopeDiv === m.slopeDiv && m2.stepDiv === m.stepDiv)
    // and the reopened model scores identically
    val a = LangModel.linearScore(m, docs, "id", "text")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = LangModel.linearScore(m2, docs, "id", "text")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq === b.toSeq)
  }
}
