package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet").cache()

  test("rate 0 keeps nothing, rate 1 keeps everything") {
    assert(Sampling.deterministicSample(docs, "doc_id", 0.0).count() === 0L)
    assert(Sampling.deterministicSample(docs, "doc_id", 1.0).count()
      === docs.count())
  }

  test("deterministic: identical id set across runs and repartitionings") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().toSet
    val a = ids(Sampling.deterministicSample(docs, "doc_id", 0.3))
    val b = ids(Sampling.deterministicSample(
      docs.repartition(17), "doc_id", 0.3))
    assert(a === b && a.nonEmpty)
  }

  test("kept fraction tracks the rate") {
    val n = docs.count().toDouble
    val kept = Sampling.deterministicSample(docs, "doc_id", 0.5).count()
    assert(math.abs(kept / n - 0.5) < 0.15,
      s"kept ${kept / n} at rate 0.5")
  }

  test("stratified rates apply per stratum, default elsewhere") {
    val out = Sampling.stratifiedSample(docs, "doc_id", "source",
      Map("src0" -> 1.0, "src1" -> 0.0), default = 0.5)
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val all = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") === all("src0"), "rate-1.0 stratum keeps all")
    assert(!bySrc.contains("src1"), "rate-0.0 stratum keeps none")
  }

  test("temperatureMix flattens toward small sources and meets the budget") {
    // A: 900 rows, B: 100. alpha=0.5 → K = 0.5·1000/(30+10) = 12.5,
    // r_A = 12.5/30 ≈ 0.4167, r_B = 12.5/10 = 1.25 → clamped to 1
    val df = ((0 until 900).map(i => (i.toLong, "A")) ++
      (900 until 1000).map(i => (i.toLong, "B"))).toDF("id", "src")
    val out = Sampling.temperatureMix(df, "id", "src", alpha = 0.5,
      budget = 0.5)
    val by = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(by("B") === 100L, "clamped-rate source keeps everything")
    assert(math.abs(by("A") / 900.0 - 0.4167) < 0.1,
      s"large source kept ${by("A") / 900.0}, want ≈0.4167")
    assert(by("B") / 100.0 > by("A") / 900.0, "alpha<1 favors small source")
  }

  test("groupSplit: every group lands wholly in one split") {
    val out = Sampling.groupSplit(docs, "source", trainFrac = 0.6)
    val mixed = out.groupBy("source")
      .agg(countDistinct("split").as("k")).filter(col("k") > 1)
    assert(mixed.count() === 0L, "no source straddles the split")
    val splits = out.select("split").distinct().as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "holdout")) && splits.nonEmpty)
    // deterministic: repartitioning changes nothing
    val a = out.select("doc_id", "split").collect().map(_.toSeq).toSet
    val b = Sampling.groupSplit(docs.repartition(9), "source", 0.6)
      .select("doc_id", "split").collect().map(_.toSeq).toSet
    assert(a === b)
  }

  // The naive single-window form of token-budget selection — the spec's
  // ground truth for the two-phase bucketed implementation.
  private def naiveTokenBudget(df: org.apache.spark.sql.DataFrame,
      idCol: String, strataCol: String, tokensCol: String,
      budgets: Map[String, Long], default: Long) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(strataCol)
      .orderBy(Sampling.hashFraction(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val budgetCol = coalesce(
      element_at(typedlit(budgets), col(strataCol).cast("string")),
      lit(default))
    df.withColumn("__cb", coalesce(sum(col(tokensCol).cast("long")).over(w),
        lit(0L)))
      .filter(col("__cb") < budgetCol)
      .drop("__cb")
  }

  test("tokenBudget: two-phase bucketed form equals the naive window") {
    val d = docs.filter(col("text").isNotNull && trim(col("text")) =!= "")
      .withColumn("n_tokens", size(split(trim(col("text")), "\\s+"))
        .cast("long"))
    val budgets = Map("src0" -> 800L, "src1" -> 500L)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().toSet
    val fast = Sampling.tokenBudget(d, "doc_id", "source", "n_tokens",
      budgets, default = 600L)
    val slow = naiveTokenBudget(d, "doc_id", "source", "n_tokens",
      budgets, default = 600L)
    assert(ids(fast) === ids(slow) && ids(fast).nonEmpty)
    // few buckets → many boundary collisions: still exact
    val coarse = Sampling.tokenBudget(d, "doc_id", "source", "n_tokens",
      budgets, default = 600L, buckets = 4)
    assert(ids(coarse) === ids(slow))
  }

  test("tokenBudgetBy: quality-first selection equals the naive " +
      "priority window") {
    import org.apache.spark.sql.expressions.Window
    val q = graft.operators.TextAnalysis.qualityScore(col("text"))
    val d = docs.filter(col("text").isNotNull && trim(col("text")) =!= "")
      .withColumn("n_tokens", size(split(trim(col("text")), "\\s+"))
        .cast("long"))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().toSet
    val fast = Sampling.tokenBudgetBy(d, "doc_id", "source", "n_tokens",
      q, Map("src0" -> 800L), default = 600L, buckets = 16)
    val w = Window.partitionBy("source").orderBy(q.desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val slow = d
      .withColumn("__cb", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("__cb") < when(col("source") === "src0", 800L)
        .otherwise(600L))
    assert(ids(fast) === ids(slow) && ids(fast).nonEmpty)
    // kept docs are at least as good as dropped docs within a stratum
    val kept = fast.groupBy("source").agg(min(q).as("worst_kept"))
    val dropped = d.join(fast.select("doc_id"), Seq("doc_id"), "left_anti")
      .groupBy("source").agg(max(q).as("best_dropped"))
    // a prefix in (q desc, id) order: every kept doc's quality is >=
    // every dropped doc's within its stratum (ties allowed)
    val cmp = kept.join(dropped, "source").collect()
    assert(cmp.nonEmpty && cmp.forall(r =>
      r.getAs[Double]("worst_kept")
        >= r.getAs[Double]("best_dropped") - 1e-9))
  }

  test("tokenBudget edge cases: zero-token rows, exact-budget boundary") {
    // tokens 5 each, budget 10: rows kept while cum_before < 10 → the
    // first 2 in hash order; a zero-token row exactly AT the budget
    // line has cum_before == budget and must be dropped.
    val d = (0L until 40L).map(i => (i, "s", if (i % 7 == 0) 0L else 5L))
      .toDF("id", "src", "tok")
    val budgets = Map("s" -> 10L)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").as[Long].collect().toSet
    val fast = Sampling.tokenBudget(d, "id", "src", "tok", budgets,
      buckets = 8)
    val slow = naiveTokenBudget(d, "id", "src", "tok", budgets, 0L)
    assert(ids(fast) === ids(slow))
    // unlisted stratum with default 0 keeps nothing
    val none = Sampling.tokenBudget(d.withColumn("src", lit("other")),
      "id", "src", "tok", budgets)
    assert(none.count() === 0L)
  }

  test("temperatureMix alpha=1 is uniform thinning at the budget rate") {
    val out = Sampling.temperatureMix(docs, "doc_id", "source",
      alpha = 1.0, budget = 0.5)
    // every source's rate is exactly `budget`, so the kept set must
    // equal the plain deterministic sample
    val a = out.select("doc_id").as[Long].collect().toSet
    val b = Sampling.deterministicSample(docs, "doc_id", 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b)
  }

  test("dsir: target-like docs outscore off-target docs; selection is " +
    "the weight-ordered prefix") {
    // target favors token 'alpha'; doc 1 is pure target language,
    // doc 2 shares nothing with the target
    val raw = Seq((1L, "alpha alpha beta"), (2L, "gamma gamma delta"))
      .toDF("doc_id", "text")
    val target = Seq((10L, "alpha alpha alpha beta")).toDF("doc_id", "text")
    val w = Sampling.dsirLogWeights(raw, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(1L) > w(2L),
      s"doc 1 matches the target distribution and must outscore: $w")

    // selection = top-k of the full weight ranking, ties by id
    val all = Sampling.dsirLogWeights(docs, docs.filter($"lang" === "en"),
      "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, lw) => (-lw, id) }
    val sel = Sampling.dsirSelect(docs, docs.filter($"lang" === "en"),
      "doc_id", "text", k = 50)
      .select("doc_id").as[Long].collect().toSet
    assert(sel === all.take(50).map(_._1).toSet)

    // the point of DSIR: English docs are overrepresented in the
    // selection relative to their share of the corpus
    val langOf = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val selEn = sel.count(langOf(_) == "en").toDouble / sel.size
    val allEn = langOf.values.count(_ == "en").toDouble / langOf.size
    assert(selEn > allEn,
      s"selection en-share $selEn must exceed corpus share $allEn")
  }

  test("weightedSample: zero/negative/null weights never qualify; " +
      "k >= survivors keeps them all") {
    val df = Seq((1L, Some(5L)), (2L, Some(0L)), (3L, Some(3L)),
      (4L, Some(-1L)), (5L, None)).toDF("id", "w")
    val out = Sampling.weightedSample(df, "id", "w", 10)
      .select("id").as[Long].collect().toSet
    assert(out === Set(1L, 3L))
  }

  test("weightedSample equals the driver-local A-Res replay and is " +
      "partitioning-independent; heavy rows dominate") {
    val d = docs.filter($"text".isNotNull && trim($"text") =!= "")
      .withColumn("w", size(split(trim($"text"), "\\s+")).cast("long"))
    def md5Frac(s: String): Double = {
      val h = org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
      java.lang.Long.parseLong(h.substring(0, 8), 16) / 4294967296.0
    }
    val local = d.select("doc_id", "w").as[(Long, Long)].collect()
      .filter(_._2 > 0)
      .map { case (id, w) =>
        (id, math.pow(md5Frac(id.toString), 1.0 / w)) }
      .sortBy { case (id, k) => (-k, id) }
      .take(60).map(_._1).toSet
    val sel = Sampling.weightedSample(d, "doc_id", "w", 60)
      .select("doc_id").as[Long].collect().toSet
    assert(sel === local)
    val again = Sampling.weightedSample(d.repartition(13), "doc_id", "w", 60)
      .select("doc_id").as[Long].collect().toSet
    assert(again === sel)

    // bias: 5 heavy rows (w=500) among 200 light rows (w=1) — the
    // heavy rows must be overrepresented in a k=20 draw
    val skew = ((0L until 200L).map((_, 1L)) ++
      (1000L until 1005L).map((_, 500L))).toDF("id", "w")
    val heavy = Sampling.weightedSample(skew, "id", "w", 20)
      .select("id").as[Long].collect().count(_ >= 1000L)
    assert(heavy >= 4, s"only $heavy of 5 heavy rows drawn")
  }

  test("epochShuffle: membership preserved, shards in range, pos is " +
      "a 1..n_s contiguous ranking per shard") {
    val out = Sampling.epochShuffle(docs.select("doc_id"), "doc_id",
      epoch = 3, nShards = 4).cache()
    assert(out.count() === docs.count())
    assert(out.select("doc_id").distinct().count() === docs.count())
    val shards = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"),
        countDistinct("pos").as("np"))
      .collect()
    assert(shards.map(_.getInt(0)).toSet.subsetOf((0 until 4).toSet))
    shards.foreach { r =>
      val (n, mx, mn, np) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(np === n, s"pos has duplicates in shard ${r.getInt(0)}")
      assert(mx === n && mn === 1L,
        s"pos not contiguous 1..n in shard ${r.getInt(0)}: $r")
    }
    assert(shards.map(_.getLong(1)).max <
      2L * shards.map(_.getLong(1)).min + 8,
      "md5 shards should be roughly balanced")
    out.unpersist()
  }

  test("writeShards: one dir per shard, files hold the epoch's read " +
      "order, round-trip preserves the assignment") {
    val path = java.nio.file.Files.createTempDirectory("graft_shards")
      .toString + "/t"
    Sampling.writeShards(docs.select("doc_id"), "doc_id", epoch = 3,
      nShards = 4, path)
    val dirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(dirs.length === 4, s"expected 4 shard dirs, got ${dirs.toSeq}")
    val back = spark.read.parquet(path)
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)]
      .collect().toSet
    val direct = Sampling
      .epochShuffle(docs.select("doc_id"), "doc_id", 3, 4)
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)]
      .collect().toSet
    assert(back === direct, "round-trip must preserve the assignment")
  }

  test("epochShuffle: epochs permute differently but keep membership; " +
      "repartition-invariant") {
    def perm(e: Int, df: org.apache.spark.sql.DataFrame) =
      Sampling.epochShuffle(df, "doc_id", e, nShards = 4)
        .select("doc_id", "shard", "pos")
        .as[(Long, Int, Long)].collect().toSet
    val e1 = perm(1, docs.select("doc_id"))
    val e2 = perm(2, docs.select("doc_id"))
    assert(e1.map(_._1) === e2.map(_._1), "membership must not change")
    assert(e1 !== e2, "different epochs must permute differently")
    assert(perm(1, docs.select("doc_id").repartition(17)) === e1)
  }

  test("apportion: allocations sum to the budget exactly, follow the " +
      "largest remainders, and replay bit for bit") {
    val w = Seq(("a", 5L), ("b", 3L), ("c", 1L)).toDF("k", "w")
    val got = graft.operators.Sampling.apportion(w, "k", "w", 10L)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    // quotas 50/9, 30/9, 10/9 -> bases 5,3,1 (sum 9), remainders
    // 5,3,1 -> the single leftover goes to 'a'
    assert(got === Map("a" -> 6L, "b" -> 3L, "c" -> 1L))
    assert(got.values.sum === 10L)
    // remainder tie: equal weights, budget not divisible -> the
    // leftover lands on the LOWEST keys, deterministically
    val even = Seq(("x", 2L), ("y", 2L), ("z", 2L)).toDF("k", "w")
    val g2 = graft.operators.Sampling.apportion(even, "k", "w", 7L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(g2 === Map("x" -> 3L, "y" -> 2L, "z" -> 2L))
    assert(g2.values.sum === 7L)
    // partitioning independence
    val g3 = graft.operators.Sampling.apportion(
      w.repartition(5), "k", "w", 10L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(g3 === got)
  }

  test("apportion edge inputs: empty frontier -> empty allocation " +
    "(not an error); NULL weights count as 0; all-zero still loud") {
    val empty = Seq.empty[(String, Long)].toDF("k", "w")
    val g = graft.operators.Sampling.apportion(empty, "k", "w", 100L)
    assert(g.columns.toSeq === Seq("k", "w", "alloc"))
    assert(g.count() === 0L)
    // a NULL weight is unknown demand, not a query-killer: the key
    // stays visible with weight 0
    val withNull = Seq(("a", Some(9L)), ("b", None))
      .toDF("k", "w")
    val gn = graft.operators.Sampling.apportion(withNull, "k", "w", 9L)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(gn === Map("a" -> 9L, "b" -> 0L))
    // non-empty all-zero (or all-NULL) total keeps the loud guard
    val zero = Seq(("a", 0L), ("b", 0L)).toDF("k", "w")
    intercept[IllegalArgumentException] {
      graft.operators.Sampling.apportion(zero, "k", "w", 5L)
    }
  }
}
