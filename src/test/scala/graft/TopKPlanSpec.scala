package graft

import graft.plans.{TopK, TopKFinalExec, TopKPartialExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPlanSpec extends SparkSpec {
  import spark.implicits._

  private def scored = {
    val rnd = new scala.util.Random(7)
    val rows = for (g <- 0 until 20; _ <- 0 until 50)
      yield (g.toLong, rnd.nextDouble(), rnd.nextLong().abs)
    rows.toDF("grp", "score", "pk").repartition(8)
  }

  test("matches the window row_number formulation exactly") {
    val df = scored.cache()
    try {
      val ours = TopK.perGroup(df, "grp", "score", "pk", k = 5)
        .select("grp", "rank", "pk", "score")
        .orderBy("grp", "rank").collect().toSeq
      val w = Window.partitionBy("grp").orderBy(col("score").desc, col("pk").asc)
      val oracle = df.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select("grp", "rank", "pk", "score")
        .orderBy("grp", "rank").collect().toSeq
      assert(ours === oracle)
    } finally df.unpersist()
  }

  test("ascending mode takes lowest scores (l2 semantics)") {
    val df = Seq((1L, 3.0, 10L), (1L, 1.0, 11L), (1L, 2.0, 12L))
      .toDF("grp", "score", "pk")
    val out = TopK.perGroup(df, "grp", "score", "pk", k = 2,
      descending = false).orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(11L, 12L))
    assert(out.map(_.getInt(1)).toSeq === Seq(1, 2))
  }

  test("ties broken by ascending payload, deterministically") {
    val df = Seq((1L, 1.0, 30L), (1L, 1.0, 10L), (1L, 1.0, 20L))
      .toDF("grp", "score", "pk")
    val out = TopK.perGroup(df, "grp", "score", "pk", k = 2)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(10L, 20L))
  }

  test("string group keys survive buffer reuse (copied, not aliased)") {
    val df = Seq(("alpha", 1.0, 1L), ("beta", 2.0, 2L), ("alpha", 3.0, 3L),
      ("gamma", 4.0, 4L)).toDF("grp", "score", "pk").repartition(2)
    val out = TopK.perGroup(df, "grp", "score", "pk", k = 1)
      .select("grp", "pk").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("alpha" -> 3L, "beta" -> 2L, "gamma" -> 4L))
  }

  test("plans as partial -> exchange -> final; partial prunes map-side") {
    spark.sharedState.cacheManager.clearCache()
    val df = TopK.perGroup(scored, "grp", "score", "pk", k = 3)
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val nodes = plan.collectWithSubqueries { case p => p }
    val finals = nodes.collect { case f: TopKFinalExec => f }
    val partials = nodes.collect { case p: TopKPartialExec => p }
    assert(finals.nonEmpty, s"no TopKFinalExec in:\n$plan")
    assert(partials.nonEmpty, s"no TopKPartialExec in:\n$plan")
    // the exchange must sit between final and partial: final's subtree
    // contains a shuffle whose subtree contains the partial
    val f = finals.head
    val shuffles = f.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.nonEmpty, s"no exchange under TopKFinalExec:\n$plan")
    assert(shuffles.head.collect { case p: TopKPartialExec => p }.nonEmpty,
      s"partial not below the exchange:\n$plan")
    // map-side pruning bound: each of the 8 input partitions contributes
    // at most k rows per group to the shuffle
    val partialRows = partials.head.execute().count()
    assert(partialRows <= 20L * 3 * 8,
      s"partial emitted $partialRows rows, expected <= ${20 * 3 * 8}")
    assert(df.count() === 20L * 3)
  }

  test("empty input yields empty output, no crash") {
    val empty = Seq.empty[(Long, Double, Long)].toDF("grp", "score", "pk")
    assert(TopK.perGroup(empty, "grp", "score", "pk", k = 3).count() === 0)
    graft.plans.WindowTopK.enable(spark)
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("pk").asc)
    val viaRule = empty.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
    assert(viaRule.count() === 0)
  }

  test("k larger than group size returns the whole group ranked") {
    val df = Seq((1L, 1.0, 1L), (1L, 2.0, 2L)).toDF("grp", "score", "pk")
    val out = TopK.perGroup(df, "grp", "score", "pk", k = 10)
      .orderBy("rank").collect()
    assert(out.length === 2)
    assert(out.map(_.getInt(1)).toSeq === Seq(1, 2))
    assert(out.head.getLong(2) === 2L) // higher score first
  }
}
