package graft

import graft.plans.{WindowTopK, WindowTopKFinalExec, WindowTopKPartialExec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class WindowTopKSpec extends SparkSpec {
  import spark.implicits._

  private def physical(df: DataFrame): String = {
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
  }

  private def data = {
    val rnd = new scala.util.Random(11)
    (for (g <- 0 until 15; i <- 0 until 40)
      yield (g.toLong, rnd.nextDouble() * 100, s"row_${g}_$i", i.toLong))
      .toDF("grp", "score", "tag", "pk").repartition(6)
  }

  test("rewrite fires on the declarative pattern and matches the window") {
    WindowTopK.enable(spark)
    val df = data.cache()
    try {
      val w = Window.partitionBy("grp")
        .orderBy(col("score").desc, col("pk").asc)
      val q = df.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 4)
      val p = physical(q)
      assert(p.contains("WindowTopKPartial") && p.contains("WindowTopKFinal"),
        s"rewrite did not fire:\n$p")
      assert(!p.contains("WindowExec") && !" Window ".r.findFirstIn(p).isDefined,
        s"window should be gone:\n$p")
      // ground truth: the same query WITHOUT the rewrite (operator API off:
      // compute via sort within groups driver-side)
      val rows = df.collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getString(2), r.getLong(3)))
      val expect = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        rs.sortBy(r => (-r._2, r._4)).take(4).zipWithIndex
          .map { case (r, i) => (g, r._2, r._3, r._4, i + 1) }
      }.sortBy(r => (r._1, r._5))
      val got = q.select("grp", "score", "tag", "pk", "rnk")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
          r.getLong(3), r.getInt(4)))
        .sortBy(r => (r._1, r._5)).toSeq
      assert(got === expect)
    } finally df.unpersist()
  }

  test("rewrite handles rank < k, rank = 1, and a long cast upstream") {
    WindowTopK.enable(spark)
    val df = data
    val w = Window.partitionBy("grp").orderBy(col("score").asc, col("pk").asc)
    val lt = df.withColumn("rnk", row_number().over(w)).filter(col("rnk") < 3)
    assert(physical(lt).contains("WindowTopKFinal"), physical(lt))
    assert(lt.groupBy("grp").count().collect().forall(_.getLong(1) === 2))
    val eq = df.withColumn("rnk", row_number().over(w)).filter(col("rnk") === 1)
    assert(physical(eq).contains("WindowTopKFinal"), physical(eq))
    assert(eq.count() === 15)
    // cast(row_number as long): UnwrapCastInBinaryComparison normalizes
    val cast = df.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 2)
    assert(physical(cast).contains("WindowTopKFinal"), physical(cast))
    assert(cast.count() === 30)
  }

  test("null sort keys honor the SortOrder null ordering") {
    WindowTopK.enable(spark)
    val df = Seq(
      (1L, Some(5.0), 1L), (1L, None, 2L), (1L, Some(9.0), 3L),
      (2L, None, 4L), (2L, None, 5L), (2L, Some(1.0), 6L))
      .toDF("grp", "score", "pk")
    // desc => NULLS LAST: nulls only surface when real scores run out
    val wDesc = Window.partitionBy("grp")
      .orderBy(col("score").desc, col("pk").asc)
    val topDesc = df.withColumn("rnk", row_number().over(wDesc))
      .filter(col("rnk") <= 2)
    assert(physical(topDesc).contains("WindowTopKFinal"), physical(topDesc))
    val gotDesc = topDesc.select("grp", "rnk", "pk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(x => (x._1, x._2)).toSeq
    assert(gotDesc === Seq((1L, 1, 3L), (1L, 2, 1L), (2L, 1, 6L), (2L, 2, 4L)))
    // asc => NULLS FIRST: nulls rank ahead of every real score
    val wAsc = Window.partitionBy("grp")
      .orderBy(col("score").asc, col("pk").asc)
    val topAsc = df.withColumn("rnk", row_number().over(wAsc))
      .filter(col("rnk") <= 2)
    val gotAsc = topAsc.select("grp", "rnk", "pk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sortBy(x => (x._1, x._2)).toSeq
    assert(gotAsc === Seq((1L, 1, 2L), (1L, 2, 1L), (2L, 1, 4L), (2L, 2, 5L)))
  }

  test("rewrite does NOT fire on rank/dense_rank or non-literal bounds") {
    WindowTopK.enable(spark)
    val df = data
    val w = Window.partitionBy("grp").orderBy(col("score").asc, col("pk").asc)
    val r1 = df.withColumn("rnk", rank().over(w)).filter(col("rnk") <= 3)
    assert(!physical(r1).contains("WindowTopKFinal"),
      "rank() has different tie semantics; must not rewrite")
    val r2 = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= col("pk"))
    assert(!physical(r2).contains("WindowTopKFinal"),
      "non-literal bound must not rewrite")
  }

  test("rewritten SQL window query matches DuckDB-style expected output") {
    WindowTopK.enable(spark)
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    orders.createOrReplaceTempView("wtk_orders")
    val q = spark.sql(
      """SELECT o_custkey, CAST(rnk AS BIGINT) AS rnk, o_orderkey
        |FROM (SELECT o_custkey, o_orderkey,
        |        row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |      FROM wtk_orders WHERE o_custkey < 200)
        |WHERE rnk <= 2 ORDER BY o_custkey, rnk""".stripMargin)
    assert(physical(q).contains("WindowTopKFinal"), physical(q))
    // parity with the un-rewritten window formulation
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val expect = orders.filter(col("o_custkey") < 200)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).toSeq.flatMap { case (ck, rs) =>
        rs.sortBy(r => (-r._3, r._2)).take(2).zipWithIndex
          .map { case (r, i) => (ck, (i + 1).toLong, r._2) }
      }.sortBy(r => (r._1, r._2)).toSeq
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expect)
  }
}
