package graft

import graft.functions.{MisraGries, MisraGriesAggregator}
import org.apache.spark.sql.functions._

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  // skewed stream: "hot" appears 400×, 100 noise keys 4× each → n=800,
  // with capacity 7 the guarantee line is n/8 = 100 ≪ 400
  private def skewed(parts: Int) = {
    val rows = Seq.fill(400)("hot") ++
      (0 until 100).flatMap(i => Seq.fill(4)(s"k$i"))
    rows.toDF("item").repartition(parts)
  }

  private def sketch(parts: Int, cap: Int): Map[String, Long] =
    skewed(parts)
      .agg(MisraGries.frequentItems(col("item"), cap).as("m"))
      .head().getMap[String, Long](0).toMap

  test("hot item survives eviction pressure with bounded error") {
    for (parts <- Seq(1, 4, 13)) {
      val m = sketch(parts, cap = 7)
      assert(m.size <= 7, s"capacity respected (parts=$parts)")
      assert(m.contains("hot"), s"guaranteed heavy hitter kept (parts=$parts)")
      val est = m("hot")
      assert(est <= 400L && 400L - est <= 800L / 8,
        s"est $est outside [300,400] (parts=$parts)")
      // one-sided bound holds for every survivor
      m.foreach { case (k, e) =>
        val truth = if (k == "hot") 400L else 4L
        assert(e <= truth && truth - e <= 800L / 8, s"$k est $e vs $truth")
      }
    }
  }

  test("capacity >= distinct keys degenerates to exact counts") {
    val df = Seq("a", "a", "b", "c", "c", "c").toDF("item").repartition(3)
    val m = df.agg(MisraGries.frequentItems(col("item"), 10).as("m"))
      .head().getMap[String, Long](0).toMap
    assert(m === Map("a" -> 2L, "b" -> 1L, "c" -> 3L))
  }

  test("merge trims to capacity and keeps one-sided bounds") {
    val agg = new MisraGriesAggregator(2)
    val x = Map("a" -> 10L, "b" -> 3L)
    val y = Map("c" -> 4L, "a" -> 1L)
    val m = agg.merge(x, y) // combined: a=11 b=3 c=4; 3rd largest = 3
    assert(m.size <= 2)
    assert(m === Map("a" -> 8L, "c" -> 1L))
  }

  test("nulls are ignored") {
    val df = Seq(Some("a"), None, Some("a"), None).toDF("item")
    val m = df.agg(MisraGries.frequentItems(col("item"), 4).as("m"))
      .head().getMap[String, Long](0).toMap
    assert(m === Map("a" -> 2L))
  }
}
