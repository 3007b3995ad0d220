package graft

import graft.operators.AsOfJoin
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("backward as-of picks the latest right row at or before left.ts") {
    val left = Seq((1L, ts(5), "l1"), (1L, ts(10), "l2"), (2L, ts(3), "l3"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, ts(4), 100L, 1.0), (1L, ts(10), 101L, 2.0),
      (1L, ts(12), 102L, 3.0), (3L, ts(1), 103L, 4.0))
      .toDF("k", "ts", "rid", "rv")
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts",
      Seq("tag"), Seq("rid", "rv"), "rid")
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[java.lang.Long]("rid")).map(_.toLong)).toMap
    assert(out("l1") === Some(100L)) // ts(4) <= ts(5)
    assert(out("l2") === Some(101L)) // equal timestamps are inclusive
    assert(out("l3") === None)       // no right row for key 2 → left join
  }

  test("forward as-of picks the earliest right row at or after left.ts") {
    val left = Seq((1L, ts(5), "l1"), (1L, ts(11), "l2"), (1L, ts(13), "l3"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, ts(4), 100L, 1.0), (1L, ts(10), 101L, 2.0),
      (1L, ts(12), 102L, 3.0)).toDF("k", "ts", "rid", "rv")
    val out = AsOfJoin.forward(left, right, Seq("k"), "ts", "ts",
      Seq("tag"), Seq("rid", "rv"), "rid")
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[java.lang.Long]("rid")).map(_.toLong)).toMap
    assert(out("l1") === Some(101L)) // next at-or-after 10:05 is 10:10
    assert(out("l2") === Some(102L))
    assert(out("l3") === None)       // nothing after 10:13
  }

  test("nearest as-of picks the closer side; exact tie goes backward") {
    val left = Seq((1L, ts(6), "near_b"), (1L, ts(9), "near_f"),
      (1L, ts(7), "tie")).toDF("k", "ts", "tag")
    // right rows at 10:04 and 10:10: 10:06 is closer to 04 (2 vs 4),
    // 10:09 closer to 10 (1 vs 5), 10:07 equidistant (3 vs 3) -> backward
    val right = Seq((1L, ts(4), 100L, 1.0), (1L, ts(10), 101L, 2.0))
      .toDF("k", "ts", "rid", "rv")
    val out = AsOfJoin.nearest(left, right, Seq("k"), "ts", "ts",
      Seq("tag"), Seq("rid", "rv"), "rid")
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[java.lang.Long]("rid")).map(_.toLong)).toMap
    assert(out("near_b") === Some(100L))
    assert(out("near_f") === Some(101L))
    assert(out("tie") === Some(100L))
  }

  test("multiple right rows: tie-break column decides at equal ts") {
    val left = Seq((1L, ts(10), "x")).toDF("k", "ts", "tag")
    val right = Seq((1L, ts(10), 1L, 10.0), (1L, ts(10), 2L, 20.0))
      .toDF("k", "ts", "rid", "rv")
    val out = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts",
      Seq("tag"), Seq("rid", "rv"), "rid").head()
    // highest tie-break (latest in order) wins — running last() semantics
    assert(out.getAs[Long]("rid") === 2L && out.getAs[Double]("rv") === 20.0)
  }
}
