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
