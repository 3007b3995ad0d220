package graft

import graft.operators.DataQuality
import org.apache.spark.sql.functions._

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private def rows = Seq(
    (1L, Some(5.0), Some("click")),   // clean
    (2L, Some(-1.0), Some("click")),  // one violation
    (3L, Some(-2.0), Some("bogus")),  // two violations
    (4L, None, Some("view")),         // NULL predicate -> violation
    (5L, Some(1.0), None)             // null type -> isin NULL -> violation
  ).toDF("id", "value", "typ")

  private val rules = Seq(
    "nonneg" -> (col("value") >= 0),
    "known_type" -> col("typ").isin("click", "view"))

  test("validate attaches the exact failed-rule names per row; NULL " +
    "predicates count as violations") {
    val got = DataQuality.validate(rows, rules)
      .select($"id", $"__violations").as[(Long, Seq[String])]
      .collect().toMap
    assert(got(1L) === Seq.empty)
    assert(got(2L) === Seq("nonneg"))
    assert(got(3L) === Seq("nonneg", "known_type"))
    assert(got(4L) === Seq("nonneg"))
    assert(got(5L) === Seq("known_type"))
  }

  test("split partitions exactly: clean has no reasons column rows, " +
    "quarantine keeps payload + reasons") {
    val (good, bad) = DataQuality.split(rows, rules)
    assert(good.select("id").as[Long].collect().toSet === Set(1L))
    assert(bad.count() === 4L)
    assert(bad.columns.contains("__violations"))
    assert(good.count() + bad.count() === rows.count())
  }

  test("report: multi-violation rows quarantine once, per-rule counts " +
    "count every hit") {
    val r = DataQuality.report(rows, rules).collect()(0)
    assert(r.getAs[Long]("n_rows") === 5L)
    assert(r.getAs[Long]("n_quarantined") === 4L)
    assert(r.getAs[Long]("n_nonneg") === 3L)
    assert(r.getAs[Long]("n_known_type") === 2L)
  }
}
