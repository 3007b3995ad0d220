package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries frequent-items sketch as a typed UDAF — the heavy-hitters
  * summary a 100 TB corpus needs where exact `GROUP BY token` output no
  * longer fits anywhere (frequent-vocabulary extraction, hot-key
  * detection before a skewed join, boilerplate n-gram mining).
  *
  * One pass, O(capacity) state per partition, partial/final split like
  * any built-in agg. The summaries are MERGEABLE (Agarwal et al.,
  * "Mergeable Summaries", PODS'12): combine counters, then subtract the
  * (capacity+1)-th largest count and drop non-positives — the merged
  * sketch keeps the one-sided guarantee of a single-pass build:
  *
  *   est(x) ≤ true(x)            and   true(x) − est(x) ≤ n/(capacity+1)
  *
  * so every item with true frequency > n/(capacity+1) is guaranteed
  * present. Both bounds are what the oracle query and the spec assert —
  * the sketch CONTENTS below the guarantee line are intentionally not
  * pinned (they depend on merge order, like any parallel sketch).
  */
final class MisraGriesAggregator(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], item: String): Map[String, Long] = {
    if (item == null) return b
    b.get(item) match {
      case Some(c) => b.updated(item, c + 1L)
      case None if b.size < capacity => b.updated(item, 1L)
      case None =>
        // decrement-all: the classic MG step — drains one "vote" from
        // every tracked item instead of tracking the newcomer
        b.iterator.map { case (k, c) => k -> (c - 1L) }
          .filter(_._2 > 0L).toMap
    }
  }

  override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
    if (x.isEmpty) return y
    if (y.isEmpty) return x
    val sum = y.foldLeft(x) { case (acc, (k, c)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + c)
    }
    if (sum.size <= capacity) sum
    else {
      // subtract the (capacity+1)-th largest count from everything;
      // ≤ capacity survivors, error grows by exactly that count
      val d = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)
        .apply(capacity)
      sum.iterator.map { case (k, c) => k -> (c - d) }
        .filter(_._2 > 0L).toMap
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object MisraGries {
  /** `frequentItems(col, 64)` → `map<string,long>` of ≤ 64 counters. */
  def frequentItems(c: Column, capacity: Int): Column =
    udaf(new MisraGriesAggregator(capacity),
      ExpressionEncoder[String]())(c)
}
