package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k aggregation of `(score, id)` pairs with map-side
  * partial aggregation.
  *
  * Why it exists: the window formulation of batch KNN
  * (`row_number() over (partition by query order by score)`) must
  * shuffle EVERY scored candidate row — |corpus| × |queries| rows — to
  * rank them. An aggregate with a bounded heap buffer ranks inside each
  * map partition first (Spark runs partial aggregation before the
  * exchange), so only k rows per query per partition cross the wire.
  * At 1000 executors × 100 TB that is the difference between a
  * corpus-sized shuffle and a k-sized one.
  *
  * Ordering: higher score wins; ties broken by lower id (matches the
  * `(score desc, pk asc)` total order used everywhere else).
  */
final case class ScoredId(score: Double, id: Long)

final class TopKAggregator(k: Int)
    extends Aggregator[ScoredId, Array[ScoredId], Array[ScoredId]] {
  require(k >= 1)

  private def lt(a: ScoredId, b: ScoredId): Boolean =
    a.score < b.score || (a.score == b.score && a.id > b.id)

  override def zero: Array[ScoredId] = Array.empty

  /** Buffer kept sorted best-first; ≤ k elements, insertion O(k). */
  override def reduce(buf: Array[ScoredId], v: ScoredId): Array[ScoredId] =
    insert(buf, v)

  private def insert(buf: Array[ScoredId], v: ScoredId): Array[ScoredId] = {
    if (buf.length == k && lt(v, buf(k - 1))) return buf
    val out = new Array[ScoredId](math.min(buf.length + 1, k))
    var i = 0; var j = 0; var placed = false
    while (j < out.length) {
      if (!placed && (i >= buf.length || lt(buf(i), v))) {
        out(j) = v; placed = true
      } else {
        out(j) = buf(i); i += 1
      }
      j += 1
    }
    out
  }

  override def merge(a: Array[ScoredId], b: Array[ScoredId]): Array[ScoredId] =
    b.foldLeft(a)(insert)

  override def finish(r: Array[ScoredId]): Array[ScoredId] = r

  override def bufferEncoder: Encoder[Array[ScoredId]] =
    ExpressionEncoder[Array[ScoredId]]()
  override def outputEncoder: Encoder[Array[ScoredId]] =
    ExpressionEncoder[Array[ScoredId]]()
}

object TopKAgg {
  /** `topk(k)(scoreCol, idCol)` usable in groupBy().agg() — the product
    * input encoder flattens ScoredId into two value arguments. */
  def topk(k: Int): (Column, Column) => Column = {
    val agg = udaf(new TopKAggregator(k), ExpressionEncoder[ScoredId]())
    (score: Column, id: Column) => agg(score, id)
  }
}
