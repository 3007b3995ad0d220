package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Generalized per-group top-k over whole rows: output is
  * `child.output :+ rankAttr` — exactly what
  * `row_number() OVER (PARTITION BY p ORDER BY o) AS rank ... WHERE
  * rank <= k` produces, minus the full per-partition sort and the
  * full-data shuffle. Planned by [[TopKStrategy]] as partial heaps →
  * hash exchange on the partition keys → final merge (same shape as
  * [[TopKPerGroup]], which keeps only (group, payload, score) and is
  * the library-API fast path; this node carries whole rows so the
  * OPTIMIZER can swap it in for user-written window queries).
  */
case class WindowTopK(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0 && partitionSpec.nonEmpty && orderSpec.nonEmpty)
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): WindowTopK =
    copy(child = newChild)
}

/** Optimizer rule: rewrite the declarative window-top-k pattern
  *
  *   Filter(rank <= k, Window(row_number() AS rank, part, order, child))
  *
  * into [[WindowTopK]]. Spark's own InferWindowGroupLimit already
  * prunes the shuffle (partial WindowGroupLimit before the exchange)
  * but FULLY SORTS every map partition first and sorts again after the
  * exchange; this rewrite replaces both sorts with O(n log k) bounded
  * heaps whose memory is O(groups * k) rows — nothing to spill, and
  * ~20% faster warm at 5M rows / 50k groups / k=3 on local[4]
  * (tools.TopKBench). The rank attribute keeps its exprId, so
  * downstream references resolve unchanged.
  *
  * Strictly guarded: single row_number window expression, non-empty
  * deterministic partition/order keys of atomic (non-binary) types, and
  * a bare `rank <= k` / `rank < k` / `rank = 1` literal predicate.
  * Ties beyond the sort keys are broken arbitrarily — identical to
  * row_number's own tie behavior.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  private def limitFrom(cond: Expression, rank: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k))
        if a.semanticEquals(rank) => Some(k)
      case LessThan(a: Attribute, IntegerLiteral(k))
        if a.semanticEquals(rank) => Some(k - 1)
      case EqualTo(a: Attribute, IntegerLiteral(1))
        if a.semanticEquals(rank) => Some(1)
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute)
        if a.semanticEquals(rank) => Some(k)
      case GreaterThan(IntegerLiteral(k), a: Attribute)
        if a.semanticEquals(rank) => Some(k - 1)
      case _ => None
    }

  private def supported(e: Expression): Boolean =
    e.deterministic && (e.dataType match {
      case _: NumericType | _: StringType | _: DateType |
           _: TimestampType | _: TimestampNTZType | _: BooleanType => true
      case _ => false
    })

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
          part, order, windowChild, _))
        if part.nonEmpty && order.nonEmpty &&
          part.forall(supported) && order.forall(s => supported(s.child)) =>
      limitFrom(cond, alias.toAttribute) match {
        case Some(k) if k > 0 =>
          // InferWindowGroupLimit may have inserted its pre-limit helper
          // below the window; the rewrite subsumes it
          val child = windowChild match {
            case WindowGroupLimit(p2, o2, _, _, inner)
              if p2 == part && o2 == order => inner
            case other => other
          }
          WindowTopK(part, order, k, alias.toAttribute, child)
        case _ => f
      }
  }
}

object WindowTopK {
  /** Install the rewrite + strategy on a live session (idempotent). */
  def enable(spark: SparkSession): Unit = {
    Bridge.addStrategy(spark, TopKStrategy)
    Bridge.addOptimization(spark, WindowTopKRewrite)
  }
}
