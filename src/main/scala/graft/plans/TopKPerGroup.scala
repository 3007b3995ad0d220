package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DoubleType, IntegerType}
import org.apache.spark.sql.DataFrame

/** Whole-operator per-group top-k: the engine's one custom
  * `LogicalPlan` + `SparkStrategy` + physical `SparkPlan` stack
  * (SURVEY.md §4.2 preference order (c)), registered per-session via
  * `spark.experimental.extraStrategies` / GraftExtensions.
  *
  * Semantics: for each distinct `groupKey`, keep the k rows with the
  * best `score` (highest when `descending`, lowest otherwise; ties
  * broken by ascending `payload` for determinism) and emit
  * `(group, rank 1..k, payload, score)` — exactly the
  * `row_number() OVER (PARTITION BY group ORDER BY score) <= k`
  * window formulation, which is the oracle.
  *
  * Why an operator instead of the window: the window plan shuffles
  * EVERY scored candidate row (|corpus| x |queries| rows for batch KNN,
  * reference src/databricks/query_endpoint.py:126-146) and sorts each
  * partition. This stack plans as
  *
  *   TopKFinalExec            -- merge heaps, emit ranked rows
  *     <- hash exchange on group (inserted by EnsureRequirements)
  *   TopKPartialExec          -- bounded heap per (partition, group)
  *     <- scored child (stays in WholeStageCodegen)
  *
  * so at most k rows per group PER MAP PARTITION reach the exchange —
  * the shuffle shrinks from O(candidates) to O(groups * k * partitions),
  * and nothing is ever fully sorted (O(n log k) heap maintenance). At
  * 100 TB this is the difference between shuffling the scored corpus
  * and shuffling a few rows per query.
  */
case class TopKPerGroup(
    groupKey: Expression,
    score: Expression,
    payload: Expression,
    k: Int,
    descending: Boolean,
    override val output: Seq[Attribute],
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  // output attrs are minted here, not drawn from the child — declare them
  // produced or CheckAnalysis counts them as missing inputs
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Plans [[TopKPerGroup]] as partial-then-final physical nodes; the
  * exchange between them is inserted by EnsureRequirements from the
  * final node's required ClusteredDistribution. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: TopKPerGroup =>
      val partialOut = Seq(
        AttributeReference("g", t.groupKey.dataType, t.groupKey.nullable)(),
        AttributeReference("s", DoubleType, nullable = false)(),
        AttributeReference("p", t.payload.dataType, t.payload.nullable)())
      val partial = TopKPartialExec(t.groupKey, t.score, t.payload, t.k,
        t.descending, partialOut, planLater(t.child))
      TopKFinalExec(t.output, t.k, t.descending, partial) :: Nil
    case w: WindowTopK =>
      WindowTopKFinalExec(w.partitionSpec, w.orderSpec, w.k, w.rankAttr,
        WindowTopKPartialExec(w.partitionSpec, w.orderSpec, w.k,
          planLater(w.child))) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level API. */
object TopK {

  /** Per-group top-k of `df` by `scoreCol` (must be DOUBLE). Output
    * columns: `(<groupCol>, rank, <payloadCol>, score)`. Installs
    * [[TopKStrategy]] on the session if absent. */
  def perGroup(df: DataFrame, groupCol: String, scoreCol: String,
      payloadCol: String, k: Int, descending: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    Bridge.addStrategy(spark, TopKStrategy)
    val plan = Bridge.analyzed(df)
    def attr(n: String): Attribute = plan.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${plan.output.map(_.name).mkString(", ")}"))
    val g = attr(groupCol)
    val s = attr(scoreCol)
    val p = attr(payloadCol)
    require(s.dataType == DoubleType,
      s"score column $scoreCol must be double, got ${s.dataType}")
    val out = Seq(
      AttributeReference(groupCol, g.dataType, g.nullable)(),
      AttributeReference("rank", IntegerType, nullable = false)(),
      AttributeReference(payloadCol, p.dataType, p.nullable)(),
      AttributeReference("score", DoubleType, nullable = false)())
    Bridge.ofRows(spark, TopKPerGroup(g, s, p, k, descending, out, plan))
  }
}
