package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.types.DataType

/** Shared bounded-heap kernel for the partial/final top-k nodes.
  *
  * A `java.util.PriorityQueue` ordered worst-entry-at-head; insertion is
  * O(log k) and the heap never exceeds k entries, so a partition pass is
  * O(n log k) with O(groups * k) memory — no sort, no spill for
  * realistic (groups * k). "Better" = higher score when `descending`
  * (cosine/dot) else lower (l2); ties broken by ascending payload so
  * results are deterministic and match the
  * `row_number() OVER (... ORDER BY score, payload)` oracle exactly.
  */
private[plans] final class GroupHeaps(
    k: Int, descending: Boolean, payloadType: DataType) {

  final class Entry(val score: Double, val payload: Any)

  private val payloadOrd =
    TypeUtils.getInterpretedOrdering(payloadType)

  /** true iff a ranks strictly better than b */
  private def better(a: Entry, b: Entry): Boolean =
    if (a.score != b.score) {
      if (descending) a.score > b.score else a.score < b.score
    } else payloadOrd.compare(a.payload, b.payload) < 0

  // head = worst entry = least per this comparator
  private val cmp = new java.util.Comparator[Entry] {
    override def compare(x: Entry, y: Entry): Int =
      if (better(x, y)) 1 else if (better(y, x)) -1 else 0
  }

  private val heaps = new java.util.HashMap[Any, java.util.PriorityQueue[Entry]]()

  def offer(group: Any, score: Double, payload: Any): Unit = {
    var heap = heaps.get(group)
    if (heap == null) {
      heap = new java.util.PriorityQueue[Entry](k + 1, cmp)
      heaps.put(group, heap)
    }
    if (heap.size < k) {
      heap.add(new Entry(score, payload))
    } else {
      val e = new Entry(score, payload)
      if (better(e, heap.peek())) { heap.poll(); heap.add(e) }
    }
  }

  /** (group, best-first entries) per group. */
  def drain(): Iterator[(Any, Array[Entry])] = {
    import scala.jdk.CollectionConverters._
    heaps.entrySet().iterator().asScala.map { kv =>
      val heap = kv.getValue
      val arr = new Array[Entry](heap.size)
      var i = arr.length - 1
      while (i >= 0) { arr(i) = heap.poll(); i -= 1 } // poll worst-first
      (kv.getKey, arr)
    }
  }
}

/** Map-side node: prunes each partition to at most k rows per group.
  * Output schema `(g, s, p)`; no distribution requirement, so it runs
  * where the scored child ran (the distance expression stays in the
  * child's WholeStageCodegen span). */
case class TopKPartialExec(
    groupKey: Expression,
    score: Expression,
    payload: Expression,
    k: Int,
    descending: Boolean,
    override val output: Seq[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val gExpr = BindReferences.bindReference(groupKey, child.output)
    val sExpr = BindReferences.bindReference(score, child.output)
    val pExpr = BindReferences.bindReference(payload, child.output)
    val outTypes = output.map(_.dataType).toArray
    val (kk, desc, pType) = (k, descending, payload.dataType)
    child.execute().mapPartitions({ iter =>
      val heaps = new GroupHeaps(kk, desc, pType)
      iter.foreach { row =>
        val s = sExpr.eval(row)
        if (s != null) {
          // group/payload values may be buffer-backed (UTF8String over a
          // reused UnsafeRow) — copy before retaining past this row
          heaps.offer(InternalRow.copyValue(gExpr.eval(row)),
            s.asInstanceOf[Double], InternalRow.copyValue(pExpr.eval(row)))
        }
      }
      val proj = UnsafeProjection.create(outTypes)
      heaps.drain().flatMap { case (g, entries) =>
        entries.iterator.map { e =>
          proj(InternalRow(g, e.score, e.payload))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPartialExec =
    copy(child = newChild)
}

/** Reduce-side node: requires clustering on the group column (the
  * planner inserts the hash exchange), merges the per-partition heaps,
  * and emits `(group, rank, payload, score)` best-first. */
case class TopKFinalExec(
    override val output: Seq[Attribute],
    k: Int,
    descending: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(child.output.head)) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val outTypes = output.map(_.dataType).toArray
    val (kk, desc) = (k, descending)
    val gType = child.output(0).dataType
    val pType = child.output(2).dataType
    child.execute().mapPartitions({ iter =>
      val heaps = new GroupHeaps(kk, desc, pType)
      iter.foreach { row =>
        // partial output is (g: any, s: double, p: any) by construction
        heaps.offer(InternalRow.copyValue(row.get(0, gType)),
          row.getDouble(1), InternalRow.copyValue(row.get(2, pType)))
      }
      val proj = UnsafeProjection.create(outTypes)
      heaps.drain().flatMap { case (g, entries) =>
        entries.iterator.zipWithIndex.map { case (e, i) =>
          proj(InternalRow(g, i + 1, e.payload, e.score))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKFinalExec =
    copy(child = newChild)
}
