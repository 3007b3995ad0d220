package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.{Ascending, NullsFirst, NullsLast}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Bounded-heap kernel over whole rows with an arbitrary SortOrder
  * ordering — the executor-side of [[WindowTopK]]. Entries keep the
  * evaluated (copied) sort keys plus a copy of the full row; groups key
  * a hash map by the copied partition values (Vector equality gives
  * value semantics for UTF8String etc.). */
private[plans] final class RowGroupHeaps(k: Int, order: Seq[SortOrder]) {

  final class Entry(val keys: Array[Any], val row: InternalRow)

  private val ords = order.map(s => TypeUtils.getInterpretedOrdering(s.child.dataType)).toArray
  private val desc = order.map(_.direction != Ascending).toArray
  private val nullsFirst = order.map(_.nullOrdering == NullsFirst).toArray

  /** negative = a sorts earlier (ranks better), per the full SortOrder. */
  private def cmpKeys(a: Array[Any], b: Array[Any]): Int = {
    var i = 0
    while (i < ords.length) {
      val (x, y) = (a(i), b(i))
      val c =
        if (x == null && y == null) 0
        else if (x == null) { if (nullsFirst(i)) -1 else 1 }
        else if (y == null) { if (nullsFirst(i)) 1 else -1 }
        else {
          val c0 = ords(i).compare(x, y)
          if (desc(i)) -c0 else c0
        }
      if (c != 0) return c
      i += 1
    }
    0
  }

  // head = worst = latest in sort order
  private val cmp = new java.util.Comparator[Entry] {
    override def compare(x: Entry, y: Entry): Int = cmpKeys(y.keys, x.keys)
  }

  private val heaps = new java.util.HashMap[Vector[Any], java.util.PriorityQueue[Entry]]()

  def offer(group: Vector[Any], keys: Array[Any], row: InternalRow): Unit = {
    var heap = heaps.get(group)
    if (heap == null) {
      heap = new java.util.PriorityQueue[Entry](k + 1, cmp)
      heaps.put(group, heap)
    }
    if (heap.size < k) heap.add(new Entry(keys, row))
    else if (cmpKeys(keys, heap.peek().keys) < 0) {
      heap.poll(); heap.add(new Entry(keys, row))
    }
  }

  /** entries per group, best (rank 1) first. */
  def drain(): Iterator[Array[Entry]] = {
    import scala.jdk.CollectionConverters._
    heaps.values().iterator().asScala.map { heap =>
      val arr = new Array[Entry](heap.size)
      var i = arr.length - 1
      while (i >= 0) { arr(i) = heap.poll(); i -= 1 }
      arr
    }
  }
}

private[plans] object RowGroupHeaps {
  /** Evaluators bound to `input`; group values and sort keys are copied
    * out of the (reused) input row buffers. */
  def bind(part: Seq[Expression], order: Seq[SortOrder],
      input: Seq[Attribute]): (InternalRow => Vector[Any], InternalRow => Array[Any]) = {
    val partB = part.map(BindReferences.bindReference(_, input)).toArray
    val keyB = order.map(s => BindReferences.bindReference(s.child, input)).toArray
    val groupOf = (row: InternalRow) => {
      val b = Vector.newBuilder[Any]
      var i = 0
      while (i < partB.length) {
        b += InternalRow.copyValue(partB(i).eval(row)); i += 1
      }
      b.result()
    }
    val keysOf = (row: InternalRow) => {
      val ks = new Array[Any](keyB.length)
      var i = 0
      while (i < keyB.length) {
        ks(i) = InternalRow.copyValue(keyB(i).eval(row)); i += 1
      }
      ks
    }
    (groupOf, keysOf)
  }
}

/** Map-side prune: at most k rows per (partition, group) pass through;
  * schema unchanged (child.output), rows emitted as stored copies. */
case class WindowTopKPartialExec(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (part, order, kk) = (partitionSpec, orderSpec, k)
    val input = child.output
    child.execute().mapPartitions({ iter =>
      val (groupOf, keysOf) = RowGroupHeaps.bind(part, order, input)
      val heaps = new RowGroupHeaps(kk, order)
      iter.foreach { row =>
        heaps.offer(groupOf(row), keysOf(row), row.copy())
      }
      heaps.drain().flatMap(_.iterator.map(_.row))
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): WindowTopKPartialExec =
    copy(child = newChild)
}

/** Reduce-side merge: requires clustering on the partition keys, emits
  * `row :+ rank` best-first per group. */
case class WindowTopKFinalExec(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(partitionSpec) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (part, order, kk) = (partitionSpec, orderSpec, k)
    val input = child.output
    val outTypes = output.map(_.dataType).toArray
    child.execute().mapPartitions({ iter =>
      val (groupOf, keysOf) = RowGroupHeaps.bind(part, order, input)
      val heaps = new RowGroupHeaps(kk, order)
      iter.foreach { row =>
        heaps.offer(groupOf(row), keysOf(row), row.copy())
      }
      val proj = UnsafeProjection.create(outTypes)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      heaps.drain().flatMap { entries =>
        entries.iterator.zipWithIndex.map { case (e, i) =>
          rankRow.update(0, i + 1)
          proj(joined(e.row, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): WindowTopKFinalExec =
    copy(child = newChild)
}
