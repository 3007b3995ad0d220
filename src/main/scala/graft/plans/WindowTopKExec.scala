package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.{Ascending, NullsFirst}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Bounded-heap kernel over whole rows with an arbitrary SortOrder
  * ordering — the executor side of [[WindowTopK]].
  *
  * Hot-loop discipline: rows that do NOT enter a heap (the overwhelming
  * majority once heaps fill) allocate nothing but boxed eval results —
  * sort keys are evaluated into a reused scratch array and compared
  * against the heap head in place; the group lookup uses the transient
  * (uncopied) value, valid for the duration of the call. Only inserted
  * rows pay the copies (group value on first sight, keys + full row on
  * insert). Memory is O(groups * k) rows — no sort buffer, nothing to
  * spill, unlike the sort-based WindowGroupLimit path this replaces.
  */
private[plans] final class RowGroupHeaps(
    k: Int,
    order: Seq[SortOrder],
    part: Seq[Expression],
    input: Seq[Attribute]) {

  final class Entry(val keys: Array[Any], val row: InternalRow)

  private val partB = part.map(BindReferences.bindReference(_, input)).toArray
  private val keyB =
    order.map(s => BindReferences.bindReference(s.child, input)).toArray
  private val ords =
    order.map(s => TypeUtils.getInterpretedOrdering(s.child.dataType)).toArray
  private val desc = order.map(_.direction != Ascending).toArray
  private val nullsFirst = order.map(_.nullOrdering == NullsFirst).toArray
  private val scratch = new Array[Any](keyB.length)

  /** negative = a sorts earlier (ranks better), per the full SortOrder. */
  private def cmpKeys(a: Array[Any], b: Array[Any]): Int = {
    var i = 0
    while (i < ords.length) {
      val x = a(i); val y = b(i)
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

  private val heaps = new java.util.HashMap[Any, java.util.PriorityQueue[Entry]]()

  private def copied(src: Array[Any]): Array[Any] = {
    val out = new Array[Any](src.length)
    var i = 0
    while (i < src.length) { out(i) = InternalRow.copyValue(src(i)); i += 1 }
    out
  }

  def offer(row: InternalRow): Unit = {
    // transient group value: content-valid during this call; copied only
    // when it first keys a heap
    val gRaw: Any =
      if (partB.length == 1) partB(0).eval(row)
      else {
        val a = new Array[Any](partB.length)
        var i = 0
        while (i < partB.length) { a(i) = partB(i).eval(row); i += 1 }
        scala.collection.immutable.ArraySeq.unsafeWrapArray(a)
      }
    var heap = heaps.get(gRaw)
    if (heap == null) {
      heap = new java.util.PriorityQueue[Entry](k + 1, cmp)
      val gSafe =
        if (partB.length == 1) InternalRow.copyValue(gRaw)
        else scala.collection.immutable.ArraySeq.unsafeWrapArray(
          copied(gRaw.asInstanceOf[scala.collection.immutable.ArraySeq[Any]]
            .unsafeArray.asInstanceOf[Array[Any]]))
      heaps.put(gSafe, heap)
    }
    var i = 0
    while (i < keyB.length) { scratch(i) = keyB(i).eval(row); i += 1 }
    if (heap.size < k) {
      heap.add(new Entry(copied(scratch), row.copy()))
    } else if (cmpKeys(scratch, heap.peek().keys) < 0) {
      heap.poll()
      heap.add(new Entry(copied(scratch), row.copy()))
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

/** Map-side prune: at most k rows per (partition, group) pass through;
  * schema unchanged (child.output), rows emitted as stored copies. */
case class WindowTopKPartialExec(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "output rows"),
    "prunedRows" -> SQLMetrics.createMetric(sparkContext,
      "rows pruned before shuffle"))

  override protected def doExecute(): RDD[InternalRow] = {
    val (part, order, kk) = (partitionSpec, orderSpec, k)
    val input = child.output
    val outRows = longMetric("numOutputRows")
    val pruned = longMetric("prunedRows")
    child.execute().mapPartitions({ iter =>
      val heaps = new RowGroupHeaps(kk, order, part, input)
      iter.foreach { r => pruned.add(1); heaps.offer(r) }
      heaps.drain().flatMap(_.iterator.map { e =>
        outRows.add(1); pruned.add(-1); e.row
      })
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

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val (part, order, kk) = (partitionSpec, orderSpec, k)
    val input = child.output
    val outTypes = output.map(_.dataType).toArray
    val outRows = longMetric("numOutputRows")
    child.execute().mapPartitions({ iter =>
      val heaps = new RowGroupHeaps(kk, order, part, input)
      iter.foreach(heaps.offer)
      val proj = UnsafeProjection.create(outTypes)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      heaps.drain().flatMap { entries =>
        entries.iterator.zipWithIndex.map { case (e, i) =>
          rankRow.update(0, i + 1)
          outRows.add(1)
          proj(joined(e.row, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): WindowTopKFinalExec =
    copy(child = newChild)
}
