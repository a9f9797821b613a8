package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Plans [[TopKPerKey]] as a partial/final bounded-heap pair — the
  * aggregation shape applied to group limits: the partial runs on raw
  * input partitions and bounds the EXCHANGE (at most k rows per key per
  * input partition cross the wire), the final declares
  * `ClusteredDistribution(keys)` so EnsureRequirements inserts the one
  * shuffle, re-bounds, and emits ranks. No Sort operator exists
  * anywhere in the pipeline — each heap is O(group · log k) versus the
  * window form's full per-partition sort. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, rankAttr, child) =>
      TopKPerKeyFinalExec(keys, order, k, rankAttr,
        TopKPerKeyPartialExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Shared bounded-heap pass: per input partition, a hash map keyed by
  * the grouping projection holding a size-k MAX-heap under the sort
  * order — a new row replaces the heap top only when it sorts strictly
  * earlier, so each group costs O(log k) per row and O(k) memory
  * regardless of group size (the celebrity-key property: a 10^8-row
  * hot key holds k rows, not 10^8).
  *
  * Memory bound: keys-per-partition × k retained rows — the same
  * distinct-keys-fit constraint hash aggregation has, WITHOUT its
  * sort-based spill fallback. When per-partition key cardinality is
  * the risk (not key popularity — the heap already handles that),
  * raise `spark.sql.shuffle.partitions` or disable the rewrite
  * (`spark.graft.topk.rewrite=false`) and take the window path;
  * a spillable BytesToBytesMap-backed variant is the upgrade path. */
private[plans] object TopKHeaps {
  def groups(iter: Iterator[InternalRow], keys: Seq[Expression],
             order: Seq[SortOrder], k: Int, schema: Seq[Attribute])
      : Iterator[Seq[InternalRow]] = {
    val keyProj = UnsafeProjection.create(keys, schema)
    val ord: Ordering[InternalRow] =
      RowOrdering.create(order, schema).asInstanceOf[Ordering[InternalRow]]
    val heaps =
      mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      heaps.get(key) match {
        case Some(h) =>
          if (h.size < k) h += row.copy()
          else if (ord.lt(row, h.head)) { h.dequeue(); h += row.copy() }
        case None =>
          val h = mutable.PriorityQueue.empty[InternalRow](ord)
          h += row.copy()
          heaps.put(key.copy(), h)
      }
    }
    // dequeueAll drains largest-first; reversed = ascending sort order,
    // i.e. rank order.
    heaps.valuesIterator.map(h => h.dequeueAll.reverse.toSeq)
  }
}

case class TopKPerKeyPartialExec(keys: Seq[Expression], order: Seq[SortOrder],
                                 k: Int, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def withNewChildInternal(newChild: SparkPlan) =
    copy(child = newChild)
  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, os, kk, schema) = (keys, order, k, child.output)
    child.execute().mapPartitions(
      iter => TopKHeaps.groups(iter, ks, os, kk, schema).flatten,
      preservesPartitioning = true)
  }
}

case class TopKPerKeyFinalExec(keys: Seq[Expression], order: Seq[SortOrder],
                               k: Int, rankAttr: Attribute, child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def withNewChildInternal(newChild: SparkPlan) =
    copy(child = newChild)
  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, os, kk, schema, out) = (keys, order, k, child.output, output)
    child.execute().mapPartitions({ iter =>
      val proj = UnsafeProjection.create(out, out)
      val joined = new JoinedRow
      TopKHeaps.groups(iter, ks, os, kk, schema).flatMap { rows =>
        rows.iterator.zipWithIndex.map { case (r, i) =>
          proj(joined(r, InternalRow(i + 1)))
        }
      }
    }, preservesPartitioning = true)
  }
}
