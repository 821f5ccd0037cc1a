package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Custom whole-operator extension (SURVEY.md §2.5 W1 at scale; guide
  * path (c): LogicalPlan + Strategy + SparkPlan).
  *
  * Top-k rows per key. The window-function formulation
  * (`row_number().over(partitionBy(key).orderBy(ord)) <= k`) must fully
  * SORT every partition — O(n log n) per key group and a complete sort
  * spill at 100 TB. This operator keeps a bounded k-element heap per key:
  * O(n log k), no sort, memory bounded by #keys × k rows per task, with
  * the shuffle on the grouping keys declared via requiredChildDistribution
  * so Catalyst plans the exchange (and AQE sizes it) like any aggregation.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                      child: LogicalPlan, partial: Boolean = false)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** `partial = true` is the map-side combine: no required distribution, so
  * the heap runs on whatever partitioning the child already has and the
  * downstream exchange carries at most k rows per key per task — the same
  * partial/final split an aggregation gets, applied to top-k. */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          child: SparkPlan, partial: Boolean = false)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd: Ordering[InternalRow] =
        GenerateOrdering.generate(sortOrder, childOutput)
      // per key: bounded heap of the k best rows; max-heap by sort order
      // puts the current worst at the top for O(log k) eviction
      val heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty(rowOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (rowOrd.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.values().forEach { h => out ++= h.toSeq.sorted(rowOrd) }
      out.iterator
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Planner strategy: logical TopKPerKey → TopKPerKeyExec. Installed by
  * [[graft.GraftExtensions]] or ad hoc via
  * `spark.experimental.extraStrategies`. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child, partial) =>
      TopKPerKeyExec(keys, order, k, planLater(child), partial) :: Nil
    case _ => Nil
  }
}
