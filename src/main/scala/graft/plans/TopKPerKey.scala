package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode, UnsafeExternalRowSorter}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.util.collection.unsafe.sort.PrefixComparator

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
  * partial/final split an aggregation gets, applied to top-k.
  *
  * Memory guard: the per-key heap map is bounded by
  * `spark.graft.topk.maxKeysInMemory` distinct keys per task (default
  * 262144 — with heaps of ≤k rows each, the same order of task memory a
  * hash aggregate budgets). Past the bound:
  *  - partial mode FLUSHES the buffered heaps into the output stream and
  *    keeps going — output may then exceed k rows per key, which the
  *    final operator cuts; exactly the degrade-to-passthrough a partial
  *    hash aggregation takes when its hash table overflows;
  *  - final mode switches to a SPILLABLE external sort on (keys, order)
  *    and streams the first k rows of each key group off the sorted run —
  *    so a task with pathological key cardinality spills to disk like a
  *    sort aggregate instead of OOMing. */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
                          child: SparkPlan, partial: Boolean = false)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else ClusteredDistribution(keys) :: Nil

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "partialFlushes" -> SQLMetrics.createMetric(sparkContext,
      "partial heap flushes (key-cardinality bound hit)"),
    "sortFallbacks" -> SQLMetrics.createMetric(sparkContext,
      "tasks that fell back to spillable sort"),
    // every row this instance discards (heap reject/evict, or sorted-run
    // cut past k). Summed over the partial+final pair the count telescopes
    // to compound input − output — the exact number of rows the k-cut
    // removed, surfaced so a capped caller (e.g. embeddingPairs' hot-bucket
    // bound) can SEE the truncation instead of silently losing recall.
    "droppedRows" -> SQLMetrics.createMetric(sparkContext,
      "rows dropped by the k-cut"))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    val childSchema = schema
    val isPartial = partial
    val maxKeys = conf.getConfString(
      TopKPerKeyExec.MaxKeysConf, "262144").toInt
    val flushMetric = longMetric("partialFlushes")
    val fallbackMetric = longMetric("sortFallbacks")
    val dropMetric = longMetric("droppedRows")
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd: Ordering[InternalRow] =
        GenerateOrdering.generate(sortOrder, childOutput)
      // per key: bounded heap of the k best rows; max-heap by sort order
      // puts the current worst at the top for O(log k) eviction
      val heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[InternalRow]]()

      def insert(row: InternalRow): Unit = {
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty(rowOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (rowOrd.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
          dropMetric.add(1) // the evicted former head
        } else dropMetric.add(1) // the rejected incoming row
      }
      def drainHeaps(): Iterator[InternalRow] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        heaps.values().forEach { h => out ++= h.toSeq.sorted(rowOrd) }
        heaps.clear()
        out.iterator
      }

      if (isPartial) {
        // streaming flush keeps partial-mode memory bounded with no spill:
        // emitted supersets are cut by the final operator after the
        // exchange, so correctness never depends on the flush boundary
        new scala.collection.AbstractIterator[InternalRow] {
          private var drain: Iterator[InternalRow] = Iterator.empty
          override def hasNext: Boolean = {
            while (!drain.hasNext && iter.hasNext) {
              insert(iter.next())
              if (heaps.size() > maxKeys) {
                flushMetric.add(1)
                drain = drainHeaps()
              }
            }
            if (!drain.hasNext && !heaps.isEmpty) drain = drainHeaps()
            drain.hasNext
          }
          override def next(): InternalRow = drain.next()
        }
      } else {
        var overflow = false
        while (iter.hasNext && !overflow) {
          insert(iter.next())
          if (heaps.size() > maxKeys) overflow = true
        }
        if (!overflow) drainHeaps()
        else {
          // final mode must emit EXACTLY top-k per key: hand everything —
          // buffered heaps plus the rest of the input — to a spillable
          // external sort on (keys, order) and cut k per key group off
          // the sorted stream
          fallbackMetric.add(1)
          val fullOrder = keyExprs.map(SortOrder(_, Ascending)) ++ sortOrder
          val sorter = UnsafeExternalRowSorter.create(
            childSchema,
            GenerateOrdering.generate(fullOrder, childOutput),
            new PrefixComparator {
              override def compare(a: Long, b: Long): Int = 0
            },
            new UnsafeExternalRowSorter.PrefixComputer {
              private val p = new UnsafeExternalRowSorter.PrefixComputer.Prefix
              override def computePrefix(row: InternalRow)
                  : UnsafeExternalRowSorter.PrefixComputer.Prefix = {
                p.value = 0L; p.isNull = false; p
              }
            },
            org.apache.spark.sql.graftbridge.Bridge.taskPageSizeBytes,
            false)
          val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
          drainHeaps().foreach(r => sorter.insertRow(toUnsafe(r)))
          while (iter.hasNext) sorter.insertRow(toUnsafe(iter.next()))
          val sorted = sorter.sort()
          // Group changes are detected with the SAME generated ordering
          // the sort used (comparator equality on the key prefix), not
          // UnsafeRow byte equality: keys that compare equal but differ
          // in bytes would interleave within one sorted run and a
          // byte-equality cut would reset `emitted` mid-group, emitting
          // more than k rows for that key.
          val keyGroupOrd: Ordering[InternalRow] = GenerateOrdering.generate(
            keyExprs.map(SortOrder(_, Ascending)), childOutput)
          new scala.collection.AbstractIterator[InternalRow] {
            private var curRow: UnsafeRow = null
            private var emitted = 0
            private var ready: InternalRow = null
            override def hasNext: Boolean = {
              while (ready == null && sorted.hasNext) {
                val r = sorted.next()
                if (curRow == null || keyGroupOrd.compare(r, curRow) != 0) {
                  // the sorter's iterator reuses its row buffer — copy the
                  // group's first row to compare later rows against
                  curRow = toUnsafe(r).copy(); emitted = 0
                }
                if (emitted < limit) { emitted += 1; ready = r }
                else dropMetric.add(1) // cut past k off the sorted run
              }
              ready != null
            }
            override def next(): InternalRow = {
              val r = ready; ready = null; r
            }
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyExec {
  /** Distinct keys a task buffers in heaps before the memory guard kicks
    * in (partial: flush; final: spillable sort fallback). */
  val MaxKeysConf = "spark.graft.topk.maxKeysInMemory"
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
