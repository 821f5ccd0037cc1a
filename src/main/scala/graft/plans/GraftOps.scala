package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.SortOrder
import org.apache.spark.sql.graftbridge.Bridge

/** DataFrame facade for the custom operators. */
object GraftOps {

  /** Top-k rows per key via the [[TopKPerKey]] operator (bounded heap,
    * no sort). `order` columns use the usual `.desc`/`.asc` forms; plain
    * columns default to ascending.
    *
    * Plans as TWO operators — a partial (map-side) top-k on the child's
    * existing partitioning, then the final top-k after the exchange — so
    * the shuffle carries at most k rows per key per upstream task instead
    * of every candidate row. Per-task heap memory is bounded by
    * `spark.graft.topk.maxKeysInMemory` keys × k rows; past the bound the
    * partial operator flushes (degrade-to-passthrough, like a partial
    * hash agg) and the final operator falls back to a spillable external
    * sort — pathological key cardinality spills instead of OOMing.
    *
    * Registers [[TopKPerKeyStrategy]] on the session if absent (also
    * installed globally by [[graft.GraftExtensions]]). */
  def topKPerKey(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                 k: Int): DataFrame = {
    require(k > 0, s"topKPerKey: k must be positive, got $k")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val keyExprs = keys.map(Bridge.expressionNow(spark, _))
    val orderExprs = order.map { c =>
      Bridge.expressionNow(spark, c) match {
        case so: SortOrder => so
        case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    Bridge.ofRows(spark,
      TopKPerKey(keyExprs, orderExprs, k,
        TopKPerKey(keyExprs, orderExprs, k, Bridge.logicalPlan(df),
          partial = true)))
  }

  /** Map-side-only cap: at most k rows per key PER TASK, chosen by
    * `order`, with NO exchange — the child's partitioning and plan shape
    * are preserved. Not a global cut (a key spread over t tasks keeps up
    * to t×k rows); use where the point is bounding per-task work for hot
    * keys without forcing a shuffle, e.g. capping LSH bucket fan-in on a
    * scan that a broadcast join consumes in place.
    *
    * CAVEAT — the per-task cap is itself best-effort, not a hard bound:
    * past `spark.graft.topk.maxKeysInMemory` distinct keys in one task,
    * the partial operator flushes its heaps (the same degrade-to-
    * passthrough a partial hash agg does) and starts fresh, so a key can
    * emit up to k rows per flush window. With no final operator after an
    * exchange to re-cut, that superset reaches the consumer. This is the
    * deliberate trade — the alternative is an OOM or a forced shuffle —
    * but it means: use this only where the cap is a performance bound
    * (candidate limiting), never where >k rows per key per task would be
    * a correctness error. Raise `maxKeysInMemory` if the flush metric
    * fires on a workload where the cap matters. */
  def capPerKeyLocal(df: DataFrame, keys: Seq[Column], order: Seq[Column],
                     k: Int): DataFrame = {
    require(k > 0, s"capPerKeyLocal: k must be positive, got $k")
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    val keyExprs = keys.map(Bridge.expressionNow(spark, _))
    val orderExprs = order.map { c =>
      Bridge.expressionNow(spark, c) match {
        case so: SortOrder => so
        case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    Bridge.ofRows(spark,
      TopKPerKey(keyExprs, orderExprs, k, Bridge.logicalPlan(df),
        partial = true))
  }
}
