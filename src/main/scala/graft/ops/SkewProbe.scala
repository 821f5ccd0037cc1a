package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-distribution probes — the measurement step before any skew
  * mitigation (salting, AQE skew-join thresholds, broadcast decisions)
  * at 100 TB. Guessing whether a join key is skewed is how a 1000-
  * executor job ends up waiting on one straggler task; these probes
  * answer it with one aggregation pass, and their outputs are exact
  * integers (counts + basis-point shares, floor division) so the
  * measurement itself sits on the oracle gate.
  *
  * Plan shape: a grouped count (map-side partial) per input, a 1-row
  * total broadcast back over the result, and a TakeOrdered top-N — no
  * full sort, no collect, nothing proportional to key cardinality on
  * the driver.
  */
object SkewProbe {

  /** Per-key frequency of `key` in `df`: the top `topN` keys by count
    * with their corpus share in basis points, plus the constant
    * (n_keys, n_rows) context on every row. */
  def keyHistogram(df: DataFrame, key: Column, topN: Int): DataFrame = {
    val counts = df.groupBy(key.as("key")).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum("cnt").as("n_rows"),
      count(lit(1)).as("n_keys"))
    counts.crossJoin(broadcast(totals))
      .select(col("key"), col("cnt"),
        expr("(10000 * cnt) div n_rows").as("share_bp"),
        col("n_keys"), col("n_rows"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(topN)
  }

  /** Output-size forecast for an equi-join: per matching key, the rows
    * each side contributes and their product (the rows that key will
    * emit), top `topN` by fan-out with share of the TOTAL join output
    * in basis points. The stream-stream/self-join explosion detector:
    * run it before the join, not after the stage straggles. */
  def joinFanout(left: DataFrame, right: DataFrame,
                 leftKey: Column, rightKey: Column, topN: Int): DataFrame = {
    val cl = left.groupBy(leftKey.as("key")).agg(count(lit(1)).as("n_left"))
    val cr = right.groupBy(rightKey.as("key")).agg(count(lit(1)).as("n_right"))
    val j = cl.join(cr, Seq("key"))
      .select(col("key"), col("n_left"), col("n_right"),
        (col("n_left") * col("n_right")).as("fanout"))
    val total = j.agg(coalesce(sum("fanout"), lit(0L)).as("total_rows"))
    j.crossJoin(broadcast(total))
      .select(col("key"), col("n_left"), col("n_right"), col("fanout"),
        expr("case when total_rows = 0 then 0L" +
          " else (10000 * fanout) div total_rows end").as("share_bp"),
        col("total_rows"))
      .orderBy(col("fanout").desc, col("key"))
      .limit(topN)
  }
}
