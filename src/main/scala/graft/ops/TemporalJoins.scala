package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators: as-of join and point-in-interval range join.
  *
  * Neither exists as a single Spark SQL operator; both are composed here
  * in the shapes that survive 100 TB:
  *
  *  - [[asofJoin]] is the union + running-window formulation: ONE shuffle
  *    and sort on the key, then a linear scan with O(1) running state per
  *    partition — no join explosion, no per-row range probe. This is the
  *    standard distributed as-of shape (kdb's `aj` / pandas `merge_asof`
  *    semantics, done as a window).
  *  - [[pointInInterval]] buckets time into fixed-width bins and
  *    equi-joins on (key, bin): each interval replicates into only the
  *    bins it covers (width/bucket + 1 rows), so the planner never falls
  *    back to a broadcast-nested-loop or cartesian range join, and the
  *    shuffle is a plain hash exchange either side. The exact predicate
  *    re-filters after the bin join, so binning is a lossless
  *    candidate generator — same design as the LSH band joins in
  *    [[graft.dedup.Dedup]].
  */
object TemporalJoins {

  /** As-of join: for each left row, attach the right row with the
    * greatest timestamp ≤ the left row's timestamp within the same key
    * (left-outer: unmatched left rows keep a null struct).
    *
    * The right side must be unique per (key, ts) — pre-aggregate if not —
    * or the surviving row among ties is undefined. All left columns come
    * back at the top level; the matched right row arrives as one struct
    * column `asofColName` (null when no right row precedes).
    *
    * Mechanics: tag sides, union, and take `last(right_struct,
    * ignoreNulls)` over a running window ordered by (ts, side) — right
    * rows sort before left rows at equal ts, which is what makes the
    * match inclusive (≤). Cost at any scale: one hash exchange on the
    * key + one sort; running-frame `last` keeps O(1) state.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: Column, rightKey: Column,
               leftTs: Column, rightTs: Column,
               asofColName: String = "asof",
               direction: String = "backward",
               toleranceMicros: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward: $direction")
    val lStruct = struct(left.columns.map(left(_)): _*)
    val rStruct = struct(right.columns.map(right(_)): _*)
    val l2 = left.select(leftKey.as("_gk"), leftTs.as("_gts"), lStruct.as("_gl"))
    val r2 = right.select(rightKey.as("_gk"), rightTs.as("_gts"), rStruct.as("_gr"))
    val u = l2
      .withColumn("_gr", lit(null).cast(r2.schema("_gr").dataType))
      .withColumn("_gside", lit(1))
      .unionByName(r2
        .withColumn("_gl", lit(null).cast(l2.schema("_gl").dataType))
        .withColumn("_gside", lit(0)))
    // backward scans time ascending (last right at-or-before); forward
    // scans descending (last right seen = nearest at-or-after). Right
    // rows order before left at equal ts either way → inclusive match.
    val tsOrder = if (direction == "backward") col("_gts").asc else col("_gts").desc
    val w = Window.partitionBy("_gk").orderBy(tsOrder, col("_gside"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = u
      .withColumn("_gasof", last(col("_gr"), ignoreNulls = true).over(w))
      .withColumn("_gmts", last(when(col("_gside") === 0, col("_gts")),
        ignoreNulls = true).over(w))
      .filter(col("_gside") === 1)
    // tolerance nulls out a match farther than Δ — as-of semantics pick
    // THE nearest row first, so a too-far nearest means no match at all
    val gated = toleranceMicros match {
      case None => matched
      case Some(tol) =>
        val dist = abs(unix_micros(col("_gts")) - unix_micros(col("_gmts")))
        matched.withColumn("_gasof",
          when(col("_gmts").isNotNull && dist <= tol, col("_gasof")))
    }
    gated.select(col("_gl.*") +: Seq(col("_gasof").as(asofColName)): _*)
  }

  /** Range join (point-in-interval): pairs each point row with every
    * interval row of the same key whose [start, end) half-open interval
    * contains the point. Timestamp columns must share a unit; `start`,
    * `end`, `point` are compared directly and additionally mapped to
    * `bucketMicros`-wide bins via `unix_micros` for the candidate join.
    *
    * Output: all point columns at top level + the matched interval row as
    * struct column `intervalColName` (inner semantics — points in no
    * interval drop out; a point inside k overlapping intervals yields k
    * rows).
    *
    * Pick `bucketMicros` near the typical interval width: replication
    * factor is width/bucket + 1 per interval, and a bucket much larger
    * than the width degrades toward per-key all-pairs.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointKey: Column, intervalKey: Column,
                      point: Column, start: Column, end: Column,
                      bucketMicros: Long,
                      intervalColName: String = "interval"): DataFrame = {
    require(bucketMicros > 0, s"bucketMicros must be positive: $bucketMicros")
    val pStruct = struct(points.columns.map(points(_)): _*)
    val iStruct = struct(intervals.columns.map(intervals(_)): _*)
    val p2 = points.select(pointKey.as("_gk"), unix_micros(point).as("_gp"),
      pStruct.as("_gpt"))
      .withColumn("_gbin", floor(col("_gp") / bucketMicros))
    // Half-open [start, end): the last covered bin is the one holding
    // end - 1 microsecond, so zero-width intervals cover no bin.
    val i2 = intervals.select(intervalKey.as("_gk"),
      unix_micros(start).as("_gs"), unix_micros(end).as("_ge"),
      iStruct.as("_giv"))
      .filter(col("_gs") < col("_ge"))
      .withColumn("_gbin",
        explode(sequence(floor(col("_gs") / bucketMicros),
          floor((col("_ge") - 1) / bucketMicros))))
    p2.join(i2, Seq("_gk", "_gbin"))
      .filter(col("_gp") >= col("_gs") && col("_gp") < col("_ge"))
      .select(col("_gpt.*") +: Seq(col("_giv").as(intervalColName)): _*)
  }
}
