package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics and plan-shape tests for the temporal join operators. */
class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin: greatest right ts <= left ts per key, inclusive, left-outer") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "l1"),
      (1L, ts("2024-01-01 10:05:00"), "l2"),
      (1L, ts("2024-01-01 09:00:00"), "l0"), // before any right row
      (2L, ts("2024-01-01 10:00:00"), "l3")  // key with no right rows
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), "r_eq"),   // equal ts: must match (<=)
      (1L, ts("2024-01-01 10:03:00"), "r_mid")
    ).toDF("rk", "rt", "rv")
    val out = TemporalJoins.asofJoin(left, right,
        col("k"), col("rk"), col("t"), col("rt"))
      .select(col("tag"), col("asof.rv").as("rv"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("l1") == "r_eq")   // inclusive: equal-ts right row matches
    assert(out("l2") == "r_mid")  // greatest preceding, not first
    assert(out("l0") == null)     // nothing at-or-before
    assert(out("l3") == null)     // key absent on the right
  }

  test("asofJoin forward direction and tolerance gating") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "l1"),
      (1L, ts("2024-01-01 11:00:00"), "l2")
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:30"), "r1"),
      (1L, ts("2024-01-01 12:00:00"), "r2")
    ).toDF("rk", "rt", "rv")
    val fwd = TemporalJoins.asofJoin(left, right,
        col("k"), col("rk"), col("t"), col("rt"), direction = "forward")
      .select(col("tag"), col("asof.rv").as("rv"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fwd("l1") == "r1") // nearest AT-OR-AFTER, not the later one
    assert(fwd("l2") == "r2")
    // 10-minute tolerance: l1's nearest (30s away) survives; l2's
    // nearest (1h away) is nulled — NOT replaced by a farther row
    val tol = TemporalJoins.asofJoin(left, right,
        col("k"), col("rk"), col("t"), col("rt"), direction = "forward",
        toleranceMicros = Some(10L * 60 * 1000 * 1000))
      .select(col("tag"), col("asof.rv").as("rv"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(tol("l1") == "r1" && tol("l2") == null)
  }

  test("asofJoin plans one exchange on the key, no join node") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"), "x")).toDF("k", "t", "tag")
    val right = Seq((1L, ts("2024-01-01 09:00:00"), "y")).toDF("rk", "rt", "rv")
    val plan = TemporalJoins.asofJoin(left, right,
        col("k"), col("rk"), col("t"), col("rt"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"), "expected the running-window formulation")
  }

  test("pointInInterval: half-open bounds, multi-bucket spans, overlaps") {
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p_start"), // == start: in
      (1L, ts("2024-01-01 10:10:00"), "p_end"),   // == end: out
      (1L, ts("2024-01-01 10:09:59"), "p_in"),
      (1L, ts("2024-01-01 09:59:59"), "p_before"),
      (2L, ts("2024-01-01 10:05:00"), "p_otherkey")
    ).toDF("k", "t", "tag")
    val intervals = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:10:00"), "iv1"),
      (1L, ts("2024-01-01 10:09:00"), ts("2024-01-01 10:11:00"), "iv2")
    ).toDF("ik", "s", "e", "iv")
    // 1-minute buckets: iv1 spans 10 buckets, iv2 spans 3
    val out = TemporalJoins.pointInInterval(points, intervals,
        col("k"), col("ik"), col("t"), col("s"), col("e"),
        bucketMicros = 60L * 1000 * 1000)
      .select(col("tag"), col("interval.iv").as("iv"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(
      "p_start" -> "iv1",
      "p_in" -> "iv1", "p_in" -> "iv2",  // overlap: one row per interval
      "p_end" -> "iv2"))                 // end-exclusive for iv1, inside iv2
  }

  test("pointInInterval replicates intervals per bucket, never cartesian") {
    val points = Seq((1L, ts("2024-01-01 10:00:30"), "p")).toDF("k", "t", "tag")
    val intervals = Seq((1L, ts("2024-01-01 10:00:00"),
      ts("2024-01-01 10:02:00"), "iv")).toDF("ik", "s", "e", "iv")
    val plan = TemporalJoins.pointInInterval(points, intervals,
        col("k"), col("ik"), col("t"), col("s"), col("e"),
        bucketMicros = 60L * 1000 * 1000)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"range join must stay an equi-join on (key, bin):\n$plan")
    // zero-width interval covers no bin at all
    val empty = TemporalJoins.pointInInterval(points,
      Seq((1L, ts("2024-01-01 10:00:30"), ts("2024-01-01 10:00:30"), "z"))
        .toDF("ik", "s", "e", "iv"),
      col("k"), col("ik"), col("t"), col("s"), col("e"),
      bucketMicros = 60L * 1000 * 1000)
    assert(empty.count() == 0)
  }
}
