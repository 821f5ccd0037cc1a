package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fused slop-serve kernel vs an independent brute-force anchor
  * counter: n_windows = |{a : every group has an occurrence v with
  * a ∈ [v − reach, v]}| — the definition both proximity (grp = offset)
  * and NEAR (grp = term) reduce to. Randomized inputs from a fixed
  * seed; long-grp and string-grp variants both exercised. */
class SlopWindowsSpec extends SparkSpec {
  import spark.implicits._

  /** Direct anchor enumeration over the support-interval union —
    * O(range × occurrences), fine at spec scale, shares no code with
    * the kernel. */
  private def brute(occ: Seq[(Int, Long)], reach: Long, quorum: Long): Long = {
    val groups = occ.map(_._1).distinct
    if (groups.size.toLong != quorum) return 0L
    if (occ.isEmpty) return 0L
    val lo = occ.map(_._2).min - reach
    val hi = occ.map(_._2).max
    (lo to hi).count { a =>
      groups.forall(g =>
        occ.exists { case (gg, v) => gg == g && a >= v - reach && a <= v })
    }.toLong
  }

  private def viaKernel(occ: Seq[(Int, Long)], reach: Long,
                        quorum: Long, stringGrp: Boolean): Long = {
    val df =
      if (stringGrp)
        occ.map { case (g, v) => (f"g$g%03d", v) }.toDF("grp", "v")
          .select(struct(col("grp"), col("v")).as("oa"))
      else
        occ.map { case (g, v) => (g.toLong, v) }.toDF("grp", "v")
          .select(struct(col("grp"), col("v")).as("oa"))
    df.agg(sort_array(collect_list(col("oa"))).as("oa"))
      .select(SlopWindows.slop_windows(col("oa"), lit(reach),
        lit(quorum)).as("n"))
      .head().getLong(0)
  }

  test("kernel equals brute-force anchor count on randomized inputs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 60) {
      val nGroups = 1 + rnd.nextInt(4)
      val occ = (0 until nGroups).flatMap { g =>
        Seq.fill(1 + rnd.nextInt(5))((g, rnd.nextInt(40).toLong))
      }.distinct
      val reach = rnd.nextInt(6).toLong
      // quorum sometimes deliberately unmet (drop a group's rows)
      val kept = if (trial % 5 == 4 && nGroups > 1)
        occ.filter(_._1 != 0) else occ
      val want = brute(kept, reach, nGroups.toLong)
      val gotL = viaKernel(kept, reach, nGroups.toLong, stringGrp = false)
      val gotS = viaKernel(kept, reach, nGroups.toLong, stringGrp = true)
      assert(gotL == want, s"trial $trial (long grp): $gotL != $want " +
        s"(occ=$kept reach=$reach quorum=$nGroups)")
      assert(gotS == want, s"trial $trial (string grp): $gotS != $want")
    }
  }

  test("edge shapes: single occurrence, adjacent islands, quorum miss") {
    // one occurrence, reach 0: exactly one anchor
    assert(viaKernel(Seq((0, 5L)), 0L, 1L, stringGrp = false) == 1L)
    // two groups sharing one position: intersection is that anchor set
    assert(viaKernel(Seq((0, 5L), (1, 5L)), 0L, 2L, stringGrp = false) == 1L)
    // islands exactly gap-adjacent merge: v=0 and v=reach+1 with reach=2
    // support [−2..0] ∪ [1..3] = contiguous [−2..3] → 6 anchors
    assert(viaKernel(Seq((0, 0L), (0, 3L)), 2L, 1L, stringGrp = false) == 6L)
    // gap one past merge: v=0, v=4, reach=2 → [−2..0] ∪ [2..4] → 3+3
    assert(viaKernel(Seq((0, 0L), (0, 4L)), 2L, 1L, stringGrp = false) == 6L)
    // quorum unmet short-circuits to 0
    assert(viaKernel(Seq((0, 5L)), 3L, 2L, stringGrp = false) == 0L)
  }

  test("generated and interpreted paths agree") {
    val occ = Seq((0, 1L), (0, 9L), (1, 4L), (1, 5L), (2, 7L))
    val df = occ.toDF("grp", "v")
      .select(struct(col("grp").cast("long").as("grp"), col("v")).as("oa"))
      .agg(sort_array(collect_list(col("oa"))).as("oa"))
      .select(SlopWindows.slop_windows(col("oa"), lit(3L), lit(3L)).as("n"))
    val gen = df.head().getLong(0)
    val prevWS = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val prevFM = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      assert(df.head().getLong(0) == gen)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prevWS)
      spark.conf.set("spark.sql.codegen.factoryMode", prevFM)
    }
    assert(gen == brute(occ, 3L, 3L))
  }
}
