package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewProbeSpec extends SparkSpec {
  import spark.implicits._

  test("keyHistogram: counts, shares, context columns, top-N order") {
    // 10 a, 5 b, 3 c, 2 d → 20 rows, 4 keys
    val df = (Seq.fill(10)("a") ++ Seq.fill(5)("b") ++ Seq.fill(3)("c") ++
      Seq.fill(2)("d")).toDF("k")
    val r = SkewProbe.keyHistogram(df, col("k"), topN = 3).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4)))
    assert(r.toSeq == Seq(
      ("a", 10L, 5000L, 4L, 20L),
      ("b", 5L, 2500L, 4L, 20L),
      ("c", 3L, 1500L, 4L, 20L)))
  }

  test("keyHistogram: count ties break by key for a stable top-N") {
    val df = Seq("b", "a", "b", "a").toDF("k")
    val r = SkewProbe.keyHistogram(df, col("k"), topN = 1).collect()
    assert(r.head.getString(0) == "a")
  }

  test("joinFanout forecasts per-key output size of the join exactly") {
    val left = Seq(1L, 1L, 1L, 2L, 3L).toDF("k")
    val right = Seq(1L, 1L, 2L, 9L).toDF("k")
    val probe = SkewProbe.joinFanout(left, right, col("k"), col("k"), 10)
      .collect().map(x => (x.getLong(0), x.getLong(3), x.getLong(4)))
    // key 1: 3*2=6 rows, key 2: 1*1=1; key 3 and 9 don't match
    assert(probe.toSeq == Seq((1L, 6L, 8571L), (2L, 1L, 1428L)))
    // the forecast equals the real join's output size per key
    val real = left.join(right, Seq("k")).groupBy("k").count()
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(real == Map(1L -> 6L, 2L -> 1L))
  }

  test("joinFanout: disjoint keys → empty forecast, no divide-by-zero") {
    val left = Seq(1L).toDF("k")
    val right = Seq(2L).toDF("k")
    assert(SkewProbe.joinFanout(left, right, col("k"), col("k"), 5)
      .collect().isEmpty)
  }
}
