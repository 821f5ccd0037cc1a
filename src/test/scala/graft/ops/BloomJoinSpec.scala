package graft.ops

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** [[BloomJoin]]: bloom-prefiltered joins must return EXACTLY the plain
  * join's rows (the bloom is a shuffle reducer, never a semantics change),
  * and the two variants must partition the probe side. */
class BloomJoinSpec extends SparkSpec {

  private lazy val orders = Tables.orders(spark, sf)
  private lazy val returned = Tables.lineitem(spark, sf)
    .filter(col("l_returnflag") === "R").select(col("l_orderkey"))

  test("bloom semi join equals plain left-semi join") {
    val bloomed = BloomJoin.semiJoin(orders, returned,
        col("o_orderkey"), col("l_orderkey"), expectedItems = 10000L)
      .select("o_orderkey")
    val plain = orders
      .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_orderkey")
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
    assert(plain.count() > 0)
  }

  test("bloom anti join equals plain left-anti join") {
    val bloomed = BloomJoin.antiJoin(orders, returned,
        col("o_orderkey"), col("l_orderkey"), expectedItems = 10000L)
      .select("o_orderkey")
    val plain = orders
      .join(returned, col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select("o_orderkey")
    assert(bloomed.exceptAll(plain).isEmpty && plain.exceptAll(bloomed).isEmpty)
    assert(plain.count() > 0)
  }

  test("semi and anti partition the probe side") {
    val nSemi = BloomJoin.semiJoin(orders, returned,
      col("o_orderkey"), col("l_orderkey"), expectedItems = 10000L).count()
    val nAnti = BloomJoin.antiJoin(orders, returned,
      col("o_orderkey"), col("l_orderkey"), expectedItems = 10000L).count()
    assert(nSemi + nAnti == orders.count())
  }

  test("a tight bloom rejects most non-members before the exact confirm") {
    // build over a tiny key set; probe with disjoint keys — the bloom
    // should reject nearly all of them at 3% fpp (prefilter actually cuts)
    import spark.implicits._
    val build = (1 to 100).toDF("k")
    val bloom = BloomJoin.buildBloom(build, col("k"), expectedItems = 100L)
    val probe = (10001 to 20000).toDF("k")
    val passed = probe.where(BloomJoin.mightContain(probe, col("k"), bloom)).count()
    assert(passed < 1000, s"bloom passed $passed of 10000 non-members")
  }
}
