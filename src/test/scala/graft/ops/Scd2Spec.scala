package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** SCD2 history builder semantics (ops.Scd2): consecutive-value collapse,
  * interval chaining, null handling, and point-in-time lookup. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def t(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  private val feed = Seq(
    // key 1: a -> a -> b -> b -> a  (collapses to a, b, a)
    (1L, t(1), 1L, Some("a")),
    (1L, t(2), 2L, Some("a")),
    (1L, t(3), 3L, Some("b")),
    (1L, t(4), 4L, Some("b")),
    (1L, t(5), 5L, Some("a")),
    // key 2: starts null -> x (the null epoch must be kept)
    (2L, t(1), 6L, None),
    (2L, t(2), 7L, Some("x")),
    // key 3: single observation stays open
    (3L, t(9), 8L, Some("z"))
  ).toDF("k", "ts", "seq", "v")

  private lazy val hist =
    Scd2.buildHistory(feed, col("k"), col("ts"), col("seq"), col("v"))
      .orderBy("key", "valid_from")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getBoolean(4)))

  test("consecutive identical values collapse into one epoch") {
    val k1 = hist.filter(_._1 == 1L)
    assert(k1.map(_._2) sameElements Array(Some("a"), Some("b"), Some("a")))
    // epochs chain: each valid_to equals the next valid_from
    assert(k1(0)._4.contains(k1(1)._3) && k1(1)._4.contains(k1(2)._3))
    assert(k1(2)._4.isEmpty && k1(2)._5) // last epoch open + current
  }

  test("an initial null value is a real epoch, not a dropped row") {
    val k2 = hist.filter(_._1 == 2L)
    assert(k2.map(_._2) sameElements Array(None, Some("x")))
    assert(k2(0)._3 == t(1) && k2(0)._4.contains(t(2)))
  }

  test("point-in-time lookup returns exactly the covering epoch") {
    val full = Scd2.buildHistory(feed, col("k"), col("ts"), col("seq"), col("v"))
    val at = Scd2.asOf(full, lit(t(4)))
      .select("key", "attr").as[(Long, Option[String])].collect().toSet
    // at 00:04 -- key1 is in its b-epoch, key2 in x, key3 not yet born
    assert(at == Set((1L, Some("b")), (2L, Some("x"))))
  }

  test("the two window passes plan a single exchange") {
    val plan = Scd2.buildHistory(feed, col("k"), col("ts"), col("seq"), col("v"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges:\n$plan")
  }
}
