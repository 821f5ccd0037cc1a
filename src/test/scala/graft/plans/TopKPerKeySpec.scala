package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Custom operator tests: TopKPerKey must agree with the window-function
  * formulation on real data, across shuffles, with deterministic
  * tiebreaks. */
class TopKPerKeySpec extends SparkSpec {

  private def withStrategy[T](f: => T): T = {
    val prev = spark.experimental.extraStrategies
    spark.experimental.extraStrategies = prev :+ TopKPerKeyStrategy
    try f finally spark.experimental.extraStrategies = prev
  }

  test("topKPerKey matches row_number window on orders") {
    withStrategy {
      val orders = Tables.orders(spark, sf)
      val viaOp = GraftOps.topKPerKey(orders,
        Seq(col("o_custkey")),
        Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
        .select("o_custkey", "o_orderkey").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val viaWindow = orders.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).select("o_custkey", "o_orderkey").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaOp == viaWindow)
      assert(viaOp.nonEmpty)
    }
  }

  test("plan contains TopKPerKeyExec and an exchange on the key") {
    withStrategy {
      val df = GraftOps.topKPerKey(Tables.orders(spark, sf),
        Seq(col("o_custkey")), Seq(col("o_totalprice").desc), 2)
      val physical = df.queryExecution.executedPlan.toString()
      assert(physical.contains("TopKPerKey"))
      assert(physical.contains("Exchange hashpartitioning(o_custkey"))
      assert(!physical.contains("Sort "),
        s"no sort should be planned:\n$physical")
    }
  }

  test("k larger than group size returns whole groups") {
    withStrategy {
      import spark.implicits._
      val df = Seq(("a", 1), ("a", 2), ("b", 5)).toDF("k", "v")
      val out = GraftOps.topKPerKey(df, Seq(col("k")), Seq(col("v").desc), 10)
        .collect().map(r => (r.getString(0), r.getInt(1))).toSet
      assert(out == Set(("a", 1), ("a", 2), ("b", 5)))
    }
  }
}
