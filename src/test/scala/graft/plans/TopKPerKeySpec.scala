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

  test("memory guard: key cardinality past the bound stays correct " +
      "(partial flush + final sort fallback)") {
    withStrategy {
      // 3000 distinct keys, ~5 rows each, bound of 25 keys per task:
      // every task exceeds the bound, so the partial operator flushes
      // mid-stream and the final operator takes the spillable-sort path —
      // the result must still match the window formulation exactly
      spark.conf.set(TopKPerKeyExec.MaxKeysConf, "25")
      try {
        val df = spark.range(0, 15000).select(
          (col("id") % 3000).as("k"),
          (col("id") * 2654435761L % 997).as("v"),
          col("id").as("tb"))
        val viaOp = GraftOps.topKPerKey(df,
          Seq(col("k")), Seq(col("v").desc, col("tb")), 2)
        val got = viaOp.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("k")).orderBy(col("v").desc, col("tb"))
        val want = df.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2).select("k", "tb").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got == want, s"guard path diverged: ${got.size} vs ${want.size}")
        // the guard must actually have engaged
        def find(p: org.apache.spark.sql.execution.SparkPlan)
            : Seq[TopKPerKeyExec] = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            find(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            find(q.plan)
          case t: TopKPerKeyExec => t +: t.children.flatMap(find)
          case other => other.children.flatMap(find)
        }
        val execs = find(viaOp.queryExecution.executedPlan)
        assert(execs.nonEmpty)
        val flushes = execs.map(_.metrics("partialFlushes").value).sum
        val fallbacks = execs.map(_.metrics("sortFallbacks").value).sum
        assert(flushes > 0, "partial flush never engaged")
        assert(fallbacks > 0, "sort fallback never engaged")
      } finally spark.conf.unset(TopKPerKeyExec.MaxKeysConf)
    }
  }
}
