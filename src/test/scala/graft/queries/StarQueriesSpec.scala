package graft.queries

import graft.SparkSpec

class StarQueriesSpec extends SparkSpec {

  test("every star query runs and returns rows on sf0.001") {
    StarQueries.all.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("every star query has an oracle (the sketch gates its error bound)") {
    assert(StarQueries.oracles.keySet.subsetOf(StarQueries.all.keySet))
    assert(StarQueries.all.keySet == StarQueries.oracles.keySet)
  }

  test("pricing summary groups are the 6 flag/status combos") {
    val rows = StarQueries.all("agg_pricing_summary")(spark, sf).collect()
    assert(rows.length == 6)
    val flags = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(flags.subsetOf(Set(("A", "F"), ("N", "F"), ("N", "O"), ("R", "F"),
      ("A", "O"), ("R", "O"))))
  }

  test("window rank keeps at most 3 rows per customer") {
    val df = StarQueries.all("window_rank")(spark, sf)
    val over = df.groupBy("o_custkey").count().filter("count > 3").count()
    assert(over == 0)
  }

  test("semi+anti partition the customer set") {
    val semi = StarQueries.all("join_semi")(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_customers")).collect()(0).getLong(0)
    val anti = StarQueries.all("join_anti")(spark, sf).count()
    val total = graft.Tables.customer(spark, sf).count()
    assert(semi <= total && anti <= total)
  }
}
