package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.IncrementalAgg
import graft.ops.IncrementalAgg.Measure

/** Materialized-view maintenance on the oracle gate: the pricing rollup
  * kept as a parquet partial-state table and folded forward batch by
  * batch, compared against DuckDB's flat full-table aggregation — the
  * hash match certifies incremental == batch EXACTLY (decimal sums, so
  * merge order cannot drift the result). */
object IncrementalQueries extends QueryModule {

  private val keys = Seq("l_returnflag", "l_linestatus")
  private def measures = Seq(
    Measure("sum_qty", "sum", col("l_quantity").cast("decimal(18,2)")),
    Measure("sum_price", "sum", col("l_extendedprice").cast("decimal(18,2)")),
    Measure("n_rows", "count", lit(1)),
    Measure("min_price", "min", col("l_extendedprice")),
    Measure("max_price", "max", col("l_extendedprice")))

  /** Historical state built and ROUND-TRIPPED through parquet (the
    * stored-view lifecycle, not just an in-memory fold), then the
    * post-cutoff delta merged in and finalized. The average is derived
    * at read time from the stored sum+count — never a stored float. */
  private def incrementalAgg(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val cutoff = "1999-01-01"
    val store = Dsl.tempDir("graft_mv") + "/state"
    IncrementalAgg.state(li.filter(col("l_shipdate") < lit(cutoff)),
        keys.map(col), measures)
      .write.mode("overwrite").parquet(store)
    val delta = IncrementalAgg.state(
      li.filter(col("l_shipdate") >= lit(cutoff)), keys.map(col), measures)
    IncrementalAgg.merge(Seq(s.read.parquet(store), delta), keys, measures)
      .select(col("l_returnflag"), col("l_linestatus"),
        col("sum_qty").cast("double").as("sum_qty"),
        col("n_rows"), col("min_price"), col("max_price"),
        (col("sum_price").cast("double") / col("n_rows")).as("avg_price"))
  }

  private val incrementalAggSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n_rows,
      |  MIN(l_extendedprice) AS min_price,
      |  MAX(l_extendedprice) AS max_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      |    AS avg_price
      |FROM lineitem GROUP BY 1, 2""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m8_incremental_agg" -> incrementalAgg _)

  def oracles: Map[String, String] = Map(
    "m8_incremental_agg" -> incrementalAggSql)
}
