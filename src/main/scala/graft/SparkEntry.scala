package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY.md §2
  * (plus the north-star LLM-pipeline operators); `oracleSql` carries the
  * DuckDB-equivalent ANSI SQL for each hash-compared entry.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    StarQueries, EtlQueries, TextQueries, DedupQueries, SimilarityQueries,
    MultimodalQueries, StreamingQueries, PipelineQueries, FunctionQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Full star join + exact-decimal revenue rollup per region/priority. */
  def entry(spark: SparkSession): DataFrame =
    StarQueries.all("join_star_schema")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_.all).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_.oracles).reduce(_ ++ _)
}
