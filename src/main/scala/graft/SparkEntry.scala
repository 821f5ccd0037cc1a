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
    MultimodalQueries, StreamingQueries, PipelineQueries, FunctionQueries,
    TemporalQueries, SamplingQueries, HygieneQueries, IngestQueries,
    SinkQueries, GraphQueries, ProbeQueries, IncrementalQueries,
    StreamGateQueries, SelectionQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full reference lifecycle end-to-end: validity-gated idempotent
    * enqueue → access-path cascade → weighted signal fusion → renderer
    * escalation → keyed write-back with provenance (SURVEY.md §3.1). */
  def entry(spark: SparkSession): DataFrame =
    PipelineQueries.all("pipeline_end_to_end")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_.all).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_.oracles).reduce(_ ++ _)
}
