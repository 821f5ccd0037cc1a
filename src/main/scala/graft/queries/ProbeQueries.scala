package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.SkewProbe

/** Skew / fan-out measurement queries ([[SkewProbe]]) — exact-integer
  * scorecards (counts + basis-point shares) so the diagnostics
  * themselves are hash-compared against DuckDB. */
object ProbeQueries extends QueryModule {

  /** Order-count distribution over customers: who would straggle a
    * customer-keyed shuffle. */
  private def keySkew(s: SparkSession, dir: String): DataFrame =
    SkewProbe.keyHistogram(Tables.orders(s, dir), col("o_custkey"), topN = 20)

  private val keySkewSql =
    """WITH counts AS (
      |  SELECT o_custkey AS key, COUNT(*) AS cnt FROM orders GROUP BY 1),
      |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows, COUNT(*) AS n_keys
      |      FROM counts)
      |SELECT key, cnt, (10000 * cnt) // (SELECT n_rows FROM t) AS share_bp,
      |  (SELECT n_keys FROM t) AS n_keys, (SELECT n_rows FROM t) AS n_rows
      |FROM counts ORDER BY cnt DESC, key LIMIT 20""".stripMargin

  /** Self-join explosion forecast on events.user_id — the per-key
    * output sizes a user-keyed stream-stream join would emit, measured
    * BEFORE running it. */
  private def joinFanout(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    SkewProbe.joinFanout(e, e, col("user_id"), col("user_id"), topN = 20)
  }

  private val joinFanoutSql =
    """WITH c AS (
      |  SELECT user_id AS key, COUNT(*) AS n FROM events GROUP BY 1),
      |j AS (
      |  SELECT a.key, a.n AS n_left, b.n AS n_right,
      |    a.n * b.n AS fanout
      |  FROM c a JOIN c b ON a.key = b.key),
      |t AS (SELECT CAST(COALESCE(SUM(fanout), 0) AS BIGINT) AS total FROM j)
      |SELECT key, n_left, n_right, fanout,
      |  CASE WHEN (SELECT total FROM t) = 0 THEN 0
      |       ELSE (10000 * fanout) // (SELECT total FROM t) END AS share_bp,
      |  (SELECT total FROM t) AS total_rows
      |FROM j ORDER BY fanout DESC, key LIMIT 20""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m8_key_skew"    -> keySkew _,
    "m8_join_fanout" -> joinFanout _)

  def oracles: Map[String, String] = Map(
    "m8_key_skew"    -> keySkewSql,
    "m8_join_fanout" -> joinFanoutSql)
}
