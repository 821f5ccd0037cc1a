package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import Dsl._

/** Event-time windowing + stream-semantics demos over `events`
  * (SURVEY.md §2.10 north-star streaming parity). The driver contract is
  * batch, so these run the same `window()`/dedup expressions a streaming
  * query would (graft.streaming.EventStreams runs them with readStream +
  * watermark; StreamingSpec asserts batch/stream agreement). Oracles
  * recompute the epoch-aligned buckets with integer microsecond math. */
object StreamingQueries extends QueryModule {

  /** T-window: 5-minute tumbling windows per event type. */
  private def tumbling(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum2d(col("value")).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  private val tumblingSql =
    """SELECT make_timestamp((epoch_us(ts) // 300000000) * 300000000)
      |    AS window_start,
      |  event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Sliding windows: 10-minute windows sliding every 5. Each event lands
    * in two windows; the oracle unions the two shifted bucket starts. */
  private def sliding(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("n"))

  private val slidingSql =
    """WITH starts AS (
      |  SELECT make_timestamp((epoch_us(ts) // 300000000) * 300000000)
      |    AS window_start FROM events
      |  UNION ALL
      |  SELECT make_timestamp(((epoch_us(ts) // 300000000) - 1) * 300000000)
      |    AS window_start FROM events)
      |SELECT window_start, COUNT(*) AS n FROM starts GROUP BY 1""".stripMargin

  /** T5 idempotent ingest: duplicate-heavy stream deduped on the event key
    * (batch analog of dropDuplicatesWithinWatermark). */
  private def streamDedup(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    ev.union(ev.filter(col("event_id") % 2 === 0)) // replay half the stream
      .dropDuplicates("event_id")
      .groupBy("event_type").agg(count(lit(1)).as("n"))
  }

  private val streamDedupSql =
    """SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1""".stripMargin

  /** S4 CDC-style ingest: JSON props extraction + change filter. */
  private def cdcIngest(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_type").isin("signup", "purchase"))
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), max("k").as("max_k"))

  private val cdcIngestSql =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
      |  MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
      |FROM events WHERE event_type IN ('signup', 'purchase')
      |GROUP BY 1""".stripMargin

  /** Session windows (5-minute inactivity gap) per user: batch analog via
    * the classic gaps-and-islands window expression. */
  private def sessionize(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val ev = Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 300, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    ev.groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), dsum2d(col("value")).as("session_value"))
  }

  private val sessionizeSql =
    """WITH marked AS (
      |  SELECT user_id, value, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts)//1000000 - epoch_us(lag(ts) OVER w)//1000000 > 300
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, value,
      |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM marked)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
      |FROM sessions GROUP BY 1, 2""".stripMargin

  /** T4 two-stage handoff (batch analog of the parse-queue → notes-queue
    * pipeline, reference §T4; streaming twin in
    * `graft.streaming.EventStreams.twoStageHandoff`): stage 1 keeps rows
    * that parsed ok and still need notes, stage 2 hands them to the notes
    * queue through the idempotent enqueue (validity gate + anti-join
    * against in-flight rows). */
  private def t4TwoStageHandoff(s: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    val parsed = Tables.orders(s, dir).select(
      col("o_orderpriority").as("sheet_name"), k.as("row_index"),
      concat(lit("https://jobs.example.com/post/"), k).as("url"),
      when(k % 3 === 0, lit("ok")).otherwise(lit("error")).as("status"),
      (k % 4 === 1).as("has_notes"))
    val needNotes = parsed
      .filter(col("status") === "ok" && !col("has_notes"))
      .select("sheet_name", "row_index", "url")
    val notesQueue = Tables.orders(s, dir).filter(k % 9 === 0)
      .select(col("o_orderpriority").as("sheet_name"), k.as("row_index"),
        lit("queued").as("status"))
    graft.pipeline.Queues.enqueue(needNotes, notesQueue)
      .groupBy("sheet_name").agg(count(lit(1)).as("n_handed_off"))
  }

  private val t4Sql =
    """SELECT o_orderpriority AS sheet_name, COUNT(*) AS n_handed_off
      |FROM orders
      |WHERE o_orderkey % 3 = 0 AND o_orderkey % 4 <> 1 AND o_orderkey % 9 <> 0
      |GROUP BY 1""".stripMargin

  /** T7 stream-static enrichment: the event stream joined to a broadcast
    * dimension (customer segment), then windowed per segment — the
    * standard Structured-Streaming enrichment shape (stream-static joins
    * need no watermark on the static side; the dim broadcasts to every
    * micro-batch). Batch analog here; the plan is identical: broadcast
    * hash join under the windowed aggregation, the stream side never
    * shuffles for the join. */
  private def t7StreamStaticJoin(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .join(broadcast(Tables.customer(s, dir)),
        col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "15 minutes"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), dsum2d(col("value")).as("revenue"))
      .select(col("window.start").as("window_start"), col("c_mktsegment"),
        col("n"), col("revenue"))

  private val t7Sql =
    """SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000)
      |    AS window_start,
      |  c_mktsegment, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY 1, 2""".stripMargin

  /** T8 stream-stream interval join (batch analog of
    * [[graft.streaming.EventStreams.attributionJoin]]; StreamingSpec
    * asserts the streaming twin produces the same rows): each purchase
    * attributed to the same user's views in the preceding hour. The
    * equi-key keeps it a plain shuffled hash/merge join; the interval
    * predicate is a post-join filter — at cluster scale the state bound
    * comes from the watermark, in batch from the equi-key partitioning. */
  private def t8Attribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("value").as("v_value"))
    purchases.join(views,
        col("v_user") === col("p_user") &&
          col("v_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("v_ts") < col("p_ts"))
      .groupBy(col("p_id").as("event_id"))
      .agg(count(lit(1)).as("n_views"), dsum2d(col("v_value")).as("view_value"))
  }

  private val t8Sql =
    """SELECT p.event_id, COUNT(*) AS n_views,
      |  CAST(SUM(CAST(v.value AS DECIMAL(18,2))) AS DOUBLE) AS view_value
      |FROM events p JOIN events v ON v.user_id = p.user_id
      |  AND p.event_type = 'purchase' AND v.event_type = 'view'
      |  AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts < p.ts
      |GROUP BY 1""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t8_stream_stream_join" -> t8Attribution _,
    "t7_stream_static_join" -> t7StreamStaticJoin _,
    "t4_two_stage_handoff" -> t4TwoStageHandoff _,
    "t_window_tumbling" -> tumbling _,
    "t_window_sliding"  -> sliding _,
    "t5_stream_dedup"   -> streamDedup _,
    "s4_cdc_ingest"     -> cdcIngest _,
    "t_sessionize"      -> sessionize _)

  def oracles: Map[String, String] = Map(
    "t8_stream_stream_join" -> t8Sql,
    "t7_stream_static_join" -> t7Sql,
    "t4_two_stage_handoff" -> t4Sql,
    "t_window_tumbling" -> tumblingSql,
    "t_window_sliding"  -> slidingSql,
    "t5_stream_dedup"   -> streamDedupSql,
    "s4_cdc_ingest"     -> cdcIngestSql,
    "t_sessionize"      -> sessionizeSql)
}
