package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.TemporalJoins
import Dsl.dsum2d

/** Temporal-join operator demos over `events` (W4/W5): as-of join and
  * point-in-interval range join ([[graft.ops.TemporalJoins]]).
  *
  * Both run against DuckDB oracles — the as-of query against DuckDB's
  * native ASOF JOIN, the range query against a plain inequality join —
  * so the composed Spark shapes are hash-verified against an independent
  * implementation of the same semantics.
  */
object TemporalQueries extends QueryModule {

  /** W4: each error event picks up the same user's most recent click
    * at-or-before it (null when the user never clicked before). */
  private def asof(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    // pre-aggregate to one row per (key, ts): the as-of contract
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .agg(max("event_id").as("click_id"))
    TemporalJoins.asofJoin(errors, clicks,
        col("user_id"), col("c_user"), col("ts"), col("c_ts"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof.c_ts").as("click_ts"), col("asof.click_id").as("click_id"))
  }

  private val asofSql =
    """WITH c AS (
      |  SELECT user_id AS c_user, ts AS c_ts, MAX(event_id) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      |e AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error')
      |SELECT e.event_id, e.user_id, e.ts,
      |       c.c_ts AS click_ts, c.click_id
      |FROM e ASOF LEFT JOIN c
      |  ON e.user_id = c.c_user AND e.ts >= c.c_ts""".stripMargin

  /** W4 forward variant: each error event picks up the same user's
    * NEXT click at-or-after it (the "time-to-recovery" direction). */
  private def asofForward(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .agg(max("event_id").as("click_id"))
    TemporalJoins.asofJoin(errors, clicks,
        col("user_id"), col("c_user"), col("ts"), col("c_ts"),
        direction = "forward")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("asof.c_ts").as("next_click_ts"),
        col("asof.click_id").as("next_click_id"))
  }

  private val asofForwardSql =
    """WITH c AS (
      |  SELECT user_id AS c_user, ts AS c_ts, MAX(event_id) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      |e AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error')
      |SELECT e.event_id, e.user_id, e.ts,
      |       c.c_ts AS next_click_ts, c.click_id AS next_click_id
      |FROM e ASOF LEFT JOIN c
      |  ON e.user_id = c.c_user AND e.ts <= c.c_ts""".stripMargin

  /** W5: per view event, the count/value of the same user's clicks in the
    * 6 hours before it (views with no such click drop out — inner). */
  private def rangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"),
        (col("ts") - expr("INTERVAL 6 HOURS")).as("w_start"), col("ts"))
    TemporalJoins.pointInInterval(clicks, views,
        col("c_user"), col("user_id"),
        col("c_ts"), col("w_start"), col("ts"),
        bucketMicros = 6L * 3600 * 1000 * 1000)
      .groupBy(col("interval.event_id").as("event_id"))
      .agg(count(lit(1)).as("n_clicks"), dsum2d(col("value")).as("click_value"))
  }

  private val rangeSql =
    """SELECT v.event_id, COUNT(*) AS n_clicks,
      |  CAST(SUM(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE) AS click_value
      |FROM events v JOIN events c
      |  ON c.user_id = v.user_id
      |  AND v.event_type = 'view' AND c.event_type = 'click'
      |  AND c.ts >= v.ts - INTERVAL 6 HOUR AND c.ts < v.ts
      |GROUP BY 1""".stripMargin

  /** W6: SCD2 history build ([[graft.ops.Scd2]]) — each user's
    * browse/action segment tracked as `[valid_from, valid_to)` epochs
    * with consecutive unchanged observations collapsed. The oracle
    * recomputes the collapse + interval assignment with DuckDB windows,
    * so the one-shuffle two-window Spark shape is verified against an
    * independent formulation. */
  private def scd2(s: SparkSession, dir: String): DataFrame = {
    val seg = when(col("event_type").isin("click", "view"), lit("browse"))
      .otherwise(lit("action"))
    val updates = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), seg.as("seg"))
    graft.ops.Scd2.buildHistory(updates,
        col("user_id"), col("ts"), col("event_id"), col("seg"))
      .select(col("key").as("user_id"), col("attr").as("segment"),
        col("valid_from"), col("valid_to"), col("is_current"))
  }

  private val scd2Sql =
    """WITH u AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN event_type IN ('click','view') THEN 'browse'
      |         ELSE 'action' END AS seg
      |  FROM events),
      |marked AS (
      |  SELECT user_id, seg, ts, event_id,
      |    CASE WHEN row_number() OVER w = 1
      |           OR lag(seg) OVER w IS DISTINCT FROM seg
      |         THEN 1 ELSE 0 END AS chg
      |  FROM u WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, seg AS segment, ts AS valid_from,
      |  lead(ts) OVER w2 AS valid_to,
      |  lead(ts) OVER w2 IS NULL AS is_current
      |FROM marked WHERE chg = 1
      |WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin

  /** W7: time-series gap fill. Daily per-type revenue with a planted
    * outage (every third day-of-month drops out), re-densified onto the
    * full date spine: counts zero-fill, revenue carries the last
    * observation forward (LOCF via `last(_, ignoreNulls)` over a
    * bounded-state running window — the standard warehouse densify, one
    * shuffle on the series key). */
  private def gapFill(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
    val daily = ev
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), dsum2d(col("value")).as("total"))
      .filter(dayofmonth(col("day")) % 3 =!= 0) // planted outage
    val spine = ev.agg(min(to_date(col("ts"))).as("lo"),
        max(to_date(col("ts"))).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"))).as("day"))
    val series = spine.crossJoin(ev.select("event_type").distinct())
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    series.join(daily, Seq("event_type", "day"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("total_locf",
        coalesce(last(col("total"), ignoreNulls = true).over(w), lit(0.0)))
      .select(col("event_type"), col("day").cast("string").as("day"),
        col("n"), coalesce(col("total"), lit(0.0)).as("total"),
        col("total_locf"))
  }

  private val gapFillSql =
    """WITH daily0 AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |  FROM events GROUP BY 1, 2),
      |daily AS (
      |  SELECT * FROM daily0 WHERE date_part('day', day) % 3 <> 0),
      |spine AS (
      |  SELECT unnest(generate_series(
      |    (SELECT MIN(CAST(ts AS DATE)) FROM events),
      |    (SELECT MAX(CAST(ts AS DATE)) FROM events),
      |    INTERVAL 1 DAY))::DATE AS day),
      |series AS (
      |  SELECT t.event_type, s.day
      |  FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM events) t)
      |SELECT se.event_type, CAST(se.day AS VARCHAR) AS day,
      |  COALESCE(d.n, 0) AS n, COALESCE(d.total, 0) AS total,
      |  COALESCE(last_value(d.total IGNORE NULLS) OVER (
      |    PARTITION BY se.event_type ORDER BY se.day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS total_locf
      |FROM series se LEFT JOIN daily d
      |  ON d.event_type = se.event_type AND d.day = se.day""".stripMargin

  /** W8: trailing 7-observation moving average of daily per-type
    * revenue. The daily totals stay DECIMAL through the window frame —
    * a windowed double sum would accumulate in frame order on one engine
    * and segment-tree order on another — and cast to double only at the
    * contract boundary. ROWS framing (last 7 observed days), one shuffle
    * on the series key. */
  private def movingAvg(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast(DecimalType(18, 2))).as("total_dec"),
        count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-6, 0)
    daily
      .withColumn("win_sum", sum(col("total_dec")).over(w))
      .withColumn("win_n", count(lit(1)).over(w))
      .select(col("event_type"), col("day").cast("string").as("day"),
        col("n"), col("total_dec").cast("double").as("total"),
        (col("win_sum").cast("double") / col("win_n")).as("avg7"),
        col("win_n"))
  }

  private val movingAvgSql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS total_dec, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, CAST(day AS VARCHAR) AS day, n,
      |  CAST(total_dec AS DOUBLE) AS total,
      |  CAST(SUM(total_dec) OVER w AS DOUBLE) / (COUNT(*) OVER w) AS avg7,
      |  COUNT(*) OVER w AS win_n
      |FROM daily
      |WINDOW w AS (PARTITION BY event_type ORDER BY day
      |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin

  /** T9: conversion funnel — signups that convert to a purchase by the
    * same user within one hour. The probe is a user-keyed equi-join with
    * an event-time bound (the batch analog of the stream-stream interval
    * join, which is its streaming twin in EventStreams.attributionJoin),
    * aggregated to daily conversion rates. */
  /** Cohort retention — the classic growth-analytics matrix: users
    * cohorted by FIRST-ACTIVITY week (weeks = integer 7-day bins from
    * the corpus's min event date, anchored by a 1-row broadcast so the
    * query is a pure function of the data), and each (cohort, offset)
    * cell counts the cohort members active `offset` weeks later.
    * Retention is the one derived double, rounded 6dp; all counters are
    * exact. Shape: one distinct over (user, week), one per-user min,
    * one cell aggregate — user- and cohort-keyed exchanges only. */
  private def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    // purchase events: the rare action whose first occurrence staggers
    // across weeks (every user is ACTIVE from week 0 in this corpus, so
    // an all-events cohort would collapse to one row of 1.0s)
    val ev = Tables.events(s, dir).filter(col("event_type") === "purchase")
    val d0 = ev.agg(min(to_date(col("ts"))).as("d0"))
    val weeks = ev.crossJoin(broadcast(d0))
      .select(col("user_id"),
        expr("datediff(CAST(ts AS DATE), d0) div 7").as("week"))
      .distinct()
    val cohort = weeks.groupBy("user_id").agg(min("week").as("cohort_week"))
    val sizes = cohort.groupBy("cohort_week")
      .agg(count(lit(1)).as("cohort_size"))
    weeks.join(cohort, Seq("user_id"))
      .select(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"),
        col("user_id"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_active"))
      .join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("cohort_size"),
        round(col("n_active").cast("double") /
          col("cohort_size").cast("double"), 6).as("retention"))
  }

  private val cohortRetentionSql =
    """WITH p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
      |d0 AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM p),
      |uw AS (
      |  SELECT DISTINCT user_id,
      |    CAST(datediff('day', d0, CAST(ts AS DATE)) AS BIGINT) // 7 AS week
      |  FROM p CROSS JOIN d0),
      |c AS (SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY 1),
      |sz AS (SELECT cohort_week, COUNT(*) AS cohort_size FROM c GROUP BY 1),
      |cell AS (
      |  SELECT c.cohort_week, uw.week - c.cohort_week AS week_offset,
      |    COUNT(DISTINCT uw.user_id) AS n_active
      |  FROM uw JOIN c USING (user_id) GROUP BY 1, 2)
      |SELECT cell.cohort_week, week_offset, n_active, cohort_size,
      |  round(n_active / CAST(cohort_size AS DOUBLE), 6) AS retention
      |FROM cell JOIN sz USING (cohort_week)""".stripMargin

  /** RFM segmentation — the classic customer-value cube: per user,
    * Recency (days since last purchase, vs the corpus max date),
    * Frequency (purchase count) and Monetary (exact decimal purchase
    * value), each cut into quartiles by exact ntile(4) with the user id
    * as the deterministic tie-break, rolled up to segment counts. All
    * metrics are exact (decimal money, integer days). The per-user
    * frame grows with the corpus (billions of rows at the 100 TB design
    * point), so the quartiles run through
    * [[graft.plans.GraftOps.ntileDistributed]] — bit-identical to the
    * global `ntile(4)` window, with range-partitioned ranking instead
    * of three single-partition WindowExecs (round-18 verdict item 5). */
  private def rfmSegments(s: SparkSession, dir: String): DataFrame = {
    import graft.plans.GraftOps
    val p = Tables.events(s, dir).filter(col("event_type") === "purchase")
    val maxd = p.agg(max(to_date(col("ts"))).as("dmax"))
    val perUser = p.crossJoin(broadcast(maxd))
      .groupBy("user_id")
      .agg(min(expr("datediff(dmax, CAST(ts AS DATE))")).as("recency_days"),
        count(lit(1)).as("frequency"),
        Dsl.dsum2d(col("value")).as("monetary"))
    val seg = GraftOps.ntileDistributed(
      GraftOps.ntileDistributed(
        GraftOps.ntileDistributed(perUser, 4,
          Seq(col("recency_days").asc, col("user_id")), "r"),
        4, Seq(col("frequency").desc, col("user_id")), "f"),
      4, Seq(col("monetary").desc, col("user_id")), "m")
    seg.groupBy("r", "f", "m")
      .agg(count(lit(1)).as("n_users"),
        Dsl.dsum2d(col("monetary")).as("segment_value"))
  }

  private val rfmSegmentsSql =
    """WITH p AS (SELECT user_id, ts, value FROM events
      |           WHERE event_type = 'purchase'),
      |dmax AS (SELECT MAX(CAST(ts AS DATE)) AS dmax FROM p),
      |u AS (
      |  SELECT user_id,
      |    MIN(CAST(datediff('day', CAST(ts AS DATE), dmax) AS INT))
      |      AS recency_days,
      |    COUNT(*) AS frequency,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
      |  FROM p CROSS JOIN dmax GROUP BY 1),
      |seg AS (
      |  SELECT user_id, monetary,
      |    CAST(ntile(4) OVER (ORDER BY recency_days ASC, user_id) AS INT) AS r,
      |    CAST(ntile(4) OVER (ORDER BY frequency DESC, user_id) AS INT) AS f,
      |    CAST(ntile(4) OVER (ORDER BY monetary DESC, user_id) AS INT) AS m
      |  FROM u)
      |SELECT r, f, m, COUNT(*) AS n_users,
      |  CAST(SUM(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE)
      |    AS segment_value
      |FROM seg GROUP BY 1, 2, 3""".stripMargin

  private def funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("event_id").as("s_id"),
        col("ts").as("s_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val converted = signups.join(purchases,
        col("s_user") === col("p_user") &&
        col("p_ts") > col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr("INTERVAL 1 HOUR"))
      .select("s_id").distinct()
      .withColumn("conv", lit(1L))
    signups.join(converted, Seq("s_id"), "left")
      .groupBy(to_date(col("s_ts")).cast("string").as("day"))
      .agg(count(lit(1)).as("n_signups"),
        sum(coalesce(col("conv"), lit(0L))).as("n_converted"))
      .withColumn("conv_rate",
        col("n_converted").cast("double") / col("n_signups"))
  }

  private val funnelSql =
    """WITH s AS (
      |  SELECT user_id, event_id, ts FROM events WHERE event_type = 'signup'),
      |conv AS (
      |  SELECT DISTINCT s.event_id
      |  FROM s JOIN events p
      |    ON p.event_type = 'purchase' AND p.user_id = s.user_id
      |   AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR)
      |SELECT CAST(CAST(s.ts AS DATE) AS VARCHAR) AS day,
      |  COUNT(*) AS n_signups,
      |  CAST(SUM(CASE WHEN conv.event_id IS NULL THEN 0 ELSE 1 END)
      |    AS BIGINT) AS n_converted,
      |  CAST(SUM(CASE WHEN conv.event_id IS NULL THEN 0 ELSE 1 END)
      |    AS DOUBLE) / COUNT(*) AS conv_rate
      |FROM s LEFT JOIN conv ON conv.event_id = s.event_id
      |GROUP BY 1""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "w8_moving_avg"   -> movingAvg _,
    "t9_funnel"       -> funnel _,
    "w4_asof_join"    -> asof _,
    "w4_asof_forward" -> asofForward _,
    "w5_range_join"   -> rangeJoin _,
    "w6_scd2"         -> scd2 _,
    "w7_gap_fill"     -> gapFill _,
    "agg_cohort_retention" -> cohortRetention _,
    "agg_rfm_segments" -> rfmSegments _)

  def oracles: Map[String, String] = Map(
    "w8_moving_avg"   -> movingAvgSql,
    "t9_funnel"       -> funnelSql,
    "w4_asof_join"    -> asofSql,
    "w4_asof_forward" -> asofForwardSql,
    "w5_range_join"   -> rangeSql,
    "w6_scd2"         -> scd2Sql,
    "w7_gap_fill"     -> gapFillSql,
    "agg_cohort_retention" -> cohortRetentionSql,
    "agg_rfm_segments" -> rfmSegmentsSql)
}
