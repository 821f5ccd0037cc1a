package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._
import graft.Tables
import graft.pipeline.Queues
import graft.sources.SheetSources
import graft.streaming.{EventStreams, SessionEvent}
import Dsl._

/** Driver-gated demos for the ingestion/execution surfaces that
  * previously lived only in specs: the header-mapped sheet source (S2,
  * with damaged-header self-repair), the create-if-absent queue source
  * (S3), the drain-until-empty streaming loop with per-trigger rate
  * limiting (T1-T3), and custom stateful session processing
  * (flatMapGroupsWithState).
  *
  * Each query materializes its own fixture FROM the sf parquet tables
  * (deterministic derivation, no synthesized data), round-trips it
  * through the source/stream under test, and returns an aggregate the
  * DuckDB oracle recomputes directly from the originating table — so the
  * gate verifies the full ingest path end-to-end, not just the final
  * aggregation.
  */
object IngestQueries extends QueryModule {

  /** The sheet fixture: an orders-derived tracker page. Values are
    * comma/quote-free by construction so the CSV round-trip is exact. */
  private def sheetRows(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      concat(lit("https://careers.example.com/o/"), col("o_orderkey")).as("link"),
      concat(lit("corp-"), col("o_custkey") % 97).as("company_auto"),
      col("o_orderpriority").as("role_auto"),
      col("o_orderstatus").as("status"),
      concat(lit("batch-"), col("o_orderkey") % 7).as("extra_junk"))

  /** S2 + header repair: sheet A carries aliased headers ("Job Link",
    * "Company Name", …) mapped by name; sheet B carries a destroyed
    * header row (col_0…col_4) restored positionally by `repairHeader`.
    * Both normalize to the canonical tracker schema; missing canonical
    * columns land as empty strings; the extra column is dropped by the
    * declared projection. The oracle rebuilds both sheets' union straight
    * from orders. */
  private def s2HeaderRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val base = sheetRows(s, dir)
    val dirA = tempDir("graft_s2a_")
    val dirB = tempDir("graft_s2b_")
    base.toDF("Job Link", "Company Name", "Role Title", "Status", "extra_junk")
      .write.mode("overwrite").option("header", "true").csv(dirA)
    // positional repair restores canonical NAMES by position, so sheet
    // B's data must sit in canonical column order (link, canonical_link,
    // company_auto, role_auto, status)
    base.select(col("link"), col("link").as("canon"),
        col("company_auto"), col("role_auto"), col("status"))
      .toDF("col_0", "col_1", "col_2", "col_3", "col_4")
      .write.mode("overwrite").option("header", "true").csv(dirB)
    val aliases = Map("Job Link" -> "link", "Company Name" -> "company_auto",
      "Role Title" -> "role_auto", "Status" -> "status")
    val a = SheetSources.normalize(
      SheetSources.readCsvSheet(s, dirA), aliases)
      .withColumn("origin", lit("sheetA"))
    val b = SheetSources.normalize(
      SheetSources.repairHeader(SheetSources.readCsvSheet(s, dirB)))
      .withColumn("origin", lit("sheetB"))
    a.unionByName(b)
      .groupBy("origin", "status")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("company_auto")).as("n_companies"),
        max(col("role_auto")).as("max_role"),
        max(col("source")).as("filled_source"))
  }

  private val s2HeaderRoundtripSql =
    """WITH sheet AS (
      |  SELECT o_orderstatus AS status,
      |    'corp-' || (o_custkey % 97) AS company_auto,
      |    o_orderpriority AS role_auto
      |  FROM orders),
      |both_sheets AS (
      |  SELECT 'sheetA' AS origin, * FROM sheet
      |  UNION ALL
      |  SELECT 'sheetB' AS origin, * FROM sheet)
      |SELECT origin, status, COUNT(*) AS n,
      |  COUNT(DISTINCT company_auto) AS n_companies,
      |  MAX(role_auto) AS max_role, '' AS filled_source
      |FROM both_sheets GROUP BY 1, 2""".stripMargin

  /** S3: queue bootstrap round-trip. First probe hits a dir that does
    * not exist → empty queue with the canonical schema (create-if-absent
    * branch); the idempotent enqueue gates validity and appends against
    * it; the written queue is then re-read through the SAME source
    * (exists branch, recursive remote-FS-safe probe) and aggregated.
    * Rows with a scheme-less url (every 10th order) must not survive the
    * validity gate. */
  private def s3QueueBootstrap(s: SparkSession, dir: String): DataFrame = {
    val queueDir = tempDir("graft_s3_") + "/queue"
    val links = Tables.orders(s, dir).select(
      col("o_orderpriority").as("sheet_name"),
      col("o_orderkey").cast("int").as("row_index"),
      when(col("o_orderkey") % 10 === 0,
          concat(lit("careers.example.com/o/"), col("o_orderkey")))
        .otherwise(concat(lit("https://careers.example.com/o/"), col("o_orderkey")))
        .as("url"))
    val bootstrapped = SheetSources.queueSource(s, queueDir) // absent → empty
    Queues.enqueue(links, bootstrapped)
      .write.mode("overwrite").parquet(queueDir)
    SheetSources.queueSource(s, queueDir) // exists → read back
      .groupBy("sheet_name", "status")
      .agg(count(lit(1)).as("n"), sum(col("row_index")).as("sum_idx"),
        max(col("tries")).as("max_tries"))
  }

  private val s3QueueBootstrapSql =
    """SELECT o_orderpriority AS sheet_name, 'queued' AS status,
      |  COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS sum_idx,
      |  0 AS max_tries
      |FROM orders WHERE o_orderkey % 10 <> 0 GROUP BY 1""".stripMargin

  /** T1-T3: a real drain loop. The events table streams through the
    * micro-batch engine (file source, `maxFilesPerTrigger=1` rate limit)
    * into a windowed aggregation, draining until empty under
    * `Trigger.AvailableNow` into a memory sink — then the drained table
    * is aggregated. Complete output mode so the final table carries every
    * window (the watermarked append variant is proven in StreamingSpec;
    * here determinism is the contract). */
  private def t1DrainLoop(s: SparkSession, dir: String): DataFrame = {
    // nanosAsLong is set at session construction (SparkEntry mains,
    // TestSpark) and by Tables.events — not here, so a query body never
    // mutates shared session conf (ordering-dependence hazard)
    // the on-disk ts physical type varies by generation: INT64 nanos
    // (read as BIGINT under nanosAsLong, divide to micros), INT64 micros
    // (NTZ annotation — also readable as BIGINT, values already micros),
    // or INT96/LTZ-annotated timestamp (Spark-written images — not
    // readable as BIGINT, declared TIMESTAMP with no conversion). Probe
    // the batch-read type to pick the stream schema and the conversion.
    val (tsDecl, tsToMicros) =
      Tables.load(s, dir, "events").schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          ("ts BIGINT", timestamp_micros(expr("ts div 1000")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          ("ts BIGINT", timestamp_micros(col("ts")))
        case _ =>
          ("ts TIMESTAMP", col("ts"))
      }
    val schema = s"event_id BIGINT, $tsDecl, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING"
    // the file source wants a directory of data FILES; expose the events
    // table through a symlinked temp dir (no data copy). The table
    // arrives as a single file (driver testdata) or a Spark-written
    // directory of part-files (ScaleUp images) — symlink each data file
    // either way, since a symlinked subDIRECTORY is invisible to the
    // file source's glob and would silently stream 0 rows.
    val streamDir = java.nio.file.Paths.get(tempDir("graft_t1_"))
    val src = java.nio.file.Paths.get(s"$dir/events.parquet")
    val parts: Seq[java.nio.file.Path] =
      if (java.nio.file.Files.isDirectory(src)) {
        val ls = java.nio.file.Files.list(src)
        try ls.iterator().asScala.filter(_.getFileName.toString
          .endsWith(".parquet")).toSeq
        finally ls.close()
      } else Seq(src)
    parts.zipWithIndex.foreach { case (p, i) =>
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve(f"events_$i%05d.parquet"), p)
    }
    val stream = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // T3: bounded work per trigger
      .parquet(streamDir.toString)
      .withColumn("ts", tsToMicros)
    val windowed = stream
      .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum2d(col("value")).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))
    val sink = "t1_drain_" + java.util.UUID.randomUUID.toString.replace("-", "")
    EventStreams.drainToMemory(windowed, sink,
      org.apache.spark.sql.streaming.OutputMode.Complete())
    // materialize the aggregate eagerly, then drop the sink's temp view:
    // repeated invocations (bench repeats/retries) must not accumulate
    // driver-held memory-sink tables for the session's lifetime
    val out = s.table(sink)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_windows"), sum(col("n")).as("n_events"),
        dsum2d(col("total")).as("grand_total"))
      .localCheckpoint(true)
    s.catalog.dropTempView(sink)
    out
  }

  private val t1DrainLoopSql =
    """WITH w AS (
      |  SELECT make_timestamp((epoch_us(ts) // 900000000) * 900000000)
      |      AS window_start,
      |    event_type, COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      |  FROM events GROUP BY 1, 2)
      |SELECT event_type, COUNT(*) AS n_windows,
      |  CAST(SUM(n) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(total AS DECIMAL(18,2))) AS DOUBLE) AS grand_total
      |FROM w GROUP BY 1""".stripMargin

  /** Custom stateful processing (flatMapGroupsWithState) on the driver
    * gate: per-user sessionization with a 300 s inactivity gap. Batch
    * execution emits exactly the CLOSED sessions (the trailing open
    * session per user stays in state — same as a never-ending stream), so
    * the oracle's gaps-and-islands rebuild excludes each user's last
    * session. */
  private def t6StatefulSessions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // epoch millis directly from the micros value — one integer division
    val evm = Tables.events(s, dir).select(col("user_id"), col("event_id"),
        expr("unix_micros(ts) div 1000").as("tsMillis"))
      .as[SessionEvent]
    EventStreams.sessionizeStateful(evm, gapSeconds = 300)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"),
        min(col("first_millis")).as("first_ms"),
        max(col("last_millis")).as("last_ms"))
  }

  private val t6StatefulSessionsSql =
    """WITH evm AS (
      |  SELECT user_id, event_id, epoch_us(ts) // 1000 AS ms FROM events),
      |marked AS (
      |  -- every window orders by (ms, event_id) — the millisecond-domain
      |  -- order the stateful operator sorts by; ordering by raw ts here
      |  -- would diverge whenever two same-ms events carry sub-ms skew
      |  SELECT user_id, event_id, ms,
      |    CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > 300000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM evm
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
      |numbered AS (
      |  SELECT user_id, ms,
      |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ms, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
      |  FROM marked),
      |sessions AS (
      |  SELECT user_id, sid, COUNT(*) AS n_events,
      |    MIN(ms) AS first_ms, MAX(ms) AS last_ms,
      |    MAX(sid) OVER (PARTITION BY user_id) AS last_sid
      |  FROM numbered GROUP BY 1, 2),
      |closed AS (SELECT * FROM sessions WHERE sid < last_sid)
      |SELECT user_id, COUNT(*) AS n_sessions,
      |  CAST(SUM(n_events) AS BIGINT) AS n_events,
      |  MIN(first_ms) AS first_ms, MAX(last_ms) AS last_ms
      |FROM closed GROUP BY 1""".stripMargin

  /** T6 retry/backoff over an orders-derived queue snapshot: eligibility
    * by next_attempt_at, exponential backoff on failure, max-tries →
    * error park, success → done. now is pinned so the oracle can replay
    * the round exactly. Classes by o_orderkey: %5==4 is already done
    * (must pass through untouched), %3==2 is queued but not yet eligible,
    * %2 decides the attempt outcome, %4 seeds the prior tries count. */
  private def t10RetryBackoff(s: SparkSession, dir: String): DataFrame = {
    val k = col("o_orderkey")
    val now = lit(1700000000L)
    val base = Tables.orders(s, dir)
    val queue = base.select(
      concat(lit("t"), k % 3).as("sheet_name"),
      k.cast("int").as("row_index"),
      concat(lit("https://careers.example.com/o/"), k).as("url"),
      when(k % 5 === 4, lit("done")).otherwise(lit("queued")).as("status"),
      (k % 4).cast("int").as("tries"),
      when(k % 3 === 0, lit(1699999900L))
        .when(k % 3 === 1, lit(0L))
        .otherwise(lit(1700000500L)).as("next_attempt_at"),
      lit("").as("last_error"))
    val outcomes = base.select(
      concat(lit("t"), k % 3).as("sheet_name"),
      k.cast("int").as("row_index"),
      (k % 2 === 1).as("ok"),
      concat(lit("Bee 500: upstream "), k % 7).as("error"))
    Queues.retryBackoff(queue, outcomes, now, maxTries = 3, baseDelaySec = 60L)
      .groupBy("status")
      .agg(count(lit(1)).as("n"),
        sum(col("tries").cast("long")).as("sum_tries"),
        sum(col("next_attempt_at")).as("sum_naa"),
        count(when(col("last_error") =!= "", 1)).as("n_errors"))
  }

  private val t10RetryBackoffSql =
    """WITH q AS (
      |  SELECT o_orderkey AS k,
      |    CASE WHEN o_orderkey % 5 = 4 THEN 'done' ELSE 'queued' END AS status,
      |    CAST(o_orderkey % 4 AS INT) AS tries,
      |    CASE WHEN o_orderkey % 3 = 0 THEN 1699999900
      |         WHEN o_orderkey % 3 = 1 THEN 0
      |         ELSE 1700000500 END AS naa,
      |    (o_orderkey % 2 = 1) AS ok
      |  FROM orders),
      |f AS (
      |  SELECT
      |    CASE WHEN NOT (status = 'queued' AND naa <= 1700000000) THEN status
      |         WHEN ok THEN 'done'
      |         WHEN tries + 1 >= 3 THEN 'error'
      |         ELSE 'queued' END AS fstatus,
      |    CASE WHEN status = 'queued' AND naa <= 1700000000
      |         THEN tries + 1 ELSE tries END AS ftries,
      |    CASE WHEN NOT (status = 'queued' AND naa <= 1700000000) THEN naa
      |         WHEN ok THEN 0
      |         ELSE 1700000000 + 60 * (CASE tries WHEN 0 THEN 1 WHEN 1 THEN 2
      |              WHEN 2 THEN 4 ELSE 8 END) END AS fnaa,
      |    CASE WHEN NOT (status = 'queued' AND naa <= 1700000000) THEN ''
      |         WHEN ok THEN ''
      |         ELSE 'Bee 500: upstream ' || (k % 7) END AS err
      |  FROM q)
      |SELECT fstatus AS status, COUNT(*) AS n,
      |  CAST(SUM(ftries) AS BIGINT) AS sum_tries,
      |  CAST(SUM(fnaa) AS BIGINT) AS sum_naa,
      |  COUNT(CASE WHEN err <> '' THEN 1 END) AS n_errors
      |FROM f GROUP BY 1""".stripMargin

  /** Warehouse-scale co-located join: both fact tables written bucketed
    * on the join key, then joined + aggregated with ZERO exchanges — the
    * shape a 100 TB fact-fact join takes when the lake is bucketed
    * (BucketingSpec asserts the exchange-free plan; here the driver gate
    * verifies the data path end-to-end). Bucket files land in a temp
    * external location; catalog entries are per-session. */
  private def joinBucketed(s: SparkSession, dir: String): DataFrame = {
    val loc = tempDir("graft_w7_")
    // per-invocation table names (fixed names would collide with any
    // concurrent use of the session); the previous invocation's pair is
    // dropped so repeated bench/verify runs keep at most one generation
    // of catalog entries alive — the result must stay LAZY (the driver
    // executes it), so the current tables cannot be dropped here
    s.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("w7_"))
      .foreach(t => s.sql(s"DROP TABLE IF EXISTS $t"))
    val tag = java.util.UUID.randomUUID.toString.replace("-", "").take(8)
    val (liName, ordName) = (s"w7_li_$tag", s"w7_ord_$tag")
    Tables.lineitem(s, dir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$loc/li").saveAsTable(liName)
    Tables.orders(s, dir).select("o_orderkey", "o_orderpriority")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$loc/ord").saveAsTable(ordName)
    // force the sort-merge strategy: with aligned buckets it needs no
    // exchange AND no sort — a broadcast would mask the co-location
    s.table(liName).hint("merge")
      .join(s.table(ordName), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        dsum4d(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
  }

  private val joinBucketedSql =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
      |    AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s2_header_roundtrip" -> s2HeaderRoundtrip _,
    "s3_queue_bootstrap"  -> s3QueueBootstrap _,
    "t1_drain_loop"       -> t1DrainLoop _,
    "t6_stateful_sessions" -> t6StatefulSessions _,
    "t10_retry_backoff"   -> t10RetryBackoff _,
    "join_bucketed_colocated" -> joinBucketed _)

  def oracles: Map[String, String] = Map(
    "s2_header_roundtrip" -> s2HeaderRoundtripSql,
    "s3_queue_bootstrap"  -> s3QueueBootstrapSql,
    "t1_drain_loop"       -> t1DrainLoopSql,
    "t6_stateful_sessions" -> t6StatefulSessionsSql,
    "t10_retry_backoff"   -> t10RetryBackoffSql,
    "join_bucketed_colocated" -> joinBucketedSql)
}
