package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming layer (SURVEY.md §2.10 / §7.1 M7).
  *
  * The reference's drain loop IS a micro-batch executor: "alternate
  * parse/notes batches until both empty under a time budget"
  * (`apps-scripts/code-LLM-intergration.js:264-272`) maps to
  * `Trigger.AvailableNow` (drain-until-empty) with rate limiting via
  * `maxFilesPerTrigger` — so every batch operator in this engine doubles
  * as a streaming stage. These builders wire the parity pieces:
  * event-time tumbling/sliding windows with watermarks, in-stream dedup
  * (T5), and the two-stage handoff (T4) via foreachBatch → sink.
  */
case class SessionEvent(user_id: Long, event_id: Long, tsMillis: Long)
case class SessionState(n: Int, firstMillis: Long, lastMillis: Long)
case class SessionResult(user_id: Long, n_events: Int,
                         first_millis: Long, last_millis: Long)

object EventStreams {

  /** File-source stream over an events-shaped directory (parquet). */
  def eventsStream(spark: SparkSession, dir: String,
                   maxFilesPerTrigger: Int = 1): DataFrame = {
    val schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING"
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger) // T3 rate limiting
      .parquet(dir)
  }

  /** Tumbling 5-minute windowed aggregation with a 10-minute watermark —
    * late events beyond the watermark are dropped, state is bounded. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  /** T5 in-stream idempotency: per-key dedup bounded by the watermark. */
  def dedupedStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** T1 drain-until-empty execution of any streaming DataFrame into an
    * in-memory table; returns after all available data is processed. */
  def drainToMemory(df: DataFrame, queryName: String,
                    outputMode: OutputMode = OutputMode.Append): Unit = {
    val q = df.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Stateful sessionization via flatMapGroupsWithState: per-user session
    * state with an event-time-style gap close (emits a session row when
    * the gap between consecutive events exceeds `gapSeconds`). The
    * custom-state extension point for semantics windows can't express. */
  def sessionizeStateful(events: org.apache.spark.sql.Dataset[SessionEvent],
                         gapSeconds: Long = 300)
      : org.apache.spark.sql.Dataset[SessionResult] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionResult](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId, rows, state) =>
          val sorted = rows.toSeq.sortBy(e => (e.tsMillis, e.event_id))
          var cur = state.getOption
          val closed = scala.collection.mutable.ArrayBuffer.empty[SessionResult]
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.tsMillis - s.lastMillis > gapSeconds * 1000 =>
                closed += SessionResult(userId, s.n, s.firstMillis, s.lastMillis)
                cur = Some(SessionState(1, e.tsMillis, e.tsMillis))
              case Some(s) =>
                cur = Some(SessionState(s.n + 1, s.firstMillis, e.tsMillis))
              case None =>
                cur = Some(SessionState(1, e.tsMillis, e.tsMillis))
            }
          }
          cur.foreach(state.update)
          closed.iterator
      }
  }

  /** T8 stream-stream interval join (attribution): purchases joined to
    * the same user's views in the hour before the purchase. Both sides
    * carry watermarks and the join condition bounds event-time distance,
    * so Spark can expire buffered state — the canonical bounded-state
    * stream-stream join shape. Column renames after `withWatermark`
    * preserve the watermark (it tracks the attribute, not the name). */
  def attributionJoin(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views.withWatermark("ts", "10 minutes")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("value").as("v_value"))
    val p = purchases.withWatermark("ts", "10 minutes")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    p.join(v, expr(
      "v_user = p_user AND v_ts >= p_ts - INTERVAL 1 HOUR AND v_ts < p_ts"))
  }

  /** T4 two-stage handoff: stage 1 writes its results to a parquet dir
    * (the "notes queue"), which a second streaming query consumes —
    * exactly-once between stages via idempotent keyed sink + dedup. */
  def stageHandoff(parsed: DataFrame, handoffDir: String,
                   checkpointDir: String): Unit = {
    val q = parsed.writeStream
      .format("parquet")
      .option("path", handoffDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
