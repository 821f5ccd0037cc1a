package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Queue semantics (SURVEY.md §2.1 S3/S4/S10, §2.3 J1, §2.10 T5):
  * ordered append-logs with status columns, rebuilt as set operations —
  * enqueue is an anti-join append (idempotent by construction), cleanup is
  * an anti-join against processed keys (order-free, unlike the
  * reference's bottom-up index deletes).
  *
  * Keys are (sheet_name, row_index) throughout — the reference's
  * at-most-one-in-flight invariant becomes `dropDuplicates` on the key,
  * which in streaming mode is `dropDuplicatesWithinWatermark`. */
object Queues {

  /** S4/J1/T5: validity-gate new links and enqueue only keys not already
    * queued or processing. Re-pasting links is safe (reference README:28). */
  def enqueue(newLinks: DataFrame, queue: DataFrame): DataFrame = {
    val valid = newLinks
      .filter(col("url").rlike("(?i)^https?://"))
      .dropDuplicates("sheet_name", "row_index")
    val inFlight = queue
      .filter(col("status").isin("queued", "processing"))
      .select("sheet_name", "row_index")
    valid.join(inFlight, Seq("sheet_name", "row_index"), "left_anti")
      .withColumn("status", lit("queued"))
      .withColumn("tries", lit(0))
      .withColumn("enqueued_at", current_timestamp())
      .withColumn("last_error", lit(""))
  }

  /** W1/P7: FIFO batch take — first `batchSize` queued rows in enqueue
    * order (deterministic tiebreak on the key).
    *
    * `orderBy(...).limit(n)` plans as TakeOrderedAndProject: each task
    * keeps its own n best rows and only those reach the final merge — no
    * global sort, no single-task funnel (a bare `row_number().over(
    * Window.orderBy(...))` would pull the whole queue through one task). */
  def takeBatch(queue: DataFrame, batchSize: Int): DataFrame =
    queue.filter(col("status") === "queued")
      .orderBy(col("enqueued_at"), col("sheet_name"), col("row_index"))
      .limit(batchSize)

  /** S10: drop processed rows — anti-join, no index arithmetic. */
  def removeProcessed(queue: DataFrame, processedKeys: DataFrame): DataFrame =
    queue.join(processedKeys.select("sheet_name", "row_index"),
      Seq("sheet_name", "row_index"), "left_anti")

  /** T6 retry/backoff — the semantics latent in the reference queue
    * schema (`sheet_name|row_index|url|status|tries|enqueued_at|
    * next_attempt_at|last_error`, reference `apps-scripts/
    * code-LLM-intergration.js:86-96,190`: `tries`/`next_attempt_at` are
    * written on enqueue but never read — the reference is single-attempt
    * in practice; this is the operator that schema was reserved for).
    *
    * One batch round as a projection over (queue ⋈ outcomes):
    *  - ELIGIBLE = status `queued` and `next_attempt_at` has passed
    *    (epoch-seconds column vs `now`); everything else passes through
    *    untouched, so the operator is idempotent over ineligible rows;
    *  - an eligible row with a successful outcome → status `done`,
    *    error cleared;
    *  - an eligible row with a failed outcome → `tries` increments and
    *    `next_attempt_at = now + baseDelaySec · 2^tries` (exponential
    *    backoff on the PRE-increment count); at `maxTries` attempts the
    *    row parks as status `error` with the failure message sliced to
    *    200 chars, the reference's error-write width (line 208).
    *
    * `outcomes` carries (sheet_name, row_index, ok, error); an eligible
    * row with no outcome row is treated as not attempted. The join is a
    * key equi-join — at scale both sides shuffle on the queue key, or
    * the (batch-sized) outcome side broadcasts. */
  def retryBackoff(queue: DataFrame, outcomes: DataFrame, now: Column,
                   maxTries: Int = 3, baseDelaySec: Long = 60L): DataFrame = {
    val joined = queue.join(
      outcomes.select(col("sheet_name"), col("row_index"),
        col("ok").as("_ok"), col("error").as("_err")),
      Seq("sheet_name", "row_index"), "left")
    val att = col("status") === "queued" &&
      col("next_attempt_at") <= now && col("_ok").isNotNull
    val newTries = when(att, col("tries") + 1).otherwise(col("tries"))
    // 2^tries via pow: exact in doubles for any plausible tries count
    val backoff = (lit(baseDelaySec) *
      pow(lit(2.0), col("tries")).cast("long")).cast("long")
    joined.select(
      col("sheet_name"), col("row_index"), col("url"),
      when(!att, col("status"))
        .when(col("_ok"), lit("done"))
        .when(newTries >= maxTries, lit("error"))
        .otherwise(lit("queued")).as("status"),
      newTries.as("tries"),
      when(!att, col("next_attempt_at"))
        .when(col("_ok"), lit(0L))
        .otherwise(now + backoff).as("next_attempt_at"),
      when(!att, col("last_error"))
        .when(col("_ok"), lit(""))
        .otherwise(substring(col("_err"), 1, 200)).as("last_error"))
  }
}
