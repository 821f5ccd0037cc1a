package graft.pipeline

import org.apache.spark.sql.DataFrame
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
}
