package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension history builder.
  *
  * The reference's tracker keeps only the LATEST value per row and
  * appends provenance tokens for auditability
  * (`apps-scripts/code-LLM-intergration.js:791-812` — the `Source` trail
  * is its history mechanism). At warehouse scale the standard upgrade of
  * that idea is an SCD2 history table: one row per (key, value-epoch)
  * with `[valid_from, valid_to)` intervals and an `is_current` flag, so
  * any past state is queryable with a point-in-time predicate.
  *
  * Shape: two window passes over the same `(key, order)` partitioning —
  * Catalyst plans ONE shuffle (the second window reuses the first's
  * partitioning and sort), so the whole build costs a single exchange of
  * the change feed regardless of attribute count. Change collapse uses
  * null-safe comparison (`<=>`), so a null attribute value is a real
  * state, not a perpetual "change".
  */
object Scd2 {

  /** Build the SCD2 history of `attr` per `key` from a change feed.
    *
    * @param updates   change feed, at least (key, ts, tiebreak, attr)
    * @param key       dimension key column
    * @param ts        observation time
    * @param tiebreak  deterministic order for same-instant updates
    * @param attr      the tracked attribute (pass a struct to track many)
    * @return one row per value-epoch: key, attr, valid_from, valid_to
    *         (null = open), is_current
    */
  def buildHistory(updates: DataFrame, key: Column, ts: Column,
                   tiebreak: Column, attr: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts, tiebreak)
    // row_number()==1 keeps a first observation whose attr is null —
    // lag()==null can't distinguish "no previous row" from "previous
    // value was null", and `!(null <=> null)` would drop it.
    val changed = updates
      .withColumn("graft_chg",
        row_number().over(w) === 1 || !(lag(attr, 1).over(w) <=> attr))
      .filter(col("graft_chg"))
    // Reusing w: same partitioning + ordering means no second exchange,
    // only a re-sort over the (much smaller) collapsed feed — and the
    // two passes can never desynchronize on ordering.
    changed
      .select(key.as("key"), attr.as("attr"), ts.as("valid_from"),
        lead(ts, 1).over(w).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Point-in-time lookup against a built history: the row whose
    * `[valid_from, valid_to)` interval covers `at`. */
  def asOf(history: DataFrame, at: Column): DataFrame =
    history.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
}
