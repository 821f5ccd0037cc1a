package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.functions.col
import graft.ops.IncrementalAgg
import graft.ops.IncrementalAgg.Measure

/** Streaming materialized-view maintenance: each micro-batch is reduced
  * to its partial state ([[IncrementalAgg.state]]) and folded into the
  * persistent state table with [[IncrementalAgg.merge]] — so the stored
  * view is always `state(everything seen so far)`, exactly (monoid
  * measures only), and per-batch work is batch + state sized, never
  * history-sized.
  *
  * The store is rewritten atomically per batch (write new state to a
  * staging dir, then swap): a view table must be a consistent snapshot,
  * never a partial append. Readers finalize with their own projection
  * (e.g. avg = stored sum / stored count) — floats never live in the
  * store. With an ordered file source the final state equals batch-mode
  * aggregation over the same files, asserted in ViewMaintenanceSpec. */
object ViewMaintenance {

  /** Start maintaining the view over streaming `rows`. AvailableNow by
    * default (drain-then-stop, the scheduled-refresh shape); pass
    * `continuous = true` for a long-running loop. */
  def maintain(rows: DataFrame, stateDir: String, checkpointDir: String,
               keys: Seq[String], measures: Seq[Measure],
               continuous: Boolean = false): StreamingQuery = {
    val writer = rows.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val delta = IncrementalAgg.state(batch, keys.map(col), measures)
        val merged =
          try {
            val prior = spark.read.parquet(s"$stateDir/current")
            IncrementalAgg.merge(Seq(prior, delta), keys, measures)
          } catch { case _: Exception => delta } // first batch: no store yet
        // stage → swap: the view is replaced, never partially appended
        val staged = merged.persist()
        staged.write.mode("overwrite").parquet(s"$stateDir/next")
        staged.unpersist()
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        val cur = new org.apache.hadoop.fs.Path(s"$stateDir/current")
        val next = new org.apache.hadoop.fs.Path(s"$stateDir/next")
        fs.delete(cur, true)
        fs.rename(next, cur)
        ()
      }
      .option("checkpointLocation", checkpointDir)
    (if (continuous) writer else writer.trigger(Trigger.AvailableNow()))
      .start()
  }
}
