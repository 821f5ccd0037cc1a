package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * Snapshots are VERSIONED and published through a pointer file: batch
  * `b` writes `v{b}`, then atomically renames a staged pointer over
  * `LATEST`. A crash at ANY point leaves the previous pointer (and the
  * snapshot it names) fully intact — there is no delete-then-rename
  * window where the view doesn't exist; a half-written `v{b}` is
  * unreferenced garbage, cleaned by the next successful batch; and a
  * REPLAYED batch (crash after publish, before the stream checkpoint
  * commit) detects its own already-published snapshot and skips, so
  * the fold is idempotent in batchId. Readers resolve
  * [[ViewMaintenance.readLatest]] and always see one complete
  * snapshot; the immediately-superseded snapshot is retained for one
  * extra batch so a reader that resolved it mid-publish can finish
  * its scan before the dir is retired. Floats never live in the store — readers finalize with
  * their own projection (e.g. avg = stored sum / stored count). With an
  * ordered file source the final state equals batch-mode aggregation
  * over the same files, asserted in ViewMaintenanceSpec. */
object ViewMaintenance {

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The snapshot dir `LATEST` names — falling back, if the pointer is
    * missing or dangling (a crash in the tiny pointer-replace window on
    * filesystems whose rename refuses to clobber), to the most recently
    * PUBLISHED complete (`_SUCCESS`-marked) versioned snapshot on disk,
    * so recovery needs no operator intervention. None before the first
    * publish.
    *
    * "Most recent" is the `_SUCCESS` file's modification time, version
    * number only as tie-break — NOT the numeric version alone: version
    * names are batch ids except for ADMIN publishes
    * ([[SampleStream.deleteFromSample]]), whose ids ride far above the
    * stream's so the replay guard can't mistake them for batches.
    * Publishes are sequential (the store family's single-admin
    * contract), so mtime order IS publish order; numeric-max would
    * resolve back to a stale admin snapshot after the next stream batch
    * and silently roll that batch's fold back. */
  def latestSnapshot(spark: SparkSession, stateDir: String): Option[String] = {
    val f = fs(spark, stateDir)
    val fromPtr = StatePointer.read(spark, stateDir, "LATEST")
      .map(v => s"$stateDir/$v")
    fromPtr.filter(p => f.exists(new Path(p))).orElse {
      val root = new Path(stateDir)
      if (!f.exists(root)) None
      else f.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d+"))
        .flatMap { s =>
          val succ = new Path(s.getPath, "_SUCCESS")
          if (!f.exists(succ)) None
          else Some((f.getFileStatus(succ).getModificationTime,
            s.getPath.getName.drop(1).toLong, s.getPath.toString))
        }
        .sortBy(t => (t._1, t._2))
        .lastOption.map(_._3)
    }
  }

  /** Current view contents (one complete snapshot, whatever the
    * maintainer is doing concurrently). */
  def readLatest(spark: SparkSession, stateDir: String): Option[DataFrame] =
    latestSnapshot(spark, stateDir).map(spark.read.parquet(_))

  /** Start maintaining the view over streaming `rows`. AvailableNow by
    * default (drain-then-stop, the scheduled-refresh shape); pass
    * `continuous = true` for a long-running loop. */
  def maintain(rows: DataFrame, stateDir: String, checkpointDir: String,
               keys: Seq[String], measures: Seq[Measure],
               continuous: Boolean = false): StreamingQuery = {
    val writer = rows.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val f = fs(spark, stateDir)
        val snap = s"$stateDir/v$batchId"
        val prior = latestSnapshot(spark, stateDir)
        // Idempotent replay: a crash AFTER publish but BEFORE the stream
        // checkpoint commit re-delivers this batchId — its snapshot is
        // already the published state, so folding it again would
        // double-count (and the merge would read the very dir it
        // overwrites). Skip straight to the checkpoint commit. Compare
        // by version NAME: the _SUCCESS-scan fallback returns
        // fully-qualified paths (file:/…), which a raw-path equality
        // would miss in exactly the crash window the guard exists for.
        val priorName = prior.map(_.split('/').last)
        if (!priorName.contains(s"v$batchId")) {
          val delta = IncrementalAgg.state(batch, keys.map(col), measures)
          val merged = prior match {
            case Some(dir) =>
              IncrementalAgg.merge(Seq(spark.read.parquet(dir), delta),
                keys, measures)
            case None => delta
          }
          merged.write.mode("overwrite").parquet(snap)
          // publish via the shared staged-rename protocol ([[StatePointer]])
          StatePointer.publish(spark, stateDir, "LATEST", s"v$batchId")
          // Retention: keep the immediately-superseded snapshot for one
          // more batch (a reader that resolved it mid-publish can still
          // finish its scan); retire everything OLDER than that.
          val keep = Set(snap) ++ prior
          if (f.exists(new Path(stateDir)))
            f.listStatus(new Path(stateDir)).foreach { s0 =>
              val p = s0.getPath
              if (s0.isDirectory && p.getName.matches("v\\d+") &&
                !keep.contains(p.toString) &&
                !keep.exists(_.endsWith("/" + p.getName)))
                f.delete(p, true)
            }
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
    (if (continuous) writer else writer.trigger(Trigger.AvailableNow()))
      .start()
  }
}
