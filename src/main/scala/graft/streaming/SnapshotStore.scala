package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The versioned-pointer snapshot FOLD for streaming state whose whole
  * table is SMALL and rewritten per batch ([[SampleStream]] — the
  * maintained sample is k rows by construction; state that grows with
  * the corpus belongs on the delta-published [[DeltaLedger]] instead):
  * resolve the prior snapshot ([[ViewMaintenance.latestSnapshot]] —
  * pointer with `_SUCCESS`-scan fallback), skip a replayed batch whose
  * snapshot is already published (and whose fold would read the very
  * dir it overwrites), write `v{batchId}`, publish `LATEST` atomically,
  * and retire superseded snapshots keeping the immediately-previous one
  * for in-flight readers. Crash-safety is [[ViewMaintenance]]'s,
  * verbatim: a crash at any point leaves the previous pointer and its
  * snapshot fully intact. */
private[streaming] object SnapshotStore {

  /** Fold batch `batchId` into the store at `stateDir`: `f` receives
    * the prior snapshot (None before the first publish) and returns the
    * new full state. No-op on a replayed, already-published batch. */
  def fold(spark: SparkSession, stateDir: String, batchId: Long)
          (f: Option[DataFrame] => DataFrame): Unit = {
    val snap = s"$stateDir/v$batchId"
    val prior = ViewMaintenance.latestSnapshot(spark, stateDir)
    if (!prior.map(_.split('/').last).contains(s"v$batchId")) {
      f(prior.map(spark.read.parquet(_)))
        .write.mode("overwrite").parquet(snap)
      StatePointer.publish(spark, stateDir, "LATEST", s"v$batchId")
      val fs = new Path(stateDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val keep = Set(snap) ++ prior
      if (fs.exists(new Path(stateDir)))
        fs.listStatus(new Path(stateDir)).foreach { s0 =>
          val p = s0.getPath
          if (s0.isDirectory && p.getName.matches("v\\d+") &&
            !keep.contains(p.toString) &&
            !keep.exists(_.endsWith("/" + p.getName)))
            fs.delete(p, true)
        }
    }
  }
}
