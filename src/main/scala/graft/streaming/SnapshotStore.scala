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
  * snapshot fully intact.
  *
  * TWO root-level pointers ride next to `LATEST`:
  *
  *  - `_FOLDED` — the highest STREAM batch id ever folded, published
  *    right after a stream fold's `LATEST`. The replay guard checks it
  *    in addition to the prior-snapshot name: after an ADMIN publish
  *    (a takedown between the fold and the checkpoint commit, version
  *    id far above the stream's) the latest snapshot no longer names
  *    `v{batchId}`, but the batch IS folded — re-folding it over the
  *    post-delete state would let adds cut at rank > k backfill the
  *    deleted slots (the shrink-not-refill violation). Admin folds
  *    never touch `_FOLDED` (their huge ids would fence out every
  *    later real batch) and are idempotent by construction (anti-join
  *    deletes), so they carry no replay guard of their own.
  *  - per-snapshot `_SEQ` — a monotonic publish sequence number
  *    (prior's + 1) written inside each snapshot dir before `LATEST`
  *    flips. The pointer-loss fallback orders candidates by
  *    (seq, `_SUCCESS` mtime, version), so two publishes landing in the
  *    same filesystem-timestamp granule (object stores with second
  *    resolution) can never resolve to the earlier one — mtime alone
  *    would tie and fall back to the numeric version, which an admin
  *    snapshot's huge id always wins. A snapshot without `_SEQ` (a
  *    crash between the parquet write and the seq publish — always
  *    unreferenced, since `LATEST` flips later) ranks below every
  *    sequenced snapshot. */
private[streaming] object SnapshotStore {

  private[streaming] val FoldedPtr = "_FOLDED"
  private[streaming] val SeqPtr = "_SEQ"

  /** The publish sequence number of snapshot dir `snapDir`, if any. */
  private[streaming] def seqOf(spark: SparkSession, snapDir: String)
      : Option[Long] =
    StatePointer.read(spark, snapDir, SeqPtr)
      .collect { case s if s.matches("\\d+") => s.toLong }

  /** The highest stream batch id ever folded into `stateDir`. */
  private[streaming] def maxFolded(spark: SparkSession, stateDir: String)
      : Option[Long] =
    StatePointer.read(spark, stateDir, FoldedPtr)
      .collect { case s if s.matches("-?\\d+") => s.toLong }

  /** Fold batch `batchId` into the store at `stateDir`: `f` receives
    * the prior snapshot (None before the first publish) and returns the
    * new full state. No-op on a replayed, already-published batch —
    * detected by the prior snapshot's name OR the `_FOLDED` high-water
    * mark (which survives an interleaved admin publish). `admin = true`
    * marks a takedown publish (version id far above the stream's): it
    * skips the replay guard and never advances `_FOLDED`. */
  def fold(spark: SparkSession, stateDir: String, batchId: Long,
           admin: Boolean = false)
          (f: Option[DataFrame] => DataFrame): Unit = {
    val snap = s"$stateDir/v$batchId"
    val prior = ViewMaintenance.latestSnapshot(spark, stateDir)
    val alreadyFolded = !admin && (
      prior.map(_.split('/').last).contains(s"v$batchId") ||
        maxFolded(spark, stateDir).exists(batchId <= _))
    if (!alreadyFolded) {
      f(prior.map(spark.read.parquet(_)))
        .write.mode("overwrite").parquet(snap)
      // publish sequence INSIDE the still-unreferenced snapshot dir,
      // then flip the pointer — the fallback scan orders on it
      val seq = prior.flatMap(p => seqOf(spark, p)).getOrElse(0L) + 1L
      StatePointer.publish(spark, snap, SeqPtr, seq.toString)
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
    // advance the high-water mark even on the SKIP path: a crash
    // between the first attempt's LATEST publish and its _FOLDED
    // publish leaves a replay that skips by prior-name — if that replay
    // didn't advance _FOLDED either, a post-delete second crash would
    // re-open exactly the re-fold window the mark exists to close
    if (!admin && !maxFolded(spark, stateDir).exists(batchId <= _))
      StatePointer.publish(spark, stateDir, FoldedPtr, batchId.toString)
  }
}
