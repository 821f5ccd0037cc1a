package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Lifecycle management for the per-batch (`graft_batch=<id>`) store
  * layout [[DedupStream]] and [[IndexStream]] write: without compaction
  * every micro-batch leaves one subdirectory forever, and at production
  * batch counts the store read degrades into a small-file listing
  * problem (the 100 TB admission pipeline's missing lifecycle piece —
  * round-12 verdict).
  *
  * Layout and protocol:
  *  - positive `graft_batch=N` dirs are live per-batch appends (the
  *    streaming writers' crash-safe overwrite targets, unchanged);
  *  - `graft_batch=-1` is an optional MANUAL base (a batch-mode build
  *    seeded before streaming starts — the `t13_index_maintain` shape);
  *  - `graft_batch=-G` for G ≥ 2 are COMPACTED base generations;
  *  - the root pointer file `_BASE` (underscore-prefixed so Spark's
  *    file index ignores it) names the live generation and the folded
  *    high-water mark: `gen=G;hwm=H`. Exactly one base generation is
  *    ever live, and batch dirs ≤ H are dead regardless of whether
  *    garbage collection has removed them yet.
  *
  * [[read]] is the ONLY correct way to read such a store: it applies
  * the pointer filter, so a reader is correct at every instant of a
  * compaction — staged-but-unpublished generations and folded-but-not-
  * yet-deleted batch dirs are excluded by arithmetic, not by hoping GC
  * finished. Crash-safety falls out of the ordering: stage the new
  * generation (invisible: pointer still names the old one) → publish
  * the pointer (atomic file rename, [[StatePointer]]) → GC old dirs
  * (idempotent; a crash here leaves dead dirs the filter already
  * excludes and the next compaction removes).
  *
  * Replay idempotence is preserved: `keepBatches ≥ 1` keeps the most
  * recent batch dirs unfolded, and structured streaming only ever
  * re-delivers the last uncommitted batch — whose dir is live and still
  * the overwrite target. Run [[compact]] between drains (the
  * AvailableNow admission/maintenance shape), not mid-stream.
  */
object BatchStore {

  val BatchCol = "graft_batch"
  private val PointerName = "_BASE"

  /** Result of one [[compact]] call. `gen < 0` means no-op. */
  case class Compaction(gen: Long, foldedThrough: Long,
                        foldedBatches: Seq[Long], baseRows: Long)

  private def fsFor(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val PtrRe = """gen=(\d+);hwm=(-?\d+)""".r

  /** The published (generation, folded-high-water-mark), if any. */
  def readPointer(spark: SparkSession, dir: String): Option[(Long, Long)] =
    StatePointer.read(spark, dir, PointerName).flatMap {
      case PtrRe(g, h) => Some((g.toLong, h.toLong))
      case _ => None
    }

  /** Live-row predicate under the pointer protocol (see class doc). */
  def liveFilter(ptr: Option[(Long, Long)]): Column = ptr match {
    case Some((gen, hwm)) => col(BatchCol) === -gen || col(BatchCol) > hwm
    case None => col(BatchCol) >= 0 || col(BatchCol) === -1L
  }

  /** Read the store's live rows: exactly one base generation plus every
    * batch dir above the folded mark. `schema` pins the read schema
    * (include the `graft_batch` LongType partition column) for stores
    * whose readers must fail closed on drift. */
  def read(spark: SparkSession, dir: String,
           schema: Option[StructType] = None): DataFrame = {
    val reader = schema.map(spark.read.schema).getOrElse(spark.read)
    reader.parquet(dir).filter(liveFilter(readPointer(spark, dir)))
  }

  /** List the store's `graft_batch=<id>` dir ids (positive and base). */
  private def batchDirs(spark: SparkSession, dir: String): Seq[Long] = {
    val fs = fsFor(spark, dir)
    val p = new Path(dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith(s"$BatchCol=") =>
        n.stripPrefix(s"$BatchCol=").toLong }
  }

  /** Fold every live batch dir except the newest `keepBatches` (and the
    * current base) into a fresh base generation, publish it, and
    * garbage-collect the superseded dirs. Offline operation: run
    * between drains, never against a mid-batch stream. Idempotent and
    * crash-safe at every step (see class doc); a rerun after any crash
    * converges. Returns the no-op report when there is nothing to fold. */
  def compact(spark: SparkSession, dir: String,
              keepBatches: Int = 2): Compaction = {
    require(keepBatches >= 1,
      s"keepBatches must be >= 1 to preserve replay idempotence: $keepBatches")
    val ptr = readPointer(spark, dir)
    val hwm = ptr.map(_._2).getOrElse(-1L)
    val dirs = batchDirs(spark, dir)
    val liveBatches = dirs.filter(_ > hwm).filter(_ >= 0).sorted
    val foldIds = liveBatches.dropRight(keepBatches)
    if (foldIds.isEmpty)
      return Compaction(-1L, hwm, Seq.empty, -1L)
    val newGen = ptr.map(_._1 + 1).getOrElse(2L)
    val newHwm = foldIds.max
    // Stage: current base rows + the folded batches' rows become the new
    // generation. Read through the pointer filter so a previous crashed
    // staging of this same generation (about to be overwritten) and
    // already-dead dirs contribute nothing.
    val folded = read(spark, dir)
      .filter(col(BatchCol) <= newHwm) // base gens are negative: included
      .drop(BatchCol)
    val baseRows = folded.count()
    folded.write.mode("overwrite").parquet(s"$dir/$BatchCol=-$newGen")
    // Publish: one atomic pointer rename flips the live set from
    // {old base, all batches > hwm} to {new base, batches > newHwm}.
    StatePointer.publish(spark, dir, PointerName, s"gen=$newGen;hwm=$newHwm")
    // GC (idempotent): superseded bases, folded batch dirs, and any
    // stale staged generations a crashed compaction left behind.
    val fs = fsFor(spark, dir)
    batchDirs(spark, dir)
      .filter(id => (id < 0 && id != -newGen) || (id >= 0 && id <= newHwm))
      .foreach(id => fs.delete(new Path(s"$dir/$BatchCol=$id"), true))
    Compaction(newGen, newHwm, foldIds, baseRows)
  }
}
