package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.similarity.Similarity

/** VERSIONED quantized ANN index with a retrain → re-encode → atomic-swap
  * lifecycle — the piece [[IndexStream]] deliberately leaves out: its
  * fixed stored quantizer makes incremental maintenance bit-exact, but
  * under distribution drift (a new embedding model, a new content
  * domain) the frozen coarse centroids stop describing the data and
  * recall degrades unboundedly. [[refresh]] is the gated recourse: the
  * quantizer retrains on the drained live corpus, EVERY live vector is
  * re-encoded against it, and the whole (centroids, lists) pair flips in
  * one atomic pointer swap — readers can never observe lists encoded
  * against one quantizer served through another (the mixed-quantizer
  * wrong-answer state that in-place retraining would produce).
  *
  * Layout: `root/v=<n>/centroids` (parquet) + `root/v=<n>/lists` (a
  * [[BatchStore]], seeded as a published generation and extended by
  * [[maintain]]'s per-batch appends), with the root `_CURRENT` pointer
  * naming the live version ([[StatePointer]] — atomic rename publish).
  * Centroids and lists travel under ONE version dir, so the single
  * pointer flip is the only commit point.
  *
  * Crash-safety of [[refresh]]: the new version is STAGED invisibly
  * (pointer still names the old one) — a crash anywhere during staging
  * leaves the live version fully intact and a rerun overwrite-converges;
  * after the flip, superseded version dirs are GC'd keeping the
  * immediately-previous one for in-flight readers (the
  * [[SnapshotStore]] retire convention). A maintenance batch replayed
  * ACROSS a swap is fenced by arithmetic: the rebuilt lists publish with
  * their high-water mark pinned to the highest batch id the rebuild
  * consumed ([[BatchStore.seedBase]]), so a re-delivered already-folded
  * batch dir is dead on arrival under the pointer filter.
  *
  * Deletion composes: [[delete]] tombstones the current version's lists
  * ([[IndexStream.readLists]] masks them at serve), and [[refresh]]
  * rebuilds from the masked read — deleted vectors are physically absent
  * from the new version, and the tombstone set is carried forward so an
  * out-of-contract re-ingest of a taken-down id stays suppressed. */
object AnnIndex {

  private val Pointer = "_CURRENT"

  private def vdir(root: String, v: Long) = s"$root/v=$v"
  private def listsDir(root: String, v: Long) = s"${vdir(root, v)}/lists"
  private def centDir(root: String, v: Long) = s"${vdir(root, v)}/centroids"

  /** The live version, if the index was ever initialized. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] =
    StatePointer.read(spark, root, Pointer)
      .collect { case s if s.matches("\\d+") => s.toLong }

  private def liveVersion(spark: SparkSession, root: String): Long =
    currentVersion(spark, root).getOrElse(throw new IllegalStateException(
      s"AnnIndex at $root is not initialized — run init() first"))

  /** Build version 1 from `corpus` (vec_id, embedding) and publish it.
    * Fails if the index already exists — a re-init would orphan the
    * maintenance stream's checkpoint ids. */
  def init(spark: SparkSession, root: String, corpus: DataFrame,
           nlist: Int = 16, lloydIters: Int = 2): Unit = {
    require(currentVersion(spark, root).isEmpty,
      s"AnnIndex at $root is already initialized — use refresh() to rebuild")
    publishVersion(spark, root, 1L, corpus, hwm = -1L, nlist, lloydIters,
      carryDeletes = None)
  }

  /** Stage version `nv` (train + encode + optional tombstone carry),
    * flip the root pointer, GC superseded versions (keeping nv − 1 for
    * in-flight readers). */
  private def publishVersion(spark: SparkSession, root: String, nv: Long,
                             vecs: DataFrame, hwm: Long, nlist: Int,
                             lloydIters: Int,
                             carryDeletes: Option[DataFrame]): Unit = {
    val (cent, lists) = Similarity.ivfBuildQuantized(vecs, nlist, lloydIters)
    cent.write.mode("overwrite").parquet(centDir(root, nv))
    BatchStore.seedBase(spark, listsDir(root, nv), lists, hwm)
    carryDeletes.foreach(d => BatchStore.delete(spark, listsDir(root, nv), d))
    StatePointer.publish(spark, root, Pointer, nv.toString)
    // GC (idempotent; crash here leaves dead dirs the pointer ignores):
    // retire all but the new and immediately-previous versions
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(root)))
      fs.listStatus(new Path(root)).foreach { s =>
        val n = s.getPath.getName
        if (s.isDirectory && n.startsWith("v=") &&
            n.stripPrefix("v=").toLong < nv - 1)
          fs.delete(s.getPath, true)
      }
  }

  /** Incremental maintenance against the CURRENT version's fixed
    * quantizer — [[IndexStream.maintainIndex]]'s contract (unique
    * vec_ids, per-batch crash-safe overwrite dirs), version-resolved at
    * every batch so a between-drains [[refresh]] redirects the next
    * drain automatically. `kindCol` enables the mixed add/delete feed
    * ([[IndexStream.maintainIndex]]): `"del"` rows tombstone the
    * CURRENT version's lists after the batch's adds land — [[refresh]]
    * then carries the set forward like any other tombstone. */
  def maintain(vecs: DataFrame, root: String, checkpointDir: String,
               continuous: Boolean = false,
               compactWhenBatchesExceed: Option[Int] = None,
               kindCol: Option[String] = None)
      : StreamingQuery = {
    val spark = vecs.sparkSession
    def runPolicy(): Unit = compactWhenBatchesExceed.foreach { threshold =>
      val ld = listsDir(root, liveVersion(spark, root))
      val p = new Path(ld)
      if (p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
        BatchStore.compactIfOver(spark, ld, threshold,
          dropDeletedOn = Some("cand_id"))
    }
    runPolicy()
    val writer = vecs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (continuous) runPolicy()
        val v = liveVersion(batch.sparkSession, root)
        val (adds, dels) = kindCol match {
          case Some(kc) => BatchStore.splitMixed(batch, kc)
          case None => (batch, batch.limit(0))
        }
        IndexStream.encodeAgainst(adds, centDir(root, v))
          .write.mode("overwrite")
          .parquet(s"${listsDir(root, v)}/${BatchStore.BatchCol}=$batchId")
        if (kindCol.nonEmpty)
          BatchStore.delete(batch.sparkSession, listsDir(root, v),
            dels.select("vec_id"))
        ()
      }
      .option("checkpointLocation", checkpointDir)
    (if (continuous) writer else writer.trigger(Trigger.AvailableNow()))
      .start()
  }

  /** Tombstone `ids` (first column = vec_ids) out of the current
    * version — [[IndexStream.deleteVectors]] semantics. */
  def delete(spark: SparkSession, root: String, ids: DataFrame): Unit =
    BatchStore.delete(spark, listsDir(root, liveVersion(spark, root)), ids)

  /** Serve top-k through the current version: one pointer resolve, then
    * centroids and tombstone-masked lists from the SAME version dir —
    * never a mixed-quantizer read. */
  def serve(spark: SparkSession, root: String, queries: DataFrame,
            corpus: DataFrame, k: Int, nprobe: Int = 4,
            rescoreK: Int = 15): DataFrame = {
    val v = liveVersion(spark, root)
    Similarity.ivfServeQuantized(queries,
      spark.read.parquet(centDir(root, v)),
      IndexStream.readLists(spark, listsDir(root, v)),
      corpus, k, nprobe, rescoreK)
  }

  /** The retrain → re-encode → atomic-swap lifecycle step. `corpus`
    * must supply the float vector of EVERY live id (the lists store
    * holds only int8 codes — re-encoding needs the source vectors);
    * partial coverage fails closed rather than silently rebuilding a
    * shrunken index. Run BETWEEN drains (the [[BatchStore.compact]]
    * admin contract). Returns the new version id.
    *
    * The rebuilt index equals a from-scratch
    * [[Similarity.ivfBuildQuantized]] over the live (tombstone-masked)
    * corpus — the identity the `t19_quantizer_refresh` oracle replays —
    * and the new lists publish with hwm pinned to the highest consumed
    * batch id, fencing any post-swap replay of an already-folded
    * batch. */
  def refresh(spark: SparkSession, root: String, corpus: DataFrame,
              nlist: Int = 16, lloydIters: Int = 2): Long = {
    val v = liveVersion(spark, root)
    val ld = listsDir(root, v)
    val liveIds = IndexStream.readLists(spark, ld)
      .select(col("cand_id")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vecs = corpus.select(col("vec_id"), col("embedding"))
      .join(liveIds, col("vec_id") === col("cand_id"), "left_semi")
    val (nLive, nVec) = (liveIds.count(), vecs.count())
    require(nVec == nLive,
      s"corpus covers $nVec of $nLive live ids — refusing to rebuild a " +
        "partial index (a takedown is a delete(), not a missing vector)")
    val dels =
      if (BatchStore.hasDeletes(spark, ld))
        Some(BatchStore.readDeletes(spark, ld))
      else None
    publishVersion(spark, root, v + 1, vecs,
      hwm = BatchStore.maxBatchId(spark, ld), nlist, lloydIters, dels)
    liveIds.unpersist()
    v + 1
  }
}
