package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.VectorFns
import graft.similarity.Similarity

/** Incremental maintenance of a stored quantized ANN index
  * ([[Similarity.ivfBuildQuantized]]'s lake layout): new embedding
  * batches are encoded against the FIXED stored coarse quantizer and
  * appended to the inverted-lists store — the production contract for
  * index refresh between full rebuilds (retraining the quantizer would
  * silently re-key every existing list).
  *
  * Crash safety mirrors [[DedupStream]]: each batch writes its rows to
  * its own `graft_batch=<id>` subdir with overwrite, so a batch replayed
  * after a crash-before-checkpoint-commit REPLACES its previous attempt
  * instead of appending duplicate list rows. Assignment is per-vector
  * against fixed centroids, so the end-state store is EXACTLY the batch
  * build over the full corpus — the property the `t13_index_maintain`
  * oracle certifies end to end.
  *
  * Fail-closed: a missing or unreadable centroid store throws and fails
  * the batch — encoding against nothing must never fabricate an empty
  * assignment.
  *
  * Store lifecycle: run [[BatchStore.compact]] on `listsDir` between
  * drains; the serve path reads the lists through [[BatchStore.read]],
  * so an index that has lived through thousands of refresh batches
  * costs the same to open as a freshly built one (IndexStreamSpec
  * pins serve parity across compaction). */
object IndexStream {

  /** Tombstone `ids` (first column = vec_ids) out of the lists store —
    * the takedown path: [[readLists]] immediately excludes their list
    * entries (a deleted vector can never appear in a shortlist again),
    * and the next [[compactLists]] physically drops the rows. Run
    * between drains/serves — the store family's single-admin
    * contract. */
  def deleteVectors(spark: org.apache.spark.sql.SparkSession,
                    listsDir: String, ids: DataFrame): Unit =
    BatchStore.delete(spark, listsDir, ids)

  /** The live inverted-list rows `(cand_id, cent_id, code)` — the ONLY
    * correct way to read a maintained lists store: pointer-filtered
    * ([[BatchStore.read]]) and tombstone-masked, so a serve is exact at
    * every instant of a compaction and never scores a deleted
    * vector. */
  def readLists(spark: org.apache.spark.sql.SparkSession,
                listsDir: String): DataFrame = {
    val rows = BatchStore.read(spark, listsDir)
      .select("cand_id", "cent_id", "code")
    if (!BatchStore.hasDeletes(spark, listsDir)) rows
    else rows.join(BatchStore.readDeletes(spark, listsDir),
      col("cand_id") === col("del_id"), "left_anti")
  }

  /** Fold old list batch dirs into a base generation, physically
    * dropping tombstoned vectors' rows (run between drains — see
    * [[BatchStore]]). */
  def compactLists(spark: org.apache.spark.sql.SparkSession,
                   listsDir: String,
                   keepBatches: Int = 2): BatchStore.Compaction =
    BatchStore.compact(spark, listsDir, keepBatches, None,
      dropDeletedOn = Some("cand_id"))

  /** One batch of (vec_id, embedding) rows encoded against the FIXED
    * stored quantizer: nearest-centroid assignment + int8 quantization
    * — `(cand_id, cent_id, code)` list rows. Fail-closed on a missing
    * centroid store (encoding against nothing must never fabricate an
    * empty assignment). Shared by [[maintainIndex]] and
    * [[AnnIndex.maintain]]. */
  private[streaming] def encodeAgainst(batch: DataFrame,
                                       centroidDir: String): DataFrame = {
    val spark = batch.sparkSession
    val centPath = new Path(centroidDir)
    val fs = centPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(centPath),
      s"centroid store missing at $centroidDir — refusing to encode " +
        "against an empty quantizer")
    val cent = spark.read.parquet(centroidDir)
    // spread the one-file batch before the per-row assignment cosines —
    // see [[BatchStore.spreadBatch]]
    val c = BatchStore.spreadBatch(batch).select(col("vec_id").as("cand_id"),
      col("embedding").as("cv"))
    Similarity.ivfAssign(c, cent)
      .withColumn("scale", VectorFns.quantize_scale(col("cv")))
      .withColumn("code", VectorFns.quantize_i8(col("cv"), col("scale")))
      .select("cand_id", "cent_id", "code")
  }

  /** Start the maintenance stream over a streaming `vecs` frame with
    * (vec_id, embedding) columns. AvailableNow by default (drain-then-
    * stop); `continuous = true` for a long-running micro-batch loop.
    *
    * Caller contract: vec_ids are unique across the standing corpus and
    * all deltas (the upstream admission stream is what enforces
    * at-most-once ingest) — a re-ingested id would append a second list
    * row, and the serve path would score it twice. Within one batch
    * duplicates collapse naturally (assignment is keyed per (id, sub)).
    *
    * `kindCol`: STREAMED TOMBSTONES ([[PostingsStream.maintainPostings]]
    * has the full contract) — `"add"` rows are encoded, `"del"` rows
    * carry only a vec_id (embedding may be NULL, it is never read) and
    * tombstone the lists store after the batch's adds land; same-batch
    * add+del leaves the vector deleted, replays converge by set
    * semantics, any other kind fails the batch. */
  def maintainIndex(vecs: DataFrame, centroidDir: String, listsDir: String,
                    checkpointDir: String,
                    continuous: Boolean = false,
                    compactWhenBatchesExceed: Option[Int] = None,
                    kindCol: Option[String] = None)
      : StreamingQuery = {
    // Store-lifecycle policy, same shape as [[DedupStream]]: at drain
    // START (between drains by construction), fold old list batch dirs
    // into a base generation once the live dir count passes the
    // threshold — a refresh loop that has run thousands of times opens
    // as cheaply as a fresh build. A CONTINUOUS stream has no "next
    // drain start", so there the policy re-runs at the top of every
    // micro-batch, BEFORE the batch writes anything: the previous batch
    // has committed (or this is a replay, whose first-attempt dir is
    // the newest and `keepBatches ≥ 1` keeps it out of the fold), so
    // the between-batches safety argument is the same one the
    // between-drains placement relies on. Below threshold the re-check
    // costs one directory listing.
    def runPolicy(): Unit = compactWhenBatchesExceed.foreach { threshold =>
      val spark = vecs.sparkSession
      val p = new Path(listsDir)
      if (p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
        BatchStore.compactIfOver(spark, listsDir, threshold,
          dropDeletedOn = Some("cand_id"))
    }
    runPolicy()
    val writer = vecs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (continuous) runPolicy()
        val (adds, dels, _, nDels) = kindCol match {
          case Some(kc) => BatchStore.splitMixed(batch, kc)
          case None => (batch, batch.limit(0), -1L, 0L)
        }
        encodeAgainst(adds, centroidDir).write.mode("overwrite")
          .parquet(s"$listsDir/graft_batch=$batchId")
        if (kindCol.nonEmpty && nDels > 0)
          BatchStore.deleteNonEmpty(batch.sparkSession, listsDir,
            dels.select("vec_id"))
        ()
      }
      .option("checkpointLocation", checkpointDir)
    (if (continuous) writer else writer.trigger(Trigger.AvailableNow()))
      .start()
  }
}
