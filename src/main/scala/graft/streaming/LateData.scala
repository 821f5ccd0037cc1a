package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Late-data accounting — the dead-letter channel Spark's watermarking
  * does NOT give you: a windowed aggregation silently discards rows
  * older than the watermark, so at 100 TB an upstream clock skew or a
  * stalled partition shows up as nothing at all. This operator splits
  * each micro-batch AGAINST ITS OWN advancing high-water mark before
  * any aggregation: on-time rows land in the main sink, late rows in a
  * late sink tagged with observed lateness, and rows whose event time
  * is NULL or unparseable are accounted in the late sink too
  * (lateness null) — nothing is ever silently dropped.
  *
  * Crash-safety, concretely:
  *  - each batch writes to its own `batch=<id>` subdirectory with
  *    overwrite, so a REPLAYED batch (crash before the stream
  *    checkpoint commit) replaces its own previous attempt instead of
  *    appending duplicates — totals stay conserved across restarts
  *    (the replay may reclassify a row main→late if the mark advanced
  *    before the crash; both subdirs are rewritten, so the final state
  *    is consistent);
  *  - the high-water mark persists via [[StatePointer]]; if the
  *    pointer is lost in the clobber-fallback window, the mark is
  *    RE-DERIVED from the sinks themselves (max event time across
  *    main + late) — the pointer is an optimization, the durable data
  *    is the source of truth, and a lost pointer can never silently
  *    admit arbitrarily late data as on-time.
  * Per batch the work is one max() aggregate and two partitioned
  * filter-writes. Mirrors Spark's own semantics: the threshold is
  * (max event time seen in PRIOR batches) − delay, advancing
  * monotonically. */
object LateData {

  private def readMark(spark: SparkSession, stateDir: String,
                       sinkDirs: Seq[String], tsCol: String): Long =
    StatePointer.read(spark, stateDir, "MAX_TS").map(_.toLong).getOrElse {
      // pointer missing: first run, or lost in the clobber window —
      // recover the true mark from the durable sinks
      val fs0 = new Path(stateDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val present = sinkDirs.filter(d => fs0.exists(new Path(d)))
      if (present.isEmpty) Long.MinValue
      else present.map { d =>
        val r = spark.read.parquet(d)
          .agg(max(unix_timestamp(col(tsCol).cast("timestamp")))).head()
        if (r.isNullAt(0)) Long.MinValue else r.getLong(0)
      }.max
    }

  /** Split the stream on lateness vs the persistent high-water mark.
    * `rows` must carry a timestamp column `tsCol`; late = event time
    * older than (mark − `delaySeconds`) where the mark is the max event
    * time seen in PRIOR batches. Late rows land in `lateDir` with
    * `late_by_sec` (null for unparseable event times) under a
    * `batch=<id>` partition; everything else lands in `mainDir` the
    * same way. AvailableNow by default; `continuous = true` for a long
    * loop. */
  def splitLate(rows: DataFrame, tsCol: String, delaySeconds: Long,
                mainDir: String, lateDir: String, stateDir: String,
                checkpointDir: String,
                continuous: Boolean = false): StreamingQuery = {
    val writer = rows.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val mark = readMark(spark, stateDir, Seq(mainDir, lateDir), tsCol)
        val b = batch.persist()
        val tsSec = unix_timestamp(col(tsCol).cast("timestamp"))
        val isLate =
          if (mark == Long.MinValue) tsSec.isNull
          else tsSec.isNull || tsSec < lit(mark - delaySeconds)
        val lateBy =
          if (mark == Long.MinValue) lit(null).cast("long")
          else when(tsSec.isNull, lit(null).cast("long"))
            .otherwise(lit(mark - delaySeconds) - tsSec)
        b.filter(!isLate)
          .write.mode("overwrite").parquet(s"$mainDir/batch=$batchId")
        val late = b.filter(isLate).withColumn("late_by_sec", lateBy)
        if (!late.isEmpty)
          late.write.mode("overwrite").parquet(s"$lateDir/batch=$batchId")
        val newMax = b.agg(max(tsSec)).head()
        if (!newMax.isNullAt(0))
          StatePointer.publish(spark, stateDir, "MAX_TS",
            math.max(mark, newMax.getLong(0)).toString)
        b.unpersist()
        ()
      }
      .option("checkpointLocation", checkpointDir)
    (if (continuous) writer else writer.trigger(Trigger.AvailableNow()))
      .start()
  }
}
