package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import java.nio.charset.StandardCharsets

/** Late-data accounting — the dead-letter channel Spark's watermarking
  * does NOT give you: a windowed aggregation silently discards rows
  * older than the watermark, so at 100 TB an upstream clock skew or a
  * stalled partition shows up as nothing at all. This operator splits
  * each micro-batch AGAINST ITS OWN advancing high-water mark before
  * any aggregation: on-time rows append to the main sink, late rows
  * append — tagged with batch id and observed lateness — to a late
  * sink, so "how much did we drop and how late was it" is a query, not
  * a guess.
  *
  * The high-water mark (max event time seen across batches) persists
  * as a pointer file with the same staged-rename publication as
  * [[ViewMaintenance]] — crash-safe, and replay simply reprocesses a
  * batch against the same (already-published-or-older) mark. Per batch
  * the work is one max() aggregate and one partitioned filter — no
  * shuffle beyond the writes. Mirrors Spark's own semantics: the
  * threshold is (max event time seen so far) − delay, advancing
  * monotonically, so a batch's own rows never make each other late
  * within the batch that first observes them. */
object LateData {

  private def readMark(spark: org.apache.spark.sql.SparkSession,
                       dir: String): Long = {
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ptr = new Path(s"$dir/MAX_TS")
    if (!f.exists(ptr)) Long.MinValue
    else {
      val len = f.getFileStatus(ptr).getLen.toInt
      val buf = new Array[Byte](len)
      val in = f.open(ptr)
      try in.readFully(0, buf) finally in.close()
      new String(buf, StandardCharsets.UTF_8).trim.toLong
    }
  }

  private def writeMark(spark: org.apache.spark.sql.SparkSession,
                        dir: String, v: Long): Unit = {
    val f = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(s"$dir/MAX_TS.tmp")
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    f.rename(tmp, new Path(s"$dir/MAX_TS")) || {
      f.delete(new Path(s"$dir/MAX_TS"), false)
      f.rename(tmp, new Path(s"$dir/MAX_TS"))
    }
  }

  /** Split the stream on lateness vs the persistent high-water mark.
    * `rows` must carry a timestamp column `tsCol`; late = event time
    * older than (mark − `delaySeconds`) where the mark is the max event
    * time seen in PRIOR batches. Late rows land in `lateDir` with
    * `batch_id` and `late_by_sec`; everything else lands in `mainDir`.
    * AvailableNow by default; `continuous = true` for a long loop. */
  def splitLate(rows: DataFrame, tsCol: String, delaySeconds: Long,
                mainDir: String, lateDir: String, stateDir: String,
                checkpointDir: String,
                continuous: Boolean = false): StreamingQuery = {
    val writer = rows.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val mark = readMark(spark, stateDir)
        val b = batch.persist()
        val ts = col(tsCol).cast("timestamp")
        val tsSec = unix_timestamp(ts)
        if (mark == Long.MinValue) b.write.mode("append").parquet(mainDir)
        else {
          val threshold = mark - delaySeconds
          b.filter(tsSec >= threshold)
            .write.mode("append").parquet(mainDir)
          val late = b.filter(tsSec < threshold)
            .withColumn("batch_id", lit(batchId))
            .withColumn("late_by_sec", lit(threshold) - tsSec)
          if (!late.isEmpty) late.write.mode("append").parquet(lateDir)
        }
        val newMax = b.agg(max(tsSec)).head()
        if (!newMax.isNullAt(0))
          writeMark(spark, stateDir, math.max(mark, newMax.getLong(0)))
        b.unpersist()
        ()
      }
      .option("checkpointLocation", checkpointDir)
    (if (continuous) writer else writer.trigger(Trigger.AvailableNow()))
      .start()
  }
}
