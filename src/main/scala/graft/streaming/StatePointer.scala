package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import java.nio.charset.StandardCharsets

/** The shared pointer-file publication protocol for tiny streaming
  * state (a snapshot name, a high-water mark): stage to a tmp file,
  * then ONE atomic rename over the pointer — no window where the
  * pointer is missing or half-written. On filesystems whose rename
  * refuses to clobber, the explicit delete+rename fallback opens a
  * small loss window; every READER of a pointer must therefore carry
  * its own on-disk recovery for a missing pointer (ViewMaintenance
  * scans _SUCCESS-marked snapshots; LateData re-derives the mark from
  * its sinks) — the pointer is an optimization, never the only copy of
  * the state. */
private[streaming] object StatePointer {

  private def fsFor(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The pointer's content, or None if missing (crash window or first
    * run) — callers recover from their durable data, not from here. */
  def read(spark: SparkSession, dir: String, name: String): Option[String] = {
    val f = fsFor(spark, dir)
    val ptr = new Path(s"$dir/$name")
    try {
      if (!f.exists(ptr)) None
      else {
        val len = f.getFileStatus(ptr).getLen.toInt
        val buf = new Array[Byte](len)
        val in = f.open(ptr)
        try in.readFully(0, buf) finally in.close()
        Some(new String(buf, StandardCharsets.UTF_8).trim)
      }
    } catch {
      // exists/open race vs a concurrent publish's clobber fallback:
      // the pointer vanished mid-read — report "missing" so the
      // caller's documented recovery path engages instead of crashing
      case _: java.io.FileNotFoundException => None
    }
  }

  /** Stage + atomically publish `value` as the pointer's new content. */
  def publish(spark: SparkSession, dir: String, name: String,
              value: String): Unit = {
    val f = fsFor(spark, dir)
    val tmp = new Path(s"$dir/$name.tmp")
    val out = f.create(tmp, true)
    try out.write(value.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    f.rename(tmp, new Path(s"$dir/$name")) || {
      // HDFS-style rename refuses to clobber: replace explicitly (the
      // reader's recovery path covers a crash between these two calls)
      f.delete(new Path(s"$dir/$name"), false)
      f.rename(tmp, new Path(s"$dir/$name"))
    }
  }
}
