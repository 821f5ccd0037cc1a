package graft.streaming

import graft.SparkSpec
import graft.ops.IncrementalAgg
import graft.ops.IncrementalAgg.Measure
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Streaming materialized-view maintenance: micro-batches folded into
  * the persistent state table must leave exactly `state(all rows)`. */
class ViewMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private val measures = Seq(
    Measure("s", "sum", col("v").cast("decimal(18,2)")),
    Measure("n", "count", lit(1)),
    Measure("lo", "min", col("v")),
    Measure("hi", "max", col("v")))

  private def writeBatch(watchDir: String, name: String,
                         rows: Seq[(String, Double)]): Unit = {
    val stage = Files.createTempDirectory("view_stage").toString
    rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, Paths.get(watchDir, name))
  }

  test("3-batch maintained view equals the batch-mode aggregate") {
    val root = Files.createTempDirectory("view_stream").toString
    val watch = s"$root/in"; Files.createDirectories(Paths.get(watch))
    val all = Seq(
      Seq("a" -> 1.5, "b" -> 2.0),
      Seq("a" -> 0.25, "c" -> -3.0),
      Seq("b" -> 4.0, "a" -> 1.0, "c" -> 1.0))
    all.zipWithIndex.foreach { case (b, i) =>
      writeBatch(watch, s"b$i.parquet", b); Thread.sleep(20)
    }
    val rows = spark.readStream
      .schema("k STRING, v DOUBLE")
      .option("maxFilesPerTrigger", "1")
      .parquet(watch)
    ViewMaintenance.maintain(rows, s"$root/state", s"$root/ckpt",
      Seq("k"), measures).awaitTermination()

    val got = spark.read.parquet(s"$root/state/current")
      .select(col("k"), col("s").cast("decimal(38,2)"), col("n"),
        col("lo"), col("hi"))
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    val want = IncrementalAgg.state(all.flatten.toDF("k", "v"),
        Seq(col("k")), measures)
      .select(col("k"), col("s").cast("decimal(38,2)"), col("n"),
        col("lo"), col("hi"))
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got == want)
    assert(!Files.exists(Paths.get(s"$root/state/next")), "staging swapped away")
  }
}
