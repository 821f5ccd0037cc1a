package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

/** Late-data accounting: stragglers older than the advancing high-water
  * mark minus the delay land in the late sink with lineage, nothing is
  * silently dropped, and totals are conserved. */
class LateDataSpec extends SparkSpec {
  import spark.implicits._

  private def writeBatch(watchDir: String, name: String,
                         rows: Seq[(Long, Long)]): Unit = {
    val stage = Files.createTempDirectory("late_stage").toString
    rows.map { case (id, sec) => (id, new Timestamp(sec * 1000)) }
      .toDF("id", "ts").coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, Paths.get(watchDir, name))
  }

  test("stragglers are accounted in the late sink, totals conserved") {
    val root = Files.createTempDirectory("late_stream").toString
    val watch = s"$root/in"; Files.createDirectories(Paths.get(watch))
    val base = 1000000L
    // batch0 advances the mark to base+600; batch1 carries one row 300s
    // older than (mark - 120s delay) and one on-time row; batch2's
    // straggler is within the delay and must stay on time
    writeBatch(watch, "b0.parquet", Seq((1L, base), (2L, base + 600)))
    Thread.sleep(20)
    writeBatch(watch, "b1.parquet", Seq((3L, base + 180), (4L, base + 700)))
    Thread.sleep(20)
    writeBatch(watch, "b2.parquet", Seq((5L, base + 620), (6L, base + 800)))

    val rows = spark.readStream
      .schema("id LONG, ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(watch)
    LateData.splitLate(rows, "ts", delaySeconds = 120,
      s"$root/main", s"$root/late", s"$root/state", s"$root/ckpt")
      .awaitTermination()

    val main = spark.read.parquet(s"$root/main")
      .select("id").as[Long].collect().toSet
    val late = spark.read.parquet(s"$root/late")
      .select(col("id"), col("batch_id"), col("late_by_sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // row 3 is late: threshold at batch1 = (base+600) - 120; 3 is at
    // base+180 → 300s late. Row 5 (base+620 vs threshold base+580) is
    // within the delay → on time.
    assert(main == Set(1L, 2L, 4L, 5L, 6L))
    assert(late.toSeq == Seq((3L, 1L, 300L)))
    assert(main.size + late.length == 6) // nothing silently dropped
  }

  test("first batch has no mark: everything is on time") {
    val root = Files.createTempDirectory("late_first").toString
    val watch = s"$root/in"; Files.createDirectories(Paths.get(watch))
    writeBatch(watch, "b0.parquet", Seq((1L, 5000L), (2L, 100L)))
    val rows = spark.readStream.schema("id LONG, ts TIMESTAMP").parquet(watch)
    LateData.splitLate(rows, "ts", 60, s"$root/main", s"$root/late",
      s"$root/state", s"$root/ckpt").awaitTermination()
    assert(spark.read.parquet(s"$root/main").count() == 2)
    assert(!Files.exists(Paths.get(s"$root/late")))
  }
}
