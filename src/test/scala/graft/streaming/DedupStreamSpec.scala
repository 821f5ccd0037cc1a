package graft.streaming

import graft.SparkSpec
import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Streaming corpus admission: micro-batches of documents screened
  * against the growing signature store, verdicts appended, admitted
  * signatures extending the store — and the whole run equal to the same
  * batches replayed through batch-mode incremental admission. */
class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private def writeBatch(watchDir: String, name: String,
                         rows: Seq[(Long, String)]): Unit = {
    val stage = Files.createTempDirectory("dedup_stage").toString
    rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    Files.copy(part.toPath, Paths.get(watchDir, name))
  }

  test("streaming admission matches batch-mode incremental admission") {
    val root = Files.createTempDirectory("dedup_stream").toString
    val watch = s"$root/in"; Files.createDirectories(Paths.get(watch))
    val store = s"$root/store"; val verdicts = s"$root/verdicts"
    val ckpt = s"$root/ckpt"

    val b0 = Seq(
      1L -> "the quick brown fox jumps over the lazy dog every single day",
      2L -> "completely different words about spark streaming state and time")
    val b1 = Seq(
      3L -> "the quick brown fox jumps over the lazy dog every single day", // dup of 1
      4L -> "a third topic entirely involving parquet files and bucket joins")
    val b2 = Seq(
      5L -> "a third topic entirely involving parquet files and bucket joins", // dup of 4
      6L -> "twins inside one batch share their text word for word exactly",
      7L -> "twins inside one batch share their text word for word exactly") // dup of 6
    writeBatch(watch, "b0.parquet", b0)
    Thread.sleep(20)
    writeBatch(watch, "b1.parquet", b1)
    Thread.sleep(20)
    writeBatch(watch, "b2.parquet", b2)

    val docs = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(watch)
    DedupStream.admitDocuments(docs, store, verdicts, ckpt)
      .awaitTermination()

    val got = spark.read.parquet(verdicts)
      .select("doc_id", "verdict", "dup_of")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(got.size == 7)
    assert(got(1L) == ("admit", -1L) && got(2L) == ("admit", -1L))
    assert(got(3L) == ("reject", 1L))
    assert(got(4L) == ("admit", -1L))
    assert(got(5L) == ("reject", 4L))
    assert(got(6L) == ("admit", -1L) && got(7L) == ("reject", 6L))

    // the store holds exactly the admitted signatures
    val storedIds = spark.read.parquet(store)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(storedIds == Set(1L, 2L, 4L, 6L))

    // parity: replay the same batches through batch-mode admission
    def sigs(rows: Seq[(Long, String)]): DataFrame =
      Dedup.minhashSignatures(rows.toDF("doc_id", "text"),
        col("doc_id"), col("text"), numHashes = 32)
    var corpus = sigs(Seq.empty).limit(0)
    val replayed = Seq(b0, b1, b2).flatMap { batch =>
      val delta = sigs(batch)
      val v = Dedup.minhashIncremental(corpus, delta)
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      val admitted = v.filter(_._2._1 == "admit").map(_._1).toSet
      corpus = corpus.unionByName(
        delta.filter(col("id").isInCollection(admitted)))
      v
    }.toMap
    assert(replayed == got)

    // crash-replay idempotency: drop the LAST batch's commit marker (a
    // crash after the foreachBatch body but before the checkpoint commit)
    // and restart — the source re-delivers batch 2, whose per-batch
    // subdir overwrite must REPLACE the first attempt, not append to it.
    val commits = new java.io.File(s"$ckpt/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.nonEmpty)
    val crc = new java.io.File(s"$ckpt/commits/.${commits.last.getName}.crc")
    if (crc.exists()) crc.delete()
    assert(commits.last.delete())
    val docs2 = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(watch)
    DedupStream.admitDocuments(docs2, store, verdicts, ckpt)
      .awaitTermination()

    val after = spark.read.parquet(verdicts)
      .select("doc_id", "verdict", "dup_of").collect()
    assert(after.length == 7, "replayed batch must not duplicate verdicts")
    assert(after.map(r => r.getLong(0) ->
      (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap == got)
    val storeRows = spark.read.parquet(store).select("id").collect()
    assert(storeRows.length == 4, "replayed batch must not duplicate signatures")
    assert(storeRows.map(_.getLong(0)).toSet == Set(1L, 2L, 4L, 6L))
  }
}
