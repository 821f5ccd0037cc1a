package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}
import graft.dedup.Dedup

/** Streaming corpus admission — the ingest loop a growing 100 TB training
  * corpus actually runs: new documents arrive in micro-batches, each batch
  * is MinHash-signed and screened against the persistent signature store
  * via [[Dedup.minhashIncremental]] (asymmetric probe: corpus×corpus
  * candidates are never generated), verdicts append to an audit sink, and
  * ONLY the admitted docs' signatures append to the store — so later
  * batches automatically screen against everything admitted before them.
  *
  * Per-batch cost scales with |batch| × collision rate, never |corpus|²;
  * the store carries `numHashes` longs per admitted doc (the certified
  * lossless parquet round trip — see the `m8_signature_store` gate).
  * Admission order is first-seen-wins, so with an ordered source (file
  * stream + `maxFilesPerTrigger`) the verdict stream is deterministic and
  * equals the same batches replayed through batch-mode admission —
  * asserted in DedupStreamSpec. */
object DedupStream {

  /** Signature-store schema: (id, sig[numHashes]). */
  private def sigSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("sig", ArrayType(LongType))))

  /** Start the admission stream over a streaming `docs` frame with
    * (doc_id, text) columns. AvailableNow by default: drain what exists,
    * then stop — the scheduled-ingest shape; pass `continuous = true`
    * for a long-running micro-batch loop. */
  def admitDocuments(docs: DataFrame, sigStoreDir: String,
                     verdictDir: String, checkpointDir: String,
                     bands: Int = 8, rowsPerBand: Int = 4,
                     minAgreement: Double = 0.5,
                     portable: Boolean = false,
                     continuous: Boolean = false): StreamingQuery = {
    val writer = docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val delta = Dedup.minhashSignatures(batch, col("doc_id"), col("text"),
          numHashes = bands * rowsPerBand, portable = portable).persist()
        // First batch: no store yet — screen against an empty corpus.
        val corpus =
          try spark.read.schema(sigSchema).parquet(sigStoreDir)
          catch { case _: Exception =>
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], sigSchema)
          }
        val verdicts = Dedup.minhashIncremental(corpus, delta,
          bands, rowsPerBand, minAgreement, portable).persist()
        verdicts.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(verdictDir)
        // Admitted signatures extend the store; rejected ones are dropped
        // (their surviving twin already stands in for them).
        delta.join(
            verdicts.filter(col("verdict") === "admit")
              .select(col("doc_id").as("id")),
            Seq("id"), "left_semi")
          .write.mode("append").parquet(sigStoreDir)
        verdicts.unpersist()
        delta.unpersist()
        ()
      }
      .option("checkpointLocation", checkpointDir)
    (if (continuous) writer else writer.trigger(Trigger.AvailableNow()))
      .start()
  }
}
