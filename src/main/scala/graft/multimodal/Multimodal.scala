package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star M8 scope): treat image/audio/
  * video payloads as opaque `binary` columns with typed metadata, and run
  * decode / feature-extraction as partition-wise batch transforms.
  *
  * The decode step itself is STUBBED (no image/audio libraries in this
  * environment — [[StubDecoder]] is deterministic fake decode); the
  * Spark-side plumbing is real: binary columns + metadata struct schema,
  * a typed `Dataset` boundary, and `mapPartitions` batch shape so a real
  * decoder (JNI/ONNX/ffmpeg) would slot in per-partition with one
  * initialization per task — the 100 TB-correct shape for heavyweight
  * per-row libraries.
  */
object Multimodal {

  /** Typed row for the feature-extraction boundary. */
  case class MediaRow(doc_id: Long, payload: Array[Byte], format: String)
  case class MediaFeatures(doc_id: Long, byte_len: Long, width: Int,
                           height: Int, feat_mean: Double)

  /** Stub decoder: a real implementation would decode pixels/samples.
    * Deterministic fake derived only from payload bytes + declared format
    * so tests and oracles can reproduce it. */
  object StubDecoder extends Serializable {
    def decode(payload: Array[Byte], format: String): MediaFeatures0 = {
      val len = payload.length
      // fake "dimensions" from the payload size; fake feature = mean byte.
      val width = 16 + (len % 32)
      val height = 16 + (len % 16)
      val mean = if (len == 0) 0.0
        else payload.map(b => (b & 0xff).toDouble).sum / len
      MediaFeatures0(len.toLong, width, height, mean)
    }
  }
  case class MediaFeatures0(byte_len: Long, width: Int, height: Int,
                            feat_mean: Double)

  /** Attach the multimodal columns: binary payload + metadata struct.
    * In production the payload would come from the lakehouse row or an
    * object-store pointer; here it is the document text's bytes. */
  def withMediaColumns(docs: DataFrame): DataFrame =
    docs
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("format",
        element_at(array(lit("png"), lit("jpeg"), lit("webp")),
          (col("doc_id") % 3 + 1).cast("int")))
      .withColumn("media_meta", struct(
        length(col("payload")).as("byte_len"),
        md5(col("payload")).as("checksum"),
        col("format").as("format")))

  /** One sampled "frame" of a media payload. */
  case class FrameRow(doc_id: Long, frame_index: Long, frame_len: Long)

  /** Frame sampling for video-like payloads: the payload divides into
    * fixed-size frames and every `everyN`-th one is kept. The decode is
    * the stub convention (frame = `frameBytes` payload bytes); a real
    * implementation would seek + decode inside the same flatMap. The
    * shape is the part that matters at 100 TB: partition-wise iterator
    * flatMap — one row fans out to its sampled frames lazily, so memory
    * is bounded by one payload regardless of frame count, and the
    * downstream sees ordinary rows it can filter/aggregate/shuffle. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameBytes: Int = 256, everyN: Int = 2): Dataset[FrameRow] = {
    import spark.implicits._
    require(frameBytes > 0 && everyN > 0, s"($frameBytes, $everyN)")
    media.select(col("doc_id"), col("payload")).as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val n = (payload.length + frameBytes - 1) / frameBytes
          Iterator.range(0, n).filter(_ % everyN == 0).map { i =>
            FrameRow(id, i.toLong,
              math.min(frameBytes, payload.length - i * frameBytes).toLong)
          }
        }
      }
  }

  /** Partition-wise feature extraction through the typed Dataset boundary:
    * one decoder init per partition, rows streamed through in batch. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"), col("format"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // decoder/session init would happen here, once per task
        rows.map { r =>
          val f = StubDecoder.decode(r.payload, r.format)
          MediaFeatures(r.doc_id, f.byte_len, f.width, f.height, f.feat_mean)
        }
      }
  }
}
