package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star M8 scope): treat image/audio/
  * video payloads as opaque `binary` columns with typed metadata, and run
  * decode / feature-extraction as partition-wise batch transforms.
  *
  * Image payloads decode for REAL via [[ImageIoDecoder]] (`javax.imageio`
  * — public JDK, no extra dependency): dimensions, channel count, and
  * integer-exact per-channel pixel sums. Payloads `ImageIO` cannot parse
  * (audio/video/opaque bytes — their codecs aren't in the JDK) fall back
  * to [[StubDecoder]]'s deterministic fake, keeping the boundary total.
  * The Spark-side plumbing is the part designed for 100 TB: binary
  * columns + metadata struct schema, a typed `Dataset` boundary, and
  * `mapPartitions` batch shape so a heavyweight decoder (JNI/ONNX/
  * ffmpeg) initializes once per task, not once per row.
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

  /** Real image decode on the public JDK (`javax.imageio`): PNG, JPEG,
    * GIF, BMP. Channel sums accumulate in exact long arithmetic over the
    * ARGB-normalized pixels, so decoded stats are deterministic and
    * engine-verifiable (PNG is lossless — a planted image round-trips to
    * exactly its planted sums). Returns None for bytes `ImageIO` can't
    * parse — the caller falls back to the stub. */
  object ImageIoDecoder extends Serializable {
    case class Decoded(width: Int, height: Int, channels: Int,
                       sum_r: Long, sum_g: Long, sum_b: Long) {
      def nPixels: Long = width.toLong * height
      def meanLuma: Double =
        if (nPixels == 0) 0.0
        else (sum_r + sum_g + sum_b).toDouble / (3.0 * nPixels)
    }
    def decode(payload: Array[Byte]): Option[Decoded] =
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff
              sg += (rgb >> 8) & 0xff
              sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          Some(Decoded(w, h, img.getColorModel.getNumComponents, sr, sg, sb))
        }
      } catch { case _: Exception => None }
  }

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
    * one decoder init per partition, rows streamed through in batch.
    * Payloads that parse as real images ([[ImageIoDecoder]]) report their
    * decoded dimensions + mean luma; everything else falls back to the
    * deterministic stub, so the operator is total over arbitrary bytes. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"), col("format"))
      .as[MediaRow]
      .mapPartitions { rows =>
        // decoder/session init would happen here, once per task
        rows.map { r =>
          ImageIoDecoder.decode(r.payload) match {
            case Some(d) =>
              MediaFeatures(r.doc_id, r.payload.length.toLong, d.width,
                d.height, d.meanLuma)
            case None =>
              val f = StubDecoder.decode(r.payload, r.format)
              MediaFeatures(r.doc_id, f.byte_len, f.width, f.height, f.feat_mean)
          }
        }
      }
  }

  // ---- Planted-image fixture: real PNGs with closed-form pixel sums ----

  /** One planted image row; `payload` is a real PNG encoding. */
  case class PlantedImage(img_id: Long, payload: Array[Byte])

  /** Decoded per-image stats, integer-exact (no float compare needed). */
  case class ImageStats(img_id: Long, width: Int, height: Int,
                        channels: Int, sum_r: Long, sum_g: Long, sum_b: Long)

  /** Planted dimensions: a pure function of img_id (8-20 × 6-16 px). */
  def imageSpec(id: Long): (Int, Int) =
    ((8 + (id % 4) * 4).toInt, (6 + (id % 3) * 5).toInt)

  /** Planted pixel pattern: constant red per image, position-dependent
    * green/blue — distinct per channel so a decoder that swaps or drops
    * channels cannot pass. */
  def plantedPixel(id: Long, x: Int, y: Int): (Int, Int, Int) =
    (((id * 37) % 256).toInt,
      ((x * 7 + y * 13 + id) % 256).toInt,
      ((x + 3 * y + 5 * id) % 256).toInt)

  /** Closed-form expected stats for [[plantedImages]] — what a correct
    * lossless encode → decode round trip must report. The oracle embeds
    * these as literals; the engine must MEASURE them from decoded pixels. */
  def expectedImageStats(id: Long): ImageStats = {
    val (w, h) = imageSpec(id)
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = plantedPixel(id, x, y)
      sr += r; sg += g; sb += b
    }
    ImageStats(id, w, h, 3, sr, sg, sb)
  }

  /** Generate `n` deterministic RGB PNGs (real `ImageIO` encode, on the
    * executors — the driver never holds a payload). */
  def plantedImages(spark: SparkSession, n: Int): Dataset[PlantedImage] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val (w, h) = imageSpec(id)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val (r, g, b) = plantedPixel(id, x, y)
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        PlantedImage(id, bos.toByteArray)
      }
    }
  }

  /** Decode planted (or any) images to integer-exact channel stats via
    * the real decoder; rows that fail to parse are dropped (the planted
    * fixture never does — a drop would surface as an oracle row-count
    * mismatch). Same per-partition batch shape as [[extractFeatures]]. */
  def extractImageStats(spark: SparkSession, imgs: Dataset[PlantedImage]): Dataset[ImageStats] = {
    import spark.implicits._
    imgs.mapPartitions { rows =>
      rows.flatMap { r =>
        ImageIoDecoder.decode(r.payload).map(d =>
          ImageStats(r.img_id, d.width, d.height, d.channels,
            d.sum_r, d.sum_g, d.sum_b))
      }
    }
  }
}
