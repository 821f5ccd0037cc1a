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

  // ---- Real audio decode (WAV / PCM16) — the JDK's other codec ----

  /** One planted audio clip; `payload` is a real RIFF/WAV encoding
    * (PCM16 mono little-endian, written by `javax.sound.sampled`). */
  case class PlantedAudio(audio_id: Long, payload: Array[Byte])

  /** Decoded per-clip stats, integer-exact: container metadata the
    * decoder must parse from the WAV header (rate, samples) plus
    * waveform statistics measured from the decoded PCM (sign crossings,
    * total magnitude, peak) — a decoder that drops samples, flips
    * endianness, or mis-parses the header cannot pass. */
  case class AudioStats(audio_id: Long, sample_rate: Int, n_samples: Long,
                        zero_crossings: Long, sum_abs: Long, peak: Int)

  /** Planted clip spec: (sample rate, sample count) from the id. */
  def audioSpec(id: Long): (Int, Int) =
    (8000, (400 + (id % 5) * 160).toInt)

  /** Planted PCM sample k of clip id — mixed to pseudo-random in
    * [-8192, 8191], closed-form on both sides of the oracle. */
  def audioSample(id: Long, k: Int): Short =
    ((mix64(k.toLong * 2654435761L + id * 976369L + 11L) & 0x3FFF) - 8192).toShort

  /** Closed-form expected stats — what a correct WAV encode → decode
    * round trip must measure. Crossing rule: sign(s) = (s < 0), counted
    * at every k ≥ 1 where sign differs from sample k−1. */
  def expectedAudioStats(id: Long): AudioStats = {
    val (rate, n) = audioSpec(id)
    var crossings = 0L; var sumAbs = 0L; var peak = 0
    var prevNeg = false
    for (k <- 0 until n) {
      val s = audioSample(id, k).toInt
      val neg = s < 0
      if (k > 0 && neg != prevNeg) crossings += 1
      prevNeg = neg
      val a = math.abs(s)
      sumAbs += a
      if (a > peak) peak = a
    }
    AudioStats(id, rate, n.toLong, crossings, sumAbs, peak)
  }

  /** Generate `n` deterministic WAV clips (real `javax.sound.sampled`
    * encode on the executors — RIFF header + PCM16LE frames). */
  def plantedAudio(spark: SparkSession, n: Int): Dataset[PlantedAudio] = {
    import spark.implicits._
    spark.range(n.toLong).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val (rate, nSamples) = audioSpec(id)
        val pcm = new Array[Byte](nSamples * 2)
        var k = 0
        while (k < nSamples) {
          val s = audioSample(id, k)
          pcm(2 * k) = (s & 0xff).toByte
          pcm(2 * k + 1) = ((s >> 8) & 0xff).toByte
          k += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          rate.toFloat, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        PlantedAudio(id, bos.toByteArray)
      }
    }
  }

  /** Real WAV decode via `javax.sound.sampled`: parse the header for
    * format metadata, stream the PCM16LE frames, measure integer-exact
    * waveform stats. Same per-partition batch shape as the image path;
    * unparseable payloads are dropped (the planted fixture never is — a
    * drop surfaces as an oracle row-count mismatch). */
  def extractAudioStats(spark: SparkSession,
                        clips: Dataset[PlantedAudio]): Dataset[AudioStats] = {
    import spark.implicits._
    clips.mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          val fmt = ais.getFormat
          require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
            !fmt.isBigEndian, s"unexpected decoded format: $fmt")
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          var crossings = 0L; var sumAbs = 0L; var peak = 0
          var prevNeg = false
          var k = 0
          while (k < n) {
            val s = ((bytes(2 * k) & 0xff) | (bytes(2 * k + 1) << 8)).toShort.toInt
            val neg = s < 0
            if (k > 0 && neg != prevNeg) crossings += 1
            prevNeg = neg
            val a = math.abs(s)
            sumAbs += a
            if (a > peak) peak = a
            k += 1
          }
          Some(AudioStats(r.audio_id, fmt.getSampleRate.toInt, n.toLong,
            crossings, sumAbs, peak))
        } catch { case _: Exception => None }
      }
    }
  }

  // ---- Perceptual hash (dHash) — image-level near-dup dedup ----

  /** 64-bit difference hash, INTEGER-EXACT end to end: the image is
    * box-averaged onto a 9×8 luma grid (integer cell boundaries
    * `⌊i·W/9⌋`, luma kept as the ×1000 numerator `299r+587g+114b` so no
    * division happens), and bit (row, col) is set when cell (row, col)
    * outweighs cell (row, col+1) — compared CROSS-MULTIPLIED by the
    * cells' pixel areas, so unequal cell sizes never need a float mean.
    * Identical pixels → identical hash on any JVM; a near-duplicate
    * flips only the few bits whose cell comparison it disturbs.
    * Requires width ≥ 9 and height ≥ 8 (a thumbnail smaller than the
    * grid has no meaningful difference structure). */
  def dHash64(width: Int, height: Int,
              lumaNum: (Int, Int) => Long): Long = {
    require(width >= 9 && height >= 8, s"image ${width}x$height under 9x8 grid")
    val cols = 9; val rows = 8
    val sum = Array.ofDim[Long](rows, cols)
    val area = Array.ofDim[Long](rows, cols)
    var r = 0
    while (r < rows) {
      val y0 = r * height / rows; val y1 = (r + 1) * height / rows
      var c = 0
      while (c < cols) {
        val x0 = c * width / cols; val x1 = (c + 1) * width / cols
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += lumaNum(x, y); x += 1 }
          y += 1
        }
        sum(r)(c) = s
        area(r)(c) = (x1 - x0).toLong * (y1 - y0)
        c += 1
      }
      r += 1
    }
    var h = 0L
    var bit = 0
    r = 0
    while (r < rows) {
      var c = 0
      while (c < cols - 1) {
        // mean(r,c) > mean(r,c+1) without dividing
        if (sum(r)(c) * area(r)(c + 1) > sum(r)(c + 1) * area(r)(c))
          h |= 1L << bit
        bit += 1
        c += 1
      }
      r += 1
    }
    h
  }

  /** Near-duplicate ids live at `DedupDupOffset + k` — far above any
    * realistic base count, so base and dup id ranges can never collide
    * (a 1000-offset variant silently rendered base ids ≥ 1000 as dups
    * of id−1000 — caught by a 10k-image scale probe). */
  val DedupDupOffset: Long = 1000000000L

  /** Dedup-fixture image spec: ≥ the 9×8 hash grid by construction. */
  def dedupImageSpec(id: Long): (Int, Int) = {
    val base = if (id >= DedupDupOffset) id - DedupDupOffset else id
    ((12 + (base % 4) * 4).toInt, (8 + (base % 3) * 4).toInt)
  }

  /** 64-bit finalizer mix (splitmix-style): full avalanche, so every
    * base id gets a statistically independent pixel field — smooth
    * per-id gradients make every image's difference structure identical
    * and collapse all dHashes together (measured while building this
    * fixture); hashing the (x, y, id) triple gives min cross-image
    * Hamming ≈ 20 at 24 images. */
  private def mix64(v0: Long): Long = {
    var v = v0
    v = (v ^ (v >>> 33)) * 0xff51afd7ed558ccdL
    v = (v ^ (v >>> 33)) * 0xc4ceb9fe1a85ec53L
    v ^ (v >>> 33)
  }

  /** Dedup-fixture pixels: ids below [[DedupDupOffset]] are distinct
    * id-keyed pseudo-random images; id DedupDupOffset+k is a
    * NEAR-DUPLICATE of base k —
    * the blue channel inverted on 1-3 top-left pixels (`x ≤ k % 3`),
    * the corner-watermark edit class. The edited pixels span up to
    * three columns, which the 9-col grid can place in three different
    * cells (width 12 puts x=0,1,2 behind boundaries 0,1,2), so up to 3
    * dHash bits can flip — planted pairs land at Hamming ≤ 3 (inside
    * the maxHamming=3 pigeonhole contract, so always found) while
    * distinct bases stay ≥ 20 apart. */
  def dedupPixel(id: Long, x: Int, y: Int): (Int, Int, Int) = {
    val base = if (id >= DedupDupOffset) id - DedupDupOffset else id
    val r = ((base * 37) % 256).toInt
    val g = (mix64(x * 73856093L + y * 19349663L + base * 83492791L) & 0xFF).toInt
    val b0 = (mix64(x * 2654435761L + y * 40503L + base * 65537L + 7L) & 0xFF).toInt
    val b = if (id >= DedupDupOffset && y == 0 && x <= (base % 3)) 255 - b0 else b0
    (r, g, b)
  }

  /** Closed-form expected dHash for a dedup-fixture id — what the
    * encode → decode → measure pipeline must land on. */
  def expectedDHash(id: Long): Long = {
    val (w, h) = dedupImageSpec(id)
    dHash64(w, h, (x, y) => {
      val (r, g, b) = dedupPixel(id, x, y)
      299L * r + 587L * g + 114L * b
    })
  }

  /** Real-PNG dedup fixture: `nBase` distinct images plus a
    * near-duplicate of each of the first `nDup` (ids DedupDupOffset+k). */
  def plantedDedupImages(spark: SparkSession, nBase: Int,
                         nDup: Int): Dataset[PlantedImage] = {
    import spark.implicits._
    val ids = (0 until nBase).map(_.toLong) ++
      (0 until nDup).map(k => DedupDupOffset + k)
    spark.createDataset(ids).mapPartitions { it =>
      it.map { id =>
        val (w, h) = dedupImageSpec(id)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val (r, g, b) = dedupPixel(id, x, y)
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

  /** Near-duplicate image pairs among `(img_id, dhash)` rows at Hamming
    * distance ≤ `maxHamming` — the pigeonhole block join, never the n²
    * compare: the 64-bit hash splits into four 16-bit blocks, and two
    * hashes within Hamming 3 MUST agree on at least one block (3 flips
    * cannot touch all 4), so candidates come from an equi-join on
    * (block index, block value) and only candidates pay the exact
    * `bit_count(xor)`. At corpus scale the shuffle carries
    * (id, hash, 2-byte key) rows — the same bucketed shape as the
    * SimHash text family. */
  def phashPairs(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4-block pigeonhole covers Hamming <= 3, got $maxHamming")
    val blocks = hashes.select(col("img_id"), col("dhash"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("blk"),
          shiftright(col("dhash"), i * 16).bitwiseAND(lit(0xFFFFL))
            .as("key"))): _*)).as("b"))
      .select(col("img_id"), col("dhash"),
        col("b.blk").as("blk"), col("b.key").as("key"))
    val a = blocks.select(col("img_id").as("id_a"), col("dhash").as("ha"),
      col("blk"), col("key"))
    val b = blocks.select(col("img_id").as("id_b"), col("dhash").as("hb"),
      col("blk"), col("key"))
    a.join(b, Seq("blk", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Decode images and MEASURE their dHash from pixels — the engine
    * side of the perceptual-dedup gate (the oracle holds the closed
    * forms). Unparseable rows drop, surfacing as a row-count mismatch. */
  def extractDHashes(spark: SparkSession, imgs: Dataset[PlantedImage]): DataFrame = {
    import spark.implicits._
    imgs.mapPartitions { rows =>
      rows.flatMap { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.payload))
        Option(img).map { im =>
          val h = dHash64(im.getWidth, im.getHeight, (x, y) => {
            val p = im.getRGB(x, y)
            299L * ((p >> 16) & 0xFF) + 587L * ((p >> 8) & 0xFF) +
              114L * (p & 0xFF)
          })
          (r.img_id, h)
        }
      }
    }.toDF("img_id", "dhash")
  }
}
