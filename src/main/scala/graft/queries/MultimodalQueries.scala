package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal-column demos (north-star M8): binary payloads + typed
  * metadata, and partition-wise stub decode/feature extraction. The
  * payload is the document text's bytes (ASCII), so the oracle can
  * recompute byte lengths/checksums/fake-features in SQL. */
object MultimodalQueries extends QueryModule {

  /** Binary payload + metadata struct (flattened for the oracle). */
  private def mediaMeta(s: SparkSession, dir: String): DataFrame =
    Multimodal.withMediaColumns(Tables.documents(s, dir))
      .select(col("doc_id"),
        col("media_meta.byte_len").as("byte_len"),
        col("media_meta.checksum").as("checksum"),
        col("media_meta.format").as("format"))

  private val mediaMetaSql =
    """SELECT doc_id,
      |  CAST(length(text) AS INT) AS byte_len,
      |  md5(text) AS checksum,
      |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END
      |    AS format
      |FROM documents""".stripMargin

  /** mapPartitions feature extraction through the typed boundary; the
    * stub decode is deterministic so SQL reproduces it exactly. */
  private def mediaFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(s,
        Multimodal.withMediaColumns(Tables.documents(s, dir)))
      .toDF()
      .select(col("doc_id"), col("byte_len"), col("width"), col("height"),
        round(col("feat_mean"), 6).as("feat_mean"))

  // text is ASCII → payload bytes are code units; mean byte = mean ord.
  private val mediaFeaturesSql =
    """SELECT doc_id,
      |  length(text) AS byte_len,
      |  CAST(16 + length(text) % 32 AS INT) AS width,
      |  CAST(16 + length(text) % 16 AS INT) AS height,
      |  round(CASE WHEN length(text) = 0 THEN 0.0
      |    ELSE list_sum(list_transform(unicode_codes, x -> CAST(x AS DOUBLE)))
      |         / length(text) END, 6) AS feat_mean
      |FROM (SELECT doc_id, text,
      |        [unicode(c) for c in string_split(text, '')] AS unicode_codes
      |      FROM documents)""".stripMargin

  /** Frame sampling (video-shaped payloads): every 2nd 256-byte frame,
    * fanned out lazily per partition ([[Multimodal.sampleFrames]]). */
  private def mediaFrames(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(s,
        Multimodal.withMediaColumns(Tables.documents(s, dir)),
        frameBytes = 256, everyN = 2)
      .toDF()

  private val mediaFramesSql =
    """SELECT doc_id, frame_index,
      |  LEAST(256, blen - frame_index * 256) AS frame_len
      |FROM (
      |  SELECT doc_id, blen,
      |    unnest(generate_series(0, CAST(ceil(blen / 256.0) AS BIGINT) - 1))
      |      AS frame_index
      |  FROM (SELECT doc_id, length(text) AS blen FROM documents)
      |  WHERE blen > 0)
      |WHERE frame_index % 2 = 0""".stripMargin

  private val NImages = 12

  /** REAL image decode: plant [[NImages]] PNGs with closed-form pixel
    * patterns (encoded with `ImageIO` on the executors), decode them back
    * through [[Multimodal.ImageIoDecoder]], and report integer-exact
    * dimensions + per-channel sums. The oracle holds the closed-form
    * expected values as literals — the engine must MEASURE them from
    * decoded pixels, so any decode defect (wrong size, swapped or lossy
    * channels, dropped rows) hash-mismatches. */
  private def imageDecode(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractImageStats(s, Multimodal.plantedImages(s, NImages))
      .toDF()

  private val imageDecodeSql = {
    val rows = (0 until NImages).map { id =>
      val e = Multimodal.expectedImageStats(id.toLong)
      s"(${e.img_id}, ${e.width}, ${e.height}, ${e.channels}, " +
        s"${e.sum_r}, ${e.sum_g}, ${e.sum_b})"
    }.mkString(",\n  ")
    s"""SELECT CAST(img_id AS BIGINT) AS img_id,
       |  CAST(width AS INT) AS width, CAST(height AS INT) AS height,
       |  CAST(channels AS INT) AS channels,
       |  CAST(sum_r AS BIGINT) AS sum_r, CAST(sum_g AS BIGINT) AS sum_g,
       |  CAST(sum_b AS BIGINT) AS sum_b
       |FROM (VALUES
       |  $rows)
       |  AS t(img_id, width, height, channels, sum_r, sum_g, sum_b)""".stripMargin
  }

  private val NAudio = 16

  /** REAL audio decode: plant [[NAudio]] WAV clips (PCM16 mono, real
    * `javax.sound.sampled` encode on the executors), decode them back
    * through the same JDK codec, and report header metadata + integer-
    * exact waveform stats (sign crossings, total magnitude, peak). The
    * oracle holds the closed-form expected values as literals — the
    * engine must MEASURE them from decoded frames, so a header
    * mis-parse, endianness flip, or dropped samples hash-mismatch.
    * Completes the modality coverage: image decode is real
    * (`m8_image_decode`), audio decode is now real too; video stays the
    * documented stub (no JDK codec). */
  private def audioDecode(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractAudioStats(s, Multimodal.plantedAudio(s, NAudio))
      .toDF()

  private val audioDecodeSql = {
    val rows = (0 until NAudio).map { id =>
      val e = Multimodal.expectedAudioStats(id.toLong)
      s"(${e.audio_id}, ${e.sample_rate}, ${e.n_samples}, " +
        s"${e.zero_crossings}, ${e.sum_abs}, ${e.peak})"
    }.mkString(",\n  ")
    s"""SELECT CAST(audio_id AS BIGINT) AS audio_id,
       |  CAST(sample_rate AS INT) AS sample_rate,
       |  CAST(n_samples AS BIGINT) AS n_samples,
       |  CAST(zero_crossings AS BIGINT) AS zero_crossings,
       |  CAST(sum_abs AS BIGINT) AS sum_abs, CAST(peak AS INT) AS peak
       |FROM (VALUES
       |  $rows)
       |  AS t(audio_id, sample_rate, n_samples, zero_crossings, sum_abs, peak)""".stripMargin
  }

  private val NDedupBase = 10000
  private val NDedupDup = 1000

  /** Perceptual-hash image dedup over REAL PNGs: decode → integer-exact
    * 9×8 dHash measured from pixels → pigeonhole block join at
    * Hamming ≤ 3. The oracle holds the closed-form hashes as literals
    * and derives the pair set BRUTE-FORCE (every i<j pair, ~60M Hamming
    * evaluations — ~2 s in DuckDB), so a decode defect, a hash-
    * measurement defect, OR a candidate-generation miss (a pair the
    * block join should have surfaced but didn't) all hash-mismatch.
    * Planted at REAL scale (round-13 promotion of the spec-side probe):
    * 10 000 distinct images + 1 000 corner-watermarked near-dups of the
    * first 1 000 — the pigeonhole join runs over 44k (block, key) rows,
    * not 12 fixture rows, and must recover exactly the planted pairs
    * (id-keyed pseudo-random bases have no organic Hamming-≤3
    * collisions at this count — measured, not hoped; the 24-image
    * closed-form parity and boundary cases stay in MultimodalSpec). */
  private def imagePhashDedup(s: SparkSession, dir: String): DataFrame =
    Multimodal.phashPairs(
      Multimodal.extractDHashes(s,
        Multimodal.plantedDedupImages(s, NDedupBase, NDedupDup)),
      maxHamming = 3)

  private val imagePhashDedupSql = {
    val ids = (0 until NDedupBase).map(_.toLong) ++
      (0 until NDedupDup).map(k => Multimodal.DedupDupOffset + k)
    val rows = ids.map(id =>
      s"(CAST($id AS BIGINT), CAST(${Multimodal.expectedDHash(id)} AS BIGINT))")
      .mkString(",\n  ")
    s"""WITH h(img_id, dhash) AS (VALUES
       |  $rows)
       |SELECT a.img_id AS id_a, b.img_id AS id_b,
       |  CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
       |FROM h a JOIN h b ON a.img_id < b.img_id
       |WHERE bit_count(xor(a.dhash, b.dhash)) <= 3""".stripMargin
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m8_multimodal_meta"     -> mediaMeta _,
    "m8_multimodal_features" -> mediaFeatures _,
    "m8_multimodal_frames"   -> mediaFrames _,
    "m8_image_decode"        -> imageDecode _,
    "m8_audio_decode"        -> audioDecode _,
    "m8_image_phash_dedup"   -> imagePhashDedup _)

  def oracles: Map[String, String] = Map(
    "m8_multimodal_meta"     -> mediaMetaSql,
    "m8_multimodal_features" -> mediaFeaturesSql,
    "m8_multimodal_frames"   -> mediaFramesSql,
    "m8_image_decode"        -> imageDecodeSql,
    "m8_audio_decode"        -> audioDecodeSql,
    "m8_image_phash_dedup"   -> imagePhashDedupSql)
}
