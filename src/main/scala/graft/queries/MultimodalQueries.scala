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

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m8_multimodal_meta"     -> mediaMeta _,
    "m8_multimodal_features" -> mediaFeatures _,
    "m8_multimodal_frames"   -> mediaFrames _)

  def oracles: Map[String, String] = Map(
    "m8_multimodal_meta"     -> mediaMetaSql,
    "m8_multimodal_features" -> mediaFeaturesSql,
    "m8_multimodal_frames"   -> mediaFramesSql)
}
