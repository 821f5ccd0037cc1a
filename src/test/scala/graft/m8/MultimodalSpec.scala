package graft.m8

import graft.SparkSpec
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.ImageIoDecoder
import org.apache.spark.sql.functions._

/** Real-decoder tests for the multimodal boundary: actual PNG/JPEG bytes
  * through `javax.imageio`, stub fallback for non-image payloads, and the
  * planted-fixture round trip the `m8_image_decode` oracle relies on. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def pngBytes(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("ImageIoDecoder: handcrafted 2x3 PNG decodes to exact channel sums") {
    // pixels: (r,g,b) = (10x+1, 20y+2, x+y) — tiny enough to sum by hand
    val bytes = pngBytes(2, 3)((x, y) => ((10 * x + 1) << 16) | ((20 * y + 2) << 8) | (x + y))
    val d = ImageIoDecoder.decode(bytes).get
    assert(d.width == 2 && d.height == 3 && d.channels == 3)
    assert(d.sum_r == (0 until 3).map(_ => 1 + 11).sum)        // per row: 1+11
    assert(d.sum_g == (0 until 3).map(y => 2 * (20 * y + 2)).sum)
    assert(d.sum_b == (for (y <- 0 until 3; x <- 0 until 2) yield x + y).sum)
    assert(math.abs(d.meanLuma -
      (d.sum_r + d.sum_g + d.sum_b).toDouble / 18.0) < 1e-12)
  }

  test("ImageIoDecoder: JPEG decodes with exact dimensions") {
    val img = new java.awt.image.BufferedImage(
      7, 5, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val d = ImageIoDecoder.decode(bos.toByteArray).get
    assert(d.width == 7 && d.height == 5)
  }

  test("ImageIoDecoder: non-image bytes return None, extractFeatures falls back to stub") {
    assert(ImageIoDecoder.decode("just some text".getBytes("UTF-8")).isEmpty)
    assert(ImageIoDecoder.decode(Array.empty[Byte]).isEmpty)
    val media = Seq((1L, "hello multimodal"))
      .toDF("doc_id", "text")
      .withColumn("payload", col("text").cast("binary"))
      .withColumn("format", lit("png"))
    val out = Multimodal.extractFeatures(spark, media).collect()
    val expect = Multimodal.StubDecoder.decode(
      "hello multimodal".getBytes("UTF-8"), "png")
    assert(out.length == 1)
    assert(out(0).width == expect.width && out(0).height == expect.height &&
      out(0).feat_mean == expect.feat_mean)
  }

  test("extractFeatures reports real dimensions for a real PNG payload") {
    val bytes = pngBytes(9, 4)((x, y) => (x << 16) | (y << 8) | 7)
    val media = Seq((5L, bytes, "png")).toDF("doc_id", "payload", "format")
    val out = Multimodal.extractFeatures(spark, media).collect()(0)
    assert(out.width == 9 && out.height == 4 && out.byte_len == bytes.length)
  }

  test("planted fixture: encode → decode round trip measures the closed-form stats") {
    val got = Multimodal.extractImageStats(
        spark, Multimodal.plantedImages(spark, 12))
      .collect().map(s => s.img_id -> s).toMap
    assert(got.size == 12)
    (0L until 12L).foreach { id =>
      assert(got(id) == Multimodal.expectedImageStats(id),
        s"img $id: ${got(id)} != ${Multimodal.expectedImageStats(id)}")
    }
  }

  test("audio: WAV round trip measures the closed form; garbage is dropped") {
    import spark.implicits._
    val got = Multimodal.extractAudioStats(
        spark, Multimodal.plantedAudio(spark, 8))
      .collect().map(s => s.audio_id -> s).toMap
    assert(got.size == 8)
    got.keys.foreach { id =>
      assert(got(id) == Multimodal.expectedAudioStats(id),
        s"clip $id: ${got(id)} != ${Multimodal.expectedAudioStats(id)}")
    }
    // non-WAV bytes must drop, not crash or fabricate
    val junk = Seq(Multimodal.PlantedAudio(99L, Array[Byte](1, 2, 3, 4))).toDS()
    assert(Multimodal.extractAudioStats(spark, junk).count() == 0)
  }

  test("dHash: measured-from-pixels equals the closed form for every fixture id") {
    val got = Multimodal.extractDHashes(
        spark, Multimodal.plantedDedupImages(spark, 12, 4))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 16)
    got.keys.foreach { id =>
      assert(got(id) == Multimodal.expectedDHash(id),
        s"img $id hash ${got(id)} != closed form ${Multimodal.expectedDHash(id)}")
    }
  }

  test("phash dedup: exactly the planted near-dup pairs, no cross-base hits") {
    val pairs = Multimodal.phashPairs(
        Multimodal.extractDHashes(
          spark, Multimodal.plantedDedupImages(spark, 24, 8)), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet ===
      (0 until 8).map(k => (k.toLong, Multimodal.DedupDupOffset + k)).toSet,
      s"unexpected pair set: ${pairs.toSeq}")
    // The 1-3 edited columns can land in up to 3 distinct 9-col grid
    // cells (width 12: boundaries 0,1,2,4), so the watermark's true
    // bound is 3 flipped bits — exactly the pigeonhole contract's max.
    assert(pairs.forall(_._3 <= 3), "watermark edit moved a pair beyond Hamming 3")
  }

  test("phash pigeonhole: Hamming exactly 3 is found, 4 is correctly outside") {
    import spark.implicits._
    // flip bits 0, 16, 32 (one per block, 3 total) and bit 48 for the 4th
    val h0 = 0x0123456789abcdefL
    val h3 = h0 ^ 1L ^ (1L << 16) ^ (1L << 32)
    val h4 = h3 ^ (1L << 48)
    val df = Seq((1L, h0), (2L, h3), (3L, h4)).toDF("img_id", "dhash")
    val got = Multimodal.phashPairs(df, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // (1,2) at Hamming 3 must be found even though 3 of 4 blocks differ;
    // (2,3) is Hamming 1; (1,3) is Hamming 4 — outside the contract
    assert(got === Set((1L, 2L, 3), (2L, 3L, 1)))
  }
}
