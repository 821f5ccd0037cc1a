package graft.m8

import graft.SparkSpec
import graft.multimodal.Multimodal

/** Scale sanity for the image-dedup family beyond the 32-image gate
  * fixture: at 2000 base images + 200 planted near-dups, the pipeline
  * (real PNG encode → decode → dHash → pigeonhole join) must recover
  * EXACTLY the planted pairs — no organic Hamming-≤3 collisions among
  * the id-keyed pseudo-random bases, and no id-range aliasing (the bug
  * this spec caught: a 1000-offset dup id range collided with base ids
  * ≥ 1000, silently rendering them as near-dups of id−1000). */
class PhashScaleProbe extends SparkSpec {
  test("phash at 2000 images: exactly the 200 planted pairs") {
    val pairs = Multimodal.phashPairs(
      Multimodal.extractDHashes(spark,
        Multimodal.plantedDedupImages(spark, 2000, 200)), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.length === 200, s"got ${pairs.length} pairs")
    assert(pairs.toSet ===
      (0 until 200).map(k => (k.toLong, Multimodal.DedupDupOffset + k)).toSet)
  }
}
