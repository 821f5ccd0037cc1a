package graft.m8

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.Tables
import graft.similarity.Similarity

/** Product-quantization contract: deterministic codebooks, m-code
  * encoding, ADC shortlist quality, and the exact-rescore guarantee. */
class PqSpec extends SparkSpec {

  private val M = 4
  private val Dim = 64

  private def ids(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("pq codebooks: per-subspace centroids with dim/m components") {
    val emb = Tables.embeddings(spark, sf)
    val cb = Similarity.trainPqCodebooks(emb, M, ksub = 8, iters = 1, dim = Dim)
      .collect()
    val bySub = cb.groupBy(_.getAs[Int]("sub"))
    assert(bySub.keySet === (0 until M).toSet)
    bySub.values.foreach { rows =>
      assert(rows.length <= 8, "more centroids than ksub")
      rows.foreach { r =>
        assert(r.getSeq[Double](r.fieldIndex("cvec")).length === Dim / M)
      }
    }
  }

  test("pq encode: every vector gets m codes drawn from the codebooks") {
    val emb = Tables.embeddings(spark, sf)
    val cb = Similarity.trainPqCodebooks(emb, M, ksub = 8, iters = 1, dim = Dim)
    val valid = cb.collect().map(r =>
      r.getAs[Int]("sub") -> r.getAs[Long]("cent_id")).toSet
    val codes = Similarity.pqEncode(emb, cb, M, Dim).collect()
    assert(codes.length === emb.count())
    codes.foreach { r =>
      val cs = r.getSeq[Long](r.fieldIndex("codes"))
      assert(cs.length === M)
      cs.zipWithIndex.foreach { case (c, j) =>
        assert(valid.contains(j -> c), s"code $c not in subspace $j codebook")
      }
    }
  }

  test("pq topk: recall above the shortlist floor, deterministic rerun") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 8)
    val brute = ids(Similarity.bruteForceTopK(q, emb, 5))
    val pq = Similarity.pqTopK(q, emb, 5, m = 8, ksub = 32, iters = 2,
      rescoreK = 50, dim = Dim)
    val got = ids(pq)
    val recall = (brute & got).size.toDouble / brute.size
    // 32^8 ADC cells, 50-deep shortlist over a 500-vector near-random
    // corpus: random draw recalls ~10%; the gate config measures ~0.8
    assert(recall > 0.5, s"PQ recall $recall at or below random-shortlist floor")
    assert(ids(Similarity.pqTopK(q, emb, 5, m = 8, ksub = 32, iters = 2,
      rescoreK = 50, dim = Dim)) === got)
  }

  test("pq topk: rescoreK >= corpus makes the result exactly brute force") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") < 8)
    val brute = Similarity.bruteForceTopK(q, emb, 5)
      .select("query_id", "rank", "cand_id").collect().toSeq
    val pq = Similarity.pqTopK(q, emb, 5, m = M, ksub = 8, iters = 1,
      rescoreK = emb.count().toInt, dim = Dim)
      .select("query_id", "rank", "cand_id").collect().toSeq
    assert(pq.toSet === brute.toSet,
      "full-depth rescore must reduce to the exact ranking")
  }
}
