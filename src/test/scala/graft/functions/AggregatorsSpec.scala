package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AggregatorsSpec extends SparkSpec {
  import spark.implicits._

  test("NumericProfile: one-pass count/sum/min/max, exact cents") {
    val profile = udaf(new Aggregators.NumericProfile)
    val r = Seq(1.25, 2.50, -0.75).toDF("v")
      .agg(profile(col("v")).as("s"))
      .select(col("s.n"), col("s.sum").cast("decimal(18,2)").as("sum"),
        col("s.min"), col("s.max"))
      .collect()(0)
    assert(r.getLong(0) == 3)
    assert(r.getDecimal(1).compareTo(new java.math.BigDecimal("3.00")) == 0)
    assert(r.getDouble(2) == -0.75 && r.getDouble(3) == 2.50)
  }

  test("MinHashUnion merges signatures element-wise") {
    val union = udaf(new Aggregators.MinHashUnion(4))
    val df = Seq(
      ("g1", Seq(5L, 2L, 9L, 1L)),
      ("g1", Seq(3L, 7L, 4L, 8L)),
      ("g2", Seq(1L, 1L, 1L, 1L))).toDF("g", "sig")
    val out = df.groupBy("g").agg(union(col("sig")).as("merged"))
      .orderBy("g").collect()
    assert(out(0).getSeq[Long](1) == Seq(3L, 2L, 4L, 1L))
    assert(out(1).getSeq[Long](1) == Seq(1L, 1L, 1L, 1L))
  }

  test("MinHashUnion of a group's docs estimates the union's jaccard") {
    // signatures from the real minhash op; the union signature equals the
    // signature of the concatenated shingle set (monoid property)
    val docs = Seq((1L, "a b c d e f"), (2L, "d e f g h i")).toDF("id", "text")
    val sigs = graft.dedup.Dedup.minhashSignatures(docs, col("id"), col("text"), 16)
    val union = udaf(new Aggregators.MinHashUnion(16))
    val merged = sigs.agg(union(col("sig"))).collect()(0).getSeq[Long](0)
    val whole = graft.dedup.Dedup.minhashSignatures(
      Seq((3L, "a b c d e f d e f g h i")).toDF("id", "text"),
      col("id"), col("text"), 16).collect()(0).getSeq[Long](1)
    // both sign the union of the two shingle sets (same 3-gram windows
    // exist in the concatenation plus boundary grams; min can only drop)
    merged.zip(whole).foreach { case (m, w) => assert(w <= m) }
  }
}
