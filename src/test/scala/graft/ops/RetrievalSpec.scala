package graft.ops

import graft.SparkSpec
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** [[TextCorpus.bm25TopK]] and [[Similarity.rrfFuse]]: hand-computed BM25
  * scores (the exact fixed-point arithmetic the oracle replays) and exact
  * reciprocal-rank-fusion values. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry durian cherry"),
    (4L, "   ")                     // token-free: absent from postings
  ).toDF("doc_id", "text")

  /** The operator's exact per-term contribution, replayed in test code:
    * fixed-point long of idf × tf-norm (k1=1.2, b=0.75). */
  private def contribFp(tf: Long, df: Long, dl: Long,
                        nDocs: Long, totalDl: Double): Long = {
    val idf = math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
    val avgdl = totalDl / nDocs
    math.round(idf * (tf * (1.2 + 1.0)) /
      (tf + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)) * 1000000.0)
  }

  test("bm25TopK: hand-computed fixed-point scores and ranking") {
    val queries = Seq((100L, "apple cherry")).toDF("query_id", "query_text")
    val r = TextCorpus.bm25TopK(docs, col("doc_id"), col("text"),
        queries, k = 10)
      .collect().map(x => (x.getLong(2), x.getInt(1), x.getDouble(3)))
    // postings: N=3 token-bearing docs, total_dl=9
    val s1 = contribFp(tf = 2, df = 1, dl = 3, 3, 9.0) // d1: apple
    val s2 = contribFp(tf = 1, df = 2, dl = 2, 3, 9.0) // d2: cherry
    val s3 = contribFp(tf = 3, df = 2, dl = 4, 3, 9.0) // d3: cherry
    val expected = Seq(1L -> s1, 2L -> s2, 3L -> s3)
      .sortBy { case (id, fp) => (-fp, id) }
      .zipWithIndex
      .map { case ((id, fp), i) => (id, i + 1, fp / 1000000.0) }
    assert(r.sortBy(_._2) === expected)
  }

  test("bm25TopK: duplicate query terms count once; k cuts the tail") {
    val q = Seq((7L, "cherry cherry cherry")).toDF("query_id", "query_text")
    val once = TextCorpus.bm25TopK(docs, col("doc_id"), col("text"),
      q, k = 1).collect()
    assert(once.length === 1)
    // top-1 is d3 (tf=3 beats d2's tf=1; same df) and its score equals
    // the single-occurrence formula — no tripling from the repeated term
    assert(once.head.getLong(2) === 3L)
    assert(once.head.getDouble(3) ===
      contribFp(tf = 3, df = 2, dl = 4, 3, 9.0) / 1000000.0)
  }

  test("bm25TopK: no shared term, no rows; empty docs never surface") {
    val q = Seq((9L, "zebra"), (10L, "")).toDF("query_id", "query_text")
    assert(TextCorpus.bm25TopK(docs, col("doc_id"), col("text"),
      q, k = 5).count() === 0L)
  }

  test("rrfFuse: exact floor-division fusion of two overlapping lists") {
    val sparse = Seq((1L, 10L, 1), (1L, 11L, 2))
      .toDF("query_id", "cand_id", "rank")
    val dense = Seq((1L, 11L, 1), (1L, 12L, 2))
      .toDF("query_id", "cand_id", "rank")
    val r = Similarity.rrfFuse(Seq(sparse, dense), k = 5)
      .collect().map(x => (x.getInt(1), x.getLong(2), x.getDouble(3)))
      .sortBy(_._1)
    val r61 = 1000000000L / 61   // rank 1: floor(1e9/61)
    val r62 = 1000000000L / 62   // rank 2
    assert(r === Seq(
      (1, 11L, (r61 + r62) / 1e9),  // in both lists → sum of terms
      (2, 10L, r61 / 1e9),
      (3, 12L, r62 / 1e9)))
  }

  test("rankEval: hand-computed hits, reciprocal rank, graded nDCG") {
    val truth = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
      .toDF("query_id", "cand_id", "rank")
    val run = Seq((1L, 11L, 1), (1L, 10L, 2), (1L, 99L, 3))
      .toDF("query_id", "cand_id", "rank")
    val w = Similarity.ndcgWeights(3)
    val r = Similarity.rankEval(run, truth, k = 3).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getLong(1) === 2L)          // 11 and 10 hit; 12 missed
    assert(row.getDouble(2) === 0.5)       // truth #1 found at run rank 2
    // dcg: rel(11)=2 at rank 1, rel(10)=3 at rank 2; ideal: 3,2,1 in order
    val dcg = 2L * w(0) + 3L * w(1)
    val ideal = 3L * w(0) + 2L * w(1) + 1L * w(2)
    assert(row.getDouble(3) === dcg.toDouble / ideal.toDouble)
  }

  test("rankEval: perfect run scores 1.0; disjoint run scores 0") {
    val truth = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1))
      .toDF("query_id", "cand_id", "rank")
    val perfectAndMiss = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 77L, 1))
      .toDF("query_id", "cand_id", "rank")
    val m = Similarity.rankEval(perfectAndMiss, truth, k = 2).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getDouble(2), x.getDouble(3)))).toMap
    assert(m(1L) === ((2L, 1.0, 1.0)))
    assert(m(2L) === ((0L, 0.0, 0.0)))
  }

  test("phraseSearch: contiguity, occurrence counts, repeated-word phrases") {
    val d = Seq(
      (1L, "a b c a b c a b"),   // "a b c" twice; "a b" three times
      (2L, "a c b"),             // all tokens, never contiguous "a b"
      (3L, "b a b a b"),         // "b a b" twice (overlapping)
      (4L, "")
    ).toDF("doc_id", "text")
    val q = Seq((10L, "a b c"), (11L, "b a b"), (12L, "a b"), (13L, "z q"))
      .toDF("query_id", "query_text")
    val r = TextCorpus.phraseSearch(d, col("doc_id"), col("text"), q, k = 5)
      .collect()
      .map(x => (x.getLong(0), x.getInt(1), x.getLong(2), x.getLong(3)))
      .toSet
    assert(r === Set(
      (10L, 1, 1L, 2L),          // "a b c" only in d1, twice
      (11L, 1, 3L, 2L),          // repeated-word phrase, overlapping hits
      (12L, 1, 1L, 3L),          // "a b" 3x in d1...
      (12L, 2, 3L, 2L)))         // ...and 2x in d3; d2 never contiguous
  }

  test("phraseSearch: k cut ranks by occurrences then doc id") {
    val d = Seq((1L, "x y"), (2L, "x y x y"), (3L, "x y"))
      .toDF("doc_id", "text")
    val q = Seq((1L, "x y")).toDF("query_id", "query_text")
    val top2 = TextCorpus.phraseSearch(d, col("doc_id"), col("text"), q, 2)
      .collect().map(x => (x.getInt(1), x.getLong(2))).sorted
    assert(top2 === Seq((1, 2L), (2, 1L)))
  }

  test("rrfFuse: k cut and per-query independence") {
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1))
      .toDF("query_id", "cand_id", "rank")
    val fused = Similarity.rrfFuse(Seq(a), k = 1).collect()
      .map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(fused === Map(1L -> 10L, 2L -> 20L))
  }
}
