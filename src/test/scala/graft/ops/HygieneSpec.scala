package graft.ops

import graft.SparkSpec
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

/** Unit tests for the corpus-hygiene operators: PII redaction, line-level
  * dedup, benchmark decontamination, BPE pair counts, ANN recall. */
class HygieneSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii scrubs e-mails, phones, IPs in order and counts each") {
    val df = Seq(
      ("a@b.com writes to c.d@e.org", 2, 0, 0),
      ("call 555-123-4567 or 555-000-1111", 0, 2, 0),
      ("host 10.0.0.1 and 192.168.1.255", 0, 0, 2),
      ("mix x@y.io 555-222-3333 1.2.3.4", 1, 1, 1),
      ("clean text with no pii at all", 0, 0, 0)).toDF("t", "e", "p", "i")
    val r = Privacy.redactPii(df, col("t")).collect()
    r.foreach { row =>
      assert(row.getAs[Int]("n_emails") == row.getAs[Int]("e"))
      assert(row.getAs[Int]("n_phones") == row.getAs[Int]("p"))
      assert(row.getAs[Int]("n_ips") == row.getAs[Int]("i"))
    }
    val red = Privacy.redactPii(
      Seq("mix x@y.io 555-222-3333 1.2.3.4").toDF("t"), col("t"))
      .select("redacted").as[String].head()
    assert(red == "mix [EMAIL] [PHONE] [IP]")
  }

  test("redactPii never double-redacts an already-replaced span") {
    // an e-mail whose local part looks phone-ish: one e-mail, zero phones
    val r = Privacy.redactPii(Seq("555-123-4567@ex.com").toDF("t"), col("t"))
      .select("n_emails", "n_phones", "redacted").head()
    assert(r.getInt(0) == 1 && r.getInt(1) == 0 && r.getString(2) == "[EMAIL]")
  }

  test("lineDedup keeps the globally-first occurrence of each line") {
    // 2-word lines; doc 1 and doc 2 share the line "a b"
    val docs = Seq((1L, "a b c d"), (2L, "a b x y"), (3L, "a b")).toDF("id", "t")
    val r = TextCorpus.lineDedup(docs, col("id"), col("t"), lineWords = 2)
      .orderBy("doc_id").collect()
    // doc 1: lines [a b][c d] both kept; doc 2: [a b] removed, [x y] kept;
    // doc 3: [a b] removed entirely
    assert(r.map(x => (x.getLong(0), x.getInt(1), x.getLong(2))).toSeq ==
      Seq((1L, 2, 2L), (2L, 2, 1L), (3L, 1, 0L)))
    // doc 3's rebuilt text is empty -> md5("")
    assert(r(2).getString(3) == "d41d8cd98f00b204e9800998ecf8427e")
  }

  test("lineDedup is deterministic on duplicate lines within one doc") {
    val docs = Seq((7L, "p q p q p q")).toDF("id", "t")
    val r = TextCorpus.lineDedup(docs, col("id"), col("t"), lineWords = 2)
      .head()
    assert(r.getInt(1) == 3 && r.getLong(2) == 1L) // 3 lines, 1 survivor
  }

  test("decontaminate flags corpus docs sharing a shingle with the benchmark") {
    val corpus = Seq((1L, "the quick brown fox jumps"),
      (2L, "totally different words here now")).toDF("id", "t")
    val bench = Seq((9L, "quick brown fox story time")).toDF("id", "t")
    val r = TextCorpus.decontaminate(corpus, bench, col("id"), col("t"), w = 3)
      .orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 1L && r(0).getBoolean(2))  // "quick brown fox"
    assert(r(1).getLong(1) == 0L && !r(1).getBoolean(2))
  }

  test("bpePairCounts ranks adjacent pairs by count with a name tiebreak") {
    val docs = Seq("a b a b", "a b z", "x").toDF("t")
    val r = TextCorpus.bpePairCounts(docs, col("t"), k = 3).collect()
    // pairs: doc1 = [a b, b a, a b], doc2 = [a b, b z]; "x" yields none
    assert(r.map(x => (x.getString(0), x.getLong(1))).toSeq ==
      Seq(("a b", 3L), ("b a", 1L), ("b z", 1L)))
  }

  test("recallAtK measures approx-vs-exact overlap per query") {
    val exact = Seq((1L, 1, 10L), (1L, 2, 11L), (2L, 1, 20L), (2L, 2, 21L))
      .toDF("query_id", "rank", "cand_id")
    val approx = Seq((1L, 1, 10L), (1L, 2, 99L), (2L, 1, 20L), (2L, 2, 21L))
      .toDF("query_id", "rank", "cand_id")
    val r = Similarity.recallAtK(approx, exact).orderBy("query_id").collect()
    assert(r(0).getLong(3) == 1L && r(0).getDouble(4) == 0.5)
    assert(r(1).getLong(3) == 2L && r(1).getDouble(4) == 1.0)
  }
}
