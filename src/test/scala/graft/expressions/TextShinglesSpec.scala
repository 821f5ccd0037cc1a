package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFns

/** Bit-parity of the fused text kernels (shingles / grams /
  * fingerprint) against the HOF formulations they replaced (kept as
  * `private[graft]` *Hof builders). The minhash-family and
  * drift/repetition oracle hashes ride on these identities, so the
  * corners matter: null text, empty text, whitespace-only (tabs /
  * newlines / runs), texts shorter than the window, exact-duplicate
  * grams (distinct keeps FIRST occurrence order), unicode, and the
  * fingerprint's ≤k-chars and empty fallbacks. */
class TextShinglesSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    val rnd = new scala.util.Random(11)
    val words = Vector("the", "a", "Muon", "flux", "Läufer", "井戸", "x1",
      "-", "...", "CAP", "cap")
    val rows = (0 until 400).map { i =>
      val t =
        if (i % 23 == 0) null
        else if (i % 19 == 0) ""
        else if (i % 17 == 0) " \t \n "
        else if (i % 13 == 0) "one two" // fewer than 3 tokens
        else if (i % 11 == 0) "dup dup dup dup dup dup" // repeated grams
        else (0 until (1 + rnd.nextInt(40)))
          .map(_ => words(rnd.nextInt(words.length)))
          .mkString(if (i % 7 == 0) "\t" else " ") +
          (if (i % 5 == 0) "  " else "")
      (i.toLong, t)
    }
    rows.toDF("id", "t")
  }

  private def assertSame(f: org.apache.spark.sql.Column,
                         h: org.apache.spark.sql.Column): Unit = {
    val bad = corpus.select(f.as("f"), h.as("h"))
      .where(!(col("f") <=> col("h")))
    assert(bad.count() === 0L,
      "fused text kernel diverged from the HOF formulation:\n" +
        bad.limit(3).collect().mkString("\n"))
  }

  test("word_shingles: fused == HOF (w=3 and w=5)") {
    assertSame(TextFns.word_shingles(col("t")),
      TextFns.wordShinglesHof(col("t")))
    assertSame(TextFns.word_shingles(col("t"), 5),
      TextFns.wordShinglesHof(col("t"), 5))
  }

  test("word_grams: fused == HOF (w=1 and w=2)") {
    assertSame(TextFns.word_grams(col("t"), 1),
      TextFns.wordGramsHof(col("t"), 1))
    assertSame(TextFns.word_grams(col("t"), 2),
      TextFns.wordGramsHof(col("t"), 2))
  }

  test("doc_fingerprint: fused == HOF (k=8 and k=2)") {
    assertSame(TextFns.doc_fingerprint(col("t")),
      TextFns.docFingerprintHof(col("t")))
    assertSame(TextFns.doc_fingerprint(col("t"), 2),
      TextFns.docFingerprintHof(col("t"), 2))
  }

  test("interpreted eval matches codegen (trigger both paths)") {
    // a projection containing BOTH trees rides whole-stage codegen; an
    // RDD-barrier collect forces the interpreted path on the same rows
    val df = corpus.select(TextFns.word_shingles(col("t")).as("s"),
      TextFns.word_grams(col("t"), 2).as("g"),
      TextFns.doc_fingerprint(col("t")).as("fp"))
    val compiled = df.collect()
    val interpreted = spark.createDataFrame(
        corpus.rdd.map(identity), corpus.schema)
      .select(TextFns.word_shingles(col("t")).as("s"),
        TextFns.word_grams(col("t"), 2).as("g"),
        TextFns.doc_fingerprint(col("t")).as("fp"))
      .collect()
    assert(compiled.map(_.toString).sorted.toSeq ===
      interpreted.map(_.toString).sorted.toSeq)
  }
}
