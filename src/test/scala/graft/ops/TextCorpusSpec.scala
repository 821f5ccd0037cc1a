package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** [[TextCorpus]]: repetition signals, boilerplate fractions, and TF-IDF
  * ranking on hand-computable corpora. */
class TextCorpusSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionSignals flags a looping document and clears a clean one") {
    val docs = Seq(
      (1L, "spam ham spam ham spam ham spam ham spam ham"), // one dominant 2-gram
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron"),                          // all grams unique
      (3L, "hi")                                             // shorter than any gram
    ).toDF("doc_id", "text")
    val r = TextCorpus.repetitionSignals(docs, col("doc_id"), col("text"))
      .collect().map(x => x.getLong(0) -> x).toMap
    // doc 1: 9 bigrams, "spam ham" appears 5× → top2 = 5/9; trigrams
    // 8 total / 2 distinct → dup3 = 6/8
    assert(math.abs(r(1L).getDouble(1) - 5.0 / 9.0) < 1e-12)
    assert(math.abs(r(1L).getDouble(2) - 6.0 / 8.0) < 1e-12)
    assert(r(1L).getBoolean(3))
    // doc 2: every gram unique → top2 = 1/14 (below threshold), dup3 = 0
    assert(math.abs(r(2L).getDouble(1) - 1.0 / 14.0) < 1e-12)
    assert(r(2L).getDouble(2) == 0.0)
    assert(!r(2L).getBoolean(3))
    // doc 3: no grams at all → zero scores, still present
    assert(r(3L).getDouble(1) == 0.0 && r(3L).getDouble(2) == 0.0)
    assert(!r(3L).getBoolean(3))
  }

  test("boilerplateFraction marks shingles shared by >= minDocs documents") {
    val boiler = "click here to subscribe"
    val docs = Seq(
      (1L, s"$boiler unique one text body"),
      (2L, s"$boiler other words entirely here"),
      (3L, s"$boiler third variant of body"),
      (4L, "completely unrelated fresh content")
    ).toDF("doc_id", "text")
    val r = TextCorpus.boilerplateFraction(docs, col("doc_id"), col("text"),
        minDocs = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    // "click here to" and "here to subscribe" appear in docs 1-3
    assert(r(1L) > 0.0 && r(2L) > 0.0 && r(3L) > 0.0)
    assert(r(4L) == 0.0)
  }

  test("tfidfTopK ranks rare terms above ubiquitous ones") {
    val docs = Seq(
      (1L, "common common rare"),
      (2L, "common common common"),
      (3L, "common common other")
    ).toDF("doc_id", "text")
    val r = TextCorpus.tfidfTopK(docs, col("doc_id"), col("text"), k = 2)
      .where(col("doc_id") === 1L).orderBy("rank")
      .select("word", "tf", "df").as[(String, Long, Long)].collect()
    // 'rare' (df=1, idf=ln 3) outranks 'common' (df=3, idf=0) despite tf 1 vs 2
    assert(r.head == (("rare", 1L, 1L)))
    assert(r(1)._1 == "common")
  }

  test("substringDupFraction: cross-doc spans, self-repeats, unique docs") {
    // doc 1 and 2 share the 6-token span "p q r s t u" → with 4-token
    // windows each contributes 3 duplicated windows; doc 3 repeats its
    // own 4-token opening ("x y z w x y z w") → windows at offsets 0 and
    // 4 are identical (plus the bridging windows are unique); doc 4 is
    // unique; doc 5 is shorter than the window → one whole-doc window
    val docs = Seq(
      (1L, "p q r s t u a1 b1 c1"),
      (2L, "d2 e2 p q r s t u f2"),
      (3L, "x y z w x y z w"),
      (4L, "entirely fresh words nothing shared here at all"),
      (5L, "tiny doc")).toDF("doc_id", "text")
    val out = TextCorpus.substringDupFraction(docs, col("doc_id"),
        col("text"), windowWords = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1) == (6L, 3L, 0.5))      // 9 toks → 6 windows, 3 dup
    assert(out(2) == (6L, 3L, 0.5))
    assert(out(3)._1 == 5L && out(3)._2 == 2L) // offsets 0,4 collide
    assert(out(4) == (5L, 0L, 0.0))
    assert(out(5) == (1L, 0L, 0.0))      // whole-doc fallback window
  }

  test("chunkDocuments: overlap, remainder tail, reassembly, empty docs") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a b"),                                     // shorter than chunk
      (3L, ""), (4L, "   "))                           // no chunks
      .toDF("doc_id", "text")
    val out = graft.ops.TextCorpus.chunkDocuments(docs, col("doc_id"),
        col("text"), chunkTokens = 4, strideTokens = 3)
      .orderBy("doc_id", "chunk_index").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    val d1 = out.filter(_._1 == 1L)
    // starts 0,3,6,9: windows of 4, last is the 1-token remainder
    assert(d1.map(c => (c._2, c._3, c._4)).toSeq ==
      Seq((0, 0, 4), (1, 3, 4), (2, 6, 4), (3, 9, 1)))
    assert(d1(0)._5 == "w1 w2 w3 w4" && d1(1)._5 == "w4 w5 w6 w7" &&
      d1(3)._5 == "w10")
    // overlap: consecutive chunks share chunk-stride tokens
    assert(d1(0)._5.split(" ").last == d1(1)._5.split(" ").head)
    assert(out.filter(_._1 == 2L).toSeq.map(c => (c._2, c._4, c._5)) ==
      Seq((0, 2, "a b")))
    assert(!out.exists(c => c._1 == 3L || c._1 == 4L), "blank docs chunk to nothing")
  }

  test("chunkDocuments: exact reassembly for every (chunk, stride, len)") {
    // sweep all configs: drop the overlap (chunk - stride tokens) from
    // every chunk after the first and the concatenation must equal the
    // original token stream — no token lost, duplicated, or reordered
    val docs = (0 to 12).map(n => (n.toLong, (1 to n).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    for (chunk <- 1 to 5; stride <- 1 to chunk) {
      val out = graft.ops.TextCorpus.chunkDocuments(docs, col("doc_id"),
          col("text"), chunk, stride)
        .collect()
        .groupBy(_.getLong(0)).map { case (id, rows) =>
          id -> rows.sortBy(_.getInt(1)).zipWithIndex.flatMap { case (r, i) =>
            val toks = r.getString(4).split(" ").toSeq
            if (i == 0) toks else toks.drop(chunk - stride)
          }.toSeq
        }
      for (n <- 0 to 12) {
        val want = (1 to n).map(i => s"t$i")
        val got = out.getOrElse(n.toLong, Seq.empty)
        // trailing windows that START inside the previous chunk's span
        // repeat suffix tokens; dedupe by comparing against the prefix
        assert(got.take(want.length) == want &&
          got.drop(want.length).forall(want.contains),
          s"chunk=$chunk stride=$stride len=$n: $got vs $want")
      }
    }
  }

  /** Reference BPE in plain Scala: word counts → greedy merge loop. */
  private def refBpe(corpus: Seq[String], k: Int): Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = corpus
      .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, v) =>
        w.map(_.toString).toVector -> v.size.toLong
      }
    val out = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var done = false
    while (out.size < k && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
        .withDefaultValue(0L)
      for ((syms, c) <- vocab; p <- syms.zip(syms.tail)) counts(p) += c
      val best = counts.filter(_._2 >= 2)
      if (best.isEmpty) done = true
      else {
        val ((l, r), n) = best.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((l, r, n))
        vocab = vocab.groupBy { case (syms, _) =>
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              merged += (l + r); i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.result()
        }.map { case (s, m) => s -> m.values.sum }
      }
    }
    out.toSeq
  }

  test("trainBpe learns the reference merge sequence exactly") {
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = Seq(corpus.mkString(" ")).toDF("text")
    val got = graft.ops.TextCorpus.trainBpe(docs, col("text"), 6)
      .collect().map(x => (x.getInt(0), x.getString(1), x.getString(2),
        x.getString(3), x.getLong(4)))
    val want = refBpe(corpus, 6).zipWithIndex
      .map { case ((l, r, n), i) => (i, l, r, l + r, n) }
    assert(got.toSeq == want)
    // the classic result: 'es' ('e','s' appears in newest+widest = 9×)
    assert(got(0)._2 == "e" && got(0)._3 == "s" && got(0)._5 == 9L)
  }

  test("trainBpe: greedy fusion is non-overlapping (aaaa → aa aa)") {
    val docs = Seq("aaaa aaaa aaaa").toDF("text")
    val got = graft.ops.TextCorpus.trainBpe(docs, col("text"), 2)
      .collect().map(x => (x.getString(1), x.getString(2), x.getLong(4)))
    // round 1: (a,a) count = 3 words × 3 adjacent = 9; fused → [aa, aa]
    assert(got(0) == ("a", "a", 9L))
    // round 2: (aa,aa) count = 3 — NOT (a,a) again inside one round
    assert(got(1) == ("aa", "aa", 3L))
  }

  test("trainBpe stops early when no pair repeats") {
    val docs = Seq("ab cd ef").toDF("text")
    val got = graft.ops.TextCorpus.trainBpe(docs, col("text"), 10)
    assert(got.count() == 0) // every pair occurs once: nothing to merge
  }

  test("trainBpeLocal: identical rule tables to trainBpe (reference " +
       "corpus, real docs at depth, fusion/early-stop edges)") {
    def tbl(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(x => (x.getInt(0), x.getString(1), x.getString(2),
        x.getString(3), x.getLong(4))).toSeq
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = Seq(corpus.mkString(" ")).toDF("text")
    assert(tbl(TextCorpus.trainBpeLocal(docs, col("text"), 6)) ===
      tbl(TextCorpus.trainBpe(docs, col("text"), 6)))
    // the REAL gated corpus, well past the gate's 6 merges: the two
    // trainers are the same sequential-greedy algorithm, so the tables
    // must agree rule for rule (counts, tie-breaks, fusion included)
    val real = graft.Tables.documents(spark, sf).select("text")
    assert(tbl(TextCorpus.trainBpeLocal(real, col("text"), 16)) ===
      tbl(TextCorpus.trainBpe(real, col("text"), 16)))
    // greedy left-to-right non-overlap ("aaaa" → [aa, aa])
    val aa = Seq("aaaa aaaa aaaa").toDF("text")
    assert(tbl(TextCorpus.trainBpeLocal(aa, col("text"), 2))
      .map(t => (t._2, t._3, t._5)) === Seq(("a", "a", 9L), ("aa", "aa", 3L)))
    // early stop when nothing repeats
    assert(TextCorpus.trainBpeLocal(Seq("ab cd ef").toDF("text"),
      col("text"), 10).count() === 0)
  }

  test("Bm25Index: one build serves many query batches and configs " +
       "equal to bm25TopK; close() releases the cache deterministically") {
    val docs = Seq(
      (1L, "spark joins shuffle data across executors"),
      (2L, "spark caches hot frames in executor memory"),
      (3L, "ducks swim on calm water near the reeds"),
      (4L, "joins and aggregations shuffle data")).toDF("doc_id", "text")
    val q1 = Seq((10L, "spark joins")).toDF("query_id", "query_text")
    val q2 = Seq((11L, "ducks water")).toDF("query_id", "query_text")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // expected answers via bm25TopK, whose own persisted tf is exactly
    // the documented footgun — cleared before the handle is built so
    // the cache assertions below see only the index's entry
    def reference(q: org.apache.spark.sql.DataFrame, k1: Double,
                  b: Double) =
      rows(TextCorpus.bm25TopK(docs, col("doc_id"), col("text"), q, 3,
        k1 = k1, b = b))
    val (e1, e2, e3) =
      (reference(q1, 1.2, 0.75), reference(q2, 1.2, 0.75),
        reference(q1, 0.9, 0.4))
    spark.catalog.clearCache()
    // baseline-RELATIVE cache assertions: the shared test session also
    // carries other suites' localCheckpoint RDDs (which clearCache
    // never touches), so absolute emptiness is not observable in-suite
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    def extra() = spark.sparkContext.getPersistentRDDs.keySet -- baseline
    val idx = TextCorpus.bm25Index(docs, col("doc_id"), col("text"))
    assert(rows(idx.topK(q1, 3)) === e1)
    assert(extra().nonEmpty,
      "the index must hold its tf frame cached between serves")
    assert(rows(idx.topK(q2, 3)) === e2)
    assert(rows(idx.topK(q1, 3, k1 = 0.9, b = 0.4)) === e3)
    // a plan built BEFORE close still computes AFTER it (lineage stays)
    val late = idx.topK(q1, 3)
    idx.close()
    assert(extra().isEmpty,
      "close() must leave nothing of the index registered in the cache")
    assert(rows(late) === e1)
    idx.close() // idempotent
  }

  test("trainBpeLocal: maxVocab caps training to the most frequent " +
       "words, equal to the full trainer over the capped sub-vocabulary") {
    def tbl(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(x => (x.getInt(0), x.getString(1), x.getString(2),
        x.getString(3), x.getLong(4))).toSeq
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = Seq(corpus.mkString(" ")).toDF("text")
    // top-3 by (cnt desc, word): newest×6, low×5, widest×3 — lower drops
    val capped = Seq((Seq.fill(6)("newest") ++ Seq.fill(5)("low") ++
      Seq.fill(3)("widest")).mkString(" ")).toDF("text")
    assert(tbl(TextCorpus.trainBpeLocal(docs, col("text"), 6,
        maxVocab = 3)) ===
      tbl(TextCorpus.trainBpe(capped, col("text"), 6)))
  }

  test("trainBpeLocal: a 1k-merge training runs end to end (heap argmax), " +
       "max merge count is non-increasing, ranks are dense") {
    // a synthetic vocabulary rich enough for 1,000 genuine merges:
    // 3,000 seeded-random 10-char words (java.util.Random's LCG is
    // specified, so the corpus is deterministic), each twice so every
    // in-word pair clears the count-2 floor — the shape that would
    // take a full pair-table scan per round on the old argmax and
    // runs in seconds on the lazy-deletion heap
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val rnd = new java.util.Random(42L)
    val words = (0 until 3000).map { _ =>
      (0 until 10).map(_ => alpha(rnd.nextInt(26))).mkString
    }
    val docs = Seq((words ++ words).mkString(" ")).toDF("text")
    val rules = TextCorpus.trainBpeLocal(docs, col("text"), 1000)
      .collect().map(x => (x.getInt(0), x.getLong(4)))
    assert(rules.length === 1000, s"expected 1000 merges, got ${rules.length}")
    assert(rules.map(_._1).toSeq === (0 until 1000),
      "ranks must be dense and ordered")
    // the chosen max can never rise: new pairs created by a merge are
    // bounded by the merged pair's own count, and every other count
    // only decays — a heap bug (stale entry accepted) shows up here
    rules.map(_._2).sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"merge counts rose: $a -> $b")
    }
  }

  test("unigramSurprisal: hand-computed floor-log2 bits, empty doc zeroes") {
    // corpus tokens: a×5, b×1, c×1 -> N=7
    // bits(a)=floor(log2(7 div 5))=0, bits(b)=bits(c)=floor(log2(7))=2
    val docs = Seq((1L, "a a a a"), (2L, "a b"), (3L, "c"), (4L, " "))
      .toDF("doc_id", "text")
    val got = graft.ops.TextCorpus.unigramSurprisal(
        docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 4L, 0L, 0.0), (2L, 2L, 2L, 1.0),
      (3L, 1L, 2L, 2.0), (4L, 0L, 0L, 0.0)))
  }

  test("removeDuplicateWindows: canonical stays, later spans removed") {
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Seq(
      (1L, "p q r s"),      // canonical holder of [p q r]
      (2L, "z p q r"),      // window at 2 duplicates doc1's -> remove 2-4
      (3L, "m m m m m"),    // in-doc dups: keep window at 1, remove 2-5
      (4L, "u v"),          // shorter than a window: untouched
      (5L, "")              // empty: 0 tokens, md5("")
    ).toDF("doc_id", "text")
    val got = graft.ops.TextCorpus.removeDuplicateWindows(
        docs, col("doc_id"), col("text"), windowWords = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 4, 0, md5("p q r s")),
      (2L, 4, 3, md5("z")),
      (3L, 5, 4, md5("m")),
      (4L, 2, 0, md5("u v")),
      (5L, 0, 0, md5(""))))
  }

  test("removeDuplicateWindows: overlapping dup spans union, not double-count") {
    // doc2 repeats doc1's text twice with overlap at the seam: every
    // position of doc2 is covered by some duplicated window, so the
    // whole doc empties — and n_removed is exactly n_tokens, proving
    // span-union accounting
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b c d a b c d")).toDF("doc_id", "text")
    val got = graft.ops.TextCorpus.removeDuplicateWindows(
        docs, col("doc_id"), col("text"), windowWords = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, 4, 0), (2L, 8, 8)))
  }

  /** Reference BPE encoder: one greedy left-to-right non-overlapping
    * pass per rule, rules in rank order — the trainer's own fusion. */
  private def refEncode(word: String,
                        rules: Seq[(String, String, String)]): Seq[String] =
    rules.foldLeft(word.map(_.toString): Seq[String]) {
      case (syms, (l, r, m)) =>
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += m; i += 2
          } else { out += syms(i); i += 1 }
        }
        out.toSeq
    }

  test("bpeEncode: trained rules tokenize the classic corpus exactly") {
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = Seq((1L, corpus.mkString(" ")), (2L, "newest Widow7 low"),
      (3L, ""), (4L, "UPPER 123")).toDF("doc_id", "text")
    val rules = graft.ops.TextCorpus.trainBpe(
        docs.select(col("text")), col("text"), 6)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3))).toSeq
    val got = graft.ops.TextCorpus.bpeEncode(docs, col("doc_id"),
        col("text"), rules)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    def expect(ws: Seq[String]): (Int, Int, String) = {
      val toks = ws.flatMap(refEncode(_, rules))
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(toks.mkString(" ").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (ws.length, toks.length, md)
    }
    // doc 2: non-[a-z] words (Widow7) are excluded from words AND tokens
    val want = Seq(
      (1L, expect(corpus)),
      (2L, expect(Seq("newest", "low"))),
      (3L, expect(Seq())),
      (4L, expect(Seq())))
    assert(got.toSeq == want.map { case (id, (w, t, m)) => (id, w, t, m) })
    // compression happened: the classic corpus tokenizes below char count
    assert(got(0)._3 < corpus.map(_.length).sum)
  }

  test("bpeEncode: greedy pass per rule, rank order chains new adjacencies") {
    // rule0 (a,b)->ab then rule1 (ab,c)->abc: 'abc' collapses fully;
    // 'aaa' under (a,a) fuses non-overlapping -> [aa, a]
    val docs = Seq((1L, "abc aaa")).toDF("doc_id", "text")
    val rules = Seq(("a", "b", "ab"), ("ab", "c", "abc"), ("a", "a", "aa"))
    val got = graft.ops.TextCorpus.bpeEncode(docs, col("doc_id"),
        col("text"), rules).collect()(0)
    assert(got.getInt(1) == 2)
    assert(got.getInt(2) == 3) // [abc] ++ [aa, a]
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("abc aa a".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got.getString(3) == md)
  }

  test("heavyHitters: two-pass MG equals brute-force top-k, tiny capacity") {
    // skewed corpus: 'the' ×300, 'of' ×200, 'and' ×120 spread across many
    // docs, plus 500 unique noise tokens — capacity 8 forces constant
    // decrement-all overflow in pass 1, yet the recount must stay exact
    val docs = ((0 until 100).map(i => (i.toLong, "the the the of of and")) ++
      (100 until 120).map(i => (i.toLong, "and the of noise" + i)) ++
      (120 until 600).map(i => (i.toLong, s"uniq${i}a uniq${i}b uniq${i}c")))
      .toDF("doc_id", "text")
    val got = graft.ops.TextCorpus.heavyHitters(docs, col("text"), k = 3,
        capacity = 8)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val brute = docs
      .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
      .where(col("tok") =!= "")
      .groupBy("tok").count()
      .orderBy(col("count").desc, col("tok"))
      .limit(3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == brute, s"MG $got vs brute $brute")
    assert(got == Seq(("the", 320L), ("of", 220L), ("and", 120L)))
  }

  test("tfidf of a word present in every document is exactly zero") {
    val docs = Seq((1L, "x y"), (2L, "x z")).toDF("doc_id", "text")
    val r = TextCorpus.tfidfTopK(docs, col("doc_id"), col("text"), k = 3)
      .where(col("word") === "x").select("tfidf").as[Double].collect()
    assert(r.forall(_ == 0.0))
  }
}
