package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFns

/** Text-analysis operator demos over `documents` (north-star M8 scope):
  * token counting, language ID, quality scoring, fingerprinting. Every
  * operator is a pure projection — no shuffle until the demo's final
  * grouping — so the shape holds unchanged at 100 TB. */
object TextQueries extends QueryModule {

  /** Token-length histogram of the corpus (the length-distribution
    * diagnostic behind min/max-length filters): fixed 50-token buckets,
    * capped at bucket 19, computed as an integer floor — one partial-agg
    * shuffle on ≤20 keys regardless of corpus size. */
  private def lengthHistogram(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(TextFns.token_count(col("text")).as("len"))
      .groupBy(least(floor(col("len") / 50), lit(19)).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min("len").as("min_len"), max("len").as("max_len"))

  private val lengthHistogramSql =
    """WITH lens AS (
      |  SELECT CAST(CASE WHEN trim(text) = '' THEN 0
      |    ELSE len(string_split_regex(trim(text), '\s+')) END AS INT) AS len
      |  FROM documents)
      |SELECT CAST(LEAST(len // 50, 19) AS INT) AS bucket,
      |  COUNT(*) AS n_docs,
      |  MIN(len) AS min_len, MAX(len) AS max_len
      |FROM lens GROUP BY 1""".stripMargin

  /** Token + subword counting per document. */
  private def tokenCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        TextFns.token_count(col("text")).as("n_tokens"),
        TextFns.subword_count(col("text")).as("n_subwords"))

  private val tokenCountSql =
    """SELECT doc_id,
      |  CAST(CASE WHEN trim(text) = '' THEN 0
      |       ELSE len(string_split_regex(trim(text), '\s+')) END AS INT) AS n_tokens,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_subwords
      |FROM documents""".stripMargin

  /** Corpus health REPORT — the one-row dashboard a dataset card leads
    * with, computed in a single aggregation pass: volume (docs, tokens,
    * chars), diversity (languages, sources), hygiene (exact-duplicate
    * and empty-doc counts), and the extreme (longest doc, ties to the
    * smallest id — argmax via a struct max, since the oracle's engine
    * lacks struct MAX_BY; it replays with an ORDER BY LIMIT 1
    * subquery). The mean is one double division of exact integers —
    * engine-identical IEEE. */
  private def corpusReport(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(
      col("doc_id"), col("lang"), col("source"),
      TextFns.token_count(col("text")).cast("long").as("n_tokens"),
      length(coalesce(col("text"), lit(""))).cast("long").as("n_chars"),
      md5(coalesce(col("text"), lit("")).cast("binary")).as("ck"))
    val longest = max(struct(col("n_tokens"), (-col("doc_id")).as("nid")))
    d.agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        sum("n_chars").as("total_chars"),
        countDistinct("lang").as("n_langs"),
        countDistinct("source").as("n_sources"),
        (count(lit(1)) - countDistinct("ck")).as("n_exact_dupes"),
        coalesce(sum(when(col("n_tokens") === 0, 1L)), lit(0L)).as("n_empty"),
        longest.getField("n_tokens").as("max_tokens"),
        (-longest.getField("nid")).as("longest_doc_id"))
      .withColumn("mean_tokens",
        round(col("total_tokens").cast("double") / col("n_docs"), 6))
  }

  private val corpusReportSql =
    """WITH d AS (
      |  SELECT doc_id, lang, source,
      |    CAST(CASE WHEN coalesce(trim(text), '') = '' THEN 0
      |         ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT)
      |      AS n_tokens,
      |    CAST(length(coalesce(text, '')) AS BIGINT) AS n_chars,
      |    md5(coalesce(text, '')) AS ck
      |  FROM documents)
      |SELECT COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  COUNT(DISTINCT lang) AS n_langs,
      |  COUNT(DISTINCT source) AS n_sources,
      |  COUNT(*) - COUNT(DISTINCT ck) AS n_exact_dupes,
      |  COUNT(CASE WHEN n_tokens = 0 THEN 1 END) AS n_empty,
      |  (SELECT n_tokens FROM d ORDER BY n_tokens DESC, doc_id LIMIT 1)
      |    AS max_tokens,
      |  (SELECT doc_id FROM d ORDER BY n_tokens DESC, doc_id LIMIT 1)
      |    AS longest_doc_id,
      |  round(CAST(SUM(n_tokens) AS BIGINT) / CAST(COUNT(*) AS DOUBLE), 6)
      |    AS mean_tokens
      |FROM d""".stripMargin

  /** Language-ID heuristic vs the labeled lang column (confusion counts). */
  private def languageId(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), TextFns.language_id(col("text")).as("predicted"))
      .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))

  private val languageIdSql = {
    def hits(words: Seq[String]) =
      s"len(regexp_extract_all(lower(text), '\\b(${words.mkString("|")})\\b'))"
    val en = hits(TextFns.EnStop); val es = hits(TextFns.EsStop)
    val de = hits(TextFns.DeStop); val fr = hits(TextFns.FrStop)
    s"""SELECT lang,
       |  CASE WHEN greatest($en,$es,$de,$fr) = 0 THEN 'und'
       |       WHEN $en = greatest($en,$es,$de,$fr) THEN 'en'
       |       WHEN $es = greatest($en,$es,$de,$fr) THEN 'es'
       |       WHEN $de = greatest($en,$es,$de,$fr) THEN 'de'
       |       ELSE 'fr' END AS predicted,
       |  COUNT(*) AS n
       |FROM documents GROUP BY 1, 2""".stripMargin
  }

  /** Quality-score distribution (indicator-sum score in {0,.25,…,1}). */
  private def qualityScore(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(TextFns.quality_score(col("text")).as("quality"))
      .groupBy("quality").agg(count(lit(1)).as("n"))

  /** The quality-score heuristic as one SQL expression (DuckDB twin of
    * `TextFns.quality_score`), shared by the histogram and filter demos. */
  private[queries] val qualityExprSql = {
    val nTok = "CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END"
    val nCh = "length(text)"
    val punct = "len(regexp_extract_all(text, '[[:punct:]]'))"
    val stop = s"len(regexp_extract_all(lower(text), '\\b(${TextFns.EnStop.mkString("|")})\\b'))"
    s"""CAST(CASE WHEN $nTok BETWEEN 5 AND 5000 THEN 0.25 ELSE 0.0 END +
       |   CASE WHEN $nTok > 0 AND CAST($nCh AS DOUBLE)/CAST($nTok AS DOUBLE)
       |        BETWEEN 3.0 AND 12.0 THEN 0.25 ELSE 0.0 END +
       |   CASE WHEN $nCh > 0 AND CAST($punct AS DOUBLE)/CAST($nCh AS DOUBLE) < 0.1
       |        THEN 0.25 ELSE 0.0 END +
       |   CASE WHEN $nTok > 0 AND CAST($stop AS DOUBLE)/CAST($nTok AS DOUBLE) > 0.01
       |        THEN 0.25 ELSE 0.0 END AS DOUBLE)""".stripMargin
  }

  private val qualityScoreSql =
    s"""SELECT
       |  $qualityExprSql AS quality,
       |  COUNT(*) AS n
       |FROM documents GROUP BY 1""".stripMargin

  /** Rolling-hash (winnowing-min) fingerprint per document — the
    * explode/partial-min shape: one codegen'd md5 per k-gram, the
    * per-doc minimum combined MAP-SIDE, so the shuffle carries one
    * 32-char value per doc regardless of document length. Semantics
    * identical to the scalar [[TextFns.doc_fingerprint]] (which stays
    * for per-row use); the scalar's interpreted HOF pass costs ~75×
    * more wall at corpus scale — round 13's noop-drain bench exposed
    * exactly that (11.8 s vs 0.16 s at sf0.1) the moment join/column
    * elimination stopped hiding it. */
  private def fingerprint(s: SparkSession, dir: String): DataFrame = {
    val norm = Tables.documents(s, dir).select(col("doc_id"),
      lower(regexp_replace(trim(coalesce(col("text"), lit(""))), "\\s+", " "))
        .as("t"))
    val minHash = norm
      .filter(length(col("t")) > 8)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("t")) - 7)).as("i"), col("t"))
      .select(col("doc_id"),
        md5(expr("substring(t, i, 8)").cast("binary")).as("h"))
      .groupBy("doc_id").agg(min("h").as("fp"))
    norm.join(minHash, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(length(col("t")) === 0, lit(""))
          .when(length(col("t")) <= 8, md5(col("t").cast("binary")))
          .otherwise(col("fp")).as("fingerprint"))
  }

  private val fingerprintSql =
    """WITH norm AS (
      |  SELECT doc_id, lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS t
      |  FROM documents)
      |SELECT doc_id,
      |  CASE WHEN length(t) = 0 THEN ''
      |       WHEN length(t) <= 8 THEN md5(t)
      |       ELSE list_min([md5(substr(t, i, 8))
      |                      for i in generate_series(1, length(t) - 7)])
      |  END AS fingerprint
      |FROM norm""".stripMargin

  /** Top-quartile quality gate: keep documents whose quality level sits
    * in the smallest top set of whole levels covering ≥25% of the corpus
    * — count-based threshold selection, no quantile interpolation
    * ([[graft.ops.Sampling.topFractionByScore]]). */
  private def qualityFilter(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.topFractionByScore(
        Tables.documents(s, dir)
          .select(col("doc_id"), TextFns.quality_score(col("text")).as("quality")),
        col("quality"), fraction = 0.25)
      .select("doc_id", "quality")

  private val qualityFilterSql =
    s"""WITH q AS (
       |  SELECT doc_id, $qualityExprSql AS quality FROM documents),
       |d AS (SELECT quality, COUNT(*) AS cnt FROM q GROUP BY 1),
       |c AS (
       |  SELECT quality, cnt,
       |    SUM(cnt) OVER (ORDER BY quality DESC) AS cum,
       |    SUM(cnt) OVER () AS total
       |  FROM d),
       |t AS (SELECT MIN(quality) AS thr FROM c
       |      WHERE CAST(cum - cnt AS DOUBLE) < 0.25 * CAST(total AS DOUBLE))
       |SELECT q.doc_id, q.quality FROM q, t WHERE q.quality >= t.thr""".stripMargin

  /** Gopher-style repetition signals per document
    * ([[graft.ops.TextCorpus.repetitionSignals]]). */
  private def repetition(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextCorpus.repetitionSignals(
      Tables.documents(s, dir), col("doc_id"), col("text"))

  private val repetitionSql =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS a
      |  FROM documents),
      |g2 AS (
      |  SELECT doc_id, gram, COUNT(*) AS cnt
      |  FROM t, unnest(CASE WHEN len(a) < 2 THEN []
      |                 ELSE [array_to_string(a[i:i+1], ' ')
      |                       for i in generate_series(1, len(a) - 1)] END) AS u(gram)
      |  GROUP BY 1, 2),
      |g3 AS (
      |  SELECT doc_id, gram, COUNT(*) AS cnt
      |  FROM t, unnest(CASE WHEN len(a) < 3 THEN []
      |                 ELSE [array_to_string(a[i:i+2], ' ')
      |                       for i in generate_series(1, len(a) - 2)] END) AS u(gram)
      |  GROUP BY 1, 2),
      |d2 AS (SELECT doc_id, MAX(cnt) AS max2, SUM(cnt) AS tot2 FROM g2 GROUP BY 1),
      |d3 AS (SELECT doc_id, SUM(cnt) AS tot3, COUNT(*) AS dist3 FROM g3 GROUP BY 1)
      |SELECT t.doc_id,
      |  COALESCE(CAST(max2 AS DOUBLE) / CAST(tot2 AS DOUBLE), 0.0) AS top2_frac,
      |  COALESCE(CAST(tot3 - dist3 AS DOUBLE) / CAST(tot3 AS DOUBLE), 0.0) AS dup3_frac,
      |  (COALESCE(CAST(max2 AS DOUBLE) / CAST(tot2 AS DOUBLE), 0.0) > 0.10 OR
      |   COALESCE(CAST(tot3 - dist3 AS DOUBLE) / CAST(tot3 AS DOUBLE), 0.0) > 0.20)
      |    AS repetitive
      |FROM t
      |LEFT JOIN d2 ON d2.doc_id = t.doc_id
      |LEFT JOIN d3 ON d3.doc_id = t.doc_id""".stripMargin

  /** Cross-document boilerplate fraction per document
    * ([[graft.ops.TextCorpus.boilerplateFraction]], df ≥ 5). */
  private def boilerplate(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextCorpus.boilerplateFraction(
      Tables.spread(Tables.documents(s, dir)), col("doc_id"), col("text"), minDocs = 5)

  private val boilerplateSql =
    s"""WITH ${Dsl.shinglesCte},
       |df AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1)
       |SELECT sh.doc_id,
       |  COUNT(*) AS n_shingles,
       |  COUNT(CASE WHEN df.df >= 5 THEN 1 END) AS n_boiler,
       |  CAST(COUNT(CASE WHEN df.df >= 5 THEN 1 END) AS DOUBLE) /
       |    CAST(COUNT(*) AS DOUBLE) AS boiler_frac
       |FROM sh JOIN df ON df.shingle = sh.shingle
       |GROUP BY 1""".stripMargin

  /** Top-3 TF-IDF keywords per document
    * ([[graft.ops.TextCorpus.tfidfTopK]]). */
  private def tfidfKeywords(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextCorpus.tfidfTopK(
      Tables.spread(Tables.documents(s, dir)), col("doc_id"), col("text"), k = 3)

  private val tfidfKeywordsSql =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS a
      |  FROM documents),
      |w AS (SELECT doc_id, u.word FROM t, unnest(a) AS u(word) WHERE u.word <> ''),
      |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY 1, 2),
      |df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
      |scored AS (
      |  SELECT tf.doc_id, tf.word, tf.tf, df.df,
      |    round(CAST(tf.tf AS DOUBLE) *
      |          ln(CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)), 6) AS tfidf
      |  FROM tf JOIN df ON df.word = tf.word CROSS JOIN n),
      |ranked AS (
      |  SELECT doc_id,
      |    CAST(row_number() OVER (PARTITION BY doc_id
      |                            ORDER BY tfidf DESC, word ASC) AS INT) AS rank,
      |    word, tf, df, tfidf
      |  FROM scored)
      |SELECT doc_id, rank, word, tf, df, tfidf FROM ranked WHERE rank <= 3""".stripMargin

  /** Unicode canonicalization for dedup keys: NFC (custom codegen
    * expression — Spark has no normalizer builtin) → lowercase →
    * whitespace collapse → trim, digested per doc. Both engines
    * implement UAX #15 NFC (`nfc_normalize` in DuckDB), so the digests
    * hash-compare; composed/decomposed unicode semantics are pinned in
    * ExpressionsSpec. */
  private def textNormalize(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        md5(trim(regexp_replace(
          lower(graft.expressions.NormalizeText.nfc_normalize(col("text"))),
          "\\s+", " ")).cast("binary")).as("norm_md5"))

  private val textNormalizeSql =
    """SELECT doc_id,
      |  md5(trim(regexp_replace(lower(nfc_normalize(text)),
      |      '\s+', ' ', 'g'))) AS norm_md5
      |FROM documents""".stripMargin

  /** Corpus-wide top-20 tokens via the two-pass Misra-Gries shape
    * ([[TextCorpus.heavyHitters]]): the per-partition sketch only
    * nominates candidates; the reported counts are an exact recount, so
    * the oracle's brute-force vocabulary scan must agree row for row. */
  private def heavyHitters(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextCorpus.heavyHitters(Tables.spread(Tables.documents(s, dir)),
      col("text"), k = 20)

  private val heavyHittersSql =
    """SELECT tok, cnt FROM (
      |  SELECT tok, COUNT(*) AS cnt FROM (
      |    SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
      |    FROM documents WHERE trim(text) <> '')
      |  WHERE tok <> '' GROUP BY 1)
      |ORDER BY cnt DESC, tok LIMIT 20""".stripMargin

  /** Overlapping 32-token chunks every 24 tokens (25% overlap) with
    * (doc_id, chunk_index, offset) provenance — the doc → training-sample
    * splitter, pure column arithmetic ([[TextCorpus.chunkDocuments]]). */
  private def chunkDocs(s: SparkSession, dir: String): DataFrame =
    graft.ops.TextCorpus.chunkDocuments(Tables.spread(Tables.documents(s, dir)),
      col("doc_id"), col("text"), chunkTokens = 32, strideTokens = 24)

  private val chunkDocsSql =
    """WITH d AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      |  FROM documents WHERE trim(text) <> ''),
      |s AS (
      |  SELECT doc_id, t, len(t) AS n,
      |    unnest(generate_series(0, len(t) - 1, 24)) AS off
      |  FROM d)
      |SELECT doc_id, CAST(off // 24 AS INT) AS chunk_index,
      |  CAST(off AS INT) AS offset,
      |  CAST(LEAST(32, n - off) AS INT) AS n_tokens,
      |  array_to_string(t[off + 1 : off + 32], ' ') AS chunk
      |FROM s""".stripMargin

  /** BM25 top-10 per query, queries derived deterministically from the
    * corpus itself (every 251st doc's first 4 tokens — the query set
    * grows with the corpus, so the gate exercises real fan-out at every
    * SF). Sparse ranked retrieval next to the dense ANN family
    * ([[graft.ops.TextCorpus.bm25TopK]]). */
  private def bm25Search(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, dir))
    val queries = Tables.documents(s, dir)
      .filter(col("doc_id") % 251 === 7)
      .select(col("doc_id").as("query_id"),
        array_join(slice(split(trim(coalesce(col("text"), lit(""))),
          "\\s+"), 1, 4), " ").as("query_text"))
    graft.ops.TextCorpus.bm25TopK(docs, col("doc_id"), col("text"),
      queries, k = 10)
  }

  /** The BM25 oracle CTE chain, shared with the RRF fusion oracle in
    * [[SimilarityQueries]] and the at-scale stratum gate in
    * [[graft.ScaleGate]]. `queryCte` must produce (query_id,
    * query_text); emits `bmranked` (query_id, doc_id, score_fp, rank).
    * Every arithmetic step mirrors [[graft.ops.TextCorpus.bm25TopK]]'s
    * association order exactly — per-term contributions are fixed-point
    * longs, so the sum is order-free on both engines.
    *
    * `statsCte` overrides the corpus stats body (n_docs, total_dl):
    * the default derives both from the corpus being replayed; the
    * stratum scale gate PINS them to the full image's values (the only
    * two BM25 inputs that cross the stratum boundary — the planted
    * token alphabet is disjoint, so tf/df/dl are stratum-local). */
  private[graft] val bm25DefaultStatsCte: String =
    "SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) AS total_dl\n" +
    "        FROM bdl"

  private[graft] val bm25DefaultDocTokens: String =
    """string_split_regex(trim(text), '\s+')"""
  private[graft] val bm25DefaultQueryTokens: String =
    """string_split_regex(trim(query_text), '\s+')"""

  /** `docsFrom` overrides the corpus source (the store-deletion gate
    * replays corpus-minus-deleted by filtering here — every downstream
    * stat, tf/df/dl/n_docs/avgdl, then derives from the survivors);
    * `docTokens`/`queryTokens`/`wordCond` override tokenization (the
    * analyzer gate's case-fold/punct-strip/stopword replay). */
  private[graft] def bm25OracleCtes(
      queryCte: String,
      statsCte: String = bm25DefaultStatsCte,
      docsFrom: String = "documents",
      docTokens: String = bm25DefaultDocTokens,
      queryTokens: String = bm25DefaultQueryTokens,
      wordCond: String = "u.word <> ''",
      k1: Double = 1.2,
      b: Double = 0.75): String =
    s"""bw AS (
       |  SELECT doc_id, u.word
       |  FROM (SELECT doc_id, $docTokens AS a
       |        FROM $docsFrom) t, unnest(a) AS u(word)
       |  WHERE $wordCond),
       |btf AS (SELECT doc_id, word, COUNT(*) AS tf FROM bw GROUP BY 1, 2),
       |bdl AS (SELECT doc_id, COUNT(*) AS dl FROM bw GROUP BY 1),
       |bdf AS (SELECT word, COUNT(*) AS df FROM btf GROUP BY 1),
       |bst AS ($statsCte),
       |bq AS ($queryCte),
       |bqt AS (
       |  SELECT DISTINCT query_id, u.word
       |  FROM (SELECT query_id, $queryTokens AS a
       |        FROM bq) t, unnest(a) AS u(word)
       |  WHERE $wordCond),
       |bcontrib AS (
       |  SELECT bqt.query_id, btf.doc_id,
       |    CAST(round(
       |      ln(1.0 + (bst.n_docs - bdf.df + 0.5) / (bdf.df + 0.5))
       |        * (btf.tf * ($k1 + 1.0))
       |        / (btf.tf + $k1 * ((1.0 - $b)
       |            + $b * bdl.dl / (bst.total_dl / bst.n_docs)))
       |        * 1000000.0) AS BIGINT) AS contrib_fp
       |  FROM btf
       |  JOIN bqt ON bqt.word = btf.word
       |  JOIN bdf ON bdf.word = btf.word
       |  JOIN bdl ON bdl.doc_id = btf.doc_id
       |  CROSS JOIN bst),
       |bscored AS (
       |  SELECT query_id, doc_id, CAST(SUM(contrib_fp) AS BIGINT) AS score_fp
       |  FROM bcontrib GROUP BY 1, 2),
       |bmranked AS (
       |  SELECT query_id, doc_id, score_fp,
       |    row_number() OVER (PARTITION BY query_id
       |                       ORDER BY score_fp DESC, doc_id) AS rank
       |  FROM bscored)""".stripMargin

  /** Full BM25 oracle SQL for a given query CTE (and optionally pinned
    * corpus stats — see [[bm25OracleCtes]]); shared with the at-scale
    * stratum gate. */
  private[graft] def bm25SqlFrom(
      queryCte: String,
      statsCte: String = bm25DefaultStatsCte,
      docsFrom: String = "documents",
      docTokens: String = bm25DefaultDocTokens,
      queryTokens: String = bm25DefaultQueryTokens,
      wordCond: String = "u.word <> ''"): String =
    s"""WITH ${bm25OracleCtes(queryCte, statsCte, docsFrom, docTokens,
           queryTokens, wordCond)}
       |SELECT query_id, CAST(rank AS INT) AS rank, doc_id,
       |  CAST(score_fp AS DOUBLE) / 1000000.0 AS score
       |FROM bmranked WHERE rank <= 10""".stripMargin

  /** The gated query-set recipe (every 251st doc's first 4 tokens) as a
    * CTE body — shared with `t14_postings_maintain`, whose served
    * ranking must equal this batch oracle exactly. */
  private[graft] val bm25SearchQueryCte: String =
    """SELECT doc_id AS query_id,
      |    array_to_string(list_slice(
      |      string_split_regex(trim(text), '\s+'), 1, 4), ' ') AS query_text
      |  FROM documents WHERE doc_id % 251 = 7""".stripMargin

  private val bm25SearchSql = bm25SqlFrom(bm25SearchQueryCte)

  /** Exact-phrase top-10 per query, phrases = tokens 2-4 of every 251st
    * doc (each query therefore matches at least its own source doc).
    * Pure-integer relational phrase match
    * ([[graft.ops.TextCorpus.phraseSearch]]). */
  private def phraseSearch(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, dir))
    val queries = Tables.documents(s, dir)
      .filter(col("doc_id") % 251 === 7)
      .select(col("doc_id").as("query_id"),
        array_join(slice(split(trim(coalesce(col("text"), lit(""))),
          "\\s+"), 2, 3), " ").as("query_text"))
    graft.ops.TextCorpus.phraseSearch(docs, col("doc_id"), col("text"),
      queries, k = 10)
  }

  /** Phrase oracle parameterized on the query-doc predicate — reused by
    * the at-scale stratum gate (phrase match is pure per-pair counting
    * with NO corpus-global stats, so the stratum replay needs no
    * pinning at all). */
  /** `docsFrom` overrides the corpus source; `docTokens`/`queryTokens`
    * override tokenization and `stopCond` the per-slot keep-condition
    * (the analyzed-store gate: stopworded SLOTS stay empty — positions
    * never contract across a removed stopword, exactly
    * [[graft.ops.TextCorpus.positional]]'s gap semantics). The query
    * recipe (tokens 2-4) always slices the RAW per-doc split — the
    * caller hands the engine the same raw surface form and analysis
    * happens at match time on both sides. */
  private[graft] def phraseSqlFrom(queryWhere: String,
                                   docsFrom: String = "documents",
                                   docTokens: String = bm25DefaultDocTokens,
                                   queryTokens: String =
                                     bm25DefaultQueryTokens,
                                   stopCond: String = "TRUE",
                                   queriesFrom: String = "documents"): String =
    s"""WITH parr AS (
      |  SELECT doc_id, $docTokens AS a
      |  FROM $docsFrom),
      |pw AS (
      |  SELECT doc_id, a, unnest(generate_series(1, len(a))) AS pos
      |  FROM parr),
      |ppos AS (SELECT doc_id, pos, a[pos] AS word FROM pw
      |         WHERE a[pos] <> '' AND ${stopCond.replace("%w", "a[pos]")}),
      |phq AS (
      |  SELECT doc_id AS query_id,
      |    array_to_string(list_slice(
      |      string_split_regex(trim(text), '\\s+'), 2, 4), ' ') AS query_text
      |  FROM $queriesFrom WHERE $queryWhere),
      |qarr AS (
      |  SELECT query_id, $queryTokens AS a
      |  FROM phq),
      |qw AS (
      |  SELECT query_id, a, unnest(generate_series(1, len(a))) AS off
      |  FROM qarr),
      |qoff AS (SELECT query_id, off, a[off] AS word FROM qw
      |         WHERE a[off] <> '' AND ${stopCond.replace("%w", "a[off]")}),
      |qlen AS (SELECT query_id, COUNT(*) AS phrase_len FROM qoff GROUP BY 1),
      |starts AS (
      |  SELECT qoff.query_id, ppos.doc_id, ppos.pos - qoff.off AS start
      |  FROM ppos JOIN qoff ON qoff.word = ppos.word),
      |occ AS (
      |  SELECT query_id, doc_id, start, COUNT(*) AS n_off
      |  FROM starts GROUP BY 1, 2, 3),
      |perdoc AS (
      |  SELECT occ.query_id, occ.doc_id, CAST(COUNT(*) AS BIGINT) AS n_occ
      |  FROM occ JOIN qlen ON qlen.query_id = occ.query_id
      |  WHERE occ.n_off = qlen.phrase_len
      |  GROUP BY 1, 2),
      |phranked AS (
      |  SELECT query_id, doc_id, n_occ,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY n_occ DESC, doc_id) AS rank
      |  FROM perdoc)
      |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, n_occ
      |FROM phranked WHERE rank <= 10""".stripMargin

  private val phraseSearchSql = phraseSqlFrom("doc_id % 251 = 7")

  /** Proximity (NEAR/k) top-10: the phrase queries (tokens 2-4 of every
    * 251st doc) matched with slop = 2 — each term may run up to 2
    * positions late relative to the window anchor, so near-misses of
    * the exact phrase (one or two interleaved tokens) now count.
    * All-integer vote counting with a distinct-offset quorum
    * ([[graft.ops.TextCorpus.proximitySearch]]). */
  private def proximitySearch(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, dir))
    val queries = Tables.documents(s, dir)
      .filter(col("doc_id") % 251 === 7)
      .select(col("doc_id").as("query_id"),
        array_join(slice(split(trim(coalesce(col("text"), lit(""))),
          "\\s+"), 2, 3), " ").as("query_text"))
    graft.ops.TextCorpus.proximitySearch(docs, col("doc_id"), col("text"),
      queries, k = 10, slop = 2)
  }

  /** The proximity oracle: the phrase oracle's positional CTEs with the
    * slop-window vote fan-out (each occurrence votes slop+1 anchors)
    * and the DISTINCT-offset quorum. Anchor arithmetic is base-free
    * (both sides' 1-off positional bases cancel in pos − off − lag).
    * `docsFrom`/`queriesFrom`/`docTokens`/`queryTokens`/`stopCond`/
    * `querySliceEnd` parameterize the analyzed-store replay exactly
    * like [[phraseSqlFrom]] — stopworded SLOTS stay empty on both
    * sides, so slop windows never contract across a removed
    * stopword. */
  private[graft] def proximitySqlFrom(queryWhere: String,
                                      slop: Int,
                                      docsFrom: String = "documents",
                                      queriesFrom: String = "documents",
                                      docTokens: String =
                                        bm25DefaultDocTokens,
                                      queryTokens: String =
                                        bm25DefaultQueryTokens,
                                      stopCond: String = "TRUE",
                                      querySliceEnd: Int = 4): String =
    s"""WITH parr AS (
      |  SELECT doc_id, $docTokens AS a
      |  FROM $docsFrom),
      |pw AS (
      |  SELECT doc_id, a, unnest(generate_series(1, len(a))) AS pos
      |  FROM parr),
      |ppos AS (SELECT doc_id, pos, a[pos] AS word FROM pw
      |         WHERE a[pos] <> '' AND ${stopCond.replace("%w", "a[pos]")}),
      |phq AS (
      |  SELECT doc_id AS query_id,
      |    array_to_string(list_slice(
      |      string_split_regex(trim(text), '\\s+'), 2, $querySliceEnd),
      |      ' ') AS query_text
      |  FROM $queriesFrom WHERE $queryWhere),
      |qarr AS (
      |  SELECT query_id, $queryTokens AS a
      |  FROM phq),
      |qw AS (
      |  SELECT query_id, a, unnest(generate_series(1, len(a))) AS off
      |  FROM qarr),
      |qoff AS (SELECT query_id, off, a[off] AS word FROM qw
      |         WHERE a[off] <> '' AND ${stopCond.replace("%w", "a[off]")}),
      |qlen AS (SELECT query_id, COUNT(*) AS phrase_len FROM qoff GROUP BY 1),
      |votes AS (
      |  SELECT qoff.query_id, ppos.doc_id, qoff.off,
      |    ppos.pos - qoff.off - g.lag AS start
      |  FROM ppos
      |  JOIN qoff ON qoff.word = ppos.word
      |  CROSS JOIN (SELECT unnest(generate_series(0, $slop)) AS lag) g),
      |occ AS (
      |  SELECT query_id, doc_id, start, COUNT(DISTINCT off) AS n_off
      |  FROM votes GROUP BY 1, 2, 3),
      |perdoc AS (
      |  SELECT occ.query_id, occ.doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows
      |  FROM occ JOIN qlen ON qlen.query_id = occ.query_id
      |  WHERE occ.n_off = qlen.phrase_len
      |  GROUP BY 1, 2),
      |pxranked AS (
      |  SELECT query_id, doc_id, n_windows,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY n_windows DESC, doc_id) AS rank
      |  FROM perdoc)
      |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, n_windows
      |FROM pxranked WHERE rank <= 10""".stripMargin

  private val proximitySearchSql = proximitySqlFrom("doc_id % 251 = 7", 2)

  /** Unordered NEAR/2 top-10: the same derived queries as proximity,
    * but terms may appear in ANY order within an (n_terms + 2)-wide
    * window ([[graft.ops.TextCorpus.nearSearch]] — the classic NEAR). */
  private def nearSearch(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, dir))
    val queries = Tables.documents(s, dir)
      .filter(col("doc_id") % 251 === 7)
      .select(col("doc_id").as("query_id"),
        array_join(slice(split(trim(coalesce(col("text"), lit(""))),
          "\\s+"), 2, 3), " ").as("query_text"))
    graft.ops.TextCorpus.nearSearch(docs, col("doc_id"), col("text"),
      queries, k = 10, slop = 2)
  }

  /** The unordered-NEAR oracle, parameterized like [[proximitySqlFrom]]
    * (the analyzed-store replay: stopworded doc SLOTS stay empty, the
    * query term SET drops stopwords entirely — the engine's
    * [[graft.ops.TextCorpus.nearMatchTopK]] semantics). */
  private[graft] def nearSqlFrom(queryWhere: String,
                                 slop: Int,
                                 docsFrom: String = "documents",
                                 queriesFrom: String = "documents",
                                 docTokens: String = bm25DefaultDocTokens,
                                 queryTokens: String =
                                   bm25DefaultQueryTokens,
                                 stopCond: String = "TRUE",
                                 querySliceEnd: Int = 4): String =
    s"""WITH parr AS (
      |  SELECT doc_id, $docTokens AS a
      |  FROM $docsFrom),
      |pw AS (
      |  SELECT doc_id, a, unnest(generate_series(1, len(a))) AS pos
      |  FROM parr),
      |ppos AS (SELECT doc_id, pos, a[pos] AS word FROM pw
      |         WHERE a[pos] <> '' AND ${stopCond.replace("%w", "a[pos]")}),
      |phq AS (
      |  SELECT doc_id AS query_id,
      |    array_to_string(list_slice(
      |      string_split_regex(trim(text), '\\s+'), 2, $querySliceEnd),
      |      ' ') AS query_text
      |  FROM $queriesFrom WHERE $queryWhere),
      |qt AS (
      |  SELECT DISTINCT query_id, u.word
      |  FROM (SELECT query_id, $queryTokens AS a
      |        FROM phq) t, unnest(a) AS u(word)
      |  WHERE u.word <> '' AND ${stopCond.replace("%w", "u.word")}),
      |qlen AS (SELECT query_id, COUNT(*) AS n_terms FROM qt GROUP BY 1),
      |votes0 AS (
      |  SELECT qt.query_id, ppos.doc_id, ppos.word, ppos.pos, qlen.n_terms
      |  FROM ppos
      |  JOIN qt ON qt.word = ppos.word
      |  JOIN qlen ON qlen.query_id = qt.query_id),
      |votes AS (
      |  SELECT query_id, doc_id, word,
      |    pos - unnest(generate_series(0, n_terms + $slop - 1)) AS start
      |  FROM votes0),
      |occ AS (
      |  SELECT query_id, doc_id, start, COUNT(DISTINCT word) AS n_hit
      |  FROM votes GROUP BY 1, 2, 3),
      |perdoc AS (
      |  SELECT occ.query_id, occ.doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows
      |  FROM occ JOIN qlen ON qlen.query_id = occ.query_id
      |  WHERE occ.n_hit = qlen.n_terms
      |  GROUP BY 1, 2),
      |nranked AS (
      |  SELECT query_id, doc_id, n_windows,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY n_windows DESC, doc_id) AS rank
      |  FROM perdoc)
      |SELECT query_id, CAST(rank AS INT) AS rank, doc_id, n_windows
      |FROM nranked WHERE rank <= 10""".stripMargin

  private[queries] val nearSearchSql = nearSqlFrom("doc_id % 251 = 7", 2)

  /** Deterministic case/punctuation/stopword INJECTION over the (clean,
    * lowercase) synthetic corpus — string ops both engines evaluate
    * identically — so the analyzer gate genuinely exercises folding,
    * stripping, and stopword removal rather than no-oping over
    * already-canonical text. */
  private[queries] val mutateSqlExpr =
    "replace(replace(text, 'table', 'Table,'), 'row', 'ROW.')"

  /** BM25 top-10 through the opt-in [[graft.ops.TextCorpus.Analyzer]]:
    * the corpus (and the query texts derived from it) carry injected
    * mixed case and punctuation; the analyzer lower-cases, strips
    * punctuation runs to breaks, and drops the stopwords {the, a} on
    * BOTH sides before scoring. The oracle replays mutation + analysis
    * + scoring in SQL. */
  private def bm25Analyzed(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.TextCorpus
    val mutated = Tables.spread(Tables.documents(s, dir))
      .select(col("doc_id"), expr(mutateSqlExpr).as("text"))
    val queries = Tables.documents(s, dir)
      .filter(col("doc_id") % 251 === 7)
      .select(col("doc_id").as("query_id"),
        array_join(slice(split(trim(expr(mutateSqlExpr)), "\\s+"), 1, 4),
          " ").as("query_text"))
    TextCorpus.bm25TopK(mutated, col("doc_id"), col("text"), queries,
      k = 10,
      analyzer = Some(TextCorpus.Analyzer(lowercase = true,
        stripPunct = true, stopwords = Seq("the", "a"))))
  }

  private[queries] val analyzedTokens =
    """string_split_regex(trim(regexp_replace(lower(%s), '[[:punct:]]+', ' ', 'g')), '\s+')"""

  private[queries] val bm25AnalyzedSql = bm25SqlFrom(
    queryCte =
      s"""SELECT doc_id AS query_id,
         |    array_to_string(list_slice(
         |      string_split_regex(trim($mutateSqlExpr), '\\s+'), 1, 4),
         |      ' ') AS query_text
         |  FROM documents WHERE doc_id % 251 = 7""".stripMargin,
    docsFrom = s"(SELECT doc_id, $mutateSqlExpr AS text FROM documents)",
    docTokens = analyzedTokens.format("text"),
    queryTokens = analyzedTokens.format("query_text"),
    wordCond = "u.word <> '' AND u.word NOT IN ('the', 'a')")

  /** M8: BM25 (k1, b) parameter SWEEP — the retrieval-tuning harness
    * (the `chooseBands`/`pairEval` precedent applied to scoring): ONE
    * index (tokenize + tf/dl/df, built once and persisted — a sweep
    * must never re-tokenize the corpus per config) scored under three
    * (k1, b) configurations, each run graded with
    * [[graft.similarity.Similarity.rankEval]] against the REFERENCE
    * configuration's ranking (k1 = 1.2, b = 0.75) as the graded truth —
    * the `m8_rank_eval` pattern (grade a variant against a reference
    * ranking). Term-overlap relevance was tried and is unusable here:
    * the synthetic corpus's tiny vocabulary makes overlap counts tie
    * for nearly every document, and the tie-broken truth never
    * intersects any BM25 top-5 (an all-zero scorecard grades nothing).
    * The reference config rides in the sweep as a self-calibration row
    * (it must score a perfect 1.0); the other configs' scores quantify
    * how far each (k1, b) moves the ranking — verified non-degenerate
    * at both SFs (the three configs produce genuinely different top-5
    * lists). Output is the
    * per-(config, query) scorecard (n_hits, reciprocal rank, nDCG@5
    * with the fixed-point discount table — no libm in the eval
    * arithmetic; the bm25 legs keep the family's documented idf
    * libm-parity argument). The oracle replays index, truth, all three
    * scoring configs, and the integer-weight DCG arithmetic. */
  private def bm25Sweep(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.TextCorpus
    import graft.similarity.Similarity
    val k = 5
    val docs = Tables.spread(Tables.documents(s, dir))
    val queries = Tables.documents(s, dir)
      .filter(col("doc_id") % 251 === 7)
      .select(col("doc_id").as("query_id"),
        array_join(slice(split(trim(coalesce(col("text"), lit(""))),
          "\\s+"), 1, 4), " ").as("query_text"))
    // one canonical tf frame for the whole sweep (the bm25TopK persist
    // contract: callers own the lifetime; Verify/Bench clear the cache
    // between queries)
    val words = TextCorpus.tokenize(docs, col("doc_id"), col("text"))
    val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val df = tf.select(col("word"), lit(1L).as("df"))
    // the graded truth: the reference configuration's own ranking.
    // localCheckpoint (the annSweep precedent): truth is k×queries rows
    // but its LINEAGE is a full scoring run, and every union branch's
    // rankEval references it several times — un-truncated, the sweep's
    // physical plan carried ~400 Exchange nodes (6 embedded copies of
    // the scoring subtree per branch) and Catalyst paid optimizer time
    // proportional to all of them. Checkpointing truth and each run
    // collapses the plan to the three scoring runs that actually
    // execute; the computed rows are untouched (same plan, same fold,
    // materialized eagerly once).
    val truth = TextCorpus.bm25ScoreTopK(tf, dl, df, queries, k, 1.2, 0.75)
      .select(col("query_id"), col("doc_id").as("cand_id"), col("rank"))
      .localCheckpoint(true)
    bm25SweepConfigs.map { case (k1, b) =>
      val run = TextCorpus.bm25ScoreTopK(tf, dl, df, queries, k, k1, b)
        .withColumnRenamed("doc_id", "cand_id")
        .localCheckpoint(true)
      Similarity.rankEval(run, truth, k)
        .select(lit(math.round(k1 * 100)).as("k1_pct"),
          lit(math.round(b * 100)).as("b_pct"),
          col("query_id"), col("n_hits"), col("rr"), col("ndcg"))
    }.reduce(_ unionByName _)
  }

  private val bm25SweepConfigs = Seq((1.2, 0.75), (0.9, 0.4), (1.8, 1.0))

  private val bm25SweepSql = {
    val K = 5
    def weightCase(rankCol: String): String =
      s"CASE $rankCol " + graft.similarity.Similarity.ndcgWeights(K)
        .zipWithIndex
        .map { case (w, i) => s"WHEN ${i + 1} THEN ${w}" }
        .mkString(" ") + " ELSE 0 END"
    def one(k1: Double, b: Double): String =
      s"""WITH ${bm25OracleCtes(bm25SearchQueryCte, k1 = k1, b = b)},
         |er AS (
         |  SELECT query_id, doc_id AS cand_id, CAST(rank AS BIGINT) AS t_rank
         |  FROM (${bm25SqlFrom(bm25SearchQueryCte)}) WHERE rank <= $K),
         |ar AS (SELECT query_id, doc_id AS cand_id,
         |         CAST(rank AS BIGINT) AS r_rank
         |       FROM bmranked WHERE rank <= $K),
         |eh AS (
         |  SELECT ar.query_id, COUNT(*) AS n_hits,
         |    SUM((${K + 1} - er.t_rank) * ${weightCase("ar.r_rank")}) AS dcg_fp
         |  FROM ar JOIN er ON er.query_id = ar.query_id
         |                 AND er.cand_id = ar.cand_id
         |  GROUP BY 1),
         |ei AS (
         |  SELECT query_id,
         |    SUM((${K + 1} - t_rank) * ${weightCase("t_rank")}) AS ideal_fp
         |  FROM er GROUP BY 1),
         |efirst AS (
         |  SELECT ar.query_id, 1000000000 // ar.r_rank AS rr_fp
         |  FROM ar JOIN er ON er.query_id = ar.query_id
         |                 AND er.cand_id = ar.cand_id
         |  WHERE er.t_rank = 1)
         |SELECT CAST(${math.round(k1 * 100)} AS BIGINT) AS k1_pct,
         |  CAST(${math.round(b * 100)} AS BIGINT) AS b_pct,
         |  ei.query_id,
         |  CAST(COALESCE(eh.n_hits, 0) AS BIGINT) AS n_hits,
         |  CAST(COALESCE(efirst.rr_fp, 0) AS DOUBLE) / 1000000000.0 AS rr,
         |  CAST(COALESCE(eh.dcg_fp, 0) AS DOUBLE)
         |    / CAST(ei.ideal_fp AS DOUBLE) AS ndcg
         |FROM ei LEFT JOIN eh USING (query_id)
         |        LEFT JOIN efirst USING (query_id)""".stripMargin
    bm25SweepConfigs
      .map { case (k1, b) => s"SELECT * FROM (\n${one(k1, b)}\n)" }
      .mkString("\nUNION ALL\n")
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m8_bm25_search"      -> bm25Search _,
    "m8_bm25_analyzed"    -> bm25Analyzed _,
    "m8_bm25_sweep"       -> bm25Sweep _,
    "m8_phrase_search"    -> phraseSearch _,
    "m8_proximity_search" -> proximitySearch _,
    "m8_near_search"      -> nearSearch _,
    "m8_chunk_documents"  -> chunkDocs _,
    "m8_heavy_hitters"    -> heavyHitters _,
    "m8_text_normalize"   -> textNormalize _,
    "m8_length_histogram" -> lengthHistogram _,
    "m8_token_count"      -> tokenCount _,
    "m8_corpus_report"    -> corpusReport _,
    "m8_language_id"      -> languageId _,
    "m8_quality_score"    -> qualityScore _,
    "m8_quality_filter"   -> qualityFilter _,
    "m8_fingerprint"      -> fingerprint _,
    "m8_repetition_score" -> repetition _,
    "m8_boilerplate_frac" -> boilerplate _,
    "m8_tfidf_keywords"   -> tfidfKeywords _)

  def oracles: Map[String, String] = Map(
    "m8_bm25_search"      -> bm25SearchSql,
    "m8_bm25_analyzed"    -> bm25AnalyzedSql,
    "m8_bm25_sweep"       -> bm25SweepSql,
    "m8_phrase_search"    -> phraseSearchSql,
    "m8_proximity_search" -> proximitySearchSql,
    "m8_near_search"      -> nearSearchSql,
    "m8_chunk_documents"  -> chunkDocsSql,
    "m8_heavy_hitters"    -> heavyHittersSql,
    "m8_text_normalize"   -> textNormalizeSql,
    "m8_length_histogram" -> lengthHistogramSql,
    "m8_token_count"      -> tokenCountSql,
    "m8_corpus_report"    -> corpusReportSql,
    "m8_language_id"      -> languageIdSql,
    "m8_quality_score"    -> qualityScoreSql,
    "m8_quality_filter"   -> qualityFilterSql,
    "m8_fingerprint"      -> fingerprintSql,
    "m8_repetition_score" -> repetitionSql,
    "m8_boilerplate_frac" -> boilerplateSql,
    "m8_tfidf_keywords"   -> tfidfKeywordsSql)
}
