package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.{Privacy, TextCorpus}
import graft.similarity.Similarity

/** Corpus-hygiene operator demos over `documents` (north-star M8 scope):
  * PII redaction, benchmark decontamination, C4-style line-level dedup,
  * and BPE pair counting. Every query carries a full DuckDB oracle —
  * redacted text and rebuilt documents are compared by md5, counts
  * exactly.
  *
  * The PII demo injects deterministic contact blocks (synthesized from
  * doc_id) because the synthetic corpus contains no organic PII; the
  * injection expression is replicated in the oracle, so the scrub itself
  * — patterns, order, counts — is what the gate verifies. */
object HygieneQueries extends QueryModule {

  /** Shared Spark/SQL fixture: text with per-class contact blocks.
    * Class k%3==0: untouched; k%3==1: e-mail + phone; k%3==2: IP + two
    * e-mails. */
  private def injected(s: SparkSession, dir: String): DataFrame = {
    val k = col("doc_id")
    Tables.documents(s, dir).select(col("doc_id"),
      when(k % 3 === 1, concat(col("text"),
          lit(" Reach user"), k % 50, lit("@mail.example or 555-"),
          (k % 900 + 100), lit("-"), (k % 9000 + 1000)))
        .when(k % 3 === 2, concat(col("text"),
          lit(" From ip 10."), k % 256, lit("."), k % 100, lit("."),
          k % 250, lit(" mail admin"), k % 20,
          lit("@corp.example cc backup"), k % 7, lit("@corp.example")))
        .otherwise(col("text")).as("text"))
  }

  private val injectedSql =
    """SELECT doc_id,
      |  CASE
      |    WHEN doc_id % 3 = 1 THEN text || ' Reach user' || (doc_id % 50) ||
      |      '@mail.example or 555-' || (doc_id % 900 + 100) || '-' ||
      |      (doc_id % 9000 + 1000)
      |    WHEN doc_id % 3 = 2 THEN text || ' From ip 10.' || (doc_id % 256) ||
      |      '.' || (doc_id % 100) || '.' || (doc_id % 250) ||
      |      ' mail admin' || (doc_id % 20) || '@corp.example cc backup' ||
      |      (doc_id % 7) || '@corp.example'
      |    ELSE text
      |  END AS text
      |FROM documents""".stripMargin

  /** PII scrub over the injected corpus: per-doc redaction counts and the
    * scrubbed text's digest. */
  private def piiRedact(s: SparkSession, dir: String): DataFrame =
    Privacy.redactPii(injected(s, dir), col("text"))
      .select(col("doc_id"), col("n_emails"), col("n_phones"), col("n_ips"),
        md5(col("redacted").cast("binary")).as("redacted_md5"))

  private val piiRedactSql = {
    // the Scala literals hold single backslashes at runtime; DuckDB's
    // '...' literals don't process escapes, so they embed verbatim
    val email = Privacy.EmailRe
    val phone = Privacy.PhoneRe
    val ip = Privacy.Ipv4Re
    s"""WITH inj AS ($injectedSql),
       |steps AS (
       |  SELECT doc_id, text AS t0,
       |    regexp_replace(text, '$email', '[EMAIL]', 'g') AS t1
       |  FROM inj),
       |steps2 AS (
       |  SELECT doc_id, t0, t1,
       |    regexp_replace(t1, '$phone', '[PHONE]', 'g') AS t2
       |  FROM steps)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(t0, '$email')) AS INT) AS n_emails,
       |  CAST(len(regexp_extract_all(t1, '$phone')) AS INT) AS n_phones,
       |  CAST(len(regexp_extract_all(t2, '$ip')) AS INT) AS n_ips,
       |  md5(regexp_replace(t2, '$ip', '[IP]', 'g')) AS redacted_md5
       |FROM steps2""".stripMargin
  }

  /** Benchmark decontamination: docs with doc_id % 97 == 0 act as the
    * held-out eval set; every other document reports its distinct 5-gram
    * overlap with that set. */
  private def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, dir))
    TextCorpus.decontaminate(
      docs.filter(col("doc_id") % 97 =!= 0),
      docs.filter(col("doc_id") % 97 === 0),
      col("doc_id"), col("text"), w = 5)
  }

  private val decontaminateSql =
    s"""WITH ${Dsl.shinglesCteW(5)},
       |bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
       |hits AS (
       |  SELECT s.doc_id, COUNT(*) AS n_hits
       |  FROM sh s JOIN bench b USING (shingle)
       |  WHERE s.doc_id % 97 <> 0 GROUP BY 1)
       |SELECT d.doc_id, COALESCE(h.n_hits, 0) AS n_hits,
       |  COALESCE(h.n_hits, 0) > 0 AS contaminated
       |FROM documents d LEFT JOIN hits h USING (doc_id)
       |WHERE d.doc_id % 97 <> 0""".stripMargin

  /** C4-style line dedup at 10-token lines: per-doc survivor counts and
    * the rebuilt text's digest. */
  private def lineDedup(s: SparkSession, dir: String): DataFrame =
    TextCorpus.lineDedup(Tables.spread(Tables.documents(s, dir)), col("doc_id"),
      col("text"), lineWords = 10)

  private val lineDedupSql =
    """WITH d AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |ln0 AS (
      |  SELECT doc_id, toks,
      |    unnest(generate_series(0,
      |      CAST(ceil(len(toks) / 10.0) AS BIGINT) - 1)) AS idx
      |  FROM d),
      |ln AS (
      |  SELECT doc_id, idx,
      |    array_to_string(toks[idx*10+1 : idx*10+10], ' ') AS line
      |  FROM ln0),
      |kept AS (
      |  SELECT doc_id, idx, line,
      |    ROW_NUMBER() OVER (PARTITION BY md5(line)
      |                       ORDER BY doc_id, idx) AS rn
      |  FROM ln),
      |perdoc AS (
      |  SELECT doc_id, COUNT(*) AS n_kept,
      |    md5(string_agg(line, chr(10) ORDER BY idx)) AS rebuilt_md5
      |  FROM kept WHERE rn = 1 GROUP BY 1)
      |SELECT d.doc_id,
      |  CAST(ceil(len(d.toks) / 10.0) AS INT) AS n_lines,
      |  COALESCE(p.n_kept, 0) AS n_kept,
      |  COALESCE(p.rebuilt_md5, md5('')) AS rebuilt_md5
      |FROM d LEFT JOIN perdoc p USING (doc_id)""".stripMargin

  /** Exact-substring duplication at 8-token overlapping windows
    * (Lee et al. relaxation): per-doc duplicated-window fraction. */
  private def substringDedup(s: SparkSession, dir: String): DataFrame =
    TextCorpus.substringDupFraction(Tables.spread(Tables.documents(s, dir)),
      col("doc_id"), col("text"), windowWords = 8)

  private val substringDedupSql =
    """WITH d AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |w0 AS (
      |  SELECT doc_id, toks,
      |    unnest(generate_series(1, GREATEST(len(toks) - 7, 1))) AS i
      |  FROM d),
      |wins AS (
      |  SELECT doc_id, array_to_string(toks[i : i + 7], ' ') AS w FROM w0),
      |c AS (SELECT w, COUNT(*) AS cnt FROM wins GROUP BY 1),
      |perdoc AS (
      |  SELECT doc_id, COUNT(*) AS n_windows,
      |    COUNT(CASE WHEN cnt >= 2 THEN 1 END) AS n_dup_windows
      |  FROM wins JOIN c USING (w) GROUP BY 1)
      |SELECT doc_id, n_windows, n_dup_windows,
      |  round(n_dup_windows / CAST(n_windows AS DOUBLE), 6) AS dup_fraction
      |FROM perdoc""".stripMargin

  /** The unigram-LM quality scorer over the corpus: per-doc integer
    * surprisal bits plus the derived 6dp mean. */
  private def lmSurprisal(s: SparkSession, dir: String): DataFrame =
    TextCorpus.unigramSurprisal(Tables.spread(Tables.documents(s, dir)),
      col("doc_id"), col("text"))

  private val lmSurprisalSql =
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
      |  FROM documents WHERE trim(text) <> ''),
      |v AS (SELECT tok, COUNT(*) AS cnt FROM t GROUP BY 1),
      |n AS (SELECT COUNT(*) AS total FROM t),
      |b AS (
      |  SELECT t.doc_id, length(bin(total // cnt)) - 1 AS bits
      |  FROM t JOIN v USING (tok) CROSS JOIN n),
      |p AS (
      |  SELECT doc_id, COUNT(*) AS n_tokens,
      |    CAST(SUM(bits) AS BIGINT) AS total_bits
      |  FROM b GROUP BY 1)
      |SELECT d.doc_id,
      |  COALESCE(p.n_tokens, 0) AS n_tokens,
      |  COALESCE(p.total_bits, 0) AS total_bits,
      |  CASE WHEN COALESCE(p.n_tokens, 0) = 0 THEN 0.0
      |       ELSE round(p.total_bits / CAST(p.n_tokens AS DOUBLE), 6)
      |  END AS mean_bits
      |FROM documents d LEFT JOIN p USING (doc_id)""".stripMargin

  /** The substring-dedup REWRITE at 8-token windows: per-doc removed
    * span accounting plus the rebuilt text's digest (the removal side of
    * [[substringDedup]]'s scorer). */
  private def substringRewrite(s: SparkSession, dir: String): DataFrame =
    TextCorpus.removeDuplicateWindows(Tables.spread(Tables.documents(s, dir)),
      col("doc_id"), col("text"), windowWords = 8)

  /** Oracle replay of [[substringRewrite]]: the canonical occurrence is
    * lexicographic min (doc_id, start); DuckDB can't MIN a struct, so
    * the oracle encodes it as `doc_id * 100000 + i` — identical ordering
    * while every doc stays under 100k tokens (the gate corpora are ~100s
    * of tokens; the ENGINE's struct-min is exact at any length). */
  private val substringRewriteSql =
    """WITH d AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks,
      |    CASE WHEN trim(text) = '' THEN 0
      |         ELSE len(string_split_regex(trim(text), '\s+')) END AS n
      |  FROM documents),
      |w0 AS (
      |  SELECT doc_id, toks, unnest(generate_series(1, n - 7)) AS i
      |  FROM d WHERE n >= 8),
      |wins AS (
      |  SELECT doc_id, i,
      |    md5(array_to_string(toks[i : i + 7], ' ')) AS wh
      |  FROM w0),
      |canon AS (
      |  SELECT wh, min(doc_id * 100000 + i) AS fk FROM wins GROUP BY 1),
      |nonc AS (
      |  SELECT w.doc_id, w.i
      |  FROM wins w JOIN canon c USING (wh)
      |  WHERE w.doc_id * 100000 + w.i <> c.fk),
      |rem AS (
      |  SELECT doc_id, list(DISTINCT p) AS rl
      |  FROM (SELECT doc_id, unnest(generate_series(i, i + 7)) AS p FROM nonc)
      |  GROUP BY 1),
      |f AS (
      |  SELECT d.doc_id, d.n, d.toks,
      |    list_filter(generate_series(1, d.n),
      |      p -> NOT list_contains(coalesce(r.rl, []), p)) AS kept
      |  FROM d LEFT JOIN rem r USING (doc_id))
      |SELECT doc_id, CAST(n AS INT) AS n_tokens,
      |  CAST(n - len(kept) AS INT) AS n_removed,
      |  -- array_to_string([]) is NULL in DuckDB where Spark's concat_ws
      |  -- gives '' — coalesce so fully-removed docs hash like empty ones
      |  md5(coalesce(
      |    array_to_string(list_transform(kept, p -> toks[p]), ' '), ''))
      |    AS rebuilt_md5
      |FROM f""".stripMargin

  /** Global top-20 adjacent-token pairs (one BPE merge-step scan). */
  private def bpePairs(s: SparkSession, dir: String): DataFrame =
    TextCorpus.bpePairCounts(Tables.spread(Tables.documents(s, dir)), col("text"), k = 20)

  private val bpePairsSql =
    """WITH d AS (
      |  SELECT string_split_regex(trim(text), '\s+') AS toks FROM documents),
      |p AS (
      |  SELECT unnest([toks[i] || ' ' || toks[i+1]
      |                 for i in generate_series(1, len(toks) - 1)]) AS pair
      |  FROM d),
      |c AS (SELECT pair, COUNT(*) AS cnt FROM p GROUP BY 1)
      |SELECT pair, cnt FROM c ORDER BY cnt DESC, pair LIMIT 20""".stripMargin

  /** The BPE TRAINER's rule table on the oracle gate: 6 merge rounds
    * over the [a-z]-word sub-corpus of `documents`. The merge loop is
    * SQL-inexpressible as a loop, but its OUTPUT for a fixed corpus and
    * numMerges is a deterministic 5-column frame — so the oracle unrolls
    * the 6 rounds as CTEs. Words are restricted to ASCII lowercase so
    * char-splitting is engine-identical (Spark splits UTF-16 units,
    * DuckDB codepoints — equal on ASCII). */
  private def bpeRules(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.spread(Tables.documents(s, dir))
      .select(concat_ws(" ",
        filter(split(trim(coalesce(col("text"), lit(""))), "\\s+"),
          w => w.rlike("^[a-z]+$"))).as("text"))
    TextCorpus.trainBpe(docs, col("text"), numMerges = 6)
  }

  /** Oracle replay of [[bpeRules]]: each word's symbol sequence is a
    * string with DOUBLE-space separators and single-space wrapping
    * (" n  e  w "), so `replace(s, ' l  r ', ' lr ')` IS greedy
    * left-to-right non-overlapping pair fusion — the match consumes one
    * boundary space on each side, leaving the shared separator space
    * for an immediately-adjacent next match, and token-boundary false
    * positives are impossible because every symbol is space-delimited.
    * An early-stopped round yields an empty rule CTE whose CROSS JOIN
    * empties every later vocabulary — the same truncation the trainer's
    * early stop produces. */
  private val BpeMerges = 6

  /** The shared CTE prolog both BPE oracles build on: the [a-z] word
    * frequencies (`wf`), the char-split vocabulary (`v0`), and one
    * (pair-count → argmax rule → fused vocabulary) block per round —
    * `rule0..rule{n-1}` hold the learned table. */
  private def bpeOracleProlog(numMerges: Int): String = {
    val rounds = (0 until numMerges).map { r =>
      s"""t$r AS (SELECT string_split(trim(s, ' '), '  ') AS toks, cnt FROM v$r),
         |p$r AS (
         |  SELECT pr.l AS lft, pr.r AS rgt, CAST(SUM(cnt) AS BIGINT) AS n
         |  FROM (SELECT unnest([{'l': toks[i], 'r': toks[i+1]}
         |                       for i in generate_series(1, len(toks) - 1)]) AS pr,
         |               cnt
         |        FROM t$r)
         |  GROUP BY 1, 2 HAVING SUM(cnt) >= 2),
         |rule$r AS (
         |  SELECT $r AS rank, lft, rgt, lft || rgt AS merged, n
         |  FROM p$r ORDER BY n DESC, lft, rgt LIMIT 1),
         |v${r + 1} AS (
         |  SELECT replace(s, ' ' || lft || '  ' || rgt || ' ',
         |                 ' ' || merged || ' ') AS s, cnt
         |  FROM v$r CROSS JOIN rule$r)""".stripMargin
    }.mkString(",\n")
    s"""wf AS (
       |  SELECT word FROM (
       |    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word
       |    FROM documents)
       |  WHERE regexp_matches(word, '^[a-z]+$$')),
       |v0 AS (
       |  SELECT ' ' || array_to_string(
       |      [word[i] for i in generate_series(1, len(word))], '  ') || ' ' AS s,
       |    cnt
       |  FROM (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM wf GROUP BY word)),
       |$rounds""".stripMargin
  }

  private val bpeRulesSql = {
    val union = (0 until BpeMerges)
      .map(r => s"SELECT * FROM rule$r").mkString("\n  UNION ALL ")
    s"""WITH ${bpeOracleProlog(BpeMerges)}
       |SELECT CAST(rank AS INT) AS rank, lft AS "left", rgt AS "right",
       |  merged, n AS cnt
       |FROM ($union)""".stripMargin
  }

  /** The ENCODER on the gate: train the same 6 rules, then tokenize
    * every document. The rule table rides the driver (tokenizer-artifact
    * scale) into a codegen'd replace chain; the encode is a shuffle-free
    * scan — see [[TextCorpus.bpeEncode]]. */
  private def bpeEncode(s: SparkSession, dir: String): DataFrame = {
    val sub = Tables.spread(Tables.documents(s, dir))
      .select(concat_ws(" ",
        filter(split(trim(coalesce(col("text"), lit(""))), "\\s+"),
          w => w.rlike("^[a-z]+$"))).as("text"))
    val rules = TextCorpus.trainBpe(sub, col("text"), numMerges = BpeMerges)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3))).toSeq
    TextCorpus.bpeEncode(Tables.spread(Tables.documents(s, dir)),
      col("doc_id"), col("text"), rules)
  }

  /** Oracle replay of [[bpeEncode]]: the learned `rule0..rule5` rows are
    * cross-joined flat (each is exactly one row on this corpus — the
    * trainer never early-stops here, the same precondition
    * [[bpeRulesSql]] already relies on) and applied innermost-first in
    * rank order inside a per-word lambda; the double-space replace
    * trick makes each application identical to the engine's. */
  private val bpeEncodeSql = {
    val ruleCols = (0 until BpeMerges).map(r =>
      s"r$r.lft AS l$r, r$r.rgt AS g$r, r$r.merged AS m$r").mkString(", ")
    val ruleFrom = (0 until BpeMerges).map(r => s"rule$r r$r").mkString(", ")
    val spread = "' ' || trim(regexp_replace(w, '(.)', '\\1  ', 'g'), ' ') || ' '"
    val chain = (0 until BpeMerges).foldLeft(spread) { (s, r) =>
      s"replace($s,\n          ' ' || l$r || '  ' || g$r || ' ', ' ' || m$r || ' ')"
    }
    s"""WITH ${bpeOracleProlog(BpeMerges)},
       |r AS (SELECT $ruleCols FROM $ruleFrom),
       |words AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(trim(text), '\\s+'),
       |                w -> regexp_matches(w, '^[a-z]+$$')) AS ws
       |  FROM documents),
       |enc AS (
       |  SELECT doc_id, ws,
       |    flatten(list_transform(ws, w ->
       |      string_split(trim(
       |        $chain, ' '), '  '))) AS toks
       |  FROM words CROSS JOIN r)
       |SELECT doc_id, CAST(len(ws) AS INT) AS n_words,
       |  CAST(len(toks) AS INT) AS n_tokens,
       |  -- coalesce: array_to_string([]) is NULL in DuckDB, '' in Spark's
       |  -- concat_ws — keeps no-[a-z]-word docs engine-identical
       |  md5(coalesce(array_to_string(toks, ' '), '')) AS tokens_md5
       |FROM enc""".stripMargin
  }

  /** Embedding-space decontamination: vectors `vec_id % 97 == 0` act as
    * the held-out benchmark (the same held-out convention as the n-gram
    * [[decontaminate]]); every other vector reports its rounded max
    * cosine against that set and a `>= 0.3` contamination flag. The
    * engine side is a broadcast-benchmark map — no corpus shuffle.
    *
    * Scale note: the `% 97` convention makes the GATED benchmark grow
    * with the corpus (an oracle convenience, like the embedding gate's
    * pinned planes). A production benchmark is a FIXED eval set, and
    * for fixed `|bench|` the screen is strictly linear in the corpus —
    * one broadcast, one scan, no shuffle. */
  private def semanticDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.spread(Tables.embeddings(s, dir))
    Similarity.screenAgainst(
      emb.filter(col("vec_id") % 97 =!= 0),
      emb.filter(col("vec_id") % 97 === 0), tau = 0.3)
  }

  private val semanticDecontaminateSql =
    """WITH e AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings),
      |b AS (SELECT v AS bv FROM e WHERE vec_id % 97 = 0),
      |c AS (SELECT vec_id, v FROM e WHERE vec_id % 97 <> 0),
      |s AS (
      |  SELECT c.vec_id,
      |    round(max(list_inner_product(c.v, b.bv) /
      |      (sqrt(list_inner_product(c.v, c.v)) *
      |       sqrt(list_inner_product(b.bv, b.bv)))), 6) AS max_cosine
      |  FROM c CROSS JOIN b GROUP BY 1)
      |SELECT vec_id, max_cosine, max_cosine >= 0.3 AS contaminated FROM s""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m8_pii_redact"     -> piiRedact _,
    "m8_decontaminate"  -> decontaminate _,
    "m8_line_dedup"     -> lineDedup _,
    "m8_substring_dedup" -> substringDedup _,
    "m8_bpe_pairs"      -> bpePairs _,
    "m8_bpe_rules"      -> bpeRules _,
    "m8_bpe_encode"     -> bpeEncode _,
    "m8_substring_rewrite" -> substringRewrite _,
    "m8_lm_surprisal"   -> lmSurprisal _,
    "m8_semantic_decontaminate" -> semanticDecontaminate _)

  def oracles: Map[String, String] = Map(
    "m8_pii_redact"     -> piiRedactSql,
    "m8_decontaminate"  -> decontaminateSql,
    "m8_line_dedup"     -> lineDedupSql,
    "m8_substring_dedup" -> substringDedupSql,
    "m8_bpe_pairs"      -> bpePairsSql,
    "m8_bpe_rules"      -> bpeRulesSql,
    "m8_bpe_encode"     -> bpeEncodeSql,
    "m8_substring_rewrite" -> substringRewriteSql,
    "m8_lm_surprisal"   -> lmSurprisalSql,
    "m8_semantic_decontaminate" -> semanticDecontaminateSql)
}
