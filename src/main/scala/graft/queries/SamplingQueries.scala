package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Sampling
import Dsl.hex60Sql

/** Deterministic sampling / splitting / mixing demos over `documents`
  * ([[graft.ops.Sampling]]) — every selection decision is an exact
  * integer compare on a salted md5-derived coordinate, so DuckDB
  * replicates each query byte-exactly (no rand(), no approximation). */
object SamplingQueries extends QueryModule {

  private def coordSql(salt: String) =
    hex60Sql(s"'$salt|' || doc_id::VARCHAR")

  /** Per-language Bernoulli rates: majority language downsampled less,
    * tail languages kept at a floor rate. */
  private def stratified(s: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedSample(Tables.documents(s, dir),
        col("lang"), col("doc_id"),
        fractions = Map("en" -> 0.5, "zh" -> 0.25), default = 0.1,
        salt = "strat")
      .select("doc_id", "lang")

  private val stratifiedSql =
    s"""SELECT doc_id, lang FROM documents
       |WHERE ${coordSql("strat")} <
       |  CASE WHEN lang = 'zh' THEN ${Sampling.thresholdFor(0.25)}
       |       WHEN lang = 'en' THEN ${Sampling.thresholdFor(0.5)}
       |       ELSE ${Sampling.thresholdFor(0.1)} END""".stripMargin

  /** Disjoint 80/10/10 train/val/test assignment for every document. */
  private def split(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        Sampling.splitColumn(col("doc_id"), "split",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))

  private val splitSql =
    s"""SELECT doc_id,
       |  CASE WHEN ${coordSql("split")} < ${Sampling.thresholdFor(0.8)} THEN 'train'
       |       WHEN ${coordSql("split")} < ${Sampling.thresholdFor(0.9)} THEN 'val'
       |       ELSE 'test' END AS split
       |FROM documents""".stripMargin

  /** Temperature rebalance (α = 0.5) over the corpus's NATURAL language
    * skew: per-language keep rates are data-dependent —
    * sqrt(n_min/n_lang) — so the kept distribution follows p ∝ n^0.5
    * (rarest language keeps all rows). sqrt/division are IEEE-correctly
    * rounded in both engines, so the integer thresholds and therefore
    * every selection decision replay exactly. */
  private def temperature(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    val kept = Sampling.temperatureMix(d, col("lang"), col("doc_id"),
        alpha = 0.5, salt = "temp")
      .groupBy("mix_source").agg(count(lit(1)).as("n_kept"))
    d.groupBy(col("lang").as("mix_source")).agg(count(lit(1)).as("n_total"))
      .join(kept, Seq("mix_source"), "left")
      .select(col("mix_source"), col("n_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  private val temperatureSql =
    s"""WITH n AS (SELECT lang, COUNT(*) AS n_s FROM documents GROUP BY 1),
       |m AS (SELECT MIN(n_s) AS n_min FROM n),
       |thr AS (
       |  SELECT lang,
       |    CAST(floor(sqrt(CAST(n_min AS DOUBLE) / CAST(n_s AS DOUBLE)) *
       |      1152921504606846976.0) AS BIGINT) AS t
       |  FROM n CROSS JOIN m),
       |kept AS (
       |  SELECT d.lang, COUNT(*) AS n_kept
       |  FROM documents d JOIN thr ON d.lang = thr.lang
       |  WHERE ${coordSql("temp")} < thr.t GROUP BY 1)
       |SELECT n.lang AS mix_source, n.n_s AS n_total,
       |  COALESCE(k.n_kept, 0) AS n_kept
       |FROM n LEFT JOIN kept k ON n.lang = k.lang""".stripMargin

  /** Weighted three-source corpus mix with provenance tags. */
  private def mix(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
    Sampling.weightedMix(Seq(
        ("src0", d.filter(col("source") === "src0"), 0.8),
        ("src1", d.filter(col("source") === "src1"), 0.5),
        ("src2", d.filter(col("source") === "src2"), 0.25)),
      col("doc_id"), salt = "mix")
      .select("doc_id", "mix_source")
  }

  private val mixSql = {
    def arm(src: String, f: Double) =
      s"""SELECT doc_id, '$src' AS mix_source FROM documents
         |WHERE source = '$src'
         |  AND ${hex60Sql(s"'mix|$src|' || doc_id::VARCHAR")} < ${Sampling.thresholdFor(f)}""".stripMargin
    Seq(arm("src0", 0.8), arm("src1", 0.5), arm("src2", 0.25))
      .mkString("", "\nUNION ALL\n", "")
  }

  /** Crawl-balancing cap: at most 10 documents per source, survivors a
    * uniform stable draw (hash order, not arrival order). */
  private def cap(s: SparkSession, dir: String): DataFrame =
    Sampling.capPerGroup(Tables.documents(s, dir),
        col("source"), col("doc_id"), n = 10, salt = "cap")
      .select("doc_id", "source")

  private val capSql =
    s"""SELECT doc_id, source FROM (
       |  SELECT doc_id, source,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |                       ORDER BY ${coordSql("cap")}) AS rn
       |  FROM documents) WHERE rn <= 10""".stripMargin

  /** Weighted sample without replacement (priority sampling): 50 docs
    * drawn with probability growing in n_chars — longer documents
    * (more tokens) get proportionally more draw mass, the standard
    * corpus-sampling weight. Priority = salted-hash coordinate divided
    * by the weight; both engines compute the identical IEEE quotient,
    * so the ranking replays exactly. */
  private def weighted(s: SparkSession, dir: String): DataFrame =
    Sampling.weightedSample(
      Tables.spread(Tables.documents(s, dir))
        .select(col("doc_id"), col("source"), col("n_chars")),
      col("doc_id"), col("n_chars"), k = 50, salt = "wsam")

  private val weightedSql =
    s"""SELECT doc_id, source, n_chars FROM (
       |  SELECT doc_id, source, n_chars,
       |    ROW_NUMBER() OVER (ORDER BY
       |      CAST(${coordSql("wsam")} AS DOUBLE) / CAST(n_chars AS DOUBLE) ASC,
       |      doc_id) AS rn
       |  FROM documents) WHERE rn <= 50""".stripMargin

  /** M8 capstone — the composed corpus-preparation pipeline a training
    * run needs, each stage one of this engine's operators:
    * top-quartile quality gate → exact dedup (min doc_id survives per
    * content hash) → ≤15 docs per source (uniform stable draw) →
    * 90/10 train/val assignment. Every stage is deterministic, so the
    * whole chain is hash-verified end-to-end by one DuckDB oracle. */
  private def corpusPipeline(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFns
    import graft.dedup.Dedup
    val docs = Tables.spread(Tables.documents(s, dir))
    val gated = Sampling.topFractionByScore(
      docs.withColumn("quality", TextFns.quality_score(col("text"))),
      col("quality"), fraction = 0.25)
    val survivors = Dedup.exactSurvivors(gated, col("doc_id"), col("text"))
      .select(col("survivor_id").as("doc_id"))
    val deduped = gated.join(survivors, Seq("doc_id"))
    val capped = Sampling.capPerGroup(deduped,
      col("source"), col("doc_id"), n = 15, salt = "m8cap")
    capped.select(col("doc_id"), col("source"), col("lang"),
      Sampling.splitColumn(col("doc_id"), "m8split",
        Seq("train" -> 0.9, "val" -> 0.1)).as("split"))
  }

  private val corpusPipelineSql =
    s"""WITH q AS (
       |  SELECT doc_id, text, source, lang,
       |    ${TextQueries.qualityExprSql} AS quality
       |  FROM documents),
       |h AS (SELECT quality, COUNT(*) AS cnt FROM q GROUP BY 1),
       |hc AS (
       |  SELECT quality, cnt,
       |    SUM(cnt) OVER (ORDER BY quality DESC) AS cum,
       |    SUM(cnt) OVER () AS total
       |  FROM h),
       |thr AS (SELECT MIN(quality) AS t FROM hc
       |        WHERE CAST(cum - cnt AS DOUBLE) < 0.25 * CAST(total AS DOUBLE)),
       |gated AS (SELECT q.* FROM q, thr WHERE q.quality >= thr.t),
       |surv AS (
       |  SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY md5(text)),
       |deduped AS (SELECT g.* FROM gated g JOIN surv USING (doc_id)),
       |capped AS (
       |  SELECT doc_id, source, lang FROM (
       |    SELECT doc_id, source, lang,
       |      ROW_NUMBER() OVER (PARTITION BY source
       |        ORDER BY ${hex60Sql("'m8cap|' || doc_id::VARCHAR")}) AS rn
       |    FROM deduped) WHERE rn <= 15)
       |SELECT doc_id, source, lang,
       |  CASE WHEN ${hex60Sql("'m8split|' || doc_id::VARCHAR")}
       |         < ${Sampling.thresholdFor(0.9)} THEN 'train'
       |       ELSE 'val' END AS split
       |FROM capped""".stripMargin

  /** Token-budget packing: 8 hash shards, 4096-token context packs. */
  private def pack(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFns
    Sampling.packByTokenBudget(
        Tables.documents(s, dir)
          .select(col("doc_id"), TextFns.token_count(col("text")).as("n_tokens")),
        col("doc_id"), col("n_tokens"),
        budgetTokens = 4096, shards = 8, salt = "pack")
      .select("doc_id", "n_tokens", "shard", "pack_id")
  }

  private val packSql = {
    val nTok = """CAST(CASE WHEN trim(text) = '' THEN 0
                 |       ELSE len(string_split_regex(trim(text), '\s+')) END AS INT)""".stripMargin
    s"""WITH t AS (
       |  SELECT doc_id, $nTok AS n_tokens,
       |    ${coordSql("pack")} AS c
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, n_tokens, CAST(c % 8 AS INT) AS shard,
       |    SUM(n_tokens) OVER (PARTITION BY c % 8 ORDER BY c) AS cum
       |  FROM t)
       |SELECT doc_id, n_tokens, shard,
       |  CAST(floor((cum - n_tokens) / 4096) AS BIGINT) AS pack_id
       |FROM s""".stripMargin
  }

  /** Curriculum-ordered packing capstone (round 13): difficulty-staged
    * training packs, composed entirely from gated machinery. Per-doc
    * difficulty = mean surprisal in 1/16-bit integer units (CCNet-style
    * unigram LM, [[graft.ops.TextCorpus.unigramSurprisal]] — harder
    * text = rarer tokens = more bits); docs split into 4 curriculum
    * stages at the quartiles of the ≤1024-class integer histogram
    * (cum×4 ≥ n×k — a bounded-size window + a 1-row broadcast
    * threshold, never a global sort over docs, the same scale shape as
    * the DSIR resample). Equal-difficulty docs share a class and
    * therefore a stage — on a low-entropy corpus (this synthetic one:
    * 95% of docs at exactly 4.0 mean bits, a property of the data, not
    * the operator) the quartiles collapse and most docs land in stage
    * 1, which is the principled degradation: a curriculum cannot order
    * what the difficulty signal cannot distinguish. Each stage packs
    * independently into 2048-token shard-local packs
    * ([[Sampling.packByTokenBudget]]), so an easy→hard training
    * schedule reads stages in order while packing parallelism stays
    * shards × stages. Output: every doc's (difficulty, stage, shard,
    * pack) assignment — the full curriculum manifest, hash-gated. */
  private def curriculumPack(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.TextCorpus
    val scored = TextCorpus.unigramSurprisal(
        Tables.spread(Tables.documents(s, dir)), col("doc_id"), col("text"))
      .select(col("doc_id"), col("n_tokens"), col("total_bits"))
      .withColumn("diff_bits",
        when(col("n_tokens") === 0, lit(0L))
          .otherwise(expr("(total_bits * 16) div n_tokens")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wcum = org.apache.spark.sql.expressions.Window
      .orderBy("diff_bits")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val wtot = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    // The single-partition window runs over the ≤64-row bit histogram,
    // not the corpus — bounded at any scale.
    val thresholds = scored.groupBy("diff_bits").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum("cnt").over(wcum))
      .withColumn("n", sum("cnt").over(wtot))
      .agg(
        min(when(col("cum") * 4 >= col("n") * 1, col("diff_bits"))).as("t1"),
        min(when(col("cum") * 4 >= col("n") * 2, col("diff_bits"))).as("t2"),
        min(when(col("cum") * 4 >= col("n") * 3, col("diff_bits"))).as("t3"))
    val staged = scored.crossJoin(broadcast(thresholds))
      .withColumn("stage",
        lit(1) + when(col("diff_bits") > col("t1"), 1).otherwise(0)
               + when(col("diff_bits") > col("t2"), 1).otherwise(0)
               + when(col("diff_bits") > col("t3"), 1).otherwise(0))
      .select("doc_id", "n_tokens", "diff_bits", "stage")
    (1 to 4).map { st =>
      Sampling.packByTokenBudget(staged.filter(col("stage") === st),
        col("doc_id"), col("n_tokens"),
        budgetTokens = 2048, shards = 2, salt = s"cur$st")
    }.reduce(_ unionByName _)
      .select("doc_id", "diff_bits", "stage", "shard", "pack_id", "n_tokens")
  }

  private val curriculumPackSql = {
    val c = hex60Sql("'cur' || stage::VARCHAR || '|' || doc_id::VARCHAR")
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
      |  FROM b GROUP BY 1),
      |sc AS (
      |  SELECT d.doc_id,
      |    CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
      |    COALESCE(p.total_bits, 0) AS total_bits,
      |    CASE WHEN COALESCE(p.n_tokens, 0) = 0 THEN 0
      |         ELSE (p.total_bits * 16) // p.n_tokens END AS diff_bits
      |  FROM documents d LEFT JOIN p USING (doc_id)),
      |h AS (SELECT diff_bits, COUNT(*) AS cnt FROM sc GROUP BY 1),
      |m AS (
      |  SELECT diff_bits, SUM(cnt) OVER (ORDER BY diff_bits) AS cum,
      |    SUM(cnt) OVER () AS nn
      |  FROM h),
      |thr AS (SELECT
      |    MIN(CASE WHEN cum * 4 >= nn * 1 THEN diff_bits END) AS t1,
      |    MIN(CASE WHEN cum * 4 >= nn * 2 THEN diff_bits END) AS t2,
      |    MIN(CASE WHEN cum * 4 >= nn * 3 THEN diff_bits END) AS t3
      |  FROM m),
      |st AS (
      |  SELECT sc.doc_id, sc.n_tokens, sc.diff_bits,
      |    1 + CASE WHEN diff_bits > t1 THEN 1 ELSE 0 END
      |      + CASE WHEN diff_bits > t2 THEN 1 ELSE 0 END
      |      + CASE WHEN diff_bits > t3 THEN 1 ELSE 0 END AS stage
      |  FROM sc CROSS JOIN thr),
      |s2 AS (
      |  SELECT doc_id, diff_bits, stage, n_tokens,
      |    CAST(HEXC % 2 AS INT) AS shard,
      |    SUM(n_tokens) OVER (PARTITION BY stage, HEXC % 2 ORDER BY HEXC) AS cum
      |  FROM st)
      |SELECT doc_id, diff_bits, stage, shard,
      |  CAST(floor((cum - n_tokens) / 2048) AS BIGINT) AS pack_id, n_tokens
      |FROM s2""".stripMargin.replace("HEXC", c)
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m8_pack_sequences"    -> pack _,
    "m8_curriculum_pack"   -> curriculumPack _,
    "m8_corpus_pipeline"   -> corpusPipeline _,
    "m8_sample_stratified" -> stratified _,
    "m8_split_assign"      -> split _,
    "m8_sample_mix"        -> mix _,
    "m8_temperature_mix"   -> temperature _,
    "m8_cap_per_source"    -> cap _,
    "m8_weighted_sample"   -> weighted _)

  def oracles: Map[String, String] = Map(
    "m8_pack_sequences"    -> packSql,
    "m8_curriculum_pack"   -> curriculumPackSql,
    "m8_corpus_pipeline"   -> corpusPipelineSql,
    "m8_sample_stratified" -> stratifiedSql,
    "m8_split_assign"      -> splitSql,
    "m8_sample_mix"        -> mixSql,
    "m8_temperature_mix"   -> temperatureSql,
    "m8_cap_per_source"    -> capSql,
    "m8_weighted_sample"   -> weightedSql)
}
