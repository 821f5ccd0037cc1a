package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.Dedup

/** Deduplication operator demos over `documents`/`embeddings` (north-star
  * M8 scope): exact, n-gram Jaccard, MinHash+LSH, SimHash,
  * embedding-cosine. Exact and Jaccard carry full DuckDB oracles; the
  * xxhash64-based signature families (no DuckDB equivalent) are
  * rows-checked by the driver and value-checked in unit tests. */
object DedupQueries extends QueryModule {

  /** Exact dedup survivors: one row per distinct content hash. */
  private def exact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactSurvivors(Tables.documents(s, dir), col("doc_id"), col("text"))

  private val exactSql =
    """SELECT md5(text) AS content_key, MIN(doc_id) AS survivor_id,
      |  COUNT(*) AS n_copies
      |FROM documents GROUP BY 1""".stripMargin

  /** Exact word-3-gram Jaccard pairs ≥ 0.5 (the explode/join shape —
    * shuffle on shingle, combine per pair — not an array cross join). */
  private def ngramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(
      Tables.documents(s, dir),
      col("doc_id"), col("text"), minJaccard = 0.5)

  private val ngramJaccardSql =
    """WITH docs AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks, text
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, shingle
      |  FROM docs, unnest(
      |    CASE WHEN len(toks) < 3 THEN [trim(text)]
      |         ELSE [array_to_string(toks[i:i+2], ' ')
      |               for i in generate_series(1, len(toks) - 2)] END
      |  ) AS u(shingle)),
      |counts AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
      |common AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT id_b, id_a, n_common,
      |  CAST(n_common AS DOUBLE) / CAST(ca.n_sh + cb.n_sh - n_common AS DOUBLE)
      |    AS jaccard
      |FROM common
      |JOIN counts ca ON ca.doc_id = id_a
      |JOIN counts cb ON cb.doc_id = id_b
      |WHERE CAST(n_common AS DOUBLE) / CAST(ca.n_sh + cb.n_sh - n_common AS DOUBLE)
      |      >= 0.5""".stripMargin

  /** MinHash+LSH near-dup candidates (32 hashes, 8 bands, agreement ≥ .5). */
  private def minhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashPairs(Tables.documents(s, dir), col("doc_id"), col("text"))
      .select(col("id_a"), col("id_b"),
        round(col("sig_agreement"), 4).as("sig_agreement"))

  /** SimHash near-dup candidates within 8 Hamming bits (16-bit blocking). */
  private def simhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(s, dir), col("doc_id"), col("text"))

  /** Embedding-cosine near-dups via hyperplane-LSH blocking. */
  private def embedding(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingPairs(Tables.embeddings(s, dir), col("vec_id"),
      col("embedding"), minCosine = 0.4)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 4).as("cosine"))

  /** Dedup by canonical URL (the reference's own dedup key, F12+A1):
    * tracking-param variants of the same posting collapse to one survivor. */
  private def canonicalUrlDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.UrlFns
    val k = col("o_orderkey")
    Tables.orders(s, dir)
      .withColumn("url",
        concat(lit("https://jobs.example.com/post/"), k % 500,
          lit("?utm_source=src"), k % 3, lit("&ref=page&utm_campaign=c"), k % 2))
      .withColumn("canonical", UrlFns.canonical_url(col("url")))
      .groupBy("canonical")
      .agg(min(k).as("survivor_key"), count(lit(1)).as("n_variants"))
      .filter(col("n_variants") > 1)
  }

  private val canonicalUrlDedupSql =
    """SELECT 'https://jobs.example.com/post/' || (o_orderkey % 500) || '?ref=page'
      |    AS canonical,
      |  MIN(o_orderkey) AS survivor_key, COUNT(*) AS n_variants
      |FROM orders GROUP BY 1 HAVING COUNT(*) > 1""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m8_dedup_canonical_url" -> canonicalUrlDedup _,
    "m8_dedup_exact"         -> exact _,
    "m8_dedup_ngram_jaccard" -> ngramJaccard _,
    "m8_dedup_minhash"       -> minhash _,
    "m8_dedup_simhash"       -> simhash _,
    "m8_dedup_embedding"     -> embedding _)

  def oracles: Map[String, String] = Map(
    "m8_dedup_canonical_url" -> canonicalUrlDedupSql,
    "m8_dedup_exact"         -> exactSql,
    "m8_dedup_ngram_jaccard" -> ngramJaccardSql)
}
