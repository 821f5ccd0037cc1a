package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.SkewProbe

/** Skew / fan-out measurement queries ([[SkewProbe]]) — exact-integer
  * scorecards (counts + basis-point shares) so the diagnostics
  * themselves are hash-compared against DuckDB. */
object ProbeQueries extends QueryModule {

  /** Order-count distribution over customers: who would straggle a
    * customer-keyed shuffle. */
  private def keySkew(s: SparkSession, dir: String): DataFrame =
    SkewProbe.keyHistogram(Tables.orders(s, dir), col("o_custkey"), topN = 20)

  private val keySkewSql =
    """WITH counts AS (
      |  SELECT o_custkey AS key, COUNT(*) AS cnt FROM orders GROUP BY 1),
      |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows, COUNT(*) AS n_keys
      |      FROM counts)
      |SELECT key, cnt, (10000 * cnt) // (SELECT n_rows FROM t) AS share_bp,
      |  (SELECT n_keys FROM t) AS n_keys, (SELECT n_rows FROM t) AS n_rows
      |FROM counts ORDER BY cnt DESC, key LIMIT 20""".stripMargin

  /** Self-join explosion forecast on events.user_id — the per-key
    * output sizes a user-keyed stream-stream join would emit, measured
    * BEFORE running it. */
  private def joinFanout(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    SkewProbe.joinFanout(e, e, col("user_id"), col("user_id"), topN = 20)
  }

  private val joinFanoutSql =
    """WITH c AS (
      |  SELECT user_id AS key, COUNT(*) AS n FROM events GROUP BY 1),
      |j AS (
      |  SELECT a.key, a.n AS n_left, b.n AS n_right,
      |    a.n * b.n AS fanout
      |  FROM c a JOIN c b ON a.key = b.key),
      |t AS (SELECT CAST(COALESCE(SUM(fanout), 0) AS BIGINT) AS total FROM j)
      |SELECT key, n_left, n_right, fanout,
      |  CASE WHEN (SELECT total FROM t) = 0 THEN 0
      |       ELSE (10000 * fanout) // (SELECT total FROM t) END AS share_bp,
      |  (SELECT total FROM t) AS total_rows
      |FROM j ORDER BY fanout DESC, key LIMIT 20""".stripMargin

  /** Bloom-filter contract probe (the HLL error-contract pattern: emit
    * what the oracle can recompute exactly, plus verdicts the sketch
    * must satisfy — an out-of-contract sketch hash-fails the gate):
    * build the filter over every order's customer key, then
    *  - `no_false_negatives`: every PRESENT key must hit (a Bloom
    *    filter's hard guarantee, not probabilistic);
    *  - `fpr_within_bound`: probing a disjoint key set (custkey+10^7,
    *    absent by construction), the false-positive rate must stay
    *    within 3× the configured 1% — deterministic for the fixed hash
    *    family, so this either always holds on this data or the build
    *    is broken. */
  private def bloomFpr(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.BloomJoin
    val orders = Tables.orders(s, dir)
    val keys = orders.select(col("o_custkey").as("k")).distinct()
    // size the filter from the data, not a constant: a filter built for
    // 2000 items saturates at 15k keys (sf0.1) and the FPR contract
    // breaks — the 1-value count is a planning statistic, the same
    // class as AQE's runtime stats
    val nKeys = keys.count()
    val bloom = BloomJoin.buildBloom(keys, col("k"),
      expectedItems = math.max(nKeys, 1L), fpp = 0.01)
    // both probes in ONE aggregate over one scan of the key set: each
    // row contributes its present-key hit and its shifted absent-key
    // probe — no second distinct, no second exchange
    keys
      .agg(count(lit(1)).as("n_probes"),
        coalesce(sum(when(
          BloomJoin.mightContain(keys, col("k"), bloom), 1L)), lit(0L))
          .as("hits"),
        coalesce(sum(when(
          BloomJoin.mightContain(keys, col("k") + lit(10000000L), bloom), 1L)),
          lit(0L)).as("fp"))
      .select(col("n_probes"),
        (col("hits") === col("n_probes")).as("no_false_negatives"),
        (col("fp") * 10000 <= col("n_probes") * 300).as("fpr_within_bound"))
  }

  private val bloomFprSql =
    """SELECT COUNT(DISTINCT o_custkey) AS n_probes,
      |  TRUE AS no_false_negatives, TRUE AS fpr_within_bound
      |FROM orders""".stripMargin

  /** Count-min-sketch contract probe — the frequency member of the
    * sketch-family gates (HLL++ = distinct counts, Bloom = membership,
    * CMS = per-key frequency). The sketch is built DISTRIBUTED (one
    * `count_min_sketch` aggregation pass) and probed IN the plan: the
    * 1-row sketch aggregate is broadcast onto the grouped key frame and
    * deserialized once per partition. Two verdicts per key:
    *  - `never_underestimates`: CMS's hard guarantee (hash collisions
    *    only ever ADD);
    *  - `within_eps_bound`: estimate ≤ exact + ⌈ε·N⌉ — probabilistic in
    *    general, deterministic here for the fixed seed.
    * The oracle recomputes the exact counts and expects TRUE twice. */
  private def cmsContract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val events = Tables.events(s, dir)
    // the sketch never touches the driver: it stays a 1-row aggregate
    // broadcast into the probe, and the key domain stays a distributed
    // grouped frame — no `.collect()` anywhere, so the same query shape
    // holds when the probed domain is millions of keys, not five
    val sketch = events
      .agg(expr("count_min_sketch(event_type, 0.001d, 0.99d, 42)").as("sketch_bin"))
    val exact = events.groupBy("event_type").agg(count(lit(1)).as("exact_cnt"))
    val total = events.agg(count(lit(1)).as("n_rows"))
    val probed = exact.crossJoin(broadcast(sketch)).crossJoin(broadcast(total))
      .select(col("event_type"), col("exact_cnt"), col("n_rows"), col("sketch_bin"))
      .as[(String, Long, Long, Array[Byte])]
      .mapPartitions { it =>
        // deserialize the (identical) broadcast bytes once per partition,
        // then probe every key in the partition against that instance
        var cms: org.apache.spark.util.sketch.CountMinSketch = null
        it.map { case (k, exactCnt, nRows, bin) =>
          if (cms == null)
            cms = org.apache.spark.util.sketch.CountMinSketch
              .readFrom(new java.io.ByteArrayInputStream(bin))
          (k, exactCnt, nRows, cms.estimateCount(k))
        }
      }.toDF("event_type", "exact_cnt", "n_rows", "est")
    probed.select(col("event_type"), col("exact_cnt"),
      (col("est") >= col("exact_cnt")).as("never_underestimates"),
      expr("est <= exact_cnt + cast(ceil(0.001 * n_rows) as bigint)")
        .as("within_eps_bound"))
  }

  private val cmsContractSql =
    """SELECT event_type, COUNT(*) AS exact_cnt,
      |  TRUE AS never_underestimates, TRUE AS within_eps_bound
      |FROM events GROUP BY 1""".stripMargin

  /** Tukey-fence outlier gate: per return flag, exact interpolated
    * quartiles (the established percentile ↔ quantile_cont parity)
    * give IQR fences at 1.5×, and each row is tested against its
    * group's fences — the distribution-aware "is this value sane"
    * check a quality pipeline runs on numeric columns, with the fence
    * derivation itself on the gate (identical IEEE expression order in
    * both engines). Plan: one grouped percentile pass, fences
    * broadcast back over the fact scan, one counting pass. */
  private def outlierGate(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val fences = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.25)").as("q1"),
        expr("percentile(l_extendedprice, 0.75)").as("q3"))
      .select(col("l_returnflag"),
        (col("q1") - lit(1.5) * (col("q3") - col("q1"))).as("lo_fence"),
        (col("q3") + lit(1.5) * (col("q3") - col("q1"))).as("hi_fence"))
    li.join(broadcast(fences), Seq("l_returnflag"))
      .groupBy("l_returnflag", "lo_fence", "hi_fence")
      .agg(count(lit(1)).as("n_rows"),
        coalesce(sum(when(col("l_extendedprice") < col("lo_fence") ||
          col("l_extendedprice") > col("hi_fence"), 1L)), lit(0L))
          .as("n_outliers"))
      .select("l_returnflag", "n_rows", "n_outliers", "lo_fence", "hi_fence")
  }

  private val outlierGateSql =
    """WITH f AS (
      |  SELECT l_returnflag,
      |    quantile_cont(l_extendedprice, 0.25) AS q1,
      |    quantile_cont(l_extendedprice, 0.75) AS q3
      |  FROM lineitem GROUP BY 1),
      |fe AS (
      |  SELECT l_returnflag, q1 - 1.5 * (q3 - q1) AS lo_fence,
      |    q3 + 1.5 * (q3 - q1) AS hi_fence
      |  FROM f)
      |SELECT l.l_returnflag, COUNT(*) AS n_rows,
      |  CAST(COALESCE(SUM(CASE WHEN l_extendedprice < lo_fence
      |    OR l_extendedprice > hi_fence THEN 1 END), 0) AS BIGINT)
      |    AS n_outliers,
      |  fe.lo_fence, fe.hi_fence
      |FROM lineitem l JOIN fe USING (l_returnflag)
      |GROUP BY l.l_returnflag, fe.lo_fence, fe.hi_fence""".stripMargin

  /** Order-free table digests ([[graft.ops.Integrity]]): XOR of per-row
    * md5 fingerprints over keys + categorical columns (text pre-hashed
    * with md5 — engines must agree on the BYTES digested, and floats
    * are excluded because float→string rendering is engine-specific).
    * The migration-validation answer to "did every row survive the
    * move": one pass, 3 rows out, any single-row change flips it. */
  private def tableDigests(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Integrity
    Integrity.digests(Seq(
      ("orders", Tables.orders(s, dir), Seq(col("o_orderkey"),
        col("o_custkey"), col("o_orderstatus"), col("o_orderpriority"))),
      ("lineitem", Tables.lineitem(s, dir), Seq(col("l_orderkey"),
        col("l_linenumber"), col("l_returnflag"), col("l_linestatus"))),
      ("documents", Tables.documents(s, dir), Seq(col("doc_id"),
        col("lang"), col("source"), md5(col("text"))))))
  }

  private val tableDigestsSql = {
    def one(t: String, colsExpr: String) =
      s"""SELECT '$t' AS tbl, COUNT(*) AS n_rows,
         |  bit_xor(${Dsl.hex60Sql(colsExpr)}) AS digest FROM $t""".stripMargin
    Seq(
      one("orders",
        "concat_ws('|', o_orderkey, o_custkey, o_orderstatus, o_orderpriority)"),
      one("lineitem",
        "concat_ws('|', l_orderkey, l_linenumber, l_returnflag, l_linestatus)"),
      one("documents",
        "concat_ws('|', doc_id, lang, source, md5(text))"))
      .mkString("\nUNION ALL\n")
  }

  /** Snapshot diff on synthetic before/after views of `orders`: BEFORE
    * drops keys ≡3 (mod 11) — they surface as `added`; AFTER drops keys
    * ≡2 (mod 7) — `removed`; AFTER rewrites o_orderstatus to 'X' for
    * keys ≡0 (mod 5) — `changed`. The diff compares 60-bit content
    * hashes, so the full-outer join moves (key, hash) rows only; the
    * oracle rebuilds both snapshots and every verdict. */
  private def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Integrity
    val o = Tables.orders(s, dir)
    val before = o.filter(col("o_orderkey") % 11 =!= 3)
    val after = o.filter(col("o_orderkey") % 7 =!= 2)
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 5 === 0, lit("X"))
          .otherwise(col("o_orderstatus")))
    Integrity.snapshotDiff(before, after, col("o_orderkey"),
      Seq(col("o_custkey"), col("o_orderstatus"), col("o_orderpriority")))
  }

  private val snapshotDiffSql = {
    def h(status: String) =
      Dsl.hex60Sql(s"concat_ws('|', o_custkey, $status, o_orderpriority)")
    s"""WITH b AS (
       |  SELECT o_orderkey AS key, ${h("o_orderstatus")} AS h_before
       |  FROM orders WHERE o_orderkey % 11 <> 3),
       |a AS (
       |  SELECT o_orderkey AS key,
       |    ${h("CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END")}
       |      AS h_after
       |  FROM orders WHERE o_orderkey % 7 <> 2),
       |j AS (SELECT COALESCE(b.key, a.key) AS key, h_before, h_after
       |      FROM b FULL JOIN a ON a.key = b.key)
       |SELECT key,
       |  CASE WHEN h_before IS NULL THEN 'added'
       |       WHEN h_after IS NULL THEN 'removed'
       |       WHEN h_before <> h_after THEN 'changed' END AS verdict,
       |  h_before, h_after
       |FROM j
       |WHERE h_before IS NULL OR h_after IS NULL OR h_before <> h_after""".stripMargin
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m8_table_digest" -> tableDigests _,
    "m8_snapshot_diff" -> snapshotDiff _,
    "m8_outlier_gate" -> outlierGate _,
    "m8_key_skew"     -> keySkew _,
    "m8_join_fanout"  -> joinFanout _,
    "m8_bloom_fpr"    -> bloomFpr _,
    "m8_cms_contract" -> cmsContract _)

  def oracles: Map[String, String] = Map(
    "m8_table_digest" -> tableDigestsSql,
    "m8_snapshot_diff" -> snapshotDiffSql,
    "m8_outlier_gate" -> outlierGateSql,
    "m8_key_skew"     -> keySkewSql,
    "m8_join_fanout"  -> joinFanoutSql,
    "m8_bloom_fpr"    -> bloomFprSql,
    "m8_cms_contract" -> cmsContractSql)
}
