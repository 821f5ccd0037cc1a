package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.PageRank

/** Graph-centrality queries over the trade graph derived from the
  * TPC-H-ish tables: a directed bipartite edge per distinct
  * (supplier → customer) trading relationship in `lineitem ⋈ orders`
  * (customer keys offset by 1e6 into a disjoint node-id space).
  * Suppliers have out-edges; customers are all sinks — which makes the
  * dangling-mass redistribution a load-bearing part of the oracle, not
  * a corner case.
  *
  * The oracle replays the ENTIRE fixed-point iteration in SQL: the
  * 10 rounds are unrolled as chained CTEs doing the same integer
  * multiply/floor-divide steps, so the hash compare certifies every
  * round's arithmetic, not just a final shape.
  */
object GraphQueries extends QueryModule {

  private val CustOffset = 1000000L
  private val Iters = 10

  /** PageRank over supplier→customer trade edges, top 20 by rank. */
  private def pagerank(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val edges = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(col("l_suppkey").as("src"),
        (col("o_custkey") + lit(CustOffset)).as("dst"))
    PageRank.run(edges, iterations = Iters)
      .orderBy(col("rank").desc, col("node"))
      .limit(20)
  }

  /** Weighted variant: the same graph with TRADE VOLUME as the vote —
    * each relationship's weight is its lineitem count, so rank flows
    * proportionally to how much actually ships, not to bare edge
    * existence. */
  private def pagerankWeighted(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val edges = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy(col("l_suppkey").as("src"),
        (col("o_custkey") + lit(CustOffset)).as("dst"))
      .agg(count(lit(1)).as("w"))
    PageRank.run(edges, iterations = Iters)
      .orderBy(col("rank").desc, col("node"))
      .limit(20)
  }

  /** The unrolled-iteration oracle: r0 → r10 as chained CTEs, each round
    * recomputing dangling share + contributions with the same integer
    * arithmetic ([[PageRank]]: Scale=1e12, damping 85/100, floor
    * division throughout — all values non-negative, so DuckDB's `//`
    * and Spark's `div` agree exactly). */
  private def pagerankSql(weighted: Boolean): String = {
    val scale = PageRank.Scale
    val edgeCte =
      if (weighted)
        s"""e AS MATERIALIZED (
           |  SELECT l.l_suppkey AS src, $CustOffset + o.o_custkey AS dst,
           |    COUNT(*) AS w
           |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           |  WHERE l.l_suppkey <> $CustOffset + o.o_custkey
           |  GROUP BY 1, 2)""".stripMargin
      else
        s"""e AS MATERIALIZED (
           |  SELECT DISTINCT l.l_suppkey AS src, $CustOffset + o.o_custkey AS dst,
           |    1 AS w
           |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           |  WHERE l.l_suppkey <> $CustOffset + o.o_custkey)""".stripMargin
    val rounds = (1 to Iters).map { k =>
      val p = k - 1
      s"""d$k AS MATERIALIZED (
         |  SELECT CAST(COALESCE(SUM(r.rank), 0) AS BIGINT) // (SELECT n FROM m) AS dshare
         |  FROM r$p r LEFT JOIN deg ON r.node = deg.src
         |  WHERE deg.src IS NULL),
         |r$k AS MATERIALIZED (
         |  SELECT nd.node,
         |    ((15 * $scale) // 100) // (SELECT n FROM m)
         |    + (85 * (COALESCE(c.contrib, 0) + (SELECT dshare FROM d$k))) // 100 AS rank
         |  FROM nodes nd
         |  LEFT JOIN (
         |    SELECT ed.dst AS cnode,
         |      CAST(SUM((r.rank * ed.w) // ed.outdeg) AS BIGINT) AS contrib
         |    FROM ed JOIN r$p r ON ed.src = r.node
         |    GROUP BY ed.dst) c ON nd.node = c.cnode)""".stripMargin
    }.mkString(",\n")
    s"""WITH $edgeCte,
       |deg AS MATERIALIZED (
       |  SELECT src, CAST(SUM(w) AS BIGINT) AS outdeg FROM e GROUP BY 1),
       |ed AS MATERIALIZED (
       |  SELECT e.src, e.dst, e.w, deg.outdeg FROM e JOIN deg USING (src)),
       |nodes AS MATERIALIZED (SELECT DISTINCT node
       |          FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |m AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
       |r0 AS MATERIALIZED (SELECT node, $scale // (SELECT n FROM m) AS rank FROM nodes),
       |$rounds
       |SELECT node, CAST(rank AS BIGINT) AS rank FROM r$Iters
       |ORDER BY rank DESC, node LIMIT 20""".stripMargin
  }

  private val MaxIters = 12
  private val Eps = PageRank.Scale / 1000000L // total movement ≤ 1e-6 mass

  /** Convergence-stop PageRank: iterate until the round's total rank
    * movement (exact long |Δ| sum) is ≤ [[Eps]], cap [[MaxIters]]. The
    * stopping round is data-determined (5 on this graph at every tested
    * SF — the bipartite structure contracts ~20× per round) and the
    * oracle derives the SAME round from its unrolled replay, so both the
    * ranks and `n_rounds` are hash-compared. */
  private def pagerankConverged(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
    val ord = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val edges = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(col("l_suppkey").as("src"),
        (col("o_custkey") + lit(CustOffset)).as("dst"))
    PageRank.runConverged(edges, maxIterations = MaxIters, epsScaled = Eps)
      .orderBy(col("rank").desc, col("node"))
      .limit(20)
  }

  /** Oracle: unroll [[MaxIters]] rounds, compute every round's exact
    * |Δ| sum, pick the FIRST round at or under [[Eps]] (or the cap), and
    * emit that round's top-20 ranks plus the round number itself. */
  private val pagerankConvergedSql = {
    val scale = PageRank.Scale
    val edgeCte =
      s"""e AS MATERIALIZED (
         |  SELECT DISTINCT l.l_suppkey AS src, $CustOffset + o.o_custkey AS dst,
         |    1 AS w
         |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         |  WHERE l.l_suppkey <> $CustOffset + o.o_custkey)""".stripMargin
    val rounds = (1 to MaxIters).map { k =>
      val p = k - 1
      s"""d$k AS MATERIALIZED (
         |  SELECT CAST(COALESCE(SUM(r.rank), 0) AS BIGINT) // (SELECT n FROM m) AS dshare
         |  FROM r$p r LEFT JOIN deg ON r.node = deg.src
         |  WHERE deg.src IS NULL),
         |r$k AS MATERIALIZED (
         |  SELECT nd.node,
         |    ((15 * $scale) // 100) // (SELECT n FROM m)
         |    + (85 * (COALESCE(c.contrib, 0) + (SELECT dshare FROM d$k))) // 100 AS rank
         |  FROM nodes nd
         |  LEFT JOIN (
         |    SELECT ed.dst AS cnode,
         |      CAST(SUM((r.rank * ed.w) // ed.outdeg) AS BIGINT) AS contrib
         |    FROM ed JOIN r$p r ON ed.src = r.node
         |    GROUP BY ed.dst) c ON nd.node = c.cnode)""".stripMargin
    }.mkString(",\n")
    val deltas = (1 to MaxIters).map { k =>
      s"""SELECT $k AS k, (SELECT CAST(SUM(ABS(a.rank - b.rank)) AS BIGINT)
         |  FROM r$k a JOIN r${k - 1} b ON a.node = b.node) AS delta""".stripMargin
    }.mkString(" UNION ALL ")
    val allRounds = (1 to MaxIters)
      .map(k => s"SELECT $k AS k, node, rank FROM r$k")
      .mkString(" UNION ALL ")
    s"""WITH $edgeCte,
       |deg AS MATERIALIZED (
       |  SELECT src, CAST(SUM(w) AS BIGINT) AS outdeg FROM e GROUP BY 1),
       |ed AS MATERIALIZED (
       |  SELECT e.src, e.dst, e.w, deg.outdeg FROM e JOIN deg USING (src)),
       |nodes AS MATERIALIZED (SELECT DISTINCT node
       |          FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |m AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
       |r0 AS MATERIALIZED (SELECT node, $scale // (SELECT n FROM m) AS rank FROM nodes),
       |$rounds,
       |deltas AS MATERIALIZED ($deltas),
       |conv AS MATERIALIZED (
       |  SELECT COALESCE(MIN(k), $MaxIters) AS kk FROM deltas
       |  WHERE delta <= $Eps)
       |SELECT node, CAST(rank AS BIGINT) AS rank,
       |  CAST((SELECT kk FROM conv) AS BIGINT) AS n_rounds
       |FROM ($allRounds) WHERE k = (SELECT kk FROM conv)
       |ORDER BY rank DESC, node LIMIT 20""".stripMargin
  }

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m8_pagerank"           -> pagerank _,
    "m8_pagerank_weighted"  -> pagerankWeighted _,
    "m8_pagerank_converged" -> pagerankConverged _)

  def oracles: Map[String, String] = Map(
    "m8_pagerank"           -> pagerankSql(weighted = false),
    "m8_pagerank_weighted"  -> pagerankSql(weighted = true),
    "m8_pagerank_converged" -> pagerankConvergedSql)
}
