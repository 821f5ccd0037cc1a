package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference model: the same fixed-point recurrence in
    * plain Scala longs — the distributed result must match EXACTLY. */
  private def ref(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.filter(p => p._1 != p._2).distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.size
    val outdeg = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val tele = ((15L * PageRank.Scale) / 100) / n
    var r = nodes.map(_ -> PageRank.Scale / n).toMap
    for (_ <- 0 until iters) {
      val dshare = nodes.filterNot(outdeg.contains).map(r).sum / n
      val contrib = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      for ((s, d) <- e) contrib(d) += r(s) / outdeg(s)
      r = nodes.map(nd => nd -> (tele + (85L * (contrib(nd) + dshare)) / 100))
        .toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int = 10): Map[Long, Long] =
    PageRank.run(edges.toDF("src", "dst"), iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("matches the driver-side fixed-point model exactly") {
    // mixed graph: a 3-cycle feeding a sink, a hub, a duplicate edge and
    // a self-loop (both must be dropped)
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 1), (3, 4), (5, 4), (6, 4), (7, 4),
      (4, 8), (8, 8), (1, 2), (9, 1))
    assert(run(edges) == ref(edges, 10))
  }

  test("hub of a star graph collects the most rank") {
    val edges = (1L to 20L).map(i => (i, 100L))
    val r = run(edges)
    assert(r(100L) == r.values.max)
    assert(r(100L) > 10 * r(1L))
  }

  test("sink mass is redistributed, not drained") {
    // 1 -> 2, 2 is a pure sink: without dangling redistribution rank
    // mass collapses toward the teleport floor
    val r = run(Seq((1L, 2L)), iters = 20)
    val total = r.values.sum
    // mass conserved up to floor-division dust (< ~1 unit per node/round)
    assert(total > PageRank.Scale - 1000 && total <= PageRank.Scale)
    assert(r(2L) > r(1L)) // the sink still holds more than its feeder
  }

  test("pure function of the edge set: repartitioned input agrees") {
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (5, 1), (5, 2))
    val df1 = edges.toDF("src", "dst").repartition(7)
    val df3 = edges.toDF("src", "dst").coalesce(1)
    val a = PageRank.run(df1).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = PageRank.run(df3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    assert(a == ref(edges, 10).toSet)
  }

  test("zero iterations returns the uniform prior") {
    val r = run(Seq((1L, 2L), (2L, 3L)), iters = 0)
    assert(r.values.toSet == Set(PageRank.Scale / 3))
  }

  /** Rounds-to-converge of the reference model: first k whose exact
    * |Δ| sum is ≤ eps. */
  private def refRounds(edges: Seq[(Long, Long)], eps: Long,
                        cap: Int): Int = {
    var k = 1
    while (k < cap) {
      val (a, b) = (ref(edges, k - 1), ref(edges, k))
      if (a.keys.map(n => math.abs(b(n) - a(n))).sum <= eps) return k
      k += 1
    }
    cap
  }

  test("convergence stop: halts at the model's round, ranks match run(R)") {
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 1), (3, 4), (5, 4), (6, 4), (7, 4),
      (4, 8), (9, 1))
    val eps = PageRank.Scale / 1000000L
    val expectRounds = refRounds(edges, eps, cap = 50)
    assert(expectRounds > 1 && expectRounds < 50,
      s"test graph degenerate: converges at $expectRounds")
    val out = PageRank.runConverged(edges.toDF("src", "dst"),
      maxIterations = 50, epsScaled = eps).collect()
    val rounds = out.map(_.getLong(2)).toSet
    assert(rounds == Set(expectRounds.toLong),
      s"stopped at $rounds, model says $expectRounds")
    // the converged ranks are exactly the fixed-iteration result at R
    assert(out.map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      ref(edges, expectRounds))
  }

  test("convergence stop: the cap binds when eps is unreachable") {
    // star graph, eps=0, cap=2: round 2 still moves mass (the dangling
    // share keeps changing), so the iteration must stop AT the cap
    val edges = (1L to 5L).map(i => (i, 100L))
    val out = PageRank.runConverged(edges.toDF("src", "dst"),
      maxIterations = 2, epsScaled = 0L).collect()
    assert(out.map(_.getLong(2)).toSet == Set(2L))
  }

  /** Weighted reference model: contribution = (rank * w) div sum_w. */
  private def refW(edges: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.filter(p => p._1 != p._2 && p._3 > 0)
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.size
    val outw = e.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
    val tele = ((15L * PageRank.Scale) / 100) / n
    var r = nodes.map(_ -> PageRank.Scale / n).toMap
    for (_ <- 0 until iters) {
      val dshare = nodes.filterNot(outw.contains).map(r).sum / n
      val contrib = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      for ((s, d, w) <- e) contrib(d) += (r(s) * w) / outw(s)
      r = nodes.map(nd => nd -> (tele + (85L * (contrib(nd) + dshare)) / 100))
        .toMap
    }
    r
  }

  test("weighted: matches the model; heavier edges pull more rank") {
    val edges = Seq[(Long, Long, Long)](
      (1, 2, 9), (1, 3, 1), (2, 1, 1), (3, 1, 1), (4, 2, 5), (4, 3, 5))
    val got = PageRank.run(edges.toDF("src", "dst", "w"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refW(edges, 10))
    assert(got(2L) > got(3L)) // 1 votes 9:1 for 2 over 3
  }

  test("weighted with all-equal weights equals the unweighted result") {
    val pairs = Seq[(Long, Long)]((1, 2), (2, 3), (3, 1), (3, 4), (5, 4))
    val w = PageRank.run(pairs.map(p => (p._1, p._2, 7L)).toDF("src", "dst", "w"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val u = PageRank.run(pairs.toDF("src", "dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(w == u)
  }

  test("empty edge set returns an empty ranking, not an error") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(PageRank.run(empty).collect().isEmpty)
    // a graph of only self-loops is empty after cleanup
    assert(PageRank.run(Seq((3L, 3L)).toDF("src", "dst")).collect().isEmpty)
  }

  test("bad configs are rejected") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException] { PageRank.run(e, iterations = -1) }
    intercept[IllegalArgumentException] { PageRank.run(e, dampNum = 101) }
  }

  test("a non-numeric third column is rejected, not silently cast") {
    val e = Seq((1L, 2L, "metadata")).toDF("src", "dst", "note")
    intercept[IllegalArgumentException] { PageRank.run(e) }
  }

  test("weighted: zero/negative-weight edges are dropped entirely") {
    val got = PageRank.run(
      Seq((1L, 2L, 1L), (2L, 3L, 0L), (8L, 9L, -5L)).toDF("src", "dst", "w"))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L)) // 3, 8, 9 never appear via dead edges
  }
}
