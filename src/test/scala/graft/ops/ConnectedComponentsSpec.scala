package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(edges: Seq[(Long, Long)], maxIter: Int = 20) =
    ConnectedComponents.run(edges.toDF("u", "v"), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain collapses to the min id (transitive closure)") {
    // 5-4-3-2-1: only adjacent pairs are edges, but all share a cluster
    val out = labelsOf(Seq((4L, 5L), (3L, 4L), (2L, 3L), (1L, 2L)))
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("separate components keep separate labels; cycles converge") {
    val out = labelsOf(Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), // triangle
      (10L, 11L),                   // pair
      (20L, 21L), (21L, 22L), (20L, 22L)))
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L)
    assert(out(10L) == 10L && out(11L) == 10L)
    assert(out(20L) == 20L && out(21L) == 20L && out(22L) == 20L)
  }

  test("empty edge set yields empty labels") {
    assert(labelsOf(Seq.empty).isEmpty)
  }

  test("random graphs agree with a reference union-find") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val nVerts = 40 + trial * 30
      val edges = Seq.fill(nVerts) {
        (rnd.nextInt(nVerts).toLong, rnd.nextInt(nVerts).toLong)
      }.filter { case (a, b) => a != b }
      // reference: plain union-find over the same edges
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(v => v -> find(v)).toMap
      val got = labelsOf(edges)
      assert(got == expected, s"trial $trial: $got vs $expected")
    }
  }

  test("large-star/small-star agrees with min-label and union-find") {
    val rnd = new scala.util.Random(7)
    // long path: the case where min-label needs diameter rounds and the
    // star algorithm must contract in O(log²)
    val path = (1L until 30L).map(i => (i, i + 1))
    val pathStars = ConnectedComponents.runStars(path.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pathStars == (1L to 30L).map(_ -> 1L).toMap)
    // random graphs: equivalence with the propagation implementation
    for (trial <- 0 until 2) {
      val n = 50 + trial * 40
      val edges = Seq.fill(n) {
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      val viaStars = ConnectedComponents.runStars(edges.toDF("u", "v"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaStars == labelsOf(edges), s"trial $trial")
    }
  }

  test("ids near Long.MaxValue converge (checksum cannot overflow)") {
    // a raw sum(label) convergence check overflows immediately here —
    // two Long.MaxValue-adjacent labels already exceed the long range;
    // the (count, bit_xor) checksum must converge to the right clusters
    val m = Long.MaxValue
    val out = labelsOf(Seq(
      (m, m - 1), (m - 1, m - 2),       // chain at the very top of the range
      (m - 10, m - 11),                 // separate pair, also huge
      (1L, m - 20)))                    // huge joined with tiny
    assert(out(m) == m - 2 && out(m - 1) == m - 2 && out(m - 2) == m - 2)
    assert(out(m - 10) == m - 11 && out(m - 11) == m - 11)
    assert(out(1L) == 1L && out(m - 20) == 1L)
  }

  test("incremental fold equals full recompute, including cluster merges") {
    // standing labeling: {1,2,3} -> 1, {10,11} -> 10, singleton 20
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L),
      (20L, 20L)).toDF("doc_id", "cluster_id")
    // delta: 30-31 is a brand-new pair; 3-10 BRIDGES the two standing
    // clusters (the hard case: both must relabel to the global min 1);
    // 40 attaches to the singleton 20
    val delta = Seq((30L, 31L), (3L, 10L), (40L, 20L)).toDF("id_a", "id_b")
    val got = ConnectedComponents.incremental(labels, delta)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = labelsOf(Seq( // the same graph from scratch
      (1L, 2L), (2L, 3L), (10L, 11L), (30L, 31L), (3L, 10L), (40L, 20L)))
    assert(got == full, s"incremental $got != full $full")
    assert(got(10L) == 1L && got(11L) == 1L, "bridged cluster must relabel")
    assert(got(30L) == 30L && got(31L) == 30L)
    assert(got(40L) == 20L && got(20L) == 20L)
    assert(got.size == 9)
  }

  test("incremental ≡ full recompute on randomized graphs and splits") {
    // 12 seeded trials: random graph, random old/new edge split — the
    // star-fold identity must hold for every shape (chains, merges,
    // isolated vertices, new-vertex-only edges).
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 12) {
      val nV = 8 + rnd.nextInt(20)
      val nE = 5 + rnd.nextInt(25)
      val edges = Seq.fill(nE)((rnd.nextInt(nV).toLong, rnd.nextInt(nV).toLong))
        .filter { case (a, b) => a != b }
      if (edges.nonEmpty) {
        val (oldE, newE) = edges.partition(_ => rnd.nextBoolean())
        val full = labelsOf(edges)
        val oldLabels =
          if (oldE.isEmpty) Map.empty[Long, Long] else labelsOf(oldE)
        // universe: every vertex the old graph knew, labeled; plus any
        // vertex only the delta mentions enters through the edges
        val labelRows = (0L until nV.toLong).map(v =>
          (v, oldLabels.getOrElse(v, v)))
        val got = ConnectedComponents.incremental(
            labelRows.toDF("doc_id", "cluster_id"),
            newE.toDF("id_a", "id_b"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        // full recompute only labels vertices that appear in edges;
        // the incremental result labels the whole universe
        val expected = (0L until nV.toLong).map(v =>
          v -> full.getOrElse(v, v)).toMap
        assert(got == expected, s"trial $trial: $got != $expected " +
          s"(old=$oldE new=$newE)")
      }
    }
  }

  test("incremental fold is delta-localized: untouched clusters never enter it") {
    // standing labeling: A={1,2,3}, B={10,11}, C={20,21,22}, singletons
    // 30 and 40; the delta touches ONLY cluster B (edge 10-50) and the
    // two singletons (30-40) — A and C must pass through the fold
    // untouched, and the fold input must be bounded by the affected
    // neighborhood, not the full label set
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L),
      (20L, 20L), (21L, 20L), (22L, 20L), (30L, 30L), (40L, 40L))
      .toDF("doc_id", "cluster_id")
    val delta = Seq((10L, 50L), (30L, 40L)).toDF("id_a", "id_b")
    val (affected, untouched, _) =
      ConnectedComponents.affectedSplit(labels, delta)
    val aff = affected.collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    // exactly clusters B, {30}, {40} — 4 label rows of 10, never A or C
    assert(aff == Set(10L -> 10L, 11L -> 10L, 30L -> 30L, 40L -> 40L),
      s"affected neighborhood wrong: $aff")
    val unt = untouched.collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(unt == Set(1L -> 1L, 2L -> 1L, 3L -> 1L,
      20L -> 20L, 21L -> 20L, 22L -> 20L), s"untouched set wrong: $unt")
    // and the localized fold still equals the full recompute
    val got = ConnectedComponents.incremental(labels, delta)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = labelsOf(Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L),
      (21L, 22L), (10L, 50L), (30L, 40L)))
    assert(got == full, s"localized incremental $got != $full")
  }

  test("incremental handles a delta endpoint that is only a cluster id") {
    // Degenerate labeling: vertex 10 carries cluster id 3, but 3 has no
    // self-row (a proper labeling would include (3,3) — the batch fold
    // this operator replaced tolerated the omission). The delta edge
    // (2,3) touches cluster 3 through its ID only; if the touched probe
    // matched member doc_ids alone, 10 would pass through "untouched"
    // still labeled 3 while vertex 3 itself moved to 2 — an internally
    // inconsistent labeling. Cluster 3 must fold, relabeling all of
    // {2, 3, 10} to 2 exactly as a full recompute would.
    val labels = Seq((10L, 3L)).toDF("doc_id", "cluster_id")
    val delta = Seq((2L, 3L)).toDF("id_a", "id_b")
    val got = ConnectedComponents.incremental(labels, delta)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 2L, 3L -> 2L, 10L -> 2L),
      s"degenerate labeling mishandled: $got")
    // untouched clusters still pass through: an unrelated proper
    // cluster and a singleton survive verbatim alongside the fix
    val labels2 = Seq((10L, 3L), (20L, 20L), (21L, 20L), (30L, 30L))
      .toDF("doc_id", "cluster_id")
    val got2 = ConnectedComponents.incremental(labels2, delta)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == Map(2L -> 2L, 3L -> 2L, 10L -> 2L,
      20L -> 20L, 21L -> 20L, 30L -> 30L), s"mixed case wrong: $got2")
  }

  test("incremental with an empty delta returns the labeling unchanged") {
    val labels = Seq((1L, 1L), (2L, 1L), (7L, 7L)).toDF("doc_id", "cluster_id")
    val got = ConnectedComponents.incremental(labels,
        Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 7L -> 7L))
  }

  test("non-convergence within maxIter throws instead of returning junk") {
    // a 6-chain needs ~5 propagation rounds; 1 round must fail loudly
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    intercept[IllegalStateException](labelsOf(e, maxIter = 1))
  }
}
