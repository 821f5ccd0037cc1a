package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components by iterative min-label propagation —
  * the clustering step a dedup pipeline runs after near-dup pair
  * generation (MinHash/SimHash/embedding pairs → duplicate GROUPS, so one
  * survivor per cluster can be kept even when similarity is only
  * transitive: a~b, b~c, a≁c).
  *
  * Each round every vertex takes the min label among itself and its
  * neighbors; convergence is detected by the (strictly decreasing) sum of
  * labels going flat — one cheap aggregate per round, no row-level driver
  * work. Near-dup clusters have tiny diameter (duplicates of one source
  * document), so rounds ≈ 3-5 in practice; `maxIter` bounds adversarial
  * chains. Every round is two hash-shuffles (join + groupBy) on the
  * vertex id; the previous round's cache is dropped as soon as the next
  * materializes. For graphs with genuinely long chains at 100 TB, the
  * escalation is the large-star/small-star variant (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond"), which converges in
  * O(log²) rounds with the same per-round shuffle shape.
  */
object ConnectedComponents {

  /** `edges` must have two columns (u, v); vertices are whatever appears
    * in an edge. Returns (id, label) with label = min vertex id of the
    * component. Throws if `maxIter` rounds don't converge. */
  def run(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val u = col(edges.columns(0))
    val v = col(edges.columns(1))
    // both orientations from ONE pass over the (possibly expensive) edge
    // plan — a union of two selects would compute it twice
    val adj = edges
      .select(explode(array(
        struct(u.as("src"), v.as("dst")),
        struct(v.as("src"), u.as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // init fuses the first propagation round: label = min(self, neighbors).
    // Each round's plan references the previous labels TWICE (neighbor
    // join + merge join), so without lineage truncation the logical plan
    // doubles per round — exponential analysis cost by round ~15. The
    // localCheckpoint keeps the per-round plan flat and the data cached;
    // LAZY, so the round's convergence checksum materializes it — an
    // eager checkpoint would spend a second whole job (and its driver
    // scheduling roundtrip) per round on the same computation.
    var labels = adj.groupBy("src").agg(min("dst").as("nmin"))
      .select(col("src").as("id"), least(col("src"), col("nmin")).as("label"))
      .localCheckpoint(false)
    // order-independent label-assignment fingerprint: (count, xor of
    // (id,label) hashes) — the same overflow-safe checksum runStars uses.
    // A raw sum(label) would overflow with 64-bit ids at corpus scale
    // (throws under ANSI mode, or wraps and could in principle flat-line
    // early); xor cannot overflow, and the count guards the
    // (already astronomical) xor-collision case.
    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        bit_xor(xxhash64(col("id"), col("label")))).head
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var prev = checksum(labels)
    var iter = 0
    var done = false
    while (!done) {
      if (iter >= maxIter)
        throw new IllegalStateException(
          s"connected components did not converge in $maxIter rounds")
      val nbrMin = adj.join(labels, adj("dst") === labels("id"))
        .groupBy(col("src")).agg(min("label").as("nbr_min"))
      val next = labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_min"), col("label")))
            .as("label"))
        .localCheckpoint(false) // materialized by this round's checksum
      val s = checksum(next)
      labels = next
      done = s == prev // labels only decrease; flat assignment == fixpoint
      prev = s
      iter += 1
    }
    adj.unpersist()
    labels
  }

  /** Incremental maintenance: fold NEW edges into an existing labeling
    * without re-deriving (or even touching) the historical edge set —
    * the clustering step of the streaming admission lifecycle, where
    * yesterday's corpus is clustered once and only each delta batch's
    * pairs arrive as new work.
    *
    * `labels` is (vertex, cluster_id) — one row per known vertex,
    * cluster_id = the component's min id (singletons label themselves).
    * `newEdges` is the delta pair set and may reference both known and
    * brand-new vertices.
    *
    * Correctness: a labeling is connectivity-equivalent to its STAR
    * graph (member → label), so CC(star(labels) ∪ newEdges) =
    * CC(oldEdges ∪ newEdges); min ids survive the star encoding, so
    * the result is IDENTICAL to a full recompute — the identity the
    * `m8_dedup_clusters_incremental` gate hash-verifies. Stars have
    * diameter 2, so propagation converges in ~2-3 rounds no matter how
    * long the original chains were.
    *
    * DELTA-LOCALIZED: a standing cluster can only change if a delta
    * edge touches one of its members, so the star fold runs over the
    * AFFECTED neighborhood only — labels whose cluster contains a
    * delta-edge endpoint — and every untouched label row passes
    * through unchanged (never even shuffled into the fold). Per-batch
    * cost is O(affected clusters + delta), not O(all labels): the term
    * that keeps a ledger maintained over thousands of admission
    * batches flat in corpus lifetime. The localization is exact, not
    * heuristic — a component with no delta endpoint cannot gain or
    * lose a member, and a component that merges must contain one. */
  def incremental(labels: DataFrame, newEdges: DataFrame): DataFrame = {
    val (affected, untouched, e) = affectedSplit(labels, newEdges)
    val star = affected.select(col("doc_id").as("u"), col("cluster_id").as("v"))
      .filter(col("u") =!= col("v"))
    val cc = run(star.unionByName(e))
    // fold universe: affected members plus any brand-new vertex the
    // delta introduced (a vertex in neither set keeps its untouched row)
    val universe = affected.select(col("doc_id"))
      .unionByName(e.select(col("u").as("doc_id")))
      .unionByName(e.select(col("v").as("doc_id")))
      .distinct()
    val folded = universe
      .join(cc.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .join(affected.select(col("doc_id"), col("cluster_id").as("_old_cluster")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("_old_cluster"), col("doc_id"))
          .as("cluster_id"))
    untouched.unionByName(folded)
  }

  /** The delta-localization split behind [[incremental]]: labels whose
    * cluster a delta-edge endpoint belongs to (`affected` — the ONLY
    * rows the star fold reads), the rest verbatim (`untouched`), and
    * the normalized delta edges. Exposed for the spec that pins the
    * fold-input bound ≤ affected-neighborhood size. Both endpoints'
    * frames are eagerly localCheckpointed: they are delta-sized, read
    * several times by the fold's iterations, and truncating their
    * lineage keeps the per-batch plan flat. */
  private[graft] def affectedSplit(labels: DataFrame, newEdges: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val lid = col(labels.columns(0))
    val lcl = col(labels.columns(1))
    val l = labels.select(lid.as("doc_id"), lcl.as("cluster_id"))
    // LAZY checkpoints throughout the split: the fold's first action
    // materializes the whole delta-sized chain in one job instead of
    // one eager-checkpoint job (plus driver roundtrip) per frame
    val e = newEdges.select(col(newEdges.columns(0)).as("u"),
      col(newEdges.columns(1)).as("v")).localCheckpoint(false)
    val endpoints = e.select(col("u").as("doc_id"))
      .unionByName(e.select(col("v").as("doc_id"))).distinct()
    // clusters holding a delta endpoint — delta-sized, so the two joins
    // against the (large) label set broadcast it; AQE picks that up
    // from the runtime size without a hint that would misfire on a
    // genuinely huge delta. A delta endpoint can also appear ONLY as a
    // cluster id (a labeling missing the representative's self-row —
    // degenerate, but the pre-localization fold accepted it): that
    // cluster is touched too, or its members would keep the dead id
    // while the endpoint itself gets relabeled. Second equi-semi-join,
    // not one OR-condition join — the OR shape would plan as a
    // nested-loop join, O(|labels| × |delta|) comparisons.
    val touched = l.join(endpoints, Seq("doc_id"), "left_semi")
      .select(col("cluster_id"))
      .unionByName(
        l.join(endpoints.select(col("doc_id").as("cluster_id")),
            Seq("cluster_id"), "left_semi")
          .select(col("cluster_id")))
      .distinct().localCheckpoint(false)
    val affected = l.join(touched, Seq("cluster_id"), "left_semi")
      .select(col("doc_id"), col("cluster_id"))
    val untouched = l.join(touched, Seq("cluster_id"), "left_anti")
      .select(col("doc_id"), col("cluster_id"))
    (affected, untouched, e)
  }

  /** Alternating large-star/small-star connected components (Kiveris et
    * al., "Connected Components in MapReduce and Beyond") — the
    * escalation path for graphs with LONG chains, where plain min-label
    * propagation needs diameter rounds: star operations contract paths
    * aggressively, converging in O(log²) rounds regardless of diameter.
    *
    * Per round: two grouped aggregations (two key-shuffles each), edge
    * set re-checkpointed to keep the plan flat. Convergence = the edge
    * multiset stable, detected by an order-independent checksum (sum of
    * per-edge hashes) going flat two rounds running — with both checks
    * inside the star rounds there is no extra pass. At convergence every
    * edge is (node → component-min root), which is returned as
    * (id, label) including the roots themselves. */
  def runStars(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val u = col(edges.columns(0))
    val v = col(edges.columns(1))
    var e = edges.select(u.as("a"), v.as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("hi"),
        least(col("a"), col("b")).as("lo"))
      .distinct()
      .localCheckpoint(false) // materialized by the first checksum
    // order-independent edge-set fingerprint: (count, xor of edge hashes)
    // — xor can't overflow under ANSI arithmetic, and the count guards
    // the (already astronomical) xor-collision case
    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        bit_xor(xxhash64(col("hi"), col("lo")))).head
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    // large-star: every neighbor larger than u links to u's min;
    // small-star: every lower neighbor of u (and u itself) links to u's
    // min. Both are a grouped min + a join back to the edges — never a
    // per-node collect_set, so a crawl-scale hub node costs a shuffle,
    // not an executor OOM.
    def largeStar(df: DataFrame): DataFrame = {
      val sym = df.select(explode(array(
        struct(col("hi").as("u"), col("lo").as("n")),
        struct(col("lo").as("u"), col("hi").as("n")))).as("e"))
        .select(col("e.u").as("u"), col("e.n").as("n"))
      val mins = sym.groupBy("u").agg(min(least(col("n"), col("u"))).as("m"))
      sym.join(mins, Seq("u"))
        .filter(col("n") > col("u") && col("n") =!= col("m"))
        .select(col("n").as("hi"), col("m").as("lo"))
        .distinct()
    }
    def smallStar(df: DataFrame): DataFrame = {
      // edges already point hi → lo (lo < hi)
      val mins = df.groupBy("hi").agg(min("lo").as("m"))
      val fromLo = df.join(mins, Seq("hi"))
        .filter(col("lo") =!= col("m"))
        .select(col("lo").as("hi"), col("m").as("lo"))
      val fromHi = mins.select(col("hi"), col("m").as("lo"))
      fromLo.unionByName(fromHi).distinct()
    }
    var prev = checksum(e)
    var stable = 0
    var iter = 0
    while (stable < 2) {
      if (iter >= maxIter)
        throw new IllegalStateException(
          s"large/small-star did not converge in $maxIter rounds")
      e = smallStar(largeStar(e)).localCheckpoint(false)
      val s = checksum(e)
      stable = if (s == prev) stable + 1 else 0
      prev = s
      iter += 1
    }
    val members = e.select(col("hi").as("id"), col("lo").as("label"))
    val roots = e.select(col("lo").as("id")).distinct()
      .withColumn("label", col("id"))
    members.unionByName(roots).distinct()
  }
}
