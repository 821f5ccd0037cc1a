package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFns
import graft.plans.GraftOps

/** Approximate-nearest-neighbor search over an embedding column
  * (north-star scope, SURVEY.md §7.1 M8).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: broadcast the (small) query set against all
  *    candidates — exact, one pass over the corpus, no shuffle of the
  *    corpus itself. The right baseline whenever |queries| is modest.
  *  - [[lshTopK]]: hyperplane-LSH bucket join — at 100 TB the corpus is
  *    bucketed once (8-16 bits → 256-65k buckets) and each query probes
  *    only its bucket, trading recall for a ~2^bits fan-in reduction.
  *
  * Both paths cut to k via the [[graft.plans.TopKPerKey]] operator
  * (bounded heap, partial top-k before the exchange) instead of a
  * `row_number` window: the window formulation fully sorts every
  * query's candidate list and shuffles all of it; the heap keeps the
  * exchange at ≤ k rows per query per task. The residual rank window
  * below runs over at most k rows per query.
  */
object Similarity {

  /** Rank the already-cut top-k rows (≤ k per query) deterministically. */
  private def ranked(cut: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    cut.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "cand_id", "cosine")
  }

  /** Exact cosine top-k: every query against every candidate, ranked per
    * query with a deterministic id tiebreak. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val c = candidates.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cosine", VectorFns.cosine(col("qv"), col("cv")))
    ranked(GraftOps.topKPerKey(scored, Seq(col("query_id")),
      Seq(col("cosine").desc, col("cand_id")), k), k)
  }

  /** LSH-bucketed approximate top-k: queries only meet candidates in the
    * same hyperplane bucket. Recall < 1, cost ~ corpus/2^planes per query.
    * `portable = true` derives the hyperplanes from md5 instead of
    * xxhash64 so any engine (the correctness oracle) can rebuild the
    * buckets exactly; xxhash64 stays the scale-path default.
    *
    * Hot-bucket bound: a degenerate embedding cluster puts n candidates
    * in one bucket, and every query probing it pays n cosines.
    * `maxBucket` caps candidate fan-in per bucket PER TASK with a
    * map-side TopKPerKey on a deterministic draw — shuffle-free, so the
    * corpus still rides the broadcast join in place; a hot bucket costs
    * ≤ maxBucket×tasks candidates instead of n. */
  def lshTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              planes: Int = 8, portable: Boolean = false,
              maxBucket: Int = 65536): DataFrame = {
    def bucket(v: Column) =
      if (portable) VectorFns.hyperplane_bucket_portable(v, planes)
      else VectorFns.hyperplane_bucket(v, planes)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"),
      bucket(col("embedding")).as("bucket"))
    val c0 = candidates.select(col("vec_id").as("cand_id"), col("embedding").as("cv"),
      bucket(col("embedding")).as("bucket"))
    val draw =
      if (portable) md5(col("cand_id").cast("string"))
      else xxhash64(col("cand_id"))
    val c =
      if (maxBucket == Int.MaxValue) c0
      else GraftOps.capPerKeyLocal(
        c0.withColumn("_draw", draw),
        Seq(col("bucket")), Seq(col("_draw"), col("cand_id")), maxBucket)
        .drop("_draw")
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cosine", VectorFns.cosine(col("qv"), col("cv")))
    ranked(GraftOps.topKPerKey(scored, Seq(col("query_id")),
      Seq(col("cosine").desc, col("cand_id")), k), k)
  }

  /** Per-group embedding centroids — the k-means M-step (and the training
    * step an IVF coarse quantizer iterates): mean vector per group,
    * computed component-wise. Returns one row per (group, dimension) —
    * `(grp, pos, n, centroid)` — the shape downstream joins consume
    * without re-assembling arrays.
    *
    * Determinism at scale: double summation is shuffle-order-dependent,
    * so the accumulation is FIXED-POINT — each component is quantized to
    * an integer number of 1e-6 units (exact long arithmetic, order-free),
    * divided back out once at the end. The result is bit-identical on any
    * cluster topology (and engine-reproducible, so the oracle can verify
    * it). Quantization error is bounded by 5e-7 per element — noise
    * relative to any embedding model's own precision.
    *
    * Shape: posexplode (×dim) → one groupBy (grp, pos) with map-side
    * partial sums — the shuffle carries two longs per (grp, pos) per
    * map task, never the vectors. */
  def groupCentroids(vecs: DataFrame, grp: Column, vec: Column): DataFrame =
    vecs.select(grp.as("grp"), posexplode(vec))
      .groupBy("grp", "pos")
      .agg(
        sum(round(col("col").cast("double") * 1e6).cast("long")).as("q"),
        count(lit(1)).as("n"))
      .select(col("grp"), col("pos"), col("n"),
        (col("q").cast("double") / 1e6 / col("n").cast("double"))
          .as("centroid"))

  /** SEMANTIC decontamination screen: flag every corpus vector whose
    * max cosine against a held-out benchmark set reaches `tau` — the
    * embedding-space complement of the n-gram `decontaminate` (surface
    * overlap misses paraphrased eval leakage; cosine catches it).
    *
    * Scale shape — the one that survives a 100 TB corpus: the benchmark
    * is eval-set-sized (thousands of vectors, never corpus-sized), so it
    * is packed into a SINGLE broadcast row of (bid, bv) structs and the
    * screen becomes a pure map over the corpus — `aggregate` folds the
    * benchmark array per corpus row, keeping the max cosine as it goes.
    * No corpus shuffle, no pair materialization, no groupBy: the only
    * exchange in the plan is the one-row benchmark aggregate. max() is
    * order-insensitive, so the non-deterministic collect_list order
    * cannot leak into the result.
    *
    * The flag compares on the ROUNDED cosine (6 dp) so engine/oracle
    * float drift (~1e-12 on the sequential fold) can never straddle the
    * threshold; callers pick `tau` away from the rounded grid edge. */
  def screenAgainst(corpus: DataFrame, bench: DataFrame, tau: Double): DataFrame = {
    val b = bench.agg(collect_list(struct(
      col("vec_id").as("bid"), col("embedding").as("bv"))).as("bset"))
    val maxCos = aggregate(col("bset"), lit(-1.0d),
      (acc, x) => greatest(acc, VectorFns.cosine(col("embedding"),
        x.getField("bv"))))
    corpus.crossJoin(broadcast(b))
      .select(col("vec_id"), round(maxCos, 6).as("max_cosine"))
      .withColumn("contaminated", col("max_cosine") >= tau)
  }

  /** Recall@k of an approximate top-k result against the exact one — the
    * eval harness an ANN index ships with. Both inputs are
    * (query_id, rank, cand_id, …) frames as produced by the top-k
    * operators here. Per query: |approx ∩ exact| / |exact|.
    *
    * Shape: a semi-join on (query_id, cand_id) plus three per-query
    * counts — every grouping keys on query_id, so the eval costs one
    * shuffle of rank-list-sized data regardless of corpus size. */
  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val a = approx.select(col("query_id"), col("cand_id"))
    val e = exact.select(col("query_id"), col("cand_id"))
    val nE = e.groupBy("query_id").agg(count(lit(1)).as("n_exact"))
    val nA = a.groupBy("query_id").agg(count(lit(1)).as("n_approx"))
    val hits = e.join(a, Seq("query_id", "cand_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    nE.join(nA, Seq("query_id"), "left")
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_exact"),
        coalesce(col("n_approx"), lit(0L)).as("n_approx"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") /
          col("n_exact").cast("double")).as("recall"))
  }

  /** One-row packed centroid set `array<struct<cent_id, cvec>>`,
    * sorted ascending by cent_id — the broadcast shape the fused
    * nearest-centroid kernels scan ([[VectorFns.nearest_centroid_cos]]).
    * `array_sort` over the (cent_id, cvec) structs orders by the first
    * field (ids are unique), so collect_list's arrival order cannot
    * leak into the deterministic tie-break. */
  private def packCentroids(cent: DataFrame): DataFrame =
    cent.agg(array_sort(collect_list(struct(
      col("cent_id").cast("long").as("cent_id"), col("cvec")))).as("cset"))

  /** Nearest-centroid assignment (the k-means E-step): each candidate row
    * `(cand_id, cv)` paired with its single best centroid from the
    * packed broadcast centroid set. Ties break on the smaller cent_id,
    * so assignment is deterministic and oracle-reproducible.
    *
    * PURE MAP (round 19): previously `crossJoin(broadcast(cent)) →
    * cosine → TopKPerKey top-1`, which materialized one tuple per
    * (vector, centroid) AND exchanged one row per candidate for the
    * final cut — a corpus-sized shuffle per E-step/encode that no
    * downstream consumer's partitioning ever reused (guide §2.4). The
    * fused kernel picks the identical winner (same doubles, same null
    * ordering, same cent_id tie-break — NearestCentroidSpec pins it
    * against the fanout formulation) with zero fanout and zero
    * exchange. The size guard replays the old empty-centroid-set
    * behavior (a crossJoin against an empty broadcast produced no
    * rows). */
  def ivfAssign(c: DataFrame, cent: DataFrame): DataFrame =
    c.crossJoin(broadcast(packCentroids(cent)))
      .filter(size(col("cset")) > 0)
      .select(col("cand_id"), col("cv"),
        VectorFns.nearest_centroid_cos(col("cv"), col("cset"))
          .getField("cent_id").as("cent_id"))

  /** [[ivfAssign]] KEEPING the winning assignment similarity (`csim`) —
    * the drift monitor's input: `mean(1 − csim)` over a batch is the
    * residual-to-assigned-centroid statistic
    * [[graft.streaming.AnnIndex]]'s refresh policy watches. A separate
    * method (not an extra column on [[ivfAssign]]) so the hot encode
    * path's plan — and every audited shape built on it — stays
    * byte-identical when no one is monitoring. */
  private[graft] def ivfAssignSim(c: DataFrame, cent: DataFrame): DataFrame =
    c.crossJoin(broadcast(packCentroids(cent)))
      .filter(size(col("cset")) > 0)
      .withColumn("__best",
        VectorFns.nearest_centroid_cos(col("cv"), col("cset")))
      .select(col("cand_id"), col("cv"),
        col("__best").getField("cent_id").as("cent_id"),
        col("__best").getField("score").as("csim"))

  /** Re-assemble [[groupCentroids]]' per-dimension rows into centroid
    * arrays `(cent_id, cvec)`. `array_sort` over the (pos, centroid)
    * structs pins component order deterministically regardless of
    * `collect_list`'s arrival order; a centroid is ≤ a few hundred
    * doubles, so the per-group collect is trivially bounded. */
  private def assembleCentroids(perDim: DataFrame): DataFrame =
    perDim.groupBy(col("grp"))
      .agg(array_sort(collect_list(struct(col("pos"), col("centroid")))).as("pc"))
      .select(col("grp").as("cent_id"),
        transform(col("pc"), p => p.getField("centroid")).as("cvec"))

  /** Lloyd-trained IVF coarse quantizer: `nlist` deterministic seeds (the
    * corpus vectors with the smallest md5(vec_id)) refined by `iters`
    * k-means iterations — E-step = [[ivfAssign]] (broadcast compare,
    * top-1 per vector), M-step = [[groupCentroids]] (fixed-point sums,
    * order-free) reassembled per list. Raw sampled seeds land on random
    * points, so list sizes skew badly on clustered real embeddings;
    * one or two Lloyd rounds move the centroids to the cluster modes and
    * even out the inverted lists. Every step is exact-arithmetic or
    * deterministically tie-broken, so the trained centroids are
    * bit-identical on any cluster topology (and engine-reproducible).
    * A list that captures no vectors in an E-step drops out — nlist is
    * an upper bound after training, as in any k-means.
    *
    * At 100 TB, train on a sample, not the corpus: pass e.g.
    * `Sampling.hashSample(corpus, col("vec_id"), 1e-4, "ivf")` as
    * `candidates` here and assign the full corpus with [[ivfAssign]] —
    * the E-step cost then scales with the sample while staying fully
    * deterministic (hash-threshold draw, no RNG). */
  def trainIvfCentroids(candidates: DataFrame, nlist: Int, iters: Int): DataFrame = {
    val seeds = candidates
      .orderBy(md5(col("vec_id").cast("string")))
      .limit(nlist)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cvec"))
    val c = candidates.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    (1 to iters).foldLeft(seeds) { (cent, _) =>
      assembleCentroids(groupCentroids(ivfAssign(c, cent),
        col("cent_id"), col("cv")))
    }
  }

  /** IVF (inverted-file) approximate top-k — the coarse-quantizer scale
    * path: `nlist` centroids ([[trainIvfCentroids]] — md5-sampled seeds
    * plus `lloydIters` deterministic k-means rounds), each corpus vector
    * assigned to its nearest centroid's list, each query probing only its
    * `nprobe` nearest lists.
    *
    * Plan shape at 100 TB: centroids broadcast (nlist rows, persisted so
    * the training chain runs once, not per consumer); assignment is a
    * broadcast compare + partial top-1 per vector — the exchange carries
    * one (vector, list) row per corpus vector, nothing wider; probes are
    * tiny and broadcast into the list join, so the corpus is never
    * shuffled again; the final cut is the TopKPerKey partial/final pair.
    * Training costs `lloydIters` extra broadcast passes over the corpus
    * (no new plan shape). Cost per query ≈ corpus × nprobe / nlist
    * candidates vs the brute-force corpus scan. Ties everywhere break on
    * the smaller id, so results are deterministic and oracle-comparable. */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4, lloydIters: Int = 2): DataFrame = {
    val cent0 = trainIvfCentroids(candidates, nlist, lloydIters)
    // nlist rows; materialize once (eager localCheckpoint) so final
    // assignment + probes don't each replay the training passes over the
    // corpus — and nothing stays pinned in the cache after the query
    // returns (a persist() here would leak a cached relation per call in
    // a long-lived session)
    val cent = if (lloydIters > 0) cent0.localCheckpoint(true) else cent0
    val c = candidates.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    val assigned = ivfAssign(c, cent)
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val probes = GraftOps.topKPerKey(
      q.crossJoin(broadcast(cent))
        .withColumn("qsim", VectorFns.cosine(col("qv"), col("cvec"))),
      Seq(col("query_id")), Seq(col("qsim").desc, col("cent_id")), nprobe)
      .select("query_id", "qv", "cent_id")
    val scored = assigned.join(broadcast(probes), Seq("cent_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cosine", VectorFns.cosine(col("qv"), col("cv")))
    ranked(GraftOps.topKPerKey(scored, Seq(col("query_id")),
      Seq(col("cosine").desc, col("cand_id")), k), k)
  }

  /** IVF with int8-quantized inverted lists — the 100 TB memory story:
    * the lists store [[VectorFns.quantize_i8]] codes (4× smaller than
    * float32), queries score against the CODES (for cosine the per-vector
    * scale cancels, so no dequantization is even needed), and only a
    * `rescoreK`-deep shortlist per query is exact-rescored against the
    * float corpus. Compared to [[ivfTopK]] the probe join moves int8
    * arrays instead of floats and the float vectors are touched for
    * exactly `|queries| × rescoreK` rows — fetched through a broadcast
    * semi-structured lookup, so the corpus is never shuffled.
    *
    * Every step is deterministic (floor-quantization is IEEE-portable,
    * ties break on ids), so the oracle replays training, quantization,
    * code-scoring, the shortlist cut, and the rescore exactly. Recall vs
    * the float path is gated by its own recall query. */
  def ivfTopKQuantized(queries: DataFrame, candidates: DataFrame, k: Int,
                       nlist: Int = 16, nprobe: Int = 4,
                       lloydIters: Int = 2, rescoreK: Int = 15): DataFrame = {
    val (cent, lists) = ivfBuildQuantized(candidates, nlist, lloydIters)
    ivfServeQuantized(queries, cent, lists, candidates, k, nprobe, rescoreK)
  }

  /** The BUILD stage of the quantized IVF index, split out so the index
    * can be persisted as a lake layout and served later: the trained
    * coarse quantizer (`(cent_id, cvec)`, nlist rows) and the
    * int8-coded inverted lists (`(cand_id, cent_id, code)` — no float
    * payload). Both frames are plain parquet-writable; the store/serve
    * round trip is lossless (ints and exact doubles only), which the
    * `m8_ann_index_store` gate certifies. */
  def ivfBuildQuantized(candidates: DataFrame, nlist: Int = 16,
                        lloydIters: Int = 2): (DataFrame, DataFrame) = {
    val cent0 = trainIvfCentroids(candidates, nlist, lloydIters)
    val cent = if (lloydIters > 0) cent0.localCheckpoint(true) else cent0
    val c = candidates.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    val lists = ivfAssign(c, cent)
      .withColumn("scale", VectorFns.quantize_scale(col("cv")))
      .withColumn("code", VectorFns.quantize_i8(col("cv"), col("scale")))
      .select("cand_id", "cent_id", "code")
    (cent, lists)
  }

  /** Pick the probe budget from the TRAINED index itself — the
    * derivation half of the nprobe knob that `m8_ann_sweep` only
    * measures (the `chooseBands`/`choosePlanes` precedent applied to
    * serving): the smallest nprobe whose PREDICTED coverage — the share
    * of indexed vectors living in the nprobe most-populated inverted
    * lists, the upper bound on what any single query's probe set can
    * reach — meets `targetBp` basis points of the corpus. A skewed
    * assignment histogram (most mass in few lists) thus derives a small
    * budget; an even one derives proportionally more probes — the knob
    * tracks the quantizer's actual shape instead of a folklore
    * constant.
    *
    * All-integer comparison (`cum × 10000 ≥ targetBp × total`) with
    * (size desc, cent_id) tie order, so an independent engine
    * re-derives the identical budget — the `m8_ann_probe_tuned` gate
    * replays this in SQL. The histogram is nlist-sized (tens of rows),
    * so the collect is a config computation, not a data path. Clamped
    * to [1, maxProbe]. */
  def chooseNprobe(lists: DataFrame, targetBp: Long = 3500L,
                   maxProbe: Int = 16): Int = {
    require(targetBp > 0 && targetBp <= 10000, s"targetBp: $targetBp")
    require(maxProbe > 0, s"maxProbe: $maxProbe")
    val ordered = lists.groupBy("cent_id").agg(count(lit(1)).as("n"))
      .select(col("cent_id").cast("long"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (cid, n) => (-n, cid) }
    val total = ordered.map(_._2).sum
    require(total > 0, "chooseNprobe: empty index")
    val cums = ordered.map(_._2).scanLeft(0L)(_ + _).drop(1)
    val p = cums.indexWhere(c => c * 10000L >= targetBp * total) + 1
    math.min(math.max(p, 1), maxProbe)
  }

  /** The SERVE stage over a (possibly stored-and-reloaded) quantized
    * index: probe `nprobe` lists per query, score codes, exact-rescore
    * a `rescoreK`-deep shortlist against the float `corpus`. Identical
    * math to the fused [[ivfTopKQuantized]] — the split only moves the
    * index across a storage boundary. */
  def ivfServeQuantized(queries: DataFrame, cent: DataFrame,
                        lists: DataFrame, corpus: DataFrame, k: Int,
                        nprobe: Int = 4, rescoreK: Int = 15): DataFrame = {
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val probes = GraftOps.topKPerKey(
      q.crossJoin(broadcast(cent))
        .withColumn("qsim", VectorFns.cosine(col("qv"), col("cvec"))),
      Seq(col("query_id")), Seq(col("qsim").desc, col("cent_id")), nprobe)
      .select("query_id", "qv", "cent_id")
    val approx = lists.join(broadcast(probes), Seq("cent_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("qcos", VectorFns.cosine(col("qv"), col("code")))
    val shortlist = GraftOps.topKPerKey(approx, Seq(col("query_id")),
      Seq(col("qcos").desc, col("cand_id")), rescoreK)
      .select("query_id", "qv", "cand_id")
    // exact rescore: fetch the true float vectors for the shortlist only
    val rescored = c.join(broadcast(shortlist), Seq("cand_id"))
      .withColumn("cosine", VectorFns.cosine(col("qv"), col("cv")))
    ranked(GraftOps.topKPerKey(rescored, Seq(col("query_id")),
      Seq(col("cosine").desc, col("cand_id")), k), k)
  }

  /** Squared L2 distance in PORTABLE form: `(⟨a,a⟩ − 2⟨a,b⟩) + ⟨b,b⟩`
    * with pinned scalar association. The three inner products fold
    * sequentially exactly like DuckDB's `list_inner_product` (parity
    * proven by the cosine gates), and the fixed parenthesization makes
    * the combined double bit-identical across engines — which the plain
    * `Σ(aᵢ−bᵢ)²` fold would not be, since no SQL engine exposes the same
    * zip-subtract-square fold order. Used by every PQ step that ranks
    * on distance. */
  private[graft] def l2sqPortable(a: Column, b: Column): Column =
    (VectorFns.dot(a, a) - lit(2.0) * VectorFns.dot(a, b)) + VectorFns.dot(b, b)

  /** Subvector explosion: `(id, sub, sv)` with `sub` ∈ [0, m) and `sv`
    * the (dim/m)-wide slice — one codegen'd projection, no exchange. */
  private def subvectors(df: DataFrame, id: Column, vec: Column,
                         m: Int, dim: Int): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val w = dim / m
    df.select(id.as("id"),
      posexplode(array((0 until m).map(j => slice(vec, j * w + 1, w)): _*)))
      .select(col("id"), col("pos").as("sub"), col("col").as("sv"))
  }

  /** One packed codebook row PER SUBSPACE `(sub, cset)` — the broadcast
    * shape [[pqAssign]]'s fused argmin scans; same deterministic
    * packing as [[packCentroids]]. */
  private def packCodebooks(cb: DataFrame): DataFrame =
    cb.groupBy(col("sub"))
      .agg(array_sort(collect_list(struct(
        col("cent_id").cast("long").as("cent_id"), col("cvec")))).as("cset"))

  /** Nearest-codebook-entry assignment per (vector, subspace): min
    * portable-L2, ties on the smaller cent_id — the PQ E-step and the
    * encoder. PURE MAP over the subvector rows (round 19, same
    * rewrite as [[ivfAssign]]): the packed per-sub codebooks broadcast
    * into an equi-join on `sub` (m rows — no fanout ×ksub) and the
    * fused argmin replaces the TopKPerKey pair, deleting the
    * one-row-per-(vector, subspace) exchange the final cut paid. A sub
    * with no codebook entries drops its rows exactly as the old inner
    * fanout join did. */
  private def pqAssign(sv: DataFrame, cb: DataFrame): DataFrame =
    sv.join(broadcast(packCodebooks(cb)), Seq("sub"))
      .select(col("id"), col("sub"), col("sv"),
        VectorFns.nearest_centroid_l2(col("sv"), col("cset"))
          .getField("cent_id").as("cent_id"))

  /** Product-quantization codebooks: `ksub` centroids per subspace,
    * seeded from the `ksub` corpus vectors with the smallest
    * md5(vec_id) (sliced per subspace) and refined by `iters` Lloyd
    * rounds — E-step = [[pqAssign]], M-step = the same fixed-point
    * component mean as the IVF trainer ([[groupCentroids]]), keyed by
    * (subspace, centroid). Fully deterministic, so the oracle replays
    * training bit-for-bit. Returns `(sub, cent_id, cvec)`; like any
    * k-means, a centroid that captures no vectors in a round drops out.
    *
    * At 100 TB, train on a hash-sample (see [[trainIvfCentroids]]) —
    * the shapes are identical. */
  def trainPqCodebooks(candidates: DataFrame, m: Int, ksub: Int,
                       iters: Int, dim: Int): DataFrame = {
    val seeds = candidates
      .orderBy(md5(col("vec_id").cast("string")))
      .limit(ksub)
      .select(col("vec_id").as("cent_id"), col("embedding"))
    val cb0 = subvectors(seeds, col("cent_id"), col("embedding"), m, dim)
      .select(col("sub"), col("id").as("cent_id"), col("sv").as("cvec"))
    val c = subvectors(
      candidates.select(col("vec_id"), col("embedding")),
      col("vec_id"), col("embedding"), m, dim)
    (1 to iters).foldLeft(cb0) { (cb, _) =>
      val perDim = groupCentroids(pqAssign(c, cb),
        struct(col("sub"), col("cent_id")), col("sv"))
      perDim.groupBy(col("grp"))
        .agg(array_sort(collect_list(struct(col("pos"), col("centroid"))))
          .as("pc"))
        .select(col("grp.sub").as("sub"), col("grp.cent_id").as("cent_id"),
          transform(col("pc"), p => p.getField("centroid")).as("cvec"))
    }
  }

  /** PQ encoder: each corpus vector reduced to `m` codebook ids,
    * ordered by subspace — `dim × 4` bytes down to `m × 8` (and `m`
    * bytes once ids are dictionary-compressed at rest).
    *
    * PURE MAP (round 19, verdict item 3): previously subvector-exploded
    * ×m, fanout-joined ×ksub, top-1 cut (one exchange of m rows per
    * vector) and re-assembled with a groupBy+collect_list (a SECOND
    * m×N exchange). Now the m per-sub codebooks ride ONE broadcast row
    * as a sub→cset map and the codes array is built in place: per
    * vector, m fused argmins over the same slices the explode produced
    * — identical winners (NearestCentroidSpec), zero exchanges, row
    * volume ÷m. A sub missing from a (degenerate, empty) codebook
    * yields a null code element where the old shape dropped the row —
    * unreachable while every subspace keeps ≥1 centroid, which Lloyd
    * guarantees from non-empty seeds; the empty-codebook guard below
    * replays the old no-rows behavior exactly. */
  def pqEncode(candidates: DataFrame, cb: DataFrame,
               m: Int, dim: Int): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val w = dim / m
    val packed = packCodebooks(cb)
      .agg(map_from_entries(collect_list(struct(
        col("sub").cast("int").as("sub"), col("cset")))).as("csets"))
    candidates.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(packed))
      .filter(size(col("csets")) > 0)
      .select(col("vec_id").as("cand_id"),
        array((0 until m).map(j =>
          VectorFns.nearest_centroid_l2(
            slice(col("embedding"), j * w + 1, w),
            element_at(col("csets"), lit(j)))
            .getField("cent_id")): _*).as("codes"))
  }

  /** LUT key space: `sub * 2^32 + cent_id`. Injective while centroid
    * ids stay below 2^32 — they are corpus vec_ids here; a corpus with
    * wider ids would renumber seeds 0..ksub-1 at train time. */
  private val PqKeySpace = 1L << 32

  /** Product-quantization approximate top-k — the asymmetric-distance
    * (ADC) scan: the corpus is scored against `m`-entry CODES via a
    * per-query lookup table, and only a `rescoreK`-deep shortlist is
    * exact-rescored against the float vectors.
    *
    * The ADC distance is quantized to integer 1e-6 units AT THE LUT
    * (same fixed-point recipe as the centroid means), so the per-
    * candidate sum of `m` lookups is exact long arithmetic — order-free
    * and engine-portable; float addition order can never reorder the
    * shortlist. Ranks break ties on the smaller cand_id throughout.
    *
    * Plan shape at 100 TB: codebooks are `m × ksub` rows (broadcast);
    * the per-query LUTs (`|Q| × m × ksub` entries) pack into one map
    * column per query and broadcast; scoring is then a PURE MAP over
    * the codes table — `m` long map-lookups plus a long add per
    * (candidate, query), no float math, no corpus shuffle — cut by the
    * partial/final TopKPerKey pair at `rescoreK`; the float corpus is
    * touched for exactly `|Q| × rescoreK` rows through a broadcast
    * lookup. Memory story: the scan-resident structure is the codes
    * table at `m` small ints per vector — 32× under the float corpus at
    * m=8/dim=64 — and composes with the IVF lists the same way the int8
    * path does. */
  def pqTopK(queries: DataFrame, candidates: DataFrame, k: Int,
             m: Int = 4, ksub: Int = 8, iters: Int = 1,
             rescoreK: Int = 15, dim: Int = 64): DataFrame = {
    val cb0 = trainPqCodebooks(candidates, m, ksub, iters, dim)
    // m×ksub rows; materialize once so encode + LUT don't replay training
    val cb = if (iters > 0) cb0.localCheckpoint(true) else cb0
    val codes = pqEncode(candidates, cb, m, dim)
    val qsub = subvectors(
      queries.select(col("vec_id"), col("embedding")),
      col("vec_id"), col("embedding"), m, dim)
    val lut = qsub.join(broadcast(cb), Seq("sub"))
      .select(col("id").as("query_id"),
        (col("sub").cast("long") * PqKeySpace + col("cent_id")).as("lkey"),
        round(l2sqPortable(col("sv"), col("cvec")) * 1e6).cast("long")
          .as("d2q"))
      .groupBy("query_id")
      .agg(map_from_entries(collect_list(struct(col("lkey"), col("d2q"))))
        .as("lut"))
      .join(queries.select(col("vec_id").as("query_id"),
        col("embedding").as("qv")), Seq("query_id"))
    val approx = codes.crossJoin(broadcast(lut))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("aq", (0 until m).map(j =>
          element_at(col("lut"),
            lit(j.toLong * PqKeySpace) +
              element_at(col("codes"), j + 1).cast("long")))
        .reduce(_ + _))
    val shortlist = GraftOps.topKPerKey(approx, Seq(col("query_id")),
      Seq(col("aq").asc, col("cand_id")), rescoreK)
      .select("query_id", "qv", "cand_id")
    val c = candidates.select(col("vec_id").as("cand_id"),
      col("embedding").as("cv"))
    val rescored = c.join(broadcast(shortlist), Seq("cand_id"))
      .withColumn("cosine", VectorFns.cosine(col("qv"), col("cv")))
    ranked(GraftOps.topKPerKey(rescored, Seq(col("query_id")),
      Seq(col("cosine").desc, col("cand_id")), k), k)
  }

  /** Per-rank nDCG discount weights as exact fixed-point longs:
    * `w(r) = round(1e6 / log2(r + 1))`. Computed ONCE on the driver and
    * inlined as literals into both the plan and the oracle SQL, so the
    * distributed arithmetic is pure integer — no executor (or DuckDB)
    * ever evaluates a log, which removes cross-engine libm rounding from
    * the gate entirely. */
  def ndcgWeights(k: Int): IndexedSeq[Long] =
    (1 to k).map(r => math.round(1e6 / (math.log(r + 1.0) / math.log(2.0))))

  /** Ranking-quality eval of an approximate run against an exact truth
    * ranking — the harness an ANN/retrieval stack ships beyond plain
    * [[recallAtK]]: per query,
    *
    *  - `n_hits`   — |run ∩ truth@k| (recall's numerator),
    *  - `rr`       — reciprocal rank of truth's #1 candidate in the run
    *                 (MRR's per-query term; 0 when missed),
    *  - `ndcg`     — DCG@k with graded relevance `k+1-truth_rank` and the
    *                 [[ndcgWeights]] discount, over the ideal DCG.
    *
    * DETERMINISM: gains are `rel × w(rank)` — products of longs — so both
    * DCG sums are order-free integer sums; `rr` is the exact integer
    * `1e9 div rank`; the only float ops are two final divisions of
    * exactly-determined longs. SCALE SHAPE: both inputs are k-bounded
    * rank lists, so the whole eval is rank-list-sized — three
    * query_id-keyed aggregates/joins, no corpus-sized term. Inputs need
    * (query_id, cand_id, rank), one row per (query_id, cand_id) — the
    * shape every topK here emits; output
    * (query_id, n_hits, rr, ndcg), one row per truth query. */
  def rankEval(run: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"rankEval: k must be positive, got $k")
    val w = ndcgWeights(k)
    def discount(rank: Column): Column =
      w.zipWithIndex.foldLeft(lit(0L)) { case (acc, (wr, i)) =>
        when(rank === (i + 1), lit(wr)).otherwise(acc)
      }
    // Both rank lists are k-bounded (≤ k rows per query) but their
    // LINEAGE is a full retrieval leg — persist them so the eval's
    // three joins replay tiny cached frames, not three ANN runs.
    // CACHE LIFETIME: the entries stay registered after the output
    // materializes — callers own them (the Bench/Verify harnesses
    // clearCache between queries; a long-lived eval session should
    // do the same between unrelated sweeps).
    val r = run.select(col("query_id"), col("cand_id"),
      col("rank").cast("long").as("r_rank")).where(col("r_rank") <= k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val t = truth.select(col("query_id"), col("cand_id"),
      col("rank").cast("long").as("t_rank")).where(col("t_rank") <= k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rel = (lit(k.toLong) + lit(1L) - col("t_rank"))
    val hits = r.join(t, Seq("query_id", "cand_id"))
      .groupBy("query_id").agg(
        count(lit(1)).as("n_hits"),
        sum(rel * discount(col("r_rank"))).as("dcg_fp"))
    val ideal = t.groupBy("query_id")
      .agg(sum(rel * discount(col("t_rank"))).as("ideal_fp"))
    val rr = r.join(t.where(col("t_rank") === 1), Seq("query_id", "cand_id"))
      .select(col("query_id"),
        expr("1000000000L div r_rank").as("rr_fp"))
    ideal.join(hits, Seq("query_id"), "left")
      .join(rr, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("rr_fp"), lit(0L)).cast("double") /
          lit(1000000000.0)).as("rr"),
        (coalesce(col("dcg_fp"), lit(0L)).cast("double") /
          col("ideal_fp").cast("double")).as("ndcg"))
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) of per-query
    * ranked lists — the standard hybrid-retrieval combiner for a sparse
    * (BM25) and a dense (ANN) leg: a candidate's fused score is
    * `Σ_lists 1/(c + rank)`, candidates missing from a list simply
    * contribute nothing for it.
    *
    * DETERMINISM: the fused score is a sum of doubles, so each term is
    * held as the exact integer `1e9 div (c + rank)` (integer FLOOR
    * division — Spark's `div` and DuckDB's `//` agree on non-negatives)
    * and summed as longs (order-free — the [[graft.ops.PageRank]]
    * fixed-point recipe); `rrf` reports the scaled-back double. Input
    * ranks are ints, so any replay of the same lists agrees bit-exactly.
    *
    * SCALE SHAPE: rank lists are k-bounded per query, so everything here
    * is rank-list-sized regardless of corpus size: one union, one
    * (query_id, cand_id) partial-agg shuffle, and the two-phase
    * [[graft.plans.TopKPerKey]] cut. Inputs need columns
    * (query_id, cand_id, rank), ONE ROW per (query_id, cand_id) per
    * list (the shape every topK in this library emits — a duplicate
    * would double-count its term); output
    * (query_id, rank, cand_id, rrf). */
  def rrfFuse(lists: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse: no rank lists")
    require(k > 0 && c >= 0, s"rrfFuse(k=$k, c=$c)")
    val terms = lists.map(
      _.select(col("query_id"), col("cand_id"),
        expr(s"1000000000L div (${c}L + CAST(rank AS BIGINT))")
          .as("term_fp")))
      .reduce(_ unionByName _)
    val fused = terms.groupBy("query_id", "cand_id")
      .agg(sum("term_fp").as("rrf_fp"))
    val cut = GraftOps.topKPerKey(fused, Seq(col("query_id")),
      Seq(col("rrf_fp").desc, col("cand_id").asc), k)
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_fp").desc, col("cand_id").asc)
    cut.withColumn("rank", row_number().over(w))
      .select(col("query_id"), col("rank"), col("cand_id"),
        (col("rrf_fp").cast("double") / lit(1000000000.0)).as("rrf"))
  }
}
