package graft.plans

import graft.{SparkEntry, SparkSpec}

/** Physical-plan shape regression gate for the headline queries (the
  * expensive chains whose shape regressions have historically cost the
  * most — the round-7 double fixture projection would have tripped the
  * r2_fetch_cascade exchange bound here).
  *
  * Asserts, per query, against the sf0.001 executed plan:
  *  - no CartesianProduct anywhere;
  *  - no BroadcastNestedLoopJoin unless the query deliberately
  *    broadcast-cross-joins a 1-row side (the profile/threshold pattern);
  *  - the number of shuffle Exchanges stays at or below the audited
  *    count — a new shuffle in these chains is a scale regression, not
  *    an implementation detail.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  private def shuffles(p: String): Int =
    "(?<![A-Za-z])Exchange (hash|range|Single)".r.findAllIn(p).length

  // name -> (max shuffle exchanges = the audited count, 1-row
  // broadcast-cross-join allowed). Bounds are exact as of round 9 — if a
  // legitimate change adds a shuffle, re-audit and raise the one bound
  // with a comment, don't loosen them wholesale.
  private val expected: Seq[(String, Int, Boolean)] = Seq(
    ("pipeline_end_to_end", 4, false),
    ("r3_escalation", 1, false),
    ("r2_fetch_cascade", 1, false),
    ("r1_decide_company_role", 1, false),
    ("m8_dedup_survivors", 3, false),
    ("r6_template_notes", 2, true),
    ("notes_end_to_end", 2, true),
    ("m8_dedup_minhash", 8, false),
    ("agg_pricing_summary", 1, false),
    ("join_star_schema", 2, false),
    // m8_corpus_pipeline broadcast-cross-joins its 1-row quality
    // threshold — the sanctioned BNLJ pattern
    ("m8_corpus_pipeline", 6, true),
    ("m8_dedup_embedding", 0, false),
    ("m8_sample_mix", 0, false),
    ("m8_substring_dedup", 2, false),
    // round-9 additions: the skew probes and incremental agg broadcast
    // 1-row totals (sanctioned BNLJ); pagerank's serving plan reads the
    // final checkpoint — zero exchanges by construction
    ("m8_key_skew", 3, true),
    ("m8_join_fanout", 5, true),
    ("m8_incremental_agg", 2, false),
    ("m8_pagerank", 0, false),
    // the two dual-pipeline scorecards re-print their persisted subtrees
    // under every consumer in toString, so these counts overstate the
    // executed exchanges — still pinned: growth means a shape regression
    ("m8_dedup_eval", 27, false),
    // scorecard is an eager 1-row checkpoint: the serving plan is
    // exchange-free by construction (caches released inside the query).
    // The heavy chain behind it is NOT invisible to this gate: the
    // minhash pipeline's shape is pinned via m8_dedup_minhash/
    // m8_dedup_eval above, and the closure/split composition via
    // m8_training_export below.
    ("m8_leakage_safe_split", 0, false),
    // sketch contracts broadcast 1-row totals (sanctioned BNLJ); the
    // digest is three single-agg branches; the export capstone carries
    // the clustering chain plus the shuffle-free chunker
    ("m8_outlier_gate", 2, false),
    // 3 as of round 11: the sketch build moved from a driver .head() into
    // the plan as its own 1-row single-partition aggregate (exchange #3)
    ("m8_cms_contract", 3, true),
    ("m8_bloom_fpr", 2, false), // keys distinct + the 1-row final agg
    ("m8_table_digest", 3, false),
    ("m8_training_export", 3, false),
    ("m8_dedup_eval_simhash", 21, false),
    // round-11 additions: the semantic-dedup e2e (LSH → CC → survivors,
    // clustering persisted), the SQL-text flagship (same 4-exchange bound
    // as its DataFrame twin), the quantized IVF search (centroid/probe
    // broadcasts are the sanctioned nlist-row BNLJ), and converged
    // pagerank's exchange-free serving read of the final checkpoint
    ("m8_semantic_dedup", 3, false),
    ("pipeline_end_to_end_sql", 4, false),
    ("m8_sim_topk_ivf_q", 4, true),
    ("m8_pagerank_converged", 0, false),
    // round-12 additions: the BPE encoder is a shuffle-free codegen'd
    // scan (training runs before the served plan is built); the semantic
    // screen's only exchange is the 1-row benchmark collect, which then
    // rides the sanctioned broadcast cross join over the corpus
    ("m8_bpe_encode", 0, false),
    ("m8_semantic_decontaminate", 1, true),
    // window-hash agg (canon join reuses its partitioning) + per-doc
    // removal agg; the rebuild join broadcasts — both exchanges keyed
    ("m8_substring_rewrite", 2, false),
    // vocab word-count + token-keyed count join + per-doc reduce + the
    // 1-row corpus total riding the sanctioned broadcast cross join
    ("m8_lm_surprisal", 3, true),
    // round-12 additions: the rule filter is a pure codegen'd projection;
    // the weight chain is two bucket-keyed gram counts + the per-doc
    // reduce + the restore join, with 1-row totals riding the sanctioned
    // broadcast cross join; the resample serves an eager checkpoint of
    // the selected set (weight cache released inside the operator); the
    // PQ scan's BNLJ is the broadcast per-query LUT over the codes table
    ("m8_quality_rules", 0, false),
    // 8 after deriving the totals from the count frames: the two 1-row
    // total aggregates moved from corpus-scale gram folds to (cheap)
    // single-partition reductions over the ≤buckets-row counts — two
    // more Exchange nodes in toString, two fewer corpus scans executed
    ("m8_importance_weights", 8, true),
    ("m8_importance_resample", 0, true),
    ("m8_sim_topk_pq", 5, true),
    // training's nlist-row broadcasts are the sanctioned BNLJ; the cap
    // is the partial/final TopKPerKey pair keyed by cluster
    ("m8_diversity_sample", 2, true),
    // same bound as the fused m8_sim_topk_ivf_q: the storage boundary
    // must not add an exchange to the serve plan
    ("m8_ann_index_store", 4, true),
    // block-keyed candidate equi-join + the distinct over matched pairs
    ("m8_image_phash_dedup", 1, false),
    // serves from the resample's eager checkpoint + the cap/rollup pair
    ("m8_selection_export", 1, true),
    // two bucket-keyed gram counts + the bucket-keyed full join; 1-row
    // totals ride the sanctioned broadcast cross join
    ("m8_corpus_drift", 6, true),
    // one partial/final TopKPerKey cut under a constant key
    ("m8_weighted_sample", 1, false),
    // round-13 additions. The tuner re-prints the persisted truth/sig
    // subtrees under BOTH scorecard branches in toString (the
    // m8_dedup_eval overstatement class; 48 standalone, 56 when the
    // suite's earlier tests left cache entries that change the printed
    // subtree) — pinned with that order-sensitivity headroom
    ("m8_dedup_minhash_tuned", 56, false),
    // the persisted scored frame re-prints under the 4 stage branches;
    // the 1-row quartile thresholds ride the sanctioned broadcast cross
    // join; per-stage packing windows are shard-partitioned (36
    // standalone, 60 when suite-order cache state changes the printed
    // subtrees — same overstatement class as the tuner above)
    ("m8_curriculum_pack", 60, true),
    // one hash partition by user_id feeding the range-frame window
    ("window_range_frame", 1, false))

  expected.foreach { case (name, maxExchanges, allowBnlj) =>
    test(s"$name: no cartesian, bounded shuffles (≤$maxExchanges)") {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"CartesianProduct in $name")
      if (!allowBnlj)
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"BroadcastNestedLoopJoin in $name")
      val n = shuffles(p)
      assert(n <= maxExchanges,
        s"$name shuffle exchanges grew: $n > $maxExchanges")
      info(s"$name: $n shuffle exchanges")
    }
  }
}
