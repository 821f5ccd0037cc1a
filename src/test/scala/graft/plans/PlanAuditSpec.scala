package graft.plans

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Physical-plan shape regression gate for the headline queries (the
  * expensive chains whose shape regressions have historically cost the
  * most — the round-7 double fixture projection would have tripped the
  * r2_fetch_cascade exchange pin here).
  *
  * Counts come from TRAVERSING the executed plan (node classes, not
  * toString matching): [[AdaptiveSparkPlanHelper]] descends through
  * AQE wrappers and subqueries, and each persisted subtree is walked
  * exactly ONCE via its InMemoryRelation.cachedPlan — so a cached chain
  * re-used by several consumers counts its exchanges once (what
  * executes), where the old toString audit re-counted it per consumer
  * and drifted with suite-order cache state. The session cache is
  * cleared before planning, so counts are identical standalone and
  * in-suite, and every pin is EXACT — a changed count in either
  * direction is a shape change that must be re-audited, not absorbed.
  *
  * Asserts, per query, against the sf0.001 executed plan:
  *  - no CartesianProduct anywhere;
  *  - no BroadcastNestedLoopJoin unless the query deliberately
  *    broadcast-cross-joins a 1-row side (the profile/threshold
  *    pattern — those pin their exact BNLJ count instead);
  *  - the exact number of shuffle exchanges, cached subtrees included.
  */
class PlanAuditSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private case class Shape(shuffles: Int, bnlj: Int, cartesian: Int)

  private def audit(plan: SparkPlan): Shape = {
    val seenCaches = new java.util.IdentityHashMap[SparkPlan, Unit]()
    var shuffles = 0; var bnlj = 0; var cartesian = 0
    def walk(p: SparkPlan): Unit = {
      collectWithSubqueries(p) {
        case _: ShuffleExchangeLike => shuffles += 1
        case _: BroadcastNestedLoopJoinExec => bnlj += 1
        case _: CartesianProductExec => cartesian += 1
        case im: InMemoryTableScanExec =>
          val cached = im.relation.cachedPlan
          if (!seenCaches.containsKey(cached)) {
            seenCaches.put(cached, ())
            walk(cached)
          }
      }
      ()
    }
    walk(plan)
    Shape(shuffles, bnlj, cartesian)
  }

  private def shapeOf(name: String): Shape = {
    // a previous test's cache entries must not swap a raw chain for an
    // InMemoryTableScan in this query's plan — that was the whole
    // suite-order sensitivity of the old toString audit
    spark.catalog.clearCache()
    audit(SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan)
  }

  // name -> (exact shuffle-exchange count, exact sanctioned-BNLJ count).
  // A BNLJ pin > 0 is always the deliberate 1-row broadcast cross join
  // (profile / threshold / total patterns). If a legitimate change moves
  // a count, re-audit and update the one pin with a comment.
  private val expected: Seq[(String, Int, Int)] = Seq(
    ("pipeline_end_to_end", 8, 0),
    ("r3_escalation", 3, 0),
    ("r2_fetch_cascade", 4, 0),
    ("r1_decide_company_role", 2, 0),
    ("m8_dedup_survivors", 7, 0),
    ("r6_template_notes", 3, 1),
    ("notes_end_to_end", 4, 1),
    ("m8_dedup_minhash", 3, 0),
    ("agg_pricing_summary", 1, 0),
    ("join_star_schema", 2, 0),
    ("m8_corpus_pipeline", 10, 2),
    ("m8_dedup_embedding", 2, 0),
    ("m8_sample_mix", 0, 0),
    ("m8_substring_dedup", 4, 0),
    ("m8_key_skew", 3, 1),
    ("m8_join_fanout", 5, 1),
    ("m8_incremental_agg", 2, 0),
    ("m8_pagerank", 0, 0),
    ("m8_dedup_eval", 11, 0),
    ("m8_leakage_safe_split", 0, 0),
    ("m8_outlier_gate", 2, 0),
    ("m8_cms_contract", 3, 2),
    ("m8_bloom_fpr", 2, 0),
    ("m8_table_digest", 3, 0),
    ("m8_training_export", 5, 0),
    ("m8_dedup_eval_simhash", 13, 0),
    ("m8_semantic_dedup", 7, 0),
    // the SQL twin plans the shared subtrees without the DataFrame
    // variant's persist() boundaries, so its executed-once count is
    // legitimately higher than pipeline_end_to_end's
    ("pipeline_end_to_end_sql", 10, 0),
    ("m8_sim_topk_ivf_q", 7, 2),
    ("m8_pagerank_converged", 0, 0),
    ("m8_bpe_encode", 1, 0),
    ("m8_semantic_decontaminate", 3, 1),
    ("m8_substring_rewrite", 5, 0),
    ("m8_lm_surprisal", 7, 1),
    ("m8_quality_rules", 1, 0),
    // round 19: +2 — the lang='en' TARGET side now spreads like the raw
    // side before its gram explode (one repartition exchange per
    // consumer branch of the target in the printed lineage); the gram
    // pipelines themselves are unchanged
    ("m8_importance_weights", 14, 2),
    ("m8_importance_resample", 0, 0),
    // round 19: 1→2 BNLJ — pqEncode is a pure map over one broadcast
    // packed-codebook row (+1 one-row broadcast cross join). Shuffle
    // COUNT stays 9 but the shuffled BYTES changed class: the
    // per-(vector, subspace) assignment-cut and collect_list exchanges
    // (m×N rows) became m×ksub-row codebook packs
    ("m8_sim_topk_pq", 9, 2),
    ("m8_diversity_sample", 3, 1),
    ("m8_ann_index_store", 5, 1),
    ("m8_image_phash_dedup", 1, 0),
    ("m8_selection_export", 2, 0),
    // round 19: sliced drift — ONE gram pass with membership flags
    // (spread before the explode: +1 repartition), one conditional-
    // count aggregate + totals, ONE totals broadcast cross join (was
    // two per-snapshot pipelines + two totals joins)
    ("m8_corpus_drift", 5, 1),
    ("m8_weighted_sample", 2, 0),
    ("m8_dedup_minhash_tuned", 15, 0),
    ("m8_curriculum_pack", 19, 5),
    ("window_range_frame", 1, 0),
    // retrieval family: every BNLJ below is a deliberate broadcast
    // cross join — BM25's 1-row corpus-stats frame, and the dense leg's
    // broadcast query set (bruteForceTopK's corpus-stays-put shape)
    // bm25's 10th exchange is the query-vocab distinct that lets df
    // aggregate AFTER the vocab restriction (no full-vocabulary table)
    ("m8_bm25_search", 10, 1),
    // analyzed variant: same skeleton as m8_bm25_search — the analyzer
    // is pure column expressions, zero extra exchanges
    ("m8_bm25_analyzed", 10, 1),
    ("m8_rrf_fusion", 13, 2),
    ("m8_rank_eval", 13, 1),
    ("m8_phrase_search", 5, 0),
    // proximity (round-17 island/sweep shape): ONE doc-keyed hash
    // aggregation collects each doc's sorted (offset, adj) pairs —
    // phrase's own corpus-shuffle count — and islands + quorum + the
    // anchor-count sweep are in-row HOFs with no exchange; the old
    // ×(slop+1) vote explode + two-phase COUNT(DISTINCT) quorum
    // planned 6 exchanges
    ("m8_proximity_search", 4, 0),
    // near: proximity's single-aggregation island/sweep shape plus the
    // query-TERM-set derivation (qterms distinct, 2-phase, on a
    // dimension-sized frame); the one corpus-sized exchange is the
    // matched-(term, position) collection — was 10 with the
    // ×(n_terms+slop) vote explode's distinct-aggregate pair
    ("m8_near_search", 6, 0))

  expected.foreach { case (name, wantShuffles, wantBnlj) =>
    test(s"$name: no cartesian, exactly $wantShuffles shuffles, $wantBnlj BNLJ") {
      val s = shapeOf(name)
      assert(s.cartesian == 0, s"CartesianProduct in $name")
      assert(s.bnlj == wantBnlj,
        s"$name BroadcastNestedLoopJoin count: ${s.bnlj} != $wantBnlj")
      assert(s.shuffles == wantShuffles,
        s"$name shuffle exchanges: ${s.shuffles} != $wantShuffles")
      info(s"$name: ${s.shuffles} shuffles, ${s.bnlj} bnlj")
    }
  }
}
