package graft

/** Scale-killer guard: the 100 TB design rules every operator documents
  * (docs/PLANS.md, README "Scale design") enforced MECHANICALLY on every
  * registered query's physical plan — a regression that silently turns a
  * bucket equi-join into a nested-loop pair scan must fail a test, not
  * wait for a human plan audit.
  *
  * Rules checked on the optimized physical plan of every registry entry:
  *  - NO CartesianProduct, ever (an unconditional all-pairs shuffle
  *    join cannot survive any scale-up);
  *  - BroadcastNestedLoopJoin only where a query DELIBERATELY pays a
  *    bounded non-equi join: exact all-pairs baselines over capped
  *    samples (q51/q78 — flat by construction, they exist to pin the
  *    math), broadcast theta-joins of tiny aggregate/config relations
  *    (≤ a few rows by construction), and the range/as-of joins whose
  *    band condition is inherently non-equi but whose build side is a
  *    broadcast dimension.
  *
  * The allowlist is the documented inventory — adding a query that
  * nested-loops for any other reason fails here with the plan attached.
  */
class PlanGuardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Queries allowed a BroadcastNestedLoopJoin, with the reason the
    * non-equi join is bounded (kept next to the allowlist so the
    * exception list IS the documentation). */
  private val bnljAllowed: Map[String, String] = Map(
    "q51_embedding_neardup" -> "exact all-pairs ORACLE BASELINE over the capped ~500-vector sample (flat by construction)",
    "q34_knn_cosine" -> "exact KNN baseline: 10-row broadcast query set; the only non-equi condition is n_id != q_id self-exclusion",
    "q58_contamination" -> "df >= df_min threshold join against a ONE-ROW broadcast aggregate",
    "q59_knn_ivf" -> "IVF assignment: deliberate N x k scoring against the 8-row broadcast codebook",
    "q66_bm25" -> "one-row broadcast corpus-stats relation (N, df, avgdl)",
    "q78_neardup_pair_recall" -> "pair-recall instrument: exact ground truth over the same capped sample",
    "q09_range_join" -> "band theta-join; build side is the broadcast dimension",
    "q10_asof_join" -> "as-of inequality join; build side is the broadcast dimension",
    "q14_window_frames" -> "range-frame demo joins a one-row broadcast aggregate",
    "q19_multi_distinct" -> "joins a one-row broadcast global-aggregate relation",
    "q44_multiset_ops" -> "multiset INTERSECT/EXCEPT ALL over broadcast count relations",
    "q47_stats_agg" -> "joins a one-row broadcast stats relation",
    "q48_percentile" -> "joins a one-row broadcast percentile relation",
    "q70_ann_recall" -> "recall instrument: exact ground truth side is the capped broadcast query set",
    "q87_ivf_trained_recall" -> "recall instrument: exact ground truth + three one-row broadcast aggregates",
    "q94_ivfpq_recall" -> "acceptance instrument: exact grid-L2 ground truth (broadcast 10-query set) + four one-row broadcast aggregates",
    "q99_ivfpq_split_recall" -> "acceptance instrument: exact grid-L2 ground truth (broadcast 10-query set) + one-row broadcast combine",
    "q101_hybrid_rrf" -> "hybrid fusion: exact-cosine vector arm over the 10-row broadcast query set (q34's shape) + one-row broadcast corpus-count combine",
    "q102_filtered_knn" -> "filtered exact KNN: 10-row broadcast query set over the metadata-pruned candidates; the only non-equi condition is n_id != q_id self-exclusion",
    "q108_sq8_serve" -> "SQ8 MIPS serve: 10-row broadcast query set over 8x-compressed codes; the only non-equi condition is n_id != q_id self-exclusion (q34's shape)",
    "q109_sq8_acceptance" -> "acceptance instrument: q108's serve plus the exact grid-dot ground truth, both 10-row broadcast query sets with n_id != q_id self-exclusion",
    "q118_hard_negatives" -> "hard-negative mining: exact grid-dot scan over the 10-row broadcast query set; the only non-equi condition is the component-inequality positive exclusion (subsumes n_id != q_id)",
    "q129_filtered_recall" -> "acceptance instrument (q99's shapes): exact filtered grid-L2 ground truth over the broadcast 10-query set + three one-row broadcast combines",
    "q132_filtered_rerank_recall" -> "acceptance instrument (q129's shapes): exact filtered grid-L2 ground truth over the broadcast 10-query set + three one-row broadcast combines",
    "q136_zorder_curve" -> "one-row broadcast bounds relation feeding the curve quantization",
    "q137_zorder_skipping" -> "acceptance instrument: one-row broadcast bounds relation + three one-row layout-count relations combined into the single acceptance row",
    "q138_sketch_rollup" -> "one-row broadcast bounds/date-range relations + the one-row served x exact combine of the acceptance row",
    "q145_histogram_rollup" -> "acceptance instrument: one-row broadcast bounds/count relations + six one-row rank-bin/exact-percentile combines into the single acceptance row",
    "q171_rollup_sql" -> "acceptance instrument: the one-row SQL-served summary row x one-row broadcast exact-distinct combine (the q138 shape through rollup_view)",
    "q187_zorder3_curve" -> "one-row broadcast bounds relation feeding the 3-d curve quantization (q136's shape, third dimension added)")

  for (name <- SparkEntry.queries.keys.toSeq.sorted)
    test(s"$name plan has no scale-killer joins") {
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"CartesianProduct in $name:\n$plan")
      if (!bnljAllowed.contains(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"BroadcastNestedLoopJoin in $name (not on the documented " +
            s"allowlist):\n$plan")
    }
}
