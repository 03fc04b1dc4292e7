"""Plan audit — every registered query's physical plan, checked for
scale smells (SURVEY.md §4).

Flags: CartesianProduct / BroadcastNestedLoopJoin outside the known
intentional set, Python execution (BatchEvalPython / ArrowEval /
MapInPandas / FlatMapGroupsInPandas) outside the declared UDF surface,
and — the round-3 verdict's scale finding — UNPARTITIONED WindowExec
(``Window.orderBy`` with no ``partitionBy`` always plans
``Exchange SinglePartition``: the whole input sorts in ONE task)
outside an allowlist of provably-bounded inputs.

Usage: python tools/audit_plans.py [--sf DIR]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

from etl_arcgis_spark import registry  # noqa: E402
from etl_arcgis_spark.session import get_session  # noqa: E402

# queries whose design legitimately uses Python execution
PYTHON_OK = {
    "udf_scalar_default",
    "udf_arrow_scalar",   # C49 Arrow-optimized variant
    "udf_map_in_arrow",   # C50 raw RecordBatch variant
    "etl_quarantine_split",  # A18 dead-letter: per-record Python try IS the op
    "udf_pandas_reproject",
    "udaf_grouped_median",
    "udtf_json_explode",
    "multimodal_image_decode",
    "multimodal_video_frame_sample",
    "multimodal_image_resize",
    "sim_cosine_topk_pairs",
    "sim_cosine_topk_tiled",  # the tiled spelling of the same GEMM
    "sim_hard_negatives",     # same blocked GEMM, label-masked
    "dedup_embedding_neardup",
    "sim_ivf_knn",
    "multimodal_audio_chunk",
    "multimodal_image_patchify",  # patch fan-out inside the Arrow batch
    "multimodal_audio_spectrum",  # FFT features inside the Arrow batch
    "multimodal_scene_cuts",      # frame-diff detector inside the Arrow batch
    "multimodal_phash_neardup",   # DCT pHash inside the Arrow batch (codec tier)
    "multimodal_pq_quantize",     # PQ assign step (argmin over broadcast codebook) in the Arrow batch
    "text_zlib_compression_ratio",  # zlib inside the Arrow batch IS the operator
    "sim_pca_whiten",               # driver-side eigh summary; projection is codegen
}

# round-7 additions documented inline below (NLJ_OK):
#   stats_mutual_information — three 1-row aggregate cross joins
#   sim_ndcg_eval — 20-row query-vector broadcast (sim_knn family)
# bounded/broadcast nested-loop shapes that are intentional
NLJ_OK = {
    "join_cross_dims",       # tiny dims cross join
    "sim_cosine_pairs_hof",  # O(n^2) baseline by definition
    "lsh_approx_join",       # bucket-equality carried, id< residual
    "sim_knn_query_vector",  # 1-row broadcast
    "stats_krippendorff_alpha",  # final 1-row x 1-row aggregate join
    "text_simhash_fingerprint",  # 16-row broadcast bit planes
    "agg_histogram_price",   # 1-row min/max bounds broadcast
    "analytics_funnel_steps",  # three 1-row step counts cross-joined
    "text_collocation_lift",   # 1-row unigram/bigram totals broadcast
    "spatial_median_center",   # 9 x 1-row Weiszfeld iterate broadcasts
    "spatial_emerging_hotspots",  # cells x months dense-cube build: <=576 grid cells x calendar-bounded month list
    "spatial_dbscan",          # noise-row tail: two 1-row count crossJoins
    "stats_kruskal_wallis",    # 1-row tie-term broadcast onto the 1-row totals
    "stats_runs_test",         # 1-row global-median + 1-row cross-day-boundary broadcasts
    "spatial_colocation_quotient",  # 1-row total-count broadcast onto the 25-row CLQ tail
    "spatial_incremental_morans",   # 1-row moment/num/degree-sum broadcast combines (one pair join feeds all bands)
    "dq_rule_checks",          # 1-row fact-count broadcast prices rates
    "ts_rolling_distinct_users",  # 1-row max-day bound broadcast
    "stats_chi2_independence",    # 1-row grand-total broadcast
    "stats_cramers_v",            # 1-row grand-total broadcast onto the <=35-row cell table
    "analytics_association_rules",  # 1-row basket-total broadcast pricing lift on the pruned pair table
    "ml_ridge_path",              # 1-row Gram-moment row x 5-row lambda grid broadcast
    "ts_haar_wavelet",            # 1-row min-hour anchor broadcast onto the hourly rollup
    "ts_pettitt_change_point",    # 1-row min-hour anchor + 1-row K/t* broadcasts onto the 512-row grid
    "graph_clustering_coefficient",  # 1-row wedge-total x 1-row triangle-total broadcast merge
    "stats_chow_test",            # three 1-row segment-moment broadcasts merged into the F tail
    "stats_cooks_distance_topk",  # 1-row fit-moment broadcast onto the map-only per-row chain
    "stats_logrank_test",         # 1-row group-total broadcast onto the bounded duration grid
    "ts_pacf_levinson",           # 1-row min-hour anchor + 1-row sum broadcast onto the 720-row grid
    "ml_brier_calibration",       # 1-row Brier-total broadcast onto the 10-row bin table
    "ml_feature_infogain_ranking",  # 1-row label/value-marginal entropy broadcasts per bounded contingency
    "stats_huber_m_estimator",    # 6 x 1-row IRLS iterate broadcasts onto the <=50-row value grid (spatial_median_center class)
    "stats_median_ci_order",      # 1-row rank-bounds broadcast onto the bounded daily table
    "stats_qq_deciles",           # 9-row decile-threshold broadcast onto the <=2x50-row cumulative grid
    "ml_lift_gains_table",        # 10-row decile-cut broadcast joined back onto the <=109-row score grid
    "ml_threshold_cost_optimal",  # 1-row positives-total broadcast onto the <=109-row cut table
    "ml_multiclass_eval",         # 3-row class list x 9-cell confusion broadcast + 1-row totals
    "stats_dunn_posthoc",         # 1-row tie-term broadcast onto the 3x3 group-pair table
    "dq_benford_first_digit",     # 1-row total-count broadcast
    "analytics_dormant_rich_customers",  # 1-row scalar-subquery avg broadcast
    "dedup_simhash_hamming_pairs",  # 32-row broadcast bit planes
    "sample_source_rebalance",   # 1-row grand-total broadcast
    "stats_ks_two_sample",       # 1-row sample-sizes + 1-row (min,max) bin-stats broadcasts
    "graph_triangle_count",      # 1-row edge/node-count broadcast
    "window_pct_of_total",       # 1-row grand-total broadcast (not empty OVER())
    "ml_kmeans_clusters",        # 4 x 1-row 8-centroid broadcast combines (unrolled Lloyd E-steps)
    "text_quantile_map_scores",  # 1-row reference-size broadcast prices the quantile positions
    "stats_theil_decomposition",  # 1-row moment + 5-row group-sum broadcast combines
    "dedup_semantic_buckets",    # k-row (8) seed-vector broadcast cross join
    "sample_temperature_mix",    # 1-row grand-total + 1-row partition-fn Z broadcasts
    "text_bm25_score",           # 1-row corpus stats (N, avgdl) broadcast
    "text_perplexity_unigram",   # 1-row token-total broadcast under the LM join
    "stats_mutual_information",  # 1-row grand-total + 1-row entropy broadcasts
    "sim_ndcg_eval",             # 20-row query-vector broadcast (sim_knn family)
    "graph_modularity",          # 1-row total-edge-weight broadcast
    "sim_hybrid_search",         # 1-row query-vector + corpus-stats + max-bm broadcasts
    "text_heavy_hitters",        # 1-row token-total broadcast
    "agg_median_two_phase",      # 1-row (min, max, n) stats broadcast under the binning
    "analytics_top_revenue_supplier",  # 1-row scalar-max broadcast (replaces empty-partition window)
    "text_dsir_importance",      # 1-row gram-totals broadcast under the <=256-row log-ratio table
    "sim_matryoshka_recall",     # bounded query-sample broadcast (vec_id % 25) x corpus, != self predicate
    "sample_token_budget_waterfill",  # 1-row totals + 1-row cap broadcasts over |sources| rows
    "agg_equidepth_histogram",   # 1-row (min, max, n) stats broadcast (bucketed_global_rank)
    "stats_gini_revenue",        # 1-row (min, max, n) stats broadcast (bucketed_global_rank)
    "window_ntile_percent",      # 1-row (min, max, n) stats broadcast (bucketed_global_rank)
    "stats_cohens_kappa",        # 1-row pe_num marginal-product broadcast onto the 1-row totals
    "agg_hll_deterministic",     # 1-row exact-distinct truth broadcast beside the 1-row estimate
    "ml_silhouette",             # 1-row 8-centroid-array broadcast (the kmeans E-step shape)
    "stats_jenks_breaks",        # 4 x 1-row 5-centroid-array broadcasts (unrolled 1-D Lloyd)
    "ts_periodogram_dft",        # 5-row period-grid broadcast onto the bounded hourly rollup
    "spatial_idw_interpolation",  # 36x16 constant evaluation-lattice build (two range cross)
    "spatial_zonal_stats",       # same constant lattice + 25-row zone-polygon broadcast (non-equi PIP)
    "text_bpe_merge_rounds",     # 3 x 1-row argmax-pair broadcasts (unrolled BPE merges)
    "agg_countmin_sketch",       # 4-row hash-row-index broadcast (d=4 sketch rows)
    "sim_rrf_fusion",            # 1-row query-vector broadcast (sim_knn family)
    "analytics_attribution_markov",  # 1-row transition-pivot + total-effect broadcasts
    "ml_naive_bayes_lang",       # 1-row vocab-size/doc-total + |classes|-row model broadcasts
    "stats_wilcoxon_signed_rank",  # 1-row window-midpoint bound broadcast
    "ts_hurst_exponent",         # 4-row block-size grid + 1-row span-bounds broadcasts
    "agg_kmv_theta_sketch",      # 1-row theta broadcast onto the 128-row sketch join
    "dq_referential_integrity",  # five 1-row count pairs cross-joined (one per FK edge)
    "sample_pps_systematic",     # 1-row token-total broadcast over the crossing rule
    "corpus_curate_select",      # 1-row gram-totals (tot2) + token-total (tot3) broadcasts
    "sample_epoch_shuffle",      # 2-row epoch table broadcast fan-out
    "profile_outliers_mad",      # 1-row median + 1-row MAD scalar broadcasts
    "analytics_rfm_segments",    # 1-row (r_cut, f_cut, m_cut) broadcast
    "dq_distribution_drift",     # two 1-row slice-total broadcasts (sa, sb)
    "dq_freshness_staleness",    # 1-row global-max broadcast
    "ts_autocorrelation",        # 6-row lag-list broadcast fan-out
    "ts_cross_correlation",      # 5-row lag-list broadcast fan-out
    "ts_sax_symbols",            # 1-row (mu, sigma, h0) stats broadcast
    "analytics_survival_km",     # 1-row dmax + 1-row total broadcasts
    "ts_entropy_rate",           # 1-row transition-total broadcast
    "analytics_abc_classification",  # 1-row (min,max,n) rank stats + 1-row revenue-total broadcasts
    "stats_cuped_adjustment",    # 1-row moment (n, mx, cxy, vx) broadcast over per-user rows
    "spatial_morans_i",          # 1-row moment/pair-sum/degree-sum broadcasts (grid-blocked pairs)
    "spatial_getis_hotspots",    # 1-row (n, xbar, s) broadcast over per-point neighbor sums
    "spatial_ripleys_k",         # 1-row n broadcast over the 4-row band unpivot
    "spatial_summarize_within",  # 3-row zone-polygon table broadcast (BuildLeft), fact side streams
    "spatial_local_morans",      # 1-row (n, xbar, m2) moment broadcast over per-point lag rows
    "spatial_general_g",         # 1-row moment x 1-row pair-sum broadcast combine (grid-blocked pairs)
    "spatial_avg_nearest_neighbor",  # 1-row NN-sum x 1-row bbox/count broadcast combine (grid-blocked pairs)
    "spatial_huff_model",        # origins×stores OD star: LEFT side is the demand-point-aggregated lattice-cell relation (<=2880 rows by construction, any SF), RIGHT is the broadcast store dim — the deliberate bounded OD expansion
    "stats_kendall_tau",         # 25-row nation-aggregate self-join (nk< inequality pairs) — O(groups²) like the Theil/ANOVA tails, facts reduced first
    "text_perplexity_kn_bigram",  # 1-row bigram-type-total broadcast under the LM star (the text_perplexity_unigram precedent)
    "sample_neyman_allocation",   # 1-row allocation-denominator (sum Nh*sd) broadcast over |sources| rows
    "corpus_token_concentration",  # bucketed_global_rank's 1-row (min,max,n) stats broadcast (the agg_equidepth/gini precedent)
    "stats_fleiss_kappa",        # final 1-row x 1-row aggregate join (the stats_krippendorff_alpha precedent)
    "stats_gwet_ac1",            # final 1-row x 1-row aggregate join (same A/B moment shape as Fleiss)
    "stats_krippendorff_interval",  # 3-row x 3-row marginal product + three 1-row aggregate combines
    "stats_permutation_test",    # 200-row draw-id broadcast fan-out (the ts_autocorrelation lag-list shape) + 1-row obs/extreme combines
    "sim_mrr_eval",              # 20-row query-vector broadcast (the sim_ndcg_eval / sim_knn shape)
    "join_scd2_temporal",        # 3-row version-scaffold cross join building the SCD2 dim; the fact join itself is a BroadcastHashJoin on s_suppkey (verified plan)
    "dq_psi_drift",              # 1-row slice-totals broadcast onto the |categories|-row merge (the dq_distribution_drift shape)
}

# Queries whose unpartitioned WindowExec runs over a PROVABLY BOUNDED
# input (rows independent of table size, or reduced to a small
# aggregate first). Everything else must partition its windows — an
# unpartitioned window over an unbounded input is the one-task global
# sort that kills a 100 TB job (use scale_patterns.bucketed_global_rank
# / bucketed_running_sums instead; see the four round-4 rewrites).
WINDOW_BOUNDED_OK = {
    "stats_wilcoxon_signed_rank": "midrank offset window over the |types|*24-bounded |d| grid (calendar-grid bound)",
    "graph_hits_scores": "max window over the per-round |suppliers|-/|customers|-bounded score aggregate (r12: folds the normalize into the matvec job; plan is checkpoint-hidden but documented here)",
    "ml_auc_roc_exact": "midrank offset window over the <=109-row bounded score grid (s = 10*disc_pct + tax_pct; C124 ECDF-support class)",
    "ts_pettitt_change_point": "midrank offset window over the <=512-value count grid + cumulative U_t window over the fixed 512-hour dyadic grid",
    "stats_logrank_test": "at-risk offset window over the calendar-bounded duration grid (C111 Kaplan-Meier class)",
    "stream_watermark_late_audit": "exclusive prefix-max over the n/64-row block table (bucketed_running_sums two-phase class; per-event window is block-partitioned)",
    "stats_median_ci_order": "rank window over the calendar-bounded <=2500-row daily table (C255 decompose class)",
    "ml_lift_gains_table": "cumulative windows over the <=109-row bounded score grid (C262 class)",
    "ml_threshold_cost_optimal": "cumulative TP/FP window over the <=109-row bounded score grid (C262 class)",
    "ts_croston_intermittent": "lag windows over the calendar-bounded demand-period table (C255 decompose class)",
    "stats_dunn_posthoc": "midrank offset window over the 11-value discount grid (C124 ECDF class)",
    "ts_pacf_levinson": "lead-window over the fixed 720-hour calendar grid (C255 decompose class)",
    "sim_rrf_fusion": "rank windows over the two LIMIT-100 retrieval lists (bounded by the fusion list length)",
    "corpus_token_concentration": "cumulative/total windows over the 10-row decile table (rank itself is bucketed_global_rank; its bin-offset window is <=1024 bounded rows)",
    "stats_theil_decomposition": "unbounded frames over the 5-row priority-group moment table (BH-FDR single-scan spelling)",
    "analytics_mom_growth": "window over per-month aggregate (~80 rows)",
    "ts_cumulative_users": "window over per-day aggregate (~2400 rows)",
    "ts_decompose_classical": "centered-MA frames over the calendar-bounded hourly rollup (720 rows at any fixture SF; years of data ~1e5 rows, one task)",
    "analytics_pareto_frontier": "phase-2 merge over per-bucket skyline survivors (bounded by bucket count x frontier size)",
    "sample_pack_sequences": "offset window over per-bucket totals (256 md5-prefix buckets, bucketed_running_sums)",
    "sample_global_reid": "offset window over per-bucket counts (|buckets| rows)",
    "agg_median_two_phase": "offset window over 1000 equi-width bin counts",
    "profile_outliers_mad": "offset windows over 1000 equi-width bin counts (two_phase_global_median x2, r12 respell of the single-reduce percentile)",
    "agg_equidepth_histogram": "offset window over 1024 bin counts (bucketed_global_rank)",
    "stats_gini_revenue": "offset window over 1024 bin counts (bucketed_global_rank)",
    "text_vocab_growth": "offset window over per-bucket totals (|buckets| rows)",
    "window_ntile_percent": "offset window over 1024 bin counts (bucketed_global_rank)",
    "stats_ks_two_sample": "offset window over 1024 equi-width bin totals (bucketed_running_sums; r7 re-spell — the old value-grid cumulative window was NOT provably bounded)",
    "sql_recursive_month_spine": "window over generated month spine (~80 rows)",
    "sample_token_budget_waterfill": "rank/prefix window over per-source aggregate (|sources| rows)",
    "text_zipf_fit": "rank window over the top-1000 limit (bounded 1000 rows)",
    "sample_pps_systematic": "offset window over per-bucket totals (|buckets| rows, bucketed_running_sums)",
    "stats_mannwhitney_u": "offset window over per-distinct-value counts (midrank grid; 11 discount values)",
    "corpus_curate_select": "offset window over per-bucket totals (|buckets| rows, two-phase PPS stage)",
    "analytics_survival_km": "risk-set/survival windows over the duration grid (bounded by observation-window days)",
    "analytics_abc_classification": "offset windows over 1024 bin counts + 64-rank bucket totals (bucketed_global_rank -> bucketed_running_sums chain)",
    "stats_jackknife_blocks": "totals window over 256 md5-hex block partials (single-scan spelling; the crossJoin-broadcast alternative re-scans the fact table)",
    "ml_decision_stump": "prefix/total windows over the <=256 fixed-width price-bucket partials (data-independent grid; single-scan spelling)",
    "stats_spearman_corr": "offset windows over IEEE-exponent bucket totals (<= ~4400 possible buckets, bounded by the double format, one per rank column)",
    "stats_bh_fdr": "rank + step-up-max windows over the 25-row nation aggregate (bounded by the nation dimension)",
    "spatial_emerging_hotspots": "cube-moment window over the dense space-time cube (<= 576 grid cells x calendar months — bounded by geography x calendar, never by row count)",
    "stats_kruskal_wallis": "totals + offset windows over the 5-row per-group rank-sum table and the IEEE-exponent bucket totals (nation/priority dimension + double-format bound, the C157 pattern)",
    "stats_runs_test": "cross-day boundary lag over the day-summary table (bounded by the CALENDAR — one row per day with events)",
    "spatial_incremental_morans": "peak-z max window over the 4-row band table",
}


def unpartitioned_window(plan: str) -> bool:
    """True if any Window node in the plan text has no partition spec.

    A Window line renders its argument lists as top-level bracket
    groups (probed on this Spark build):
      partition+order : ``Window [fns], [partition], [order]``  (3)
      partition only  : ``Window [fns], [partition]``           (2)
      order only      : ``Window [fns], [order]``               (2) BAD
      empty over()    : ``Window [fns]``                        (1) BAD
    Partition-only windows hash-partition (fine); the 2-group case is
    an order spec — and thus SinglePartition — iff it carries sort
    directions (ASC/DESC)."""
    for line in plan.splitlines():
        stripped = line.lstrip(" +-*:")
        if not stripped.startswith("Window "):
            continue
        depth = 0
        groups: list[str] = []
        for ch in stripped:
            if ch == "[":
                if depth == 0:
                    groups.append("")
                depth += 1
            elif ch == "]":
                depth -= 1
            if depth > 0:
                groups[-1] += ch
        if len(groups) <= 1:
            return True
        if len(groups) == 2 and (" ASC" in groups[-1] or " DESC" in groups[-1]):
            return True
    return False


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()
    spark = get_session("audit", shuffle_partitions=8)
    issues = []
    for name, fn in sorted(registry.all_queries().items()):
        try:
            plan = fn(spark, args.sf)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            issues.append(f"{name}: PLAN ERROR {e}")
            continue
        flags = []
        if "CartesianProduct" in plan and name not in NLJ_OK:
            flags.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in NLJ_OK:
            flags.append("BroadcastNestedLoopJoin")
        if (
            any(m in plan for m in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"))
            and name not in PYTHON_OK
        ):
            flags.append("PythonExec")
        if unpartitioned_window(plan) and name not in WINDOW_BOUNDED_OK:
            flags.append("UnpartitionedWindow")
        if flags:
            issues.append(f"{name}: {', '.join(flags)}")
    print("ALL CLEAN" if not issues else "ISSUES:")
    for i in issues:
        print(" ", i)
    return 1 if issues else 0


if __name__ == "__main__":
    sys.exit(main())
