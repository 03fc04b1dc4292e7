"""Plan audit — every registered query's physical plan, checked for
scale smells (SURVEY.md §4).

Flags: CartesianProduct / BroadcastNestedLoopJoin outside the known
intentional set, and Python execution (BatchEvalPython / ArrowEval /
MapInPandas / FlatMapGroupsInPandas) outside the declared UDF surface.

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
}
# bounded/broadcast nested-loop shapes that are intentional
NLJ_OK = {
    "join_cross_dims",       # tiny dims cross join
    "sim_cosine_pairs_hof",  # O(n^2) baseline by definition
    "lsh_approx_join",       # bucket-equality carried, id< residual
    "sim_knn_query_vector",  # 1-row broadcast
    "text_simhash_fingerprint",  # 16-row broadcast bit planes
    "agg_histogram_price",   # 1-row min/max bounds broadcast
    "analytics_funnel_steps",  # three 1-row step counts cross-joined
    "text_collocation_lift",   # 1-row unigram/bigram totals broadcast
    "dq_rule_checks",          # 1-row fact-count broadcast prices rates
    "ts_rolling_distinct_users",  # 1-row max-day bound broadcast
    "stats_chi2_independence",    # 1-row grand-total broadcast
    "dq_benford_first_digit",     # 1-row total-count broadcast
    "analytics_dormant_rich_customers",  # 1-row scalar-subquery avg broadcast
    "dedup_simhash_hamming_pairs",  # 32-row broadcast bit planes
    "sample_source_rebalance",   # 1-row grand-total broadcast
    "stats_ks_two_sample",       # 1-row sample-sizes broadcast
    "graph_triangle_count",      # 1-row edge/node-count broadcast
    "window_pct_of_total",       # 1-row grand-total broadcast (not empty OVER())
    "dedup_semantic_buckets",    # k-row (8) seed-vector broadcast cross join
    "sample_temperature_mix",    # 1-row grand-total + 1-row partition-fn Z broadcasts
    "text_bm25_score",           # 1-row corpus stats (N, avgdl) broadcast
    "text_perplexity_unigram",   # 1-row token-total broadcast under the LM join
    "sim_hybrid_search",         # 1-row query-vector + corpus-stats + max-bm broadcasts
    "text_heavy_hitters",        # 1-row token-total broadcast
    "agg_median_two_phase",      # 1-row (min, max, n) stats broadcast under the binning
}


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
        if flags:
            issues.append(f"{name}: {', '.join(flags)}")
    print("ALL CLEAN" if not issues else "ISSUES:")
    for i in issues:
        print(" ", i)
    return 1 if issues else 0


if __name__ == "__main__":
    sys.exit(main())
