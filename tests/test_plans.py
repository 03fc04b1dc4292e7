"""Physical-plan assertions — the 100 TB design claims, checked.

Each test pins a plan property the engine's docstrings promise:
pushdown reaching the scan, broadcast joins on dim legs, group-limit
below the top-k window, TakeOrderedAndProject for global top-k, no
Python (BatchEvalPython) in hot relational paths.
"""

from __future__ import annotations

import pytest

from etl_arcgis_spark import registry

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = registry.all_queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    p = plan_of(spark, "scan_project_filter")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in p
    # column pruning: only the 4 projected columns in ReadSchema
    assert "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int" in p


def test_star_join_broadcasts_dims(spark):
    p = plan_of(spark, "join_star_multiway")
    assert p.count("BroadcastHashJoin") >= 2  # nation + region at minimum
    assert "CartesianProduct" not in p


def test_topk_per_group_uses_group_limit(spark):
    assert "WindowGroupLimit" in plan_of(spark, "window_rank_topk_per_group")


def test_global_topk_avoids_full_sort(spark):
    assert "TakeOrderedAndProject" in plan_of(spark, "topk_order_limit")


def test_semi_anti_join_strategies(spark):
    assert "LeftSemi" in plan_of(spark, "join_semi")
    assert "LeftAnti" in plan_of(spark, "join_anti")


@pytest.mark.parametrize(
    "name",
    [
        "agg_groupby_stats",
        "join_star_multiway",
        "window_rank_topk_per_group",
        "text_tokenize_wordcount",
        "sim_cosine_pairs_hof",
        "stream_session_window",
    ],
)
def test_hot_paths_stay_jvm_side(spark, name):
    """No row-at-a-time Python in the relational hot paths: UDF-based
    operators are quarantined to the udfs/multimodal modules."""
    p = plan_of(spark, name)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_partial_aggregation_before_shuffle(spark):
    p = plan_of(spark, "agg_groupby_stats")
    assert "partial_count" in p or "partial_sum" in p  # map-side combine
    assert p.index("partial_") > p.index("Exchange")  # partial below the exchange


def test_spatial_grid_join_is_equi_not_nested_loop(spark):
    p = plan_of(spark, "join_spatial_grid_distance")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    # the 3x3 cell expansion becomes hash-joinable equi keys
    assert ("SortMergeJoin" in p) or ("ShuffledHashJoin" in p) or (
        "BroadcastHashJoin" in p
    )


def test_minhash_banding_never_cartesian(spark):
    p = plan_of(spark, "dedup_minhash_banding_exact")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_stratified_sample_uses_group_limit(spark):
    assert "WindowGroupLimit" in plan_of(spark, "sample_stratified_balanced")


def test_fuzzy_join_carries_equi_blocking_key(spark):
    p = plan_of(spark, "join_fuzzy_levenshtein")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_partition_pruning_on_partitioned_layout(spark, tmp_path):
    """Hive-partitioned writes prune at planning time: a filter on the
    partition column must appear as PartitionFilters (pruned
    directories), never as a data filter over a full scan."""
    from etl_arcgis_spark.tables import table

    out = str(tmp_path / "events_by_type")
    ev = table(spark, SF_DIR, "events").select("event_id", "user_id", "event_type")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)
    df = spark.read.parquet(out).filter("event_type = 'purchase'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "event_type" in plan.split(
        "PartitionFilters"
    )[1][:120]
    assert df.count() == ev.filter("event_type = 'purchase'").count()


def test_q3_topk_is_heap_not_global_sort(spark):
    p = plan_of(spark, "analytics_ship_priority_topk")
    assert "TakeOrderedAndProject" in p  # top-10 via per-partition heaps
    assert "CartesianProduct" not in p


def test_q19_disjunction_splits_to_both_scans(spark):
    """The OR-of-ANDs must leave side-local residuals on BOTH scans:
    the quantity range union on lineitem, the brand disjunction on
    part — each scan prunes before the broadcast join."""
    p = plan_of(spark, "analytics_disjunctive_part_filter")
    assert "BroadcastHashJoin" in p
    assert "PushedFilters" in p
    # lineitem scan gets the quantity-range disjunction verbatim
    assert "Or(Or(And(GreaterThanOrEqual(l_quantity,1.0)" in p
    # part scan gets the extracted common conjunct AND the brand/size OR tree
    assert "GreaterThanOrEqual(p_size,1)" in p
    assert "EqualTo(p_brand" in p


def test_q21_probes_are_semi_and_anti(spark):
    p = plan_of(spark, "analytics_sole_late_supplier")
    assert "LeftSemi" in p and "LeftAnti" in p
    assert "CartesianProduct" not in p


def test_q22_scalar_subquery_is_broadcast_one_row(spark):
    """The global average gates via BroadcastNestedLoopJoin over a
    1-row aggregate — no collect, no cartesian over data-sized input."""
    p = plan_of(spark, "analytics_dormant_rich_customers")
    assert "BroadcastNestedLoopJoin" in p
    assert "LeftAnti" in p


def test_simhash_pairs_band_join_never_cartesian(spark):
    """The hamming pair search must ride the band-bucket equi-join —
    the only cross join allowed is the nbits-row broadcast plane table
    inside the fingerprint, never the doc-pair space."""
    p = plan_of(spark, "dedup_simhash_hamming_pairs")
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p or "BroadcastHashJoin" in p


def test_q16_exclusion_is_broadcast_anti(spark):
    """The NOT-IN blacklist must run as a broadcast anti-join (never a
    shuffle of the fact side for a dim-sized exclusion set)."""
    p = plan_of(spark, "analytics_supplier_diversity")
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert "CartesianProduct" not in p


def test_centroid_outliers_group_limit_and_broadcast(spark):
    """Per-label top-5 runs as WindowGroupLimit; the (label x dim)
    centroid joins back as a broadcast — the big exploded relation
    never shuffles for the join."""
    p = plan_of(spark, "sim_centroid_outliers")
    assert "WindowGroupLimit" in p
    assert "BroadcastHashJoin" in p


def test_q6_all_predicates_pushed_to_scan(spark):
    """The Q6-shape scan-filter-agg is the canonical pushdown probe:
    date range, discount band, and quantity cap must all reach the
    parquet scan as PushedFilters, with no join or exchange beyond the
    single-row partial-agg combine."""
    old = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    try:
        p = plan_of(spark, "analytics_discount_revenue")
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", old)
    assert "PushedFilters:" in p
    for frag in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)",
        "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)",
    ):
        assert frag in p, frag
    assert "Join" not in p


def test_q8_market_share_broadcasts_dims_only(spark):
    """Q8's fixed-size legs (nation x2, region) broadcast; the plan
    stays cartesian-free and the fact side never feeds a broadcast."""
    p = plan_of(spark, "analytics_market_share")
    assert p.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in p


def test_decontaminate_benchmark_dict_broadcasts(spark):
    """The benchmark 4-gram dictionary must broadcast into a semi-join
    — the corpus gram stream is never shuffled on the gram key."""
    p = plan_of(spark, "dedup_decontaminate_ngrams")
    assert "BroadcastHashJoin" in p and "LeftSemi" in p
    assert "SortMergeJoin" not in p


def test_winsorize_bounds_broadcast_back(spark):
    """The 5-row percentile-bounds relation joins back as a broadcast;
    the customer fact is never shuffled for the clip."""
    p = plan_of(spark, "stats_winsorize_clip")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_bitmap_distinct_shuffles_bitmaps_not_keys(spark):
    p = plan_of(spark, "agg_bitmap_distinct")
    # map-side OR of bucket bitmaps BEFORE the exchange: the shuffle
    # moves one fixed-size blob per (group, bucket), never raw keys
    assert "partial_bitmap_construct_agg" in p
    # final distinct count is a plain sum over per-bucket popcounts
    assert "bitmapCount" in p and "partial_sum" in p


def test_q9_profit_broadcasts_all_dim_legs(spark):
    p = plan_of(spark, "analytics_profit_by_nation_year")
    assert p.count("BroadcastHashJoin") >= 3  # part, supplier, nation
    assert "CartesianProduct" not in p


def test_incremental_dedup_is_hash_anti_join_on_hashes(spark):
    p = plan_of(spark, "dedup_incremental_new_batch")
    assert "LeftAnti" in p
    # the seen corpus reduces to distinct hashes before the join
    assert "HashAggregate" in p and "md5" in p


def test_lateral_topk_decorrelates_to_set_based_plan(spark):
    p = plan_of(spark, "join_lateral_topk")
    # correlated LIMIT 1 must become join + per-group row_number, never
    # nested-loop per-row execution
    assert "row_number" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_pct_of_total_no_global_window(spark):
    """The grand total in window_pct_of_total is an aggregate broadcast
    back onto the rows — NOT an empty-OVER() window, which would drag
    every row through one partition at cluster SF."""
    p = plan_of(spark, "window_pct_of_total")
    wins = [ln for ln in p.splitlines() if "- Window [" in ln]
    assert len(wins) == 1 and "o_custkey" in wins[0]  # only the per-customer window
    assert "BroadcastExchange" in p  # the 1-row grand total arrives broadcast


def test_star_join_all_legs_broadcast_no_fact_shuffle(spark):
    """r12 (VERDICT r11 #6 + optimization r12): one plan, no mode
    switches (the cache mode itself is gone). Every dim leg must arrive
    broadcast — including customer_geo, whose 2-join subtree defeats
    Catalyst's size estimate and needs the explicit BROADCAST hint
    (guide §3.1) — so the fact side is never shuffled: the ONLY
    exchange left is the final 36-group aggregation."""
    fn = registry.all_queries()["join_star_multiway"]
    df = fn(spark, SF_DIR)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
    assert p.count("BroadcastHashJoin") >= 2  # orders leg + geo leg
    # exactly one shuffle: the post-aggregation exchange
    assert p.count("Exchange hashpartitioning") == 1
    assert df.count() > 0


def test_semantic_dedup_never_cartesian(spark):
    """The O(n²) cosine sweep must stay inside buckets: the pair stage
    is an equi-join on the bucket id, the seed assignment a broadcast
    join — a CartesianProduct anywhere means the bucketing failed."""
    df = registry.all_queries()["dedup_semantic_buckets"](spark, SF_DIR)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    # nested-loop joins may appear ONLY as the k-row seed broadcast
    # (the deliberate assignment cross join — every BNLJ must build an
    # IdentityBroadcast side, never shuffle data-sized input); the pair
    # sweep itself must be a hash/merge equi-join on the bucket id
    assert "BroadcastHashJoin" in p or "ShuffledHashJoin" in p or "SortMergeJoin" in p
    # the SQL references the bucket CTE three times; AQE stage reuse
    # must collapse the repeated assignment stages at runtime so the
    # O(n*k) assignment computes once, not three times
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    assert final.count("ReusedExchange") >= 2


def test_line_level_dedup_joins_on_hash(spark):
    """Span dedup must join instances to first-occurrences on the md5
    hash (equi), never compare text pairwise; the min aggregation must
    partial-combine below its exchange."""
    p = plan_of(spark, "dedup_line_level")
    assert "CartesianProduct" not in p
    assert "md5" in p
    assert "partial_min" in p


def test_geodesic_join_is_blocked_equi_join(spark):
    """join_geodesic_distance: 27-neighborhood 3D-grid blocking must
    plan as an equi-join on the cell ids — never a cartesian/BNLJ —
    and the chord^2 verification rides the join condition."""
    p = plan_of(spark, "join_geodesic_distance")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "cxa" in p and "cxb" in p  # cell-id equi keys
    assert "BatchEvalPython" not in p  # pure codegen arithmetic


def test_spatial_predicate_filters_stay_scan_side(spark):
    """touches/overlaps/crosses: join-free single-scan plans with the
    constant-bound prefilter pushed at the scan."""
    for name in (
        "filter_spatial_envelope_touches",
        "filter_spatial_envelope_overlaps",
        "filter_spatial_polygon_crosses",
    ):
        p = plan_of(spark, name)
        assert "Join" not in p and "Exchange" not in p, name
        assert "BatchEvalPython" not in p, name


def test_geodesic_polynomials_match_libm():
    """The shared-text sin/cos/asin polynomials (joins.py) vs numpy:
    max abs error far below the 1e-4 output rounding; and the crosses
    orientation determinants are nonzero over the ENTIRE reachable
    coordinate grid (no sign decision within 12 orders of float
    error)."""
    import math

    import numpy as np

    from etl_arcgis_spark.operators import filters as FL
    from etl_arcgis_spark.operators import joins as J

    # the Horner SQL strings are valid Python expressions — evaluate
    # them directly against float scalars
    xs = np.linspace(-math.pi, math.pi, 20001)
    cosv = np.array([eval(J._cosp("x"), {"x": float(v)}) for v in xs])
    sinv = np.array([eval(J._sinp("x"), {"x": float(v)}) for v in xs])
    assert np.max(np.abs(cosv - np.cos(xs))) < 1e-10
    assert np.max(np.abs(sinv - np.sin(xs))) < 1e-10
    zs = np.linspace(0.0, 0.08, 2001)
    asv = np.array([eval(J._asinp("z"), {"z": float(v)}) for v in zs])
    assert np.max(np.abs(asv - np.arcsin(zs))) < 1e-12

    # crosses degeneracy sweep: all 360x160 centers, all 6 edges
    lons = np.arange(-180, 180) + 0.5
    lats = np.arange(-80, 80) + 0.5
    P = np.array(np.meshgrid(lons, lats)).reshape(2, -1).T
    Q = P + np.array([FL._SEG_DX, FL._SEG_DY])

    def orient(ax, ay, bx, by, cx, cy):
        return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

    min_nonzero = np.inf
    n_zero = 0
    poly = FL._POLYGON
    for i in range(len(poly)):
        A, B = poly[i], poly[(i + 1) % len(poly)]
        for o in (
            orient(P[:, 0], P[:, 1], Q[:, 0], Q[:, 1], A[0], A[1]),
            orient(P[:, 0], P[:, 1], Q[:, 0], Q[:, 1], B[0], B[1]),
            orient(A[0], A[1], B[0], B[1], P[:, 0], P[:, 1]),
            orient(A[0], A[1], B[0], B[1], Q[:, 0], Q[:, 1]),
        ):
            n_zero += int(np.sum(o == 0.0))
            min_nonzero = min(min_nonzero, np.min(np.abs(o[o != 0.0])))
    assert n_zero == 0 and min_nonzero > 1e-2


def test_geodesic_units_param():
    """geodesic_distance_join: esriSRUnit_* conversions line up (500 km
    == 500000 m == the same pair set), unknown units raise."""
    import math

    import pytest as _pytest

    from etl_arcgis_spark.operators.joins import _geo_params

    eps_km, d_km = _geo_params(500.0, "esriSRUnit_Kilometer")
    eps_m, d_m = _geo_params(500_000.0, "esriSRUnit_Meter")
    assert d_km == d_m == 500.0 and eps_km == eps_m
    eps_mi, d_mi = _geo_params(100.0, "esriSRUnit_StatuteMile")
    assert math.isclose(d_mi, 160.9344)
    with _pytest.raises(KeyError):
        _geo_params(1.0, "esriSRUnit_Bogus")


def test_subqueries_decorrelate_to_set_joins(spark):
    """The correlated-subquery family must plan as set-based joins
    (decorrelation), never per-row subplan execution or a cartesian."""
    p = plan_of(spark, "subq_exists_correlated")
    assert "LeftSemi" in p and "CartesianProduct" not in p
    p = plan_of(spark, "subq_not_exists_argmax")
    assert "LeftAnti" in p and "CartesianProduct" not in p
    p = plan_of(spark, "subq_scalar_correlated")
    # aggregate-then-join, not a per-row subquery node
    assert "HashAggregate" in p and "Join" in p and "CartesianProduct" not in p
    p = plan_of(spark, "subq_in_uncorrelated")
    assert "LeftSemi" in p and "CartesianProduct" not in p
    p = plan_of(spark, "join_interval_overlap")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_salted_skew_is_two_stage_exact(spark):
    """agg_salted_skew's salt is physical only: two hash aggregates
    (flag+salt, then flag), partial aggregation below each exchange,
    and no Python anywhere."""
    p = plan_of(spark, "agg_salted_skew")
    assert p.count("HashAggregate") >= 4  # partial+final x two stages
    assert "BatchEvalPython" not in p
    assert "CartesianProduct" not in p


def test_bm25_broadcasts_stats_and_df(spark):
    """BM25's corpus stats (1 row) and df (|terms| rows) join back by
    broadcast; the token-level aggregates keep map-side combine; the
    top-20 is a heap, not a global sort."""
    p = plan_of(spark, "text_bm25_score")
    assert "TakeOrderedAndProject" in p
    assert p.count("BroadcastHashJoin") + p.count("BroadcastNestedLoopJoin") >= 2
    assert "CartesianProduct" not in p


def test_chunking_is_map_only_narrow(spark):
    """Sliding-window chunking is a narrow generate pipeline — zero
    exchanges before the explode, no Python, no join."""
    p = plan_of(spark, "text_chunk_sliding")
    assert "Generate explode" in p
    assert "BatchEvalPython" not in p
    # the only exchange is the final presentation sort's range partition
    assert p.count("Exchange") == 1 and "rangepartitioning" in p


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """Dynamic partition pruning: a fact table partitioned on the join
    key must get a runtime dynamicpruning subquery when joined to a
    selectively-filtered dim — the fact scan reads only partitions the
    dim filter admits, without any literal fact-side predicate. At
    100 TB this is what makes star joins over date/tenant-partitioned
    facts affordable (the dim filter, not a human, prunes the scan)."""
    from pyspark.sql import functions as F

    from etl_arcgis_spark.tables import table

    out = str(tmp_path / "orders_by_cust_mod")
    o = (
        table(spark, SF_DIR, "orders")
        .withColumn("cust_bucket", F.expr("o_custkey % 20"))
    )
    o.write.mode("overwrite").partitionBy("cust_bucket").parquet(out)
    fact = spark.read.parquet(out)
    dim = (
        table(spark, SF_DIR, "customer")
        .withColumn("cust_bucket", F.expr("c_custkey % 20"))
        .filter("c_mktsegment = 'BUILDING'")
        .select("cust_bucket")
        .distinct()
    )
    joined = fact.join(dim, "cust_bucket").groupBy("cust_bucket").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    # and the result matches the unpartitioned spelling
    want = (
        table(spark, SF_DIR, "orders")
        .withColumn("cust_bucket", F.expr("o_custkey % 20"))
        .join(dim, "cust_bucket")
        .groupBy("cust_bucket")
        .count()
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, want.collect()))


def test_nearest_asof_is_window_pass_not_pair_join(spark):
    """join_asof_nearest: the temporal match is a window pass + one
    exact equi-join — never a banded pair join or nested loop."""
    p = plan_of(spark, "join_asof_nearest")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Window" in p


def test_pareto_phase1_windows_are_bucket_partitioned(spark):
    """analytics_pareto_frontier: the heavy phase-1 windows partition
    by the date bucket (range-disjoint), and no join of any kind
    appears — the skyline is pure window algebra."""
    p = plan_of(spark, "analytics_pareto_frontier")
    # Physical plans render a partitioned Window as
    #   Window [fns], [bucket#N], [d#M ASC ...]
    # — assert at least one Window node's partition spec is the bucket
    # column (the round-3 ADVICE fix: the old "partitionBy not in plan"
    # assertion was vacuously true, plans never contain that literal).
    bucketed = [
        line
        for line in p.splitlines()
        if line.lstrip(" +-*:").startswith("Window ") and "], [bucket#" in line
    ]
    assert bucketed, f"no bucket-partitioned Window node in plan:\n{p}"
    assert "Join" not in p
    assert p.count("Window") >= 2  # phase 1 (bucketed) + phase 2 (merge)


def test_median_two_phase_ranks_only_target_buckets(spark):
    """agg_median_two_phase: the exact ranking window partitions by
    bin and runs AFTER a bucket-membership join — the full column is
    never globally sorted."""
    p = plan_of(spark, "agg_median_two_phase")
    assert "TakeOrderedAndProject" not in p
    assert "Window" in p
    assert "CartesianProduct" not in p


def test_audit_allowlists_reference_real_queries():
    """Every name in the plan-audit allowlists must be a registered
    query — a typo'd or stale entry silently weakens the audit (it
    allowlists nothing while appearing to)."""
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.audit_plans import NLJ_OK, PYTHON_OK, WINDOW_BOUNDED_OK

    registry.load_all()
    registered = set(registry.QUERIES)
    for name, lst in (
        ("PYTHON_OK", PYTHON_OK),
        ("NLJ_OK", NLJ_OK),
        ("WINDOW_BOUNDED_OK", set(WINDOW_BOUNDED_OK)),
    ):
        stale = set(lst) - registered
        assert not stale, f"{name} entries not registered: {sorted(stale)}"


def test_session_paths_topk_avoids_full_sort(spark):
    """The top-20 path cut must be TakeOrderedAndProject, not a global
    sort of the path histogram."""
    p = plan_of(spark, "analytics_session_paths")
    assert "TakeOrderedAndProject" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_attribution_windows_are_user_partitioned(spark):
    """Last-touch attribution's window must partition by user_id — an
    unpartitioned frame here would be the single-task global sort."""
    df = registry.all_queries()["analytics_attribution_last_touch"](spark, SF_DIR)
    p = df._jdf.queryExecution().executedPlan().toString()
    import re as _re

    for line in p.splitlines():
        s = line.strip(" +-*:")
        if s.startswith("Window "):
            assert "user_id" in s.split("], [")[1], s
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


# ---------------------------------------------------------------- round 7


def test_ndcg_query_side_broadcast_and_group_limit(spark):
    """sim_ndcg_eval: the 20-row query set must ride a broadcast
    nested loop (corpus never shuffles for the scoring), and the
    per-query top-10 must push a group limit below the rank window
    (20 independent heaps, no global sort)."""
    p = plan_of(spark, "sim_ndcg_eval")
    assert "BroadcastNestedLoopJoin" in p
    assert "WindowGroupLimit" in p


def test_vocab_overlap_is_equi_join_not_cartesian(spark):
    """text_source_vocab_overlap: the intersection must be a
    token-KEYED join (source inequality as residual), never a
    cartesian of the vocab tables."""
    p = plan_of(spark, "text_source_vocab_overlap")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_theil_sen_pair_stage_carries_equi_key(spark):
    """ts_theil_sen_trend: the O(months²) pair stage must join on the
    priority equi-key (midx inequality as residual) — bounded by the
    calendar grid, never a cartesian."""
    p = plan_of(spark, "ts_theil_sen_trend")
    assert "CartesianProduct" not in p


def test_mutual_information_single_data_shuffle(spark):
    """stats_mutual_information: everything past the contingency
    group-by must be broadcast re-aggregation — no sort-merge join of
    data-sized inputs."""
    p = plan_of(spark, "stats_mutual_information")
    assert "SortMergeJoin" not in p


def test_lpa_argmax_partitioned_and_modularity_broadcast(spark):
    """graph_label_propagation: every rank window is PARTITIONED (the
    per-node argmax); graph_modularity: the total-weight leg is a
    1-row broadcast."""
    # r12: the shared LPA labels are localCheckpoint()ed (modularity
    # consumes them twice), so the registered query's plan reads the
    # checkpointed RDD; the argmax window lives in the helper's
    # pre-checkpoint plan — assert it there instead.
    p = plan_of(spark, "graph_label_propagation")
    assert "Window" in p or "ExistingRDD" in p
    from etl_arcgis_spark.operators.graph import _lpa_edges_labels

    votes_plan = None
    if "ExistingRDD" in p:
        edges, labels = _lpa_edges_labels(spark, SF_DIR)
        # labels is checkpointed; re-derive one vote round lazily to
        # see the argmax shape Catalyst plans for it
        from pyspark.sql import Window, functions as F

        votes = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy(F.col("dst").alias("vnode"), "label")
            .agg(F.sum("w").alias("wsum"))
        )
        rn = F.row_number().over(
            Window.partitionBy("vnode").orderBy(F.desc("wsum"), F.asc("label"))
        )
        votes_plan = votes.withColumn("rn", rn)._jdf.queryExecution().toString()
        assert "Window" in votes_plan
        assert "PartitionBy" in votes_plan or "partitionBy" in votes_plan or "vnode" in votes_plan
    # the audit's unpartitioned-window detector covers the stronger
    # claim; here pin no cartesian in the vote joins
    assert "CartesianProduct" not in p
    p2 = plan_of(spark, "graph_modularity")
    assert "BroadcastNestedLoopJoin" in p2  # the 1-row tw broadcast
    assert "CartesianProduct" not in p2


def test_spatial_stats_pairs_are_blocked_equi_joins(spark):
    """C144-C146: the neighbor-pair stage must be a cell-keyed EQUI
    join (grid blocking) — a cartesian/pure-NLJ pair stage is the
    O(n²) weights matrix that cannot run at 100 TB. The only
    nested-loop joins allowed are the 1-row scalar broadcasts."""
    for name in ("spatial_morans_i", "spatial_getis_hotspots", "spatial_ripleys_k"):
        p = plan_of(spark, name)
        assert "CartesianProduct" not in p, name
        # cell-key equi join present: hashed or sort-merge on cx/cy
        assert ("BroadcastHashJoin" in p) or ("SortMergeJoin" in p) or (
            "ShuffledHashJoin" in p
        ), name


def test_ripleys_k_single_pair_pass(spark):
    """spatial_ripleys_k: all four band counts come from ONE
    conditional-aggregate pass over the pair join — the plan must
    contain exactly one cell-join, not one per band."""
    p = plan_of(spark, "spatial_ripleys_k")
    import re

    data_joins = len(re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", p))
    assert data_joins == 1, p


def test_near_table_window_partitioned_with_group_limit(spark):
    """spatial_near_table: the per-feature rank must be PARTITIONED by
    source and carry Catalyst's WindowGroupLimit (O(k) state per
    feature before the final sort)."""
    p = plan_of(spark, "spatial_near_table")
    assert "WindowGroupLimit" in p
    assert "CartesianProduct" not in p


def test_jackknife_single_block_aggregate(spark):
    """stats_jackknife_blocks: one 256-group hash aggregate over the
    fact scan; everything downstream is 1-row broadcast arithmetic —
    no second data-sized pass, no sort-merge join."""
    p = plan_of(spark, "stats_jackknife_blocks")
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p
    import re
    # exactly one scan of the orders fact
    assert len(re.findall(r"Scan parquet", p)) == 1, p


def test_shoelace_zero_shuffle_in_row_hofs(spark):
    """spatial_shoelace_area: per-feature geometry must be pure in-row
    HOF arithmetic — no shuffle exchange, no Python, single scan."""
    p = plan_of(spark, "spatial_shoelace_area")
    assert "Exchange hashpartitioning" not in p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p


def test_summarize_within_broadcasts_zone_side(spark):
    """spatial_summarize_within: the zone table must be the BUILT
    (broadcast) side of the nested-loop containment join — BuildLeft
    with zones on the left; a plan that broadcasts the point/fact side
    dies at 100 TB."""
    p = plan_of(spark, "spatial_summarize_within")
    assert "BroadcastNestedLoopJoin BuildLeft, LeftOuter" in p
    import re
    assert len(re.findall(r"Scan parquet", p)) == 1, p


def test_local_morans_general_g_blocked_pairs(spark):
    """C152-C153: like the global statistics, the pair stage must be a
    cell-keyed equi join; nested-loop joins only as 1-row scalar
    broadcasts, never a data-sized cartesian."""
    for name in ("spatial_local_morans", "spatial_general_g"):
        p = plan_of(spark, name)
        assert "CartesianProduct" not in p, name
        assert ("BroadcastHashJoin" in p) or ("SortMergeJoin" in p) or (
            "ShuffledHashJoin" in p
        ), name


def test_near_join_group_limit_and_left_join(spark):
    """spatial_near_join: the nearest-pick window must be partitioned
    by the source feature with WindowGroupLimit (O(1) state per
    feature), and the radius-miss path must come back as a LEFT join
    on the full input layer — no cartesian anywhere."""
    p = plan_of(spark, "spatial_near_join")
    assert "WindowGroupLimit" in p
    assert "CartesianProduct" not in p
    assert "LeftOuter" in p


def test_quadkey_rollup_single_expand_pass(spark):
    """spatial_quadkey_rollup: both pyramid levels must come from ONE
    Expand + hash aggregate over a single scan — one rescan per LOD
    is the anti-pattern tile pre-aggregation exists to avoid."""
    p = plan_of(spark, "spatial_quadkey_rollup")
    assert "Expand" in p
    import re
    assert len(re.findall(r"Scan parquet", p)) == 1, p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p


def test_kernel_density_no_pair_join(spark):
    """spatial_kernel_density: the quartic kernel's finite support
    means NO join at all — explode to 9 candidate cells, filter, one
    hash aggregate. Any join in this plan is a smell."""
    p = plan_of(spark, "spatial_kernel_density")
    assert "Join" not in p, p
    assert "Exchange hashpartitioning" in p  # the per-cell aggregate
    import re
    assert len(re.findall(r"Scan parquet", p)) == 1, p


def test_spearman_windows_partitioned_by_bin(spark):
    """stats_spearman_corr: the only unpartitioned windows are the
    two IEEE-exponent bucket-offsets passes (<= ~4400 rows each, the
    bound comes from the double format); the per-value cumulative
    runs PARTITIONED by bucket, and the fact is scanned exactly 5x
    (2 per rank build — Catalyst plans shared subtrees per reference
    — plus the moment probe; 6 column-reads, see the docstring)."""
    p = plan_of(spark, "stats_spearman_corr")
    assert "CartesianProduct" not in p
    assert "Exchange hashpartitioning" in p
    import re
    assert len(re.findall(r"Scan parquet", p)) == 5, p


def test_anova_single_scan_no_window(spark):
    """stats_anova_oneway: one 5-group aggregate over one scan, a
    5-row tail, no window at all."""
    p = plan_of(spark, "stats_anova_oneway")
    import re
    assert len(re.findall(r"Scan parquet", p)) == 1, p
    assert "Window" not in p
    assert "CartesianProduct" not in p


def test_bootstrap_poisson_single_scan_map_side_combine(spark):
    """stats_bootstrap_poisson: the 64x replicate explode must stay
    map-side — ONE scan, ONE shuffle keyed by replicate id (partial
    aggregate before the exchange), no window, no Python."""
    p = plan_of(spark, "stats_bootstrap_poisson")
    import re
    assert len(re.findall(r"Scan parquet", p)) == 1, p
    assert "Window" not in p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p
    # partial_ aggregate functions before the exchange == map-side combine
    assert "partial_sum" in p or "Partial" in p, p


def test_mann_kendall_in_row_no_pair_join(spark):
    """ts_mann_kendall: the O(months^2) stage is in-row HOF work —
    ONE scan, one monthly aggregate, NO self-join, no second fact
    reference (the Theil-Sen pair join's zero-join twin)."""
    p = plan_of(spark, "ts_mann_kendall")
    import re
    assert len(re.findall(r"Scan parquet", p)) == 1, p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p


def test_bh_fdr_single_scan_bounded_windows(spark):
    """stats_bh_fdr: one customer scan; global moments come from the
    25-row group table (not a second fact scan); windows run over the
    bounded nation aggregate."""
    p = plan_of(spark, "stats_bh_fdr")
    import re
    assert len(re.findall(r"Scan parquet", p)) == 1, p
    assert "BroadcastNestedLoopJoin" not in p  # moments via bounded windows, no crossJoin
    assert "CartesianProduct" not in p


def test_median_center_unrolled_chain(spark):
    """spatial_median_center: 8 Weiszfeld iterates + seed + the seed's
    output re-reference = 10 scans in a linear chain of 1-row
    broadcast crossJoins; no window, no Python, no pair join."""
    p = plan_of(spark, "spatial_median_center")
    import re
    assert len(re.findall(r"Scan parquet", p)) == 10, p
    assert "Window" not in p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p


def test_directional_mean_star_shape(spark):
    """spatial_directional_mean: star-join shape — fact-fact equi-join
    plus broadcast dims, map-side-combined 7-group aggregate; no
    window, no cartesian, no Python."""
    p = plan_of(spark, "spatial_directional_mean")
    assert "Window" not in p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p
    assert "partial_sum" in p or "Partial" in p, p


def test_burstiness_one_window_pass(spark):
    """ts_burstiness: both lag offsets share ONE user-partitioned
    window pass; per-series moments are a map-side-combined hash agg;
    no cartesian, no Python."""
    p = plan_of(spark, "ts_burstiness")
    import re
    assert len(re.findall(r"\bWindow\b", p)) == 1, p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p
    assert "partial_sum" in p or "Partial" in p, p


def test_ind_discovery_two_aggregates_no_pair_join(spark):
    """dq_inclusion_dependencies: the O(n^2) column lattice must come
    from two hash aggregates (bit_or per value, bit_and per column) —
    no join of any kind in the plan, one scan per candidate table."""
    p = plan_of(spark, "dq_inclusion_dependencies")
    assert "Join" not in p, p
    assert "Window" not in p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p
    import re
    # one scan PER CANDIDATE COLUMN (16), each pruned to that single
    # column — narrower total I/O than merging same-table branches
    # (containment, not exact count: metadata-string truncation varies
    # with session state set by earlier tests)
    assert len(re.findall(r"Scan parquet", p)) == 16, p
    assert "ReadSchema: struct<c_custkey:bigint" in p, p


def test_lexical_richness_wordcount_shape(spark):
    """text_lexical_richness: explode -> (source, word) map-side-
    combined agg -> per-source tail; one scan, no window, no Python."""
    p = plan_of(spark, "text_lexical_richness")
    import re
    assert len(re.findall(r"Scan parquet", p)) == 1, p
    assert "Window" not in p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p
    assert "partial_" in p, p


def test_emerging_hotspots_no_pair_join(spark):
    """spatial_emerging_hotspots: the 27-bin space-time neighborhood
    must be the Expand + hash-agg spelling (C156 trick) — the only
    joins are the fact-to-layer equi-join, the dense-cube left join
    and the neighbor-sum equi-join back; no cartesian over data-sized
    input (the cells x months crossJoin is grid x calendar bounded),
    no Python, and the O(months^2) Mann-Kendall stage is in-row."""
    p = plan_of(spark, "spatial_emerging_hotspots")
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p
    assert "Expand" in p or "Generate explode" in p, p


def test_dbscan_blocked_pair_join_no_cartesian(spark):
    """spatial_dbscan: the eps-neighbor stage must ride the grid-cell
    equi-join (never a cartesian/BNLJ over the point pairs); the
    component stage's lineage is checkpointed (ExistingRDD) per the
    propagate_min_labels contract; no Python anywhere."""
    p = plan_of(spark, "spatial_dbscan")
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p
    # the only BNLJs are the noise row's two 1-row count crossJoins
    assert p.count("BroadcastNestedLoopJoin") <= 2, p


def test_kruskal_wallis_rank_decomposition(spark):
    """stats_kruskal_wallis: rank sums decompose through per-distinct-
    value tables — 4 single-column fact scans (midrank pair + group-
    value agg + tie re-reference), no global row-level sort, no Python."""
    p = plan_of(spark, "stats_kruskal_wallis")
    import re
    assert len(re.findall(r"Scan parquet", p)) == 4, p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p


def test_levene_bf_two_scans(spark):
    """stats_levene_bf: exact group medians build once and broadcast
    back — 2 fact scans, broadcast join, no window."""
    p = plan_of(spark, "stats_levene_bf")
    import re
    assert len(re.findall(r"Scan parquet", p)) == 2, p
    assert "BroadcastHashJoin" in p
    assert "Window" not in p


def test_runs_test_day_partitioned_adjacency(spark):
    """stats_runs_test: global adjacency = day-PARTITIONED lag +
    cross-day boundary lag over the day-summary table; the only
    unpartitioned window input is calendar-bounded."""
    p = plan_of(spark, "stats_runs_test")
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p
    # the within-day lag must be hash-partitioned
    assert "hashpartitioning(day" in p, p


def test_quantize_geometry_zero_shuffle(spark):
    """etl_quantize_geometry: pure in-row HOF generalization — one
    scan, no exchange-producing operator at all, no Python."""
    p = plan_of(spark, "etl_quantize_geometry")
    import re
    assert len(re.findall(r"Scan parquet", p)) == 1, p
    assert "Exchange" not in p, p
    assert "Window" not in p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p


def test_colocation_quotient_group_limit(spark):
    """spatial_colocation_quotient: the kNN stage must keep O(k) state
    per feature (WindowGroupLimit under the rank filter), candidates
    ride the grid-blocked equi-join, and the tail is dimension-sized."""
    p = plan_of(spark, "spatial_colocation_quotient")
    assert "WindowGroupLimit" in p, p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p


def test_incremental_morans_single_pair_join(spark):
    """spatial_incremental_morans: ONE grid-blocked pair join at the
    max band feeds all 4 bands via conditional aggregation (the
    Ripley trick) — exactly one equi-join of the point table with
    itself, no cartesian, no Python."""
    p = plan_of(spark, "spatial_incremental_morans")
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p
    import re
    # per-reference re-plan (the C157 lesson): the pair subtree (2
    # point scans) is referenced by nums and by the degree pass, the
    # moment row by several combines — 10 narrow scans of the POINT
    # table (a dimension here); at scale the pair table would persist
    assert len(re.findall(r"Scan parquet", p)) == 10, p


def test_generalize_geometry_map_only_plus_spread(spark):
    """etl_generalize_geometry: iterative in-row HOF thinning — one
    scan, zero Python, zero Window, and exactly ONE Exchange: the r12
    spread_for_fanout round-robin placed before the compute-dense
    sweep ladder (the 2.9 -> 1.2 s fix for the single-split scan; at
    scale it degrades to a balancing pass). A second Exchange would
    mean a shuffle crept into the thinning itself — still forbidden."""
    p = plan_of(spark, "etl_generalize_geometry")
    import re
    assert len(re.findall(r"Scan parquet", p)) == 1, p
    assert len(re.findall(r"Exchange", p)) == 1, p
    assert "RoundRobinPartitioning" in p, p
    assert "Window" not in p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p


def test_hilbert_key_spread_plan(spark):
    """etl_hilbert_key: in-row HOF walk — single scan, exactly ONE
    round-robin Exchange (the optimization-r12 spread_for_fanout
    pattern: the 16-level interpreted walk must not run in one task on
    a single-split scan), no Python."""
    p = plan_of(spark, "etl_hilbert_key")
    import re
    assert len(re.findall(r"Scan parquet", p)) == 1, p
    assert len(re.findall(r"Exchange", p)) == 1, p
    assert "RoundRobinPartitioning" in p, p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p


def test_hilbert_curve_bijective_unit_steps(spark):
    """FULL-curve properties on a dense 32x32 grid (order-5 curve):
    the key is a bijection onto 0..1023 and consecutive keys are
    Manhattan-distance-1 cells — the strict-locality guarantee that
    separates Hilbert from the Z curve (which jumps at quadrant
    seams). Sample checks can't establish either; the dense grid
    does."""
    from etl_arcgis_spark.operators.etl import _h_spark_expr

    df = (
        spark.range(32 * 32)
        .selectExpr(
            "CAST(id % 32 AS BIGINT) AS x", "CAST(id DIV 32 AS BIGINT) AS y"
        )
        .selectExpr("x", "y", f"CAST({_h_spark_expr(5, 32)} AS BIGINT) AS d")
    )
    rows = df.collect()
    by_d = {r.d: (r.x, r.y) for r in rows}
    assert sorted(by_d) == list(range(1024))  # bijective onto 0..1023
    assert all(
        abs(by_d[d][0] - by_d[d + 1][0]) + abs(by_d[d][1] - by_d[d + 1][1]) == 1
        for d in range(1023)
    )  # every curve step is a unit step


def test_geometry_precision_single_agg(spark):
    """etl_geometry_precision: one scan, one hash aggregate on the
    5-value segment key — map-side combinable, no window/Python."""
    p = plan_of(spark, "etl_geometry_precision")
    import re
    assert len(re.findall(r"Scan parquet", p)) == 1, p
    assert "Window" not in p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p


def test_utm_reproject_no_exchange(spark):
    """geo_reproject_utm: pure codegen series math — no Exchange, no
    Python, single scan."""
    p = plan_of(spark, "geo_reproject_utm")
    import re
    assert len(re.findall(r"Scan parquet", p)) == 1, p
    assert "Exchange" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p


def test_hex_tessellation_single_agg_no_pairs(spark):
    """spatial_hex_tessellation: projection + ONE cell-keyed hash
    aggregate — the C155 quadkey shape; no join at all."""
    p = plan_of(spark, "spatial_hex_tessellation")
    assert "Join" not in p, p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p


def test_ann_ratio_no_cartesian_no_python(spark):
    """spatial_avg_nearest_neighbor: grid-blocked pair join + 1-row
    broadcast combine — never a cartesian product."""
    p = plan_of(spark, "spatial_avg_nearest_neighbor")
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p


def test_cidr_lpm_broadcast_equi_join(spark):
    """join_ip_cidr_lpm: the LPM decomposition must EQUI-join against
    the broadcast CIDR dimension (never a range/nested-loop join) and
    reduce map-side."""
    p = plan_of(spark, "join_ip_cidr_lpm")
    assert "BroadcastHashJoin" in p, p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p, p


def test_theil_two_data_passes(spark):
    """stats_theil_decomposition: the round-8 respell — at most 3
    parquet scans (group-moment pass + fused term pass + the 5-row
    re-planned moment subtree), down from 10 in the naive spelling."""
    p = plan_of(spark, "stats_theil_decomposition")
    import re
    assert len(re.findall(r"Scan parquet", p)) <= 3, p
    assert "CartesianProduct" not in p


def test_holt_no_window_no_python(spark):
    """ts_holt_linear: the recursion lives in an in-row fold — no
    Window operator anywhere, no Python."""
    p = plan_of(spark, "ts_holt_linear")
    assert "Window" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p


def test_kmeans_broadcast_esteps_no_cartesian_data_join(spark):
    """ml_kmeans_clusters: every E-step is a 1-row broadcast combine;
    the only joins over DATA-sized relations are hash joins."""
    p = plan_of(spark, "ml_kmeans_clusters")
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p


def test_lof_window_group_limit_and_no_cartesian(spark):
    """spatial_lof_outliers: the kNN stage keeps O(k) state per source
    (WindowGroupLimit under rank <= 3) and candidates ride the
    grid-blocked equi-join."""
    p = plan_of(spark, "spatial_lof_outliers")
    assert "WindowGroupLimit" in p, p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p


def test_substring_dedup_plan_and_conservation(spark):
    """dedup_substring_exact (r9 order #3): plan = explode + one
    gram-hash aggregate + one co-partitioned join back + one doc-keyed
    aggregate — no Window over the corpus, no Python stage, no
    cartesian. Property: removed + kept token mass = total mass, and
    the global FIRST occurrence of every gram is never removed (the
    first doc in doc_id order has removal 0 unless it self-repeats)."""
    import re

    p = plan_of(spark, "dedup_substring_exact")
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p, p
    assert "Window" not in p, p

    from etl_arcgis_spark.registry import all_queries

    df = all_queries()["dedup_substring_exact"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) == 500
    for r in rows:
        assert r.removed_tokens + r.kept_tokens == r.n_tokens
        assert 0 <= r.removed_tokens <= r.n_tokens
        assert r.removal_bp == r.removed_tokens * 10000 // r.n_tokens
    # corpus mass conservation
    tot = sum(r.n_tokens for r in rows)
    rem = sum(r.removed_tokens for r in rows)
    assert 0 < rem < tot  # the fixture corpus does repeat substrings


def test_huff_model_codegen_od_star(spark):
    """spatial_huff_model (r9 order #7): demand-point-aggregated OD
    star — no Python stage, no cartesian on the FACT (the only cross
    join is origins×broadcast(stores) over the bounded lattice-cell
    relation), window partitioned by cell. Property: market shares sum
    to 100% (each customer's probabilities sum to 1)."""
    p = plan_of(spark, "spatial_huff_model")
    assert "BatchEvalPython" not in p and "ArrowEval" not in p, p
    from etl_arcgis_spark.registry import all_queries

    df = all_queries()["spatial_huff_model"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) == 10  # sf0.001 suppliers
    assert abs(sum(r.market_share_pct for r in rows) - 100.0) < 1e-6
    assert abs(sum(r.captured_demand for r in rows) - 150.0) < 1e-6
    assert all(r.captured_demand > 0 for r in rows)


def test_gwr_local_mean_grid_blocked(spark):
    """spatial_gwr_local_mean: grid-blocked pair generation — no
    cartesian/NLJ, no Python, single groupBy. Properties: every point
    has >=1 neighbor (itself, w=1), and a local mean always lies
    within the [min, max] of the attribute (weighted-mean convexity)."""
    p = plan_of(spark, "spatial_gwr_local_mean")
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p, p
    from etl_arcgis_spark.registry import all_queries

    rows = all_queries()["spatial_gwr_local_mean"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 150
    assert all(r.n_nbrs >= 1 for r in rows)
    vs = [r.local_mean for r in rows]
    assert min(vs) >= -994.29 and max(vs) <= 9997.42


def test_kendall_tau_bounded_pairs(spark):
    """stats_kendall_tau: facts reduce to 25 nation rows before any
    pair forms; all counts integer-exact. Properties: C+D+Tx+Ty +
    both-tied = n(n-1)/2, tau_b in [-1, 1], and tau_b agrees with
    scipy-free pure-Python recomputation from the same cent sums."""
    from etl_arcgis_spark.registry import all_queries
    from etl_arcgis_spark.tables import table
    from pyspark.sql import functions as F
    import math

    sf = "/root/testdata/sf0.001"
    row = all_queries()["stats_kendall_tau"](spark, sf).collect()[0]
    n0 = row.n * (row.n - 1) // 2
    assert row.concordant + row.discordant <= n0
    assert -1.0 <= row.tau_b <= 1.0
    cents = lambda c: F.floor(F.col(c) * 100 + F.lit(0.5)).cast("bigint")  # noqa: E731
    cn = {r.nk: r.x for r in table(spark, sf, "customer").groupBy(
        F.col("c_nationkey").alias("nk")).agg(F.sum(cents("c_acctbal")).alias("x")).collect()}
    sn = {r.nk: r.y for r in table(spark, sf, "supplier").groupBy(
        F.col("s_nationkey").alias("nk")).agg(F.sum(cents("s_acctbal")).alias("y")).collect()}
    v = [(cn[k], sn.get(k, 0)) for k in sorted(cn)]
    C = D = TX = TY = 0
    for i in range(len(v)):
        for j in range(i + 1, len(v)):
            (xa, ya), (xb, yb) = v[i], v[j]
            if (xa < xb and ya < yb) or (xa > xb and ya > yb):
                C += 1
            elif (xa < xb and ya > yb) or (xa > xb and ya < yb):
                D += 1
            elif xa == xb and ya != yb:
                TX += 1
            elif ya == yb and xa != xb:
                TY += 1
    assert (row.concordant, row.discordant, row.ties_x_only, row.ties_y_only) == (C, D, TX, TY)
    tau = (C - D) / math.sqrt(float((C + D + TX) * (C + D + TY)))
    assert abs(row.tau_b - tau) < 5e-5


def test_intradoc_repetition_zero_shuffle(spark):
    """text_intradoc_repetition: map-only — one scan, no Exchange, no
    Window, no Python. Properties: covered <= n_tokens, bp consistent,
    distinct <= total bigrams, and covered=0 iff no repeated bigram."""
    import re

    p = plan_of(spark, "text_intradoc_repetition")
    assert len(re.findall(r"Scan parquet", p)) == 1, p
    assert "Exchange" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p, p
    from etl_arcgis_spark.registry import all_queries

    rows = all_queries()["text_intradoc_repetition"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 500
    for r in rows:
        assert 0 <= r.covered_tokens <= r.n_tokens
        assert r.distinct_bigrams <= r.n_bigrams == max(r.n_tokens - 1, 0)
        assert r.repetition_bp == r.covered_tokens * 10000 // r.n_tokens
        if r.distinct_bigrams == r.n_bigrams:
            assert r.covered_tokens == 0


def test_isotonic_calibration_properties(spark):
    """dq_isotonic_calibration: the fit is monotone nondecreasing in
    bin order, bounded by [0,1], and pool-conserving (the weighted sum
    of fitted rates equals the total positive count — PAVA preserves
    block means); matches sklearn-free pure-Python PAVA."""
    from etl_arcgis_spark.registry import all_queries

    rows = sorted(
        all_queries()["dq_isotonic_calibration"](
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r.bin,
    )
    fits = [r.iso_rate for r in rows]
    assert fits == sorted(fits)  # monotone
    assert all(0.0 <= f <= 1.0 for f in fits)
    # pure-Python PAVA on the same (w, s) bins
    blocks = []
    for r in rows:
        blocks.append([r.n, r.n_pos, 1])
        while len(blocks) >= 2 and blocks[-2][1] * blocks[-1][0] >= blocks[-1][1] * blocks[-2][0]:
            w2, s2, c2 = blocks.pop()
            blocks[-1][0] += w2
            blocks[-1][1] += s2
            blocks[-1][2] += c2
    want = []
    for w, s, c in blocks:
        want.extend([s / w] * c)

    def r4(x):
        import math
        return math.floor(abs(x) * 10000 + 0.5) / 10000

    assert fits == [r4(v) for v in want]
    # conservation: sum over bins of w * exact fraction = total positives
    tot_pos = sum(r.n_pos for r in rows)
    acc = sum(w * (s / w) for w, s, c in blocks for _ in range(1))  # block means exact
    assert abs(sum(s for w, s, c in blocks) - tot_pos) == 0


def test_kn_bigram_and_neyman_shapes(spark):
    """text_perplexity_kn_bigram: LM star — model dims broadcast back
    onto the bigram stream, no cartesian on facts, no Python.
    sample_neyman_allocation: allocation fractions sum to 1 and every
    stratum with sd>0 gets a positive allotment."""
    p = plan_of(spark, "text_perplexity_kn_bigram")
    assert "CartesianProduct" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEval" not in p, p
    from etl_arcgis_spark.registry import all_queries

    rows = all_queries()["sample_neyman_allocation"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert abs(sum(r.alloc_frac for r in rows) - 1.0) < 1e-3  # r4 per-row
    assert abs(sum(r.n_alloc for r in rows) - 1000.0) < 1.0
    assert all(r.n_alloc > 0 for r in rows if r.stratum_sd > 0)
    # KN ppl sanity: bounded below by 1 (probabilities <= 1)
    kn = all_queries()["text_perplexity_kn_bigram"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert all(r.ppl >= 1.0 for r in kn)
    assert all(r.avg_nll > 0 for r in kn)


def test_token_concentration_monotone_and_conserving(spark):
    """corpus_token_concentration: 10 deciles, monotone cumulative
    share ending at exactly 10000 bp, doc counts partition the corpus,
    and the curve is concave-ish (longest decile holds the largest
    mass since ranking is by length desc)."""
    from etl_arcgis_spark.registry import all_queries

    rows = sorted(
        all_queries()["corpus_token_concentration"](
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r.decile,
    )
    assert [r.decile for r in rows] == list(range(1, 11))
    assert sum(r.n_docs for r in rows) == 500
    assert rows[-1].cum_share_bp == 10000
    shares = [r.cum_share_bp for r in rows]
    assert shares == sorted(shares)
    masses = [r.chars for r in rows]
    assert masses == sorted(masses, reverse=True)  # decile 1 = longest docs
    assert rows[-1].cum_chars == sum(masses)
