"""Invariant tests for the late-round-5 operators (SURVEY.md §2
C117–C122) — the §5.4 double net beside the DuckDB oracles.

Each test pins a property the oracle diff cannot express:
- regr_*: the OLS normal-equation identity avg_y = intercept +
  slope·avg_x holds per group (any correct fit satisfies it; a
  swapped-argument or biased-moment bug breaks it);
- k-anonymity: risk counts are monotone in k, fractions are sane, and
  a planted singleton class is detected at every k;
- Adamic-Adar: a hand-built co-purchase graph with a known best link
  and a known 1/ln score;
- Welch t: antisymmetry under group swap and the df bracket
  min(n1,n2)-1 <= df <= n1+n2-2;
- CDC chunking: boundary LOCALITY — prepending a token to a document
  changes only its first chunk, every later chunk is byte-identical
  (the property fixed-stride chunking lacks, and the reason CDC
  exists).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_arcgis_spark.operators.aggregates import (
    stats_regression_funcs,
    stats_ttest_welch,
)
from etl_arcgis_spark.operators.graph import graph_adamic_adar_top_link
from etl_arcgis_spark.operators.quality import dq_k_anonymity

SF = "/root/testdata/sf0.01"


def test_regr_normal_equation_identity(spark):
    rows = stats_regression_funcs(spark, SF).collect()
    assert len(rows) == 3
    for r in rows:
        # rounded columns -> allow the two rounding grids to stack
        assert abs(r.avg_y - (r.intercept + r.slope * r.avg_x)) < 0.51
        assert 0.0 <= r.r2 <= 1.0
        assert r.n > 0


def test_k_anonymity_monotone_and_sane(spark):
    rows = {r.k: r for r in dq_k_anonymity(spark, SF).collect()}
    assert sorted(rows) == [2, 5, 10]
    prev_c = prev_r = 0
    for k in (2, 5, 10):
        r = rows[k]
        assert r.n_classes_below >= prev_c and r.n_rows_at_risk >= prev_r
        assert 0.0 <= r.pct_at_risk <= 1.0
        assert r.n_rows_at_risk >= r.n_classes_below  # classes hold >=1 row
        prev_c, prev_r = r.n_classes_below, r.n_rows_at_risk


def test_adamic_adar_known_instance(spark, tmp_path):
    # customers 1,2 share parts {10, 11}; part 10 also bought by 3
    # (deg 3), part 11 only by 1,2 (deg 2). Customer 3 shares only
    # part 10 with each -> n_common 1 < 3, filtered. With threshold 3
    # nothing survives; widen evidence: give 1,2 a third shared part.
    edges = [  # (custkey, partkey)
        (1, 10), (1, 11), (1, 12),
        (2, 10), (2, 11), (2, 12),
        (3, 10),
    ]
    orders = spark.createDataFrame(
        [(c * 100 + p, c) for c, p in edges], "o_orderkey long, o_custkey long"
    )
    li = spark.createDataFrame(
        [(c * 100 + p, p) for c, p in edges], "l_orderkey long, l_partkey long"
    )
    d = tmp_path / "aa"
    orders.write.parquet(str(d / "orders.parquet"))
    li.write.parquet(str(d / "lineitem.parquet"))
    out = {r.custkey: r for r in graph_adamic_adar_top_link(spark, str(d)).collect()}
    # only the (1, 2) pair has >= 3 common parts; reported once from ca=1
    assert set(out) == {1}
    r = out[1]
    assert r.predicted_custkey == 2 and r.n_common == 3
    want = 1 / math.log(3) + 2 / math.log(2)  # part 10 deg 3; parts 11,12 deg 2
    assert abs(r.aa_score - want) < 1e-3


def test_welch_antisymmetry_and_df_bracket(spark):
    r = stats_ttest_welch(spark, SF).collect()[0]
    assert min(r.n1, r.n2) - 1 <= r.welch_df <= r.n1 + r.n2 - 2
    # antisymmetry: swapping the groups flips t and mean_diff
    from etl_arcgis_spark.tables import table

    li = table(spark, SF, "lineitem").withColumn(
        "l_returnflag",
        F.when(F.col("l_returnflag") == "R", "N")
        .when(F.col("l_returnflag") == "N", "R")
        .otherwise(F.col("l_returnflag")),
    )
    li.createOrReplaceTempView("_welch_swapped")
    # re-run the same moment pipeline over the swapped frame
    x = F.col("l_extendedprice")
    is1 = F.col("l_returnflag") == "R"
    is2 = F.col("l_returnflag") == "N"
    m = li.agg(
        F.sum(is1.cast("long")).alias("n1"),
        F.sum(is2.cast("long")).alias("n2"),
        F.sum(F.when(is1, x).otherwise(0.0)).alias("s1"),
        F.sum(F.when(is2, x).otherwise(0.0)).alias("s2"),
    ).collect()[0]
    swapped_diff = m.s1 / m.n1 - m.s2 / m.n2
    assert abs(swapped_diff + r.mean_diff) < 1e-2
    assert m.n1 == r.n2 and m.n2 == r.n1


def _cdc_chunks_of(spark, texts):
    docs = spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    out = (
        docs.withColumn("l", F.split("text", " "))
        .withColumn(
            "b",
            F.expr(
                "filter(sequence(1, size(l)), "
                "i -> substring(md5(element_at(l, i)), 32, 1) IN ('0', '8'))"
            ),
        )
        .withColumn(
            "chunks",
            F.expr(
                "transform(filter(transform(sequence(1, size(b) + 1), "
                "j -> named_struct("
                "  's', CASE WHEN j = 1 THEN 1 ELSE element_at(b, j - 1) + 1 END,"
                "  'e', CASE WHEN j <= size(b) THEN element_at(b, j) ELSE size(l) END"
                ")), seg -> seg.e >= seg.s), "
                "seg -> array_join(slice(l, seg.s, seg.e - seg.s + 1), ' '))"
            ),
        )
        .select("doc_id", "chunks")
        .collect()
    )
    return {r.doc_id: r.chunks for r in out}


def test_cdc_boundary_locality_and_reconstruction(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away home"
    shifted = "zz " + base
    chunks = _cdc_chunks_of(spark, [base, shifted])
    # reconstruction: chunks concatenate back to the exact document
    assert " ".join(chunks[0]) == base
    assert " ".join(chunks[1]) == shifted
    # locality: after the first chunk of each, the chunk sequences of
    # base and shifted are IDENTICAL (an insertion shifts no later
    # boundary — the defining CDC property)
    assert chunks[0][1:] == chunks[1][1:]
    assert chunks[1][0] == "zz " + chunks[0][0]


def test_mannwhitney_known_instance(spark, tmp_path):
    # group R = {0.01, 0.02, 0.03}, N = {0.04, 0.05, 0.06}: every R
    # below every N -> U = 0, z at its minimum for n1=n2=3; no ties.
    rows = [("R", 0.01), ("R", 0.02), ("R", 0.03),
            ("N", 0.04), ("N", 0.05), ("N", 0.06)]
    df = spark.createDataFrame(rows, "l_returnflag string, l_discount double")
    d = tmp_path / "mw"
    df.write.parquet(str(d / "lineitem.parquet"))
    from etl_arcgis_spark.operators.aggregates import stats_mannwhitney_u

    r = stats_mannwhitney_u(spark, str(d)).collect()[0]
    assert (r.n1, r.n2) == (3, 3)
    assert r.u_stat == 0.0
    # no ties: sigma = sqrt(9*7/12) = 2.2913; z = (0-4.5)/2.2913
    assert abs(r.z_score - (-4.5 / (9 * 7 / 12.0) ** 0.5)) < 1e-3


def test_k_anonymity_planted_singleton(spark, tmp_path):
    # 10 identical-QI customers + ONE singleton (unique nation) ->
    # exactly one class below every k, holding exactly one row.
    rows = [(i, 7, "AUTO", 500.0) for i in range(10)] + [(99, 23, "AUTO", 500.0)]
    df = spark.createDataFrame(
        rows, "c_custkey long, c_nationkey int, c_mktsegment string, c_acctbal double"
    )
    d = tmp_path / "ka"
    df.write.parquet(str(d / "customer.parquet"))
    out = {r.k: r for r in dq_k_anonymity(spark, str(d)).collect()}
    assert out[2].n_classes_below == 1 and out[2].n_rows_at_risk == 1
    assert out[5].n_classes_below == 1 and out[5].n_rows_at_risk == 1
    # at k=10 the 10-member class itself falls below too (10 < 10 is
    # false -> still just the singleton)
    assert out[10].n_classes_below == 1 and out[10].n_rows_at_risk == 1
    assert abs(out[2].pct_at_risk - 1 / 11) < 1e-3


def test_calibration_bins_partition_corpus(spark):
    from etl_arcgis_spark.operators.quality import dq_score_calibration
    from etl_arcgis_spark.tables import table

    out = dq_score_calibration(spark, SF).collect()
    n_docs = table(spark, SF, "documents").count()
    assert sum(r.n for r in out) == n_docs
    for r in out:
        assert 0 <= r.bin <= 9
        assert 0.0 <= r.label_rate <= 1.0 and 0.0 <= r.avg_score <= 1.0
        assert abs(r.abs_gap - abs(r.avg_score - r.label_rate)) < 2e-4
    ece = sum(r.n * r.abs_gap for r in out) / n_docs
    assert 0.0 <= ece <= 1.0


def test_seasonal_strength_planted_series(spark, tmp_path):
    """A pure hour-of-day pattern scores ~1; a perfectly flat series
    scores exactly 0 (the Var(d)=0 guard, not NaN)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(7):
        for hod in range(24):
            # 'seasonal': 1 event normally, 40 at hour 3 — strong hod
            # pattern identical across days (trend removes nothing)
            for _ in range(40 if hod == 3 else 1):
                rows.append((eid, "seasonal", base + dt.timedelta(days=day, hours=hod), 1, 1.0))
                eid += 1
            # 'flat': exactly 2 events every hour -> detrended == 0
            for _ in range(2):
                rows.append((eid, "flat", base + dt.timedelta(days=day, hours=hod), 1, 1.0))
                eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, user_id long, value double"
    )
    d = tmp_path / "seas"
    df.write.parquet(str(d / "events.parquet"))
    from etl_arcgis_spark.operators.timeseries import ts_seasonal_strength

    out = {r.event_type: r for r in ts_seasonal_strength(spark, str(d)).collect()}
    assert out["flat"].seasonal_strength == 0.0
    assert out["seasonal"].seasonal_strength > 0.95


def test_match_varlen_known_instances(spark):
    """window_match_varlen semantics on a handcrafted sequence:
    D3-U2 matches DOWN{2,5} UP{1,3}; a 6-step decline does NOT (anchored
    maximal runs); a flat step breaks adjacency; an over-long up-run
    rejects; the measure is the matched down-run's cumulative drop."""
    import datetime as dt

    from etl_arcgis_spark.operators.windows import (
        compile_runlength_pattern,
        window_match_varlen,
    )
    from pyspark.sql import functions as F

    def seq(uid, vals):
        t0 = dt.datetime(2024, 1, 1)
        return [
            (uid * 1000 + i, t0 + dt.timedelta(seconds=i), uid, "view",
             float(v), "{}")
            for i, v in enumerate(vals)
        ]

    rows = (
        seq(1, [10, 9, 8, 7, 8, 9])          # D3 then U2 -> match, drop 3
        + seq(2, [9, 8, 7, 6, 5, 4, 3, 4])   # D6 U1 -> no match (run too long)
        + seq(3, [5, 4, 3, 3, 4])            # D2 F1 U1 -> flat breaks it
        + seq(4, [5, 4, 3, 4, 5, 6, 7])      # D2 U4 -> up-run too long
        + seq(5, [5, 3, 1, 2, 9, 8, 7, 8])   # D2 U2 match + D2 U1 match
    )
    df = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING,"
              " value DOUBLE, props STRING",
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "events.parquet")
        )
        got = {
            r.user_id: (r.n_matches, r.longest_match, r.deepest_drop)
            for r in window_match_varlen(spark, d).collect()
        }
    assert got == {1: (1, 5, 3.0), 5: (2, 4, 4.0)}
