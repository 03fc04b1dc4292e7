"""Semantics tests for the round-7 statistics/profiling operators —
brute-force references on crafted inputs (the check.py oracles prove
fixture agreement; these prove the FORMULAS on adversarial cases:
ties, degenerate series, planted IND violations, known burstiness)."""

from __future__ import annotations

import itertools
import math

from pyspark.sql import functions as F

from etl_arcgis_spark.operators.timeseries import mk_s_expr, mk_tie_expr


def _mk_brute(xs):
    s = sum(
        (0 if xs[j] == xs[i] else (1 if xs[j] > xs[i] else -1))
        for i, j in itertools.combinations(range(len(xs)), 2)
    )
    n = len(xs)
    ties = {}
    for x in xs:
        ties[x] = ties.get(x, 0) + 1
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var = (n * (n - 1) * (2 * n + 5) - tie_term) / 18.0
    return s, tie_term, var


def test_mk_hofs_match_brute_force(spark):
    """The in-row S and tie-term HOFs equal the O(n^2) definition on
    tie-heavy, monotone, constant and short series."""
    cases = [
        [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0],  # ties
        [1.0, 2.0, 3.0, 4.0, 5.0],                            # monotone up
        [5.0, 4.0, 3.0, 2.0, 1.0],                            # monotone down
        [2.0, 2.0, 2.0, 2.0],                                 # constant
        [1.0, 1.0],                                           # minimal
        [7.5],                                                # single point
    ]
    rows = [(i, xs) for i, xs in enumerate(cases)]
    df = spark.createDataFrame(rows, "id int, seq array<double>").select(
        "id",
        "seq",
        F.size("seq").alias("n"),
        F.array_sort("seq").alias("rv"),
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            mk_s_expr("seq", "n").alias("s"),
            mk_tie_expr("rv", "n").alias("tie"),
        ).collect()
    }
    for i, xs in enumerate(cases):
        s, tie, _ = _mk_brute(xs)
        assert out[i]["s"] == s, (i, xs)
        # single-point series: tie fold still counts the run of 1 -> 0
        assert out[i]["tie"] == float(tie), (i, xs)


def test_weiszfeld_objective_strictly_improves(spark):
    """The registered median center achieves a strictly smaller sum of
    distances than the mean center on every fixture (the defining
    property of the geometric median), and both stay inside the
    lattice bounding box."""
    from etl_arcgis_spark import registry

    registry.load_all()
    row = registry.QUERIES["spatial_median_center"](
        spark, "/root/testdata/sf0.01"
    ).collect()[0]
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        "'/root/testdata/sf0.01/customer.parquet'"
    )
    pts = con.execute(
        "SELECT CAST((c_custkey % 360) - 180 + 0.5 AS DOUBLE),"
        " CAST((c_custkey % 160) - 80 + 0.5 AS DOUBLE) FROM customer"
    ).fetchall()

    def sum_d(cx, cy):
        return sum(math.hypot(x - cx, y - cy) for x, y in pts)

    if (row.median_x, row.median_y) != (row.mean_x, row.mean_y):
        assert sum_d(row.median_x, row.median_y) < sum_d(row.mean_x, row.mean_y)
    else:  # converged onto the mean at r4 precision — equal objective
        assert sum_d(row.median_x, row.median_y) <= sum_d(row.mean_x, row.mean_y)
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    assert min(xs) <= row.median_x <= max(xs)
    assert min(ys) <= row.median_y <= max(ys)


def test_ind_bitmask_finds_planted_violation(spark, tmp_path):
    """The bitmask lattice logic on a crafted pair: A ⊆ B holds, B ⊄ A
    (B has an extra value) — reproduced with the same bit_or/bit_and
    spelling over an in-memory frame."""
    a = spark.createDataFrame([(v,) for v in [1, 2, 3]], "v bigint").select(
        "v", F.lit(1).cast("bigint").alias("bit")
    )
    b = spark.createDataFrame([(v,) for v in [1, 2, 3, 4]], "v bigint").select(
        "v", F.lit(2).cast("bigint").alias("bit")
    )
    masks = a.unionAll(b).groupBy("v").agg(F.bit_or("bit").alias("mask"))
    member = masks.select(
        F.explode(
            F.expr("filter(sequence(0, 1), i -> (shiftright(mask, i) % 2) = 1)")
        ).alias("a"),
        "mask",
    )
    contained = {
        r["a"]: r["inds"]
        for r in member.groupBy("a").agg(F.bit_and("mask").alias("inds")).collect()
    }
    assert contained[0] & 2, "A ⊆ B must hold"
    assert not (contained[1] & 1), "B ⊄ A (value 4 breaks it)"


def test_burstiness_known_series(spark):
    """B and M on hand-computable series: constant gaps -> B = -1 and
    M undefined (zero variance); the registered aggregate skips the
    undefined M (NULL avg semantics) rather than emitting NaN."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # user 1: constant 60s gaps (6 events, 5 gaps) -> sd=0, B=-1, M undefined
    for i in range(6):
        rows.append((i, base + datetime.timedelta(seconds=60 * i), 1, "a", 0.0, ""))
    # user 2: gaps 10,20,30,40,50s -> hand-computed B; M defined on 4 pairs
    t = base
    rows.append((10, t, 2, "a", 0.0, ""))
    for j, g in enumerate([10, 20, 30, 40, 50]):
        t = t + datetime.timedelta(seconds=g)
        rows.append((11 + j, t, 2, "a", 0.0, ""))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    import etl_arcgis_spark.operators.timeseries as ts_mod
    import etl_arcgis_spark.tables as tables

    orig = tables.table
    try:
        tables.table = lambda s, d, n: df  # route the events read
        ts_mod.table = tables.table
        out = ts_mod.ts_burstiness.__wrapped__(spark, "ignored") \
            if hasattr(ts_mod.ts_burstiness, "__wrapped__") else \
            ts_mod.ts_burstiness(spark, "ignored")
        r = out.collect()[0]
    finally:
        tables.table = orig
        ts_mod.table = orig
    gaps = [10e6, 20e6, 30e6, 40e6, 50e6]
    mu = sum(gaps) / 5
    sd = math.sqrt(sum((g - mu) ** 2 for g in gaps) / 4)
    b2 = (sd - mu) / (sd + mu)
    b_expected = round(((-1.0) + b2) / 2, 4)  # avg over the two series
    assert r.n_series == 2
    assert abs(r.avg_burstiness - b_expected) < 1e-9
    # M: only user 2 contributes (user 1 has zero gap variance)
    x = gaps[1:]
    y = gaps[:-1]
    nmp = 4.0
    num = nmp * sum(a * b for a, b in zip(x, y)) - sum(x) * sum(y)
    den = math.sqrt(
        (nmp * sum(a * a for a in x) - sum(x) ** 2)
        * (nmp * sum(b * b for b in y) - sum(y) ** 2)
    )
    assert abs(r.avg_memory - round(num / den, 4)) < 1e-9


def test_midranks_match_brute_force(spark):
    """aggregates._midranks (IEEE-exponent bucketed two-phase
    cumulative) equals the textbook tie-averaged midrank on value sets
    that stress the bucketing: negatives, zero, values straddling
    power-of-two boundaries, heavy ties, and sub-1 magnitudes."""
    from etl_arcgis_spark.operators.aggregates import _midranks

    values = [
        -8.0, -8.0, -3.5, -1.0, -0.25, 0.0, 0.0, 0.0, 0.25, 0.5,
        0.5, 1.0, 1.0, 2.0, 2.0000001, 4.0, 4.0, 4.0, 7.9, 8.0,
        1023.5, 1024.0, 1e-300, -1e-300, 123456.789,
    ]
    rows = [(float(v),) for v in values]
    df = spark.createDataFrame(rows, "v double")
    pv = df.groupBy("v").agg(F.count("*").cast("double").alias("cnt"))
    got = {r["v"]: r["midrank"] for r in _midranks(pv).collect()}
    # brute: sort all values, midrank = average 1-based rank per value
    svals = sorted(values)
    import collections
    want = {}
    for v, n in collections.Counter(values).items():
        lo = svals.index(v) + 1
        want[v] = (lo + (lo + n - 1)) / 2.0
    assert got == want, (got, want)
