"""Invariant tests for the time-series/behavior suite (timeseries.py).

The DuckDB oracle (tools/check.py) already proves value parity; these
tests pin the *semantic* invariants that an oracle diff can't express
as clearly — grid alignment, envelope containment, funnel monotonicity
— on the sf0.001 fixtures.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_arcgis_spark.operators.timeseries import (
    analytics_cohort_retention,
    analytics_funnel_steps,
    ts_gap_detect,
    ts_ohlc_downsample,
    ts_resample_hourly_ffill,
    window_zscore_anomaly,
)

SF = "/root/testdata/sf0.001"
HOUR_US = 3_600_000_000


def test_resample_grid_is_hour_aligned_and_dense(spark):
    grid = ts_resample_hourly_ffill(spark, SF)
    bad = grid.filter(F.col("grid_us") % HOUR_US != 0).count()
    assert bad == 0
    # per user the grid is dense: count == (max-min)/hour + 1
    agg = grid.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        ((F.max("grid_us") - F.min("grid_us")) / HOUR_US + 1).alias("expect"),
    )
    assert agg.filter(F.col("n") != F.col("expect")).count() == 0


def test_resample_ffill_never_null_after_first_event(spark):
    # every grid point lies between the user's first and last event,
    # so the carried-forward value can never be null
    assert ts_resample_hourly_ffill(spark, SF).filter(
        F.col("last_value").isNull()
    ).count() == 0


def test_ohlc_envelope_contains_open_close(spark):
    bars = ts_ohlc_downsample(spark, SF)
    bad = bars.filter(
        (F.col("high") < F.col("low"))
        | (F.col("open") > F.col("high")) | (F.col("open") < F.col("low"))
        | (F.col("close") > F.col("high")) | (F.col("close") < F.col("low"))
        | (F.col("n") < 1)
    ).count()
    assert bad == 0
    # single-event bars collapse: open == close == high == low
    solo = bars.filter(F.col("n") == 1)
    assert solo.filter(
        (F.col("open") != F.col("close")) | (F.col("high") != F.col("low"))
    ).count() == 0


def test_ohlc_conserves_rows(spark):
    bars = ts_ohlc_downsample(spark, SF)
    total = bars.agg(F.sum("n")).collect()[0][0]
    from etl_arcgis_spark.tables import table

    assert total == table(spark, SF, "events").count()


def test_gap_detect_threshold_and_positivity(spark):
    gaps = ts_gap_detect(spark, SF)
    assert gaps.filter(F.col("gap_us") <= 6 * HOUR_US).count() == 0
    assert gaps.filter(F.col("gap_end_us") <= F.col("gap_start_us")).count() == 0


def test_cohort_offsets_start_at_zero(spark):
    grid = analytics_cohort_retention(spark, SF)
    assert grid.filter(F.col("week_offset") < 0).count() == 0
    # offset-0 cell must exist for every cohort (the cohort's birth week)
    cohorts = grid.select("cohort_wk").distinct().count()
    zero = grid.filter(F.col("week_offset") == 0).count()
    assert zero == cohorts


def test_funnel_is_monotone(spark):
    row = analytics_funnel_steps(spark, SF).collect()[0]
    assert row["n_signup"] >= row["n_view_after_signup"] >= row["n_purchase_after_view"]
    assert row["n_signup"] > 0


def test_zscore_flags_exceed_threshold(spark):
    flagged = window_zscore_anomaly(spark, SF)
    assert flagged.filter(F.abs(F.col("z")) <= 2.5).count() == 0


def test_holt_winters_python_replay(spark):
    """ts_holt_winters (r9): replay the exact recursion in pure Python
    over one user's day-ordered sums and match the engine's r4 outputs
    bit-for-bit; plan has no window/Python stage."""
    from etl_arcgis_spark.registry import all_queries
    from etl_arcgis_spark.tables import table
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    out = {
        r.user_id: r
        for r in all_queries()["ts_holt_winters"](spark, sf).collect()
    }
    assert len(out) == 15  # every sf0.001 user has >= 15 days
    ev = (
        table(spark, sf, "events")
        .select(
            "user_id",
            (F.unix_micros("ts") - F.unix_micros("ts") % 86_400_000_000).alias("d"),
            "value",
        )
        .groupBy("user_id", "d")
        .agg(F.sum("value").alias("y"))
    )
    uid = sorted(out)[0]
    ys = [
        r.y
        for r in ev.filter(F.col("user_id") == uid).orderBy("d").collect()
    ]
    n = len(ys)
    l = (ys[0] + ys[1] + ys[2] + ys[3] + ys[4] + ys[5] + ys[6]) / 7
    b = (
        (ys[7] - ys[0]) + (ys[8] - ys[1]) + (ys[9] - ys[2]) + (ys[10] - ys[3])
        + (ys[11] - ys[4]) + (ys[12] - ys[5]) + (ys[13] - ys[6])
    ) / 49
    s = [ys[i] - l for i in range(7)]
    A, B, G = 0.5, 0.25, 0.25
    for t in range(8, n + 1):  # 1-based t
        y = ys[t - 1]
        j = (t - 1) % 7
        so = s[j]
        lnew = A * (y - so) + (1 - A) * (l + b)
        b = B * (lnew - l) + (1 - B) * b
        s[j] = G * (y - lnew) + (1 - G) * so
        l = lnew

    def r4(x):
        import math
        return math.copysign(math.floor(abs(x) * 10000 + 0.5) / 10000, x)

    row = out[uid]
    assert row.n_days == n
    assert row.level == r4(l)
    assert row.trend == r4(b)
    assert row.forecast_h1 == r4(l + b + s[n % 7])
    assert row.seasonal_range == r4(max(s) - min(s))
