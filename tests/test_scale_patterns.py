"""Tests for the skew-salting and Z-order layout utilities."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_arcgis_spark.operators.scale_patterns import salted_groupby_sum, zorder_key


def test_salted_groupby_matches_plain(spark):
    # 50k rows, 90% on one hot key — the shape that melts one reducer
    df = spark.range(50_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 100).cast("string"))
        ).alias("key"),
        (F.col("id") % 7).cast("double").alias("value"),
    )
    salted = {
        (r["key"], r["sum_value"], r["n"]) for r in salted_groupby_sum(df, "key", "value").collect()
    }
    plain = {
        (r["key"], r["sum_value"], r["n"])
        for r in df.groupBy("key")
        .agg(F.sum("value").alias("sum_value"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert salted == plain


def test_zorder_key_preserves_locality(spark):
    """Points in a small spatial cell share a z-key range disjoint from
    a far-away cell — the property row-group pruning relies on."""
    df = spark.createDataFrame(
        [(i, -120.0 + (i % 5) * 0.01, 40.0 + (i // 5) * 0.01) for i in range(25)]
        + [(100 + i, 30.0 + (i % 5) * 0.01, -10.0 + (i // 5) * 0.01) for i in range(25)],
        "id long, lon double, lat double",
    ).withColumn("z", zorder_key(F.col("lon"), F.col("lat")))
    rows = df.collect()
    west = [r["z"] for r in rows if r["lon"] < 0]
    east = [r["z"] for r in rows if r["lon"] > 0]
    # each tight cluster spans a tiny z-range; the two clusters' ranges
    # don't overlap
    assert max(west) < min(east) or max(east) < min(west)
    span_west = max(west) - min(west)
    assert span_west < (1 << 22)  # tight cluster -> tight key range
