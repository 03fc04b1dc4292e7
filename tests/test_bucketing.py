"""Bucketed (co-located) join layout — the durable zero-shuffle join.

SCALE.md's claim, executed: two tables bucketed on the same key with
the same bucket count join with NO Exchange on either side, because
bucket i of one table can only match bucket i of the other. At 100 TB
this is the difference between re-shuffling the fact table per join
and paying the shuffle once at write time.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_arcgis_spark.sources.maintenance import write_bucketed
from etl_arcgis_spark.tables import table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    od = table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    write_bucketed(spark, li, "bkt_lineitem", "l_orderkey", 4, sort_by=["l_orderkey"])
    write_bucketed(spark, od, "bkt_orders", "o_orderkey", 4, sort_by=["o_orderkey"])
    yield "bkt_lineitem", "bkt_orders"
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li_t, od_t = bucketed_tables
    # disable auto-broadcast: at fixture scale Catalyst would broadcast
    # the small side and never exercise the bucketed path we're pinning
    # (at 100 TB neither fact side is broadcastable — that's the point)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(li_t).join(
            spark.table(od_t), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # co-located: neither side shuffles before the join
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert plan.count("Bucketed: true") == 2  # both scans use the layout


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    li_t, od_t = bucketed_tables
    got = (
        spark.table(li_t)
        .join(spark.table(od_t), F.col("l_orderkey") == F.col("o_orderkey"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("rev"),
        )
        .first()
    )
    li = table(spark, SF_DIR, "lineitem")
    od = table(spark, SF_DIR, "orders")
    want = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("rev"),
        )
        .first()
    )
    assert (got["n"], got["rev"]) == (want["n"], want["rev"]) and got["n"] > 0
