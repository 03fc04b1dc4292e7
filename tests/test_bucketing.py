"""Bucketed-table co-located join — the 100 TB layout story, proven.

At scale, the orders⋈lineitem join is the dominant shuffle; bucketing
both tables on the join key at write time co-locates matching rows so
the join runs with NO Exchange on either side. This test writes both
fixtures as bucketed tables into a temp warehouse and asserts the
shuffle-free plan plus identical results vs the plain join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_arcgis_spark.tables import table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS od_b")
    (
        table(spark, SF_DIR, "lineitem")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(wh / "li_b"))
        .saveAsTable("li_b")
    )
    (
        table(spark, SF_DIR, "orders")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(wh / "od_b"))
        .saveAsTable("od_b")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS od_b")


def _joined(spark, li, od):
    return (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
    )


def test_bucketed_join_has_no_exchange_on_scan_sides(spark, bucketed):
    # disable broadcast so the join strategy itself is under test
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q = _joined(spark, spark.table("li_b"), spark.table("od_b"))
        plan = q._jdf.queryExecution().executedPlan().toString()
        # one exchange for the final small agg is fine; the JOIN itself
        # must consume bucketed scans directly: the SortMergeJoin appears
        # below any Exchange in the tree ==> no shuffle feeds the join
        join_pos = plan.index("SortMergeJoin")
        assert "Exchange" not in plan[join_pos:], "join inputs were shuffled despite bucketing"
        # correctness vs the plain (shuffled) join
        plain = _joined(spark, table(spark, SF_DIR, "lineitem"), table(spark, SF_DIR, "orders"))
        assert sorted(map(tuple, q.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
