"""Composite analytics queries — multi-join + agg shapes (SURVEY.md §2 C1-C14).

The reference forwards arbitrary relational work to its server
(task.ts:406-414); these are the canonical "whole pipeline in one
query" shapes a warehouse user actually runs, modeled on TPC-H Q5 and
Q18 over the driver's TPC-H-ish star schema. They exercise the engine
end-to-end: selective dimension filter -> multi-way join across 6
tables -> aggregate -> order/limit, and a group-filter subquery join.

Scale notes:
- Q5 shape: region/nation are tiny -> explicit broadcast; the
  lineitem⋈orders spine stays a shuffle join on the fact keys, AQE
  picks broadcast for customer/supplier when a 1000-executor cluster's
  stats allow. The date filter sits directly on the orders scan
  (pushed to parquet row groups).
- Q18 shape: the HAVING subquery aggregates lineitem BEFORE joining
  (map-side partial agg on l_orderkey, the join key), so the join input
  is pre-shrunk — never join-then-aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..helpers import r4
from ..registry import query
from ..tables import table


@query(
    "analytics_regional_revenue",
    oracle="""
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
""",
)
def analytics_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue by nation for one region and a 2-year
    order window, where the supplying and ordering nation coincide.
    Six-table join; region+nation broadcast explicitly (5 / 25 rows at
    any scale factor — dimension tables don't grow with the fact)."""
    lineitem = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    customer = table(spark, sf_dir, "customer")
    supplier = table(spark, sf_dir, "supplier")
    nation = F.broadcast(table(spark, sf_dir, "nation"))
    region = F.broadcast(
        table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            customer,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
    )


@query(
    "analytics_big_order_customers",
    oracle="""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       round(sum(l_quantity), 4) AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
  AND c_custkey = o_custkey
  AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
""",
)
def analytics_big_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers with orders whose total quantity
    exceeds a threshold. The HAVING subquery becomes a pre-aggregated
    semi-join input: lineitem is aggregated on its join key FIRST (one
    partial-agg shuffle), then joined — at 100 TB this is the difference
    between shuffling the whole fact twice and once. LIMIT carries the
    unique o_orderkey tie-breaker (SURVEY.md §5.3.3)."""
    lineitem = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            r4(F.col("sum_qty")).alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )
