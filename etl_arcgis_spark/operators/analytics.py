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

from pyspark.sql import DataFrame, SparkSession, Window
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


@query(
    "analytics_min_cost_supplier",
    oracle="""
WITH priced AS (
  SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber,
         l_extendedprice / l_quantity AS unit_price
  FROM lineitem
), floor_price AS (
  SELECT l_partkey, min(unit_price) AS min_unit_price
  FROM priced GROUP BY l_partkey
)
SELECT p.l_partkey AS partkey, p.l_suppkey AS suppkey,
       p.l_orderkey AS orderkey, p.l_linenumber AS linenumber,
       round(p.unit_price, 4) AS unit_price
FROM priced p
JOIN floor_price f
  ON p.l_partkey = f.l_partkey AND p.unit_price = f.min_unit_price
""",
)
def analytics_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: argmin-per-group via min-join-back — for each
    part, every lineitem quoting that part's lowest unit price.

    Distinct from the rank-filter top-k shape: the aggregate-then-
    rejoin returns ALL rows achieving the minimum (ties included), so
    no tie-breaker is needed and the result is fully deterministic —
    IEEE division yields bit-identical doubles on both engines, so the
    equality join on the computed value is exact.

    Scale: both the aggregate and the join shuffle on l_partkey, so AQE
    reuses one exchange; the join-back is the standard decorrelation of
    Q2's correlated min subquery.
    """
    priced = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    floor_price = priced.groupBy("l_partkey").agg(
        F.min("unit_price").alias("min_unit_price")
    )
    return (
        priced.alias("p")
        .join(
            floor_price.alias("f"),
            (F.col("p.l_partkey") == F.col("f.l_partkey"))
            & (F.col("p.unit_price") == F.col("f.min_unit_price")),
        )
        .select(
            F.col("p.l_partkey").alias("partkey"),
            F.col("p.l_suppkey").alias("suppkey"),
            F.col("p.l_orderkey").alias("orderkey"),
            F.col("p.l_linenumber").alias("linenumber"),
            r4(F.col("p.unit_price")).alias("unit_price"),
        )
    )


@query(
    "analytics_nation_pair_revenue",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l.l_shipdate) AS ship_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
""",
)
def analytics_nation_pair_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipping revenue between two nations, both
    directions, by year — the same dimension (nation) joined twice in
    different roles (supplier's vs customer's), with a disjunctive
    pair predicate that only becomes evaluable after both legs join.

    Scale: the nation legs broadcast (25 rows, fixed); pushing the
    one-sided half of the pair filter into each broadcast (n_name IN
    (A, B)) prunes the fact rows at the first join instead of the
    last — done explicitly below, the cross-leg OR stays as the
    residual condition.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    su = table(spark, sf_dir, "supplier")
    od = table(spark, sf_dir, "orders")
    cu = table(spark, sf_dir, "customer")
    pair = ("NATION_1", "NATION_2")
    n1 = F.broadcast(
        table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    ).alias("n1")
    n2 = F.broadcast(
        table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    ).alias("n2")
    return (
        li.join(su, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1.n_nationkey"))
        .join(n2, F.col("c_nationkey") == F.col("n2.n_nationkey"))
        .filter(F.col("n1.n_name") != F.col("n2.n_name"))
        .groupBy(
            F.col("n1.n_name").alias("supp_nation"),
            F.col("n2.n_name").alias("cust_nation"),
            F.year("l_shipdate").cast("bigint").alias("ship_year"),
        )
        .agg(
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
    )


@query(
    "analytics_mom_growth",
    oracle="""
WITH m AS (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
         round(sum(o_totalprice), 4) AS revenue
  FROM orders GROUP BY 1
)
SELECT ym, revenue,
       round((revenue - lag(revenue) OVER (ORDER BY ym))
             / lag(revenue) OVER (ORDER BY ym), 4) AS mom_growth
FROM m
""",
)
def analytics_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: monthly rollup + lag percent
    change — the period-over-period reporting shape. The month key is
    an integer year*100+month (engine-neutral; no timestamp output per
    the §5.3 contract), and the growth ratio is computed FROM THE
    ROUNDED monthly revenues on both engines, so the division is
    bit-identical (two r4 inputs -> one IEEE op) rather than
    noise-on-noise.

    Scale: the rollup shrinks orders to ~80 rows before the window;
    the unpartitioned lag is a 1-task window over those 80 rows —
    irrelevant at any SF because the heavy lifting happened in the
    map-side-combined aggregate."""
    m = (
        table(spark, sf_dir, "orders")
        .groupBy(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
            .cast("bigint")
            .alias("ym")
        )
        .agg(r4(F.sum("o_totalprice")).alias("revenue"))
    )
    w = Window.orderBy("ym")
    prev = F.lag("revenue").over(w)
    return m.select(
        "ym", "revenue", r4((F.col("revenue") - prev) / prev).alias("mom_growth")
    )


@query(
    "analytics_promo_revenue_share",
    oracle="""
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_share_pct,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1997-04-01'
""",
)
def analytics_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotional revenue share for a ship-quarter —
    a conditional-sum ratio after a fact-dim join. The date filter is
    pushed to the lineitem scan (row-group pruning at rest); part is
    dim-sized -> broadcast, so the fact side never shuffles; the two
    sums fold into ONE aggregate pass (a single shuffle of one partial
    pair). Ratio rounded once at the end: both sums carry ~1e-13
    relative noise, invisible at the 1e-4 grid."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    pa = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(pa), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            r4(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev)
            ).alias("promo_share_pct"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


@query(
    "analytics_late_ship_priority",
    oracle="""
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 90 DAY
)
GROUP BY o_orderpriority
""",
)
def analytics_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders having at least one line shipped more
    than 90 days after the order date, counted by priority — an EXISTS
    (left-semi) probe with a CORRELATED date predicate, then a tiny
    aggregate. The semi-join dedups order keys on the join side (an
    order with three late lines counts once), which is the point of
    semi over inner here.

    Scale: the correlated predicate travels into the join condition
    (orderkey equi conjunct carries the shuffle, the date comparison
    evaluates co-partitioned); the priority rollup is 5 groups of
    partials."""
    od = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        od.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
