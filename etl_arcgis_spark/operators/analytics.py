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


@query(
    "analytics_ship_priority_topk",
    oracle="""
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       o_orderdate, o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1997-07-01'
  AND l_shipdate  > TIMESTAMP '1997-07-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
)
def analytics_ship_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-order revenue priority list — one
    segment of customers, orders placed before a date with lines still
    shipping after it, top-10 by revenue. (Reference forwards such
    ranked queries wholesale, task.ts:406-414.)

    Scale: the segment filter reduces customer BEFORE its join (and the
    3-col projection keeps the build side narrow enough that AQE picks
    broadcast from runtime stats at any SF); both date filters sit on
    their own scans (row-group pruning). The top-10 runs as
    TakeOrderedAndProject over the aggregate — per-partition heaps, no
    global sort. revenue DESC + orderkey ASC is a total order, so the
    LIMIT is deterministic cross-engine."""
    cu = table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    od = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-07-01").cast("timestamp")
    )
    return (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "analytics_returned_revenue_customers",
    oracle="""
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       round(c_acctbal, 4) AS c_acctbal, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def analytics_returned_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returned
    items in one quarter — fact-side flag + date filters, enrich with
    customer and nation, aggregate per customer, rank.

    Scale: both selective filters (returnflag on lineitem, quarter on
    orders) are scan-local; nation (25 rows) broadcasts; the
    lineitem⋈orders spine shuffles once on orderkey and the per-customer
    aggregate reuses the customer-join shuffle. Top-20 via
    TakeOrderedAndProject with custkey tiebreak."""
    cu = table(spark, sf_dir, "customer")
    na = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    od = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", r4("c_acctbal").alias("c_acctbal"), "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "analytics_disjunctive_part_filter",
    oracle="""
SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""",
)
def analytics_disjunctive_part_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate that mixes
    columns from BOTH join sides — the classic disjunctive-pushdown
    test. Expressed as one declarative filter over the join; Catalyst
    extracts the side-local residuals (p_brand/p_size disjunction to the
    part scan, l_quantity range union to the lineitem scan) so each scan
    prunes before the join, with the full disjunction re-checked above.

    Scale: part is dim-sized -> broadcast, the fact side never
    shuffles; the whole thing is scan -> broadcast-probe -> one partial
    agg pair. Handing the OR to the engine (instead of unioning three
    branch queries) reads each table ONCE."""
    li = table(spark, sf_dir, "lineitem")
    pa = table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    pred = (
        ((b == "Brand#12") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#34") & s.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(pa), F.col("l_partkey") == F.col("p_partkey"))
        .filter(pred)
        .agg(
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


@query(
    "analytics_sole_late_supplier",
    oracle="""
WITH lines AS (
  SELECT l_orderkey, l_suppkey,
         (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM lines l1 JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.is_late
  AND EXISTS (SELECT 1 FROM lines l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lines l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.is_late)
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 10
""",
)
def analytics_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier on a
    finished multi-supplier order — the EXISTS + NOT-EXISTS double
    probe, the hardest of the classic decision-support shapes.
    (Lateness here is ship > order + 60 days: this schema carries no
    commit/receipt dates.)

    Scale: the lateness flag needs orders, so lineitem⋈orders builds a
    `lines` relation ONCE (one orderkey shuffle) and all three roles
    (l1 probe, l2 exists, l3 not-exists) reuse it — Spark's exchange
    reuse keeps it a single scan+shuffle. Both probes are orderkey
    equi-joins (left_semi / left_anti) whose suppkey inequality rides
    along as a join residual, co-partitioned with the l1 side — no
    correlated per-row subquery execution. Supplier is dim-sized ->
    broadcast at the end, after the probes shrank l1."""
    od = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lines = li.join(od.select("o_orderkey", "o_orderdate"),
                    F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("is_late"),
    )
    l1 = lines.filter(F.col("is_late")).select("l_orderkey", "l_suppkey")
    l2 = lines.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    l3 = lines.filter(F.col("is_late")).select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    su = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    probed = (
        l1.join(l2, (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
                "left_semi")
        .join(l3, (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("s3")),
              "left_anti")
    )
    return (
        probed.join(F.broadcast(su), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


@query(
    "analytics_dormant_rich_customers",
    oracle="""
WITH sel AS (
  SELECT c_custkey, c_nationkey, c_acctbal FROM customer
  WHERE c_nationkey IN (3, 7, 11, 15, 19, 23)
), thresh AS (
  SELECT avg(c_acctbal) AS avg_bal FROM sel WHERE c_acctbal > 0.0
)
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c_acctbal), 4) AS totacctbal
FROM sel, thresh
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-08-01')
GROUP BY c_nationkey
""",
)
def analytics_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers in selected countries with
    above-average positive balances and NO orders in the final fixture
    year — a global scalar subquery gating an anti-join. (Country code
    is c_nationkey — this schema has no phone column — and dormancy is
    time-windowed because the generator gives ~every customer at least
    one lifetime order, which would make a never-ordered anti-join
    vacuous.)

    Scale: the scalar average is a 1-row aggregate cross-joined back as
    a broadcast (BroadcastNestedLoopJoin over exactly one row — the
    distributed spelling of a scalar subquery; no driver round-trip, no
    collect). The anti-join probes orders on its natural o_custkey
    projection; at cluster scale that's one shuffle of a 1-column
    relation. The nationkey IN-list prunes customer at the scan."""
    sel = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(3, 7, 11, 15, 19, 23))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )
    thresh = sel.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    od = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-08-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        sel.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(od, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            r4(F.sum("c_acctbal")).alias("totacctbal"),
        )
    )


@query(
    "analytics_part_cooccurrence",
    oracle="""
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       CAST(count(*) AS BIGINT) AS n_orders
FROM op a JOIN op b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY part_a, part_b
ORDER BY n_orders DESC, part_a ASC, part_b ASC
LIMIT 20
""",
)
def analytics_part_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top-20 part pairs most often
    ordered together — per-order distinct items, a within-order
    self-join (p1 < p2 kills mirror/self pairs), pair counting, ranked.
    The k=2 frequent-itemset query, and the co-occurrence-matrix
    builder for item embeddings.

    Scale: the pair space is quadratic in BASKET size, not corpus size
    — baskets are bounded (<= order line count), so the self-join on
    l_orderkey explodes each order locally after one orderkey shuffle
    (both sides share it: exchange reuse). A pathological mega-basket
    is the salting case; the per-order DISTINCT pre-shrink runs
    map-side first. Top-20 via TakeOrderedAndProject with a total
    (n, p1, p2) order."""
    op = (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("part_a"))
    b = op.select(F.col("l_orderkey").alias("k2"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, (F.col("k") == F.col("k2")) & (F.col("part_a") < F.col("part_b")))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )


@query(
    "analytics_supplier_diversity",
    oracle="""
SELECT p_type, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size IN (1, 14, 23, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_type, p_size
ORDER BY supplier_cnt DESC, p_type ASC, p_size ASC
LIMIT 20
""",
)
def analytics_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many DISTINCT suppliers serve each part
    bucket, excluding a blacklist — grouped COUNT(DISTINCT) over an
    anti-joined relation. (Blacklist = negative account balance; this
    schema has no supplier comments.)

    Scale: the NOT IN set is supplier-table-sized -> broadcast
    anti-join, so the exclusion never shuffles the fact; the grouped
    distinct is Spark's two-phase plan (partial distinct on
    (group, suppkey), then count) — no row explosion. NULL-safety note:
    NOT IN vs a set containing NULL is three-valued-logic quicksand;
    s_suppkey is a non-null key here, and the Spark side uses an
    explicit anti-join, which is the NULL-robust spelling."""
    bad = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    pa = table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(1, 14, 23, 45)
    ).select("p_partkey", "p_type", "p_size")
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(pa), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), F.asc("p_type"), F.asc("p_size"))
        .limit(20)
    )


@query(
    "analytics_small_qty_revenue",
    oracle="""
WITH avg_qty AS (
  SELECT l_partkey AS ak, 0.5 * avg(l_quantity) AS half_avg
  FROM lineitem GROUP BY l_partkey
)
SELECT round(CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
             AS BIGINT) / CAST(700 AS DOUBLE), 4) AS avg_yearly
FROM lineitem JOIN avg_qty ON l_partkey = ak
WHERE l_quantity < half_avg
""",
)
def analytics_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue locked in below-half-average-quantity
    orders — a correlated AVG subquery decorrelated into an
    aggregate-join-back with an INEQUALITY gate (the avg variant of
    analytics_min_cost_supplier's min-join-back). (Threshold 0.5*avg
    vs TPC-H's 0.2 so the fixture qualifies rows at every SF.)

    Scale: both the per-part average and the join-back shuffle on
    l_partkey — one exchange, reused; the gate evaluates
    co-partitioned, and the final global sum is a 1-row reduce.
    IEEE avg and * 0.5 are bit-identical cross-engine, so the
    inequality boundary is exact."""
    li = table(spark, sf_dir, "lineitem")
    half_avg = li.groupBy(F.col("l_partkey").alias("ak")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg")
    )
    return (
        li.join(half_avg, F.col("l_partkey") == F.col("ak"))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            F.round(
                F.sum(
                    F.expr(
                        "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"
                    )
                ).cast("bigint")
                / F.lit(700.0),
                4,
            ).alias("avg_yearly")
        )
    )


@query(
    "analytics_order_count_distribution",
    oracle="""
WITH per_cust AS (
  SELECT c_custkey, count(o_orderkey) AS n_orders
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
FROM per_cust
GROUP BY n_orders
""",
)
def analytics_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the distribution of orders-per-customer — a
    LEFT join so zero-order customers survive into the n_orders=0
    bucket (count(o_orderkey) ignores the NULLs a left-miss produces),
    then a second aggregate over the first's output: the
    histogram-of-counts double group-by.

    Scale: first aggregate shuffles on c_custkey (the join's own key —
    exchange reused); the second shuffles the per-customer relation on
    the small n_orders domain — cardinality collapses at each step, so
    the expensive shuffle happens exactly once on the natural key."""
    cu = table(spark, sf_dir, "customer").select("c_custkey")
    od = table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cu.join(od, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    )


@query(
    "analytics_market_share",
    oracle="""
WITH base AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA'
    AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate <  TIMESTAMP '1997-01-01'
)
SELECT o_year,
       round(round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END), 4)
             / round(sum(volume), 4), 4) AS mkt_share
FROM base
GROUP BY o_year
""",
)
def analytics_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplying nation's share of a region's
    order volume for one part type, per year — an 8-table join where
    the nation dimension plays two roles (customer's region membership
    vs supplier's identity) feeding a conditional-ratio aggregate.

    Determinism: numerator and denominator are each rounded to the
    4-decimal contract BEFORE the division (the mom_growth pattern) so
    the ratio is one IEEE op over bit-identical inputs on both engines.

    Scale: nation/region broadcast (fixed 25/5 rows); part is filtered
    to one p_type but still grows with SF, so its join stays a shuffle
    on l_partkey rather than an assumed broadcast — AQE may still
    choose broadcast from runtime stats at small SF, which is exactly
    the decision we want left to the optimizer."""
    li = table(spark, sf_dir, "lineitem")
    pa = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    su = table(spark, sf_dir, "supplier")
    od = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cu = table(spark, sf_dir, "customer")
    n1 = F.broadcast(table(spark, sf_dir, "nation")).alias("n1")
    n2 = F.broadcast(table(spark, sf_dir, "nation")).alias("n2")
    re = F.broadcast(
        table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = (
        li.join(pa, F.col("l_partkey") == F.col("p_partkey"))
        .join(su, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cu, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("n1.n_nationkey"))
        .join(re, F.col("n1.n_regionkey") == F.col("r_regionkey"))
        .join(n2, F.col("s_nationkey") == F.col("n2.n_nationkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            volume.alias("volume"),
            F.col("n2.n_name").alias("supp_nation"),
        )
    )
    num = r4(
        F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0))
    )
    den = r4(F.sum("volume"))
    return base.groupBy("o_year").agg(r4(num / den).alias("mkt_share"))


@query(
    "analytics_top_revenue_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_rev
FROM supplier JOIN revenue ON s_suppkey = l_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM revenue)
ORDER BY s_suppkey
""",
)
def analytics_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue over one
    quarter — a scalar-subquery max gating a grouped-revenue view,
    keeping ALL ties (no LIMIT 1), which is why it is not a top-k
    window query.

    Determinism: per-supplier revenue is rounded to the r4 contract
    first; the max-equality comparison then operates on bit-identical
    doubles on both engines.

    Scale: revenue aggregates lineitem down to |suppliers| rows before
    anything else; the global max is a 1-row aggregate broadcast back
    onto the revenue relation (the dq_rule_checks shape) — NOT a
    window over an empty partition, which would move every supplier
    row through one task (|suppliers| is unbounded at 100 TB; the
    round-4 audit rule flags that plan). The supplier join input is
    already minimal."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    su = table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "total_rev"
        )
    )
    mx = F.broadcast(rev.agg(F.max("total_rev").alias("mx")))
    best = rev.crossJoin(mx).filter(F.col("total_rev") == F.col("mx"))
    return (
        best.join(su, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy(F.asc("s_suppkey"))
    )


@query(
    "analytics_discount_revenue",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 0) AS revenue_delta,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def analytics_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: forecast-revenue-change — a pure scan-filter-agg
    with three conjunctive predicates (date range, discount band,
    quantity cap), the canonical pushdown probe: every predicate
    reaches the parquet scan, no join, no shuffle beyond the one-row
    partial-agg combine.

    Determinism: a money sum over ~1e8 magnitude rounds to INTEGER,
    not 4 decimals — cross-engine/cross-run partial-sum ordering noise
    (~1e-5 here) sits too close to the 1e-4 grid for comfort, and the
    integer grid is 5 orders of magnitude away (§5.3.1 magnitude-aware
    corollary)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 0).alias(
                "revenue_delta"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "stats_winsorize_clip",
    oracle="""
WITH b AS (
  SELECT c_mktsegment AS seg,
         quantile_cont(c_acctbal, 0.05) AS lo,
         quantile_cont(c_acctbal, 0.95) AS hi
  FROM customer GROUP BY c_mktsegment
)
SELECT c_mktsegment,
       round(avg(c_acctbal), 4) AS mean_raw,
       round(avg(least(greatest(c_acctbal, lo), hi)), 4) AS mean_winsor,
       count(*) AS n
FROM customer JOIN b ON c_mktsegment = seg
GROUP BY c_mktsegment
""",
)
def stats_winsorize_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization: clip each customer's balance to its
    segment's [p05, p95] band and compare raw vs clipped means — the
    outlier-robust normalization step a feature/reward pipeline runs
    before training statistics.

    Scale: the percentile bounds aggregate first (5 groups → 5 rows),
    then broadcast back onto the fact — two passes over customer, no
    per-row sort. Spark ``percentile`` and DuckDB ``quantile_cont``
    share the interpolated-quantile definition (parity proven by
    agg_percentiles_exact)."""
    cu = table(spark, sf_dir, "customer")
    bounds = F.broadcast(
        cu.groupBy(F.col("c_mktsegment").alias("seg")).agg(
            F.percentile("c_acctbal", F.lit(0.05)).alias("lo"),
            F.percentile("c_acctbal", F.lit(0.95)).alias("hi"),
        )
    )
    clipped = F.least(F.greatest(F.col("c_acctbal"), F.col("lo")), F.col("hi"))
    return (
        cu.join(bounds, F.col("c_mktsegment") == F.col("seg"))
        .groupBy("c_mktsegment")
        .agg(
            r4(F.avg("c_acctbal")).alias("mean_raw"),
            r4(F.avg(clipped)).alias("mean_winsor"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "analytics_profit_by_nation_year",
    oracle="""
SELECT n.n_name AS nation, year(o.o_orderdate) AS order_year,
       round(CAST(sum(CAST(round((l.l_extendedprice * (1 - l.l_discount)
                 - 0.6 * p.p_retailprice * l.l_quantity) * 100, 0)
             AS BIGINT)) AS BIGINT) / CAST(100 AS DOUBLE), 4) AS profit
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, year(o.o_orderdate)
""",
)
def analytics_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: product-line profit by supplier nation and order
    year — a 5-way join where the fact table joins THREE independent
    dimension legs (part, supplier->nation, orders) and the measure
    combines columns from two different tables (price/discount from
    lineitem, cost from part). The fixtures carry no partsupp table, so
    supply cost is modeled as 0.6·p_retailprice — the join/agg shape,
    which is what Q9 stresses, is unchanged.

    Scale: part (LIKE-filtered), supplier and nation all broadcast —
    the lineitem spine is never shuffled for them; the only wide
    exchange is lineitem⋈orders on l_orderkey. The selective p_name
    LIKE leg is joined FIRST so fact rows drop before the expensive
    orders join (Catalyst keeps the order; at cluster scale a runtime
    row-level bloom filter from the filtered part side prunes the scan
    further — verified in tests/test_plans.py for the Q6/Q8 twins).
    """
    li = table(spark, sf_dir, "lineitem")
    pa = F.broadcast(
        table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    )
    su = F.broadcast(table(spark, sf_dir, "supplier"))
    na = F.broadcast(table(spark, sf_dir, "nation"))
    od = table(spark, sf_dir, "orders")
    # exact-cents sum (SURVEY §5.3.1): the per-row profit expression is
    # bit-identical on both engines (same text, same IEEE ops), so its
    # rounded cents are too; the BIGINT sum is then order-independent
    # and noise-free at any SF (the float-sum spelling crossed the r4
    # grid at sf1's ~1.7e8 group totals)
    profit_cents = F.expr(
        "CAST(round((l_extendedprice * (1 - l_discount)"
        " - 0.6 * p_retailprice * l_quantity) * 100, 0) AS BIGINT)"
    )
    return (
        li.join(pa, F.col("l_partkey") == F.col("p_partkey"))
        .join(su, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(na, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("order_year"),
        )
        .agg(
            F.round(
                F.sum(profit_cents).cast("bigint") / F.lit(100.0), 4
            ).alias("profit")
        )
    )


@query(
    "analytics_order_priority_check",
    oracle="""
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o.o_orderpriority
""",
)
def analytics_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in a year window with at least one
    lineitem shipped after the order date, counted per priority — the
    canonical EXISTS-with-cross-table-inequality probe. Plans as a
    left-semi join (date filter pushed to the orders scan, the
    inequality rides the join), then a tiny group-by.

    Scale: the semi join shuffles on l_orderkey; with both tables
    bucketed on the order key (write_bucketed / the bench cache
    layout) the probe is co-located and the whole query is one
    scan-side filter + local semi probe + 5-group aggregate."""
    od = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        od.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "analytics_order_gap_stats",
    oracle="""
WITH gaps AS (
  SELECT o_custkey,
         epoch_us(o_orderdate) // 86400000000
           - lag(epoch_us(o_orderdate) // 86400000000)
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
           AS gap_days
  FROM orders
)
SELECT o_custkey, count(gap_days) AS n_gaps,
       min(gap_days) AS min_gap, max(gap_days) AS max_gap,
       round(avg(gap_days), 4) AS avg_gap
FROM gaps
WHERE gap_days IS NOT NULL
GROUP BY o_custkey
""",
)
def analytics_order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-order gap statistics per customer (days between
    consecutive orders via lag over the per-customer order sequence) —
    the recency/frequency building block of RFM-style analyses. Gap
    arithmetic is integer day numbers on both engines.

    Scale: one shuffle on o_custkey shared by the window AND the
    group-by (same ClusteredDistribution — Catalyst reuses the
    exchange, and the bench cache layout elides it entirely)."""
    day = (F.unix_micros(F.col("o_orderdate")) / 86400000000).cast("bigint")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = table(spark, sf_dir, "orders").select(
        "o_custkey", (day - F.lag(day).over(w)).alias("gap_days")
    )
    return (
        gaps.filter(F.col("gap_days").isNotNull())
        .groupBy("o_custkey")
        .agg(
            F.count("gap_days").alias("n_gaps"),
            F.min("gap_days").alias("min_gap"),
            F.max("gap_days").alias("max_gap"),
            r4(F.avg("gap_days")).alias("avg_gap"),
        )
    )


@query(
    "analytics_pareto_frontier",
    oracle="""
WITH o AS (
  SELECT o_orderkey, o_totalprice,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d
  FROM orders WHERE o_orderpriority = '1-URGENT'
)
SELECT o_orderkey, round(o_totalprice, 4) AS price, CAST(d AS BIGINT) AS epoch_day
FROM o
WHERE NOT EXISTS (
  SELECT 1 FROM o o2
  WHERE o2.o_totalprice >= o.o_totalprice AND o2.d <= o.d
    AND (o2.o_totalprice > o.o_totalprice OR o2.d < o.d)
)
ORDER BY epoch_day, o_orderkey
""",
)
def analytics_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2D Pareto frontier (skyline): urgent orders not dominated on
    (earlier date, higher price) — the multi-objective shortlist query
    (cheapest-earliest tradeoff curves, best-N-under-two-criteria).

    The oracle is the O(n²) NOT-EXISTS *definition* of domination; the
    engine computes the identical set with the two-phase DISTRIBUTED
    skyline: (1) per-date-range-bucket frontiers via two running-max
    RANGE windows PARTITIONED by bucket — a point survives iff its
    price strictly exceeds the running max over STRICTLY earlier days
    (no strictly-earlier dominator) and equals the running max
    including its own day (no same-day strictly-higher dominator) —
    then (2) the same two windows unpartitioned over the (tiny)
    survivor union. Phase 2 over survivors is exact by dominator
    transitivity: any global dominator of a discarded point is itself
    dominated only by points that also dominate it, so the maximal
    element of every domination chain survives its own bucket.
    Same-day same-price duplicates correctly survive together (no
    strict inequality either way). Price comparisons are raw stored
    doubles on both engines — exact, no rounding in the control flow.

    Scale: phase 1's heavy windows are range-disjoint per bucket (no
    global sort of the input); only the per-bucket frontier — by
    construction at most one point per distinct day per bucket —
    reaches the unpartitioned phase-2 window. This is the standard
    divide-and-merge skyline reduction, expressed entirely in
    DataFrame windows.
    """
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(
            "o_orderkey",
            "o_totalprice",
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("bigint")
            .alias("d"),
        )
        .withColumn("bucket", F.expr("d div 64"))
    )

    def frontier(df: DataFrame, *partition: str) -> DataFrame:
        w_lt = (
            Window.partitionBy(*partition).orderBy(F.asc("d"))
            .rangeBetween(Window.unboundedPreceding, -1)
            if partition
            else Window.orderBy(F.asc("d")).rangeBetween(Window.unboundedPreceding, -1)
        )
        w_le = (
            Window.partitionBy(*partition).orderBy(F.asc("d"))
            .rangeBetween(Window.unboundedPreceding, Window.currentRow)
            if partition
            else Window.orderBy(F.asc("d")).rangeBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        )
        scored = df.select(
            "o_orderkey",
            "o_totalprice",
            "d",
            "bucket",
            F.max("o_totalprice").over(w_lt).alias("m_lt"),
            F.max("o_totalprice").over(w_le).alias("m_le"),
        )
        return scored.filter(
            (F.col("m_lt").isNull() | (F.col("o_totalprice") > F.col("m_lt")))
            & (F.col("o_totalprice") == F.col("m_le"))
        ).drop("m_lt", "m_le")

    local = frontier(o, "bucket")  # phase 1: range-disjoint, partitioned
    return (
        frontier(local)  # phase 2: merge over the small survivor union
        .select(
            "o_orderkey",
            r4("o_totalprice").alias("price"),
            F.col("d").alias("epoch_day"),
        )
        .orderBy(F.asc("epoch_day"), F.asc("o_orderkey"))
    )


@query(
    "analytics_rfm_segments",
    oracle="""
WITH rfm AS (
  SELECT o_custkey,
         max(epoch_us(o_orderdate)) AS recency_us,
         CAST(count(*) AS BIGINT) AS frequency,
         round(sum(o_totalprice), 4) AS monetary
  FROM orders GROUP BY o_custkey
),
cuts AS (
  SELECT quantile_cont(recency_us, 0.5) AS r_cut,
         quantile_cont(frequency, 0.5) AS f_cut,
         quantile_cont(monetary, 0.5) AS m_cut
  FROM rfm
)
SELECT (CASE WHEN recency_us > r_cut THEN 'R1' ELSE 'R0' END ||
        CASE WHEN frequency  > f_cut THEN 'F1' ELSE 'F0' END ||
        CASE WHEN monetary   > m_cut THEN 'M1' ELSE 'M0' END) AS segment,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(avg(monetary), 4) AS avg_monetary
FROM rfm, cuts
GROUP BY segment
ORDER BY segment
""",
)
def analytics_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic customer-value grid: each
    customer scored high/low on Recency (last order time), Frequency
    (order count) and Monetary (total spend) against the population
    MEDIAN of each dimension, yielding 8 segments (R1F1M1 = champions
    ... R0F0M0 = lost). The same binary-cut-on-robust-center shape a
    data-curation pipeline uses to grid documents by (freshness,
    dup-count, quality).

    Determinism: cuts are interpolated medians — division of exact
    inputs, identical doubles on both engines (Spark percentile ==
    DuckDB quantile_cont) — and every comparison is strict > against
    them; monetary is r4-rounded BEFORE the cut so the compared
    operands are grid values. Recency stays integer µs.

    Scale: one groupBy to |customers|, one 3-value broadcast of the
    cuts, one group-by over 8 segments. The median cut deliberately
    replaces ntile(2) windows — no unpartitioned WindowExec (the r4
    audit rule); at 100 TB the cuts come from agg_median_two_phase."""
    o = table(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max(F.unix_micros(F.col("o_orderdate"))).alias("recency_us"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        r4(F.sum("o_totalprice")).alias("monetary"),
    )
    cuts = F.broadcast(
        rfm.agg(
            F.expr("percentile(recency_us, 0.5)").alias("r_cut"),
            F.expr("percentile(frequency, 0.5)").alias("f_cut"),
            F.expr("percentile(monetary, 0.5)").alias("m_cut"),
        )
    )
    seg = F.concat(
        F.when(F.col("recency_us") > F.col("r_cut"), "R1").otherwise("R0"),
        F.when(F.col("frequency") > F.col("f_cut"), "F1").otherwise("F0"),
        F.when(F.col("monetary") > F.col("m_cut"), "M1").otherwise("M0"),
    )
    return (
        rfm.crossJoin(cuts)
        .groupBy(seg.alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            r4(F.avg("monetary")).alias("avg_monetary"),
        )
        .orderBy(F.asc("segment"))
    )


_KM_DAY_US = 86_400_000_000


@query(
    "analytics_survival_km",
    oracle=f"""
WITH u AS (
  SELECT user_id,
         min(epoch_us(ts)) // {_KM_DAY_US} AS d0,
         max(epoch_us(ts)) // {_KM_DAY_US} AS d1
  FROM events GROUP BY user_id
), obs AS (SELECT max(d1) AS dmax FROM u),
lif AS (
  SELECT d1 - d0 AS dur,
         CAST(d1 = dmax AS INT) AS censored
  FROM u CROSS JOIN obs
), grid AS (
  SELECT dur,
         CAST(sum(1 - censored) AS BIGINT) AS d_events,
         CAST(count(*) AS BIGINT) AS leaving
  FROM lif GROUP BY dur
), tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lif),
risk AS (
  SELECT dur, d_events,
         n - coalesce(sum(leaving) OVER (ORDER BY dur ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_at_risk
  FROM grid CROSS JOIN tot
)
SELECT CAST(dur AS BIGINT) AS duration_days,
       CAST(n_at_risk AS BIGINT) AS n_at_risk,
       d_events AS n_events,
       round(CASE WHEN min(CASE WHEN n_at_risk = d_events THEN 0.0 ELSE 1.0 END)
                  OVER (ORDER BY dur ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 0.0
             THEN 0.0
             ELSE exp(sum(ln(1.0 - CAST(d_events AS DOUBLE) / n_at_risk))
                  OVER (ORDER BY dur ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) END, 4)
         AS survival
FROM risk
ORDER BY duration_days
""",
)
def analytics_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimate of user lifetime (days between
    first and last activity), with RIGHT-CENSORING: users whose last
    event falls on the observation window's final day are censored
    (still alive — treating them as churned is the classic retention
    bias KM exists to fix; Kaplan & Meier 1958, public). Output per
    distinct duration: risk-set size, churn events, and S(t) — the
    cumulative product Π(1 - d_i/n_i) spelled as exp(Σ ln(·)) so it
    runs as a running-sum window; a risk set consumed entirely
    (d = n) pins S to exactly 0 from there on via the windowed min
    flag (no -inf arithmetic).

    Scale: per-user min/max is one map-side-combined pass; everything
    after runs on the DURATION GRID (bounded by the observation
    window's day count, never user count) — the windows are
    |grid|-row, allowlisted bounded."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.expr(f"unix_micros(ts) div {_KM_DAY_US}").alias("d")
    )
    u = ev.groupBy("user_id").agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
    obs = F.broadcast(u.agg(F.max("d1").alias("dmax")))
    lif = u.crossJoin(obs).select(
        (F.col("d1") - F.col("d0")).alias("dur"),
        (F.col("d1") == F.col("dmax")).cast("int").alias("censored"),
    )
    grid = lif.groupBy("dur").agg(
        F.sum(1 - F.col("censored")).cast("bigint").alias("d_events"),
        F.count(F.lit(1)).cast("bigint").alias("leaving"),
    )
    tot = F.broadcast(lif.agg(F.count(F.lit(1)).cast("bigint").alias("n")))
    w_prev = Window.orderBy(F.asc("dur")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    risk = grid.crossJoin(tot).select(
        "dur",
        "d_events",
        (
            F.col("n")
            - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0))
        ).alias("n_at_risk"),
    )
    w_cum = Window.orderBy(F.asc("dur")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    dead = F.when(F.col("n_at_risk") == F.col("d_events"), 0.0).otherwise(1.0)
    surv = F.when(
        F.min(dead).over(w_cum) == 0.0, F.lit(0.0)
    ).otherwise(
        F.exp(
            F.sum(
                F.log(1.0 - F.col("d_events").cast("double") / F.col("n_at_risk"))
            ).over(w_cum)
        )
    )
    return risk.select(
        F.col("dur").cast("bigint").alias("duration_days"),
        F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
        F.col("d_events").alias("n_events"),
        r4(surv).alias("survival"),
    ).orderBy(F.asc("duration_days"))


@query(
    "analytics_abc_classification",
    oracle="""
WITH c AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS rev_c
  FROM orders GROUP BY o_custkey
), r AS (
  SELECT *,
         CAST(sum(rev_c) OVER (ORDER BY rev_c DESC, o_custkey
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c,
         CAST(sum(rev_c) OVER () AS BIGINT) AS total_c
  FROM c
)
SELECT CASE WHEN CAST(cum_c - rev_c AS DOUBLE) / total_c < 0.80 THEN 'A'
            WHEN CAST(cum_c - rev_c AS DOUBLE) / total_c < 0.95 THEN 'B'
            ELSE 'C' END AS abc_class,
       CAST(count(*) AS BIGINT) AS n_customers,
       round(CAST(sum(rev_c) AS BIGINT) / CAST(100 AS DOUBLE), 4) AS class_revenue,
       round(CAST(sum(rev_c) AS DOUBLE) / any_value(total_c), 4)
         AS revenue_share
FROM r GROUP BY 1
""",
)
def analytics_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) inventory/customer classification: customers ranked
    by total order revenue, class A = customers before the cumulative
    80% revenue line, B = to 95%, C = the tail — the classic warehouse
    segmentation (single-axis complement of the multi-objective
    analytics_pareto_frontier).

    Exactness: revenue is summed in integer CENTS (floor(x*100+0.5) —
    identical double math on both engines), so the cumulative sums are
    order-independent integers and the 80/95% boundary classification
    cannot drift on float addition order.

    Scale: the cumulative share needs a GLOBAL running sum over
    |customers| rows — never an unpartitioned window. Spelled as the
    two-phase bucket-offset chain: bucketed_global_rank gives each
    customer its dense rank by (revenue DESC, custkey), then
    bucketed_running_sums accumulates revenue per 64-rank bucket with
    a bounded offsets window (|buckets| rows, broadcast back). The
    grand total is a 1-row broadcast."""
    from .scale_patterns import bucketed_global_rank, bucketed_running_sums

    orders = table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(
            F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
        ).cast("bigint").alias("rev_c")
    ).withColumn("neg_rev", -F.col("rev_c"))
    ranked = bucketed_global_rank(
        per_cust, "neg_rev", "o_custkey", out_rank="grank", out_n="n_cust"
    )
    cum = bucketed_running_sums(
        ranked,
        "grank",
        F.expr("grank div 64"),
        {"rev_c": "cum_c"},
    )
    total = F.broadcast(per_cust.agg(F.sum("rev_c").alias("total_c")))
    classed = cum.crossJoin(total).withColumn(
        "abc_class",
        F.when(
            (F.col("cum_c") - F.col("rev_c")).cast("double") / F.col("total_c")
            < 0.80,
            F.lit("A"),
        )
        .when(
            (F.col("cum_c") - F.col("rev_c")).cast("double") / F.col("total_c")
            < 0.95,
            F.lit("B"),
        )
        .otherwise(F.lit("C")),
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        r4(F.sum("rev_c") / 100.0).alias("class_revenue"),
        r4(
            F.sum("rev_c").cast("double") / F.any_value("total_c")
        ).alias("revenue_share"),
    )


# r12 C267: association rules — the directional second half of
# market-basket mining that C76's pair counting (support only)
# stops short of (Agrawal & Srikant 1994): confidence
# P(B|A) = supp(AB)/supp(A) and lift = conf/P(B) for BOTH directions
# of every pair above min-support. Exact integer supports feed one
# IEEE division per metric; ranking is (lift DESC, conf DESC, a, b)
# — a total order, so top-20 is deterministic.

_ASSOC_MINSUP = 3

_ASSOC_SQL = f"""
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), nb AS (
  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM op
), item AS (
  SELECT l_partkey, CAST(count(1) AS BIGINT) AS s FROM op GROUP BY l_partkey
), pair AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb,
         CAST(count(1) AS BIGINT) AS sab
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(1) >= {_ASSOC_MINSUP}
), rules AS (
  SELECT pa AS antecedent, pb AS consequent, sab,
         ia.s AS s_ante, ib.s AS s_cons, nb.n AS n_baskets
  FROM pair JOIN item ia ON ia.l_partkey = pair.pa
            JOIN item ib ON ib.l_partkey = pair.pb
            CROSS JOIN nb
  UNION ALL
  SELECT pb, pa, sab, ib.s, ia.s, nb.n
  FROM pair JOIN item ia ON ia.l_partkey = pair.pa
            JOIN item ib ON ib.l_partkey = pair.pb
            CROSS JOIN nb
)
SELECT antecedent, consequent, sab AS support_pair,
       round(sab / CAST(s_ante AS DOUBLE), 6) AS confidence,
       round(sab * CAST(n_baskets AS DOUBLE)
             / (CAST(s_ante AS DOUBLE) * CAST(s_cons AS DOUBLE)), 6) AS lift
FROM rules
ORDER BY lift DESC, confidence DESC, antecedent ASC, consequent ASC
LIMIT 20
"""


@query("analytics_association_rules", oracle=_ASSOC_SQL)
def analytics_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C267: top-20 association rules (confidence + lift, both
    directions) over part co-purchases — the Apriori rule-generation
    step on the k=2 frequent itemsets that
    `analytics_part_cooccurrence` counts.

    Scale: the pair space is quadratic in BASKET size (bounded), not
    corpus size — the self-join shares one orderkey shuffle (exchange
    reuse); item supports broadcast back onto the min-support-pruned
    pair table; the basket total is a 1-row broadcast
    (audit-allowlisted); top-20 via TakeOrderedAndProject on a total
    order.

    Evaluate-once probe (optimization r12 session 5, measured and
    REVERTED): a staged build that localCheckpoint()ed op / item /
    total / joined-pair read build+run 2.43 -> 8.12 s at sf0.1 — the
    self-join's two ``op`` references already share one l_orderkey
    shuffle via exchange reuse, so eager barriers only added
    materialization and job floors. Recompute beats materialize here
    (guide §2.6; the spatial_lof_outliers counter-example)."""
    from ..tables import sql_over

    return sql_over(spark, sf_dir, _ASSOC_SQL, ("lineitem",))


# r12 C271: log-rank test — the inferential companion of C111's
# Kaplan-Meier CURVES: are the two cohorts' survival distributions
# (even vs odd user_id; lifetime = days between first and last
# activity, last-day-alive users censored, exactly C111's
# construction) actually DIFFERENT? At each distinct duration the
# hypergeometric expectation E1 = d*n1/n and variance
# d*(n1/n)*(1-n1/n)*(n-d)/(n-1) accumulate over the bounded duration
# grid; observed/expected/variance sums are IEEE over exact BIGINT
# at-risk counts, z = (O1-E1)/sqrt(V) one final chain. The even/odd
# split is hash-free and deterministic; with no planted difference
# the statistic must sit near zero (twin-pinned).


def _logrank_sql(epoch: str, idiv: str) -> str:
    return f"""
WITH u AS (
  SELECT user_id,
         min({epoch}) {idiv} {86_400_000_000} AS d0,
         max({epoch}) {idiv} {86_400_000_000} AS d1
  FROM events GROUP BY user_id
), obs AS (SELECT max(d1) AS dmax FROM u),
lif AS (
  SELECT d1 - d0 AS dur,
         CAST(CASE WHEN d1 = dmax THEN 1 ELSE 0 END AS BIGINT) AS censored,
         CAST(user_id % 2 AS BIGINT) AS grp
  FROM u CROSS JOIN obs
), grid AS (
  SELECT dur,
         CAST(sum(1 - censored) AS BIGINT) AS d_all,
         CAST(sum(CASE WHEN grp = 1 THEN 1 - censored ELSE 0 END) AS BIGINT)
           AS d_g1,
         CAST(count(1) AS BIGINT) AS leaving,
         CAST(sum(grp) AS BIGINT) AS leaving_g1
  FROM lif GROUP BY dur
), tot AS (
  SELECT CAST(count(1) AS BIGINT) AS n,
         CAST(sum(grp) AS BIGINT) AS n_g1
  FROM lif
), risk AS (
  SELECT dur, d_all, d_g1,
         n - coalesce(sum(leaving) OVER (ORDER BY dur ASC ROWS BETWEEN
             UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r_all,
         n_g1 - coalesce(sum(leaving_g1) OVER (ORDER BY dur ASC ROWS BETWEEN
             UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r_g1
  FROM grid CROSS JOIN tot
), m AS (
  SELECT CAST(sum(d_g1) AS BIGINT) AS o1,
         sum(d_all * CAST(r_g1 AS DOUBLE) / CAST(r_all AS DOUBLE)) AS e1,
         sum(CASE WHEN r_all > 1 THEN
               d_all * (CAST(r_g1 AS DOUBLE) / CAST(r_all AS DOUBLE))
                     * (1 - CAST(r_g1 AS DOUBLE) / CAST(r_all AS DOUBLE))
                     * (CAST(r_all - d_all AS DOUBLE)
                        / CAST(r_all - 1 AS DOUBLE))
             ELSE 0 END) AS v1
  FROM risk WHERE d_all > 0
)
SELECT o1 AS observed_g1,
       round(e1, 4) AS expected_g1,
       round(v1, 4) AS variance_g1,
       round((o1 - e1) / sqrt(v1), 4) AS z_logrank,
       round((o1 - e1) * (o1 - e1) / v1, 4) AS chi2_logrank
FROM m
"""


@query("stats_logrank_test",
       oracle=_logrank_sql("epoch_us(ts)", "//"))
def stats_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C271: two-group log-rank (Mantel-Cox) test on the C111
    lifetime construction, cohorts = even/odd user_id. O/E/V
    accumulate over the bounded duration grid (calendar-bounded days,
    never user count); at-risk counts come from the same offset
    windows as Kaplan-Meier.

    Scale: one per-user min/max pass (map-side combined), then all
    work on the |durations|-row grid — windows allowlisted bounded,
    1-row total broadcast."""
    from ..tables import sql_over

    return sql_over(
        spark, sf_dir, _logrank_sql("unix_micros(ts)", "div"), ("events",)
    )
