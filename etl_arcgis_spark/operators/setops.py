"""Set operators — SURVEY.md §2 A14, C23-C26.

The reference's PRESERVE_HISTORY=true mode is append-only insert
("continuous insert mode", task.ts:235-265) — relationally UNION ALL.
The rest of the family (distinct union / intersect / except) completes
the engine surface. UNION ALL is shuffle-free; the distinct variants are
hash-aggregates over the union with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table

# Two overlapping order slices (F-status vs high-value) shared by all
# four set operations.
_A_SQL = "SELECT o_orderkey, o_custkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'"
_B_SQL = "SELECT o_orderkey, o_custkey, o_orderstatus FROM orders WHERE o_totalprice > 200000"


def _slices(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    od = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderstatus")
    a = od.filter(F.col("o_orderstatus") == "F")
    b = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 200000)
        .select("o_orderkey", "o_custkey", "o_orderstatus")
    )
    return a, b


@query("set_union_all", oracle=f"{_A_SQL}\nUNION ALL\n{_B_SQL}")
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C23/A14: bag union — append-only insert mode; duplicates kept."""
    a, b = _slices(spark, sf_dir)
    return a.unionByName(b)


@query("set_union_distinct", oracle=f"{_A_SQL}\nUNION\n{_B_SQL}")
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C24: distinct union."""
    a, b = _slices(spark, sf_dir)
    return a.unionByName(b).distinct()


@query("set_intersect", oracle=f"{_A_SQL}\nINTERSECT\n{_B_SQL}")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C25: INTERSECT (distinct semantics on both engines)."""
    a, b = _slices(spark, sf_dir)
    return a.intersect(b)


@query("set_except", oracle=f"{_A_SQL}\nEXCEPT\n{_B_SQL}")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C26: EXCEPT (distinct semantics on both engines)."""
    a, b = _slices(spark, sf_dir)
    return a.subtract(b)


# Bag-semantics pair (C26b): EXCEPT ALL / INTERSECT ALL keep
# multiplicities — output count per row = max(0, m_a - m_b), resp.
# min(m_a, m_b) — which only means something over inputs that HAVE
# multiplicities, so these slices project lineitem down to deliberately
# non-unique (partkey-bucket, returnflag) rows.
_BAG_A = (
    "SELECT l_partkey % 500 AS pk, l_returnflag AS flag "
    "FROM lineitem WHERE l_linenumber <= 3"
)
_BAG_B = (
    "SELECT l_partkey % 500 AS pk, l_returnflag AS flag "
    "FROM lineitem WHERE l_quantity > 25"
)


def _bag_slices(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    li = table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") <= 3).select(
        (F.col("l_partkey") % 500).alias("pk"), F.col("l_returnflag").alias("flag")
    )
    b = li.filter(F.col("l_quantity") > 25).select(
        (F.col("l_partkey") % 500).alias("pk"), F.col("l_returnflag").alias("flag")
    )
    return a, b


@query("set_except_all", oracle=f"{_BAG_A}\nEXCEPT ALL\n{_BAG_B}")
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C26 bag form: multiset difference (exceptAll). Planned as a
    count-per-row aggregate + replicate, not a row-by-row anti join —
    multiplicities shuffle as counts, never as repeated rows."""
    a, b = _bag_slices(spark, sf_dir)
    return a.exceptAll(b)


@query("set_intersect_all", oracle=f"{_BAG_A}\nINTERSECT ALL\n{_BAG_B}")
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C25 bag form: multiset intersection (intersectAll)."""
    a, b = _bag_slices(spark, sf_dir)
    return a.intersectAll(b)


@query(
    "set_union_by_name",
    oracle="""
SELECT o_orderkey AS k, o_totalprice AS amount, 'order' AS kind
FROM orders WHERE o_totalprice > 300000
UNION ALL BY NAME
SELECT 'lineitem' AS kind, l_extendedprice AS amount, l_orderkey AS k
FROM lineitem WHERE l_extendedprice > 90000
""",
)
def set_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL BY NAME (DuckDB) ↔ ``unionByName`` (Spark): column
    RESOLUTION by name instead of position — the union every
    multi-source ingestion actually wants (positional UNION silently
    crosses columns the moment two feeds order their schemas
    differently; the second branch here is deliberately reordered to
    prove resolution). The reference's multi-layer ingestion implies
    exactly this merge when layers disagree on field order.

    Scale: identical to UNION ALL — a no-shuffle concatenation of the
    two filtered scans; name resolution is plan-time only."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("amount"),
        F.lit("order").alias("kind"),
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_extendedprice") > 90000
    ).select(
        F.lit("lineitem").alias("kind"),
        F.col("l_extendedprice").alias("amount"),
        F.col("l_orderkey").alias("k"),
    )
    return o.unionByName(li)
