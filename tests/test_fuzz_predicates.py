"""Generative differential test: random SQL-92 predicates evaluated by
BOTH engines over the same parquet must select identical row sets.

This fuzzes the grammar the reference forwards verbatim as
``ARCGIS_QUERY`` (task.ts:406-408): comparisons, IN, BETWEEN, AND/OR/
NOT over numeric and string columns. The property: Spark
``filter(expr(P))`` row count == DuckDB ``WHERE P`` row count for the
same predicate text P (derandomized hypothesis — reproducible corpus).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from etl_arcgis_spark.tables import table


SF_DIR = "/root/testdata/sf0.001"

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_orderkey", "l_linenumber"]
STR_COLS = {
    "l_returnflag": ["A", "N", "R"],
    "l_linestatus": ["F", "O"],
}
NUM_LITS = [0, 1, 7, 25, 50, 0.05, 0.5, 900.0, 45000.0, 3000]


# Slow tier (optimization r13, VERDICT r12 order #2): heavyweight
# subprocess/streaming/property suite — excluded from the default
# pytest run (pytest.ini), executed with `-m slow`.
pytestmark = pytest.mark.slow


def num_atom(draw) -> str:
    col = draw(st.sampled_from(NUM_COLS))
    kind = draw(st.sampled_from(["cmp", "between", "in"]))
    if kind == "cmp":
        op = draw(st.sampled_from(["<", "<=", "=", ">", ">=", "<>"]))
        lit = draw(st.sampled_from(NUM_LITS))
        return f"{col} {op} {lit}"
    if kind == "between":
        a, b = sorted([draw(st.sampled_from(NUM_LITS)), draw(st.sampled_from(NUM_LITS))])
        return f"{col} BETWEEN {a} AND {b}"
    lits = draw(st.lists(st.sampled_from(NUM_LITS), min_size=1, max_size=3))
    return f"{col} IN ({', '.join(map(str, lits))})"


def str_atom(draw) -> str:
    col = draw(st.sampled_from(sorted(STR_COLS)))
    vals = STR_COLS[col]
    kind = draw(st.sampled_from(["eq", "in", "ne"]))
    if kind == "eq":
        return f"{col} = '{draw(st.sampled_from(vals))}'"
    if kind == "ne":
        return f"{col} <> '{draw(st.sampled_from(vals))}'"
    lits = draw(st.lists(st.sampled_from(vals), min_size=1, max_size=2))
    return "{} IN ({})".format(col, ", ".join(f"'{v}'" for v in lits))


@st.composite
def predicate(draw, depth: int = 0) -> str:
    if depth >= 2 or draw(st.booleans()):
        return num_atom(draw) if draw(st.booleans()) else str_atom(draw)
    left = draw(predicate(depth=depth + 1))
    right = draw(predicate(depth=depth + 1))
    op = draw(st.sampled_from(["AND", "OR"]))
    neg = "NOT " if draw(st.booleans()) else ""
    return f"{neg}(({left}) {op} ({right}))"


@pytest.fixture(scope="module")
def engines(spark):
    li = table(spark, SF_DIR, "lineitem").cache()
    li.count()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')")
    yield li, con
    # unpersist: later tests assert parquet-scan plan shapes on the same
    # file, and a live cache would substitute InMemoryTableScan for them
    li.unpersist()


@settings(
    max_examples=60,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_predicate_agreement(engines, data):
    li, con = engines
    pred = data.draw(predicate())
    spark_n = li.filter(F.expr(pred)).count()
    duck_n = con.execute(f"SELECT count(*) FROM lineitem WHERE {pred}").fetchone()[0]
    assert spark_n == duck_n, f"disagreement on: {pred} (spark={spark_n} duck={duck_n})"


AGG_MEASURES = [
    "count(*) AS n",
    "count(DISTINCT l_suppkey) AS nd_supp",
    "min(l_extendedprice) AS min_p",
    "max(l_extendedprice) AS max_p",
    "min(l_shipdate) AS min_d",
    "max(l_orderkey) AS max_k",
]
AGG_DIMS = ["l_returnflag", "l_linestatus", "l_orderkey % 10", "l_linenumber"]


@pytest.fixture(scope="module")
def sql_engines(spark):
    table(spark, SF_DIR, "lineitem").createOrReplaceTempView("lineitem")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')")
    return spark, con


@settings(
    max_examples=30,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_aggregation_agreement(sql_engines, data):
    """Same SQL text through Spark SQL and DuckDB: random group-by over
    random dims/filters with order-independent exact measures (count /
    distinct / min / max — no float-summation ambiguity) must produce
    identical result sets."""
    spark, con = sql_engines
    dims = data.draw(
        st.lists(st.sampled_from(AGG_DIMS), min_size=1, max_size=2, unique=True)
    )
    measures = data.draw(
        st.lists(st.sampled_from(AGG_MEASURES), min_size=1, max_size=3, unique=True)
    )
    pred = data.draw(predicate())
    dim_aliases = [f"{d} AS d{i}" for i, d in enumerate(dims)]
    sql = (
        f"SELECT {', '.join(dim_aliases + measures)} FROM lineitem "
        f"WHERE {pred} GROUP BY {', '.join(f'd{i}' for i in range(len(dims)))}"
    )
    a = {tuple(map(str, r)) for r in spark.sql(sql).collect()}
    b = {tuple(map(str, r)) for r in con.execute(sql).fetchall()}
    assert a == b, f"disagreement on: {sql}"


WIN_AGGS = [
    "sum(l_linenumber)",
    "sum(l_orderkey)",
    "count(*)",
    "min(l_orderkey)",
    "max(l_linenumber)",
]
WIN_PARTS = ["l_returnflag", "l_linestatus", "l_suppkey"]


@settings(
    max_examples=30,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_window_frame_agreement(sql_engines, data):
    """Same SQL text through both engines: random bounded/unbounded
    ROWS-frame window aggregates (integer-exact measures, total-order
    tiebreak per SURVEY.md §5.3.3) reduced to one exact scalar — frame
    boundary semantics must agree everywhere."""
    spark, con = sql_engines
    agg = data.draw(st.sampled_from(WIN_AGGS))
    part = data.draw(st.sampled_from(WIN_PARTS))
    prec = data.draw(st.integers(min_value=0, max_value=5))
    foll = data.draw(st.integers(min_value=0, max_value=5))
    start = (
        "UNBOUNDED PRECEDING" if data.draw(st.booleans()) else f"{prec} PRECEDING"
    )
    frame = f"ROWS BETWEEN {start} AND {foll} FOLLOWING"
    win = (
        f"{agg} OVER (PARTITION BY {part} "
        f"ORDER BY l_orderkey ASC, l_linenumber ASC {frame})"
    )
    sql = f"SELECT sum(w) AS s, count(*) AS n FROM (SELECT {win} AS w FROM lineitem) t"
    a = [tuple(map(str, r)) for r in spark.sql(sql).collect()]
    b = [tuple(map(str, r)) for r in con.execute(sql).fetchall()]
    assert a == b, f"disagreement on: {sql} (spark={a} duck={b})"
