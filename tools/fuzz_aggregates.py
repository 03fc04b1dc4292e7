"""Differential aggregate/window fuzz — B7/B8 (groupBy + outStatistics
+ having) and C15-C21 (window frames), the surfaces the predicate
fuzzer (tools/fuzz_extended.py) does not reach.

Two grammars, both executed as IDENTICAL SQL text on Spark
(``spark.sql`` over a temp view) and DuckDB:

- aggregate: random group keys x {count/sum/min/max/avg} over numeric
  columns, optional WHERE from the predicate atoms, optional HAVING on
  an integer count — full row-level value comparison (doubles rounded
  to 4, money sums to integer per SURVEY §5.3.1).
- window: random {sum/min/max/avg/count} over ROWS/RANGE frames with
  random bounds, partitioned by a low-cardinality key, ordered by the
  UNIQUE (l_orderkey, l_linenumber) pair so frame contents are
  deterministic on both engines; RANGE frames order by the integer
  l_orderkey alone with value-based offsets. Checksummed by summing
  the rounded window column (order-insensitive, collision-negligible
  for agreement checking).

Usage: python tools/fuzz_aggregates.py [--n 200] [--seed 20260814]
"""

from __future__ import annotations

import argparse
import random
import sys

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

from etl_arcgis_spark.session import get_session  # noqa: E402
from etl_arcgis_spark.tables import table  # noqa: E402

GROUP_COLS = ["l_returnflag", "l_linestatus", "l_orderkey % 5"]
NUM_COLS = ["l_quantity", "l_discount", "l_linenumber", "l_tax"]
MONEY_COLS = ["l_extendedprice"]
WHERE_ATOMS = [
    "l_quantity < 25",
    "l_discount >= 0.05",
    "l_shipdate < TIMESTAMP '1997-01-01 00:00:00'",
    "l_returnflag <> 'R'",
    "l_orderkey % 3 = 0",
    None,
]


def agg_case(r: random.Random) -> str:
    keys = r.sample(GROUP_COLS, r.randint(1, 2))
    key_aliases = [f"{k} AS k{i}" for i, k in enumerate(keys)]
    aggs = ["CAST(count(*) AS BIGINT) AS n"]
    for j in range(r.randint(1, 3)):
        fn = r.choice(["sum", "min", "max", "avg"])
        col = r.choice(NUM_COLS + MONEY_COLS)
        if col in MONEY_COLS and fn == "sum":
            aggs.append(f"round(sum({col}), 0) AS a{j}")
        else:
            aggs.append(f"round({fn}({col}), 4) AS a{j}")
    where = r.choice(WHERE_ATOMS)
    having = r.choice([None, "count(*) > 100", "count(*) >= 10"])
    sql = "SELECT {}, {} FROM lineitem".format(
        ", ".join(key_aliases), ", ".join(aggs)
    )
    if where:
        sql += f" WHERE {where}"
    sql += " GROUP BY {}".format(", ".join(keys))
    if having:
        sql += f" HAVING {having}"
    return sql


def window_case(r: random.Random) -> str:
    # avg is EXCLUDED from frame cases: dividing small 2-decimal values
    # (l_tax) by small frame counts lands EXACTLY on 1e-4 rounding
    # midpoints (e.g. 0.09/8 = 0.01125), where Spark rounds HALF_UP and
    # DuckDB HALF_EVEN — a documented rounding-rule divergence, not a
    # window-semantics bug (first fuzz run measured ~200 flipped rows
    # per avg case, all exact midpoints). The registered avg queries
    # avoid it via §5.3 magnitude discipline (irregular-double inputs
    # make exact midpoints measure-zero).
    fn = r.choice(["sum", "min", "max", "count"])
    col = r.choice(NUM_COLS)
    part = r.choice(["l_returnflag", "l_linestatus", ""])
    part_sql = f"PARTITION BY {part} " if part else ""
    if r.random() < 0.5:
        lo = r.choice(["UNBOUNDED PRECEDING", "3 PRECEDING", "1 PRECEDING", "CURRENT ROW"])
        hi = r.choice(["CURRENT ROW", "1 FOLLOWING", "3 FOLLOWING", "UNBOUNDED FOLLOWING"])
        frame = f"ROWS BETWEEN {lo} AND {hi}"
        # The synthetic fixture does NOT make (l_orderkey, l_linenumber)
        # unique (11,785 dup pairs at sf0.01 — found by this fuzzer's
        # first run as a bogus "min over frame" disagreement). ROWS
        # frames need a tie-free order, or at least one where tied rows
        # are interchangeable: include the AGGREGATED column and the
        # remaining high-cardinality columns in the sort, so any rows
        # still tied are identical in every value the window can see.
        # explicit NULLS FIRST on every key: Spark defaults ASC NULLS
        # FIRST, DuckDB NULLS LAST — without it, null-injected runs get
        # different tie-break orders and bogus frame disagreements
        order = (
            f"ORDER BY l_orderkey, l_linenumber, {col} NULLS FIRST, "
            "l_extendedprice, l_partkey, l_suppkey"
        )
    else:
        lo = r.choice(["UNBOUNDED PRECEDING", "100 PRECEDING", "10 PRECEDING"])
        hi = r.choice(["CURRENT ROW", "10 FOLLOWING", "100 FOLLOWING"])
        frame = f"RANGE BETWEEN {lo} AND {hi}"
        order = "ORDER BY l_orderkey"
    # empty-partition windows are the audited-out scale smell; the
    # fuzzer still covers them semantically because the engines must
    # agree anyway — but keep partitions ON to bound local-mode cost.
    if not part:
        part_sql = "PARTITION BY l_linestatus "
    expr = f"{fn}({col}) OVER ({part_sql}{order} {frame})"
    # integer-exact checksum: each window value rounds to the 1e-4 grid,
    # scales to an int64, and the SUM is exact integer arithmetic — a
    # float sum checksum trips over midpoint-rounding differences
    # (Spark HALF_UP vs DuckDB HALF_EVEN on x.xx5 sums), which would be
    # false positives, not window-semantics disagreements.
    return (
        "SELECT CAST(sum(CAST(round(round(w, 4) * 10000, 0) AS BIGINT)) AS BIGINT)"
        " AS checksum, CAST(count(*) AS BIGINT) AS n "
        f"FROM (SELECT {expr} AS w FROM lineitem)"
    )


def join_case(r: random.Random) -> str:
    """Join-shape fuzz: INNER / LEFT OUTER aggregates and SEMI / ANTI
    existence probes between lineitem and orders — identical SQL text
    on both engines (EXISTS spelling for semi/anti). Counts plus an
    integer-exact money checksum keep comparison grid-free."""
    o_atom = r.choice(
        [
            "o.o_totalprice > 150000",
            "o.o_orderpriority = '1-URGENT'",
            "o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'",
            None,
        ]
    )
    l_atom = r.choice(["l.l_quantity < 25", "l.l_discount >= 0.05", None])
    kind = r.choice(["inner", "left", "semi", "anti"])
    l_where = f" WHERE {l_atom}" if l_atom else ""
    if kind in ("semi", "anti"):
        neg = "NOT " if kind == "anti" else ""
        o_pred = f" AND {o_atom}" if o_atom else ""
        return (
            "SELECT CAST(count(*) AS BIGINT) AS n, "
            "CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents "
            f"FROM lineitem l WHERE {neg}EXISTS ("
            "SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey"
            f"{o_pred})" + (f" AND {l_atom}" if l_atom else "")
        )
    join_kw = "JOIN" if kind == "inner" else "LEFT JOIN"
    on = "l.l_orderkey = o.o_orderkey" + (f" AND {o_atom}" if o_atom else "")
    return (
        "SELECT CAST(count(*) AS BIGINT) AS n, "
        "CAST(count(o.o_orderkey) AS BIGINT) AS n_matched, "
        "CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents "
        f"FROM lineitem l {join_kw} orders o ON {on}{l_where}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--seed", type=int, default=20260814)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--nulls",
        action="store_true",
        help="inject NULLs identically on both engines: the fixtures are "
        "null-free, so without this flag aggregate null-skipping, null "
        "group keys, and nulls inside window frames are never exercised",
    )
    args = ap.parse_args()

    spark = get_session("fuzz_agg", shuffle_partitions=4)
    li = table(spark, args.sf, "lineitem").cache()
    li.count()
    li.createOrReplaceTempView("lineitem_base")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem_base AS SELECT * FROM read_parquet('{args.sf}/lineitem.parquet')"
    )
    table(spark, args.sf, "orders").createOrReplaceTempView("orders")
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{args.sf}/orders.parquet')"
    )
    # identical SQL text defines the (possibly null-injected) relation
    # on BOTH engines
    if args.nulls:
        view_sql = """
CREATE OR REPLACE TEMPORARY VIEW lineitem AS
SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
       nullif(l_quantity, 25.0) AS l_quantity,
       l_extendedprice,
       nullif(l_discount, 0.05) AS l_discount,
       CASE WHEN l_orderkey % 11 = 0 THEN NULL ELSE l_tax END AS l_tax,
       nullif(l_returnflag, 'A') AS l_returnflag,
       l_linestatus, l_shipdate
FROM lineitem_base
"""
    else:
        view_sql = (
            "CREATE OR REPLACE TEMPORARY VIEW lineitem AS "
            "SELECT * FROM lineitem_base"
        )
    spark.sql(view_sql)
    con.execute(view_sql.replace("TEMPORARY VIEW", "VIEW"))
    r = random.Random(args.seed)
    bad = 0
    for i in range(args.n):
        sql = (agg_case, window_case, join_case)[i % 3](r)
        def _nskey(t):
            return tuple((v is None, v) for v in t)

        try:
            s_rows = sorted(map(tuple, spark.sql(sql).collect()), key=_nskey)
            d_rows = sorted(map(tuple, con.execute(sql).fetchall()), key=_nskey)
        except Exception as e:  # noqa: BLE001
            print(f"ERROR on {sql!r}: {e}")
            bad += 1
            continue
        if s_rows != d_rows:
            print(f"DISAGREE {sql!r}:\n  spark={s_rows[:3]}...\n  duck ={d_rows[:3]}...")
            bad += 1
    print(f"{args.n - bad}/{args.n} agree (seed={args.seed}, sf={args.sf})")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
