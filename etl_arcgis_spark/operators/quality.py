"""Data-quality / profiling operators — the validation pass a
large-scale pipeline runs before trusting a 100 TB input.

The reference validates its inputs declaratively (TypeBox schemas,
task.ts:13-46) and drops/skips malformed features at runtime
(task.ts:178-187, CHANGELOG.md:179). Generalized to an engine, that
becomes first-class profiling + rule checking:

- ``profile_numeric_columns``: per-column null count / distinct count /
  min / max over the fact table — the dbt-style profile, one scan.
- ``dq_rule_checks``: named assertion rules (domain ranges, referential
  integrity) with violation counts and rates — the quality gate.

Both are ordinary aggregates: they run at any SF with one or two scans
and no new machinery, which is exactly why they belong in the engine
rather than in driver-side scripts iterating over collect()ed rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..helpers import r4
from ..registry import query
from ..tables import table

_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@query(
    "profile_numeric_columns",
    oracle="""
SELECT 'l_quantity' AS col, count(*) - count(l_quantity) AS n_null,
       count(DISTINCT l_quantity) AS n_distinct,
       min(l_quantity) AS min_v, max(l_quantity) AS max_v
FROM lineitem
UNION ALL
SELECT 'l_extendedprice', count(*) - count(l_extendedprice),
       count(DISTINCT l_extendedprice), min(l_extendedprice), max(l_extendedprice)
FROM lineitem
UNION ALL
SELECT 'l_discount', count(*) - count(l_discount),
       count(DISTINCT l_discount), min(l_discount), max(l_discount)
FROM lineitem
UNION ALL
SELECT 'l_tax', count(*) - count(l_tax),
       count(DISTINCT l_tax), min(l_tax), max(l_tax)
FROM lineitem
""",
)
def profile_numeric_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of the fact table's numeric measures: null count,
    exact distinct count, min, max — one output row per column. min/max
    pass through exactly (no arithmetic, no rounding needed).

    Scale: Spark computes ALL columns' profiles in a single scan (one
    wide aggregate + a stack/unpivot to rows) — at 100 TB the scan is
    the cost, so per-column passes (the oracle's UNION ALL spelling,
    which DuckDB is free to use at fixture scale) would multiply it.
    The exact count_distinct per column is the only shuffled piece;
    swap in approx_count_distinct when a profile tolerates ~2% error."""
    li = table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__n_null"),
            F.count_distinct(c).alias(f"{c}__n_distinct"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__n_null, {c}__n_distinct, {c}__min, {c}__max"
        for c in _PROFILE_COLS
    )
    return wide.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack}) "
            "AS (col, n_null, n_distinct, min_v, max_v)"
        )
    )


@query(
    "dq_rule_checks",
    oracle="""
WITH n AS (SELECT count(*) AS n_rows FROM lineitem)
SELECT 'discount_in_unit_range' AS rule,
       CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
       round(CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS DOUBLE)
             / n.n_rows, 4) AS rate
FROM lineitem CROSS JOIN n GROUP BY n.n_rows
UNION ALL
SELECT 'quantity_le_45',
       CAST(sum(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS BIGINT),
       round(CAST(sum(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS DOUBLE) / n.n_rows, 4)
FROM lineitem CROSS JOIN n GROUP BY n.n_rows
UNION ALL
SELECT 'ship_not_before_order',
       CAST(sum(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END) AS BIGINT),
       round(CAST(sum(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END) AS DOUBLE)
             / n.n_rows, 4)
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
CROSS JOIN n GROUP BY n.n_rows
UNION ALL
SELECT 'lineitem_fk_orders',
       v.c,
       round(CAST(v.c AS DOUBLE) / n.n_rows, 4)
FROM (SELECT count(*) AS c
      FROM (SELECT l_orderkey FROM lineitem
            EXCEPT SELECT o_orderkey FROM orders)) v
CROSS JOIN n
""",
)
def dq_rule_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named data-quality gate: two domain rules (discount within its
    documented unit range, quantity under the expected cap), one
    cross-table consistency rule (no line shipped before its order was
    placed), and one referential rule (every lineitem has a parent
    order — spelled as a key anti-check). Output: rule, violation
    count, violation rate over the fact row count. Zero counts are the
    healthy case and are asserted, not skipped — a gate that can't
    report zero can't prove health.

    Scale: the domain rules fold into ONE fact scan as conditional
    sums; the consistency rule joins on the fact's own join key
    (co-partitioned with any downstream order join); the FK check is a
    key-projected anti set-op (distinct keys, tiny vs the fact). The
    1-row total-count broadcast prices rates without a second pass."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    n = li.agg(F.count(F.lit(1)).alias("n_rows"))

    def rate(cnt):
        return r4(cnt.cast("double") / F.col("n_rows"))

    disc_viol = F.sum(
        F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1).otherwise(0)
    )
    qty_viol = F.sum(F.when(F.col("l_quantity") > 45, 1).otherwise(0))
    domain = (
        li.crossJoin(F.broadcast(n))
        .groupBy("n_rows")
        .agg(disc_viol.alias("v_disc"), qty_viol.alias("v_qty"))
    )
    r_disc = domain.select(
        F.lit("discount_in_unit_range").alias("rule"),
        F.col("v_disc").alias("n_violations"),
        rate(F.col("v_disc")).alias("rate"),
    )
    r_qty = domain.select(
        F.lit("quantity_le_45").alias("rule"),
        F.col("v_qty").alias("n_violations"),
        rate(F.col("v_qty")).alias("rate"),
    )
    ship = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .crossJoin(F.broadcast(n))
        .groupBy("n_rows")
        .agg(
            F.sum(
                F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0)
            ).alias("v")
        )
        .select(
            F.lit("ship_not_before_order").alias("rule"),
            F.col("v").alias("n_violations"),
            rate(F.col("v")).alias("rate"),
        )
    )
    orphan = (
        li.select("l_orderkey").distinct()
        .join(orders.select("o_orderkey").distinct(),
              F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        # global count: one row even when the anti-join is empty, so
        # the gate always reports the rule
        .agg(F.count(F.lit(1)).alias("v"))
        .crossJoin(F.broadcast(n))
        .select(
            F.lit("lineitem_fk_orders").alias("rule"),
            F.col("v").alias("n_violations"),
            rate(F.col("v")).alias("rate"),
        )
    )
    return r_disc.unionByName(r_qty).unionByName(ship).unionByName(orphan)


@query(
    "dq_benford_first_digit",
    oracle="""
WITH d AS (
  SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
           AS digit
  FROM orders WHERE o_totalprice >= 1
), n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM d)
SELECT digit, count(*) AS observed,
       round(count(*) / any_value(n.n), 4) AS obs_share,
       round(ln(1.0 + 1.0 / CAST(digit AS DOUBLE)) / ln(10.0), 4)
         AS benford_share
FROM d CROSS JOIN n
GROUP BY digit
""",
)
def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screen on order totals: observed first-digit
    shares vs the log10(1 + 1/d) expectation — the classic fabricated-
    data / unit-mixup smell test for financial columns. The first
    digit comes from the INTEGER part's string form (integer-to-string
    is engine-identical; double-to-string is not), with floor()
    applied explicitly on both engines because CAST(double AS BIGINT)
    truncates in Spark but rounds in DuckDB.

    Scale: one conditional scan + a 9-group aggregate; the total-count
    broadcast prices shares without a second pass. (Synthetic uniform
    fixtures will flunk Benford — the point is the report shape.)"""
    d = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
            ).alias("digit")
        )
    )
    n = d.agg(F.count(F.lit(1)).cast("double").alias("n"))
    return (
        d.crossJoin(F.broadcast(n))
        .groupBy("digit")
        .agg(
            F.count(F.lit(1)).alias("observed"),
            r4(F.count(F.lit(1)) / F.any_value("n")).alias("obs_share"),
            r4(
                F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
                / F.log(F.lit(10.0))
            ).alias("benford_share"),
        )
    )


@query(
    "dq_referential_integrity",
    oracle="""
SELECT * FROM (
  SELECT 'lineitem.l_orderkey -> orders' AS fk_edge,
         CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_child,
         CAST((SELECT count(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM orders o
                                 WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
           AS n_orphans
  UNION ALL
  SELECT 'orders.o_custkey -> customer',
         CAST((SELECT count(*) FROM orders) AS BIGINT),
         CAST((SELECT count(*) FROM orders o
               WHERE NOT EXISTS (SELECT 1 FROM customer c
                                 WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
  UNION ALL
  SELECT 'lineitem.l_partkey -> part',
         CAST((SELECT count(*) FROM lineitem) AS BIGINT),
         CAST((SELECT count(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM part p
                                 WHERE p.p_partkey = l.l_partkey)) AS BIGINT)
  UNION ALL
  SELECT 'lineitem.l_suppkey -> supplier',
         CAST((SELECT count(*) FROM lineitem) AS BIGINT),
         CAST((SELECT count(*) FROM lineitem l
               WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                 WHERE s.s_suppkey = l.l_suppkey)) AS BIGINT)
  UNION ALL
  SELECT 'customer.c_nationkey -> nation',
         CAST((SELECT count(*) FROM customer) AS BIGINT),
         CAST((SELECT count(*) FROM customer c
               WHERE NOT EXISTS (SELECT 1 FROM nation n
                                 WHERE n.n_nationkey = c.c_nationkey)) AS BIGINT)
) ORDER BY fk_edge
""",
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across every FK edge of the star
    schema: child rows whose key has no parent (orphans). The check an
    ingest pipeline runs after every load — the reference's per-feature
    existence probe (task.ts:267-275: query-by-key before add/update)
    is this exact question asked one HTTP call at a time; the engine
    asks it once per edge as a LEFT ANTI join.

    Scale: each edge is one anti-join — broadcast when the parent is a
    fixed-cardinality dim (nation), shuffle-hash with AQE otherwise;
    counts are map-side-combinable. The five edges are independent
    jobs a scheduler can run in parallel. Output is 5 rows regardless
    of scale. On clean fixtures every n_orphans is 0 — which is the
    point: the query is the regression tripwire, not a report."""
    edges = [
        ("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders.o_custkey -> customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem.l_partkey -> part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.l_suppkey -> supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("customer.c_nationkey -> nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    parts = []
    for label, child_t, child_k, parent_t, parent_k in edges:
        child = table(spark, sf_dir, child_t)
        parent = table(spark, sf_dir, parent_t).select(parent_k)
        orphans = child.join(
            parent, child[child_k] == parent[parent_k], "left_anti"
        )
        parts.append(
            child.agg(F.count(F.lit(1)).cast("bigint").alias("n_child")).crossJoin(
                orphans.agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
            ).select(F.lit(label).alias("fk_edge"), "n_child", "n_orphans")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy(F.asc("fk_edge"))


@query(
    "profile_outliers_mad",
    oracle="""
WITH med AS (
  SELECT median(l_extendedprice) AS m FROM lineitem
),
mad AS (
  SELECT median(abs(l_extendedprice - m)) AS d, any_value(m) AS m
  FROM lineitem, med
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       round(any_value(m), 4) AS med,
       round(any_value(d), 4) AS mad,
       CAST(sum(CASE WHEN abs(l_extendedprice - m) > 3 * 1.4826 * d
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM lineitem, mad
""",
)
def profile_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier profiling via MAD (median absolute deviation):
    the data-quality gate that survives the heavy tails a z-score
    breaks on (the 3σ rule with σ replaced by 1.4826·MAD, the normal-
    consistent robust scale). Two exact medians (value, then absolute
    deviation from it) computed with Spark's exact percentile and
    broadcast back as 1-row scalars; the outlier count is one more
    pass.

    Determinism: both engines interpolate the even-count median as the
    mean of the two middle values — identical doubles, division only
    (no accumulated sums) — so the strict comparison in the outlier
    count sees bit-identical operands on both sides.

    Scale: each median runs the agg_median_two_phase bucket
    decomposition (scale_patterns.two_phase_global_median — exactness
    argument there; for p=0.5 it is bit-identical to the built-in
    percentile, which this spelling replaced in optimization r12: the
    single-reduce interpreted percentile cost ~2 s per call on the
    fixture AND is the hidden memory bomb at 100 TB), keeping the same
    three-pass shape."""
    from .scale_patterns import two_phase_global_median

    li = table(spark, sf_dir, "lineitem").select("l_extendedprice")
    med = F.broadcast(two_phase_global_median(li, "l_extendedprice", "m"))
    mad = F.broadcast(
        two_phase_global_median(
            li.crossJoin(med).select(
                (F.abs(F.col("l_extendedprice") - F.col("m"))).alias("dev"), "m"
            ),
            "dev",
            "d",
        ).crossJoin(med)
    )
    return li.crossJoin(mad).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        r4(F.first("m")).alias("med"),
        r4(F.first("d")).alias("mad"),
        F.sum(
            (
                F.abs(F.col("l_extendedprice") - F.col("m"))
                > 3 * 1.4826 * F.col("d")
            ).cast("long")
        )
        .cast("bigint")
        .alias("n_outliers"),
    )


_DRIFT_SPLIT_US = 1_705_276_800_000_000  # 2024-01-15T00:00:00Z


@query(
    "dq_distribution_drift",
    oracle=f"""
WITH a AS (
  SELECT event_type, count(*) AS na FROM events
  WHERE epoch_us(ts) < {_DRIFT_SPLIT_US} GROUP BY 1
), b AS (
  SELECT event_type, count(*) AS nb FROM events
  WHERE epoch_us(ts) >= {_DRIFT_SPLIT_US} GROUP BY 1
), ta AS (SELECT CAST(sum(na) AS BIGINT) AS sa FROM a),
   tb AS (SELECT CAST(sum(nb) AS BIGINT) AS sb FROM b)
SELECT coalesce(a.event_type, b.event_type) AS event_type,
       CAST(coalesce(na, 0) AS BIGINT) AS n_before,
       CAST(coalesce(nb, 0) AS BIGINT) AS n_after,
       round(coalesce(na, 0) / CAST(sa AS DOUBLE), 4) AS share_before,
       round(coalesce(nb, 0) / CAST(sb AS DOUBLE), 4) AS share_after,
       round(abs(coalesce(na, 0) / CAST(sa AS DOUBLE)
               - coalesce(nb, 0) / CAST(sb AS DOUBLE)), 4) AS drift
FROM a FULL OUTER JOIN b ON a.event_type = b.event_type
CROSS JOIN ta CROSS JOIN tb
ORDER BY event_type
""",
)
def dq_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical distribution drift between two time slices — the
    data-quality monitor that catches schema-compatible but
    semantically-shifted feeds (a category's share jumping is the
    first sign of an upstream change no schema check sees). Per
    category: before/after counts, shares, and the absolute share
    delta (summing drift/2 over categories gives total variation
    distance).

    Scale: two filtered map-side-combined aggregates over one scan
    (at 100 TB: two partition-pruned date ranges), a |categories|-row
    full-outer merge, and two 1-row total broadcasts — output is
    |categories| rows regardless of input size."""
    from ..helpers import ev_us

    ev = table(spark, sf_dir, "events").select("event_type", ev_us().alias("t"))
    a = ev.filter(F.col("t") < _DRIFT_SPLIT_US).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("na")
    )
    b = ev.filter(F.col("t") >= _DRIFT_SPLIT_US).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("nb")
    )
    ta = F.broadcast(a.agg(F.sum("na").alias("sa")))
    tb = F.broadcast(b.agg(F.sum("nb").alias("sb")))
    m = (
        a.alias("a")
        .join(b.alias("b"), F.col("a.event_type") == F.col("b.event_type"), "full_outer")
        .crossJoin(ta)
        .crossJoin(tb)
    )
    na = F.coalesce(F.col("na"), F.lit(0))
    nb = F.coalesce(F.col("nb"), F.lit(0))
    sh_a = na / F.col("sa").cast("double")
    sh_b = nb / F.col("sb").cast("double")
    return m.select(
        F.coalesce(F.col("a.event_type"), F.col("b.event_type")).alias("event_type"),
        na.cast("bigint").alias("n_before"),
        nb.cast("bigint").alias("n_after"),
        r4(sh_a).alias("share_before"),
        r4(sh_b).alias("share_after"),
        r4(F.abs(sh_a - sh_b)).alias("drift"),
    ).orderBy(F.asc("event_type"))


@query(
    "dq_control_chart",
    oracle="""
WITH hourly AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
         CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
), lim AS (
  SELECT event_type,
         avg(y) AS mu,
         sqrt(avg(y * y) - avg(y) * avg(y)) AS sigma
  FROM hourly GROUP BY event_type
)
SELECT h.event_type,
       CAST(count(*) AS BIGINT) AS n_hours,
       round(max(lim.mu), 4) AS center,
       round(max(lim.mu + 3 * lim.sigma), 4) AS ucl,
       CAST(count(*) FILTER (h.y > lim.mu + 3 * lim.sigma
                          OR h.y < lim.mu - 3 * lim.sigma) AS BIGINT)
         AS n_out_of_control
FROM hourly h JOIN lim ON h.event_type = lim.event_type
GROUP BY h.event_type
ORDER BY h.event_type
""",
)
def dq_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart control chart over the hourly event-rate series, per
    category: center line (mean hourly count), 3-sigma upper control
    limit, and the count of out-of-control hours — the classic SPC
    monitor that separates common-cause noise from assignable events
    (a feed outage or a bot burst trips the limit; normal variance
    never does). Population sigma from raw moments, same §5.3
    discipline as agg_higher_moments.

    Scale: the hourly series is the bounded aggregate (|categories| x
    |hours|); limits are a |categories|-row broadcast back onto it.
    In production this pairs with dq_freshness_staleness — rate
    anomalies and staleness are the two failure axes."""
    hourly = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000").alias("h"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )
    lim = F.broadcast(
        hourly.groupBy("event_type").agg(
            F.avg("y").alias("mu"),
            F.sqrt(F.avg(F.col("y") * F.col("y")) - F.avg("y") * F.avg("y")).alias(
                "sigma"
            ),
        )
    )
    j = hourly.join(lim, "event_type")
    out = (F.col("y") > F.col("mu") + 3 * F.col("sigma")) | (
        F.col("y") < F.col("mu") - 3 * F.col("sigma")
    )
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hours"),
            r4(F.max("mu")).alias("center"),
            r4(F.max(F.col("mu") + 3 * F.col("sigma"))).alias("ucl"),
            F.sum(out.cast("long")).cast("bigint").alias("n_out_of_control"),
        )
        .orderBy(F.asc("event_type"))
    )


@query(
    "dq_k_anonymity",
    oracle="""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS ab,
         count(*) AS sz
  FROM customer GROUP BY 1, 2, 3
), e AS (
  SELECT k, sz FROM classes CROSS JOIN (SELECT unnest([2, 5, 10]) AS k)
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(sum(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT) AS n_classes_below,
       CAST(coalesce(sum(CASE WHEN sz < k THEN sz END), 0) AS BIGINT) AS n_rows_at_risk,
       round(coalesce(sum(CASE WHEN sz < k THEN sz END), 0) * 1.0 / sum(sz), 4)
         AS pct_at_risk
FROM e GROUP BY k ORDER BY k
""",
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney, 2002) over the quasi-identifier
    (nation, market segment, account-balance band): an equivalence
    class smaller than k means its members are re-identifiable by
    those attributes alone. For each policy threshold k in {2, 5, 10}:
    how many classes fall below k, how many rows they hold, and the
    at-risk fraction — the go/no-go table a training-data release
    review reads before shipping a corpus containing user attributes.

    `floor()` is spelled explicitly before the BIGINT cast on both
    engines (SURVEY §5.3.8 — raw double→int casts truncate on Spark
    but round half-even on DuckDB).

    Scale: one hash-aggregate over the quasi-identifier (map-side
    combined), then a 3x row explode of the CLASS table (|classes|
    rows, not |customer|) and a second tiny aggregate — no cross join,
    no window, no driver collect. At 100 TB the class table is the
    only shuffle and it is bounded by the quasi-identifier domain.
    Reference parity: task.ts has no privacy surface; this is part of
    the mandated training-data pipeline extension tier."""
    cust = table(spark, sf_dir, "customer")
    classes = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).alias("ab"),
    ).agg(F.count(F.lit(1)).alias("sz"))
    ks = F.explode(F.array(*[F.lit(k) for k in (2, 5, 10)])).alias("k")
    e = classes.select(ks, "sz")
    risk = F.when(F.col("sz") < F.col("k"), F.col("sz"))
    return (
        e.groupBy(F.col("k").cast("bigint").alias("k"))
        .agg(
            F.sum((F.col("sz") < F.col("k")).cast("long")).cast("bigint")
            .alias("n_classes_below"),
            F.coalesce(F.sum(risk), F.lit(0)).cast("bigint").alias("n_rows_at_risk"),
            r4(F.coalesce(F.sum(risk), F.lit(0)) / F.sum("sz")).alias("pct_at_risk"),
        )
        .orderBy(F.asc("k"))
    )


@query(
    "dq_score_calibration",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS l,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
), s AS (
  SELECT doc_id, y,
         CAST(len(list_distinct(l)) AS DOUBLE) / len(l) AS score
  FROM t
), b AS (
  SELECT least(9, CAST(floor(score * 10) AS BIGINT)) AS bin, score, y FROM s
)
SELECT bin,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(score), 4) AS avg_score,
       round(avg(CAST(y AS DOUBLE)), 4) AS label_rate,
       round(abs(avg(score) - avg(CAST(y AS DOUBLE))), 4) AS abs_gap
FROM b GROUP BY bin ORDER BY bin
""",
)
def dq_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score-calibration (reliability) table for a filtering signal —
    the evaluation a classifier-filtered corpus pipeline (FineWeb-Edu
    style) runs before trusting a quality score as a keep-probability:
    decile-bin the score, compare each bin's mean score (confidence)
    with its empirical proxy-label rate (here lang='en' as the binary
    proxy), and report the per-bin gap. Expected Calibration Error is
    the n-weighted sum of abs_gap over these rows — left to the
    consumer so the query stays a pure reliability table.

    Binning floors score*10 on BOTH engines over identical IEEE
    doubles, so bin assignment is deterministic even at bin-boundary
    rationals. Scale: one map-only score pass (array HOFs, no
    shuffle) into a 10-row hash aggregate."""
    docs = table(spark, sf_dir, "documents").withColumn("l", F.split("text", " "))
    score = F.size(F.array_distinct("l")).cast("double") / F.size("l")
    y = (F.col("lang") == "en").cast("double")
    b = docs.select(
        F.least(F.lit(9), F.floor(score * 10)).cast("bigint").alias("bin"),
        score.alias("score"),
        y.alias("y"),
    )
    return (
        b.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            r4(F.avg("score")).alias("avg_score"),
            r4(F.avg("y")).alias("label_rate"),
            r4(F.abs(F.avg("score") - F.avg("y"))).alias("abs_gap"),
        )
        .orderBy(F.asc("bin"))
    )


@query(
    "dq_functional_dependency",
    oracle="""
WITH pairs AS (
  SELECT 'o_custkey->o_orderpriority' AS fd,
         CAST(o_custkey AS VARCHAR) AS det,
         CAST(o_orderpriority AS VARCHAR) AS dep FROM orders
  UNION ALL
  SELECT 'l_orderkey->l_returnflag',
         CAST(l_orderkey AS VARCHAR), CAST(l_returnflag AS VARCHAR)
  FROM lineitem
  UNION ALL
  SELECT 'l_partkey->l_tax',
         CAST(l_partkey AS VARCHAR), CAST(l_tax AS VARCHAR) FROM lineitem
), g AS (
  SELECT fd, det, count(DISTINCT dep) AS ndep FROM pairs GROUP BY fd, det
)
SELECT fd, CAST(count(*) AS BIGINT) AS n_groups,
       CAST(count(*) FILTER (ndep > 1) AS BIGINT) AS n_violating,
       round(CAST(count(*) FILTER (ndep > 1) AS DOUBLE) / count(*), 4)
         AS violation_share,
       CAST(max(ndep) AS BIGINT) AS max_distinct_dep
FROM g GROUP BY fd
""",
)
def dq_functional_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit (Metanome/data-profiling family):
    for each candidate FD ``det -> dep``, how many determinant groups
    carry MORE than one dependent value — n_groups, violating groups,
    violation share, and the worst fan-out. The schema-level complement
    of dq_k_anonymity/dq_rule_checks: rule checks validate rows, this
    validates STRUCTURE (is this column still a key? did an upstream
    join fan out?).

    Scale: one shuffle per FD on the determinant (the unavoidable
    group-by), count_distinct within groups is partial-aggregated;
    output is |FD list| rows. Each FD aggregates on its NATIVE column
    types and only the three 1-row results are unioned (optimization
    r12, guide §2.3 narrower types): the old spelling cast every
    (det, dep) pair to STRING so one union could carry heterogeneous
    types — 1.35M string pairs through one exchange where bigint keys
    shuffle at half the bytes and hash/compare far faster. The casts
    were injective (int -> string, double -> string), so per-FD group
    and distinct counts are IDENTICAL; the fd label now attaches to
    the post-aggregate row only."""
    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")

    def one_fd(src: DataFrame, fd: str, det: str, dep: str) -> DataFrame:
        g = (
            src.select(F.col(det).alias("det"), F.col(dep).alias("dep"))
            .groupBy("det")
            .agg(F.countDistinct("dep").alias("ndep"))
        )
        return g.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.count(F.when(F.col("ndep") > 1, 1)).cast("bigint").alias("n_violating"),
            r4(
                F.count(F.when(F.col("ndep") > 1, 1)).cast("double")
                / F.count(F.lit(1))
            ).alias("violation_share"),
            F.max("ndep").cast("bigint").alias("max_distinct_dep"),
        ).select(F.lit(fd).alias("fd"), "*")

    return (
        one_fd(orders, "o_custkey->o_orderpriority", "o_custkey", "o_orderpriority")
        .unionAll(one_fd(li, "l_orderkey->l_returnflag", "l_orderkey", "l_returnflag"))
        .unionAll(one_fd(li, "l_partkey->l_tax", "l_partkey", "l_tax"))
    )


# IND-discovery candidate columns (table, column), bit position = index.
# All integer-typed key-ish columns of the fixture schema; <= 63 so one
# BIGINT bitmask row per distinct value covers the whole lattice.
_IND_COLS = (
    ("customer", "c_custkey"),
    ("customer", "c_nationkey"),
    ("orders", "o_orderkey"),
    ("orders", "o_custkey"),
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("lineitem", "l_suppkey"),
    ("part", "p_partkey"),
    ("supplier", "s_suppkey"),
    ("supplier", "s_nationkey"),
    ("nation", "n_nationkey"),
    ("nation", "n_regionkey"),
    ("region", "r_regionkey"),
    ("events", "user_id"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
)


def _ind_oracle() -> str:
    n = len(_IND_COLS)
    names = "[" + ", ".join(f"'{t}.{c}'" for t, c in _IND_COLS) + "]"
    unions = "\n  UNION ALL\n".join(
        f"  SELECT CAST({c} AS BIGINT) AS v, CAST({1 << i} AS BIGINT) AS bit"
        f" FROM {t} WHERE {c} IS NOT NULL"
        for i, (t, c) in enumerate(_IND_COLS)
    )
    return f"""
WITH vals AS (
{unions}
),
masks AS (
  SELECT v, bit_or(bit) AS mask FROM vals GROUP BY v
),
member AS (
  SELECT i.i AS a, m.mask
  FROM masks m, (SELECT unnest(range(0, {n})) AS i) i
  WHERE (m.mask >> CAST(i.i AS INT)) & 1 = 1
),
contained AS (
  SELECT a, bit_and(mask) AS inds, CAST(count(*) AS BIGINT) AS n_distinct
  FROM member GROUP BY a
)
SELECT list_extract({names}, CAST(c.a AS INT) + 1) AS fk_col,
       list_extract({names}, CAST(j.i AS INT) + 1) AS pk_col,
       c.n_distinct AS n_distinct_fk
FROM contained c, (SELECT unnest(range(0, {n})) AS i) j
WHERE (c.inds >> CAST(j.i AS INT)) & 1 = 1 AND j.i <> c.a
"""


@query("dq_inclusion_dependencies", oracle=_ind_oracle())
def dq_inclusion_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C165: unary inclusion-dependency DISCOVERY (SPIDER/Metanome
    family — Bauckmann et al. 2006; the schema-profiling complement
    of C63's known-edge integrity audit and C135's FD discovery):
    which column pairs (A, B) among all 16 integer key-ish columns
    satisfy A ⊆ B — the candidate-foreign-key lattice a catalog tool
    mines from an undocumented warehouse.

    Distributed spelling is 2 hash aggregates, NO per-pair work:
    every (column, value) occurrence maps to a BIGINT one-hot bit;
    bit_or per VALUE builds the membership mask (map-side combine
    collapses duplicate values before the one big shuffle); exploding
    each mask's set bits and bit_and-ing per COLUMN leaves exactly
    the columns that contain EVERY value of A. The full O(n²) pair
    lattice is answered by two linear passes + a 16-row tail —
    integer-exact end to end (no float surface at all).

    The discovered lattice on the fixtures includes the 8 designed FK
    edges plus the value-range accidents (r_regionkey ⊆ n_nationkey
    etc.) — reporting those IS correct IND semantics; ranking real
    FKs above accidents is a downstream heuristic."""
    n = len(_IND_COLS)
    parts = []
    for i, (t, c) in enumerate(_IND_COLS):
        parts.append(
            table(spark, sf_dir, t)
            .where(F.col(c).isNotNull())
            .select(
                F.col(c).cast("bigint").alias("v"),
                F.lit(1 << i).cast("bigint").alias("bit"),
            )
        )
    vals = parts[0]
    for p in parts[1:]:
        vals = vals.unionAll(p)
    masks = vals.groupBy("v").agg(F.bit_or("bit").alias("mask"))
    member = masks.select(
        F.explode(
            F.expr(
                f"filter(sequence(0, {n - 1}),"
                " i -> (shiftright(mask, i) % 2) = 1)"
            )
        ).alias("a"),
        "mask",
    )
    contained = member.groupBy("a").agg(
        F.bit_and("mask").alias("inds"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
    )
    names = F.array(*[F.lit(f"{t}.{c}") for t, c in _IND_COLS])
    out = contained.select(
        F.col("a"),
        F.col("n_distinct"),
        F.explode(
            F.expr(
                f"filter(sequence(0, {n - 1}),"
                " i -> (shiftright(inds, i) % 2) = 1 AND i != a)"
            )
        ).alias("b"),
    )
    return out.select(
        F.element_at(names, F.col("a") + 1).alias("fk_col"),
        F.element_at(names, F.col("b") + 1).alias("pk_col"),
        F.col("n_distinct").alias("n_distinct_fk"),
    )


@query(
    "dq_l_diversity",
    oracle="""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
         count(*) AS sz,
         count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS ndist
  FROM customer GROUP BY 1, 2
), e AS (
  SELECT l, sz, ndist FROM classes CROSS JOIN (SELECT unnest([2, 3, 5]) AS l)
)
SELECT CAST(l AS BIGINT) AS l,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(CASE WHEN ndist < l THEN 1 ELSE 0 END) AS BIGINT)
         AS n_classes_below,
       CAST(coalesce(sum(CASE WHEN ndist < l THEN sz END), 0) AS BIGINT)
         AS n_rows_at_risk,
       round(coalesce(sum(CASE WHEN ndist < l THEN sz END), 0) * 1.0 / sum(sz), 4)
         AS pct_at_risk
FROM e GROUP BY l ORDER BY l
""",
)
def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-DIVERSITY audit (Machanavajjhala et al. 2007) — the
    HOMOGENEITY-attack complement of dq_k_anonymity: a class can
    satisfy k-anonymity (large enough) and still leak, if every member
    shares the SAME sensitive value; distinct l-diversity requires
    each quasi-identifier class (nation, market segment) to contain at
    least l distinct sensitive values (account-balance band). For each
    policy l in {2, 3, 5}: classes below l, rows they hold, at-risk
    fraction — the second gate of the privacy release review, read
    together with the k-anonymity table.

    Scale: one hash-aggregate over the quasi-identifier computing
    count + exact count-distinct of the BOUNDED sensitive domain
    (11 balance bands — the distinct fits the partial aggregate), then
    the 3× policy explode over the class table. Same shuffle story as
    dq_k_anonymity: bounded by the QI domain, never the fact table.
    All counts exact BIGINTs; the one float is the final ratio."""
    cust = table(spark, sf_dir, "customer")
    classes = cust.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("sz"),
        F.count_distinct(
            F.floor(F.col("c_acctbal") / 1000).cast("bigint")
        ).alias("ndist"),
    )
    ls = F.explode(F.array(*[F.lit(x) for x in (2, 3, 5)])).alias("l")
    e = classes.select(ls, "sz", "ndist")
    risk = F.when(F.col("ndist") < F.col("l"), F.col("sz"))
    return (
        e.groupBy(F.col("l").cast("bigint").alias("l"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.sum((F.col("ndist") < F.col("l")).cast("long")).cast("bigint")
            .alias("n_classes_below"),
            F.coalesce(F.sum(risk), F.lit(0)).cast("bigint")
            .alias("n_rows_at_risk"),
            r4(F.coalesce(F.sum(risk), F.lit(0)) / F.sum("sz"))
            .alias("pct_at_risk"),
        )
        .orderBy(F.asc("l"))
    )


@query(
    "dq_isotonic_calibration",
    oracle="""
WITH t AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         least(9, CAST(floor(len(list_distinct(string_split(text, ' ')))
               / CAST(len(string_split(text, ' ')) AS DOUBLE) * 10) AS BIGINT))
           AS bin
  FROM documents
), b AS (
  SELECT bin, count(*) AS w, sum(y) AS s FROM t GROUP BY bin
), arr AS (
  SELECT list_sort(list({'bin': bin, 'w': w, 's': s})) AS a,
         count(*) AS nb
  FROM b
), pre AS (
  SELECT a, nb,
    list_transform(generate_series(1, nb),
      k -> list_reduce(list_transform(list_slice(a, 1, k), e -> e.w),
                       (x, y) -> x + y)) AS pw,
    list_transform(generate_series(1, nb),
      k -> list_reduce(list_transform(list_slice(a, 1, k), e -> e.s),
                       (x, y) -> x + y)) AS ps
  FROM arr
), iso AS (
  SELECT a, nb,
    list_transform(generate_series(1, nb), t ->
      list_reduce(
        list_slice(
          list_transform(generate_series(1, nb), i ->
            list_reduce(
              list_slice(
                list_transform(generate_series(1, nb), j -> {
                  'n': ps[j] - CASE WHEN i > 1 THEN ps[i - 1] ELSE 0 END,
                  'd': pw[j] - CASE WHEN i > 1 THEN pw[i - 1] ELSE 0 END}),
                t, nb),
              (mn, f) -> CASE WHEN f.n * mn.d < mn.n * f.d THEN f ELSE mn END)),
          1, t),
        (mx, f) -> CASE WHEN f.n * mx.d > mx.n * f.d THEN f ELSE mx END))
      AS isof
  FROM pre
)
SELECT a[t].bin AS bin,
       CAST(a[t].w AS BIGINT) AS n,
       CAST(a[t].s AS BIGINT) AS n_pos,
       round(CAST(a[t].s AS DOUBLE) / CAST(a[t].w AS DOUBLE), 4) AS raw_rate,
       round(CAST(isof[t].n AS DOUBLE) / CAST(isof[t].d AS DOUBLE), 4)
         AS iso_rate
FROM iso, unnest(generate_series(1, nb)) AS u(t)
""",
)
def dq_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISOTONIC REGRESSION calibration (PAVA; Ayer et al. 1955,
    Zadrozny & Elkan 2002) of the lexical-quality score against the
    English label over the same 10 score bins as dq_score_calibration:
    the monotone-nondecreasing fit iso(t) = max_{i<=t} min_{j>=t}
    avg(y_i..y_j) — the pool-adjacent-violators solution in its exact
    minimax closed form. The output is the calibration MAP a
    production scorer actually applies (Platt's parametric alternative
    needs exp; isotonic is the standard non-parametric choice for
    reward-model and quality-classifier calibration).

    Exactness (the strongest §5.3 form): bin weights and positive
    counts are exact BIGINTs; every candidate average is carried as an
    integer FRACTION (num, den) and every min/max comparison is an
    integer CROSS-MULTIPLICATION — the entire PAVA fit is computed in
    exact arithmetic on both engines, with the only float ops two
    final divisions per bin. Products bounded by |rows|² < 2^63.

    Scale: one map-side-combined aggregate to <=10 bin rows, then the
    whole O(bins³) minimax (<=1000 fraction comparisons) evaluates
    IN ONE ROW via nested HOF folds; the fact table is touched once.
    At any corpus size the cost after the aggregate is constant."""
    from ..tables import sql_over

    return sql_over(
        spark,
        sf_dir,
        """
WITH t AS (
  SELECT CASE WHEN lang = 'en' THEN 1L ELSE 0L END AS y,
         least(9L, CAST(floor(size(array_distinct(split(text, ' ')))
               / CAST(size(split(text, ' ')) AS DOUBLE) * 10) AS BIGINT))
           AS bin
  FROM documents
), b AS (
  SELECT bin, count(1) AS w, sum(y) AS s FROM t GROUP BY bin
), arr AS (
  SELECT sort_array(collect_list(named_struct('bin', bin, 'w', w, 's', s))) AS a,
         count(1) AS nb
  FROM b
), pre AS (
  SELECT a, CAST(nb AS INT) AS nb,
    transform(sequence(1, CAST(nb AS INT)),
      k -> aggregate(slice(a, 1, k), 0L, (acc, e) -> acc + e.w)) AS pw,
    transform(sequence(1, CAST(nb AS INT)),
      k -> aggregate(slice(a, 1, k), 0L, (acc, e) -> acc + e.s)) AS ps
  FROM arr
), iso AS (
  SELECT a, nb,
    transform(sequence(1, nb), t ->
      aggregate(
        slice(
          transform(sequence(1, nb), i ->
            aggregate(
              slice(
                transform(sequence(1, nb), j -> named_struct(
                  'n', ps[j - 1] - CASE WHEN i > 1 THEN ps[i - 2] ELSE 0L END,
                  'd', pw[j - 1] - CASE WHEN i > 1 THEN pw[i - 2] ELSE 0L END)),
                t, nb - t + 1),
              element_at(
                transform(sequence(1, nb), j -> named_struct(
                  'n', ps[j - 1] - CASE WHEN i > 1 THEN ps[i - 2] ELSE 0L END,
                  'd', pw[j - 1] - CASE WHEN i > 1 THEN pw[i - 2] ELSE 0L END)),
                t),
              (mn, f) -> CASE WHEN f.n * mn.d < mn.n * f.d THEN f ELSE mn END)),
          1, t),
        named_struct('n', CAST(-1 AS BIGINT), 'd', 1L),
        (mx, f) -> CASE WHEN f.n * mx.d > mx.n * f.d THEN f ELSE mx END))
      AS isof
  FROM pre
)
SELECT a[t - 1].bin AS bin,
       CAST(a[t - 1].w AS BIGINT) AS n,
       CAST(a[t - 1].s AS BIGINT) AS n_pos,
       CAST(signum(CAST(a[t - 1].s AS DOUBLE) / CAST(a[t - 1].w AS DOUBLE))
            * floor(abs(CAST(a[t - 1].s AS DOUBLE) / CAST(a[t - 1].w AS DOUBLE))
                    * 10000 + 0.5) / 10000 AS DOUBLE) AS raw_rate,
       CAST(signum(CAST(isof[t - 1].n AS DOUBLE) / CAST(isof[t - 1].d AS DOUBLE))
            * floor(abs(CAST(isof[t - 1].n AS DOUBLE) / CAST(isof[t - 1].d AS DOUBLE))
                    * 10000 + 0.5) / 10000 AS DOUBLE) AS iso_rate
FROM iso LATERAL VIEW explode(sequence(1, nb)) x AS t
""",
        ("documents",),
    )


# ---------------------------------------------------------------------------
# C214: Check Geometry (ArcGIS "Check/Repair Geometry") — per-feature
# structural validation of polygon rings: vertex count, ring closure,
# duplicate consecutive vertices, proper self-intersection. Defects
# are PLANTED by key class on exact-integer coordinates, so every
# check is integer arithmetic with a bit-exact oracle.


def _geomchk_exprs(engine: str) -> dict[str, str]:
    """Engine spellings over a vertex array ``vs`` of (x, y) structs.
    All coordinates are exact integers; the self-intersection test is
    the strict orientation-sign crossing over ALL segment pairs
    (shared-endpoint pairs cannot STRICTLY cross, so no adjacency
    bookkeeping is needed)."""
    sp = engine == "spark"
    if sp:
        def v(i):  # 0-based
            return f"vs[{i}]"
        seq = "sequence(0, n - 2)"   # segment start indices
        pair_flat = (
            "flatten(transform(sequence(0, n - 2), i -> "
            "transform(sequence(0, n - 2), j -> named_struct('i', i, 'j', j))))"
        )
        exists_fn, filt = "exists", "filter"
        first, last = "vs[0]", "vs[n - 1]"
        dup = (
            "exists(sequence(0, n - 2), i -> "
            "vs[i].x = vs[i + 1].x AND vs[i].y = vs[i + 1].y)"
        )
    else:
        seq = "range(0, n - 1)"
        pair_flat = (
            "flatten(list_transform(range(0, n - 1), i -> "
            "list_transform(range(0, n - 1), j -> {'i': i, 'j': j})))"
        )
        exists_fn, filt = "list_bool_or", "list_filter"
        first, last = "vs[1]", "vs[n]"
        dup = (
            "len(list_filter(range(1, n), i -> "
            "vs[i].x = vs[i + 1].x AND vs[i].y = vs[i + 1].y)) > 0"
        )

    def seg(idx, which):  # segment idx: vs[idx] -> vs[idx+1], 0-based
        off = 0 if sp else 1
        i = f"(p.{idx} + {off})"
        j = f"(p.{idx} + {off} + 1)"
        return (f"vs[{i}]", f"vs[{j}]") if which == "both" else None

    def orient(ax, ay, bx, by, cx, cy):
        return f"sign(({bx} - {ax}) * ({cy} - {ay}) - ({by} - {ay}) * ({cx} - {ax}))"

    off = 0 if sp else 1
    a1, a2 = f"vs[p.i + {off}]", f"vs[p.i + {off} + 1]"
    b1, b2 = f"vs[p.j + {off}]", f"vs[p.j + {off} + 1]"
    o1 = orient(f"{a1}.x", f"{a1}.y", f"{a2}.x", f"{a2}.y", f"{b1}.x", f"{b1}.y")
    o2 = orient(f"{a1}.x", f"{a1}.y", f"{a2}.x", f"{a2}.y", f"{b2}.x", f"{b2}.y")
    o3 = orient(f"{b1}.x", f"{b1}.y", f"{b2}.x", f"{b2}.y", f"{a1}.x", f"{a1}.y")
    o4 = orient(f"{b1}.x", f"{b1}.y", f"{b2}.x", f"{b2}.y", f"{a2}.x", f"{a2}.y")
    cross = f"({o1} * {o2} < 0 AND {o3} * {o4} < 0)"
    if sp:
        selfx = (
            f"exists(filter({pair_flat}, p -> p.i < p.j), p -> {cross})"
        )
    else:
        selfx = (
            f"len(list_filter(list_filter({pair_flat}, p -> p.i < p.j), "
            f"p -> {cross})) > 0"
        )
    return {
        "closed": f"{first}.x = {last}.x AND {first}.y = {last}.y",
        "dup": dup,
        "selfx": selfx,
    }


_GEOMCHK_RING_SQL = """
CASE p_partkey % 5
  WHEN 0 THEN {sq}
  WHEN 1 THEN {few}
  WHEN 2 THEN {open_}
  WHEN 3 THEN {dupv}
  ELSE {bow}
END"""


def _geomchk_rings(engine: str) -> str:
    """Planted ring per defect class, offset by key-derived integers
    (exact): 0 = valid closed square, 1 = too few vertices, 2 =
    unclosed square, 3 = duplicate consecutive vertex, 4 = bowtie
    (proper self-intersection)."""
    mk = (
        (lambda pts: "array(" + ", ".join(
            f"named_struct('x', CAST(ox + {x} AS BIGINT), 'y', CAST(oy + {y} AS BIGINT))"
            for x, y in pts) + ")")
        if engine == "spark"
        else (lambda pts: "[" + ", ".join(
            f"{{'x': CAST(ox + {x} AS BIGINT), 'y': CAST(oy + {y} AS BIGINT)}}"
            for x, y in pts) + "]")
    )
    sq = mk([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)])
    few = mk([(0, 0), (4, 0), (0, 0)])
    open_ = mk([(0, 0), (4, 0), (4, 4), (0, 4)])
    dupv = mk([(0, 0), (4, 0), (4, 0), (4, 4), (0, 4), (0, 0)])
    bow = mk([(0, 0), (4, 4), (4, 0), (0, 4), (0, 0)])
    return _GEOMCHK_RING_SQL.format(sq=sq, few=few, open_=open_, dupv=dupv, bow=bow)


_GEOMCHK_VERDICT = """
CASE WHEN n < 4 THEN 'too_few_vertices'
     WHEN NOT ({closed}) THEN 'unclosed_ring'
     WHEN {dup} THEN 'duplicate_vertices'
     WHEN {selfx} THEN 'self_intersection'
     ELSE 'ok' END"""


@query(
    "dq_geometry_check",
    oracle=f"""
WITH base AS (
  SELECT p_partkey,
         CAST(p_partkey % 7 AS BIGINT) AS ox,
         CAST(p_partkey % 5 AS BIGINT) AS oy
  FROM part
), g AS (
  SELECT p_partkey, {_geomchk_rings("duck")} AS vs FROM base
), n_ AS (SELECT p_partkey, vs, len(vs) AS n FROM g)
SELECT p_partkey,
       CAST(n AS BIGINT) AS n_vertices,
       {_GEOMCHK_VERDICT.format(**_geomchk_exprs("duck"))} AS geometry_error
FROM n_
""",
)
def dq_geometry_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C214: per-feature geometry validation — the data-quality gate
    the reference's ingest path needs before routing/converting
    features (task.ts:178-187 skips by type; this checks STRUCTURE):
    minimum vertex count for a closed ring, ring closure (Esri JSON
    requires first == last), duplicate consecutive vertices, and
    proper self-intersection (strict orientation-sign crossing over
    all segment pairs — shared endpoints cannot strictly cross, so
    the O(m^2) in-row fold needs no adjacency cases). One error class
    per feature by ArcGIS Check Geometry precedence.

    Scale: pure in-row HOF integer arithmetic over bounded vertex
    arrays — zero shuffle, scan speed; m^2 is bounded by per-feature
    vertex count, never by table size. Determinism: every coordinate
    is an exact integer (defects planted by key class), every check a
    sign/equality on exact ints — no float surface at all."""
    e = _geomchk_exprs("spark")
    base = table(spark, sf_dir, "part").selectExpr(
        "p_partkey",
        "CAST(p_partkey % 7 AS BIGINT) AS ox",
        "CAST(p_partkey % 5 AS BIGINT) AS oy",
    )
    g = base.withColumn("vs", F.expr(_geomchk_rings("spark")))
    n_ = g.withColumn("n", F.size("vs"))
    return n_.select(
        "p_partkey",
        F.col("n").cast("bigint").alias("n_vertices"),
        F.expr(_GEOMCHK_VERDICT.format(**e)).alias("geometry_error"),
    )


# r11 C233: PII scan. Patterns restricted to the Java-regex ∩ RE2
# subset (character classes, bounded counts, \b word boundaries — NO
# lookaround, NO backrefs) so Spark rlike and DuckDB regexp_matches
# decide identically. The synthetic corpus carries no organic PII, so
# detectable markers are PLANTED deterministically per doc_id — the
# scan's recall over known truth is part of the oracle contract.
_PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PII_SSN = r"\b\d{3}-\d{2}-\d{4}\b"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_PII_DOC_SQL = """
  SELECT doc_id, source,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact: user' || CAST(doc_id AS VARCHAR)
                      || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' ssn 123-45-' || substr(CAST(10000 + doc_id % 10000 AS VARCHAR), 2, 4)
                 ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'
                 ELSE '' END AS body
  FROM documents
"""


@query(
    "dq_pii_scan",
    oracle=f"""
WITH d AS ({_PII_DOC_SQL})
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN regexp_matches(body, '{_PII_EMAIL}') THEN 1 ELSE 0 END) AS BIGINT) AS n_email,
       CAST(sum(CASE WHEN regexp_matches(body, '{_PII_SSN}') THEN 1 ELSE 0 END) AS BIGINT) AS n_ssn,
       CAST(sum(CASE WHEN regexp_matches(body, '{_PII_IPV4}') THEN 1 ELSE 0 END) AS BIGINT) AS n_ipv4,
       round(CAST(sum(CASE WHEN regexp_matches(body, '{_PII_EMAIL}')
                             OR regexp_matches(body, '{_PII_SSN}')
                             OR regexp_matches(body, '{_PII_IPV4}')
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 4) AS pii_rate
FROM d GROUP BY source
""",
)
def dq_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C233: PII scan — per-source detection counts and rates for
    email / SSN-shaped / IPv4 patterns, the governance gate a corpus
    runs before release (the multi-class generalization of A18-family
    etl_pii_mask_digits' digit scrub). Patterns live in the
    Java-regex ∩ RE2 common subset so both engines decide identically;
    markers are PLANTED deterministically (doc_id % 7/11/13) so the
    scan's recall over known truth is oracle-checked, not assumed.

    Scale: map-only regex over the scan (no shuffle beyond the
    per-source aggregate); at 100 TB this is embarrassingly parallel
    and I/O-bound — exactly why the patterns must be anchored/bounded
    (catastrophic-backtracking-free in both engines: no lookaround,
    no nested unbounded groups)."""
    spark_body_sql = _PII_DOC_SQL.replace("VARCHAR", "STRING")
    # Spark's SQL parser consumes backslash escapes inside string
    # literals ('\\d' parses to 'd', '\\b' to backspace) where DuckDB
    # keeps them literal — double them for the Spark text only.
    em, ssn, ip = (
        p.replace("\\", "\\\\") for p in (_PII_EMAIL, _PII_SSN, _PII_IPV4)
    )
    from ..tables import sql_over

    return sql_over(
        spark,
        sf_dir,
        f"""
WITH d AS ({spark_body_sql})
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN body rlike '{em}' THEN 1 ELSE 0 END) AS BIGINT) AS n_email,
       CAST(sum(CASE WHEN body rlike '{ssn}' THEN 1 ELSE 0 END) AS BIGINT) AS n_ssn,
       CAST(sum(CASE WHEN body rlike '{ip}' THEN 1 ELSE 0 END) AS BIGINT) AS n_ipv4,
       round(CAST(sum(CASE WHEN body rlike '{em}'
                             OR body rlike '{ssn}'
                             OR body rlike '{ip}'
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 4) AS pii_rate
FROM d GROUP BY source
""",
        ("documents",),
    )


# r12 C258: Population Stability Index — the industry-standard drift
# scalar (banking/model-monitoring convention: PSI < 0.1 stable,
# 0.1-0.25 shifting, > 0.25 action) that dq_distribution_drift's
# per-category TVD table deliberately does not collapse to. Same
# before/after time slices; Laplace-smoothed shares (+1 count per
# category on both sides) keep ln defined for categories absent from
# one slice. The two ln calls per category run on IEEE-identical
# inputs (exact integer counts cast identically), so cross-engine
# divergence is bounded by 1 ulp of libm ln — absorbed by r6 (the
# C91 Jensen-Shannon precedent).


def _psi_sql(epoch: str) -> str:
    pa = "((CAST(coalesce(na, 0) AS DOUBLE) + 1) / (CAST(sa AS DOUBLE) + k))"
    pb = "((CAST(coalesce(nb, 0) AS DOUBLE) + 1) / (CAST(sb AS DOUBLE) + k))"
    return f"""
WITH a AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS na FROM events
  WHERE {epoch} < {_DRIFT_SPLIT_US} GROUP BY event_type
), b AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS nb FROM events
  WHERE {epoch} >= {_DRIFT_SPLIT_US} GROUP BY event_type
), m AS (
  SELECT coalesce(a.event_type, b.event_type) AS event_type, na, nb
  FROM a FULL OUTER JOIN b ON a.event_type = b.event_type
), t AS (
  SELECT CAST(sum(coalesce(na, 0)) AS BIGINT) AS sa,
         CAST(sum(coalesce(nb, 0)) AS BIGINT) AS sb,
         CAST(count(*) AS DOUBLE) AS k
  FROM m
), per AS (
  SELECT event_type,
         ({pb} - {pa}) * ln({pb} / {pa}) AS contrib
  FROM m, t
)
SELECT CAST(count(*) AS BIGINT) AS n_categories,
       round(sum(contrib), 6) AS psi,
       CASE WHEN sum(contrib) < 0.1 THEN 'stable'
            WHEN sum(contrib) < 0.25 THEN 'shifting'
            ELSE 'action' END AS verdict
FROM per
"""


@query("dq_psi_drift", oracle=_psi_sql("epoch_us(ts)"))
def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C258: Population Stability Index between the same before/after
    slices as dq_distribution_drift — the single drift scalar model
    monitoring alarms on (the banking-origin 0.1/0.25 thresholds),
    complementing the per-category TVD table: PSI weights each
    category's share change by its log-ratio, so a small category
    collapsing to zero registers where TVD barely moves.
    Laplace-smoothed shares keep ln defined; integer counts make the
    ln inputs IEEE-identical, ln's last-ulp spread absorbed by r6.

    Scale: two partition-prunable filtered aggregates over one scan,
    a |categories|-row merge, constant work after."""
    from ..tables import sql_over

    return sql_over(spark, sf_dir, _psi_sql("unix_micros(ts)"), ("events",))


# r12 C286: join-key skew diagnostics — the pre-flight check behind
# every salting/broadcast decision in this engine (C55's salted join
# FIXES skew; this MEASURES it before you pay for the fix): for each
# candidate join key, the key count, max/p99 group sizes, the
# max-to-mean hot-key ratio, and the share of rows owned by the top
# key. At 1000 executors a max/mean of 50 on the shuffle key IS the
# straggler — this query is how you find it without running the join.
# Everything is exact integers off one count-aggregate per key; p99
# group size uses the same integer-threshold percentile_disc
# spelling as C285 over the bounded group-size-histogram.

_SKEW_KEYS = ("l_orderkey", "l_partkey", "l_suppkey")

_SKEW_BLOCK = """
SELECT '{key}' AS join_key,
       CAST(count(1) AS BIGINT) AS n_keys,
       CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(max(c) AS BIGINT) AS max_group,
       round(max(c) * count(1) / CAST(sum(c) AS DOUBLE), 4)
         AS max_over_mean,
       round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS top_key_row_share
FROM (SELECT {key} AS k, CAST(count(1) AS BIGINT) AS c
      FROM lineitem GROUP BY {key}) g
"""

_SKEW_SQL = ("SELECT * FROM ("
             + "\nUNION ALL\n".join(
                 _SKEW_BLOCK.format(key=k) for k in _SKEW_KEYS)
             + ") u ORDER BY max_over_mean DESC, join_key ASC")


@query("dq_join_key_skew", oracle=_SKEW_SQL)
def dq_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C286: shuffle-key skew profile for the three lineitem join
    keys — key cardinality, hottest group size, max/mean ratio, and
    the top key's row share; ranked by skew. The operational query a
    100 TB planner runs BEFORE picking broadcast vs shuffle vs
    salted (C55) strategies.

    Scale: one map-side-combined count per key (Catalyst shares the
    scan across the UNION branches); the moment tail runs on the
    |keys|-row group table — no windows, no joins."""
    from ..tables import sql_over

    return sql_over(spark, sf_dir, _SKEW_SQL, ("lineitem",))
