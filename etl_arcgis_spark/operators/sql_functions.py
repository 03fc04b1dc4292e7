"""Scalar-function surface — SURVEY.md §2 C27-C32.

The reference's row transforms use exactly this family (concat/replace
for ids task.ts:427, coalesce defaults task.ts:242-251, ln/tan/radians
for reprojection task.ts:194, vertex arrays task.ts:203-217, JSON
parsing task.ts:172-175). Each query packs one function family; all are
built-in ``pyspark.sql.functions`` — JVM expressions inside whole-stage
codegen, never Python.

Cross-engine notes baked in below:
- DuckDB ``regexp_replace`` is first-match unless the 'g' flag is given
  (Spark replaces all);
- DuckDB ``length``/``datediff``/``year`` return BIGINT where Spark has
  INT — Spark side casts up;
- bare double->int casts disagree (truncate vs round) — always floor();
- ``try_element_at`` on Spark ≡ out-of-bounds-is-NULL list indexing on
  DuckDB (and is ANSI-mode-proof).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..helpers import r4
from ..registry import query
from ..tables import table


@query(
    "str_funcs",
    oracle="""
SELECT c_custkey,
       upper(c_name) AS up_name,
       lower(c_mktsegment) AS lo_seg,
       CAST(length(c_name) AS BIGINT) AS name_len,
       substring(c_name, 10, 6) AS name_mid,
       replace(c_name, 'Customer', 'Cust') AS name_short,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_pad,
       trim(' ' || c_mktsegment || ' ') AS seg_trim,
       regexp_extract(c_name, '[0-9]+') AS digits,
       regexp_replace(c_name, '[0-9]', '', 'g') AS no_digits,
       CAST(len(string_split(c_name, '#')) AS BIGINT) AS n_parts
FROM customer
""",
)
def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C27: string functions (concat/upper/lower/trim/substring/replace/
    length/lpad/split/regexp_*)."""
    cu = table(spark, sf_dir, "customer")
    return cu.select(
        "c_custkey",
        F.upper("c_name").alias("up_name"),
        F.lower("c_mktsegment").alias("lo_seg"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.substring("c_name", 10, 6).alias("name_mid"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_pad"),
        F.trim(F.concat(F.lit(" "), F.col("c_mktsegment"), F.lit(" "))).alias("seg_trim"),
        F.regexp_extract("c_name", "[0-9]+", 0).alias("digits"),
        F.regexp_replace("c_name", "[0-9]", "").alias("no_digits"),
        F.size(F.split("c_name", "#")).cast("bigint").alias("n_parts"),
    )


@query(
    "date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(month(o_orderdate) AS BIGINT) AS mo,
       CAST(day(o_orderdate) AS BIGINT) AS dom,
       date_trunc('month', o_orderdate) AS month_start,
       CAST(datediff('day', o_orderdate, TIMESTAMP '1998-01-01 00:00:00') AS BIGINT) AS days_to_98,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus30,
       epoch_ms(o_orderdate) AS order_ms,
       make_date(CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT), 1) AS first_of_month
FROM orders
""",
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C28: date/time functions (extract/trunc/diff/add/epoch/make_date)
    on the ms-precision order date (µs-safe, SURVEY.md §5.3.2)."""
    od = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return od.select(
        "o_orderkey",
        F.year(d).cast("bigint").alias("yr"),
        F.month(d).cast("bigint").alias("mo"),
        F.dayofmonth(d).cast("bigint").alias("dom"),
        F.date_trunc("month", d).alias("month_start"),
        F.datediff(F.lit("1998-01-01").cast("timestamp"), d).cast("bigint").alias("days_to_98"),
        F.date_add(d.cast("date"), 30).alias("plus30"),
        F.unix_millis(d).alias("order_ms"),
        F.make_date(F.year(d), F.month(d), F.lit(1)).alias("first_of_month"),
    )


@query(
    "math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice, 0) AS price_round,
       round(abs(l_discount - 0.05), 4) AS disc_dev,
       CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
       CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
       round(sqrt(l_extendedprice), 4) AS price_sqrt,
       round(exp(l_discount), 4) AS disc_exp,
       round(ln(l_extendedprice), 4) AS price_ln,
       round(pow(l_quantity, 2), 4) AS qty_sq,
       l_orderkey % 7 AS key_mod,
       round(sin(l_discount) + cos(l_tax) + atan(l_quantity), 4) AS trig
FROM lineitem
""",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C29: math functions (the reprojection family: ln/tan/radians plus
    rounding/floor/ceil/mod/trig)."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 0).alias("price_round"),
        r4(F.abs(F.col("l_discount") - 0.05)).alias("disc_dev"),
        F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        r4(F.sqrt("l_extendedprice")).alias("price_sqrt"),
        r4(F.exp("l_discount")).alias("disc_exp"),
        r4(F.log("l_extendedprice")).alias("price_ln"),
        r4(F.pow("l_quantity", 2)).alias("qty_sq"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        r4(F.sin("l_discount") + F.cos("l_tax") + F.atan("l_quantity")).alias("trig"),
    )


@query(
    "array_funcs",
    oracle="""
SELECT doc_id,
       CAST(len(l) AS BIGINT) AS n_tokens,
       list_contains(l, 'spark') AS has_spark,
       l[1] AS first_tok,
       l[3] AS third_tok,
       array_to_string(l[2:4], ' ') AS mid_slice,
       (list_sort(l))[1] AS min_tok,
       CAST(list_aggregate(list_transform(l, x -> length(x)), 'sum') AS BIGINT) AS total_chars,
       array_to_string(list_transform(l[1:3], x -> upper(x)), ' ') AS up3
FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
""",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C30: array functions over token arrays (the reference's vertex
    arrays, task.ts:203-217) — size/contains/element_at/slice/sort/
    join + higher-order transform/aggregate, all codegen-friendly."""
    docs = table(spark, sf_dir, "documents").withColumn("l", F.split("text", " "))
    return docs.select(
        "doc_id",
        F.size("l").cast("bigint").alias("n_tokens"),
        F.array_contains("l", "spark").alias("has_spark"),
        F.try_element_at("l", F.lit(1)).alias("first_tok"),
        F.try_element_at("l", F.lit(3)).alias("third_tok"),
        F.array_join(F.slice("l", 2, 3), " ").alias("mid_slice"),
        F.try_element_at(F.sort_array("l"), F.lit(1)).alias("min_tok"),
        F.aggregate(
            F.transform("l", lambda x: F.length(x)),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        .cast("bigint")
        .alias("total_chars"),
        F.array_join(F.transform(F.slice("l", 1, 3), lambda x: F.upper(x)), " ").alias("up3"),
    )


@query(
    "map_json_funcs",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
       array_to_string(json_keys(props), ',') AS key_list,
       json_extract_string(props, '$.k') IS NOT NULL AS has_k
FROM events
""",
)
def map_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C31: JSON/map functions over the events.props JSON column (the
    reference parses JSON record bodies, task.ts:172-175): path extract,
    typed cast, key enumeration via from_json to a map."""
    ev = table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
        F.array_join(F.map_keys(m), ",").alias("key_list"),
        F.get_json_object("props", "$.k").isNotNull().alias("has_k"),
    )


@query(
    "sql_try_funcs",
    oracle="""
SELECT o_orderkey,
       TRY_CAST(o_orderpriority AS INTEGER) AS pri_as_int,
       TRY_CAST(string_split(o_orderpriority, '-')[1] AS INTEGER) AS pri_rank,
       CASE WHEN o_custkey % 3 = 0 THEN NULL
            ELSE round(o_totalprice / (o_custkey % 3), 4) END AS price_per,
       TRY_CAST('not a number' AS DOUBLE) AS always_null
FROM orders
""",
)
def sql_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The safe-evaluation scalar surface: the engine runs ANSI mode
    (strict casts/overflow, matching the DuckDB oracle's errors), so
    malformed data must be handled with try_* forms instead of silent
    coercion — try_cast on a non-numeric string yields NULL, not a
    crash and not a zero; try_divide turns division-by-zero into NULL.
    '1-URGENT' fails an integer cast wholesale but its split prefix
    parses — the standard extract-then-cast cleaning step.

    Scale: pure per-row expressions, codegen'd; the reason this is an
    operator at all is the A18 lesson (task.ts:351-353): at 100 TB a
    single malformed row must poison neither the job nor the value —
    NULL + a quarantine filter is the set-based dead-letter."""
    od = table(spark, sf_dir, "orders")
    return od.select(
        "o_orderkey",
        F.col("o_orderpriority").try_cast("int").alias("pri_as_int"),
        F.split("o_orderpriority", "-").getItem(0).try_cast("int").alias("pri_rank"),
        r4(F.try_divide("o_totalprice", F.col("o_custkey") % 3)).alias("price_per"),
        F.lit("not a number").try_cast("double").alias("always_null"),
    )


@query(
    "sql_recursive_month_spine",
    oracle="""
WITH RECURSIVE spine(ym) AS (
  SELECT 199501
  UNION ALL
  SELECT CASE WHEN ym % 100 = 12 THEN (ym // 100 + 1) * 100 + 1 ELSE ym + 1 END
  FROM spine WHERE ym < 200108
), rev AS (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
         round(sum(o_totalprice), 4) AS revenue, count(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT CAST(s.ym AS BIGINT) AS ym,
       coalesce(r.revenue, 0.0) AS revenue,
       coalesce(r.n_orders, 0) AS n_orders
FROM spine s LEFT JOIN rev r ON r.ym = s.ym
""",
)
def sql_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark >= 4.0): generate the full 1995-01..2001-08
    month spine recursively, then left-join monthly order revenue so
    empty months surface as explicit zero rows — the gap-filling
    resample every time-series report needs, expressed in pure SQL on
    BOTH engines (same WITH RECURSIVE text modulo integer-division
    spelling).

    Scale: the recursion happens on the driver-side single-row seed (80
    iterations of a one-row frame — trivial); the real data only joins
    once at the end, broadcast-joining the tiny spine against the
    aggregated months. Never put per-row work inside the recursive arm.
    """
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
WITH RECURSIVE spine(ym) AS (
  SELECT CAST(199501 AS BIGINT) AS ym
  UNION ALL
  SELECT CAST(CASE WHEN ym % 100 = 12 THEN (ym DIV 100 + 1) * 100 + 1
                   ELSE ym + 1 END AS BIGINT)
  FROM spine WHERE ym < 200108
), rev AS (
  SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
         round(sum(o_totalprice), 4) AS revenue, count(*) AS n_orders
  FROM orders_v GROUP BY 1
)
SELECT s.ym,
       coalesce(r.revenue, 0.0d) AS revenue,
       coalesce(r.n_orders, 0L) AS n_orders
FROM spine s LEFT JOIN rev r ON r.ym = s.ym
"""
    )


@query(
    "sql_variant_extract",
    oracle="""
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 10
GROUP BY event_type
""",
)
def sql_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT (Spark >= 4.0): ``parse_json`` the events.props payload
    once into the binary variant encoding, then ``variant_get`` typed
    paths — the engine-native way to run schema-on-read semi-structured
    columns (the reference's dynamic `properties` map, task.ts:429-431)
    WITHOUT per-query string re-parsing.

    Scale: variant stores a parsed binary tree, so repeated path
    extraction is O(path) per row instead of a full JSON text parse per
    expression — at 100 TB the difference between one parse at ingest
    and N parses per query. Predicate on the extracted path still
    prunes rows before the aggregate. Oracle extracts the same paths
    with DuckDB's JSON functions (string-typed JSON, same values).
    """
    ev = table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("vp")
    ).select(
        "event_type",
        F.expr("variant_get(vp, '$.k', 'bigint')").alias("k"),
    )
    return (
        v.filter(F.col("k") > 10)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
            F.max("k").alias("k_max"),
        )
    )


@query(
    "agg_hll_sketch_rollup",
    oracle=None,  # weak: Apache DataSketches HLL binary sketches have no DuckDB twin
)
def agg_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup (Spark >= 3.5 Apache DataSketches HLL):
    build one HLL sketch per event_type, then UNION the pre-aggregated
    sketches to a global distinct estimate — the pattern behind every
    incremental/pre-aggregated distinct-count pipeline (per-day/per-
    partition sketches merged at query time; re-aggregating raw keys
    would re-shuffle 100 TB, merging sketches moves KBs).

    `agg_approx_count_distinct` pins the one-shot estimator; this pins
    the MERGE path (hll_union_agg over hll_sketch_agg outputs).
    Deterministic for fixed input but engine-specific, hence weak
    (rows-only) per SURVEY.md §5.3.6.
    """
    ev = table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
    ).select(F.lit("ALL").alias("event_type"), "est")
    per_type_est = per_type.select(
        "event_type", F.hll_sketch_estimate("sk").alias("est")
    )
    return per_type_est.unionByName(merged)


@query(
    "str_regex_funcs",
    oracle="""
SELECT p_partkey,
       array_to_string(regexp_extract_all(p_name, '[a-z]+'), '|') AS words,
       split_part(p_type, ' ', 1) AS type_head,
       translate(p_brand, 'Brand#', 'brnd-0') AS brand_t,
       reverse(p_name) AS rev_name,
       repeat(left(p_brand, 2), 2) AS rep2,
       CAST(instr(p_name, 'a') AS BIGINT) AS pos_a,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad
FROM part
ORDER BY p_partkey
""",
)
def str_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C27 continued — the regex/positional string family the base
    `str_funcs` query doesn't cover: regexp_extract_all (all matches,
    joined to a string because the driver canonicalizer cannot hash raw
    arrays — the r1 lesson), split_part, translate (the A6-style
    character-map rewrite), reverse, repeat/left, instr (0 when
    absent on BOTH engines), lpad zero-fill. All JVM codegen
    expressions; regex compilation is per-operator-instance, not
    per-row, so the scan stays a single narrow stage.
    """
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.array_join(
            F.expr("regexp_extract_all(p_name, '([a-z]+)', 1)"), "|"
        ).alias("words"),
        F.expr("split_part(p_type, ' ', 1)").alias("type_head"),
        F.translate("p_brand", "Brand#", "brnd-0").alias("brand_t"),
        F.reverse("p_name").alias("rev_name"),
        F.repeat(F.expr("left(p_brand, 2)"), 2).alias("rep2"),
        F.instr("p_name", "a").cast("bigint").alias("pos_a"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
    ).orderBy(F.asc("p_partkey"))


@query(
    "math_bitwise_funcs",
    oracle="""
SELECT o_orderkey,
       o_orderkey & 255 AS b_and,
       o_orderkey | 4096 AS b_or,
       xor(o_orderkey, 1365) AS b_xor,
       o_orderkey << 2 AS b_shl,
       o_orderkey >> 3 AS b_shr,
       CAST(bit_count(o_orderkey) AS BIGINT) AS b_cnt
FROM orders
WHERE o_orderkey % 100 < 7
ORDER BY o_orderkey
""",
)
def math_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C29 continued — the bitwise family (hash partitioners, bitmap
    indexes, feature hashing and the simhash/minhash operators all
    lean on these): and/or/xor, shifts, popcount. Cross-engine notes:
    DuckDB spells xor as a function (its `^` is exponentiation) while
    Spark SQL uses the `^` operator; DuckDB bit_count returns a wider
    integer — Spark side casts to BIGINT. Pure codegen row math over a
    pushed-down modulo filter.
    """
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(F.expr("o_orderkey % 100 < 7"))
        .select(
            "o_orderkey",
            F.expr("o_orderkey & 255").alias("b_and"),
            F.expr("o_orderkey | 4096").alias("b_or"),
            F.expr("o_orderkey ^ 1365").alias("b_xor"),
            F.expr("shiftleft(o_orderkey, 2)").alias("b_shl"),
            F.expr("shiftright(o_orderkey, 3)").alias("b_shr"),
            F.expr("CAST(bit_count(o_orderkey) AS BIGINT)").alias("b_cnt"),
        )
        .orderBy(F.asc("o_orderkey"))
    )


@query(
    "str_collation_ci_group",
    oracle="""
SELECT lower(p_brand) AS brand_ci,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT p_brand) AS BIGINT) AS n_spellings
FROM (
  SELECT CASE WHEN p_partkey % 3 = 0 THEN upper(p_brand)
              WHEN p_partkey % 3 = 1 THEN lower(p_brand)
              ELSE p_brand END AS p_brand
  FROM part
)
GROUP BY lower(p_brand)
ORDER BY brand_ci
""",
)
def str_collation_ci_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping via Spark 4 COLLATIONS (``COLLATE
    UTF8_LCASE``) — the declarative spelling of the lower()-wrapper
    every pre-collation pipeline writes (the oracle keeps the
    lower() form; DuckDB 1.0 has no column collations). Mixed-case
    spellings are manufactured from p_partkey so all SFs exercise the
    merge; n_spellings counts the DISTINCT raw forms each
    case-insensitive group absorbed (case-SENSITIVE distinct inside a
    case-INSENSITIVE group — the two comparison semantics composed).

    Scale note: the collated group key hashes on the collation key
    (one shuffle, same as any group-by); unlike the lower() wrapper
    the collation survives into the optimizer as a string PROPERTY, so
    future engines can push comparisons into scans. The output key is
    normalized with lower() on both engines for a stable hash."""
    from ..tables import table

    p = table(spark, sf_dir, "part").selectExpr(
        """CASE WHEN p_partkey % 3 = 0 THEN upper(p_brand)
                WHEN p_partkey % 3 = 1 THEN lower(p_brand)
                ELSE p_brand END AS p_brand"""
    )
    p.createOrReplaceTempView("part_mixed")
    return p.sparkSession.sql(
        """
SELECT lower(brand_key) AS brand_ci,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT p_brand) AS BIGINT) AS n_spellings
FROM (SELECT p_brand, p_brand COLLATE UTF8_LCASE AS brand_key FROM part_mixed)
GROUP BY brand_key
ORDER BY brand_ci
"""
    )


@query(
    "unpivot_sql_clause",
    oracle="""
SELECT c_custkey, metric, round(val, 4) AS val
FROM (
  SELECT c_custkey, round(c_acctbal, 4) AS acctbal,
         CAST(c_nationkey AS DOUBLE) AS nationkey
  FROM customer
)
UNPIVOT (val FOR metric IN (acctbal, nationkey))
ORDER BY c_custkey, metric
""",
)
def unpivot_sql_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-standard UNPIVOT clause (Spark 3.4+/DuckDB) — the
    declarative twin of unpivot_stack's ``stack()`` spelling: wide
    measure columns to (key, metric, value) rows, the melt every
    metrics pipeline runs before a generic per-metric aggregate.

    Scale: pure narrow row explosion (x n_metrics), no shuffle; the
    clause form keeps column pruning exact (only unpivoted measures
    are read — ReadSchema shows 3 columns)."""
    from ..tables import table

    table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
SELECT c_custkey, metric, round(val, 4) AS val
FROM (
  SELECT c_custkey, round(c_acctbal, 4) AS acctbal,
         CAST(c_nationkey AS DOUBLE) AS nationkey
  FROM customer_v
)
UNPIVOT (val FOR metric IN (acctbal, nationkey))
ORDER BY c_custkey, metric
"""
    )


@query(
    "pivot_sql_clause",
    oracle="""
SELECT o_orderpriority,
       CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS status_o,
       CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS status_f,
       CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS status_p
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def pivot_sql_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL PIVOT clause (Spark 3.4+) — long-to-wide, the inverse of
    unpivot_sql_clause: order counts by priority pivoted over the three
    order statuses. The oracle keeps the portable conditional-aggregate
    spelling (``count(*) FILTER``) because pre-PIVOT engines write the
    pivot exactly that way — the two forms are the same logical plan.

    Empty cells: Spark's PIVOT yields NULL where a (priority, status)
    combination has no rows, the FILTER form yields 0 — coalesce
    pins the count semantics (0) on the Spark side.

    Scale: a pivot over an ENUMERATED value list is one hash aggregate
    (each status becomes a conditional agg expression — no extra
    shuffle, no distinct-values discovery job, which is why the IN
    list is mandatory in a 100 TB pipeline: ``pivot(col)`` without
    values adds a blocking distinct scan)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_pivot_v")
    return spark.sql(
        """
SELECT o_orderpriority,
       coalesce(status_o, CAST(0 AS BIGINT)) AS status_o,
       coalesce(status_f, CAST(0 AS BIGINT)) AS status_f,
       coalesce(status_p, CAST(0 AS BIGINT)) AS status_p
FROM (SELECT o_orderpriority, o_orderstatus FROM orders_pivot_v)
PIVOT (count(*) FOR o_orderstatus IN ('O' AS status_o, 'F' AS status_f, 'P' AS status_p))
ORDER BY o_orderpriority
"""
    )
