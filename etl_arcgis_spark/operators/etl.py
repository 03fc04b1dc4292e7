"""Reference-surface ETL operators — SURVEY.md §2 Tier A (A6-A12).

These are the row transforms the reference implements in its own code,
re-expressed as narrow (pipelined, shuffle-free) DataFrame projections —
whole-stage-codegen'd, so at 100 TB they run at scan speed:

- A6  id rewrite            task.ts:427   ``layer-{layerId}-{id}``
- A7  property nesting      task.ts:429-431  ``{metadata: properties}``
- A8  multi-geometry explode task.ts:433-444 ``-{idx}`` id suffix
- A9  geometry-type routing task.ts:178-187
- A10 reprojection 4326→3857 task.ts:194,203-207,213-217 (proj4 math)
- A12 attribute defaults    task.ts:242-251 (coalesce semantics)

The driver tables carry no geometry, so geometry-shaped inputs are
derived deterministically from existing columns (documents tokens as
multi-part payloads, event types as geometry type tags, key-derived
lon/lat) — the operator logic is identical to what runs on real GeoJSON
through the same functions (tests/ exercises those on GeoJSON fixtures).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..helpers import r4
from ..registry import query
from ..tables import table


@query(
    "project_computed",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice * (1 - l_discount), 4) AS net_price,
       round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 4) AS charged
FROM lineitem
""",
)
def project_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed projection — narrow op, codegen'd with the scan."""
    li = table(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        r4(net).alias("net_price"),
        r4(net * (1 + F.col("l_tax"))).alias("charged"),
    )


@query(
    "id_rewrite_concat",
    oracle="""
SELECT 'layer-7-' || CAST(event_id AS VARCHAR) AS feature_id, event_id, event_type
FROM events
""",
)
def id_rewrite_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: computed feature id ``layer-{layerId}-{id}`` (task.ts:427)."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        F.concat(F.lit("layer-7-"), F.col("event_id").cast("string")).alias("feature_id"),
        "event_id",
        "event_type",
    )


@query(
    "project_struct_nest",
    oracle="""
SELECT c_custkey,
       to_json(struct_pack(metadata := struct_pack(
           name := c_name, segment := c_mktsegment, nationkey := c_nationkey
       ))) AS properties
FROM customer
""",
)
def project_struct_nest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: wrap all attributes under a ``metadata`` struct
    (``properties = {metadata: properties}``, task.ts:429-431); emitted
    as JSON with a fixed field order so the value is hashable."""
    cu = table(spark, sf_dir, "customer")
    meta = F.struct(
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nationkey"),
    )
    return cu.select(
        "c_custkey",
        F.to_json(F.struct(meta.alias("metadata"))).alias("properties"),
    )


@query(
    "explode_pos_with_id",
    oracle="""
SELECT doc_id || '-' || CAST(i - 1 AS VARCHAR) AS part_id,
       doc_id, CAST(i - 1 AS BIGINT) AS pos, w AS part
FROM (
  SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS w
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
)
""",
)
def explode_pos_with_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: multi-part explode with positional id suffix — ``MultiX`` ->
    N parts with ids ``{id}-{idx}`` and duplicated attributes
    (task.ts:433-444). posexplode is the Spark-native UnMulti: a
    generator in the same stage as the scan, no shuffle."""
    docs = table(spark, sf_dir, "documents")
    parts = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "part")
    )
    return parts.select(
        F.concat(
            F.col("doc_id").cast("string"), F.lit("-"), F.col("pos").cast("string")
        ).alias("part_id"),
        "doc_id",
        F.col("pos").cast("bigint").alias("pos"),
        "part",
    )


# A9: the reference routes Point/LineString/Polygon to three targets and
# skips anything else (task.ts:178-187). Geometry type derived from the
# event type tag; the CASE text is shared with the oracle.
_GEOM = (
    "CASE event_type WHEN 'click' THEN 'Point' WHEN 'view' THEN 'LineString' "
    "WHEN 'purchase' THEN 'Polygon' WHEN 'signup' THEN 'MultiPoint' ELSE NULL END"
)
_ROUTE = (
    "CASE geom_type WHEN 'Point' THEN 'points' WHEN 'LineString' THEN 'lines' "
    "WHEN 'Polygon' THEN 'polys' ELSE NULL END"
)


@query(
    "geo_route_by_type",
    oracle=f"""
SELECT event_id, geom_type, {_ROUTE} AS route
FROM (SELECT event_id, {_GEOM} AS geom_type FROM events)
WHERE ({_ROUTE}) IS NOT NULL
""",
)
def geo_route_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: 3-way geometry-type routing + skip of unrouteable types —
    a routing column and a filter; per-sink writes reuse the same
    routed frame (``df.filter(route = ...)`` per target)."""
    ev = table(spark, sf_dir, "events")
    routed = ev.withColumn("geom_type", F.expr(_GEOM)).withColumn("route", F.expr(_ROUTE))
    return routed.filter(F.col("route").isNotNull()).select("event_id", "geom_type", "route")


# A10: Web-Mercator forward projection (the proj4 EPSG:4326→3857 math
# the reference applies per vertex, task.ts:194). R = WGS84 semi-major.
_LON = "(c_custkey % 360) - 180 + 0.5"
_LAT = "(c_custkey % 160) - 80 + 0.5"
_X = f"6378137.0 * radians({_LON})"
_Y = f"6378137.0 * ln(tan(pi() / 4 + radians({_LAT}) / 2))"


@query(
    "geo_reproject_webmercator",
    oracle=f"""
SELECT c_custkey, CAST({_LON} AS DOUBLE) AS lon, CAST({_LAT} AS DOUBLE) AS lat,
       round({_X}, 4) AS x_3857, round({_Y}, 4) AS y_3857
FROM customer
""",
)
def geo_reproject_webmercator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: EPSG:4326 -> EPSG:3857 as pure SQL math — stays inside
    whole-stage codegen (the pandas-UDF variant of the same transform is
    ``udf_pandas_reproject``; this one is the fast path)."""
    cu = table(spark, sf_dir, "customer")
    return cu.select(
        "c_custkey",
        F.expr(_LON).cast("double").alias("lon"),
        F.expr(_LAT).cast("double").alias("lat"),
        r4(F.expr(_X)).alias("x_3857"),
        r4(F.expr(_Y)).alias("y_3857"),
    )


@query(
    "cast_coalesce_defaults",
    oracle="""
SELECT event_id,
       coalesce(nullif(event_type, 'error'), 'Unknown') AS callsign,
       coalesce(CASE WHEN value < 50 THEN NULL ELSE event_type END, '') AS remarks,
       CAST(floor(value) AS BIGINT) AS value_floor,
       CAST(event_id AS VARCHAR) AS id_str
FROM events
""",
)
def cast_coalesce_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: attribute projection with defaults — the reference's
    ``callsign || 'Unknown'`` / ``remarks || ''`` (task.ts:242-251) as
    coalesce; plus explicit casts (floor for double->int: engines
    disagree on bare double->int casts, so the engine never emits one)."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("Unknown")).alias(
            "callsign"
        ),
        F.coalesce(
            F.when(F.col("value") < 50, None).otherwise(F.col("event_type")), F.lit("")
        ).alias("remarks"),
        F.floor("value").cast("bigint").alias("value_floor"),
        F.col("event_id").cast("string").alias("id_str"),
    )


@query(
    "etl_pii_mask_digits",
    oracle="""
SELECT event_id,
       regexp_replace(props, '[0-9]', '#', 'g') AS props_masked,
       CAST(length(props) - length(regexp_replace(props, '[0-9]', '', 'g')) AS BIGINT)
         AS n_masked_chars
FROM events
""",
)
def etl_pii_mask_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style scrubbing pass: mask every digit in the free-form
    ``props`` payload and count how many characters were redacted —
    the shape of the regex-redaction step (emails, phone numbers,
    SSNs) a corpus pipeline runs before training. The character class
    here is engine-portable ([0-9] means the same thing to Java regex
    and RE2); real PII patterns slot into the same two expressions.

    Scale: stateless per-row regex in whole-stage codegen — no
    shuffle, no UDF; the masked column streams straight to the sink."""
    ev = table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.regexp_replace("props", "[0-9]", "#").alias("props_masked"),
        (
            F.length("props")
            - F.length(F.regexp_replace("props", "[0-9]", ""))
        ).cast("bigint").alias("n_masked_chars"),
    )


# Bit-interleave terms for the 16+16-bit Morton (Z-order) key. Disjoint
# target bits, so plain `+` assembles the key — the same expression text
# runs on both engines (no engine-specific xor/shift spellings).
_Z_TERMS = " + ".join(
    [f"(((x >> {i}) & 1) * {1 << (2 * i)})" for i in range(16)]
    + [f"(((y >> {i}) & 1) * {1 << (2 * i + 1)})" for i in range(16)]
)


@query(
    "etl_zorder_key",
    oracle=f"""
WITH b AS (
  SELECT o_orderkey,
         o_custkey & 65535 AS x,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) & 65535 AS y
  FROM orders
)
SELECT o_orderkey, x, y, CAST({_Z_TERMS} AS BIGINT) AS zkey
FROM b
""",
)
def etl_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key: bit-interleave the two hot
    filter dimensions (customer, order day) into one sort key. Sorting
    / range-partitioning the table by zkey before writing gives parquet
    row-group min/max locality in BOTH dimensions at once, so a filter
    on either column (or a rectangle on both) prunes row groups — the
    multi-dimensional analogue of the single-column layouts in
    tables.py, and what Delta/Iceberg OPTIMIZE ZORDER computes
    internally. 16 bits per dimension = 65k cells per axis, plenty for
    row-group-level (not row-level) locality.

    The interleave is 32 constant-shift/mask terms over disjoint
    target bits assembled with `+` — ONE shared expression text for
    both engines, whole-stage-codegen'd to straight-line integer ops
    (no UDF, no loop).

    Scale: computing zkey is map-only; the pay-off step
    (`df.repartitionByRange(zkey).sortWithinPartitions(zkey).write`)
    costs one range shuffle at ingest and removes full-scan cost from
    every subsequent selective query — amortized exactly like the
    reference's server-side attribute indexes.
    """
    from ..tables import sql_over

    return sql_over(
        spark,
        sf_dir,
        f"""
WITH b AS (
  SELECT o_orderkey,
         CAST(o_custkey & 65535 AS BIGINT) AS x,
         CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') & 65535 AS BIGINT) AS y
  FROM orders
)
SELECT o_orderkey, x, y, CAST({_Z_TERMS} AS BIGINT) AS zkey
FROM b
""",
        ("orders",),
    )
