"""Scan-shaped operators — SURVEY.md §2 A1/A20/B2/B4/B5/B6.

The reference's scan is a paginated REST pull of an ArcGIS layer with
server-side projection/limit/distinct/count parameters passed through
verbatim (reference ``task.ts:399-414``; esri-dump pagination
``task.ts:418``). Here the same surface is the parquet scan itself:
Catalyst pushes the projection and filters into the columnar reader
(check ``.explain``: ``ReadSchema`` / ``PushedFilters``), so at 100 TB
the scan reads only the referenced columns/row-groups — strictly better
than the reference's page-everything-then-transform loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table


@query(
    "scan_project_filter",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
""",
)
def scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + filter pushed into the parquet scan (A1 + B2).

    Mirrors the reference shipping ``outFields`` + ``where`` to the
    server (task.ts:406-414); Catalyst pushes both into the scan.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp")).select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate"
    )


@query("scan_count", oracle="SELECT count(*) AS n FROM lineitem")
def scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global count (B6 ``returnCountOnly``; the reference's 'obtained N
    features' log line, task.ts:455). Parquet row-group metadata makes
    this a metadata-only scan."""
    return table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


@query(
    "scan_limit_offset",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_orderkey
LIMIT 100 OFFSET 10
""",
)
def scan_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination (B4 ``resultRecordCount``/``resultOffset``) — the unit
    esri-dump pages by (task.ts:418). Total order via the unique key."""
    od = table(spark, sf_dir, "orders")
    return (
        od.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(10)
        .limit(100)
    )


@query(
    "scan_distinct_values",
    oracle="SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders",
)
def scan_distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 ``returnDistinctValues`` — hash-distinct; partial aggregation
    map-side keeps the shuffle tiny at scale."""
    return table(spark, sf_dir, "orders").select("o_orderpriority", "o_orderstatus").distinct()


@query(
    "scan_file_metadata",
    oracle="""
SELECT 'lineitem.parquet' AS file_name, count(*) AS n_rows
FROM lineitem
""",
)
def scan_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden file-metadata columns (`_metadata.file_name` etc.): rows
    grouped by their physical source file — the lineage/debugging
    surface every ingest pipeline needs (which file contributed which
    rows; find the corrupt shard; incremental-load bookkeeping). Reads
    the scan relation directly (the metadata struct exists only on
    file-source scans, not on cached/repartitioned descendants — which
    is also why tables.table() is bypassed here). The oracle pins the
    basename + count contract; multi-file layouts group per shard.

    Scale: `_metadata` is produced by the reader per split at zero
    I/O cost; grouping on it is a tiny aggregate (one row per file).
    """
    from ..tables import parquet_schema, prepare

    prepare(spark)
    path = f"{sf_dir}/lineitem.parquet"
    df = spark.read.schema(parquet_schema(path)).parquet(path)
    return (
        df.select(F.col("_metadata.file_name").alias("file_name"))
        .groupBy("file_name")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def with_count_observation(df: DataFrame, name: str = "etl_metrics"):
    """A20 count observability, the zero-cost spelling: attach an
    ``Observation`` so row count (and null-key count) are collected as
    ACCUMULATOR side-outputs of whatever action runs — no second scan,
    no ``.count()`` job. The reference logs ``obtained N features``
    after buffering everything in memory (task.ts:449-455); a pipeline
    at scale cannot afford a counting pass, so the metric must ride
    the data pass. Returns ``(df, observation)``; read
    ``observation.get`` after the first action.

    The same Observation object works under ``foreachBatch`` per
    micro-batch, which is where the sink's ``submitted N features``
    log line (task.ts:455) comes from in the streaming engine.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    first_col = df.columns[0]
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(first_col).isNull().cast("long")).alias("n_null_key"),
    )
    return observed, obs
