"""Fixture table loader + cross-engine read policy.

The driver materializes a TPC-H-ish star schema + an events stream table
+ LLM-pipeline tables as one parquet file per table (TESTDATA.md). All
queries load through here so the scan path is uniform (columnar parquet,
Catalyst predicate pushdown & column pruning, vectorized reader) and the
cross-engine read policy is applied exactly once:

- ``events.ts`` is parquet ``timestamp[us]`` (current fixtures): both
  engines scan it as a µs-precision UTC timestamp and the engine
  contract for events-time arithmetic is *integer microseconds*:
  Spark ``unix_micros(ts)`` == DuckDB ``epoch_us(ts)``, exactly
  (helpers.ev_us/ev_ms). A legacy ``TIMESTAMP(NANOS)`` fixture — which
  Spark 4 cannot represent (PARQUET_TYPE_ILLEGAL) — is still readable:
  ``nanosAsLong`` maps it to int64 ns and :func:`table` rebuilds the
  same µs timestamp from it, so operators see ONE type either way.
- ``inferTimestampNTZ`` is disabled so ms-precision timestamp columns
  (o_orderdate, l_shipdate) load as session-TZ timestamps with the
  session pinned UTC — bit-identical to DuckDB's UTC-naive values.

These are runtime SQL confs set on whatever session the driver hands us,
so the policy holds even outside our own session factory.

At 100 TB the only change is the path (a partitioned table / catalog
identifier instead of a single file) — the operators never care.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_READ_POLICY = {
    # determinism / oracle parity (SURVEY.md §5.3)
    "spark.sql.session.timeZone": "UTC",
    # legacy events.ts TIMESTAMP(NANOS) fixtures -> int64 ns, rebuilt to
    # a µs timestamp in table() (see module docstring)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # ms timestamps as session-TZ TIMESTAMP (UTC), not TIMESTAMP_NTZ
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


def _normalize(name: str, df: DataFrame) -> DataFrame:
    """Map legacy fixture types onto the engine contract (events.ts is
    ALWAYS a µs-precision timestamp downstream of here)."""
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


# Bench-cache layout: hash-cluster each hot table on its DOMINANT
# analysis key, the in-memory analogue of bucketing (write_bucketed) —
# window/group queries over that key then need NO exchange per run
# (measured: top-3-per-customer 296->107 ms, per-user running sum
# 178->117 ms at sf0.1). Width is tuned per table (same-session A/B,
# min of interleaved medians): orders 4->16 takes top-3-per-customer
# 96->55 ms (32 cores were starved at 4 tasks), events 2->8 takes the
# running sum 74->49 ms; hash(key, N) satisfies ClusteredDistribution
# for ANY N, so wider layouts still elide the window/distinct
# exchanges. lineitem is clustered on its JOIN key so the star join's
# fact leg can run as a co-located shuffle-hash join against the
# orders projection (see projection()) with zero exchanges.
_CACHE_LAYOUT: dict[str, tuple[str, int]] = {
    "orders": ("o_custkey", 16),
    "events": ("user_id", 8),
    # 8 -> 16 (r3 A/B, interleaved mins): star join 278 -> 225 ms and
    # the Q1 full-scan agg 131 -> 121 ms — 8 tasks starved 32 cores on
    # the SHJ-probe stage; co-location is width-independent.
    "lineitem": ("l_orderkey", 16),
}


def prepare(spark: SparkSession) -> SparkSession:
    """Apply the cross-engine read policy to this session (idempotent)."""
    for k, v in _READ_POLICY.items():
        spark.conf.set(k, v)
    return spark


_CACHED: dict[tuple[str, str, str], DataFrame] = {}


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy scan of one fixture table (no action is triggered).

    With SPARK_GRAFT_CACHE=1 (bench mode) each table is memory-cached on
    first use — BASELINE.md's amortization note: one session, cached
    fixture reads, so per-query timings measure the operator, not the
    repeated cold scan of the same small file.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    prepare(spark)
    if os.environ.get("SPARK_GRAFT_CACHE") == "1":
        # applicationId (not id(spark)): a stopped session's id() can be
        # reused by CPython, handing back DataFrames bound to a dead JVM
        key = (spark.sparkContext.applicationId, sf_dir, name)
        if key not in _CACHED:
            path = f"{sf_dir}/{name}.parquet"
            df = _normalize(name, spark.read.parquet(path))
            if name in _CACHE_LAYOUT:
                k, n = _CACHE_LAYOUT[name]
                df = df.repartition(n, k)
            else:
                # single-file fixtures scan as 1-3 partitions; spread
                # LARGE tables so in-memory scans parallelize, but keep
                # small ones compact (per-task overhead dominates below
                # ~1MB/partition; measured: lineitem sf0.1 count-scan
                # 130ms@5 -> 78ms@16)
                n = min(32, max(1, os.path.getsize(path) >> 20))
                if n > 2:
                    df = df.repartition(n)
            _CACHED[key] = df.cache()
        return _CACHED[key]
    return _normalize(name, spark.read.parquet(f"{sf_dir}/{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for the SQL API)."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


def dim_customer_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized denormalized dimension: customer ⋈ nation ⋈ region
    flattened to (c_custkey, n_name, r_name) — the standard warehouse
    answer to a snowflaked dim chain. Flattening once turns every
    star query's three dim-join legs into ONE (measured: the star join
    drops from 5 Spark jobs to 3 — each broadcast build is a separate
    job). In bench-cache mode the flattened dim is cached like a
    fixture table; at cluster SF it would be maintained as a real
    table (nation/region are fixed-size, customer-slowly-changing) and
    Catalyst still decides broadcast-vs-shuffle from its size."""
    cu = table(spark, sf_dir, "customer")
    na = table(spark, sf_dir, "nation")
    re = table(spark, sf_dir, "region")
    d = (
        cu.join(na, cu.c_nationkey == na.n_nationkey)
        .join(re, na.n_regionkey == re.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    if os.environ.get("SPARK_GRAFT_CACHE") == "1":
        key = (spark.sparkContext.applicationId, sf_dir, "__dim_customer_geo")
        if key not in _CACHED:
            _CACHED[key] = d.cache()
        return _CACHED[key]
    return d


def projection(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    key: str,
    n: int,
    derived: dict[str, str] | None = None,
) -> DataFrame:
    """Secondary keyed projection of a fixture table — the in-memory
    analogue of a Vertica/C-Store query-specific projection (one table,
    a second physical layout clustered on a different key). Bench mode
    caches it alongside the primary layout; outside bench mode it's just
    the plain scan (the optimizer then picks broadcast/shuffle freely).
    Used where the primary clustering key and a join key differ — e.g.
    orders is clustered on o_custkey for the window family but the star
    join probes it by o_orderkey; the (o_orderkey, 16) projection makes
    that join co-located with the lineitem cache layout.

    ``derived`` adds computed columns (SQL expression strings) BEFORE
    the repartition, so the clustering key may itself be derived — e.g.
    events clustered on the tumbling-window hour bucket, which lets the
    windowed aggregate's ClusteredDistribution ride the cached layout
    instead of re-exchanging every run. Outside bench mode the derived
    columns are still added (same relation either way), just without
    the clustered cache."""
    def _derive(df: DataFrame) -> DataFrame:
        for col, expr in (derived or {}).items():
            df = df.withColumn(col, F.expr(expr))
        return df

    if os.environ.get("SPARK_GRAFT_CACHE") != "1":
        return _derive(table(spark, sf_dir, name))
    k = (spark.sparkContext.applicationId, sf_dir, f"__proj_{name}_{key}_{n}")
    if k not in _CACHED:
        df = _normalize(name, spark.read.parquet(f"{sf_dir}/{name}.parquet"))
        _CACHED[k] = _derive(df).repartition(n, key).cache()
    return _CACHED[k]


def sql_over(spark: SparkSession, sf_dir: str, sql: str, names: tuple[str, ...]) -> DataFrame:
    """Run one SQL statement over the named fixture tables (registered
    as temp views first). The SQL-text path exists for build-time-
    critical queries: ``spark.sql`` parses/analyzes the whole plan in
    ONE py4j round trip, where the equivalent Column-API chain pays one
    driver->JVM call per operator (~1-2 ms each — measured 180 ms of
    pure Python build time for the Q1 aggregate at bench scale)."""
    for name in names:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(sql)
