"""Fixture table loader + cross-engine read policy.

The driver materializes a TPC-H-ish star schema + an events stream table
+ LLM-pipeline tables as one parquet file per table (TESTDATA.md). All
queries load through here so the scan path is uniform (columnar parquet,
Catalyst predicate pushdown & column pruning, vectorized reader) and the
cross-engine read policy is applied exactly once:

- ``events.ts`` is parquet ``TIMESTAMP(NANOS)``, which Spark 4 cannot
  represent (PARQUET_TYPE_ILLEGAL). We read it as **int64 nanoseconds**
  via ``spark.sql.legacy.parquet.nanosAsLong``. DuckDB reads the same
  column as a µs ``TIMESTAMP`` (it truncates ns→µs on scan), so the
  engine contract for events-time logic is *integer microseconds*:
  Spark ``ts div 1000``  ==  DuckDB ``epoch_us(ts)``, exactly.
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
    # events.ts: TIMESTAMP(NANOS) -> int64 ns (see module docstring)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # ms timestamps as session-TZ TIMESTAMP (UTC), not TIMESTAMP_NTZ
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


def prepare(spark: SparkSession) -> SparkSession:
    """Apply the cross-engine read policy to this session (idempotent)."""
    for k, v in _READ_POLICY.items():
        spark.conf.set(k, v)
    return spark


_CACHED: dict[tuple[int, str, str], DataFrame] = {}


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
        key = (id(spark), sf_dir, name)
        if key not in _CACHED:
            path = f"{sf_dir}/{name}.parquet"
            df = spark.read.parquet(path)
            # single-file fixtures scan as 1-3 partitions; spread LARGE
            # tables so in-memory scans parallelize, but keep small ones
            # compact (per-task overhead dominates below ~2MB/partition)
            n = min(16, max(1, os.path.getsize(path) >> 21))
            if n > 2:
                df = df.repartition(n)
            _CACHED[key] = df.cache()
        return _CACHED[key]
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for the SQL API)."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
