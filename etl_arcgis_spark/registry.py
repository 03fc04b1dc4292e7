"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers here as a named
query: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (for
everything hash-checkable) an equivalent ANSI-SQL oracle string that
DuckDB runs over the same parquet tables. ``__spark_entry__.py`` simply
re-exports these dicts.

Determinism contract (SURVEY.md §5.3) every registered query obeys:
  1. computed doubles rounded to 4 decimals on BOTH engines;
  2. ``events.ts`` is timestamp[ns] — never emitted raw; ordering and
     arithmetic go through millisecond-floored values (identical after
     Spark's µs and DuckDB's ns truncation);
  3. every LIMIT/top-k carries a unique total-order tie-breaker;
  4. null ordering spelled explicitly;
  5. session timezone pinned UTC on both engines;
  6. seeded/approximate ops are registered WITHOUT an oracle (weak,
     rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query, optionally with its DuckDB oracle SQL.

    ``oracle=None`` declares a *weak* query (rows-only driver check) —
    reserved for seeded/approximate algorithms per SURVEY.md §2.1.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


_LOADED = False


def load_all() -> None:
    """Import every operator module so its @query decorators run."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        aggregates,
        analytics,
        dedup,
        etl,
        filters,
        graph,
        joins,
        multimodal,
        scans,
        setops,
        similarity,
        sql_functions,
        quality,
        streaming_batch,
        text,
        timeseries,
        udfs,
        windows,
    )

    _LOADED = True


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLES)


def run(spark: SparkSession, name: str, sf_dir: str) -> Any:
    load_all()
    return QUERIES[name](spark, sf_dir)
