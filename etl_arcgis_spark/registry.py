"""Query registry — the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers here as a named
query: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (for
everything hash-checkable) an equivalent ANSI-SQL oracle string that
DuckDB runs over the same parquet tables. ``__spark_entry__.py`` simply
re-exports these dicts.

Determinism contract (SURVEY.md §5.3) every registered query obeys:
  1. computed doubles rounded to 4 decimals on BOTH engines;
  2. ``events.ts`` is a µs timestamp on both engines (tables.py read
     policy) — never emitted raw; ordering and arithmetic go through
     integer epoch-µs/ms values (helpers.ev_us/ev_ms), identical on
     both engines;
  3. every LIMIT/top-k carries a unique total-order tie-breaker;
  4. null ordering spelled explicitly;
  5. session timezone pinned UTC on both engines;
  6. seeded/approximate ops are registered WITHOUT an oracle (weak,
     rows-only check).
"""

from __future__ import annotations

import glob
import json
import os
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}
MODULE_OF: dict[str, str] = {}

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query, optionally with its DuckDB oracle SQL.

    ``oracle=None`` declares a *weak* query (rows-only driver check) —
    reserved for seeded/approximate algorithms per SURVEY.md §2.1.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        MODULE_OF[name] = fn.__module__.rsplit(".", 1)[-1]
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


def _verified_names() -> set[str]:
    """Query names that already have a successful driver row in any
    past-round CORRECTNESS_r*.json (hash-green, or weak-ran for
    declared no-oracle queries). Used to rotate verification coverage:
    the driver checks only the first 50 registrations per round, so
    :func:`all_queries` pushes already-verified names to the back and
    never-checked ones to the front."""
    # Latest driver status per name wins: rounds are processed in
    # order (sorted r01 < r02 < ...), so a green row in r02 followed by
    # an ERROR in r03 demotes the name back into the front tier for
    # re-verification (it would otherwise hide past the first-50 window
    # forever).
    latest: dict[str, bool] = {}
    for path in sorted(glob.glob(os.path.join(_REPO_DIR, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, r in rows.items():
            if not isinstance(r, dict):
                continue
            err = r.get("err")
            if err is None and r.get("hash_match"):
                latest[name] = True
            elif err == "no_oracle" and r.get("spark_rows") is not None:
                latest[name] = True
            else:
                latest[name] = False
    _FAILED_LAST.clear()
    _FAILED_LAST.update(n for n, ok in latest.items() if not ok)
    return {n for n, ok in latest.items() if ok}


# Names whose most recent driver row was an ERROR / mismatch — refreshed
# by _verified_names(); these re-verify ahead of everything else.
_FAILED_LAST: set[str] = set()


# Verification priority among not-yet-driver-checked queries: the
# SURVEY §2.1 contract families (scans/filters/joins/windows/setops/
# functions/etl/streaming) first, engine extensions after. Within a
# module, registration (source) order is preserved.
_MODULE_PRIORITY = [
    "scans",
    "filters",
    "joins",
    "windows",
    "setops",
    "corpus",
    "sql_functions",
    "etl",
    "streaming_batch",
    "aggregates",
    "text",
    "similarity",
    "udfs",
    "multimodal",
    "dedup",
    "quality",
    "timeseries",
    "graph",
    "analytics",
]


_LOADED = False


def load_all() -> None:
    """Import every operator module so its @query decorators run."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        aggregates,
        analytics,
        corpus,
        dedup,
        etl,
        filters,
        graph,
        joins,
        multimodal,
        quarantine,
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
    """All registered queries, ordered for the driver's partial check.

    The driver verifies the first 50 entries per round, in dict order.
    To converge on full coverage across rounds, names WITHOUT a green
    CORRECTNESS row from any prior round sort first (contract families
    before engine extensions), already-verified names last. Contents
    are identical regardless of order.
    """
    load_all()
    verified = _verified_names()
    prio = {m: i for i, m in enumerate(_MODULE_PRIORITY)}
    insertion = {n: i for i, n in enumerate(QUERIES)}

    def key(n: str) -> tuple[int, int, int]:
        if n in _FAILED_LAST:
            tier = -1  # fixed driver ERRORs re-verify first
        elif n in verified:
            tier = 1
        else:
            tier = 0
        return (
            tier,
            prio.get(MODULE_OF.get(n, ""), len(_MODULE_PRIORITY)),
            insertion[n],
        )

    return {n: QUERIES[n] for n in sorted(QUERIES, key=key)}


def all_oracles() -> dict[str, str]:
    load_all()
    return {n: ORACLES[n] for n in all_queries() if n in ORACLES}


def run(spark: SparkSession, name: str, sf_dir: str) -> Any:
    load_all()
    return QUERIES[name](spark, sf_dir)
