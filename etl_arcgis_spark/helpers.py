"""Determinism helpers shared by every operator module (SURVEY.md §5.3).

These exist so the Spark side and the DuckDB oracle compute *identical*
values despite engine differences:

- ``r4``      — round computed doubles to 4 decimals (cross-engine float
                summation order differs; 4 decimals is the contract).
- events time — the fixture column is parquet TIMESTAMP(NANOS). Spark
                reads it as int64 **nanoseconds** (see tables.py), DuckDB
                scans it as a µs timestamp. The shared integer currency:
                  Spark  ``ev_us``:  ts div 1000          (bigint µs)
                  DuckDB          :  epoch_us(ts)         (bigint µs)
                  Spark  ``ev_ms``:  ts div 1000000       (bigint ms)
                  DuckDB          :  epoch_ms(ts)         (bigint ms)
                All ordering / bucketing / gap logic on events uses these
                integers (or timestamps reconstructed from the µs value),
                never the raw column — exact parity, no float drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def r4(col: Column | str) -> Column:
    """Engine-contract rounding for computed doubles.

    Emulates DuckDB's ``round(x, 4)`` (scale in float, then round half
    away from zero) instead of Spark's exact-BigDecimal ``F.round`` —
    the two disagree on ~1e-4-boundary values because DuckDB introduces
    the ``x*1e4`` float error before rounding. ``floor(|x|*1e4 + 0.5)``
    on the magnitude, sign reapplied, reproduces DuckDB's
    away-from-zero behavior bit-for-bit for both signs (|x|·1e4 and
    |x·1e4| round identically in IEEE), so ``round(expr, 4)`` in oracle
    SQL matches.
    """
    c = _c(col)
    return (F.signum(c) * F.floor(F.abs(c) * 10000 + F.lit(0.5)) / 10000).cast("double")


def ev_us(col: str = "ts") -> Column:
    """events.ts (int64 ns) -> epoch microseconds. Oracle: ``epoch_us(ts)``."""
    return F.expr(f"{col} div 1000")


def ev_ms(col: str = "ts") -> Column:
    """events.ts (int64 ns) -> epoch milliseconds. Oracle: ``epoch_ms(ts)``."""
    return F.expr(f"{col} div 1000000")


def ev_timestamp(col: str = "ts") -> Column:
    """events.ts (int64 ns) -> µs-precision TIMESTAMP (UTC session).

    Matches DuckDB's scanned value exactly (DuckDB truncates ns->µs on
    scan). Use when an operator genuinely needs a timestamp type
    (streaming ``window()`` / ``session_window()``).
    """
    return F.timestamp_micros(F.expr(f"{col} div 1000"))
