"""Time-series operators — regularization of irregular event streams.

The reference's data is event-shaped (scheduled pulls of feature
updates, task.ts:51); a warehouse consumer of such a stream needs it
on a regular grid (dashboards, joins against other hourly series,
feature tables for training). This module adds the resample family:

- ``ts_resample_hourly_ffill``: per-key hourly grid with forward-fill
  (last observation carried forward) — the canonical as-of
  regularization.

Event-time currency is integer microseconds (helpers.py): the events
fixture is TIMESTAMP(NANOS) parquet, and integer µs is the exact
cross-engine representation.

Scale design: the grid is generated per key with ``sequence`` (no
driver loop, no cross join against a calendar table); the forward fill
is ONE window pass over the tagged union of events and grid points —
the same single-pass trick as join_asof_event, so the whole operator
is two narrow stages + one shuffle on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..helpers import ev_us
from ..registry import query
from ..tables import table

_HOUR_US = 3_600_000_000


@query(
    "ts_resample_hourly_ffill",
    oracle=f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS t, 0 AS is_grid, value, event_id
  FROM events
), b AS (
  SELECT user_id,
         ((min(t) + {_HOUR_US - 1}) // {_HOUR_US}) * {_HOUR_US} AS lo,
         max(t) AS hi
  FROM ev GROUP BY user_id
), grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, {_HOUR_US})) AS t,
         1 AS is_grid, CAST(NULL AS DOUBLE) AS value,
         CAST(NULL AS BIGINT) AS event_id
  FROM b WHERE lo <= hi
), u AS (
  SELECT * FROM ev UNION ALL SELECT * FROM grid
), f AS (
  SELECT user_id, t, is_grid,
         last_value(value IGNORE NULLS) OVER (
           PARTITION BY user_id
           ORDER BY t ASC, is_grid ASC, event_id ASC NULLS LAST
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_value
  FROM u
)
SELECT user_id, t AS grid_us, last_value FROM f WHERE is_grid = 1
""",
)
def ts_resample_hourly_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with forward fill, per user: epoch-aligned grid
    points between each user's first and last event; each point carries
    the latest event value at or before it (events at exactly the grid
    instant included — grid rows sort after events at equal time).

    The window order (t, is_grid, event_id NULLS LAST) is total, so the
    fill is deterministic even with same-microsecond duplicate events.
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        ev_us().alias("t"),
        F.lit(0).alias("is_grid"),
        "value",
        "event_id",
    )
    bounds = ev.groupBy("user_id").agg(
        F.min("t").alias("mn"), F.max("t").alias("hi")
    ).select(
        "user_id",
        # integer ceil-align to the hour: exact, like the oracle's //
        F.expr(f"((mn + {_HOUR_US - 1}) div {_HOUR_US}) * {_HOUR_US}").alias("lo"),
        "hi",
    )
    grid = (
        bounds.filter(F.col("lo") <= F.col("hi"))
        .select(
            "user_id",
            F.explode(F.sequence("lo", "hi", F.lit(_HOUR_US))).alias("t"),
        )
        .select(
            "user_id",
            "t",
            F.lit(1).alias("is_grid"),
            F.lit(None).cast("double").alias("value"),
            F.lit(None).cast("bigint").alias("event_id"),
        )
    )
    u = ev.unionByName(grid)
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("t").asc(),
            F.col("is_grid").asc(),
            F.col("event_id").asc_nulls_last(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("last_value", F.last("value", ignorenulls=True).over(w))
        .filter(F.col("is_grid") == 1)
        .select("user_id", F.col("t").alias("grid_us"), "last_value")
    )
