"""Time-series operators — regularization of irregular event streams.

The reference's data is event-shaped (scheduled pulls of feature
updates, task.ts:51); a warehouse consumer of such a stream needs it
on a regular grid (dashboards, joins against other hourly series,
feature tables for training). This module adds the resample family:

- ``ts_resample_hourly_ffill``: per-key hourly grid with forward-fill
  (last observation carried forward) — the canonical as-of
  regularization.
- ``ts_ohlc_downsample``: per-hour open/high/low/close bars — the M4
  downsampling shape a charting/feature pipeline uses to shrink a raw
  stream without losing the envelope.
- ``ts_gap_detect``: consecutive-event gaps above a threshold per key
  (sensor-dropout / session-boundary detection).
- ``analytics_cohort_retention``: classic cohort grid — users bucketed
  by first-seen week × activity-week offset.
- ``analytics_funnel_steps``: strictly-ordered event funnel
  (signup → view → purchase) with per-step survivor counts.
- ``window_zscore_anomaly``: trailing-window z-score anomaly flags per
  key (monitoring / outlier-mining shape).

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

from ..helpers import ev_ms, ev_us, r4
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


_WEEK_US = 7 * 86_400_000_000


@query(
    "ts_ohlc_downsample",
    oracle=f"""
WITH ev AS (
  SELECT epoch_us(ts) AS t, event_id, value FROM events
), w AS (
  SELECT (t // {_HOUR_US}) * {_HOUR_US} AS bucket_us, value,
         row_number() OVER (PARTITION BY (t // {_HOUR_US})
                            ORDER BY t ASC,  event_id ASC)  AS rn_a,
         row_number() OVER (PARTITION BY (t // {_HOUR_US})
                            ORDER BY t DESC, event_id DESC) AS rn_d
  FROM ev
)
SELECT bucket_us,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rn_d = 1 THEN value END) AS close,
       count(*) AS n
FROM w GROUP BY bucket_us
""",
)
def ts_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars over the event stream: first/max/min/last value
    per bucket — M4-style downsampling (keeps the visual/feature
    envelope of a series at a fixed resolution regardless of input
    rate). first/last are made total-ordered by (t, event_id), so the
    result is deterministic under same-microsecond events.

    Values pass through untouched (no arithmetic) — no rounding needed.
    Scale: ONE shuffle on the bucket key; both window passes and the
    final aggregate share that partitioning (Catalyst reuses the
    exchange), and the aggregate is partial-agg friendly. Buckets are
    dense time — no skew."""
    ev = table(spark, sf_dir, "events").select(
        ev_us().alias("t"), "event_id", "value"
    )
    bucket = (F.col("t") - F.col("t") % _HOUR_US).alias("bucket_us")
    wa = Window.partitionBy(bucket).orderBy(F.col("t").asc(), F.col("event_id").asc())
    wd = Window.partitionBy(bucket).orderBy(F.col("t").desc(), F.col("event_id").desc())
    tagged = ev.select(
        bucket,
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return tagged.groupBy("bucket_us").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "ts_gap_detect",
    oracle=f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS t, event_id FROM events
), lagged AS (
  SELECT user_id, t, event_id,
         lag(t) OVER (PARTITION BY user_id
                      ORDER BY t ASC, event_id ASC) AS prev_t
  FROM ev
)
SELECT user_id, prev_t AS gap_start_us, t AS gap_end_us,
       t - prev_t AS gap_us
FROM lagged
WHERE prev_t IS NOT NULL AND t - prev_t > {6 * _HOUR_US}
""",
)
def ts_gap_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user dropout detection: consecutive-event pairs more than
    6 hours apart (lag over a total order, filter on the delta). The
    complement of sessionization — reports the silences, not the
    bursts. Integer-µs arithmetic, exact on both engines.

    Scale: one shuffle on user_id, one sort, a narrow filter — the
    minimal plan for any order-dependent per-key pass."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", ev_us().alias("t"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy(F.col("t").asc(), F.col("event_id").asc())
    return (
        ev.withColumn("prev_t", F.lag("t").over(w))
        .filter(F.col("prev_t").isNotNull() & (F.col("t") - F.col("prev_t") > 6 * _HOUR_US))
        .select(
            "user_id",
            F.col("prev_t").alias("gap_start_us"),
            F.col("t").alias("gap_end_us"),
            (F.col("t") - F.col("prev_t")).alias("gap_us"),
        )
    )


@query(
    "analytics_cohort_retention",
    oracle=f"""
WITH ev AS (
  SELECT user_id, epoch_us(ts) // {_WEEK_US} AS wk FROM events
), cohort AS (
  SELECT user_id, min(wk) AS cohort_wk FROM ev GROUP BY user_id
)
SELECT cohort_wk, ev.wk - cohort_wk AS week_offset,
       count(DISTINCT ev.user_id) AS active_users
FROM ev JOIN cohort USING (user_id)
GROUP BY 1, 2
""",
)
def analytics_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention grid: users keyed by first-seen week (epoch-µs
    integer week index — exact, engine-neutral; boundary day is fixed
    by the epoch, which is all a retention grid needs), counted
    distinct in each subsequent week offset.

    Scale: both the min() cohort pass and the join are partitioned on
    user_id — one shuffle feeds both (exchange reuse); the final
    count-distinct re-shuffles on the small (cohort, offset) grid.
    user_id skew is the only hazard → AQE skew handling at cluster SF."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", (ev_us() - ev_us() % _WEEK_US) .alias("wk_us")
    ).select("user_id", (F.col("wk_us") / _WEEK_US).cast("bigint").alias("wk"))
    cohort = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        ev.join(cohort, "user_id")
        .groupBy("cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("week_offset"))
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


@query(
    "analytics_funnel_steps",
    oracle="""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS t FROM events
), s1 AS (
  SELECT user_id, min(t) AS t1 FROM ev WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
  SELECT ev.user_id, min(t) AS t2
  FROM ev JOIN s1 USING (user_id)
  WHERE event_type = 'view' AND t > t1 GROUP BY ev.user_id
), s3 AS (
  SELECT ev.user_id, min(t) AS t3
  FROM ev JOIN s2 USING (user_id)
  WHERE event_type = 'purchase' AND t > t2 GROUP BY ev.user_id
)
SELECT (SELECT count(*) FROM s1) AS n_signup,
       (SELECT count(*) FROM s2) AS n_view_after_signup,
       (SELECT count(*) FROM s3) AS n_purchase_after_view
""",
)
def analytics_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel signup → view → purchase: a user counts
    at step k only with an event of that type strictly after their
    step-(k-1) time. Three conditional-min passes, each joined against
    the previous survivor set — the standard funnel algebra (each step
    is an as-of semi-join).

    Scale: every stage is keyed on user_id, so one partitioning serves
    the whole chain; survivor sets only shrink, and the final counts
    are three tiny global aggregates."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", ev_us().alias("t")
    )
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id").agg(F.min("t").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter(F.col("t") > F.col("t1"))
        .groupBy("user_id").agg(F.min("t").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("t") > F.col("t2"))
        .groupBy("user_id").agg(F.min("t").alias("t3"))
    )
    return (
        s1.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_view_after_signup")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_purchase_after_view")))
    )


@query(
    "window_zscore_anomaly",
    oracle="""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS t, event_id, value FROM events
), stats AS (
  SELECT user_id, t, event_id, value,
         avg(value)    OVER w AS mu,
         stddev_samp(value) OVER w AS sd,
         count(*)      OVER w AS n
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY t ASC, event_id ASC
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id, value,
       round((value - mu) / sd, 4) AS z
FROM stats
WHERE n >= 10 AND sd > 1e-12 AND abs((value - mu) / sd) > 2.5
""",
)
def window_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly flags: z-score of each event's value
    against its user's previous 20 events (ROWS frame), emitted when
    |z| > 2.5 and the window holds >= 10 samples — the standard
    streaming-monitor shape, expressed as one window pass.

    Float note: mu/sd are frame aggregates; both engines accumulate a
    <= 20-element frame, so cross-engine noise is ~1e-15 relative —
    far below the 1e-4 output grid and the 2.5 threshold's practical
    tie band. z is r4-rounded per the engine contract.

    Scale: single shuffle+sort on user_id; the frame is bounded (20
    rows) so state is O(1) per key — the same plan Structured
    Streaming would use with a sliding aggregate."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", ev_us().alias("t"), "event_id", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("event_id").asc())
        .rowsBetween(-19, 0)
    )
    stats = ev.select(
        "user_id",
        "event_id",
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sd"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        stats.filter((F.col("n") >= 10) & (F.col("sd") > 1e-12) & (F.abs(z) > 2.5))
        .select("user_id", "event_id", "value", r4(z).alias("z"))
    )


_DAY_US = 86_400_000_000


@query(
    "dim_scd2_intervals",
    oracle="""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS t, event_id, value FROM events
)
SELECT user_id, event_id, value,
       t AS valid_from_us,
       lead(t) OVER (PARTITION BY user_id
                     ORDER BY t ASC, event_id ASC) AS valid_to_us,
       (lead(t) OVER (PARTITION BY user_id
                      ORDER BY t ASC, event_id ASC) IS NULL) AS is_current
FROM ev
""",
)
def dim_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension builder: turn a change stream
    into validity intervals — each observation is valid from its own
    timestamp until the key's next observation (half-open [from, to)),
    the latest row left open and flagged current. This is the standard
    CDC -> dimension materialization (the reference's upsert sink,
    task.ts:267-349, is the degenerate keep-only-current case;
    PRESERVE_HISTORY=true keeps all versions — this operator adds the
    interval bookkeeping that makes history queryable).

    Scale: one shuffle on the key + one sort — identical cost to any
    per-key window; downstream as-of lookups become point-in-interval
    joins against these intervals."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", ev_us().alias("t"), "event_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy(F.col("t").asc(), F.col("event_id").asc())
    nxt = F.lead("t").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.col("t").alias("valid_from_us"),
        nxt.alias("valid_to_us"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "ts_rolling_distinct_users",
    oracle=f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS d FROM events
), b AS (
  SELECT min(d) AS mn, max(d) AS mx FROM ud
), cov AS (
  SELECT user_id, unnest(generate_series(d, d + 6)) AS day FROM ud
)
SELECT day, count(DISTINCT user_id) AS wau
FROM cov CROSS JOIN b
WHERE day <= mx
GROUP BY day
""",
)
def ts_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling distinct active users (the DAU->WAU series).
    DISTINCT does not distribute over sliding frames, so a window
    aggregate cannot express this; the scalable exact formulation is
    cover-set expansion: dedup to user-days, explode each user-day onto
    the 7 day-buckets it covers, then count distinct per bucket — a
    bounded 7x blowup instead of a per-day self-join, and every stage
    is a plain shuffle agg. Leading buckets are partial windows
    (standard); trailing phantom buckets past the last observed day are
    trimmed with a 1-row global-bounds broadcast.

    At 100 TB: the user-day dedup is the big shuffle (map-side combine
    on (user, day)); the 7x exploded set shuffles on day — low
    cardinality but balanced (days are dense); if a single day is hot,
    count_distinct partial aggregation still splits the work."""
    ud = (
        table(spark, sf_dir, "events")
        .select("user_id", (ev_us() / _DAY_US).cast("bigint").alias("d"))
        .distinct()
    )
    b = ud.agg(F.max("d").alias("mx"))
    cov = ud.select("user_id", F.explode(F.sequence("d", F.col("d") + 6)).alias("day"))
    return (
        cov.crossJoin(F.broadcast(b))
        .filter(F.col("day") <= F.col("mx"))
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("wau"))
    )


@query(
    "ts_active_streaks",
    oracle=f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS d FROM events
), g AS (
  SELECT user_id, d,
         d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS grp
  FROM ud
), runs AS (
  SELECT user_id, count(*) AS len, min(d) AS start_d
  FROM g GROUP BY user_id, grp
)
SELECT user_id,
       max(len) AS longest_streak,
       CAST(count(*) AS BIGINT) AS n_streaks,
       min(start_d) AS first_day
FROM runs GROUP BY user_id
""",
)
def ts_active_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user — the
    gaps-and-islands pattern in its integer form: within a user,
    day_index minus its rank is constant exactly along a consecutive
    run, so one row_number window turns streaks into group keys. The
    engagement metric behind retention dashboards, and the third
    distinct islands spelling in the engine (session_window gaps, SCD2
    intervals, and this rank-difference trick).

    Scale: user-day dedup (map-side combined), ONE window pass and two
    aggregates, all partitioned on user_id — a single shuffle
    end-to-end (exchange reuse), integer arithmetic throughout."""
    ud = (
        table(spark, sf_dir, "events")
        .select("user_id", (ev_us() / _DAY_US).cast("bigint").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("d")
    g = ud.withColumn("grp", F.col("d") - F.row_number().over(w))
    runs = g.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len"), F.min("d").alias("start_d")
    )
    return runs.groupBy("user_id").agg(
        F.max("len").alias("longest_streak"),
        F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        F.min("start_d").alias("first_day"),
    )


@query(
    "ts_resample_hourly_interp",
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
         last_value(value IGNORE NULLS) OVER w_prev AS v_prev,
         last_value(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS)
           OVER w_prev AS t_prev,
         first_value(value IGNORE NULLS) OVER w_next AS v_next,
         first_value(CASE WHEN is_grid = 0 THEN t END IGNORE NULLS)
           OVER w_next AS t_next
  FROM u
  WINDOW
    w_prev AS (PARTITION BY user_id
               ORDER BY t ASC, is_grid ASC, event_id ASC NULLS LAST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_next AS (PARTITION BY user_id
               ORDER BY t ASC, is_grid ASC, event_id ASC NULLS LAST
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, t AS grid_us,
       round(CASE
         WHEN t_next IS NULL THEN v_prev
         WHEN t_prev IS NULL THEN v_next
         WHEN t_next = t_prev THEN v_prev
         ELSE v_prev + (v_next - v_prev)
              * (CAST(t - t_prev AS DOUBLE) / CAST(t_next - t_prev AS DOUBLE))
       END, 4) AS v_interp
FROM f WHERE is_grid = 1
""",
)
def ts_resample_hourly_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with LINEAR INTERPOLATION — the other half of
    the resample family (ffill holds the last value; interp draws the
    line between the surrounding observations, the right choice for
    continuous signals). Two symmetric window passes over the same
    tagged union as ts_resample_hourly_ffill: carry (value, time) of
    the nearest event on each side, then one fused multiply-add —
    written with the IDENTICAL expression shape on both engines (exact
    integer time deltas in, one division, one multiply, one add) so
    the result is bit-stable under r4.

    Scale: same single shuffle on the key; the two frames share one
    sort (Spark computes both windows over one WindowExec sort when
    the ordering matches)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", ev_us().alias("t"), F.lit(0).alias("is_grid"), "value", "event_id"
    )
    bounds = ev.groupBy("user_id").agg(
        F.min("t").alias("mn"), F.max("t").alias("hi")
    ).select(
        "user_id",
        F.expr(f"((mn + {_HOUR_US - 1}) div {_HOUR_US}) * {_HOUR_US}").alias("lo"),
        "hi",
    )
    grid = (
        bounds.filter(F.col("lo") <= F.col("hi"))
        .select("user_id", F.explode(F.sequence("lo", "hi", F.lit(_HOUR_US))).alias("t"))
        .select(
            "user_id", "t", F.lit(1).alias("is_grid"),
            F.lit(None).cast("double").alias("value"),
            F.lit(None).cast("bigint").alias("event_id"),
        )
    )
    u = ev.unionByName(grid)
    order = [F.col("t").asc(), F.col("is_grid").asc(), F.col("event_id").asc_nulls_last()]
    w_prev = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    ev_t = F.when(F.col("is_grid") == 0, F.col("t"))
    f = u.select(
        "user_id", "t", "is_grid",
        F.last("value", ignorenulls=True).over(w_prev).alias("v_prev"),
        F.last(ev_t, ignorenulls=True).over(w_prev).alias("t_prev"),
        F.first("value", ignorenulls=True).over(w_next).alias("v_next"),
        F.first(ev_t, ignorenulls=True).over(w_next).alias("t_next"),
    )
    interp = F.col("v_prev") + (F.col("v_next") - F.col("v_prev")) * (
        (F.col("t") - F.col("t_prev")).cast("double")
        / (F.col("t_next") - F.col("t_prev")).cast("double")
    )
    v = (
        F.when(F.col("t_next").isNull(), F.col("v_prev"))
        .when(F.col("t_prev").isNull(), F.col("v_next"))
        .when(F.col("t_next") == F.col("t_prev"), F.col("v_prev"))
        .otherwise(interp)
    )
    return (
        f.filter(F.col("is_grid") == 1)
        .select("user_id", F.col("t").alias("grid_us"), r4(v).alias("v_interp"))
    )


@query(
    "ts_seasonal_profile",
    oracle=f"""
WITH ev AS (
  SELECT ((epoch_us(ts) // {_DAY_US}) + 4) % 7 AS dow,
         (epoch_us(ts) % {_DAY_US}) // {_HOUR_US} AS hod,
         value
  FROM events
)
SELECT dow, hod, count(*) AS n_events,
       round(avg(value), 4) AS avg_value,
       round(sum(value), 4) AS sum_value
FROM ev GROUP BY dow, hod
""",
)
def ts_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality profile: the day-of-week x hour-of-day activity
    grid (168 cells) — the heatmap behind capacity planning and
    anomaly baselines (window_zscore_anomaly's threshold should really
    be per-cell; this is that baseline table). Both coordinates are
    integer arithmetic on epoch-µs (Thursday-epoch dow, UTC hours) —
    no calendar functions, engine-exact.

    Scale: a 168-group aggregate — the shuffle carries partials, the
    result is constant-size at any SF; this is the canonical
    'aggregate early, join late' baseline table that then broadcasts
    back onto the stream."""
    t = ev_us()
    ev = table(spark, sf_dir, "events").select(
        (((t / _DAY_US).cast("bigint") + 4) % 7).alias("dow"),
        ((t % _DAY_US) / _HOUR_US).cast("bigint").alias("hod"),
        "value",
    )
    return ev.groupBy("dow", "hod").agg(
        F.count(F.lit(1)).alias("n_events"),
        r4(F.avg("value")).alias("avg_value"),
        r4(F.sum("value")).alias("sum_value"),
    )


@query(
    "ts_cumulative_users",
    oracle=f"""
WITH first_seen AS (
  SELECT user_id, min(epoch_us(ts) // {_DAY_US}) AS d FROM events GROUP BY user_id
), daily AS (
  SELECT d, count(*) AS new_users FROM first_seen GROUP BY d
)
SELECT d AS day, new_users,
       CAST(sum(new_users) OVER (ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumulative_users
FROM daily
""",
)
def ts_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth curve: daily new users and the cumulative total.
    Cumulative DISTINCT is not window-able — the exact scalable
    identity is: cumulative distinct count == running sum of
    FIRST-SEEN counts. One min() per user (the only big shuffle), a
    daily rollup, then a running sum over the tiny day series. The
    same identity generalizes to any 'distinct so far' metric.

    Scale: the unpartitioned running sum runs over |days| rows — a
    1-task window on an already-aggregated series, irrelevant at any
    SF (same note as analytics_mom_growth)."""
    first_seen = (
        table(spark, sf_dir, "events")
        .select("user_id", (ev_us() / _DAY_US).cast("bigint").alias("d"))
        .groupBy("user_id")
        .agg(F.min("d").alias("d"))
    )
    daily = first_seen.groupBy("d").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        F.col("d").alias("day"),
        "new_users",
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
    )


_SPLIT_US = 1_705_276_800_000_000  # 2024-01-15T00:00:00Z in epoch-µs


@query(
    "cdc_merge_apply",
    oracle=f"""
WITH ch AS (
  SELECT user_id, epoch_us(ts) AS t, event_id, value,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
  FROM events
), base AS (
  SELECT user_id, value AS base_value FROM (
    SELECT user_id, value, op,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY t DESC, event_id DESC) AS rn
    FROM ch WHERE t < {_SPLIT_US}
  ) WHERE rn = 1 AND op <> 'D'
), delta AS (
  SELECT user_id, value AS delta_value, op AS delta_op FROM (
    SELECT user_id, value, op,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY t DESC, event_id DESC) AS rn
    FROM ch WHERE t >= {_SPLIT_US}
  ) WHERE rn = 1
)
SELECT coalesce(b.user_id, d.user_id) AS user_id,
       round(coalesce(d.delta_value, b.base_value), 4) AS value,
       (d.user_id IS NOT NULL AND b.user_id IS NULL) AS inserted,
       (d.user_id IS NOT NULL AND b.user_id IS NOT NULL) AS updated
FROM base b
FULL OUTER JOIN delta d ON b.user_id = d.user_id
WHERE d.delta_op IS NULL OR d.delta_op <> 'D'
""",
)
def cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge WITH DELETES: apply a change stream (upserts + 'D'
    tombstones — here, error events play the tombstone role) to a
    snapshot and emit the new snapshot plus change attribution
    (inserted/updated flags). This is A13's upsert completed into the
    full MERGE matrix — WHEN MATCHED UPDATE / WHEN MATCHED AND op='D'
    DELETE / WHEN NOT MATCHED INSERT — as one full-outer join with
    last-write-wins on each side, the set-based form a foreachBatch
    sink runs per micro-batch (streaming/pipelines.py holds the
    streaming half).

    Scale: both sides reduce to one row per key BEFORE the join
    (rank-1 group limits on the same user_id partitioning — one
    shuffle serves base, delta, and the join); tombstones drop rows in
    the WHERE, never via a second pass."""
    ch = table(spark, sf_dir, "events").select(
        "user_id",
        ev_us().alias("t"),
        "event_id",
        "value",
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U")).alias("op"),
    )
    w = Window.partitionBy("user_id").orderBy(F.col("t").desc(), F.col("event_id").desc())

    def last_per_user(df):
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    base = (
        last_per_user(ch.filter(F.col("t") < _SPLIT_US))
        .filter(F.col("op") != "D")
        .select("user_id", F.col("value").alias("base_value"))
    )
    delta = last_per_user(ch.filter(F.col("t") >= _SPLIT_US)).select(
        "user_id", F.col("value").alias("delta_value"), F.col("op").alias("delta_op")
    )
    b = base.alias("b")
    d = delta.alias("d")
    merged = b.join(d, F.col("b.user_id") == F.col("d.user_id"), "full_outer")
    return (
        merged.filter(F.col("d.delta_op").isNull() | (F.col("d.delta_op") != "D"))
        .select(
            F.coalesce(F.col("b.user_id"), F.col("d.user_id")).alias("user_id"),
            r4(F.coalesce(F.col("d.delta_value"), F.col("b.base_value"))).alias("value"),
            (F.col("d.user_id").isNotNull() & F.col("b.user_id").isNull()).alias("inserted"),
            (F.col("d.user_id").isNotNull() & F.col("b.user_id").isNotNull()).alias("updated"),
        )
    )


@query(
    "analytics_conversion_latency",
    oracle="""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS t FROM events
), s1 AS (
  SELECT user_id, min(t) AS t1 FROM ev WHERE event_type = 'signup' GROUP BY user_id
), conv AS (
  SELECT ev.user_id, min(t) - any_value(t1) AS latency_us
  FROM ev JOIN s1 USING (user_id)
  WHERE event_type = 'purchase' AND t > t1
  GROUP BY ev.user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_converted,
       CAST(round(quantile_cont(latency_us, 0.5), 0) AS BIGINT) AS p50_us,
       CAST(round(quantile_cont(latency_us, 0.9), 0) AS BIGINT) AS p90_us,
       min(latency_us) AS min_us,
       max(latency_us) AS max_us
FROM conv
""",
)
def analytics_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, first purchase strictly
    after first signup; then exact latency percentiles (p50/p90) over
    the converted population — the funnel's companion metric (HOW LONG,
    not just how many). Latencies are integer µs; percentiles
    interpolate between two integers identically on both engines
    (quantile_cont ↔ Spark percentile), rounded to whole µs.

    Scale: the per-user min-pass and join share the user_id
    partitioning; the percentile runs over the converted users only
    (already reduced) — at extreme SF swap in approx_percentile with a
    documented error budget."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", ev_us().alias("t")
    )
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id").agg(F.min("t").alias("t1"))
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s1, "user_id")
        .filter(F.col("t") > F.col("t1"))
        .groupBy("user_id")
        .agg((F.min("t") - F.any_value("t1")).alias("latency_us"))
    )
    return conv.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.round(F.expr("percentile(latency_us, 0.5)"), 0).cast("bigint").alias("p50_us"),
        F.round(F.expr("percentile(latency_us, 0.9)"), 0).cast("bigint").alias("p90_us"),
        F.min("latency_us").alias("min_us"),
        F.max("latency_us").alias("max_us"),
    )


@query(
    "ts_sessionize_stats",
    oracle="""
WITH ev AS (
  SELECT user_id, epoch_us(ts) AS t, value FROM events
), flagged AS (
  SELECT user_id, t, value,
         CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t)
                   > 1800000000 OR
                   lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM ev
), numbered AS (
  SELECT user_id, t, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY t
                           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       min(t) AS session_start_us,
       CAST(count(*) AS BIGINT) AS n_events,
       max(t) - min(t) AS duration_us,
       round(sum(value), 4) AS sum_value
FROM numbered
GROUP BY user_id, session_seq
""",
)
def ts_sessionize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: split each user's event stream at >30-min
    silences and aggregate per session — the gaps-and-islands session
    assignment (lag -> boundary flag -> running sum = session id) that
    is the BATCH analogue of streaming/pipelines.py's
    applyInPandasWithState sessionizer, and the backfill path a lambda
    architecture pairs with it. (The reference connector has no
    session notion; extension tier.)

    Scale: ONE shuffle on user_id serves both window passes AND the
    final aggregate (same partitioning key, Spark reuses the exchange);
    the windows are per-user sorted scans, skew-bounded by the busiest
    single user. Event time is integer µs (helpers.py) — exact
    cross-engine."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", ev_us().alias("t"), "value"
    )
    by_t = Window.partitionBy("user_id").orderBy("t")
    prev = F.lag("t").over(by_t)
    is_new = F.when(
        prev.isNull() | ((F.col("t") - prev) > 1_800_000_000), 1
    ).otherwise(0)
    numbered = ev.withColumn("is_new", is_new).withColumn(
        "session_seq",
        F.sum("is_new").over(by_t.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.min("t").alias("session_start_us"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.max("t") - F.min("t")).alias("duration_us"),
        r4(F.sum("value")).alias("sum_value"),
    )


@query(
    "ts_ewma_halflife",
    oracle="""
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS t, value FROM events
),
l AS (
  SELECT user_id, event_id,
         list(value) OVER (PARTITION BY user_id ORDER BY t ASC, event_id ASC
                           ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS xs
  FROM ev
)
SELECT user_id, event_id,
       round(list_sum(list_transform(generate_series(1, len(xs)),
                                     i -> xs[i] * pow(0.5, len(xs) - i)))
             / list_sum(list_transform(generate_series(1, len(xs)),
                                       i -> pow(0.5, len(xs) - i))), 4) AS ewma
FROM l
""",
)
def ts_ewma_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated exponentially-weighted moving average per user: the
    trailing-8-event EWMA with decay 0.5 per step — the recency-biased
    smoother (EWMA is recursive, which plain window aggregates can't
    express; truncating the tail at 8 terms turns it into a bounded
    frame computation with <0.4% weight discarded).

    Determinism: decay 0.5 makes every weight an exact binary power;
    both engines left-fold the <=8 products in identical frame order,
    so the quotient is bit-identical before r4.

    Scale: one shuffle+sort per key, O(frame) work per row — the same
    cost envelope as any bounded moving aggregate; the collect_list
    never leaves the row's frame."""
    from ..helpers import ev_us

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", ev_us().alias("t"), "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("event_id").asc())
        .rowsBetween(-7, 0)
    )
    num = (
        "aggregate(zip_with(xs, sequence(size(xs) - 1, 0, -1), "
        "(x, p) -> x * pow(0.5D, p)), 0D, (a, v) -> a + v)"
    )
    den = (
        "aggregate(transform(sequence(size(xs) - 1, 0, -1), "
        "p -> pow(0.5D, p)), 0D, (a, v) -> a + v)"
    )
    return (
        ev.withColumn("xs", F.collect_list("value").over(w))
        .select(
            "user_id",
            "event_id",
            r4(F.expr(num) / F.expr(den)).alias("ewma"),
        )
    )


@query(
    "ts_cusum_change_point",
    oracle="""
WITH seq AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ms, value,
         sum(value - 50.0) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id
                                 ROWS UNBOUNDED PRECEDING) AS cusum
  FROM events
),
ranked AS (
  SELECT user_id, event_id, ms, cusum,
         count(*) OVER (PARTITION BY user_id) AS n_events,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY abs(cusum) DESC, ms ASC, event_id ASC) AS rn
  FROM seq
)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       round(abs(cusum), 4) AS max_abs_cusum,
       CAST(ms AS BIGINT) AS change_ms
FROM ranked WHERE rn = 1
ORDER BY user_id
""",
)
def ts_cusum_change_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection per user: cumulative sum of
    deviations from the process target (50.0 — the classical CUSUM
    known-reference form), with the change point at the maximum
    |cusum| — where the level shift is most pronounced. The drift
    monitor that catches slow mean shifts z-score anomaly detection
    (window_zscore_anomaly) misses.

    Float discipline: the reference value is a CONSTANT, so the
    running sum adds the same operands in the same per-user order on
    both engines — bit-identical prefix sums — and the argmax over
    them is deterministic with the (ms, event_id) tie-break. Using
    the per-user MEAN as reference would re-introduce cross-engine
    group-sum accumulation into control flow (the semantic-buckets
    hazard); the known-target form avoids it by construction.

    Scale: one exchange on user_id shared by both windows (the
    running sum and the rank), both riding the events cache layout in
    bench mode; output is one row per user.
    """
    ev = table(spark, sf_dir, "events")
    w_seq = (
        Window.partitionBy("user_id")
        .orderBy(ev_us("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seq = ev.select(
        "user_id",
        "event_id",
        ev_ms("ts").alias("ms"),
        F.sum(F.col("value") - F.lit(50.0)).over(w_seq).alias("cusum"),
    )
    w_n = Window.partitionBy("user_id")
    w_rank = Window.partitionBy("user_id").orderBy(
        F.abs(F.col("cusum")).desc(), F.asc("ms"), F.asc("event_id")
    )
    ranked = seq.select(
        "user_id",
        "ms",
        "cusum",
        F.count(F.lit(1)).over(w_n).alias("n_events"),
        F.row_number().over(w_rank).alias("rn"),
    )
    return (
        ranked.filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("n_events").cast("bigint").alias("n_events"),
            r4(F.abs("cusum")).alias("max_abs_cusum"),
            F.col("ms").cast("bigint").alias("change_ms"),
        )
        .orderBy(F.asc("user_id"))
    )


_WF_US = 21_600_000_000  # 6 h funnel window, µs


@query(
    "analytics_window_funnel",
    oracle=f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t, event_id,
         CASE event_type WHEN 'click' THEN 0 WHEN 'view' THEN 1
                         WHEN 'purchase' THEN 2 END AS sr
  FROM events
  WHERE event_type IN ('click', 'view', 'purchase')
),
l1 AS (
  SELECT *, max(CASE WHEN sr = 0 THEN t END)
              OVER (PARTITION BY user_id ORDER BY t, sr, event_id
                    ROWS UNBOUNDED PRECEDING) AS lc
  FROM e
),
l2 AS (
  SELECT *, last_value(CASE WHEN sr = 1 AND lc IS NOT NULL
                            THEN struct_pack(tv := t, lcv := lc) END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY t, sr, event_id
                    ROWS UNBOUNDED PRECEDING) AS vs
  FROM l1
),
lvl AS (
  SELECT user_id,
         max(CASE WHEN sr = 2 AND vs IS NOT NULL AND vs.lcv >= t - {_WF_US} THEN 3
                  WHEN sr = 1 AND lc IS NOT NULL AND lc >= t - {_WF_US} THEN 2
                  WHEN sr = 0 THEN 1 ELSE 0 END) AS funnel_level
  FROM l2 GROUP BY user_id
)
SELECT funnel_level, CAST(count(*) AS BIGINT) AS n_users
FROM lvl GROUP BY funnel_level ORDER BY funnel_level
""",
)
def analytics_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded ordered funnel (the windowFunnel shape): deepest
    click -> view -> purchase chain per user where the WHOLE chain fits
    in a 6 h window anchored at the first step — unlike
    analytics_funnel_steps (ever-after ordering), conversions here
    expire, which is what attribution actually wants.

    No pair joins: the chain test is two cascaded as-of window passes
    per user — (1) running max click time gives each row its best
    chain anchor; (2) the running last view-struct carries BOTH the
    view time and ITS anchor forward, so each purchase checks
    ``anchor >= t_purchase - W`` in O(1). Optimality argument: the
    running max click is monotone, so the LATEST view before a
    purchase always carries the best anchor — if any valid chain
    exists, this one is valid (the standard exchange argument).
    Ties sort (t, step_rank, event_id) identically on both engines,
    so equal-time chains resolve identically.

    Scale: one shuffle on user_id serves both window passes and the
    final per-user max — O(events) total, versus the O(clicks x views)
    per user a join spelling pays; output is <= 4 rows."""
    ev = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "purchase")
    )
    e = ev.select(
        "user_id",
        ev_us().alias("t"),
        "event_id",
        F.when(F.col("event_type") == "click", 0)
        .when(F.col("event_type") == "view", 1)
        .otherwise(2)
        .alias("sr"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("t"), F.asc("sr"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    l1 = e.withColumn(
        "lc", F.max(F.when(F.col("sr") == 0, F.col("t"))).over(w)
    )
    l2 = l1.withColumn(
        "vs",
        F.last(
            F.when(
                (F.col("sr") == 1) & F.col("lc").isNotNull(),
                F.struct(F.col("t").alias("tv"), F.col("lc").alias("lcv")),
            ),
            ignorenulls=True,
        ).over(w),
    )
    lvl = l2.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("sr") == 2)
                & F.col("vs").isNotNull()
                & (F.col("vs.lcv") >= F.col("t") - _WF_US),
                3,
            )
            .when(
                (F.col("sr") == 1)
                & F.col("lc").isNotNull()
                & (F.col("lc") >= F.col("t") - _WF_US),
                2,
            )
            .when(F.col("sr") == 0, 1)
            .otherwise(0)
        ).alias("funnel_level")
    )
    return (
        lvl.groupBy("funnel_level")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy(F.asc("funnel_level"))
    )


@query(
    "ts_transition_matrix",
    oracle="""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS t, event_id FROM events
), s AS (
  SELECT user_id, event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY t ASC, event_id ASC) AS dst
  FROM e
)
SELECT src, dst, CAST(count(*) AS BIGINT) AS n,
       round(count(*) / CAST(sum(count(*)) OVER (PARTITION BY src)
                             AS DOUBLE), 4) AS p
FROM s WHERE dst IS NOT NULL
GROUP BY src, dst
ORDER BY src, dst
""",
)
def ts_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: counts and row-normalized probabilities of event_type A
    being followed by B — the behavioral model behind next-event
    prediction, anomaly scoring (improbable transitions), and the
    Sankey/flow diagrams of product analytics.

    Scale: one shuffle+sort per user for lead() (the same per-key
    window every sessionizer pays), then a map-side-combined (src,
    dst) count; the normalizing window runs over the |types|² count
    grid (bounded by the category-pair domain, never the input)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", ev_us().alias("t"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy(F.asc("t"), F.asc("event_id"))
    s = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    c = s.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    w_src = Window.partitionBy("src")
    return (
        c.select(
            "src",
            "dst",
            F.col("n").cast("bigint").alias("n"),
            r4(F.col("n") / F.sum("n").over(w_src).cast("double")).alias("p"),
        )
        .orderBy(F.asc("src"), F.asc("dst"))
    )


@query(
    "dq_freshness_staleness",
    oracle="""
WITH m AS (SELECT max(epoch_us(ts)) AS gmax FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(max(epoch_us(ts)) AS BIGINT) AS last_seen_us,
       CAST((gmax - max(epoch_us(ts))) // 60000000 AS BIGINT)
         AS staleness_min
FROM events CROSS JOIN m
GROUP BY event_type, gmax
ORDER BY event_type
""",
)
def dq_freshness_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed-freshness monitor: per category, the last-seen timestamp
    and its staleness (whole minutes behind the globally freshest
    event) — the first-line data-quality alarm for a silently-stalled
    upstream partition (a category whose staleness grows while others
    stay near zero is a dead producer, invisible to row-count checks
    until much later).

    Scale: one map-side-combined max/count per category plus a 1-row
    global-max broadcast; entirely integer time arithmetic (µs //
    60e6), so the staleness is bit-deterministic."""
    ev = table(spark, sf_dir, "events").select("event_type", ev_us().alias("t"))
    m = F.broadcast(ev.agg(F.max("t").alias("gmax")))
    return (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.max("t").alias("last_seen"))
        .crossJoin(m)
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            F.col("last_seen").cast("bigint").alias("last_seen_us"),
            F.expr("(gmax - last_seen) div 60000000").cast("bigint").alias(
                "staleness_min"
            ),
        )
        .orderBy(F.asc("event_type"))
    )


@query(
    "ts_autocorrelation",
    oracle=f"""
WITH series AS (
  SELECT epoch_us(ts) // {_HOUR_US} AS h, CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1
), lagged AS (
  SELECT lag AS lag_h, a.y AS y0, b.y AS y1
  FROM (SELECT unnest([1, 2, 3, 6, 12, 24]) AS lag) l
  JOIN series a ON TRUE
  JOIN series b ON b.h = a.h + lag
)
SELECT CAST(lag_h AS BIGINT) AS lag_h,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round((avg(y0 * y1) - avg(y0) * avg(y1))
             / (sqrt(avg(y0 * y0) - avg(y0) * avg(y0))
              * sqrt(avg(y1 * y1) - avg(y1) * avg(y1))), 4) AS acf
FROM lagged
GROUP BY lag_h
ORDER BY lag_h
""",
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the hourly event-count series at lags
    {1, 2, 3, 6, 12, 24} hours — the seasonality diagnostic behind
    every capacity-planning / anomaly-baseline job (a 24h spike in the
    ACF is daily rhythm; slow decay is trend). Pearson correlation of
    the series against its lag-shifted self, one row per lag, spelled
    from raw moment averages identically on both engines (same
    §5.3.8/moments discipline as agg_higher_moments).

    Scale: the series itself is the aggregate (|hours| rows — bounded
    by the time range, not event count); the lag join is an equi-join
    on the hour key over that bounded series, fanned out over a 6-row
    broadcast lag list. Cost is dominated by the one count-per-hour
    map-side-combined pass."""
    s = (
        table(spark, sf_dir, "events")
        .groupBy(F.expr(f"unix_micros(ts) div {_HOUR_US}").alias("h"))
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )
    lags = spark.createDataFrame([(lag,) for lag in (1, 2, 3, 6, 12, 24)], "lag LONG")
    a = s.select(F.col("h").alias("h0"), F.col("y").alias("y0"))
    b = s.select(F.col("h").alias("h1"), F.col("y").alias("y1"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("h1") == F.col("h0") + F.col("lag"))
    )
    acf = (
        (F.avg(F.col("y0") * F.col("y1")) - F.avg("y0") * F.avg("y1"))
        / (
            F.sqrt(F.avg(F.col("y0") * F.col("y0")) - F.avg("y0") * F.avg("y0"))
            * F.sqrt(F.avg(F.col("y1") * F.col("y1")) - F.avg("y1") * F.avg("y1"))
        )
    )
    return (
        pairs.groupBy(F.col("lag").alias("lag_h"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"), r4(acf).alias("acf"))
        .select(F.col("lag_h").cast("bigint").alias("lag_h"), "n_pairs", "acf")
        .orderBy(F.asc("lag_h"))
    )


@query(
    "ts_cross_correlation",
    oracle=f"""
WITH c AS (
  SELECT epoch_us(ts) // {_HOUR_US} AS h, CAST(count(*) AS DOUBLE) AS y
  FROM events WHERE event_type = 'click' GROUP BY 1
), p AS (
  SELECT epoch_us(ts) // {_HOUR_US} AS h, CAST(count(*) AS DOUBLE) AS y
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), lagged AS (
  SELECT lag AS lag_h, c.y AS y0, p.y AS y1
  FROM (SELECT unnest([-2, -1, 0, 1, 2]) AS lag) l
  JOIN c ON TRUE
  JOIN p ON p.h = c.h + lag
)
SELECT CAST(lag_h AS BIGINT) AS lag_h,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round((avg(y0 * y1) - avg(y0) * avg(y1))
             / (sqrt(avg(y0 * y0) - avg(y0) * avg(y0))
              * sqrt(avg(y1 * y1) - avg(y1) * avg(y1))), 4) AS xcf
FROM lagged
GROUP BY lag_h
ORDER BY lag_h
""",
)
def ts_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation between the hourly click and purchase count
    series at lags -2..+2 hours — the lead-lag analysis that answers
    "do clicks LEAD purchases, and by how much?" (the peak lag is the
    conversion latency at series granularity; the event-level twin is
    analytics_conversion_latency). Same moment-average Pearson
    spelling as ts_autocorrelation.

    Scale: both series are bounded per-hour aggregates; the lag join
    is series-sized with a 5-row broadcast fan-out — negligible next
    to the two counting passes (one scan, two filtered aggregates)."""
    ev = table(spark, sf_dir, "events")

    def series(etype: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .groupBy(F.expr(f"unix_micros(ts) div {_HOUR_US}").alias("h"))
            .agg(F.count(F.lit(1)).cast("double").alias("y"))
        )

    c = series("click").select(F.col("h").alias("h0"), F.col("y").alias("y0"))
    p = series("purchase").select(F.col("h").alias("h1"), F.col("y").alias("y1"))
    lags = spark.createDataFrame([(lag,) for lag in (-2, -1, 0, 1, 2)], "lag LONG")
    pairs = (
        c.crossJoin(F.broadcast(lags))
        .join(p, F.col("h1") == F.col("h0") + F.col("lag"))
    )
    xcf = (
        (F.avg(F.col("y0") * F.col("y1")) - F.avg("y0") * F.avg("y1"))
        / (
            F.sqrt(F.avg(F.col("y0") * F.col("y0")) - F.avg("y0") * F.avg("y0"))
            * F.sqrt(F.avg(F.col("y1") * F.col("y1")) - F.avg("y1") * F.avg("y1"))
        )
    )
    return (
        pairs.groupBy(F.col("lag").alias("lag_h"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"), r4(xcf).alias("xcf"))
        .select(F.col("lag_h").cast("bigint").alias("lag_h"), "n_pairs", "xcf")
        .orderBy(F.asc("lag_h"))
    )


@query(
    "ts_sax_symbols",
    oracle=f"""
WITH hourly AS (
  SELECT epoch_us(ts) // {_HOUR_US} AS h, CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1
), stats AS (
  SELECT avg(y) AS mu, sqrt(avg(y * y) - avg(y) * avg(y)) AS sigma,
         min(h) AS h0
  FROM hourly
), paa AS (
  SELECT (h - h0) // 4 AS seg, avg((y - mu) / sigma) AS z
  FROM hourly CROSS JOIN stats
  GROUP BY 1
)
SELECT CAST(seg AS BIGINT) AS seg,
       round(z, 4) AS paa_z,
       CASE WHEN z < -0.6745 THEN 'a'
            WHEN z < 0 THEN 'b'
            WHEN z < 0.6745 THEN 'c'
            ELSE 'd' END AS symbol
FROM paa
ORDER BY seg
""",
)
def ts_sax_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization (Lin/Keogh et al. 2003, public): z-normalize
    the hourly event-count series, Piecewise-Aggregate-Approximate it
    into 4-hour segments, and map each segment mean to a 4-letter
    alphabet at the N(0,1) quartile breakpoints (±0.6745, 0) — the
    discretization that turns time series into strings so the whole
    text toolbox (n-gram counts, winnowing fingerprints, suffix
    matching) applies to motif/anomaly discovery. Compose with
    text_winnowing_fingerprint for SAX-word fingerprints.

    Scale: the series is the bounded per-hour aggregate; stats are a
    1-row broadcast; PAA is a second bounded aggregate. Symbol
    boundaries are exact comparisons on identically-computed doubles
    (same operand order both engines)."""
    hourly = (
        table(spark, sf_dir, "events")
        .groupBy(F.expr(f"unix_micros(ts) div {_HOUR_US}").alias("h"))
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )
    stats = F.broadcast(
        hourly.agg(
            F.avg("y").alias("mu"),
            F.sqrt(F.avg(F.col("y") * F.col("y")) - F.avg("y") * F.avg("y")).alias(
                "sigma"
            ),
            F.min("h").alias("h0"),
        )
    )
    paa = (
        hourly.crossJoin(stats)
        .groupBy(F.expr("(h - h0) div 4").alias("seg"))
        .agg(F.avg((F.col("y") - F.col("mu")) / F.col("sigma")).alias("z"))
    )
    sym = (
        F.when(F.col("z") < -0.6745, "a")
        .when(F.col("z") < 0, "b")
        .when(F.col("z") < 0.6745, "c")
        .otherwise("d")
    )
    return paa.select(
        F.col("seg").cast("bigint").alias("seg"),
        r4(F.col("z")).alias("paa_z"),
        sym.alias("symbol"),
    ).orderBy(F.asc("seg"))


@query(
    "ts_seasonal_naive_backtest",
    oracle=f"""
WITH series AS (
  SELECT event_type, epoch_us(ts) // {_HOUR_US} AS h,
         CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
)
SELECT a.event_type,
       CAST(count(*) AS BIGINT) AS n_forecasts,
       round(avg(abs(a.y - b.y)), 4) AS mae,
       round(avg(abs(a.y - b.y) / a.y) FILTER (a.y > 0), 4) AS mape
FROM series a JOIN series b
  ON a.event_type = b.event_type AND b.h = a.h - 24
GROUP BY a.event_type
ORDER BY a.event_type
""",
)
def ts_seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict every hour's event
    count as the SAME HOUR YESTERDAY (the baseline any real
    forecasting model must beat — if your model's MAE isn't under
    this, ship the naive), scored per category with MAE and MAPE over
    all hours with a 24h-old reference. This is the standard
    walk-forward evaluation shape: the join key IS the backtest
    alignment, no leakage possible by construction.

    Scale: the hourly series is the bounded aggregate; the alignment
    join is an equi-join on (category, hour) over that series; errors
    aggregate map-side. The same skeleton scores ANY precomputed
    forecast column against actuals."""
    series = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr(f"unix_micros(ts) div {_HOUR_US}").alias("h"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
    )
    a = series.select("event_type", "h", F.col("y").alias("ya"))
    b = series.select(
        F.col("event_type").alias("et2"), F.col("h").alias("h2"), F.col("y").alias("yb")
    )
    j = a.join(
        b,
        (F.col("event_type") == F.col("et2")) & (F.col("h2") == F.col("h") - 24),
    )
    err = F.abs(F.col("ya") - F.col("yb"))
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_forecasts"),
            r4(F.avg(err)).alias("mae"),
            r4(F.avg(F.when(F.col("ya") > 0, err / F.col("ya")))).alias("mape"),
        )
        .orderBy(F.asc("event_type"))
    )


@query(
    "ts_entropy_rate",
    oracle="""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS t, event_id FROM events
), s AS (
  SELECT user_id, event_type AS src,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY t ASC, event_id ASC) AS dst
  FROM e
), c AS (
  SELECT src, dst, CAST(count(*) AS DOUBLE) AS n
  FROM s WHERE dst IS NOT NULL GROUP BY src, dst
), tot AS (SELECT sum(n) AS total FROM c),
probs AS (
  SELECT src, n, n / sum(n) OVER (PARTITION BY src) AS p FROM c
),
row_h AS (
  SELECT src, sum(n) AS row_n, -sum(p * ln(p)) AS h_src
  FROM probs GROUP BY src
)
SELECT CAST(count(*) AS BIGINT) AS n_states,
       round(sum((row_n / total) * h_src), 4) AS entropy_rate_nats,
       round(ln(count(*)), 4) AS max_entropy_nats
FROM row_h CROSS JOIN tot
""",
)
def ts_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the per-user event-type Markov chain:
    H = Σ_s π(s) · H(next | s), with π the empirical transition-source
    distribution — the single number that says how PREDICTABLE user
    behavior is (0 = deterministic flows, ln|states| = uniform
    chaos); the information-theoretic summary of ts_transition_matrix
    and the denominator for behavioral-model lift claims.

    Scale: everything after the lead() pass lives on the |states|²
    count grid; the conditional entropies and the mixture are bounded
    aggregates with a 1-row total broadcast."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", ev_us().alias("t"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy(F.asc("t"), F.asc("event_id"))
    s = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    c = s.groupBy("src", "dst").agg(F.count(F.lit(1)).cast("double").alias("n"))
    w_src = Window.partitionBy("src")
    p_cond = (F.col("n") / F.sum("n").over(w_src)).alias("p")
    probs = c.select("src", "n", p_cond)
    row = probs.groupBy("src").agg(
        F.sum("n").alias("row_n"),
        (-F.sum(F.col("p") * F.log("p"))).alias("h_src"),
    )
    tot = F.broadcast(c.agg(F.sum("n").alias("total")))
    return row.crossJoin(tot).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_states"),
        r4(F.sum((F.col("row_n") / F.col("total")) * F.col("h_src"))).alias(
            "entropy_rate_nats"
        ),
        r4(F.log(F.count(F.lit(1)).cast("double"))).alias("max_entropy_nats"),
    )


@query(
    "ts_seasonal_strength",
    oracle=f"""
WITH hourly AS (
  SELECT event_type,
         epoch_us(ts) // {3600_000_000} AS hb,
         count(*) AS x
  FROM events GROUP BY 1, 2
), trend AS (
  SELECT event_type, hb // 24 AS day, avg(x) AS day_mean
  FROM hourly GROUP BY 1, 2
), det AS (
  SELECT h.event_type, h.hb % 24 AS hod, h.x - t.day_mean AS d
  FROM hourly h JOIN trend t
    ON t.event_type = h.event_type AND t.day = h.hb // 24
), seas AS (
  SELECT event_type, hod, avg(d) AS s FROM det GROUP BY 1, 2
), parts AS (
  SELECT d.event_type, d.d, d.d - s.s AS r
  FROM det d JOIN seas s
    ON s.event_type = d.event_type AND s.hod = d.hod
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_hours,
       round(CASE WHEN (avg(d * d) - avg(d) * avg(d)) <= 0 THEN 0.0
             ELSE greatest(0.0,
                  1.0 - (avg(r * r) - avg(r) * avg(r))
                        / (avg(d * d) - avg(d) * avg(d))) END, 4)
         AS seasonal_strength
FROM parts GROUP BY event_type ORDER BY event_type
""",
)
def ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal STRENGTH (Hyndman & Athanasopoulos, FPP3 §4.4):
    F_s = max(0, 1 - Var(remainder)/Var(detrended)) per category on
    the hourly event-rate series, with a mean-based STL-lite
    decomposition — trend = daily mean, seasonal = hour-of-day mean of
    the detrended series, remainder = what's left. The scalar the
    forecasting stack reads to decide whether `ts_seasonal_profile`'s
    168-cell baseline (or `ts_seasonal_naive_backtest`'s lag model)
    is even applicable to a series. Variances are spelled from
    explicit moments (avg of squares minus squared avg) on both
    engines — builtin var_samp algorithms differ — and the final
    ratio is scale-free, so the §5.3.1 magnitude check passes at any
    SF.

    Scale: the hourly rollup is the only fact-sized aggregate
    (map-side combined); trend is |types|x|days| rows, seasonal
    |types|x24 — both broadcastable; everything downstream is
    bounded-size joins + one moment pass."""
    t = ev_us()
    hourly = (
        table(spark, sf_dir, "events")
        .select("event_type", (t / 3_600_000_000).cast("bigint").alias("hb"))
        .groupBy("event_type", "hb")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    trend = (
        hourly.withColumn("day", (F.col("hb") / 24).cast("bigint"))
        .groupBy("event_type", "day")
        .agg(F.avg("x").alias("day_mean"))
    )
    det = (
        hourly.withColumn("day", (F.col("hb") / 24).cast("bigint"))
        .join(trend, ["event_type", "day"])
        .select(
            "event_type",
            (F.col("hb") % 24).alias("hod"),
            (F.col("x") - F.col("day_mean")).alias("d"),
        )
    )
    seas = det.groupBy("event_type", "hod").agg(F.avg("d").alias("s"))
    parts = det.join(seas, ["event_type", "hod"]).select(
        "event_type", "d", (F.col("d") - F.col("s")).alias("r")
    )
    var = lambda c: F.avg(c * c) - F.avg(c) * F.avg(c)  # noqa: E731
    return (
        parts.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_hours"),
            r4(
                # a flat detrended series (Var(d)=0) has NO seasonality
                # by definition — and 0/0 would be NaN, not 0
                F.when(var(F.col("d")) <= 0, F.lit(0.0)).otherwise(
                    F.greatest(
                        F.lit(0.0), 1.0 - var(F.col("r")) / var(F.col("d"))
                    )
                )
            ).alias("seasonal_strength"),
        )
        .orderBy(F.asc("event_type"))
    )


@query(
    "analytics_attribution_last_touch",
    oracle="""
WITH ev AS (
  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS t FROM events
), tt AS (
  SELECT *,
         last_value(CASE WHEN event_type IN ('click', 'view')
                         THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY t, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS touch_type
  FROM ev
)
SELECT coalesce(touch_type, '(none)') AS touch_type,
       CAST(count(*) AS BIGINT) AS n_purchases,
       round(sum(value), 4) AS attributed_revenue
FROM tt WHERE event_type = 'purchase'
GROUP BY 1
""",
)
def analytics_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution, last-touch model: every purchase credits
    its revenue to the user's most recent preceding touch event (click
    or view); purchases with no prior touch land in '(none)'. The
    classic companion to the funnel/conversion family (task.ts's query
    passthrough cannot express this — it needs ordered per-user state).

    Scale: one window PARTITIONED BY user_id (the natural shuffle key —
    same partitioning every per-user op in this module reuses), frame
    [unbounded, -1] with last(ignorenulls) — no self-join, no explode;
    the attribution group-by reduces to |touch types| rows. Ordering
    ties break on event_id, so attribution is deterministic."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value", ev_us().alias("t")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(
            F.col("event_type").isin("click", "view"), F.col("event_type")
        ),
        ignorenulls=True,
    ).over(w)
    return (
        ev.withColumn("touch_type", touch)
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch_type", F.lit("(none)")).alias("touch_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            r4(F.sum("value")).alias("attributed_revenue"),
        )
    )


@query(
    "analytics_session_paths",
    oracle="""
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events
), f AS (
  SELECT *, CASE WHEN lag(t) OVER w IS NULL
                   OR t - lag(t) OVER w > 1800000000
                 THEN 1 ELSE 0 END AS is_new
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
), n AS (
  SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY t, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
  FROM f
), s AS (
  SELECT user_id, sid,
         array_to_string((list(event_type ORDER BY t, event_id))[1:5], '>') AS path
  FROM n GROUP BY user_id, sid
)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM s GROUP BY path ORDER BY n_sessions DESC, path LIMIT 20
""",
)
def analytics_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream path mining: 30-minute-gap sessionization per user,
    each session reduced to its first-5-event-type path string, top 20
    paths by session count. The behavioral-sequence complement of
    ts_sessionize_stats (which measures sessions; this ranks WHAT
    happens inside them).

    Scale: the gap flag and session id are per-user windows on the
    same user_id partitioning; path assembly is array_sort over the
    session's collected (t, event_id, type) structs — in-group, no
    extra shuffle beyond the session group-by; the final top-20 is
    TakeOrderedAndProject (never a global sort). Ordering ties break
    (count DESC, path ASC) so the cut is deterministic."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", ev_us().alias("t")
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    is_new = F.when(
        F.lag("t").over(w).isNull()
        | ((F.col("t") - F.lag("t").over(w)) > 1_800_000_000),
        1,
    ).otherwise(0)
    sessions = (
        ev.withColumn("is_new", is_new)  # stage: no nested window exprs
        .withColumn(
            "sid",
            F.sum("is_new").over(
                Window.partitionBy("user_id")
                .orderBy("t", "event_id")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "sid")
        .agg(
            F.concat_ws(
                ">",
                F.slice(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("t", "event_id", "event_type")
                            )
                        ),
                        lambda s: s["event_type"],
                    ),
                    1,
                    5,
                ),
            ).alias("path")
        )
    )
    return (
        sessions.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(20)
    )


@query(
    "ts_theil_sen_trend",
    oracle="""
WITH m AS (
  SELECT o_orderpriority AS priority,
         year(o_orderdate) * 12 + month(o_orderdate) AS midx,
         round(sum(o_totalprice), 2) AS rev
  FROM orders
  GROUP BY 1, 2
),
p AS (
  SELECT a.priority,
         (b.rev - a.rev) / (b.midx - a.midx) AS slope
  FROM m a JOIN m b
    ON a.priority = b.priority AND b.midx > a.midx
),
s AS (
  SELECT priority,
         round(quantile_cont(slope, 0.5), 4) AS ts_slope,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM p GROUP BY priority
),
mm AS (
  SELECT priority, CAST(count(*) AS BIGINT) AS n_months FROM m GROUP BY priority
)
SELECT s.priority, ts_slope, n_months, n_pairs
FROM s JOIN mm ON s.priority = mm.priority
""",
)
def ts_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend estimator per order priority: the MEDIAN
    of all pairwise slopes of the monthly-revenue series — the
    breakdown-resistant alternative to the OLS slope
    (stats_regression_funcs), standard for drift/trend monitoring where
    a few outlier months would swing least squares (Theil 1950, Sen
    1968 — public-domain statistics).

    Determinism: monthly revenue is rounded to 2 decimals BEFORE the
    pairwise stage, so every slope is a ratio of bit-identical doubles
    on both engines (the raw money sum carries ~1e-7 cross-engine
    accumulation noise, far below the cent grid but large enough to
    flip a median SELECTION between near-equal slopes); both engines
    interpolate the even-count median identically (Spark percentile /
    DuckDB quantile_cont).

    Scale: the pairwise self-join is bounded by the CALENDAR, not the
    table — the monthly aggregate has |priorities| x |months| rows
    (~400 here; the month grid grows with the time span, never with
    row count), so the O(months²) pair stage is a constant-sized
    equi-join however large orders gets. The data-sized work is one
    map-side-combined group-by."""
    o = table(spark, sf_dir, "orders")
    m = (
        o.groupBy(
            F.col("o_orderpriority").alias("priority"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("midx"),
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    a, b = m.alias("a"), m.alias("b")
    pairs = a.join(
        b,
        (F.col("a.priority") == F.col("b.priority"))
        & (F.col("b.midx") > F.col("a.midx")),
    ).select(
        F.col("a.priority").alias("priority"),
        (
            (F.col("b.rev") - F.col("a.rev"))
            / (F.col("b.midx") - F.col("a.midx"))
        ).alias("slope"),
    )
    s = pairs.groupBy("priority").agg(
        r4(F.expr("percentile(slope, 0.5)")).alias("ts_slope"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
    mm = m.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months")
    )
    return s.join(F.broadcast(mm), "priority").select(
        "priority", "ts_slope", "n_months", "n_pairs"
    )


def mk_s_expr(seq: str, n: str):
    """Mann-Kendall S = sum_{i<j} sign(seq[j] - seq[i]) as an in-row
    nested-HOF expression over a time-ordered value array ``seq`` of
    length ``n`` (both column names). Exact BIGINT given exact inputs;
    O(n^2) work stays inside the row — no pair join."""
    return F.expr(
        f"""
IF({n} < 2, 0L,
  aggregate(sequence(0, {n} - 2), 0L,
    (acc, i) -> acc + aggregate(sequence(i + 1, {n} - 1), 0L,
      (ac2, j) -> ac2 + CAST(sign({seq}[j] - {seq}[i]) AS BIGINT))))
"""
    )


def mk_tie_expr(rv: str, n: str):
    """Mann-Kendall variance tie term sum_t t(t-1)(2t+5) via a
    run-length fold over a VALUE-sorted array ``rv`` of length ``n``."""
    return F.expr(
        f"""
IF({n} < 2, 0.0D,
  aggregate(sequence(1, {n} - 1),
    named_struct('run', 1L, 'tot', 0.0D),
    (acc, i) -> IF({rv}[i] = {rv}[i - 1],
                   named_struct('run', acc.run + 1, 'tot', acc.tot),
                   named_struct('run', 1L,
                                'tot', acc.tot + CAST(acc.run * (acc.run - 1)
                                       * (2 * acc.run + 5) AS DOUBLE))),
    acc -> acc.tot + CAST(acc.run * (acc.run - 1) * (2 * acc.run + 5) AS DOUBLE)))
"""
    )


@query(
    "ts_mann_kendall",
    oracle="""
WITH m AS (
  SELECT o_orderpriority AS priority,
         year(o_orderdate) * 12 + month(o_orderdate) AS midx,
         round(sum(o_totalprice), 2) AS rev
  FROM orders
  GROUP BY 1, 2
),
s AS (
  SELECT a.priority,
         CAST(sum(CASE WHEN b.rev > a.rev THEN 1
                       WHEN b.rev < a.rev THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
  FROM m a JOIN m b ON a.priority = b.priority AND b.midx > a.midx
  GROUP BY 1
),
n AS (
  SELECT priority, CAST(count(*) AS DOUBLE) AS n FROM m GROUP BY 1
),
t AS (
  SELECT priority, sum(t * (t - 1) * (2 * t + 5)) AS tie_term
  FROM (SELECT priority, rev, CAST(count(*) AS DOUBLE) AS t
        FROM m GROUP BY 1, 2)
  GROUP BY 1
),
v AS (
  SELECT n.priority, n.n, s.s_stat,
         (n.n * (n.n - 1) * (2 * n.n + 5) - coalesce(t.tie_term, 0)) / 18.0 AS var_s
  FROM n JOIN s ON n.priority = s.priority
  LEFT JOIN t ON n.priority = t.priority
)
SELECT priority, CAST(n AS BIGINT) AS n_months, s_stat,
       round(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
                  WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
                  ELSE 0 END, 4) AS z_mk,
       CASE WHEN s_stat > 0 AND (s_stat - 1) / sqrt(var_s) >= 1.96 THEN 'increasing'
            WHEN s_stat < 0 AND (s_stat + 1) / sqrt(var_s) <= -1.96 THEN 'decreasing'
            ELSE 'no trend' END AS trend
FROM v
""",
)
def ts_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C160: Mann-Kendall trend test (Mann 1945, Kendall 1975) per
    order priority over the monthly-revenue series — the TEST
    companion to C138's Theil-Sen slope ESTIMATOR (the standard
    pairing in environmental/drift monitoring):

      S = sum_{i<j} sign(x_j - x_i),
      Var(S) = (n(n-1)(2n+5) - sum_t t(t-1)(2t+5)) / 18,
      z = (S -+ 1)/sqrt(Var)  (continuity-corrected).

    Plan shape: where Theil-Sen spells the O(months^2) stage as a
    calendar-bounded pair JOIN, Mann-Kendall spells it IN-ROW — the
    monthly series collects to one array per priority (bounded by the
    calendar, never by row count) and nested aggregate() HOFs compute
    S and the run-length tie term inside the row: ONE fact scan, one
    map-side-combined monthly aggregate, one 5-row collect step, ZERO
    pair join and zero second fact reference. Per the no-lambda-CSE
    rule the rev sequence is staged to a column before the HOFs.

    Determinism: monthly revenue rounds to the cent grid BEFORE any
    sign comparison (bit-identical inputs on both engines — the
    Theil-Sen argument); S and the tie term are exact integers, so z
    is a deterministic function of exact ints. Label margins probed:
    min |z - (+-1.96)| across fixtures is recorded next to the sign
    probes (tools/probe notes in tests/test_timeseries.py)."""
    o = table(spark, sf_dir, "orders")
    m = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("midx"),
    ).agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    g = m.groupBy("priority").agg(
        F.sort_array(F.collect_list(F.struct("midx", "rev"))).alias("a"),
        F.count(F.lit(1)).cast("int").alias("n"),
    )
    # stage intermediates: time-ordered revs, value-sorted revs
    g = g.select(
        "priority",
        "n",
        F.expr("transform(a, s -> s.rev)").alias("seq"),
        F.array_sort(F.expr("transform(a, s -> s.rev)")).alias("rv"),
    )
    s_stat = mk_s_expr("seq", "n")
    tie_term = mk_tie_expr("rv", "n")
    r = g.select(
        "priority",
        F.col("n").cast("bigint").alias("n_months"),
        s_stat.alias("s_stat"),
        (
            (
                F.col("n").cast("double")
                * (F.col("n") - 1)
                * (2 * F.col("n") + 5)
                - tie_term
            )
            / 18.0
        ).alias("var_s"),
    )
    s, v = F.col("s_stat"), F.col("var_s")
    z = (
        F.when(s > 0, (s - 1) / F.sqrt(v))
        .when(s < 0, (s + 1) / F.sqrt(v))
        .otherwise(F.lit(0.0))
    )
    return r.select(
        "priority",
        "n_months",
        "s_stat",
        r4(z).alias("z_mk"),
        F.when(z >= 1.96, F.lit("increasing"))
        .when(z <= -1.96, F.lit("decreasing"))
        .otherwise(F.lit("no trend"))
        .alias("trend"),
    )


@query(
    "ts_burstiness",
    oracle="""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS t, event_id FROM events
),
g AS (
  SELECT user_id, event_type,
         CAST(t - lag(t) OVER w AS DOUBLE) AS gap,
         CAST(lag(t) OVER w - lag(t, 2) OVER w AS DOUBLE) AS prev_gap
  FROM ev
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY t, event_id)
),
s AS (
  SELECT user_id, event_type,
         CAST(count(gap) AS DOUBLE) AS n, sum(gap) AS s1, sum(gap * gap) AS s2,
         CAST(count(CASE WHEN prev_gap IS NOT NULL THEN 1 END) AS DOUBLE) AS np,
         sum(CASE WHEN prev_gap IS NOT NULL THEN gap END) AS p1,
         sum(CASE WHEN prev_gap IS NOT NULL THEN prev_gap END) AS p2,
         sum(CASE WHEN prev_gap IS NOT NULL THEN gap * gap END) AS p11,
         sum(CASE WHEN prev_gap IS NOT NULL THEN prev_gap * prev_gap END) AS p22,
         sum(gap * prev_gap) AS p12
  FROM g WHERE gap IS NOT NULL
  GROUP BY 1, 2
),
b AS (
  SELECT event_type,
         (sqrt((s2 - s1 * s1 / n) / (n - 1)) - s1 / n)
         / (sqrt((s2 - s1 * s1 / n) / (n - 1)) + s1 / n) AS bness,
         CASE WHEN np >= 4
                   AND (np * p11 - p1 * p1) > 0 AND (np * p22 - p2 * p2) > 0
              THEN (np * p12 - p1 * p2)
                   / sqrt((np * p11 - p1 * p1) * (np * p22 - p2 * p2)) END AS mem
  FROM s
  WHERE n >= 5 AND (sqrt((s2 - s1 * s1 / n) / (n - 1)) + s1 / n) > 0
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_series,
       round(avg(bness), 4) AS avg_burstiness,
       round(avg(mem), 4) AS avg_memory
FROM b GROUP BY event_type
""",
)
def ts_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C164: burstiness + memory coefficient of inter-event times
    (Goh & Barabási, EPL 2008) per event type — the two-coordinate
    signature separating bursty human/failure activity (B>0) from
    Poisson (B~0) and pacemaker-regular (B<0) streams:

      B = (sigma - mu)/(sigma + mu) over a series' inter-event gaps,
      M = corr(gap_i, gap_{i+1})  (lag-1 gap autocorrelation),

    averaged over (user, event_type) series with >= 5 gaps (M needs
    >= 4 consecutive-gap pairs and positive variances — degenerate
    constant-gap series contribute B but not M, matching NULL-skip
    avg semantics on both engines).

    Scale: gaps and previous-gaps come from ONE user-partitioned
    window pass (two lag offsets share the frame); per-series moments
    are a map-side-combined hash aggregate; the tail is |event_type|
    rows. Gaps are exact integer microseconds (helpers.ev_us), so
    every per-series moment is a sum of exact products — the only
    cross-engine surface is accumulation order (~1e-16 relative),
    nine orders under the r4 grid on the scale-free B and M."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", ev_us(F.col("ts")).alias("t"), "event_id"
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("t", "event_id")
    g = ev.select(
        "user_id",
        "event_type",
        (F.col("t") - F.lag("t", 1).over(w)).cast("double").alias("gap"),
        (F.lag("t", 1).over(w) - F.lag("t", 2).over(w))
        .cast("double")
        .alias("prev_gap"),
    ).where(F.col("gap").isNotNull())
    pg = F.col("prev_gap").isNotNull()
    s = g.groupBy("user_id", "event_type").agg(
        F.count("gap").cast("double").alias("n"),
        F.sum("gap").alias("s1"),
        F.sum(F.col("gap") * F.col("gap")).alias("s2"),
        F.count(F.when(pg, 1)).cast("double").alias("np"),
        F.sum(F.when(pg, F.col("gap"))).alias("p1"),
        F.sum(F.when(pg, F.col("prev_gap"))).alias("p2"),
        F.sum(F.when(pg, F.col("gap") * F.col("gap"))).alias("p11"),
        F.sum(F.when(pg, F.col("prev_gap") * F.col("prev_gap"))).alias("p22"),
        F.sum(F.col("gap") * F.col("prev_gap")).alias("p12"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    np_, p1, p2 = F.col("np"), F.col("p1"), F.col("p2")
    p11, p22, p12 = F.col("p11"), F.col("p22"), F.col("p12")
    sd = F.sqrt((s2 - s1 * s1 / n) / (n - 1))
    mu = s1 / n
    mem = F.when(
        (np_ >= 4) & ((np_ * p11 - p1 * p1) > 0) & ((np_ * p22 - p2 * p2) > 0),
        (np_ * p12 - p1 * p2)
        / F.sqrt((np_ * p11 - p1 * p1) * (np_ * p22 - p2 * p2)),
    )
    b = s.where((n >= 5) & ((sd + mu) > 0)).select(
        "event_type",
        ((sd - mu) / (sd + mu)).alias("bness"),
        mem.alias("mem"),
    )
    return b.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_series"),
        r4(F.avg("bness")).alias("avg_burstiness"),
        r4(F.avg("mem")).alias("avg_memory"),
    )


_HOLT_A = 0.5   # level smoothing (alpha)
_HOLT_B = 0.25  # trend smoothing (beta) — exact binary fractions
_HOLT_H = 7     # forecast horizon (observation steps)


@query(
    "ts_holt_linear",
    oracle=f"""
WITH RECURSIVE d AS (
  SELECT user_id, epoch_us(CAST(CAST(ts AS DATE) AS TIMESTAMP)) AS day_us,
         sum(value) AS y
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT user_id, list(y ORDER BY day_us) AS ys
  FROM d GROUP BY user_id
),
s2 AS (SELECT user_id, ys, len(ys) AS n FROM s WHERE len(ys) >= 3),
walk AS (
  SELECT user_id, ys, n, 2 AS i,
         ys[2] AS l, ys[2] - ys[1] AS b
  FROM s2
  UNION ALL
  SELECT user_id, ys, n, i + 1,
         {_HOLT_A!r} * ys[i + 1] + {1 - _HOLT_A!r} * (l + b) AS l,
         {_HOLT_B!r} * (({_HOLT_A!r} * ys[i + 1] + {1 - _HOLT_A!r} * (l + b)) - l)
           + {1 - _HOLT_B!r} * b AS b
  FROM walk WHERE i < n
)
SELECT user_id, CAST(n AS BIGINT) AS n_days,
       round(l, 4) AS level, round(b, 4) AS trend,
       round(l + {_HOLT_H} * b, 4) AS forecast_h7
FROM walk WHERE i = n
""",
)
def ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C186: Holt linear-trend (double exponential) smoothing per user
    over the daily-sum series — the trend-aware sibling of the EWMA
    smoother (C-family ts_ewma_halflife) and the level+trend state
    behind short-horizon forecasting (Holt 1957):

      l_t = a*y_t + (1-a)(l_{{t-1}} + b_{{t-1}})
      b_t = B(l_t - l_{{t-1}}) + (1-B) b_{{t-1}}

    initialized l_2 = y_2, b_2 = y_2 - y_1, forecast y^ = l_T + h*b_T.
    A recursion no window frame can express: spelled as an IN-ROW
    aggregate() fold over the user's day-ordered series (<= 31
    elements — calendar-bounded), with the identical recursion
    replayed by the oracle as a recursive CTE.

    Determinism: a = 0.5 and B = 0.25 are exact binary fractions; the
    day sums carry only group-sum order noise (~1e-13 relative), the
    branch-free fold cannot amplify it (contraction), and both engines
    fold in identical day order — r4 sits ~7 orders above the noise.

    Scale: one map-side-combined day aggregate, one per-user
    collect_list bounded by the calendar, zero Python, no window at
    all (the fold IS the state machine)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        (ev_us() - ev_us() % 86_400_000_000).alias("day_us"),
        "value",
    )
    d = ev.groupBy("user_id", "day_us").agg(F.sum("value").alias("y"))
    s = d.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(named_struct"
            "('day_us', day_us, 'y', y))), e -> e.y)"
        ).alias("ys")
    ).filter(F.size("ys") >= 3)
    a, b1 = repr(_HOLT_A), repr(1 - _HOLT_A)
    bb, b2 = repr(_HOLT_B), repr(1 - _HOLT_B)
    fold = f"""
aggregate(
  slice(ys, 3, size(ys) - 2),
  named_struct('l', ys[1], 'b', ys[1] - ys[0]),
  (st, y) -> named_struct(
    'l', {a} * y + {b1} * (st.l + st.b),
    'b', {bb} * (({a} * y + {b1} * (st.l + st.b)) - st.l) + {b2} * st.b))
"""
    out = s.select(
        "user_id",
        F.size("ys").cast("bigint").alias("n_days"),
        F.expr(fold).alias("st"),
    )
    return out.select(
        "user_id",
        "n_days",
        r4(F.col("st.l")).alias("level"),
        r4(F.col("st.b")).alias("trend"),
        r4(F.col("st.l") + _HOLT_H * F.col("st.b")).alias("forecast_h7"),
    )


# Holt-Winters additive smoothing params — exact binary fractions so
# the only inexactness anywhere is the init means' division by 7/49
# (ONE IEEE op, identical text both engines)
_HW_A = 0.5    # level (alpha)
_HW_B = 0.25   # trend (beta)
_HW_G = 0.25   # seasonal (gamma)
_HW_M = 7      # weekly season over the daily series

_HW_ORACLE = f"""
WITH RECURSIVE d AS (
  SELECT user_id, epoch_us(CAST(CAST(ts AS DATE) AS TIMESTAMP)) AS day_us,
         sum(value) AS y
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT user_id, list(y ORDER BY day_us) AS ys
  FROM d GROUP BY user_id
),
s2 AS (SELECT user_id, ys, len(ys) AS n FROM s WHERE len(ys) >= 15),
ini AS (
  SELECT user_id, ys, n,
         (ys[1]+ys[2]+ys[3]+ys[4]+ys[5]+ys[6]+ys[7]) / 7 AS l0
  FROM s2
),
ini2 AS (
  SELECT user_id, ys, n, l0,
         ((ys[8]-ys[1])+(ys[9]-ys[2])+(ys[10]-ys[3])+(ys[11]-ys[4])
          +(ys[12]-ys[5])+(ys[13]-ys[6])+(ys[14]-ys[7])) / 49 AS b0,
         [ys[1]-l0, ys[2]-l0, ys[3]-l0, ys[4]-l0,
          ys[5]-l0, ys[6]-l0, ys[7]-l0] AS s0
  FROM ini
),
walk AS (
  SELECT user_id, ys, n, 8 AS i, l0 AS l, b0 AS b, s0 AS s FROM ini2
  UNION ALL
  SELECT user_id, ys, n, i + 1,
    {_HW_A!r} * (ys[i] - s[((i - 1) % 7) + 1])
      + {1 - _HW_A!r} * (l + b) AS l,
    {_HW_B!r} * (({_HW_A!r} * (ys[i] - s[((i - 1) % 7) + 1])
                  + {1 - _HW_A!r} * (l + b)) - l) + {1 - _HW_B!r} * b AS b,
    list_slice(s, 1, ((i - 1) % 7) + 1 - 1)
      || [{_HW_G!r} * (ys[i] - ({_HW_A!r} * (ys[i] - s[((i - 1) % 7) + 1])
                                + {1 - _HW_A!r} * (l + b)))
          + {1 - _HW_G!r} * s[((i - 1) % 7) + 1]]
      || list_slice(s, ((i - 1) % 7) + 1 + 1, 7) AS s
  FROM walk WHERE i <= n
)
SELECT user_id, CAST(n AS BIGINT) AS n_days,
       round(l, 4) AS level, round(b, 4) AS trend,
       round(l + b + s[(n % 7) + 1], 4) AS forecast_h1,
       round(list_max(s) - list_min(s), 4) AS seasonal_range
FROM walk WHERE i = n + 1
"""


@query("ts_holt_winters", oracle=_HW_ORACLE)
def ts_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOLT-WINTERS ADDITIVE (triple exponential) smoothing per user
    over the daily-sum series with a weekly season (m=7) — the
    seasonal extension of ts_holt_linear/C186 (Winters 1960):

      l_t = a(y_t - s_{{t-m}}) + (1-a)(l_{{t-1}} + b_{{t-1}})
      b_t = B(l_t - l_{{t-1}}) + (1-B) b_{{t-1}}
      s_t = G(y_t - l_t) + (1-G) s_{{t-m}}

    init (Hyndman's heuristic, made the explicit contract): l_0 =
    mean(y_1..y_7), b_0 = mean of the 7 week-over-week differences /7,
    s_j = y_j - l_0; the recursion runs t = 8..n. Output: final
    level/trend, the h=1 forecast l+b+s_next, and the seasonal RANGE
    max(s)-min(s) — the weekly-seasonality amplitude a mixture/
    freshness scheduler keys on.

    Same iterative-exact machinery as Holt/C186: the recursion is an
    IN-ROW aggregate() fold carrying (l, b, s[7], i) over the
    calendar-bounded day array — no window frame can express it, and
    no shuffle runs it (the fold IS the state machine) — replayed by
    the oracle as a recursive CTE with character-identical arithmetic
    (a=0.5, B=G=0.25 exact binary fractions; convex-combination
    updates are contractions, so the day-sum group-order noise
    ~1e-13 cannot amplify; r4 sits orders above).

    Scale: one map-side-combined day aggregate, one per-user bounded
    collect_list, zero Python, zero windows."""
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        (ev_us() - ev_us() % 86_400_000_000).alias("day_us"),
        "value",
    )
    d = ev.groupBy("user_id", "day_us").agg(F.sum("value").alias("y"))
    s = (
        d.groupBy("user_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(named_struct"
                "('day_us', day_us, 'y', y))), e -> e.y)"
            ).alias("ys")
        )
        .filter(F.size("ys") >= 15)
    )
    # staged init columns (multi-use aliases survive CollapseProject)
    s = s.withColumn(
        "l0",
        F.expr("(ys[0]+ys[1]+ys[2]+ys[3]+ys[4]+ys[5]+ys[6]) / 7"),
    ).withColumn(
        "b0",
        F.expr(
            "((ys[7]-ys[0])+(ys[8]-ys[1])+(ys[9]-ys[2])+(ys[10]-ys[3])"
            "+(ys[11]-ys[4])+(ys[12]-ys[5])+(ys[13]-ys[6])) / 49"
        ),
    ).withColumn(
        "s0",
        F.expr(
            "array(ys[0]-l0, ys[1]-l0, ys[2]-l0, ys[3]-l0,"
            " ys[4]-l0, ys[5]-l0, ys[6]-l0)"
        ),
    )
    a, a1 = repr(_HW_A), repr(1 - _HW_A)
    bb, b1 = repr(_HW_B), repr(1 - _HW_B)
    g, g1 = repr(_HW_G), repr(1 - _HW_G)
    # inside the lambda: t = st.i (1-based math), y = the folded value,
    # seasonal slot j = ((t-1) % 7) + 1 (1-based element_at)
    so = "element_at(st.s, CAST(((st.i - 1) % 7) + 1 AS INT))"
    lnew = f"{a} * (y - {so}) + {a1} * (st.l + st.b)"
    fold = f"""
aggregate(
  slice(ys, 8, size(ys) - 7),
  named_struct('l', l0, 'b', b0, 's', s0, 'i', 8),
  (st, y) -> named_struct(
    'l', {lnew},
    'b', {bb} * (({lnew}) - st.l) + {b1} * st.b,
    's', concat(
      slice(st.s, 1, ((st.i - 1) % 7) + 1 - 1),
      array({g} * (y - ({lnew})) + {g1} * {so}),
      slice(st.s, ((st.i - 1) % 7) + 1 + 1, CAST(7 - (((st.i - 1) % 7) + 1) AS INT))),
    'i', st.i + 1))
"""
    out = s.select(
        "user_id",
        F.size("ys").cast("bigint").alias("n_days"),
        F.size("ys").alias("n"),
        F.expr(fold).alias("st"),
    )
    return out.select(
        "user_id",
        "n_days",
        r4(F.col("st.l")).alias("level"),
        r4(F.col("st.b")).alias("trend"),
        r4(
            F.col("st.l")
            + F.col("st.b")
            + F.expr("element_at(st.s, CAST((n % 7) + 1 AS INT))")
        ).alias("forecast_h1"),
        r4(F.expr("array_max(st.s) - array_min(st.s)")).alias("seasonal_range"),
    )


# ---------------------------------------------------------------------------
# C207: periodogram at candidate periods — the cycle DETECTOR beside
# the cycle exploiters (ts_seasonal_profile assumes 24h;
# ts_seasonal_strength measures a KNOWN season): relative DFT power
# of the hourly event-count series at periods {6,8,12,24,48}h per
# event type, the Schuster periodogram restricted to a fixed
# hypothesis grid (the production shape: you scan a handful of
# physically plausible cycles, not N/2 bins).

_PGRAM_PERIODS = (6, 8, 12, 24, 48)
_PGRAM_Q = 1_000_000  # per-term trig quantization grid


@query(
    "ts_periodogram_dft",
    oracle=f"""
WITH hr AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), per AS (SELECT unnest([{", ".join(str(p) for p in _PGRAM_PERIODS)}]) AS p),
s AS (
  SELECT event_type, p,
         sum(x * CAST(floor(cos(2 * pi() * (h % p) / p) * {_PGRAM_Q} + 0.5)
                      AS BIGINT)) AS sc,
         sum(x * CAST(floor(sin(2 * pi() * (h % p) / p) * {_PGRAM_Q} + 0.5)
                      AS BIGINT)) AS ss,
         sum(x) AS sx
  FROM hr CROSS JOIN per GROUP BY 1, 2
)
SELECT event_type, CAST(p AS BIGINT) AS period_hours,
       round(((CAST(sc AS DOUBLE) / {_PGRAM_Q}) * (CAST(sc AS DOUBLE) / {_PGRAM_Q})
             + (CAST(ss AS DOUBLE) / {_PGRAM_Q}) * (CAST(ss AS DOUBLE) / {_PGRAM_Q}))
             / (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 4) AS power_rel
FROM s
""",
)
def ts_periodogram_dft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C207: Schuster periodogram at a fixed period grid. For period
    P the phase of hour h is 2*pi*(h mod P)/P — the mod keeps the
    trig argument on a FINITE value set (< P distinct angles), exact
    from integer hour indices on both engines. Relative power =
    ((sum x*cos)^2 + (sum x*sin)^2) / (sum x)^2: near 0 for white
    series, O(amplitude^2) at a genuinely periodic one.

    Determinism: each trig factor quantizes to a 1e-6 integer BEFORE
    the multiply-accumulate (x is already an integer count), so both
    Fourier sums are order-free exact BIGINTs; the power is a handful
    of IEEE ops on identical operands + r4. Builtin cos/sin agree on
    the finite angle set (spatial_shoelace_area precedent).

    Scale: the hourly rollup is the bounded aggregate (|types| x span
    hours); the DFT pass is a |grid|-fold replication of THAT, never
    of the raw events — map-side combined, no window, no sort."""
    hr = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.expr("unix_micros(ts) DIV 3600000000").alias("h"),
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    per = spark.createDataFrame(
        [(p,) for p in _PGRAM_PERIODS], "p int"
    )
    q = _PGRAM_Q
    s = (
        hr.crossJoin(F.broadcast(per))
        .groupBy("event_type", "p")
        .agg(
            F.sum(
                F.col("x")
                * F.expr(
                    f"CAST(floor(cos(2 * pi() * (h % p) / p) * {q} + 0.5) AS BIGINT)"
                )
            ).alias("sc"),
            F.sum(
                F.col("x")
                * F.expr(
                    f"CAST(floor(sin(2 * pi() * (h % p) / p) * {q} + 0.5) AS BIGINT)"
                )
            ).alias("ss"),
            F.sum("x").alias("sx"),
        )
    )
    sc, ss, sx = (F.col(c).cast("double") for c in ("sc", "ss", "sx"))
    return s.select(
        "event_type",
        F.col("p").cast("bigint").alias("period_hours"),
        r4(
            ((sc / q) * (sc / q) + (ss / q) * (ss / q)) / (sx * sx)
        ).alias("power_rel"),
    )


# ---------------------------------------------------------------------------
# C218: Markov removal-effect attribution (Anderl et al. 2016) — the
# data-driven multi-touch model beside last-touch (C131): build the
# first-order journey chain (START -> touches -> CONV/NULL), compute
# absorption probability by fixed-point iteration IN-ROW over the
# bounded state grid, and credit each touch type by its removal
# effect (conversion probability lost when the state routes to NULL).

_MK_TOUCHES = ("click", "view", "signup")
_MK_ITERS = 40


def _mk_step(engine: str, removed: str | None) -> str:
    """One fixed-point step x' = b + Q x as an in-row array expr.
    acc[i] = P(convert | in touch state i); removing a state pins its
    component to 0 (its conversions are lost — the removal-effect
    convention). Identical arithmetic text on both engines modulo
    array base."""
    base = 0 if engine == "spark" else 1

    def comp(t: str) -> str:
        if t == removed:
            return "CAST(0 AS DOUBLE)"
        terms = [f"p_{t[0]}_K"]
        for j, u in enumerate(_MK_TOUCHES):
            terms.append(f"p_{t[0]}_{u[0]} * acc[{base + j}]")
        return " + ".join(terms)

    inner = ", ".join(comp(t) for t in _MK_TOUCHES)
    if engine == "spark":
        return (
            f"aggregate(sequence(1, {_MK_ITERS}), "
            f"array(CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)), "
            f"(acc, i) -> array({inner}))"
        )
    return (
        f"list_reduce([[CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)]]"
        f" || list_transform(range({_MK_ITERS}), "
        f"i -> [CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)]), "
        f"(acc, x) -> [{inner}])"
    )


def _mk_pconv(engine: str, vec: str) -> str:
    base = 0 if engine == "spark" else 1
    terms = ["p_st_K"] + [
        f"p_st_{u[0]} * {vec}[{base + j}]" for j, u in enumerate(_MK_TOUCHES)
    ]
    return " + ".join(terms)


def _mk_pivot_cols() -> list[tuple[str, str, str]]:
    """(colname, from_state, to_state) for the 16 needed scalars."""
    cols = []
    froms = [("st", "START")] + [(t[0], t) for t in _MK_TOUCHES]
    tos = [(t[0], t) for t in _MK_TOUCHES] + [("K", "CONV")]
    for fa, fs in froms:
        for ta, ts in tos:
            cols.append((f"p_{fa}_{ta}", fs, ts))
    return cols


_MK_JOURNEY_SQL = """
WITH ev AS (
  SELECT user_id, {T} AS t, event_id,
         CASE WHEN event_type = 'purchase' THEN 'CONV' ELSE event_type END
           AS state
  FROM events
  WHERE event_type IN ('click', 'view', 'signup', 'purchase')
), flagged AS (
  SELECT *,
         count(CASE WHEN state = 'CONV' THEN 1 END)
           OVER (PARTITION BY user_id ORDER BY t, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_conv
  FROM ev
), kept AS (
  SELECT user_id, t, event_id, state FROM flagged
  WHERE prev_conv IS NULL OR prev_conv = 0
), hops AS (
  SELECT coalesce(lag(state) OVER (PARTITION BY user_id
                                   ORDER BY t, event_id), 'START') AS f,
         state AS tos
  FROM kept
), terminal AS (
  SELECT last_state AS f, 'NULL' AS tos
  FROM (SELECT {LASTAGG} AS last_state FROM kept GROUP BY user_id)
  WHERE last_state <> 'CONV'
), trans AS (
  SELECT f, tos, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT * FROM hops UNION ALL SELECT * FROM terminal)
  GROUP BY f, tos
), tot AS (SELECT f, sum(n) AS fn FROM trans GROUP BY f),
probs AS (
  SELECT trans.f, trans.tos,
         CAST(trans.n AS DOUBLE) / CAST(tot.fn AS DOUBLE) AS p
  FROM trans JOIN tot ON trans.f = tot.f
), piv AS (
  SELECT {PIVOTS} FROM probs
)
"""


def _mk_journey(engine: str) -> str:
    pivots = ", ".join(
        f"coalesce(sum(CASE WHEN f = '{fs}' AND tos = '{ts}' THEN p END), 0)"
        f" AS {col}"
        for col, fs, ts in _mk_pivot_cols()
    )
    if engine == "spark":
        t = "unix_micros(ts)"
        lastagg = "max_by(state, named_struct('t', t, 'e', event_id))"
    else:
        t = "epoch_us(ts)"
        # struct max orders by (t, e); (t, e) is unique per user so the
        # trailing state field never decides
        lastagg = "(max({'t': t, 'e': event_id, 's': state})).s"
    return _MK_JOURNEY_SQL.format(T=t, LASTAGG=lastagg, PIVOTS=pivots)


def _mk_oracle() -> str:
    full = _mk_pconv("duck", _mk_step("duck", None))
    removed = ", ".join(
        f"{_mk_pconv('duck', _mk_step('duck', t))} AS p_rm_{t[0]}"
        for t in _MK_TOUCHES
    )
    rows = " UNION ALL ".join(
        f"SELECT '{t}' AS touch, p_full, p_rm_{t[0]} AS p_removed FROM chains"
        for t in _MK_TOUCHES
    )
    return (
        _mk_journey("duck")
        + f""",
chains AS (SELECT {full} AS p_full, {removed} FROM piv),
eff AS (
  SELECT touch, p_full, p_removed,
         (p_full - p_removed) / p_full AS re
  FROM ({rows})
), tot_eff AS (SELECT sum(re) AS se FROM eff)
SELECT touch,
       round(p_full, 4) AS p_conversion,
       round(p_removed, 4) AS p_without_touch,
       round(re, 4) AS removal_effect,
       round(re / tot_eff.se, 4) AS attribution_share
FROM eff CROSS JOIN tot_eff
"""
    )


@query("analytics_attribution_markov", oracle=_mk_oracle())
def analytics_attribution_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C218: Markov-chain (removal-effect) attribution. Journeys =
    per-user event sequences truncated at the first purchase; the
    first-order chain START -> {{click, view, signup}} -> CONV/NULL is
    estimated from transition counts, and P(conversion) solved by
    {it} fixed-point iterations x' = b + Qx IN-ROW over the bounded
    3-state grid (contraction: every state leaks to CONV/NULL, so 40
    rounds land far below the r4 grid). Removing a touch pins its
    component to 0 — the mass that converted THROUGH it is lost — and
    its attribution share is its normalized removal effect: the
    data-driven counterpart of last-touch (C131).

    Scale: journey building is two user-partitioned windows + one
    |states|^2 aggregate; the chain solve is arithmetic on ONE row.
    Determinism: every transition prob is one division of exact
    counts; the fold is identical expression text on both engines
    (bit-identical doubles end to end), r4 at the edges.""".format(
        it=_MK_ITERS
    )
    ev = (
        table(spark, sf_dir, "events")
        .filter(
            F.col("event_type").isin("click", "view", "signup", "purchase")
        )
        .select(
            "user_id",
            ev_us(F.col("ts")).alias("t"),
            "event_id",
            F.when(F.col("event_type") == "purchase", "CONV")
            .otherwise(F.col("event_type"))
            .alias("state"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    flagged = ev.withColumn(
        "prev_conv",
        F.count(F.when(F.col("state") == "CONV", 1)).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
    )
    kept = flagged.filter(
        F.col("prev_conv").isNull() | (F.col("prev_conv") == 0)
    ).select("user_id", "t", "event_id", "state")
    hops = kept.select(
        F.coalesce(F.lag("state").over(w), F.lit("START")).alias("f"),
        F.col("state").alias("tos"),
    )
    terminal = (
        kept.groupBy("user_id")
        .agg(
            F.expr(
                "max_by(state, named_struct('t', t, 'e', event_id))"
            ).alias("last_state")
        )
        .filter(F.col("last_state") != "CONV")
        .select(F.col("last_state").alias("f"), F.lit("NULL").alias("tos"))
    )
    trans = (
        hops.unionAll(terminal)
        .groupBy("f", "tos")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = trans.groupBy("f").agg(F.sum("n").alias("fn"))
    probs = trans.join(tot, "f").select(
        "f", "tos",
        (F.col("n").cast("double") / F.col("fn").cast("double")).alias("p"),
    )
    piv = probs.agg(
        *[
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("f") == fs) & (F.col("tos") == ts), F.col("p")
                    )
                ),
                F.lit(0.0),
            ).alias(col)
            for col, fs, ts in _mk_pivot_cols()
        ]
    )
    full = _mk_pconv("spark", _mk_step("spark", None))
    chains = piv.selectExpr(
        f"{full} AS p_full",
        *[
            f"{_mk_pconv('spark', _mk_step('spark', t))} AS p_rm_{t[0]}"
            for t in _MK_TOUCHES
        ],
    )
    eff = chains.select(
        F.explode(
            F.expr(
                "array("
                + ", ".join(
                    f"named_struct('touch', '{t}', 'p_full', p_full, "
                    f"'p_removed', p_rm_{t[0]})"
                    for t in _MK_TOUCHES
                )
                + ")"
            )
        ).alias("e")
    ).select(
        F.col("e.touch").alias("touch"),
        F.col("e.p_full").alias("p_full"),
        F.col("e.p_removed").alias("p_removed"),
        (
            (F.col("e.p_full") - F.col("e.p_removed")) / F.col("e.p_full")
        ).alias("re"),
    )
    tot_eff = eff.agg(F.sum("re").alias("se"))
    return eff.crossJoin(F.broadcast(tot_eff)).select(
        "touch",
        r4(F.col("p_full")).alias("p_conversion"),
        r4(F.col("p_removed")).alias("p_without_touch"),
        r4(F.col("re")).alias("removal_effect"),
        r4(F.col("re") / F.col("se")).alias("attribution_share"),
    )


# ---------------------------------------------------------------------------
# C228: Hurst exponent via rescaled-range analysis (Hurst 1951;
# Mandelbrot-Wallis R/S) — the LONG-RANGE-dependence scalar beside
# the short-memory diagnostics (ts_autocorrelation C96,
# ts_burstiness C164): H ~ 0.5 random walk, > 0.5 persistent.

_HURST_SIZES = (8, 16, 32, 64)  # block sizes in hours
_HURST_Q = 1_000_000            # per-block R/S quantization grid


def _hurst_rs(engine: str) -> str:
    """In-row R/S of a dense integer count array ``xs`` (length m):
    mean-centered cumulative range over standard deviation; a fixed-
    index-order fold on both engines (km_dist discipline)."""
    if engine == "spark":
        # Single O(m) fold (optimization r12). The r11 spelling built
        # cum via per-prefix slices with the mean-aggregate INLINED in
        # the innermost lambda — O(m^3) interpreted HOF evaluations
        # per block, and cum evaluated twice (array_max + array_min):
        # ~500k lambda calls per m=64 block, 18.7 s at sf0.1. This
        # fold tracks the running deviation sum, its max/min, and the
        # squared-deviation sum in ONE pass with IDENTICAL IEEE op
        # order: cum_i is the same left-to-right chain of
        # double-additions of (x - mean); max/min over the same values
        # (exact regardless of order); s the same index-order sum of
        # (x - mean)^2. Bit-identical to the old spelling and to the
        # DuckDB oracle branch below.
        mean = "(CAST(aggregate(xs, 0L, (a, x) -> a + x) AS DOUBLE) / size(xs))"
        return (
            "aggregate("
            f"transform(xs, x -> CAST(x AS DOUBLE) - {mean}), "
            "named_struct("
            "'run', CAST(0 AS DOUBLE), "
            "'mx', CAST('-Infinity' AS DOUBLE), "
            "'mn', CAST('Infinity' AS DOUBLE), "
            "'s2', CAST(0 AS DOUBLE)), "
            "(st, d) -> named_struct("
            "'run', st.run + d, "
            "'mx', greatest(st.mx, st.run + d), "
            "'mn', least(st.mn, st.run + d), "
            "'s2', st.s2 + d * d), "
            "st -> CASE WHEN sqrt(st.s2 / size(xs)) = 0 THEN NULL "
            "ELSE (st.mx - st.mn) / sqrt(st.s2 / size(xs)) END"
            ")"
        )
    mean = "(CAST(list_sum(xs) AS DOUBLE) / len(xs))"
    cum = (
        "list_transform(range(1, len(xs) + 1), "
        f"i -> list_sum(list_transform(xs[1:i], x -> x - {mean})))"
    )
    r = f"(list_max({cum}) - list_min({cum}))"
    s = (
        f"sqrt(list_sum(list_transform(xs, x -> (x - {mean}) * (x - {mean})))"
        " / len(xs))"
    )
    return f"CASE WHEN {s} = 0 THEN NULL ELSE {r} / {s} END"


def _hurst_oracle() -> str:
    sizes = ", ".join(str(m) for m in _HURST_SIZES)
    return f"""
WITH hr AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
), bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM hr),
sz AS (SELECT unnest([{sizes}]) AS m),
blocks AS (
  SELECT hr.event_type, sz.m, hr.h // sz.m AS blk, hr.h, hr.x
  FROM hr CROSS JOIN sz CROSS JOIN bounds
  WHERE (hr.h // sz.m) * sz.m >= bounds.h0
    AND (hr.h // sz.m) * sz.m + sz.m - 1 <= bounds.h1
), dense AS (
  SELECT event_type, m, blk,
         list_transform(range(blk * m, blk * m + m),
           hh -> coalesce(map_extract(mp, hh)[1], 0)) AS xs
  FROM (
    SELECT event_type, m, blk,
           map_from_entries(list({{'k': h, 'v': x}})) AS mp
    FROM blocks GROUP BY event_type, m, blk
  )
), rsq AS (
  SELECT event_type, m,
         CAST(floor(({_hurst_rs("duck")}) * {_HURST_Q} + 0.5) AS BIGINT) AS rq
  FROM dense
), avgrs AS (
  SELECT event_type, m,
         CAST(sum(rq) AS DOUBLE) / (count(rq) * {_HURST_Q}.0) AS ars,
         CAST(count(rq) AS BIGINT) AS n_blocks
  FROM rsq WHERE rq IS NOT NULL GROUP BY event_type, m
), pts AS (
  SELECT event_type, ln(CAST(m AS DOUBLE)) AS lx, ln(ars) AS ly, n_blocks
  FROM avgrs
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_sizes,
       CAST(min(n_blocks) AS BIGINT) AS min_blocks,
       round((count(*) * sum(lx * ly) - sum(lx) * sum(ly))
             / (count(*) * sum(lx * lx) - sum(lx) * sum(lx)), 4) AS hurst_h
FROM pts GROUP BY event_type
"""


@query("ts_hurst_exponent", oracle=_hurst_oracle())
def ts_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C228: Hurst exponent per event type — average rescaled range
    R/S over complete non-overlapping blocks of {sz} hours, H = the
    log-log least-squares slope. The hourly rollup is the bounded
    aggregate; blocks densify IN-ROW (map_from_entries + a sequence
    fill, missing hours = 0 — the calendar-grid spelling), R/S is a
    fixed-order in-row fold, and each block's R/S quantizes to a 1e-6
    BIGINT before the per-(type, size) average so cross-block sums
    are order-free exact. The slope is closed-form over <= 4 points.

    Scale: one corpus pass to (type, hour), then per-block state
    never leaves its row; nothing global sorts. Blocks partial to
    S = 0 (constant) drop — the standard R/S treatment.""".format(
        sz=_HURST_SIZES
    )
    hr = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.expr("unix_micros(ts) DIV 3600000000").alias("h")
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    bounds = hr.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    sz = spark.createDataFrame([(m,) for m in _HURST_SIZES], "m long")
    blocks = (
        hr.crossJoin(F.broadcast(sz))
        .crossJoin(F.broadcast(bounds))
        .filter(
            (F.expr("(h DIV m) * m") >= F.col("h0"))
            & (F.expr("(h DIV m) * m + m - 1") <= F.col("h1"))
        )
        .select("event_type", "m", F.expr("h DIV m").alias("blk"), "h", "x")
    )
    dense = (
        blocks.groupBy("event_type", "m", "blk")
        .agg(
            F.expr(
                "map_from_entries(collect_list(named_struct('k', h, 'v', x)))"
            ).alias("mp")
        )
        .select(
            "event_type", "m", "blk",
            F.expr(
                "transform(sequence(blk * m, blk * m + m - 1), "
                "hh -> coalesce(element_at(mp, hh), CAST(0 AS BIGINT)))"
            ).alias("xs"),
        )
    )
    rsq = dense.select(
        "event_type", "m",
        F.expr(
            f"CAST(floor(({_hurst_rs('spark')}) * {_HURST_Q} + 0.5) AS BIGINT)"
        ).alias("rq"),
    )
    avgrs = (
        rsq.filter(F.col("rq").isNotNull())
        .groupBy("event_type", "m")
        .agg(
            (
                F.sum("rq").cast("double")
                / (F.count("rq") * F.lit(float(_HURST_Q)))
            ).alias("ars"),
            F.count("rq").cast("bigint").alias("n_blocks"),
        )
    )
    pts = avgrs.select(
        "event_type",
        F.log(F.col("m").cast("double")).alias("lx"),
        F.log("ars").alias("ly"),
        "n_blocks",
    )
    n = F.count(F.lit(1))
    return pts.groupBy("event_type").agg(
        n.cast("bigint").alias("n_sizes"),
        F.min("n_blocks").cast("bigint").alias("min_blocks"),
        r4(
            (n * F.sum(F.col("lx") * F.col("ly")) - F.sum("lx") * F.sum("ly"))
            / (n * F.sum(F.col("lx") * F.col("lx")) - F.sum("lx") * F.sum("lx"))
        ).alias("hurst_h"),
    )


# r12 C249: LTTB-style series downsampling (Steinarsson 2013,
# bucket-average-anchor variant) — the visualization/feature
# downsampler beside M4/OHLC (ts_ohlc_downsample keeps the envelope;
# LTTB keeps the POINT per bucket that preserves the series' visual
# shape, the standard choice for plotting million-point series).
# Per hourly bucket, pick the point maximizing the triangle area
# against the neighbor buckets' mean points — the parallel LTTB
# spelling (anchoring on neighbor AVERAGES instead of the previously
# selected point removes the sequential chain; Steinarsson §4.2).
# Determinism: values are e4-quantized to exact integers, so bucket
# means are ONE IEEE division of exact BIGINTs and the area is a
# fixed IEEE chain — the 1e-6-quantized argmax key is bit-identical
# cross-engine (the ml_decision_stump precedent), tie-broken by
# event_id under a PARTITIONED window.

_LTTB_HOUR_US = 3_600_000_000


def _lttb_sql(epoch: str, idiv: str) -> str:
    ybar = "(CAST({t}.sq AS DOUBLE) / CAST({t}.n AS DOUBLE) / 10000)"
    ya, yb = ybar.format(t="a"), ybar.format(t="b")
    yp = "(CAST(p.vq AS DOUBLE) / 10000)"
    xp = f"(CAST(p.t AS DOUBLE) / CAST({_LTTB_HOUR_US} AS DOUBLE))"
    xa = "(CAST(p.k AS DOUBLE) - 0.5)"
    return f"""
WITH pts AS (
  SELECT event_id, {epoch} AS t,
         CAST(round(value * 10000, 0) AS BIGINT) AS vq,
         {epoch} {idiv} {_LTTB_HOUR_US} AS k
  FROM events
), avgs AS (
  SELECT k, CAST(sum(vq) AS BIGINT) AS sq, CAST(count(*) AS BIGINT) AS n
  FROM pts GROUP BY k
), tri AS (
  SELECT p.k, p.event_id, p.vq,
         CAST(round(abs(
           (-2.0) * ({yp} - {ya})
           - ({xa} - {xp}) * ({yb} - {ya})
         ) / 2 * 1000000, 0) AS BIGINT) AS area_q
  FROM pts p
  JOIN avgs a ON a.k = p.k - 1
  JOIN avgs b ON b.k = p.k + 1
), pick AS (
  SELECT k, event_id, vq, area_q,
         row_number() OVER (PARTITION BY k
                            ORDER BY area_q DESC, event_id ASC) AS rn
  FROM tri
)
SELECT CAST(k AS BIGINT) AS bucket_idx, event_id,
       round(CAST(vq AS DOUBLE) / 10000, 4) AS value, area_q
FROM pick WHERE rn = 1
"""


@query("ts_downsample_lttb", oracle=_lttb_sql("epoch_us(ts)", "//"))
def ts_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C249: largest-triangle downsampling, one representative point
    per hourly bucket (parallel LTTB: triangle anchors are the
    neighbor buckets' mean points, so every bucket selects
    independently — no sequential chain, Steinarsson 2013 §4.2; edge
    buckets without both neighbors are excluded, matching LTTB's
    keep-first/last convention handled by the caller). e4-quantized
    values make bucket means one IEEE division of exact integers; the
    area argmax key is 1e-6-quantized and tie-broken by event_id, so
    the selection is bit-identical cross-engine.

    Scale: ONE shuffle on the bucket key shared by the mean aggregate
    and the (k-1, k+1) self-joins (dense integer keys, no skew); the
    argmax window is PARTITIONED per bucket — never a global sort."""
    from ..tables import sql_over

    return sql_over(
        spark, sf_dir, _lttb_sql("unix_micros(ts)", "div"), ("events",)
    )


# r12 C253: time-decay attribution — completes the attribution trio
# (C131 last-touch, C218 Markov removal-effect): every click/view in
# the 7 days before a purchase earns weight 2^-(gap_days), normalized
# per purchase. The weight base is TWO on integer day gaps, so every
# w is an exact power of two, every per-purchase weight sum is an
# exact multiple of 2^-7 (order-independent even as a float window
# sum — all partial sums are exactly representable), and the only
# noise-bearing ops are the final per-group share sums, absorbed by
# the §5.3.1 rounding discipline.


def _timedecay_sql(epoch: str, idiv: str) -> str:
    return f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, value,
         {epoch} {idiv} 86400000000 AS day
  FROM events
), p AS (
  SELECT * FROM ev WHERE event_type = 'purchase'
), t AS (
  SELECT * FROM ev WHERE event_type IN ('click', 'view')
), touch AS (
  SELECT p.event_id AS p_id, p.value AS p_value, t.event_type AS touch_type,
         power(2.0, -CAST(p.day - t.day AS DOUBLE)) AS w
  FROM p JOIN t ON t.user_id = p.user_id
  WHERE p.day - t.day >= 0 AND p.day - t.day <= 7
    AND (t.day < p.day OR t.event_id < p.event_id)
), norm AS (
  SELECT p_id, p_value, touch_type, w,
         sum(w) OVER (PARTITION BY p_id) AS wsum
  FROM touch
)
SELECT touch_type,
       CAST(count(*) AS BIGINT) AS n_touches,
       round(sum(w / wsum), 6) AS credit_share_total,
       round(sum(p_value * w / wsum), 4) AS attributed_revenue
FROM norm GROUP BY touch_type
"""


@query(
    "analytics_attribution_time_decay",
    oracle=_timedecay_sql("epoch_us(ts)", "//"),
)
def analytics_attribution_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C253: time-decay multi-touch attribution — credit every
    click/view in the 7-day lookback before a purchase by
    2^-(gap_days), normalized per purchase (the standard geometric
    decay between last-touch's all-or-nothing and Markov's
    model-based shares). Same-day touches qualify by event-id order —
    a deterministic tie rule both engines apply identically.

    Determinism: integer day gaps make every weight an exact power of
    two, so the per-purchase window sum is exact in ANY summation
    order (all partials are multiples of 2^-7 well inside 53 bits) —
    the share division is then one identical IEEE op; only the final
    per-channel sums carry last-ulp noise, absorbed by round 6/4
    (§5.3.1 magnitude check passes at sf1).

    Scale: the touch join is equi on user_id with a +/-7-day residual
    (key-bounded, the C247 discussion); the normalization window is
    PARTITIONED by purchase; the final aggregate is 2 rows."""
    from ..tables import sql_over

    return sql_over(
        spark, sf_dir, _timedecay_sql("unix_micros(ts)", "div"), ("events",)
    )


# r12 C255: classical seasonal decomposition (additive, centered-MA
# trend) — the textbook decomposition (Hyndman FPP3 §3.3) that
# ts_seasonal_strength only runs as an internal mean-based
# approximation: trend = centered 24-term moving average with
# half-weights at the ends (the even-period spelling), seasonal =
# hour-of-day mean of the detrended series. Exactness: the hourly
# series is a sum of e4-quantized values (exact BIGINT), and the
# weighted 25-term window folds to T2 = S23 + S25 (both plain frame
# sums of exact integers: y[-12]+y[+12] = S25-S23, so
# 2*S23 + (S25-S23) = S23+S25) — trend is ONE IEEE division by 48e4,
# the 48e4-scaled detrended residual stays an exact BIGINT, and each
# seasonal index is ONE more IEEE division. Bit-identical at any SF.


def _decomp_sql(epoch: str, idiv: str) -> str:
    return f"""
WITH hourly AS (
  SELECT {epoch} {idiv} 3600000000 AS h,
         CAST(sum(CAST(round(value * 10000, 0) AS BIGINT)) AS BIGINT) AS yq
  FROM events
  GROUP BY {epoch} {idiv} 3600000000
), win AS (
  SELECT h, yq,
         CAST(sum(yq) OVER (ORDER BY h
              ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS BIGINT) AS s25,
         CAST(sum(yq) OVER (ORDER BY h
              ROWS BETWEEN 11 PRECEDING AND 11 FOLLOWING) AS BIGINT) AS s23,
         count(*) OVER (ORDER BY h
              ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS c25
  FROM hourly
), det AS (
  -- 48x-scaled detrended residual: 48*y - T2, T2 = s23 + s25 (exact)
  SELECT h % 24 AS hod, CAST(48 * yq - (s23 + s25) AS BIGINT) AS dev48
  FROM win WHERE c25 = 25
)
SELECT CAST(hod AS BIGINT) AS hour_of_day,
       CAST(count(*) AS BIGINT) AS n_hours,
       round(CAST(sum(dev48) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) / 480000, 6) AS seasonal,
       round(CAST(min(dev48) AS DOUBLE) / 480000, 6) AS min_detrended,
       round(CAST(max(dev48) AS DOUBLE) / 480000, 6) AS max_detrended
FROM det GROUP BY hod
"""


@query("ts_decompose_classical", oracle=_decomp_sql("epoch_us(ts)", "//"))
def ts_decompose_classical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C255: classical additive decomposition of the hourly value
    series — centered 24-term MA trend (half-weighted ends, the
    even-period textbook form) and the 24 hour-of-day seasonal
    indices of the detrended series. Every step up to the two final
    divisions is exact BIGINT arithmetic on the e4-quantized hourly
    sums (the weighted MA folds to S23+S25 — see the builder comment),
    so the decomposition is bit-identical cross-engine.

    Scale: the only fact-sized pass is the hourly rollup (map-side
    combined); the MA windows run over the CALENDAR-BOUNDED hourly
    table (720 rows at every fixture SF — time span, not data size,
    bounds it; years of data are ~1e5 rows, one task), and the
    seasonal aggregate is 24 groups."""
    from ..tables import sql_over

    return sql_over(
        spark, sf_dir, _decomp_sql("unix_micros(ts)", "div"), ("events",)
    )


# r12 C268: Haar wavelet decomposition — the multi-resolution energy
# profile of the hourly event-count series (which timescale carries
# the variance: hour-to-hour noise vs day-scale structure vs
# week-scale drift). Unnormalized integer Haar (approx = pair sum,
# detail = pair difference) keeps EVERY coefficient an exact BIGINT
# through all 9 levels of the 512-hour dyadic window, so per-level
# detail energies are exact integers — no floating point anywhere.
# Largest term bound: an sf1 hour holds ~1e4 events, a level-9
# approx <= 5e6, its square 2.6e13, times <=256 coefficients ~ 6e15
# < 2^63 (and < 2^53 only matters for doubles, which never appear).


def _haar_sql(epoch: str, idiv: str, gen512: str) -> str:
    parts = [f"""
WITH ev AS (
  SELECT {epoch} {idiv} {_HOUR_US} AS k FROM events
), b AS (
  SELECT min(k) AS k0 FROM ev
), cnt AS (
  SELECT CAST(k - k0 AS BIGINT) AS i, CAST(count(1) AS BIGINT) AS v
  FROM ev CROSS JOIN b WHERE k - k0 < 512 GROUP BY k - k0
), a0 AS (
  SELECT g.i, coalesce(c.v, 0) AS v, CAST(0 AS BIGINT) AS d
  FROM ({gen512}) g LEFT JOIN cnt c ON c.i = g.i
)"""]
    for lv in range(1, 10):
        parts.append(f""",
a{lv} AS (
  SELECT CAST(i {idiv} 2 AS BIGINT) AS i,
         CAST(sum(v) AS BIGINT) AS v,
         CAST(sum(CASE WHEN i % 2 = 0 THEN v ELSE -v END) AS BIGINT) AS d
  FROM a{lv - 1} GROUP BY i {idiv} 2
)""")
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({lv} AS BIGINT) AS level,"
        f" CAST(count(1) AS BIGINT) AS n_coeffs,"
        f" CAST(sum(d * d) AS BIGINT) AS detail_energy,"
        f" CAST(max(abs(d)) AS BIGINT) AS max_abs_detail,"
        f" CAST(max(v) AS BIGINT) AS max_approx"
        f" FROM a{lv}"
        for lv in range(1, 10)
    )
    parts.append("\n" + rows)
    return "".join(parts)


_HAAR_GEN_DUCK = "SELECT unnest(generate_series(0, 511)) AS i"
_HAAR_GEN_SPARK = "SELECT explode(sequence(0, 511)) AS i"


def _haar_spark_array_sql() -> str:
    """Spark-side Haar spelling: the whole 9-level pyramid as array
    HOFs over ONE collected 512-element row (optimization r12).

    The relational spelling (_haar_sql — kept verbatim as the DuckDB
    oracle) chains nine halving GROUP BYs and UNION ALLs nine
    per-level aggregates; Spark inlines deterministic CTEs at every
    reference, so each union leg re-executed its whole prefix chain —
    the plan held 18 scans of events and 180 Exchanges. Here the
    hourly rollup runs ONCE, the dense 512-vector is assembled as one
    map (unique group-by keys -> deterministic), every level is a
    transform() on the previous level's array inside a single
    projection, and inline() emits the nine stat rows — 1 scan of
    events + the min-hour pass, zero mid-plan exchanges.

    Exactness: identical BIGINT arithmetic — pair sum v[2j]+v[2j+1]
    and difference v[2j]-v[2j+1] are the old leg's sum(v) /
    sum(±v) over exactly those two elements; energies/extrema fold
    over the same exact integers, so results are bit-identical (the
    untouched oracle is the proof)."""
    parts = [f"""
WITH ev AS (
  SELECT unix_micros(ts) div {_HOUR_US} AS k FROM events
), b AS (
  SELECT min(k) AS k0 FROM ev
), cnt AS (
  SELECT CAST(k - k0 AS BIGINT) AS i, CAST(count(1) AS BIGINT) AS v
  FROM ev CROSS JOIN b WHERE k - k0 < 512 GROUP BY k - k0
), l0 AS (
  SELECT transform(sequence(0, 511),
                   i -> coalesce(try_element_at(m, CAST(i AS BIGINT)),
                                 CAST(0 AS BIGINT))) AS v0
  FROM (SELECT map_from_entries(collect_list(struct(i, v))) AS m FROM cnt)
)"""]
    for lv in range(1, 10):
        n = 512 >> lv
        parts.append(f""",
l{lv} AS (
  SELECT *,
         transform(sequence(0, {n - 1}),
                   j -> element_at(v{lv - 1}, 2*j+1) + element_at(v{lv - 1}, 2*j+2)) AS v{lv},
         transform(sequence(0, {n - 1}),
                   j -> element_at(v{lv - 1}, 2*j+1) - element_at(v{lv - 1}, 2*j+2)) AS d{lv}
  FROM l{lv - 1}
)""")
    structs = ",\n  ".join(
        f"struct(CAST({lv} AS BIGINT) AS level,"
        f" CAST(size(d{lv}) AS BIGINT) AS n_coeffs,"
        f" aggregate(d{lv}, CAST(0 AS BIGINT), (acc, x) -> acc + x * x) AS detail_energy,"
        f" CAST(array_max(transform(d{lv}, x -> abs(x))) AS BIGINT) AS max_abs_detail,"
        f" CAST(array_max(v{lv}) AS BIGINT) AS max_approx)"
        for lv in range(1, 10)
    )
    parts.append(f"""
SELECT inline(array(
  {structs}))
FROM l9
""")
    return "".join(parts)


@query("ts_haar_wavelet", oracle=_haar_sql("epoch_us(ts)", "//", _HAAR_GEN_DUCK))
def ts_haar_wavelet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C268: 9-level unnormalized Haar decomposition of the dense
    512-hour event-count series (missing hours are explicit zeros on
    a generated dyadic grid anchored at the first hour in the data).
    Per-level detail energy + extrema, all exact BIGINTs — the
    scalogram summary a monitoring pipeline uses to locate WHICH
    timescale an anomaly lives at (C207's periodogram is the
    frequency-domain twin; Haar is localized in time).

    Scale: one map-side-combined hourly rollup (the only data-sized
    work), a 1-row min-hour broadcast (audit-allowlisted), then the
    whole bounded 512-element pyramid in one projection — see
    _haar_spark_array_sql for why the relational chain was replaced
    on the Spark side (the oracle keeps it)."""
    from ..tables import sql_over

    return sql_over(spark, sf_dir, _haar_spark_array_sql(), ("events",))


# r12 C269: Pettitt change-point test — the nonparametric "did the
# level shift, and WHEN" companion to C108's known-limits control
# chart and the CUSUM locator: K = max_t |U_t| with
# U_t = sum_{i<=t} sum_{j>t} sgn(x_i - x_j), located on the hourly
# series. The O(n^2) double sum collapses to a cumulative midrank
# identity: sum_j sgn(x_i - x_j) = 2*r_i - (n+1) and the within-
# prefix part cancels by antisymmetry, so U_t = sum_{i<=t}
# (2 r_i - (n+1)) — one rank join + one cumulative window over the
# BOUNDED 512-hour grid; with midranks 2r_i is an exact integer and
# (n+1) odd, so every U_t is an exact integer.


def _pettitt_sql(epoch: str, idiv: str, gen512: str) -> str:
    return f"""
WITH ev AS (
  SELECT {epoch} {idiv} {_HOUR_US} AS k FROM events
), b AS (
  SELECT min(k) AS k0 FROM ev
), cnt AS (
  SELECT CAST(k - k0 AS BIGINT) AS i, CAST(count(1) AS BIGINT) AS v
  FROM ev CROSS JOIN b WHERE k - k0 < 512 GROUP BY k - k0
), x AS (
  SELECT g.i, coalesce(c.v, 0) AS v
  FROM ({gen512}) g LEFT JOIN cnt c ON c.i = g.i
), per_v AS (
  SELECT v, CAST(count(1) AS BIGINT) AS n_v FROM x GROUP BY v
), rk AS (
  SELECT v,
         2 * coalesce(sum(n_v) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                                     PRECEDING AND 1 PRECEDING), 0)
           + n_v + 1 AS r2
  FROM per_v
), u AS (
  SELECT x.i,
         CAST(sum(rk.r2 - 513) OVER (ORDER BY x.i ROWS BETWEEN UNBOUNDED
                                     PRECEDING AND CURRENT ROW) AS BIGINT)
           AS u2
  FROM x JOIN rk ON rk.v = x.v
), kmax AS (
  SELECT CAST(max(abs(u2)) AS BIGINT) AS k2 FROM u WHERE i < 511
), tstar AS (
  SELECT CAST(min(u.i) AS BIGINT) AS t_star
  FROM u CROSS JOIN kmax WHERE abs(u.u2) = kmax.k2 AND u.i < 511
), seg AS (
  SELECT CAST(sum(CASE WHEN x.i <= t.t_star THEN x.v ELSE 0 END) AS BIGINT)
           AS s_before,
         CAST(sum(CASE WHEN x.i > t.t_star THEN x.v ELSE 0 END) AS BIGINT)
           AS s_after,
         CAST(max(t.t_star) AS BIGINT) AS t_star
  FROM x CROSS JOIN tstar t
)
SELECT CAST(512 AS BIGINT) AS n_hours,
       seg.t_star AS change_point_hour,
       round(CAST(kmax.k2 AS DOUBLE), 1) AS k_stat,
       round(2 * exp(-6.0 * CAST(kmax.k2 AS DOUBLE) * kmax.k2
                     / CAST(512 * 512 * 512 + 512 * 512 AS DOUBLE)), 6)
         AS p_approx,
       round(seg.s_before / CAST(seg.t_star + 1 AS DOUBLE), 6)
         AS mean_before,
       round(seg.s_after / CAST(511 - seg.t_star AS DOUBLE), 6)
         AS mean_after
FROM kmax, seg
"""


@query("ts_pettitt_change_point",
       oracle=_pettitt_sql("epoch_us(ts)", "//", _HAAR_GEN_DUCK))
def ts_pettitt_change_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C269: Pettitt (1979) rank-based change-point test on the dense
    512-hour event-count series: the shift hour t* = argmax |U_t|,
    the K statistic, the standard p-value approximation
    2*exp(-6K^2/(n^3+n^2)), and the level means either side of the
    break.
    Midranks over the per-value grid keep everything exact integers
    until the final exp/divisions; ties broken toward the earliest
    hour.

    Scale: one hourly rollup (data-sized, map-side combined), then
    rank + cumulative windows over BOUNDED <=512-row tables
    (audit-allowlisted, C124 ECDF class), 1-row broadcasts for
    K/t*."""
    from ..tables import sql_over

    return sql_over(
        spark, sf_dir,
        _pettitt_sql("unix_micros(ts)", "div", _HAAR_GEN_SPARK),
        ("events",),
    )


# r12 C274: partial autocorrelation (Durbin-Levinson) — the AR-order
# diagnostic beside C96's ACF: PACF(k) is the correlation at lag k
# AFTER regressing out lags 1..k-1, the statistic whose cutoff picks
# p in an AR(p)/ARIMA fit. ACF lags 1..5 come from the dense
# 720-hour grid in EXACT integers: with S = sum x and n fixed,
# n^2*c_k = sum (n*x_t - S)(n*x_{t+k} - S) is a BIGINT (<= 4e16 at
# sf1), so r_k = C_k/C_0 is one IEEE division over exact integers;
# the Levinson recursion is then a fixed unrolled chain over five
# doubles — bit-identical cross-engine.


def _pacf_sql(epoch: str, idiv: str, gen720: str) -> str:
    leads = ", ".join(
        f"lead(v, {k}) OVER (ORDER BY i ASC) AS v{k}" for k in range(1, 6)
    )
    cks = ", ".join(
        f"CAST(sum(CASE WHEN v{k} IS NOT NULL THEN"
        f" (720 * v - s) * (720 * v{k} - s) END) AS BIGINT) AS c{k}"
        for k in range(1, 6)
    )
    return f"""
WITH ev AS (
  SELECT {epoch} {idiv} {_HOUR_US} AS k FROM events
), b AS (
  SELECT min(k) AS k0 FROM ev
), cnt AS (
  SELECT CAST(k - k0 AS BIGINT) AS i, CAST(count(1) AS BIGINT) AS v
  FROM ev CROSS JOIN b WHERE k - k0 < 720 GROUP BY k - k0
), x AS (
  SELECT g.i, coalesce(c.v, 0) AS v
  FROM ({gen720}) g LEFT JOIN cnt c ON c.i = g.i
), st AS (
  SELECT CAST(sum(v) AS BIGINT) AS s FROM x
), lagd AS (
  SELECT i, v, s, {leads}
  FROM x CROSS JOIN st
), mo AS (
  SELECT CAST(sum((720 * v - s) * (720 * v - s)) AS BIGINT) AS c0,
         {cks}
  FROM lagd
), r AS (
  SELECT c1 / CAST(c0 AS DOUBLE) AS r1, c2 / CAST(c0 AS DOUBLE) AS r2,
         c3 / CAST(c0 AS DOUBLE) AS r3, c4 / CAST(c0 AS DOUBLE) AS r4,
         c5 / CAST(c0 AS DOUBLE) AS r5
  FROM mo
), l2 AS (
  SELECT r.*, (r2 - r1 * r1) / (1 - r1 * r1) AS k2 FROM r
), l2b AS (
  SELECT l2.*, r1 - k2 * r1 AS p21 FROM l2
), l3 AS (
  SELECT l2b.*,
         (r3 - p21 * r2 - k2 * r1) / (1 - p21 * r1 - k2 * r2) AS k3
  FROM l2b
), l3b AS (
  SELECT l3.*, p21 - k3 * k2 AS p31, k2 - k3 * p21 AS p32 FROM l3
), l4 AS (
  SELECT l3b.*,
         (r4 - p31 * r3 - p32 * r2 - k3 * r1)
           / (1 - p31 * r1 - p32 * r2 - k3 * r3) AS k4
  FROM l3b
), l4b AS (
  SELECT l4.*, p31 - k4 * k3 AS p41, p32 - k4 * p32 AS p42,
         k3 - k4 * p31 AS p43
  FROM l4
), l5 AS (
  SELECT l4b.*,
         (r5 - p41 * r4 - p42 * r3 - p43 * r2 - k4 * r1)
           / (1 - p41 * r1 - p42 * r2 - p43 * r3 - k4 * r4) AS k5
  FROM l4b
)
SELECT CAST(1 AS BIGINT) AS lag, round(r1, 6) AS acf, round(r1, 6) AS pacf
  FROM l5
UNION ALL SELECT 2, round(r2, 6), round(k2, 6) FROM l5
UNION ALL SELECT 3, round(r3, 6), round(k3, 6) FROM l5
UNION ALL SELECT 4, round(r4, 6), round(k4, 6) FROM l5
UNION ALL SELECT 5, round(r5, 6), round(k5, 6) FROM l5
"""


_GEN720_DUCK = "SELECT unnest(generate_series(0, 719)) AS i"
_GEN720_SPARK = "SELECT explode(sequence(0, 719)) AS i"


@query("ts_pacf_levinson",
       oracle=_pacf_sql("epoch_us(ts)", "//", _GEN720_DUCK))
def ts_pacf_levinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C274: ACF + PACF (lags 1..5) of the dense 720-hour
    event-count series via the unrolled Durbin-Levinson recursion —
    the AR-order selection table an ARIMA-style fit reads first.
    Twin-pinned against a statsmodels-spelling python replay (exact
    ACF agreement; Levinson chain within one display-grid step).

    Scale: one hourly rollup (map-side combined), a 1-row min-hour
    anchor broadcast, one lead-window + one moment aggregate over
    the bounded 720-row grid (allowlisted), then a constant scalar
    chain."""
    from ..tables import sql_over

    return sql_over(
        spark, sf_dir,
        _pacf_sql("unix_micros(ts)", "div", _GEN720_SPARK),
        ("events",),
    )


# r12 C288: Croston intermittent-demand forecast (+ Syntetos-Boylan
# correction) — the forecasting method for SPARSE series that
# defeat C186/C191's smoothers (zeros are not demand level, they
# are absence): separate EWMAs of demand SIZES and of the INTERVALS
# between demand periods, forecast = z/p per hour. alpha = 0.5
# makes every EWMA weight an exact power of two; the EWMA is
# spelled as the 16-term truncated exponential window (weights
# 2^-1..2^-16, renormalized by 1 - 2^-16 ≈ 99.998% of the mass), so
# every numerator is an exact dyadic rational in doubles — no
# sequential recursion, ONE window expression, bit-identical
# cross-engine. Demand = hourly 'purchase' counts; at tiny SF the
# series is genuinely intermittent (intervals >> 1), at sf1 it
# degenerates to dense demand and Croston folds into a plain EWMA —
# both regimes are correct readings of the same statistic.


def _croston_sql(epoch: str, idiv: str) -> str:
    wsum = " + ".join(f"power(2.0, -{i + 1})" for i in range(16))
    z = " + ".join(
        f"coalesce(lag(x, {i}) OVER (ORDER BY k ASC), 0)"
        f" * power(2.0, -{i + 1})" for i in range(16)
    )
    p = " + ".join(
        f"coalesce(lag(iv, {i}) OVER (ORDER BY k ASC), 0)"
        f" * power(2.0, -{i + 1})" for i in range(16)
    )
    return f"""
WITH d AS (
  SELECT {epoch} {idiv} {_HOUR_US} AS k, CAST(count(1) AS BIGINT) AS x
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), iv AS (
  SELECT k, x,
         k - lag(k) OVER (ORDER BY k ASC) AS iv
  FROM d
), sm AS (
  SELECT k, x, iv,
         ({z}) / ({wsum}) AS z_ewma,
         ({p}) / ({wsum}) AS p_ewma,
         row_number() OVER (ORDER BY k DESC) AS rn_last,
         count(1) OVER () AS n_periods
  FROM iv
)
SELECT CAST(n_periods AS BIGINT) AS n_demand_periods,
       round(z_ewma, 6) AS size_ewma,
       round(p_ewma, 6) AS interval_ewma,
       round(z_ewma / p_ewma, 6) AS croston_per_hour,
       round(0.75 * z_ewma / p_ewma, 6) AS sba_per_hour
FROM sm WHERE rn_last = 1
"""


@query("ts_croston_intermittent",
       oracle=_croston_sql("epoch_us(ts)", "//"))
def ts_croston_intermittent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C288: Croston (1972) + SBA (Syntetos-Boylan 2005) forecast of
    hourly purchase demand — truncated-exponential EWMAs (exact
    powers of two, 16 terms, renormalized) of demand sizes and
    inter-demand intervals at the latest demand period.

    Scale: one map-side-combined hourly rollup filtered to the
    demand type (the only data-sized work); the lag windows run on
    the calendar-bounded demand-period table (≤ hours in the
    observation window, allowlisted bounded)."""
    from ..tables import sql_over

    return sql_over(
        spark, sf_dir, _croston_sql("unix_micros(ts)", "div"), ("events",)
    )
