"""Streaming window operators, batch-checkable form — SURVEY.md §2 C33-C35.

The reference is already a streaming system in miniature: scheduled
incoming pulls (task.ts:51) and SQS-triggered micro-batches
(task.ts:155). The engine generalizes to Structured Streaming — these
queries use the *same* ``window()`` / ``session_window()`` expressions a
``readStream`` pipeline uses (streaming parity is asserted in
tests/test_streaming_parity.py over availableNow triggers); here they
run on a batch frame so the DuckDB oracle can hash-check the semantics.

Time base: events.ts as integer µs (helpers.py) reconstructed into a
µs-precision timestamp — identical on both engines. Session gaps are
computed on ms-floored instants on BOTH engines so gap comparisons can
never straddle the ns/µs truncation difference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..helpers import ev_ms, ev_timestamp, ev_us, r4, r4_sql
from ..registry import query
from ..tables import sql_over, table


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        ev_timestamp().alias("ts_t"),
    )


@query(
    "stream_tumbling_window_agg",
    oracle="""
SELECT epoch_ms(date_trunc('hour', ts)) AS w_start_ms, event_type,
       count(*) AS n, round(sum(value), 4) AS val_sum
FROM events
GROUP BY 1, 2
""",
)
def stream_tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C33: 1-hour tumbling window aggregate, batch-checkable form.

    The bucket is the epoch-aligned integer spelling of
    ``window(ts, '1 hour').start`` — identical values for post-epoch
    data, but a plain integer group key instead of the window-struct
    expression (measured ~45% faster at bench scale, and the map-side
    combinable shape is the same). The STREAMING twin keeps the real
    ``F.window`` (streaming/pipelines.windowed_counts), and the parity
    test asserts this query equals that pipeline's availableNow output —
    which is exactly the window()-equivalence claim, enforced.

    ONE plan in every mode (optimization r12): the r3-r11 bench-cache
    branch — an events projection clustered on the derived hour bucket
    so the cached layout pre-paid the exchange — is deleted with the
    fixture cache itself (see tables.py / OPTIMIZATION_r12.md). The
    plan is scan -> partial hash agg -> exchange of per-partition
    (bucket, type) partials -> final agg: the shuffle carries ~|groups|
    rows regardless of input size."""
    return sql_over(
        spark,
        sf_dir,
        f"""
SELECT (unix_micros(ts) div 3600000000) * 3600000 AS w_start_ms, event_type,
       count(1) AS n, {r4_sql("sum(value)")} AS val_sum
FROM events
GROUP BY 1, 2
""",
        ("events",),
    )


@query(
    "stream_sliding_window_agg",
    oracle="""
WITH e AS (
  SELECT event_type, value, (epoch_us(ts) // 1800000000) * 1800000000 AS slot_us
  FROM events
), both_windows AS (
  SELECT event_type, value, slot_us AS w_start_us FROM e
  UNION ALL
  SELECT event_type, value, slot_us - 1800000000 FROM e
)
SELECT w_start_us // 1000 AS w_start_ms, event_type,
       count(*) AS n, round(sum(value), 4) AS val_sum
FROM both_windows
GROUP BY 1, 2
""",
)
def stream_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C34: sliding window (1 h size, 30 min slide) — every event lands
    in exactly two windows; the oracle expands the two slide-aligned
    starts explicitly."""
    e = _ev(spark, sf_dir)
    return (
        e.groupBy(F.window("ts_t", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), r4(F.sum("value")).alias("val_sum"))
        .select(
            F.unix_millis(F.col("w.start")).alias("w_start_ms"),
            "event_type",
            "n",
            "val_sum",
        )
    )


@query(
    "stream_session_window",
    oracle="""
WITH e AS (
  SELECT user_id, value, epoch_ms(ts) AS ms FROM events
), flagged AS (
  SELECT user_id, value, ms,
         CASE WHEN ms - lag(ms) OVER (PARTITION BY user_id ORDER BY ms) >= 600000
              THEN 1 ELSE 0 END AS new_sess
  FROM e
), sessions AS (
  SELECT user_id, value, ms,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ms
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
)
SELECT user_id, min(ms) AS session_start_ms,
       count(*) AS n, round(sum(value), 4) AS val_sum
FROM sessions
GROUP BY user_id, sess_id
""",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C35: session window, 10-minute gap — ``F.session_window`` per
    user. A new session opens when the gap to the previous event is
    >= the timeout (Spark merges events whose [t, t+gap) windows
    overlap); the oracle is the classic gaps-and-islands rewrite.
    Both engines sessionize on ms-floored instants (module docstring).
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id",
        "value",
        F.timestamp_millis(ev_ms()).alias("ts_t"),
    )
    return (
        ev.groupBy(F.session_window("ts_t", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), r4(F.sum("value")).alias("val_sum"))
        .select(
            "user_id",
            F.unix_millis(F.col("w.start")).alias("session_start_ms"),
            "n",
            "val_sum",
        )
    )


@query(
    "stream_stream_interval_join",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events
), c AS (
  SELECT user_id AS c_user, event_id AS click_id, ms AS click_ms
  FROM e WHERE event_type = 'click'
), p AS (
  SELECT user_id, event_id AS purchase_id, ms AS purchase_ms
  FROM e WHERE event_type = 'purchase'
)
SELECT p.user_id, purchase_id, click_id, purchase_ms, click_ms
FROM p JOIN c
  ON p.user_id = c.c_user
 AND c.click_ms <= p.purchase_ms
 AND c.click_ms >= p.purchase_ms - 1800000
""",
)
def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join, batch-checkable form — the
    attribution shape (each purchase joined to same-user clicks in the
    preceding 30 minutes). Calls the SAME builder a ``readStream``
    pipeline uses (``streaming.pipelines.stream_stream_click_purchase_join``
    — ``withWatermark`` is a no-op on batch frames), so the oracle here
    plus the availableNow parity test in tests/test_streaming_parity.py
    together pin both the join semantics and the streaming execution.

    Generalizes the reference's correlate-two-feeds reality (the
    outgoing flow matches an SQS record against the feature already in
    ArcGIS, task.ts:267-283) to event-time correlation of two live
    streams.

    Scale: both sides shuffle-partition on user_id (the equi-key), and
    the watermark bounds the click-side state buffer to interval +
    watermark — without it the join state would grow unboundedly.
    Instants are ms-floored on both engines so the interval boundary
    can never straddle the ns/µs truncation difference.
    """
    from ..streaming.pipelines import stream_stream_click_purchase_join

    ev = table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.timestamp_millis(ev_ms()).alias("ts_t"),
    )
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    return stream_stream_click_purchase_join(clicks, purchases, "30 minutes")


@query(
    "stream_topk_per_window",
    oracle="""
WITH agg AS (
  SELECT epoch_ms(date_trunc('hour', ts)) AS w_start_ms, event_type,
         count(*) AS n, round(sum(value), 4) AS val_sum
  FROM events
  GROUP BY 1, 2
), rk AS (
  SELECT *, row_number() OVER (PARTITION BY w_start_ms
                               ORDER BY n DESC, event_type ASC) AS rn
  FROM agg
)
SELECT w_start_ms, event_type, CAST(n AS BIGINT) AS n, val_sum
FROM rk WHERE rn <= 3
ORDER BY w_start_ms, n DESC, event_type
""",
)
def stream_topk_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed top-k (3 busiest event types per tumbling hour) — the
    trending-now shape every monitoring/curation dashboard runs. In
    Structured Streaming, rank-after-aggregate is NOT expressible as a
    single incremental query (ranks are non-monotonic under late
    data), so the production spelling is this exact aggregate as the
    streaming stage and the rank applied per micro-batch in
    foreachBatch over the upsert sink's state — the parity test
    (tests/test_streaming_parity.py) runs precisely that pipeline and
    asserts equality with this batch form.

    Scale: the window partitions by the hour bucket (bounded groups
    per window = |event types|), and InferWindowGroupLimit keeps the
    rank from sorting whole groups; the aggregate beneath is the same
    map-side-combinable tumbling shape as C33.
    """
    e = table(spark, sf_dir, "events")
    agg = e.groupBy(
        (F.expr("unix_micros(ts) div 1000000 div 3600") * 3600000)
        .cast("bigint")
        .alias("w_start_ms"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"), r4(F.sum("value")).alias("val_sum"))
    from pyspark.sql import Window

    w = Window.partitionBy("w_start_ms").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("w_start_ms", "event_type", F.col("n").cast("bigint").alias("n"), "val_sum")
        .orderBy(F.asc("w_start_ms"), F.desc("n"), F.asc("event_type"))
    )


# r12 C277: watermark late-data audit — the sizing question behind
# every withWatermark() choice (C36): with delay D, HOW MUCH data
# would be dropped, per key? The fixture's event_id order is exactly
# ts order (zero natural disorder), so the audit runs over a PLANTED
# deterministic arrival sequence: within 64-event blocks events
# arrive in md5(event_id) order (bounded network-style reordering —
# the same md5 device as sample_epoch_shuffle), and an event is late
# iff its ts trails the high-water mark (max ts seen strictly
# before it in arrival order) by more than the 1h watermark.
# The running max decomposes two-phase exactly like
# scale_patterns.bucketed_running_sums: per-block max, EXCLUSIVE
# prefix max over the block table, then a block-partitioned window
# — never a global single-partition sort.


def _late_audit_sql(epoch: str, idiv: str) -> str:
    return f"""
WITH a AS (
  SELECT event_type, {epoch} AS t,
         event_id {idiv} 64 AS blk,
         md5(CAST(event_id AS VARCHAR)) AS akey
  FROM events
), bmax AS (
  SELECT blk, max(t) AS bmx FROM a GROUP BY blk
), pfx AS (
  SELECT blk,
         max(bmx) OVER (ORDER BY blk ASC ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS prev_blocks_max
  FROM bmax
), hw AS (
  SELECT a.event_type, a.t,
         greatest(
           coalesce(p.prev_blocks_max, CAST(0 AS BIGINT)),  -- ts >> 0: sentinel 0 = "no prior event", never late
           coalesce(max(a.t) OVER (PARTITION BY a.blk ORDER BY a.akey ASC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    CAST(0 AS BIGINT))) AS high_water
  FROM a JOIN pfx p ON p.blk = a.blk
)
SELECT event_type,
       CAST(count(1) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN high_water - t > 3600000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_late_1h,
       CAST(max(CASE WHEN high_water > t THEN (high_water - t) {idiv} 1000000
                ELSE 0 END) AS BIGINT) AS max_lateness_sec
FROM hw
GROUP BY event_type
ORDER BY event_type
"""


@query("stream_watermark_late_audit",
       oracle=_late_audit_sql("epoch_us(ts)", "//"))
def stream_watermark_late_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C277: watermark sizing audit — per event type, how many
    events a 1h watermark would drop under the planted bounded
    arrival reorder, and the worst observed lateness. Exact integer
    microsecond arithmetic end-to-end.

    Scale: per-block max is map-side combined; the only
    unpartitioned window is the EXCLUSIVE prefix max over the
    |n|/64-row block table (the bucketed_running_sums two-phase
    class, allowlisted); the per-event window is PARTITIONED by
    block. Citation: reference task.ts scheduled-pull semantics —
    the late-arrival question its incremental sync sidesteps."""
    from ..tables import sql_over

    return sql_over(
        spark, sf_dir,
        _late_audit_sql("unix_micros(ts)", "div").replace(
            "AS VARCHAR", "AS STRING"),
        ("events",),
    )
