"""Structured Streaming parity tests (SURVEY.md §5.4, C33/C36-C38).

The t2-checked streaming queries run in batch form; these tests prove
the SAME window expressions produce identical results through a real
``readStream`` -> ``availableNow`` pipeline, that watermarking drops
late data, and that the foreachBatch upsert sink (A13/A18 streaming
twin) converges to the batch MERGE result.
"""

from __future__ import annotations

import shutil
import time
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from etl_arcgis_spark.tables import prepare, table


SF_DIR = "/root/testdata/sf0.001"


# Slow tier (optimization r13, VERDICT r12 order #2): heavyweight
# subprocess/streaming/property suite — excluded from the default
# pytest run (pytest.ini), executed with `-m slow`.
pytestmark = pytest.mark.slow


@pytest.fixture()
def events_stream_dir(spark, tmp_path):
    d = tmp_path / "events_in"
    d.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-000.parquet")
    return str(d)


def _tumbling(df):
    return (
        df.withColumn("ts_t", F.col("ts"))
        .groupBy(F.window("ts_t", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("val_sum"))
        .select(F.unix_millis("w.start").alias("w_start_ms"), "event_type", "n", "val_sum")
    )


def test_streaming_tumbling_matches_batch(spark, events_stream_dir):
    prepare(spark)
    schema = table(spark, SF_DIR, "events").schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    q = (
        _tumbling(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumble_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # counts/keys must match exactly; sums by key with tolerance (the
    # streaming state and the batch plan accumulate doubles in different
    # orders, so an exact float compare would be boundary-flaky)
    got = {(r["w_start_ms"], r["event_type"]): (r["n"], r["val_sum"])
           for r in spark.sql("SELECT * FROM tumble_out").collect()}
    want = {(r["w_start_ms"], r["event_type"]): (r["n"], r["val_sum"])
            for r in _tumbling(table(spark, SF_DIR, "events")).collect()}
    assert got.keys() == want.keys() and len(got) > 0
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-3


def test_watermark_drops_late_data(spark, tmp_path):
    """C36: watermark semantics, as Spark actually guarantees them —
    once the watermark has advanced past a window's end AND the window's
    state has been evicted (a subsequent batch ran), a late event for
    that window is dropped: the finalized window stays at its on-time
    count and is never re-emitted. (A late event arriving while state is
    still live is legitimately merged; the guarantee is cleanup, not
    eager dropping.)"""
    prepare(spark)
    d = tmp_path / "late_in"
    d.mkdir()

    def batch(rows):
        return spark.createDataFrame(rows, "id long, ts_s string").withColumn(
            "ts_t", F.col("ts_s").cast("timestamp")
        )

    def write_flat(df, name: str) -> None:
        staging = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(staging))
        part = next(staging.glob("part-*.parquet"))
        shutil.move(str(part), str(d / name))

    # b1 advances the watermark to 11:50; b2 evicts+emits the finalized
    # 10:00 window; b3 delivers a late event for that dead window.
    write_flat(batch([(1, "2024-01-01 10:00:00"), (2, "2024-01-01 12:00:00")]), "b1.parquet")
    time.sleep(1.1)  # distinct mtimes => file order = arrival order
    write_flat(batch([(4, "2024-01-01 13:00:00")]), "b2.parquet")
    time.sleep(1.1)
    write_flat(batch([(3, "2024-01-01 10:05:00")]), "b3.parquet")

    stream = spark.readStream.schema("id long, ts_s string, ts_t timestamp").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(d))
    agg = (
        stream.withWatermark("ts_t", "10 minutes")
        .groupBy(F.window("ts_t", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.unix_millis("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM late_out").collect()
    ten_am = 1704103200000
    # the 10:00 window finalized with only its on-time event; the late
    # id=3 event neither re-opened nor re-emitted it
    assert [(r["ws"], r["n"]) for r in out if r["ws"] == ten_am] == [(ten_am, 1)]


def test_foreachbatch_upsert_matches_batch_merge(spark, events_stream_dir):
    """C38/A13: streaming micro-batch upsert via foreachBatch converges
    to the batch last-write-wins state per key."""
    prepare(spark)
    schema = table(spark, SF_DIR, "events").schema
    state: dict[int, tuple[int, float]] = {}

    def upsert(batch_df, _epoch):
        for r in (
            batch_df.withColumn("us", F.unix_micros("ts"))
            .select("user_id", "us", "event_id", "value")
            .collect()
        ):
            cur = state.get(r["user_id"])
            if cur is None or (r["us"], r["event_id"]) >= cur[:2]:
                state[r["user_id"]] = (r["us"], r["event_id"], r["value"])

    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    q = stream.writeStream.foreachBatch(upsert).trigger(availableNow=True).start()
    q.awaitTermination(120)

    from etl_arcgis_spark.operators.dedup import dedup_key_last_write

    want = {
        r["user_id"]: (r["us"], r["event_id"], r["value"])
        for r in dedup_key_last_write(spark, SF_DIR).collect()
    }
    assert state == want and len(state) > 0


def test_watermark_bounds_state_store_size(spark, tmp_path):
    """The 100 TB streaming claim: state is BOUNDED — watermark
    advancement evicts closed windows, so the state store holds only
    the live tail, not every window ever seen. Asserted from the
    engine's own stateOperators metrics."""
    prepare(spark)
    d = tmp_path / "state_in"
    d.mkdir()

    def batch(rows):
        return spark.createDataFrame(rows, "id long, ts_s string").withColumn(
            "ts_t", F.col("ts_s").cast("timestamp")
        )

    def write_flat(df, name: str) -> None:
        staging = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(staging))
        part = next(staging.glob("part-*.parquet"))
        shutil.move(str(part), str(d / name))

    # 48 hourly windows across two days, then a far-future event that
    # pushes the watermark past all of them
    rows = [(i, f"2024-01-0{1 + i // 24} {i % 24:02d}:30:00") for i in range(48)]
    write_flat(batch(rows), "b1.parquet")
    time.sleep(1.1)
    write_flat(batch([(99, "2024-01-10 00:00:00")]), "b2.parquet")

    stream = spark.readStream.schema("id long, ts_s string, ts_t timestamp").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(d))
    agg = (
        stream.withWatermark("ts_t", "10 minutes")
        .groupBy(F.window("ts_t", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("state_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    progresses = [p for p in q.recentProgress if p["stateOperators"]]
    assert progresses, "no state operator progress recorded"
    final_state_rows = progresses[-1]["stateOperators"][0]["numRowsTotal"]
    evicted = sum(
        p["stateOperators"][0].get("numRowsRemoved", 0) for p in progresses
    )
    # all 48 closed windows were evicted; only the live tail remains
    assert evicted >= 48
    assert final_state_rows <= 1
    # and the evicted windows were actually emitted downstream
    assert spark.sql("SELECT count(*) FROM state_out").collect()[0][0] >= 48


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join parity: the SAME builder the batch
    query `stream_stream_interval_join` uses, run through a real
    two-source readStream pipeline, must emit exactly the batch result.

    The feed is arranged to force cross-batch join state: ALL clicks
    arrive in micro-batch 1, purchases split at the median timestamp
    across two time-ordered files (maxFilesPerTrigger=1) — so every
    pair whose purchase is in the second file can only match if the
    click-side state survived the earlier batches, and clicks whose
    30-minute match horizon has passed the global watermark are
    legitimately evicted in between (time-ordered arrival means
    eviction can never lose a future match).
    """
    from etl_arcgis_spark.streaming.pipelines import stream_stream_click_purchase_join
    from etl_arcgis_spark import registry

    sf = "/root/testdata/sf0.01"
    prepare(spark)
    ev = table(spark, sf, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.timestamp_millis(F.expr("unix_micros(ts) div 1000")).alias("ts_t"),
    )
    clicks_b = ev.filter(F.col("event_type") == "click")
    purchases_b = ev.filter(F.col("event_type") == "purchase")
    med = purchases_b.selectExpr("percentile(unix_millis(ts_t), 0.5) p").collect()[0]["p"]

    d_clicks = tmp_path / "ss_clicks"
    d_purch = tmp_path / "ss_purchases"
    d_clicks.mkdir()
    d_purch.mkdir()

    def write_flat(df, dest, name):
        staging = tmp_path / f"stage_{name}"
        df.coalesce(1).write.parquet(str(staging))
        shutil.move(str(next(staging.glob("part-*.parquet"))), str(dest / name))

    write_flat(clicks_b, d_clicks, "c0.parquet")
    write_flat(purchases_b.filter(F.unix_millis("ts_t") <= med), d_purch, "p0.parquet")
    time.sleep(1.1)  # distinct mtimes => file order = arrival order
    write_flat(purchases_b.filter(F.unix_millis("ts_t") > med), d_purch, "p1.parquet")

    schema = "event_id bigint, user_id bigint, event_type string, ts_t timestamp"
    clicks_s = spark.readStream.schema(schema).parquet(str(d_clicks))
    purchases_s = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d_purch))
    )
    q = (
        stream_stream_click_purchase_join(clicks_s, purchases_s, "30 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    cols = ["user_id", "purchase_id", "click_id", "purchase_ms", "click_ms"]
    got = {tuple(r) for r in spark.sql(f"SELECT {','.join(cols)} FROM ss_join_out").collect()}
    want = {
        tuple(r)
        for r in registry.run(spark, "stream_stream_interval_join", sf).select(cols).collect()
    }
    assert got == want and len(got) > 0


def _write_flat_seq(spark, tmp_path, dest, frames):
    """Write each frame as one file into dest, mtime-ordered (file
    order = arrival order for the file stream source)."""
    dest.mkdir(exist_ok=True)
    for i, df in enumerate(frames):
        staging = tmp_path / f"stage_{dest.name}_{i}"
        df.coalesce(1).write.parquet(str(staging))
        shutil.move(str(next(staging.glob("part-*.parquet"))), str(dest / f"f{i}.parquet"))
        time.sleep(1.1)


def test_stream_stream_left_outer_emits_null_after_watermark(spark, tmp_path):
    """Outer stream-stream join semantics: an unattributed purchase is
    emitted null-padded only after the watermark passes its match
    horizon and a later batch runs state cleanup — never eagerly."""
    from etl_arcgis_spark.streaming.pipelines import stream_stream_click_purchase_join

    prepare(spark)

    def batch(rows):
        return spark.createDataFrame(rows, "event_id long, user_id long, ts_s string").select(
            "event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts_t")
        )

    # P1@10:00 has click C1@09:50 (match); P2@10:05 has no click.
    # 13:00 then 14:00 traffic advances the watermark past P2's horizon
    # (10:05 + 30 min) so its null row must be finalized.
    d_clicks = tmp_path / "lo_clicks"
    d_purch = tmp_path / "lo_purch"
    _write_flat_seq(spark, tmp_path, d_clicks, [
        batch([(101, 1, "2024-01-01 09:50:00")]),
        batch([(102, 9, "2024-01-01 13:00:00")]),
        batch([(103, 9, "2024-01-01 14:00:00")]),
    ])
    _write_flat_seq(spark, tmp_path, d_purch, [
        batch([(201, 1, "2024-01-01 10:00:00"), (202, 2, "2024-01-01 10:05:00")]),
        batch([(203, 8, "2024-01-01 13:00:00")]),
        batch([(204, 8, "2024-01-01 14:00:00")]),
    ])

    schema = "event_id long, user_id long, ts_t timestamp"
    clicks_s = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(d_clicks))
    purch_s = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(d_purch))
    q = (
        stream_stream_click_purchase_join(clicks_s, purch_s, "30 minutes", how="leftOuter")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("lo_join_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {r["purchase_id"]: r["click_id"] for r in spark.sql(
        "SELECT purchase_id, click_id FROM lo_join_out").collect()}
    assert rows[201] == 101       # attributed purchase keeps its click
    assert 202 in rows and rows[202] is None  # unattributed -> null row after watermark


def test_dedup_within_watermark_dedups_then_evicts(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a redelivery with a DIFFERENT
    event time is suppressed while the key's state is inside the
    watermark, and re-emitted once state was evicted — bounded-state
    dedup, exactly once within the horizon."""
    from etl_arcgis_spark.streaming.pipelines import streaming_dedup_within_watermark

    prepare(spark)

    def batch(rows):
        return spark.createDataFrame(rows, "event_id long, user_id long, ts_s string").select(
            "event_id", "user_id", F.col("ts_s").cast("timestamp").alias("ts_t")
        )

    d = tmp_path / "ddw_in"
    _write_flat_seq(spark, tmp_path, d, [
        batch([(1, 7, "2024-01-01 10:00:00")]),
        batch([(1, 7, "2024-01-01 10:03:00"),   # dup within watermark -> dropped
               (2, 7, "2024-01-01 10:04:00")]),
        batch([(3, 7, "2024-01-01 13:00:00")]), # advances watermark past key 1's expiry
        batch([(4, 7, "2024-01-01 14:00:00")]), # state cleanup runs end-of-batch here
        batch([(1, 7, "2024-01-01 14:30:00")]), # same key after eviction -> re-emitted
    ])
    stream = spark.readStream.schema("event_id long, user_id long, ts_t timestamp").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(d))
    q = (
        streaming_dedup_within_watermark(stream, "10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ddw_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = [(r["event_id"], r["ts_t"].minute) for r in spark.sql(
        "SELECT event_id, ts_t FROM ddw_out ORDER BY ts_t").collect()]
    # first sighting kept, in-watermark dup dropped, post-eviction redelivery kept
    assert out == [(1, 0), (2, 4), (3, 0), (4, 0), (1, 30)]


def test_rocksdb_state_store_parity(spark, events_stream_dir):
    """Cluster-grade state backend: the same watermarked tumbling
    aggregate with state in RocksDB (off-heap, spillable — what a
    1000-executor deployment runs so state survives beyond executor
    heap) must produce results identical to the default in-memory
    provider and to the batch twin."""
    prepare(spark)
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, "")
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        schema = table(spark, SF_DIR, "events").schema
        stream = spark.readStream.schema(schema).parquet(events_stream_dir)
        q = (
            _tumbling(stream)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("rocksdb_out")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {(r["w_start_ms"], r["event_type"]): (r["n"], r["val_sum"])
               for r in spark.sql("SELECT * FROM rocksdb_out").collect()}
        want = {(r["w_start_ms"], r["event_type"]): (r["n"], r["val_sum"])
                for r in _tumbling(table(spark, SF_DIR, "events")).collect()}
        assert got.keys() == want.keys() and len(got) > 0
        for k in want:
            assert got[k][0] == want[k][0]
            assert abs(got[k][1] - want[k][1]) < 1e-3
    finally:
        if prev:
            spark.conf.set(key, prev)
        else:
            spark.conf.unset(key)


def test_streaming_topk_per_window_matches_batch(spark, events_stream_dir):
    """stream_topk_per_window's production spelling: the incremental
    stage is the tumbling aggregate; the non-incremental rank runs per
    micro-batch in foreachBatch over the aggregate's complete output.
    The composed pipeline must equal the batch query."""
    from etl_arcgis_spark.registry import all_queries

    prepare(spark)
    schema = table(spark, SF_DIR, "events").schema
    stream = spark.readStream.schema(schema).parquet(events_stream_dir)
    agg = _tumbling(stream)

    state: dict[str, list] = {"rows": []}

    def rank_batch(batch_df, epoch_id):
        from pyspark.sql import Window

        w = Window.partitionBy("w_start_ms").orderBy(
            F.desc("n"), F.asc("event_type")
        )
        state["rows"] = (
            batch_df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("w_start_ms", "event_type", "n", "val_sum")
            .collect()
        )

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(rank_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["w_start_ms"], r["event_type"]): (r["n"], r["val_sum"])
        for r in state["rows"]
    }
    want = {
        (r["w_start_ms"], r["event_type"]): (r["n"], r["val_sum"])
        for r in all_queries()["stream_topk_per_window"](spark, SF_DIR).collect()
    }
    assert got.keys() == want.keys() and len(got) > 0
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-3
