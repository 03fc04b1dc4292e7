"""Operational-robustness patterns: schema evolution on the lake and
streaming restart recovery — the two failure modes a long-lived
ingest pipeline (the reference runs on a schedule forever,
task.ts:51) actually hits in production."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_arcgis_spark.tables import table

SF_DIR = "/root/testdata/sf0.001"


def test_schema_evolution_merge_and_null_fill(spark, tmp_path):
    """A column added mid-stream must not break old readers: mergeSchema
    unions the schemas and old files read the new column as NULL."""
    d = str(tmp_path / "evolving")
    ev = table(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    ev.filter("event_id % 2 = 0").write.parquet(d + "/batch=0")
    ev.filter("event_id % 2 = 1").withColumn(
        "quality_tier", (F.col("value") > 100).cast("int")
    ).write.parquet(d + "/batch=1")

    df = spark.read.option("mergeSchema", "true").parquet(d)
    assert "quality_tier" in df.columns
    assert df.count() == ev.count()
    # old files surface the new column as NULL; new files carry values
    nulls = df.filter(F.col("quality_tier").isNull()).count()
    assert nulls == ev.filter("event_id % 2 = 0").count()
    # and the evolved column still computes
    assert df.filter("quality_tier = 1").count() == ev.filter(
        "event_id % 2 = 1 AND value > 100"
    ).count()


def test_streaming_checkpoint_restart_no_reprocessing(spark, tmp_path):
    """A restarted stream with the same checkpoint resumes AFTER the
    data it already processed — at-least-once becomes effectively-once
    at the source: file B, added between runs, is the only new output
    of run 2."""
    import shutil

    src = tmp_path / "incoming"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sink")

    ev = table(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    ev.filter("event_id < 100").coalesce(1).write.parquet(str(src / "a"))

    schema = "event_id bigint, user_id bigint, value double"

    def run_once():
        stream = spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true"
        ).parquet(str(src))
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    first = spark.read.parquet(out).count()
    assert first == 100

    ev.filter("event_id >= 100 AND event_id < 150").coalesce(1).write.parquet(
        str(src / "b")
    )
    run_once()
    after = spark.read.parquet(out)
    # file A not reprocessed: exactly the 50 new rows appended, no dupes
    assert after.count() == 150
    assert after.select("event_id").distinct().count() == 150


def test_incremental_materialize_then_compact(spark, tmp_path):
    """End-to-end lakehouse loop: stream -> partitioned lake (restart
    resumes, no reprocessing) -> compaction of the littered partition
    preserves rows and prunes file count."""
    from etl_arcgis_spark.sources.maintenance import compact_parquet
    from etl_arcgis_spark.streaming import pipelines as P

    src = tmp_path / "in"
    src.mkdir()
    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ck")

    ev = table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    schema = "event_id bigint, user_id bigint, value double, event_type string"

    def ingest():
        stream = spark.readStream.schema(schema).option(
            "recursiveFileLookup", "true"
        ).parquet(str(src))
        q = P.incremental_materialize(stream, lake, ckpt).trigger(
            availableNow=True
        ).start()
        q.awaitTermination(180)

    ev.filter("event_id < 200").repartition(8).write.parquet(str(src / "a"))
    ingest()
    ev.filter("event_id >= 200 AND event_id < 300").repartition(8).write.parquet(
        str(src / "b")
    )
    ingest()

    lake_df = spark.read.parquet(lake)
    assert lake_df.count() == 300  # effectively-once across restarts
    # partition pruning is available to downstream readers
    plan = (
        lake_df.filter("event_type = 'purchase'")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [" in plan

    # the litter is real (two 8-partition batches), compaction fixes one partition
    import glob

    part = f"{lake}/event_type=purchase"
    before = len(glob.glob(f"{part}/*.parquet"))
    assert before > 1
    compacted = str(tmp_path / "purchase_compacted")
    got = compact_parquet(spark, part, compacted, target_file_mb=128)
    assert len(glob.glob(f"{compacted}/*.parquet")) == 1
    assert got.count() == spark.read.parquet(part).count()


def test_observation_counts_ride_the_data_pass(spark):
    """A20 via df.observe: metrics arrive as accumulator side-outputs
    of the SAME job that produced the output — values equal a separate
    count, with no extra scan job."""
    from etl_arcgis_spark.operators.scans import with_count_observation
    from etl_arcgis_spark.tables import table

    df = table(spark, "/root/testdata/sf0.001", "orders").filter(
        "o_totalprice > 100000"
    )
    observed, obs = with_count_observation(df)
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    assert m["n_rows"] == df.count()
    assert m["n_null_key"] == 0
