"""Full reference-pipeline integration: both dataflows end-to-end.

Incoming (task.ts:393-458): arcgis_sim paged source -> id rewrite ->
metadata nesting -> UnMulti explode -> batch sink.
Outgoing (task.ts:155-361): route by geometry type -> reproject
4326->3857 -> GeoJSON->EsriJSON -> spatialReference stamp -> upsert.

One test drives the whole chain through the public APIs — the "a user
of the reference could switch" proof.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from etl_arcgis_spark import geojson as G
from etl_arcgis_spark.sources.arcgis_sim import register



# Slow tier (optimization r13, VERDICT r12 order #2): heavyweight
# subprocess/streaming/property suite — excluded from the default
# pytest run (pytest.ini), executed with `-m slow`.
pytestmark = pytest.mark.slow


@pytest.fixture()
def layer(spark, tmp_path):
    path = tmp_path / "layer.jsonl"
    feats = [
        {"fid": "a", "callsign": "HAWK", "geom_type": "Point",
         "coords_json": json.dumps([13.4, 52.5])},
        {"fid": "b", "callsign": "EAGLE", "geom_type": "MultiLineString",
         "coords_json": json.dumps([[[0.0, 0.0], [1.0, 1.0]], [[2.0, 2.0], [3.0, 3.0]]])},
        {"fid": "c", "callsign": None, "geom_type": "Polygon",
         "coords_json": json.dumps([[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]])},
        {"fid": "d", "callsign": "GHOST", "geom_type": None, "coords_json": None},
    ]
    with open(path, "w") as fh:
        for f in feats:
            fh.write(json.dumps(f) + "\n")
    register(spark)
    return str(path)


def test_incoming_then_outgoing(spark, layer, tmp_path):
    # --- incoming: paged scan -> transforms (task.ts:425-453) ---
    raw = (
        spark.read.format("arcgis_sim")
        .option("path", layer)
        .option("pageSize", 2)
        .load()
        .withColumnRenamed("fid", "id")
        .withColumn("properties", F.create_map(F.lit("callsign"), F.col("callsign")))
    )
    assert raw.rdd.getNumPartitions() == 2  # paged scan
    incoming = G.explode_multi(G.nest_metadata(G.rewrite_id(G.parse_geometry(raw), 9)))

    # --- outgoing: route -> reproject -> EsriJSON (task.ts:177-233) ---
    routed = G.route_by_geom_type(incoming)
    shipped = G.to_esri_json(G.reproject_web_mercator(routed.filter(F.col("route").isNotNull())))
    out = {r["id"]: r for r in shipped.collect()}

    # MultiLineString exploded into 2 routed lines with -idx ids
    assert {"layer-9-a", "layer-9-b-0", "layer-9-b-1", "layer-9-c"} == set(out)
    # defaults story: callsign nested under metadata, null preserved for
    # the sink's coalesce (task.ts:244)
    assert out["layer-9-a"]["properties"]["metadata"]["callsign"] == "HAWK"
    assert out["layer-9-c"]["properties"]["metadata"]["callsign"] is None
    # reprojection + EsriJSON + spatialReference stamp
    pt = json.loads(out["layer-9-a"]["esri_json"])
    assert abs(pt["x"] - 1491681.2) < 1.0 and abs(pt["y"] - 6891041.7) < 1.0
    assert pt["spatialReference"] == {"wkid": 102100, "latestWkid": 3857}
    ln = json.loads(out["layer-9-b-1"]["esri_json"])
    assert len(ln["paths"]) == 1 and len(ln["paths"][0]) == 2

    # --- sink: chunked append submit (task.ts:455-457) ---
    sink = tmp_path / "sink"
    shipped.select("id", "route", "esri_json").write.format("arcgis_sim").option(
        "path", str(sink)
    ).mode("append").save()
    written = [json.loads(l) for c in sink.glob("chunk-*.jsonl") for l in open(c)]
    assert {w["id"] for w in written} == set(out)

    # --- re-ingest: the sink's native Esri payloads come back through
    # from_esri_json (the esri-dump direction) with geometry intact ---
    layer2 = tmp_path / "layer2.jsonl"
    with open(layer2, "w") as fh:  # the chunks as one re-published layer
        for c in sorted(sink.glob("chunk-*.jsonl")):
            fh.write(open(c).read())
    reingested = G.from_esri_json(
        spark.read.format("arcgis_sim").option("path", str(layer2)).load()
    )
    got = {r["id"]: (r["geom_type"], r["coords"]) for r in reingested.collect()}
    want = {
        r["id"]: (r["geom_type"], r["coords"])
        for r in G.reproject_web_mercator(
            routed.filter(F.col("route").isNotNull())
        ).collect()
    }
    assert got == want and len(got) == 4


def test_streaming_incoming_to_outgoing_loop(spark, layer, tmp_path):
    """The reference's full loop in STREAMING form: the scheduled-pull
    stream source pages the layer, the same incoming+outgoing
    transforms run on the unbounded DataFrame, and the streaming sink
    lands the shipped features — identical content to the batch chain
    (lambda-architecture parity for the whole pipeline, not just one
    operator)."""
    raw_batch = (
        spark.read.format("arcgis_sim").option("path", layer).load()
    )
    schema = raw_batch.schema

    def transforms(df):
        df = (
            df.withColumnRenamed("fid", "id")
            .withColumn(
                "properties", F.create_map(F.lit("callsign"), F.col("callsign"))
            )
        )
        inc = G.explode_multi(G.nest_metadata(G.rewrite_id(G.parse_geometry(df), 9)))
        routed = G.route_by_geom_type(inc)
        return G.to_esri_json(
            G.reproject_web_mercator(routed.filter(F.col("route").isNotNull()))
        ).select("id", "route", "esri_json")

    sink = tmp_path / "stream_sink"
    # the Python micro-batch source runs ONE batch per availableNow
    # trigger (no AvailableNow support -> single-batch fallback), so
    # each scheduled "wake" pulls one 2-row page; the shared checkpoint
    # carries the byte offset across wakes — the reference's cron loop.
    for _wake in range(6):
        stream = (
            spark.readStream.format("arcgis_sim")
            .schema(schema)
            .option("path", layer)
            .option("pageSize", 2)
            .option("pagesPerBatch", 1)
            .load()
        )
        q = (
            transforms(stream)
            .writeStream.format("arcgis_sim")
            .option("path", str(sink))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        landed = sum(1 for c in sink.glob("chunk-*.jsonl") for _ in open(c))
        if landed >= 4:
            break

    got = {
        json.loads(l)["id"]: json.loads(l)["esri_json"]
        for c in sink.glob("chunk-*.jsonl")
        for l in open(c)
    }
    want = {r["id"]: r["esri_json"] for r in transforms(raw_batch).collect()}
    assert got == want and len(got) == 4
    # paged into multiple micro-batches -> multiple commit epochs
    assert len(list(sink.glob("_committed_*"))) >= 2


def test_medallion_bronze_cdf_silver(spark, tmp_path):
    """End-to-end lakehouse composition (the medallion architecture on
    this engine's own pieces): raw events stream -> keyed ACID bronze
    table (acid_upsert_sink) -> acid_cdf streaming source tails the
    bronze commits -> incremental silver aggregate. The silver side
    consumes ONLY the change feed — no bronze re-scan — and must agree
    with a from-scratch aggregate over the bronze table.
    """
    import shutil as _sh

    from pyspark.sql import functions as F

    from etl_arcgis_spark import acid
    from etl_arcgis_spark.sources.acid_cdf import register
    from etl_arcgis_spark.streaming.pipelines import acid_upsert_sink
    from etl_arcgis_spark.tables import prepare, table

    prepare(spark)
    register(spark)
    sf = "/root/testdata/sf0.001"
    src_dir = tmp_path / "raw_in"
    src_dir.mkdir()
    _sh.copy(f"{sf}/events.parquet", src_dir / "part-0.parquet")
    bronze = str(tmp_path / "bronze")

    # ---- bronze: keyed last-write-wins ACID table from the stream
    schema = table(spark, sf, "events").schema
    stream = spark.readStream.schema(schema).parquet(str(src_dir))
    q = acid_upsert_sink(stream, bronze).trigger(availableNow=True).start()
    q.awaitTermination(120)
    v1 = acid.current_version(bronze)
    assert v1 is not None

    # ---- silver: tail the bronze CDF and maintain a per-key count +
    # sum of CURRENT values incrementally (insert/update deltas)
    silver_out = str(tmp_path / "silver")
    cdf = (
        spark.readStream.format("acid_cdf")
        .option("root", bronze)
        .option("startingVersion", 1)
        .load()
    )
    qs = (
        cdf.writeStream.outputMode("append")
        .format("parquet")
        .option("path", silver_out)
        .option("checkpointLocation", str(tmp_path / "ck_silver"))
        .trigger(availableNow=True)
        .start()
    )
    qs.awaitTermination(120)
    feed = spark.read.parquet(silver_out)
    # reconstruct current state from the feed alone
    net = (
        feed.withColumn(
            "w",
            F.when(F.col("_change_type").isin("insert", "update_postimage"), 1)
            .when(F.col("_change_type").isin("delete", "update_preimage"), -1),
        )
        .groupBy("user_id")
        .agg(
            F.sum("w").alias("n_live"),
            F.round(F.sum(F.col("value") * F.col("w")), 4).alias("cur_value"),
        )
        .filter(F.col("n_live") > 0)
    )
    want = (
        acid.read(spark, bronze)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_live"),
            F.round(F.sum("value"), 4).alias("cur_value"),
        )
    )
    got_rows = sorted(map(tuple, net.collect()))
    want_rows = sorted(map(tuple, want.collect()))
    assert got_rows == want_rows and len(got_rows) > 0

    # ---- a second bronze commit flows through the SAME checkpoint
    upd = spark.createDataFrame(
        [(10**9, acid.read(spark, bronze).select("user_id").first()[0], 999.0)],
        "event_id LONG, user_id LONG, value DOUBLE",
    ).withColumn("us", F.lit(10**18))
    acid.merge(spark, bronze, upd.select("user_id", "us", "event_id", "value"))
    qs2 = (
        spark.readStream.format("acid_cdf")
        .option("root", bronze)
        .option("startingVersion", 1)
        .load()
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", silver_out)
        .option("checkpointLocation", str(tmp_path / "ck_silver"))
        .trigger(availableNow=True)
        .start()
    )
    qs2.awaitTermination(120)
    feed2 = spark.read.parquet(silver_out)
    assert feed2.filter(F.col("_commit_version") > v1).count() > 0
    net2 = (
        feed2.withColumn(
            "w",
            F.when(F.col("_change_type").isin("insert", "update_postimage"), 1)
            .when(F.col("_change_type").isin("delete", "update_preimage"), -1),
        )
        .groupBy("user_id")
        .agg(F.round(F.sum(F.col("value") * F.col("w")), 4).alias("cur_value"))
    )
    want2 = (
        acid.read(spark, bronze)
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 4).alias("cur_value"))
    )
    assert sorted(map(tuple, net2.collect())) == sorted(map(tuple, want2.collect()))
