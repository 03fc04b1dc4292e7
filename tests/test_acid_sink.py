"""C223: acid_sink — transactional streaming APPEND via the Python
DataSource writer API: end-to-end file-stream write, snapshot/commit
metadata, exactly-once batch replay, and abort cleanup."""

from __future__ import annotations

import os

import pytest

from etl_arcgis_spark import acid
from etl_arcgis_spark.sources.acid_sink import (

    AcidStreamWriter,
    _StagedFile,
    register,
)


# Slow tier (optimization r13, VERDICT r12 order #2): heavyweight
# subprocess/streaming/property suite — excluded from the default
# pytest run (pytest.ini), executed with `-m slow`.
pytestmark = pytest.mark.slow


def _mk_table(spark, tmp_path):
    root = str(tmp_path / "t")
    acid.create(
        spark,
        root,
        spark.createDataFrame([(0, 0, "seed")], "id INT, x INT, v STRING"),
        key="id",
    )
    return root


def test_stream_append_end_to_end(spark, tmp_path):
    root = _mk_table(spark, tmp_path)
    src_dir = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, i * 10, f"v{i}") for i in range(1, 6)], "id INT, x INT, v STRING"
    ).coalesce(1).write.parquet(src_dir)
    register(spark)
    stream = spark.readStream.schema("id INT, x INT, v STRING").parquet(src_dir)
    q = (
        stream.writeStream.format("acid_sink")
        .option("root", root)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = acid.read(spark, root)
    assert out.count() == 6  # seed + 5 streamed
    man = acid._read_manifest(root, acid.current_version(root))
    assert man["operation"] == "stream_append"
    # no explicit sinkId: the ledger key derives from the checkpoint
    # location (per-query, stable across restarts) — never a shared
    # 'default' (ADVICE r10)
    (sink_key,) = man["stream_sinks"]
    assert sink_key.startswith("ckpt-")
    assert man["stream_sinks"][sink_key] == 0
    # snapshot protocol intact: history shows the stream commit,
    # time travel still reaches the pre-stream table
    assert acid.read(spark, root, version=1).count() == 1


def test_exactly_once_replayed_batch_is_noop(spark, tmp_path):
    root = _mk_table(spark, tmp_path)
    w = AcidStreamWriter({"root": root, "sinkid": "q1"}, None)
    # fabricate a staged file like an executor write would
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.join(root, ".stream-stage"), exist_ok=True)
    rel = os.path.join(".stream-stage", "aa.parquet")
    pq.write_table(
        pa.table({"id": [7], "x": [70], "v": ["s"]}),
        os.path.join(root, rel),
    )
    w.commit([_StagedFile(rel_path=rel, rows=1)], batchId=3)
    v_after = acid.current_version(root)
    assert acid.read(spark, root).count() == 2
    # replay the SAME batch id (restart semantics): no-op, no version
    rel2 = os.path.join(".stream-stage", "bb.parquet")
    pq.write_table(
        pa.table({"id": [7], "x": [70], "v": ["s"]}),
        os.path.join(root, rel2),
    )
    w.commit([_StagedFile(rel_path=rel2, rows=1)], batchId=3)
    assert acid.current_version(root) == v_after
    assert acid.read(spark, root).count() == 2
    assert not os.path.exists(os.path.join(root, rel2))
    # a LATER batch commits normally
    rel3 = os.path.join(".stream-stage", "cc.parquet")
    pq.write_table(
        pa.table({"id": [8], "x": [80], "v": ["t"]}),
        os.path.join(root, rel3),
    )
    w.commit([_StagedFile(rel_path=rel3, rows=1)], batchId=4)
    assert acid.read(spark, root).count() == 3


def test_sink_id_required_and_queries_never_share_a_ledger(spark, tmp_path):
    """ADVICE r10: no sinkId and no checkpointLocation -> refuse (a
    shared 'default' key silently discards the second query's batches);
    two queries with different checkpoints get distinct derived keys,
    so one's batchId can't mark the other's batches as replays."""
    root = _mk_table(spark, tmp_path)
    with pytest.raises(ValueError, match="sinkId"):
        AcidStreamWriter({"root": root}, None)
    wa = AcidStreamWriter(
        {"root": root, "checkpointlocation": str(tmp_path / "ck_a")}, None
    )
    wb = AcidStreamWriter(
        {"root": root, "checkpointlocation": str(tmp_path / "ck_b")}, None
    )
    assert wa.sink_id != wb.sink_id
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.join(root, ".stream-stage"), exist_ok=True)
    sch = pa.schema([("id", pa.int32()), ("x", pa.int32()), ("v", pa.string())])
    # query A commits batch 5; query B then commits batch 0 — with a
    # shared ledger B's batch would be treated as a replay and dropped
    rel_a = os.path.join(".stream-stage", "qa.parquet")
    pq.write_table(
        pa.table({"id": [21], "x": [1], "v": ["a"]}, schema=sch),
        os.path.join(root, rel_a),
    )
    wa.commit([_StagedFile(rel_path=rel_a, rows=1)], batchId=5)
    rel_b = os.path.join(".stream-stage", "qb.parquet")
    pq.write_table(
        pa.table({"id": [22], "x": [2], "v": ["b"]}, schema=sch),
        os.path.join(root, rel_b),
    )
    wb.commit([_StagedFile(rel_path=rel_b, rows=1)], batchId=0)
    assert acid.read(spark, root).filter("id = 22").count() == 1
    man = acid._read_manifest(root, acid.current_version(root))
    assert man["stream_sinks"][wa.sink_id] == 5
    assert man["stream_sinks"][wb.sink_id] == 0


def test_abort_discards_staged(spark, tmp_path):
    root = _mk_table(spark, tmp_path)
    w = AcidStreamWriter({"root": root, "sinkid": "q1"}, None)
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.join(root, ".stream-stage"), exist_ok=True)
    rel = os.path.join(".stream-stage", "zz.parquet")
    pq.write_table(pa.table({"id": [9]}), os.path.join(root, rel))
    w.abort([_StagedFile(rel_path=rel, rows=1)], batchId=9)
    assert not os.path.exists(os.path.join(root, rel))
    assert acid.read(spark, root).count() == 1  # table untouched


def test_overwrite_mode_rejected(spark, tmp_path):
    from etl_arcgis_spark.sources.acid_sink import AcidSinkDataSource

    ds = AcidSinkDataSource(options={"root": str(tmp_path)})
    with pytest.raises(ValueError, match="append-only"):
        ds.streamWriter(None, True)
