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
    assert man["stream_sinks"]["default"] == 0
    # snapshot protocol intact: history shows the stream commit,
    # time travel still reaches the pre-stream table
    assert acid.read(spark, root, version=1).count() == 1


def test_exactly_once_replayed_batch_is_noop(spark, tmp_path):
    root = _mk_table(spark, tmp_path)
    w = AcidStreamWriter({"root": root}, None)
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


def test_abort_discards_staged(spark, tmp_path):
    root = _mk_table(spark, tmp_path)
    w = AcidStreamWriter({"root": root}, None)
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
