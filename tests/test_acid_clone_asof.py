"""Shallow clone + timestamp time travel for the acid table format."""

from __future__ import annotations

import pytest

import glob
import os
import time

from etl_arcgis_spark import acid



# Slow tier (optimization r13, VERDICT r12 order #2): heavyweight
# subprocess/streaming/property suite — excluded from the default
# pytest run (pytest.ini), executed with `-m slow`.
pytestmark = pytest.mark.slow


def _mk(spark, tmp_path, name, rows):
    root = str(tmp_path / name)
    df = spark.createDataFrame(rows, "id INT, v STRING").coalesce(1)
    acid.create(spark, root, df, key="id")
    return root


def test_clone_shares_files_then_diverges(spark, tmp_path):
    src = _mk(spark, tmp_path, "src", [(1, "a"), (2, "b"), (3, "c")])
    dst = str(tmp_path / "dst")
    assert acid.clone(spark, src, dst) == 1
    # zero data IO: the clone's data dir doesn't even exist yet
    assert not glob.glob(os.path.join(dst, "data", "*.parquet"))
    got = sorted((r.id, r.v) for r in acid.read(spark, dst).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    # divergence: merge on the clone rewrites INTO the clone only
    acid.merge(spark, dst, spark.createDataFrame([(2, "B!")], "id INT, v STRING"))
    assert glob.glob(os.path.join(dst, "data", "*.parquet"))
    got_dst = {r.id: r.v for r in acid.read(spark, dst).collect()}
    got_src = {r.id: r.v for r in acid.read(spark, src).collect()}
    assert got_dst == {1: "a", 2: "B!", 3: "c"}
    assert got_src == {1: "a", 2: "b", 3: "c"}  # source untouched
    # and the reverse: source writes never affect the pinned clone v1
    acid.append(spark, src, spark.createDataFrame([(9, "z")], "id INT, v STRING"))
    assert 9 not in {r.id for r in acid.read(spark, dst).collect()}


def test_clone_partitioned_source_layout_recovery(spark, tmp_path):
    src = str(tmp_path / "psrc")
    df = spark.createDataFrame(
        [(1, "p0", 1.0), (2, "p1", 2.0), (3, "p0", 3.0)],
        "id INT, p STRING, x DOUBLE",
    )
    acid.create(spark, src, df, key="id", partition_by="p")
    dst = str(tmp_path / "pdst")
    acid.clone(spark, src, dst)
    # partition column recovers from the SOURCE's directory layout
    got = sorted((r.id, r.p) for r in acid.read(spark, dst).collect())
    assert got == [(1, "p0"), (2, "p1"), (3, "p0")]
    got_p = sorted(r.id for r in acid.read_partition(spark, dst, ["p0"]).collect())
    assert got_p == [1, 3]


def test_clone_carries_mor_overlay(spark, tmp_path):
    src = _mk(spark, tmp_path, "msrc", [(i, f"v{i}") for i in range(1, 6)])
    acid.delete_where_mor(spark, src, "id = 3")
    dst = str(tmp_path / "mdst")
    acid.clone(spark, src, dst)
    got = sorted(r.id for r in acid.read(spark, dst).collect())
    assert got == [1, 2, 4, 5]  # overlay applied through external paths
    man = acid._read_manifest(dst, 1)
    assert man["rows"] == 4 and man["deletes"]


def test_timestamp_time_travel(spark, tmp_path):
    root = _mk(spark, tmp_path, "asof", [(1, "a")])
    t1 = time.time()
    time.sleep(0.05)
    acid.append(spark, root, spark.createDataFrame([(2, "b")], "id INT, v STRING"))
    t2 = time.time()
    time.sleep(0.05)
    acid.append(spark, root, spark.createDataFrame([(3, "c")], "id INT, v STRING"))
    assert acid.version_as_of(root, t1) == 1
    assert acid.version_as_of(root, t2) == 2
    assert acid.version_as_of(root, time.time()) == 3
    assert sorted(r.id for r in acid.read_as_of(spark, root, t2).collect()) == [1, 2]
    import pytest as _pt

    with _pt.raises(ValueError, match="no snapshot"):
        acid.version_as_of(root, t1 - 3600)
    # restore() re-stamps: the restored snapshot is the latest AS OF now
    acid.restore(spark, root, 1)
    assert acid.version_as_of(root, time.time()) == 4
    assert sorted(r.id for r in acid.read_as_of(spark, root, time.time()).collect()) == [1]
