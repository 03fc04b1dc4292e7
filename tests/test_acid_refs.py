"""Iceberg named refs (VERDICT r9 #4): writable branches (in-table
shallow clones), immutable tags, fast-forward publish with file
re-homing, policy-driven snapshot expiration, and ref-aware vacuum."""

from __future__ import annotations

import os
import time

import pytest

from etl_arcgis_spark import acid



# Slow tier (optimization r13, VERDICT r12 order #2): heavyweight
# subprocess/streaming/property suite — excluded from the default
# pytest run (pytest.ini), executed with `-m slow`.
pytestmark = pytest.mark.slow


def _mk(spark, tmp_path, name="t", n=8):
    root = str(tmp_path / name)
    df = spark.createDataFrame(
        [(i, i * 10, f"v{i}") for i in range(1, n + 1)],
        "id INT, x INT, v STRING",
    ).coalesce(2)
    acid.create(spark, root, df, key="id")
    return root


def test_branch_divergent_write_isolated(spark, tmp_path):
    root = _mk(spark, tmp_path)
    acid.create_branch(spark, root, "dev")
    acid.append(
        spark, acid.branch_root(root, "dev"),
        spark.createDataFrame([(100, 1000, "b")], "id INT, x INT, v STRING"),
    )
    # main untouched, branch sees the append, zero data copied at fork
    assert acid.read(spark, root).count() == 8
    assert acid.read_branch(spark, root, "dev").count() == 9
    refs = acid.list_refs(root)
    assert refs["branches"]["dev"]["created_from"] == 1


def test_fast_forward_publish_and_cdf(spark, tmp_path):
    """Branch-divergent MERGE-ON-READ write -> fast-forward: main
    adopts the commits; CDF across the publish shows the branch's
    changes; dropping the branch cannot strand main (hardlinks)."""
    root = _mk(spark, tmp_path)
    acid.create_branch(spark, root, "dev")
    broot = acid.branch_root(root, "dev")
    acid.upsert_mor(
        spark, broot,
        spark.createDataFrame(
            [(3, -3, "up"), (50, 500, "new")], "id INT, x INT, v STRING"
        ),
    )  # branch v2: eq tombstone + same-seq insert
    acid.delete_where_mor(spark, broot, "id = 8")  # branch v3: positional
    head = acid.fast_forward(spark, root, "dev")
    assert head == 3  # fork v1 + two branch commits
    got = {r.id: r.x for r in acid.read(spark, root).collect()}
    assert got[3] == -3 and got[50] == 500 and 8 not in got
    assert len(got) == 8
    # the adopted manifests carry provenance + the MoR overlay
    man = acid._read_manifest(root, 2)
    assert man["published_from_branch"] == "dev"
    assert man["operation"] == "upsert_mor"
    assert man["deletes"]
    # CDF across the publish: ordinary main commits
    ch = sorted(
        (r["id"], r["_change_type"], r["_commit_version"])
        for r in acid.table_changes(spark, root, 1).collect()
    )
    assert (3, "delete", 2) in ch and (3, "insert", 2) in ch
    assert (50, "insert", 2) in ch
    assert (8, "delete", 3) in ch
    # branch ref survives, re-based; dropping it keeps main whole
    assert acid.list_refs(root)["branches"]["dev"]["created_from"] == 3
    acid.drop_ref(root, "dev")
    assert not os.path.exists(acid.branch_root(root, "dev"))
    assert acid.read(spark, root).count() == 8
    assert {r.id for r in acid.read(spark, root).collect()} == {
        1, 2, 3, 4, 5, 6, 7, 50,
    }


def test_fast_forward_conflict_when_main_advanced(spark, tmp_path):
    root = _mk(spark, tmp_path)
    acid.create_branch(spark, root, "dev")
    acid.append(
        spark, acid.branch_root(root, "dev"),
        spark.createDataFrame([(9, 90, "b")], "id INT, x INT, v STRING"),
    )
    acid.append(
        spark, root,
        spark.createDataFrame([(10, 100, "m")], "id INT, x INT, v STRING"),
    )  # main moved past the fork point
    with pytest.raises(acid.CommitConflict, match="not a fast-forward"):
        acid.fast_forward(spark, root, "dev")


def test_tag_immutability_and_time_travel(spark, tmp_path):
    root = _mk(spark, tmp_path)
    acid.create_tag(root, "rel-1.0")
    acid.delete_where(spark, root, "id <= 4")
    assert acid.read(spark, root).count() == 4
    assert acid.read_tag(spark, root, "rel-1.0").count() == 8
    with pytest.raises(ValueError, match="immutable"):
        acid.create_tag(root, "rel-1.0", version=2)
    with pytest.raises(ValueError, match="already exists"):
        acid.create_branch(spark, root, "rel-1.0")  # namespace is shared
    acid.drop_ref(root, "rel-1.0")
    acid.create_tag(root, "rel-1.0")  # re-creatable after drop
    assert acid.read_tag(spark, root, "rel-1.0").count() == 4


def test_expire_snapshots_policies_and_protection(spark, tmp_path):
    root = _mk(spark, tmp_path)
    for i in range(5):  # v2..v6
        acid.append(
            spark, root,
            spark.createDataFrame(
                [(100 + i, i, "a")], "id INT, x INT, v STRING"
            ),
        )
    acid.create_tag(root, "pin", version=2)
    acid.create_branch(spark, root, "dev", version=3)
    with pytest.raises(ValueError, match="keep_last or keep_since"):
        acid.expire_snapshots(root)
    expired = acid.expire_snapshots(root, keep_last=2)
    # v2 (tag), v3 (branch fork), v5, v6 (newest 2) survive; v1, v4 go
    assert expired == [1, 4]
    assert acid._list_versions(root) == [2, 3, 5, 6]
    assert acid.read_tag(spark, root, "pin").count() == 9
    assert acid.read_branch(spark, root, "dev").count() == 10
    with pytest.raises(FileNotFoundError):
        acid.read(spark, root, 4)
    # keep_since composition: everything is young, nothing expires
    assert acid.expire_snapshots(
        root, keep_last=1, keep_since=time.time() - 3600
    ) == []
    # drop the refs and the pins become expirable
    acid.drop_ref(root, "pin")
    acid.drop_ref(root, "dev")
    assert acid.expire_snapshots(root, keep_last=1) == [2, 3, 5]
    assert acid._list_versions(root) == [6]
    assert acid.read(spark, root).count() == 13


def test_vacuum_respects_refs(spark, tmp_path):
    """vacuum(keep_versions=1) must keep tag/branch-pinned manifests
    AND the data files only they reference."""
    root = _mk(spark, tmp_path)
    acid.create_tag(root, "pin")  # pins v1 and its files
    acid.delete_where(spark, root, "id <= 6")  # v2 rewrites both files
    acid.vacuum(root, keep_versions=1, grace_seconds=0)
    assert 1 in acid._list_versions(root)
    assert acid.read_tag(spark, root, "pin").count() == 8  # files alive
    # branch workspace files referenced from main survive main vacuum
    acid.create_branch(spark, root, "dev")
    acid.append(
        spark, acid.branch_root(root, "dev"),
        spark.createDataFrame([(9, 90, "b")], "id INT, x INT, v STRING"),
    )
    acid.vacuum(root, keep_versions=1, grace_seconds=0)
    assert acid.read_branch(spark, root, "dev").count() == 3


def test_branch_from_past_version(spark, tmp_path):
    root = _mk(spark, tmp_path)
    acid.append(
        spark, root,
        spark.createDataFrame([(9, 90, "m")], "id INT, x INT, v STRING"),
    )  # v2
    acid.create_branch(spark, root, "old", version=1)
    assert acid.read_branch(spark, root, "old").count() == 8
    with pytest.raises(acid.CommitConflict):
        acid.fast_forward(spark, root, "old")  # main at v2, fork at v1


def test_ref_name_validation(spark, tmp_path):
    root = _mk(spark, tmp_path)
    for bad in ("", "a/b", "../up", "a b"):
        with pytest.raises(ValueError, match="ref name"):
            acid.create_tag(root, bad)
    with pytest.raises(KeyError):
        acid.drop_ref(root, "nope")
