"""Merge-on-read positional deletes (Iceberg v2 semantics) for the
acid table format: delete files instead of file rewrites, overlay
applied at every reader entry point, compact_deletes folds it back,
vacuum protects referenced overlay files, CDF surfaces MoR deletes."""

from __future__ import annotations

import pytest

import glob
import os

from pyspark.sql import functions as F

from etl_arcgis_spark import acid



# Slow tier (optimization r13, VERDICT r12 order #2): heavyweight
# subprocess/streaming/property suite — excluded from the default
# pytest run (pytest.ini), executed with `-m slow`.
pytestmark = pytest.mark.slow


def _mk(spark, tmp_path, name="mor", n=10):
    root = str(tmp_path / name)
    df = spark.createDataFrame(
        [(i, i * 10, f"v{i}") for i in range(1, n + 1)], "id INT, x INT, v STRING"
    ).coalesce(2)
    acid.create(spark, root, df, key="id")
    return root


def test_mor_delete_files_not_rewritten(spark, tmp_path):
    root = _mk(spark, tmp_path)
    files_v1 = sorted(f["path"] for f in acid._read_manifest(root, 1)["files"])
    v = acid.delete_where_mor(spark, root, "x >= 70")
    assert v == 2
    man = acid._read_manifest(root, 2)
    # data files carried PATH-IDENTICAL — the whole point of MoR
    assert sorted(f["path"] for f in man["files"]) == files_v1
    assert len(man["deletes"]) == 1
    assert man["deletes"][0]["rows"] == 4
    assert man["rows"] == 6
    got = sorted(r.id for r in acid.read(spark, root).collect())
    assert got == [1, 2, 3, 4, 5, 6]
    # time travel: v1 still sees everything
    assert acid.read(spark, root, 1).count() == 10


def test_mor_null_predicate_rows_survive(spark, tmp_path):
    root = str(tmp_path / "mornull")
    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, 100)], "id INT, x INT"
    ).coalesce(1)
    acid.create(spark, root, df, key="id")
    acid.delete_where_mor(spark, root, "x > 50")
    got = sorted(r.id for r in acid.read(spark, root).collect())
    assert got == [1, 2]  # NULL predicate -> row survives (SQL DELETE)


def test_mor_no_double_count_on_redelete(spark, tmp_path):
    root = _mk(spark, tmp_path)
    acid.delete_where_mor(spark, root, "x >= 70")
    v = acid.delete_where_mor(spark, root, "x >= 50")  # overlaps prior
    man = acid._read_manifest(root, v)
    # positions captured AFTER the existing overlay: only ids 5, 6 new
    assert man["deleted_rows"] == 2
    assert man["rows"] == 4
    assert sorted(r.id for r in acid.read(spark, root).collect()) == [1, 2, 3, 4]


def test_mor_compact_deletes_roundtrip(spark, tmp_path):
    root = _mk(spark, tmp_path)
    acid.delete_where_mor(spark, root, "id IN (2, 4)")
    before = sorted((r.id, r.x, r.v) for r in acid.read(spark, root).collect())
    v = acid.compact_deletes(spark, root)
    man = acid._read_manifest(root, v)
    assert not man.get("deletes")
    assert man["rows"] == 8
    after = sorted((r.id, r.x, r.v) for r in acid.read(spark, root).collect())
    assert after == before
    # idempotent no-op when nothing to compact
    assert acid.compact_deletes(spark, root) == v


def test_mor_compact_rewrites_only_targeted_files(spark, tmp_path):
    root = str(tmp_path / "mortgt")
    # two files with disjoint id ranges; delete only touches file 1
    df1 = spark.createDataFrame([(i, i) for i in range(1, 6)], "id INT, x INT").coalesce(1)
    acid.create(spark, root, df1, key="id")
    df2 = spark.createDataFrame([(i, i) for i in range(10, 16)], "id INT, x INT").coalesce(1)
    acid.append(spark, root, df2)
    acid.delete_where_mor(spark, root, "id = 3")
    man_pre = acid._read_manifest(root, acid.current_version(root))
    targeted = set()
    for e in man_pre["deletes"]:
        targeted.update(e["targets"].keys())
    untargeted_paths = {
        f["path"]
        for f in man_pre["files"]
        if os.path.basename(f["path"]) not in targeted
    }
    assert untargeted_paths  # the second file is untouched
    v = acid.compact_deletes(spark, root)
    man_post = acid._read_manifest(root, v)
    # untargeted files carried path-identical through the compaction
    assert untargeted_paths <= {f["path"] for f in man_post["files"]}
    assert sorted(r.id for r in acid.read(spark, root).collect()) == [
        1, 2, 4, 5, 10, 11, 12, 13, 14, 15,
    ]


def test_mor_interleaves_with_cow_ops(spark, tmp_path):
    root = _mk(spark, tmp_path)
    acid.delete_where_mor(spark, root, "id = 1")
    # append: overlay carries, new rows visible
    acid.append(spark, root, spark.createDataFrame([(11, 110, "v11")], "id INT, x INT, v STRING"))
    assert sorted(r.id for r in acid.read(spark, root).collect()) == list(range(2, 12))
    man = acid._read_manifest(root, acid.current_version(root))
    assert man["rows"] == 10 and man.get("deletes")
    # merge updating an UNDELETED key: rows metadata stays exact
    src = spark.createDataFrame([(5, 500, "upd")], "id INT, x INT, v STRING")
    acid.merge(spark, root, src)
    man = acid._read_manifest(root, acid.current_version(root))
    assert man["rows"] == 10
    got = {r.id: r.x for r in acid.read(spark, root).collect()}
    assert got[5] == 500 and 1 not in got
    # CoW update_where on the MoR table: overlay still applies after
    acid.update_where(spark, root, "id = 2", {"x": "999"})
    got = {r.id: r.x for r in acid.read(spark, root).collect()}
    assert got[2] == 999 and 1 not in got and len(got) == 10
    # CoW delete_where: counts post-overlay, overlay carried
    acid.delete_where(spark, root, "id IN (1, 3)")  # 1 already MoR-deleted
    man = acid._read_manifest(root, acid.current_version(root))
    assert man["rows"] == 9
    assert sorted(r.id for r in acid.read(spark, root).collect()) == [
        2, 4, 5, 6, 7, 8, 9, 10, 11,
    ]


def test_mor_partitioned_table(spark, tmp_path):
    root = str(tmp_path / "morpart")
    df = spark.createDataFrame(
        [(i, f"p{i % 2}", i * 1.0) for i in range(1, 9)],
        "id INT, p STRING, x DOUBLE",
    )
    acid.create(spark, root, df, key="id", partition_by="p")
    acid.delete_where_mor(spark, root, "x >= 6.0")
    assert sorted(r.id for r in acid.read(spark, root).collect()) == [1, 2, 3, 4, 5]
    # partition-pruned read applies the overlay too (single chokepoint)
    got = sorted(r.id for r in acid.read_partition(spark, root, ["p1"]).collect())
    assert got == [1, 3, 5]


def test_mor_vacuum_protects_then_collects(spark, tmp_path):
    root = _mk(spark, tmp_path)
    acid.delete_where_mor(spark, root, "id = 1")
    # referenced overlay file survives even grace-0 vacuum
    deleted = acid.vacuum(root, grace_seconds=0.0)
    assert glob.glob(os.path.join(root, "deletes", "*.parquet"))
    assert acid.read(spark, root).count() == 9
    # compact + two more versions -> the overlay's referencing
    # manifests expire (keep_versions=2), grace-0 vacuum collects it
    acid.compact_deletes(spark, root)
    acid.append(spark, root, spark.createDataFrame([(21, 1, "a")], "id INT, x INT, v STRING"))
    acid.append(spark, root, spark.createDataFrame([(22, 2, "b")], "id INT, x INT, v STRING"))
    deleted = acid.vacuum(root, grace_seconds=0.0)
    assert any(os.sep + "deletes" + os.sep in p for p in deleted)
    assert glob.glob(os.path.join(root, "deletes", "*.parquet")) == []
    assert acid.read(spark, root).count() == 11


def test_mor_cdf_emits_delete_rows(spark, tmp_path):
    root = _mk(spark, tmp_path, n=6)
    acid.delete_where_mor(spark, root, "id IN (2, 5)")
    ch = acid.table_changes(spark, root, 1).collect()
    dels = sorted(
        (r.id, r._commit_version) for r in ch if r._change_type == "delete"
    )
    assert dels == [(2, 2), (5, 2)]
    # pre-image content is the deleted row, not a null shell
    by_id = {r.id: r for r in ch if r._change_type == "delete"}
    assert by_id[2].x == 20 and by_id[2].v == "v2"
    # a second MoR delete only emits ITS OWN rows (parent overlay
    # excluded from the pre-image)
    acid.delete_where_mor(spark, root, "id <= 3")
    ch2 = acid.table_changes(spark, root, 2).collect()
    dels2 = sorted(r.id for r in ch2 if r._change_type == "delete")
    assert dels2 == [1, 3]  # id 2 already deleted at v2


def test_mor_restore_brings_overlay_back(spark, tmp_path):
    root = _mk(spark, tmp_path)
    acid.delete_where_mor(spark, root, "id = 1")       # v2
    acid.compact_deletes(spark, root)                  # v3: overlay folded
    acid.restore(spark, root, 2)                       # v4 = v2's state
    man = acid._read_manifest(root, 4)
    assert man.get("deletes")
    assert sorted(r.id for r in acid.read(spark, root).collect()) == list(range(2, 11))


def test_mor_with_staged_wap_merge(spark, tmp_path):
    """Interplay: a Write-Audit-Publish staged merge on a table with a
    MoR overlay must carry the deletes into the audit manifest (the
    staged snapshot is overlay-correct when audited AND when
    published), and vacuum must protect the overlay while staged."""
    root = str(tmp_path / "morwap")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(1, 6)], "id INT, v STRING"
    ).coalesce(1)
    acid.create(spark, root, df, key="id")
    acid.delete_where_mor(spark, root, "id = 2")
    token = acid.merge(
        spark, root,
        spark.createDataFrame([(9, "nine")], "id INT, v STRING"),
        staged=True,
    )
    staged = sorted(r.id for r in acid.read_staged(spark, root, token).collect())
    assert staged == [1, 3, 4, 5, 9]  # overlay applied in the audit read
    assert acid.vacuum(root, grace_seconds=0.0) == [] or all(
        "deletes" not in p for p in acid.vacuum(root, grace_seconds=0.0)
    )
    acid.publish_staged(root, token)
    got = sorted(r.id for r in acid.read(spark, root).collect())
    assert got == [1, 3, 4, 5, 9]
    assert acid._read_manifest(root, acid.current_version(root)).get("deletes")


def test_mor_zorder_resolves_overlay(spark, tmp_path):
    """Interplay: OPTIMIZE ZORDER rewrites every file (reads apply the
    overlay), so the new snapshot needs no deletes and reads equal."""
    root = str(tmp_path / "morz")
    df = spark.createDataFrame(
        [(i, i % 5, i * 2, "x") for i in range(1, 21)],
        "id INT, a INT, b INT, v STRING",
    ).coalesce(2)
    acid.create(spark, root, df, key="id")
    acid.delete_where_mor(spark, root, "id IN (3, 7, 11)")
    before = sorted(r.id for r in acid.read(spark, root).collect())
    v = acid.compact_zorder(spark, root, ("a", "b"))
    man = acid._read_manifest(root, v)
    assert not man.get("deletes")
    assert man["rows"] == 17
    after = sorted(r.id for r in acid.read(spark, root).collect())
    assert after == before == [i for i in range(1, 21) if i not in (3, 7, 11)]


def test_cdf_emits_nothing_over_compact_deletes(spark, tmp_path):
    """ADVICE r8 (high): the CDF pre-image must read removed files under
    the PARENT manifest's overlay. compact_deletes publishes with no
    `deletes` key, so a child-manifest read re-exposed rows already
    deleted at the delete_mor commit as phantom 'delete' events — Delta
    CDF emits NOTHING for OPTIMIZE/compaction commits."""
    root = _mk(spark, tmp_path, name="cdfcomp")
    acid.delete_where_mor(spark, root, "id IN (2, 5)")  # v2
    v = acid.compact_deletes(spark, root)               # v3: maintenance
    assert acid.table_changes(spark, root, 2, v).count() == 0
    # the whole-range feed still carries exactly the v2 deletes once
    ch = acid.table_changes(spark, root, 1, v).collect()
    dels = sorted((r.id, r._commit_version) for r in ch if r._change_type == "delete")
    assert dels == [(2, 2), (5, 2)]


def test_cdf_emits_nothing_over_zorder_after_mor(spark, tmp_path):
    root = str(tmp_path / "cdfz")
    df = spark.createDataFrame(
        [(i, i % 4, i * 3) for i in range(1, 13)], "id INT, a INT, b INT"
    ).coalesce(2)
    acid.create(spark, root, df, key="id")
    acid.delete_where_mor(spark, root, "id IN (4, 9)")  # v2
    v = acid.compact_zorder(spark, root, ("a", "b"))    # v3 resolves overlay
    assert acid.table_changes(spark, root, 2, v).count() == 0


def test_mor_staging_dir_cleaned(spark, tmp_path):
    """ADVICE r8 (low): delete_where_mor must not leave .stage-* dirs
    (_SUCCESS, .crc, zero-row parts) behind under root."""
    root = _mk(spark, tmp_path, name="stageclean")
    acid.delete_where_mor(spark, root, "id >= 8")
    assert glob.glob(os.path.join(root, ".stage-*")) == []


def test_vacuum_sweeps_stage_dir_with_dotfiles(spark, tmp_path):
    """ADVICE r8 (low): a crashed writer's .stage-* dir contains
    DOTFILES (.part-*.crc); vacuum's old glob('*')+rmdir missed them
    and the dir was immortal. rmtree collects it once aged."""
    root = _mk(spark, tmp_path, name="stalestage")
    stale = os.path.join(root, ".stage-deadbeef")
    os.makedirs(stale)
    for fn in ("_SUCCESS", ".part-0000.crc", "part-0000.parquet"):
        with open(os.path.join(stale, fn), "w") as fh:
            fh.write("x")
    old = 0
    os.utime(stale, (old, old))
    deleted = acid.vacuum(root, grace_seconds=3600.0)
    assert stale in deleted and not os.path.exists(stale)


def test_version_as_of_mtime_fallback(spark, tmp_path):
    """ADVICE r8 (low): manifests published before commit stamping
    (no committed_at) fall back to the manifest file's mtime instead
    of being invisible to timestamp travel."""
    import json as _json
    import time as _time

    root = _mk(spark, tmp_path, name="asofold")
    mp = acid._manifest_path(root, 1)
    man = _json.load(open(mp))
    del man["committed_at"]  # simulate a pre-upgrade manifest
    with open(mp, "w") as fh:
        _json.dump(man, fh)
    assert acid.version_as_of(root, _time.time() + 60) == 1
    assert acid.read_as_of(spark, root, _time.time() + 60).count() == 10


def test_reserved_mor_columns_rejected(spark, tmp_path):
    """ADVICE r8 (low): user columns named __mor_* would collide with
    the hidden row-identity metadata and corrupt MoR reads (the
    post-overlay drop() removes BOTH copies) — rejected at create,
    append and merge."""
    import pytest

    bad = spark.createDataFrame([(1, "a")], "id INT, __mor_file STRING")
    with pytest.raises(ValueError, match="reserved"):
        acid.create(spark, str(tmp_path / "resv1"), bad, key="id")
    root = _mk(spark, tmp_path, name="resv2")
    with pytest.raises(ValueError, match="reserved"):
        acid.append(spark, root, bad)
    with pytest.raises(ValueError, match="reserved"):
        acid.merge(spark, root, bad)
