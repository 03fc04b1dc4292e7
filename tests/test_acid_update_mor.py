"""update_where_mor — the merge-on-read twin of the CoW predicate
UPDATE (VERDICT r9 #8): equality tombstone + same-seq re-insert, zero
rewrite; parity with update_where on visible rows; Delta-CDF
update_pre/postimage emission in BOTH table_changes and the streaming
acid_cdf source; the duplicate-key hazard gate; partition moves."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_arcgis_spark import acid



# Slow tier (optimization r13, VERDICT r12 order #2): heavyweight
# subprocess/streaming/property suite — excluded from the default
# pytest run (pytest.ini), executed with `-m slow`.
pytestmark = pytest.mark.slow


def _mk(spark, tmp_path, name="umor", n=10, nfiles=2):
    root = str(tmp_path / name)
    df = spark.createDataFrame(
        [(i, i * 10, f"v{i}") for i in range(1, n + 1)],
        "id INT, x INT, v STRING",
    ).coalesce(nfiles)
    acid.create(spark, root, df, key="id")
    return root


def test_update_mor_parity_with_cow(spark, tmp_path):
    """Same predicate + SET on two copies of a table: MoR and CoW
    produce identical visible rows; MoR rewrites NOTHING."""
    r_cow = _mk(spark, tmp_path, "cow")
    r_mor = _mk(spark, tmp_path, "mor")
    pred = "x >= 40 AND id <= 7"
    sets = {"x": "x + 1", "v": "concat(v, '!')"}
    acid.update_where(spark, r_cow, pred, sets)
    files_v1 = sorted(f["path"] for f in acid._read_manifest(r_mor, 1)["files"])
    v = acid.update_where_mor(spark, r_mor, pred, sets)
    man = acid._read_manifest(r_mor, v)
    # all v1 data files carried path-identical (plus new insert files)
    assert set(files_v1) <= {f["path"] for f in man["files"]}
    assert man["operation"] == "update_mor"
    assert man["updated_rows"] == 4  # ids 4..7
    assert man["rows"] == 10
    got = sorted(map(tuple, acid.read(spark, r_mor).collect()))
    want = sorted(map(tuple, acid.read(spark, r_cow).collect()))
    assert got == want
    # time travel intact
    assert sorted(r.x for r in acid.read(spark, r_mor, 1).collect()) == [
        10, 20, 30, 40, 50, 60, 70, 80, 90, 100,
    ]


def test_update_mor_cdf_pre_post_pairs(spark, tmp_path):
    """table_changes surfaces an update_mor commit as Delta-style
    update_preimage/postimage pairs, matching the CoW spelling."""
    r_cow = _mk(spark, tmp_path, "cdfcow")
    r_mor = _mk(spark, tmp_path, "cdfmor")
    pred = "id IN (3, 8)"
    sets = {"x": "x * -1"}
    acid.update_where(spark, r_cow, pred, sets)
    acid.update_where_mor(spark, r_mor, pred, sets)
    cow = sorted(
        (r["id"], r["x"], r["_change_type"])
        for r in acid.table_changes(spark, r_cow, 1).collect()
    )
    mor = sorted(
        (r["id"], r["x"], r["_change_type"])
        for r in acid.table_changes(spark, r_mor, 1).collect()
    )
    assert mor == cow
    assert (3, 30, "update_preimage") in mor
    assert (3, -30, "update_postimage") in mor
    assert (8, 80, "update_preimage") in mor
    assert (8, -80, "update_postimage") in mor
    assert len(mor) == 4


def test_update_mor_cdf_drops_identity_set(spark, tmp_path):
    """A SET that computes the old value is not a change: CoW's file
    diff drops the identical row, and the MoR pairing must too."""
    root = _mk(spark, tmp_path, "ident")
    acid.update_where_mor(spark, root, "id = 5", {"x": "x + 0"})
    assert acid.table_changes(spark, root, 1).count() == 0
    # ... but the row still moved files (tombstone + re-insert)
    man = acid._read_manifest(root, 2)
    assert man["updated_rows"] == 1
    assert len(man["deletes"]) == 1


def test_update_mor_stream_parity(spark, tmp_path):
    """The streaming acid_cdf source pairs update_mor commits into the
    same pre/post rows as table_changes."""
    from etl_arcgis_spark.sources.acid_cdf import register

    register(spark)
    root = _mk(spark, tmp_path, "stream", n=6)
    acid.update_where_mor(
        spark, root, "id <= 2", {"v": "concat(v, '+')"}
    )  # v2
    acid.update_where_mor(spark, root, "id = 999", {"x": "0"})  # v3 no-op
    q = (
        spark.readStream.format("acid_cdf")
        .option("root", root)
        .option("startingVersion", 2)
        .load()
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("cdf_umor")
        .option("checkpointLocation", str(tmp_path / "ck_umor"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["id"], r["v"], r["_change_type"], r["_commit_version"])
        for r in spark.sql("SELECT * FROM cdf_umor").collect()
    )
    want = sorted(
        (r["id"], r["v"], r["_change_type"], r["_commit_version"])
        for r in acid.table_changes(spark, root, 1).collect()
    )
    assert got == want
    assert (1, "v1", "update_preimage", 2) in got
    assert (1, "v1+", "update_postimage", 2) in got
    assert len(got) == 4
    assert all(cv != 3 for (_, _, _, cv) in got)  # no-op commit silent


def test_update_mor_duplicate_key_hazard_rejected(spark, tmp_path):
    """An unmatched row sharing a merge key with a matched row would be
    killed by the equality tombstone — rejected, CoW still works."""
    root = str(tmp_path / "dup")
    df = spark.createDataFrame(
        [(1, 10), (1, 99), (2, 20)], "id INT, x INT"
    ).coalesce(1)
    acid.create(spark, root, df, key="id")
    with pytest.raises(ValueError, match="share a merge key"):
        acid.update_where_mor(spark, root, "x = 10", {"x": "11"})
    # both duplicates matched is fine
    v = acid.update_where_mor(spark, root, "id = 1", {"x": "x + 1"})
    assert sorted(r.x for r in acid.read(spark, root, v).collect()) == [
        11, 20, 100,
    ]


def test_update_mor_partition_move(spark, tmp_path):
    """MoR re-inserts rows, so SET on the partition column is legal and
    rows relocate (CoW rejects this)."""
    root = str(tmp_path / "pmove")
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)],
        "id INT, part STRING, x INT",
    )
    acid.create(spark, root, df, key="id", partition_by="part")
    with pytest.raises(ValueError, match="partition column"):
        acid.update_where(spark, root, "id = 1", {"part": "'b'"})
    acid.update_where_mor(spark, root, "id = 1", {"part": "'b'"})
    got = sorted(
        (r.id, r.part) for r in acid.read(spark, root).collect()
    )
    assert got == [(1, "b"), (2, "a"), (3, "b")]
    # partition pruning sees the moved row in its NEW partition
    b_rows = acid.read_partition(spark, root, ["b"])
    assert sorted(r.id for r in b_rows.collect()) == [1, 3]


def test_update_mor_validations(spark, tmp_path):
    root = _mk(spark, tmp_path, "val")
    with pytest.raises(ValueError, match="merge key"):
        acid.update_where_mor(spark, root, "id = 1", {"id": "id + 100"})
    with pytest.raises(ValueError, match="not table columns"):
        acid.update_where_mor(spark, root, "id = 1", {"nope": "1"})
    with pytest.raises(ValueError, match="do not cast"):
        acid.update_where_mor(spark, root, "id = 1", {"x": "'abc'"})
    # NULL/UNKNOWN predicate rows are not updated
    root2 = str(tmp_path / "nullpred")
    df = spark.createDataFrame(
        [(1, None), (2, 5)], "id INT, x INT"
    ).coalesce(1)
    acid.create(spark, root2, df, key="id")
    acid.update_where_mor(spark, root2, "x > 0", {"x": "x + 1"})
    got = {r.id: r.x for r in acid.read(spark, root2).collect()}
    assert got == {1: None, 2: 6}


def test_update_mor_then_compact_and_vacuum(spark, tmp_path):
    """compact_deletes folds the update's tombstone away; rows survive
    with their updated values; no-op on an already-compacted table."""
    root = _mk(spark, tmp_path, "compact")
    acid.update_where_mor(spark, root, "id >= 9", {"x": "0"})
    v = acid.compact_deletes(spark, root)
    man = acid._read_manifest(root, v)
    assert not man.get("deletes")
    got = {r.id: r.x for r in acid.read(spark, root).collect()}
    assert got[9] == 0 and got[10] == 0 and got[1] == 10
    assert acid.read(spark, root).count() == 10


def test_update_mor_stacks_on_prior_overlay(spark, tmp_path):
    """update_mor over a table already carrying positional + equality
    deletes: the new tombstone composes with the existing overlay."""
    root = _mk(spark, tmp_path, "stack")
    acid.delete_where_mor(spark, root, "id = 1")  # positional
    acid.delete_eq(
        spark, root, spark.createDataFrame([(2,)], "id INT")
    )  # equality
    acid.update_where_mor(spark, root, "id IN (1, 2, 3)", {"x": "-1"})
    got = {r.id: r.x for r in acid.read(spark, root).collect()}
    # 1 and 2 are deleted, so only 3 matched the update
    assert 1 not in got and 2 not in got
    assert got[3] == -1 and got[4] == 40
    man = acid._read_manifest(root, acid.current_version(root))
    assert man["updated_rows"] == 1
