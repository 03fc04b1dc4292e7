"""C221: metadata-only RENAME COLUMN (Iceberg field-ID analogue) —
mixed-physical-schema reads, chained renames, rename-the-key,
restrictions, write paths after rename, CDF across a rename, and lazy
physical migration via compaction."""

from __future__ import annotations

import json
import os

import pytest

from etl_arcgis_spark import acid



# Slow tier (optimization r13, VERDICT r12 order #2): heavyweight
# subprocess/streaming/property suite — excluded from the default
# pytest run (pytest.ini), executed with `-m slow`.
pytestmark = pytest.mark.slow


def _mk(spark, tmp_path, name="t", n=6):
    root = str(tmp_path / name)
    df = spark.createDataFrame(
        [(i, i * 10, f"v{i}") for i in range(1, n + 1)],
        "id INT, x INT, v STRING",
    ).coalesce(2)
    acid.create(spark, root, df, key="id")
    return root


def test_rename_is_metadata_only_and_reads_mixed(spark, tmp_path):
    root = _mk(spark, tmp_path)
    files_before = {
        f["path"]
        for f in acid._read_manifest(root, 1)["files"]
    }
    v = acid.rename_column(spark, root, "x", "amount")
    assert v == 2
    man = acid._read_manifest(root, 2)
    # metadata only: identical data file paths, no new files on disk
    assert {f["path"] for f in man["files"]} == files_before
    out = acid.read(spark, root)
    assert "amount" in out.columns and "x" not in out.columns
    assert sorted(r["amount"] for r in out.collect()) == [10, 20, 30, 40, 50, 60]
    # mixed: append NEW-name data, read both generations together
    acid.append(
        spark,
        root,
        spark.createDataFrame([(100, 999, "new")], "id INT, amount INT, v STRING"),
    )
    got = {r["id"]: r["amount"] for r in acid.read(spark, root).collect()}
    assert got[100] == 999 and got[3] == 30


def test_chained_rename_and_key_rename(spark, tmp_path):
    root = _mk(spark, tmp_path)
    acid.rename_column(spark, root, "x", "amount")
    acid.rename_column(spark, root, "amount", "total")  # chains to physical 'x'
    man = acid._read_manifest(root, acid.current_version(root))
    al = man["files"][0]["aliases"]
    assert al == {"total": "x"}  # chain collapsed, no dangling 'amount'
    assert sorted(
        r["total"] for r in acid.read(spark, root).collect()
    ) == [10, 20, 30, 40, 50, 60]
    # rename the MERGE KEY: merges still prune/match on values
    acid.rename_column(spark, root, "id", "pk")
    acid.merge(
        spark,
        root,
        spark.createDataFrame([(3, 333, "u")], "pk INT, total INT, v STRING"),
    )
    got = {r["pk"]: r["total"] for r in acid.read(spark, root).collect()}
    assert got[3] == 333 and len(got) == 6


def test_rename_restrictions(spark, tmp_path):
    root = str(tmp_path / "tp")
    df = spark.createDataFrame(
        [(1, "a", 5), (2, "b", 6)], "id INT, part STRING, x INT"
    )
    acid.create(spark, root, df, key="id", partition_by="part")
    with pytest.raises(ValueError, match="partition column"):
        acid.rename_column(spark, root, "part", "category")
    with pytest.raises(ValueError, match="no column"):
        acid.rename_column(spark, root, "nope", "y")
    with pytest.raises(ValueError, match="already exists"):
        acid.rename_column(spark, root, "x", "id")
    acid.add_constraint(spark, root, "x_pos", "x > 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        acid.rename_column(spark, root, "x", "amount")
    acid.drop_constraint(root, "x_pos")
    acid.rename_column(spark, root, "x", "amount")
    assert "amount" in acid.read(spark, root).columns


def test_rename_with_updates_and_cdf(spark, tmp_path):
    root = _mk(spark, tmp_path)
    acid.rename_column(spark, root, "x", "amount")
    # predicate update under the NEW name over OLD-name physical files
    acid.update_where(spark, root, "id = 2", {"amount": "amount + 5"})
    got = {r["id"]: r["amount"] for r in acid.read(spark, root).collect()}
    assert got[2] == 25
    # CDF across the rename-spanning update reads pre-images from
    # old-physical files under the logical name
    changes = acid.table_changes(spark, root, 2, 3).collect()
    kinds = {(r["_change_type"], r["amount"]) for r in changes}
    assert ("update_preimage", 20) in kinds
    assert ("update_postimage", 25) in kinds


def test_compaction_migrates_physical_names(spark, tmp_path):
    root = _mk(spark, tmp_path)
    acid.rename_column(spark, root, "x", "amount")
    acid.compact(spark, root)
    man = acid._read_manifest(root, acid.current_version(root))
    assert all(not f.get("aliases") for f in man["files"])
    # physical files now really carry the new name
    import pyarrow.parquet as pq

    for f in man["files"]:
        cols = pq.read_schema(os.path.join(root, f["path"])).names
        assert "amount" in cols and "x" not in cols
    assert sorted(
        r["amount"] for r in acid.read(spark, root).collect()
    ) == [10, 20, 30, 40, 50, 60]


def test_streaming_cdf_parity_across_rename(spark, tmp_path):
    """The acid_cdf streaming source applies rename aliases too —
    pre-rename physical files surface logical names, matching
    table_changes exactly."""
    root = _mk(spark, tmp_path, name="tcdf", n=4)
    acid.rename_column(spark, root, "x", "amount")
    acid.update_where(spark, root, "id = 2", {"amount": "amount + 5"})
    batch = sorted(
        (r["_change_type"], r["amount"])
        for r in acid.table_changes(spark, root, 2, 3).collect()
    )
    from etl_arcgis_spark.sources.acid_cdf import register

    register(spark)
    sdf = (
        spark.readStream.format("acid_cdf")
        .option("root", root)
        .option("startingVersion", 3)
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("cdf_rename_q")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stream = sorted(
        (r["_change_type"], r["amount"])
        for r in spark.sql("SELECT * FROM cdf_rename_q").collect()
    )
    assert batch == stream == [
        ("update_postimage", 25),
        ("update_preimage", 20),
    ]


def test_rename_swap_does_not_misprune_stats(spark, tmp_path):
    """Rename SWAP hazard: after a -> c then b -> a, logical 'a' is
    physical 'b'; pre-rename files carry col_stats under physical 'a'
    (which now belongs to logical 'c'). read_where('a', ...) must NOT
    use those stats — they describe the wrong logical column and
    would prune files that DO contain matching rows."""
    root = str(tmp_path / "tswap")
    # a in [1000, 2000); b in [1, 10) — disjoint ranges make stale
    # stats maximally misleading
    df = spark.createDataFrame(
        [(i, 1000 + i * 100, i) for i in range(1, 9)],
        "id INT, a INT, b INT",
    ).coalesce(2)
    acid.create(spark, root, df, key="id")
    acid.rename_column(spark, root, "a", "c")
    acid.rename_column(spark, root, "b", "a")
    # logical 'a' (physical b) values are 1..8: a range query on them
    # must return rows even though stale physical-'a' stats say
    # [1100, 1800]
    got = acid.read_where(spark, root, "a", 1, 8)
    assert got.count() == 8
    assert sorted(r["a"] for r in got.collect()) == list(range(1, 9))
    # and logical 'c' still prunes/filters on the right values
    got_c = acid.read_where(spark, root, "c", 1100, 1300)
    assert sorted(r["c"] for r in got_c.collect()) == [1100, 1200, 1300]
