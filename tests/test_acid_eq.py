"""Iceberg-v2 EQUALITY DELETES (VERDICT r8 orders #2/#4/#6): delete
files keyed by column values, resolved in the _read_paths overlay with
the data-sequence-number rule; upsert_mor (the one-commit CDC write);
the streaming MoR sink; three-way metadata content breakdown."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from etl_arcgis_spark import acid



# Slow tier (optimization r13, VERDICT r12 order #2): heavyweight
# subprocess/streaming/property suite — excluded from the default
# pytest run (pytest.ini), executed with `-m slow`.
pytestmark = pytest.mark.slow


def _mk(spark, tmp_path, name="eq", n=10):
    root = str(tmp_path / name)
    df = spark.createDataFrame(
        [(i, i * 10, f"v{i}") for i in range(1, n + 1)], "id INT, x INT, v STRING"
    ).coalesce(2)
    acid.create(spark, root, df, key="id")
    return root


def _keys(spark, *ids):
    return spark.createDataFrame([(i,) for i in ids], "id INT")


def test_eq_delete_no_rewrite_exact_rows(spark, tmp_path):
    root = _mk(spark, tmp_path)
    files_v1 = sorted(f["path"] for f in acid._read_manifest(root, 1)["files"])
    v = acid.delete_eq(spark, root, _keys(spark, 2, 5, 777))  # 777 absent
    man = acid._read_manifest(root, v)
    assert sorted(f["path"] for f in man["files"]) == files_v1  # path-identical
    assert man["deletes"][0]["kind"] == "equality"
    assert man["deletes"][0]["cols"] == ["id"]
    assert man["deletes"][0]["rows"] == 3  # key tuples, incl. the miss
    assert man["deleted_rows"] == 2  # matched rows, exact
    assert man["rows"] == 8
    assert sorted(r.id for r in acid.read(spark, root).collect()) == [
        1, 3, 4, 6, 7, 8, 9, 10,
    ]
    assert acid.read(spark, root, 1).count() == 10  # time travel intact


def test_eq_delete_null_safe_match(spark, tmp_path):
    """Iceberg spec: null values in delete columns match null rows."""
    root = str(tmp_path / "eqnull")
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "d")], "id INT, cat STRING"
    ).coalesce(1)
    acid.create(spark, root, df, key="id")
    acid.delete_eq(spark, root, spark.createDataFrame([(None,)], "cat STRING"))
    assert sorted(r.id for r in acid.read(spark, root).collect()) == [1, 4]


def test_eq_delete_reinsert_survives_tombstone(spark, tmp_path):
    """The sequence-number rule: data files newer than the equality
    delete are exempt, so a re-inserted key is visible again."""
    root = _mk(spark, tmp_path, name="reins")
    acid.delete_eq(spark, root, _keys(spark, 2))
    acid.append(
        spark, root,
        spark.createDataFrame([(2, 999, "re")], "id INT, x INT, v STRING"),
    )
    got = {r.id: r.x for r in acid.read(spark, root).collect()}
    assert got[2] == 999
    # and the overlay still kills the OLD row: exactly one id=2
    assert acid.read(spark, root).filter("id = 2").count() == 1


def test_eq_redelete_counts_zero(spark, tmp_path):
    root = _mk(spark, tmp_path, name="redel")
    acid.delete_eq(spark, root, _keys(spark, 2, 5))
    v = acid.delete_eq(spark, root, _keys(spark, 2, 5))  # overlay applied
    man = acid._read_manifest(root, v)
    assert man["deleted_rows"] == 0
    assert man["rows"] == 8


def test_eq_multi_column(spark, tmp_path):
    root = str(tmp_path / "eqmc")
    df = spark.createDataFrame(
        [(1, "a", 1), (2, "a", 2), (3, "b", 1), (4, "b", 2)],
        "id INT, cat STRING, grp INT",
    ).coalesce(1)
    acid.create(spark, root, df, key="id")
    acid.delete_eq(
        spark, root, spark.createDataFrame([("a", 2), ("b", 1)], "cat STRING, grp INT")
    )
    assert sorted(r.id for r in acid.read(spark, root).collect()) == [1, 4]


def test_mixed_positional_and_equality_read(spark, tmp_path):
    """The VERDICT's named acceptance case: one snapshot carrying BOTH
    delete-file kinds, with exact rows accounting."""
    root = _mk(spark, tmp_path, name="mixed")
    acid.delete_where_mor(spark, root, "id IN (1, 2)")     # positional
    v = acid.delete_eq(spark, root, _keys(spark, 2, 9))    # equality (2 already gone)
    man = acid._read_manifest(root, v)
    kinds = sorted(e.get("kind", "positional") for e in man["deletes"])
    assert kinds == ["equality", "positional"]
    assert man["deleted_rows"] == 1  # only 9: overlay prevented recount of 2
    assert man["rows"] == 7
    got = sorted(r.id for r in acid.read(spark, root).collect())
    assert got == [3, 4, 5, 6, 7, 8, 10]
    # every reader entry point applies both kinds
    assert acid.read_where(spark, root, "id", 3, 10).count() == 7
    assert acid.read_point(spark, root, 9).count() == 0
    assert acid.read_key_range(spark, root, 1, 2).count() == 0


def test_compact_deletes_resolves_equality(spark, tmp_path):
    root = _mk(spark, tmp_path, name="eqcomp")
    acid.delete_eq(spark, root, _keys(spark, 3, 7))
    before = sorted(r.id for r in acid.read(spark, root).collect())
    v = acid.compact_deletes(spark, root)
    man = acid._read_manifest(root, v)
    assert not man.get("deletes")
    assert man["rows"] == 8
    assert sorted(r.id for r in acid.read(spark, root).collect()) == before
    # CDF is silent over the maintenance commit (r9 parent-overlay fix)
    assert acid.table_changes(spark, root, v - 1, v).count() == 0


def test_cdf_eq_delete_and_upsert_mor(spark, tmp_path):
    root = _mk(spark, tmp_path, name="eqcdf", n=6)
    acid.delete_eq(spark, root, _keys(spark, 2, 5))  # v2
    ch = acid.table_changes(spark, root, 1, 2).collect()
    dels = sorted((r.id, r.x) for r in ch if r._change_type == "delete")
    assert dels == [(2, 20), (5, 50)]  # pre-image content, not null shells
    assert all(r._change_type == "delete" for r in ch)
    # upsert_mor surfaces as delete + insert (Iceberg changelog shape)
    acid.upsert_mor(
        spark, root,
        spark.createDataFrame([(3, -3, "up"), (42, 420, "new")],
                              "id INT, x INT, v STRING"),
    )  # v3
    ch3 = acid.table_changes(spark, root, 2, 3).collect()
    assert sorted((r.id, r._change_type) for r in ch3) == [
        (3, "delete"), (3, "insert"), (42, "insert"),
    ]


def test_upsert_mor_parity_with_merge(spark, tmp_path):
    """Same source upserted via copy-on-write merge and via the
    one-commit MoR path must produce identical visible tables."""
    src_rows = [(2, -2, "up2"), (9, -9, "up9"), (77, 770, "new")]
    root_cow = _mk(spark, tmp_path, name="cow")
    root_mor = _mk(spark, tmp_path, name="mor")
    src = spark.createDataFrame(src_rows, "id INT, x INT, v STRING")
    acid.merge(spark, root_cow, src)
    acid.upsert_mor(spark, root_mor, src)
    a = sorted(map(tuple, acid.read(spark, root_cow).collect()))
    b = sorted(map(tuple, acid.read(spark, root_mor).collect()))
    assert a == b
    # and the MoR commit rewrote nothing
    v1_files = {f["path"] for f in acid._read_manifest(root_mor, 1)["files"]}
    man = acid._read_manifest(root_mor, 2)
    assert v1_files <= {f["path"] for f in man["files"]}
    assert man["matched_rows"] == 2 and man["inserted_rows"] == 3


def test_upsert_mor_validations(spark, tmp_path):
    root = _mk(spark, tmp_path, name="val")
    with pytest.raises(ValueError, match="duplicate"):
        acid.upsert_mor(
            spark, root,
            spark.createDataFrame([(1, 1, "a"), (1, 2, "b")],
                                  "id INT, x INT, v STRING"),
        )
    with pytest.raises(ValueError, match="NULL"):
        acid.upsert_mor(
            spark, root,
            spark.createDataFrame([(None, 1, "a")], "id INT, x INT, v STRING"),
        )
    with pytest.raises(ValueError, match="full-width"):
        acid.upsert_mor(
            spark, root, spark.createDataFrame([(1, 5)], "id INT, x INT")
        )
    with pytest.raises(ValueError, match="not in table schema"):
        acid.delete_eq(
            spark, root, spark.createDataFrame([(1,)], "nosuch INT")
        )


def test_eq_vacuum_protects_then_collects(spark, tmp_path):
    root = _mk(spark, tmp_path, name="eqvac")
    acid.delete_eq(spark, root, _keys(spark, 4))           # v2: eq file
    deleted = acid.vacuum(root, keep_versions=2, grace_seconds=0.0)
    assert all("deletes" + os.sep not in p for p in deleted)
    assert acid.read(spark, root).count() == 9
    acid.compact_deletes(spark, root)                      # v3
    acid.append(spark, root, spark.createDataFrame(
        [(99, 990, "z")], "id INT, x INT, v STRING"))      # v4
    deleted = acid.vacuum(root, keep_versions=2, grace_seconds=0.0)
    assert any(os.sep + "deletes" + os.sep in p for p in deleted)
    assert glob.glob(os.path.join(root, "deletes", "*.parquet")) == []
    assert acid.read(spark, root).count() == 10


def test_eq_clone_carries_overlay_and_seq_counter(spark, tmp_path):
    """Cloned entries keep their seqs; the clone's own first upsert
    must outrank every inherited tombstone (last_seq carried), and new
    appends to the clone are exempt from inherited tombstones."""
    src = _mk(spark, tmp_path, name="eqsrc")
    acid.delete_eq(spark, src, _keys(spark, 2))            # src v2, seq 2
    dst = str(tmp_path / "eqdst")
    acid.clone(spark, src, dst)
    assert sorted(r.id for r in acid.read(spark, dst).collect()) == [
        1, 3, 4, 5, 6, 7, 8, 9, 10,
    ]
    man = acid._read_manifest(dst, 1)
    assert int(man["last_seq"]) == 2
    # re-insert key 2 on the CLONE: gets seq 3 > tombstone seq 2
    acid.append(spark, dst, spark.createDataFrame(
        [(2, 999, "re")], "id INT, x INT, v STRING"))
    assert acid.read(spark, dst).filter("id = 2").count() == 1
    # source is untouched
    assert acid.read(spark, src).filter("id = 2").count() == 0


def test_eq_partitioned_table(spark, tmp_path):
    root = str(tmp_path / "eqpart")
    df = spark.createDataFrame(
        [(i, "odd" if i % 2 else "even", i * 10) for i in range(1, 9)],
        "id INT, par STRING, x INT",
    )
    acid.create(spark, root, df, key="id", partition_by="par")
    acid.delete_eq(spark, root, _keys(spark, 3, 4))
    assert sorted(r.id for r in acid.read(spark, root).collect()) == [
        1, 2, 5, 6, 7, 8,
    ]
    assert acid.read_partition(spark, root, ["odd"]).count() == 3
    v = acid.upsert_mor(
        spark, root,
        spark.createDataFrame([(4, "even", -4)], "id INT, par STRING, x INT"),
    )
    assert acid._read_manifest(root, v)["rows"] == 7
    assert acid.read_partition(spark, root, ["even"]).filter("id = 4").count() == 1


def test_files_table_three_way_content(spark, tmp_path):
    """VERDICT r8 order #6: .files shows the Iceberg three-way content
    breakdown so overlay maintenance planning stays a query."""
    root = _mk(spark, tmp_path, name="eqft")
    acid.delete_where_mor(spark, root, "id = 1")
    acid.delete_eq(spark, root, _keys(spark, 9))
    ft = acid.files_table(spark, root)
    by = {r["content"]: r["n"] for r in
          ft.groupBy("content").agg(F.count("*").alias("n")).collect()}
    assert by["DATA"] >= 1
    assert by["POSITION_DELETES"] == 1
    assert by["EQUALITY_DELETES"] == 1
    # delete rows carry record counts and a seq; data rows carry seq
    eq_row = ft.filter("content = 'EQUALITY_DELETES'").collect()[0]
    assert eq_row["rows"] == 1 and eq_row["seq"] == 3 and eq_row["bytes"] > 0
    assert ft.filter("content = 'DATA' AND seq = 1").count() == len(
        acid._read_manifest(root, 1)["files"]
    )


def test_eq_wap_staged_merge_interplay(spark, tmp_path):
    """A staged (WAP) merge on a table with an equality overlay stays
    overlay-correct when audited and when published."""
    root = _mk(spark, tmp_path, name="eqwap", n=5)
    acid.delete_eq(spark, root, _keys(spark, 2))
    token = acid.merge(
        spark, root,
        spark.createDataFrame([(9, 90, "nine")], "id INT, x INT, v STRING"),
        staged=True,
    )
    staged = sorted(r.id for r in acid.read_staged(spark, root, token).collect())
    assert staged == [1, 3, 4, 5, 9]
    acid.publish_staged(root, token)
    assert sorted(r.id for r in acid.read(spark, root).collect()) == [1, 3, 4, 5, 9]


def test_eq_zorder_resolves_overlay(spark, tmp_path):
    root = str(tmp_path / "eqz")
    df = spark.createDataFrame(
        [(i, i % 5, i * 2, "x") for i in range(1, 21)],
        "id INT, a INT, b INT, v STRING",
    ).coalesce(2)
    acid.create(spark, root, df, key="id")
    acid.delete_eq(spark, root, _keys(spark, 3, 7, 11))
    before = sorted(r.id for r in acid.read(spark, root).collect())
    v = acid.compact_zorder(spark, root, ("a", "b"))
    man = acid._read_manifest(root, v)
    assert not man.get("deletes")
    assert sorted(r.id for r in acid.read(spark, root).collect()) == before
    assert acid.table_changes(spark, root, v - 1, v).count() == 0


def test_streaming_mor_sink_parity_with_cow(spark, tmp_path):
    """acid_upsert_sink_mor converges to the same visible keyed state
    as the copy-on-write acid_upsert_sink over the same micro-batch
    sequence, while rewriting nothing (history shows upsert_mor)."""
    import glob as _g
    import shutil as _sh

    from etl_arcgis_spark.streaming.pipelines import (
        acid_upsert_sink,
        acid_upsert_sink_mor,
    )
    from etl_arcgis_spark.tables import prepare, table

    prepare(spark)
    sf = "/root/testdata/sf0.001"
    ev = table(spark, sf, "events")
    # two deterministic halves -> two files -> maxFilesPerTrigger=1
    # gives every sink the SAME two-micro-batch schedule (batch 2 must
    # hit the upsert path, not create)
    src_dir = tmp_path / "ev_in"
    src_dir.mkdir()
    for tag, pred in (("a", "event_id % 2 = 0"), ("b", "event_id % 2 = 1")):
        out = tmp_path / f"half_{tag}"
        ev.filter(pred).coalesce(1).write.parquet(str(out))
        _sh.copy(_g.glob(str(out / "part-*.parquet"))[0],
                 src_dir / f"{tag}.parquet")
    results = {}
    for name, sink in (("cow", acid_upsert_sink), ("mor", acid_upsert_sink_mor)):
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir))
        )
        root = str(tmp_path / f"tbl_{name}")
        q = sink(stream, root).trigger(availableNow=True).start()
        q.awaitTermination(120)
        results[name] = sorted(
            map(tuple, acid.read(spark, root)
                .select("user_id", "us", "event_id", "value").collect())
        )
    assert results["cow"] == results["mor"] and len(results["cow"]) > 0
    ops = [h["operation"] for h in acid.history(str(tmp_path / "tbl_mor"))]
    assert ops == ["create", "upsert_mor"]


def test_cdf_stream_mor_parity_with_table_changes(spark, tmp_path):
    """The acid_cdf STREAMING source over merge-on-read commits —
    positional delete, equality delete, upsert_mor, compact_deletes —
    matches the distributed acid.table_changes row for row (r9: the
    stream previously diffed file deltas only, so MoR commits emitted
    nothing and compaction re-exposed deleted rows)."""
    from etl_arcgis_spark.sources.acid_cdf import register

    register(spark)
    root = _mk(spark, tmp_path, name="cdfstream", n=8)
    acid.delete_where_mor(spark, root, "id IN (2, 3)")     # v2: positional
    acid.delete_eq(spark, root, _keys(spark, 7))           # v3: equality
    acid.upsert_mor(
        spark, root,
        spark.createDataFrame([(4, -4, "up"), (50, 500, "new")],
                              "id INT, x INT, v STRING"),
    )                                                      # v4: delete+insert
    acid.compact_deletes(spark, root)                      # v5: must be silent
    q = (
        spark.readStream.format("acid_cdf")
        .option("root", root)
        .option("startingVersion", 2)
        .load()
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("cdf_mor")
        .option("checkpointLocation", str(tmp_path / "ck_mor"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (r["id"], r["x"], r["_change_type"], r["_commit_version"])
        for r in spark.sql("SELECT * FROM cdf_mor").collect()
    )
    want = sorted(
        (r["id"], r["x"], r["_change_type"], r["_commit_version"])
        for r in acid.table_changes(spark, root, 1).collect()
    )
    assert got == want
    assert (2, 20, "delete", 2) in got and (3, 30, "delete", 2) in got
    assert (7, 70, "delete", 3) in got
    assert (4, 40, "delete", 4) in got and (4, -4, "insert", 4) in got
    assert (50, 500, "insert", 4) in got
    assert all(cv != 5 for (_, _, _, cv) in got)  # compaction is silent
    assert len(got) == 6


def test_upsert_mor_schema_evolution(spark, tmp_path):
    """A source with a NEW column appends it to the table schema; old
    files read the column as null through the pinned manifest schema,
    and the tombstoned old versions stay dead."""
    root = _mk(spark, tmp_path, name="eqevo", n=4)
    src = spark.createDataFrame(
        [(2, -2, "up", "extra2"), (9, 90, "new", "extra9")],
        "id INT, x INT, v STRING, note STRING",
    )
    acid.upsert_mor(spark, root, src)
    got = {r.id: (r.x, r.note) for r in acid.read(spark, root).collect()}
    assert got[2] == (-2, "extra2")       # replaced, carries new col
    assert got[9] == (90, "extra9")       # inserted
    assert got[1] == (10, None)           # old file: evolved col null
    assert len(got) == 5
    # a second upsert with the ORIGINAL narrow schema is rejected
    # (UPDATE SET * needs full width — note now exists)
    with pytest.raises(ValueError, match="full-width"):
        acid.upsert_mor(
            spark, root,
            spark.createDataFrame([(1, 0, "z")], "id INT, x INT, v STRING"),
        )


def test_restore_across_equality_commits(spark, tmp_path):
    """RESTORE to a pre-tombstone snapshot revives the keys (the old
    manifest has no eq entries), the seq counter never regresses, and
    a NEW equality delete after the restore still outranks every file."""
    root = _mk(spark, tmp_path, name="eqrestore", n=6)
    acid.delete_eq(spark, root, _keys(spark, 2, 3))        # v2, seq 2
    assert acid.read(spark, root).count() == 4
    acid.restore(spark, root, 1)                           # v3 = v1 state
    assert sorted(r.id for r in acid.read(spark, root).collect()) == [
        1, 2, 3, 4, 5, 6,
    ]
    man = acid._read_manifest(root, 3)
    assert int(man["last_seq"]) >= 2  # counter carried, not reset
    v4 = acid.delete_eq(spark, root, _keys(spark, 2))      # seq > all files
    assert sorted(r.id for r in acid.read(spark, root).collect()) == [
        1, 3, 4, 5, 6,
    ]
    assert acid._read_manifest(root, v4)["deleted_rows"] == 1
