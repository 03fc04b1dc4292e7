"""C209: Delta-style CHECK constraints on the snapshot-manifest ACID
table — add/drop/list, existing-data validation, enforcement on every
row-introducing write path (append, merge incl. WAP-staged, upsert_mor,
update_where, update_where_mor), NULL-passes semantics, carry-forward
through unrelated commits, and time-travel visibility."""

from __future__ import annotations

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


def _row(spark, i, x, v="z"):
    return spark.createDataFrame([(i, x, v)], "id INT, x INT, v STRING")


def test_add_list_drop_roundtrip(spark, tmp_path):
    root = _mk(spark, tmp_path)
    v = acid.add_constraint(spark, root, "x_positive", "x > 0")
    assert v == 2
    assert acid.list_constraints(root) == {"x_positive": "x > 0"}
    v = acid.drop_constraint(root, "x_positive")
    assert v == 3
    assert acid.list_constraints(root) == {}
    # dropping again is an error; re-adding after drop works
    with pytest.raises(ValueError):
        acid.drop_constraint(root, "x_positive")
    acid.add_constraint(spark, root, "x_positive", "x > 0")
    with pytest.raises(ValueError):
        acid.add_constraint(spark, root, "x_positive", "x > 1")


def test_add_constraint_validates_existing_data(spark, tmp_path):
    root = _mk(spark, tmp_path)  # x in 10..60
    with pytest.raises(acid.ConstraintViolation) as ei:
        acid.add_constraint(spark, root, "x_small", "x < 30")
    assert "4 row(s)" in str(ei.value)  # 30,40,50,60 violate
    # table unchanged: no constraint commit published
    assert acid.current_version(root) == 1
    assert acid.list_constraints(root) == {}


def test_append_and_merge_enforced(spark, tmp_path):
    root = _mk(spark, tmp_path)
    acid.add_constraint(spark, root, "x_positive", "x > 0")
    v_before = acid.current_version(root)
    with pytest.raises(acid.ConstraintViolation):
        acid.append(spark, root, _row(spark, 100, -5))
    with pytest.raises(acid.ConstraintViolation):
        acid.merge(spark, root, _row(spark, 1, -5))
    # nothing committed, data intact
    assert acid.current_version(root) == v_before
    assert acid.read(spark, root).count() == 6
    # passing writes commit fine
    acid.append(spark, root, _row(spark, 100, 5))
    acid.merge(spark, root, _row(spark, 1, 999))
    assert acid.read(spark, root).count() == 7


def test_merge_post_image_not_source_wide(spark, tmp_path):
    """Enforcement is on the written POST-IMAGE: a source row that a
    WHEN MATCHED ... DELETE clause removes cannot violate."""
    root = _mk(spark, tmp_path)
    acid.add_constraint(spark, root, "x_positive", "x > 0")
    # tombstone row carries x = -1 but is deleted, not written
    acid.merge(
        spark, root, _row(spark, 2, -1), delete_condition="s.x < 0"
    )
    ids = [r["id"] for r in acid.read(spark, root).collect()]
    assert 2 not in ids and len(ids) == 5


def test_null_predicate_passes(spark, tmp_path):
    """SQL CHECK: NULL/UNKNOWN is not a violation."""
    root = _mk(spark, tmp_path)
    acid.add_constraint(spark, root, "v_prefix", "v LIKE 'v%'")
    acid.append(
        spark,
        root,
        spark.createDataFrame([(50, 1, None)], "id INT, x INT, v STRING"),
    )
    assert acid.read(spark, root).count() == 7


def test_update_where_both_modes_enforced(spark, tmp_path):
    for mode, fn in (
        ("cow", acid.update_where),
        ("mor", acid.update_where_mor),
    ):
        root = _mk(spark, tmp_path, name=f"t_{mode}")
        acid.add_constraint(spark, root, "x_capped", "x <= 1000")
        with pytest.raises(acid.ConstraintViolation):
            fn(spark, root, "id = 3", {"x": "x + 100000"})
        assert acid.read(spark, root).filter("x > 1000").count() == 0
        fn(spark, root, "id = 3", {"x": "x + 100"})
        assert (
            acid.read(spark, root).filter("id = 3").collect()[0]["x"] == 130
        )


def test_upsert_mor_enforced(spark, tmp_path):
    root = _mk(spark, tmp_path)
    acid.add_constraint(spark, root, "x_positive", "x > 0")
    with pytest.raises(acid.ConstraintViolation):
        acid.upsert_mor(spark, root, _row(spark, 3, -7))
    acid.upsert_mor(spark, root, _row(spark, 3, 7))
    assert acid.read(spark, root).filter("id = 3").collect()[0]["x"] == 7


def test_constraints_carry_through_unrelated_commits(spark, tmp_path):
    """delete/compact/restore don't carry the key explicitly — the
    _publish choke point must keep the constraint set alive."""
    root = _mk(spark, tmp_path)
    acid.add_constraint(spark, root, "x_positive", "x > 0")
    acid.delete_where(spark, root, "id = 6")
    acid.compact(spark, root)
    assert acid.list_constraints(root) == {"x_positive": "x > 0"}
    with pytest.raises(acid.ConstraintViolation):
        acid.append(spark, root, _row(spark, 101, -1))
    # restore keeps governance current (documented choice)
    acid.restore(spark, root, 2)
    assert acid.list_constraints(root) == {"x_positive": "x > 0"}


def test_restore_past_drop_does_not_resurrect_constraint(spark, tmp_path):
    """ADVICE r10: restoring a snapshot whose manifest CARRIES a
    'constraints' key must not revert governance to the historical
    set — a dropped constraint stays dropped, and writes that the
    old constraint would have rejected succeed after the restore."""
    root = _mk(spark, tmp_path)
    acid.append(spark, root, _row(spark, 101, 5))        # v2 (data-only)
    acid.add_constraint(spark, root, "x_positive", "x > 0")   # v3
    acid.append(spark, root, _row(spark, 102, 6))        # v4: carries key
    acid.drop_constraint(root, "x_positive")             # v5
    # restore to v4 — the restored manifest CONTAINS the constraint,
    # but the live set (empty since the drop) must win
    acid.restore(spark, root, 4)
    assert acid.list_constraints(root) == {}
    acid.append(spark, root, _row(spark, 103, -1))       # old rule: reject
    assert acid.read(spark, root).filter("id = 103").count() == 1
    # and the inverse: one added AFTER the snapshot survives a restore
    acid.add_constraint(spark, root, "x_capped", "x < 100000")
    acid.restore(spark, root, 2)
    assert acid.list_constraints(root) == {"x_capped": "x < 100000"}


def test_staged_wap_merge_enforced(spark, tmp_path):
    """Hard CHECK constraints fire even on a staged (WAP) merge —
    soft expectations are the WAP audit's job, invariants are not."""
    root = _mk(spark, tmp_path)
    acid.add_constraint(spark, root, "x_positive", "x > 0")
    with pytest.raises(acid.ConstraintViolation):
        acid.merge(spark, root, _row(spark, 1, -2), staged=True)
    token = acid.merge(spark, root, _row(spark, 1, 2), staged=True)
    assert isinstance(token, str)
    acid.publish_staged(root, token)
    assert acid.read(spark, root).filter("id = 1").collect()[0]["x"] == 2
