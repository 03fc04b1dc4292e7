"""Tests for flow config validation (task.ts:13-46 surface) and A18
record-level error isolation (dead-letter pattern)."""

from __future__ import annotations

import json

import pytest

from etl_arcgis_spark.config import KV, IncomingConfig, OutgoingConfig, QueryStrategy
from etl_arcgis_spark.operators.quarantine import with_quarantine


def test_incoming_config_defaults_and_enum():
    c = IncomingConfig(arcgis_url="https://example/0")
    assert c.strategy is QueryStrategy.ITER  # default, task.ts:18
    c2 = IncomingConfig(arcgis_url="https://example/0", strategy="TOP_FEATURES_ITER")
    assert c2.strategy is QueryStrategy.TOP_FEATURES_ITER
    with pytest.raises(ValueError):
        IncomingConfig(arcgis_url="")  # task.ts:397
    with pytest.raises(ValueError):
        IncomingConfig(arcgis_url="x", strategy="BOGUS")
    with pytest.raises(ValueError):
        IncomingConfig(arcgis_url="x", params=[KV(key="", value="v")])


def test_outgoing_config_routing():
    c = OutgoingConfig(points_url="p", polys_url="g")
    # unconfigured geometry types are skipped (task.ts:178-187)
    assert c.routed_targets() == {"points": "p", "polys": "g"}
    assert c.preserve_history is False  # default ==> upsert, task.ts:37


def test_quarantine_splits_good_and_bad(spark):
    df = spark.createDataFrame(
        [(1, '{"v": 10}'), (2, "not json"), (3, '{"v": 30}'), (4, '{"w": 1}')],
        "id long, payload string",
    )

    def parse(rec):
        v = json.loads(rec["payload"])["v"]  # raises on bad json / missing key
        return {"id": rec["id"], "doubled": v * 2}

    good, quarantined = with_quarantine(df, parse, "id long, doubled long")
    assert {(r["id"], r["doubled"]) for r in good.collect()} == {(1, 20), (3, 60)}
    q = {r["id"]: r["error"] for r in quarantined.collect()}
    # original payload preserved for replay; error text identifies cause
    assert set(q) == {"2", "4"}
    assert "JSONDecodeError" in q["2"] and "KeyError" in q["4"]
    # the batch as a whole still succeeded: 2 good + 2 dead-lettered
    assert good.count() + quarantined.count() == 4
