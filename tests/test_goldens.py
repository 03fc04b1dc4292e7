"""Golden-snapshot gate for the 15 declared-weak queries (VERDICT r9 #1).

Weak queries (seeded / approximate / binary-codec) have no DuckDB
oracle BY DESIGN, so the driver's row for them is rows-only. Locally
we can do better: their outputs are deterministic within the engine
(fixed seeds, pure codecs, order-insensitive sketch merges — proven by
``tools/make_goldens.py --selfcheck``, which re-runs each under a
different shuffle-partition count). This test compares every weak
query at sf0.001 against its committed golden parquet with the same
order-insensitive comparator tools/check.py uses, converting the weak
tier's local check from "returns rows" to "returns THESE values".

If a weak query's semantics deliberately change, regenerate with
``python tools/make_goldens.py`` and review the diff.
"""

from __future__ import annotations

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from check import compare  # noqa: E402

from etl_arcgis_spark import registry  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens", "sf0.001")

registry.load_all()
WEAK = sorted(set(registry.QUERIES) - set(registry.ORACLES))


def test_every_weak_query_has_a_golden():
    missing = [
        n for n in WEAK
        if not os.path.exists(os.path.join(GOLDEN_DIR, f"{n}.parquet"))
    ]
    assert not missing, (
        f"weak queries without a committed golden: {missing} — run "
        "tools/make_goldens.py (and review the outputs) to restore the "
        "value gate"
    )


def test_no_stale_goldens():
    stale = [
        f for f in os.listdir(GOLDEN_DIR)
        if f.endswith(".parquet") and f[: -len(".parquet")] not in WEAK
    ]
    assert not stale, (
        f"goldens for names that are no longer weak/registered: {stale}"
    )


@pytest.mark.parametrize("name", WEAK)
def test_weak_query_matches_golden(spark, name):
    gpath = os.path.join(GOLDEN_DIR, f"{name}.parquet")
    if not os.path.exists(gpath):
        pytest.skip("golden missing (covered by the completeness test)")
    got = registry.QUERIES[name](spark, SF_DIR).toPandas()
    gold = pd.read_parquet(gpath)
    problems = [
        p for p in compare(got, gold) if not p.startswith("dtype note")
    ]
    assert not problems, f"{name} diverged from golden: {problems}"
