"""Registry ↔ SURVEY.md §2 ↔ COVERAGE.md parity (VERDICT r10 "next" #5).

Three invariants, each of which has historically drifted:

1. Every registered query name is mentioned in SURVEY.md or COVERAGE.md
   (r11 found 10 registered-but-undocumented queries).
2. Every query name cited in a SURVEY §2 row's implementation cell is
   actually registered (ghost-reference guard).
3. Every SURVEY §2 row is represented in COVERAGE.md — by one of its
   query names for query-tier rows, by its row id for lib-tier rows
   (r10 shipped with the C228 row missing; r11 found 59 rows whose
   only COVERAGE presence was accidental prose).

Pure-text checks — no Spark session needed.
"""

from __future__ import annotations

import os
import re

from etl_arcgis_spark import registry

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(name: str) -> str:
    with open(os.path.join(_REPO, name)) as fh:
        return fh.read()


def _survey_rows(survey: str):
    """Yield (row_id, title, query_names) for every §2 inventory row."""
    for m in re.finditer(r"^\| ([ABC]\d+) \| ([^|]+) \|(.*)\|\s*$", survey, re.M):
        rid, title, rest = m.group(1), m.group(2).strip(), m.group(3)
        last = rest.rsplit("|", 1)[-1]
        yield rid, title, re.findall(r"`([a-z][a-z0-9_]+)`", last)


def test_every_registered_query_is_documented():
    registry.load_all()
    docs = _read("SURVEY.md") + _read("COVERAGE.md")
    undocumented = sorted(n for n in registry.QUERIES if n not in docs)
    assert not undocumented, (
        f"registered queries absent from SURVEY.md and COVERAGE.md: "
        f"{undocumented}"
    )


def test_survey_rows_cite_only_registered_queries():
    registry.load_all()
    names = set(registry.QUERIES)
    ghosts = [
        (rid, q)
        for rid, _, qs in _survey_rows(_read("SURVEY.md"))
        for q in qs
        if q not in names
    ]
    assert not ghosts, f"SURVEY §2 rows cite unregistered queries: {ghosts}"


def test_every_survey_row_is_represented_in_coverage():
    coverage = _read("COVERAGE.md")
    missing = []
    for rid, title, qs in _survey_rows(_read("SURVEY.md")):
        if qs:
            if not any(q in coverage for q in qs):
                missing.append((rid, title, qs))
        elif not re.search(rf"\b{rid}\b(?!\d)", coverage):
            missing.append((rid, title, "lib-row id missing"))
    assert not missing, f"SURVEY §2 rows absent from COVERAGE.md: {missing}"


def test_baseline_ledger_covers_latest_bench_round():
    """VERDICT r11 #4/#8: the per-round bench pins must land in
    BASELINE.md (the ledger the judge reads), not only in SURVEY.md's
    journal. Fails when a BENCH_r{N}.json exists with no `Round-N`
    heading in BASELINE.md — reverting the round's ledger entry
    reproduces the r11 omission this test exists to prevent."""
    import glob

    rounds = [
        int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        for p in glob.glob(os.path.join(_REPO, "BENCH_r*.json"))
    ]
    assert rounds, "no BENCH_r*.json artifacts found"
    latest = max(rounds)
    baseline = _read("BASELINE.md")
    assert re.search(rf"^#+ Round[- ]{latest}\b", baseline, re.M), (
        f"BENCH_r{latest}.json exists but BASELINE.md has no Round-{latest} "
        "section — record the round's bench pins in the ledger"
    )


def test_bench_idle_pin_matches_baseline_ledger():
    """bench.LAST_IDLE_PIN_SEC (the tripwire's headline-total bar) must
    be the pin recorded in BASELINE.md, so the artifact the judge reads
    and the check the bench runs can't drift apart."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(_REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    baseline = _read("BASELINE.md")
    assert f"{bench.LAST_IDLE_PIN_SEC:.4f}".rstrip("0") in baseline, (
        f"bench.LAST_IDLE_PIN_SEC={bench.LAST_IDLE_PIN_SEC} not found in "
        "BASELINE.md — update the ledger and the constant together"
    )


def test_tripwire_would_have_flagged_the_r11_cosine_creep():
    """VERDICT r11 #2 'demonstrate on BENCH_r10->r11 artifacts': the r11
    regression moved no single per-query ratio past the old 2x (or even
    the new 1.4x) per-query threshold, but the headline TOTAL moved
    1.30x over the r10 idle pin — the new total-vs-idle-pin check is
    the one that fires. Run the tightened tripwire exactly as bench.py
    would have at the end of round 11 and assert it warns."""
    import importlib.util
    import json

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(_REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    with open(os.path.join(_REPO, "BENCH_r10.json")) as fh:
        r10 = json.load(fh)["parsed"]
    with open(os.path.join(_REPO, "BENCH_r11.json")) as fh:
        r11 = json.load(fh)["parsed"]
    warnings = bench.tripwire(
        r11["floor_adjusted_ratio_vs_baseline"],
        r11["value"],
        r10["floor_adjusted_ratio_vs_baseline"],
        "BENCH_r10.json",
        idle_pin=0.9968,  # the r10 continuation idle pin (BASELINE.md)
    )
    assert any("headline_total" in w for w in warnings), warnings


def test_tripwire_v3_fires_on_synthetic_regression_and_not_on_quiet_runs():
    """VERDICT r12 order #4 'done' criterion: the floor-adjusted
    tripwire (pin = best reproducible quiet triplet, compare
    floor-adjusted totals at 1.25x) must FIRE on a synthetic +40%
    total and stay QUIET on recorded honest quiet runs.

    The synthetic regression: the pin run itself, every query 40%
    slower, floors unchanged. The honest runs: the r13 opening quiet
    readings on this host class (plans/r13/bench_open_{1,2}.json —
    adjusted totals 1.0329 / 1.7318 s at their own measured floors;
    the old 2.9742 pin at 1.15x would also have stayed quiet, but it
    would NOT have fired on the synthetic +40% — 2.464 < 3.420 —
    which is exactly the 1.7x slack VERDICT r12 what's-wrong #2
    documents)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(_REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    # synthetic +40%: pin-run per-query totals x 1.4, pin-run floors
    synth_total = bench.LAST_IDLE_PIN_SEC * 1.4
    synth_adj = (
        synth_total
        - 8 * bench.LAST_IDLE_PIN_FLOOR_QUERY
        - (bench.LAST_IDLE_PIN_N_JOBS - 8) * bench.LAST_IDLE_PIN_FLOOR_JOB
    )
    fired = bench.tripwire({}, synth_adj, {}, "none")
    assert any("headline_total" in w for w in fired), (
        f"synthetic +40% (adj {synth_adj:.4f} vs pin-adj "
        f"{bench.LAST_IDLE_PIN_ADJ_SEC}) did not fire: {fired}"
    )

    # honest quiet runs: recorded floor-adjusted totals stay quiet
    for adj in (1.0329, 1.7318):
        quiet = bench.tripwire({}, adj, {}, "none")
        assert not quiet, f"honest quiet adj total {adj} fired: {quiet}"

    # loaded-host escape hatch: a fired warning on a load_suspect run
    # must SAY so (explicit loadavg gate, not pin slack)
    noisy = bench.tripwire({}, synth_adj, {}, "none", load_suspect=True)
    assert noisy and all("load_suspect" in w for w in noisy), noisy


def test_optimization_doc_touched_queries_have_plan_dumps():
    """VERDICT r12 order #8: plan evidence can't silently go missing.
    The latest OPTIMIZATION_r{N}.md carries a machine-readable
    'Touched queries:' list (backtick-quoted names, r13+); for every
    listed name, plans/r{N}/<name>_before.txt AND _after.txt must
    exist. Deleting a dump (or forgetting to commit one) fails this
    test. Rounds before r13 predate the convention and are skipped."""
    import glob

    docs = glob.glob(os.path.join(_REPO, "OPTIMIZATION_r*.md"))
    assert docs, "no OPTIMIZATION_r*.md found"
    latest = max(
        docs, key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
    )
    n = int(re.search(r"r(\d+)", os.path.basename(latest)).group(1))
    if n < 13:
        return  # pre-convention round
    text = _read(os.path.basename(latest))
    m = re.search(r"^Touched queries:.*?(?=\n\n|\Z)", text, re.M | re.S)
    assert m, f"{latest} has no 'Touched queries:' list"
    names = re.findall(r"`([a-z][a-z0-9_]+)`", m.group(0))
    assert names, f"'Touched queries:' list in {latest} is empty"
    missing = []
    for q in names:
        for suffix in ("before", "after"):
            p = os.path.join(_REPO, "plans", f"r{n}", f"{q}_{suffix}.txt")
            if not os.path.exists(p):
                missing.append(os.path.relpath(p, _REPO))
    assert not missing, f"touched queries missing plan dumps: {missing}"
