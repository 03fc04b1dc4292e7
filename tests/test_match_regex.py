"""General-regex CEP (VERDICT r10 "next" #6): the run-length NFA
compiler vs an independent brute-force ``re`` matcher, and the SQL
fold vs the python simulator.

The ``re`` oracle encodes each maximal run (dir, len) as ONE character
from a 24-char alphabet (3 dirs x lens 1..8) and translates the parsed
pattern terms into character classes — matching then delegates
entirely to CPython's regex engine, an implementation with nothing in
common with the bitmask NFA under test. Match-end counting is the
quadratic brute force: end position p matches iff re.fullmatch accepts
s[i:p] for some start i.
"""

from __future__ import annotations

import random
import re

import duckdb
import pytest

from etl_arcgis_spark.operators.windows import (
    _RLX_INF,
    _rlx_parse,
    compile_runlength_regex,
    runlength_regex_step_sql,
    simulate_runlength_regex,
)

DIRS = "DUF"
MAXLEN = 8


def _char(sym: str, length: int) -> str:
    return chr(ord("A") + DIRS.index(sym) * MAXLEN + (length - 1))


def _encode(runs) -> str:
    return "".join(_char(s, m) for s, m in runs)


def _class(cls, lo, hi) -> str:
    chars = "".join(
        _char(s, m)
        for s in cls
        for m in range(max(lo, 1), min(hi, MAXLEN) + 1)
    )
    return "[" + chars + "]"


def _to_re(pattern: str) -> str:
    out = []
    for cls, kind, lo, hi in _rlx_parse(pattern):
        if kind == "len":
            body = _class(cls, lo, hi)
            out.append(body + ("?" if lo == 0 else ""))
        else:
            body = _class(cls, 1, _RLX_INF)
            rep = f"{{{lo},}}" if hi >= _RLX_INF else f"{{{lo},{hi}}}"
            out.append(body + rep)
    return "".join(out)


def _brute_end_count(rx: str, runs) -> int:
    s = _encode(runs)
    pat = re.compile(_to_re(rx))
    return sum(
        1
        for p in range(1, len(s) + 1)
        if any(pat.fullmatch(s, i, p) for i in range(p))
    )


def _rand_runs(rng, n) -> list:
    """Random MAXIMAL-run sequence: consecutive dirs always differ."""
    runs, prev = [], None
    for _ in range(n):
        sym = rng.choice([d for d in DIRS if d != prev])
        runs.append((sym, rng.randint(1, MAXLEN)))
        prev = sym
    return runs


PATTERNS = [
    "D{1,} (U|F){1,2} D{2,}",
    "(D|U)+ F{1,3}",
    "U{2,4}",
    "D{2,} U{1,}",
    "(U|F){2,3} D{1,2} (U|F){1,1}",
    "F{1,1} (D|U){1,} F{1,2}",
]


@pytest.mark.parametrize("rx", PATTERNS)
def test_nfa_counts_match_re_bruteforce(rx):
    rng = random.Random(hash(rx) & 0xFFFF)
    for trial in range(60):
        runs = _rand_runs(rng, rng.randint(0, 14))
        got = simulate_runlength_regex(rx, runs)
        want = _brute_end_count(rx, runs)
        assert got == want, (rx, runs, got, want)


def test_sql_fold_matches_python_simulator():
    """The compiled step expression under DuckDB list_reduce equals
    the python NFA on random sequences — the exact text the oracle
    and (modulo lambda spelling) the Spark side run."""
    con = duckdb.connect()
    rng = random.Random(7)
    for rx in PATTERNS[:3]:
        expr, n = runlength_regex_step_sql(rx)
        for _ in range(20):
            runs = _rand_runs(rng, rng.randint(0, 12))
            codes = [
                (DIRS.index(s) + 1) * 1048576 + m for s, m in runs
            ]
            lst = ", ".join(f"CAST({c} AS BIGINT)" for c in codes)
            arr = f"[{lst}]" if codes else "CAST([] AS BIGINT[])"
            got = con.sql(
                f"SELECT CAST(floor(list_reduce(list_prepend("
                f"CAST(0 AS BIGINT), {arr}), (a, r) -> {expr})"
                f" / {2 ** n}) AS BIGINT)"
            ).fetchone()[0]
            assert got == simulate_runlength_regex(rx, runs), (rx, runs)


def test_compiler_rejects_degenerate_patterns():
    for bad in ["", "X{1,2}", "(D|X)+", "D* U*", "{1,2}"]:
        with pytest.raises(ValueError):
            compile_runlength_regex(bad)


def test_known_dead_cat_bounce_sequence():
    rx = "D{1,} (U|F){1,2} D{2,}"
    # D3 U1 D2 -> one match ending at run 3; the trailing D2 also
    # re-arms s1, so D3 U1 D2 F1 D4 adds a second match (D2 F1 D4)
    assert simulate_runlength_regex(rx, [("D", 3), ("U", 1), ("D", 2)]) == 1
    assert (
        simulate_runlength_regex(
            rx, [("D", 3), ("U", 1), ("D", 2), ("F", 1), ("D", 4)]
        )
        == 2
    )
    # a 1-step final decline does NOT satisfy D{2,}
    assert simulate_runlength_regex(rx, [("D", 3), ("U", 1), ("D", 1)]) == 0


# --- r12: AFTER MATCH SKIP PAST LAST ROW + PERMUTE (VERDICT r11
# "missing" #4) ---

from etl_arcgis_spark.operators.windows import (  # noqa: E402
    compile_runlength_alternation,
    nfa_step_sql,
    permute_patterns,
    simulate_runlength_nfa,
)


def _brute_nonoverlap_count(rx: str, runs) -> int:
    """Independent greedy earliest-end non-overlapping scan via re:
    a match may only START at or after the end of the previous match,
    and the first position where ANY start succeeds ends a match."""
    s = _encode(runs)
    pat = re.compile(_to_re(rx))
    count, base = 0, 0
    for p in range(1, len(s) + 1):
        if any(pat.fullmatch(s, i, p) for i in range(base, p)):
            count += 1
            base = p
    return count


@pytest.mark.parametrize("rx", PATTERNS)
def test_skip_past_counts_match_greedy_re_scan(rx):
    nfa = compile_runlength_regex(rx)
    rng = random.Random(hash(rx) & 0xFFF1)
    for _ in range(60):
        runs = _rand_runs(rng, rng.randint(0, 14))
        got = simulate_runlength_nfa(nfa, runs, skip_past=True)
        want = _brute_nonoverlap_count(rx, runs)
        assert got == want, (rx, runs, got, want)


def test_permute_counts_match_re_alternation():
    terms = ["D{1,}", "U{1,}", "F{1,}"]
    pats = permute_patterns(terms)
    nfa = compile_runlength_alternation(pats)
    alt = "(" + "|".join(_to_re(p) for p in pats) + ")"
    rng = random.Random(99)
    for _ in range(80):
        runs = _rand_runs(rng, rng.randint(0, 12))
        s = _encode(runs)
        pat = re.compile(alt)
        want = sum(
            1
            for p in range(1, len(s) + 1)
            if any(pat.fullmatch(s, i, p) for i in range(p))
        )
        got = simulate_runlength_nfa(nfa, runs)
        assert got == want, (runs, got, want)


def test_skip_past_and_permute_sql_folds_match_simulators():
    con = duckdb.connect()
    rng = random.Random(17)
    cases = [
        (nfa_step_sql(compile_runlength_regex(PATTERNS[0]), skip_past=True),
         compile_runlength_regex(PATTERNS[0]), True),
        (nfa_step_sql(compile_runlength_alternation(
            permute_patterns(["D{1,}", "U{1,}", "F{1,}"]))),
         compile_runlength_alternation(
            permute_patterns(["D{1,}", "U{1,}", "F{1,}"])), False),
    ]
    for (expr, n), nfa, skip in cases:
        for _ in range(25):
            runs = _rand_runs(rng, rng.randint(0, 12))
            codes = [(DIRS.index(s) + 1) * 1048576 + m for s, m in runs]
            lst = ", ".join(f"CAST({c} AS BIGINT)" for c in codes)
            arr = f"[{lst}]" if codes else "CAST([] AS BIGINT[])"
            got = con.sql(
                f"SELECT CAST(floor(list_reduce(list_prepend("
                f"CAST(0 AS BIGINT), {arr}), (a, r) -> {expr})"
                f" / {2 ** n}) AS BIGINT)"
            ).fetchone()[0]
            assert got == simulate_runlength_nfa(nfa, runs, skip_past=skip), (
                runs, skip,
            )


def test_skip_past_known_sequences():
    nfa = compile_runlength_regex("D{1,}")
    # three D-runs: overlapping counting sees 3 ends; skip-past also 3
    # (each run is consumed and the next starts fresh)
    assert simulate_runlength_nfa(nfa, [("D", 1), ("D", 2), ("D", 1)], True) == 3
    nfa2 = compile_runlength_regex("D{1,} U{1,}")
    seq = [("D", 1), ("U", 1), ("D", 1), ("U", 2)]
    assert simulate_runlength_nfa(nfa2, seq, skip_past=True) == 2
    # overlap mode counts the same two ends here
    assert simulate_runlength_nfa(nfa2, seq) == 2
