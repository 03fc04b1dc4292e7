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
