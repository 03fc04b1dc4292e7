"""Round-11 operator semantics: exact python/numpy twins for the
stratified split (C232), PII scan (C233) and decision stump (C234)."""

from __future__ import annotations

import hashlib
import re

import pyspark.sql.functions as F

from etl_arcgis_spark.operators.aggregates import (
    _STUMP_W,
    ml_decision_stump,
)
from etl_arcgis_spark.operators.corpus import sample_stratified_split
from etl_arcgis_spark.operators.quality import (
    _PII_EMAIL,
    _PII_IPV4,
    _PII_SSN,
    dq_pii_scan,
)
from etl_arcgis_spark.tables import table

SF = "/root/testdata/sf0.001"


def test_stratified_split_exact_quotas_and_membership(spark):
    docs = table(spark, SF, "documents").select(
        "doc_id", "source", "n_chars"
    ).collect()
    # python twin: per-stratum md5 order, integer-threshold assignment
    by_src: dict = {}
    for r in docs:
        by_src.setdefault(r["source"], []).append(r)
    want: dict = {}
    for src, rows in by_src.items():
        rows.sort(
            key=lambda r: (
                hashlib.md5(str(r["doc_id"]).encode()).hexdigest(),
                r["doc_id"],
            )
        )
        n = len(rows)
        for rk, r in enumerate(rows, 1):
            split = (
                "train" if rk * 10 <= n * 8
                else "val" if rk * 10 <= n * 9
                else "test"
            )
            cell = want.setdefault((src, split), [0, 0, 0])
            cell[0] += 1
            cell[1] += r["n_chars"]
            cell[2] += r["doc_id"]
    got = {
        (r["source"], r["split"]): (r["n_docs"], r["n_chars"], r["id_checksum"])
        for r in sample_stratified_split(spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in want.items()}
    # quota exactness: per stratum, train = floor(0.8n), train+val = floor(0.9n)
    for src, rows in by_src.items():
        n = len(rows)
        assert got[(src, "train")][0] == (n * 8) // 10
        assert got[(src, "train")][0] + got.get((src, "val"), (0,))[0] == (
            n * 9
        ) // 10


def test_pii_scan_matches_python_re(spark):
    docs = table(spark, SF, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    pats = {
        "n_email": re.compile(_PII_EMAIL),
        "n_ssn": re.compile(_PII_SSN),
        "n_ipv4": re.compile(_PII_IPV4),
    }
    want: dict = {}
    for r in docs:
        body = r["text"]
        did = r["doc_id"]
        if did % 7 == 0:
            body += f" contact: user{did}@example.com"
        if did % 11 == 0:
            body += " ssn 123-45-" + str(10000 + did % 10000)[1:5]
        if did % 13 == 0:
            body += f" host 10.0.{did % 256}.7"
        cell = want.setdefault(r["source"], dict(n_docs=0, n_email=0, n_ssn=0, n_ipv4=0, n_any=0))
        cell["n_docs"] += 1
        hit = False
        for k, p in pats.items():
            if p.search(body):
                cell[k] += 1
                hit = True
        cell["n_any"] += int(hit)
    out = {r["source"]: r for r in dq_pii_scan(spark, SF).collect()}
    assert set(out) == set(want)
    for src, w in want.items():
        o = out[src]
        assert (o["n_docs"], o["n_email"], o["n_ssn"], o["n_ipv4"]) == (
            w["n_docs"], w["n_email"], w["n_ssn"], w["n_ipv4"]
        )
        assert abs(o["pii_rate"] - round(w["n_any"] / w["n_docs"], 4)) < 1e-9
        # planted markers guarantee non-zero detections per source
        assert o["n_email"] > 0


def test_decision_stump_matches_bruteforce(spark):
    rows = table(spark, SF, "orders").select(
        "o_totalprice", "o_orderstatus"
    ).collect()
    import collections

    nb: dict = collections.Counter()
    pb: dict = collections.Counter()
    for r in rows:
        b = min(int(r["o_totalprice"] // _STUMP_W), 255)
        nb[b] += 1
        pb[b] += int(r["o_orderstatus"] == "F")
    bs = sorted(nb)
    n = sum(nb.values())
    p = sum(pb.values())
    best = None
    nl = pl = 0
    for b in bs:
        nl += nb[b]
        pl += pb[b]
        if nl >= n:
            continue
        nr, pr = n - nl, p - pl
        wg = (
            nl - (pl * pl + (nl - pl) ** 2) / nl
            + nr - (pr * pr + (nr - pr) ** 2) / nr
        ) / n
        key = (round(wg * 1e12), b)
        if best is None or key < best:
            best = key
    got = ml_decision_stump(spark, SF).collect()[0]
    assert got["split_bucket"] == best[1]
    assert got["threshold"] == (best[1] + 1) * _STUMP_W
    assert abs(got["weighted_gini"] - round(best[0] / 1e12, 6)) < 1e-9
    base = 1.0 - (p * p + (n - p) ** 2) / n / n
    assert abs(got["base_gini"] - round(base, 6)) < 1e-9
    # the split must actually reduce impurity on this label
    assert got["weighted_gini"] < got["base_gini"]


def test_krippendorff_alpha_matches_python_twin(spark):
    from etl_arcgis_spark.operators.aggregates import (
        stats_krippendorff_alpha,
    )

    docs = table(spark, SF, "documents").select("doc_id").collect()

    def base(did: int) -> str:
        h = hashlib.md5(str(did).encode()).hexdigest()
        return "abc"["0123456789abcdef".index(h[0]) % 3]

    shift = {"a": "b", "b": "c", "c": "a"}
    units = []
    for r in docs:
        did = r["doc_id"]
        b = base(did)
        units.append(
            (b, shift[b] if did % 5 == 0 else b, shift[b] if did % 7 == 0 else b)
        )
    # exact integer coincidence computation (m = 3 raters per unit)
    import collections

    agree2 = 0
    n_c: dict = collections.Counter()
    for labels in units:
        mc = collections.Counter(labels)
        agree2 += sum(m * (m - 1) for m in mc.values())
        n_c.update(mc)
    U = len(units)
    n = sum(n_c.values())
    do2 = 6 * U - agree2
    de_num = n * n - sum(v * v for v in n_c.values())
    # do2 is (m-1)=2-scaled: true Do = do2/2, so alpha halves the ratio
    alpha = 1 - do2 * (n - 1) / (2 * de_num)
    got = stats_krippendorff_alpha(spark, SF).collect()[0]
    assert got["n_units"] == U and got["n_votes"] == n
    assert got["do2"] == do2 and got["de_num"] == de_num
    assert abs(got["alpha"] - round(alpha, 6)) < 1e-12
    # planted-disagreement sanity: substantial but imperfect agreement
    assert 0.3 < got["alpha"] < 0.95
