"""Invariant tests for the quality gate, DQ rules, sampling, and
PageRank operators (oracle parity is covered by tools/check.py; these
pin semantics the diff can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_arcgis_spark.operators.graph import graph_pagerank_fixed
from etl_arcgis_spark.operators.quality import dq_rule_checks, profile_numeric_columns
from etl_arcgis_spark.operators.text import (
    sample_shard_assign,
    sample_stratified_balanced,
    text_quality_gate,
)

SF = "/root/testdata/sf0.001"


def test_quality_gate_keep_is_conjunction(spark):
    g = text_quality_gate(spark, SF)
    bad = g.filter(
        F.col("keep")
        != (~F.col("too_short") & ~F.col("too_long") & ~F.col("repetitive"))
    ).count()
    assert bad == 0


def test_dq_gate_reports_every_rule_with_sane_rates(spark):
    rows = {r["rule"]: r for r in dq_rule_checks(spark, SF).collect()}
    assert set(rows) == {
        "discount_in_unit_range",
        "quantity_le_45",
        "ship_not_before_order",
        "lineitem_fk_orders",
    }
    for r in rows.values():
        assert 0 <= r["rate"] <= 1
        assert r["n_violations"] >= 0
    # referential integrity holds in the fixtures
    assert rows["lineitem_fk_orders"]["n_violations"] == 0


def test_profile_covers_declared_columns(spark):
    rows = profile_numeric_columns(spark, SF).collect()
    assert {r["col"] for r in rows} == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    }
    for r in rows:
        assert r["min_v"] <= r["max_v"]
        assert r["n_distinct"] > 0


def test_stratified_sample_caps_every_stratum(spark):
    s = sample_stratified_balanced(spark, SF)
    per = s.groupBy("source").agg(F.count(F.lit(1)).alias("n"),
                                  F.max("rank_in_stratum").alias("mx"))
    assert per.filter((F.col("n") > 10) | (F.col("mx") > 10)).count() == 0
    # deterministic: two runs agree exactly
    a = {tuple(r) for r in s.collect()}
    b = {tuple(r) for r in sample_stratified_balanced(spark, SF).collect()}
    assert a == b


def test_shard_assign_is_total_and_contiguous(spark):
    from etl_arcgis_spark.tables import table

    sh = sample_shard_assign(spark, SF)
    assert sh.count() == table(spark, SF, "documents").count()
    # positions within a shard are 1..n_shard with no gaps
    per = sh.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
    )
    assert per.filter((F.col("mx") != F.col("n")) | (F.col("mn") != 1)).count() == 0
    assert per.filter((F.col("shard") < 0) | (F.col("shard") > 7)).count() == 0


def test_pagerank_scaled_ranks_are_positive_and_bounded(spark):
    pr = graph_pagerank_fixed(spark, SF)
    rows = pr.collect()
    assert len(rows) == 50
    # scaled ranks: positive, and the top-50 of a mean-1 distribution
    # must each be >= the floor component (1-d) = 0.15
    assert all(r["rank_scaled"] > 0.15 for r in rows)
    # sorted descending
    vals = [r["rank_scaled"] for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_zorder_key_bijective_and_locality(spark):
    """etl_zorder_key: the Morton interleave is a bijection on the
    16+16-bit grid (no two (x, y) cells collide) and preserves
    locality: nearby (x, y) differ in low-order zkey bits only."""
    from etl_arcgis_spark import registry

    rows = registry.all_queries()["etl_zorder_key"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    seen = {}
    for r in rows:
        k = (r["x"], r["y"])
        if k in seen:
            assert seen[k] == r["zkey"]  # same cell -> same key
        seen[k] = r["zkey"]
    assert len(set(seen.values())) == len(seen)  # distinct cells -> distinct keys
    # spot-check the interleave definition on a few cells
    for (x, y), z in list(seen.items())[:50]:
        want = 0
        for i in range(16):
            want |= ((x >> i) & 1) << (2 * i)
            want |= ((y >> i) & 1) << (2 * i + 1)
        assert z == want


def test_chunk_sliding_covers_every_token_with_bounded_overlap(spark):
    """text_chunk_sliding: chunks tile each document — every token
    index is covered, consecutive chunks overlap by exactly 8 tokens
    (except the final short chunk), and stride is constant."""
    from collections import defaultdict

    from etl_arcgis_spark import registry

    rows = registry.all_queries()["text_chunk_sliding"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append(r)
    assert by_doc
    for doc_id, chunks in list(by_doc.items())[:100]:
        chunks.sort(key=lambda r: r["chunk_id"])
        n_tok = chunks[0]["n_tok"]
        covered = set()
        for r in chunks:
            start = r["chunk_id"] * 24  # 0-based start
            assert r["chunk_tokens"] == min(32, n_tok - start), (doc_id, r)
            covered.update(range(start, start + r["chunk_tokens"]))
        assert covered == set(range(n_tok)), doc_id


def test_top_p_nucleus_threshold_and_minimality(spark):
    """sample_top_p_nucleus: per language the kept set covers >= 80% of
    char mass, and it is MINIMAL — dropping the last-kept source falls
    below 80%."""
    from collections import defaultdict

    from etl_arcgis_spark import registry
    from etl_arcgis_spark.tables import table

    rows = registry.all_queries()["sample_top_p_nucleus"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    totals = {
        r["lang"]: r["total"]
        for r in table(spark, "/root/testdata/sf0.001", "documents")
        .groupBy("lang")
        .agg({"n_chars": "sum"})
        .withColumnRenamed("sum(n_chars)", "total")
        .collect()
    }
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r["lang"]].append(r)
    assert set(by_lang) == set(totals)
    for lang, kept in by_lang.items():
        kept.sort(key=lambda r: r["cum_chars"])
        total = totals[lang]
        assert kept[-1]["cum_chars"] * 10 >= total * 8  # coverage
        if len(kept) > 1:  # minimality: without the crossing source
            assert (kept[-1]["cum_chars"] - kept[-1]["chars"]) * 10 < total * 8


def test_split_fractions_and_temperature_normalization(spark):
    """sample_train_val_test lands near 90/5/5 overall;
    sample_temperature_mix's temperature shares sum to 1 and flatten
    the distribution (max share shrinks, min share grows)."""
    from etl_arcgis_spark import registry

    qs = registry.all_queries()
    split_rows = qs["sample_train_val_test"](spark, "/root/testdata/sf0.01").collect()
    by_split = {}
    for r in split_rows:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    n = sum(by_split.values())
    assert 0.85 <= by_split["train"] / n <= 0.95
    assert by_split["val"] / n <= 0.10 and by_split["test"] / n <= 0.10

    mix = qs["sample_temperature_mix"](spark, "/root/testdata/sf0.01").collect()
    assert abs(sum(r["p_temp"] for r in mix) - 1.0) < 1e-3
    assert max(r["p_temp"] for r in mix) < max(r["p_raw"] for r in mix)
    assert min(r["p_temp"] for r in mix) > min(r["p_raw"] for r in mix)


def test_bpe_pair_mass_conservation(spark):
    """text_bpe_pair_counts: total pair mass over ALL pairs equals
    sum(freq * (len(word) - 1)) over the vocabulary — no pair lost or
    double-counted. (The query returns top-30; recompute unlimited.)"""
    from pyspark.sql import functions as F

    from etl_arcgis_spark.tables import table

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    want = words.select(
        F.sum(F.col("freq") * (F.length("w") - 1)).alias("m")
    ).first()["m"]
    got = words.select(
        F.explode(F.expr(
            "transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))"
        )).alias("pair"),
        "freq",
    ).agg(F.sum("freq")).first()[0]
    assert got == want and want > 0
