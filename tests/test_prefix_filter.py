"""Losslessness proof for prefix-filtered set-similarity join
(SURVEY.md §2, dedup_prefix_filter_join).

The DuckDB oracle in tools/check.py establishes fixture parity; these
tests pin the ALGORITHMIC claim — the prefix + length filters drop no
qualifying pair — by comparing against an in-test brute-force
all-pairs spelling on corpora crafted to stress the filter boundaries:

* exact-threshold pairs (J == t precisely, via shared/total gram
  counts engineered to hit the boundary);
* document-frequency ties (every gram equally rare → order falls back
  to the lexicographic tiebreak);
* near-identical docs differing in one trailing token;
* disjoint docs and single-bigram docs (prefix length 1).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etl_arcgis_spark.operators.dedup import prefix_filter_jaccard_pairs


def _brute_pairs(spark, docs, t):
    """All-pairs bigram Jaccard via array_intersect — O(n^2) truth."""
    d = docs.withColumn("l", F.split("text", " "))
    grams = d.select(
        "doc_id",
        F.array_distinct(
            F.expr(
                "transform(sequence(1, size(l) - 1), "
                "i -> concat(element_at(l, i), ' ', element_at(l, i + 1)))"
            )
        ).alias("g"),
    )
    a = grams.select(F.col("doc_id").alias("id_a"), F.col("g").alias("ga"))
    b = grams.select(F.col("doc_id").alias("id_b"), F.col("g").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb"))
    jac = inter.cast("double") / (F.size("ga") + F.size("gb") - inter)
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", jac.alias("jac"))
        .filter(F.col("jac") >= t)
    )


def _assert_lossless(spark, texts, t):
    docs = spark.createDataFrame(
        [(i, s) for i, s in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b): round(r.jac, 6)
        for r in prefix_filter_jaccard_pairs(docs, t).collect()
    }
    want = {
        (r.id_a, r.id_b): round(r.jac, 6)
        for r in _brute_pairs(spark, docs, t).collect()
    }
    assert got == want


def test_boundary_and_tie_corpus(spark):
    # a/b share 3 of 4 distinct bigrams -> J = 3/5 >= 0.5 (boundary-ish);
    # c/d identical; e disjoint; f single-bigram.
    texts = [
        "w x y z q",          # bigrams: wx xy yz zq
        "w x y z r",          # shares wx xy yz  -> J = 3/5
        "m n o p",            # c
        "m n o p",            # d identical -> J = 1
        "aa bb cc",           # e disjoint from all
        "k k",                # f single bigram "k k"
        "k k",                # g duplicate single-bigram -> J = 1 with f
    ]
    _assert_lossless(spark, texts, 0.5)


def test_exact_threshold_pair(spark):
    # J exactly t: 2 shared, 2+4-2=4 union -> 0.5 with t=0.5 must be KEPT
    texts = ["a b c", "a b c d e"]  # shared: ab bc ; union: ab bc cd de -> 2/4
    _assert_lossless(spark, texts, 0.5)


def test_random_corpora_lossless(spark):
    rng = random.Random(41)
    vocab = [f"t{i}" for i in range(12)]  # small vocab -> heavy overlap + df ties
    for trial in range(3):
        texts = [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 14)))
            for _ in range(30)
        ]
        for t in (0.3, 0.6):
            _assert_lossless(spark, texts, t)
