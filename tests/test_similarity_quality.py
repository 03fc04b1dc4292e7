"""Quality assertions for the approximate similarity operators — the
weak (no-oracle) queries get behavioral checks here instead."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_arcgis_spark import registry

SF_DIR = "/root/testdata/sf0.001"


def test_ivf_knn_recall_vs_exact(spark):
    qs = registry.all_queries()
    exact = [r["vec_id"] for r in qs["sim_knn_query_vector"](spark, SF_DIR).collect()]
    ivf = [r["vec_id"] for r in qs["sim_ivf_knn"](spark, SF_DIR).collect()]
    recall = len(set(exact) & set(ivf)) / len(exact)
    # nprobe=2 of 8 cells; measured 1.0 at every SF — assert a safe floor
    assert recall >= 0.7


def test_lsh_pairs_are_true_positives_and_nonempty(spark):
    qs = registry.all_queries()
    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in qs["lsh_approx_join"](spark, SF_DIR).collect()}
    assert got, "LSH bucketing produced no candidate pairs"
    # every emitted pair passed the exact-cosine verification threshold
    assert all(c >= 0.3 for c in got.values())
    # ordering invariant: i < j
    assert all(a < b for a, b in got)


def test_minhash_pairs_verified(spark):
    qs = registry.all_queries()
    rows = qs["minhash_lsh_dedup"](spark, SF_DIR).collect()
    # candidates survive only with exact trigram Jaccard >= 0.5
    assert all(r["jaccard"] >= 0.5 and r["id_a"] < r["id_b"] for r in rows)


def test_ivf_partitioned_layout_prunes_cells(spark, tmp_path):
    """The sim_ivf_knn docstring's 100 TB claim, executed: cells stored
    as partition keys -> probing nprobe cells is PARTITION PRUNING (the
    scan plans only the probed directories), and the pruned top-k
    equals the full-scan IVF result."""
    import numpy as np
    from pyspark.sql import functions as F

    from etl_arcgis_spark import registry
    from etl_arcgis_spark.tables import table

    e = table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    head = e.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    m = np.stack([np.asarray(r["embedding"], dtype="float64") for r in head])
    cents = m / np.linalg.norm(m, axis=1, keepdims=True)
    q = cents[0]
    probe = [int(c) for c in np.argsort(-(cents @ q))[:2]]

    # assign each vector to its nearest centroid, entirely in SQL HOFs
    dot = (
        "aggregate(zip_with(embedding, array({c}), (x, y) -> cast(x as double) * y), "
        "0D, (acc, v) -> acc + v) / "
        "sqrt(aggregate(transform(embedding, x -> cast(x as double) * cast(x as double)), "
        "0D, (acc, v) -> acc + v))"
    )
    scores = F.array(
        *[F.expr(dot.format(c=", ".join(f"{v}D" for v in cents[i]))) for i in range(8)]
    )
    assigned = (
        e.withColumn("s", scores)
        .withColumn("cell", F.expr("array_position(s, array_max(s)) - 1").cast("int"))
        .drop("s")
    )
    out = str(tmp_path / "ivf_cells")
    assigned.write.mode("overwrite").partitionBy("cell").parquet(out)

    probed = spark.read.parquet(out).filter(F.col("cell").isin(probe))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan.split("PartitionFilters")[1][:120]

    qb = q.tolist()
    qdot = (
        "aggregate(zip_with(embedding, array({c}), (x, y) -> cast(x as double) * y), "
        "0D, (acc, v) -> acc + v) / "
        "sqrt(aggregate(transform(embedding, x -> cast(x as double) * cast(x as double)), "
        "0D, (acc, v) -> acc + v))"
    ).format(c=", ".join(f"{v}D" for v in qb))
    got = [
        r["vec_id"]
        for r in probed.filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(F.expr(qdot), 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
        .collect()
    ]
    want = [r["vec_id"] for r in registry.all_queries()["sim_ivf_knn"](spark, SF_DIR).collect()]
    assert got == want and len(got) == 10


def test_pq_distortion_monotone_nonincreasing(spark):
    """Lloyd's algorithm invariant: mean distortion never increases
    across iterations (each assign step is optimal for the old
    codebook, each update step optimal for the new assignment)."""
    from etl_arcgis_spark.operators.similarity import pq_train_distortions

    d, cb = pq_train_distortions(spark, "/root/testdata/sf0.001", iters=3)
    assert len(d) == 3
    assert d[0] >= d[1] >= d[2] >= 0
    # codebook shape: 8 subspaces x 16 centroids x 8 dims
    assert set(cb) == set(range(8))
    assert all(c.shape == (16, 8) for c in cb.values())


# ------------------------------------------------------- MMR re-ranking


def test_mmr_lambda_one_is_plain_topk(spark):
    """lam=1 removes the diversity penalty: MMR must equal the plain
    top-k relevance ranking (the sim_knn_query_vector order)."""
    from etl_arcgis_spark.operators.similarity import mmr_rerank

    got = mmr_rerank(spark, "/root/testdata/sf0.001", k=5, lam=1.0).collect()
    knn = (
        registry.all_queries()["sim_knn_query_vector"](
            spark, "/root/testdata/sf0.001"
        )
        .limit(5)
        .collect()
    )
    assert [r.vec_id for r in got] == [r.vec_id for r in knn]
    # with no penalty the score IS lam * relevance
    for r in got:
        assert abs(r.mmr_score - r.relevance) < 1e-9


def test_mmr_invariants(spark):
    from etl_arcgis_spark.operators.similarity import mmr_rerank

    df = mmr_rerank(spark, "/root/testdata/sf0.001", k=5, lam=0.5, pool_size=20)
    rows = df.orderBy("rank").collect()
    assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
    assert len({r.vec_id for r in rows}) == 5
    # first pick is the most relevant pool member (penalty is 0 then)
    knn_top = (
        registry.all_queries()["sim_knn_query_vector"](
            spark, "/root/testdata/sf0.001"
        )
        .limit(1)
        .collect()[0]
    )
    assert rows[0].vec_id == knn_top.vec_id
    # recompute every score from raw embeddings: score must equal
    # lam*rel - (1-lam)*max_sim(selected-so-far) (penalty may be
    # NEGATIVE — cosine spans [-1, 1] — so no one-sided bound holds)
    from etl_arcgis_spark.tables import table

    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in table(spark, "/root/testdata/sf0.001", "embeddings").collect()
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (
            sum(x * x for x in a) ** 0.5 * sum(x * x for x in b) ** 0.5
        )

    qv = emb[0]
    for i, r in enumerate(rows):
        rel = cos(emb[r.vec_id], qv)
        pen = max(
            (cos(emb[r.vec_id], emb[p.vec_id]) for p in rows[:i]), default=0.0
        )
        assert abs(r.mmr_score - round(0.5 * rel - 0.5 * pen, 4)) <= 1e-4
    # relevance of later picks never exceeds the first pick's
    assert all(r.relevance <= rows[0].relevance + 1e-9 for r in rows)


def test_mmr_diversifies_vs_plain_topk(spark):
    """The point of MMR: with lam < 1 the average pairwise similarity
    of the selected set is <= the plain top-k's (strictly, on any pool
    containing near-duplicate top hits; here assert non-strict)."""
    import itertools

    from etl_arcgis_spark.operators.similarity import mmr_rerank
    from etl_arcgis_spark.tables import table

    sf = "/root/testdata/sf0.001"
    mmr_ids = [r.vec_id for r in mmr_rerank(spark, sf, k=5, lam=0.3).collect()]
    top_ids = [
        r.vec_id
        for r in registry.all_queries()["sim_knn_query_vector"](spark, sf)
        .limit(5)
        .collect()
    ]
    emb = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in table(spark, sf, "embeddings")
        .filter(F.col("vec_id").isin([*mmr_ids, *top_ids]))
        .collect()
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return dot / (na * nb)

    def avg_pairwise(ids):
        ps = [cos(emb[a], emb[b]) for a, b in itertools.combinations(ids, 2)]
        return sum(ps) / len(ps)

    assert avg_pairwise(mmr_ids) <= avg_pairwise(top_ids) + 1e-9


# -------------------------------------------------------- PCA whitening


def test_pca_whiten_identity_covariance(spark):
    """Whitening's defining property: the whitened corpus has unit
    variance along every retained component and ~zero cross-component
    covariance; eigenvalues come out sorted descending."""
    from etl_arcgis_spark.operators.similarity import pca_whiten

    out, lam = pca_whiten(spark, "/root/testdata/sf0.001", n_components=6)
    assert all(lam[i] >= lam[i + 1] - 1e-12 for i in range(len(lam) - 1))
    rows = out.collect()
    import numpy as np

    W = np.array([r.white for r in rows])
    cov = np.cov(W, rowvar=False, bias=True)
    assert np.allclose(np.diag(cov), 1.0, atol=1e-6)
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 1e-6
    # registered summary agrees
    from etl_arcgis_spark import registry

    summary = registry.all_queries()["sim_pca_whiten"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert all(abs(r.whitened_var - 1.0) < 1e-3 for r in summary)


def test_mmr_pool_size_hard_bound(spark):
    """The driver-side greedy stage must refuse a data-sized pool: the
    pool bound is what makes the collect() constants-only."""
    import pytest as _pt

    from etl_arcgis_spark.operators.similarity import mmr_rerank

    with _pt.raises(ValueError, match="pool_size"):
        mmr_rerank(spark, "/root/testdata/sf0.001", pool_size=100_000)
