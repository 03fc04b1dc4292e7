"""Quality assertions for the approximate similarity operators — the
weak (no-oracle) queries get behavioral checks here instead."""

from __future__ import annotations

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
