"""Driver-contract smoke tests: entry(), queries()/oracle_sql() shape."""

from __future__ import annotations

import importlib.util
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def load_entry():
    spec = importlib.util.spec_from_file_location("__spark_entry__", REPO / "__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_flagship(spark):
    mod = load_entry()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 6  # returnflag x linestatus groups
    assert {f.name for f in df.schema.fields} >= {"l_returnflag", "sum_qty", "revenue"}


def test_contract_shape(spark):
    mod = load_entry()
    qs = mod.queries()
    oracles = mod.oracle_sql()
    assert len(qs) >= 71  # full SURVEY §2.1 inventory
    # every oracle key has a query
    assert set(oracles) <= set(qs)
    # weak set is exactly the declared seeded/approximate/iterative ops
    weak = set(qs) - set(oracles)
    assert weak == {
        "agg_approx_count_distinct",
        "agg_hll_sketch_rollup",
        "minhash_lsh_dedup",
        "multimodal_audio_chunk",
        "multimodal_image_decode",
        "multimodal_video_frame_sample",
        "multimodal_image_resize",
        "multimodal_image_patchify",
        "multimodal_audio_spectrum",
        "multimodal_scene_cuts",   # r4: binary codec, unit-tested planted cuts
        "multimodal_pq_quantize",  # r4: iterative k-means, monotonicity-tested
        "sim_mmr_rerank",          # r5: sequential greedy MMR, invariant-tested
        "agg_approx_percentile_sketch",  # r5: GK sketch, rank-error-bound-tested
        "sim_pca_whiten",          # r5: driver-side eigh, identity-cov-tested
        "text_zlib_compression_ratio",  # r5: zlib has no SQL twin; ordering-tested
        "multimodal_phash_neardup",  # r10: binary codec; planted-recall + golden-gated
    }
