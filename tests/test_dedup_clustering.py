"""Invariant tests for dedup_cluster_components (SURVEY.md §2 C40).

The DuckDB oracle (tools/check.py) establishes value parity; these
tests pin the *graph* invariants that make the output a valid
connected-components labeling, independent of the oracle:

1. every near-dup edge's endpoints land in the same component;
2. each component's id is the minimum doc_id of its members
   (min-label propagation fixpoint);
3. component sizes partition the document set (sum == |documents|).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_arcgis_spark.operators.dedup import (
    _bigram_jaccard_pairs,
    dedup_cluster_components,
    propagate_min_labels,
)
from etl_arcgis_spark.tables import table

SF = "/root/testdata/sf0.01"


def test_components_partition_documents(spark):
    comp = dedup_cluster_components(spark, SF)
    total = comp.agg(F.sum("n_members")).collect()[0][0]
    n_docs = table(spark, SF, "documents").count()
    assert total == n_docs


def test_component_id_is_min_member(spark):
    comp = dedup_cluster_components(spark, SF)
    bad = comp.filter(F.col("component_id") != F.col("min_doc_id")).count()
    assert bad == 0


def test_edges_never_cross_components(spark):
    docs = table(spark, SF, "documents")
    pairs = _bigram_jaccard_pairs(docs, 0.2).select("id_a", "id_b")
    labels = propagate_min_labels(docs.select("doc_id"), pairs)
    crossing = (
        pairs.join(
            labels.withColumnRenamed("doc_id", "id_a").withColumnRenamed(
                "component_id", "comp_a"
            ),
            "id_a",
        )
        .join(
            labels.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
                "component_id", "comp_b"
            ),
            "id_b",
        )
        .filter(F.col("comp_a") != F.col("comp_b"))
        .count()
    )
    assert crossing == 0


def test_long_chain_converges(spark):
    # adversarial shape: a 40-node path graph (diameter 39). Pure
    # one-hop propagation would need 39 rounds (past the 30-round cap);
    # the pointer-jumping step collapses the chain geometrically, so
    # this converges in ~6 rounds. Guards both the cap and the jump.
    nodes = spark.range(40).select(F.col("id").alias("doc_id"))
    chain = spark.range(39).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    labels = propagate_min_labels(nodes, chain)
    distinct = labels.select("component_id").distinct().collect()
    assert [r[0] for r in distinct] == [0]
