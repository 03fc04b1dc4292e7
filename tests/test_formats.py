"""Round-trip tests for sources/formats.py: every interchange format
re-reads to exactly the rows written, including type-sensitive columns
(timestamps, doubles, nulls-vs-empty strings, arrays where supported).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_arcgis_spark.sources.formats import read_table, write_table
from etl_arcgis_spark.tables import table

SF = "/root/testdata/sf0.001"


def _sorted_rows(df, key):
    return [tuple(r) for r in df.orderBy(*key).collect()]


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_lineitem_roundtrip(spark, fmt, tmp_path):
    # timestamps + doubles + strings through every format
    src = table(spark, SF, "lineitem")
    path = str(tmp_path / f"lineitem_{fmt}")
    write_table(src, path, fmt)
    back = read_table(spark, path, fmt, schema=src.schema)
    assert back.schema == src.schema
    key = ["l_orderkey", "l_linenumber"]
    assert _sorted_rows(back, key) == _sorted_rows(src, key)


@pytest.mark.parametrize("fmt", ["json", "orc"])
def test_embeddings_roundtrip_arrays(spark, fmt, tmp_path):
    # array<float> columns survive json/orc (csv has no array encoding)
    src = table(spark, SF, "embeddings")
    path = str(tmp_path / f"embeddings_{fmt}")
    write_table(src, path, fmt)
    back = read_table(spark, path, fmt, schema=src.schema)
    assert back.schema == src.schema
    assert _sorted_rows(back, ["vec_id"]) == _sorted_rows(src, ["vec_id"])


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_null_vs_empty_string(spark, fmt, tmp_path):
    src = spark.createDataFrame(
        [Row(k=1, v="x"), Row(k=2, v=""), Row(k=3, v=None), Row(k=4, v="a,b\nc")],
    )
    path = str(tmp_path / f"nullempty_{fmt}")
    write_table(src, path, fmt)
    back = read_table(spark, path, fmt, schema=src.schema)
    got = {r["k"]: r["v"] for r in back.collect()}
    assert got == {1: "x", 2: "", 3: None, 4: "a,b\nc"}


def test_csv_requires_schema(spark, tmp_path):
    src = table(spark, SF, "region")
    path = str(tmp_path / "region_csv")
    write_table(src, path, "csv")
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, path, "csv")


def test_orc_filter_pushdown(spark, tmp_path):
    # the columnar path keeps predicate pushdown: the pushed filter must
    # appear in the scan, not in a post-scan Filter only
    src = table(spark, SF, "orders")
    path = str(tmp_path / "orders_orc")
    write_table(src, path, "orc")
    back = read_table(spark, path, "orc").filter(F.col("o_orderkey") == 7)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderkey" in plan.split("PushedFilters")[1][:120]


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_explicit_schema_matches_inference(spark, sf_dir):
    """Optimization r12: tables.table() hands the reader an explicit
    schema built from a driver-side pyarrow footer read, eliminating
    the per-call 1-task schema-inference job. The mapping must equal
    Spark's own inference under the module's read policy for EVERY
    fixture table, or plans/results could drift."""
    from etl_arcgis_spark.tables import TABLE_NAMES, parquet_schema, prepare

    prepare(spark)
    for name in TABLE_NAMES:
        path = f"{sf_dir}/{name}.parquet"
        inferred = spark.read.parquet(path).schema
        explicit = parquet_schema(path)
        assert [(f.name, f.dataType) for f in explicit] == [
            (f.name, f.dataType) for f in inferred
        ], f"{name}: explicit schema drifted from inference"
