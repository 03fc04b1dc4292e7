"""Semantics tests for the round-10 extension operators (C200+) —
brute-force / known-answer references on crafted inputs. The check.py
oracles prove fixture agreement; these prove the FORMULAS on
adversarial cases (planted orientations, degenerate rings, known
sketch collisions, hand-computed statistics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_arcgis_spark.geojson import orient_rings_esri, ring_signed_area2


# ---------------------------------------------------------------------------
# C200: ring-winding repair (terraformer geojsonToArcGIS semantics)

# integer-coordinate unit squares: orientation is exact, no trig
_CCW_SQ = [[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]]
_CW_SQ = list(reversed(_CCW_SQ))
_CCW_HOLE = [[0.5, 0.5], [1.5, 0.5], [1.5, 1.5], [0.5, 1.5]]
_CW_HOLE = list(reversed(_CCW_HOLE))
# closed variant (first vertex repeated) — GeoJSON's usual spelling
_CCW_SQ_CLOSED = _CCW_SQ + [_CCW_SQ[0]]


def test_ring_signed_area2_sign_and_closure(spark):
    rows = [
        ("ccw", [[_CCW_SQ]]),
        ("cw", [[_CW_SQ]]),
        ("ccw_closed", [[_CCW_SQ_CLOSED]]),
    ]
    df = spark.createDataFrame(
        rows, "id string, coords array<array<array<array<double>>>>"
    )
    out = {
        r["id"]: r["s2"]
        for r in df.select(
            "id", ring_signed_area2(F.col("coords")[0][0]).alias("s2")
        ).collect()
    }
    assert out["ccw"] == 8.0  # 2x area of the 2x2 square, CCW positive
    assert out["cw"] == -8.0
    assert out["ccw_closed"] == 8.0  # closure edge contributes 0


def test_orient_rings_esri_repairs_only_wrong_rings(spark):
    rows = [
        # RFC 7946 polygon (outer CCW, hole CW) -> BOTH rings flip
        ("geojson", "Polygon", [[_CCW_SQ, _CW_HOLE]]),
        # already Esri-oriented (outer CW, hole CCW) -> untouched
        ("esri", "Polygon", [[_CW_SQ, _CCW_HOLE]]),
        # non-polygon passes through even though its "ring" is CCW
        ("line", "LineString", [[_CCW_SQ]]),
    ]
    df = spark.createDataFrame(
        rows, "id string, geom_type string, coords array<array<array<array<double>>>>"
    )
    fixed = {r["id"]: r["coords"] for r in orient_rings_esri(df).collect()}
    # repaired GeoJSON polygon: outer now CW, hole now CCW
    assert fixed["geojson"][0][0] == _CW_SQ
    assert fixed["geojson"][0][1] == _CCW_HOLE
    # correctly-oriented polygon is bit-identical
    assert fixed["esri"][0][0] == _CW_SQ
    assert fixed["esri"][0][1] == _CCW_HOLE
    # LineString untouched (still CCW order)
    assert fixed["line"][0][0] == _CCW_SQ


def test_orient_rings_esri_multipolygon_per_part(spark):
    rows = [
        (
            "mp",
            "MultiPolygon",
            [[_CCW_SQ], [_CW_SQ, _CW_HOLE]],  # part 0 flips; part 1 hole flips
        )
    ]
    df = spark.createDataFrame(
        rows, "id string, geom_type string, coords array<array<array<array<double>>>>"
    )
    fixed = orient_rings_esri(df).collect()[0]["coords"]
    assert fixed[0][0] == _CW_SQ
    assert fixed[1][0] == _CW_SQ
    assert fixed[1][1] == _CCW_HOLE
