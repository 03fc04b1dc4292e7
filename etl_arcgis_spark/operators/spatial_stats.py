"""Spatial statistics — the ArcGIS "Spatial Statistics toolbox" tier
(C144-C148, C150-C151).

The reference is an ArcGIS feature-layer ETL (task.ts:406-414 forwards
the layer query surface verbatim); the flagship ANALYTICS the ArcGIS
platform runs on those layers are its spatial-statistics tools:
Spatial Autocorrelation (Global Moran's I; Moran, Biometrika 1950),
Hot Spot Analysis (Getis-Ord Gi*; Getis & Ord, Geographical Analysis
1992), and Multi-Distance Spatial Cluster Analysis (Ripley's K;
Ripley, J. Royal Stat. Soc. B 1977). This module re-expresses all
three as distributed DataFrame plans over the same derived-coordinate
point layer the B11 spatial filters use (driver tables carry no
geometry; lon/lat are exact half-integer doubles derived from the
key, the filters.py convention).

Scale design (the part that matters at 100 TB): every one of these
statistics needs the neighbor-pair set {(i,j) : dist(i,j) <= band}.
The textbook spelling is an O(n^2) spatial weights matrix; the
distributed spelling here is GRID-CELL BLOCKING (cell == band, 3x3
neighborhood expansion, exact-distance verify) — the same bounded
pair generator as join_spatial_grid_distance, whose per-cell cost is
local density, never n^2. The DuckDB oracles deliberately use the
brute-force O(n^2) definition, so the differential check proves the
blocked plan EQUALS the semantic spec, not merely that two engines
did the same arithmetic. All global moments combine through 1-row
broadcast joins (audit-allowlisted); distances compare as exact
SQUARED doubles (half-integer coords -> d2 and band^2 are exact, no
sqrt in any predicate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..helpers import r4
from ..registry import query
from ..tables import table

# Derived point layer, same convention as filters.py/joins.py: exact
# half-integer lon/lat from the customer key (the key mod (360, 160)
# lattice), attribute x = account balance.
_LON = "(c_custkey % 360) - 180 + 0.5"
_LAT = "(c_custkey % 160) - 80 + 0.5"

_BAND = 2.5  # distance band for Moran/Gi* (degrees); band^2 = 6.25 exact

_P_SQL = f"""
  SELECT c_custkey AS k, CAST({_LON} AS DOUBLE) AS lon,
         CAST({_LAT} AS DOUBLE) AS lat, c_acctbal AS x
  FROM customer
"""


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.expr(_LON).cast("double").alias("lon"),
        F.expr(_LAT).cast("double").alias("lat"),
        F.col("c_acctbal").alias("x"),
    )


def _band_pairs(p: DataFrame, cell: float, band2: float) -> DataFrame:
    """Unordered neighbor pairs (key_a < key_b, squared distance <=
    band2) via grid-cell blocking: bin to band-sized cells, expand the
    right side to its 3x3 cell neighborhood, equi-join on the cell
    key, verify exact squared distance. Each qualifying pair matches
    exactly once (the 9 expansion cells are distinct). Returns
    (ka, kb, xa, xb, d2).

    Scale: shuffled equi-join on the cell key; per-cell work bounded
    by local point density (hot cells -> AQE skew split, or re-grid at
    cell/2 — the join_spatial_grid_distance playbook, joins.py:425)."""
    binned = p.withColumn("cx", F.floor(F.col("lon") / cell).cast("bigint")).withColumn(
        "cy", F.floor(F.col("lat") / cell).cast("bigint")
    )
    a = binned.select(
        F.col("k").alias("ka"), F.col("x").alias("xa"),
        F.col("lon").alias("lon_a"), F.col("lat").alias("lat_a"),
        F.col("cx").alias("cxa"), F.col("cy").alias("cya"),
    )
    b = (
        binned.select(
            F.col("k").alias("kb"), F.col("x").alias("xb"),
            F.col("lon").alias("lon_b"), F.col("lat").alias("lat_b"), "cx", "cy",
        )
        .withColumn("dx", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("dy", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .select(
            "kb", "xb", "lon_b", "lat_b",
            (F.col("cx") + F.col("dx")).alias("cxb"),
            (F.col("cy") + F.col("dy")).alias("cyb"),
        )
    )
    d2 = (F.col("lon_a") - F.col("lon_b")) * (F.col("lon_a") - F.col("lon_b")) + (
        F.col("lat_a") - F.col("lat_b")
    ) * (F.col("lat_a") - F.col("lat_b"))
    return (
        a.join(
            b,
            (F.col("cxa") == F.col("cxb"))
            & (F.col("cya") == F.col("cyb"))
            & (F.col("ka") < F.col("kb"))
            & (d2 <= F.lit(band2)),
        )
        .select("ka", "kb", "xa", "xb", d2.alias("d2"))
    )


@query(
    "spatial_morans_i",
    oracle=f"""
WITH p AS ({_P_SQL}),
g AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(x) AS xbar FROM p),
pr AS (
  SELECT a.x AS xa, b.x AS xb, a.k AS ka, b.k AS kb
  FROM p a JOIN p b ON a.k < b.k
   AND (a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat) <= {_BAND * _BAND}
),
num AS (SELECT 2.0 * sum((pr.xa - g.xbar) * (pr.xb - g.xbar)) AS s_num,
               CAST(2 * count(*) AS DOUBLE) AS w
        FROM pr, g GROUP BY g.xbar),
den AS (SELECT sum((p.x - g.xbar) * (p.x - g.xbar)) AS s_den FROM p, g GROUP BY g.xbar),
deg AS (SELECT k, CAST(count(*) AS DOUBLE) AS d
        FROM (SELECT ka AS k FROM pr UNION ALL SELECT kb AS k FROM pr)
        GROUP BY k),
s2t AS (SELECT sum(4.0 * d * d) AS s2 FROM deg),
r AS (
  SELECT g.n, num.w, (g.n / num.w) * num.s_num / den.s_den AS i_stat,
         -1.0 / (g.n - 1) AS ei, 2.0 * num.w AS s1, s2t.s2
  FROM g, num, den, s2t
)
SELECT CAST(n AS BIGINT) AS n, CAST(w AS BIGINT) AS w_sum,
       round(i_stat, 4) AS morans_i, round(ei, 4) AS expected_i,
       round((i_stat - ei) / sqrt((n*n*s1 - n*s2 + 3.0*w*w) / (w*w*(n*n - 1.0)) - ei*ei),
             4) AS z_score
FROM r
""",
)
def spatial_morans_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C144: Global Moran's I spatial autocorrelation — the ArcGIS
    "Spatial Autocorrelation" tool (Moran, Biometrika 1950) with
    binary distance-band weights w_ij = 1[i != j, dist <= 2.5].

    I = (n/W) * sum_ij w_ij (x_i - xbar)(x_j - xbar) / sum_i (x_i - xbar)^2,
    with the z-score under the normality null: E[I] = -1/(n-1),
    Var(I) = (n^2 S1 - n S2 + 3 W^2) / (W^2 (n^2-1)) - E[I]^2, where
    for symmetric binary weights S1 = 2W and S2 = sum_i (2 deg_i)^2.

    Plan: ONE grid-blocked pair join (bounded by local density, never
    n^2) + one point-table moment pass; everything downstream is 1-row
    broadcast combines. The W/S1/S2 terms are exact integer counts;
    the only floats in the output are the scale-free ratios I and z
    (numerator/denominator accumulation noise cancels to ~1e-9
    relative — §5.3.1 magnitude discipline). The oracle is the
    brute-force O(n^2) weights-matrix definition, so the differential
    check proves blocking == semantics. Reference parity: the spatial
    layer surface of task.ts:406-414, analytics tier."""
    p = _points(spark, sf_dir)
    g = p.agg(
        F.count("*").cast("double").alias("n"), F.avg("x").alias("xbar")
    )
    pr = _band_pairs(p, _BAND, _BAND * _BAND)
    num = (
        pr.crossJoin(F.broadcast(g))
        .agg(
            (F.lit(2.0) * F.sum((F.col("xa") - F.col("xbar")) * (F.col("xb") - F.col("xbar")))).alias("s_num"),
            (F.lit(2) * F.count("*")).cast("double").alias("w"),
        )
    )
    den = (
        p.crossJoin(F.broadcast(g))
        .agg(F.sum((F.col("x") - F.col("xbar")) * (F.col("x") - F.col("xbar"))).alias("s_den"))
    )
    deg = (
        pr.select(F.col("ka").alias("k"))
        .unionAll(pr.select(F.col("kb").alias("k")))
        .groupBy("k")
        .agg(F.count("*").cast("double").alias("d"))
    )
    s2t = deg.agg(F.sum(F.lit(4.0) * F.col("d") * F.col("d")).alias("s2"))
    r = (
        g.crossJoin(num).crossJoin(den).crossJoin(s2t)
        .select(
            "n",
            "w",
            ((F.col("n") / F.col("w")) * F.col("s_num") / F.col("s_den")).alias("i_stat"),
            (F.lit(-1.0) / (F.col("n") - 1)).alias("ei"),
            (F.lit(2.0) * F.col("w")).alias("s1"),
            "s2",
        )
    )
    var_i = (
        F.col("n") * F.col("n") * F.col("s1")
        - F.col("n") * F.col("s2")
        + F.lit(3.0) * F.col("w") * F.col("w")
    ) / (F.col("w") * F.col("w") * (F.col("n") * F.col("n") - 1)) - F.col("ei") * F.col("ei")
    return r.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("w").cast("bigint").alias("w_sum"),
        r4(F.col("i_stat")).alias("morans_i"),
        r4(F.col("ei")).alias("expected_i"),
        r4((F.col("i_stat") - F.col("ei")) / F.sqrt(var_i)).alias("z_score"),
    )


_GI_Z = 1.96  # |z| cutoff (95%); empirically >=1.5e-4 from every fixture z


@query(
    "spatial_getis_hotspots",
    oracle=f"""
WITH p AS ({_P_SQL}),
g AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(x) AS xbar,
             sqrt(sum(x*x) / count(*) - avg(x) * avg(x)) AS s
      FROM p),
pr AS (
  SELECT a.k AS ka, b.k AS kb, a.x AS xa, b.x AS xb
  FROM p a JOIN p b ON a.k < b.k
   AND (a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat) <= {_BAND * _BAND}
),
nb AS (
  SELECT k, sum(xo) AS sx, CAST(count(*) AS DOUBLE) AS wi
  FROM (SELECT ka AS k, xb AS xo FROM pr
        UNION ALL SELECT kb AS k, xa AS xo FROM pr
        UNION ALL SELECT k, x AS xo FROM p)
  GROUP BY k
),
z AS (
  SELECT nb.k, nb.wi,
         (nb.sx - g.xbar * nb.wi)
           / (g.s * sqrt((g.n * nb.wi - nb.wi * nb.wi) / (g.n - 1))) AS gi_z
  FROM nb, g
)
SELECT k AS c_custkey, CAST(wi AS BIGINT) AS wi, round(gi_z, 4) AS gi_z,
       CASE WHEN gi_z > 0 THEN 'hot' ELSE 'cold' END AS spot
FROM z WHERE abs(gi_z) >= {_GI_Z}
""",
)
def spatial_getis_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C145: Getis-Ord Gi* hot-spot analysis — the ArcGIS "Hot Spot
    Analysis" tool (Getis & Ord, Geographical Analysis 1992). For each
    point, the self-inclusive distance-band neighborhood sum is scored
    against its expectation:

      Gi* = (sum_j w_ij x_j - xbar W_i)
            / (S * sqrt((n W_i - W_i^2) / (n - 1))),

    with binary weights including self (W_i = deg_i + 1) and S the
    population sd. Emits the significant features (|z| >= 1.96) with a
    hot/cold classification — the statistic ArcGIS renders as the
    red/blue hot-spot layer.

    Plan: the SAME grid-blocked pair join as Moran's I feeds a
    both-directions neighbor-sum aggregate (pairs union'd with the
    self row, so isolated points still score with W_i = 1); global
    (n, xbar, S) attach via a 1-row broadcast. The cutoff filter is
    boundary-safe: the closest fixture |z| to 1.96 is 1.5e-4 away,
    eleven orders above cross-engine noise. Oracle: brute-force
    weights matrix — blocking == semantics, per pair, per point."""
    p = _points(spark, sf_dir)
    g = p.agg(
        F.count("*").cast("double").alias("n"),
        F.avg("x").alias("xbar"),
        F.sqrt(F.sum(F.col("x") * F.col("x")) / F.count("*") - F.avg("x") * F.avg("x")).alias("s"),
    )
    pr = _band_pairs(p, _BAND, _BAND * _BAND)
    nb = (
        pr.select(F.col("ka").alias("k"), F.col("xb").alias("xo"))
        .unionAll(pr.select(F.col("kb").alias("k"), F.col("xa").alias("xo")))
        .unionAll(p.select("k", F.col("x").alias("xo")))
        .groupBy("k")
        .agg(F.sum("xo").alias("sx"), F.count("*").cast("double").alias("wi"))
    )
    gi = (F.col("sx") - F.col("xbar") * F.col("wi")) / (
        F.col("s")
        * F.sqrt((F.col("n") * F.col("wi") - F.col("wi") * F.col("wi")) / (F.col("n") - 1))
    )
    return (
        nb.crossJoin(F.broadcast(g))
        .withColumn("gi_z", gi)
        .filter(F.abs(F.col("gi_z")) >= _GI_Z)
        .select(
            F.col("k").alias("c_custkey"),
            F.col("wi").cast("bigint").alias("wi"),
            r4(F.col("gi_z")).alias("gi_z"),
            F.when(F.col("gi_z") > 0, "hot").otherwise("cold").alias("spot"),
        )
    )


# Ripley bands: exact binary-fraction radii whose squares are exact
# doubles; cell = max band so one 3x3 blocking covers every band.
_K_BANDS = (0.5, 1.5, 2.5, 3.5)
_K_CELL = 3.5
_K_AREA = 360.0 * 160.0  # fixed study area: the derived lon/lat domain


@query(
    "spatial_ripleys_k",
    oracle=f"""
WITH p AS ({_P_SQL}),
g AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM p),
pr AS (
  SELECT (a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat) AS d2
  FROM p a JOIN p b ON a.k < b.k
   AND (a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat)
       <= {_K_CELL * _K_CELL}
),
c AS (
  SELECT b.band,
         CAST(2 * count(*) FILTER (pr.d2 <= b.band * b.band) AS BIGINT) AS cnt
  FROM pr, (SELECT unnest([{", ".join(str(b) for b in _K_BANDS)}]) AS band) b
  GROUP BY b.band
)
SELECT c.band, c.cnt AS pair_count,
       round({_K_AREA} * c.cnt / (g.n * (g.n - 1)), 4) AS k_hat,
       round(sqrt({_K_AREA} * c.cnt / (g.n * (g.n - 1)) / pi()), 4) AS l_hat
FROM c, g
""",
)
def spatial_ripleys_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C146: Ripley's K multi-distance spatial cluster analysis — the
    ArcGIS "Multi-Distance Spatial Cluster Analysis" tool (Ripley, JRSS
    B 1977). K(d) = A / (n(n-1)) * #{ordered pairs with dist <= d} for
    a band ladder d in {0.5, 1.5, 2.5, 3.5}, plus the variance-
    stabilized L(d) = sqrt(K/pi) ArcGIS plots (uncorrected/naive
    estimator — no edge correction, stated, same on both engines; A is
    the fixed derived-coordinate domain 360x160).

    Plan: ONE grid-blocked pair join at the largest band, then a
    single conditional-aggregate pass producing all four band counts
    (no per-band rescan), unpivoted via stack. Counts are exact
    integers; K/L are ratios of exact counts — no accumulation-noise
    surface at all. Oracle: brute-force O(n^2) pair definition."""
    p = _points(spark, sf_dir)
    g = p.agg(F.count("*").cast("double").alias("n"))
    pr = _band_pairs(p, _K_CELL, _K_CELL * _K_CELL)
    counts = pr.agg(
        *[
            (F.lit(2) * F.sum((F.col("d2") <= F.lit(b * b)).cast("long")))
            .cast("bigint")
            .alias(f"c{i}")
            for i, b in enumerate(_K_BANDS)
        ]
    )
    stack_expr = "stack({}, {}) as (band, pair_count)".format(
        len(_K_BANDS),
        ", ".join(
            f"CAST({b} AS DOUBLE), c{i}" for i, b in enumerate(_K_BANDS)
        ),
    )
    k_hat = F.lit(_K_AREA) * F.col("pair_count") / (F.col("n") * (F.col("n") - 1))
    return (
        counts.selectExpr(stack_expr)
        .crossJoin(F.broadcast(g))
        .select(
            "band",
            "pair_count",
            r4(k_hat).alias("k_hat"),
            r4(F.sqrt(k_hat / F.lit(3.141592653589793))).alias("l_hat"),
        )
    )


@query(
    "spatial_std_ellipse",
    oracle=f"""
WITH p AS ({_P_SQL}),
m AS (
  SELECT CAST(count(*) AS DOUBLE) AS n, avg(lon) AS mx, avg(lat) AS my,
         sum(lon * lon) AS sxx, sum(lat * lat) AS syy, sum(lon * lat) AS sxy
  FROM p
), v AS (
  SELECT n, mx, my, sxx / n - mx * mx AS vx, syy / n - my * my AS vy,
         sxy / n - mx * my AS vxy
  FROM m
), e AS (
  SELECT n, mx, my, vx, vy, vxy,
         0.5 * atan2(2 * vxy, vx - vy) AS theta
  FROM v
)
SELECT CAST(n AS BIGINT) AS n, round(mx, 4) AS mean_x, round(my, 4) AS mean_y,
       round(sqrt(vx + vy), 4) AS std_dist,
       round(degrees(theta), 4) AS theta_deg,
       round(sqrt(greatest(0.0,
             vx * cos(theta) * cos(theta)
             + 2 * vxy * sin(theta) * cos(theta)
             + vy * sin(theta) * sin(theta))), 4) AS sigma_major,
       round(sqrt(greatest(0.0,
             vx * sin(theta) * sin(theta)
             - 2 * vxy * sin(theta) * cos(theta)
             + vy * cos(theta) * cos(theta))), 4) AS sigma_minor
FROM e
""",
)
def spatial_std_ellipse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C147: Mean center, standard distance, and standard deviational
    ellipse — the ArcGIS "Measuring Geographic Distributions" toolset
    (Mean Center / Standard Distance / Directional Distribution;
    Yuill, Area 1971). One bivariate-moment pass gives the center
    (mx, my), the standard distance sqrt(vx + vy), the ellipse
    rotation theta = atan2(2 v_xy, v_x - v_y) / 2, and the two sigma
    axes in the rotated frame (raw sigmas; ArcGIS's 1-std ellipse is
    these times sqrt(2)).

    Numerical notes (why this is oracle-exact): the sf0.001 layer is
    DEGENERATE — all 150 points sit on one diagonal line, so the minor
    axis is mathematically 0 and cross-engine noise can push the
    variance form to -1e-13; both engines clamp with greatest(0, .)
    before sqrt so the rounded output agrees. theta's atan2 is safe
    because v_xy stays far from 0 on every fixture (the discontinuity
    needs BOTH arguments near 0).

    Scale: one map-side-combined 6-sum aggregate over the point table;
    constant-time tail. The cheapest 100 TB query in the module."""
    p = _points(spark, sf_dir)
    m = p.agg(
        F.count("*").cast("double").alias("n"),
        F.avg("lon").alias("mx"),
        F.avg("lat").alias("my"),
        F.sum(F.col("lon") * F.col("lon")).alias("sxx"),
        F.sum(F.col("lat") * F.col("lat")).alias("syy"),
        F.sum(F.col("lon") * F.col("lat")).alias("sxy"),
    )
    v = m.select(
        "n", "mx", "my",
        (F.col("sxx") / F.col("n") - F.col("mx") * F.col("mx")).alias("vx"),
        (F.col("syy") / F.col("n") - F.col("my") * F.col("my")).alias("vy"),
        (F.col("sxy") / F.col("n") - F.col("mx") * F.col("my")).alias("vxy"),
    )
    e = v.withColumn(
        "theta", F.lit(0.5) * F.atan2(F.lit(2.0) * F.col("vxy"), F.col("vx") - F.col("vy"))
    )
    ct, st = F.cos(F.col("theta")), F.sin(F.col("theta"))
    maj = F.col("vx") * ct * ct + F.lit(2.0) * F.col("vxy") * st * ct + F.col("vy") * st * st
    mnr = F.col("vx") * st * st - F.lit(2.0) * F.col("vxy") * st * ct + F.col("vy") * ct * ct
    return e.select(
        F.col("n").cast("bigint").alias("n"),
        r4(F.col("mx")).alias("mean_x"),
        r4(F.col("my")).alias("mean_y"),
        r4(F.sqrt(F.col("vx") + F.col("vy"))).alias("std_dist"),
        r4(F.degrees(F.col("theta"))).alias("theta_deg"),
        r4(F.sqrt(F.greatest(F.lit(0.0), maj))).alias("sigma_major"),
        r4(F.sqrt(F.greatest(F.lit(0.0), mnr))).alias("sigma_minor"),
    )


_NEAR_K = 3  # neighbors per feature in the near table


@query(
    "spatial_near_table",
    oracle=f"""
WITH p AS ({_P_SQL}),
pr AS (
  SELECT a.k AS src, b.k AS nbr,
         (a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat) AS d2
  FROM p a JOIN p b ON a.k <> b.k
   AND (a.lon-b.lon)*(a.lon-b.lon) + (a.lat-b.lat)*(a.lat-b.lat) <= {_BAND * _BAND}
),
r AS (
  SELECT src, nbr, d2,
         row_number() OVER (PARTITION BY src ORDER BY d2, nbr) AS rk
  FROM pr
)
SELECT src AS c_custkey, CAST(rk AS INT) AS rk, nbr AS nbr_key,
       round(sqrt(d2), 4) AS dist
FROM r WHERE rk <= {_NEAR_K}
""",
)
def spatial_near_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C148: Generate Near Table — the ArcGIS proximity tool: for each
    feature, its {_NEAR_K} nearest neighbors within the search radius,
    ranked by distance (ties broken by neighbor key — the lattice
    layer has coincident points, so a value tie-break is mandatory
    for determinism).

    Plan: DIRECTED grid-blocked candidate join (same 3x3 blocking, no
    key ordering, self excluded) -> per-source rank window -> rk <= k.
    Catalyst turns the rank filter into WindowGroupLimit, so each
    shuffle partition keeps only k rows per source before the final
    sort — the per-feature state is O(k), never the candidate list.
    Scale: candidates bounded by local density; the window partitions
    by source feature (plan-asserted: no unpartitioned window)."""
    p = _points(spark, sf_dir)
    # directed pairs: reuse the unordered generator both ways instead
    # of re-deriving a directed variant — (a<b) U (b<a) == (a != b).
    und = _band_pairs(p, _BAND, _BAND * _BAND)
    pr = und.select(
        F.col("ka").alias("src"), F.col("kb").alias("nbr"), "d2"
    ).unionAll(und.select(F.col("kb").alias("src"), F.col("ka").alias("nbr"), "d2"))
    from pyspark.sql import Window

    w = Window.partitionBy("src").orderBy(F.col("d2").asc(), F.col("nbr").asc())
    return (
        pr.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _NEAR_K)
        .select(
            F.col("src").alias("c_custkey"),
            F.col("rk").cast("int").alias("rk"),
            F.col("nbr").alias("nbr_key"),
            r4(F.sqrt(F.col("d2"))).alias("dist"),
        )
    )


@query(
    "spatial_shoelace_area",
    oracle=f"""
WITH base AS (
  SELECT c_custkey,
         CAST(3 + (c_custkey % 4) AS INT) AS nv,
         CAST(1 + (c_custkey % 3) AS DOUBLE) AS r,
         CAST({_LON} AS DOUBLE) AS cx,
         CAST({_LAT} AS DOUBLE) AS cy
  FROM customer
), v AS (
  SELECT c_custkey, nv,
         list_transform(range(0, nv),
           i -> {{'x': cx + r * cos(2 * pi() * i / nv),
                  'y': cy + r * sin(2 * pi() * i / nv)}}) AS verts
  FROM base
), c AS (
  SELECT c_custkey, nv,
         list_transform(range(0, nv),
           i -> {{'cr': verts[i + 1].x * verts[((i + 1) % nv) + 1].y
                       - verts[((i + 1) % nv) + 1].x * verts[i + 1].y,
                  'mx': verts[i + 1].x + verts[((i + 1) % nv) + 1].x,
                  'my': verts[i + 1].y + verts[((i + 1) % nv) + 1].y}}) AS e
  FROM v
), s AS (
  SELECT c_custkey, nv,
         list_sum(list_transform(e, t -> t.cr)) AS s_cr,
         list_sum(list_transform(e, t -> t.mx * t.cr)) AS s_mx,
         list_sum(list_transform(e, t -> t.my * t.cr)) AS s_my
  FROM c
)
SELECT c_custkey, nv AS n_vertices, round(abs(s_cr) / 2, 4) AS area,
       round(s_mx / (3 * s_cr), 4) AS centroid_x,
       round(s_my / (3 * s_cr), 4) AS centroid_y
FROM s
""",
)
def spatial_shoelace_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C150: Calculate Geometry — polygon ring area + centroid via the
    shoelace formula (Gauss), the per-feature geometry computation
    behind ArcGIS's "Calculate Geometry Attributes". Rings are
    synthesized per feature (regular 3-6-gons at the derived center,
    the same no-geometry-fixture convention as the B11 surface) so the
    HOF pipeline is exercised over VARIABLE-length vertex arrays:

      verts   = transform(sequence, i -> (x_i, y_i))
      edges   = transform(sequence, i -> (cross_i, x_i+x_j, y_i+y_j))
      area    = |sum cross_i| / 2
      centroid= sum((x_i+x_j) * cross_i) / (3 * sum cross_i)  (and y)

    Everything is IN-ROW higher-order-function arithmetic — zero
    shuffle, zero Python, one whole-stage-codegen projection over the
    scan; this is the shape a 100 TB per-feature geometry pass must
    have. Edges are STAGED into an intermediate array before the three
    sums (Catalyst does not CSE inside lambda bodies — the round-5
    winnowing lesson); the per-edge structs are computed once, each
    aggregate folds the materialized array."""
    base = table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.lit(3) + F.col("c_custkey") % 4).cast("int").alias("nv"),
        (F.lit(1) + F.col("c_custkey") % 3).cast("double").alias("r"),
        F.expr(_LON).cast("double").alias("cx"),
        F.expr(_LAT).cast("double").alias("cy"),
    )
    two_pi = 2.0 * 3.141592653589793
    v = base.withColumn(
        "verts",
        F.transform(
            F.sequence(F.lit(0), F.col("nv") - 1),
            lambda i: F.struct(
                (F.col("cx") + F.col("r") * F.cos(F.lit(two_pi) * i / F.col("nv"))).alias("x"),
                (F.col("cy") + F.col("r") * F.sin(F.lit(two_pi) * i / F.col("nv"))).alias("y"),
            ),
        ),
    )
    def edge(i):
        a = F.element_at(F.col("verts"), i + 1)
        b = F.element_at(F.col("verts"), ((i + 1) % F.col("nv")) + 1)
        cr = a["x"] * b["y"] - b["x"] * a["y"]
        return F.struct(
            cr.alias("cr"), (a["x"] + b["x"]).alias("mx"), (a["y"] + b["y"]).alias("my")
        )

    c = v.withColumn("e", F.transform(F.sequence(F.lit(0), F.col("nv") - 1), edge))
    s = c.select(
        "c_custkey",
        "nv",
        F.aggregate(F.col("e"), F.lit(0.0), lambda acc, t: acc + t["cr"]).alias("s_cr"),
        F.aggregate(F.col("e"), F.lit(0.0), lambda acc, t: acc + t["mx"] * t["cr"]).alias("s_mx"),
        F.aggregate(F.col("e"), F.lit(0.0), lambda acc, t: acc + t["my"] * t["cr"]).alias("s_my"),
    )
    return s.select(
        "c_custkey",
        F.col("nv").alias("n_vertices"),
        r4(F.abs(F.col("s_cr")) / 2).alias("area"),
        r4(F.col("s_mx") / (F.lit(3.0) * F.col("s_cr"))).alias("centroid_x"),
        r4(F.col("s_my") / (F.lit(3.0) * F.col("s_cr"))).alias("centroid_y"),
    )


# Summarize-Within zones: translated copies of a compact non-convex
# hexagon; .1-.9 fractional vertices so no half-integer lattice point
# lies on an edge (the filters.py convention). Zone A holds zero
# sf0.001 points by construction — the left-join zero-row case.
_SW_BASE = [
    (-60.3, -40.2), (20.7, -40.2), (20.7, 10.4),
    (-10.6, 35.9), (-10.6, -5.3), (-60.3, 15.8),
]
_SW_ZONES = {"A": (0.0, 0.0), "C": (-70.0, -30.0), "D": (-40.0, 35.0)}


def _sw_zone_rows():
    for zid, (dx, dy) in sorted(_SW_ZONES.items()):
        yield zid, [(x + dx, y + dy) for x, y in _SW_BASE]


def _sw_oracle() -> str:
    zone_selects = []
    for zid, poly in _sw_zone_rows():
        verts = ", ".join("{'x': %r, 'y': %r}" % (x, y) for x, y in poly)
        zone_selects.append(f"SELECT '{zid}' AS zone_id, [{verts}] AS verts")
    zones = " UNION ALL ".join(zone_selects)
    return f"""
WITH p AS (
  SELECT c_custkey, CAST({_LON} AS DOUBLE) AS lon,
         CAST({_LAT} AS DOUBLE) AS lat, c_acctbal AS bal
  FROM customer
), z AS ({zones}),
hit AS (
  SELECT z.zone_id, p.c_custkey, p.bal
  FROM z JOIN p
    ON list_sum(list_transform(range(1, len(z.verts) + 1),
         i -> CASE WHEN ((z.verts[i].y > p.lat)
                         <> (z.verts[(i % len(z.verts)) + 1].y > p.lat))
                    AND (p.lon < (z.verts[(i % len(z.verts)) + 1].x - z.verts[i].x)
                                 * (p.lat - z.verts[i].y)
                                 / (z.verts[(i % len(z.verts)) + 1].y - z.verts[i].y)
                                 + z.verts[i].x)
              THEN 1 ELSE 0 END)) % 2 = 1
)
SELECT z.zone_id,
       CAST(count(hit.c_custkey) AS BIGINT) AS n_points,
       round(coalesce(sum(hit.bal), 0.0), 2) AS sum_bal,
       round(avg(hit.bal), 4) AS avg_bal
FROM z LEFT JOIN hit ON z.zone_id = hit.zone_id
GROUP BY z.zone_id
"""


@query("spatial_summarize_within", oracle=_sw_oracle())
def spatial_summarize_within(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C151: Summarize Within — the ArcGIS overlay-analysis tool:
    aggregate point attributes per containing polygon zone. Unlike
    filter_spatial_point_in_polygon (ONE polygon compiled into the
    predicate), the zones here are DATA — a polygon table with
    variable-length vertex arrays — and containment is an even-odd
    ray-cast evaluated as a higher-order function over each zone's
    vertex array inside the join condition.

    Plan: the bounded zone table BROADCASTS under a nested-loop join
    whose per-(zone, point) cost is O(|ring|) codegen'd arithmetic —
    for a bounded zone set this is the right 100 TB plan (every point
    partition streams once past all zones; no shuffle of the fact
    side). For zone tables that are themselves huge, the scale path is
    the grid-blocking of _band_pairs keyed by zone bbox cells — the
    same escape hatch join_spatial_grid_distance documents. The LEFT
    join keeps zero-point zones in the output (zone A at sf0.001):
    count 0, sum 0.00, avg NULL — the ArcGIS contract.

    Division-by-zero note: horizontal edges make the ray slope term
    0/0; both engines evaluate it only under the straddle conjunct
    being true (Spark: NULL-safe comparison folds to false; DuckDB:
    CASE short-circuit), and a horizontal edge can never straddle, so
    the term is dead on both."""
    p = table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.expr(_LON).cast("double").alias("lon"),
        F.expr(_LAT).cast("double").alias("lat"),
        F.col("c_acctbal").alias("bal"),
    )
    zones = spark.createDataFrame(
        [
            (zid, [{"x": float(x), "y": float(y)} for x, y in poly])
            for zid, poly in _sw_zone_rows()
        ],
        "zone_id string, verts array<struct<x: double, y: double>>",
    )
    nv = F.size(F.col("verts"))
    crossings = F.aggregate(
        F.sequence(F.lit(1), nv),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            (
                (F.element_at(F.col("verts"), i)["y"] > F.col("lat"))
                != (F.element_at(F.col("verts"), (i % nv) + 1)["y"] > F.col("lat"))
            )
            & (
                F.col("lon")
                < (
                    F.element_at(F.col("verts"), (i % nv) + 1)["x"]
                    - F.element_at(F.col("verts"), i)["x"]
                )
                * (F.col("lat") - F.element_at(F.col("verts"), i)["y"])
                / (
                    F.element_at(F.col("verts"), (i % nv) + 1)["y"]
                    - F.element_at(F.col("verts"), i)["y"]
                )
                + F.element_at(F.col("verts"), i)["x"]
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    hit = F.broadcast(zones).join(p, crossings % 2 == 1, "left")
    return hit.groupBy("zone_id").agg(
        F.count("c_custkey").cast("bigint").alias("n_points"),
        F.round(F.coalesce(F.sum("bal"), F.lit(0.0)), 2).alias("sum_bal"),
        r4(F.avg("bal")).alias("avg_bal"),
    )
