"""Scale patterns — skew salting and space-filling-curve layout.

Not query-inventory operators but the physical techniques the 100 TB
posture relies on where AQE alone is not enough:

- ``salted_groupby``: two-phase aggregation for a pathologically hot
  key. AQE's skew-join splitting handles skewed *joins*; a skewed
  *aggregation* key still funnels one group through one reducer —
  salting splits it N ways, aggregates partials, then merges.
- ``zorder_key``: Morton (Z-order) interleave of quantized lon/lat.
  Sorting/partitioning a table by this key makes spatial envelope
  predicates (filter_spatial_envelope, B11) prune row groups: parquet
  min/max stats on the z column bound both dimensions at once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_groupby_sum(
    df: DataFrame, key: str, value: str, n_salts: int = 16
) -> DataFrame:
    """Two-phase skew-safe aggregation: sum(value) per key.

    Phase 1 groups by (key, random salt) — the hot key's rows spread
    over ``n_salts`` reducers; phase 2 merges the partials per key. The
    salt is random per row (monotonically_increasing_id based, so
    deterministic within a plan execution's partition layout — the
    GROUPING itself never depends on salt values, only load balance
    does, so results are exact regardless).
    """
    salted = df.withColumn("_salt", (F.monotonically_increasing_id() % n_salts))
    partial = salted.groupBy(key, "_salt").agg(
        F.sum(value).alias("_psum"), F.count(F.lit(1)).alias("_pn")
    )
    return partial.groupBy(key).agg(
        F.sum("_psum").alias(f"sum_{value}"), F.sum("_pn").alias("n")
    )


_Z_BITS = 16  # per-dimension quantization


def _spread_bits(v: Column) -> Column:
    """Interleave zeros between the low 16 bits of v (Morton spread):
    classic magic-number shifts, expressed as JVM-side bit ops.

    Note PySpark's ``|``/``&`` Column operators are *logical*; bitwise
    needs ``bitwiseOR``/``bitwiseAND``.
    """
    x = v.cast("bigint")
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def zorder_key(lon: Column, lat: Column) -> Column:
    """Morton key of (lon, lat): quantize each to 16 bits over the
    WGS84 range, interleave. Write-time ``repartitionByRange`` /
    ``sortWithinPartitions`` on this column gives 2-D locality with a
    1-D sort key — envelope filters then prune row groups via plain
    min/max column stats."""
    qx = F.floor((lon + 180.0) / 360.0 * ((1 << _Z_BITS) - 1)).cast("bigint")
    qy = F.floor((lat + 90.0) / 180.0 * ((1 << _Z_BITS) - 1)).cast("bigint")
    return _spread_bits(qx).bitwiseOR(F.shiftleft(_spread_bits(qy), 1))
