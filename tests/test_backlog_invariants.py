"""Property / known-instance tests for the rotation-backlog operators
that predate the §5.4 double-net checklist (VERDICT r4 "Next round" #4):
cdc_merge_apply, dim_scd2_intervals, ts_resample_hourly_{ffill,interp},
graph_two_hop_reach. Each gets at least one invariant the driver's
oracle diff cannot express (conservation / chain structure / hand-
computed instance), so the families entering the r5 driver window carry
the same double net as the r4 operators.

The known-instance tests write miniature fixture tables (same schema
subset the operator reads) into a tmp dir and run the REGISTERED query
function on it — exercising the exact registered plan, not a copy.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from etl_arcgis_spark import registry

SF = "/root/testdata/sf0.001"

_US = 1_000_000
_H = 3600 * _US
_T0 = 1_704_067_200 * _US  # 2024-01-01T00:00:00Z — before the CDC split
_SPLIT = 1_705_276_800 * _US  # 2024-01-15T00:00:00Z (timeseries._SPLIT_US)


def _q(name):
    registry.load_all()
    return registry.QUERIES[name]


def _write_events(path, rows):
    """rows: (event_id, t_us, user_id, event_type, value)."""
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}" for _ in rows], pa.string()),
        }
    )
    pq.write_table(tbl, f"{path}/events.parquet")


# ------------------------------------------------------ cdc_merge_apply


def test_cdc_merge_apply_known_instance(spark, tmp_path):
    """Hand-computed MERGE matrix: update, carry, insert, delete (both
    matched-delete and delete-of-nonexistent), and a base key whose
    last pre-split op is a tombstone."""
    d = str(tmp_path)
    _write_events(
        d,
        [
            # user 1: base v=1 then delta update v=2 -> updated
            (1, _T0, 1, "click", 1.0),
            (2, _SPLIT + _H, 1, "click", 2.0),
            # user 2: base only -> carried unchanged
            (3, _T0 + _H, 2, "view", 3.0),
            # user 3: delta only -> inserted
            (4, _SPLIT + 2 * _H, 3, "click", 4.0),
            # user 4: base then delta tombstone -> deleted
            (5, _T0 + 2 * _H, 4, "click", 5.0),
            (6, _SPLIT + 3 * _H, 4, "error", 0.0),
            # user 5: tombstone for a key not in base -> absent
            (7, _SPLIT + 4 * _H, 5, "error", 0.0),
            # user 6: last BASE op is a tombstone -> not in base, absent
            (8, _T0 + 3 * _H, 6, "click", 6.0),
            (9, _T0 + 4 * _H, 6, "error", 0.0),
        ],
    )
    got = {
        r.user_id: (r.value, r.inserted, r.updated)
        for r in _q("cdc_merge_apply")(spark, d).collect()
    }
    assert got == {
        1: (2.0, False, True),
        2: (3.0, False, False),
        3: (4.0, True, False),
    }


def test_cdc_merge_apply_keys_unique_and_flags_partition(spark):
    """On the real fixture: one row per key, and inserted/updated are
    mutually exclusive."""
    df = _q("cdc_merge_apply")(spark, SF)
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("user_id").alias("nd"),
        F.sum((F.col("inserted") & F.col("updated")).cast("int")).alias("both"),
    ).collect()[0]
    assert agg["n"] == agg["nd"] > 0
    assert agg["both"] == 0


# --------------------------------------------------- dim_scd2_intervals


def test_scd2_intervals_chain_and_single_current(spark):
    """Structural invariants the oracle diff can't see: per key, the
    intervals CHAIN (each valid_to equals the key's next valid_from),
    exactly one open (is_current) interval per key, and row count is
    conserved vs the input."""
    from etl_arcgis_spark.tables import table

    df = _q("dim_scd2_intervals")(spark, SF)
    n_events = table(spark, SF, "events").count()
    assert df.count() == n_events
    cur = (
        df.groupBy("user_id")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n_open"))
        .filter(F.col("n_open") != 1)
        .count()
    )
    assert cur == 0
    # chain property via self-comparison: lead(valid_from) == valid_to
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("valid_from_us").asc(), F.col("event_id").asc()
    )
    chained = df.withColumn("nxt_from", F.lead("valid_from_us").over(w))
    broken = chained.filter(
        (F.col("valid_to_us").isNotNull() | F.col("nxt_from").isNotNull())
        & (F.col("valid_to_us") != F.col("nxt_from"))
    ).count()
    assert broken == 0
    # closed intervals are non-negative length
    assert df.filter(F.col("valid_to_us") < F.col("valid_from_us")).count() == 0


# ------------------------------------------------------- ts resamplers


@pytest.fixture()
def resample_fixture(tmp_path):
    """User 10: events at 0:30 (v=1), 1:30 (v=2), 3:00 (v=9) after T0.
    Hourly grid = 1:00, 2:00, 3:00 (3:00 coincides with an event).
    User 11: single unaligned event -> empty grid (lo > hi)."""
    d = str(tmp_path)
    _write_events(
        d,
        [
            (1, _T0 + _H // 2, 10, "click", 1.0),
            (2, _T0 + 3 * _H // 2, 10, "click", 2.0),
            (3, _T0 + 3 * _H, 10, "click", 9.0),
            (4, _T0 + 9 * _H // 2, 11, "view", 7.0),
        ],
    )
    return d


def test_resample_ffill_known_instance(spark, resample_fixture):
    got = {
        (r.user_id, r.grid_us): r.last_value
        for r in _q("ts_resample_hourly_ffill")(spark, resample_fixture).collect()
    }
    assert got == {
        (10, _T0 + _H): 1.0,  # holds 0:30 value
        (10, _T0 + 2 * _H): 2.0,  # holds 1:30 value
        (10, _T0 + 3 * _H): 9.0,  # event exactly at the grid instant
    }


def test_resample_interp_known_instance(spark, resample_fixture):
    got = {
        (r.user_id, r.grid_us): r.v_interp
        for r in _q("ts_resample_hourly_interp")(spark, resample_fixture).collect()
    }
    assert got == {
        (10, _T0 + _H): 1.5,  # midpoint of (0:30, 1) .. (1:30, 2)
        (10, _T0 + 2 * _H): 4.3333,  # 2 + 7 * (1800/5400), r4-rounded
        (10, _T0 + 3 * _H): 9.0,  # exact hit
    }


def test_resample_interp_bounded_by_neighbors(spark):
    """On the real fixture: every interpolated value lies within the
    [min, max] of its user's observed values (linear interpolation
    never extrapolates), and grid timestamps are hour-aligned."""
    df = _q("ts_resample_hourly_interp")(spark, SF)
    assert df.filter(F.col("grid_us") % _H != 0).count() == 0
    from etl_arcgis_spark.tables import table
    from etl_arcgis_spark.helpers import ev_us

    bounds = (
        table(spark, SF, "events")
        .select("user_id", ev_us().alias("t"), "value")
        .groupBy("user_id")
        .agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    )
    out = df.join(bounds, "user_id")
    viol = out.filter(
        (F.col("v_interp") < F.col("vmin") - 1e-4)
        | (F.col("v_interp") > F.col("vmax") + 1e-4)
    ).count()
    assert viol == 0


# --------------------------------------------------- graph_two_hop_reach


def test_two_hop_reach_known_instance(spark, tmp_path):
    """Bipartite graph c1-s1, c2-{s1,s2}, c3-s2, c4-s3: pairs sharing a
    supplier are (1,2) and (2,3); counts key on the SMALLER customer id
    (the c_a < c_b dedup), so expect {1: 1, 2: 1} and nothing else.
    Duplicate lineitem rows must not inflate counts (distinct edges)."""
    d = str(tmp_path)
    orders = pa.table(
        {
            "o_orderkey": pa.array([101, 102, 103, 104], pa.int64()),
            "o_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    li_rows = [
        (101, 11),
        (102, 11),
        (102, 12),
        (102, 12),  # duplicate edge: must not double-count
        (103, 12),
        (104, 13),
    ]
    lineitem = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in li_rows], pa.int64()),
            "l_suppkey": pa.array([r[1] for r in li_rows], pa.int64()),
        }
    )
    pq.write_table(orders, f"{d}/orders.parquet")
    pq.write_table(lineitem, f"{d}/lineitem.parquet")
    got = {
        r.custkey: r.n_two_hop_peers
        for r in _q("graph_two_hop_reach")(spark, d).collect()
    }
    assert got == {1: 1, 2: 1}


# ------------------------------------------ r5 new-operator invariants


def test_winnowing_match_guarantee(spark, tmp_path):
    """THE winnowing property (Schleimer et al. 2003): two documents
    sharing a run of >= w + k - 1 = 6 tokens must share at least one
    fingerprint. Construct two docs with a 10-token common run inside
    different surroundings and check fingerprint intersection via the
    same HOF pipeline on a miniature fixture."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    common = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    t1 = "xx yy " + common + " zz ww"
    t2 = "one two three " + common + " four"
    d = str(tmp_path)
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([t1, t2], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
            "source": pa.array(["a", "b"], pa.string()),
            "n_chars": pa.array([len(t1), len(t2)], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{d}/documents.parquet")
    # recompute per-doc fingerprint SETS with the operator's own hash
    from etl_arcgis_spark.tables import table

    docs = (
        table(spark, d, "documents")
        .withColumn("l", F.split("text", " "))
    )
    hx = "0123456789abcdef"
    hv = (
        f"transform(sequence(1, size(l) - 2), i -> "
        f"  ((instr('{hx}', substr(md5(concat(element_at(l, i), ' ', "
        f"element_at(l, i + 1), ' ', element_at(l, i + 2))), 1, 1)) - 1) * 4096"
        f" + (instr('{hx}', substr(md5(concat(element_at(l, i), ' ', "
        f"element_at(l, i + 1), ' ', element_at(l, i + 2))), 2, 1)) - 1) * 256"
        f" + (instr('{hx}', substr(md5(concat(element_at(l, i), ' ', "
        f"element_at(l, i + 1), ' ', element_at(l, i + 2))), 3, 1)) - 1) * 16"
        f" + (instr('{hx}', substr(md5(concat(element_at(l, i), ' ', "
        f"element_at(l, i + 1), ' ', element_at(l, i + 2))), 4, 1)) - 1)))"
    )
    fps = {
        r.doc_id: set(r.fp)
        for r in docs.withColumn("hv", F.expr(hv))
        .withColumn(
            "fp",
            F.expr(
                "array_distinct(transform(sequence(1, size(hv) - 3), "
                "i -> array_min(slice(hv, i, 4))))"
            ),
        )
        .select("doc_id", "fp")
        .collect()
    }
    assert fps[1] & fps[2], "docs sharing a 10-token run must share a fingerprint"
    # and the registered query agrees on the window counts
    got = {
        r.doc_id: (r.n_windows, r.n_fingerprints)
        for r in _q("text_winnowing_fingerprint")(spark, d).collect()
    }
    for doc_id, (nw, nf) in got.items():
        n_tokens = len((t1 if doc_id == 1 else t2).split())
        assert nw == n_tokens - 2 - 3  # n_grams - 3
        assert 1 <= nf <= nw


def test_weighted_median_equals_naive_window(spark):
    """The two-phase bucket-offset weighted median must equal the
    naive single-window spelling exactly (same argument family as the
    grouped two-phase median)."""
    from pyspark.sql import Window

    from etl_arcgis_spark.helpers import r4
    from etl_arcgis_spark.tables import table

    got = {
        (r.l_returnflag): (r.total_wt, r.wmedian)
        for r in _q("agg_weighted_median")(spark, SF).collect()
    }
    li = table(spark, SF, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.col("l_extendedprice").alias("v"),
        F.col("l_quantity").cast("bigint").alias("wt"),
    )
    w = Window.partitionBy("g").orderBy(F.asc("v")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = li.groupBy("g").agg(F.sum("wt").alias("tw"))
    naive = (
        li.withColumn("cum", F.sum("wt").over(w))
        .join(tot, "g")
        .filter(F.col("cum") >= F.expr("(tw + 1) div 2"))
        .groupBy("g")
        .agg(F.first("tw").alias("tw"), r4(F.min("v")).alias("wm"))
    )
    want = {r.g: (r.tw, r.wm) for r in naive.collect()}
    assert got == want


def test_groups_frame_matches_bruteforce(spark, tmp_path):
    """GROUPS-frame emulation vs a hand-computed instance: user 1 has
    days [1, 1, 3, 7] (duplicate day = one peer group) with values
    [1, 2, 4, 8]; GROUPS 1 PRECEDING..1 FOLLOWING over the 3 peer
    groups gives day-sums [3+4, 3+4+8, 4+8]."""
    _write_events(
        str(tmp_path),
        [
            (1, _T0 + 1 * 86400 * _US, 1, "click", 1.0),
            (2, _T0 + 1 * 86400 * _US + _H, 1, "click", 2.0),
            (3, _T0 + 3 * 86400 * _US, 1, "click", 4.0),
            (4, _T0 + 7 * 86400 * _US, 1, "click", 8.0),
        ],
    )
    got = {
        (r.day - (_T0 // (86400 * _US))): (r.day_n, r.groups_sum)
        for r in _q("window_groups_frame_emulated")(spark, str(tmp_path)).collect()
    }
    assert got == {1: (2, 7.0), 3: (1, 15.0), 7: (1, 12.0)}


def test_approx_percentile_rank_error_bound(spark):
    """GK sketch guarantee: each approximate quantile's RANK in its
    group is within n/accuracy of the target rank (accuracy=1000 =>
    <= ~0.1% of rows off)."""
    rows = _q("agg_approx_percentile_sketch")(spark, SF).collect()
    from etl_arcgis_spark.tables import table

    o = table(spark, SF, "orders").select("o_orderpriority", "o_totalprice")
    vals = {}
    for r in o.collect():
        vals.setdefault(r.o_orderpriority, []).append(r.o_totalprice)
    for r in rows:
        v = sorted(vals[r.o_orderpriority])
        n = len(v)
        assert r.n == n
        for p, got in ((0.25, r.p25), (0.5, r.p50), (0.75, r.p75)):
            import bisect

            lo = bisect.bisect_left(v, got)
            hi = bisect.bisect_right(v, got)
            target = p * (n - 1)
            # any rank the value occupies must be near the target rank
            err_bound = max(1.0, n / 1000.0) + 1
            assert lo - err_bound <= target <= hi + err_bound, (
                r.o_orderpriority, p, got, lo, hi, target)


def test_autocorrelation_known_periodic_series(spark, tmp_path):
    """Alternating hourly counts (1, 3, 1, 3, ...) over 48 hours: a
    period-2 series has acf(lag even) = 1 and acf(lag odd) = -1
    exactly (values are two-point symmetric)."""
    rows = []
    eid = 0
    for h in range(48):
        for _ in range(3 if h % 2 else 1):
            eid += 1
            rows.append((eid, _T0 + h * _H + _H // 2, 1, "click", 1.0))
    _write_events(str(tmp_path), rows)
    got = {r.lag_h: r.acf for r in _q("ts_autocorrelation")(spark, str(tmp_path)).collect()}
    assert got[2] == 1.0 and got[6] == 1.0 and got[12] == 1.0 and got[24] == 1.0
    assert got[1] == -1.0 and got[3] == -1.0


def test_cross_correlation_shifted_series_peak(spark, tmp_path):
    """Purchases are clicks shifted +1 hour (identical varying
    profile): the cross-correlation peaks at lag +1 with xcf = 1."""
    rows = []
    eid = 0
    profile = [1, 4, 2, 5, 3, 6]  # varying so correlation is defined
    for h in range(24):
        n = profile[h % 6]
        for _ in range(n):
            eid += 1
            rows.append((eid, _T0 + h * _H, 1, "click", 1.0))
        for _ in range(n):
            eid += 1
            rows.append((eid, _T0 + (h + 1) * _H, 2, "purchase", 1.0))
    _write_events(str(tmp_path), rows)
    got = {r.lag_h: r.xcf for r in _q("ts_cross_correlation")(spark, str(tmp_path)).collect()}
    assert got[1] == 1.0
    assert all(v < 1.0 for k, v in got.items() if k != 1)


def test_control_chart_flags_planted_burst(spark, tmp_path):
    """A 30-day steady series (2 events/hour) with ONE planted 80-event
    burst hour: exactly that category trips the 3-sigma limit exactly
    once; a same-shape category without the burst trips zero."""
    rows = []
    eid = 0
    for h in range(720):
        for _ in range(2):
            eid += 1
            rows.append((eid, _T0 + h * _H, 1, "click", 1.0))
        for _ in range(2):
            eid += 1
            rows.append((eid, _T0 + h * _H, 2, "view", 1.0))
    for _ in range(80):  # the burst: hour 100, clicks only
        eid += 1
        rows.append((eid, _T0 + 100 * _H + 60 * _US, 1, "click", 1.0))
    _write_events(str(tmp_path), rows)
    got = {
        r.event_type: (r.n_hours, r.n_out_of_control)
        for r in _q("dq_control_chart")(spark, str(tmp_path)).collect()
    }
    assert got["click"] == (720, 1)
    assert got["view"] == (720, 0)


def test_zlib_ratio_orders_text_classes(spark, tmp_path):
    """Compression ratio must order text classes: looped boilerplate
    compresses far below varied prose, which compresses below
    hex-noise; the keep flag drops both tails."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import random

    random.seed(7)
    rep = "buy now click here " * 60
    # genuinely varied prose: 300 distinct tokens, no repetition
    words = [f"w{chr(97 + i // 26)}{chr(97 + i % 26)}{i}" for i in range(300)]
    random.shuffle(words)
    prose = " ".join(words)
    noise = "".join(random.choice("0123456789abcdef") for _ in range(1000))
    texts = [rep, prose, noise]
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array(["a"] * 3, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{tmp_path}/documents.parquet")
    got = {
        r.doc_id: (r.zratio, r.keep)
        for r in _q("text_zlib_compression_ratio")(spark, str(tmp_path)).collect()
    }
    assert got[1][0] < got[2][0] < got[3][0]
    assert got[1][1] is False            # boilerplate tail dropped
    assert got[2][1] is True             # prose kept
    assert got[3][0] > 0.5               # noise barely compresses
    # determinism: zlib-6 is bytes-stable — rerun equals
    again = {
        r.doc_id: r.zratio
        for r in _q("text_zlib_compression_ratio")(spark, str(tmp_path)).collect()
    }
    assert again == {k: v[0] for k, v in got.items()}
