"""Property tests for the r6 canonical encodings (pure Python — no
Spark session): acid._bloom_canonical (numeric equality classes must
hash identically) and acid._decode_hive_value (Hive dir-name decode)."""

from __future__ import annotations

import decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_arcgis_spark import acid


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=-(2**53), max_value=2**53))
def test_equal_int_float_decimal_hash_identically(i):
    """Any int exactly representable as a double must canonicalize the
    same as its float and Decimal forms — the bloom false-negative
    class the encoding exists to kill."""
    f = float(i)
    assert acid._bloom_canonical(i) == acid._bloom_canonical(f)
    assert acid._bloom_canonical(i) == acid._bloom_canonical(
        decimal.Decimal(i)
    )
    assert acid._bloom_positions(i) == acid._bloom_positions(f)


@settings(max_examples=300, deadline=None)
@given(st.floats(allow_nan=False, allow_infinity=False))
def test_float_self_consistent_and_int_equal_floats_match(x):
    assert acid._bloom_canonical(x) == acid._bloom_canonical(x)
    if x.is_integer() and abs(x) <= 2**53:
        assert acid._bloom_canonical(int(x)) == acid._bloom_canonical(x)


def test_bool_never_collides_with_int():
    """bool is an int subclass; True == 1 in Python, but a boolean
    column probed with an int is a type error, not an equality class —
    keep them distinct so a bool bloom never answers int probes."""
    assert acid._bloom_canonical(True) != acid._bloom_canonical(1)
    assert acid._bloom_canonical(False) != acid._bloom_canonical(0)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=2**53 + 1, max_value=2**80))
def test_big_int_matches_equal_decimal(i):
    """Above 2^53 an int encodes via the scale-normalized Decimal
    string (bloom_v 3) unless float(i) == i — in which case the float
    probe is bit-identical anyway. Either way an equal Decimal probe
    (however it spells its exponent) must hash the same."""
    c = acid._bloom_canonical(i)
    if float(i) == i:
        assert c == acid._bloom_canonical(float(i))
    assert c == acid._bloom_canonical(decimal.Decimal(i))
    # exponent spelling of the same value (1230 vs 1.23E+3)
    assert c == acid._bloom_canonical(
        decimal.Decimal(i).scaleb(-5).scaleb(5)
    )


@settings(max_examples=300, deadline=None)
@given(
    st.decimals(
        allow_nan=False, allow_infinity=False, places=10,
        min_value=-(10**18), max_value=10**18,
    ),
    st.integers(min_value=0, max_value=25),
)
def test_equal_decimals_different_scale_hash_identically(d, extra_scale):
    """The ADVICE r6 #2 class: a DECIMAL(38,20) column reads back
    Decimal('5.10000000000000000000') while the probe passes
    Decimal('5.1') — equal values, different scale, MUST encode
    identically or read_point silently drops matching rows."""
    with decimal.localcontext() as ctx:
        ctx.prec = 60  # widening may exceed the default 28-digit context
        widened = d.quantize(decimal.Decimal(1).scaleb(-(10 + extra_scale)))
    assert widened == d
    assert acid._bloom_canonical(d) == acid._bloom_canonical(widened)


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(10**25), max_value=10**25))
def test_int_vs_decimal_always_match(i):
    """Every int (float-representable or not) hashes like its equal
    Decimal, whatever scale the Decimal carries."""
    d = decimal.Decimal(i)
    assert acid._bloom_canonical(i) == acid._bloom_canonical(d)
    if abs(i) <= 10**20:  # keep within 28-digit context after widening
        wide = d.quantize(decimal.Decimal("1.000"))
        assert acid._bloom_canonical(i) == acid._bloom_canonical(wide)


def test_decode_hive_value_sentinel_and_escapes():
    assert acid._decode_hive_value("__HIVE_DEFAULT_PARTITION__") is None
    assert acid._decode_hive_value("2024-01-01 00%3A00%3A00") == "2024-01-01 00:00:00"
    assert acid._decode_hive_value("a%2Fb") == "a/b"
    # a literal '%' is itself escaped by Spark, so '%2541' round-trips
    # to the literal '%41' — decode exactly once
    assert acid._decode_hive_value("%2541") == "%41"
    assert acid._decode_hive_value("plain") == "plain"


def test_huge_finite_decimal_matches_equal_huge_int():
    """ADVICE r8 #2: a finite Decimal beyond double range (1E+400) hits
    the OverflowError branch; it must normalize like the equal huge int
    (10**400), not keep its repr — equal values hashing differently is
    the v3 false-negative class. Infinite/NaN Decimals stay repr-coded."""
    assert acid._bloom_canonical(decimal.Decimal("1E+400")) == \
        acid._bloom_canonical(10**400)
    assert acid._bloom_canonical(decimal.Decimal("-2.5E+400")) == \
        acid._bloom_canonical(decimal.Decimal("-25E+399"))
    # Infinity converts to float inf (no OverflowError) and compares
    # equal to it, so it rides the exact-float path like float('inf')
    assert acid._bloom_canonical(decimal.Decimal("Infinity")) == \
        acid._bloom_canonical(float("inf"))
    # signaling NaN raises ValueError and keeps its repr (matches nothing)
    snan = decimal.Decimal("sNaN")
    assert acid._bloom_canonical(snan) == f"num:{snan!r}"


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=1, max_value=10**30),
    st.integers(min_value=380, max_value=420),
)
def test_huge_decimal_scale_spellings_hash_identically(mant, exp):
    """Equal huge finite Decimals with different exponent spellings
    (mant E+exp vs mant*10 E+(exp-1)) encode identically."""
    a = decimal.Decimal(mant).scaleb(exp)
    b = decimal.Decimal(mant * 10).scaleb(exp - 1)
    assert a == b
    assert acid._bloom_canonical(a) == acid._bloom_canonical(b)
