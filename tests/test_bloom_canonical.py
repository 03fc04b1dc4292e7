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
def test_big_int_exact_repr_unless_float_equal(i):
    """Above 2^53 an int keeps its exact repr unless float(i) == i —
    in which case the float probe is bit-identical anyway."""
    c = acid._bloom_canonical(i)
    if float(i) == i:
        assert c == acid._bloom_canonical(float(i))
    else:
        assert c == f"num:{i!r}"


def test_decode_hive_value_sentinel_and_escapes():
    assert acid._decode_hive_value("__HIVE_DEFAULT_PARTITION__") is None
    assert acid._decode_hive_value("2024-01-01 00%3A00%3A00") == "2024-01-01 00:00:00"
    assert acid._decode_hive_value("a%2Fb") == "a/b"
    # a literal '%' is itself escaped by Spark, so '%2541' round-trips
    # to the literal '%41' — decode exactly once
    assert acid._decode_hive_value("%2541") == "%41"
    assert acid._decode_hive_value("plain") == "plain"
