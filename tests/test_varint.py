import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from elasticsearch_approx_plugin_spark.functions.varint import (
    delta_varint_decode,
    delta_varint_encode,
    varint_decode,
    varint_encode,
)


def test_empty():
    assert varint_encode(np.empty(0, dtype=np.uint64)) == b""
    assert varint_decode(b"").size == 0


def test_known_values():
    v = np.array([0, 1, 127, 128, 300, 2**32, 2**63, 2**64 - 1], dtype=np.uint64)
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"
    np.testing.assert_array_equal(varint_decode(varint_encode(v)), v)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=500))
def test_roundtrip(values):
    v = np.array(values, dtype=np.uint64)
    np.testing.assert_array_equal(varint_decode(varint_encode(v)), v)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**40), max_size=500))
def test_delta_roundtrip(values):
    v = np.sort(np.array(values, dtype=np.uint64))
    np.testing.assert_array_equal(delta_varint_decode(delta_varint_encode(v)), v)
