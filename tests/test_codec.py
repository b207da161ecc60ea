import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from elasticsearch_spark.index import codec


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
@settings(max_examples=200, deadline=None)
def test_vbyte_roundtrip(vals):
    a = np.array(vals, dtype=np.int64)
    assert np.array_equal(codec.vbyte_decode(codec.vbyte_encode(a)), a)


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=500))
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(vals):
    a = np.sort(np.unique(np.array(vals, dtype=np.int64)))
    assert np.array_equal(codec.delta_decode(codec.delta_encode(a)), a)


def test_vbyte_empty():
    assert codec.vbyte_encode(np.array([], dtype=np.int64)) == b""
    assert codec.vbyte_decode(b"").size == 0


def test_vbyte_compactness():
    small = np.arange(128, dtype=np.int64)  # all < 128 -> 1 byte each
    assert len(codec.vbyte_encode(small)) == 128


def test_positions_roundtrip():
    plists = [np.array([0, 3, 9]), np.array([], dtype=np.int64), np.array([5])]
    buf = codec.encode_positions(plists)
    out = codec.decode_positions(buf, 3)
    for a, b in zip(plists, out):
        assert np.array_equal(a, b)


def test_split_blocks():
    assert codec.split_blocks(0) == []
    assert codec.split_blocks(128) == [(0, 128)]
    assert codec.split_blocks(300) == [(0, 128), (128, 256), (256, 300)]
