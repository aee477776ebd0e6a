"""Codec property tests: encode∘decode = id (SURVEY.md §5.2.1)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from logsentinelai_ray.index.codec import (
    decode_varint,
    delta_decode,
    delta_encode,
    encode_varint,
    varint_sizes,
)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=500))
def test_varint_roundtrip(values):
    v = np.array(values, dtype=np.uint64)
    out = decode_varint(encode_varint(v))
    assert np.array_equal(out.astype(np.uint64), v)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1,
                max_size=500, unique=True))
def test_delta_roundtrip_random_sorted_ids(ids):
    arr = np.array(sorted(ids), dtype=np.int64)
    assert np.array_equal(delta_decode(delta_encode(arr)), arr)


def test_varint_sizes_match_encoding():
    v = np.array([0, 1, 127, 128, 16383, 16384, 2**62], dtype=np.uint64)
    sizes = varint_sizes(v)
    assert sizes.tolist() == [1, 1, 1, 2, 2, 3, 9]
    assert len(encode_varint(v)) == sizes.sum()


def test_empty():
    assert encode_varint(np.array([], dtype=np.uint64)) == b""
    assert decode_varint(b"").size == 0
    assert delta_encode(np.array([], dtype=np.int64)) == b""


def test_dense_ids_compress_small():
    ids = np.arange(10_000, dtype=np.int64)
    enc = delta_encode(ids)
    # gap=1 everywhere except the absolute first value → ~1 byte/id
    assert len(enc) <= 10_001
