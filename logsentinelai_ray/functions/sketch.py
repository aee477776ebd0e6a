"""HyperLogLog cardinality sketch — the ES ``cardinality`` aggregation analog.

The reference delegates distinct counting to Elasticsearch, whose
``cardinality`` aggregation is HyperLogLog-based (SURVEY §2.6 notes the
reference itself ships no sketch — ES provides it). At 10^12 rows an exact
distinct is a full all-to-all shuffle of every key; the sketch needs one
streaming map pass: each task condenses its batches into a ``2**p``-byte
register array and only those sketches (KBs, not rows) leave the cluster,
merged by element-wise max. Hashing is pandas' SipHash
(``hash_pandas_object`` with its fixed default key), so estimates are
deterministic across processes, runs and cluster sizes.

Standard error is ~1.04/sqrt(2**p) (p=12 → ~1.6 %); the sketch union is
exact (register-wise max), so merge order and batch boundaries never
change the estimate.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

_U64 = np.uint64


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 for x == 0).

    float64 log2 mis-rounds near power-of-two boundaries past 2**52, so
    this uses exact shift-and-test steps instead.
    """
    v = x.copy()
    bl = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = (v >> _U64(s)) != 0
        bl[big] += s
        v[big] >>= _U64(s)
    bl[v != 0] += 1
    return bl


def _hash_values(values) -> np.ndarray:
    """Deterministic uint64 hashes of an Arrow array (nulls dropped)."""
    arr = pa.chunked_array([values]) if isinstance(values, pa.Array) else values
    arr = arr.drop_null()
    if len(arr) == 0:
        return np.empty(0, dtype=_U64)
    series = arr.to_pandas()
    return pd.util.hash_pandas_object(series, index=False).to_numpy(dtype=_U64)


def hll_sketch(values, p: int = 12) -> np.ndarray:
    """Build a 2**p-register HLL sketch (uint8 array) from an Arrow array."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    h = _hash_values(values)
    if h.size == 0:
        return regs
    idx = (h >> _U64(64 - p)).astype(np.int64)
    w = h << _U64(p)
    # rank = leading zeros of the remaining 64-p bits, +1; w == 0 saturates.
    rank = np.minimum(64 - _bit_length_u64(w) + 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Exact sketch union: element-wise register max."""
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Flajolet et al. estimator with the small-range (linear counting)
    correction; 64-bit hashes make the large-range correction moot."""
    m = regs.size
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / float(np.sum(np.ldexp(1.0, -regs.astype(np.int64))))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return est


def hll_cardinality(ds, column: str, p: int = 12) -> float:
    """Approximate distinct count of ``column`` over a Dataset.

    One streaming map pass: each batch collapses to a single ``2**p``-byte
    sketch row; the driver folds the (tiny) sketch stream with max. No
    shuffle, nothing row-sized leaves the tasks.
    """
    def sketch_batch(batch: pa.Table) -> pa.Table:
        regs = hll_sketch(batch.column(column), p)
        return pa.table({"sketch": pa.array([regs.tobytes()], pa.binary())})

    parts = ds.select_columns([column]).map_batches(
        sketch_batch, batch_format="pyarrow")
    regs = np.zeros(1 << p, dtype=np.uint8)
    for b in parts.iter_batches(batch_format="pyarrow"):
        for s in b.column("sketch"):
            np.maximum(regs, np.frombuffer(s.as_py(), np.uint8), out=regs)
    return hll_estimate(regs)


# ---------------------------------------------------------------------------
# Bloom filter — mergeable set-membership sketch (OR-merge)
# ---------------------------------------------------------------------------

def _bloom_positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """k bit positions per hash via the Kirsch–Mitzenmacher double-hash
    construction h1 + i*h2 (one uint64 hash split in two halves) —
    vectorized, deterministic."""
    h1 = h & _U64(0xFFFFFFFF)
    h2 = (h >> _U64(32)) | _U64(1)  # odd, never zero
    i = np.arange(k, dtype=_U64)[:, None]
    return ((h1[None, :] + i * h2[None, :]) % _U64(m_bits)).ravel()


def bloom_sketch(values, m_bits: int = 1 << 20, k: int = 7) -> np.ndarray:
    """Build a Bloom filter (packed uint8 bitmap) from an Arrow array."""
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    h = _hash_values(values)
    if h.size == 0:
        return bits
    pos = _bloom_positions(h, m_bits, k)
    np.bitwise_or.at(bits, (pos // 8).astype(np.int64),
                     np.uint8(1) << (pos % 8).astype(np.uint8))
    return bits


def bloom_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Union of two Bloom filters — exact (bitwise OR), so merge order
    and batch boundaries never change the filter."""
    return np.bitwise_or(a, b)


def bloom_contains(bits: np.ndarray, values, k: int = 7) -> np.ndarray:
    """Vectorized membership probe: True = maybe present (FPR applies),
    False = DEFINITELY absent (the one-sided Bloom guarantee)."""
    m_bits = bits.size * 8
    h = _hash_values(values)
    if h.size == 0:
        return np.empty(0, dtype=bool)
    pos = _bloom_positions(h, m_bits, k).reshape(k, -1)
    got = (bits[(pos // 8).astype(np.int64)]
           >> (pos % 8).astype(np.uint8)) & 1
    return got.all(axis=0)


def bloom_build(ds, column: str, m_bits: int = 1 << 20,
                k: int = 7) -> np.ndarray:
    """Distributed Bloom build: one streaming map pass, each batch
    collapses to one bitmap row (m_bits/8 bytes); the driver ORs the
    tiny bitmap stream. No shuffle, nothing row-sized leaves a task —
    the same exchange as hll_cardinality."""
    def sketch_batch(batch: pa.Table) -> pa.Table:
        bits = bloom_sketch(batch.column(column), m_bits, k)
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    parts = ds.select_columns([column]).map_batches(
        sketch_batch, batch_format="pyarrow")
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    for b in parts.iter_batches(batch_format="pyarrow"):
        for s in b.column("bits"):
            np.bitwise_or(bits, np.frombuffer(s.as_py(), np.uint8),
                          out=bits)
    return bits


# ---------------------------------------------------------------------------
# Count-Min sketch — mergeable frequency sketch (ADD-merge)
# ---------------------------------------------------------------------------

_CM_SALTS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                      0x165667B19E3779F9, 0x27D4EB2F165667C5],
                     dtype=_U64)


def cm_sketch(values, width: int = 1 << 14,
              depth: int = 4) -> np.ndarray:
    """Count-Min sketch (depth x width int64 counters) of an Arrow
    array's value frequencies. Rows use salted re-hashes of the one
    deterministic base hash; estimates overcount only (one-sided), by
    at most ~2n/width with prob 1 - 2^-depth."""
    cm = np.zeros((depth, width), dtype=np.int64)
    h = _hash_values(values)
    if h.size == 0:
        return cm
    for d in range(depth):
        hd = (h ^ _CM_SALTS[d]) * _U64(0xFF51AFD7ED558CCD)
        hd ^= hd >> _U64(33)
        np.add.at(cm[d], (hd % _U64(width)).astype(np.int64), 1)
    return cm


def cm_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Counter-wise addition — exact, order/batch-boundary invariant."""
    return a + b


def cm_estimate(cm: np.ndarray, values) -> np.ndarray:
    """Point frequency estimates (min over rows) for an Arrow array of
    query values — never underestimates the true count."""
    depth, width = cm.shape
    h = _hash_values(values)
    if h.size == 0:
        return np.empty(0, dtype=np.int64)
    est = np.full(h.size, np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        hd = (h ^ _CM_SALTS[d]) * _U64(0xFF51AFD7ED558CCD)
        hd ^= hd >> _U64(33)
        np.minimum(est, cm[d, (hd % _U64(width)).astype(np.int64)],
                   out=est)
    return est


def cm_build(ds, column: str, width: int = 1 << 14,
             depth: int = 4) -> np.ndarray:
    """Distributed Count-Min build: per-batch sketches added on the
    driver (depth*width*8 bytes each — KBs, not rows)."""
    def sketch_batch(batch: pa.Table) -> pa.Table:
        cm = cm_sketch(batch.column(column), width, depth)
        return pa.table({"cm": pa.array([cm.tobytes()], pa.binary())})

    parts = ds.select_columns([column]).map_batches(
        sketch_batch, batch_format="pyarrow")
    cm = np.zeros((depth, width), dtype=np.int64)
    for b in parts.iter_batches(batch_format="pyarrow"):
        for s in b.column("cm"):
            cm += np.frombuffer(s.as_py(), np.int64).reshape(depth, width)
    return cm
