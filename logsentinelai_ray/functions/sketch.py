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
