"""Scalar int8 embedding quantization (per-dimension affine — the
ES/Lucene `int8_hnsw` / faiss `SQ8` storage trick): 4x less vector IO
and object-store traffic at 100 TB for a small, MEASURED recall cost
(the `embedding_quantize` registry entry reports recall@10 and the max
cosine error; floors pinned in tests).

Plan shape: one distributed pass collects per-dimension min/max (a
(2, d)-sized partial per batch — dimensions are small, vectors are
many); codes+params broadcast nothing corpus-sized (params are 2 float
rows); the quantize stage and the quantized scorer are vectorized
map_batches over the same Arrow batches as the float path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .knn import _batch_vectors, _cosine


def dim_minmax(ds, vec_col: str = "embedding"):
    """Per-dimension (min, max) over the corpus: per-batch numpy
    partials, driver combine over (2, d)-sized rows only."""

    def part(t: pa.Table) -> pa.Table:
        mat = _batch_vectors(t, vec_col)
        if mat.size == 0:
            return pa.table({"mins": pa.array([], pa.list_(pa.float64())),
                             "maxs": pa.array([], pa.list_(pa.float64()))})
        return pa.table({
            "mins": pa.array([mat.min(axis=0).tolist()],
                             pa.list_(pa.float64())),
            "maxs": pa.array([mat.max(axis=0).tolist()],
                             pa.list_(pa.float64()))})

    mins = maxs = None
    for b in ds.map_batches(part, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        for i in range(b.num_rows):
            lo = np.asarray(b["mins"][i].as_py(), dtype=np.float64)
            hi = np.asarray(b["maxs"][i].as_py(), dtype=np.float64)
            mins = lo if mins is None else np.minimum(mins, lo)
            maxs = hi if maxs is None else np.maximum(maxs, hi)
    return mins, maxs


def _quantize(mat: np.ndarray, mins: np.ndarray,
              scale: np.ndarray) -> np.ndarray:
    q = np.rint((mat - mins) / scale)
    return np.clip(q, 0, 255).astype(np.uint8)


def quantized_topk(ds, query_vec, mins, maxs, k: int = 10,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id") -> pa.Table:
    """Top-k by cosine over round-tripped int8 codes (quantize +
    dequantize per batch — models serving from an int8-encoded store);
    query stays float. Same per-batch local-top-k merge shape as the
    float brute force: only k x blocks rows reach the driver."""
    import ray

    scale = np.maximum((maxs - mins) / 255.0, 1e-12)
    params_ref = ray.put((np.asarray(query_vec, np.float64),
                          mins, scale))

    def local_topk(batch: pa.Table) -> pa.Table:
        qv, lo, sc = ray.get(params_ref)
        mat = _batch_vectors(batch, vec_col)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if mat.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        deq = _quantize(mat, lo, sc).astype(np.float64) * sc + lo
        cos = _cosine(deq, qv)
        order = np.lexsort((ids, -cos))[:k]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "cosine": pa.array(cos[order], pa.float64())})

    cand = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["cosine", id_col],
                            ascending=[False, True]).head(k)
    return pa.Table.from_pandas(cand.reset_index(drop=True),
                                preserve_index=False)


# --------------------------------------------------------------------------
# Binary quantization (the ES 8.x BBQ / Lucene binary-vector trick):
# 1 bit per dimension (32x less than float32, 8x less than SQ8),
# Hamming distance via a byte-popcount LUT, exact-L2 rerank of the
# Hamming shortlist for serving quality. No codebooks to train — the
# quantizer is the per-dimension mean threshold (one distributed pass).
# --------------------------------------------------------------------------

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def dim_means(ds, vec_col: str = "embedding") -> np.ndarray:
    """Per-dimension mean over the corpus: (sum, count) partials per
    batch — one (d,)-sized row per block crosses the shuffle."""

    def part(t: pa.Table) -> pa.Table:
        mat = _batch_vectors(t, vec_col)
        if mat.size == 0:
            return pa.table({"s": pa.array([], pa.list_(pa.float64())),
                             "n": pa.array([], pa.int64())})
        return pa.table({
            "s": pa.array([mat.sum(axis=0).tolist()],
                          pa.list_(pa.float64())),
            "n": pa.array([mat.shape[0]], pa.int64())})

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    total = np.sum([np.asarray(s, dtype=np.float64)
                    for s in parts["s"]], axis=0)
    return total / float(parts["n"].sum())


def _binarize(mat: np.ndarray, means: np.ndarray) -> np.ndarray:
    """(N, D) floats -> (N, D/8) packed sign bits (bit = dim > mean)."""
    bits = (mat > means[None, :]).astype(np.uint8)
    return np.packbits(bits, axis=1)


def binary_quantize(ds, means: np.ndarray, vec_col: str = "embedding",
                    id_col: str = "vec_id"):
    """One vectorized pass: Dataset of (id, bits fixed_size_list<uint8>
    of D/8 bytes) — the 1-bit vector store."""
    d = means.shape[0]
    if d % 8 != 0:
        raise ValueError(f"dim {d} must be a multiple of 8")
    nb = d // 8

    def enc(t: pa.Table) -> pa.Table:
        mat = _batch_vectors(t, vec_col)
        if mat.size == 0:  # keep the fixed-size-list schema
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "bits": pa.FixedSizeListArray.from_arrays(
                    pa.array([], pa.uint8()), nb)})
        packed = _binarize(mat.astype(np.float64), means)
        return pa.table({
            id_col: t[id_col],
            "bits": pa.FixedSizeListArray.from_arrays(
                pa.array(packed.reshape(-1), pa.uint8()), nb)})

    return ds.map_batches(enc, batch_format="pyarrow")


def hamming_topk(bits_ds, query: np.ndarray, means: np.ndarray,
                 k: int = 10, id_col: str = "vec_id",
                 rerank_ds=None, shortlist: int = 0,
                 vec_col: str = "embedding") -> pa.Table:
    """Hamming scan over the BITS dataset: per batch, XOR against the
    binarized query + byte-popcount LUT sum (no float vectors read),
    local top-k smallest, driver merge. With ``rerank_ds`` +
    ``shortlist``: exact-L2 rerank of the Hamming shortlist (the BBQ
    serving pattern — quantized scan for candidates, float rerank for
    order)."""
    import ray

    q = np.asarray(query, dtype=np.float64)
    qbits = _binarize(q[None, :], means)[0]
    nb = qbits.shape[0]
    ref = ray.put(qbits)
    fetch = max(k, shortlist)

    def local(t: pa.Table) -> pa.Table:
        qb = ray.get(ref)
        n = len(t)
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "hamming": pa.array([], pa.int64())})
        if n == 0:
            return empty
        col = t["bits"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        import pyarrow.compute as _pc

        bits = _pc.list_flatten(col).to_numpy(
            zero_copy_only=False).reshape(n, nb)
        ham = _POP8[np.bitwise_xor(bits, qb[None, :])] \
            .sum(axis=1, dtype=np.int64)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, ham))[:fetch]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "hamming": pa.array(ham[order], pa.int64())})

    cand = bits_ds.map_batches(local, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["hamming", id_col],
                            ascending=[True, True]).head(fetch)
    if rerank_ds is None or shortlist <= 0:
        return pa.Table.from_pandas(cand.head(k).reset_index(drop=True),
                                    preserve_index=False)
    from .pq import exact_l2_rerank

    return exact_l2_rerank(rerank_ds,
                           [int(i) for i in cand[id_col]], q, k,
                           vec_col=vec_col, id_col=id_col)
