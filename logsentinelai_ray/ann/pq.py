"""Product quantization (PQ) ANN — the memory-side technique that makes
10^12-vector search feasible: each D-dim float vector compresses to
``m`` uint8 codes (one per subspace), a 4·D/m-fold memory reduction, and
a query scans CODES with an ADC lookup table instead of raw floats.

Pipeline shape (all Ray-Data-first):

* ``train_pq`` — per-subspace k-means (L2) over a deterministic
  hash-rank sample (the same cluster-size-invariant sampler as
  ``ivf_centroids``; never ``ds.limit``, which biases toward the first
  blocks on sorted input). Codebooks are tiny (m × k* × D/m floats) and
  broadcast once.
* ``encode_pq`` — one vectorized assignment pass: per batch, per
  subspace, argmin of squared L2 to the 256-max centroids; emits
  (id, codes list<uint8>). At target scale the codes table is what
  persists (32× smaller than the vectors) — the raw embeddings are
  never needed again for serving.
* ``adc_topk`` — asymmetric distance computation: the query builds one
  LUT of m × k* squared subdistances, each row's approximate distance
  is a fancy-indexed LUT sum over its codes (no float vectors touched),
  per-batch local top-k, driver merges <= k × blocks rows.

Exactness invariant (pinned in tests): the ADC distance equals the true
squared L2 distance between the query and the RECONSTRUCTED vector
(codes decoded back to centroids) — ADC is exact over the quantized
points; only the quantization itself is lossy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _hash_rank_sample(ds, sample_size: int, id_col: str) -> "object":
    """Deterministic uniform sample as a pandas frame: keep the
    ``sample_size`` smallest Knuth-hash values of the id column —
    order- and cluster-size-invariant (see ivf_centroids)."""
    n_rows = ds.count()
    rate = min(1.0, (2.0 * sample_size) / max(n_rows, 1))
    thresh = np.int64(rate * float(1 << 32))

    def pick(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
        keep = h.astype(np.int64) < thresh
        return t.filter(pa.array(keep)).append_column(
            "__h", pa.array(h.astype(np.int64)[keep]))

    sample = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    if len(sample) == 0:
        return ds.limit(sample_size).to_pandas()
    return (sample.sort_values("__h").head(sample_size)
            .drop(columns="__h").reset_index(drop=True))


def _train_books(mat: np.ndarray, m: int, n_centroids: int,
                 n_iters: int, seed: int) -> np.ndarray:
    """Per-subspace L2 k-means over an in-memory sample matrix."""
    d = mat.shape[1]
    if d % m != 0:
        raise ValueError(f"dim {d} must be divisible by m={m}")
    sub = d // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, min(n_centroids, mat.shape[0]), sub),
                     dtype=np.float64)
    for j in range(m):
        x = mat[:, j * sub:(j + 1) * sub]
        cent = x[rng.choice(x.shape[0], size=books.shape[1],
                            replace=False)].copy()
        for _ in range(n_iters):
            # (N, k) squared L2 via the expansion trick — vectorized
            d2 = ((x * x).sum(1)[:, None] - 2.0 * (x @ cent.T)
                  + (cent * cent).sum(1)[None, :])
            assign = np.argmin(d2, axis=1)
            for c in range(cent.shape[0]):
                mask = assign == c
                if mask.any():
                    cent[c] = x[mask].mean(axis=0)
        books[j] = cent
    return books


def train_pq(ds, m: int = 8, n_centroids: int = 16, n_iters: int = 10,
             sample_size: int = 4096, vec_col: str = "embedding",
             id_col: str = "vec_id", seed: int = 42,
             residual_centroids: np.ndarray | None = None) -> np.ndarray:
    """Train the PQ codebooks: (m, n_centroids, D/m) float64. Plain L2
    k-means per subspace over the hash-rank sample, seeded — fully
    deterministic for a fixed input. With ``residual_centroids`` the
    codebooks train on COARSE RESIDUALS (x - nearest centroid), the
    IVFPQ regime — residuals are what the partition files store."""
    if n_centroids > 256:
        raise ValueError("PQ codes are uint8: n_centroids <= 256")
    sample = _hash_rank_sample(ds, sample_size, id_col)
    mat = np.stack([np.asarray(v, dtype=np.float64)
                    for v in sample[vec_col]])
    if residual_centroids is not None:
        mat = mat - residual_centroids[
            _coarse_assign(mat, residual_centroids)]
    return _train_books(mat, m, n_centroids, n_iters, seed)


def _coarse_assign(mat: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Spherical (cosine) nearest-centroid assignment — the same rule
    as ann/store.py's IVF partitioner, so IVFPQ lists line up with the
    plain IVF index built from the same centroids."""
    norms = np.sqrt((mat * mat).sum(axis=1))
    norms[norms == 0] = 1.0
    return np.argmax((mat / norms[:, None]) @ cent.T, axis=1)


def encode_pq(ds, books: np.ndarray, vec_col: str = "embedding",
              id_col: str = "vec_id"):
    """One vectorized assignment pass: Dataset of (id, codes
    list<uint8>). Codebooks ride in the closure (tiny — broadcast once
    per task by Ray's plan serialization)."""
    m, _k, sub = books.shape

    def enc(t: pa.Table) -> pa.Table:
        vecs = t[vec_col]
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        flat = pc.list_flatten(vecs).to_numpy(zero_copy_only=False)
        n = len(t)
        if n == 0:  # empty blocks must keep the fixed-size-list schema
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "codes": pa.FixedSizeListArray.from_arrays(
                    pa.array([], pa.uint8()), m)})
        mat = flat.reshape(n, m * sub).astype(np.float64)
        codes = np.empty((n, m), dtype=np.uint8)
        for j in range(m):
            x = mat[:, j * sub:(j + 1) * sub]
            cent = books[j]
            d2 = ((x * x).sum(1)[:, None] - 2.0 * (x @ cent.T)
                  + (cent * cent).sum(1)[None, :])
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        return pa.table({
            id_col: t[id_col],
            "codes": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1), pa.uint8()), m),
        })

    return ds.map_batches(enc, batch_format="pyarrow")


def decode_pq(codes: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Reconstruct (N, D) float64 vectors from (N, m) codes."""
    m, _k, sub = books.shape
    out = np.empty((codes.shape[0], m * sub), dtype=np.float64)
    for j in range(m):
        out[:, j * sub:(j + 1) * sub] = books[j][codes[:, j]]
    return out


def adc_lut(query: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(m, k*) table of squared L2 subdistances query-vs-centroid."""
    m, k, sub = books.shape
    q = np.asarray(query, dtype=np.float64).reshape(m, sub)
    lut = np.empty((m, k), dtype=np.float64)
    for j in range(m):
        diff = books[j] - q[j][None, :]
        lut[j] = (diff * diff).sum(axis=1)
    return lut


def adc_topk(codes_ds, query: np.ndarray, books: np.ndarray, k: int = 10,
             id_col: str = "vec_id", rerank_ds=None, shortlist: int = 0,
             vec_col: str = "embedding") -> pa.Table:
    """ADC scan over the CODES dataset: per batch, distance = LUT sum
    over each row's codes (fancy indexing — no float vectors read),
    local top-k smallest, driver merge of <= k x blocks rows.

    With ``rerank_ds`` + ``shortlist``: the FAISS refine pattern —
    take the ``shortlist`` best ADC candidates, gather ONLY their raw
    vectors (an id-pruned read, shortlist-sized), exact-L2 rerank,
    return the true top-k of the shortlist. Recall then depends on the
    shortlist covering the true neighborhood, not on code resolution."""
    import ray

    lut = adc_lut(query, books)
    m = books.shape[0]
    ref = ray.put(lut)
    fetch = max(k, shortlist)

    def local(t: pa.Table) -> pa.Table:
        table = ray.get(ref)
        n = len(t)
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "adc_dist": pa.array([], pa.float64())})
        if n == 0:
            return empty
        col = t["codes"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        codes = pc.list_flatten(col).to_numpy(
            zero_copy_only=False).reshape(n, m)
        dist = table[np.arange(m)[None, :], codes].sum(axis=1)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, dist))[:fetch]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "adc_dist": pa.array(dist[order], pa.float64())})

    cand = codes_ds.map_batches(local, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["adc_dist", id_col],
                            ascending=[True, True]).head(fetch)
    if rerank_ds is None or shortlist <= 0:
        return pa.Table.from_pandas(cand.head(k).reset_index(drop=True),
                                    preserve_index=False)
    return exact_l2_rerank(rerank_ds,
                           [int(i) for i in cand[id_col]],
                           np.asarray(query, dtype=np.float64), k,
                           vec_col=vec_col, id_col=id_col)


def exact_l2_rerank(rerank_ds, ids: list[int], q: np.ndarray, k: int,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> pa.Table:
    """The FAISS/BBQ refine stage shared by PQ and binary quantization:
    gather ONLY the shortlist ids' raw vectors (an id-pruned filter,
    shortlist-sized), exact squared-L2, true top-k of the shortlist."""
    want = sorted(set(int(i) for i in ids))

    def gather(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t[id_col],
                        value_set=pa.array(want, pa.int64()))
        t = t.filter(keep)
        if len(t) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "l2_dist": pa.array([], pa.float64())})
        vecs = t[vec_col]
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        mat = pc.list_flatten(vecs).to_numpy(
            zero_copy_only=False).reshape(len(t), -1).astype(np.float64)
        diff = mat - q[None, :]
        return pa.table({
            id_col: t[id_col],
            "l2_dist": pa.array((diff * diff).sum(axis=1),
                                pa.float64())})

    exact = rerank_ds.map_batches(gather,
                                  batch_format="pyarrow").to_pandas()
    exact = exact.sort_values(["l2_dist", id_col],
                              ascending=[True, True]).head(k)
    return pa.Table.from_pandas(exact.reset_index(drop=True),
                                preserve_index=False)


# --------------------------------------------------------------------------
# IVFPQ: coarse partition pruning x residual code compression — the two
# ANN scale levers composed (FAISS IndexIVFPQ). The persisted layout is
# out_dir/list=C/*.parquet holding (id, codes) ONLY: a probe reads
# n_probe partitions of uint8 codes — IO shrinks by both the pruning
# factor AND ~32x code compression vs the raw-float IVF store.
# --------------------------------------------------------------------------


def build_ivfpq_index(ds, out_dir: str, centroids: np.ndarray,
                      books: np.ndarray, vec_col: str = "embedding",
                      id_col: str = "vec_id") -> dict:
    """One assignment+encode pass: per row, coarse list = spherical
    nearest centroid (the ann/store.py IVF rule), codes = PQ of the
    RESIDUAL (x - centroid); hive-partitioned write, no shuffle (each
    task writes its own partition files). ||q - x||^2 ==
    ||(q - c) - (x - c)||^2 exactly, so residual ADC approximates true
    L2 regardless of the assignment metric."""
    import json

    import ray

    cent = np.asarray(centroids, dtype=np.float64)
    m, _k, sub = books.shape
    ref = ray.put((cent, books))

    def assign_encode(t: pa.Table) -> pa.Table:
        c_arr, bks = ray.get(ref)
        n = len(t)
        if n == 0:  # keep the fixed-size-list schema on empty blocks
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "codes": pa.FixedSizeListArray.from_arrays(
                    pa.array([], pa.uint8()), m),
                "list": pa.array([], pa.int32())})
        vecs = t[vec_col]
        if isinstance(vecs, pa.ChunkedArray):
            vecs = vecs.combine_chunks()
        mat = pc.list_flatten(vecs).to_numpy(
            zero_copy_only=False).reshape(n, m * sub).astype(np.float64)
        lists = _coarse_assign(mat, c_arr)
        resid = mat - c_arr[lists]
        codes = np.empty((n, m), dtype=np.uint8)
        for j in range(m):
            x = resid[:, j * sub:(j + 1) * sub]
            cb = bks[j]
            d2 = ((x * x).sum(1)[:, None] - 2.0 * (x @ cb.T)
                  + (cb * cb).sum(1)[None, :])
            codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
        return pa.table({
            id_col: t[id_col],
            "codes": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1), pa.uint8()), m),
            "list": pa.array(lists.astype(np.int32), pa.int32()),
        })

    (ds.map_batches(assign_encode, batch_format="pyarrow")
     .write_parquet(out_dir, partition_cols=["list"], mode="overwrite"))
    meta = {"kind": "ivfpq", "centroids": cent.tolist(),
            "books": books.tolist(), "id_col": id_col, "m": int(m)}
    import os as _os

    with open(_os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def ivfpq_index_topk(index_dir: str, query_vec, k: int = 10,
                     n_probe: int = 2) -> pa.Table:
    """Partition-pruned residual-ADC top-k: per probed list C the LUT
    is built from (q - centroid_C) — the residual identity — and only
    list=C code files are read. Returns (id, adc_dist) ascending."""
    import json
    import os as _os

    import ray
    import ray.data as rd

    with open(_os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    cent = np.asarray(meta["centroids"], dtype=np.float64)
    books = np.asarray(meta["books"], dtype=np.float64)
    id_col = meta["id_col"]
    m = books.shape[0]
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.sqrt((q * q).sum()) or 1.0
    probe = np.argsort(-(cent @ (q / qn)))[:n_probe]
    parts = []
    for c in probe:
        pdir = _os.path.join(index_dir, f"list={int(c)}")
        if not _os.path.isdir(pdir):
            continue
        lut = adc_lut(q - cent[int(c)], books)
        ref = ray.put(lut)

        def local(t: pa.Table, _ref=ref) -> pa.Table:
            table = ray.get(_ref)
            n = len(t)
            if n == 0:
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "adc_dist": pa.array([], pa.float64())})
            col = t["codes"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            codes = pc.list_flatten(col).to_numpy(
                zero_copy_only=False).reshape(n, m)
            dist = table[np.arange(m)[None, :], codes].sum(axis=1)
            ids = t[id_col].to_numpy(zero_copy_only=False)
            order = np.lexsort((ids, dist))[:k]
            return pa.table({
                id_col: pa.array(ids[order], pa.int64()),
                "adc_dist": pa.array(dist[order], pa.float64())})

        cand = rd.read_parquet(pdir, columns=[id_col, "codes"]) \
            .map_batches(local, batch_format="pyarrow").to_pandas()
        parts.append(cand)
    if not parts:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "adc_dist": pa.array([], pa.float64())})
    import pandas as pd

    merged = pd.concat(parts, ignore_index=True) \
        .sort_values(["adc_dist", id_col],
                     ascending=[True, True]).head(k)
    return pa.Table.from_pandas(merged.reset_index(drop=True),
                                preserve_index=False)
