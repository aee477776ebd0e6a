"""Similarity search over an embedding column (list<float>).

- ``cosine_topk_bruteforce``: the exact baseline — the query matrix is
  broadcast once (``ray.put``), each batch does one float64 matmul and
  emits only its local top-k rows, the tiny global candidate set is then
  sorted/limited. Per-batch work is O(rows * dim); nothing N-sized leaves
  a task.
- ``cosine_topk_lsh``: the scale path — random-hyperplane LSH buckets
  (seeded) prune the scan to matching buckets (approximate; documented
  recall/probe tradeoff).
- ``embedding_dupes``: near-duplicate vectors (cosine >= threshold) via
  the same LSH buckets + in-bucket exact verification.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa


def _batch_vectors(batch: pa.Table, vec_col: str) -> np.ndarray:
    col = batch[vec_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _cosine(mat: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Cosine similarity of each row of mat against q (both float64)."""
    dot = mat @ q
    norms = np.sqrt((mat * mat).sum(axis=1)) * np.sqrt((q * q).sum())
    with np.errstate(invalid="ignore", divide="ignore"):
        out = dot / norms
    return np.nan_to_num(out, nan=0.0)


def cosine_topk_bruteforce(ds, query_vec, k: int = 10,
                           vec_col: str = "embedding",
                           id_col: str = "vec_id") -> pa.Table:
    """Exact top-k by cosine; tie-break (cosine desc, id asc).

    Returns (vec_id, cosine) sorted; ``query_vec`` is broadcast via
    ``ray.put`` once, not re-shipped per batch.
    """
    import ray

    q = np.asarray(query_vec, dtype=np.float64)
    q_ref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        mat = _batch_vectors(batch, vec_col)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if mat.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        cos = _cosine(mat, qv)
        order = np.lexsort((ids, -cos))[:k]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "cosine": pa.array(cos[order], pa.float64())})

    cand = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["cosine", id_col],
                            ascending=[False, True]).head(k)
    return pa.Table.from_pandas(cand.reset_index(drop=True),
                                preserve_index=False)


class _LSHBucketer:
    """Seeded random-hyperplane bucketer (stateful: planes built once)."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(dim, n_planes))

    def bucket(self, mat: np.ndarray) -> np.ndarray:
        bits = (mat @ self.planes) > 0
        return (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1)


def cosine_topk_lsh(ds, query_vec, k: int = 10, vec_col: str = "embedding",
                    id_col: str = "vec_id", n_planes: int = 8,
                    seed: int = 42) -> pa.Table:
    """Approximate top-k: scan only rows whose LSH bucket matches the
    query's. Returns the same schema as the brute-force variant."""
    import ray

    q = np.asarray(query_vec, dtype=np.float64)
    bucketer = _LSHBucketer(q.size, n_planes, seed)
    q_bucket = int(bucketer.bucket(q[None, :])[0])
    q_ref = ray.put((q, q_bucket))

    def local(batch: pa.Table) -> pa.Table:
        qv, qb = ray.get(q_ref)
        mat = _batch_vectors(batch, vec_col)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if mat.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        b = _LSHBucketer(qv.size, n_planes, seed)
        keep = b.bucket(mat) == qb
        mat, ids = mat[keep], ids[keep]
        if mat.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        cos = _cosine(mat, qv)
        order = np.lexsort((ids, -cos))[:k]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         "cosine": pa.array(cos[order], pa.float64())})

    cand = ds.map_batches(local, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["cosine", id_col],
                            ascending=[False, True]).head(k)
    return pa.Table.from_pandas(cand.reset_index(drop=True),
                                preserve_index=False)


def _bucket_dupes(group: pa.Table, vec_col: str, id_col: str,
                  threshold: float) -> pa.Table:
    ids = group[id_col].to_numpy(zero_copy_only=False)
    mat = _batch_vectors(group, vec_col)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})
    if ids.size < 2:
        return empty
    norms = np.sqrt((mat * mat).sum(axis=1))
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    sim = unit @ unit.T
    ia, ib = np.triu_indices(ids.size, k=1)
    keep = sim[ia, ib] >= threshold
    return pa.table({"a": pa.array(ids[ia][keep], pa.int64()),
                     "b": pa.array(ids[ib][keep], pa.int64()),
                     "cosine": pa.array(sim[ia, ib][keep], pa.float64())})


def embedding_dupes(ds, threshold: float = 0.95, vec_col: str = "embedding",
                    id_col: str = "vec_id", n_planes: int = 8,
                    seed: int = 42) -> pa.Table:
    """Embedding-cosine near-dup pairs within LSH buckets (approximate:
    cross-bucket pairs are missed; more planes → smaller buckets → faster
    but lower recall). Returns (a, b, cosine) sorted by (a, b)."""
    from ray.data.aggregate import Max

    def add_bucket(batch: pa.Table) -> pa.Table:
        mat = _batch_vectors(batch, vec_col)
        if mat.size == 0:
            return batch.append_column("bucket",
                                       pa.array([], pa.int64()))
        b = _LSHBucketer(mat.shape[1], n_planes, seed)
        return batch.append_column(
            "bucket", pa.array(b.bucket(mat).astype(np.int64)))

    pairs = (ds.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(partial(_bucket_dupes, vec_col=vec_col,
                                 id_col=id_col, threshold=threshold),
                         batch_format="pyarrow")
             .groupby(["a", "b"]).aggregate(Max("cosine",
                                                alias_name="cosine")))
    pdf = pairs.to_pandas()
    schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                        ("cosine", pa.float64())])
    if len(pdf) == 0 or "a" not in pdf.columns:
        return schema.empty_table()
    pdf = pdf.sort_values(["a", "b"]).reset_index(drop=True)
    return pa.Table.from_pandas(pdf, preserve_index=False).cast(schema)
