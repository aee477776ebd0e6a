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


def cosine_topk_batch(ds, query_mat, k: int = 10,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id") -> pa.Table:
    """Batched multi-query exact kNN — ES _msearch / batched-inference
    shape: ALL queries score in ONE matmul per batch (``mat @ Q.T``,
    O(rows * dim * n_queries) with BLAS throughput instead of n_queries
    scans), each batch emits only its per-query local top-k, the global
    merge handles k*blocks*n_queries candidate rows. Returns
    (query_id, vec_id, cosine) sorted by (query_id, cosine desc, id asc).
    ``query_mat`` (n_queries x dim) is broadcast via ``ray.put`` once.
    """
    import ray

    Q = np.asarray(query_mat, dtype=np.float64)
    q_ref = ray.put(Q)

    def local_topk(batch: pa.Table) -> pa.Table:
        Qv = ray.get(q_ref)
        mat = _batch_vectors(batch, vec_col)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if mat.size == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        dots = mat @ Qv.T                       # (rows, nq) — one GEMM
        rown = np.sqrt((mat * mat).sum(axis=1))[:, None]
        qn = np.sqrt((Qv * Qv).sum(axis=1))[None, :]
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = np.nan_to_num(dots / (rown * qn), nan=0.0)
        kk = min(k, ids.size)
        out_q, out_i, out_c = [], [], []
        for qi in range(Qv.shape[0]):
            order = np.lexsort((ids, -cos[:, qi]))[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int64))
            out_i.append(ids[order])
            out_c.append(cos[order, qi])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            id_col: pa.array(np.concatenate(out_i), pa.int64()),
            "cosine": pa.array(np.concatenate(out_c), pa.float64())})

    cand = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["query_id", "cosine", id_col],
                            ascending=[True, False, True])
    cand = cand.groupby("query_id", sort=True).head(k)
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


def _probe_buckets(q: np.ndarray, bucketer: "_LSHBucketer",
                   n_probes: int) -> np.ndarray:
    """Multi-probe bucket set: the query's own bucket plus single-bit
    flips of the LEAST-confident hyperplanes first (smallest |projection|
    — the standard multi-probe LSH ordering). Recall rises with
    ``n_probes`` at linear extra scan cost; single-probe recall sags as
    dimensionality grows because near neighbors straddle low-margin
    planes."""
    proj = q @ bucketer.planes
    base = int(((proj > 0) * (1 << np.arange(proj.size))).sum())
    a = np.abs(proj)
    n = proj.size
    # perturbation sets of size <= 2, ordered by total flipped margin
    # (near neighbors of a weak-cosine query sit 2-3 bits away, so
    # single-bit probing alone stalls)
    cands: list[tuple[float, int]] = [(0.0, 0)]
    for i in range(n):
        cands.append((a[i], 1 << i))
        for j in range(i + 1, n):
            cands.append((a[i] + a[j], (1 << i) | (1 << j)))
    cands.sort()
    return np.asarray([base ^ m for _, m in cands[:n_probes]],
                      dtype=np.int64)


def cosine_topk_lsh(ds, query_vec, k: int = 10, vec_col: str = "embedding",
                    id_col: str = "vec_id", n_planes: int = 6,
                    seed: int = 42, n_probes: int = 8,
                    n_tables: int = 4) -> pa.Table:
    """Approximate top-k: scan only rows whose bucket, in ANY of the
    ``n_tables`` independent hyperplane tables, is in that table's
    multi-probe set. Multiple tables are the recall lever (a weak-cosine
    neighbor flips ~p·n_planes bits in one table, so single-table
    probing stalls); probes-per-table are the precision lever. Returns
    the brute-force schema."""
    import ray

    q = np.asarray(query_vec, dtype=np.float64)
    seeds = [seed + 131 * t for t in range(n_tables)]
    probes = [
        _probe_buckets(q, _LSHBucketer(q.size, n_planes, s), n_probes)
        for s in seeds]
    q_ref = ray.put((q, probes))

    def local(batch: pa.Table) -> pa.Table:
        qv, prs = ray.get(q_ref)
        mat = _batch_vectors(batch, vec_col)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if mat.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        keep = np.zeros(mat.shape[0], dtype=bool)
        for s, pr in zip(seeds, prs):
            b = _LSHBucketer(qv.size, n_planes, s)
            keep |= np.isin(b.bucket(mat), pr)
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


def ivf_centroids(ds, n_centroids: int = 16, n_iters: int = 8,
                  sample_size: int = 4096, vec_col: str = "embedding",
                  id_col: str = "vec_id", seed: int = 42) -> np.ndarray:
    """Coarse quantizer for IVF: spherical k-means over a bounded sample
    (sampling, not a full pass — at 10^12 rows the sample is still a
    representative few thousand vectors; the assignment pass below is
    what scans everything). Deterministic for a fixed seed.

    The sample is deterministic HASH-RATE sampling over the id column —
    uniform across the whole dataset and cluster-size invariant — not
    ``ds.limit`` (which takes the FIRST blocks and biases the centroids
    on sorted/clustered input)."""
    n_rows = ds.count()
    rate = min(1.0, (2.0 * sample_size) / max(n_rows, 1))
    thresh = np.int64(rate * float(1 << 32))

    def pick(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
        keep = h.astype(np.int64) < thresh
        return t.filter(pa.array(keep)).append_column(
            "__h", pa.array(h.astype(np.int64)[keep]))

    # truncate by HASH RANK, never by stream position (a .limit() here
    # would re-bias toward the first blocks): the sample_size smallest
    # hash values are a uniform, deterministic, order-independent choice
    sample = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    if len(sample) == 0:  # degenerate tiny input: fall back to everything
        sample = ds.limit(sample_size).to_pandas()
    else:
        sample = (sample.sort_values("__h").head(sample_size)
                  .drop(columns="__h").reset_index(drop=True))
    mat = np.stack([np.asarray(v, dtype=np.float64)
                    for v in sample[vec_col]])
    norms = np.sqrt((mat * mat).sum(axis=1))
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    rng = np.random.RandomState(seed)
    cent = unit[rng.choice(unit.shape[0],
                           size=min(n_centroids, unit.shape[0]),
                           replace=False)]
    for _ in range(n_iters):
        assign = np.argmax(unit @ cent.T, axis=1)
        for c in range(cent.shape[0]):
            m = assign == c
            if m.any():
                v = unit[m].mean(axis=0)
                n = np.sqrt((v * v).sum()) or 1.0
                cent[c] = v / n
    return cent


def cosine_topk_ivf(ds, query_vec, centroids: np.ndarray, k: int = 10,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    n_probe: int = 2) -> pa.Table:
    """IVF approximate top-k: scan only rows assigned to the ``n_probe``
    centroids nearest the query (centroids broadcast via ray.put).
    Returns the brute-force schema; recall rises with n_probe."""
    import ray

    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.sqrt((q * q).sum()) or 1.0
    probe = np.argsort(-(centroids @ (q / qn)))[:n_probe]
    ref = ray.put((q, centroids, np.asarray(probe)))

    def local(batch: pa.Table) -> pa.Table:
        qv, cent, pr = ray.get(ref)
        mat = _batch_vectors(batch, vec_col)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          "cosine": pa.array([], pa.float64())})
        if mat.size == 0:
            return empty
        norms = np.sqrt((mat * mat).sum(axis=1))
        norms[norms == 0] = 1.0
        assign = np.argmax((mat / norms[:, None]) @ cent.T, axis=1)
        keep = np.isin(assign, pr)
        mat, ids = mat[keep], ids[keep]
        if mat.size == 0:
            return empty
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
                    seed: int = 42, n_tables: int = 4) -> pa.Table:
    """Embedding-cosine near-dup pairs within LSH buckets, OR-amplified
    across ``n_tables`` independent hyperplane tables: a pair is caught
    when it shares a bucket in ANY table (same recall lever as
    ``cosine_topk_lsh``; at cosine 0.95 / 8 planes single-table pair
    recall is p^8 ≈ 0.43 with p = 1 - acos(s)/π, four tables lift it to
    1-(1-p^8)^4 ≈ 0.90). In-bucket similarity is exact cosine, so
    precision is exact; only recall is approximate, and cross-table
    duplicate pairs collapse in the (a, b) groupby. Exchange cost: each
    vector crosses the shuffle ``n_tables`` times. Returns (a, b,
    cosine) sorted by (a, b)."""
    from ray.data.aggregate import Max

    seeds = [seed + 131 * t for t in range(n_tables)]

    def add_bucket(batch: pa.Table) -> pa.Table:
        mat = _batch_vectors(batch, vec_col)
        if mat.size == 0:
            return (batch.append_column("t", pa.array([], pa.int32()))
                    .append_column("bucket", pa.array([], pa.int64())))
        outs = []
        for ti, s in enumerate(seeds):
            b = _LSHBucketer(mat.shape[1], n_planes, s)
            outs.append(
                batch.append_column(
                    "t", pa.array(np.full(mat.shape[0], ti, np.int32)))
                .append_column(
                    "bucket", pa.array(b.bucket(mat).astype(np.int64))))
        return pa.concat_tables(outs)

    pairs = (ds.map_batches(add_bucket, batch_format="pyarrow")
             .groupby(["t", "bucket"])
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


def semdedup(ds, threshold: float = 0.93, n_centroids: int = 16,
             vec_col: str = "embedding", id_col: str = "vec_id",
             seed: int = 42, max_group: int | None = 100_000) -> pa.Table:
    """SemDeDup (Abbas et al. 2023, public arXiv:2303.09540): semantic
    deduplication by clustering embeddings with spherical k-means, then
    within each cluster greedily dropping any vector whose cosine to an
    already-KEPT vector (ascending-id order) exceeds ``threshold`` —
    deterministic min-id keeper variant of the paper's rule.

    Exchange shape: the centroid fit is hash-rate-sampled
    (``ivf_centroids``); the assignment pass is one broadcast matmul per
    batch; the pairwise pass runs inside ``groupby(cluster).map_groups``
    so each cluster's O(g^2/2) similarity work happens where the group
    lives and only (id, cluster, keep) rows come back. ``max_group``
    guards the quadratic: a cluster larger than it raises (at that size
    the right move is more centroids or an in-cluster LSH sub-bucket
    pass, the same escape hatch as dedup/jaccard.py).

    Returns a Dataset of (vec_id, cluster, keep) — one row per input
    row, sorted by vec_id; corpus-sized output stays distributed (the
    caller writes or filters it, never collects it)."""
    import ray

    cent = ivf_centroids(ds, n_centroids=n_centroids, vec_col=vec_col,
                         id_col=id_col, seed=seed)
    cent_ref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        mat = _batch_vectors(t, vec_col)
        norms = np.sqrt((mat * mat).sum(axis=1))
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        cluster = np.argmax(unit @ c.T, axis=1).astype(np.int32)
        return t.append_column("cluster", pa.array(cluster))

    def dedup_cluster(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        gsz = g.num_rows
        if max_group is not None and gsz > max_group:
            raise ValueError(
                f"semdedup cluster size {gsz} > max_group={max_group}; "
                "raise n_centroids or sub-bucket the cluster")
        order = pc.sort_indices(g, sort_keys=[(id_col, "ascending")])
        g = g.take(order)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        mat = _batch_vectors(g, vec_col)
        norms = np.sqrt((mat * mat).sum(axis=1))
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        sims = unit @ unit.T
        keep = np.ones(gsz, dtype=bool)
        for j in range(1, gsz):
            if (sims[j, :j][keep[:j]] > threshold).any():
                keep[j] = False
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(
                np.full(gsz, g["cluster"][0].as_py(), dtype=np.int32)),
            "keep": pa.array(keep),
        })

    return (ds.map_batches(assign, batch_format="pyarrow")
            .groupby("cluster")
            .map_groups(dedup_cluster, batch_format="pyarrow")
            .sort("vec_id"))
