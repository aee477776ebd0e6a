"""MinHash + LSH near-duplicate detection (candidate gen → exact verify).

Pipeline: vectorized shingle emit (shared with dedup.jaccard) → 64-bit
shingle hashes (one vectorized polars xxhash pass per batch — no per-row
hashlib) → ``num_perm`` universal-hash minima computed for the WHOLE batch
as one (num_perm × total_shingles) product reduced per document with
``np.minimum.reduceat`` → vectorized band hashes → (band, band_hash,
doc_id) LSH rows → groupby band bucket → candidate pairs → exact Jaccard
verification over shingle-hash sets, computed inside ``map_batches`` with
the candidate sets broadcast via ``ray.put`` (only candidate texts are
ever fetched; nothing corpus-sized and no verification compute on the
driver). Output pairs are guaranteed-true near-dups over the hashed
shingle space (J >= threshold); LSH only bounds recall (with 16 bands x 4
rows the miss probability at J=0.9 is (1-0.9^4)^16 ≈ 2e-3).

Shingle definition identical to dedup.jaccard so the two operators'
outputs are directly comparable (minhash ⊆ exact).

Scale note: the candidate PAIR list is assumed driver-small (real dup
rates << 1%); at 10^12 docs the pair dedupe becomes a groupby on the
packed key and verification co-locates (pair, shingle-set) via a doc_id
exchange instead of the broadcast.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .jaccard import _shingle_rows

_MERSENNE = np.uint64((1 << 61) - 1)


def _hash_shingles(sh) -> np.ndarray:
    """Vectorized 64-bit shingle hash (polars xxhash; deterministic for a
    fixed seed). One Rust pass over the whole column."""
    import polars as pl

    if isinstance(sh, pa.ChunkedArray):
        sh = sh.combine_chunks()
    return pl.from_arrow(sh).hash(seed=0).to_numpy().astype(np.uint64)


class MinHashEmit:
    """Actor-pool stage: docs → (band, band_hash, doc_id) LSH rows.

    Permutation/band coefficients are seeded once per actor in __init__
    (the stateful-stage pattern; reference analog core/llm.py:18-79);
    __call__ is one vectorized pass per batch."""

    # cap on the (num_perm × shingles) working matrix per chunk: 64 perms
    # × 2^17 shingles × 8 B = 64 MB
    _CHUNK_SHINGLES = 1 << 17

    def __init__(self, text_col: str, id_col: str, n: int, num_perm: int,
                 bands: int, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1,
                             size=num_perm).astype(np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1,
                             size=num_perm).astype(np.uint64)
        self.text_col, self.id_col, self.n = text_col, id_col, n
        self.num_perm, self.bands = num_perm, bands
        self.rows_per_band = num_perm // bands
        # odd multipliers for the vectorized band mix (wrapping u64 dot)
        self.band_coef = (rng.randint(0, 1 << 62, size=num_perm)
                          .astype(np.uint64) | np.uint64(1)
                          ).reshape(bands, self.rows_per_band)

    def signatures(self, doc_ids: np.ndarray, sh64: np.ndarray,
                   starts: np.ndarray) -> np.ndarray:
        """(n_docs, num_perm) signature matrix; ``starts`` are the doc
        segment starts within the batch-wide shingle-hash array."""
        sig = np.empty((self.num_perm, starts.size), dtype=np.uint64)
        bounds = np.append(starts, sh64.size)
        c = 0
        with np.errstate(over="ignore"):
            while c < starts.size:
                e = c
                while (e < starts.size
                       and bounds[e + 1] - bounds[c] <= self._CHUNK_SHINGLES):
                    e += 1
                e = max(e, c + 1)  # a single huge doc still processes
                seg = sh64[bounds[c]:bounds[e]]
                m = (self.a[:, None] * seg[None, :] + self.b[:, None]) \
                    % _MERSENNE
                sig[:, c:e] = np.minimum.reduceat(
                    m, starts[c:e] - starts[c], axis=1)
                c = e
        return sig.T

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = _shingle_rows(batch, self.text_col, self.id_col, self.n)
        if t.num_rows == 0:
            return pa.table({"band": pa.array([], pa.int32()),
                             "bh": pa.array([], pa.uint64()),
                             "doc_id": pa.array([], pa.int64())})
        t = t.sort_by("doc_id")
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        sh64 = _hash_shingles(t["sh"])
        starts = np.concatenate(
            ([0], np.flatnonzero(did[1:] != did[:-1]) + 1))
        udocs = did[starts]
        sig = self.signatures(udocs, sh64, starts)  # (D, num_perm)
        with np.errstate(over="ignore"):
            bh = (sig.reshape(-1, self.bands, self.rows_per_band)
                  * self.band_coef[None]).sum(axis=2, dtype=np.uint64)
        D = udocs.size
        return pa.table({
            "band": pa.array(np.tile(np.arange(self.bands, dtype=np.int32),
                                     D)),
            "bh": pa.array(bh.reshape(-1), pa.uint64()),
            "doc_id": pa.array(np.repeat(udocs, self.bands), pa.int64()),
        })


def _bucket_pairs(group: pa.Table) -> pa.Table:
    ids = np.sort(np.unique(group["doc_id"].to_numpy(zero_copy_only=False)))
    if ids.size < 2:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    ia, ib = np.triu_indices(ids.size, k=1)
    return pa.table({"a": pa.array(ids[ia], pa.int64()),
                     "b": pa.array(ids[ib], pa.int64())})


def _shingle_sets(tbl: pa.Table, text_col: str, id_col: str, n: int
                  ) -> dict[int, np.ndarray]:
    """doc_id → sorted unique shingle-hash array (vectorized)."""
    t = _shingle_rows(tbl, text_col, id_col, n)
    if t.num_rows == 0:
        return {}
    t = t.sort_by("doc_id")
    did = t["doc_id"].to_numpy(zero_copy_only=False)
    h = _hash_shingles(t["sh"])
    starts = np.concatenate(([0], np.flatnonzero(did[1:] != did[:-1]) + 1))
    bounds = np.append(starts, h.size)
    return {int(did[s]): np.unique(h[s:e])
            for s, e in zip(bounds[:-1], bounds[1:])}


def _verify_pairs(batch: pa.Table, sets_ref, threshold: float) -> pa.Table:
    """Exact Jaccard over broadcast shingle-hash sets — runs in the
    cluster; the per-pair loop touches candidates only."""
    import ray

    sets = ray.get(sets_ref) if not isinstance(sets_ref, dict) else sets_ref
    a = batch["a"].to_numpy(zero_copy_only=False)
    b = batch["b"].to_numpy(zero_copy_only=False)
    out_a, out_b, out_j = [], [], []
    for x, y in zip(a, b):
        sa, sb = sets.get(int(x)), sets.get(int(y))
        if sa is None or sb is None or not sa.size or not sb.size:
            continue
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        j = inter / (sa.size + sb.size - inter)
        if j >= threshold:
            out_a.append(int(x))
            out_b.append(int(y))
            out_j.append(j)
    return pa.table({"a": pa.array(out_a, pa.int64()),
                     "b": pa.array(out_b, pa.int64()),
                     "jaccard": pa.array(out_j, pa.float64())})


def minhash_lsh_dupes(ds, text_col: str = "text", id_col: str = "doc_id",
                      n: int = 3, num_perm: int = 64, bands: int = 16,
                      threshold: float = 0.5) -> pa.Table:
    """Returns (a, b, jaccard) for verified near-dup pairs, sorted by (a,b).

    Candidate pairs are deduped on the driver (candidate count is tiny);
    verification runs inside the cluster over broadcast candidate
    shingle-hash sets built from a pushed-down fetch of candidate texts.
    """
    from functools import partial

    import ray
    import ray.data as rd

    lsh_rows = ds.map_batches(
        MinHashEmit, fn_constructor_args=(text_col, id_col, n, num_perm,
                                          bands),
        batch_format="pyarrow", concurrency=(1, 4))
    pairs_ds = (lsh_rows.groupby(["band", "bh"])
                .map_groups(_bucket_pairs, batch_format="pyarrow"))
    parts = [np.stack([b["a"].to_numpy(zero_copy_only=False),
                       b["b"].to_numpy(zero_copy_only=False)], axis=1)
             for b in pairs_ds.iter_batches(batch_format="pyarrow",
                                            batch_size=1 << 20)]
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
    if not parts:
        return empty
    cand = np.unique(np.concatenate(parts), axis=0)
    if cand.size == 0:
        return empty
    cand_ids = np.unique(cand)
    want = pa.array(cand_ids, pa.int64())
    texts_tbl = pa.concat_tables(list(ds.map_batches(
        lambda t: t.filter(pc.is_in(t[id_col], value_set=want))
                   .select([id_col, text_col]),
        batch_format="pyarrow").iter_batches(batch_format="pyarrow",
                                             batch_size=1 << 20)))
    sets_ref = ray.put(_shingle_sets(texts_tbl, text_col, id_col, n))
    verified = rd.from_arrow(pa.table({
        "a": pa.array(cand[:, 0], pa.int64()),
        "b": pa.array(cand[:, 1], pa.int64()),
    })).map_batches(partial(_verify_pairs, sets_ref=sets_ref,
                            threshold=threshold),
                    batch_format="pyarrow")
    vparts = list(verified.iter_batches(batch_format="pyarrow",
                                        batch_size=1 << 20))
    out = pa.concat_tables(vparts) if vparts else empty
    if out.num_rows == 0:
        return empty
    return out.sort_by([("a", "ascending"), ("b", "ascending")])
