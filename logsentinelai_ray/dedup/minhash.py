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

Candidate-pair dedup is a distributed ``groupby(pk)`` on the packed pair
key (never a driver-side unique over raw band rows), and shingle hashing
always runs in the cluster. Verification has two cross-tested paths
chosen by candidate count: below ``driver_max_pairs`` the per-candidate
shingle-hash sets are broadcast via ``ray.put`` and pairs verify inside
``map_batches`` (one sorted-hash array per candidate doc is the only
driver-held state); above it NOTHING pair-set-sized stays on the driver —
candidate shingle rows are re-grouped by shingle hash, expanded through
the same salted block machinery as dedup.jaccard restricted to the
candidate pair set, and ``groupby(pk).count`` yields exact intersection
sizes (the doc_id exchange the broadcast path's scale note prescribes).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

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
    """One LSH bucket's doc set → packed candidate pair keys a*2^32+b
    (a < b). Emitting the packed key lets the cross-band dedup be one
    distributed ``groupby(pk)`` instead of a driver-side unique."""
    ids = np.sort(np.unique(group["doc_id"].to_numpy(zero_copy_only=False)))
    if ids.size and ids[-1] >= 2 ** 31:
        raise ValueError(
            f"doc_id {int(ids[-1])} >= 2^31 overflows the packed int64 "
            "pair key; use a two-column (a, b) pair exchange instead")
    if ids.size < 2:
        return pa.table({"pk": pa.array([], pa.int64())})
    ia, ib = np.triu_indices(ids.size, k=1)
    pk = (ids[ia].astype(np.int64) << 32) | ids[ib].astype(np.int64)
    return pa.table({"pk": pa.array(pk, pa.int64())})


def _cand_hash_rows(batch: pa.Table, ids_ref, text_col: str, id_col: str,
                    n: int) -> pa.Table:
    """Distinct (doc_id, shingle-hash) rows for candidate docs only.

    Runs in the cluster: the broadcast side is one sorted int64 id per
    candidate doc. Each document lives in exactly one input row, so the
    per-batch (doc_id, h) distinct is globally distinct."""
    import ray

    cand = ids_ref if isinstance(ids_ref, np.ndarray) else ray.get(ids_ref)
    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "h": pa.array([], pa.uint64())})
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    pos = np.searchsorted(cand, ids)
    mask = (pos < cand.size) & (cand[np.minimum(pos, cand.size - 1)] == ids)
    if not mask.any():
        return empty
    t = _shingle_rows(batch.filter(pa.array(mask)), text_col, id_col, n)
    if t.num_rows == 0:
        return empty
    t = pa.table({"doc_id": t["doc_id"],
                  "h": pa.array(_hash_shingles(t["sh"]), pa.uint64())})
    # distinct again after hashing: two distinct shingle strings that
    # collide in the 64-bit hash must count once, exactly as the
    # broadcast path's np.unique over hashes does
    return t.group_by(["doc_id", "h"]).aggregate([])


def _sets_from_rows(tbl: pa.Table) -> dict[int, np.ndarray]:
    """Collected (doc_id, h) rows → doc_id → sorted hash array."""
    if tbl.num_rows == 0:
        return {}
    did = tbl["doc_id"].to_numpy(zero_copy_only=False)
    h = tbl["h"].to_numpy(zero_copy_only=False)
    order = np.argsort(did, kind="stable")
    did, h = did[order], h[order]
    starts = np.concatenate(([0], np.flatnonzero(did[1:] != did[:-1]) + 1))
    bounds = np.append(starts, h.size)
    return {int(did[s]): np.sort(h[s:e])
            for s, e in zip(bounds[:-1], bounds[1:])}


def _member_pairs(batch: pa.Table, pk_ref) -> pa.Table:
    """Keep only expanded pairs that are LSH candidates (sorted-array
    membership against the broadcast packed-key set)."""
    import ray

    pk_set = pk_ref if isinstance(pk_ref, np.ndarray) else ray.get(pk_ref)
    pk = batch["pk"].to_numpy(zero_copy_only=False)
    pos = np.searchsorted(pk_set, pk)
    ok = (pos < pk_set.size) & (pk_set[np.minimum(pos, pk_set.size - 1)]
                                == pk)
    return pa.table({"pk": pa.array(pk[ok], pa.int64())})


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
                      threshold: float = 0.5,
                      driver_max_pairs: int = 2_000_000) -> pa.Table:
    """Returns (a, b, jaccard) for verified near-dup pairs, sorted by (a,b).

    Candidate pairs dedupe in a distributed ``groupby(pk)``; candidate
    shingle hashing runs in the cluster in both paths. Below
    ``driver_max_pairs`` candidates, verification broadcasts the
    per-candidate sorted hash sets (``ray.put``) and checks pairs inside
    ``map_batches`` — the cheap path when real dup rates are << 1%.
    Above it, verification is the doc_id exchange: candidate (doc_id, h)
    rows groupby shingle hash, expand through dedup.jaccard's salted
    block machinery restricted to the candidate set, and
    ``groupby(pk).count`` produces exact intersection sizes — the driver
    holds only the packed candidate-key array (8 B/pair) and the
    (id, set-size) lookup (16 B/doc). Requires ``threshold > 0`` (a
    zero-intersection pair never surfaces in the exchange).
    """
    from functools import partial

    import ray
    import ray.data as rd
    from ray.data.aggregate import Count

    from .jaccard import (_expand_pair_blocks, _jaccard_filter,
                          _pair_blocks_of_group)

    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
    lsh_rows = ds.map_batches(
        MinHashEmit, fn_constructor_args=(text_col, id_col, n, num_perm,
                                          bands),
        batch_format="pyarrow", concurrency=(1, 4))
    pairs_ds = (lsh_rows.groupby(["band", "bh"])
                .map_groups(_bucket_pairs, batch_format="pyarrow")
                .groupby("pk").aggregate(Count(alias_name="_c"))
                .select_columns(["pk"]).materialize())
    n_pairs = pairs_ds.count()
    if n_pairs == 0:
        return empty
    pk = np.sort(np.concatenate([
        b["pk"].to_numpy(zero_copy_only=False)
        for b in pairs_ds.iter_batches(batch_format="pyarrow",
                                       batch_size=1 << 20)]))
    cand_ids = np.unique(np.concatenate([pk >> 32, pk & 0xFFFFFFFF]))
    ids_ref = ray.put(cand_ids)
    hash_rows = ds.map_batches(
        partial(_cand_hash_rows, ids_ref=ids_ref, text_col=text_col,
                id_col=id_col, n=n),
        batch_format="pyarrow")

    if n_pairs <= driver_max_pairs:
        rows = list(hash_rows.iter_batches(batch_format="pyarrow",
                                           batch_size=1 << 20))
        sets_ref = ray.put(_sets_from_rows(
            pa.concat_tables(rows) if rows else
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "h": pa.array([], pa.uint64())})))
        verified = rd.from_arrow(pa.table({
            "a": pa.array(pk >> 32, pa.int64()),
            "b": pa.array(pk & 0xFFFFFFFF, pa.int64()),
        })).map_batches(partial(_verify_pairs, sets_ref=sets_ref,
                                threshold=threshold),
                        batch_format="pyarrow")
    else:
        hash_rows = hash_rows.materialize()
        sizes = hash_rows.groupby("doc_id").aggregate(
            Count(alias_name="n_sh"))
        sz_parts = list(sizes.iter_batches(batch_format="pyarrow",
                                           batch_size=1 << 20))
        sz_tbl = pa.concat_tables(sz_parts).sort_by("doc_id")
        sz_ref = ray.put((sz_tbl["doc_id"].to_numpy(zero_copy_only=False),
                          sz_tbl["n_sh"].to_numpy(zero_copy_only=False)))
        pk_ref = ray.put(pk)
        verified = (hash_rows
                    .map_batches(lambda t: pa.table(
                        {"doc_id": t["doc_id"], "sh": t["h"]}),
                        batch_format="pyarrow")
                    .groupby("sh")
                    .map_groups(partial(_pair_blocks_of_group,
                                        max_group=None),
                                batch_format="pyarrow")
                    .map_batches(_expand_pair_blocks,
                                 batch_format="pyarrow", batch_size=128)
                    .map_batches(partial(_member_pairs, pk_ref=pk_ref),
                                 batch_format="pyarrow")
                    .groupby("pk").aggregate(Count(alias_name="inter"))
                    .map_batches(partial(_jaccard_filter, sz_ref=sz_ref,
                                         threshold=threshold),
                                 batch_format="pyarrow"))
    vparts = list(verified.iter_batches(batch_format="pyarrow",
                                        batch_size=1 << 20))
    out = pa.concat_tables(vparts) if vparts else empty
    if out.num_rows == 0:
        return empty
    return out.sort_by([("a", "ascending"), ("b", "ascending")])
