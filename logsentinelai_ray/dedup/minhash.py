"""MinHash + LSH near-duplicate detection (candidate gen → exact verify).

Pipeline: shingle → 64-bit shingle hashes → ``num_perm`` universal-hash
minima (vectorized matrix min) → band LSH rows (band_id, band_hash, doc_id)
→ groupby band bucket → candidate pairs → exact n-gram Jaccard verification
of the (small) candidate set. Output pairs are guaranteed-true near-dups
(J >= threshold); LSH only bounds recall (with 16 bands x 4 rows the miss
probability at J=0.9 is (1-0.9^4)^16 ≈ 2e-3).

Shingle definition identical to dedup.jaccard so the two operators'
outputs are directly comparable (minhash ⊆ exact).
"""

from __future__ import annotations

import hashlib
from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text: str, n: int) -> np.ndarray:
    toks = [t for t in __import__("re").split(r"[^a-z0-9]+", text.lower())
            if t]
    if len(toks) < n:
        return np.empty(0, dtype=np.uint64)
    shingles = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
    return np.fromiter(
        (int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(),
                        "big") for s in shingles),
        dtype=np.uint64, count=len(shingles))


class MinHashEmit:
    """Actor-pool stage: docs → (band, band_hash, doc_id) LSH rows.

    Permutation coefficients are seeded once per actor in __init__ (the
    stateful-stage pattern; reference analog core/llm.py:18-79)."""

    def __init__(self, text_col: str, id_col: str, n: int, num_perm: int,
                 bands: int, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.b = rng.randint(0, (1 << 61) - 1, size=num_perm).astype(np.uint64)
        self.text_col, self.id_col, self.n = text_col, id_col, n
        self.num_perm, self.bands = num_perm, bands
        self.rows_per_band = num_perm // bands

    def signature(self, text: str) -> np.ndarray | None:
        sh = _shingle_hashes(text, self.n)
        if sh.size == 0:
            return None
        with np.errstate(over="ignore"):
            # (num_perm, n_shingles) universal hash, min over shingles
            m = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
        return m.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_band, out_bh, out_id = [], [], []
        for did, text in zip(batch[self.id_col].to_pylist(),
                             batch[self.text_col].to_pylist()):
            sig = self.signature(text or "")
            if sig is None:
                continue
            r = self.rows_per_band
            for band in range(self.bands):
                chunk = sig[band * r:(band + 1) * r]
                bh = int.from_bytes(
                    hashlib.blake2b(chunk.tobytes(),
                                    digest_size=8).digest(), "big")
                out_band.append(band)
                out_bh.append(bh)
                out_id.append(did)
        return pa.table({"band": pa.array(out_band, pa.int32()),
                         "bh": pa.array(out_bh, pa.uint64()),
                         "doc_id": pa.array(out_id, pa.int64())})


def _bucket_pairs(group: pa.Table) -> pa.Table:
    ids = np.sort(np.unique(group["doc_id"].to_numpy(zero_copy_only=False)))
    if ids.size < 2:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    ia, ib = np.triu_indices(ids.size, k=1)
    return pa.table({"a": pa.array(ids[ia], pa.int64()),
                     "b": pa.array(ids[ib], pa.int64())})


def minhash_lsh_dupes(ds, text_col: str = "text", id_col: str = "doc_id",
                      n: int = 3, num_perm: int = 64, bands: int = 16,
                      threshold: float = 0.5) -> pa.Table:
    """Returns (a, b, jaccard) for verified near-dup pairs, sorted by (a,b).

    The candidate set is assumed driver-small (real dup rates are <<1%);
    verification fetches only candidate docs' texts via a pushed-down
    filter, never the corpus.
    """
    lsh_rows = ds.map_batches(
        MinHashEmit, fn_constructor_args=(text_col, id_col, n, num_perm,
                                          bands),
        batch_format="pyarrow", concurrency=(1, 4))
    pairs_ds = (lsh_rows.groupby(["band", "bh"])
                .map_groups(_bucket_pairs, batch_format="pyarrow"))
    pdf = pairs_ds.to_pandas().drop_duplicates()
    if len(pdf) == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    cand_ids = sorted(set(pdf["a"]) | set(pdf["b"]))
    want = pa.array(cand_ids, pa.int64())
    texts_tbl = (ds.map_batches(
        lambda t: t.filter(pc.is_in(t[id_col], value_set=want))
                   .select([id_col, text_col]),
        batch_format="pyarrow").to_pandas())
    text_of = dict(zip(texts_tbl[id_col], texts_tbl[text_col]))
    sets = {d: set(_shingle_hashes(text_of[d] or "", n).tolist())
            for d in cand_ids}
    out = []
    for a, b in sorted({(int(r.a), int(r.b)) for r in pdf.itertuples()}):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        j = inter / (len(sa) + len(sb) - inter)
        if j >= threshold:
            out.append((a, b, j))
    return pa.table({"a": pa.array([p[0] for p in out], pa.int64()),
                     "b": pa.array([p[1] for p in out], pa.int64()),
                     "jaccard": pa.array([p[2] for p in out], pa.float64())})
