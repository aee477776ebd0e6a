"""Exact n-gram Jaccard near-duplicate pairs (distributed shingle join).

Definition (shared verbatim by the DuckDB oracle in __ray_entry__):
  tokens    = non-empty runs of [a-z0-9] in lower(text)   (no camel split)
  shingles  = distinct word n-grams (tokens joined by one space)
  J(a, b)   = |Sa ∩ Sb| / (|Sa| + |Sb| - |Sa ∩ Sb|)
  output    = pairs with J >= threshold, (a < b), sorted by (a, b)

Plan shape: map_batches shingle-emit (vectorized split) →
groupby(shingle).map_groups pair-expansion (np.triu_indices per group) →
groupby(a, b).count = intersection sizes → jaccard against broadcast
per-doc set sizes. Only (hash, id) pairs ever shuffle, never text.

Skew note: a shingle shared by g docs expands to g(g-1)/2 pairs; real
corpora cap g (``max_group``) and salt the expansion — the cap defaults to
None here so the result is exactly the oracle's.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _shingle_rows(batch: pa.Table, text_col: str, id_col: str,
                  n: int) -> pa.Table:
    text = pc.utf8_lower(batch[text_col])
    lists = pc.split_pattern_regex(text, pattern="[^a-z0-9]+")
    doc_ids = batch[id_col].to_numpy(zero_copy_only=False)
    out_ids: list[int] = []
    out_sh: list[str] = []
    for did, toks in zip(doc_ids, lists.to_pylist()):
        toks = [t for t in (toks or []) if t]
        if len(toks) < n:
            continue
        sh = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
        out_ids.extend([did] * len(sh))
        out_sh.extend(sh)
    return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                     "sh": pa.array(out_sh, pa.string())})


def _pairs_of_group(group: pa.Table, max_group: int | None) -> pa.Table:
    """Expand one shingle's doc set into packed pair keys a*2^32+b."""
    ids = np.sort(group["doc_id"].to_numpy(zero_copy_only=False))
    g = ids.size
    if g < 2 or (max_group is not None and g > max_group):
        return pa.table({"pk": pa.array([], pa.int64())})
    ia, ib = np.triu_indices(g, k=1)
    pk = (ids[ia].astype(np.int64) << 32) | ids[ib].astype(np.int64)
    return pa.table({"pk": pa.array(pk, pa.int64())})


def ngram_jaccard_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, threshold: float = 0.5,
                        max_group: int | None = None,
                        driver_max_rows: int = 50_000_000):
    """Returns a pyarrow Table (a, b, jaccard) sorted by (a, b).

    Pair EXPANSION runs distributed (groupby shingle); pair COUNTING is a
    single np.unique over packed 64-bit keys — streamed to the driver below
    ``driver_max_rows`` pair rows (a Dataset groupby on so-small rows costs
    10x the work in shuffle overhead), and a distributed groupby above it.
    Doc ids must fit in 31 bits for the packing (scale note: at 10^12 docs
    the packed key becomes two columns and the groupby path applies).
    """
    from functools import partial

    from ray.data.aggregate import Count

    shingles = ds.map_batches(
        partial(_shingle_rows, text_col=text_col, id_col=id_col, n=n),
        batch_format="pyarrow").materialize()
    # per-doc distinct shingle counts: one int per doc — driver-side
    doc_col = np.concatenate([
        b["doc_id"].to_numpy(zero_copy_only=False)
        for b in shingles.iter_batches(batch_format="pyarrow",
                                       batch_size=1 << 20)] or
        [np.empty(0, dtype=np.int64)])
    sz_ids, sz_counts = np.unique(doc_col, return_counts=True)

    pairs_ds = shingles.groupby("sh").map_groups(
        partial(_pairs_of_group, max_group=max_group),
        batch_format="pyarrow")

    n_pairs = pairs_ds.count()
    if n_pairs <= driver_max_rows:
        pk = np.concatenate([
            b["pk"].to_numpy(zero_copy_only=False)
            for b in pairs_ds.iter_batches(batch_format="pyarrow",
                                           batch_size=1 << 20)] or
            [np.empty(0, dtype=np.int64)])
        uniq, inter = np.unique(pk, return_counts=True)
    else:
        agg = (pairs_ds.groupby("pk").aggregate(Count(alias_name="c"))
               .to_pandas())
        uniq = agg["pk"].to_numpy()
        inter = agg["c"].to_numpy()

    a = (uniq >> 32).astype(np.int64)
    b = (uniq & 0xFFFFFFFF).astype(np.int64)
    na = sz_counts[np.searchsorted(sz_ids, a)].astype(np.float64)
    nb = sz_counts[np.searchsorted(sz_ids, b)].astype(np.float64)
    it = inter.astype(np.float64)
    j = it / (na + nb - it)
    keep = j >= threshold
    order = np.lexsort((b[keep], a[keep]))
    return pa.table({"a": pa.array(a[keep][order], pa.int64()),
                     "b": pa.array(b[keep][order], pa.int64()),
                     "jaccard": pa.array(j[keep][order], pa.float64())})
