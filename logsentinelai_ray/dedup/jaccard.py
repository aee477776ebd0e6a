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
    ids = np.sort(group["doc_id"].to_numpy(zero_copy_only=False))
    g = ids.size
    if g < 2 or (max_group is not None and g > max_group):
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    ia, ib = np.triu_indices(g, k=1)
    return pa.table({"a": pa.array(ids[ia], pa.int64()),
                     "b": pa.array(ids[ib], pa.int64())})


def ngram_jaccard_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, threshold: float = 0.5,
                        max_group: int | None = None):
    """Returns a pyarrow Table (a, b, jaccard) sorted by (a, b)."""
    import ray
    from ray.data.aggregate import Count

    from functools import partial

    shingles = ds.map_batches(
        partial(_shingle_rows, text_col=text_col, id_col=id_col, n=n),
        batch_format="pyarrow")
    # per-doc distinct shingle counts (tiny table: one int per doc)
    sizes_ds = shingles.groupby("doc_id").aggregate(Count(alias_name="n_sh"))
    sizes = dict(zip(*[sizes_ds.to_pandas()[c].to_numpy()
                       for c in ("doc_id", "n_sh")]))
    sizes_ref = ray.put(sizes)

    inter = (shingles
             .groupby("sh")
             .map_groups(partial(_pairs_of_group, max_group=max_group),
                         batch_format="pyarrow")
             .groupby(["a", "b"])
             .aggregate(Count(alias_name="inter")))

    def score(batch: pa.Table) -> pa.Table:
        sz = ray.get(sizes_ref)
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        it = batch["inter"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = np.array([sz[x] for x in a], dtype=np.float64)
        nb = np.array([sz[x] for x in b], dtype=np.float64)
        j = it / (na + nb - it)
        keep = j >= threshold
        return pa.table({"a": pa.array(a[keep], pa.int64()),
                         "b": pa.array(b[keep], pa.int64()),
                         "jaccard": pa.array(j[keep], pa.float64())})

    out = inter.map_batches(score, batch_format="pyarrow")
    return pa.Table.from_pandas(
        out.to_pandas().sort_values(["a", "b"]).reset_index(drop=True),
        preserve_index=False)
