"""Exact duplicate-span statistics (substring-level dedup, the
train-data-hygiene step of Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better": find spans of >= k tokens that appear in
more than one document and measure how much of each document they cover).

Definition (shared verbatim by the DuckDB oracle in __ray_entry__):
  tokens     = non-empty runs of [a-z0-9] in lower(text)
  k-grams    = every positional word k-gram (tokens joined by one space)
  duplicated = a k-gram occurring in >= 2 DISTINCT documents
  coverage   = |union over duplicated k-gram starts p of [p, p+k)| per doc
  output     = (doc_id, dup_tokens, n_tokens, dup_ratio) for docs with
               coverage > 0, sorted by doc_id

Plan shape: map_batches positional k-gram emit (vectorized — the jaccard
shingle kernel with start positions kept and occurrences NOT deduped) →
groupby(gram).map_groups keep-if->=2-distinct-docs (one shuffle decides
duplication; nothing gram-count-sized on the driver) → per-doc interval
union in groupby(doc_id).map_groups (sorted starts; covered = sum of
min(gap, k) + k — numpy, no Python loop over positions) → hash-partitioned
Dataset.join against the per-doc token counts for the ratio.

Scale notes (10^12 docs): the gram shuffle carries (gram, doc_id, pos) —
the gram string dominates; at extreme scale hash grams to int64 first
(fixed-width exchange; a 64-bit collision falsely marks ~one span per
~10^9 distinct grams — fine for filtering, not for the exact oracle, so
it's opt-in). The per-doc union never holds more than one doc's marked
positions; the output join is the same exchange `dedup/jaccard.py`'s
size join uses.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_POS_SCHEMA = pa.schema([("doc_id", pa.int64()), ("pos", pa.int64())])


def _gram_pos_rows(batch: pa.Table, text_col: str, id_col: str,
                   k: int) -> pa.Table:
    """Emit (doc_id, sh, pos) for EVERY positional word k-gram — the
    jaccard shingle kernel (dedup/jaccard.py::_shingle_rows) with the
    0-based start position kept and no per-doc dedup (positions matter).
    """
    text = pc.utf8_lower(batch[text_col])
    lists = pc.split_pattern_regex(text, pattern="[^a-z0-9]+")
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = pc.filter(flat, pa.array(keep))
    parent = parent[keep]
    counts = np.bincount(parent, minlength=len(batch)).astype(np.int64)
    n_sh = np.maximum(counts - k + 1, 0)
    total = int(n_sh.sum())
    if total == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "sh": pa.array([], pa.string()),
                         "pos": pa.array([], pa.int64())})
    row_starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    base = np.repeat(row_starts, n_sh)
    sh_starts = np.cumsum(n_sh) - n_sh
    offs = np.arange(total, dtype=np.int64) - np.repeat(sh_starts, n_sh)
    idx = base + offs
    cols = [pc.take(flat, pa.array(idx + j, pa.int64())) for j in range(k)]
    sh = pc.binary_join_element_wise(*cols, " ")
    doc_rep = np.repeat(np.arange(len(batch), dtype=np.int64), n_sh)
    doc_ids = batch[id_col].to_numpy(zero_copy_only=False)[doc_rep]
    return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                     "sh": sh,
                     "pos": pa.array(offs, pa.int64())})


def _keep_if_duplicated(group: pa.Table) -> pa.Table:
    """One gram's occurrence rows → kept iff >= 2 distinct documents."""
    if pc.count_distinct(group["doc_id"]).as_py() >= 2:
        return group.select(["doc_id", "pos"])
    return _POS_SCHEMA.empty_table()


def _coverage_of_doc(group: pa.Table, k: int) -> pa.Table:
    """Union of [p, p+k) over one doc's marked gram starts — sorted
    starts, covered = sum(min(gap, k)) + k. Positions are unique per doc
    (one gram per start), so no dedup pass is needed."""
    ps = np.sort(group["pos"].to_numpy(zero_copy_only=False))
    covered = int(np.minimum(np.diff(ps), k).sum()) + k if ps.size else 0
    return pa.table({
        "doc_id": pa.array([group["doc_id"][0].as_py()], pa.int64()),
        "dup_tokens": pa.array([covered], pa.int64())})


def duplicate_span_stats(ds, text_col: str = "text",
                         id_col: str = "doc_id", k: int = 3,
                         join_partitions: int = 16) -> pa.Table:
    """Per-document duplicated-span coverage — returns a pyarrow Table
    (doc_id, dup_tokens, n_tokens, dup_ratio) for documents with any
    cross-document duplicated k-gram, sorted by doc_id."""
    from functools import partial

    grams = ds.map_batches(
        partial(_gram_pos_rows, text_col=text_col, id_col=id_col, k=k),
        batch_format="pyarrow")
    marked = grams.groupby("sh").map_groups(_keep_if_duplicated,
                                            batch_format="pyarrow")
    cov = marked.groupby("doc_id").map_groups(
        partial(_coverage_of_doc, k=k), batch_format="pyarrow")

    def tok_counts(t: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(pc.utf8_lower(t[text_col]),
                                     r"[a-z0-9]+")
        return pa.table({"doc_id": pc.cast(t[id_col], pa.int64()),
                         "n_tokens": pc.cast(n, pa.int64())})

    sizes = ds.map_batches(tok_counts, batch_format="pyarrow")
    joined = cov.join(sizes, "inner", num_partitions=join_partitions,
                      on=("doc_id",))

    def finish(t: pa.Table) -> pa.Table:
        dup = t["dup_tokens"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column("dup_ratio",
                               pa.array(dup / np.maximum(n, 1.0),
                                        pa.float64()))

    out = joined.map_batches(finish, batch_format="pyarrow").to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(
        out[["doc_id", "dup_tokens", "n_tokens", "dup_ratio"]],
        preserve_index=False)
