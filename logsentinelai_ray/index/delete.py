"""Document deletion — Lucene/ES-style tombstones over an append-only
index.

The reference deletes documents through the ES delete API; an immutable
posting layout (ours, and Lucene's segments) cannot remove postings in
place, so deletes are *tombstones*: a sorted doc-id set stored next to
the segments, applied as an exclusion at query time. Matching ES
semantics exactly: deleted docs stop appearing in results immediately,
but collection statistics (N, df, avgdl) keep their pre-delete values
until a rebuild ("segment merge") — scores of surviving docs do not
change when a neighbor is deleted.

The tombstone set is assumed to be a small fraction of the corpus
(delete-heavy workloads rebuild); it is one sorted int64 column, merged
idempotently and atomically on every call.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_TOMBSTONES = "tombstones.parquet"


def tombstones_path(index_dir: str) -> str:
    return os.path.join(index_dir, _TOMBSTONES)


def read_tombstones(index_dir: str) -> np.ndarray:
    """Sorted unique deleted doc ids (empty array when none)."""
    path = tombstones_path(index_dir)
    if not os.path.exists(path):
        return np.empty(0, dtype=np.int64)
    return pq.read_table(path)["doc_id"].to_numpy(
        zero_copy_only=False).astype(np.int64)


def compact_index(index_dir: str, dst_dir: str, cfg=None,
                  corpus_tag: str = "compacted") -> dict:
    """ES force-merge analog: rebuild the index without its tombstoned
    docs. The surviving documents stream from the old index's ``docs/``
    files (content read once, never through the driver) into a fresh
    ``build_index`` — doc ids are re-ranked densely and collection
    statistics (N, df, avgdl) reflect the post-delete corpus, so scores
    change exactly as an ES segment merge changes them. Returns the new
    build's meta dict."""
    import pyarrow.compute as pc
    import ray.data as rd

    from .build import build_index

    if cfg is None:
        # derive the shape from the source index (like update_index):
        # a default-config compaction of a 32-partition index must not
        # silently change partitioning
        import dataclasses

        from ..config import IndexConfig
        from . import manifest as mf
        from .update import _SHAPE_FIELDS

        stats = mf.read_stats(index_dir)
        stored = {f: stats[f] for f in _SHAPE_FIELDS if f in stats}
        cfg = dataclasses.replace(IndexConfig(), **stored)

    tomb = read_tombstones(index_dir)
    docs = rd.read_parquet(
        os.path.join(index_dir, "docs"),
        columns=["doc_id", "repo", "path", "commit", "lang", "content"])
    if tomb.size:
        tomb_set = pa.array(tomb.tolist(), pa.int64())
        docs = docs.map_batches(
            lambda t: t.filter(
                pc.invert(pc.is_in(t["doc_id"], value_set=tomb_set))),
            batch_format="pyarrow")
    docs = docs.drop_columns(["doc_id"])
    return build_index(docs, dst_dir, cfg, corpus_tag=corpus_tag)


def delete_docs(index_dir: str, doc_ids) -> int:
    """Merge ``doc_ids`` into the tombstone set (idempotent, atomic).
    Returns the total tombstone count after the merge. Engines opened
    before the call keep serving the old set — construct a new
    SearchEngine (or call its ``reload_tombstones``) to observe it,
    the same visibility contract as an ES index refresh."""
    new = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    merged = np.union1d(read_tombstones(index_dir), new)
    path = tombstones_path(index_dir)
    tmp = path + f".tmp-{os.getpid()}"
    pq.write_table(pa.table({"doc_id": pa.array(merged, pa.int64())}),
                   tmp)
    os.replace(tmp, path)
    return int(merged.size)
