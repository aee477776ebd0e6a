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
