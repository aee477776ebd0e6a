"""Exact deduplication: hash-partition by content hash, keep min-id.

The reference's only dedup is an order-preserving ``seen`` set over file
paths in one process (reference core/commons.py:96-101); this is the
distributed version: an md5 content-hash column added in a vectorized
``map_batches``, then a ``groupby(hash).aggregate(min(id))`` — Ray's
aggregate does partial (per-block) combining before the shuffle, so only
(hash, min_id) pairs move, never content.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset of surviving ids: min(id) per distinct content, one column
    named ``id_col``. (Keep-first under ascending ids == keep-min-id.)"""
    from ray.data.aggregate import Min

    def to_hash(batch: pa.Table) -> pa.Table:
        h = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
             for t in batch[text_col].to_pylist()]
        return pa.table({"h": pa.array(h, pa.string()),
                         "_id": batch[id_col]})

    hashed = ds.map_batches(to_hash, batch_format="pyarrow")
    out = hashed.groupby("h").aggregate(Min("_id", alias_name=id_col))
    return out.select_columns([id_col])
