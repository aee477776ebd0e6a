"""Snapshot / restore — the ES ``_snapshot`` API analog for the
immutable on-disk index layout.

The index is already snapshot-shaped (append-only parquet + JSON
manifest, reference contrast: core/elasticsearch.py relies on the ES
cluster's own snapshots), so a snapshot is a directory copy — the value
this module adds is the RESTORE-side verification: every restored
segment part is re-counted from its copied bytes (term rows, sum of
df) and compared against the manifest lineage written at build time,
plus docmap row totals against stats.json. Nothing is trusted from the
copy; a flipped bit in transit fails loudly instead of serving wrong
postings.

Scale note: verification reads each segment part once with pyarrow
column pruning (term-count needs metadata only, df needs one column);
parts verify independently, so at cluster scale the loop fans out as
one task per part (same shape as the build's per-part merge).
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import pyarrow.compute as pc
import pyarrow.parquet as pq


class SnapshotCorrupt(RuntimeError):
    pass


def _verify_restored(dst: str) -> dict:
    report: dict = {"parts": 0, "n_terms": 0, "n_postings": 0}
    for mpath in sorted(glob.glob(os.path.join(dst, "manifest",
                                               "part-*.json"))):
        with open(mpath) as f:
            entry = json.load(f)
        seg = os.path.join(dst, "segments",
                           os.path.basename(entry["output"]))
        if not os.path.exists(seg):
            raise SnapshotCorrupt(f"missing restored segment: {seg}")
        tbl = pq.read_table(seg, columns=["df"])
        n_terms = tbl.num_rows
        n_postings = int(pc.sum(tbl["df"]).as_py() or 0)
        if (n_terms != entry["n_terms"]
                or n_postings != entry["n_postings"]):
            raise SnapshotCorrupt(
                f"part {entry['part']}: restored counts "
                f"({n_terms} terms / {n_postings} postings) != manifest "
                f"({entry['n_terms']} / {entry['n_postings']})")
        report["parts"] += 1
        report["n_terms"] += n_terms
        report["n_postings"] += n_postings
    stats_path = os.path.join(dst, "stats.json")
    with open(stats_path) as f:
        stats = json.load(f)
    docmap = os.path.join(dst, "docmap")
    if not os.path.isdir(docmap):
        docmap = os.path.join(dst, "docs")
    n_docs = sum(pq.read_metadata(p).num_rows
                 for p in sorted(glob.glob(os.path.join(docmap,
                                                        "*.parquet"))))
    if n_docs != int(stats["n_docs"]):
        raise SnapshotCorrupt(
            f"restored docmap has {n_docs} docs, stats.json says "
            f"{stats['n_docs']}")
    report["n_docs"] = n_docs
    return report


def snapshot_index(src: str, dst: str) -> dict:
    """Copy the index at ``src`` to ``dst`` and verify the restored copy
    against its own manifest (see module docstring). Removes a failed
    snapshot and raises ``SnapshotCorrupt`` on any mismatch; returns the
    verification report on success."""
    src_real = os.path.realpath(src)
    dst_real = os.path.realpath(dst)
    common = os.path.commonpath([src_real, dst_real])
    if common in (src_real, dst_real):
        # dst == src, dst inside src, or src inside dst: the rmtree below
        # would destroy the live source index either way
        raise ValueError(
            f"snapshot destination {dst!r} overlaps the source index "
            f"{src!r}; choose a disjoint directory")
    shutil.rmtree(dst, ignore_errors=True)
    shutil.copytree(src, dst)
    try:
        return _verify_restored(dst)
    except Exception:
        shutil.rmtree(dst, ignore_errors=True)
        raise
