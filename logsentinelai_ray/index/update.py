"""Incremental index update — the batch analog of the reference's realtime
tail mode (reference core/monitoring.py:301-438 polls a file and analyzes
the delta; our immutable-parquet equivalent is: new corpus files → delta
segments appended to the existing term partitions, SURVEY.md §2.10).

Semantics:
- New documents receive ids ``N..N+M-1`` (rank of key among the new,
  previously-unseen keys in sorted-key order). Duplicates of existing keys
  or within the delta are dropped (keep-existing / keep-first).
- Delta postings go through the same partitioned-parquet exchange and run
  encoding; because all delta doc ids exceed every existing id, merging a
  term's delta blocks is pure concatenation after the existing blocks — no
  re-encode of old data (the salt-run concat invariant, segments.py).
- Collection stats are updated exactly (N' = N + M, total_tokens' += delta)
  so BM25 scores equal a from-scratch build over the union. Stored
  block-max bounds were computed under the *build-time* avgdl; since
  tf_norm is increasing in avgdl, bounds are kept safe at query time by
  scaling with ``max(1, avgdl_now / min_bounds_avgdl)`` (stats field
  ``min_bounds_avgdl``) — looser pruning, never wrong results.

Dedup against existing keys uses the docmap key set (driver-held here;
at 10^12 docs this becomes a bucketed anti-join against the docmap
partitions — same exchange pattern as the build).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..config import IndexConfig
from . import manifest as mf
from .build import (
    _corpus_files,
    _emit_and_partition,
    _encode_part_salt,
    _file_keys,
    _finalize_file,
    merge_runs,
)


@ray.remote(num_cpus=1)
def _merge_delta_part(index_dir: str, delta_dir: str, part: int,
                      fingerprint: str, cfg: IndexConfig,
                      avgdl_delta: float, n_base: int, n_total: int
                      ) -> dict:
    """Encode this part's delta runs and append them to the existing
    segment (concat per term; delta ids > all existing ids)."""
    t0 = time.monotonic()
    runs = []
    for salt in range(cfg.salt_buckets):
        tbl = ray.get(_encode_part_salt.remote(
            delta_dir, part, salt, cfg, avgdl_delta))
        if tbl.num_rows:
            runs.append(tbl)
    seg_path = os.path.join(index_dir, "segments",
                            f"part-{part:04d}.parquet")
    existing = pq.read_table(seg_path) if os.path.exists(seg_path) else None
    if runs:
        delta_seg = merge_runs(pa.concat_tables(runs))
        if existing is not None and existing.num_rows:
            # existing rows play the role of a salt-0 run; merge_runs
            # concatenates per term in 'salt' order, so tag old rows with
            # salt=-1 (sorts first) and delta rows with their true order
            old = existing.add_column(1, "salt", pa.array(
                np.full(existing.num_rows, -1, dtype=np.int32)))
            new = delta_seg.add_column(1, "salt", pa.array(
                np.zeros(delta_seg.num_rows, dtype=np.int32)))
            merged = merge_runs(pa.concat_tables([old, new]))
        else:
            merged = delta_seg
    else:
        merged = existing
    if merged is None:
        from .segments import SEGMENT_SCHEMA

        merged = SEGMENT_SCHEMA.empty_table()
    tmp = seg_path + f".tmp-{os.getpid()}"
    os.makedirs(os.path.dirname(seg_path), exist_ok=True)
    pq.write_table(merged, tmp)
    os.replace(tmp, seg_path)
    n_postings = int(pc.sum(merged["df"]).as_py() or 0) if merged.num_rows \
        else 0
    entry = {
        "part": part,
        "fingerprint": fingerprint,
        "n_terms": merged.num_rows,
        "n_postings": n_postings,
        "elapsed_s": round(time.monotonic() - t0, 4),
        "output": seg_path,
        "delta_of": n_base,
    }
    mf.write_part_entry(index_dir, entry)
    return entry


def update_index(new_corpus_path: str, index_dir: str,
                 cfg: IndexConfig | None = None,
                 delta_tag: str = "delta") -> dict:
    """Append new parquet corpus files to an existing index."""
    import ray.data as rd

    cfg = cfg or IndexConfig()
    stats = mf.read_stats(index_dir)
    n_base = int(stats["n_docs"])
    t0 = time.monotonic()

    # existing key set (driver-held; see module docstring for scale path)
    docmap_dir = os.path.join(index_dir, "docmap")
    existing_keys_tbl = pq.read_table(docmap_dir,
                                      columns=["repo", "path", "commit"])
    existing = set(pc.binary_join_element_wise(
        existing_keys_tbl["repo"], existing_keys_tbl["path"],
        existing_keys_tbl["commit"], "\x00").to_pylist())

    files = _corpus_files(new_corpus_path)
    key_tbls = ray.get([_file_keys.remote(f, i)
                        for i, f in enumerate(files)])
    # new distinct keys in sorted order get ids n_base..; dups -> -1
    all_new = pa.concat_tables(key_tbls)
    s = all_new.sort_by([("key", "ascending"), ("origin", "ascending"),
                         ("pos", "ascending")])
    keys = s["key"].to_pylist()
    origin = s["origin"].to_numpy(zero_copy_only=False)
    pos = s["pos"].to_numpy(zero_copy_only=False)
    ids_sorted = np.full(len(keys), -1, dtype=np.int64)
    next_id = n_base
    prev = None
    for i, k in enumerate(keys):
        if k in existing or k == prev:
            prev = k
            continue
        ids_sorted[i] = next_id
        next_id += 1
        prev = k
    n_new = next_id - n_base
    id_arrays = []
    counts = [pq.ParquetFile(f).metadata.num_rows for f in files]
    for i, c in enumerate(counts):
        arr = np.full(c, -1, dtype=np.int64)
        m = origin == i
        arr[pos[m]] = ids_sorted[m]
        id_arrays.append(arr)

    docs_dir = os.path.join(index_dir, "docs")
    base_files = len([f for f in os.listdir(docs_dir)
                      if f.endswith(".parquet")])
    ray.get([w for w, _ in [
        _finalize_file.remote(
            f, ids,
            os.path.join(docs_dir,
                         f"part-{base_files + i:05d}.parquet"))
        for i, (f, ids) in enumerate(zip(files, id_arrays))
    ]])

    # delta docmap (ids all > existing -> file-level pruning still works)
    new_doc_files = [os.path.join(docs_dir,
                                  f"part-{base_files + i:05d}.parquet")
                     for i in range(len(files))]
    delta_meta = pa.concat_tables([
        pq.read_table(p, columns=["doc_id", "repo", "path", "commit",
                                  "lang", "sha256"])
        for p in new_doc_files]).sort_by("doc_id")
    pq.write_table(delta_meta,
                   os.path.join(docmap_dir,
                                f"delta-{n_base:012d}.parquet"))

    # delta postings exchange + tokens
    delta_dir = os.path.join(index_dir, "postings_delta")
    import shutil

    shutil.rmtree(delta_dir, ignore_errors=True)
    os.makedirs(delta_dir, exist_ok=True)
    from functools import partial

    docs = rd.read_parquet(new_doc_files,
                           columns=["doc_id", "repo", "lang", "content"])
    # salts are computed over the union range [0, n_total): delta ids land
    # in the upper salt buckets, still contiguous non-decreasing runs
    n_total = n_base + n_new
    sums = docs.map_batches(
        partial(_emit_and_partition, cfg=cfg, n_docs=n_total,
                out_dir=delta_dir),
        batch_format="pyarrow", batch_size=cfg.tokenize_batch_size,
    ).sum(["rows", "tokens"])
    delta_tokens = int(sums["sum(tokens)"] or 0)

    # merge delta runs into segments
    fingerprint = mf._fingerprint(f"{delta_tag}@{n_base}", cfg)
    avgdl_build = stats["avgdl"] if stats["avgdl"] > 0 else 1.0
    ray.get([
        _merge_delta_part.remote(index_dir, delta_dir, p, fingerprint,
                                 cfg, avgdl_build, n_base, n_total)
        for p in range(cfg.num_partitions)
    ])

    # exact stats update; bounds bookkeeping for WAND safety
    total_tokens = int(stats["total_tokens"]) + delta_tokens
    min_bounds = min(stats.get("min_bounds_avgdl", stats["avgdl"]),
                     avgdl_build) or 1.0
    stats.update({
        "n_docs": n_total,
        "total_tokens": total_tokens,
        "avgdl": total_tokens / n_total if n_total else 0.0,
        "min_bounds_avgdl": min_bounds,
    })
    mf.write_stats(index_dir, stats)
    mf.write_meta(index_dir, {
        "fingerprint": fingerprint,
        "corpus_tag": delta_tag,
        "n_docs": n_total,
        "stats": stats,
        "timings": {"update_s": round(time.monotonic() - t0, 3)},
        "total_s": round(time.monotonic() - t0, 3),
    })
    return {"n_new_docs": n_new, "n_docs": n_total,
            "elapsed_s": round(time.monotonic() - t0, 3)}
