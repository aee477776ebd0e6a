"""Resumable partitioned training-data export.

The brief's resumable-output contract made executable: one directory per
shard, a ``_SUCCESS`` marker (with the shard's row count) written only
after the shard's data is fully on disk, and a rerun that SKIPS every
marked shard — so a failed 100 TB export re-pays only the missing
shards, never the finished ones. (The reference's analog of durable
progress is the monitor position state, core/monitoring.py:94-112; an
index-side resume already exists in index/build.py — this is the
export-side counterpart.)

Crash model: markers are written AFTER the data (rename-atomic), so a
crash leaves either (a) an unmarked, possibly partial shard dir — the
rerun clears and rewrites it — or (b) a marked, complete shard — the
rerun skips it. Shard assignment is a deterministic multiplicative hash
of the key column, so every rerun routes rows identically.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pa_ds


def _marker(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, f"shard_id={shard}", "_SUCCESS")


def export_shards(ds, out_dir: str, num_shards: int = 8,
                  key: str = "doc_id") -> dict:
    """Export ``ds`` hive-partitioned by a deterministic shard hash of
    ``key``; resumable. Returns {"written": [...], "skipped": [...],
    "rows": {shard: n}}."""
    os.makedirs(out_dir, exist_ok=True)
    done = [s for s in range(num_shards)
            if os.path.exists(_marker(out_dir, s))]
    missing = [s for s in range(num_shards) if s not in set(done)]
    if missing:
        missing_set = set(missing)
        for s in missing:  # clear unmarked partials from a prior crash
            shutil.rmtree(os.path.join(out_dir, f"shard_id={s}"),
                          ignore_errors=True)

        def assign(t: pa.Table) -> pa.Table:
            k = t[key].to_numpy(zero_copy_only=False).astype(np.uint64)
            shard = ((k * np.uint64(2654435761))
                     % np.uint64(num_shards)).astype(np.int64)
            t = t.append_column("shard_id", pa.array(shard, pa.int64()))
            keep = np.isin(shard, np.fromiter(missing_set, np.int64))
            return t.filter(pa.array(keep))

        ds.map_batches(assign, batch_format="pyarrow") \
            .write_parquet(out_dir, partition_cols=["shard_id"])
    rows: dict[int, int] = {}
    for s in missing:
        files = _shard_files(out_dir, s)
        n = (pa_ds.dataset(files, format="parquet").count_rows()
             if files else 0)
        rows[s] = int(n)
        tmp = _marker(out_dir, s) + ".tmp"
        os.makedirs(os.path.dirname(tmp), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump({"rows": int(n)}, f)
        os.replace(tmp, _marker(out_dir, s))  # marker AFTER the data
    for s in done:
        with open(_marker(out_dir, s)) as f:
            rows[s] = int(json.load(f)["rows"])
    return {"written": missing, "skipped": done, "rows": rows}


def _shard_files(out_dir: str, shard: int) -> list[str]:
    sdir = os.path.join(out_dir, f"shard_id={shard}")
    if not os.path.isdir(sdir):
        return []
    return sorted(os.path.join(sdir, f) for f in os.listdir(sdir)
                  if f.endswith(".parquet"))


def read_shards(out_dir: str) -> pa.Table:
    """Read back ONLY marked shards (unmarked dirs are in-progress or
    crashed partials and must stay invisible to consumers)."""
    tabs = []
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("shard_id="):
            continue
        s = int(name.split("=", 1)[1])
        if not os.path.exists(_marker(out_dir, s)):
            continue
        files = _shard_files(out_dir, s)
        if files:
            tabs.append(pa_ds.dataset(files, format="parquet")
                        .to_table())
    if not tabs:
        return pa.table({})
    return pa.concat_tables(tabs)
