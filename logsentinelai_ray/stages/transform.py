"""Continuous pivot transform — the ES Transform API analog.

The reference streams chunk analyses into Elasticsearch and lets
Kibana/ES transforms maintain per-entity rollups; its own notion of
durable progress is the monitor's position state
(reference core/monitoring.py:94-112 `_initialize_file_state`,
:284 `read_from_position`) and per-chunk documents indexed by id
(core/elasticsearch.py:321-328). This module is the from-scratch batch
analog of an ES *pivot transform with a continuous checkpoint*: a
destination table of per-entity aggregates, maintained incrementally
from only the source delta.

Design (100-TB shape):

- **Destination = hash-partitioned parquet + a generation manifest.**
  ``dest/part-P-genG.parquet`` files hold the pivot rows whose
  ``hash(user_id) % P`` lands in partition P; ``manifest.json`` maps
  each partition to its current file and carries the checkpoint
  (``max_ts_us``). Readers see only manifest-listed files, so a crash
  mid-continue leaves orphan files, never a torn table.
- **Continue touches only affected partitions.** The delta (source rows
  with ``ts > checkpoint``) is pivoted distributed; only partitions
  owning a delta user are re-merged (old partition file + delta
  partials -> one groupby per partition, in parallel Ray tasks), the
  rest carry forward by manifest reference — no rewrite, no copy.
- **All pivot metrics are mergeable partials** (counts/sums add,
  min/max fold), so merge(old, delta) == full rebuild exactly — the
  invariant the tests pin.
- The delta pivot is collected per affected partition through the
  object store; at open-entity scale the same merge runs shard-side by
  writing the delta pivot hash-partitioned and joining per partition —
  the exchange is already partition-local, nothing entity-set-sized
  crosses the driver.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

PIVOT_COLS = ["user_id", "n_events", "sum_micro", "n_error",
              "first_ts_us", "last_ts_us"]


def _pivot_partial(t: pa.Table) -> pa.Table:
    """Per-batch mergeable pivot partials (one row per user in batch)."""
    micro = pc.cast(pc.round(pc.multiply(t["value"], 1e6), ndigits=0),
                    pa.int64())
    ts_us = pc.cast(t["ts"], pa.int64())
    is_err = pc.cast(pc.equal(t["event_type"], "error"), pa.int64())
    part = pa.table({"user_id": t["user_id"], "micro": micro,
                     "ts_us": ts_us, "err": is_err})
    agg = part.group_by("user_id").aggregate(
        [([], "count_all"), ("micro", "sum"), ("err", "sum"),
         ("ts_us", "min"), ("ts_us", "max")])
    return pa.table({
        "user_id": agg["user_id"],
        "n_events": pc.cast(agg["count_all"], pa.int64()),
        "sum_micro": pc.cast(agg["micro_sum"], pa.int64()),
        "n_error": pc.cast(agg["err_sum"], pa.int64()),
        "first_ts_us": agg["ts_us_min"],
        "last_ts_us": agg["ts_us_max"],
    })


def _merge_pivot(t: pa.Table) -> pa.Table:
    """Fold pivot partials: counts/sums add, first/last fold min/max —
    merge(old, delta) == pivot(old rows + delta rows) exactly."""
    agg = t.group_by("user_id").aggregate(
        [("n_events", "sum"), ("sum_micro", "sum"), ("n_error", "sum"),
         ("first_ts_us", "min"), ("last_ts_us", "max")])
    return pa.table({
        "user_id": agg["user_id"],
        "n_events": pc.cast(agg["n_events_sum"], pa.int64()),
        "sum_micro": pc.cast(agg["sum_micro_sum"], pa.int64()),
        "n_error": pc.cast(agg["n_error_sum"], pa.int64()),
        "first_ts_us": agg["first_ts_us_min"],
        "last_ts_us": agg["last_ts_us_max"],
    })


def pivot_events(ds) -> "ray.data.Dataset":
    """Distributed pivot: per-batch partials, then ONE user groupby of
    partial rows (never raw events) — the pre-aggregate-then-shuffle
    exchange."""
    from ray.data.aggregate import Max, Min, Sum

    return (ds.map_batches(_pivot_partial, batch_format="pyarrow")
            .groupby("user_id")
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Sum("sum_micro", alias_name="sum_micro"),
                       Sum("n_error", alias_name="n_error"),
                       Min("first_ts_us", alias_name="first_ts_us"),
                       Max("last_ts_us", alias_name="last_ts_us")))


def _partition_of(user_ids: np.ndarray, p: int) -> np.ndarray:
    # splitmix-style integer hash — deterministic, salt-free, and
    # uncorrelated with contiguous id ranges
    x = user_ids.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    return (x % np.uint64(p)).astype(np.int64)


def _manifest_path(dest_dir: str) -> str:
    return os.path.join(dest_dir, "manifest.json")


def _load_manifest(dest_dir: str) -> dict:
    with open(_manifest_path(dest_dir)) as f:
        return json.load(f)


def _store_manifest(dest_dir: str, man: dict) -> None:
    tmp = _manifest_path(dest_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1)
    os.replace(tmp, _manifest_path(dest_dir))  # atomic commit point


def _empty_pivot() -> pa.Table:
    return pa.table({
        "user_id": pa.array([], pa.int64()),
        "n_events": pa.array([], pa.int64()),
        "sum_micro": pa.array([], pa.int64()),
        "n_error": pa.array([], pa.int64()),
        "first_ts_us": pa.array([], pa.int64()),
        "last_ts_us": pa.array([], pa.int64()),
    })


@ray.remote(num_cpus=1)
def _write_partition(dest_dir: str, old_rel: str | None,
                     delta: pa.Table, out_rel: str) -> str:
    """Merge one partition: old partition file (if any) + delta partial
    rows -> one small groupby, written to a NEW generation file (the
    old file stays readable until the manifest flips)."""
    tables = [delta]
    if old_rel is not None:
        tables.append(pq.read_table(os.path.join(dest_dir, old_rel)))
    merged = _merge_pivot(pa.concat_tables(tables))
    merged = merged.sort_by("user_id")
    tmp = os.path.join(dest_dir, out_rel + ".tmp")
    pq.write_table(merged, tmp)
    os.replace(tmp, os.path.join(dest_dir, out_rel))
    return out_rel


def build_transform(ds, dest_dir: str, num_partitions: int = 16) -> dict:
    """Initial pivot-transform build: full pivot, hash-partitioned dest
    files, generation-0 manifest carrying the source checkpoint
    (max ts seen, in microseconds)."""
    os.makedirs(dest_dir, exist_ok=True)
    pivoted = pivot_events(ds)
    parts: dict[int, list[pa.Table]] = {}
    max_ts = -1
    for batch in pivoted.iter_batches(batch_format="pyarrow",
                                      batch_size=1 << 18):
        if batch.num_rows == 0:
            continue
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        pids = _partition_of(uid, num_partitions)
        max_ts = max(max_ts, int(pc.max(batch["last_ts_us"]).as_py()))
        for p in np.unique(pids):
            parts.setdefault(int(p), []).append(
                batch.filter(pa.array(pids == p)))
    man = {"gen": 0, "num_partitions": num_partitions,
           "max_ts_us": max_ts, "parts": {}}
    for p, tabs in parts.items():
        rel = f"part-{p:04d}-gen0.parquet"
        tbl = pa.concat_tables(tabs).sort_by("user_id")
        tmp = os.path.join(dest_dir, rel + ".tmp")
        pq.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(dest_dir, rel))
        man["parts"][str(p)] = rel
    _store_manifest(dest_dir, man)
    return man


def continue_transform(read_delta, dest_dir: str) -> dict:
    """One continuous-transform checkpoint round. ``read_delta`` is a
    callable ``(checkpoint_ts_us) -> Dataset`` returning ONLY source
    rows with ``ts > checkpoint`` — the query entry passes a
    ``read_parquet`` with that predicate pushed down, so row groups
    entirely behind the checkpoint never leave storage. The delta is
    pivoted distributed, then only the partitions owning a delta user
    re-merge (parallel Ray tasks) and the manifest flips atomically.
    Re-running after a crash (stale generation files, manifest not
    flipped) is safe: the merge reads only manifest-listed files and
    the flip is one os.replace. An empty delta is a no-op that leaves
    the manifest untouched."""
    man = _load_manifest(dest_dir)
    ckpt = int(man["max_ts_us"])
    p_count = int(man["num_partitions"])
    pivoted = pivot_events(read_delta(ckpt))
    by_part: dict[int, list[pa.Table]] = {}
    max_ts = ckpt
    for batch in pivoted.iter_batches(batch_format="pyarrow",
                                      batch_size=1 << 18):
        if batch.num_rows == 0:
            continue
        uid = batch["user_id"].to_numpy(zero_copy_only=False)
        pids = _partition_of(uid, p_count)
        max_ts = max(max_ts, int(pc.max(batch["last_ts_us"]).as_py()))
        for p in np.unique(pids):
            by_part.setdefault(int(p), []).append(
                batch.filter(pa.array(pids == p)))
    if not by_part:
        return man  # empty delta: checkpoint already covers the source
    gen = int(man["gen"]) + 1
    futures = {}
    for p, tabs in by_part.items():
        out_rel = f"part-{p:04d}-gen{gen}.parquet"
        futures[p] = _write_partition.remote(
            dest_dir, man["parts"].get(str(p)),
            pa.concat_tables(tabs), out_rel)
    written = {p: ray.get(f) for p, f in futures.items()}
    man = dict(man)
    man["gen"] = gen
    man["max_ts_us"] = max_ts
    man["parts"] = dict(man["parts"], **{str(p): rel
                                         for p, rel in written.items()})
    _store_manifest(dest_dir, man)
    return man


def read_transform(dest_dir: str) -> pa.Table:
    """Read the destination table as of the current manifest (never
    globs the directory — orphan generations are invisible)."""
    man = _load_manifest(dest_dir)
    tabs = [pq.read_table(os.path.join(dest_dir, rel))
            for rel in man["parts"].values()]
    if not tabs:
        return _empty_pivot()
    return pa.concat_tables(tabs).sort_by("user_id")
