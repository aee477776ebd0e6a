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


def _add_part(t: pa.Table, p_count: int) -> pa.Table:
    uid = t["user_id"].to_numpy(zero_copy_only=False)
    return t.append_column(
        "part", pa.array(_partition_of(uid, p_count), pa.int64()))


def _write_rounds(dest_dir: str, pivoted, p_count: int, gen: int,
                  old_parts: dict[str, str]) -> list[dict]:
    """Shard-side partition writer: the pivot rows are grouped by their
    hash partition and EACH GROUP TASK merges its old partition file
    (if any) and writes the new generation file where the group lives —
    nothing entity-set-sized ever crosses the driver; only one
    (part, rel, max_ts) stat row per partition comes back. On a
    multi-node cluster ``dest_dir`` is shared storage (the same
    contract as every Ray Data write_parquet sink)."""

    def write_part(g: pa.Table) -> pa.Table:
        p = int(g["part"][0].as_py())
        delta_max = int(pc.max(g["last_ts_us"]).as_py())
        tables = [g.drop_columns(["part"])]
        old_rel = old_parts.get(str(p))
        if old_rel is not None:
            tables.append(pq.read_table(os.path.join(dest_dir, old_rel)))
        merged = _merge_pivot(pa.concat_tables(tables)).sort_by("user_id")
        rel = f"part-{p:04d}-gen{gen}.parquet"
        tmp = os.path.join(dest_dir, rel + ".tmp")
        pq.write_table(merged, tmp)
        os.replace(tmp, os.path.join(dest_dir, rel))
        return pa.table({"part": pa.array([p], pa.int64()),
                         "rel": pa.array([rel], pa.string()),
                         "max_ts": pa.array([delta_max], pa.int64())})

    from functools import partial as _p

    stats = (pivoted
             .map_batches(_p(_add_part, p_count=p_count),
                          batch_format="pyarrow")
             .groupby("part")
             .map_groups(write_part, batch_format="pyarrow"))
    return [r for b in stats.iter_batches(batch_format="pyarrow",
                                          batch_size=1 << 16)
            for r in b.to_pylist()]  # #partitions rows, never data-sized


def build_transform(ds, dest_dir: str, num_partitions: int = 16) -> dict:
    """Initial pivot-transform build: full pivot, hash-partitioned dest
    files written shard-side, generation-0 manifest carrying the source
    checkpoint (max ts seen, in microseconds)."""
    os.makedirs(dest_dir, exist_ok=True)
    rows = _write_rounds(dest_dir, pivot_events(ds), num_partitions,
                         gen=0, old_parts={})
    man = {"gen": 0, "num_partitions": num_partitions,
           "max_ts_us": max((r["max_ts"] for r in rows), default=-1),
           "parts": {str(r["part"]): r["rel"] for r in rows}}
    _store_manifest(dest_dir, man)
    return man


def continue_transform(read_delta, dest_dir: str) -> dict:
    """One continuous-transform checkpoint round. ``read_delta`` is a
    callable ``(checkpoint_ts_us) -> Dataset`` returning ONLY source
    rows with ``ts > checkpoint`` — the query entry passes a
    ``read_parquet`` with that predicate pushed down, so row groups
    entirely behind the checkpoint never leave storage. The delta is
    pivoted distributed, and only the partitions owning a delta user
    re-merge — each inside the groupby task that owns it (shard-side
    read-old + merge + write-new); unaffected partitions carry forward
    by manifest reference. The manifest flips atomically afterwards.
    Re-running after a crash (stale generation files, manifest not
    flipped) is safe: the merge reads only manifest-listed files and
    the flip is one os.replace. An empty delta is a no-op that leaves
    the manifest untouched."""
    man = _load_manifest(dest_dir)
    ckpt = int(man["max_ts_us"])
    gen = int(man["gen"]) + 1
    rows = _write_rounds(dest_dir, pivot_events(read_delta(ckpt)),
                         int(man["num_partitions"]), gen=gen,
                         old_parts=man["parts"])
    if not rows:
        return man  # empty delta: checkpoint already covers the source
    man = dict(man)
    man["gen"] = gen
    man["max_ts_us"] = max(ckpt, max(r["max_ts"] for r in rows))
    man["parts"] = dict(man["parts"],
                        **{str(r["part"]): r["rel"] for r in rows})
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
