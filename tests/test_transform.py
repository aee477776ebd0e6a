"""Continuous pivot transform (stages/transform.py): incremental
continuation == full rebuild, checkpoint idempotence, manifest-only
reads, partition-local rewrites."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest

from logsentinelai_ray.stages.transform import (
    _partition_of, build_transform, continue_transform, read_transform)


def _events(n: int, seed: int) -> pa.Table:
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(1_700_000_000_000_000,
                              1_700_100_000_000_000, n))
    return pa.table({
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 40, n), pa.int64()),
        "event_type": pa.array(
            rng.choice(["view", "click", "error"], n).tolist()),
        "value": pa.array(rng.uniform(0, 50, n), pa.float64()),
    })


def _brute_pivot(t: pa.Table) -> dict:
    df = t.to_pandas()
    df["micro"] = (df["value"] * 1e6).round().astype("int64")
    df["ts_us"] = df["ts"].astype("int64")
    g = df.groupby("user_id")
    out = {}
    for u, grp in g:
        out[int(u)] = (len(grp), int(grp["micro"].sum()),
                       int((grp["event_type"] == "error").sum()),
                       int(grp["ts_us"].min()), int(grp["ts_us"].max()))
    return out


def _as_dict(t: pa.Table) -> dict:
    return {int(r["user_id"]): (r["n_events"], r["sum_micro"],
                                r["n_error"], r["first_ts_us"],
                                r["last_ts_us"])
            for r in t.to_pylist()}


@pytest.fixture()
def split_tables():
    full = _events(4000, seed=7)
    ts = full["ts"].to_numpy(zero_copy_only=False).astype("int64")
    cut = int(np.median(ts))
    first = full.filter(pa.array(ts <= cut))
    delta = full.filter(pa.array(ts > cut))
    return full, first, delta


def test_continue_equals_full_rebuild(ray_session, split_tables,
                                      tmp_path):
    import ray.data as rd

    full, first, delta = split_tables
    dest = str(tmp_path / "dest")
    build_transform(rd.from_arrow(first), dest, num_partitions=4)
    # the continuation only ever sees rows past the checkpoint
    man0 = json.load(open(os.path.join(dest, "manifest.json")))
    delta_ts = delta["ts"].to_numpy(zero_copy_only=False).astype("int64")
    assert (delta_ts > man0["max_ts_us"]).all()
    continue_transform(lambda ck: rd.from_arrow(delta), dest)
    assert _as_dict(read_transform(dest)) == _brute_pivot(full)


def test_continue_is_checkpoint_idempotent(ray_session, split_tables,
                                           tmp_path):
    """A second round with the SAME source is an empty delta: manifest
    untouched, table unchanged — the crash-retry contract."""
    import ray.data as rd

    full, first, delta = split_tables
    dest = str(tmp_path / "dest")
    build_transform(rd.from_arrow(first), dest, num_partitions=4)

    def read_delta(ck):
        ts = delta["ts"].to_numpy(zero_copy_only=False).astype("int64")
        return rd.from_arrow(delta.filter(pa.array(ts > ck)))

    man1 = continue_transform(read_delta, dest)
    before = _as_dict(read_transform(dest))
    man2 = continue_transform(read_delta, dest)
    assert man2 == man1
    assert _as_dict(read_transform(dest)) == before


def test_reader_ignores_orphan_generations(ray_session, split_tables,
                                           tmp_path):
    """A crash between partition writes and the manifest flip leaves
    stale generation files — readers must never see them."""
    import pyarrow.parquet as pq
    import ray.data as rd

    full, first, _ = split_tables
    dest = str(tmp_path / "dest")
    build_transform(rd.from_arrow(first), dest, num_partitions=4)
    before = _as_dict(read_transform(dest))
    # plant an orphan future-generation file with garbage rows
    orphan = pa.table({
        "user_id": pa.array([999], pa.int64()),
        "n_events": pa.array([1], pa.int64()),
        "sum_micro": pa.array([1], pa.int64()),
        "n_error": pa.array([0], pa.int64()),
        "first_ts_us": pa.array([0], pa.int64()),
        "last_ts_us": pa.array([0], pa.int64()),
    })
    pq.write_table(orphan, os.path.join(dest, "part-0001-gen9.parquet"))
    assert _as_dict(read_transform(dest)) == before


def test_continue_rewrites_only_affected_partitions(ray_session,
                                                    tmp_path):
    import ray.data as rd

    base = _events(3000, seed=11)
    dest = str(tmp_path / "dest")
    build_transform(rd.from_arrow(base), dest, num_partitions=8)
    man0 = json.load(open(os.path.join(dest, "manifest.json")))
    # a one-user delta strictly past the checkpoint
    u = 7
    delta = pa.table({
        "ts": pa.array([man0["max_ts_us"] + 1000], pa.timestamp("us")),
        "user_id": pa.array([u], pa.int64()),
        "event_type": pa.array(["error"]),
        "value": pa.array([1.0], pa.float64()),
    })
    continue_transform(lambda ck: rd.from_arrow(delta), dest)
    man1 = json.load(open(os.path.join(dest, "manifest.json")))
    hot = int(_partition_of(np.array([u], dtype=np.int64),
                            man0["num_partitions"])[0])
    assert man1["gen"] == man0["gen"] + 1
    for p, rel in man1["parts"].items():
        if int(p) == hot:
            assert rel.endswith(f"gen{man1['gen']}.parquet")
        else:
            assert rel == man0["parts"][p]  # carried forward, no rewrite
    # and the merged row reflects the delta exactly
    got = _as_dict(read_transform(dest))
    exp = _brute_pivot(pa.concat_tables(
        [base.cast(delta.schema), delta]))
    assert got == exp


def test_transform_random_split_property(ray_session, tmp_path):
    """Property: for ANY checkpoint split of the source, build(first) +
    continue(rest) == brute-force pivot of everything. Uses a seeded
    sweep of split quantiles rather than hypothesis-driven Ray calls
    (one Ray session per example would dominate the suite)."""
    import ray.data as rd

    full = _events(2500, seed=21)
    ts = full["ts"].to_numpy(zero_copy_only=False).astype("int64")
    exp = _brute_pivot(full)
    for q in (0.0, 0.1, 0.5, 0.9, 1.0):
        cut = int(np.quantile(ts, q)) if q > 0 else int(ts.min()) - 1
        first = full.filter(pa.array(ts <= cut))
        rest = full.filter(pa.array(ts > cut))
        dest = str(tmp_path / f"dest_{int(q * 10)}")
        if first.num_rows == 0:
            # build_transform needs at least one row to checkpoint; an
            # empty initial build is the degenerate all-delta case
            first = full.slice(0, 1)
            t0 = int(ts.min())
            rest = full.filter(pa.array(ts > t0)) if ts.size else full
            build_transform(rd.from_arrow(first), dest,
                            num_partitions=4)
            continue_transform(lambda ck: rd.from_arrow(
                full.filter(pa.array(ts > ck))), dest)
        else:
            build_transform(rd.from_arrow(first), dest,
                            num_partitions=4)
            continue_transform(lambda ck: rd.from_arrow(
                rest.filter(pa.array(
                    rest["ts"].to_numpy(zero_copy_only=False)
                    .astype("int64") > ck))), dest)
        assert _as_dict(read_transform(dest)) == exp, q


def test_eql_strict_vs_local_greedy(ray_session, tmp_path):
    """Distributed strict EQL == a pure-python greedy over the same
    random events; strict count never exceeds the all-pairs count."""
    import pyarrow.parquet as pq

    from logsentinelai_ray.pipelines.queries import (_EQL_SPAN_US,
                                                     q_eql_sequence,
                                                     q_eql_sequence_strict)

    rng = np.random.default_rng(17)
    n = 3000
    tbl = pa.table({
        "ts": pa.array(np.sort(rng.integers(0, 10**11, n)),
                       pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 30, n), pa.int64()),
        "event_type": pa.array(rng.choice(
            ["error", "purchase", "view"], n).tolist()),
        "value": pa.array(rng.uniform(0, 5, n), pa.float64()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    strict = q_eql_sequence_strict(str(d))
    loose = q_eql_sequence(str(d))
    sd = dict(zip(strict["user_id"].to_pylist(),
                  strict["n_sequences"].to_pylist()))
    ld = dict(zip(loose["user_id"].to_pylist(),
                  loose["n_sequences"].to_pylist()))
    # local greedy reference
    df = tbl.to_pandas()
    df["ts_us"] = df["ts"].astype("int64")
    exp = {}
    for u, g in df.groupby("user_id"):
        errs = np.sort(g[g.event_type == "error"]["ts_us"].to_numpy())
        purs = np.sort(g[g.event_type == "purchase"]["ts_us"].to_numpy())
        c = j = 0
        for e in errs:
            while j < purs.size and purs[j] <= e:
                j += 1
            if j < purs.size and purs[j] <= e + _EQL_SPAN_US:
                c += 1
                j += 1
        if c:
            exp[int(u)] = c
    assert sd == exp
    for u, c in sd.items():
        assert c <= ld.get(u, 0)  # strict consumes, all-pairs doesn't
