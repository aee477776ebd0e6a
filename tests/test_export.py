"""Resumable partitioned export (stages/export.py): skip-marked-shards
resume, crash-partial invisibility, rerun == fresh export."""

import os
import shutil

import numpy as np
import pyarrow as pa

from logsentinelai_ray.stages.export import (_marker, export_shards,
                                             read_shards)


def _tbl(n: int) -> pa.Table:
    return pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "payload": pa.array([f"row{i}" for i in range(n)]),
    })


def _ids(t: pa.Table) -> list[int]:
    return sorted(t["doc_id"].to_pylist()) if t.num_rows else []


def test_export_then_full_resume_is_noop(ray_session, tmp_path):
    import ray.data as rd

    out = str(tmp_path / "out")
    r1 = export_shards(rd.from_arrow(_tbl(500)), out, num_shards=8)
    assert sorted(r1["written"]) == list(range(8))
    assert sum(r1["rows"].values()) == 500
    assert _ids(read_shards(out)) == list(range(500))
    # second run with everything marked writes NOTHING
    r2 = export_shards(rd.from_arrow(_tbl(500)), out, num_shards=8)
    assert r2["written"] == [] and sorted(r2["skipped"]) == list(range(8))
    assert r2["rows"] == r1["rows"]


def test_export_resume_rewrites_only_crashed_shard(ray_session,
                                                   tmp_path):
    import ray.data as rd

    out = str(tmp_path / "out")
    export_shards(rd.from_arrow(_tbl(400)), out, num_shards=6)
    # simulate a crash on shard 3: data gone mid-write, no marker
    shutil.rmtree(os.path.join(out, "shard_id=3"))
    # unmarked partials must be invisible to readers
    partial_ids = _ids(read_shards(out))
    assert len(partial_ids) < 400
    before = {s: os.path.getmtime(_marker(out, s))
              for s in range(6) if s != 3}
    r = export_shards(rd.from_arrow(_tbl(400)), out, num_shards=6)
    assert r["written"] == [3]
    assert _ids(read_shards(out)) == list(range(400))
    # untouched shards kept their original markers
    for s, mt in before.items():
        assert os.path.getmtime(_marker(out, s)) == mt


def test_export_unmarked_partial_is_cleared(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    out = str(tmp_path / "out")
    # plant a bogus partial (crash leftover) in shard 0 BEFORE any run
    os.makedirs(os.path.join(out, "shard_id=0"))
    pq.write_table(pa.table({"doc_id": pa.array([999_999], pa.int64()),
                             "payload": pa.array(["junk"])}),
                   os.path.join(out, "shard_id=0", "junk.parquet"))
    export_shards(rd.from_arrow(_tbl(300)), out, num_shards=4)
    ids = _ids(read_shards(out))
    assert ids == list(range(300))  # the junk row is gone
