"""Point-in-time (PIT) search contract (ES _pit analog).

A ``SearchEngine`` constructed before ``update_index`` is an open PIT:
its IndexShard actors hold the pre-update segments in memory and its
docmap dataset pinned the pre-update file list, so

1. searches through it AFTER the delta merge are bit-identical to the
   searches it served BEFORE the merge (the frozen view), and
2. a fresh engine over the same directory sees base+delta and equals an
   engine over a from-scratch full build (the live view).
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from logsentinelai_ray.config import CorpusConfig, IndexConfig
from logsentinelai_ray.corpus import generate_corpus
from logsentinelai_ray.index.build import build_index
from logsentinelai_ray.index.update import update_index
from logsentinelai_ray.query.shards import SearchEngine

QUERIES = ["authentication failure error", "sort merge window",
           "import spark"]


def _results(eng, q):
    r = eng.search(q, k=10, with_meta=False)
    return list(zip(r["doc_id"].to_pylist(), r["score"].to_pylist()))


def test_pit_view_frozen_and_live_view_advances(ray_session, tmp_path):
    tbl = generate_corpus(CorpusConfig(n_docs=400))
    base = tbl.slice(0, 250)
    delta = tbl.slice(250)
    base_dir, delta_dir = tmp_path / "base", tmp_path / "delta"
    os.makedirs(base_dir)
    os.makedirs(delta_dir)
    pq.write_table(base, base_dir / "part-0.parquet")
    pq.write_table(delta, delta_dir / "part-0.parquet")
    cfg = IndexConfig(num_partitions=4, salt_buckets=2)

    idx = str(tmp_path / "idx")
    build_index(str(base_dir), idx, cfg, corpus_tag="pit-base")
    pit = SearchEngine(idx, num_shards=2)           # PIT opened
    before = {q: _results(pit, q) for q in QUERIES}

    update_index(str(delta_dir), idx, cfg, delta_tag="pit-delta")

    # 1. the PIT view is frozen: bit-identical results after the merge
    for q in QUERIES:
        assert _results(pit, q) == before[q]

    # 2. the live view advances and equals a from-scratch full build.
    # Incremental ids are rank-offset-appended while a full rebuild
    # re-ranks globally, so identity is (sha256, score), not doc_id.
    def _meta_results(eng, q):
        r = eng.search(q, k=10)
        return list(zip(r["sha256"].to_pylist(), r["score"].to_pylist()))

    live = SearchEngine(idx, num_shards=2)
    full_idx = str(tmp_path / "idx_full")
    build_index(rd.from_arrow(tbl), full_idx, cfg, corpus_tag="pit-full")
    full = SearchEngine(full_idx, num_shards=2)
    saw_hit = False
    for q in QUERIES:
        assert _meta_results(live, q) == _meta_results(full, q)
        if before[q]:  # stats change with the delta, so scores must move
            assert _results(live, q) != before[q]
            saw_hit = True
    assert saw_hit

    # 3. PIT metadata join still serves pre-update docs with integrity
    r = pit.search(QUERIES[0], k=5)
    assert r.num_rows > 0
    assert set(r["doc_id"].to_pylist()) <= set(
        base["doc_id"].to_pylist() if "doc_id" in base.column_names
        else range(250))
