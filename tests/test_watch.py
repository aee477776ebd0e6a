"""Continuous ingest (reference core/monitoring.py:301-438 analog): the
watcher must pick up dropped files round by round, stay rank-identical to
a from-scratch rebuild after every round, load-shed to max_batch_files,
and resume a crashed round from the pending marker."""

import os

import pyarrow.parquet as pq
import pytest

from tests.conftest import QUERY_SET


def _search_ids(index_dir, queries, k=15):
    """Ranked (document-key, score) lists — doc_id numbering differs
    between an incremental index and a from-scratch rebuild (new keys
    rank after existing ones), so identity is judged on the documents
    themselves."""
    from logsentinelai_ray.query.shards import SearchEngine

    eng = SearchEngine(index_dir, num_shards=2)
    try:
        out = {}
        for q in queries:
            r = eng.search(q, k=k)
            out[q] = list(zip(r["sha256"].to_pylist(),
                              r["score"].to_pylist()))
        return out
    finally:
        eng.shutdown()


def test_watcher_ingests_deltas_rank_identical(ray_session,
                                               tmp_path_factory):
    from logsentinelai_ray.config import CorpusConfig, IndexConfig
    from logsentinelai_ray.corpus import generate_corpus
    from logsentinelai_ray.index.build import build_index
    from logsentinelai_ray.index.watch import CorpusWatcher

    root = tmp_path_factory.mktemp("watch")
    live = str(root / "live")
    os.makedirs(live)
    cfg = IndexConfig(num_partitions=8, salt_buckets=2, block_size=32)

    base = generate_corpus(CorpusConfig(n_docs=150, seed=51))
    pq.write_table(base, f"{live}/000-base.parquet")
    idx = str(root / "idx")
    build_index(live, idx, cfg, corpus_tag="base")

    watcher = CorpusWatcher(live, idx, cfg)
    # frontier starts empty; mark the base file as already ingested
    from logsentinelai_ray.index.watch import _write_frontier
    _write_frontier(idx, [os.path.abspath(f"{live}/000-base.parquet")])
    assert watcher.poll_once() is None  # nothing new yet

    deltas = [generate_corpus(CorpusConfig(n_docs=60, seed=s))
              for s in (52, 53, 54)]
    tables_so_far = [base]
    queries = QUERY_SET[:4]
    for i, d in enumerate(deltas):
        pq.write_table(d, f"{live}/{i + 1:03d}-delta.parquet")
        res = watcher.poll_once()
        assert res is not None and res["n_new_docs"] > 0
        tables_so_far.append(d)

        # full rebuild over everything dropped so far → rank-identical
        rebuild_dir = str(root / f"rebuild{i}")
        build_index(live, rebuild_dir, cfg, corpus_tag=f"rb{i}")
        got = _search_ids(idx, queries)
        exp = _search_ids(rebuild_dir, queries)
        assert got == exp, f"round {i} diverged from full rebuild"


def test_watcher_load_shed_and_crash_resume(ray_session, tmp_path_factory):
    import logsentinelai_ray.index.update as upd
    from logsentinelai_ray.config import CorpusConfig, IndexConfig
    from logsentinelai_ray.corpus import generate_corpus
    from logsentinelai_ray.index.build import build_index
    from logsentinelai_ray.index.watch import CorpusWatcher, read_frontier

    root = tmp_path_factory.mktemp("shed")
    live = str(root / "live")
    os.makedirs(live)
    cfg = IndexConfig(num_partitions=4, salt_buckets=2, block_size=32)
    pq.write_table(generate_corpus(CorpusConfig(n_docs=80, seed=61)),
                   f"{live}/000.parquet")
    idx = str(root / "idx")
    build_index(f"{live}/000.parquet", idx, cfg, corpus_tag="b")
    watcher = CorpusWatcher(live, idx, cfg, max_batch_files=1)
    from logsentinelai_ray.index.watch import _write_frontier
    _write_frontier(idx, [os.path.abspath(f"{live}/000.parquet")])

    for s in (62, 63):
        pq.write_table(generate_corpus(CorpusConfig(n_docs=30, seed=s)),
                       f"{live}/{s}.parquet")
    # load shed: one file per round
    assert len(watcher.pending_files()) == 2
    r1 = watcher.poll_once()
    assert r1["n_new_docs"] == 30
    assert len(watcher.pending_files()) == 1

    # crash the second round mid-merge, then resume via the watcher
    orig = upd._merge_delta_part
    state = {"n": 0}

    class Boom:
        def remote(self, *a, **k):
            if state["n"] >= 1:
                raise RuntimeError("simulated crash")
            state["n"] += 1
            import ray as _ray
            ref = orig.remote(*a, **k)
            _ray.get(ref)
            return ref

    upd._merge_delta_part = Boom()
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            watcher.poll_once()
    finally:
        upd._merge_delta_part = orig
    # frontier not advanced by the crashed round
    assert len(watcher.pending_files()) == 1
    r2 = watcher.poll_once()  # resumes from the pending marker
    assert r2["n_new_docs"] == 30
    assert watcher.poll_once() is None
    assert len(read_frontier(idx)) == 3

    # index consistent: docmap covers all docs exactly once
    docmap = pq.read_table(os.path.join(idx, "docmap"))
    assert sorted(docmap["doc_id"].to_pylist()) == list(range(140))


def test_watcher_run_loop_stops_on_idle(ray_session, tmp_path_factory):
    from logsentinelai_ray.config import CorpusConfig, IndexConfig
    from logsentinelai_ray.corpus import generate_corpus
    from logsentinelai_ray.index.build import build_index
    from logsentinelai_ray.index.watch import CorpusWatcher, _write_frontier

    root = tmp_path_factory.mktemp("loop")
    live = str(root / "live")
    os.makedirs(live)
    cfg = IndexConfig(num_partitions=4, salt_buckets=2, block_size=32)
    pq.write_table(generate_corpus(CorpusConfig(n_docs=50, seed=71)),
                   f"{live}/000.parquet")
    idx = str(root / "idx")
    build_index(f"{live}/000.parquet", idx, cfg, corpus_tag="b")
    watcher = CorpusWatcher(live, idx, cfg)
    _write_frontier(idx, [os.path.abspath(f"{live}/000.parquet")])
    pq.write_table(generate_corpus(CorpusConfig(n_docs=20, seed=72)),
                   f"{live}/001.parquet")
    results = watcher.run(poll_interval=0.05, idle_rounds=2)
    assert len(results) == 1 and results[0]["n_new_docs"] == 20


def test_watcher_timeout_flushes_partial_window(ray_session,
                                                tmp_path_factory):
    """min_batch_files buffers a sub-threshold delta; the pending
    timeout must flush it within one round (reference
    core/monitoring.py:326-366 chunk_pending_timeout), rank-identical
    to a from-scratch rebuild over the same files."""
    import time

    import ray.data as rd

    from logsentinelai_ray.config import CorpusConfig, IndexConfig
    from logsentinelai_ray.corpus import generate_corpus
    from logsentinelai_ray.index.build import build_index
    from logsentinelai_ray.index.watch import CorpusWatcher, _write_frontier

    root = tmp_path_factory.mktemp("watch_to")
    live = str(root / "live")
    os.makedirs(live)
    cfg = IndexConfig(num_partitions=8, salt_buckets=2, block_size=32)

    base = generate_corpus(CorpusConfig(n_docs=120, seed=61))
    pq.write_table(base, f"{live}/000-base.parquet")
    idx = str(root / "idx")
    build_index(live, idx, cfg, corpus_tag="base")
    _write_frontier(idx, [os.path.abspath(f"{live}/000-base.parquet")])

    watcher = CorpusWatcher(live, idx, cfg, min_batch_files=3,
                            pending_timeout_s=0.8)
    late = generate_corpus(CorpusConfig(n_docs=40, seed=62))
    pq.write_table(late, f"{live}/001-late.parquet")
    # one lone file < min_batch_files: buffered, not ingested
    assert watcher.poll_once() is None
    assert watcher.poll_once() is None  # still inside the timeout
    time.sleep(0.9)
    res = watcher.poll_once()  # deadline passed: partial-window flush
    assert res is not None
    assert watcher.pending_files() == []

    # rank identity vs a from-scratch rebuild over base + late
    import pyarrow as pa

    rebuilt = str(root / "rebuilt")
    build_index(rd.from_arrow(pa.concat_tables([base, late])), rebuilt,
                cfg, corpus_tag="rebuild")
    queries = QUERY_SET[:3]
    assert _search_ids(idx, queries) == _search_ids(rebuilt, queries)

    # and an empty poll resets the buffer timer state
    assert watcher.poll_once() is None
    assert watcher._pending_since is None


def test_rollover_watcher_bounded_generations(ray_session, tmp_path):
    """Files dripped into a watched dir land in generation indexes
    bounded by max_docs; the alias search over the final state equals a
    merged single-index build, and a replayed round is a no-op."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from logsentinelai_ray.config import CorpusConfig, IndexConfig
    from logsentinelai_ray.corpus import generate_corpus
    from logsentinelai_ray.index.build import build_index
    from logsentinelai_ray.index.rollover import RolloverIndex
    from logsentinelai_ray.index.watch import RolloverWatcher
    from logsentinelai_ray.query.shards import SearchEngine

    tbl = generate_corpus(CorpusConfig(n_docs=180))
    seen, keep = set(), []
    for i, c in enumerate(tbl["content"].to_pylist()):
        if c not in seen:
            seen.add(c)
            keep.append(i)
    tbl = tbl.take(keep).sort_by("repo")
    n = tbl.num_rows
    third = n // 3

    corpus = tmp_path / "drip"
    corpus.mkdir()
    cfg = IndexConfig(num_partitions=4, salt_buckets=2)
    roll = RolloverIndex(str(tmp_path / "alias"), cfg, max_docs=third,
                         alias="w")
    w = RolloverWatcher(str(corpus), roll)

    assert w.poll_once() is None  # empty dir
    for i in range(3):
        lo = i * third
        pq.write_table(tbl.slice(lo, third if i < 2 else n - lo),
                       str(corpus / f"f{i}.parquet"))
        res = w.poll_once()
        assert res is not None and res["files"] == 1
    assert w.poll_once() is None  # frontier caught up
    # every generation respects the write condition: sealed at max_docs
    for g in roll.meta["generations"][:-1]:
        assert g["sealed"] and g["n_docs"] >= third

    # replaying a committed round's tag is a no-op
    gens_before = [dict(g) for g in roll.meta["generations"]]
    roll.ingest(str(corpus / "f0.parquet"), tag="watch-000000")
    assert roll.meta["generations"] == gens_before

    merged_dir = str(tmp_path / "merged")
    build_index(rd.from_arrow(tbl), merged_dir, cfg, corpus_tag="m")
    merged = SearchEngine(merged_dir, num_shards=2)
    a = roll.search("error merge window", k=10)
    b = merged.search("error merge window", k=10, with_meta=False)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()
    roll.shutdown()
    merged.shutdown()
