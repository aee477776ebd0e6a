"""Incremental re-index (SURVEY §2.10 batch analog): delta segments must
yield rank-identical results to an oracle over the union corpus, with
cross-delta duplicates dropped and WAND bounds kept safe under the updated
collection stats."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import QUERY_SET


@pytest.fixture(scope="module")
def updated_index(ray_session, tmp_path_factory):
    from logsentinelai_ray.config import CorpusConfig, IndexConfig
    from logsentinelai_ray.corpus import generate_corpus
    from logsentinelai_ray.index.build import build_index
    from logsentinelai_ray.index.update import update_index

    root = tmp_path_factory.mktemp("incr")
    base_tbl = generate_corpus(CorpusConfig(n_docs=200, seed=11))
    delta_tbl = generate_corpus(CorpusConfig(n_docs=100, seed=22))
    # cross-delta duplicates: replay some base rows inside the delta
    delta_tbl = pa.concat_tables([delta_tbl, base_tbl.slice(0, 7)])

    base_dir, delta_dir = str(root / "base"), str(root / "delta")
    os.makedirs(base_dir)
    os.makedirs(delta_dir)
    pq.write_table(base_tbl, f"{base_dir}/part-0.parquet")
    pq.write_table(delta_tbl, f"{delta_dir}/part-0.parquet")

    cfg = IndexConfig(num_partitions=8, salt_buckets=2, block_size=32)
    idx = str(root / "idx")
    meta = build_index(base_dir, idx, cfg, corpus_tag="base")
    n_base = meta["n_docs"]
    res = update_index(delta_dir, idx, cfg, delta_tag="d1")
    return idx, cfg, n_base, res, base_tbl, delta_tbl


def test_delta_dedup_counts(updated_index):
    idx, cfg, n_base, res, base_tbl, delta_tbl = updated_index
    all_keys = {k for t in (base_tbl, delta_tbl)
                for k in zip(t["repo"].to_pylist(), t["path"].to_pylist(),
                             t["commit"].to_pylist())}
    assert res["n_docs"] == len(all_keys)
    assert res["n_new_docs"] == res["n_docs"] - n_base


def test_updated_stats_match_docs(updated_index):
    from logsentinelai_ray.analysis import tokenize_py
    from logsentinelai_ray.index import manifest as mf

    idx, cfg, *_ = updated_index
    stats = mf.read_stats(idx)
    docs = pq.read_table(os.path.join(idx, "docs"))
    total = sum(len(tokenize_py(c, cfg.max_token_len))
                for c in docs["content"].to_pylist())
    assert stats["n_docs"] == docs.num_rows
    assert stats["total_tokens"] == total
    assert stats["avgdl"] == pytest.approx(total / docs.num_rows)
    assert "min_bounds_avgdl" in stats


@pytest.mark.parametrize("strategy", ["taat", "wand"])
def test_incremental_rank_identity(updated_index, strategy):
    from logsentinelai_ray.query.bm25 import BM25Oracle
    from logsentinelai_ray.query.shards import SearchEngine

    idx, cfg, *_ = updated_index
    docs = pq.read_table(os.path.join(idx, "docs"))
    pairs = list(zip(docs["doc_id"].to_pylist(),
                     docs["content"].to_pylist()))
    attrs = {d: {"lang": l} for d, l in zip(docs["doc_id"].to_pylist(),
                                            docs["lang"].to_pylist())}
    oracle = BM25Oracle(pairs, attrs, cfg)
    eng = SearchEngine(idx, num_shards=3)
    try:
        for q in QUERY_SET:
            got = eng.search(q, k=25, with_meta=False, strategy=strategy)
            exp = oracle.search(q, k=25)
            assert got["doc_id"].to_pylist() == [d for d, _ in exp], \
                (q, strategy)
            assert got["score"].to_pylist() == [s for _, s in exp], \
                (q, strategy)
        flt = eng.search("error", k=10, filters={"lang": "python"},
                         with_meta=False, strategy=strategy)
        expf = oracle.search("error", k=10, filters={"lang": "python"})
        assert flt["doc_id"].to_pylist() == [d for d, _ in expf]
    finally:
        eng.shutdown()


def test_docmap_covers_delta(updated_index):
    idx, *_ = updated_index
    docmap = pq.read_table(os.path.join(idx, "docmap"))
    docs = pq.read_table(os.path.join(idx, "docs"))
    assert sorted(docmap["doc_id"].to_pylist()) == \
        sorted(docs["doc_id"].to_pylist())
