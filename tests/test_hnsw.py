"""Per-segment HNSW (ann/hnsw.py): recall vs exact brute force,
build determinism, and graph invariants."""

import numpy as np
import pyarrow as pa
import pytest

from logsentinelai_ray.ann.hnsw import (
    SegmentSearcher,
    _level_of,
    _normalize,
    _search_layer,
    build_hnsw_index,
    build_segment_graph,
    hnsw_index_topk,
)
from logsentinelai_ray.ann.knn import cosine_topk_bruteforce

SF_DIR = "/root/testdata/sf0.001"


def _rand_vecs(n, d, seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, d))


def test_level_distribution_and_determinism():
    ids = np.arange(100_000, dtype=np.int64)
    lv = _level_of(ids, seed=7, m_l=1.0 / np.log(8))
    assert (lv == _level_of(ids, seed=7, m_l=1.0 / np.log(8))).all()
    assert lv.min() == 0
    # geometric-ish decay: level 0 majority, each level ~1/m of previous
    frac0 = (lv == 0).mean()
    assert 0.8 < frac0 < 0.95
    assert lv.max() < 12
    # different seed, different levels
    assert (lv != _level_of(ids, seed=8, m_l=1.0 / np.log(8))).any()


def test_single_segment_recall_vs_bruteforce():
    mat = _normalize(_rand_vecs(400, 16, seed=1)).astype(np.float64)
    ids = np.arange(400, dtype=np.int64)
    levels = _level_of(ids, seed=42, m_l=1.0 / np.log(8))
    adj, entry = build_segment_graph(mat, levels, m=8,
                                     ef_construction=64)
    # graph invariants: caps respected, ids in range
    for lvl, layer in enumerate(adj):
        cap = 16 if lvl == 0 else 8
        for arr in layer:
            assert arr.size <= cap
            assert (arr >= 0).all() and (arr < 400).all()
    hits = 0
    for qi in range(25):
        q = _normalize(_rand_vecs(1, 16, seed=100 + qi))[0] \
            .astype(np.float64)
        exact = np.argsort(-(mat @ q), kind="stable")[:10]
        eps = [entry]
        max_level = len(adj) - 1
        for lc in range(max_level, 0, -1):
            lids, sims = _search_layer(q, eps, 1, adj[lc], mat)
            eps = [int(lids[int(np.argmax(sims))])]
        lids, sims = _search_layer(q, eps, 64, adj[0], mat)
        got = lids[np.argsort(-sims, kind="stable")][:10]
        hits += len(set(got.tolist()) & set(exact.tolist()))
    assert hits / 250 >= 0.9, f"recall@10 {hits / 250}"


def test_index_recall_and_determinism(ray_session, tmp_path):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    idx = str(tmp_path / "hnsw")
    meta = build_hnsw_index(ds, idx, num_segments=4, m=8,
                            ef_construction=64, seed=42)
    assert meta["n_vectors"] == 500
    assert sorted(meta["segments"]) == [0, 1, 2, 3]

    dim = len(_first_vec(ds))
    hits = 0
    n_q = 8
    for qi in range(n_q):
        q = _rand_vecs(1, dim, seed=200 + qi)[0]
        exact = cosine_topk_bruteforce(ds, q, k=10)["vec_id"].to_pylist()
        got = hnsw_index_topk(idx, q, k=10,
                              ef_search=64)["vec_id"].to_pylist()
        assert len(got) == 10
        hits += len(set(got) & set(exact))
        # determinism: repeat query returns the identical ranking
        again = hnsw_index_topk(idx, q, k=10,
                                ef_search=64)["vec_id"].to_pylist()
        assert again == got
    assert hits / (10 * n_q) >= 0.9, f"recall@10 {hits / (10 * n_q)}"


def _first_vec(ds):
    return ds.take(1)[0]["embedding"]


def test_searcher_caches_segments(ray_session, tmp_path):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    idx = str(tmp_path / "hnsw2")
    build_hnsw_index(ds, idx, num_segments=2, m=8, seed=1)
    s = SegmentSearcher()
    q = np.asarray(_first_vec(ds), dtype=np.float64)
    from logsentinelai_ray.ann.hnsw import _segment_dir

    d0 = _segment_dir(idx, 0)
    ids1, _ = s.search(d0, q, 5, 32)
    assert d0 in s._cache  # loaded once...
    ids2, _ = s.search(d0, q, 5, 32)
    assert (ids1 == ids2).all()  # ...and reused deterministically
    # the query vector itself is its own nearest neighbor
    full = hnsw_index_topk(idx, q, k=1, ef_search=64)
    assert full["cosine"][0].as_py() == pytest.approx(1.0, abs=1e-6)


def test_filtered_search_recall_and_plans(ray_session, tmp_path):
    """Filtered kNN: recall vs the brute-force pre-filter, across a
    selective filter (exact-scan plan) and a broad one (bridged beam)."""
    import ray.data as rd

    from logsentinelai_ray.ann.hnsw import hnsw_index_topk

    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    idx = str(tmp_path / "hnswf")
    build_hnsw_index(ds, idx, num_segments=4, m=8, ef_construction=64,
                     seed=42)
    dim = len(ds.take(1)[0]["embedding"])
    all_ids = np.arange(500, dtype=np.int64)
    for name, flt in (("selective", all_ids[all_ids % 25 == 0]),  # 20
                      ("broad", all_ids[all_ids % 2 == 0])):      # 250
        hits = 0
        for qi in range(5):
            q = _rand_vecs(1, dim, seed=300 + qi)[0]

            def pre(t, flt=flt):
                import pyarrow as _pa
                import numpy as _np

                m = _np.isin(t["vec_id"].to_numpy(zero_copy_only=False),
                             flt)
                return t.filter(_pa.array(m))

            exact = cosine_topk_bruteforce(
                ds.map_batches(pre, batch_format="pyarrow"), q, k=10)
            got = hnsw_index_topk(idx, q, k=10, ef_search=64,
                                  filter_ids=flt)
            got_ids = got["vec_id"].to_pylist()
            assert all(int(g) in set(flt.tolist()) for g in got_ids)
            assert len(got_ids) == min(10, flt.size)
            hits += len(set(got_ids)
                        & set(exact["vec_id"].to_pylist()))
        recall = hits / (5 * min(10, flt.size))
        assert recall >= 0.9, (name, recall)
    # selective plan is EXACT within segments: with 20 allowed ids the
    # merged result must equal the brute-force pre-filter identically
    q = _rand_vecs(1, dim, seed=311)[0]
    flt = all_ids[all_ids % 25 == 0]
    exact = cosine_topk_bruteforce(
        ds.map_batches(lambda t: t.filter(
            pa.array(np.isin(t["vec_id"].to_numpy(zero_copy_only=False),
                             flt))), batch_format="pyarrow"), q, k=10)
    got = hnsw_index_topk(idx, q, k=10, ef_search=64, filter_ids=flt)
    assert got["vec_id"].to_pylist() == exact["vec_id"].to_pylist()
