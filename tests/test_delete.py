"""Tombstone deletes: every query path must exclude deleted docs while
surviving scores stay bit-identical (pre-delete stats, the ES/Lucene
contract)."""

import shutil

import numpy as np
import pytest

from logsentinelai_ray.index.delete import delete_docs, read_tombstones


@pytest.fixture(scope="module")
def deleted_engine(small_index, engine, tmp_path_factory):
    """Clone the session index, tombstone 5 docs that match 'error'."""
    from logsentinelai_ray.query.shards import SearchEngine

    idx_dir, _cfg = small_index
    victims = engine.search("error", k=5,
                            with_meta=False)["doc_id"].to_pylist()
    clone = str(tmp_path_factory.mktemp("delidx") / "idx")
    shutil.copytree(idx_dir, clone)
    n = delete_docs(clone, victims)
    assert n == len(set(victims))
    eng = SearchEngine(clone, num_shards=2)
    yield eng, set(victims)
    eng.shutdown()


def test_delete_is_idempotent_and_merges(small_index, tmp_path):
    idx_dir, _cfg = small_index
    clone = str(tmp_path / "idx2")
    shutil.copytree(idx_dir, clone)
    assert delete_docs(clone, [3, 1, 2]) == 3
    assert delete_docs(clone, [2, 7]) == 4
    assert read_tombstones(clone).tolist() == [1, 2, 3, 7]


@pytest.mark.parametrize("strategy", ["taat", "wand"])
def test_search_excludes_deleted_scores_unchanged(engine, deleted_engine,
                                                  strategy):
    eng, victims = deleted_engine
    for q in ("error", "error merge window", "authentication failure"):
        before = engine.search(q, k=100, with_meta=False,
                               strategy=strategy)
        after = eng.search(q, k=100, with_meta=False, strategy=strategy)
        got = list(zip(after["doc_id"].to_pylist(),
                       after["score"].to_pylist()))
        exp = [(d, s) for d, s in zip(before["doc_id"].to_pylist(),
                                      before["score"].to_pylist())
               if d not in victims][:100]
        # the k-cut can differ (before had victims consuming slots);
        # compare the overlapping prefix
        m = min(len(got), len(exp))
        assert got[:m] == exp[:m], (q, strategy)
        assert not victims & set(d for d, _ in got)


def test_phrase_boolean_count_facets_exclude_deleted(engine,
                                                     deleted_engine):
    eng, victims = deleted_engine
    pm = eng.phrase_match("error")
    assert not victims & set(pm["doc_id"].to_pylist())
    base_pm = engine.phrase_match("error")
    base = {d: n for d, n in zip(base_pm["doc_id"].to_pylist(),
                                 base_pm["n_matches"].to_pylist())
            if d not in victims}
    assert dict(zip(pm["doc_id"].to_pylist(),
                    pm["n_matches"].to_pylist())) == base

    bs = eng.boolean_search(must="error", k=10 ** 6)
    assert not victims & set(bs["doc_id"].to_pylist())

    assert eng.match_count("error") == engine.match_count("error") \
        - len(victims & set(
            engine.search("error", k=10 ** 6,
                          with_meta=False)["doc_id"].to_pylist()))

    f_before = dict(zip(*[engine.search_facets("error")[c].to_pylist()
                          for c in ("lang", "n_docs")]))
    f_after = dict(zip(*[eng.search_facets("error")[c].to_pylist()
                         for c in ("lang", "n_docs")]))
    assert sum(f_before.values()) - sum(f_after.values()) == len(victims)


def test_search_after_excludes_deleted(deleted_engine):
    eng, victims = deleted_engine
    page = eng.search_after("error", k=10 ** 6)
    assert not victims & set(page["doc_id"].to_pylist())
    # the capped-score WAND path drops tombstones too (exclude_ids)
    pw = eng.search_after("error", k=10 ** 6, strategy="wand")
    assert pw["doc_id"].to_pylist() == page["doc_id"].to_pylist()
    assert pw["score"].to_pylist() == page["score"].to_pylist()


def test_reload_tombstones(small_index, tmp_path):
    from logsentinelai_ray.query.shards import SearchEngine

    idx_dir, _cfg = small_index
    clone = str(tmp_path / "idx3")
    shutil.copytree(idx_dir, clone)
    eng = SearchEngine(clone, num_shards=1)
    before = eng.search("error", k=5, with_meta=False)
    victim = before["doc_id"][0].as_py()
    delete_docs(clone, [victim])
    # engine still serves the old set until reload (refresh contract)
    assert victim in eng.search("error", k=5,
                                with_meta=False)["doc_id"].to_pylist()
    assert eng.reload_tombstones() == 1
    assert victim not in eng.search("error", k=5,
                                    with_meta=False)["doc_id"].to_pylist()
    eng.shutdown()


def test_scroll_export_plans_agree_with_deletes(deleted_engine, tmp_path):
    """The scan plan must honor delete tombstones exactly like the ids
    plan (the automatic size-based plan switch must not change delete
    semantics)."""
    from logsentinelai_ray.pipelines.queries import scroll_export

    eng, victims = deleted_engine
    a = scroll_export(eng, "error", str(tmp_path / "ids"),
                      plan="ids").to_pandas()
    b = scroll_export(eng, "error", str(tmp_path / "scan"),
                      plan="scan").to_pandas()
    assert len(a) > 0
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert not (set(a["doc_id"]) & victims)
    assert a["sha256"].tolist() == b["sha256"].tolist()


def test_delete_by_query_and_request_cache(ray_session, tmp_path):
    """ES _delete_by_query + shard-request-cache semantics: cached
    results are identical objects until a refresh invalidates them,
    and delete_by_query removes exactly the matching docs."""
    import ray.data as rd

    from logsentinelai_ray.config import CorpusConfig, IndexConfig
    from logsentinelai_ray.corpus import generate_corpus
    from logsentinelai_ray.index.build import build_index
    from logsentinelai_ray.query.shards import SearchEngine

    d = str(tmp_path / "dbq")
    tbl = generate_corpus(CorpusConfig(n_docs=300))
    build_index(rd.from_arrow(tbl), d,
                IndexConfig(num_partitions=4, salt_buckets=2,
                            block_size=32), corpus_tag="dbq")
    eng = SearchEngine(d, num_shards=2)
    try:
        q = "authentication failure error"
        r1 = eng.search_cached(q, k=10)
        r2 = eng.search_cached(q, k=10)
        assert r2 is r1                      # cache hit: same object
        assert r1["doc_id"].to_pylist() == \
            eng.search(q, k=10)["doc_id"].to_pylist()

        victims = set(int(i) for i in eng.match_ids("authentication"))
        n = eng.delete_by_query("authentication")
        assert n == len(victims) > 0
        assert eng.delete_by_query("authentication") == 0  # idempotent

        r3 = eng.search_cached(q, k=10)
        assert r3 is not r1                  # refresh invalidated
        assert not victims & set(r3["doc_id"].to_pylist())
        assert r3["doc_id"].to_pylist() == \
            eng.search(q, k=10)["doc_id"].to_pylist()

        # filters participate in the cache key
        f1 = eng.search_cached(q, k=10, filters={"lang": "python"})
        f2 = eng.search_cached(q, k=10, filters={"lang": "java"})
        assert f1 is not f2
        assert f1 is eng.search_cached(q, k=10, filters={"lang": "python"})
    finally:
        eng.shutdown()


def test_profile_excludes_deleted(deleted_engine):
    """profile() must run WAND with the same tombstone exclusion as
    search() — its top-k/hits may not diverge on an index with
    deletions (ADVICE r3). Verified indirectly: profiled docs_scored
    excludes victims and search() rank identity still holds right
    after a profile call (shared caches, same kernel inputs)."""
    eng, victims = deleted_engine
    q = "error merge window"
    # k past the match count: hits now REFLECTS exclusion — an
    # unexcluded profile would count the victims and disagree
    p = eng.profile(q, k=100_000).to_pylist()[0]
    res = eng.search(q, k=100_000, with_meta=False, strategy="wand")
    hits = res["doc_id"].to_pylist()
    assert not victims & set(hits)
    assert p["hits"] == len(hits)
