"""ILM policy engine (index/ilm.py): phase actions, idempotence, and
alias validity across warm-shrink + delete."""

import os

import pyarrow.parquet as pq
import pytest

from logsentinelai_ray.config import CorpusConfig, IndexConfig
from logsentinelai_ray.corpus import generate_corpus
from logsentinelai_ray.index.ilm import IlmPolicy, apply_policy
from logsentinelai_ray.index.rollover import RolloverIndex


@pytest.fixture(scope="module")
def rolled(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("ilm")
    tbl = generate_corpus(CorpusConfig(n_docs=120))
    chunks = []
    for i, lo in enumerate(range(0, 120, 40)):
        p = str(base / f"chunk{i}.parquet")
        pq.write_table(tbl.slice(lo, 40), p)
        chunks.append(p)
    roll = RolloverIndex(str(base / "alias"),
                         IndexConfig(num_partitions=8, salt_buckets=2,
                                     block_size=32),
                         max_docs=40, alias="t")
    for i, p in enumerate(chunks):
        roll.ingest(p, tag=f"c{i}")
    assert [g["name"] for g in roll.meta["generations"]] == [
        "gen-0000", "gen-0001", "gen-0002"]
    return roll


def test_policy_phases_and_idempotence(rolled):
    baseline = rolled.search("authentication failure error", k=15)
    acts = apply_policy(rolled, IlmPolicy(
        warm_after_generations=1, warm_shrink_factor=2,
        delete_keep_last=3))  # delete keeps all three this pass
    assert acts["delete"] == []
    assert acts["warm"] == ["gen-0000-warm", "gen-0001-warm"]
    names = [g["name"] for g in rolled.meta["generations"]]
    assert names == ["gen-0000-warm", "gen-0001-warm", "gen-0002"]
    # warm shrink preserves ranks AND scores across the alias
    after = rolled.search("authentication failure error", k=15)
    assert after["doc_id"].to_pylist() == baseline["doc_id"].to_pylist()
    assert after["score"].to_pylist() == baseline["score"].to_pylist()
    # shrunk generations halved their partition count
    from logsentinelai_ray.index import manifest as mf

    st = mf.read_stats(rolled._gen_dir("gen-0000-warm"))
    assert int(st["num_partitions"]) == 4
    # second pass: nothing to do
    acts2 = apply_policy(rolled, IlmPolicy(
        warm_after_generations=1, warm_shrink_factor=2,
        delete_keep_last=3))
    assert acts2 == {"delete": [], "warm": []}
    # old dirs are gone, new dirs exist
    assert not os.path.isdir(rolled._gen_dir("gen-0000"))
    assert os.path.isdir(rolled._gen_dir("gen-0000-warm"))


def test_policy_delete_phase(rolled):
    acts = apply_policy(rolled, IlmPolicy(
        warm_after_generations=1, warm_shrink_factor=2,
        delete_keep_last=2))
    assert acts["delete"] == ["gen-0000-warm"]
    names = [g["name"] for g in rolled.meta["generations"]]
    assert names == ["gen-0001-warm", "gen-0002"]
    # alias still serves; 80 retained docs
    res = rolled.search("authentication", k=100)
    assert res.num_rows <= 80
    rolled.shutdown()


def test_policy_validation(rolled):
    with pytest.raises(ValueError):
        apply_policy(rolled, IlmPolicy(warm_after_generations=-1))


def test_stop_words_analyzer(ray_session, tmp_path_factory):
    """stop_words drops tokens BEFORE tf/dl/positions: the stopword's
    df is 0, doc lengths shrink, and a phrase spanning a removed
    stopword becomes adjacent (StopFilter placement)."""
    import ray.data as rd

    from logsentinelai_ray.index.build import build_index
    from logsentinelai_ray.query.shards import SearchEngine

    base = tmp_path_factory.mktemp("stop")
    import pyarrow as pa

    docs = pa.table({
        "repo": ["r0", "r1"],
        "path": ["a.md", "b.md"],
        "commit": ["c0", "c1"],
        "lang": ["en", "en"],
        "content": ["alpha the beta gamma", "alpha beta the gamma"],
    })
    cfg = IndexConfig(num_partitions=4, salt_buckets=1, block_size=16,
                      store_positions=True, stop_words=("the",))
    idx = str(base / "idx")
    build_index(rd.from_arrow(docs), idx, cfg, corpus_tag="stop")
    eng = SearchEngine(idx, num_shards=2, prewarm_hot_terms=0)
    try:
        assert eng.match_count("the") == 0          # df == 0
        # doc 0: "alpha [the] beta" -> alpha/beta adjacent post-filter
        ph = eng.phrase_match("alpha beta")
        assert ph["doc_id"].to_pylist() == [0, 1]
        # dl excludes the stopword: stats avgdl == 3 (not 4)
        assert eng.stats["avgdl"] == 3.0
    finally:
        eng.shutdown()
