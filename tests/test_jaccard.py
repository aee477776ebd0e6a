"""N-gram Jaccard pair expansion: salted block correctness, the
corpus-aware max_group cap, and adversarial hot-shingle bounds
(dedup/jaccard.py)."""

import time

import numpy as np
import pyarrow as pa
import pytest

from logsentinelai_ray.dedup.jaccard import (_expand_pair_blocks,
                                             _pair_blocks_of_group,
                                             ngram_jaccard_pairs)


def _all_pairs(ids):
    ids = sorted(ids)
    return {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]}


@pytest.mark.parametrize("g,block", [(2, 8), (7, 8), (8, 8), (9, 8),
                                     (30, 8), (100, 7), (257, 16)])
def test_pair_blocks_cover_each_pair_exactly_once(g, block):
    rng = np.random.default_rng(g)
    ids = rng.choice(10_000, size=g, replace=False).astype(np.int64)
    group = pa.table({"doc_id": pa.array(ids, pa.int64())})
    blocks = _pair_blocks_of_group(group, max_group=None, block=block)
    # no single block row may exceed block^2 pairs (the salting bound)
    for row in range(blocks.num_rows):
        assert len(blocks["ia"][row]) <= block
        assert len(blocks["ib"][row]) <= block
    pk = _expand_pair_blocks(blocks)["pk"].to_numpy(zero_copy_only=False)
    got = {(int(p >> 32), int(p & 0xFFFFFFFF)) for p in pk}
    assert len(pk) == len(got) == g * (g - 1) // 2
    assert got == _all_pairs(ids.tolist())


def test_max_group_cap_drops_expansion():
    ids = np.arange(100, dtype=np.int64)
    group = pa.table({"doc_id": pa.array(ids, pa.int64())})
    capped = _pair_blocks_of_group(group, max_group=99)
    assert capped.num_rows == 0
    kept = _pair_blocks_of_group(group, max_group=100)
    assert _expand_pair_blocks(kept).num_rows == 100 * 99 // 2


def test_adversarial_hot_shingle_bounded(ray_session):
    """A corpus where EVERY doc shares one boilerplate shingle: the auto
    cap must keep the pipeline's time and output bounded (the boilerplate
    group is dropped; real near-dup pairs still surface through their
    other shared shingles), while max_group=None remains exact."""
    import ray.data as rd

    n = 400  # auto cap = max(64, 4*sqrt(400)) = 81 << 400
    boiler = "common boilerplate header line"
    texts = [f"{boiler} unique{i} token{i} filler{i} tail{i}"
             for i in range(n)]
    # two true near-dups: long shared tail, differ by one trailing token
    tail = "alpha beta gamma delta epsilon zeta eta theta"
    texts[0] = f"{boiler} {tail} iota"
    texts[1] = f"{boiler} {tail} kappa"
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts)}))
    t0 = time.monotonic()
    out = ngram_jaccard_pairs(ds, n=3, threshold=0.5)  # max_group="auto"
    elapsed = time.monotonic() - t0
    assert elapsed < 120  # bounded: no 400^2/2 boilerplate expansion
    pairs = set(zip(out["a"].to_pylist(), out["b"].to_pylist()))
    # exactly the real near-dup survives: unique docs share ONLY the
    # capped boilerplate shingles, so they produce no pair rows at all
    assert pairs == {(0, 1)}


def test_uncapped_matches_bruteforce_on_identical_docs(ray_session):
    """max_group=None: 60 identical docs -> all 1770 pairs at J=1.0,
    exercising the multi-chunk salted path end-to-end (block < g)."""
    import ray.data as rd

    n = 60
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(["the same exact document text here"] * n)}))
    out = ngram_jaccard_pairs(ds, n=3, threshold=0.5, max_group=None)
    assert out.num_rows == n * (n - 1) // 2
    assert set(out["jaccard"].to_pylist()) == {1.0}
    got = set(zip(out["a"].to_pylist(), out["b"].to_pylist()))
    assert got == _all_pairs(range(n))


def test_size_exchange_join_path_equals_broadcast(ray_session):
    """size_exchange="join" (the 10^9+-doc hash-partitioned size join —
    nothing doc-count-sized on the driver) returns exactly the broadcast
    path's pairs, on a corpus mixing near-dups, exact dups and uniques."""
    import ray.data as rd

    rng = np.random.default_rng(7)
    words = [f"tok{i}" for i in range(40)]
    texts = []
    for i in range(80):
        base = " ".join(rng.choice(words, size=25))
        texts.append(base)
        if i % 4 == 0:
            texts.append(base + " tail variant words")  # near-dup
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts)}))
    t_b = ngram_jaccard_pairs(ds, n=3, threshold=0.3)
    t_j = ngram_jaccard_pairs(ds, n=3, threshold=0.3,
                              size_exchange="join", join_partitions=4)
    assert t_j.equals(t_b)
    assert t_b.num_rows > 0


def test_duplicate_span_coverage_handcrafted(ray_session):
    """duplicate_span_stats (dedup/spans.py): interval-union coverage of
    cross-document duplicated 3-grams, verified against a hand-computed
    example (overlapping marked starts must not double-count)."""
    import ray.data as rd

    from logsentinelai_ray.dedup.spans import duplicate_span_stats

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "alpha beta gamma delta epsilon zeta",
            "intro words alpha beta gamma delta tail",
            "unique content nothing shared here at all",
            "alpha beta gamma something else entirely now"])}))
    t = duplicate_span_stats(ds, k=3).to_pandas()
    # doc0: dup grams at starts {0,1} -> union [0,4) = 4 of 6 tokens
    # doc1: starts {2,3} -> [2,6) = 4 of 7; doc2: none; doc3: {0} -> 3 of 7
    assert t["doc_id"].tolist() == [0, 1, 3]
    assert t["dup_tokens"].tolist() == [4, 4, 3]
    assert t["n_tokens"].tolist() == [6, 7, 7]


def test_duplicate_spans_join_path_equals_broadcast(ray_session):
    """dup_exchange="join" (the extreme-scale path: hash-partitioned
    joins instead of broadcasting the duplicated-gram key set) returns
    exactly the broadcast path's coverage table."""
    import ray.data as rd

    from logsentinelai_ray.dedup.spans import duplicate_span_stats

    rng = np.random.default_rng(11)
    words = [f"tok{i}" for i in range(50)]
    texts = []
    for i in range(60):
        base = " ".join(rng.choice(words, size=18))
        texts.append(base)
        if i % 3 == 0:
            texts.append(base + " tail variant")  # shared spans
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts)}))
    t_b = duplicate_span_stats(ds, k=3)
    t_j = duplicate_span_stats(ds, k=3, dup_exchange="join",
                               join_partitions=4)
    assert t_j.equals(t_b)
    assert t_b.num_rows > 0


def test_duplicate_spans_broadcast_cap_falls_back_to_join(ray_session):
    """A duplicated-gram key set larger than max_broadcast_keys must
    abandon the broadcast mid-collect and re-plan through the join
    exchange, returning identical results."""
    import ray.data as rd

    from logsentinelai_ray.dedup.spans import duplicate_span_stats

    rng = np.random.default_rng(5)
    words = [f"t{i}" for i in range(30)]
    texts = []
    for i in range(30):
        base = " ".join(rng.choice(words, size=12))
        texts.append(base)
        texts.append(base + " tail")
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts)}))
    normal = duplicate_span_stats(ds, k=3)
    capped = duplicate_span_stats(ds, k=3, max_broadcast_keys=3,
                                  join_partitions=4)
    assert capped.equals(normal)


def test_remove_duplicate_spans_matches_reference(ray_session):
    """remove_duplicate_spans == an independent per-doc Python reference
    (duplication, min-doc keeper, interval union, token rebuild), and
    keeps keeper docs intact."""
    import re
    from collections import defaultdict

    import pyarrow as pa
    import ray.data as rd

    from logsentinelai_ray.dedup.spans import remove_duplicate_spans

    docs = [
        (0, "alpha beta gamma delta epsilon"),
        (1, "x alpha beta gamma y"),
        (2, "unique tokens only here"),
        (3, "alpha beta gamma delta zz"),
        (4, "Short"),
        (5, ""),
        (6, "x alpha beta gamma y"),  # exact dup of doc 1
    ]
    tbl = pa.table({"doc_id": pa.array([d for d, _ in docs], pa.int64()),
                    "text": [t for _, t in docs]})
    out = (remove_duplicate_spans(rd.from_arrow(tbl), k=3)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    k = 3
    toks = {d: re.findall(r"[a-z0-9]+", t.lower()) for d, t in docs}
    occ = defaultdict(set)
    for d, ts in toks.items():
        for i in range(len(ts) - k + 1):
            occ[" ".join(ts[i:i + k])].add(d)
    dup = {sh: min(ds_) for sh, ds_ in occ.items() if len(ds_) >= 2}
    for row in out.itertuples():
        ts = toks[row.doc_id]
        cov = set()
        for i in range(len(ts) - k + 1):
            sh = " ".join(ts[i:i + k])
            if sh in dup and dup[sh] != row.doc_id:
                cov.update(range(i, i + k))
        kept = [t for i, t in enumerate(ts) if i not in cov]
        assert row.clean_text == " ".join(kept), row.doc_id
        assert row.n_tokens == len(ts)
        assert row.kept_tokens == len(kept)
    by_id = out.set_index("doc_id")
    # doc 1: loses 'alpha beta gamma' (keeper 0) but keeps the grams it
    # is itself keeper of vs doc 6; doc 6: every gram's keeper is 0 or 1
    assert by_id.loc[1, "kept_tokens"] == 2
    assert by_id.loc[6, "kept_tokens"] == 0
    assert by_id.loc[0, "kept_tokens"] == 5   # keeper keeps everything


def test_remove_duplicate_spans_property(ray_session):
    """Property: on random small-vocab corpora the distributed rewrite
    equals the per-doc Python reference (duplication, keeper, interval
    union)."""
    import re
    from collections import defaultdict

    import pyarrow as pa
    import ray.data as rd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from logsentinelai_ray.dedup.spans import remove_duplicate_spans

    words = ["aa", "bb", "cc", "dd", "ee"]
    doc_st = st.lists(st.sampled_from(words), min_size=0, max_size=12)

    @settings(max_examples=10, deadline=None)
    @given(st.lists(doc_st, min_size=2, max_size=8))
    def run(corpus):
        k = 2
        docs = [(i, " ".join(ws)) for i, ws in enumerate(corpus)]
        tbl = pa.table({
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": [t for _, t in docs]})
        out = (remove_duplicate_spans(rd.from_arrow(tbl), k=k)
               .to_pandas().sort_values("doc_id")
               .reset_index(drop=True))
        toks = {d: re.findall(r"[a-z0-9]+", t.lower()) for d, t in docs}
        occ = defaultdict(set)
        for d, ts in toks.items():
            for i in range(len(ts) - k + 1):
                occ[" ".join(ts[i:i + k])].add(d)
        dup = {sh: min(s) for sh, s in occ.items() if len(s) >= 2}
        for row in out.itertuples():
            ts = toks[row.doc_id]
            cov = set()
            for i in range(len(ts) - k + 1):
                sh = " ".join(ts[i:i + k])
                if sh in dup and dup[sh] != row.doc_id:
                    cov.update(range(i, i + k))
            kept = [t for i, t in enumerate(ts) if i not in cov]
            assert row.clean_text == " ".join(kept), (row.doc_id, corpus)
            assert row.kept_tokens == len(kept)

    run()


def test_winnowing_capped_on_boilerplate_corpus(ray_session, tmp_path):
    """Adversarial shared-fingerprint corpus (every doc winnows to the
    same fingerprints — boilerplate headers): with the default
    corpus-aware cap the O(g^2) pair expansion is skipped and the run
    completes bounded; uncapped (max_group=None) the same corpus
    yields all C(n,2) pairs — proving the cap is what bounds it."""
    import time

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from logsentinelai_ray.pipelines.queries import (
        q_winnowing_fingerprints,
    )

    n = 2000
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(
            ["copyright header licensed under apache license "
             "version two point zero see notice file"] * n),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    t0 = time.monotonic()
    out = q_winnowing_fingerprints(str(tmp_path))
    elapsed = time.monotonic() - t0
    # cap = min(10k, 4*sqrt(2000)+1) ≈ 179 < 2000 → every group skipped
    assert out.num_rows == 0
    assert elapsed < 60, f"boilerplate corpus took {elapsed:.1f}s"
    # uncapped on a small slice: the exact all-pairs semantics
    small = 12
    pq.write_table(tbl.slice(0, small),
                   str(tmp_path / "documents.parquet"))
    exact = q_winnowing_fingerprints(str(tmp_path), max_group=None)
    # top-15 of C(12,2)=66 identical-share pairs
    assert exact.num_rows == 15
    assert len(set(exact["shared"].to_pylist())) == 1
