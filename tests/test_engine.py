"""End-to-end engine tests: rank-identity vs oracle, WAND vs exhaustive,
doc-id determinism, sha256 integrity, resume (SURVEY.md §5.2.2/4/5)."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from tests.conftest import QUERY_SET


def _pairs(tbl):
    return list(zip(tbl["doc_id"].to_pylist(), tbl["score"].to_pylist()))


@pytest.mark.parametrize("strategy", ["taat", "wand"])
@pytest.mark.parametrize("query", QUERY_SET)
def test_rank_identity(engine, oracle, query, strategy):
    for k in (1, 5, 10, 100):
        got = _pairs(engine.search(query, k=k, with_meta=False,
                                   strategy=strategy))
        exp = oracle.search(query, k=k)
        assert [d for d, _ in got] == [d for d, _ in exp], \
            (query, k, strategy)
        # scores bit-identical (same float ops, same order)
        assert [s for _, s in got] == [s for _, s in exp], \
            (query, k, strategy)


@pytest.mark.parametrize("strategy", ["taat", "wand"])
@pytest.mark.parametrize("flt", [{"lang": "python"}, {"lang": "md"},
                                 {"repo": "org1/repo1"},
                                 {"lang": "python", "repo": "org3/repo10"},
                                 {"lang": "no_such_lang"}])
def test_rank_identity_filtered(engine, oracle, flt, strategy):
    for query in ("error", "select union passwd", "authentication failure"):
        got = _pairs(engine.search(query, k=20, filters=flt,
                                   with_meta=False, strategy=strategy))
        exp = oracle.search(query, k=20, filters=flt)
        assert got == exp, (query, flt, strategy)


def test_wand_equals_exhaustive(engine):
    """WAND pruning must be invisible: identical to brute-force cursor scan."""
    from logsentinelai_ray.analysis import tokenize_py
    from logsentinelai_ray.query.bm25 import bm25_idf
    from logsentinelai_ray.query.postings import PostingsCursor, TermPostings
    from logsentinelai_ray.query.wand import block_max_wand

    stats = engine.stats
    for query in QUERY_SET:
        terms = sorted(set(tokenize_py(query, int(stats["max_token_len"]))))
        rows = engine._fetch_terms(terms)
        scores: dict[int, float] = {}
        cursors = []
        for t in terms:
            if t not in rows:
                continue
            tp = TermPostings(rows[t])
            idf = bm25_idf(stats["n_docs"], int(tp.df))
            cur = PostingsCursor(tp, idf, stats["k1"], stats["b"],
                                 stats["avgdl"])
            cursors.append(PostingsCursor(TermPostings(rows[t]), idf,
                                          stats["k1"], stats["b"],
                                          stats["avgdl"]))
            while not cur.exhausted():
                scores[cur.cur_doc] = scores.get(cur.cur_doc, 0.0) \
                    + cur.score_current()
                cur.next()
        exhaustive = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        for k in (1, 7, 40, 10_000):
            assert block_max_wand(cursors, k) == exhaustive[:k], (query, k)
            for c in cursors:  # reset cursors for the next k
                c.__init__(c.tp, c.idf, c.k1, c.b, c.avgdl)


def test_wand_vec_equals_scalar_wand(engine):
    """The vectorized block-at-a-time WAND must be bit-identical to the
    doc-at-a-time scalar WAND — with and without a seed threshold,
    filter sets, exclusions, and across batch granularities."""
    import numpy as np

    from logsentinelai_ray.analysis import tokenize_py
    from logsentinelai_ray.query.bm25 import bm25_idf
    from logsentinelai_ray.query.postings import PostingsCursor, TermPostings
    from logsentinelai_ray.query.wand import block_max_wand, block_max_wand_vec

    stats = engine.stats
    n = int(stats["n_docs"])
    rng = np.random.default_rng(7)
    for query in QUERY_SET:
        terms = sorted(set(tokenize_py(query, int(stats["max_token_len"]))))
        rows = engine._fetch_terms(terms)

        def mk_cursors():
            out = []
            for t in terms:
                if t not in rows:
                    continue
                tp = TermPostings(rows[t])
                idf = bm25_idf(n, int(tp.df))
                out.append(PostingsCursor(tp, idf, stats["k1"], stats["b"],
                                          stats["avgdl"]))
            return out

        for k in (1, 7, 40, 10_000):
            exp = block_max_wand(mk_cursors(), k)
            got = block_max_wand_vec(mk_cursors(), k)
            assert got == exp, (query, k)
            # tiny first batch forces many threshold-update rounds
            got2 = block_max_wand_vec(mk_cursors(), k, first_batch_atoms=1)
            assert got2 == exp, (query, k)
            if exp:
                seed = float(np.nextafter(exp[min(k, len(exp)) - 1][1],
                                          -np.inf))
                got3 = block_max_wand_vec(mk_cursors(), k,
                                          seed_threshold=seed)
                assert got3 == exp, (query, k, "seeded")
        # random filter / exclusion sets
        keep = np.sort(rng.choice(n, size=n // 3, replace=False)).astype(np.int64)
        drop = np.sort(rng.choice(n, size=n // 10, replace=False)).astype(np.int64)
        keep_set, drop_set = set(keep.tolist()), set(drop.tolist())
        exp = block_max_wand(mk_cursors(), 15,
                             filter_predicate=lambda d: (d in keep_set
                                                         and d not in drop_set))
        got = block_max_wand_vec(mk_cursors(), 15, filter_ids=keep,
                                 exclude_ids=drop)
        assert got == exp, (query, "filtered")


def test_wand_vec_sparse_intervals(engine):
    """The sparse-cursor refinement (rare lists enter the atom sweep as
    exact per-posting runs instead of wide block intervals) must be
    invisible to results: cap=0 (interval-only), the default, and
    cap=huge (every list sparse-exact) all return identical top-k on a
    mixed rare+hot query — seeded and unseeded."""
    import numpy as np

    from logsentinelai_ray.query.bm25 import bm25_idf
    from logsentinelai_ray.query.postings import PostingsCursor, TermPostings
    from logsentinelai_ray.query.wand import block_max_wand_vec

    stats = engine.stats
    n = int(stats["n_docs"])
    # find a genuinely rare term plus the two hottest query terms
    seg = engine._fetch_terms(
        sorted(set(t for q in QUERY_SET for t in q.split())))
    hot = sorted(seg, key=lambda t: -seg[t]["df"])[:2]
    rare = min(seg, key=lambda t: seg[t]["df"])
    terms = sorted(set(hot + [rare]))
    rows = engine._fetch_terms(terms)

    def mk():
        out = []
        for t in terms:
            if t not in rows:
                continue
            tp = TermPostings(rows[t])
            out.append(PostingsCursor(tp, bm25_idf(n, int(tp.df)),
                                      stats["k1"], stats["b"],
                                      stats["avgdl"]))
        return out

    for k in (3, 25):
        exp = block_max_wand_vec(mk(), k, sparse_df_cap=0)
        got_def = block_max_wand_vec(mk(), k)
        got_all = block_max_wand_vec(mk(), k, sparse_df_cap=1 << 60)
        assert got_def == exp, k
        assert got_all == exp, k
        if exp:
            seed = float(np.nextafter(exp[min(k, len(exp)) - 1][1],
                                      -np.inf))
            got_seeded = block_max_wand_vec(mk(), k, seed_threshold=seed,
                                            sparse_df_cap=1 << 60)
            assert got_seeded == exp, (k, "seeded")


def test_doc_ids_deterministic_and_deduped(small_index, small_corpus):
    idx_dir, _ = small_index
    docs = pq.read_table(os.path.join(idx_dir, "docs")).sort_by("doc_id")
    keys = list(zip(docs["repo"].to_pylist(), docs["path"].to_pylist(),
                    docs["commit"].to_pylist()))
    # dense ids = rank of the key in sorted-key order (order-independent
    # of input block layout, hence deterministic under Ray's scheduling)
    expected = sorted({rpc for rpc in
                       zip(small_corpus["repo"].to_pylist(),
                           small_corpus["path"].to_pylist(),
                           small_corpus["commit"].to_pylist())})
    assert keys == expected
    assert docs["doc_id"].to_pylist() == list(range(len(expected)))
    # duplicates existed in the input and were dropped
    assert small_corpus.num_rows > len(expected)


def test_sha256_integrity(small_index, engine):
    """Per-row content sha256 equality vs the source (input_hint invariant)."""
    import hashlib

    idx_dir, _ = small_index
    docs = pq.read_table(os.path.join(idx_dir, "docs"))
    by_id = dict(zip(docs["doc_id"].to_pylist(), docs["content"].to_pylist()))
    res = engine.search("authentication failure error", k=25)
    assert res.num_rows > 0
    for doc_id, sha in zip(res["doc_id"].to_pylist(),
                           res["sha256"].to_pylist()):
        assert hashlib.sha256(by_id[doc_id].encode()).hexdigest() == sha


def test_collection_stats_match_oracle(small_index, oracle):
    from logsentinelai_ray.index import manifest as mf

    idx_dir, _ = small_index
    stats = mf.read_stats(idx_dir)
    assert stats["n_docs"] == oracle.n_docs
    assert stats["avgdl"] == pytest.approx(oracle.avgdl, abs=1e-12)


def test_df_consistency(small_index, oracle):
    """sum(df) over segments == number of distinct (term, doc) pairs."""
    idx_dir, cfg = small_index
    seg_df = {}
    for p in range(cfg.num_partitions):
        tbl = pq.read_table(os.path.join(idx_dir, "segments",
                                         f"part-{p:04d}.parquet"))
        for t, df in zip(tbl["term"].to_pylist(), tbl["df"].to_pylist()):
            seg_df[t] = seg_df.get(t, 0) + df
    for term, plist in oracle.postings.items():
        assert seg_df.get(term) == len(plist), term


def test_resume_skips_completed_partitions(small_corpus, tmp_path):
    """Kill-and-resume: only missing partitions rebuild; ranks identical."""
    import ray.data as rd

    from logsentinelai_ray.config import IndexConfig
    from logsentinelai_ray.index.build import build_index
    from logsentinelai_ray.query.shards import SearchEngine

    cfg = IndexConfig(num_partitions=4, salt_buckets=2, block_size=16)
    idx = str(tmp_path / "idx")
    build_index(rd.from_arrow(small_corpus), idx, cfg, corpus_tag="r")
    e1 = SearchEngine(idx, num_shards=2)
    before = _pairs(e1.search("select union passwd", k=10, with_meta=False))
    e1.shutdown()
    # simulate mid-shuffle crash
    os.remove(os.path.join(idx, "segments", "part-0002.parquet"))
    os.remove(os.path.join(idx, "manifest", "part-0002.json"))
    meta = build_index(rd.from_arrow(small_corpus), idx, cfg, corpus_tag="r")
    # earlier stages were skipped
    assert set(meta["timings"]) == {"segments_s"}
    e2 = SearchEngine(idx, num_shards=2)
    after = _pairs(e2.search("select union passwd", k=10, with_meta=False))
    e2.shutdown()
    assert before == after


def test_distributed_dedup_path_matches_driver_path(small_corpus, tmp_path):
    """The Dataset-groupby dedup (scale path) and the driver-side dedup
    (small path) must produce identical doc maps."""
    import ray.data as rd

    from logsentinelai_ray.config import IndexConfig
    from logsentinelai_ray.index.build import build_index

    outs = []
    for thresh, sub in ((0, "a"), (10**9, "b")):
        cfg = IndexConfig(num_partitions=4, salt_buckets=2,
                          driver_dedup_max_rows=thresh)
        idx = str(tmp_path / sub)
        build_index(rd.from_arrow(small_corpus), idx, cfg, corpus_tag="d")
        docs = pq.read_table(os.path.join(idx, "docs")).sort_by("doc_id")
        outs.append(docs.select(["doc_id", "repo", "path", "commit",
                                 "sha256"]))
    assert outs[0].equals(outs[1])


def test_resume_after_partial_emit(small_corpus, tmp_path):
    """A crash DURING stage 2 leaves partial exchange files without the
    _SUCCESS marker; the rerun must wipe and re-emit (not double-count
    postings) and converge to the same index."""
    import shutil

    import ray.data as rd

    from logsentinelai_ray.config import IndexConfig
    from logsentinelai_ray.index.build import build_index
    from logsentinelai_ray.query.shards import SearchEngine

    cfg = IndexConfig(num_partitions=4, salt_buckets=2, block_size=16)
    ref_idx = str(tmp_path / "ref")
    build_index(rd.from_arrow(small_corpus), ref_idx, cfg, corpus_tag="pe")
    e_ref = SearchEngine(ref_idx, num_shards=2)
    expect = _pairs(e_ref.search("select union passwd", k=10,
                                 with_meta=False))
    e_ref.shutdown()

    # simulate: crash mid-emit — exchange dir half-written, no _SUCCESS,
    # later stages never ran
    idx = str(tmp_path / "crashed")
    build_index(rd.from_arrow(small_corpus), idx, cfg, corpus_tag="pe")
    os.remove(os.path.join(idx, "postings_raw", "_SUCCESS"))
    shutil.rmtree(os.path.join(idx, "segments"))
    for name in os.listdir(os.path.join(idx, "manifest")):
        if name != "_build.json":  # keep the start marker: same build
            os.remove(os.path.join(idx, "manifest", name))
    os.remove(os.path.join(idx, "stats.json"))
    part0 = os.path.join(idx, "postings_raw", "part=0")
    for name in os.listdir(part0)[:1]:
        os.remove(os.path.join(part0, name))  # half-written partition
    meta = build_index(rd.from_arrow(small_corpus), idx, cfg,
                       corpus_tag="pe")
    assert "emit_postings_s" in meta["timings"]  # stage 2 re-ran
    e2 = SearchEngine(idx, num_shards=2)
    got = _pairs(e2.search("select union passwd", k=10, with_meta=False))
    e2.shutdown()
    assert got == expect


def test_pluggable_scorer_params(small_corpus, tmp_path):
    """SURVEY §2.11: BM25 k1/b are config, enforced end-to-end — an index
    built with non-default parameters stays rank-identical to an oracle
    using the same parameters (and differs from the default ranking)."""
    import ray.data as rd

    from logsentinelai_ray.config import IndexConfig
    from logsentinelai_ray.index.build import build_index
    from logsentinelai_ray.query.bm25 import BM25Oracle
    from logsentinelai_ray.query.shards import SearchEngine

    cfg = IndexConfig(num_partitions=4, salt_buckets=2, k1=0.9, b=0.3)
    idx = str(tmp_path / "idx")
    build_index(rd.from_arrow(small_corpus), idx, cfg, corpus_tag="kb")
    docs = pq.read_table(os.path.join(idx, "docs"))
    pairs = list(zip(docs["doc_id"].to_pylist(),
                     docs["content"].to_pylist()))
    oracle = BM25Oracle(pairs, None, cfg)
    default_oracle = BM25Oracle(
        pairs, None, IndexConfig(num_partitions=4, salt_buckets=2))
    eng = SearchEngine(idx, num_shards=2)
    try:
        any_diff = False
        for q in ("select union passwd", "authentication failure error"):
            got = _pairs(eng.search(q, k=15, with_meta=False))
            assert got == oracle.search(q, k=15), q
            if got != default_oracle.search(q, k=15):
                any_diff = True
        assert any_diff, "k1/b had no effect — parameters not plumbed"
    finally:
        eng.shutdown()


def test_salting_splits_hot_terms(small_index):
    """Hot Zipf-head terms must appear as multiple salt runs pre-merge: the
    merged segment's block_first sequence stays sorted (concat correctness
    is covered by rank-identity; here we check the hot term spans blocks)."""
    idx_dir, cfg = small_index
    from logsentinelai_ray.index.build import term_partition

    p = term_partition("error", cfg.num_partitions)
    tbl = pq.read_table(os.path.join(idx_dir, "segments",
                                     f"part-{p:04d}.parquet"))
    row = {t: i for i, t in enumerate(tbl["term"].to_pylist())}["error"]
    firsts = tbl["block_first"][row].as_py()
    lasts = tbl["block_last"][row].as_py()
    assert len(firsts) > 1
    assert firsts == sorted(firsts)
    assert all(f <= l for f, l in zip(firsts, lasts))
    assert all(lasts[i] < firsts[i + 1] for i in range(len(firsts) - 1))


def test_row_group_split_build_identical(ray_session, tmp_path_factory):
    """A single multi-row-group file must split into per-row-group stage-1
    units and produce the exact same index (ids are sorted-key ranks, so
    the unit split is invisible)."""
    import glob

    import pyarrow.parquet as pq

    from logsentinelai_ray.config import CorpusConfig, IndexConfig
    from logsentinelai_ray.corpus import generate_corpus
    from logsentinelai_ray.index.build import build_index

    root = tmp_path_factory.mktemp("rgsplit")
    tbl = generate_corpus(CorpusConfig(n_docs=200, seed=91))
    cfg = IndexConfig(num_partitions=4, salt_buckets=2, block_size=32)

    one = str(root / "one")
    many = str(root / "many")
    os.makedirs(one)
    os.makedirs(many)
    pq.write_table(tbl, f"{one}/c.parquet")  # single row group
    pq.write_table(tbl, f"{many}/c.parquet", row_group_size=37)
    assert pq.ParquetFile(f"{many}/c.parquet").metadata.num_row_groups > 3

    dm = {}
    for label, src in (("one", one), ("many", many)):
        idx = str(root / f"idx_{label}")
        build_index(src, idx, cfg, corpus_tag=label)
        dm[label] = pq.read_table(
            os.path.join(idx, "docmap")).sort_by("doc_id").to_pydict()
        # split path actually produced more than one docs part file
        if label == "many":
            assert len(glob.glob(os.path.join(idx, "docs",
                                              "*.parquet"))) > 3
    assert dm["one"] == dm["many"]


def test_shard_death_recovers(ray_session, small_index):
    """IndexShard actors are restartable pure readers: kill one shard's
    process mid-session; subsequent queries must succeed with identical
    results (Ray restarts the actor, which reloads its segments)."""
    import ray as _ray

    from logsentinelai_ray.query.shards import SearchEngine

    idx_dir, cfg = small_index
    eng = SearchEngine(idx_dir, num_shards=3)
    try:
        before = eng.search("error merge window", k=10,
                            with_meta=False).to_pydict()
        # kill the shard processes hard (no_restart=False → Ray restarts)
        for s in eng.shards:
            _ray.kill(s, no_restart=False)
        eng._term_cache.clear()
        eng._contrib_cache.clear()
        eng._absent_terms.clear()
        eng._contrib_cached = 0
        eng._pending.clear()
        after = eng.search("error merge window", k=10,
                           with_meta=False).to_pydict()
        assert after == before
    finally:
        eng.shutdown()


def test_wand_vec_span_windows_and_decoded_cache(engine):
    """Tiny span_cap forces many dense-scratch windows; the decoded
    (ids, contrib) slice path must give identical results to block
    decode, including mixed (some cursors cached, some not)."""
    import numpy as np

    from logsentinelai_ray.analysis import tokenize_py
    from logsentinelai_ray.query.bm25 import bm25_idf
    from logsentinelai_ray.query.postings import PostingsCursor, TermPostings
    from logsentinelai_ray.query.wand import block_max_wand_vec

    stats = engine.stats
    n = int(stats["n_docs"])
    for query in QUERY_SET[:4]:
        terms = sorted(set(tokenize_py(query, int(stats["max_token_len"]))))
        rows = engine._fetch_terms(terms)
        present = [t for t in terms if t in rows]

        def mk():
            out = []
            for t in present:
                tp = TermPostings(rows[t])
                idf = bm25_idf(n, int(tp.df))
                out.append(PostingsCursor(tp, idf, stats["k1"],
                                          stats["b"], stats["avgdl"]))
            return out

        def full_decode(c):
            ids, tfs, dls = c.tp.decode_all()
            tf = tfs.astype(np.float64)
            dl = dls.astype(np.float64)
            contrib = c.idf * (tf * (c.k1 + 1.0)
                               / (tf + c.k1 * (1.0 - c.b
                                               + c.b * dl / c.avgdl)))
            return ids, contrib

        exp = block_max_wand_vec(mk(), 20)
        got_span = block_max_wand_vec(mk(), 20, span_cap=37)
        assert got_span == exp, (query, "span windows")
        cursors = mk()
        dec_all = [full_decode(c) for c in cursors]
        got_dec = block_max_wand_vec(cursors, 20, decoded=dec_all)
        assert got_dec == exp, (query, "decoded")
        cursors = mk()
        dec_mixed = [full_decode(c) if i % 2 == 0 else None
                     for i, c in enumerate(cursors)]
        got_mix = block_max_wand_vec(cursors, 20, decoded=dec_mixed,
                                     span_cap=101)
        assert got_mix == exp, (query, "mixed decoded + span windows")


def test_stemmed_index_rank_identity(ray_session, small_corpus,
                                     tmp_path_factory):
    """stem="minimal_english" end-to-end: pluralized queries hit the
    stemmed dictionary (query terms stem through the SAME rule), and
    TAAT + forced WAND both equal the analyzer-aware oracle
    bit-for-bit. Also pins the stem+positions build guard."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from logsentinelai_ray.config import IndexConfig
    from logsentinelai_ray.index.build import build_index
    from logsentinelai_ray.query.bm25 import BM25Oracle
    from logsentinelai_ray.query.shards import SearchEngine

    cfg = IndexConfig(num_partitions=8, salt_buckets=2, block_size=32,
                      stem="minimal_english")
    idx = str(tmp_path_factory.mktemp("stem") / "idx")
    build_index(rd.from_arrow(small_corpus), idx, cfg,
                corpus_tag="stem-test")
    eng = SearchEngine(idx, num_shards=3)
    docs = pq.read_table(f"{idx}/docs")
    orc = BM25Oracle(list(zip(docs["doc_id"].to_pylist(),
                              docs["content"].to_pylist())), None, cfg)
    try:
        for q in ["authentication failures errors",
                  "merges windows", "sorted arrays values"]:
            exp = orc.search(q, k=10)
            for strat in ("taat", "wand"):
                res = eng.search(q, k=10, with_meta=False,
                                 strategy=strat).to_pandas()
                got = list(zip(res["doc_id"].tolist(),
                               res["score"].tolist()))
                assert got == exp, (strat, q)
        # singular and plural query forms retrieve identically
        a = eng.search("errors", k=5, with_meta=False).to_pandas()
        b = eng.search("error", k=5, with_meta=False).to_pandas()
        assert a["doc_id"].tolist() == b["doc_id"].tolist()
    finally:
        eng.shutdown()
    with pytest.raises(ValueError, match="store_positions"):
        build_index(rd.from_arrow(small_corpus), idx + "_bad",
                    IndexConfig(stem="minimal_english",
                                store_positions=True),
                    corpus_tag="bad")
    with pytest.raises(ValueError, match="unknown stemmer"):
        build_index(rd.from_arrow(small_corpus), idx + "_bad2",
                    IndexConfig(stem="porter2"), corpus_tag="bad2")


def test_profile_counters_and_pruning(engine, oracle):
    """SearchEngine.profile: deterministic WAND pruning counters.
    Invariants: considered + skipped == total atoms, counters stable
    across runs, and the profiled query's top-k equals search()'s.
    With a tight sparse_df_cap (forcing hot terms onto block
    intervals) and k=1, block-max pruning must actually skip atoms
    and score a strict subset of the corpus."""
    p = engine.profile("error merge spark window").to_pylist()[0]
    assert p["atoms_considered"] + p["atoms_skipped"] == p["n_atoms"]
    assert p["hits"] == 10 and p["n_terms"] == 4
    # determinism: a second run returns identical counters
    assert engine.profile("error merge spark window").to_pylist()[0] \
        == p
    # the profiled path IS the search path (rank identity)
    exp = [d for d, _ in oracle.search("error merge spark window",
                                       k=10)]
    res = engine.search("error merge spark window", k=10,
                        with_meta=False, strategy="wand")
    assert res["doc_id"].to_pylist() == exp
    # forced block-interval regime: pruning visibly skips work
    n_docs = int(engine.stats["n_docs"])
    q = engine.profile("authentication error merge window", k=1,
                       sparse_df_cap=8, first_batch_atoms=4) \
        .to_pylist()[0]
    assert q["atoms_skipped"] > 0
    assert q["docs_scored"] < n_docs


def test_sort_occurrences_packed_equals_lexsort():
    """Property: the packed-uint64 occurrence sort equals the 3-key
    lexsort fallback on random inputs (incl. ties in every key and a
    doc-range base offset), and the forced fallback (wide key) agrees
    too."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from logsentinelai_ray.index.build import _sort_occurrences

    @settings(max_examples=60, deadline=None)
    @given(st.integers(1, 300), st.integers(0, 2**20), st.integers(1, 9))
    def run(n, base, ndict):
        rng = np.random.default_rng(n * 1_000_003 + base)
        codes = rng.integers(0, ndict, n).astype(np.int64)
        # rank = lexicographic rank of a shuffled dictionary
        order = rng.permutation(ndict).astype(np.int64)
        rank = np.empty(ndict, dtype=np.int64)
        rank[order] = np.arange(ndict)
        doc = (base + rng.integers(0, 50, n)).astype(np.int64)
        pos = rng.integers(0, 30, n).astype(np.int64)
        got = _sort_occurrences(codes, rank, order, doc, pos,
                                base, ndict)
        idx = np.lexsort((pos, doc, rank[codes]))
        exp = (codes[idx].astype(np.int32), doc[idx],
               pos[idx].astype(np.int32))
        for g, e in zip(got, exp):
            assert np.array_equal(g, e)
        # force the fallback (impossible 64-bit fit) — same answer
        wide = _sort_occurrences(codes, rank, order,
                                 doc + (1 << 62), pos, 0, ndict)
        assert np.array_equal(wide[0], exp[0])
        assert np.array_equal(wide[2], exp[2])

    run()


def test_resume_rebuilds_positions_stage(small_corpus, tmp_path):
    """Kill-and-resume DURING the positions consolidation: wiping the
    stage marker + one part's consolidated files re-runs the stage
    idempotently (deterministic file names, atomic writes) and phrase
    results are unchanged."""
    import shutil

    import ray.data as rd

    from logsentinelai_ray.config import IndexConfig
    from logsentinelai_ray.index import manifest as mf
    from logsentinelai_ray.index.build import build_index
    from logsentinelai_ray.query.shards import SearchEngine

    cfg = IndexConfig(num_partitions=4, salt_buckets=2, block_size=16,
                      store_positions=True)
    idx = str(tmp_path / "idx")
    build_index(rd.from_arrow(small_corpus), idx, cfg, corpus_tag="p")
    e1 = SearchEngine(idx, num_shards=2)
    before = e1.phrase_topk("authentication failure", k=10,
                            with_meta=False).to_pydict()
    e1.shutdown()
    # simulate a crash mid-positions: marker gone, one part's
    # consolidated dir partially deleted
    stages = mf.read_stage(idx, "positions")
    assert stages  # stage had been marked
    os.remove(os.path.join(idx, "positions", "_SUCCESS"))
    shutil.rmtree(os.path.join(idx, "positions", "part=1"))
    meta = build_index(rd.from_arrow(small_corpus), idx, cfg,
                      corpus_tag="p")
    assert "positions_s" in meta["timings"]
    assert os.path.isdir(os.path.join(idx, "positions", "part=1"))
    e2 = SearchEngine(idx, num_shards=2)
    after = e2.phrase_topk("authentication failure", k=10,
                           with_meta=False).to_pydict()
    e2.shutdown()
    assert before == after
