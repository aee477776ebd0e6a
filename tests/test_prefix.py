"""Prefix/wildcard term expansion (ES prefix-query analog) tests."""

import pyarrow.parquet as pq
import pytest

from logsentinelai_ray.analysis.tokenizer import tokenize_py


@pytest.fixture(scope="module")
def vocab_df(small_index):
    """(term -> df) ground truth from the indexed docs."""
    idx_dir, _cfg = small_index
    tbl = pq.read_table(f"{idx_dir}/docs", columns=["content"])
    df = {}
    for content in tbl["content"].to_pylist():
        for t in set(tokenize_py(content)):
            df[t] = df.get(t, 0) + 1
    return df


def test_expand_prefix_matches_vocabulary(engine, vocab_df):
    prefix = sorted(vocab_df)[0][:1]
    exp = engine.expand_prefix(prefix, max_expansions=10 ** 6)
    got = dict(zip(exp["term"].to_pylist(), exp["df"].to_pylist()))
    want = {t: n for t, n in vocab_df.items() if t.startswith(prefix)}
    assert got == want
    terms = exp["term"].to_pylist()
    assert terms == sorted(terms)


def test_expand_prefix_excludes_field_terms(engine):
    """'lang:python' etc. must never leak out of a 'lang' prefix scan."""
    exp = engine.expand_prefix("lang", max_expansions=10 ** 6)
    assert all(":" not in t for t in exp["term"].to_pylist())


def test_expand_prefix_cap_keeps_highest_df(engine, vocab_df):
    prefix = sorted(vocab_df)[0][:1]
    full = {t: n for t, n in vocab_df.items() if t.startswith(prefix)}
    if len(full) < 3:
        pytest.skip("vocabulary too small for a cap test")
    cap = len(full) - 1
    exp = engine.expand_prefix(prefix, max_expansions=cap)
    got = dict(zip(exp["term"].to_pylist(), exp["df"].to_pylist()))
    assert len(got) == cap
    # the capped set is the df-desc (term-asc tiebreak) head of the full set
    want = dict(sorted(full.items(),
                       key=lambda kv: (-kv[1], kv[0]))[:cap])
    assert got == want


def test_empty_prefix_rejected(engine):
    with pytest.raises(ValueError, match="prefix"):
        engine.expand_prefix("")


def test_prefix_search_equals_explicit_multi_term(engine, vocab_df):
    prefix = sorted(vocab_df)[0][:1]
    terms = sorted(t for t in vocab_df if t.startswith(prefix))
    res = engine.prefix_search(prefix, k=15, max_expansions=10 ** 6)
    explicit = engine.search(" ".join(terms), k=15, with_meta=False)
    assert res["doc_id"].to_pylist() == explicit["doc_id"].to_pylist()
    assert res["score"].to_pylist() == explicit["score"].to_pylist()


def test_prefix_search_no_match_is_empty(engine):
    res = engine.prefix_search("zzzznothing", k=5)
    assert res.num_rows == 0
