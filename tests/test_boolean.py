"""ES-bool-query and facet-aggregation semantics vs brute force."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from logsentinelai_ray.analysis.tokenizer import tokenize_py


@pytest.fixture(scope="module")
def doc_tokens(small_index):
    idx_dir, _cfg = small_index
    tbl = pq.read_table(f"{idx_dir}/docs",
                        columns=["doc_id", "content", "lang"])
    return [(d, set(tokenize_py(c)), lang) for d, c, lang in
            zip(tbl["doc_id"].to_pylist(), tbl["content"].to_pylist(),
                tbl["lang"].to_pylist())]


def _pick_terms(doc_tokens):
    """(common, mid, rare-ish) terms actually present in the corpus."""
    from collections import Counter

    df = Counter(t for _d, toks, _l in doc_tokens for t in toks)
    ranked = [t for t, _n in df.most_common()]
    return ranked[0], ranked[len(ranked) // 3], ranked[2 * len(ranked) // 3]


def test_boolean_matches_bruteforce(engine, doc_tokens):
    common, mid, rare = _pick_terms(doc_tokens)
    res = engine.boolean_search(must=f"{common} {mid}", should=rare,
                                must_not="error", k=10 ** 6)
    got = set(res["doc_id"].to_pylist())
    exp = {d for d, toks, _l in doc_tokens
           if common in toks and mid in toks and "error" not in toks}
    assert got == exp


def test_boolean_scores_match_plain_search(engine, doc_tokens):
    """Scores must equal the plain multi-term query on the same docs."""
    common, mid, rare = _pick_terms(doc_tokens)
    res = engine.boolean_search(must=common, should=f"{mid} {rare}",
                                k=10 ** 6)
    full = engine.search(f"{common} {mid} {rare}", k=10 ** 6,
                         with_meta=False)
    by_id = dict(zip(full["doc_id"].to_pylist(),
                     full["score"].to_pylist()))
    for d, s in zip(res["doc_id"].to_pylist(), res["score"].to_pylist()):
        assert s == by_id[d]


def test_boolean_no_must_is_should_union(engine, doc_tokens):
    common, mid, _ = _pick_terms(doc_tokens)
    res = engine.boolean_search(should=f"{common} {mid}", k=10 ** 6)
    got = set(res["doc_id"].to_pylist())
    exp = {d for d, toks, _l in doc_tokens
           if common in toks or mid in toks}
    assert got == exp


def test_boolean_missing_must_term_empty(engine):
    res = engine.boolean_search(must="zzznosuchterm", should="error")
    assert res.num_rows == 0


def test_facets_match_bruteforce(engine, doc_tokens):
    common, mid, rare = _pick_terms(doc_tokens)
    text = f"{common} {mid} {rare}"
    res = engine.search_facets(text, field="lang")
    got = dict(zip(res["lang"].to_pylist(), res["n_docs"].to_pylist()))
    qs = set(tokenize_py(text))
    exp = {}
    for _d, toks, lang in doc_tokens:
        if toks & qs:
            exp[lang] = exp.get(lang, 0) + 1
    assert got == exp
    # sorted by field value
    assert res["lang"].to_pylist() == sorted(res["lang"].to_pylist())
