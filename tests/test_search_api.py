"""ES-API-parity surface: _count, search_after pagination,
more_like_this — vs brute force / the engine's own top-k."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from logsentinelai_ray.analysis.tokenizer import tokenize_py


@pytest.fixture(scope="module")
def doc_tokens(small_index):
    idx_dir, _cfg = small_index
    tbl = pq.read_table(f"{idx_dir}/docs", columns=["doc_id", "content"])
    return [(d, tokenize_py(c)) for d, c in
            zip(tbl["doc_id"].to_pylist(), tbl["content"].to_pylist())]


def test_match_count_vs_bruteforce(engine, doc_tokens):
    toks0 = doc_tokens[0][1]
    text = f"{toks0[0]} {toks0[3]} zzzmissing"
    qs = set(tokenize_py(text))
    exp = sum(1 for _d, toks in doc_tokens if qs & set(toks))
    assert engine.match_count(text) == exp
    assert engine.match_count("zzzmissing qqqalsomissing") == 0


def test_search_after_pages_equal_topk(engine, doc_tokens):
    """Paging through with search_after must reproduce one big top-k,
    scores bit-identical."""
    toks0 = doc_tokens[0][1]
    text = " ".join(toks0[:4])
    full = engine.search(text, k=50, with_meta=False)
    pages = []
    cursor = None
    while len(pages) * 10 < full.num_rows:
        page = engine.search_after(text, k=10, after=cursor)
        if page.num_rows == 0:
            break
        pages.append(page)
        cursor = (page["score"][page.num_rows - 1].as_py(),
                  page["doc_id"][page.num_rows - 1].as_py())
    got_ids = [d for p in pages for d in p["doc_id"].to_pylist()][:50]
    got_scores = [s for p in pages for s in p["score"].to_pylist()][:50]
    assert got_ids == full["doc_id"].to_pylist()
    assert got_scores == full["score"].to_pylist()


def test_search_after_none_is_page_one(engine, doc_tokens):
    text = " ".join(doc_tokens[0][1][:3])
    a = engine.search_after(text, k=10)
    b = engine.search(text, k=10, with_meta=False, strategy="taat")
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()


def test_more_like_this_excludes_source(engine, doc_tokens):
    src = doc_tokens[0][0]
    res = engine.more_like_this(src, max_terms=5, k=20)
    assert src not in res["doc_id"].to_pylist()
    assert res.num_rows > 0


def test_more_like_this_equals_manual_query(engine, doc_tokens):
    """MLT == plain search over the doc's top tf*idf terms, minus the
    source doc."""
    from logsentinelai_ray.query.bm25 import bm25_idf

    src, toks = doc_tokens[0]
    n = len(doc_tokens)
    df = {}
    for _d, ts in doc_tokens:
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    tf = {}
    for t in toks:
        tf[t] = tf.get(t, 0) + 1
    ranked = sorted(tf, key=lambda t: (-tf[t] * bm25_idf(n, df[t]), t))
    terms = sorted(ranked[:5])
    res = engine.more_like_this(src, max_terms=5, k=15)
    manual = engine.search(" ".join(terms), k=10 ** 6, with_meta=False)
    exp = [(d, s) for d, s in zip(manual["doc_id"].to_pylist(),
                                  manual["score"].to_pylist())
           if d != src][:15]
    got = list(zip(res["doc_id"].to_pylist(), res["score"].to_pylist()))
    assert got == exp


def test_more_like_this_unknown_doc(engine):
    with pytest.raises(KeyError):
        engine.more_like_this(10 ** 12)
