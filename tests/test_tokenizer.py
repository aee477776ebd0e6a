"""Tokenizer golden cases + Arrow/Python equivalence (SURVEY.md §5.2.1)."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from logsentinelai_ray.analysis import tokenize_batch_arrow, tokenize_py

GOLDEN = {
    "parseHttpRequest": ["parse", "http", "request"],
    "auth_failure_count": ["auth", "failure", "count"],
    "HTTPServer": ["http", "server"],
    "XMLHttpRequest2": ["xml", "http", "request2"],
    "/etc/passwd": ["etc", "passwd"],
    "robots.txt": ["robots", "txt"],
    "SELECT UNION": ["select", "union"],
    "a_b-c.d/e": ["a", "b", "c", "d", "e"],
    "": [],
    "   \n\t ": [],
    "漢字 only": ["only"],
    "MiXeD9Case": ["mi", "xe", "d9", "case"],
}


def test_golden_cases():
    for text, expected in GOLDEN.items():
        assert tokenize_py(text) == expected, text


def test_max_token_len():
    long = "a" * 200
    assert tokenize_py(long, max_token_len=64) == ["a" * 64]


def _arrow_tokens(texts):
    ri, toks, dl = tokenize_batch_arrow(pa.array(texts, pa.string()))
    per_row = [[] for _ in texts]
    for i, t in zip(ri, toks.to_pylist()):
        per_row[i].append(t)
    return per_row, dl


def test_arrow_matches_python_on_goldens():
    texts = list(GOLDEN)
    per_row, dl = _arrow_tokens(texts)
    for i, text in enumerate(texts):
        assert per_row[i] == tokenize_py(text)
        assert dl[i] == len(tokenize_py(text))


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(max_size=80), min_size=0, max_size=20))
def test_arrow_matches_python_property(texts):
    per_row, dl = _arrow_tokens(texts)
    for i, text in enumerate(texts):
        expected = tokenize_py(text)
        assert per_row[i] == expected
        assert dl[i] == len(expected)


def test_null_content_is_empty():
    per_row, dl = _arrow_tokens(["x", None, "y z"])
    assert per_row == [["x"], [], ["y", "z"]]
    assert list(dl) == [1, 0, 2]


@settings(max_examples=150, deadline=None)
@given(st.lists(st.text(max_size=80), min_size=1, max_size=20))
def test_polars_and_re2_paths_identical(texts):
    """The polars fast path and the RE2 fallback must stay
    byte-identical — rank identity vs the oracle depends on it."""
    from logsentinelai_ray.analysis.tokenizer import (
        _tokenize_batch_polars,
        _tokenize_batch_re2,
    )

    arr = pa.array(texts, pa.string())
    r1, f1, d1 = _tokenize_batch_re2(arr, 64)
    r2, f2, d2 = _tokenize_batch_polars(arr, 64)
    assert (r1 == r2).all()
    assert f1.equals(f2)
    assert (d1 == d2).all()


def test_stem_minimal_english_goldens():
    """Lucene EnglishMinimalStemFilter parity on the classic edge
    cases (including the deliberately crude ones)."""
    from logsentinelai_ray.analysis.tokenizer import stem_minimal_english
    cases = {
        "errors": "error", "merges": "merge", "windows": "window",
        "glass": "glass", "bus": "bus", "us": "us", "miss": "miss",
        "bodies": "body", "pies": "py", "ties": "ty",
        "aies": "aies", "goes": "goes", "ies": "ies",
        "is": "is", "as": "as", "s": "s", "a": "a", "": "",
        "its": "it", "this": "thi", "classes": "classe",
        "tubes": "tube", "window": "window",
    }
    for w, exp in cases.items():
        assert stem_minimal_english(w) == exp, w


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(
    alphabet="abcdefgiopstuy0", max_size=8), min_size=1, max_size=30))
def test_stem_vectorized_equals_scalar(words):
    """stem_tokens_arrow (2 RE2 passes + if_else) must equal the
    scalar rule on arbitrary token-ish strings — the engine stems
    index tokens vectorized and query terms scalar, so any divergence
    breaks rank identity."""
    from logsentinelai_ray.analysis.tokenizer import (
        stem_minimal_english,
        stem_tokens_arrow,
    )

    arr = pa.array(words, pa.string())
    vec = stem_tokens_arrow(arr).to_pylist()
    assert vec == [stem_minimal_english(w) for w in words]


def test_analyze_py_stems_query_terms():
    from logsentinelai_ray.analysis.tokenizer import analyze_py
    assert analyze_py("parseErrors mergesFiles", 64,
                      "minimal_english") == \
        ["parse", "error", "merge", "files"[:-1]]
