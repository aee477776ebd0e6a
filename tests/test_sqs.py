"""simple_query_string (query/sqs.py): parser shape, the leniency
contract (no input raises), and end-to-end agreement with a pure-Python
brute-force evaluator over the same corpus for every operator kind."""

import numpy as np
import pytest

from logsentinelai_ray.analysis.tokenizer import tokenize_py
from logsentinelai_ray.query.kql import kql_ids
from logsentinelai_ray.query.sqs import parse_sqs


def test_parse_operators_and_precedence():
    # adjacency = default OR; '+' binds tighter than '|'/adjacency
    assert parse_sqs("a b") == ("or", [("term", "a"), ("term", "b")])
    assert parse_sqs("a | b") == ("or", [("term", "a"), ("term", "b")])
    assert parse_sqs("a + b") == ("and", [("term", "a"), ("term", "b")])
    assert parse_sqs("a + b | c") == \
        ("or", [("and", [("term", "a"), ("term", "b")]), ("term", "c")])
    assert parse_sqs("a + -b") == \
        ("and", [("term", "a"), ("not", ("term", "b"))])
    assert parse_sqs('"x y" pre*') == \
        ("or", [("phrase", "x y"), ("prefix", "pre")])
    assert parse_sqs("(a | b) + c") == \
        ("and", [("or", [("term", "a"), ("term", "b")]), ("term", "c")])
    # default_operator="and": adjacency binds as AND
    assert parse_sqs("a b", default_operator="and") == \
        ("and", [("term", "a"), ("term", "b")])
    assert parse_sqs("a b | c", default_operator="and") == \
        ("or", [("and", [("term", "a"), ("term", "b")]), ("term", "c")])


def test_parse_leniency_never_raises():
    cases = {
        "": None,
        "   ": None,
        "|": None,
        "+ | -": None,
        "()": None,
        "a |": ("term", "a"),                  # dangling operator
        "| a": ("term", "a"),                  # leading operator
        "(a": ("term", "a"),                   # unmatched ( closes at EOS
        "a)": ("term", "a"),                   # stray ) dropped
        ")a": ("term", "a"),
        '"unterminated x': ("phrase", "unterminated x"),
        "--a": ("term", "a"),                  # double negation collapses
        "-": None,
        "*": None,                             # bare star: empty stem
        "a + ()": ("term", "a"),               # empty group dropped
    }
    for q, want in cases.items():
        assert parse_sqs(q) == want, q


@pytest.mark.parametrize("q", ["", "|", "-", "((("])
def test_engine_lenient_empty(q, sqs_engine):
    eng, _rows = sqs_engine
    assert eng.simple_query_string(q, k=5).num_rows == 0


@pytest.fixture(scope="module")
def sqs_engine(ray_session, tmp_path_factory):
    import ray.data as rd

    from logsentinelai_ray.config import CorpusConfig, IndexConfig
    from logsentinelai_ray.corpus import generate_corpus
    from logsentinelai_ray.index.build import build_index
    from logsentinelai_ray.query.shards import SearchEngine

    import pyarrow.parquet as pq

    d = str(tmp_path_factory.mktemp("sqs") / "idx")
    tbl = generate_corpus(CorpusConfig(n_docs=400))
    build_index(rd.from_arrow(tbl), d,
                IndexConfig(num_partitions=4, salt_buckets=2,
                            block_size=32, store_positions=True),
                corpus_tag="sqs")
    eng = SearchEngine(d, num_shards=2)
    docs = pq.read_table(d + "/docs")
    rows = {did: tokenize_py(content)
            for did, content in zip(docs["doc_id"].to_pylist(),
                                    docs["content"].to_pylist())}
    yield eng, rows
    eng.shutdown()


def _brute(rows, q: str, default_operator: str = "or") -> list[int]:
    ast = parse_sqs(q, default_operator)
    if ast is None:
        return []

    def ids(node) -> set:
        k = node[0]
        if k == "term":
            toks = set(tokenize_py(node[1]))
            return {d for d, t in rows.items() if toks & set(t)}
        if k == "prefix":
            return {d for d, t in rows.items()
                    if any(x.startswith(node[1]) for x in t)}
        if k == "phrase":
            want = tokenize_py(node[1])
            n = len(want)
            return {d for d, t in rows.items()
                    if any(t[i:i + n] == want
                           for i in range(len(t) - n + 1))}
        if k == "or":
            return set().union(*(ids(p) for p in node[1]))
        if k == "and":
            parts = [ids(p) for p in node[1]]
            return set.intersection(*parts)
        if k == "not":
            return set(rows) - ids(node[1])
        raise AssertionError(k)

    return sorted(ids(ast))


SQS_QUERIES = [
    "error",
    "error + timeout",
    "error timeout",                        # adjacency = OR
    "error | timeout",
    "error + -timeout",
    "-error",                               # pure negation: complement
    '"connection timeout"',
    'error + "connection timeout"',
    "auth*",
    "error + auth*",
    "(error | timeout) + auth*",
    'timeout + (error | "connection refused") + -auth*',
    'error + "unterminated',                # lenient phrase to EOS
    "error | timeout |",                    # dangling operator
]


@pytest.mark.parametrize("q", SQS_QUERIES)
def test_sqs_matches_brute_force(sqs_engine, q):
    eng, rows = sqs_engine
    ast = parse_sqs(q)
    got = kql_ids(eng, ast).tolist() if ast is not None else []
    assert got == _brute(rows, q), q


def test_sqs_default_operator_and(sqs_engine):
    eng, rows = sqs_engine
    q = "error timeout auth*"
    res = eng.simple_query_string(q, k=10 ** 6, default_operator="and")
    assert sorted(res["doc_id"].to_pylist()) == \
        _brute(rows, q, default_operator="and")


def test_sqs_ranking_is_taat_bm25(sqs_engine):
    """Ranking: BM25 over the positive text terms restricted to the
    match set must equal a plain search() over those terms filtered to
    the same ids — bit-identical scores."""
    eng, rows = sqs_engine
    q = "(error | timeout) + -refused"
    res = eng.simple_query_string(q, k=10)
    full = eng.search("error timeout", k=10 ** 6, with_meta=False,
                      strategy="taat")
    match = set(_brute(rows, q))
    exp = [(d, s) for d, s in zip(full["doc_id"].to_pylist(),
                                  full["score"].to_pylist())
           if d in match][:10]
    got = list(zip(res["doc_id"].to_pylist(), res["score"].to_pylist()))
    assert got == exp
