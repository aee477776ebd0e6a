"""KQL executor (query/kql.py): parser shape, and end-to-end agreement
with a pure-Python brute-force evaluator over the same corpus — every
clause kind (term, phrase, prefix wildcard, field value, field group,
and/or/not, implicit and, keyword wildcard)."""

import numpy as np
import pyarrow as pa
import pytest

from logsentinelai_ray.analysis.tokenizer import tokenize_py
from logsentinelai_ray.query.kql import kql_ids, parse_kql


def test_parse_precedence_and_implicit_and():
    ast = parse_kql("a or b and not c")
    assert ast == ("or", [("term", "a"),
                          ("and", [("term", "b"),
                                   ("not", ("term", "c"))])])
    # adjacency = implicit AND (KQL default)
    assert parse_kql("a b") == ("and", [("term", "a"), ("term", "b")])
    assert parse_kql('lang:en "x y"') == \
        ("and", [("field", "lang", ("term", "en")), ("phrase", "x y")])


def test_parse_field_groups_and_wildcards():
    assert parse_kql("lang:(en or de)") == \
        ("field", "lang", ("or", [("term", "en"), ("term", "de")]))
    assert parse_kql("repo:org1*") == ("field", "repo", ("prefix", "org1"))
    assert parse_kql("merg*") == ("prefix", "merg")


def test_parse_errors():
    for bad in ("", "(a", "a )", "lang:", "and"):
        with pytest.raises(ValueError):
            parse_kql(bad)


@pytest.fixture(scope="module")
def kql_engine(ray_session, tmp_path_factory):
    import ray.data as rd

    from logsentinelai_ray.config import CorpusConfig, IndexConfig
    from logsentinelai_ray.corpus import generate_corpus
    from logsentinelai_ray.index.build import build_index
    from logsentinelai_ray.query.shards import SearchEngine

    d = str(tmp_path_factory.mktemp("kql") / "idx")
    tbl = generate_corpus(CorpusConfig(n_docs=400))
    build_index(rd.from_arrow(tbl), d,
                IndexConfig(num_partitions=4, salt_buckets=2,
                            block_size=32, store_positions=True),
                corpus_tag="kql")
    eng = SearchEngine(d, num_shards=2)
    # brute-force view: doc_id -> (token list, lang, repo), via the
    # engine's own docmap + docs (ids are sorted-key ranks)
    import glob

    import pyarrow.parquet as pq

    docs = pq.read_table(sorted(glob.glob(d + "/docs/*.parquet"))[0]
                         if False else d + "/docs")
    rows = {}
    for did, content, lang, repo in zip(docs["doc_id"].to_pylist(),
                                        docs["content"].to_pylist(),
                                        docs["lang"].to_pylist(),
                                        docs["repo"].to_pylist()):
        rows[did] = (tokenize_py(content), lang, repo)
    yield eng, rows
    eng.shutdown()


def _brute(rows, q: str) -> list[int]:
    ast = parse_kql(q)

    def ids(node) -> set[int]:
        k = node[0]
        if k == "term":
            toks = set(tokenize_py(node[1]))
            return {d for d, (t, _, _) in rows.items()
                    if toks & set(t)}
        if k == "prefix":
            return {d for d, (t, _, _) in rows.items()
                    if any(x.startswith(node[1]) for x in t)}
        if k == "phrase":
            want = tokenize_py(node[1])
            n = len(want)
            return {d for d, (t, _, _) in rows.items()
                    if any(t[i:i + n] == want
                           for i in range(len(t) - n + 1))}
        if k == "field":
            field = node[1]

            def fid(vnode) -> set[int]:
                kk = vnode[0]
                if kk in ("term", "phrase"):
                    return {d for d, (_, lg, rp) in rows.items()
                            if (lg if field == "lang" else rp)
                            == vnode[1]}
                if kk == "prefix":
                    return {d for d, (_, lg, rp) in rows.items()
                            if (lg if field == "lang" else rp)
                            .startswith(vnode[1])}
                if kk == "or":
                    return set().union(*(fid(p) for p in vnode[1]))
                if kk == "and":
                    parts = [fid(p) for p in vnode[1]]
                    return set.intersection(*parts)
                if kk == "not":
                    return set(rows) - fid(vnode[1])
                raise AssertionError(kk)

            return fid(node[2])
        if k == "or":
            return set().union(*(ids(p) for p in node[1]))
        if k == "and":
            parts = [ids(p) for p in node[1]]
            return set.intersection(*parts)
        if k == "not":
            return set(rows) - ids(node[1])
        raise AssertionError(k)

    return sorted(ids(ast))


KQL_QUERIES = [
    "error",
    "error and timeout",
    "error timeout",                       # implicit and
    "error or timeout",
    "error and not timeout",
    "not error",
    '"connection timeout"',
    'error and "connection timeout"',
    "lang:python",
    "lang:(python or go)",
    "lang:python and error",
    "lang:python error not timeout",
    "(error or timeout) and lang:(python or java)",
    "auth*",
    "lang:python and auth*",
    "not lang:python and error",
]


@pytest.mark.parametrize("q", KQL_QUERIES)
def test_kql_ids_match_bruteforce(kql_engine, q):
    eng, rows = kql_engine
    got = kql_ids(eng, parse_kql(q)).tolist()
    assert got == _brute(rows, q), q


def test_kql_keyword_wildcard(kql_engine):
    eng, rows = kql_engine
    some_repo = next(iter({r for _, (_, _, r) in rows.items()}))
    prefix = some_repo[: len(some_repo) // 2]
    got = kql_ids(eng, parse_kql(f"repo:{prefix}*")).tolist()
    assert got == _brute(rows, f"repo:{prefix}*")
    assert got, "prefix of an existing repo must match"


def test_kql_search_ranks_by_bm25(kql_engine):
    """kql_search's ranking == plain search restricted to the KQL id
    set (same scorer, same tie-break)."""
    eng, _ = kql_engine
    res = eng.kql_search("error and lang:python", k=5)
    assert res.num_rows > 0
    ids = kql_ids(eng, parse_kql("error and lang:python"))
    totals = eng._score_id_set(["error"], ids)
    order = np.lexsort((ids, -totals))[:5]
    assert res["doc_id"].to_pylist() == [int(ids[i]) for i in order]
    assert res["score"].to_pylist() == \
        [float(totals[i]) for i in order]


def test_kql_pure_filter_constant_score(kql_engine):
    eng, rows = kql_engine
    res = eng.kql_search("lang:python", k=7)
    expect = _brute(rows, "lang:python")[:7]
    assert res["doc_id"].to_pylist() == expect
    assert set(res["score"].to_pylist()) == {0.0}
