"""ES|QL mini-dialect executor (query/esql.py): parser, expression
compiler, column pruning, and full-pipeline cross-checks vs DuckDB."""

import duckdb
import pyarrow as pa
import pytest

from logsentinelai_ray.query.esql import (BinOp, Call, Field, Lit,
                                          _pipeline_fields, eval_expr,
                                          execute_esql, parse_esql,
                                          parse_expr)

SF = "/root/testdata/sf0.001"


def test_expr_precedence():
    e = parse_expr('a + b * 2 > 10 AND NOT lang == "go"')
    assert isinstance(e, BinOp) and e.op == "and"
    cmp_ = e.left
    assert cmp_.op == ">" and cmp_.left.op == "+"
    assert cmp_.left.right.op == "*"


def test_expr_parens_and_unary():
    e = parse_expr("-(a + 1) * 2")
    assert e.op == "*" and e.left.op == "neg"


def test_parse_pipeline_shapes():
    cmds = parse_esql(
        'FROM events | WHERE v > 1 | EVAL m = ROUND(v * 2), n2 = m + 1 '
        "| STATS c = COUNT(*), s = SUM(m) BY user_id "
        "| SORT c DESC, user_id ASC | LIMIT 5 | KEEP user_id, c")
    kinds = [type(c).__name__ for c in cmds]
    assert kinds == ["From", "Where", "Eval", "Stats", "Sort", "Limit",
                     "Keep"]
    stats = cmds[3]
    assert [a[0] for a in stats.aggs] == ["c", "s"]
    assert stats.by == ["user_id"]


def test_column_pruning_excludes_derived():
    cmds = parse_esql(
        "FROM events | EVAL m = value + 1 "
        "| STATS n = COUNT(*), s = SUM(m) BY user_id | SORT n DESC")
    assert _pipeline_fields(cmds) == {"value", "user_id"}


def test_eval_expr_vectorized():
    t = pa.table({"a": [1, 2, 3], "s": ["X", "y", "Z"]})
    out = eval_expr(parse_expr("a * 2 + 1"), t)
    assert out.to_pylist() == [3, 5, 7]
    low = eval_expr(parse_expr("TO_LOWER(s)"), t)
    assert low.to_pylist() == ["x", "y", "z"]
    mask = eval_expr(parse_expr('a >= 2 AND s != "Z"'), t)
    assert mask.to_pylist() == [False, True, False]


def test_unknown_command_and_bad_agg():
    with pytest.raises(ValueError):
        parse_esql("FROM x | FROBNICATE y")
    with pytest.raises(ValueError):
        parse_esql("FROM x | STATS a = MEDIAN(v)")
    with pytest.raises(ValueError):
        parse_esql("FROM x | STATS a = COUNT(v)")


def test_dissect_pattern_compiles():
    cmds = parse_esql(
        'FROM events | DISSECT props "{\\"k\\": %{kval}}"')
    d = cmds[1]
    assert d.names == ["kval"]
    import re as _re
    m = _re.search(d.regex, '{"k": 87}')
    assert m and m.group("kval") == "87"


def test_dissect_multi_key_lazy_inner():
    cmds = parse_esql('FROM x | DISSECT f "%{a} - %{b}"')
    import re as _re
    m = _re.search(cmds[1].regex, "one - two - three")
    assert m.group("a") == "one" and m.group("b") == "two - three"


def test_enrich_parse_and_errors():
    cmds = parse_esql(
        "FROM orders | ENRICH customer ON o_custkey WITH c_name")
    e = cmds[1]
    assert (e.table, e.on, e.with_cols) == ("customer", "o_custkey",
                                            ["c_name"])
    with pytest.raises(ValueError):
        parse_esql("FROM orders | ENRICH customer o_custkey")


def test_where_keep_limit_vs_duckdb(ray_session):
    out = execute_esql(
        'FROM documents | WHERE lang == "en" AND n_chars > 120 '
        "| KEEP doc_id, n_chars | SORT doc_id ASC | LIMIT 7", SF)
    exp = duckdb.sql(
        f"SELECT doc_id, n_chars FROM read_parquet("
        f"'{SF}/documents.parquet') WHERE lang = 'en' AND "
        f"n_chars > 120 ORDER BY doc_id LIMIT 7").fetch_arrow_table()
    assert out.num_rows == 7
    assert out.to_pydict() == exp.to_pydict()


def test_global_stats_no_by(ray_session):
    out = execute_esql(
        'FROM events | WHERE event_type == "error" '
        "| STATS n = COUNT(*)", SF)
    exp = duckdb.sql(
        f"SELECT count(*)::BIGINT AS n FROM read_parquet("
        f"'{SF}/events.parquet') WHERE event_type = 'error'") \
        .fetch_arrow_table()
    assert out["n"].to_pylist() == exp["n"].to_pylist()


def test_implicit_limit_1000(ray_session):
    # ES|QL's documented default: no LIMIT in the pipeline -> at most
    # 1000 rows come back
    out = execute_esql("FROM events | KEEP event_id", SF)
    import duckdb as _d
    total = _d.sql(f"SELECT count(*) FROM read_parquet("
                   f"'{SF}/events.parquet')").fetchone()[0]
    assert out.num_rows == min(1000, total)
