"""queries() vs oracle_sql() parity — the local mirror of the driver's
correctness gate (row count + columns + order-insensitive values), run at
sf0.001 for speed; the driver runs the same comparison at sf0.01."""

import pytest

from tests.harness import compare

SF_DIR = "/root/testdata/sf0.001"


def _names():
    from logsentinelai_ray.pipelines import QUERY_REGISTRY

    return sorted(QUERY_REGISTRY)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(ray_session, name):
    ok, msg = compare(name, SF_DIR)
    assert ok, f"{name}: {msg}"


def test_entry_contract(ray_session):
    """Driver smoke: entry() runs with Ray pre-initialised and returns a
    non-empty, stable-schema result."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", "/root/repo/__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    res = mod.entry()
    pdf = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert len(pdf) >= 0
    assert {"rank", "doc_id", "score", "repo", "path", "lang",
            "sha256"} <= set(pdf.columns)
    qs, osql = mod.queries(), mod.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 25
