"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
``entry()``, the ``queries()`` callables and the library code never call
``ray.init()`` / ``ray.shutdown()``.

- ``entry()``        : flagship pipeline — build the inverted index over the
                       sf0.001 documents corpus and run a BM25 top-k query.
- ``queries()``      : one callable per implemented operator/pipeline from
                       SURVEY.md §2 (+ the training-data operator set).
- ``oracle_sql()``   : DuckDB-equivalent SQL for every SQL-expressible key.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: index build + BM25 top-k over sf0.001 (driver smoke)."""
    from logsentinelai_ray.pipelines.queries import _docs_engine

    eng = _docs_engine("/root/testdata/sf0.001")
    return eng.search("merge spark window", k=10)


def queries() -> dict[str, Callable[[str], Any]]:
    from logsentinelai_ray.pipelines import QUERY_REGISTRY

    return dict(QUERY_REGISTRY)


def oracle_sql() -> dict[str, str]:
    from logsentinelai_ray.pipelines import ORACLE_SQL

    return dict(ORACLE_SQL)
