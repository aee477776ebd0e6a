"""Sorted data layout (index/sorted.py): global order across files,
early-terminating top-n, manifest-pruned range scans."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest

from logsentinelai_ray.index.sorted import (build_sorted_layout,
                                            sorted_range, sorted_topn)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def layout(ray_session, tmp_path_factory):
    import ray.data as rd

    out = str(tmp_path_factory.mktemp("sorted") / "docs_by_len")
    ds = rd.read_parquet(os.path.join(SF, "documents.parquet"),
                         columns=["doc_id", "n_chars"])
    build_sorted_layout(ds, out, key="n_chars", id_col="doc_id",
                        num_parts=8)
    return out


def test_manifest_ranges_disjoint_and_ordered(layout):
    with open(os.path.join(layout, "manifest.json")) as f:
        man = json.load(f)
    parts = man["parts"]
    assert len(parts) > 1
    assert sum(p["rows"] for p in parts) == 500
    for a, b in zip(parts, parts[1:]):
        assert a["part"] < b["part"]
        assert a["kmax"] <= b["kmin"]  # ranges in order, non-crossing


def test_topn_early_terminates_and_is_exact(layout):
    import duckdb

    out, stats = sorted_topn(layout, 50)
    assert stats["files_read"] < stats["files_total"]
    exp = duckdb.sql(
        f"SELECT doc_id, n_chars FROM read_parquet("
        f"'{SF}/documents.parquet') ORDER BY n_chars, doc_id LIMIT 50"
    ).fetch_arrow_table()
    assert out["doc_id"].to_pylist() == exp["doc_id"].to_pylist()
    assert out["n_chars"].to_pylist() == exp["n_chars"].to_pylist()


def test_range_scan_prunes_files(layout):
    import duckdb

    out, stats = sorted_range(layout, 110, 125)
    assert stats["files_read"] < stats["files_total"]
    exp = duckdb.sql(
        f"SELECT doc_id, n_chars FROM read_parquet("
        f"'{SF}/documents.parquet') WHERE n_chars BETWEEN 110 AND 125 "
        f"ORDER BY n_chars, doc_id").fetch_arrow_table()
    assert out["doc_id"].to_pylist() == exp["doc_id"].to_pylist()


def test_global_order_across_files(layout):
    out, _ = sorted_topn(layout, 500)
    k = np.array(out["n_chars"].to_pylist())
    d = np.array(out["doc_id"].to_pylist())
    key = k.astype(np.int64) * (d.max() + 1) + d
    assert (np.diff(key) > 0).all()
