"""Connected-components tests: driver union-find vs the distributed
label-propagation path on adversarial graph shapes."""

import numpy as np
import pyarrow as pa
import pytest

from logsentinelai_ray.dedup import connected_components


def _pairs(edges):
    a, b = zip(*edges) if edges else ((), ())
    return pa.table({"a": pa.array(list(a), pa.int64()),
                     "b": pa.array(list(b), pa.int64()),
                     "jaccard": pa.array([1.0] * len(edges),
                                         pa.float64())})


def _brute(edges):
    """Reference: repeated min-label sweeps until fixpoint."""
    nodes = sorted({x for e in edges for x in e})
    lbl = {n: n for n in nodes}
    changed = True
    while changed:
        changed = False
        for x, y in edges:
            m = min(lbl[x], lbl[y])
            for z in (x, y):
                if lbl[z] != m:
                    lbl[z] = m
                    changed = True
    return lbl


GRAPHS = {
    "two_components": [(1, 2), (2, 3), (10, 11)],
    "chain": [(i, i + 1) for i in range(50)],
    "reversed_chain": [(i + 1, i + 2) for i in reversed(range(40))],
    "star": [(100, i) for i in range(101, 120)],
    "bridge": [(1, 2), (3, 4), (2, 3), (5, 6)],
    "self_loop": [(7, 7), (7, 8)],
    "dup_edges": [(1, 2), (1, 2), (2, 1), (2, 3)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_driver_path_matches_bruteforce(name):
    edges = GRAPHS[name]
    out = connected_components(_pairs(edges))
    exp = _brute(edges)
    got = dict(zip(out["doc_id"].to_pylist(),
                   out["cluster_id"].to_pylist()))
    assert got == exp


@pytest.mark.parametrize("name", ["two_components", "short_chain", "star",
                                  "bridge"])
def test_distributed_path_matches_driver(ray_session, name):
    # short_chain: the distributed path converges in O(diameter) rounds
    # of two shuffles each — a 50-edge chain is a driver-path test, not
    # worth ~50 Ray groupby rounds in the suite
    edges = GRAPHS.get(name) or [(i, i + 1) for i in range(8)]
    pairs = _pairs(edges)
    a = connected_components(pairs)  # driver path
    b = connected_components(pairs, max_driver_edges=0)  # forced dist
    assert a.equals(b)


def test_random_graph_both_paths(ray_session):
    rng = np.random.default_rng(7)
    a = rng.integers(0, 200, size=300)
    b = rng.integers(0, 200, size=300)
    keep = a != b
    pairs = pa.table({"a": pa.array(a[keep], pa.int64()),
                      "b": pa.array(b[keep], pa.int64()),
                      "jaccard": pa.array(np.ones(keep.sum()))})
    d = connected_components(pairs)
    dist = connected_components(pairs, max_driver_edges=0)
    assert d.equals(dist)
    exp = _brute(list(zip(a[keep].tolist(), b[keep].tolist())))
    got = dict(zip(d["doc_id"].to_pylist(), d["cluster_id"].to_pylist()))
    assert got == exp


def test_empty_pairs():
    out = connected_components(_pairs([]))
    assert out.num_rows == 0
    assert out.schema.names == ["doc_id", "cluster_id"]


def test_clean_corpus_neardup_invariants(ray_session):
    """kept-per-lang == corpus minus non-minimum cluster members, and
    every dropped doc appears in a verified near-dup pair."""
    import duckdb

    from logsentinelai_ray.dedup import (connected_components,
                                         minhash_lsh_dupes)
    from logsentinelai_ray.pipelines.queries import (
        _read, q_clean_corpus_neardup)

    sf = "/root/testdata/sf0.001"
    got = q_clean_corpus_neardup(sf).to_pandas().set_index("lang")

    pairs = minhash_lsh_dupes(_read(sf, "documents",
                                    columns=["doc_id", "text"]),
                              n=3, threshold=0.5)
    comp = connected_components(pairs).to_pandas()
    drop = set(comp.loc[comp["doc_id"] != comp["cluster_id"], "doc_id"])
    paired = set(pairs["a"].to_pylist()) | set(pairs["b"].to_pylist())
    assert drop <= paired
    assert drop, "fixture corpus should contain near-dups"

    full = duckdb.sql(
        f"SELECT doc_id, lang, n_chars FROM "
        f"read_parquet('{sf}/documents.parquet')").df()
    kept = full[~full["doc_id"].isin(drop)]
    exp = kept.groupby("lang").agg(n_kept=("doc_id", "size"),
                                   chars_kept=("n_chars", "sum"))
    assert (got["n_kept"] == exp["n_kept"]).all()
    assert (got["chars_kept"] == exp["chars_kept"]).all()


def test_pagerank_complete_graph_is_uniform(ray_session, tmp_path):
    """All users sharing one session key form a complete graph — five
    fixed-point iterations must keep the ranks exactly uniform."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from logsentinelai_ray.pipelines.queries import q_pagerank

    users = np.arange(8, dtype=np.int64)
    tbl = pa.table({
        "event_id": pa.array(np.arange(8), pa.int64()),
        "ts": pa.array([1_700_000_000_000_000 + i for i in range(8)],
                       pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(["view"] * 8),
        "value": pa.array([1.0] * 8, pa.float64()),
        "props": pa.array(['{"k": 7}'] * 8),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    res = q_pagerank(str(d))
    ranks = res["rank_fp"].to_pylist()
    assert len(ranks) == 8
    assert len(set(ranks)) == 1          # complete graph -> uniform
    assert ranks[0] > 0
    # fixed point: base + 85% of the uniform mass, exactly
    p0 = 10 ** 12 // 8
    p = p0
    for _ in range(5):
        p = (15 * p0) // 100 + (85 * ((p // 7) * 7)) // 100
    assert ranks[0] == p
