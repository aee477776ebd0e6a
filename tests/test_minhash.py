"""MinHash-LSH near-dup detection: broadcast vs distributed verification
path identity, the verified ⊆ exact-Jaccard invariant, and edge cases
(dedup/minhash.py)."""

import numpy as np
import pyarrow as pa

from logsentinelai_ray.dedup.jaccard import ngram_jaccard_pairs
from logsentinelai_ray.dedup.minhash import minhash_lsh_dupes


def _dup_corpus():
    """60 docs, 3 clusters of true near-dups + unrelated fillers."""
    rng = np.random.default_rng(7)
    words = [f"tok{i}" for i in range(200)]
    texts = []
    base = {}
    for c in range(3):
        base[c] = " ".join(rng.choice(words, size=30))
    for i in range(60):
        if i < 12:  # cluster members: shared base + one private token
            c = i % 3
            texts.append(f"{base[c]} private{i}")
        else:  # fillers with disjoint vocab
            texts.append(" ".join(f"fill{i}_{j}" for j in range(25)))
    return pa.table({"doc_id": pa.array(np.arange(60, dtype=np.int64)),
                     "text": pa.array(texts)})


def test_paths_identical(ray_session):
    """Forced doc_id-exchange verification (driver_max_pairs=0) returns
    byte-identical pairs and scores to the broadcast-set path."""
    import ray.data as rd

    tbl = _dup_corpus()
    a = minhash_lsh_dupes(rd.from_arrow(tbl), n=3, threshold=0.5)
    b = minhash_lsh_dupes(rd.from_arrow(tbl), n=3, threshold=0.5,
                          driver_max_pairs=0)
    assert a.num_rows == b.num_rows > 0
    assert a["a"].to_pylist() == b["a"].to_pylist()
    assert a["b"].to_pylist() == b["b"].to_pylist()
    assert a["jaccard"].to_pylist() == b["jaccard"].to_pylist()


def test_verified_subset_of_exact(ray_session):
    """Every verified minhash pair must appear in the exact n-gram
    Jaccard output with the same score (J computed over hashed shingles
    equals J over shingle strings absent 64-bit collisions)."""
    import ray.data as rd

    tbl = _dup_corpus()
    mh = minhash_lsh_dupes(rd.from_arrow(tbl), n=3, threshold=0.5)
    exact = ngram_jaccard_pairs(rd.from_arrow(tbl), n=3, threshold=0.5,
                                max_group=None)
    ex = {(a, b): j for a, b, j in zip(exact["a"].to_pylist(),
                                       exact["b"].to_pylist(),
                                       exact["jaccard"].to_pylist())}
    assert mh.num_rows > 0
    for a, b, j in zip(mh["a"].to_pylist(), mh["b"].to_pylist(),
                       mh["jaccard"].to_pylist()):
        assert (a, b) in ex
        assert abs(ex[(a, b)] - j) < 1e-12


def test_cluster_members_found(ray_session):
    """All within-cluster pairs (J ≈ 30/32 ≈ 0.94) are recalled at the
    default 16x4 LSH parameters."""
    import ray.data as rd

    mh = minhash_lsh_dupes(rd.from_arrow(_dup_corpus()), n=3,
                           threshold=0.5)
    got = set(zip(mh["a"].to_pylist(), mh["b"].to_pylist()))
    want = {(a, b) for c in range(3)
            for a in range(c, 12, 3) for b in range(a + 3, 12, 3)}
    assert want <= got


def test_no_candidates(ray_session):
    """Disjoint-vocabulary corpus: no LSH bucket collisions of size >= 2
    survive verification; result is the typed empty table."""
    import ray.data as rd

    tbl = pa.table({
        "doc_id": pa.array(np.arange(8, dtype=np.int64)),
        "text": pa.array([" ".join(f"w{i}_{j}" for j in range(20))
                          for i in range(8)])})
    out = minhash_lsh_dupes(rd.from_arrow(tbl), n=3, threshold=0.5)
    assert out.num_rows == 0
    assert out.schema.names == ["a", "b", "jaccard"]
