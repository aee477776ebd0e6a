"""Persisted bucket-partitioned ANN indexes (ann/store.py): scan-path
equivalence, probed-partition-only IO, and the hash-rate centroid
sample."""

import glob
import os

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    n, dim = 3000, 16
    mat = rng.normal(size=(n, dim))
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(mat), pa.list_(pa.float64())),
    })
    return rd.from_arrow(tbl).materialize(), mat


def test_lsh_index_equals_scan_path(emb_ds, tmp_path):
    from logsentinelai_ray.ann import (build_lsh_index, cosine_topk_lsh,
                                       lsh_index_probe_dirs, lsh_index_topk)

    ds, mat = emb_ds
    idx = str(tmp_path / "lsh")
    meta = build_lsh_index(ds, idx, n_planes=6, n_tables=4, seed=42)
    assert meta["dim"] == 16
    for qi in (0, 7, 1234):
        q = mat[qi]
        got = lsh_index_topk(idx, q, k=10, n_probes=8)
        exp = cosine_topk_lsh(ds, q, k=10, n_planes=6, n_tables=4,
                              seed=42, n_probes=8)
        assert got["vec_id"].to_pylist() == exp["vec_id"].to_pylist(), qi
        # cosines match to float rounding: BLAS blocking differs with
        # partition batch shapes, so scores can differ by ~1 ulp
        assert np.allclose(got["cosine"].to_numpy(),
                           exp["cosine"].to_numpy(), rtol=0, atol=1e-12)
        # IO bound: the probe dirs are a strict subset of all partitions
        probed = set(lsh_index_probe_dirs(idx, q, n_probes=8))
        all_parts = {d for d in glob.glob(os.path.join(idx, "table=*",
                                                       "bucket=*"))}
        assert probed and probed < all_parts
        probed_files = sum(len(glob.glob(os.path.join(d, "*.parquet")))
                           for d in probed)
        total_files = sum(len(glob.glob(os.path.join(d, "*.parquet")))
                          for d in all_parts)
        assert probed_files < total_files


def test_ivf_index_equals_scan_path(emb_ds, tmp_path):
    from logsentinelai_ray.ann import (build_ivf_index, cosine_topk_ivf,
                                       ivf_centroids, ivf_index_probe_dirs,
                                       ivf_index_topk)

    ds, mat = emb_ds
    cent = ivf_centroids(ds, n_centroids=8, sample_size=512)
    idx = str(tmp_path / "ivf")
    build_ivf_index(ds, idx, cent)
    for qi in (3, 999):
        q = mat[qi]
        got = ivf_index_topk(idx, q, k=10, n_probe=2)
        exp = cosine_topk_ivf(ds, q, cent, k=10, n_probe=2)
        assert got["vec_id"].to_pylist() == exp["vec_id"].to_pylist(), qi
        assert np.allclose(got["cosine"].to_numpy(),
                           exp["cosine"].to_numpy(), rtol=0, atol=1e-12)
        probed = set(ivf_index_probe_dirs(idx, q, n_probe=2))
        all_parts = set(glob.glob(os.path.join(idx, "list=*")))
        assert len(probed) == 2 and probed < all_parts


def test_ivf_index_brute_force_recall(emb_ds, tmp_path):
    """All-lists probe == exact brute force (the recall ceiling)."""
    from logsentinelai_ray.ann import (build_ivf_index,
                                       cosine_topk_bruteforce,
                                       ivf_centroids, ivf_index_topk)

    ds, mat = emb_ds
    cent = ivf_centroids(ds, n_centroids=8, sample_size=512)
    idx = str(tmp_path / "ivf_all")
    build_ivf_index(ds, idx, cent)
    q = mat[42]
    got = ivf_index_topk(idx, q, k=10, n_probe=8)
    exp = cosine_topk_bruteforce(ds, q, k=10)
    assert got["vec_id"].to_pylist() == exp["vec_id"].to_pylist()


def test_ivf_centroids_hash_sample_unbiased(ray_session):
    """On input SORTED by a signal (first rows all point one way), the
    hash-rate sample must see both halves — ds.limit would not."""
    import ray.data as rd

    from logsentinelai_ray.ann import ivf_centroids

    n, dim = 2000, 8
    mat = np.zeros((n, dim))
    mat[:n // 2, 0] = 1.0   # first half: +x
    mat[n // 2:, 1] = 1.0   # second half: +y
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(mat), pa.list_(pa.float64())),
    }))
    cent = ivf_centroids(ds, n_centroids=2, sample_size=200)
    # a first-blocks sample (ds.limit) would put ZERO mass on dim 1 —
    # the hash-rate sample must surface the second half's +y direction
    # (k-means may still merge clusters, so assert mass, not purity)
    assert cent[:, 1].max() > 0.3
    assert cent[:, 0].max() > 0.3


def test_cosine_topk_batch_equals_per_query_bruteforce(ray_session):
    """cosine_topk_batch (one GEMM for all queries) returns exactly the
    per-query brute-force results, query by query."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from logsentinelai_ray.ann.knn import (cosine_topk_batch,
                                           cosine_topk_bruteforce)

    rng = np.random.default_rng(3)
    n, d = 300, 16
    vecs = rng.normal(size=(n, d))
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(vecs), pa.list_(pa.float64()))}))
    Q = vecs[:4] + rng.normal(scale=0.05, size=(4, d))
    got = cosine_topk_batch(ds, Q, k=7).to_pandas()
    for qi in range(4):
        part = got[got["query_id"] == qi]
        want = cosine_topk_bruteforce(ds, Q[qi], k=7).to_pandas()
        assert part["vec_id"].tolist() == want["vec_id"].tolist()
        assert np.allclose(part["cosine"].to_numpy(),
                           want["cosine"].to_numpy(), rtol=0, atol=1e-12)


def test_ann_recall_entry_floors(ray_session):
    """ann_recall (pipelines/queries.py): recall@10 of the persisted
    approximate paths vs exact brute-force — pinned floors on the sf
    fixture (measured ivf 0.6 / lsh 0.8 at n_probe=4/8)."""
    from logsentinelai_ray.pipelines import QUERY_REGISTRY

    t = QUERY_REGISTRY["ann_recall"]("/root/testdata/sf0.001")
    rec = dict(zip(t["method"].to_pylist(),
                   t["recall_at_10"].to_pylist()))
    assert rec["ivf"] >= 0.5
    assert rec["lsh"] >= 0.8


def test_embedding_quantize_floors(ray_session):
    """embedding_quantize (ann/quantize.py): int8 round-trip must keep
    recall@10 high and cosine error small (measured 1.0 / ~0.0017 on the
    sf fixture)."""
    from logsentinelai_ray.pipelines import QUERY_REGISTRY

    t = QUERY_REGISTRY["embedding_quantize"]("/root/testdata/sf0.001")
    assert t["recall_at_10"][0].as_py() >= 0.9
    assert t["max_abs_cos_err"][0].as_py() <= 0.01


def test_lsh_index_append_equals_full_build(ray_session, tmp_path):
    """build on half the vectors + append the other half == one full
    build (same planes -> same buckets -> identical candidates)."""
    import ray.data as rd

    from logsentinelai_ray.ann import (
        append_lsh_index, build_lsh_index, lsh_index_topk)

    full = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    a = full.filter(lambda r: r["vec_id"] % 2 == 0)
    b = full.filter(lambda r: r["vec_id"] % 2 == 1)
    d_full, d_inc = str(tmp_path / "full"), str(tmp_path / "inc")
    build_lsh_index(full, d_full, n_planes=5, n_tables=3, seed=7)
    build_lsh_index(a, d_inc, n_planes=5, n_tables=3, seed=7)
    append_lsh_index(b, d_inc)
    import numpy as np
    import pyarrow.parquet as pq

    q = np.asarray(pq.read_table(
        "/root/testdata/sf0.001/embeddings.parquet")["embedding"][3]
        .as_py(), dtype=np.float64)
    t_full = lsh_index_topk(d_full, q, k=10, n_probes=6)
    t_inc = lsh_index_topk(d_inc, q, k=10, n_probes=6)
    # ids rank-identical; cosines to last-ulp (numpy GEMM blocking
    # varies with batch shape between the two builds)
    assert t_full["vec_id"].to_pylist() == t_inc["vec_id"].to_pylist()
    assert np.allclose(t_full["cosine"].to_numpy(),
                       t_inc["cosine"].to_numpy(), rtol=1e-12, atol=0)


def test_ivf_index_append_equals_full_build(ray_session, tmp_path):
    """IVF append under the persisted centroids == full build with the
    same centroids."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from logsentinelai_ray.ann import (
        append_ivf_index, build_ivf_index, ivf_centroids, ivf_index_topk)

    full = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    a = full.filter(lambda r: r["vec_id"] % 2 == 0)
    b = full.filter(lambda r: r["vec_id"] % 2 == 1)
    cent = ivf_centroids(a, n_centroids=8)
    d_full, d_inc = str(tmp_path / "full"), str(tmp_path / "inc")
    build_ivf_index(full, d_full, cent)
    build_ivf_index(a, d_inc, cent)
    append_ivf_index(b, d_inc)
    q = np.asarray(pq.read_table(
        "/root/testdata/sf0.001/embeddings.parquet")["embedding"][3]
        .as_py(), dtype=np.float64)
    t_full = ivf_index_topk(d_full, q, k=10, n_probe=3)
    t_inc = ivf_index_topk(d_inc, q, k=10, n_probe=3)
    assert t_full["vec_id"].to_pylist() == t_inc["vec_id"].to_pylist()
    assert np.allclose(t_full["cosine"].to_numpy(),
                       t_inc["cosine"].to_numpy(), rtol=1e-12, atol=0)


def test_quantized_lsh_store_recall_and_size(ray_session, tmp_path):
    """quantize=True stores uint8 codes: partition bytes shrink >4x vs
    the float store and the served top-10 stays near-identical (int8
    cosine error ~1e-3)."""
    import os

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from logsentinelai_ray.ann import (
        append_lsh_index, build_lsh_index, lsh_index_topk)

    full = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                           columns=["vec_id", "embedding"])
    d_f, d_q = str(tmp_path / "f"), str(tmp_path / "q")
    build_lsh_index(full, d_f, n_planes=5, n_tables=3, seed=7)
    build_lsh_index(full, d_q, n_planes=5, n_tables=3, seed=7,
                    quantize=True)

    def tree_bytes(root):
        tot = 0
        for dp, _, fs in os.walk(root):
            tot += sum(os.path.getsize(os.path.join(dp, f))
                       for f in fs if f.endswith(".parquet"))
        return tot

    # raw vector bytes shrink 4x (float32 list -> uint8); at this toy
    # scale parquet per-file footers dominate, so assert the measured
    # whole-tree ratio (0.51 here) with margin
    assert tree_bytes(d_q) < tree_bytes(d_f) * 0.7
    q = np.asarray(pq.read_table(
        "/root/testdata/sf0.001/embeddings.parquet")["embedding"][3]
        .as_py(), dtype=np.float64)
    t_f = lsh_index_topk(d_f, q, k=10, n_probes=6)
    t_q = lsh_index_topk(d_q, q, k=10, n_probes=6)
    overlap = len(set(t_f["vec_id"].to_pylist())
                  & set(t_q["vec_id"].to_pylist()))
    assert overlap >= 9
    assert np.max(np.abs(t_f["cosine"].to_numpy()
                         - t_q["cosine"].to_numpy())) < 0.02

    # append path under quantization: params persisted at first build
    # are reused for the delta's codes (consistent within the index)
    a = full.filter(lambda r: r["vec_id"] % 2 == 0)
    b = full.filter(lambda r: r["vec_id"] % 2 == 1)
    d_inc = str(tmp_path / "inc")
    build_lsh_index(a, d_inc, n_planes=5, n_tables=3, seed=7,
                    quantize=True)
    append_lsh_index(b, d_inc)
    t_i = lsh_index_topk(d_inc, q, k=10, n_probes=6)
    assert t_i.num_rows == 10
    overlap_i = len(set(t_f["vec_id"].to_pylist())
                    & set(t_i["vec_id"].to_pylist()))
    assert overlap_i >= 9


def _rand_vectors(n: int, dim: int, seed: int):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, dim))
    # plant near-duplicate pairs so the prune actually fires
    for i in range(0, n, 10):
        j = (i + 1) % n
        mat[j] = mat[i] + rng.normal(scale=0.01, size=dim)
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array([row.astype(np.float32).tolist()
                               for row in mat],
                              pa.list_(pa.float32())),
    }), mat


def _brute_semdedup(mat: np.ndarray, cent: np.ndarray,
                    threshold: float) -> np.ndarray:
    norms = np.sqrt((mat * mat).sum(axis=1))
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    cluster = np.argmax(unit @ cent.T, axis=1)
    keep = np.ones(len(mat), dtype=bool)
    for c in np.unique(cluster):
        idx = np.flatnonzero(cluster == c)  # ascending vec_id order
        for pos, j in enumerate(idx):
            prior = idx[:pos][keep[idx[:pos]]]
            if prior.size and (unit[prior] @ unit[j] > threshold).any():
                keep[j] = False
    return keep


def test_semdedup_matches_bruteforce(ray_session):
    import ray.data as rd

    from logsentinelai_ray.ann import semdedup
    from logsentinelai_ray.ann.knn import ivf_centroids

    tbl, mat = _rand_vectors(200, 16, seed=3)
    ds = rd.from_arrow(tbl)
    res = semdedup(ds, threshold=0.95, n_centroids=4).to_pandas()
    cent = ivf_centroids(rd.from_arrow(tbl), n_centroids=4)
    exp = _brute_semdedup(mat, cent, 0.95)
    assert list(res["vec_id"]) == list(range(200))
    assert (res["keep"].to_numpy() == exp).all()
    # the planted near-dup pairs must actually exercise the prune
    assert not res["keep"].all()


def test_semdedup_partitioning_invariant(ray_session):
    import ray.data as rd

    from logsentinelai_ray.ann import semdedup

    tbl, _ = _rand_vectors(150, 8, seed=9)
    a = semdedup(rd.from_arrow(tbl).repartition(1),
                 threshold=0.9, n_centroids=4).to_pandas()
    b = semdedup(rd.from_arrow(tbl).repartition(7),
                 threshold=0.9, n_centroids=4).to_pandas()
    assert (a["keep"].to_numpy() == b["keep"].to_numpy()).all()
    assert (a["cluster"].to_numpy() == b["cluster"].to_numpy()).all()


def test_semdedup_threshold_monotone_and_group_cap(ray_session):
    import pytest as _pytest
    import ray.data as rd

    from logsentinelai_ray.ann import semdedup

    tbl, _ = _rand_vectors(120, 8, seed=5)
    loose = semdedup(rd.from_arrow(tbl), threshold=0.99,
                     n_centroids=4).to_pandas()
    tight = semdedup(rd.from_arrow(tbl), threshold=0.80,
                     n_centroids=4).to_pandas()
    assert tight["keep"].sum() <= loose["keep"].sum()
    with _pytest.raises(Exception, match="max_group"):
        semdedup(rd.from_arrow(tbl), threshold=0.9, n_centroids=1,
                 max_group=10).to_pandas()
