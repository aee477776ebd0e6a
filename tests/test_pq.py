"""Product quantization (ann/pq.py): ADC exactness over reconstructed
vectors, determinism, recall floor, validation."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def vec_ds(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(7)
    # 3 loose gaussian clusters so PQ has structure to exploit
    centers = rng.randn(3, 16) * 4.0
    mat = np.concatenate([
        centers[i] + rng.randn(80, 16) for i in range(3)])
    tbl = pa.table({
        "vec_id": pa.array(np.arange(240, dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    })
    return rd.from_arrow(tbl), mat.astype(np.float64)


def test_pq_adc_equals_reconstructed_l2(vec_ds):
    from logsentinelai_ray.ann.pq import (adc_lut, decode_pq, encode_pq,
                                          train_pq)

    ds, mat = vec_ds
    books = train_pq(ds, m=4, n_centroids=8, n_iters=8)
    assert books.shape == (4, 8, 4)
    codes_tbl = pa.concat_tables(
        encode_pq(ds, books).iter_batches(batch_format="pyarrow")) \
        .sort_by("vec_id")
    codes = np.stack([np.asarray(c, dtype=np.uint8)
                      for c in codes_tbl["codes"].to_pylist()])
    assert codes.shape == (240, 4)
    q = mat[0] + 0.1
    lut = adc_lut(q, books)
    adc = lut[np.arange(4)[None, :], codes].sum(axis=1)
    recon = decode_pq(codes, books)
    diff = recon - q[None, :]
    true = (diff * diff).sum(axis=1)
    # ADC is EXACT over the quantized points (only quantization is
    # lossy): per-subspace sums in the same order
    assert np.allclose(adc, true, rtol=0, atol=1e-9)


def test_pq_topk_recall_and_determinism(vec_ds):
    from logsentinelai_ray.ann.pq import adc_topk, encode_pq, train_pq

    ds, mat = vec_ds
    books = train_pq(ds, m=4, n_centroids=8, n_iters=8)
    books2 = train_pq(ds, m=4, n_centroids=8, n_iters=8)
    assert np.array_equal(books, books2)  # deterministic
    codes = encode_pq(ds, books)
    q = mat[0] + 0.05
    got = adc_topk(codes, q, books, k=10)
    assert got.num_rows == 10
    # exact L2 top-10
    diff = mat - q[None, :]
    true_order = np.argsort((diff * diff).sum(axis=1))[:10]
    recall = len(set(got["vec_id"].to_pylist())
                 & set(true_order.tolist())) / 10.0
    # coarse codes (8 centroids x 4 subspaces) still land a useful
    # fraction of the true neighborhood (measured 0.4 on this fixture)
    assert recall >= 0.3, recall
    # FAISS refine pattern: ADC shortlist + exact rerank -> the true
    # top-k whenever the shortlist covers it (measured 1.0 here)
    refined = adc_topk(codes, q, books, k=10, rerank_ds=ds,
                       shortlist=50)
    r2 = len(set(refined["vec_id"].to_pylist())
             & set(true_order.tolist())) / 10.0
    assert r2 >= 0.9, r2
    assert list(refined.column_names) == ["vec_id", "l2_dist"]


def test_pq_validation(vec_ds):
    from logsentinelai_ray.ann.pq import train_pq

    ds, _ = vec_ds
    with pytest.raises(ValueError):
        train_pq(ds, m=5)  # 16 % 5 != 0
    with pytest.raises(ValueError):
        train_pq(ds, m=4, n_centroids=300)  # uint8 codes


def test_ivfpq_exactness_and_pruning(vec_ds, tmp_path_factory):
    import glob

    import pyarrow.parquet as pqt

    from logsentinelai_ray.ann.knn import ivf_centroids
    from logsentinelai_ray.ann.pq import (_coarse_assign,
                                          build_ivfpq_index, decode_pq,
                                          ivfpq_index_topk, train_pq)

    ds, mat = vec_ds
    cent = ivf_centroids(ds, n_centroids=4, n_iters=6, sample_size=240)
    books = train_pq(ds, m=4, n_centroids=16, n_iters=8,
                     residual_centroids=cent)
    out = str(tmp_path_factory.mktemp("ivfpq") / "idx")
    build_ivfpq_index(ds, out, cent, books)
    q = mat[0] + 0.05
    got = ivfpq_index_topk(out, q, k=10, n_probe=4)  # probe ALL lists
    # expected: reconstruct every row from its partition's codes
    rows = []
    for c in range(4):
        for f in sorted(glob.glob(f"{out}/list={c}/*.parquet")):
            t = pqt.read_table(f)
            codes = np.stack([np.asarray(x, dtype=np.uint8)
                              for x in t["codes"].to_pylist()])
            recon = cent[c] + decode_pq(codes, books)
            for vid, r in zip(t["vec_id"].to_pylist(), recon):
                rows.append((vid, ((r - q) ** 2).sum()))
    rows.sort(key=lambda x: (x[1], x[0]))
    exp_ids = [r[0] for r in rows[:10]]
    exp_d = [r[1] for r in rows[:10]]
    assert got["vec_id"].to_pylist() == exp_ids
    assert np.allclose(got["adc_dist"].to_numpy(), exp_d,
                       rtol=0, atol=1e-9)
    # n_probe=1: candidates come ONLY from the probed list's rows
    got1 = ivfpq_index_topk(out, q, k=10, n_probe=1)
    probe1 = int(np.argmax(cent @ (q / np.sqrt((q * q).sum()))))
    assign = _coarse_assign(mat, cent)
    allowed = set(np.flatnonzero(assign == probe1).tolist())
    assert set(got1["vec_id"].to_pylist()) <= allowed


def test_binary_quantization(vec_ds):
    from logsentinelai_ray.ann.quantize import (_binarize, dim_means,
                                                binary_quantize,
                                                hamming_topk)

    ds, mat = vec_ds
    means = dim_means(ds)
    assert np.allclose(means, mat.mean(axis=0), atol=1e-9)
    q = mat[0] + 0.05
    got = hamming_topk(binary_quantize(ds, means), q, means, k=10)
    # brute-force hamming from the raw bits
    bits = (mat > means[None, :]).astype(np.uint8)
    qb = (q > means).astype(np.uint8)
    ham = (bits != qb[None, :]).sum(axis=1)
    order = np.lexsort((np.arange(240), ham))[:10]
    assert got["vec_id"].to_pylist() == order.tolist()
    assert got["hamming"].to_pylist() == ham[order].tolist()
    # packed bytes round-trip the sign pattern
    packed = _binarize(mat, means)
    assert np.array_equal(np.unpackbits(packed, axis=1)[:, :16], bits)
    # BBQ serving pattern: hamming shortlist + exact rerank
    # 16-bit codes are coarse (heavy Hamming ties on 16-dim data) —
    # the shortlist must cover ~a cluster; 100/240 gives 0.9-1.0 here
    refined = hamming_topk(binary_quantize(ds, means), q, means, k=10,
                           rerank_ds=ds, shortlist=100)
    diff = mat - q[None, :]
    true10 = set(np.argsort((diff * diff).sum(axis=1))[:10].tolist())
    recall = len(set(refined["vec_id"].to_pylist()) & true10) / 10.0
    assert recall >= 0.8, recall
