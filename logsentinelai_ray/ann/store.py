"""Persisted bucket-partitioned ANN indexes (the kNN scale path).

The scan-based ``cosine_topk_lsh`` / ``cosine_topk_ivf`` (knn.py) prune
the matmul but still READ every row per query — at 10^12 rows the IO is
the query. These builders pay one partitioning pass up front and write
the embeddings as hive-partitioned parquet (one directory per LSH bucket
per table, or per IVF list); a query then reads ONLY its probed
partition directories — candidate IO proportional to the probed buckets,
not the corpus. The reference delegates vector search to its backing
store entirely (it has none); this is the from-scratch Ray analog of an
ES/Lucene ANN segment.

Equivalence contract (unit-tested): with the same planes/centroids and
probe parameters, the persisted index returns the scan path's exact id
ranking — partitioning only relocates rows, the candidate set is the
same union of probed buckets (cosines agree to ~1 ulp; BLAS blocking
differs with partition batch shapes).

Scale notes: the build is one ``map_batches`` assignment pass +
``write_parquet(partition_cols=...)`` per table (no shuffle — each task
writes its own partition files; the hive layout merely co-locates rows
by bucket for the read side). LSH storage is ``n_tables``x the corpus —
the standard multi-table LSH trade; IVF is 1x. Buckets are also the
resume unit: a re-run with ``mode="overwrite"`` per table directory can
skip completed tables.
"""

from __future__ import annotations

import json
import os
from functools import partial

import numpy as np
import pyarrow as pa

from .knn import _batch_vectors, _cosine, _LSHBucketer, _probe_buckets

_EMPTY = pa.schema([("vec_id", pa.int64()), ("cosine", pa.float64())])

def _dir_files(dirs: list[str]) -> list[str]:
    """Expand partition dirs to their parquet files (ray's read_parquet
    rejects a list of directories)."""
    import glob as _glob

    out: list[str] = []
    for d in dirs:
        out.extend(sorted(_glob.glob(os.path.join(d, "*.parquet"))))
    return out



def _final_topk(cand, k: int, id_col: str) -> pa.Table:
    """Exact (cosine desc, id asc) top-k over the small candidate table,
    deduping ids first (a row read via several LSH tables scores
    identically each time)."""
    pdf = cand.to_pandas()
    if len(pdf) == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    pdf = (pdf.drop_duplicates(subset=[id_col])
           .sort_values(["cosine", id_col], ascending=[False, True])
           .head(k).reset_index(drop=True))
    return pa.Table.from_pandas(pdf, preserve_index=False)


def _local_topk_fn(batch: pa.Table, q_ref, k: int, vec_col: str,
                   id_col: str, quant: dict | None = None) -> pa.Table:
    import ray

    qv = ray.get(q_ref)
    mat = _batch_vectors(batch, vec_col)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    if mat.size == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    if quant is not None:
        mat = mat * np.asarray(quant["scale"]) + np.asarray(quant["mins"])
    cos = _cosine(mat, qv)
    order = np.lexsort((ids, -cos))[:k]
    return pa.table({id_col: pa.array(ids[order], pa.int64()),
                     "cosine": pa.array(cos[order], pa.float64())})


def _quant_params(ds, vec_col: str) -> dict:
    """Per-dimension affine int8 params (ann/quantize.py pass)."""
    from .quantize import dim_minmax

    mins, maxs = dim_minmax(ds, vec_col)
    scale = np.maximum((maxs - mins) / 255.0, 1e-12)
    return {"mins": mins.tolist(), "scale": scale.tolist()}


def _encode_codes(mat: np.ndarray, quant: dict) -> pa.Array:
    """uint8 codes as a fixed-size-list column — 1/8th the bytes of the
    float64 the scorer would otherwise pull out of the partition files
    (1/4 of float32 storage)."""
    mins = np.asarray(quant["mins"])
    scale = np.asarray(quant["scale"])
    q = np.clip(np.rint((mat - mins) / scale), 0, 255).astype(np.uint8)
    return pa.FixedSizeListArray.from_arrays(
        pa.array(q.ravel(), pa.uint8()), mat.shape[1])


# ---------------------------------------------------------------------------
# LSH (multi-table random hyperplanes)
# ---------------------------------------------------------------------------

def _lsh_assign_fn(meta: dict):
    """The (shared) build/append assignment kernel for one LSH table:
    bucket ids from the persisted planes; with quantization enabled the
    float vectors are replaced by uint8 codes before they hit parquet."""
    vec_col, id_col = meta["vec_col"], meta["id_col"]
    quant = meta.get("quant")

    def assign(batch: pa.Table, s: int) -> pa.Table:
        mat = _batch_vectors(batch, vec_col)
        if mat.size == 0:
            if quant is None:
                return batch.append_column("bucket",
                                           pa.array([], pa.int64()))
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "code": pa.FixedSizeListArray.from_arrays(
                    pa.array([], pa.uint8()), meta["dim"]),
                "bucket": pa.array([], pa.int64())})
        b = _LSHBucketer(mat.shape[1], meta["n_planes"], s)
        buckets = pa.array(b.bucket(mat).astype(np.int64))
        if quant is None:
            return batch.append_column("bucket", buckets)
        return pa.table({id_col: batch[id_col],
                         "code": _encode_codes(mat, quant),
                         "bucket": buckets})

    return assign


def build_lsh_index(ds, out_dir: str, vec_col: str = "embedding",
                    id_col: str = "vec_id", n_planes: int = 6,
                    n_tables: int = 4, seed: int = 42,
                    quantize: bool = False) -> dict:
    """One assignment pass per table -> hive-partitioned parquet
    ``out_dir/table=T/bucket=B/*.parquet``. Returns the meta dict (also
    written to ``out_dir/meta.json``). ``quantize=True`` stores int8
    codes instead of float vectors (params persisted in meta — queries
    dequantize per batch; 1/8th the partition bytes of float64)."""
    seeds = [seed + 131 * t for t in range(n_tables)]
    dim = len(ds.take_batch(1, batch_format="pyarrow")[vec_col][0])
    meta = {"kind": "lsh", "n_planes": n_planes, "n_tables": n_tables,
            "seed": seed, "dim": dim, "vec_col": vec_col,
            "id_col": id_col}
    if quantize:
        meta["quant"] = _quant_params(ds, vec_col)
    assign = _lsh_assign_fn(meta)

    for t, s in enumerate(seeds):
        (ds.map_batches(partial(assign, s=s), batch_format="pyarrow")
         .write_parquet(os.path.join(out_dir, f"table={t}"),
                        partition_cols=["bucket"], mode="overwrite"))
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def append_lsh_index(ds, index_dir: str) -> dict:
    """Incremental delta append (the ANN analog of the posting index's
    delta segments): new vectors run the SAME assignment pass under the
    persisted meta params and land as new files inside existing (or
    new) ``table=T/bucket=B`` dirs — ``mode="append"`` never rewrites
    old files, and queries pick deltas up with no reader change (probe
    dirs are listed, not manifest-bound)."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    assert meta["kind"] == "lsh", meta["kind"]
    assign = _lsh_assign_fn(meta)

    for t in range(meta["n_tables"]):
        s = meta["seed"] + 131 * t
        (ds.map_batches(partial(assign, s=s), batch_format="pyarrow")
         .write_parquet(os.path.join(index_dir, f"table={t}"),
                        partition_cols=["bucket"], mode="append"))
    return meta


def append_ivf_index(ds, index_dir: str) -> dict:
    """Incremental delta append for the IVF index: assignment under the
    PERSISTED centroids (meta.json), new files appended into list=C
    dirs — identical query results to a fresh build over the union with
    the same centroids (tested)."""
    import ray

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    assert meta["kind"] == "ivf", meta["kind"]
    cent_ref = ray.put(np.asarray(meta["centroids"], dtype=np.float64))
    (ds.map_batches(_ivf_assign_fn(meta, cent_ref),
                    batch_format="pyarrow")
     .write_parquet(index_dir, partition_cols=["list"], mode="append"))
    return meta


def lsh_index_probe_dirs(index_dir: str, query_vec,
                         n_probes: int = 8) -> list[str]:
    """The partition directories a query must read (existing ones only)."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    q = np.asarray(query_vec, dtype=np.float64)
    dirs = []
    for t in range(meta["n_tables"]):
        s = meta["seed"] + 131 * t
        probes = _probe_buckets(
            q, _LSHBucketer(q.size, meta["n_planes"], s), n_probes)
        for b in probes:
            d = os.path.join(index_dir, f"table={t}", f"bucket={int(b)}")
            if os.path.isdir(d):
                dirs.append(d)
    return dirs


def lsh_index_topk(index_dir: str, query_vec, k: int = 10,
                   n_probes: int = 8) -> pa.Table:
    """Approximate top-k served from the persisted index: reads ONLY the
    probed partition directories. Identical results to
    ``cosine_topk_lsh`` with the same parameters (unit-tested)."""
    import ray
    import ray.data as rd

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    quant = meta.get("quant")
    id_col = meta["id_col"]
    vec_col = "code" if quant else meta["vec_col"]
    dirs = lsh_index_probe_dirs(index_dir, query_vec, n_probes)
    if not dirs:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    q_ref = ray.put(np.asarray(query_vec, dtype=np.float64))
    cand = rd.read_parquet(_dir_files(dirs),
                       columns=[id_col, vec_col]).map_batches(
        partial(_local_topk_fn, q_ref=q_ref, k=k, vec_col=vec_col,
                id_col=id_col, quant=quant),
        batch_format="pyarrow")
    return _final_topk(cand, k, id_col)


# ---------------------------------------------------------------------------
# IVF (coarse k-means lists)
# ---------------------------------------------------------------------------

def _ivf_assign_fn(meta: dict, cent_ref):
    """Shared build/append IVF assignment kernel; with quantization the
    float vectors are replaced by uint8 codes before parquet."""
    vec_col, id_col = meta["vec_col"], meta["id_col"]
    quant = meta.get("quant")

    def assign(batch: pa.Table) -> pa.Table:
        import ray

        cent = ray.get(cent_ref)
        mat = _batch_vectors(batch, vec_col)
        if mat.size == 0:
            if quant is None:
                return batch.append_column("list",
                                           pa.array([], pa.int64()))
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "code": pa.FixedSizeListArray.from_arrays(
                    pa.array([], pa.uint8()),
                    len(meta["centroids"][0])),
                "list": pa.array([], pa.int64())})
        norms = np.sqrt((mat * mat).sum(axis=1))
        norms[norms == 0] = 1.0
        a = pa.array(np.argmax((mat / norms[:, None]) @ cent.T,
                               axis=1).astype(np.int64))
        if quant is None:
            return batch.append_column("list", a)
        return pa.table({id_col: batch[id_col],
                         "code": _encode_codes(mat, quant), "list": a})

    return assign


def build_ivf_index(ds, out_dir: str, centroids: np.ndarray,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id",
                    quantize: bool = False) -> dict:
    """Assign each row to its nearest (spherical) centroid and write
    ``out_dir/list=C/*.parquet``; centroids persist in meta.json.
    ``quantize=True`` stores int8 codes (params in meta)."""
    import ray

    meta = {"kind": "ivf", "centroids": np.asarray(centroids).tolist(),
            "vec_col": vec_col, "id_col": id_col}
    if quantize:
        meta["quant"] = _quant_params(ds, vec_col)
    cent_ref = ray.put(np.asarray(centroids, dtype=np.float64))
    (ds.map_batches(_ivf_assign_fn(meta, cent_ref),
                    batch_format="pyarrow")
     .write_parquet(out_dir, partition_cols=["list"], mode="overwrite"))
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def ivf_index_probe_dirs(index_dir: str, query_vec,
                         n_probe: int = 2) -> list[str]:
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    cent = np.asarray(meta["centroids"], dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.sqrt((q * q).sum()) or 1.0
    probe = np.argsort(-(cent @ (q / qn)))[:n_probe]
    dirs = [os.path.join(index_dir, f"list={int(c)}") for c in probe]
    return [d for d in dirs if os.path.isdir(d)]


def ivf_index_topk(index_dir: str, query_vec, k: int = 10,
                   n_probe: int = 2) -> pa.Table:
    """Approximate top-k from the persisted IVF index: reads ONLY the
    ``n_probe`` nearest list directories. Identical results to
    ``cosine_topk_ivf`` with the same centroids (unit-tested)."""
    import ray
    import ray.data as rd

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    quant = meta.get("quant")
    id_col = meta["id_col"]
    vec_col = "code" if quant else meta["vec_col"]
    dirs = ivf_index_probe_dirs(index_dir, query_vec, n_probe)
    if not dirs:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    q_ref = ray.put(np.asarray(query_vec, dtype=np.float64))
    cand = rd.read_parquet(_dir_files(dirs),
                       columns=[id_col, vec_col]).map_batches(
        partial(_local_topk_fn, q_ref=q_ref, k=k, vec_col=vec_col,
                id_col=id_col, quant=quant),
        batch_format="pyarrow")
    return _final_topk(cand, k, id_col)
