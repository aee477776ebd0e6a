"""Sorted data layout + early-terminating top-n — the Lucene
``index.sort`` / ES index-sorting analog (reference parity: ES mappings
let a sorted index serve ``ORDER BY key LIMIT n`` by reading only the
first segments; same trick as lakehouse OPTIMIZE ... ORDER BY).

Build (distributed, one pass + one shuffle):
1. A deterministic hash-rate SAMPLE of the key column (the
   stratified_sample convention — rerun/cluster-size invariant) feeds
   quantile boundaries, exactly how Ray's sort picks split points.
2. One vectorized ``searchsorted`` per batch assigns each row a range
   partition; ``groupby(part).map_groups`` sorts each partition by
   (key, id) and writes it as its OWN parquet file — the only
   all-to-all is the partition exchange, inherent to re-layout.
3. A manifest (part → path, rows, key min/max) is written last; ranges
   are disjoint, so file order IS global sort order.

Serve: ``sorted_topn`` walks the manifest in part order and stops as
soon as n rows are read — at 16 partitions a top-50 over 10^6 rows
touches ONE file (early termination; the read-pruning stats are
returned so tests can assert it).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def build_sorted_layout(ds, out_dir: str, key: str, id_col: str,
                        num_parts: int = 16,
                        sample_mod: int = 10) -> dict:
    """Range-partition ``ds`` by ``key`` quantiles and write each
    partition sorted by (key, id) as its own file. Returns the
    manifest dict. Atomic publish: tmp dir + rename (K1 contract)."""
    import ray.data as rd  # noqa: F401  (ds is already a Dataset)

    tmp = out_dir + ".tmp"
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)

    def sample(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        keep = (ids % sample_mod) == 0
        return pa.table({key: pc.filter(
            t[key].combine_chunks() if isinstance(t[key],
                                                  pa.ChunkedArray)
            else t[key], pa.array(keep))})

    sk = np.sort(np.concatenate(
        [b[key].to_numpy(zero_copy_only=False)
         for b in ds.map_batches(sample, batch_format="pyarrow")
         .iter_batches(batch_format="pyarrow", batch_size=1 << 20)] or
        [np.empty(0, np.int64)]))
    if sk.size == 0:
        bnds = np.empty(0, np.float64)
    else:
        qs = np.linspace(0, 1, num_parts + 1)[1:-1]
        bnds = np.unique(np.quantile(sk, qs))

    def assign(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False)
        part = np.searchsorted(bnds, k, side="right")
        return t.append_column("__part",
                               pa.array(part.astype(np.int64),
                                        pa.int64()))

    def write_part(g: pa.Table) -> pa.Table:
        part = int(g["__part"][0].as_py())
        g = g.drop_columns(["__part"]).sort_by(
            [(key, "ascending"), (id_col, "ascending")])
        path = os.path.join(tmp, f"part-{part:05d}.parquet")
        pq.write_table(g, path)
        k = g[key].to_numpy(zero_copy_only=False)
        return pa.table({
            "part": pa.array([part], pa.int64()),
            "rows": pa.array([g.num_rows], pa.int64()),
            "kmin": pa.array([int(k.min())], pa.int64()),
            "kmax": pa.array([int(k.max())], pa.int64())})

    man = (ds.map_batches(assign, batch_format="pyarrow")
           .groupby("__part")
           .map_groups(write_part, batch_format="pyarrow")
           .to_pandas().sort_values("part").reset_index(drop=True))
    manifest = {
        "key": key, "id_col": id_col,
        "parts": [{"part": int(r.part),
                   "file": f"part-{int(r.part):05d}.parquet",
                   "rows": int(r.rows), "kmin": int(r.kmin),
                   "kmax": int(r.kmax)}
                  for r in man.itertuples()]}
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.rename(tmp, out_dir)
    return manifest


def sorted_topn(layout_dir: str, n: int) -> tuple[pa.Table, dict]:
    """Early-terminating ``ORDER BY key, id LIMIT n`` over a sorted
    layout: parts stream in manifest order and the walk STOPS once n
    rows are in hand (disjoint ranges make the concatenated prefix the
    exact global head). Returns (result, stats) where stats records
    how many files the read touched vs the total."""
    with open(os.path.join(layout_dir, "manifest.json")) as f:
        manifest = json.load(f)
    got: list[pa.Table] = []
    have = 0
    files_read = 0
    for p in manifest["parts"]:
        t = pq.read_table(os.path.join(layout_dir, p["file"]))
        files_read += 1
        got.append(t)
        have += t.num_rows
        if have >= n:
            break
    out = pa.concat_tables(got).slice(0, n) if got else None
    stats = {"files_read": files_read,
             "files_total": len(manifest["parts"])}
    return out, stats


def sorted_range(layout_dir: str, lo: int, hi: int) -> tuple[pa.Table,
                                                             dict]:
    """Manifest-pruned key-range scan (lo <= key <= hi): only parts
    whose [kmin, kmax] intersects the range are opened; the residual
    filter runs vectorized on those."""
    with open(os.path.join(layout_dir, "manifest.json")) as f:
        manifest = json.load(f)
    key = manifest["key"]
    got: list[pa.Table] = []
    files_read = 0
    for p in manifest["parts"]:
        if p["kmax"] < lo or p["kmin"] > hi:
            continue
        t = pq.read_table(os.path.join(layout_dir, p["file"]))
        files_read += 1
        k = t[key]
        got.append(t.filter(pc.and_(pc.greater_equal(k, lo),
                                    pc.less_equal(k, hi))))
    out = pa.concat_tables(got) if got else None
    stats = {"files_read": files_read,
             "files_total": len(manifest["parts"])}
    return out, stats
