"""Per-segment HNSW graphs — the graph-ANN scale path (Lucene model).

Lucene's vector format builds ONE HNSW graph per segment, in parallel
across segments, and a query fans out: beam-search each segment's graph,
merge the per-segment top-k (Malkov & Yashunin 2016, arXiv:1603.09320 —
the public algorithm; Lucene HnswGraphBuilder mirrors it). This module
is the Ray Data analog:

- **build**: one ``groupby(segment).map_groups`` pass — each group
  (hash-assigned, so segments balance) builds its graph independently
  and persists ``segment=NNNNN/{vectors,graph}.parquet`` + a meta row.
  Graph construction is sequential WITHIN a segment (inherent to HNSW —
  Lucene too), parallel ACROSS segments; at 100 TB the segment is the
  unit of both build parallelism and incremental ingest (new data =
  new segments, no graph rebuild).
- **query**: beam search per segment with vectorized per-hop distance
  evaluation (one gather + one matmul per visited node), candidates
  merged driver-side — k×segments rows move, never the corpus. The
  searcher is a callable CLASS for ``map_batches`` so an actor pool
  keeps loaded segments resident across queries (setup-once contract).
- **why not the flat stores**: ann/store.py's LSH/IVF partitions prune
  IO but still matmul whole probed buckets; HNSW visits O(ef·log n)
  vectors per segment regardless of bucket skew — the right asymptotic
  for hot high-dimensional corpora, at the price of a graph sidecar
  (~M ints per vector, the Lucene trade).

Determinism: level assignment hashes (seed, vec_id) — splitmix64 to a
uniform in (0,1) — so builds are reproducible across cluster sizes and
re-runs (no ``random``); insertion order is vec_id-sorted within a
segment. Recall vs the exact brute force is pinned in test_hnsw.py.

Reference parity note: the reference delegates all vector work to its
backing store (it has none of its own); this implements the standard
public algorithm from scratch.
"""

from __future__ import annotations

import heapq
import json
import os

import numpy as np
import pyarrow as pa

from .knn import _batch_vectors

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _level_of(ids: np.ndarray, seed: int, m_l: float) -> np.ndarray:
    """Deterministic HNSW level per vec_id: splitmix64(seed, id) ->
    uniform (0,1) -> floor(-ln(u) * mL). Cluster-size invariant."""
    salt = np.uint64((seed * 0x9E3779B97F4A7C15) % (1 << 64))
    with np.errstate(over="ignore"):  # uint64 wraparound is the point
        x = ids.astype(np.uint64) + salt
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    u = (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    u = np.clip(u, 1e-12, 1.0 - 1e-12)
    return np.floor(-np.log(u) * m_l).astype(np.int64)


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.sqrt((mat * mat).sum(axis=1, keepdims=True))
    norms[norms == 0.0] = 1.0
    return (mat / norms).astype(np.float32)


def _select_heuristic(cand_ids: np.ndarray, cand_sims: np.ndarray,
                      vecs: np.ndarray, m: int) -> list[int]:
    """Algorithm 4 (keep-pruned-connections off): pick up to m diverse
    neighbors — a candidate joins only if it is closer to the query
    point than to every already-selected neighbor. Prevents the
    clustered-data short-circuit that plain closest-m suffers."""
    order = np.argsort(-cand_sims, kind="stable")
    chosen: list[int] = []
    for j in order:
        c = int(cand_ids[j])
        if len(chosen) >= m:
            break
        cv = vecs[c]
        ok = True
        for s in chosen:
            if float(cv @ vecs[s]) > float(cand_sims[j]):
                ok = False  # closer to a chosen neighbor than to q
                break
        if ok:
            chosen.append(c)
    return chosen


def _search_layer(q: np.ndarray, eps: list[int], ef: int,
                  adj: list[np.ndarray], vecs: np.ndarray,
                  allow: np.ndarray | None = None,
                  visit_cap: int | None = None
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Beam search one layer from entry points ``eps``; returns up to
    ``ef`` (ids, sims) found, unsorted. Per-hop distances are one
    vectorized gather+matmul over the node's neighbor list.

    ``allow`` (bool per local node) implements Lucene-style FILTERED
    kNN: traversal explores every node (the graph stays connected) but
    only allowed nodes enter the result heap. ``visit_cap`` bounds the
    work on very sparse filters (the Lucene visitedLimit); the caller
    falls back to an exact scan over the allowed rows when the capped
    beam comes back short."""
    visited = set(eps)
    sims0 = vecs[eps] @ q
    # max-heap of candidates (by -sim), min-heap of ef best (by sim)
    cand = [(-float(s), e) for s, e in zip(sims0, eps)]
    heapq.heapify(cand)
    best = [(float(s), e) for s, e in zip(sims0, eps)
            if allow is None or allow[e]]
    heapq.heapify(best)
    while len(best) > ef:
        heapq.heappop(best)
    while cand:
        negs, c = heapq.heappop(cand)
        if best and -negs < best[0][0] and len(best) >= ef:
            break
        if visit_cap is not None and len(visited) > visit_cap:
            break
        nbrs = adj[c]
        if nbrs.size == 0:
            continue
        fresh = [int(n) for n in nbrs if int(n) not in visited]
        if not fresh:
            continue
        visited.update(fresh)
        sims = vecs[fresh] @ q
        for s, n in zip(sims, fresh):
            s = float(s)
            ok = allow is None or allow[n]
            # the candidate frontier expands whenever the beam is not
            # yet full or the node beats its worst — regardless of the
            # filter (disallowed nodes are bridges, Lucene-style)
            if len(best) < ef:
                if ok:
                    heapq.heappush(best, (s, n))
                heapq.heappush(cand, (-s, n))
            elif s > best[0][0]:
                if ok:
                    heapq.heapreplace(best, (s, n))
                heapq.heappush(cand, (-s, n))
    ids = np.fromiter((e for _s, e in best), dtype=np.int64,
                      count=len(best))
    sims = np.fromiter((s for s, _e in best), dtype=np.float64,
                       count=len(best))
    return ids, sims


def build_segment_graph(mat: np.ndarray, levels: np.ndarray,
                        m: int = 8, ef_construction: int = 64
                        ) -> tuple[list[list[np.ndarray]], int]:
    """Sequential single-segment HNSW construction (Algorithm 1).
    ``mat`` must be L2-normalized; similarity = dot. Returns per-level
    adjacency (list over levels of list over nodes of int32 arrays)
    and the entry point node."""
    n = mat.shape[0]
    max_level = int(levels.max()) if n else 0
    m_max0 = 2 * m
    adj: list[list[np.ndarray]] = [
        [np.empty(0, np.int32) for _ in range(n)]
        for _ in range(max_level + 1)]
    entry, entry_level = 0, int(levels[0])

    for i in range(1, n):
        q = mat[i]
        l_i = int(levels[i])
        eps = [entry]
        # greedy descend with ef=1 through layers above l_i
        for lc in range(entry_level, l_i, -1):
            ids, sims = _search_layer(q, eps, 1, adj[lc], mat)
            eps = [int(ids[int(np.argmax(sims))])]
        for lc in range(min(l_i, entry_level), -1, -1):
            ids, sims = _search_layer(q, eps, ef_construction,
                                      adj[lc], mat)
            sel = _select_heuristic(ids, sims, mat, m)
            adj[lc][i] = np.asarray(sel, np.int32)
            cap = m_max0 if lc == 0 else m
            for nb in sel:
                cur = adj[lc][nb]
                merged = np.append(cur, np.int32(i))
                if merged.size > cap:
                    sims_nb = mat[merged] @ mat[nb]
                    keep = _select_heuristic(merged.astype(np.int64),
                                             sims_nb, mat, cap)
                    merged = np.asarray(keep, np.int32)
                adj[lc][nb] = merged
            eps = [int(x) for x in ids]
        if l_i > entry_level:
            entry, entry_level = i, l_i
    return adj, entry


def _segment_dir(index_dir: str, seg: int) -> str:
    return os.path.join(index_dir, f"segment={seg:05d}")


def _build_one_segment(group: pa.Table, index_dir: str, vec_col: str,
                       id_col: str, m: int, ef_construction: int,
                       seed: int) -> pa.Table:
    """map_groups kernel: build + persist one segment's graph. Emits a
    one-row manifest (segment, n, entry, max_level)."""
    import pyarrow.parquet as pq

    seg = int(group["segment"][0].as_py())
    order = np.argsort(group[id_col].to_numpy(zero_copy_only=False),
                       kind="stable")
    group = group.take(pa.array(order))
    ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    mat = _normalize(_batch_vectors(group, vec_col)).astype(np.float64)
    m_l = 1.0 / np.log(m)
    levels = _level_of(ids, seed, m_l)
    adj, entry = build_segment_graph(mat, levels, m, ef_construction)

    d = _segment_dir(index_dir, seg)
    os.makedirs(d, exist_ok=True)
    dim = mat.shape[1]
    pq.write_table(
        pa.table({id_col: pa.array(ids, pa.int64()),
                  "vec": pa.FixedSizeListArray.from_arrays(
                      pa.array(mat.astype(np.float32).ravel(),
                               pa.float32()), dim)}),
        os.path.join(d, "vectors.parquet"))
    lv, node, nbrs = [], [], []
    for lvl, layer in enumerate(adj):
        for i, arr in enumerate(layer):
            if arr.size or lvl <= levels[i]:
                lv.append(lvl)
                node.append(i)
                nbrs.append(arr.tolist())
    pq.write_table(
        pa.table({"level": pa.array(lv, pa.int32()),
                  "node": pa.array(node, pa.int32()),
                  "neighbors": pa.array(nbrs, pa.list_(pa.int32()))}),
        os.path.join(d, "graph.parquet"))
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump({"segment": seg, "n": int(len(ids)),
                   "entry": int(entry),
                   "max_level": int(levels.max()) if len(ids) else 0,
                   "dim": int(dim)}, f)
    return pa.table({"segment": pa.array([seg], pa.int64()),
                     "n": pa.array([len(ids)], pa.int64())})


def build_hnsw_index(ds, index_dir: str, vec_col: str = "embedding",
                     id_col: str = "vec_id", num_segments: int = 8,
                     m: int = 8, ef_construction: int = 64,
                     seed: int = 42) -> dict:
    """Partition by hash(vec_id) and build every segment's graph in
    parallel (``groupby.map_groups`` — one task per segment, the Lucene
    per-segment build). Writes index_dir/segment=NNNNN/* + meta.json."""
    import pyarrow.compute as pc

    os.makedirs(index_dir, exist_ok=True)

    def assign(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        x = ids * _MIX
        x = x ^ (x >> np.uint64(29))
        seg = (x % np.uint64(num_segments)).astype(np.int64)
        return t.append_column("segment", pa.array(seg, pa.int64()))

    manifest = (ds.map_batches(assign, batch_format="pyarrow")
                .groupby("segment")
                .map_groups(lambda g: _build_one_segment(
                    g, index_dir, vec_col, id_col, m, ef_construction,
                    seed), batch_format="pyarrow")
                .to_pandas())
    meta = {"num_segments": int(num_segments), "m": int(m),
            "ef_construction": int(ef_construction), "seed": int(seed),
            "vec_col": vec_col, "id_col": id_col,
            "n_vectors": int(manifest["n"].sum()),
            "segments": sorted(int(s) for s in manifest["segment"])}
    with open(os.path.join(index_dir, "hnsw_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


class SegmentSearcher:
    """Actor-pool beam-search kernel: loads a segment's vectors + graph
    ONCE per actor (setup in first touch, cached across queries/batches)
    and serves per-segment top-k. Input batches carry (segment, dir)
    rows; output is (vec_id, cosine) candidates — k rows per segment."""

    def __init__(self):
        self._cache: dict[str, tuple] = {}

    def _load(self, d: str):
        hit = self._cache.get(d)
        if hit is not None:
            return hit
        import pyarrow.parquet as pq

        meta = json.load(open(os.path.join(d, "meta.json")))
        vt = pq.read_table(os.path.join(d, "vectors.parquet"))
        ids = vt[0].to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = _batch_vectors(vt, "vec")  # already normalized
        gt = pq.read_table(os.path.join(d, "graph.parquet"))
        n = meta["n"]
        adj: list[list[np.ndarray]] = [
            [np.empty(0, np.int32) for _ in range(n)]
            for _ in range(meta["max_level"] + 1)]
        for lvl, node, nb in zip(gt["level"].to_pylist(),
                                 gt["node"].to_pylist(),
                                 gt["neighbors"].to_pylist()):
            adj[lvl][node] = np.asarray(nb, np.int32)
        loaded = (ids, vecs, adj, meta["entry"], meta["max_level"])
        self._cache[d] = loaded
        return loaded

    def search(self, d: str, q: np.ndarray, k: int, ef_search: int,
               allow_ids: np.ndarray | None = None
               ) -> tuple[np.ndarray, np.ndarray]:
        """Per-segment beam search; with ``allow_ids`` (sorted global
        vec_ids) it becomes Lucene-style FILTERED kNN: when the filter
        admits fewer rows than the beam, score them exactly (the
        cheaper plan); otherwise traverse the graph using disallowed
        nodes as bridges with a visit cap, falling back to the exact
        scan if the capped beam comes back short."""
        ids, vecs, adj, entry, max_level = self._load(d)
        qn = q / (np.sqrt(q @ q) or 1.0)
        ef = max(ef_search, k)
        allow = None
        if allow_ids is not None:
            allow = np.isin(ids, allow_ids, assume_unique=True)
            n_allowed = int(allow.sum())
            if n_allowed == 0:
                return np.empty(0, np.int64), np.empty(0, np.float64)
            if n_allowed <= ef:
                return self._exact_allowed(ids, vecs, qn, allow, k)
        eps = [entry]
        for lc in range(max_level, 0, -1):
            lids, sims = _search_layer(qn, eps, 1, adj[lc], vecs)
            eps = [int(lids[int(np.argmax(sims))])]
        lids, sims = _search_layer(qn, eps, ef, adj[0], vecs,
                                   allow=allow,
                                   visit_cap=(None if allow is None
                                              else 32 * ef))
        if allow is not None and lids.size < min(k, int(allow.sum())):
            return self._exact_allowed(ids, vecs, qn, allow, k)
        order = np.lexsort((ids[lids], -sims))[:k]
        return ids[lids[order]], sims[order]

    @staticmethod
    def _exact_allowed(ids, vecs, qn, allow, k):
        sel = np.flatnonzero(allow)
        sims = vecs[sel] @ qn
        order = np.lexsort((ids[sel], -sims))[:k]
        return ids[sel[order]], sims[order]

    def __call__(self, batch: pa.Table, q_ref, k: int,
                 ef_search: int, allow_ref=None) -> pa.Table:
        import ray

        q = np.asarray(ray.get(q_ref), dtype=np.float64)
        allow_ids = None if allow_ref is None else ray.get(allow_ref)
        out_ids: list[np.ndarray] = []
        out_sims: list[np.ndarray] = []
        for d in batch["dir"].to_pylist():
            i, s = self.search(d, q, k, ef_search, allow_ids)
            out_ids.append(i)
            out_sims.append(s)
        cat_i = (np.concatenate(out_ids) if out_ids
                 else np.empty(0, np.int64))
        cat_s = (np.concatenate(out_sims) if out_sims
                 else np.empty(0, np.float64))
        return pa.table({"vec_id": pa.array(cat_i, pa.int64()),
                         "cosine": pa.array(cat_s, pa.float64())})


def hnsw_index_topk(index_dir: str, query_vec, k: int = 10,
                    ef_search: int = 64, concurrency=(1, 4),
                    filter_ids=None) -> pa.Table:
    """Fan a query out across segment graphs (actor pool keeps loaded
    segments resident) and merge the per-segment top-k exactly —
    k×segments candidate rows cross the cluster, nothing else.
    ``filter_ids`` (sorted vec_ids, broadcast once) restricts results
    Lucene-filtered-kNN-style. Approximate in the standard HNSW sense;
    cosines of returned ids are float32-normalized dot products
    (recall pinned in test_hnsw.py)."""
    import ray
    import ray.data as rd

    meta = json.load(open(os.path.join(index_dir, "hnsw_meta.json")))
    dirs = [_segment_dir(index_dir, s) for s in meta["segments"]]
    q_ref = ray.put(np.asarray(query_vec, dtype=np.float64))
    allow_ref = (None if filter_ids is None else
                 ray.put(np.unique(np.asarray(filter_ids,
                                              dtype=np.int64))))
    cand = (rd.from_arrow(pa.table({"dir": pa.array(dirs)}))
            .map_batches(SegmentSearcher,
                         fn_kwargs={"q_ref": q_ref, "k": k,
                                    "ef_search": ef_search,
                                    "allow_ref": allow_ref},
                         batch_size=1, batch_format="pyarrow",
                         concurrency=concurrency)
            .to_pandas())
    cand = (cand.drop_duplicates(subset=["vec_id"])
            .sort_values(["cosine", "vec_id"], ascending=[False, True])
            .head(k).reset_index(drop=True))
    return pa.Table.from_pandas(cand, preserve_index=False)
