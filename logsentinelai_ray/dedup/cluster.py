"""Near-duplicate cluster assignment: connected components over dup pairs.

Deduplication pipelines emit *pairs* (exact.py, jaccard.py, minhash.py,
simhash.py); keep-one-per-cluster policies need *components* — every doc
labeled with the smallest doc_id reachable through the pair graph. (The
reference has no analog: its dedup story ends at Elasticsearch doc-id
collisions; components are table stakes for a training-data pipeline.)

Two exact paths:

- **Driver fast path** (< ``max_driver_edges`` edges): vectorized
  min-label propagation with pointer jumping over rank-compressed numpy
  arrays — O((E + V) · log V) with no Python per-edge loop.
- **Scale path**: iterative min-label propagation as Ray Data groupby
  rounds. Each round is two hash shuffles keyed by node id: (1) a
  node-keyed groupby joins every edge with its source's current label and
  emits (neighbor, label) messages, (2) a min-aggregate folds messages
  into the new label table. Labels decrease monotonically, so the
  rounds converge in O(graph diameter) and the label-sum is a cheap
  fixpoint detector. Nothing component- or graph-sized ever sits on the
  driver; each round's state is one (node, label) row per node.

Semantics (shared by the recursive-CTE DuckDB oracle): nodes = ids
appearing in >= 1 pair; cluster_id = min reachable id; output sorted by
doc_id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

CLUSTER_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("cluster_id", pa.int64()),
])


def _components_driver(a: np.ndarray, b: np.ndarray) -> pa.Table:
    nodes = np.unique(np.concatenate([a, b]))
    ra = np.searchsorted(nodes, a)
    rb = np.searchsorted(nodes, b)
    lbl = np.arange(nodes.size, dtype=np.int64)
    while True:
        prev = lbl.copy()
        m = np.minimum(lbl[ra], lbl[rb])
        np.minimum.at(lbl, ra, m)
        np.minimum.at(lbl, rb, m)
        lbl = lbl[lbl]  # pointer jumping: halves chain depth per round
        if np.array_equal(lbl, prev):
            break
    return pa.table({"doc_id": pa.array(nodes, pa.int64()),
                     "cluster_id": pa.array(nodes[lbl], pa.int64())})


def _emit_messages(group: pa.Table) -> pa.Table:
    """One node's groupby group: rows are its label row (dst = -1) plus
    one row per outgoing edge. Emit (node, lab) for itself and every
    neighbor."""
    dst = group["dst"].to_numpy(zero_copy_only=False)
    labs = group["lab"].to_numpy(zero_copy_only=False)
    own = labs[dst < 0]
    if own.size == 0:  # impossible unless the label table lost a node
        raise RuntimeError("label propagation round lost a node's label")
    lab = int(own.min())
    node = int(group["node"][0].as_py())
    neigh = dst[dst >= 0]
    out_nodes = np.concatenate(([node], neigh))
    return pa.table({
        "node": pa.array(out_nodes, pa.int64()),
        "lab": pa.array(np.full(out_nodes.size, lab, dtype=np.int64)),
    })


def _components_distributed(pairs: pa.Table) -> pa.Table:
    import ray.data as rd
    from ray.data.aggregate import Min, Sum

    a = pairs["a"]
    b = pairs["b"]
    edges = pa.table({
        "node": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
        "dst": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()]),
    })
    edges_ds = rd.from_arrow(edges).map_batches(
        lambda t: t.append_column(
            "lab", pa.array(np.full(t.num_rows, -1, dtype=np.int64))),
        batch_format="pyarrow").materialize()
    # init: label(node) = min(node, min direct neighbor) — saves a round
    labels = (edges_ds
              .map_batches(lambda t: pa.table({
                  "node": t["node"],
                  "lab": pa.array(np.minimum(
                      t["node"].to_numpy(zero_copy_only=False),
                      t["dst"].to_numpy(zero_copy_only=False))),
              }), batch_format="pyarrow")
              .groupby("node").aggregate(Min("lab", alias_name="lab"))
              .materialize())
    prev_sum = None
    while True:
        cur = labels.map_batches(
            lambda t: pa.table({
                "node": t["node"],
                "dst": pa.array(np.full(t.num_rows, -1, dtype=np.int64)),
                "lab": t["lab"],
            }), batch_format="pyarrow")
        msgs = (cur.union(edges_ds)
                .groupby("node")
                .map_groups(_emit_messages, batch_format="pyarrow"))
        labels = (msgs.groupby("node")
                  .aggregate(Min("lab", alias_name="lab"))
                  .materialize())
        s = labels.sum("lab")
        if s == prev_sum:  # labels are monotone non-increasing
            break
        prev_sum = s
    parts = list(labels.iter_batches(batch_format="pyarrow",
                                     batch_size=1 << 20))
    tbl = pa.concat_tables(parts)
    return pa.table({"doc_id": tbl["node"],
                     "cluster_id": tbl["lab"]}).cast(CLUSTER_SCHEMA)


def connected_components(pairs: pa.Table,
                         max_driver_edges: int = 5_000_000) -> pa.Table:
    """(doc_id, cluster_id) for every id in ``pairs`` (columns a, b),
    cluster_id = min reachable id, sorted by doc_id. Both paths are exact
    and tested identical."""
    if pairs.num_rows == 0:
        return CLUSTER_SCHEMA.empty_table()
    if pairs.num_rows <= max_driver_edges:
        out = _components_driver(
            pairs["a"].to_numpy(zero_copy_only=False).astype(np.int64),
            pairs["b"].to_numpy(zero_copy_only=False).astype(np.int64))
    else:
        out = _components_distributed(pairs)
    return out.sort_by("doc_id")
