"""Exact n-gram Jaccard near-duplicate pairs (distributed shingle join).

Definition (shared verbatim by the DuckDB oracle in __ray_entry__):
  tokens    = non-empty runs of [a-z0-9] in lower(text)   (no camel split)
  shingles  = distinct word n-grams (tokens joined by one space)
  J(a, b)   = |Sa ∩ Sb| / (|Sa| + |Sb| - |Sa ∩ Sb|)
  output    = pairs with J >= threshold, (a < b), sorted by (a, b)

Plan shape: map_batches shingle-emit (fully vectorized: Arrow list
offsets → windowed takes → binary_join_element_wise, per-doc distinct via
an Arrow group_by) → groupby(shingle).map_groups block emission →
map_batches vectorized block expansion → groupby(a, b).count =
intersection sizes → jaccard against broadcast per-doc set sizes. Only
(hash, id) pairs ever shuffle, never text. Per-doc set sizes come from a
distributed groupby(doc_id).count() — one row per document — never from
streaming shingle rows to the driver.

Skew note: a shingle shared by g docs expands to g(g-1)/2 pairs; the
expansion is SALTED (chunk-pair block rows distribute one group's pairs
across tasks) and CAPPED by default at a corpus-aware ``max_group``
bound chosen far above any real group in the sf corpora, so the default
result still equals the oracle's there; ``max_group=None`` forces the
uncapped exact expansion.

Scale notes (10^12 docs): the packed int64 pair key needs ids < 2^31 —
enforced with a hard error; beyond that the expansion emits two id columns
and the same groupby applies. The broadcast size lookup is one (id, count)
int64 pair per document — fine to ~10^9 docs; beyond that pass
``size_exchange="join"``: the size table stays a Dataset and the pair
table hash-partition-joins it on a then b (``_jaccard_join_path``), so
nothing doc-count-sized ever materializes on the driver. Both paths are
cross-tested equal.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _shingle_rows(batch: pa.Table, text_col: str, id_col: str,
                  n: int, distinct: bool = True) -> pa.Table:
    """Emit (doc_id, sh) word-n-gram rows — per-doc distinct by default
    (the dedup use), raw occurrences with ``distinct=False`` (n-gram
    counting, e.g. bigram-LM / BPE statistics). No per-row Python.

    Tokens come from one vectorized regex split; shingles are built from
    the flattened token values with windowed ``pc.take`` and a single
    ``binary_join_element_wise``; per-doc distinctness is an Arrow
    ``group_by`` over (doc_id, sh).
    """
    text = pc.utf8_lower(batch[text_col])
    lists = pc.split_pattern_regex(text, pattern="[^a-z0-9]+")
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = pc.filter(flat, pa.array(keep))
    parent = parent[keep]
    counts = np.bincount(parent, minlength=len(batch)).astype(np.int64)
    n_sh = np.maximum(counts - n + 1, 0)
    total = int(n_sh.sum())
    if total == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "sh": pa.array([], pa.string())})
    row_starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    base = np.repeat(row_starts, n_sh)
    sh_starts = np.cumsum(n_sh) - n_sh
    offs = np.arange(total, dtype=np.int64) - np.repeat(sh_starts, n_sh)
    idx = base + offs
    cols = [pc.take(flat, pa.array(idx + j, pa.int64())) for j in range(n)]
    sh = pc.binary_join_element_wise(*cols, " ")
    doc_rep = np.repeat(np.arange(len(batch), dtype=np.int64), n_sh)
    doc_ids = batch[id_col].to_numpy(zero_copy_only=False)[doc_rep]
    t = pa.table({"doc_id": pa.array(doc_ids, pa.int64()), "sh": sh})
    if not distinct:
        return t
    # each document lives in exactly one input row, so per-batch distinct
    # (doc_id, sh) is globally distinct
    return t.group_by(["doc_id", "sh"]).aggregate([])


# ids per side of an expansion block: one block row expands to at most
# _PAIR_BLOCK^2 pairs (~2 MB of int64), the unit of distribution for a hot
# shingle's otherwise-quadratic pair expansion
_PAIR_BLOCK = 512

_BLOCK_SCHEMA = pa.schema([("ia", pa.list_(pa.int64())),
                           ("ib", pa.list_(pa.int64()))])


def _pair_blocks_of_group(group: pa.Table, max_group: int | None,
                          block: int = _PAIR_BLOCK) -> pa.Table:
    """One shingle's doc set -> expansion block rows (ia, ib id lists).

    The sorted id list is chunked into ``block``-sized slices; emitting
    (chunk_i, chunk_j) for every i <= j covers each unordered pair
    exactly once after the downstream ``a < b`` filter. A hot shingle's
    g(g-1)/2 expansion is thereby SALTED over (g/block)^2/2 independent
    rows that Ray Data spreads across tasks and batches — no single task
    ever holds a group-squared pair set (the skew treatment the module
    docstring prescribes)."""
    ids = np.sort(group["doc_id"].to_numpy(zero_copy_only=False))
    g = ids.size
    if g and ids[-1] >= 2 ** 31:
        raise ValueError(
            f"doc_id {int(ids[-1])} >= 2^31 overflows the packed int64 "
            "pair key; use the two-column (a, b) groupby path instead "
            "(see module scale notes)")
    if g < 2 or (max_group is not None and g > max_group):
        return _BLOCK_SCHEMA.empty_table()
    chunks = [ids[i:i + block] for i in range(0, g, block)]
    ia, ib = [], []
    for i in range(len(chunks)):
        for j in range(i, len(chunks)):
            ia.append(chunks[i])
            ib.append(chunks[j])
    return pa.table({"ia": pa.array(ia, pa.list_(pa.int64())),
                     "ib": pa.array(ib, pa.list_(pa.int64()))})


def _expand_pair_blocks(t: pa.Table) -> pa.Table:
    """Vectorized cross-product expansion of block rows into packed pair
    keys a*2^32+b (only a < b kept — within-chunk blocks are emitted as
    (chunk, chunk), so the filter both deduplicates and orients)."""
    if t.num_rows == 0:
        return pa.table({"pk": pa.array([], pa.int64())})
    t = t.combine_chunks()
    ia, ib = t["ia"], t["ib"]
    la = pc.list_value_length(ia).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    lb = pc.list_value_length(ib).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    counts = la * lb
    total = int(counts.sum())
    if total == 0:
        return pa.table({"pk": pa.array([], pa.int64())})
    row = np.repeat(np.arange(t.num_rows, dtype=np.int64), counts)
    starts = np.cumsum(counts) - counts
    lin = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    i = lin // lb[row]
    j = lin - i * lb[row]
    flat_a = pc.list_flatten(ia).to_numpy(zero_copy_only=False)
    flat_b = pc.list_flatten(ib).to_numpy(zero_copy_only=False)
    offa = np.cumsum(la) - la
    offb = np.cumsum(lb) - lb
    a = flat_a[offa[row] + i]
    b = flat_b[offb[row] + j]
    keep = a < b
    pk = (a[keep].astype(np.int64) << 32) | b[keep].astype(np.int64)
    return pa.table({"pk": pa.array(pk, pa.int64())})


def _doc_sizes(shingles) -> tuple[np.ndarray, np.ndarray]:
    """Distinct-shingle count per doc via a distributed groupby.

    Only one (doc_id, count) row per document ever reaches the driver —
    the shingle rows themselves stay in the cluster.
    """
    from ray.data.aggregate import Count

    agg = shingles.groupby("doc_id").aggregate(Count(alias_name="n_sh"))
    ids_parts, cnt_parts = [], []
    for b in agg.iter_batches(batch_format="pyarrow", batch_size=1 << 20):
        ids_parts.append(b["doc_id"].to_numpy(zero_copy_only=False))
        cnt_parts.append(b["n_sh"].to_numpy(zero_copy_only=False))
    if not ids_parts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    ids = np.concatenate(ids_parts)
    cnt = np.concatenate(cnt_parts)
    order = np.argsort(ids)
    return ids[order], cnt[order]


def _pair_score(inter: np.ndarray, na: np.ndarray, nb: np.ndarray,
                metric: str) -> np.ndarray:
    """Pair similarity from intersection + set sizes. ``jaccard`` =
    inter/(na+nb-inter); ``containment`` = inter/min(na, nb) — the
    asymmetric-subset detector (a short doc quoted inside a long one
    scores ~1.0 here but low Jaccard; the metric CommonCrawl-style
    pipelines use to catch quote inclusion)."""
    if metric == "containment":
        return inter / np.minimum(na, nb)
    return inter / (na + nb - inter)


def _jaccard_filter(batch: pa.Table, sz_ref, threshold: float,
                    metric: str = "jaccard") -> pa.Table:
    """Unpack (pk, inter) → (a, b, jaccard) rows above threshold."""
    import ray

    sz_ids, sz_counts = ray.get(sz_ref)
    pk = batch["pk"].to_numpy(zero_copy_only=False)
    inter = batch["inter"].to_numpy(zero_copy_only=False).astype(np.float64)
    a = (pk >> 32).astype(np.int64)
    b = (pk & 0xFFFFFFFF).astype(np.int64)
    na = sz_counts[np.searchsorted(sz_ids, a)].astype(np.float64)
    nb = sz_counts[np.searchsorted(sz_ids, b)].astype(np.float64)
    j = _pair_score(inter, na, nb, metric)
    keep = j >= threshold
    return pa.table({"a": pa.array(a[keep], pa.int64()),
                     "b": pa.array(b[keep], pa.int64()),
                     "jaccard": pa.array(j[keep], pa.float64())})


def _unpack_pk(batch: pa.Table) -> pa.Table:
    """(pk, inter) → (a, b, inter) two-column pair rows."""
    pk = batch["pk"].to_numpy(zero_copy_only=False)
    return pa.table({
        "a": pa.array((pk >> 32).astype(np.int64), pa.int64()),
        "b": pa.array((pk & 0xFFFFFFFF).astype(np.int64), pa.int64()),
        "inter": batch["inter"]})


def _jaccard_join_path(pairs_ds, sizes_ds, threshold: float,
                       num_partitions: int, metric: str = "jaccard"):
    """Size lookup as two hash-partitioned joins — the 10^9+-doc
    exchange the module scale note prescribes: nothing doc-count-sized
    ever sits on the driver or in one task's heap. The pair table joins
    the (doc_id, n_sh) size table on ``a`` then ``b``; the threshold
    filter runs vectorized inside ``map_batches`` so only surviving
    pairs leave the exchange."""
    from ray.data.aggregate import Count

    counted = (pairs_ds.groupby("pk")
               .aggregate(Count(alias_name="inter"))
               .map_batches(_unpack_pk, batch_format="pyarrow"))
    sz_a = sizes_ds.rename_columns({"n_sh": "na"})
    sz_b = sizes_ds.rename_columns({"n_sh": "nb"})
    joined = counted.join(sz_a, "inner", num_partitions=num_partitions,
                          on=("a",), right_on=("doc_id",))
    joined = joined.join(sz_b, "inner", num_partitions=num_partitions,
                         on=("b",), right_on=("doc_id",))

    def finish(t: pa.Table) -> pa.Table:
        inter = t["inter"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        na = t["na"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = t["nb"].to_numpy(zero_copy_only=False).astype(np.float64)
        j = _pair_score(inter, na, nb, metric)
        keep = j >= threshold
        return pa.table({
            "a": pc.filter(t["a"], pa.array(keep)),
            "b": pc.filter(t["b"], pa.array(keep)),
            "jaccard": pa.array(j[keep], pa.float64())})

    return joined.map_batches(finish, batch_format="pyarrow")


def ngram_jaccard_pairs(ds, text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, threshold: float = 0.5,
                        max_group: int | None | str = "auto",
                        driver_max_rows: int = 5_000_000,
                        size_exchange: str = "broadcast",
                        join_partitions: int = 32,
                        metric: str = "jaccard"):
    """Returns a pyarrow Table (a, b, jaccard) sorted by (a, b).

    Pair EXPANSION runs distributed AND salted: each shingle group emits
    bounded (chunk_i, chunk_j) block rows (``_pair_blocks_of_group``)
    that a downstream ``map_batches`` expands vectorized — a hot
    shingle's quadratic blowup spreads across tasks instead of grinding
    one. Pair COUNTING defaults to a distributed ``groupby("pk").count()``
    with the per-doc size lookup broadcast via ``ray.put`` and the
    threshold filter applied inside ``map_batches`` — only surviving
    pairs reach the driver. A driver-side ``np.unique`` fast path applies
    only below ``driver_max_rows`` pair rows, where shuffle overhead
    dwarfs the work.

    ``max_group="auto"`` (the default) caps group expansion at
    ``min(10_000, max(64, 4*sqrt(n_docs)))`` — a shingle shared by more
    docs than that is boilerplate whose g^2/2 pairs would dominate the
    whole job while contributing near-zero-Jaccard pairs (each member
    doc still pairs through its OTHER shingles). The bound sits far
    above any real group in the sf corpora (measured max 7 @500 docs,
    25 @5000 docs), so the result stays exactly the oracle's there;
    pass ``max_group=None`` to force the uncapped exact expansion.

    ``size_exchange="join"`` swaps the broadcast size lookup for two
    hash-partitioned Dataset joins (the 10^9+-doc path — see module
    scale notes); the default broadcast is faster below that.
    """
    from functools import partial

    import ray
    from ray.data.aggregate import Count

    shingles = ds.map_batches(
        partial(_shingle_rows, text_col=text_col, id_col=id_col, n=n),
        batch_format="pyarrow").materialize()
    if size_exchange == "join":
        # size table STAYS a Dataset — hash-partitioned joins downstream
        sizes_ds = shingles.groupby("doc_id") \
            .aggregate(Count(alias_name="n_sh")).materialize()
        n_docs = sizes_ds.count()
        sz_ids = sz_counts = None
    else:
        sz_ids, sz_counts = _doc_sizes(shingles)
        n_docs = sz_ids.size
    if max_group == "auto":
        max_group = min(10_000, max(64, int(4 * n_docs ** 0.5) + 1))

    pairs_ds = (shingles.groupby("sh")
                .map_groups(partial(_pair_blocks_of_group,
                                    max_group=max_group),
                            batch_format="pyarrow")
                .map_batches(_expand_pair_blocks, batch_format="pyarrow",
                             batch_size=128)
                .materialize())
    if size_exchange == "join":
        out = _jaccard_join_path(pairs_ds, sizes_ds, threshold,
                                 join_partitions, metric=metric)
        parts = list(out.iter_batches(batch_format="pyarrow",
                                      batch_size=1 << 20))
        t = (pa.concat_tables(parts) if parts else
             pa.table({"a": pa.array([], pa.int64()),
                       "b": pa.array([], pa.int64()),
                       "jaccard": pa.array([], pa.float64())}))
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        j = t["jaccard"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        return pa.table({"a": pa.array(a[order], pa.int64()),
                         "b": pa.array(b[order], pa.int64()),
                         "jaccard": pa.array(j[order], pa.float64())})

    n_pairs = pairs_ds.count()

    if n_pairs <= driver_max_rows:
        pk = np.concatenate([
            b["pk"].to_numpy(zero_copy_only=False)
            for b in pairs_ds.iter_batches(batch_format="pyarrow",
                                           batch_size=1 << 20)] or
            [np.empty(0, dtype=np.int64)])
        uniq, inter = np.unique(pk, return_counts=True)
        a = (uniq >> 32).astype(np.int64)
        b = (uniq & 0xFFFFFFFF).astype(np.int64)
        na = sz_counts[np.searchsorted(sz_ids, a)].astype(np.float64)
        nb = sz_counts[np.searchsorted(sz_ids, b)].astype(np.float64)
        it = inter.astype(np.float64)
        j = _pair_score(it, na, nb, metric)
        keep = j >= threshold
        a, b, j = a[keep], b[keep], j[keep]
    else:
        sz_ref = ray.put((sz_ids, sz_counts))
        out = (pairs_ds.groupby("pk")
               .aggregate(Count(alias_name="inter"))
               .map_batches(partial(_jaccard_filter, sz_ref=sz_ref,
                                    threshold=threshold, metric=metric),
                            batch_format="pyarrow"))
        parts = list(out.iter_batches(batch_format="pyarrow",
                                      batch_size=1 << 20))
        t = (pa.concat_tables(parts) if parts else
             pa.table({"a": pa.array([], pa.int64()),
                       "b": pa.array([], pa.int64()),
                       "jaccard": pa.array([], pa.float64())}))
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        j = t["jaccard"].to_numpy(zero_copy_only=False)

    order = np.lexsort((b, a))
    return pa.table({"a": pa.array(a[order], pa.int64()),
                     "b": pa.array(b[order], pa.int64()),
                     "jaccard": pa.array(j[order], pa.float64())})
