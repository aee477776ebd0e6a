"""Exact duplicate-span statistics (substring-level dedup, the
train-data-hygiene step of Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better": find spans of >= k tokens that appear in
more than one document and measure how much of each document they cover).

Definition (shared verbatim by the DuckDB oracle in __ray_entry__):
  tokens     = non-empty runs of [a-z0-9] in lower(text)
  k-grams    = every positional word k-gram (tokens joined by one space)
  duplicated = a k-gram occurring in >= 2 DISTINCT documents
  coverage   = |union over duplicated k-gram starts p of [p, p+k)| per doc
  output     = (doc_id, dup_tokens, n_tokens, dup_ratio) for docs with
               coverage > 0, sorted by doc_id

Plan shape: duplication is decided by a VECTORIZED hash aggregate —
per-doc distinct (doc_id, sh) rows straight off the docs table (the
jaccard shingle kernel; each doc lives in exactly one batch, so
per-batch distinct is globally distinct) → ``groupby(sh).count() >= 2``
— never a per-group Python call (a ``map_groups`` over one group per
distinct gram means millions of Python invocations at sf scale and
trillions at 10^12 docs). Marked positions then come from one of two
exchanges, cross-tested equal (the `dedup/jaccard.py` size_exchange
precedent):

  dup_exchange="broadcast" (default): the duplicated-gram keys are
    collected once, ``ray.put`` once, and membership is one vectorized
    ``pc.is_in`` inside the same map_batches task that EMITS the
    positional grams — the gram rows never shuffle at all, and the
    per-doc token counts ride along in the same task, so the only
    exchanges in the whole plan are the (sh) count aggregate and the
    tiny groupby(doc_id) over already-filtered marked rows.
  dup_exchange="join": two hash-partitioned ``Dataset.join``s (gram
    rows × dup keys, coverage × token counts) — nothing key-set-sized
    ever lands on the driver. The scale escape hatch: the duplicated-
    gram key set is corpus-vocabulary-sized in the worst case (every
    doc a near-dup), which outgrows a broadcast at extreme scale.

Scale notes (10^12 docs): the gram exchange carries the gram string —
at extreme scale hash grams to int64 first (fixed-width exchange; a
64-bit collision falsely marks ~one span per ~10^9 distinct grams —
fine for filtering, not for the exact oracle, so it's opt-in). The
per-doc union never holds more than one doc's marked positions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_OUT_SCHEMA = pa.schema([("doc_id", pa.int64()),
                         ("dup_tokens", pa.int64()),
                         ("n_tokens", pa.int64()),
                         ("dup_ratio", pa.float64())])


def _gram_pos_rows(batch: pa.Table, text_col: str, id_col: str,
                   k: int, with_n_tokens: bool = False) -> pa.Table:
    """Emit (doc_id, sh, pos[, n_tokens]) for EVERY positional word
    k-gram — the jaccard shingle kernel (dedup/jaccard.py::_shingle_rows)
    with the 0-based start position kept and no per-doc dedup (positions
    matter). ``with_n_tokens`` rides the per-doc token count along on
    each row (same task, no extra pass or join downstream).
    """
    text = pc.utf8_lower(batch[text_col])
    lists = pc.split_pattern_regex(text, pattern="[^a-z0-9]+")
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = pc.filter(flat, pa.array(keep))
    parent = parent[keep]
    counts = np.bincount(parent, minlength=len(batch)).astype(np.int64)
    n_sh = np.maximum(counts - k + 1, 0)
    total = int(n_sh.sum())
    cols = {"doc_id": pa.array([], pa.int64()),
            "sh": pa.array([], pa.string()),
            "pos": pa.array([], pa.int64())}
    if with_n_tokens:
        cols["n_tokens"] = pa.array([], pa.int64())
    if total == 0:
        return pa.table(cols)
    row_starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    base = np.repeat(row_starts, n_sh)
    sh_starts = np.cumsum(n_sh) - n_sh
    offs = np.arange(total, dtype=np.int64) - np.repeat(sh_starts, n_sh)
    idx = base + offs
    take = [pc.take(flat, pa.array(idx + j, pa.int64())) for j in range(k)]
    sh = pc.binary_join_element_wise(*take, " ")
    doc_rep = np.repeat(np.arange(len(batch), dtype=np.int64), n_sh)
    doc_ids = batch[id_col].to_numpy(zero_copy_only=False)[doc_rep]
    cols = {"doc_id": pa.array(doc_ids, pa.int64()), "sh": sh,
            "pos": pa.array(offs, pa.int64())}
    if with_n_tokens:
        cols["n_tokens"] = pa.array(counts[doc_rep], pa.int64())
    return pa.table(cols)


def _dup_gram_keys(ds, text_col: str, id_col: str, k: int):
    """Dataset of grams occurring in >= 2 distinct documents: per-doc
    distinct (doc_id, sh) rows straight off the docs table (the jaccard
    shingle kernel — in-batch distinct is globally distinct because each
    doc is in exactly one docs batch), then one vectorized hash
    aggregate; no per-group Python anywhere."""
    from functools import partial

    from ray.data.aggregate import Count

    from .jaccard import _shingle_rows

    pairs = ds.map_batches(
        partial(_shingle_rows, text_col=text_col, id_col=id_col, n=k),
        batch_format="pyarrow")
    counts = pairs.groupby("sh").aggregate(Count(alias_name="nd"))

    def keep_dup(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t["nd"], 2)).select(["sh"])

    return counts.map_batches(keep_dup, batch_format="pyarrow")


def _coverage_of_doc(group: pa.Table, k: int) -> pa.Table:
    """Union of [p, p+k) over one doc's marked gram starts — sorted
    starts, covered = sum(min(gap, k)) + k. Positions are unique per doc
    (one gram per start), so no dedup pass is needed."""
    ps = np.sort(group["pos"].to_numpy(zero_copy_only=False))
    covered = int(np.minimum(np.diff(ps), k).sum()) + k if ps.size else 0
    out = {"doc_id": pa.array([group["doc_id"][0].as_py()], pa.int64()),
           "dup_tokens": pa.array([covered], pa.int64())}
    if "n_tokens" in group.column_names:
        out["n_tokens"] = pa.array([group["n_tokens"][0].as_py()],
                                   pa.int64())
    return pa.table(out)


def _finish(t: pa.Table) -> pa.Table:
    dup = t["dup_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
    n = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.float64)
    return t.append_column("dup_ratio",
                           pa.array(dup / np.maximum(n, 1.0), pa.float64()))


def remove_duplicate_spans(ds, text_col: str = "text",
                           id_col: str = "doc_id", k: int = 3,
                           max_broadcast_keys: int = 5_000_000):
    """The REWRITE step of substring-level dedup (Lee et al. 2022):
    every duplicated k-gram keeps its occurrences only in the keeper
    document (the min doc_id containing it) and is removed — with its
    covered tokens — everywhere else. Output is a Dataset of
    (doc_id, clean_text, n_tokens, kept_tokens) over ALL documents,
    where clean_text is the kept tokens joined by single spaces (the
    operator lives in token space; original whitespace/punctuation is
    not preserved — the standard formulation for training corpora).

    Plan: one (sh) aggregate produces the (duplicated gram -> keeper)
    map — Count over per-doc-distinct rows decides duplication, Min
    picks the keeper; the map broadcasts once via ``ray.put``; each
    batch then marks, masks and REBUILDS its own docs in a single
    vectorized task (each doc lives in exactly one batch), so the gram
    rows never shuffle. New adjacencies created by a removal can form
    new duplicated grams (as in the paper); one pass removes the
    original duplication only. Raises when the dup-key map exceeds
    ``max_broadcast_keys`` — at that scale run duplicate_span_stats'
    join exchange first and shard the corpus by its dup_ratio."""
    from functools import partial

    import ray
    from ray.data.aggregate import Count, Min

    from .jaccard import _shingle_rows

    pairs = ds.map_batches(
        partial(_shingle_rows, text_col=text_col, id_col=id_col, n=k),
        batch_format="pyarrow")
    agg = pairs.groupby("sh").aggregate(Count(alias_name="nd"),
                                        Min(id_col, alias_name="keeper"))

    key_chunks, keep_chunks, n_keys = [], [], 0
    for b in agg.iter_batches(batch_format="pyarrow"):
        m = pc.greater_equal(b["nd"], 2)
        sel = b.filter(m)
        if sel.num_rows:
            key_chunks.append(sel["sh"].combine_chunks())
            keep_chunks.append(sel["keeper"].combine_chunks())
            n_keys += sel.num_rows
        if n_keys > max_broadcast_keys:
            raise ValueError(
                f"duplicated-gram map exceeds the broadcast budget "
                f"({n_keys} > {max_broadcast_keys}); pre-shard the "
                f"corpus (see duplicate_span_stats dup_exchange='join')")
    keys = (pa.concat_arrays(key_chunks) if key_chunks
            else pa.array([], pa.string()))
    keepers = (pa.concat_arrays(keep_chunks).cast(pa.int64())
               .to_numpy(zero_copy_only=False) if keep_chunks
               else np.empty(0, np.int64))
    map_ref = ray.put((keys, keepers))

    def rewrite(batch: pa.Table) -> pa.Table:
        kset, keep_of = ray.get(map_ref)
        text = pc.utf8_lower(batch[text_col])
        lists = pc.split_pattern_regex(text, pattern="[^a-z0-9]+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists) \
            .to_numpy(zero_copy_only=False)
        ok = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = pc.filter(flat, pa.array(ok))
        parent = parent[ok]
        counts = np.bincount(parent, minlength=len(batch)) \
            .astype(np.int64)
        doc_ids = batch[id_col].to_numpy(zero_copy_only=False)
        remove = np.zeros(len(flat) + 1, dtype=np.int64)
        n_sh = np.maximum(counts - k + 1, 0)
        total = int(n_sh.sum())
        if total and len(kset):
            row_starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
            base = np.repeat(row_starts, n_sh)
            sh_starts = np.cumsum(n_sh) - n_sh
            offs = (np.arange(total, dtype=np.int64)
                    - np.repeat(sh_starts, n_sh))
            idx = base + offs
            cols = [pc.take(flat, pa.array(idx + j, pa.int64()))
                    for j in range(k)]
            sh = pc.binary_join_element_wise(*cols, " ")
            hit = pc.index_in(sh, value_set=kset)
            doc_rep = np.repeat(np.arange(len(batch), dtype=np.int64),
                                n_sh)
            valid = pc.is_valid(hit).to_numpy(zero_copy_only=False)
            hit_i = pc.fill_null(hit, 0).cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
            marked = valid & (keep_of[hit_i] != doc_ids[doc_rep])
            starts = idx[marked]
            # interval union via a +1/-1 difference array
            np.add.at(remove, starts, 1)
            np.add.at(remove, starts + k, -1)
        covered = np.cumsum(remove[:-1]) > 0
        kept_mask = ~covered
        kept = pc.filter(flat, pa.array(kept_mask))
        kept_counts = np.bincount(parent[kept_mask],
                                  minlength=len(batch)).astype(np.int64)
        offsets = np.concatenate(([0], np.cumsum(kept_counts)))
        kept_lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), kept.combine_chunks())
        clean = pc.binary_join(kept_lists, " ")
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "clean_text": clean,
            "n_tokens": pa.array(counts, pa.int64()),
            "kept_tokens": pa.array(kept_counts, pa.int64()),
        })

    return ds.map_batches(rewrite, batch_format="pyarrow")


def duplicate_span_stats(ds, text_col: str = "text",
                         id_col: str = "doc_id", k: int = 3,
                         dup_exchange: str = "broadcast",
                         join_partitions: int = 16,
                         max_broadcast_keys: int = 5_000_000) -> pa.Table:
    """Per-document duplicated-span coverage — returns a pyarrow Table
    (doc_id, dup_tokens, n_tokens, dup_ratio) for documents with any
    cross-document duplicated k-gram, sorted by doc_id.

    The broadcast path self-guards: if the duplicated-gram key set
    exceeds ``max_broadcast_keys`` while being collected, it abandons
    the broadcast and re-plans through the hash-partitioned joins —
    a heavily-duplicated 10^12-doc corpus never lands a vocabulary-sized
    key set on the driver."""
    from functools import partial

    import ray

    dup = _dup_gram_keys(ds, text_col, id_col, k)

    if dup_exchange == "broadcast":
        # bounded collect: fall back to the join exchange the moment the
        # key set outgrows the broadcast budget
        key_chunks, n_keys = [], 0
        for b in dup.iter_batches(batch_format="pyarrow"):
            if b.num_rows:
                key_chunks.append(b["sh"].combine_chunks())
                n_keys += b.num_rows
            if n_keys > max_broadcast_keys:
                dup_exchange = "join"
                key_chunks = None
                break

    if dup_exchange == "join":
        grams = ds.map_batches(
            partial(_gram_pos_rows, text_col=text_col, id_col=id_col,
                    k=k),
            batch_format="pyarrow")
        marked = grams.join(dup, "inner",
                            num_partitions=join_partitions,
                            on=("sh",)).select_columns(["doc_id", "pos"])
        cov = marked.groupby("doc_id").map_groups(
            partial(_coverage_of_doc, k=k), batch_format="pyarrow")

        def tok_counts(t: pa.Table) -> pa.Table:
            n = pc.count_substring_regex(pc.utf8_lower(t[text_col]),
                                         r"[a-z0-9]+")
            return pa.table({"doc_id": pc.cast(t[id_col], pa.int64()),
                             "n_tokens": pc.cast(n, pa.int64())})

        sizes = ds.map_batches(tok_counts, batch_format="pyarrow")
        joined = cov.join(sizes, "inner",
                          num_partitions=join_partitions,
                          on=("doc_id",))
        out_ds = joined.map_batches(_finish, batch_format="pyarrow")
    else:
        # dup-key set collected once above (its size is the reason the
        # join path exists), broadcast once via ray.put, membership
        # tested inside the SAME task that emits the positional grams —
        # the gram rows never enter an exchange
        keys = (pa.concat_arrays([c if isinstance(c, pa.Array)
                                  else c.combine_chunks()
                                  for c in key_chunks])
                if key_chunks else pa.array([], pa.string()))
        key_ref = ray.put(keys)

        def mark(batch: pa.Table) -> pa.Table:
            g = _gram_pos_rows(batch, text_col, id_col, k,
                               with_n_tokens=True)
            hit = pc.is_in(g["sh"], value_set=ray.get(key_ref))
            return g.filter(pc.fill_null(hit, False)) \
                    .select(["doc_id", "pos", "n_tokens"])

        marked = ds.map_batches(mark, batch_format="pyarrow")
        out_ds = marked.groupby("doc_id").map_groups(
            partial(_coverage_of_doc, k=k),
            batch_format="pyarrow").map_batches(
                _finish, batch_format="pyarrow")

    out = out_ds.to_pandas()
    if len(out) == 0:
        return _OUT_SCHEMA.empty_table()
    out = out.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(
        out[["doc_id", "dup_tokens", "n_tokens", "dup_ratio"]],
        preserve_index=False)
