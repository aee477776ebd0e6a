"""Block-max WAND top-k (exact, deterministic, safe-skip only).

The dynamic-pruning strategy Lucene uses under the reference's Elasticsearch
queries (the reference's own top-N panels, SURVEY.md §2.7 O6). Exactness
argument:

- candidates are enumerated in increasing doc-id order, so once the heap
  holds k results, any later doc with score <= threshold loses the
  (score desc, doc_id asc) tie-break anyway — skipping on ``ub <= threshold``
  is rank-exact, not just approximately correct;
- full evaluation sums term contributions in sorted-term order, float64 —
  bit-identical to the oracle (bm25.BM25Oracle);
- block-max refinement only skips when the sum of per-block upper bounds is
  <= threshold, a provable bound.

``filter_predicate`` (doc_id -> bool) implements keyword filters (lang /
repo); filtered-out docs are advanced past without scoring and never tighten
the threshold, so bounds stay valid.
"""

from __future__ import annotations

import heapq

import numpy as np

from .postings import INF_DOC, PostingsCursor


def block_max_wand(cursors: list[PostingsCursor], k: int,
                   filter_predicate=None,
                   seed_threshold: float | None = None
                   ) -> list[tuple[int, float]]:
    """Return top-k ``(doc_id, score)`` sorted by (score desc, doc_id asc).

    ``cursors`` must be in sorted-term order (the scoring order contract).
    ``seed_threshold`` warm-starts pruning; it MUST be strictly below the
    true k-th best score (callers pass ``nextafter(lower_bound, -inf)`` of
    a provable lower bound, e.g. the k-th best among one term's fully
    scored candidates) — then no true top-k doc is ever pruned, and the
    heap still collects them all.
    """
    term_order = [c for c in cursors if not c.exhausted()]
    if not term_order or k <= 0:
        return []
    # heap of (score, -doc_id): heap[0] is the weakest kept result
    heap: list[tuple[float, int]] = []
    threshold = float("-inf") if seed_threshold is None else seed_threshold

    active = list(term_order)
    while True:
        active = [c for c in active if not c.exhausted()]
        if not active:
            break
        active.sort(key=lambda c: c.cur_doc)
        # pivot: first prefix whose summed global UBs can beat the threshold
        ub = 0.0
        pivot = -1
        for i, c in enumerate(active):
            ub += c.max_score
            if ub > threshold:
                pivot = i
                break
        if pivot < 0:
            break  # nothing can beat the threshold any more
        pivot_doc = active[pivot].cur_doc
        if pivot_doc == INF_DOC:
            break
        # extend the prefix over every cursor already at pivot_doc: their
        # contributions are part of pivot_doc's score, so the block-max
        # bound below must cover them too
        while pivot + 1 < len(active) and active[pivot + 1].cur_doc == pivot_doc:
            pivot += 1

        # block-max refinement over the pivot prefix
        block_ub = 0.0
        for c in active[:pivot + 1]:
            block_ub += c.block_max_score(pivot_doc)
        if block_ub <= threshold:
            # shallow advance: jump past the nearest block boundary, but not
            # past the first non-prefix cursor's doc — docs beyond it can
            # draw score from lists the block-max bound didn't cover
            boundary = min(c.block_last_for(pivot_doc)
                           for c in active[:pivot + 1])
            target = boundary + 1
            if pivot + 1 < len(active):
                target = min(target, active[pivot + 1].cur_doc)
            if target <= pivot_doc:
                target = pivot_doc + 1
            for c in active[:pivot + 1]:
                if c.cur_doc < target:
                    c.next_geq(target)
            continue

        if active[0].cur_doc == pivot_doc:
            # fully aligned: evaluate pivot_doc exactly
            if filter_predicate is None or filter_predicate(pivot_doc):
                score = 0.0
                for c in term_order:  # sorted-term order — determinism
                    if c.cur_doc == pivot_doc:
                        score += c.score_current()
                if len(heap) < k:
                    heapq.heappush(heap, (score, -pivot_doc))
                    if len(heap) == k:
                        threshold = max(threshold, heap[0][0])
                elif score > heap[0][0]:
                    # equal-score later docs lose the doc_id-asc tie-break
                    # (docs are enumerated in increasing id order), so a
                    # strict > is rank-exact. (Compare against the heap
                    # floor, not the pruning threshold: with a seed the
                    # heap may briefly hold sub-seed entries to displace.)
                    heapq.heapreplace(heap, (score, -pivot_doc))
                    threshold = max(threshold, heap[0][0])
            for c in active:
                if c.cur_doc == pivot_doc:
                    c.next()
        else:
            # advance the laggards up to the pivot
            for c in active:
                if c.cur_doc >= pivot_doc:
                    break
                c.next_geq(pivot_doc)

    out = sorted(heap, key=lambda sd: (-sd[0], -sd[1]))
    return [(-d, s) for s, d in out]


def _merge_adjacent(lo: np.ndarray, hi: np.ndarray, gap: int = 1
                    ) -> tuple[np.ndarray, np.ndarray]:
    """Merge sorted, non-overlapping [lo, hi] intervals whose gap to the
    previous interval is <= ``gap`` (gap=1 merges touching intervals)."""
    if lo.size <= 1:
        return lo, hi
    run_hi = np.maximum.accumulate(hi)
    new_run = np.empty(lo.size, dtype=bool)
    new_run[0] = True
    new_run[1:] = lo[1:] > run_hi[:-1] + gap
    starts = np.flatnonzero(new_run)
    ends = np.append(starts[1:], lo.size) - 1
    return lo[starts], run_hi[ends]


# per-scoring-round dense scratch width: memory per query is bounded by
# this (x 8 bytes), INDEPENDENT of shard size — the no-N-sized-state
# contract holds because the scratch covers one id window at a time
_SPAN_CAP = 1 << 22


def _span_groups(lo: np.ndarray, hi: np.ndarray, cap: int):
    """Split sorted disjoint [lo, hi] ranges into groups whose total id
    span (last hi - first lo + 1) is <= cap; a single over-wide range is
    itself windowed. Yields (lo_arr, hi_arr) per group."""
    glo: list[int] = []
    ghi: list[int] = []
    base = None
    for s, e in zip(lo.tolist(), hi.tolist()):
        while True:
            if base is None:
                base = s
            if e - base + 1 <= cap:
                glo.append(s)
                ghi.append(e)
                break
            # close the current group at the cap boundary
            cut = base + cap - 1
            if s <= cut:
                glo.append(s)
                ghi.append(cut)
                s = cut + 1
            yield (np.asarray(glo, dtype=np.int64),
                   np.asarray(ghi, dtype=np.int64))
            glo, ghi, base = [], [], None
    if glo:
        yield (np.asarray(glo, dtype=np.int64),
               np.asarray(ghi, dtype=np.int64))


def block_max_wand_vec(cursors: list[PostingsCursor], k: int,
                       filter_ids: np.ndarray | None = None,
                       exclude_ids: np.ndarray | None = None,
                       seed_threshold: float | None = None,
                       first_batch_atoms: int = 64,
                       coalesce_blocks: int = 32,
                       decoded: list | None = None,
                       span_cap: int = _SPAN_CAP,
                       sparse_df_cap: int = 4096,
                       after: tuple[float, int] | None = None,
                       stats_out: dict | None = None,
                       ) -> list[tuple[int, float]]:
    """Vectorized block-max WAND — identical results to ``block_max_wand``
    (cross-tested), but block-at-a-time instead of doc-at-a-time, so the
    hot path is numpy kernels over decoded block runs rather than a
    Python loop over postings.

    Shape: (1) a sweep over every term's [block_first, block_last]
    intervals partitions doc-id space into "atoms" — maximal intervals
    with a constant set of covering blocks — each carrying the summed
    block-max upper bound of its covering blocks; (2) atoms are consumed
    in doc-id order in geometrically growing batches; an atom whose upper
    bound is <= the current threshold is skipped whole (rank-exact: the
    threshold only ever reflects docs with smaller ids, so a skipped doc
    loses the (score desc, doc_id asc) tie-break even on equality —
    the same argument as the scalar version); (3) surviving atoms are
    scored exactly, one <=``span_cap``-wide id window at a time, into a
    DENSE span scratch (``scratch[ids - lo] += contrib`` per cursor in
    sorted-term order — the same fancy-index addition, hence the same
    per-doc float order, as the TAAT accumulator and the oracle; no
    sort-based grouping on the hot path). Contributions come from
    ``decode_block_range`` runs with the same float64 expression tree as
    ``PostingsCursor.score_current`` — or, when ``decoded[i]`` supplies a
    cursor's pre-decoded ``(ids, contrib)`` arrays (the engine's shared
    posting cache), from zero-decode range slices of those.

    Upper-bound safety under vectorization: atom bounds come from a
    cumsum over +/- block-bound events, whose float rounding could
    otherwise dip BELOW the true sum; bounds are therefore inflated by a
    relative 1e-9 + absolute 1e-12 — orders of magnitude above cumsum
    error, orders of magnitude below any pruning-power impact — keeping
    the skip provably safe.

    ``filter_ids`` (sorted, unique) keeps only those docs; ``exclude_ids``
    (sorted tombstones) drops docs. Neither tightens the threshold via
    excluded docs (they are removed before the top-k merge), matching the
    scalar contract. ``seed_threshold`` must be strictly below the true
    k-th best score (see block_max_wand).

    ``after`` = (score, doc_id) is the ES search_after cursor: only docs
    ranked STRICTLY after it in (score desc, doc_id asc) order — i.e.
    score < cursor_score, or equal score with a larger doc_id — enter
    the top-k merge, so the kernel returns the next page and the pruning
    threshold adapts to the post-cursor k-th best. This is what makes
    deep pagination work on shards past the TAAT ceiling: the skip
    argument is unchanged (held docs are post-cursor with smaller ids,
    so an atom with ub <= threshold still cannot contain a page member).

    Sparse-list refinement (``sparse_df_cap``): a rare term's few
    postings land in few blocks whose [first, last] intervals can span
    nearly the whole doc-id space, so interval-based atoms would smear
    its (large) upper bound over every hot block inside them — the
    measured failure mode on mixed rare+hot queries, where the scalar
    WAND skips on the rare cursor's ACTUAL doc ids. Cursors with
    ``df <= sparse_df_cap`` therefore enter the sweep as per-posting
    runs of consecutive ids bounded by their EXACT contributions
    (decoded once — O(df), trivially small by the cap — and reused as
    the cursor's zero-decode scoring arrays): gaps between a rare
    term's postings carry no rare bound at all, so hot-only atoms
    there prune the moment the threshold clears the hot terms' own
    bounds. Exactness is unchanged — a run's bound is the max of the
    true contributions inside it, so the skip argument above holds
    verbatim.

    ``stats_out``: optional dict filled with deterministic pruning
    counters (n_atoms, atoms_considered, atoms_skipped, docs_scored) —
    the ES "profile": true analog for the scale path; counters are a
    pure function of index content + query (no timings).
    """
    if decoded is None:
        decoded = [None] * len(cursors)
    decoded = [d for c, d in zip(cursors, decoded) if c.tp.n_blocks]
    cs = [c for c in cursors if c.tp.n_blocks]
    if not cs or k <= 0:
        return []

    # ---- 1. atom sweep over block intervals ------------------------------
    pos_parts, delta_parts = [], []
    for ci, c in enumerate(cs):
        if c.tp.df <= sparse_df_cap:
            # sparse list: exact per-posting runs (see docstring)
            dec = decoded[ci]
            if dec is not None:
                ids_full, contrib_full = dec
            else:
                ids_full, tfs, dls = c.tp.decode_all()
                tf = tfs.astype(np.float64)
                dl = dls.astype(np.float64)
                # identical expression tree to the block-decode scoring
                # path below — these arrays ARE the scoring arrays
                contrib_full = c.idf * (tf * (c.k1 + 1.0)
                                        / (tf + c.k1 * (1.0 - c.b
                                                        + c.b * dl
                                                        / c.avgdl)))
                decoded[ci] = (ids_full, contrib_full)
            if not ids_full.size:
                continue
            new_run = np.empty(ids_full.size, dtype=bool)
            new_run[0] = True
            new_run[1:] = ids_full[1:] > ids_full[:-1] + 1
            starts = np.flatnonzero(new_run)
            lo = ids_full[starts]
            hi = ids_full[np.append(starts[1:], ids_full.size) - 1]
            ub = np.maximum.reduceat(contrib_full, starts)
            if c.score_scale != 1.0:
                ub = c.score_scale * ub
            pos_parts.append(lo.astype(np.int64, copy=False))
            delta_parts.append(ub)
            pos_parts.append(hi.astype(np.int64, copy=False) + 1)
            delta_parts.append(-ub)
            continue
        ub = (c.idf * c.bound_scale * c.score_scale) * c.tp.block_max
        pos_parts.append(c.tp.block_first)
        delta_parts.append(ub)
        pos_parts.append(c.tp.block_last + 1)
        delta_parts.append(-ub)
    pos = np.concatenate(pos_parts)
    delta = np.concatenate(delta_parts)
    order = np.argsort(pos, kind="stable")
    pos, delta = pos[order], delta[order]
    upos, first_idx = np.unique(pos, return_index=True)
    last_idx = np.append(first_idx[1:], pos.size) - 1
    atom_ub = np.cumsum(delta)[last_idx]
    atom_ub = atom_ub * (1.0 + 1e-9) + 1e-12  # see docstring: safe bound
    n_atoms = upos.size - 1  # last upos is max(block_last)+1, ub ~ 0 after
    atoms_considered = 0
    docs_scored = 0

    # ---- 2/3. batched consume + exact scoring ----------------------------
    top_ids = np.empty(0, dtype=np.int64)
    top_scores = np.empty(0, dtype=np.float64)
    seed = -np.inf if seed_threshold is None else float(seed_threshold)
    threshold = seed
    j = 0
    # a seed is already a provable lower bound on the k-th best score, so
    # threshold adaptation buys little — one pass over the atoms minimizes
    # fixed per-round decode dispatches (the measured cost driver); without
    # a seed, geometric batches let early docs establish a threshold first
    batch = n_atoms if seed_threshold is not None \
        else max(1, int(first_batch_atoms))
    while j < n_atoms:
        je = min(j + batch, n_atoms)
        batch = min(batch * 8, 1 << 18)
        alive = atom_ub[j:je] > threshold
        atoms_considered += int(alive.sum())
        if not alive.any():
            j = je
            continue
        blo = upos[j:je][alive]
        bhi = upos[j + 1:je + 1][alive] - 1
        j = je
        blo, bhi = _merge_adjacent(blo, bhi)

        for lo, hi in _span_groups(blo, bhi, span_cap):
            base = int(lo[0])
            span = int(hi[-1]) - base + 1
            scratch = np.zeros(span, dtype=np.float64)
            touched = False
            for c, dec_full in zip(cs, decoded):  # sorted-term order —
                # the scoring contract: per-doc float addition order is
                # term order via fancy-index += (same as TAAT/oracle)
                tp = c.tp
                if dec_full is not None:
                    # zero-decode path: range-slice the cached decoded
                    # (ids, contrib) arrays — slices are within ranges
                    # by construction, no mask needed
                    ids_full, contrib_full = dec_full
                    s = np.searchsorted(ids_full, lo, side="left")
                    e = np.searchsorted(ids_full, hi, side="right")
                    cnt = e - s
                    total = int(cnt.sum())
                    if total == 0:
                        continue
                    if lo.size == 1 or total == ids_full.size:
                        # one contiguous range (or everything survives —
                        # the unprunable all-hot case): a plain VIEW, no
                        # gather-index construction at all
                        ids = ids_full[s[0]:e[-1]] if lo.size == 1 \
                            else ids_full
                        contrib = contrib_full[s[0]:e[-1]] \
                            if lo.size == 1 else contrib_full
                    else:
                        starts = np.cumsum(cnt) - cnt
                        gather = (np.arange(total, dtype=np.int64)
                                  - np.repeat(starts, cnt)
                                  + np.repeat(s, cnt))
                        ids = ids_full[gather]
                        contrib = contrib_full[gather]
                    if c.score_scale != 1.0:
                        contrib = c.score_scale * contrib
                    scratch[ids - base] += contrib
                    touched = True
                    continue
                b0 = np.searchsorted(tp.block_last, lo, side="left")
                b1 = np.searchsorted(tp.block_first, hi, side="right") - 1
                ok = b0 <= b1
                if not ok.any():
                    continue
                # coalesce nearby runs: decoding a few skippable gap
                # blocks in ONE varint call is far cheaper than separate
                # decode calls (fixed numpy dispatch dominates small
                # decodes); the range mask below drops the gap postings
                r0, r1 = _merge_adjacent(b0[ok], b1[ok],
                                         gap=coalesce_blocks)
                dec = [tp.decode_block_range(int(a), int(b))
                       for a, b in zip(r0, r1)]
                ids = np.concatenate([d[0] for d in dec])
                tfs = np.concatenate([d[1] for d in dec])
                dls = np.concatenate([d[2] for d in dec])
                # keep only ids inside a surviving atom range
                ri = np.searchsorted(lo, ids, side="right") - 1
                keep = ri >= 0
                keep[keep] = ids[keep] <= hi[ri[keep]]
                if not keep.any():
                    continue
                ids = ids[keep]
                tf = tfs[keep].astype(np.float64)
                dl = dls[keep].astype(np.float64)
                # identical expression tree to score_current /
                # IndexShard.decode_term (elementwise IEEE ops ==
                # the scalar oracle)
                contrib = c.idf * (tf * (c.k1 + 1.0)
                                   / (tf + c.k1 * (1.0 - c.b
                                                   + c.b * dl / c.avgdl)))
                if c.score_scale != 1.0:
                    contrib = c.score_scale * contrib
                scratch[ids - base] += contrib
                touched = True
            if not touched:
                continue
            rel = np.flatnonzero(scratch)
            docs_scored += int(rel.size)
            if not rel.size:
                continue
            uids = rel + base
            acc = scratch[rel]
            if exclude_ids is not None and exclude_ids.size:
                p = np.searchsorted(exclude_ids, uids)
                p_ok = p < exclude_ids.size
                bad = np.zeros(uids.size, dtype=bool)
                bad[p_ok] = exclude_ids[p[p_ok]] == uids[p_ok]
                uids, acc = uids[~bad], acc[~bad]
            if filter_ids is not None and uids.size:
                p = np.searchsorted(filter_ids, uids)
                p_ok = p < filter_ids.size
                good = np.zeros(uids.size, dtype=bool)
                good[p_ok] = filter_ids[p[p_ok]] == uids[p_ok]
                uids, acc = uids[good], acc[good]
            if after is not None and uids.size:
                a_s, a_d = float(after[0]), int(after[1])
                post = (acc < a_s) | ((acc == a_s) & (uids > a_d))
                uids, acc = uids[post], acc[post]
            if not uids.size:
                continue
            merged_ids = np.concatenate((top_ids, uids))
            merged_scores = np.concatenate((top_scores, acc))
            sel = np.lexsort((merged_ids, -merged_scores))[:k]
            top_ids, top_scores = merged_ids[sel], merged_scores[sel]
            if top_ids.size == k:
                threshold = max(seed, float(top_scores[-1]))
    if stats_out is not None:
        stats_out.update(
            n_atoms=int(n_atoms), atoms_considered=atoms_considered,
            atoms_skipped=int(n_atoms) - atoms_considered,
            docs_scored=docs_scored)
    return [(int(d), float(s)) for d, s in zip(top_ids, top_scores)]
