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
