"""Partition-based TAAT top-k selection vs full lexsort — exact under
heavy score ties (the path only engages above 4k candidates, so the small
engine fixtures never reach it; this drives it directly)."""

import numpy as np

from logsentinelai_ray.query.shards import SearchEngine


def _select(cand: np.ndarray, scores_all: np.ndarray, k: int):
    """Mirror of the production selection in SearchEngine._search_taat."""
    acc = dict(zip(cand.tolist(), scores_all.tolist()))
    c, s = cand, scores_all
    if c.size > 4 * k:
        kth_val = np.partition(s, c.size - k)[c.size - k]
        above = s > kth_val
        n_above = int(above.sum())
        tie_ids = np.sort(c[s == kth_val])[:k - n_above]
        keep = np.concatenate((c[above], tie_ids))
        c = keep
        s = np.array([acc[x] for x in keep])
    order = np.lexsort((c, -s))[:k]
    return [(int(c[i]), float(s[i])) for i in order]


def test_partition_topk_equals_lexsort_under_ties():
    rng = np.random.RandomState(7)
    for trial in range(300):
        n = rng.randint(50, 3000)
        k = rng.randint(1, 40)
        scores = rng.choice(rng.random_sample(rng.randint(1, 8)), size=n)
        cand = np.sort(rng.choice(10 ** 6, size=n, replace=False))
        ref_order = np.lexsort((cand, -scores))[:k]
        ref = [(int(cand[i]), float(scores[i])) for i in ref_order]
        assert _select(cand, scores, k) == ref, (trial, n, k)


def test_engine_taat_partition_path(ray_session, small_index):
    """Force the partition path on a real engine by shrinking the engage
    threshold via a large candidate set: k=1 with >4 candidates engages
    it on the session fixture; compare against k-large full ordering."""
    idx_dir, _ = small_index
    eng = SearchEngine(idx_dir, num_shards=2)
    try:
        full = eng.search("error", k=10_000, with_meta=False)
        top1 = eng.search("error", k=1, with_meta=False)
        assert top1["doc_id"].to_pylist() == full["doc_id"].to_pylist()[:1]
        assert top1["score"].to_pylist() == full["score"].to_pylist()[:1]
    finally:
        eng.shutdown()
