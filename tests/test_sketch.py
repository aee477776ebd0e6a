"""HyperLogLog cardinality sketch: merge exactness, accuracy, determinism,
Dataset path, and the registry entry vs an exact DuckDB distinct count."""

import numpy as np
import pyarrow as pa

from logsentinelai_ray.functions.sketch import (
    hll_cardinality,
    hll_estimate,
    hll_merge,
    hll_sketch,
)


def test_sketch_merge_is_exact_union():
    a = pa.array([f"k{i}" for i in range(5000)])
    b = pa.array([f"k{i}" for i in range(2500, 9000)])
    both = pa.array([f"k{i}" for i in range(9000)])
    merged = hll_merge(hll_sketch(a), hll_sketch(b))
    assert np.array_equal(merged, hll_sketch(both))


def test_estimate_accuracy_and_determinism():
    for n in (300, 5_000, 100_000):
        vals = pa.array(np.arange(n, dtype=np.int64))
        est1 = hll_estimate(hll_sketch(vals, p=12))
        est2 = hll_estimate(hll_sketch(vals, p=12))
        assert est1 == est2
        # p=12 → stderr ~1.6 %; 5 % is > 3 sigma for these fixed inputs
        assert abs(est1 - n) / n < 0.05, (n, est1)


def test_small_range_linear_counting():
    vals = pa.array([f"u{i}" for i in range(40)] * 3 + [None, None])
    est = hll_estimate(hll_sketch(vals, p=12))
    assert abs(est - 40) < 2


def test_dataset_cardinality_matches_local_sketch(ray_session):
    import ray.data as rd

    n = 20_000
    tbl = pa.table({"k": pa.array(np.arange(n, dtype=np.int64) % 7777)})
    ds = rd.from_arrow(tbl).repartition(8)
    est = hll_cardinality(ds, "k", p=12)
    # batch boundaries must not change the estimate: union is exact
    assert est == hll_estimate(hll_sketch(tbl.column("k"), p=12))
    assert abs(est - 7777) / 7777 < 0.05


def test_cardinality_sketch_entry_vs_exact(ray_session):
    import duckdb

    from logsentinelai_ray.pipelines.queries import q_cardinality_sketch

    sf_dir = "/root/testdata/sf0.001"
    out = q_cardinality_sketch(sf_dir)
    got = dict(zip(out["field"], out["estimate"]))
    con = duckdb.connect()
    for table, col in (("events", "user_id"), ("events", "event_type"),
                       ("documents", "lang")):
        exact = con.execute(
            f"SELECT count(DISTINCT {col}) FROM "
            f"read_parquet('{sf_dir}/{table}.parquet')").fetchone()[0]
        est = got[f"{table}.{col}"]
        assert abs(est - exact) <= max(1, 0.06 * exact), (table, col, est, exact)

def test_percentile_sketch_within_one_bin_of_exact(ray_session):
    import duckdb

    from logsentinelai_ray.pipelines.queries import (
        _SKETCH_BIN_MICRO,
        q_value_percentile_sketch,
    )

    sf_dir = "/root/testdata/sf0.001"
    out = q_value_percentile_sketch(sf_dir).iloc[0]
    con = duckdb.connect()
    exact = con.execute(
        "SELECT quantile_disc(CAST(round(value*1e6,0) AS BIGINT), "
        "[0.5, 0.9, 0.99]) FROM "
        f"read_parquet('{sf_dir}/events.parquet')").fetchone()[0]
    for name, ex in zip(("p50_micro", "p90_micro", "p99_micro"), exact):
        # the estimate is the bin lower bound: exact value lies in
        # [estimate, estimate + bin width)
        assert out[name] <= ex < out[name] + _SKETCH_BIN_MICRO, (name, out[name], ex)


def test_percentile_sketch_batch_boundary_invariance(ray_session):
    """Count-vector merge is addition — repartitioning must not change
    any estimate (unlike an order-sensitive t-digest merge)."""
    import ray.data as rd

    from logsentinelai_ray.pipelines import queries as q

    sf_dir = "/root/testdata/sf0.001"
    base = q.q_value_percentile_sketch(sf_dir)

    orig = q._read

    def read_repart(sf, table, columns=None):
        return orig(sf, table, columns=columns).repartition(13)

    q._read, saved = read_repart, q._read
    try:
        repart = q.q_value_percentile_sketch(sf_dir)
    finally:
        q._read = saved
    assert base.equals(repart)


def test_bloom_no_false_negatives_and_fpr(ray_session):
    import numpy as np
    import pyarrow as pa

    from logsentinelai_ray.functions.sketch import (bloom_contains,
                                                    bloom_merge,
                                                    bloom_sketch)

    members = pa.array([f"tok{i}" for i in range(5000)])
    others = pa.array([f"zzz{i}" for i in range(20000)])
    bits = bloom_sketch(members, m_bits=1 << 20, k=7)
    # one-sided: EVERY member reports maybe-present
    assert bloom_contains(bits, members).all()
    # FPR near theory: (1 - e^{-kn/m})^k ~= 0.0006 at n=5k, m=1M, k=7
    fpr = float(bloom_contains(bits, others).mean())
    assert fpr < 0.01
    # OR-merge == single-pass build
    half1 = bloom_sketch(members.slice(0, 2500), m_bits=1 << 20, k=7)
    half2 = bloom_sketch(members.slice(2500), m_bits=1 << 20, k=7)
    assert (bloom_merge(half1, half2) == bits).all()


def test_bloom_distributed_equals_local(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from logsentinelai_ray.functions.sketch import (bloom_build,
                                                    bloom_sketch)

    vals = pa.array([f"u{i % 700}" for i in range(9000)])
    tbl = pa.table({"v": vals})
    dist = bloom_build(rd.from_arrow(tbl).repartition(7), "v")
    local = bloom_sketch(vals)
    assert (dist == local).all()


def test_count_min_one_sided_with_bound(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from logsentinelai_ray.functions.sketch import (cm_build,
                                                    cm_estimate,
                                                    cm_merge, cm_sketch)

    rng = np.random.default_rng(3)
    vals = rng.zipf(1.5, 50_000) % 3000
    arr = pa.array(vals.astype(np.int64), pa.int64())
    cm = cm_sketch(arr, width=1 << 14, depth=4)
    uniq, exact = np.unique(vals, return_counts=True)
    est = cm_estimate(cm, pa.array(uniq.astype(np.int64), pa.int64()))
    # never underestimates
    assert (est >= exact).all()
    # CM bound: err <= 2n/width with prob 1 - 2^-depth; assert the 99.9%
    # empirical quantile stays inside it
    err = est - exact
    assert np.quantile(err, 0.999) <= 2 * len(vals) / (1 << 14)
    # ADD-merge == single build; distributed == local
    a = cm_sketch(arr.slice(0, 25_000), width=1 << 14, depth=4)
    b = cm_sketch(arr.slice(25_000), width=1 << 14, depth=4)
    assert (cm_merge(a, b) == cm).all()
    dist = cm_build(rd.from_arrow(pa.table({"v": arr})).repartition(5),
                    "v")
    assert (dist == cm).all()
