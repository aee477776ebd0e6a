"""Driver-mimicking comparison harness (import-safe, no Ray session).

``compare(name, sf_dir)`` runs the Ray query and its DuckDB oracle on the
same parquet directory and compares row count, column names, and values the
way the driver does: columns sorted by name, rows sorted by all columns,
order-insensitive.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    # Heavy oracles (pagerank's chained iteration CTEs at sf0.1) can
    # spill temp. /dev/shm is RAM-backed and shared with Ray's plasma
    # object store, so only spill there when explicitly opted in
    # (GRAFT_ORACLE_SHM=1) AND it has generous headroom — and even
    # then under a hard size cap so a runaway oracle fails cleanly
    # instead of exhausting shared memory under concurrent actors.
    # Default: disk temp dir with a size cap.
    import os as _os

    tmp_dir = "/tmp/duckdb_oracle_tmp"
    cap_gib = 40
    if _os.environ.get("GRAFT_ORACLE_SHM") == "1" and _os.path.isdir("/dev/shm"):
        try:
            st = _os.statvfs("/dev/shm")
            free_gib = (st.f_bavail * st.f_frsize) >> 30
        except OSError:
            free_gib = 0
        if free_gib >= 16:
            tmp_dir = "/dev/shm/duckdb_oracle_tmp"
            cap_gib = max(4, free_gib // 4)
    con.execute(f"SET temp_directory='{tmp_dir}'")
    con.execute(f"SET max_temp_directory_size='{cap_gib}GiB'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    return con.sql(sql).df()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), na_position="last")
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is b:
        return True
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            return (a == b) or math.isclose(float(a), float(b),
                                            rel_tol=0, abs_tol=0)
        except (TypeError, ValueError):
            return False
    return a == b


def compare(name: str, sf_dir: str) -> tuple[bool, str]:
    from logsentinelai_ray.pipelines import ORACLE_SQL, QUERY_REGISTRY

    got = canon(to_pandas(QUERY_REGISTRY[name](sf_dir)))
    if name not in ORACLE_SQL:
        return True, f"rows-only: {len(got)} rows, cols={list(got.columns)}"
    exp = canon(run_oracle(ORACLE_SQL[name], sf_dir))
    if list(got.columns) != list(exp.columns):
        return False, f"columns differ: ray={list(got.columns)} " \
                      f"sql={list(exp.columns)}"
    # the driver's value-hash is dtype-sensitive: DuckDB sum(BIGINT) →
    # HUGEINT → float64 silently hash-mismatches an int64 engine column
    # even when every value is equal (round-1 lesson). Catch the
    # int-vs-float kind-skew here so it fails locally, not at the driver.
    for col in got.columns:
        gk = got[col].dtype.kind
        ek = exp[col].dtype.kind
        if {gk, ek} == {"i", "f"} or {gk, ek} == {"u", "f"}:
            return False, (f"dtype kind mismatch col={col}: "
                           f"ray={got[col].dtype} sql={exp[col].dtype} "
                           f"(driver value-hash would differ)")
    if len(got) != len(exp):
        return False, f"row count differs: ray={len(got)} sql={len(exp)}"
    for col in got.columns:
        ga, ea = got[col].tolist(), exp[col].tolist()
        for i, (x, y) in enumerate(zip(ga, ea)):
            if not values_equal(x, y):
                return False, (f"value mismatch col={col} row={i}: "
                               f"ray={x!r} sql={y!r}")
    return True, f"MATCH ({len(got)} rows)"
