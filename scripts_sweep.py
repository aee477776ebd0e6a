"""Full queries()-registry sweep vs the DuckDB oracles at a given sf dir.

Writes SWEEP_r{N}_{sf}.json: per-entry status (MATCH / rows-only / FAIL),
row counts and wall time — the externally-diffable record of every
registry entry's verification (VERDICT r2 'Next round' #7: the driver
samples 50 of 104; this log covers the rest).

Usage: python scripts_sweep.py [sf_dir] [out.json]
"""
import json
import os
import sys
import time


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "SWEEP_sf001.json"
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from logsentinelai_ray.pipelines import QUERY_REGISTRY
    from tests.harness import compare

    results = {}
    n_fail = 0
    for name in sorted(QUERY_REGISTRY):
        t0 = time.monotonic()
        try:
            ok, msg = compare(name, sf_dir)
        except Exception as e:  # noqa: BLE001 - record, keep sweeping
            ok, msg = False, f"EXCEPTION: {type(e).__name__}: {e}"
        dt = round(time.monotonic() - t0, 2)
        results[name] = {"ok": bool(ok), "detail": msg, "seconds": dt}
        n_fail += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'} {name:36s} {dt:7.2f}s  {msg}",
              flush=True)
    summary = {"sf_dir": sf_dir, "total": len(results),
               "failed": n_fail,
               "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
               "entries": results}
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\n{len(results) - n_fail}/{len(results)} green -> {out_path}")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
