"""The reference's four console-script analyzers over RAW log files —
`logsentinelai-httpd-access / httpd-server / linux-system /
general-log` (reference pyproject.toml [project.scripts]; each wraps
``run_generic_batch_analysis`` over one log type). Here each log type
maps to its deterministic vectorized parser stage and a distributed
Statistics rollup matching the reference's per-type Pydantic
``Statistics`` shape:

- ``httpd_access``  → stages/accesslog.py; Statistics{total_requests,
  unique_ips, error_rate, response_code_dist} —
  analyzers/httpd_access.py:47-51.
- ``httpd_server``  → stages/errorlog.py; Statistics{total_event,
  event_by_level, event_by_type} — analyzers/httpd_server.py:46-49.
- ``linux_system``  → stages/syslog.py; Statistics{total_events,
  auth_failures, unique_ips, unique_users, event_by_type} —
  analyzers/linux_system.py:54-59.
- ``general_log``   → stages/generallog.py; detected_formats /
  timestamp_patterns / log_sources + per-category EventStatistics +
  unique_sources — analyzers/general_log.py:51-90.

Execution is Ray-Data-native: ``read_text`` streams the files, the
parser runs per batch, and ONLY per-batch partial count rows cross the
exchange (distinct counts via a two-level groupby) — the same shape as
the registry's *_parse entries, pointed at arbitrary real files."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

LOG_TYPES = ("httpd_access", "httpd_server", "linux_system",
             "general_log")


def _counts(parsed, cols: list[str]):
    """(col, value) -> n for several columns in ONE pass of per-batch
    partials + one small groupby-sum exchange."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        dims, buckets, ns = [], [], []
        for c in cols:
            v = pc.fill_null(pc.cast(t[c], pa.string()), "_null")
            g = (pa.table({"b": v}).group_by("b")
                 .aggregate([([], "count_all")]))
            dims += [c] * g.num_rows
            buckets.append(g["b"].combine_chunks())
            ns.append(g["count_all"].combine_chunks())
        return pa.table({
            "dim": pa.array(dims, pa.string()),
            "bucket": pa.concat_arrays(buckets) if buckets
            else pa.array([], pa.string()),
            "pn": pc.cast(pa.concat_arrays(ns), pa.int64()) if ns
            else pa.array([], pa.int64())})

    agg = (parsed.map_batches(partial, batch_format="pyarrow")
           .groupby(["dim", "bucket"])
           .aggregate(Sum("pn", alias_name="n")).to_pandas())
    out: dict[str, dict[str, int]] = {c: {} for c in cols}
    for _, r in agg.iterrows():
        out[r["dim"]][r["bucket"]] = int(r["n"])
    return out


def _distinct(parsed, col: str) -> int:
    """Exact distinct non-null count via groupby (each distinct value
    crosses the exchange once)."""
    d = (parsed.map_batches(
            lambda t, _c=col: pa.table(
                {"v": pc.drop_null(t[_c].combine_chunks()
                                   if isinstance(t[_c], pa.ChunkedArray)
                                   else t[_c])}),
            batch_format="pyarrow")
         .groupby("v").count())
    return d.count()


def _kv_list(d: dict[str, int]) -> list[str]:
    """The reference's '"KEY:COUNT"' list convention
    (e.g. Statistics.response_code_dist), count-desc then key."""
    return [f"{k}:{v}" for k, v in
            sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))]


def analyze_files(log_type: str, paths: list[str]) -> dict:
    """Run one reference analyzer type over raw log files; returns the
    Statistics-shaped dict (JSON-ready)."""
    import ray.data as rd

    if log_type not in LOG_TYPES:
        raise ValueError(f"unknown log type {log_type!r}; "
                         f"one of {LOG_TYPES}")
    ds = rd.read_text(paths)

    if log_type == "httpd_access":
        from .stages.accesslog import parse_access_log

        parsed = ds.map_batches(
            lambda t: parse_access_log(t, line_col="text"),
            batch_format="pyarrow").materialize()
        c = _counts(parsed, ["status", "parsed"])
        total = sum(c["parsed"].values())
        ok = c["parsed"].get("true", 0)
        codes = {k: v for k, v in c["status"].items() if k != "_null"}
        errors = sum(v for k, v in codes.items() if k >= "400")
        return {
            "log_type": log_type,
            "total_requests": ok,
            "unparsed_lines": total - ok,
            "unique_ips": _distinct(parsed, "ip"),
            "error_rate": round(errors / ok, 4) if ok else 0.0,
            "response_code_dist": _kv_list(codes),
        }
    if log_type == "httpd_server":
        from .stages.errorlog import parse_error_log

        parsed = ds.map_batches(
            lambda t: parse_error_log(t, line_col="text"),
            batch_format="pyarrow").materialize()
        c = _counts(parsed, ["level", "etype"])
        levels = {k: v for k, v in c["level"].items() if k != "_null"}
        return {
            "log_type": log_type,
            "total_event": sum(levels.values()),
            "unparsed_lines": c["level"].get("_null", 0),
            "event_by_level": _kv_list(levels),
            "event_by_type": _kv_list(
                {k: v for k, v in c["etype"].items() if k != "_null"}),
        }
    if log_type == "linux_system":
        from .stages.syslog import parse_syslog

        parsed = ds.map_batches(
            lambda t: parse_syslog(t, line_col="text"),
            batch_format="pyarrow").materialize()
        c = _counts(parsed, ["etype", "parsed"])
        et = {k: v for k, v in c["etype"].items() if k != "_null"}
        return {
            "log_type": log_type,
            "total_events": sum(et.values()),
            "unparsed_lines": c["parsed"].get("false", 0),
            "auth_failures": et.get("auth_failure", 0),
            "unique_ips": _distinct(parsed, "ip"),
            "unique_users": _distinct(parsed, "username"),
            "event_by_type": _kv_list(et),
        }
    # general_log
    from .stages.generallog import profile_general_log

    parsed = ds.map_batches(
        lambda t: profile_general_log(t, line_col="text"),
        batch_format="pyarrow").materialize()
    c = _counts(parsed, ["format", "ts_pattern", "category", "source"])
    cats = c["category"]
    return {
        "log_type": log_type,
        "total_events": sum(cats.values()),
        "detected_formats": _kv_list(c["format"]),
        "timestamp_patterns": _kv_list(c["ts_pattern"]),
        "log_sources": _kv_list(
            {k: v for k, v in c["source"].items() if k != "_null"}),
        "statistics_event": {f"{k.lower()}_events": v
                             for k, v in sorted(cats.items())},
        "unique_sources": len(
            [k for k in c["source"] if k != "_null"]),
    }


def categorize_files(paths: list[str], top: int = 20) -> dict:
    """ES|QL 9.x CATEGORIZE over raw log files — log-template mining:
    every line collapses to its constant-token skeleton (digit-bearing
    tokens -> "*", runs collapsed; the deterministic spec shared with
    the esql_categorize registry entry), then a distributed count per
    template returns the ``top`` biggest categories. The read streams;
    only per-batch (template, partial-count) rows cross the exchange.
    The Kibana "Log Pattern Analysis" panel analog, pointed at real
    files."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_text(paths)

    def templ(t: pa.Table) -> pa.Table:
        v = t["text"]
        v = pc.replace_substring_regex(v, pattern=r"\S*\d\S*",
                                       replacement="*")
        v = pc.replace_substring_regex(v, pattern=r"\*(?:\s+\*)+",
                                       replacement="*")
        v = pc.replace_substring_regex(v, pattern=r"\s+",
                                       replacement=" ")
        v = pc.utf8_trim_whitespace(v)
        g = (pa.table({"category": v}).group_by("category")
             .aggregate([([], "count_all")]))
        return pa.table({
            "category": g["category"],
            "pn": pc.cast(g["count_all"], pa.int64())})

    full = (ds.map_batches(templ, batch_format="pyarrow")
            .groupby("category")
            .aggregate(Sum("pn", alias_name="n"))
            .to_pandas())
    agg = full.sort_values(["n", "category"],
                           ascending=[False, True]).head(top)
    return {
        "log_type": "categorize",
        "total_categories": int(len(full)),
        "total_lines": int(full["n"].sum()) if len(full) else 0,
        "top_categories": [
            {"category": r["category"], "n": int(r["n"])}
            for _, r in agg.iterrows()],
    }
