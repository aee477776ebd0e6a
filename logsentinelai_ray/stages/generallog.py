"""Mixed-format log profiler — the reference's ``general_log``
analyzer analog (reference analyzers/general_log.py:17-90: 14-value
``EventCategory`` enum :24-38, flat pattern-detection fields
``detected_formats / timestamp_patterns / common_fields /
log_sources`` :78-81, nested ``EventStatistics`` 15-counter rollup
:51-66 and ``SeverityBreakdown`` :68-73, ``unique_sources`` :86).

Deterministic analog of the LLM pattern detection: per line, a
vectorized first-match cascade detects the log FORMAT (Apache
combined / Apache error / RFC3164 syslog / JSON / ISO-timestamp app
log), maps it to its TIMESTAMP pattern, classifies the line into an
``EventCategory``, and extracts the log SOURCE (syslog proc, JSON
"app" field, httpd for Apache shapes). Everything is
``pc.match_substring_regex`` / ``pc.extract_regex`` kernels — no
Python per row; unmatched lines profile as format="unknown",
category="UNKNOWN" (nothing dropped).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# format detection — first match wins (ordered most-specific first)
_FORMATS = (
    ("apache_error",
     r"^\[[A-Z][a-z]{2} [A-Z][a-z]{2} +\d{1,2} "
     r"\d{2}:\d{2}:\d{2} \d{4}\] \["),
    ("apache_combined",
     r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3} \S+ \S+ \["),
    ("syslog", r"^[A-Z][a-z]{2} +\d{1,2} \d{2}:\d{2}:\d{2} \S+ "),
    ("json", r"^\{.*\}\s*$"),
    ("iso_app", r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}"),
)

# each format implies a timestamp pattern (the reference's
# timestamp_patterns output names shapes, not values)
_TS_PATTERN = {
    "apache_error": "Day Mon dd HH:MM:SS yyyy",
    "apache_combined": "dd/Mon/yyyy:HH:MM:SS",
    "syslog": "Mon dd HH:MM:SS",
    "json": "ISO8601",
    "iso_app": "ISO8601",
    "unknown": "none",
}

# EventCategory classification (analyzers/general_log.py:24-38),
# first match wins — auth outranks the generic error/access families
_CATEGORIES = (
    ("AUTHENTICATION",
     r"Failed password|Accepted password|authentication|login"),
    ("AUTHORIZATION", r"forbidden|denied|unauthorized"),
    ("SECURITY", r"attack|injection|%252e|\.\./"),
    ("DATABASE", r"\bSELECT\b|database|\bsql\b"),
    ("NETWORK", r"connection|socket|unreachable"),
    ("PERFORMANCE", r"timeout|too slow|latency"),
    ("ERROR", r"\berror\b|exception|\bfailed\b|\[error\]"),
    ("WARNING", r"\bwarn(?:ing)?\b|\[warn\]"),
    ("ACCESS", r'"(?:GET|POST|PUT|DELETE|HEAD) |HTTP/1'),
    ("SYSTEM", r"kernel|systemd|cron"),
)


def profile_general_log(batch: pa.Table,
                        line_col: str = "line") -> pa.Table:
    """Per-line profile columns: ``format``, ``ts_pattern``,
    ``category``, ``source``. Unrecognized lines keep their row with
    format="unknown" / category="UNKNOWN" / source null."""
    lines = batch[line_col]
    n = len(batch)
    fmt = pa.nulls(n, pa.string())
    for name, rx in reversed(_FORMATS):
        fmt = pc.if_else(pc.match_substring_regex(lines, rx),
                         pa.scalar(name, pa.string()), fmt)
    fmt = pc.fill_null(fmt, "unknown")
    # format -> timestamp pattern via a dictionary-style cascade
    # (6 literals; if_else chain is vectorized and branch-free)
    ts = pa.nulls(n, pa.string())
    for k, v in _TS_PATTERN.items():
        ts = pc.if_else(pc.equal(fmt, k),
                        pa.scalar(v, pa.string()), ts)
    cat = pa.nulls(n, pa.string())
    for name, rx in reversed(_CATEGORIES):
        cat = pc.if_else(pc.match_substring_regex(lines, rx),
                         pa.scalar(name, pa.string()), cat)
    cat = pc.fill_null(cat, "UNKNOWN")
    # source extraction per format family: syslog proc, JSON "app"
    # field; Apache shapes are by definition httpd
    sys_ext = pc.extract_regex(
        lines, r"^[A-Z][a-z]{2} +\d{1,2} \d{2}:\d{2}:\d{2} \S+ "
               r"(?P<proc>[A-Za-z0-9_.-]+(?:\([A-Za-z0-9_.-]+\))?)")
    json_ext = pc.extract_regex(lines, r'"app": ?"(?P<app>[^"]+)"')
    src = pa.nulls(n, pa.string())
    src = pc.if_else(pc.equal(fmt, "syslog"),
                     pc.struct_field(sys_ext, "proc"), src)
    src = pc.if_else(pc.equal(fmt, "json"),
                     pc.struct_field(json_ext, "app"), src)
    is_httpd = pc.is_in(fmt, value_set=pa.array(
        ["apache_error", "apache_combined"]))
    src = pc.if_else(is_httpd, pa.scalar("httpd", pa.string()), src)
    cols: dict = {c: batch[c] for c in batch.column_names}
    cols["format"] = fmt
    cols["ts_pattern"] = ts
    cols["category"] = cat
    cols["source"] = src
    return pa.table(cols)
