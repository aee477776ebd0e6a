"""Apache combined-log-format parser — the reference's actual input.

The reference's primary analyzer ingests httpd access logs in combined
format (reference analyzers/httpd_access.py; sample corpora
sample-logs/access-10k.log are combined-format lines) and hands raw
chunks to an LLM. The deterministic analog is a real CLF parser: ONE
vectorized ``pc.extract_regex`` with named groups per batch — no
per-row Python — emitting typed columns (ip, ts text, method, path,
protocol, status, bytes, referer, agent) plus a dead-letter mask for
unparseable lines (the M9 error-document path).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# combined log format: ip ident user [ts] "METHOD path PROTO" status
# bytes "referer" "agent"; bytes may be '-'
CLF_REGEX = (
    r'^(?P<ip>\S+) (?P<ident>\S+) (?P<user>\S+) '
    r'\[(?P<ts>[^\]]+)\] '
    r'"(?P<method>[A-Z]+) (?P<path>\S+) (?P<proto>[^"]+)" '
    r'(?P<status>\d{3}) (?P<bytes>\d+|-)'
    r'(?: "(?P<referer>[^"]*)" "(?P<agent>[^"]*)")?'
)

_FIELDS = ("ip", "ts", "method", "path", "proto", "status", "bytes")


def parse_access_log(batch: pa.Table,
                     line_col: str = "line") -> pa.Table:
    """Parse combined-format lines into typed columns. Unparseable
    lines keep their row with ``parsed = false`` and null fields (the
    dead-letter contract: nothing is silently dropped)."""
    ext = pc.extract_regex(batch[line_col], CLF_REGEX)
    parsed = pc.is_valid(ext)
    cols: dict = {c: batch[c] for c in batch.column_names}
    for f in _FIELDS:
        v = pc.struct_field(ext, f)
        if f == "status":
            v = pc.cast(v, pa.int32())
        elif f == "bytes":
            # '-' means no body; normalize to 0 like most log pipelines
            v = pc.cast(pc.replace_substring_regex(v, r"^-$", "0"),
                        pa.int64())
        cols[f] = v
    cols["parsed"] = parsed
    return pa.table(cols)
