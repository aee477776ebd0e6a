"""Apache httpd error-log parser + event classifier — the reference's
``httpd_server`` analyzer input (reference analyzers/httpd_server.py:
17-59: ``AttackType`` enum :24-32 with DIRECTORY_TRAVERSAL /
INVALID_HTTP_METHOD / UNAUTHORIZED_ACCESS / CONFIGURATION_ERROR /
MODULE_ERROR families, ``Statistics{total_event, event_by_level,
event_by_type}`` :46-49; sample corpus sample-logs/apache-100.log is
exactly this ``[Thu Jun 09 06:07:04 2005] [notice] msg`` shape).

Deterministic analog of the LLM extraction: ONE vectorized
``pc.extract_regex`` with named groups parses the error-log envelope
(bracketed httpd timestamp, level, optional ``[client IP]``), a second
vectorized pass classifies the message into the reference's
attack/event types. Unparseable lines keep their row with
``parsed = false`` (the M9 dead-letter contract — nothing is silently
dropped).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# "[Thu Jun 09 06:07:04 2005] [level] [client 1.2.3.4] msg" — the
# client clause only appears on request-scoped errors
ERRORLOG_REGEX = (
    r"^\[(?P<dow>[A-Z][a-z]{2}) (?P<mon>[A-Z][a-z]{2}) "
    r"+(?P<day>\d{1,2}) (?P<time>\d{2}:\d{2}:\d{2}) (?P<year>\d{4})\] "
    r"\[(?P<level>[a-z]+)\]"
    r"(?: \[client (?P<client>[0-9.]+)\])? (?P<msg>.*)$"
)

_ENVELOPE = ("dow", "mon", "day", "time", "year", "level", "client",
             "msg")

# message classification — the reference's AttackType families
# (analyzers/httpd_server.py:24-32), first match wins; traversal
# outranks invalid-method because the corpus's "Invalid method in
# request get /scripts/.%252e/..." lines are traversal payloads
_CLASSES = (
    ("directory_traversal", r"%252e|%2e%2e|\.\./"),
    ("invalid_http_method", r"^Invalid method in request"),
    ("unauthorized_access", r"^Directory index forbidden"),
    ("missing_file", r"^File does not exist"),
    ("config_error", r"Can't create|Factory error"),
    ("module_error", r"^mod_jk|^workerEnv"),
)


def parse_error_log(batch: pa.Table, line_col: str = "line") -> pa.Table:
    """Parse Apache error-log lines into typed envelope columns plus
    the classified ``etype``. One extract_regex for the envelope, one
    match_substring_regex per class — all vectorized, no Python per
    row."""
    ext = pc.extract_regex(batch[line_col], ERRORLOG_REGEX)
    parsed = pc.is_valid(ext)
    cols: dict = {c: batch[c] for c in batch.column_names}
    for f in _ENVELOPE:
        v = pc.struct_field(ext, f)
        if f == "client":
            # an unmatched optional group inside a matched line
            # extracts as "" (not null)
            v = pc.if_else(pc.equal(v, ""),
                           pa.scalar(None, pa.string()), v)
        elif f in ("day", "year"):
            v = pc.cast(v, pa.int64())
        cols[f] = v
    msg = pc.fill_null(cols["msg"], "")
    etype = pa.nulls(len(batch), pa.string())
    # build etype back-to-front so FIRST match wins via if_else nesting
    for name, rx in reversed(_CLASSES):
        etype = pc.if_else(pc.match_substring_regex(msg, rx),
                           pa.scalar(name, pa.string()), etype)
    etype = pc.fill_null(etype, "other")  # parsed but unclassified
    cols["etype"] = pc.if_else(parsed, etype,
                               pa.scalar(None, pa.string()))
    cols["parsed"] = parsed
    return pa.table(cols)
