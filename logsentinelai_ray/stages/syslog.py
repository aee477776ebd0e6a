"""RFC3164-style syslog parser + event classifier — the reference's
``linux_system`` analyzer input (reference analyzers/linux_system.py:
22-69: ``EventType`` enum :29-39, optional ``username/process/service``
fields :41-52, ``Statistics{total_events, auth_failures, unique_ips,
unique_users, event_by_type}`` :54-59; sample corpus
sample-logs/linux-2k.log is exactly this line shape).

Deterministic analog of the LLM extraction: ONE vectorized
``pc.extract_regex`` with named groups parses the syslog envelope
(month day time host proc[pid]: msg), a second vectorized pass
classifies the message into the reference's event types and pulls the
optional username / source-ip fields. Unparseable lines keep their row
with ``parsed = false`` (the M9 dead-letter contract — nothing is
silently dropped).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RFC3164 envelope: "Mon DD HH:MM:SS host proc[pid]: msg" (pid optional,
# e.g. "kernel:" lines carry none). proc allows one parenthesized PAM
# module suffix — the reference corpus's dominant shape is
# "sshd(pam_unix)[19939]:" (43% of sample-logs/linux-2k.log).
SYSLOG_REGEX = (
    r"^(?P<mon>[A-Z][a-z]{2}) +(?P<day>\d{1,2}) "
    r"(?P<time>\d{2}:\d{2}:\d{2}) (?P<host>\S+) "
    r"(?P<proc>[A-Za-z0-9_.-]+(?:\([A-Za-z0-9_.-]+\))?)"
    r"(?:\[(?P<pid>\d+)\])?: (?P<msg>.*)$"
)

_ENVELOPE = ("mon", "day", "time", "host", "proc", "pid", "msg")

# message classification — the reference's EventType enum families
# (auth success/failure, session, service, kernel), first match wins
_CLASSES = (
    ("auth_failure", r"^Failed password|authentication failure"),
    ("auth_success", r"^Accepted password"),
    ("session", r"^pam_unix|session (?:opened|closed)"),
)


def parse_syslog(batch: pa.Table, line_col: str = "line") -> pa.Table:
    """Parse syslog lines into typed envelope columns plus the
    classified ``etype`` and optional ``username`` / ``ip`` fields.
    One extract_regex for the envelope, one per class/field regex —
    all vectorized, no Python per row."""
    ext = pc.extract_regex(batch[line_col], SYSLOG_REGEX)
    parsed = pc.is_valid(ext)
    cols: dict = {c: batch[c] for c in batch.column_names}
    for f in _ENVELOPE:
        v = pc.struct_field(ext, f)
        if f == "pid":
            # an unmatched optional group inside a matched line
            # extracts as "" (not null) — e.g. pid-less "kernel:"
            v = pc.cast(pc.if_else(pc.equal(v, ""),
                                   pa.scalar(None, pa.string()), v),
                        pa.int64())
        cols[f] = v
    msg = pc.fill_null(cols["msg"], "")
    proc = pc.fill_null(cols["proc"], "")
    etype = pa.nulls(len(batch), pa.string())
    # build etype back-to-front so FIRST match wins via if_else nesting
    etype = pc.if_else(pc.equal(proc, "kernel"),
                       pa.scalar("kernel", pa.string()), etype)
    etype = pc.if_else(pc.equal(proc, "systemd"),
                       pa.scalar("service", pa.string()), etype)
    for name, rx in reversed(_CLASSES):
        etype = pc.if_else(pc.match_substring_regex(msg, rx),
                           pa.scalar(name, pa.string()), etype)
    etype = pc.fill_null(etype, "other")  # parsed but unclassified
    etype = pc.if_else(parsed, etype, pa.scalar(None, pa.string()))
    cols["etype"] = etype
    # optional structured fields (null when the message has none);
    # "for user X" before "for X" — alternation is ordered in RE2;
    # an optional "invalid user " between them covers sshd's very
    # common "Failed password for invalid user admin from ..." form,
    # and the PAM "... user=root" key-value form is the fallback
    user_ext = pc.extract_regex(
        msg, r"(?:for user |for )(?:invalid user )?"
             r"(?P<username>\S+?)(?: from| port| by|$)")
    username = pc.struct_field(user_ext, "username")
    user_kv = pc.extract_regex(msg, r"\buser=(?P<username>\S+)")
    cols["username"] = pc.if_else(
        pc.is_valid(username), username,
        pc.struct_field(user_kv, "username"))
    ip_ext = pc.extract_regex(msg, r"from (?P<ip>[0-9.]+) port")
    ip = pc.struct_field(ip_ext, "ip")
    # PAM auth-failure lines carry the peer as "rhost=" (no "from")
    ip_kv = pc.extract_regex(msg, r"\brhost=(?P<ip>[0-9.]+)(?:\s|$)")
    cols["ip"] = pc.if_else(pc.is_valid(ip), ip,
                            pc.struct_field(ip_kv, "ip"))
    cols["parsed"] = parsed
    return pa.table(cols)
