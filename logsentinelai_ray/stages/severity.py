"""Severity mapping + histogram (reference-parity operators).

The reference maps severities to alert priorities CRITICAL=1 … INFO=5,
unknown=999 (reference core/elasticsearch.py:82-91) and counts events at or
above a threshold ordered CRITICAL→INFO (core/elasticsearch.py:156-174).
The testdata ``events`` table has event types instead of severities; the
fixed mapping below plays the SeverityLevel role deterministically.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# event_type -> priority (the reference's CRITICAL..INFO analog)
EVENT_PRIORITY: dict[str, int] = {
    "error": 1,       # CRITICAL
    "purchase": 2,    # HIGH
    "signup": 3,      # MEDIUM
    "click": 4,       # LOW
    "view": 5,        # INFO
}
_UNKNOWN_PRIORITY = 999  # reference core/elasticsearch.py:91


def add_priority(batch: pa.Table, type_col: str = "event_type") -> pa.Table:
    """Vectorized dictionary map via pc.index_in (no Python row loop)."""
    keys = pa.array(list(EVENT_PRIORITY), pa.string())
    vals = pa.array(list(EVENT_PRIORITY.values()), pa.int32())
    idx = pc.index_in(batch[type_col], value_set=keys)
    prio = pc.take(vals, idx)
    prio = pc.fill_null(prio, _UNKNOWN_PRIORITY)
    return batch.append_column("priority", prio)


def severity_histogram(ds, type_col: str = "event_type",
                       max_priority: int | None = None):
    """Count per event type, ordered by priority (CRITICAL→INFO), with an
    optional at-or-above-threshold filter — A2's distributed version."""
    from ray.data.aggregate import Count

    with_prio = ds.map_batches(
        lambda t: add_priority(t, type_col), batch_format="pyarrow")
    if max_priority is not None:
        with_prio = with_prio.map_batches(
            lambda t: t.filter(pc.less_equal(t["priority"],
                                             max_priority)),
            batch_format="pyarrow")
    out = (with_prio.groupby([type_col, "priority"])
           .aggregate(Count(alias_name="n")))
    return out.sort("priority")
