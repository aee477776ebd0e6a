"""Nested event documents as Arrow ``list<struct>`` columns.

The reference's core data model is an analysis document holding
``events: list[SecurityEvent]`` (min 1) with per-event severity
(reference analyzers/httpd_access.py:33-61), and its Kibana dashboards
aggregate on the *nested* field ``events.severity.keyword``. SURVEY §1.3
maps that to ``pa.list_(pa.struct(...))``. This module provides both
halves of that lifecycle as Ray Data stages:

- ``build_event_docs``: events table → one document per user with an
  ``events: list<struct<event_id, event_type, priority>>`` column
  ordered by (ts, event_id) — the reference's chunk→document
  construction, distributed as a ``groupby(user).map_groups``.
- ``explode_events``: the nested-field aggregation input —
  ``pc.list_flatten`` for the element values plus
  ``pc.list_parent_indices`` to stamp each exploded event with its
  parent document's attributes (what makes a *nested* aggregation
  different from a flat one).

Scale note: building nested docs is one all-to-all exchange on the
document key (inherent — the events of one document must co-locate);
everything after flows through ``map_batches`` with per-batch partial
aggregation, so no second shuffle sees event-sized data.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .severity import add_priority

EVENT_STRUCT = pa.struct([("event_id", pa.int64()),
                          ("event_type", pa.string()),
                          ("priority", pa.int32())])


def _group_to_doc(g: pa.Table) -> pa.Table:
    """One user's events → a single nested document row."""
    g = g.sort_by([("ts", "ascending"), ("event_id", "ascending")])
    g = add_priority(g)
    ev = pa.StructArray.from_arrays(
        [g["event_id"].combine_chunks(),
         g["event_type"].combine_chunks(),
         g["priority"].combine_chunks()],
        fields=list(EVENT_STRUCT))
    lst = pa.ListArray.from_arrays(
        pa.array([0, g.num_rows], pa.int32()), ev)
    return pa.table({
        "user_id": pa.array([g["user_id"][0].as_py()], pa.int64()),
        "events": lst,
    })


def build_event_docs(events_ds):
    """events(user_id, event_id, event_type, ts) → docs(user_id,
    events: list<struct>) — one row per user, events in (ts, event_id)
    order."""
    return events_ds.groupby("user_id").map_groups(
        _group_to_doc, batch_format="pyarrow")


def explode_events(batch: pa.Table) -> pa.Table:
    """Flatten the nested events column, attributing each event to its
    parent doc via ``list_parent_indices`` (the nested-aggregation join).
    Returns one row per event: (user_id, event_id, event_type,
    priority)."""
    ev = batch["events"]
    if isinstance(ev, pa.ChunkedArray):
        ev = ev.combine_chunks()
    flat = pc.list_flatten(ev)
    parent = pc.list_parent_indices(ev)
    uid = pc.take(batch["user_id"], parent)
    return pa.table({
        "user_id": uid,
        "event_id": pc.struct_field(flat, "event_id"),
        "event_type": pc.struct_field(flat, "event_type"),
        "priority": pc.struct_field(flat, "priority"),
    })
