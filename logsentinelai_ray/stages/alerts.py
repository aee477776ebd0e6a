"""Alert notification sink — the reference's severity-threshold → notify
flow (reference utils/telegram_alert.py:22-61 posts formatted messages to
an HTTP endpoint; core/elasticsearch.py:210-258 builds the message) as a
Ray-native delivery stage.

Transport is pluggable:

- ``FileAlertSink`` — durable stand-in (and a useful production sink):
  one JSONL part file per delivered batch under ``out_dir``, named by the
  batch's first event id so a retried task overwrites its own file
  instead of duplicating deliveries (idempotent side-write, same
  contract as the index build's exchange files).
- ``WebhookAlertSink`` — the reference's HTTP shape via urllib. The
  sandbox has no network, so the POST callable is injectable
  (``post_fn``) and unit-tested with a fake; the default is a real
  ``urllib.request`` POST.

Delivery runs as an actor-pool ``map_batches`` (sink state constructed
once per actor in ``__init__``); only threshold-passing alerts flow into
the sink stage, so the fan-in is tiny relative to the event stream.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .severity import EVENT_PRIORITY, add_priority

_PRIORITY_LABEL = {1: "CRITICAL", 2: "HIGH", 3: "MEDIUM", 4: "LOW",
                   5: "INFO"}


def format_alerts(batch: pa.Table, min_priority: int = 2) -> pa.Table:
    """(event_id, priority, message) for events at or above threshold —
    the reference's message construction with its truncation rule
    (props[:100], core/elasticsearch.py:210-258)."""
    t = add_priority(batch)
    t = t.filter(pc.less_equal(t["priority"], min_priority))
    labels = pa.array(
        [_PRIORITY_LABEL.get(p, "UNKNOWN")
         for p in t["priority"].to_pylist()], pa.string())
    msg = pc.binary_join_element_wise(
        pa.array(["["] * t.num_rows), labels,
        pa.array(["] user="] * t.num_rows),
        pc.cast(t["user_id"], pa.string()),
        pa.array([" props="] * t.num_rows),
        pc.utf8_slice_codeunits(pc.fill_null(t["props"], ""), 0, 100),
        "")
    return pa.table({"event_id": t["event_id"],
                     "priority": t["priority"],
                     "message": msg})


class FileAlertSink:
    """Partitioned JSONL delivery target (one file per batch, id-named →
    retry-idempotent, resumable)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)

    def deliver(self, alerts: pa.Table) -> int:
        if alerts.num_rows == 0:
            return 0
        first = alerts["event_id"][0].as_py()
        path = os.path.join(self.out_dir, f"alerts-{first:012d}.jsonl")
        tmp = path + f".tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            for row in alerts.to_pylist():
                f.write(json.dumps(row) + "\n")
        os.replace(tmp, path)
        return alerts.num_rows


class WebhookAlertSink:
    """HTTP POST transport (reference utils/telegram_alert.py:22-61:
    endpoint + JSON body + timeout). ``post_fn(url, payload: bytes)`` is
    injectable for tests / alternative clients."""

    def __init__(self, url: str, timeout_s: float = 10.0, post_fn=None):
        self.url = url
        self.timeout_s = timeout_s
        self._post = post_fn or self._urllib_post

    def _urllib_post(self, url: str, payload: bytes) -> None:
        import urllib.request

        req = urllib.request.Request(
            url, data=payload,
            headers={"Content-Type": "application/json"})
        urllib.request.urlopen(req, timeout=self.timeout_s).read()

    def deliver(self, alerts: pa.Table) -> int:
        n = 0
        for row in alerts.to_pylist():
            self._post(self.url, json.dumps(row).encode("utf-8"))
            n += 1
        return n


class TelegramAlertSink(WebhookAlertSink):
    """Telegram Bot API transport — the reference's exact delivery
    channel (utils/telegram_alert.py:22-33: one ``sendMessage`` POST
    per alert to ``api.telegram.org/bot<token>``, chat_id + text body;
    the reference opens a fresh Bot per message to dodge pool reuse —
    here the sink is actor-held, one client per actor). Same injectable
    ``post_fn`` seam as the webhook sink (no network in the sandbox;
    the URL/payload shape is unit-tested with a fake)."""

    _API = "https://api.telegram.org/bot{token}/sendMessage"

    def __init__(self, token: str, chat_id: str,
                 timeout_s: float = 10.0, post_fn=None):
        super().__init__(self._API.format(token=token),
                         timeout_s=timeout_s, post_fn=post_fn)
        self.chat_id = chat_id

    def deliver(self, alerts: pa.Table) -> int:
        n = 0
        for row in alerts.to_pylist():
            payload = json.dumps({"chat_id": self.chat_id,
                                  "text": row["message"]})
            self._post(self.url, payload.encode("utf-8"))
            n += 1
        return n


class _DeliverStage:
    """Actor-pool stage: construct the sink once per actor, deliver per
    batch, emit one receipt row per batch."""

    def __init__(self, sink_factory, min_priority: int):
        self.sink = sink_factory()
        self.min_priority = min_priority

    def __call__(self, batch: pa.Table) -> pa.Table:
        alerts = format_alerts(batch, self.min_priority)
        n = self.sink.deliver(alerts) if alerts.num_rows else 0
        return pa.table({"n_delivered": pa.array([n], pa.int64())})


def notify_alerts(events_ds, sink_factory, min_priority: int = 2) -> int:
    """Format + deliver all threshold-passing alerts; returns the number
    delivered. ``sink_factory`` is a zero-arg callable (rides to each
    actor; construct clients there, not on the driver)."""
    out = events_ds.map_batches(
        _DeliverStage, fn_constructor_args=(sink_factory, min_priority),
        batch_format="pyarrow", concurrency=(1, 4)).sum("n_delivered")
    return int(out or 0)
