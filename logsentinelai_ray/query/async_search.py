"""ES ``_async_search`` analog: submit-now, fetch-later query lifecycle.

The reference's dashboards sit on synchronous ES queries; ES's own API
family for long-running queries is ``_async_search`` (submit returns an
id immediately, ``GET _async_search/<id>`` polls status, results expire
or are deleted explicitly). The analog here keeps the same contract on
the coordinator: ``submit`` schedules the query on a small thread pool
(the ES async-search task), ``status`` reports liveness without
blocking, ``get`` joins and returns exactly what the synchronous path
returns (results are bit-identical to ``SearchEngine.search`` — the
driver entry shares bm25_topk's SQL oracle), ``delete`` drops the
stored response like ``DELETE _async_search/<id>``.

State is coordinator-held, mirroring ES's ``.async-search`` system
index: nothing engine-side changes, and the underlying shard fan-out /
TAAT-or-WAND strategy choice is untouched. Ray's driver-side futures
are thread-safe, so a pool thread running ``engine.search`` issues the
same shard RPCs the caller would.

Scale note: at a real deployment the stored responses would live in an
index (or the object store via ``ray.put``) with TTL reaping; the
in-memory dict + explicit delete models the API surface, and the
thread pool bounds coordinator concurrency exactly like ES's
``search.max_async_search_response_size`` / task-pool limits bound
theirs.
"""

from __future__ import annotations

import threading
from concurrent.futures import Future, ThreadPoolExecutor

import pyarrow as pa


class AsyncSearchManager:
    """Submit/status/get/delete lifecycle over a ``SearchEngine``.

    ids are deterministic ("as-0", "as-1", ...) — the reference engine
    avoids wall-clock ids everywhere for reproducibility (see
    index/build.py deterministic doc ids) and this follows suit.
    """

    def __init__(self, engine, max_concurrent: int = 4):
        self._eng = engine
        self._pool = ThreadPoolExecutor(max_workers=max_concurrent)
        self._tasks: dict[str, Future] = {}
        self._lock = threading.Lock()
        self._next = 0

    def submit(self, text: str, k: int = 10, **kw) -> str:
        """Start the query; returns its async-search id immediately."""
        with self._lock:
            sid = f"as-{self._next}"
            self._next += 1
            self._tasks[sid] = self._pool.submit(
                self._eng.search, text, k=k, **kw)
        return sid

    def status(self, sid: str) -> dict:
        """Non-blocking: {id, is_running, is_partial} — is_partial is
        True until the response is complete (the ES field's contract),
        False once results are final."""
        fut = self._lookup(sid)
        running = not fut.done()
        return {"id": sid, "is_running": running, "is_partial": running}

    def get(self, sid: str, timeout: float | None = None) -> pa.Table:
        """Join the task and return the final response (identical to
        the synchronous ``SearchEngine.search`` result)."""
        return self._lookup(sid).result(timeout=timeout)

    def delete(self, sid: str) -> bool:
        """Drop the stored response (DELETE _async_search/<id>); a
        still-running task is cancelled if possible, else its result
        is discarded on completion. Returns True if the id existed."""
        with self._lock:
            fut = self._tasks.pop(sid, None)
        if fut is None:
            return False
        fut.cancel()
        return True

    def shutdown(self) -> None:
        self._pool.shutdown(wait=True)

    def _lookup(self, sid: str) -> Future:
        with self._lock:
            fut = self._tasks.get(sid)
        if fut is None:
            raise KeyError(f"unknown or deleted async search id: {sid}")
        return fut
