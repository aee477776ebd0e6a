"""Continuous ingest — the reference's realtime monitor loop as a batch
watcher (reference core/monitoring.py:301-438: poll the source, pick up
the delta, analyze, repeat; :412-427 flush pending work per chunk;
:381-399 load-shed via the sampling threshold).

Our immutable-parquet analog watches a corpus directory: each poll round
ingests the parquet files that appeared since the last committed round
via :func:`update_index`, with the manifest as the frontier.

- **Frontier** (``manifest/_ingest_frontier.json``): the set of files
  already committed. Written atomically AFTER ``update_index`` commits,
  so a crash between update and frontier write re-runs the same file
  batch — which ``update_index``'s pending-marker protocol resumes
  idempotently (the marker stores the exact file list).
- **Load shedding** (``max_batch_files``): caps how many new files one
  round ingests; the rest wait for the next round — the reference's
  pending-lines cap.
- **Batching + timeout flush** (``min_batch_files`` /
  ``pending_timeout_s``): a delta smaller than ``min_batch_files``
  buffers (amortizing per-update merge cost) until either enough files
  accumulate or the oldest pending observation ages past the timeout —
  the reference's chunk-pending protocol (core/monitoring.py:326-366,
  430-438; ``REALTIME_CHUNK_PENDING_TIMEOUT`` default 1800 s,
  core/config.py:102). The timer is in-memory; after a watcher restart
  the buffered delta waits at most one fresh timeout (conservative —
  nothing is lost, the frontier still knows the files are pending).
- **Rotation/truncation**: a file is identified by name; corpus files
  are immutable by contract (the reference instead tracks inode+offset,
  core/monitoring.py:122-161 — inapplicable to parquet).

Each round's ``delta_tag`` derives from the committed-file count, so a
crashed round resumes under the same tag deterministically.
"""

from __future__ import annotations

import json
import os
import time

from ..config import IndexConfig
from .update import _pending_path, update_index


def _frontier_path(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest", "_ingest_frontier.json")


def read_frontier(index_dir: str) -> list[str]:
    path = _frontier_path(index_dir)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return json.load(f)["files"]


def _write_frontier(index_dir: str, files: list[str]) -> None:
    path = _frontier_path(index_dir)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"files": sorted(files)}, f)
    os.replace(tmp, path)


class CorpusWatcher:
    """Poll ``corpus_dir`` for new parquet files and append them to the
    index. One instance owns one index; rounds are strictly sequential
    (the index mutation itself is the distributed part)."""

    def __init__(self, corpus_dir: str, index_dir: str,
                 cfg: IndexConfig | None = None,
                 max_batch_files: int | None = None,
                 min_batch_files: int = 1,
                 pending_timeout_s: float = 1800.0,
                 tag_prefix: str = "watch"):
        self.corpus_dir = corpus_dir
        self.index_dir = index_dir
        self.cfg = cfg
        self.max_batch_files = max_batch_files
        self.min_batch_files = min_batch_files
        self.pending_timeout_s = pending_timeout_s
        self.tag_prefix = tag_prefix
        self._pending_since: float | None = None

    def pending_files(self) -> list[str]:
        """New parquet files not yet committed, oldest-name-first."""
        done = set(read_frontier(self.index_dir))
        names = sorted(
            os.path.abspath(os.path.join(self.corpus_dir, n))
            for n in os.listdir(self.corpus_dir) if n.endswith(".parquet"))
        return [f for f in names if f not in done]

    def poll_once(self) -> dict | None:
        """One round: resume a crashed update first, else ingest up to
        ``max_batch_files`` new files. Returns the update result, or
        None when there was nothing to do."""
        done = read_frontier(self.index_dir)
        marker = _pending_path(self.index_dir)
        if os.path.exists(marker):
            # crashed round: replay with the marker's own file list/tag —
            # update_index resumes it idempotently
            with open(marker) as f:
                pend = json.load(f)
            res = update_index(pend["corpus_files"], self.index_dir,
                               self.cfg, delta_tag=pend["delta_tag"])
            _write_frontier(self.index_dir,
                            done + list(pend["corpus_files"]))
            return res
        batch = self.pending_files()
        if not batch:
            self._pending_since = None
            return None
        if len(batch) < self.min_batch_files:
            # sub-threshold delta: buffer until min_batch_files accumulate
            # OR the oldest pending observation ages past the timeout —
            # then flush the partial window (reference chunk_pending
            # protocol, core/monitoring.py:326-366)
            now = time.monotonic()
            if self._pending_since is None:
                self._pending_since = now
            if now - self._pending_since < self.pending_timeout_s:
                return None
        self._pending_since = None
        if self.max_batch_files is not None:
            batch = batch[:self.max_batch_files]  # load shed; rest waits
        tag = f"{self.tag_prefix}-{len(done):06d}"
        res = update_index(batch, self.index_dir, self.cfg, delta_tag=tag)
        _write_frontier(self.index_dir, done + batch)
        return res

    def run(self, poll_interval: float = 2.0,
            max_rounds: int | None = None,
            idle_rounds: int | None = None) -> list[dict]:
        """Poll loop (reference core/monitoring.py:301-330). Stops after
        ``max_rounds`` total rounds or ``idle_rounds`` consecutive empty
        polls (both None = run forever). Returns the round results."""
        results: list[dict] = []
        idle = 0
        rounds = 0
        while True:
            if max_rounds is not None and rounds >= max_rounds:
                return results
            res = self.poll_once()
            rounds += 1
            if res is None:
                idle += 1
                if idle_rounds is not None and idle >= idle_rounds:
                    return results
                time.sleep(poll_interval)
            else:
                idle = 0
                results.append(res)


class RolloverWatcher:
    """Continuous ingest into a ROLLOVER ALIAS (index/rollover.py):
    the watcher protocol of CorpusWatcher (reference
    core/monitoring.py:301-330 poll loop), but each round lands in the
    alias's current generation and index sizes stay bounded by the
    alias's max_docs — the operational shape for unbounded streams at
    10^12-doc scale (one index would otherwise grow without limit; the
    reference delegates exactly this to ES ILM/rollover on its write
    alias, core/elasticsearch.py index naming).

    Crash safety: the frontier lives in the alias dir and advances only
    after the round's ingest returns; replays are tag-idempotent
    (RolloverIndex.ingest skips logged tags, and a crash before the log
    commit replays through build/update's own resume semantics)."""

    def __init__(self, corpus_dir: str, rollover,
                 max_batch_files: int | None = None,
                 tag_prefix: str = "watch"):
        self.corpus_dir = corpus_dir
        self.roll = rollover
        self.max_batch_files = max_batch_files
        self.tag_prefix = tag_prefix

    def _frontier(self) -> list[str]:
        return read_frontier(self.roll.base_dir)

    def pending_files(self) -> list[str]:
        done = set(self._frontier())
        names = sorted(
            os.path.abspath(os.path.join(self.corpus_dir, n))
            for n in os.listdir(self.corpus_dir)
            if n.endswith(".parquet"))
        return [f for f in names if f not in done]

    def poll_once(self) -> dict | None:
        done = self._frontier()
        batch = self.pending_files()
        if not batch:
            return None
        if self.max_batch_files is not None:
            batch = batch[:self.max_batch_files]
        tag = f"{self.tag_prefix}-{len(done):06d}"
        entry = self.roll.ingest(batch, tag=tag)
        _write_frontier(self.roll.base_dir, done + batch)
        return {"generation": entry, "files": len(batch)}

    def run(self, poll_interval: float = 2.0,
            max_rounds: int | None = None,
            idle_rounds: int | None = None) -> list[dict]:
        results: list[dict] = []
        idle = 0
        rounds = 0
        while True:
            if max_rounds is not None and rounds >= max_rounds:
                return results
            res = self.poll_once()
            rounds += 1
            if res is None:
                idle += 1
                if idle_rounds is not None and idle >= idle_rounds:
                    return results
                time.sleep(poll_interval)
            else:
                idle = 0
                results.append(res)
