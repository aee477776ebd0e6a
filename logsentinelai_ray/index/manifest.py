"""Build manifest: per-partition lineage + metrics, the checkpoint unit.

The reference has NO checkpointing (a batch rerun reprocesses everything and
even mints new wall-clock doc ids — reference core/elasticsearch.py:64;
realtime restart loses pending lines, core/monitoring.py:452-456). Per
BASELINE.json north_rule our build must "resume from checkpoint with
per-partition lineage + metrics": every completed term-partition writes one
JSON manifest entry recording its input fingerprint, counts and timings; a
restarted build skips stages/partitions whose fingerprint matches.

Layout under ``index_dir``:
  docs/                 stage-1 output (doc ids assigned)   + docs/_SUCCESS
  postings_raw/         stage-2 output (raw triples)        + postings_raw/_SUCCESS
  stats.json            stage-2b global stats (N, avgdl, total_tokens)
  segments/part-XXXX.parquet   stage-3/4 output (atomic tmp+rename)
  manifest/part-XXXX.json      per-partition lineage+metrics (written last)
  manifest/_meta.json          build-level config + fingerprint
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict

from ..config import IndexConfig


def _fingerprint(corpus_tag: str, cfg: IndexConfig) -> str:
    import hashlib

    blob = json.dumps({"corpus": corpus_tag, "cfg": asdict(cfg)},
                      sort_keys=True)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def stage_done(index_dir: str, stage: str) -> bool:
    return os.path.exists(os.path.join(index_dir, stage, "_SUCCESS"))


def mark_stage(index_dir: str, stage: str, payload: dict | None = None) -> None:
    path = os.path.join(index_dir, stage, "_SUCCESS")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload or {}, f)
    os.replace(tmp, path)


def read_stage(index_dir: str, stage: str) -> dict:
    with open(os.path.join(index_dir, stage, "_SUCCESS")) as f:
        return json.load(f)


def completed_parts(index_dir: str, fingerprint: str) -> set[int]:
    """Partitions whose manifest entry exists and matches the fingerprint."""
    mdir = os.path.join(index_dir, "manifest")
    done: set[int] = set()
    if not os.path.isdir(mdir):
        return done
    for name in os.listdir(mdir):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                entry = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if entry.get("fingerprint") == fingerprint:
            done.add(int(entry["part"]))
    return done


def write_part_entry(index_dir: str, entry: dict) -> None:
    mdir = os.path.join(index_dir, "manifest")
    os.makedirs(mdir, exist_ok=True)
    path = os.path.join(mdir, f"part-{entry['part']:04d}.json")
    tmp = path + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(entry, f)
    os.replace(tmp, path)


def write_meta(index_dir: str, meta: dict) -> None:
    mdir = os.path.join(index_dir, "manifest")
    os.makedirs(mdir, exist_ok=True)
    tmp = os.path.join(mdir, "_meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, os.path.join(mdir, "_meta.json"))


def read_stats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "stats.json")) as f:
        return json.load(f)


def write_stats(index_dir: str, stats: dict) -> None:
    os.makedirs(index_dir, exist_ok=True)
    tmp = os.path.join(index_dir, "stats.json.tmp")
    with open(tmp, "w") as f:
        json.dump(stats, f)
    os.replace(tmp, os.path.join(index_dir, "stats.json"))
