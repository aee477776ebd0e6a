"""Index build pipeline — SPIMI over Ray Data (SURVEY.md §7 phases 2).

Stages (each a checkpoint; a rerun skips completed work via the manifest):

  1. doc prep   : dedup (repo,path,commit) keep-first + deterministic dense
                  doc_id by global sort + distributed zipWithIndex; sha256
                  per row. Output ``docs/`` parquet (one file per block).
  2. postings   : ``map_batches`` tokenize (zero-copy Arrow, vectorized tf
                  via np.unique) → raw triples (part, salt, term, doc_id,
                  tf, dl) + field postings ("lang:x", "repo:y") for keyword
                  filters. Output ``postings_raw/`` parquet — the persisted
                  mid-shuffle checkpoint required by the north rule.
  2b. stats     : global N / avgdl / total_tokens aggregate → stats.json.
  3. encode     : groupby(part, salt) → vectorized run encoding (salt = S
                  contiguous doc-id ranges → hot-term skew spread over S
                  tasks; see segments.py).
  4. merge      : groupby(part) → concat runs per term, write
                  ``segments/part-XXXX.parquet`` atomically + manifest entry.

Doc-id assignment is the one place the Dataset API genuinely can't express
the semantics (distributed zipWithIndex after a global sort), so stage 1
drops to raw Ray tasks over the sorted dataset's block refs: a tiny
last-key wave, a dedup wave (block boundary duplicates handled by passing
the previous block's last key), a prefix-sum on the driver (num_blocks ints)
and an id-assign/write wave. Everything else is pure Dataset pipeline.

Reference parity notes: the reference's "index build" is one ES ``index()``
call per chunk with wall-clock ids (reference core/elasticsearch.py:46-77,
314-336) and no parallelism (core/commons.py:459-499); determinism +
partitioned checkpointing here are deliberate design departures mandated by
BASELINE.json.
"""

from __future__ import annotations

import hashlib
import os
import time
from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..analysis.tokenizer import tokenize_batch_arrow
from ..config import IndexConfig
from . import manifest as mf
from .segments import encode_runs, merge_runs

FIELD_PREFIXES = ("lang:", "repo:")


def term_partition(term: str, num_partitions: int) -> int:
    """Stable term → partition hash (blake2b; NEVER Python hash(), which is
    salted per process and would break determinism + routing)."""
    h = int.from_bytes(hashlib.blake2b(term.encode("utf-8"),
                                       digest_size=8).digest(), "big")
    return h % num_partitions


# --------------------------------------------------------------------------
# Stage 1: dedup + deterministic dense doc ids (distributed zipWithIndex)
# --------------------------------------------------------------------------

@ray.remote(num_cpus=0.25)
def _last_key(tbl: pa.Table):
    if tbl.num_rows == 0:
        return None
    return tbl["sortkey"][tbl.num_rows - 1].as_py()


@ray.remote(num_cpus=0.5)
def _dedup_block(tbl: pa.Table, prev_last_key):
    """Drop consecutive duplicate sortkeys (globally sorted input); the
    first row is also dropped when it equals the previous block's last key."""
    n = tbl.num_rows
    if n == 0:
        return tbl
    keys = tbl["sortkey"].combine_chunks()
    keep = np.ones(n, dtype=bool)
    eq = pc.equal(keys.slice(1), keys.slice(0, n - 1))
    keep[1:] = np.logical_not(eq.to_numpy(zero_copy_only=False))
    if prev_last_key is not None and keys[0].as_py() == prev_last_key:
        keep[0] = False
    return tbl.filter(pa.array(keep))


@ray.remote(num_cpus=1)
def _finalize_block(tbl: pa.Table, offset: int, out_path: str) -> int:
    """Assign dense doc ids from the global offset, add sha256, write."""
    n = tbl.num_rows
    doc_id = pa.array(np.arange(offset, offset + n, dtype=np.int64))
    sha = pa.array([hashlib.sha256(c.encode("utf-8")).hexdigest()
                    for c in tbl["content"].to_pylist()], pa.string())
    out = (tbl.drop_columns(["sortkey"])
              .add_column(0, "doc_id", doc_id)
              .append_column("sha256", sha))
    tmp = out_path + ".tmp"
    pq.write_table(out, tmp)
    os.replace(tmp, out_path)
    return n


def _add_sortkey(batch: pa.Table) -> pa.Table:
    key = pc.binary_join_element_wise(batch["repo"], batch["path"],
                                      batch["commit"], "\x00")
    return batch.append_column("sortkey", key)


def prep_docs(corpus_ds, index_dir: str) -> int:
    """Stage 1. Returns n_docs (post-dedup)."""
    docs_dir = os.path.join(index_dir, "docs")
    os.makedirs(docs_dir, exist_ok=True)
    keyed = corpus_ds.map_batches(_add_sortkey, batch_format="pyarrow")
    sorted_ds = keyed.sort("sortkey").materialize()
    refs = sorted_ds.to_arrow_refs()
    last_keys = ray.get([_last_key.remote(r) for r in refs])
    # previous non-empty block's last key for each block
    prev_keys = []
    prev = None
    for lk in last_keys:
        prev_keys.append(prev)
        if lk is not None:
            prev = lk
    dedup_refs = [_dedup_block.remote(r, pk) for r, pk in zip(refs, prev_keys)]
    counts = ray.get([_count_rows.remote(r) for r in dedup_refs])
    offsets = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])
    waves = [
        _finalize_block.remote(r, int(off),
                               os.path.join(docs_dir, f"part-{i:05d}.parquet"))
        for i, (r, off) in enumerate(zip(dedup_refs, offsets))
    ]
    written = ray.get(waves)
    n_docs = int(sum(written))
    mf.mark_stage(index_dir, "docs", {"n_docs": n_docs})
    return n_docs


@ray.remote(num_cpus=0.1)
def _count_rows(tbl: pa.Table) -> int:
    return tbl.num_rows


# --------------------------------------------------------------------------
# Stage 2: raw postings (tokenize → triples) — stateful actor pool
# --------------------------------------------------------------------------

class TokenizeEmit:
    """Actor-pool stage: content → raw posting triples.

    State built once per actor (the reference's analog is the LLM handle
    built once per run, reference core/commons.py:451 / core/llm.py:18-79):
    here it's the term→partition hash cache, which persists across batches.
    """

    def __init__(self, cfg: IndexConfig, n_docs: int):
        self.cfg = cfg
        self.n_docs = max(1, n_docs)
        self._part_cache: dict[str, int] = {}

    def _parts_for(self, terms: list[str]) -> np.ndarray:
        cache, P = self._part_cache, self.cfg.num_partitions
        out = np.empty(len(terms), dtype=np.int32)
        for i, t in enumerate(terms):
            p = cache.get(t)
            if p is None:
                p = term_partition(t, P)
                cache[t] = p
            out[i] = p
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        row_idx, tokens, dl_np = tokenize_batch_arrow(batch["content"],
                                                      cfg.max_token_len)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        enc = tokens.dictionary_encode()
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary.to_pylist()
        nv = max(1, len(vocab))
        # tf per (row, term): np.unique over a combined key — no Python loop
        combined = row_idx * nv + codes
        uniq, tf = np.unique(combined, return_counts=True)
        u_row = (uniq // nv).astype(np.int64)
        u_code = (uniq % nv).astype(np.int64)
        term_parts = self._parts_for(vocab)

        content_terms = pa.table({
            "part": pa.array(term_parts[u_code], pa.int32()),
            "term": pa.array(np.asarray(vocab, dtype=object)[u_code],
                             pa.string()),
            "doc_id": pa.array(doc_ids[u_row], pa.int64()),
            "tf": pa.array(tf.astype(np.int32), pa.int32()),
            "dl": pa.array(dl_np[u_row].astype(np.int32), pa.int32()),
            "is_field": pa.array(np.zeros(len(uniq), dtype=bool)),
        })

        # keyword-field postings for filters (lang / repo): tf=1, dl=1;
        # these are the analog of the Kibana keyword fields the reference
        # dashboards filter on (SURVEY.md §1.2).
        field_tables = [content_terms]
        for col, prefix in (("lang", "lang:"), ("repo", "repo:")):
            fterms = [prefix + v for v in batch[col].to_pylist()]
            field_tables.append(pa.table({
                "part": pa.array(self._parts_for(fterms), pa.int32()),
                "term": pa.array(fterms, pa.string()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "tf": pa.array(np.ones(len(fterms), dtype=np.int32)),
                "dl": pa.array(np.ones(len(fterms), dtype=np.int32)),
                "is_field": pa.array(np.ones(len(fterms), dtype=bool)),
            }))
        out = pa.concat_tables(field_tables)
        # salt: S contiguous doc-id ranges
        did = out["doc_id"].to_numpy(zero_copy_only=False)
        salt = np.minimum((did * cfg.salt_buckets) // self.n_docs,
                          cfg.salt_buckets - 1).astype(np.int32)
        return out.add_column(1, "salt", pa.array(salt))


def emit_postings(index_dir: str, cfg: IndexConfig, n_docs: int) -> None:
    """Stage 2: docs/ → postings_raw/ (persisted mid-shuffle checkpoint)."""
    import ray.data as rd

    docs = rd.read_parquet(os.path.join(index_dir, "docs"),
                           columns=["doc_id", "repo", "lang", "content"])
    triples = docs.map_batches(
        TokenizeEmit, fn_constructor_args=(cfg, n_docs),
        batch_format="pyarrow", batch_size=cfg.tokenize_batch_size,
        concurrency=(1, 8))
    out_dir = os.path.join(index_dir, "postings_raw")
    triples.write_parquet(out_dir)
    mf.mark_stage(index_dir, "postings_raw", {})


def compute_stats(index_dir: str, cfg: IndexConfig, n_docs: int) -> dict:
    """Stage 2b: global collection stats (partial per-batch sums → tiny)."""
    import ray.data as rd

    triples = rd.read_parquet(os.path.join(index_dir, "postings_raw"),
                              columns=["tf", "is_field"])

    def partial(batch: pa.Table) -> pa.Table:
        mask = pc.invert(batch["is_field"])
        s = pc.sum(pc.if_else(mask, batch["tf"], pa.scalar(0, pa.int32())))
        return pa.table({"t": pa.array([s.as_py() or 0], pa.int64())})

    total = triples.map_batches(partial, batch_format="pyarrow").sum("t")
    stats = {
        "n_docs": int(n_docs),
        "total_tokens": int(total or 0),
        "avgdl": (float(total) / n_docs) if n_docs else 0.0,
        "k1": cfg.k1, "b": cfg.b,
        "num_partitions": cfg.num_partitions,
        "salt_buckets": cfg.salt_buckets,
        "block_size": cfg.block_size,
        "max_token_len": cfg.max_token_len,
        "codec": "delta-gap+leb128-varint+blockmax",
    }
    mf.write_stats(index_dir, stats)
    return stats


# --------------------------------------------------------------------------
# Stages 3+4: shuffle → encode runs → merge → segments + manifest
# --------------------------------------------------------------------------

def _merge_and_write(group: pa.Table, index_dir: str, fingerprint: str
                     ) -> pa.Table:
    t0 = time.monotonic()
    merged = merge_runs(group)
    part = int(merged["part"][0].as_py()) if merged.num_rows else -1
    if part < 0:
        return pa.table({"part": pa.array([], pa.int32()),
                         "n_terms": pa.array([], pa.int64()),
                         "n_postings": pa.array([], pa.int64())})
    seg_dir = os.path.join(index_dir, "segments")
    os.makedirs(seg_dir, exist_ok=True)
    path = os.path.join(seg_dir, f"part-{part:04d}.parquet")
    tmp = path + f".tmp-{os.getpid()}"
    pq.write_table(merged, tmp)
    os.replace(tmp, path)
    n_postings = int(pc.sum(merged["df"]).as_py() or 0)
    nbytes = sum(len(v) for v in merged["doc_data"].to_pylist())
    nbytes += sum(len(v) for v in merged["tf_data"].to_pylist())
    nbytes += sum(len(v) for v in merged["dl_data"].to_pylist())
    mf.write_part_entry(index_dir, {
        "part": part,
        "fingerprint": fingerprint,
        "n_terms": merged.num_rows,
        "n_postings": n_postings,
        "posting_bytes": int(nbytes),
        "elapsed_s": round(time.monotonic() - t0, 4),
        "output": path,
    })
    return pa.table({"part": pa.array([part], pa.int32()),
                     "n_terms": pa.array([merged.num_rows], pa.int64()),
                     "n_postings": pa.array([n_postings], pa.int64())})


def _write_empty_part(index_dir: str, part: int, fingerprint: str) -> None:
    from .segments import SEGMENT_SCHEMA

    seg_dir = os.path.join(index_dir, "segments")
    os.makedirs(seg_dir, exist_ok=True)
    path = os.path.join(seg_dir, f"part-{part:04d}.parquet")
    tmp = path + ".tmp"
    pq.write_table(SEGMENT_SCHEMA.empty_table(), tmp)
    os.replace(tmp, path)
    mf.write_part_entry(index_dir, {
        "part": part, "fingerprint": fingerprint, "n_terms": 0,
        "n_postings": 0, "posting_bytes": 0, "elapsed_s": 0.0,
        "output": path,
    })


def build_segments(index_dir: str, cfg: IndexConfig, avgdl: float,
                   fingerprint: str) -> None:
    """Stages 3+4, restricted to partitions not yet in the manifest."""
    import ray.data as rd

    done = mf.completed_parts(index_dir, fingerprint)
    remaining = sorted(set(range(cfg.num_partitions)) - done)
    if not remaining:
        return
    triples = rd.read_parquet(os.path.join(index_dir, "postings_raw"))
    if done:
        want = pa.array(remaining, pa.int32())
        triples = triples.map_batches(
            lambda t: t.filter(pc.is_in(t["part"], value_set=want)),
            batch_format="pyarrow")
    runs = triples.groupby(["part", "salt"]).map_groups(
        partial(encode_runs, cfg=cfg, avgdl=avgdl), batch_format="pyarrow")
    summary = runs.groupby("part").map_groups(
        partial(_merge_and_write, index_dir=index_dir,
                fingerprint=fingerprint),
        batch_format="pyarrow")
    written = {int(p) for p in summary.to_pandas()["part"].tolist()}
    for p in set(remaining) - written:
        _write_empty_part(index_dir, p, fingerprint)


# --------------------------------------------------------------------------
# Driver
# --------------------------------------------------------------------------

def build_index(corpus_ds, index_dir: str, cfg: IndexConfig | None = None,
                corpus_tag: str = "default") -> dict:
    """Build (or resume) the full index. Returns the build meta dict.

    ``corpus_ds``: Ray Dataset with columns (repo, path, commit, lang,
    content) — BASELINE.json input_hint shape. ``corpus_tag`` identifies the
    input for lineage (a path or content fingerprint); a resumed build only
    skips work whose manifest fingerprint matches tag + config.
    """
    cfg = cfg or IndexConfig()
    fingerprint = mf._fingerprint(corpus_tag, cfg)
    os.makedirs(index_dir, exist_ok=True)
    t0 = time.monotonic()
    timings: dict[str, float] = {}

    if not mf.stage_done(index_dir, "docs"):
        t = time.monotonic()
        n_docs = prep_docs(corpus_ds, index_dir)
        timings["prep_docs_s"] = round(time.monotonic() - t, 3)
    else:
        n_docs = mf.read_stage(index_dir, "docs")["n_docs"]

    if not mf.stage_done(index_dir, "postings_raw"):
        t = time.monotonic()
        emit_postings(index_dir, cfg, n_docs)
        timings["emit_postings_s"] = round(time.monotonic() - t, 3)

    if not os.path.exists(os.path.join(index_dir, "stats.json")):
        t = time.monotonic()
        stats = compute_stats(index_dir, cfg, n_docs)
        timings["stats_s"] = round(time.monotonic() - t, 3)
    else:
        stats = mf.read_stats(index_dir)

    t = time.monotonic()
    build_segments(index_dir, cfg, stats["avgdl"], fingerprint)
    timings["segments_s"] = round(time.monotonic() - t, 3)

    meta = {
        "fingerprint": fingerprint,
        "corpus_tag": corpus_tag,
        "n_docs": n_docs,
        "stats": stats,
        "timings": timings,
        "total_s": round(time.monotonic() - t0, 3),
    }
    mf.write_meta(index_dir, meta)
    return meta
