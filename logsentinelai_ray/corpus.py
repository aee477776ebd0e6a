"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Shape per BASELINE.json input_hint:
``(repo:string, path:string, commit:string, lang:string, content:string)``.

Everything is a pure function of the seed — no wall-clock anywhere (the
reference's timestamped ES doc ids, reference core/elasticsearch.py:64, are
exactly the non-reproducibility we must avoid). Term frequencies are Zipfian
so hot terms ("error", "import", "return", "self", "the") exercise shuffle
skew/salting; camelCase + snake_case identifiers exercise the code-aware
tokenizer; the reference's threat vocabulary ("authentication failure",
"select union", "/etc/passwd", "robots.txt" — drawn from its prompt/threat
terms, reference core/prompts.py) guarantees the query set has hits.

~1% of rows are exact duplicates of earlier rows (same (repo,path,commit)
AND content) to exercise dedup-keep-first in doc-id assignment.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .config import CorpusConfig

# Zipf head first — the skew drivers.
_VOCAB = [
    "error", "import", "return", "self", "the", "def", "if", "for", "in",
    "data", "value", "result", "none", "true", "false", "log", "request",
    "response", "config", "test", "file", "path", "name", "type", "class",
    "function", "index", "query", "batch", "stream", "token", "parse",
    "handler", "server", "client", "buffer", "cache", "thread", "lock",
    "async", "await", "yield", "raise", "except", "try", "while", "break",
    "continue", "lambda", "print", "format", "split", "join", "strip",
    "append", "extend", "insert", "remove", "delete", "update", "create",
    "read", "write", "open", "close", "flush", "seek", "tell", "size",
    "count", "offset", "limit", "range", "list", "dict", "set", "tuple",
    "str", "int", "float", "bool", "bytes", "object", "module", "package",
    "version", "status", "code", "header", "body", "json", "xml", "html",
    "http", "https", "url", "uri", "host", "port", "socket", "connect",
]

_IDENTIFIERS = [
    "parseHttpRequest", "auth_failure_count", "getUserById", "retry_backoff",
    "MaxBufferSize", "handleTimeoutError", "socket_read_loop", "JSONDecoder",
    "validateInputSchema", "flushWriteBuffer", "computeShardOffset",
    "geo_ip_lookup", "severity_level", "chunkPendingTimeout", "log_monitor",
]

_THREATS = [
    "authentication failure", "select union", "/etc/passwd", "robots.txt",
    "sql injection attempt", "brute force login", "invalid user admin",
    "directory traversal", "xss script alert", "failed password for root",
]

_LOG_LINES = [
    '192.168.1.10 - - [22/Jan/2019:03:56:14 +0330] "GET /index.html HTTP/1.1" 200 30577',
    "[Thu Jun 09 06:07:04 2005] [notice] caught SIGTERM shutting down",
    "Jun 14 15:16:01 host sshd(pam_unix)[19939]: authentication failure; rhost=218.188.2.4",
]

_EXT = {"python": "py", "java": "java", "go": "go", "js": "js",
        "rust": "rs", "c": "c", "md": "md"}


def _commit_hex(repo: str, path: str, counter: int) -> str:
    return hashlib.sha1(f"{repo}|{path}|{counter}".encode()).hexdigest()


def sha256_hex(content: str) -> str:
    return hashlib.sha256(content.encode("utf-8")).hexdigest()


def generate_corpus(cfg: CorpusConfig | None = None, *, n_docs: int | None = None,
                    seed: int | None = None, counter_base: int = 0) -> pa.Table:
    """Build the corpus as one pyarrow Table (drivers shard it afterwards).

    ``counter_base`` offsets the commit-hash counter so chunked generation
    (write_corpus) can't collide keys across chunks. Keep chunks under
    ~150k docs: the word pool is a 32-bit-offset string array.
    """
    cfg = cfg or CorpusConfig()
    n = n_docs if n_docs is not None else cfg.n_docs
    rng = np.random.RandomState(seed if seed is not None else cfg.seed)

    vocab = np.array(_VOCAB)
    # Zipf(s≈1.1) ranks over the vocabulary.
    ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
    zipf_p = (1.0 / ranks ** 1.1)
    zipf_p /= zipf_p.sum()

    lang_idx = rng.choice(len(cfg.langs), size=n, p=np.array(cfg.lang_weights))
    n_lines = rng.randint(50, 401, size=n)
    mod_idx = rng.randint(0, 40, size=n)
    file_idx = rng.randint(0, 997, size=n)

    # vectorized text assembly: sample every word / insert decision in one
    # shot, then join per line / per doc (the only remaining Python loops
    # are string joins)
    total_lines = int(n_lines.sum())
    words_per_line = rng.randint(3, 9, size=total_lines)
    total_words = int(words_per_line.sum())
    word_idx = rng.choice(len(vocab), size=total_words, p=zipf_p)
    all_words = vocab[word_idx]
    extra_kind = rng.random_sample(total_lines)  # <.15 ident, <.20 threat, <.23 log
    extra_idx = rng.randint(0, 2 ** 30, size=total_lines)
    # synthetic identifiers: pairs of vocab words with Zipfian popularity
    # on BOTH components → a realistic long-tailed identifier vocabulary
    # (~vocab² distinct). camelCase/snake_case variants split back into
    # their (hot) component words under the code-aware tokenizer; the
    # FUSED lowercase variant survives as a single rare term, giving the
    # index a realistic Zipf tail (selective terms for WAND pruning)
    # alongside the hot head. Fixed _IDENTIFIERS stay in rotation as the
    # stable targets of queries.json.
    id_w1 = rng.choice(len(vocab), size=total_lines, p=zipf_p)
    id_w2 = rng.choice(len(vocab), size=total_lines, p=zipf_p)
    id_style = rng.randint(0, 4, size=total_lines)  # fixed/camel/snake/fused

    import pyarrow.compute as pc

    word_off = np.zeros(total_lines + 1, dtype=np.int64)
    np.cumsum(words_per_line, out=word_off[1:])
    words_pa = pa.array(all_words, pa.string())
    if isinstance(words_pa, pa.ChunkedArray):
        words_pa = words_pa.combine_chunks()
    words_pa = words_pa.cast(pa.large_string())
    word_lists = pa.LargeListArray.from_arrays(pa.array(word_off), words_pa)
    lines = pc.binary_join(word_lists, pa.scalar(" ", pa.large_string()))
    # line suffixes (identifier / threat / log flavor), null = no suffix
    suffixes = np.full(total_lines, None, dtype=object)
    m1 = extra_kind < 0.15
    m2 = (extra_kind >= 0.15) & (extra_kind < 0.20)
    m3 = (extra_kind >= 0.20) & (extra_kind < 0.23)
    m1_fixed = m1 & (id_style == 0)
    suffixes[m1_fixed] = np.array(_IDENTIFIERS, dtype=object)[
        extra_idx[m1_fixed] % len(_IDENTIFIERS)]
    for li in np.flatnonzero(m1 & (id_style == 1)):
        w1, w2 = vocab[id_w1[li]], vocab[id_w2[li]]
        suffixes[li] = w1 + w2.capitalize()
    for li in np.flatnonzero(m1 & (id_style == 2)):
        suffixes[li] = vocab[id_w1[li]] + "_" + vocab[id_w2[li]]
    for li in np.flatnonzero(m1 & (id_style == 3)):
        suffixes[li] = vocab[id_w1[li]] + vocab[id_w2[li]]
    suffixes[m2] = np.array(_THREATS, dtype=object)[
        extra_idx[m2] % len(_THREATS)]
    suffixes[m3] = np.array(_LOG_LINES, dtype=object)[
        extra_idx[m3] % len(_LOG_LINES)]
    suffix_pa = pa.array(suffixes, pa.string()).cast(pa.large_string())
    lines = pc.binary_join_element_wise(
        lines, suffix_pa, pa.scalar(" ", pa.large_string()),
        null_handling="skip")

    line_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_lines, out=line_off[1:])
    line_lists = pa.LargeListArray.from_arrays(pa.array(line_off), lines)
    contents = pc.binary_join(
        line_lists, pa.scalar("\n", pa.large_string())).to_pylist()

    repos, paths, commits, langs = [], [], [], []
    for i in range(n):
        lang = cfg.langs[lang_idx[i]]
        repo = f"org{i % 7}/repo{i % 23}"
        repos.append(repo)
        paths.append(f"src/module_{mod_idx[i]}/file_{file_idx[i]}"
                     f".{_EXT[lang]}")
        commits.append(_commit_hex(repo, paths[-1], counter_base + i))
        langs.append(lang)

    # Exact duplicates of earlier rows (~dup_fraction), appended at the end so
    # "keep first" has a well-defined meaning in original row order.
    n_dup = max(1, int(n * cfg.dup_fraction)) if n >= 10 else 0
    for j in range(n_dup):
        src = int(rng.randint(0, n))
        repos.append(repos[src])
        paths.append(paths[src])
        commits.append(commits[src])
        langs.append(langs[src])
        contents.append(contents[src])

    return pa.table({
        "repo": pa.array(repos, pa.string()),
        "path": pa.array(paths, pa.string()),
        "commit": pa.array(commits, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "content": pa.array(contents, pa.string()),
    })


def write_corpus(out_dir: str, cfg: CorpusConfig | None = None, *,
                 n_docs: int | None = None, seed: int | None = None,
                 num_files: int = 4) -> str:
    """Write the corpus as a directory of Parquet shards (resumable
    layout). Generation is chunked per file (seed + file index, disjoint
    commit counters) so arbitrarily large corpora stay within 32-bit
    Arrow offsets and bounded memory."""
    import os

    import pyarrow.parquet as pq

    cfg = cfg or CorpusConfig()
    n = n_docs if n_docs is not None else cfg.n_docs
    base_seed = seed if seed is not None else cfg.seed
    os.makedirs(out_dir, exist_ok=True)
    per = max(1, (n + num_files - 1) // num_files)
    done = 0
    for f in range(num_files):
        if done >= n:
            break
        chunk = min(per, n - done)
        table = generate_corpus(cfg, n_docs=chunk, seed=base_seed + f,
                                counter_base=done)
        pq.write_table(table, f"{out_dir}/part-{f:04d}.parquet")
        done += chunk
    return out_dir


def corpus_from_documents(sf_dir: str):
    """Map the driver testdata ``documents`` table into the corpus shape.

    FIXTURES.md §5: ``text→content``, ``lang→lang``; ``repo/path/commit`` are
    synthesized deterministically from ``doc_id``. Returns a Ray Dataset.
    """
    import pyarrow.compute as pc
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text", "lang", "source"])

    def to_corpus(batch: pa.Table) -> pa.Table:
        did = batch["doc_id"].to_numpy(zero_copy_only=False)
        repo = pa.array([f"org{d % 7}/repo{d % 23}" for d in did], pa.string())
        path_arr = pa.array(
            [f"src/{s}/doc_{d}.md" for d, s in
             zip(did, batch["source"].to_pylist())], pa.string())
        commit = pa.array([_commit_hex(f"org{d % 7}/repo{d % 23}",
                                       f"doc_{d}.md", int(d)) for d in did],
                          pa.string())
        return pa.table({
            "repo": repo,
            "path": path_arr,
            "commit": commit,
            "lang": pc.cast(batch["lang"], pa.string()),
            "content": pc.cast(batch["text"], pa.string()),
        })

    return ds.map_batches(to_corpus, batch_format="pyarrow")
