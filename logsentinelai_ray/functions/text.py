"""Text-analysis operators for large-scale training-data pipelines.

Each is a vectorized ``map_batches`` body over Arrow batches: language-ID
(marker-word heuristic), quality scoring (char/token ratios), token
counting, and document fingerprinting (min-hash-of-shingles + rolling
polynomial hash). All are deterministic and have DuckDB-SQL oracles in
``__ray_entry__.oracle_sql`` (except the rolling hash, rows-only).

These extend the reference's per-chunk "statistics" idea (the reference
delegates counting to the LLM — reference analyzers/httpd_access.py:47-51)
into real distributed, exactly-defined computations.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# fixed marker vocabularies for the language-ID heuristic (word-boundary,
# non-overlapping matches — RE2 \b semantics, identical in DuckDB)
LANG_MARKERS: dict[str, str] = {
    "de": r"\b(der|die|und|nicht|das)\b",
    "en": r"\b(the|and|of|is|to)\b",
    "es": r"\b(el|la|de|que|los)\b",
    "fr": r"\b(le|la|et|les|des)\b",
    "zh": r"\b(de|shi|le|wo|zai)\b",
}

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def add_lang_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Predict language as argmax of marker-pattern hit counts.

    Tie-break: lexicographically smallest language code (deterministic and
    SQL-replicable via ROW_NUMBER ... ORDER BY score DESC, lang ASC).
    """
    text = pc.utf8_lower(batch[text_col])
    langs = sorted(LANG_MARKERS)
    counts = np.stack([
        pc.count_substring_regex(text, LANG_MARKERS[lang])
        .to_numpy(zero_copy_only=False).astype(np.int64)
        for lang in langs
    ])  # shape (n_langs, n_rows)
    best = np.argmax(counts, axis=0)  # first (lang-asc) max — the tie-break
    pred = np.asarray(langs, dtype=object)[best]
    return batch.append_column("predicted_lang", pa.array(pred, pa.string()))


def add_token_count(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Token count per row: non-empty runs of [a-z0-9] after lowercasing
    (the same SPLIT class as the code tokenizer, without camel splitting,
    so it is exactly replicable in SQL)."""
    text = pc.utf8_lower(batch[text_col])
    n = pc.count_substring_regex(text, r"[a-z0-9]+")
    return batch.append_column("n_tokens", pc.cast(n, pa.int64()))


def add_quality(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality-scoring features: alpha ratio, digit ratio, stopword ratio,
    average token length — all defined as exact, SQL-replicable ratios."""
    text = pc.utf8_lower(batch[text_col])
    n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.float64)
    n_alpha = pc.count_substring_regex(text, r"[a-z]").to_numpy(
        zero_copy_only=False).astype(np.float64)
    n_digit = pc.count_substring_regex(text, r"[0-9]").to_numpy(
        zero_copy_only=False).astype(np.float64)
    n_tok = pc.count_substring_regex(text, r"[a-z0-9]+").to_numpy(
        zero_copy_only=False).astype(np.float64)
    tok_chars = n_alpha + n_digit
    stop_pat = r"\b(" + "|".join(STOPWORDS) + r")\b"
    n_stop = pc.count_substring_regex(text, stop_pat).to_numpy(
        zero_copy_only=False).astype(np.float64)
    safe_chars = np.maximum(n_chars, 1.0)
    safe_tok = np.maximum(n_tok, 1.0)
    return (batch
            .append_column("alpha_ratio", pa.array(n_alpha / safe_chars))
            .append_column("digit_ratio", pa.array(n_digit / safe_chars))
            .append_column("stopword_ratio", pa.array(n_stop / safe_tok))
            .append_column("avg_token_len", pa.array(tok_chars / safe_tok)))


def add_fingerprint_minmd5(batch: pa.Table, text_col: str = "text",
                           shingle: int = 8) -> pa.Table:
    """Document fingerprint = min over all ``shingle``-char substrings of
    md5(substring) (hex string order). Deterministic, content-defined, and
    SQL-replicable (min(md5(substring(text, i, 8)))). Docs shorter than the
    shingle use the whole text."""
    out = []
    for t in batch[text_col].to_pylist():
        t = t or ""
        if len(t) <= shingle:
            out.append(hashlib.md5(t.encode("utf-8")).hexdigest())
            continue
        best = min(hashlib.md5(t[i:i + shingle].encode("utf-8")).hexdigest()
                   for i in range(len(t) - shingle + 1))
        out.append(best)
    return batch.append_column("fingerprint", pa.array(out, pa.string()))


def add_display(batch: pa.Table, text_col: str = "text",
                idx_col: str | None = None) -> pa.Table:
    """Multiline display normalizer (reference utils/general.py:44-61
    ``print_chunk_contents``): strip each entry, expand LITERAL two-char
    ``\\n`` escape sequences into real newlines, and prefix the
    reference's ``{idx:2d}: `` line number (1-based, from ``idx_col``
    when given else the row's position in the batch). All Arrow kernels
    — no Python loop — and SQL-replicable (printf('%2d', n), replace).
    """
    # explicit char set == Python str.strip()'s ASCII whitespace, so the
    # SQL oracle (trim(s, <same chars>)) matches byte-for-byte
    text = pc.utf8_trim(batch[text_col], " \t\n\r\x0b\x0c")
    text = pc.replace_substring(text, "\\n", "\n")
    if idx_col is not None:
        n = pc.cast(batch[idx_col], pa.int64())
    else:
        n = pa.array(np.arange(1, batch.num_rows + 1), pa.int64())
    digits = pc.cast(n, pa.string())
    # Python's %2d: one leading space for single-digit, none otherwise
    padded = pc.if_else(
        pc.and_(pc.greater_equal(n, 0), pc.less(n, 10)),
        pc.binary_join_element_wise(pa.array([" "] * len(digits)), digits,
                                    ""),
        digits)
    disp = pc.binary_join_element_wise(padded, text, ": ")
    return batch.append_column("display", disp)


_ROLL_BASE = np.uint64(1099511628211)
_ROLL_MOD_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)  # mod 2^64 via wraparound


def add_fingerprint_rolling(batch: pa.Table, text_col: str = "text",
                            shingle: int = 8) -> pa.Table:
    """Rolling polynomial (Rabin-style) fingerprint, numpy-vectorized: the
    minimum of all window hashes mod 2^64 — the scale path (O(n) per doc,
    no per-window md5). Rows-only correctness check (not SQL-expressible).
    """
    fps = np.empty(batch.num_rows, dtype=np.uint64)
    b = _ROLL_BASE
    # b is odd → invertible mod 2^64; window hashes come from prefix sums of
    # data[m] * b^-(m+1), rescaled by b^(j+1) at each window end j.
    binv = np.uint64(pow(int(b), -1, 1 << 64))
    for i, t in enumerate(batch[text_col].to_pylist()):
        data = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8
                             ).astype(np.uint64)
        if data.size == 0:
            fps[i] = np.uint64(0)
            continue
        if data.size <= shingle:
            h = np.uint64(0)
            with np.errstate(over="ignore"):
                for c in data:
                    h = h * b + c
            fps[i] = h
            continue
        powers = np.ones(data.size, dtype=np.uint64)
        np.multiply.accumulate(np.full(data.size, b, dtype=np.uint64),
                               out=powers)  # powers[j] = b^(j+1)
        binv_pows = np.ones(data.size, dtype=np.uint64)
        np.multiply.accumulate(
            np.full(data.size, binv, dtype=np.uint64), out=binv_pows)
        # s[j] = sum_{m<=j} data[m] * b^-(m+1)  (mod 2^64, wrapping)
        s = np.cumsum(data * binv_pows, dtype=np.uint64)
        # window ending at j (start l=j-K+1):
        #   h = (s[j] - s[l-1]) * b^(j+1) = sum data[m] * b^(j-m)
        K = shingle
        j = np.arange(K - 1, data.size, dtype=np.int64)
        seg = s[j].copy()
        seg[1:] -= s[j[1:] - K]
        win = seg * powers[j]
        fps[i] = win.min()
    return batch.append_column(
        "fingerprint_rolling",
        pa.array(fps.astype(np.uint64), pa.uint64()))
