"""Code-aware tokenizer — the engine's "analyzer" (ES terminology).

The reference leans on Elasticsearch's analyzers for its keyword/full-text
fields (everything Kibana queries, see SURVEY.md §1.2); our from-scratch
engine needs its own. Per BASELINE.json north_star the analyzer is
*code-aware*: camelCase / snake_case identifier splitting, lowercase,
alphanumeric tokens.

Two implementations with IDENTICAL semantics (rank-identity between the
distributed engine and the pure-Python oracle depends on it — both are
covered by the same golden tests):

- ``tokenize_py``          : pure Python ``re`` — used by the BM25 oracle and
                             for query strings (tiny inputs).
- ``tokenize_batch_arrow`` : vectorized RE2 kernels (``pyarrow.compute``) —
                             used inside ``map_batches`` on zero-copy Arrow
                             batches. Never loops over Python rows.

Pipeline (applied in this exact order in both implementations):
  1. acronym boundary   : ``([A-Z]+)([A-Z][a-z])`` → ``\\1 \\2``  (HTTPServer → HTTP Server)
  2. camel boundary     : ``([a-z0-9])([A-Z])``    → ``\\1 \\2``  (parseHttp → parse Http)
  3. lowercase
  4. split on ``[^a-z0-9]+`` (snake_case, paths, punctuation all split), drop
     empty tokens, truncate tokens to ``max_token_len`` chars.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

CAMEL2 = r"([A-Z]+)([A-Z][a-z])"  # acronym→word boundary (applied first)
CAMEL1 = r"([a-z0-9])([A-Z])"  # lower/digit→upper boundary
SPLIT = r"[^a-z0-9]+"

_CAMEL2_RE = re.compile(CAMEL2)
_CAMEL1_RE = re.compile(CAMEL1)
_SPLIT_RE = re.compile(SPLIT)


def tokenize_py(text: str, max_token_len: int = 64) -> list[str]:
    """Reference (oracle) tokenizer. One string → list of tokens."""
    t = _CAMEL2_RE.sub(r"\1 \2", text)
    t = _CAMEL1_RE.sub(r"\1 \2", t)
    t = t.lower()
    return [tok[:max_token_len] for tok in _SPLIT_RE.split(t) if tok]


def tokenize_batch_arrow(
    content: pa.Array | pa.ChunkedArray, max_token_len: int = 64
) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """Vectorized batch tokenizer.

    Returns ``(row_idx, token, doc_len)`` where ``row_idx`` (int64 ndarray)
    maps each token occurrence back to its row in the input batch, ``token``
    is a flat Arrow string array (one entry per occurrence, NOT deduplicated),
    and ``doc_len`` (int64 ndarray, len == batch rows) is the token count per
    row (the BM25 document length).

    All heavy lifting is RE2/C++: two regex replaces, a lowercase, a regex
    split into a ListArray, then offset arithmetic with numpy.
    """
    if isinstance(content, pa.ChunkedArray):
        content = content.combine_chunks()
    n = len(content)
    t = pc.replace_substring_regex(content, pattern=CAMEL2, replacement=r"\1 \2")
    t = pc.replace_substring_regex(t, pattern=CAMEL1, replacement=r"\1 \2")
    t = pc.utf8_lower(t)
    lists = pc.split_pattern_regex(t, pattern=SPLIT)
    # Null-safety: treat null content as zero tokens.
    if lists.null_count:
        lists = pc.fill_null(lists, [])
    lists = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
    offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = lists.flatten()
    row_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
    # Drop empty tokens (split artifacts at string boundaries).
    keep = pc.not_equal(pc.utf8_length(flat), 0)
    keep_np = keep.to_numpy(zero_copy_only=False)
    flat = flat.filter(keep)
    row_idx = row_idx[keep_np]
    flat = pc.utf8_slice_codeunits(flat, 0, max_token_len)
    doc_len = np.bincount(row_idx, minlength=n).astype(np.int64)
    return row_idx, flat, doc_len
