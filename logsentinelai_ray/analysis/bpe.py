"""Distributed BPE merge learning (byte-pair-encoding tokenizer
training — Sennrich et al. 2016) over the corpus word-frequency table.

The split of labor is the standard industrial one (what tokenizer
trainers do over corpus-scale text): the CORPUS-sized work — tokenize +
count word frequencies — runs distributed (vectorized ``map_batches``
partial counts, then one ``groupby(word).sum`` whose output is the
word-TYPE table, Zipf-compressed to a tiny fraction of the corpus);
the merge LOOP runs on that aggregated table (size = vocabulary, not
corpus) with numpy over flattened symbol arrays. At 10^12 docs the type
table is ~10^8-10^9 rows — cap it with ``max_types`` (keep the most
frequent types; rare singleton types contribute negligible pair mass,
the same truncation HF/SentencePiece trainers apply via their
vocabulary pre-filters).

Semantics (mirrored exactly by the pure-Python reference
``learn_bpe_reference`` used in tests):
  words     = non-empty runs of [a-z0-9] in lower(text)  (shared class)
  symbols   = initially the word's characters (no end-of-word marker)
  each round: count adjacent symbol pairs weighted by word frequency,
  merge the most frequent pair (ties: lexicographically smallest
  (left, right)), repeat ``n_merges`` times.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def word_frequencies(ds, text_col: str = "text"):
    """Distributed (word, freq) table: per-batch partial counts (an
    Arrow group_by inside ``map_batches``) so only (word, partial-count)
    rows cross the one shuffle."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        text = pc.utf8_lower(t[text_col])
        lists = pc.split_pattern_regex(text, pattern="[^a-z0-9]+")
        flat = pc.list_flatten(lists)
        flat = pc.filter(flat, pc.not_equal(flat, ""))
        out = pa.table({"word": flat}).group_by("word").aggregate(
            [("word", "count")])
        return out.rename_columns(["word", "n_part"])

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("word").aggregate(Sum("n_part", alias_name="freq")))


def _merge_loop(words: list[str], freqs: np.ndarray,
                n_merges: int) -> list[tuple[str, str, int]]:
    """The BPE loop over the aggregated type table — vocabulary-sized
    work (a dict pass per round over word TYPES weighted by frequency),
    never corpus-sized; the corpus was reduced to (word, freq) upstream.
    """
    syms: list[list[str]] = [list(w) for w in words]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pair_count: dict[tuple[str, str], int] = {}
        for s, f in zip(syms, freqs):
            f = int(f)
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                pair_count[p] = pair_count.get(p, 0) + f
        if not pair_count:
            break
        # tie-break: highest count, then lexicographically SMALLEST pair
        best_count = max(pair_count.values())
        cands = [p for p, c in pair_count.items() if c == best_count]
        left, right = min(cands)
        merges.append((left, right, best_count))
        tok = left + right
        for s in syms:
            i = 0
            while i < len(s) - 1:
                if s[i] == left and s[i + 1] == right:
                    s[i:i + 2] = [tok]
                else:
                    i += 1
    return merges


def learn_bpe(ds, text_col: str = "text", n_merges: int = 10,
              max_types: int | None = 2_000_000) -> pa.Table:
    """Learn ``n_merges`` BPE merges; returns (rank, left, right,
    pair_count) — rank 0 is the first merge learned."""
    wf = word_frequencies(ds, text_col)
    if max_types is not None:
        # keep the most frequent types (deterministic ties by word):
        # Zipf-tail singletons carry negligible pair mass
        wf = wf.sort(["freq", "word"], descending=[True, False]) \
            .limit(max_types)
    parts = list(wf.iter_batches(batch_format="pyarrow",
                                 batch_size=1 << 20))
    if parts:
        t = pa.concat_tables(parts)
        words = t["word"].to_pylist()
        freqs = t["freq"].to_numpy(zero_copy_only=False)
    else:
        words, freqs = [], np.empty(0, np.int64)
    merges = _merge_loop(words, freqs, n_merges)
    return pa.table({
        "rank": pa.array(range(len(merges)), pa.int64()),
        "left": pa.array([m[0] for m in merges], pa.string()),
        "right": pa.array([m[1] for m in merges], pa.string()),
        "pair_count": pa.array([m[2] for m in merges], pa.int64())})


def learn_bpe_reference(texts: list[str], n_merges: int
                        ) -> list[tuple[str, str, int]]:
    """Single-process brute-force reference (tests): same semantics
    straight from raw texts, no aggregation shortcuts."""
    import re

    freqs: dict[str, int] = {}
    for t in texts:
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            freqs[w] = freqs.get(w, 0) + 1
    words = sorted(freqs)
    return _merge_loop(words, np.array([freqs[w] for w in words]),
                       n_merges)


def encode_word(word: str, ranks: dict[tuple[str, str], int]
                ) -> list[str]:
    """Apply learned merges to one word, lowest rank first (the standard
    BPE inference loop — HF tokenizers' ``bpe()``)."""
    syms = list(word)
    while len(syms) > 1:
        best, bi = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best, bi = r, i
        if best is None:
            break
        syms[bi:bi + 2] = [syms[bi] + syms[bi + 1]]
    return syms


class BPEEncoder:
    """Actor-pool encode stage: merge ranks broadcast once (ray.put in
    the driver, ``ray.get`` in ``__init__`` — once per actor, not per
    batch), per-worker memo of word-type encodings. Per batch the
    corpus-sized work is the Arrow word count; the Python loop runs over
    word TYPES only (Zipf-compressed, exactly like the trainer)."""

    def __init__(self, ranks_ref, text_col: str = "text"):
        import ray

        self.ranks = ray.get(ranks_ref)
        self.text_col = text_col
        self.memo: dict[str, list[str]] = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        text = pc.utf8_lower(t[self.text_col])
        lists = pc.split_pattern_regex(text, pattern="[^a-z0-9]+")
        flat = pc.list_flatten(lists)
        flat = pc.filter(flat, pc.not_equal(flat, ""))
        wc = pa.table({"word": flat}).group_by("word").aggregate(
            [("word", "count")])
        counts: dict[str, int] = {}
        for w, c in zip(wc["word"].to_pylist(),
                        wc["word_count"].to_pylist()):
            toks = self.memo.get(w)
            if toks is None:
                toks = encode_word(w, self.ranks)
                self.memo[w] = toks
            for tok in toks:
                counts[tok] = counts.get(tok, 0) + c
        return pa.table({
            "token": pa.array(list(counts), pa.string()),
            "n_part": pa.array(list(counts.values()), pa.int64())})


def encode_token_counts(ds, merges: pa.Table, text_col: str = "text",
                        k: int = 20) -> pa.Table:
    """Corpus token counts under the learned merges: actor-pool encode →
    one (token) groupby — only (token, partial-count) rows cross the
    shuffle. Returns top-k by (count desc, token asc)."""
    import ray
    from ray.data.aggregate import Sum

    ranks = {(lt, rt): i for i, (lt, rt) in
             enumerate(zip(merges["left"].to_pylist(),
                           merges["right"].to_pylist()))}
    ref = ray.put(ranks)
    out = (ds.map_batches(BPEEncoder, fn_constructor_args=(ref,),
                          fn_constructor_kwargs={"text_col": text_col},
                          batch_format="pyarrow", concurrency=(1, 4))
           .groupby("token").aggregate(Sum("n_part", alias_name="n"))
           .to_pandas())
    out = out.sort_values(["n", "token"],
                          ascending=[False, True]).head(k)
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


class BPEFertilityPartial:
    """Actor-pool stage for tokenizer-fertility evaluation: per batch,
    per group (e.g. lang), the total BPE token count and total word
    characters — the two integers behind tokens-per-char fertility.
    Same broadcast ranks + per-worker word-type memo as BPEEncoder;
    the memo here stores only each word type's TOKEN COUNT."""

    def __init__(self, ranks_ref, group_col: str = "lang",
                 text_col: str = "text"):
        import ray

        self.ranks = ray.get(ranks_ref)
        self.group_col = group_col
        self.text_col = text_col
        self.memo: dict[str, int] = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        text = pc.utf8_lower(t[self.text_col])
        lists = pc.split_pattern_regex(text, pattern="[^a-z0-9]+")
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        keep = pc.not_equal(flat, "")
        flat = pc.filter(flat, keep)
        parent = pc.filter(parent, keep)
        groups = pc.take(t[self.group_col], parent)
        wc = (pa.table({"g": groups, "word": flat})
              .group_by(["g", "word"]).aggregate([("word", "count")]))
        toks: dict[str, int] = {}
        chars: dict[str, int] = {}
        for g, w, c in zip(wc["g"].to_pylist(),
                           wc["word"].to_pylist(),
                           wc["word_count"].to_pylist()):
            nt = self.memo.get(w)
            if nt is None:
                nt = len(encode_word(w, self.ranks))
                self.memo[w] = nt
            toks[g] = toks.get(g, 0) + nt * c
            chars[g] = chars.get(g, 0) + len(w) * c
        gs = sorted(toks)
        return pa.table({
            "g": pa.array(gs, pa.string()),
            "p_toks": pa.array([toks[g] for g in gs], pa.int64()),
            "p_chars": pa.array([chars[g] for g in gs], pa.int64())})


def fertility_by_group(ds, merges: pa.Table, group_col: str = "lang",
                       text_col: str = "text") -> pa.Table:
    """Per-group tokenizer fertility under the learned merges:
    (group, n_tokens, n_chars, fertility = tokens/char). Mergeable
    integer partials; the final division is one exact-int chain per
    group evaluated once on the tiny grouped table."""
    import ray
    from ray.data.aggregate import Sum

    ranks = {(lt, rt): i for i, (lt, rt) in
             enumerate(zip(merges["left"].to_pylist(),
                           merges["right"].to_pylist()))}
    ref = ray.put(ranks)
    out = (ds.map_batches(
        BPEFertilityPartial, fn_constructor_args=(ref,),
        fn_constructor_kwargs={"group_col": group_col,
                               "text_col": text_col},
        batch_format="pyarrow", concurrency=(1, 4))
        .groupby("g")
        .aggregate(Sum("p_toks", alias_name="n_tokens"),
                   Sum("p_chars", alias_name="n_chars"))
        .to_pandas())
    out = out.sort_values("g").reset_index(drop=True)
    out["n_tokens"] = out["n_tokens"].astype("int64")
    out["n_chars"] = out["n_chars"].astype("int64")
    out["fertility"] = [float(a) / float(b) if b else 0.0
                        for a, b in zip(out["n_tokens"],
                                        out["n_chars"])]
    out = out.rename(columns={"g": group_col})
    return pa.Table.from_pandas(out, preserve_index=False)
