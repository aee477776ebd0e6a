"""Okapi BM25 scoring + the single-process pure-Python oracle engine.

The oracle is the stand-in for the reference's query backend: the reference
indexes into Elasticsearch and lets Lucene rank (reference
core/elasticsearch.py:321-325); we reproduce Lucene-style BM25 here as a
deliberately naive, obviously-correct implementation. Every query in the
test set must return **rank-identical (doc_id, score)** lists from the Ray
engine vs this oracle (BASELINE.md "rank correctness").

Determinism contract (both engines follow it exactly):
- float64 everywhere;
- idf = ln(1 + (N - df + 0.5) / (df + 0.5))           (Lucene BM25Similarity)
- tf_norm = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
- a query's UNIQUE terms are scored once each, summed in sorted-term order;
- tie-break (score desc, doc_id asc).
"""

from __future__ import annotations

import math

from ..analysis.tokenizer import tokenize_py
from ..config import IndexConfig


def bm25_idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_tf_norm(tf: float, dl: float, avgdl: float, k1: float, b: float) -> float:
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


class BM25Oracle:
    """Naive in-memory inverted index + exhaustive BM25 scoring.

    ``docs`` is an iterable of ``(doc_id, content)``; ``attrs`` optionally
    maps doc_id -> dict of filterable fields (e.g. {"lang": "python",
    "repo": "org1/repo3"}) mirroring the Kibana keyword filters the
    reference dashboards use (SURVEY.md §1.2).
    """

    def __init__(self, docs, attrs: dict | None = None,
                 cfg: IndexConfig | None = None):
        cfg = cfg or IndexConfig()
        self.k1, self.b = cfg.k1, cfg.b
        self.max_token_len = cfg.max_token_len
        self.stop_words = frozenset(cfg.stop_words)
        self.stem = cfg.stem
        self.postings: dict[str, dict[int, int]] = {}
        self.doc_len: dict[int, int] = {}
        self.attrs = attrs or {}
        for doc_id, content in docs:
            toks = self._analyze(content)
            self.doc_len[doc_id] = len(toks)
            tf: dict[str, int] = {}
            for t in toks:
                tf[t] = tf.get(t, 0) + 1
            for t, c in tf.items():
                self.postings.setdefault(t, {})[doc_id] = c
        self.n_docs = len(self.doc_len)
        total = sum(self.doc_len.values())
        self.avgdl = (total / self.n_docs) if self.n_docs else 0.0

    def _analyze(self, text: str) -> list[str]:
        """The cfg-driven content analyzer chain (tokenize → stop →
        stem), mirroring the distributed build exactly."""
        toks = tokenize_py(text, self.max_token_len)
        if self.stop_words:
            toks = [t for t in toks if t not in self.stop_words]
        if self.stem:
            from ..analysis.tokenizer import _STEMMERS

            fn = _STEMMERS[self.stem]
            toks = [fn(t) for t in toks]
        return toks

    def search(self, text: str, k: int = 10,
               filters: dict[str, str] | None = None) -> list[tuple[int, float]]:
        terms = sorted(set(self._analyze(text)))
        scores: dict[int, float] = {}
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            idf = bm25_idf(self.n_docs, len(plist))
            for doc_id, tf in plist.items():
                s = idf * bm25_tf_norm(
                    float(tf), float(self.doc_len[doc_id]), self.avgdl,
                    self.k1, self.b)
                scores[doc_id] = scores.get(doc_id, 0.0) + s
        if filters:
            scores = {d: s for d, s in scores.items()
                      if all(self.attrs.get(d, {}).get(f) == v
                             for f, v in filters.items())}
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
