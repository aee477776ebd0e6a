from .bm25 import BM25Oracle, bm25_idf, bm25_tf_norm  # noqa: F401
