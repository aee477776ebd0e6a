from .knn import cosine_topk_bruteforce, cosine_topk_lsh, embedding_dupes  # noqa: F401
