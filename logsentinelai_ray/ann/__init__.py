from .knn import (  # noqa: F401
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_lsh,
    embedding_dupes,
    ivf_centroids,
)
