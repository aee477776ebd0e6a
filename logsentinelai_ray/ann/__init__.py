from .knn import (  # noqa: F401
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    cosine_topk_lsh,
    embedding_dupes,
    ivf_centroids,
    semdedup,
)
from .hnsw import (  # noqa: F401
    build_hnsw_index,
    hnsw_index_topk,
)
from .store import (  # noqa: F401
    append_ivf_index,
    append_lsh_index,
    build_ivf_index,
    build_lsh_index,
    ivf_index_probe_dirs,
    ivf_index_topk,
    lsh_index_probe_dirs,
    lsh_index_topk,
)
