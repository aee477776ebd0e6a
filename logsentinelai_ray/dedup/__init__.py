from .cluster import connected_components  # noqa: F401
from .exact import exact_dedup  # noqa: F401
from .jaccard import ngram_jaccard_pairs  # noqa: F401
from .minhash import minhash_lsh_dupes  # noqa: F401
from .simhash import simhash_dupes  # noqa: F401
