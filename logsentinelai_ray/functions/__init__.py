from .sketch import (  # noqa: F401
    hll_cardinality,
    hll_estimate,
    hll_merge,
    hll_sketch,
)
from .text import (  # noqa: F401
    LANG_MARKERS,
    STOPWORDS,
    add_fingerprint_minmd5,
    add_fingerprint_rolling,
    add_lang_id,
    add_quality,
    add_token_count,
)
