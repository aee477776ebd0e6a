from .tokenizer import (  # noqa: F401
    CAMEL1,
    CAMEL2,
    SPLIT,
    tokenize_batch_arrow,
    tokenize_py,
)
