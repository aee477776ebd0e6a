from .binary import (  # noqa: F401
    BinaryFeatureExtractor,
    FrameSampler,
    ImageResizer,
    attach_binary_payload,
)
