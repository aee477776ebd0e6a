from .binary import BinaryFeatureExtractor, attach_binary_payload  # noqa: F401
