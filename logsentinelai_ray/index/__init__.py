from .codec import decode_varint, encode_varint  # noqa: F401
