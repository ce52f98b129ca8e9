from . import bitpack, boolrle, byterle, frames, rlev2, timestamp, varint  # noqa: F401
