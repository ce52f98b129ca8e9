"""Boolean stream: MSB-first bit-packing layered on byte RLE.

Mirrors the reference's BooleanOutputStream/BooleanInputStream
(reference: pkg/store/BooleanOutputStream.go:36-125) — 8 booleans per
byte, first value in the most significant bit, the packed bytes then
byte-RLE compressed — via np.packbits/np.unpackbits (both MSB-first by
default) plus the byterle codec. Used for the DATA stream of boolean
columns and for PRESENT (validity) streams.
"""

from __future__ import annotations

import numpy as np

from . import byterle


def encode(values: np.ndarray) -> bytes:
    """values: bool/uint8 array -> byte-RLE'd bitpacked bytes."""
    bits = np.ascontiguousarray(values, dtype=np.uint8)
    packed = np.packbits(bits)  # MSB-first, zero-padded tail
    return byterle.encode(packed)


def decode(data, count: int, offset: int = 0):
    """Returns (bool array of `count` values, bytes consumed)."""
    nbytes = (count + 7) // 8
    packed, consumed = byterle.decode(data, nbytes, offset)
    bits = np.unpackbits(packed)[:count]
    return bits.astype(bool), consumed
