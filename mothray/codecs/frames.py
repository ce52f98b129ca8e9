"""General-purpose block compression for encoded streams.

Mirrors the reference's stream compression layer (reference:
pkg/store/MothOutputBuffer.go:348-371 and the Snappy/Deflate/Lz4/Zstd
compressor pairs): every encoded stream is run through a
general-purpose codec and the raw bytes are kept whenever compression
does not shrink them ("store raw" rule, MothOutputBuffer.go:358-369).

Divergence: the reference frames 256KB chunks with a 3-byte
`(len<<1|isOriginal)` header because its streams are incrementally
consumed; our streams are independently small binary cells inside an
Arrow row, so the frame is one flag byte + payload and the raw length
travels in the stream index (no chunking needed).

Codecs come from pyarrow.Codec (zlib/zstd/lz4/snappy/brotli) — no
extra native deps.
"""

from __future__ import annotations

import zlib

import pyarrow as pa

RAW = 0
COMPRESSED = 1

_DEFAULT_LEVELS = {"zstd": 3, "gzip": 6, "brotli": 4}


def _codec(name: str) -> pa.Codec:
    level = _DEFAULT_LEVELS.get(name)
    return pa.Codec(name, compression_level=level) if level else pa.Codec(name)


def available_codecs() -> list[str]:
    out = []
    for name in ("zstd", "zlib", "gzip", "lz4", "snappy", "brotli"):
        try:
            if name == "zlib" or pa.Codec.is_available(name):
                out.append(name)
        except Exception:
            pass
    return out


def compress_parts(data, codec: str = "zstd", min_ratio: float = 1.0) -> tuple[int, object]:
    """(flag byte, payload) — payload is the input object itself when
    stored raw (NO copy; callers concatenate flag and payload
    separately). Keeps the input raw when the codec fails to shrink it
    by at least `min_ratio`, the reference's store-raw rule."""
    if codec in ("none", None) or len(data) == 0:
        return RAW, data
    if codec == "zlib":
        comp = zlib.compress(data, 6)
    else:
        comp = _codec(codec).compress(data, asbytes=True)
    if len(comp) + 1 < len(data) / max(min_ratio, 1.0):
        return COMPRESSED, comp
    return RAW, data


def compress(data: bytes, codec: str = "zstd", min_ratio: float = 1.0) -> bytes:
    """One-shot framed stream: flag byte + payload (copies; prefer
    compress_parts on hot paths)."""
    flag, payload = compress_parts(data, codec, min_ratio)
    return bytes([flag]) + bytes(payload)


def decompress(framed, codec: str, raw_size: int):
    """Accepts any buffer (memoryview slices stay zero-copy for the
    raw path). Returns a bytes-like."""
    flag = framed[0]
    payload = framed[1:] if isinstance(framed, (bytes, memoryview)) else bytes(framed)[1:]
    if flag == RAW:
        return payload
    if codec == "zlib":
        return zlib.decompress(payload)
    return _codec(codec).decompress(payload, decompressed_size=raw_size, asbytes=True)
