"""Per-stripe bloom filters for string/binary columns.

Mirrors the reference's Utf8 bloom scheme (reference:
pkg/store/metadata/BloomFilter.go:26-49 — double hashing h1 + i*h2
over an m-bit set, k = optimal for fpp, default fpp 0.05 from
MothWriterOptions.go:11). Divergence: the reference hashes with a
Murmur3-128 variant; we use a deterministic vectorized 64-bit mix
(splitmix64 over first/middle/last 8 bytes + length) so millions of
values hash without a per-value Python loop. Both ends use the same
function, and bloom filters are advisory (false positives allowed), so
this preserves semantics at fpp ~= the configured value.

Layout: 16-byte header (num_bits: uint64 LE, k: uint64 LE) + bitset.
"""

from __future__ import annotations

import math

import numpy as np

_U64 = np.uint64
DEFAULT_FPP = 0.05

_C1 = _U64(0xBF58476D1CE4E5B9)
_C2 = _U64(0x94D049BB133111EB)
_C3 = _U64(0x9E3779B97F4A7C15)


def _mix(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> _U64(30))) * _C1
    x = (x ^ (x >> _U64(27))) * _C2
    return x ^ (x >> _U64(31))


def hash_bytes_columns(lengths: np.ndarray, data: np.ndarray) -> np.ndarray:
    """64-bit hash per value of a concatenated byte buffer.

    Gathers the first 8, middle 8 and last 8 bytes of each value (a
    value shorter than 8 bytes contributes zero-padded windows) plus
    the length, mixed with splitmix64 — one vectorized pass.
    """
    n = len(lengths)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lengths = lengths.astype(np.int64, copy=False)
    offs = np.concatenate(([0], np.cumsum(lengths)))
    # pad buffer so 8-byte gathers never run off the end
    buf = np.concatenate([data.astype(np.uint8, copy=False), np.zeros(8, dtype=np.uint8)])

    starts = offs[:-1]
    ends = np.maximum(offs[1:] - 8, starts)
    mids = starts + np.maximum((lengths - 8) // 2, 0)

    def _gather_u64(pos: np.ndarray) -> np.ndarray:
        # little-endian 8-byte window per position via 8 value-sized
        # gathers — O(n_values), NOT a window view over the whole
        # buffer (which would materialize 8x the corpus bytes)
        acc = buf[pos].astype(np.uint64)
        for j in range(1, 8):
            acc |= buf[pos + j].astype(np.uint64) << _U64(8 * j)
        return acc

    first = _gather_u64(starts)
    last = _gather_u64(ends)
    mid = _gather_u64(mids)
    # mask values shorter than 8 bytes down to their real bytes
    short = lengths < 8
    if short.any():
        shift = _U64(8) * (np.maximum(8 - lengths[short], 0)).astype(np.uint64)
        keep = np.where(lengths[short] > 0, (_U64(1) << (_U64(8) * lengths[short].astype(np.uint64))) - _U64(1), _U64(0))
        first = first.copy()
        last = last.copy()
        mid = mid.copy()
        first[np.nonzero(short)[0]] &= keep
        last[np.nonzero(short)[0]] &= keep
        mid[np.nonzero(short)[0]] &= keep
        del shift
    h = _mix(first ^ _C3)
    h = _mix(h ^ mid)
    h = _mix(h ^ last)
    return _mix(h ^ lengths.astype(np.uint64))


def build(lengths: np.ndarray, data: np.ndarray, fpp: float = DEFAULT_FPP) -> bytes:
    """Build a bloom filter over the values of a concatenated buffer."""
    n = max(len(lengths), 1)
    num_bits = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    num_bits = (num_bits + 63) // 64 * 64
    k = max(1, round(num_bits / n * math.log(2)))
    bits = np.zeros(num_bits // 8, dtype=np.uint8)
    h = hash_bytes_columns(lengths, data)
    h1 = h % _U64(num_bits)
    h2 = (_mix(h ^ _C2) % _U64(num_bits - 1)) + _U64(1)  # never 0 -> all k probes distinct mod m
    for i in range(k):
        idx = (h1 + _U64(i) * h2) % _U64(num_bits)
        np.bitwise_or.at(bits, (idx >> _U64(3)).astype(np.int64), (np.uint8(1) << (idx & _U64(7)).astype(np.uint8)))
    header = int(num_bits).to_bytes(8, "little") + int(k).to_bytes(8, "little")
    return header + bits.tobytes()


def might_contain(bloom: bytes, values: list[bytes | str]) -> np.ndarray:
    """Vectorized membership test. Returns bool array per value."""
    num_bits = int.from_bytes(bloom[0:8], "little")
    k = int.from_bytes(bloom[8:16], "little")
    bits = np.frombuffer(bloom, dtype=np.uint8, offset=16)
    bs = [v.encode() if isinstance(v, str) else bytes(v) for v in values]
    lengths = np.array([len(b) for b in bs], dtype=np.int64)
    data = np.frombuffer(b"".join(bs), dtype=np.uint8)
    h = hash_bytes_columns(lengths, data)
    h1 = h % _U64(num_bits)
    h2 = (_mix(h ^ _C2) % _U64(num_bits - 1)) + _U64(1)
    out = np.ones(len(bs), dtype=bool)
    for i in range(k):
        idx = (h1 + _U64(i) * h2) % _U64(num_bits)
        out &= (bits[(idx >> _U64(3)).astype(np.int64)] & (np.uint8(1) << (idx & _U64(7)).astype(np.uint8))) != 0
    return out


def params_for(n: int, fpp: float = DEFAULT_FPP) -> tuple[int, int]:
    """(num_bits, k) for an expected n values at fpp — split out of
    build() so DISTRIBUTED construction can fix the geometry up front
    and OR per-batch partials together (same formulas as build, so
    single-pass and distributed blooms are bit-identical)."""
    n = max(n, 1)
    num_bits = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    num_bits = (num_bits + 63) // 64 * 64
    k = max(1, round(num_bits / n * math.log(2)))
    return num_bits, k


def partial_bits(lengths: np.ndarray, data: np.ndarray, num_bits: int, k: int) -> np.ndarray:
    """Headerless bit array for one batch of values; union = bitwise
    OR, so partials merge exactly on the driver."""
    bits = np.zeros(num_bits // 8, dtype=np.uint8)
    if len(lengths):
        h = hash_bytes_columns(lengths, data)
        h1 = h % _U64(num_bits)
        h2 = (_mix(h ^ _C2) % _U64(num_bits - 1)) + _U64(1)
        for i in range(k):
            idx = (h1 + _U64(i) * h2) % _U64(num_bits)
            np.bitwise_or.at(
                bits,
                (idx >> _U64(3)).astype(np.int64),
                (np.uint8(1) << (idx & _U64(7)).astype(np.uint8)),
            )
    return bits


def assemble(bits: np.ndarray, num_bits: int, k: int) -> bytes:
    return int(num_bits).to_bytes(8, "little") + int(k).to_bytes(8, "little") + bits.tobytes()


def might_contain_buffers(bloom: bytes, lengths: np.ndarray, data: np.ndarray) -> np.ndarray:
    """might_contain without the per-value Python encode loop — takes
    the (lengths, concatenated-bytes) view an Arrow string column
    already has (the hot-path form for join prefilters)."""
    num_bits = int.from_bytes(bloom[0:8], "little")
    k = int.from_bytes(bloom[8:16], "little")
    bits = np.frombuffer(bloom, dtype=np.uint8, offset=16)
    h = hash_bytes_columns(lengths, data)
    h1 = h % _U64(num_bits)
    h2 = (_mix(h ^ _C2) % _U64(num_bits - 1)) + _U64(1)
    out = np.ones(len(lengths), dtype=bool)
    for i in range(k):
        idx = (h1 + _U64(i) * h2) % _U64(num_bits)
        out &= (bits[(idx >> _U64(3)).astype(np.int64)] & (np.uint8(1) << (idx & _U64(7)).astype(np.uint8))) != 0
    return out
