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


# ------------------------------------------------------- trigram blooms
# Substring predicates (LIKE '%needle%') get no help from zone maps or
# the whole-value bloom above. A per-stripe bloom over the column's
# DISTINCT byte trigrams gives them a pruning surface: a stripe can
# contain `needle` only if every trigram of `needle` is present
# (classic trigram-index contract, e.g. PostgreSQL pg_trgm /
# Google Code Search). False positives cost a read; false negatives
# are impossible because every trigram of every value is inserted.

_TRI_FPP = 0.02


def _trigram_codes(lengths: np.ndarray, data: np.ndarray) -> np.ndarray:
    """Distinct byte-trigram codes (b0 | b1<<8 | b2<<16) across the
    values of a concatenated buffer. One sliding-window pass over the
    whole buffer (three shifted gathers), windows that straddle a
    value boundary masked out by scattering at the two positions
    before each value end; dedup is a dense boolean scatter over the
    2^24 code space (one 16 MB temp, no sort) — O(total_bytes) with
    no per-trigram index arrays."""
    d = data
    if len(d) < 3:
        return np.empty(0, dtype=np.uint32)
    from .codecs import _trigram_native

    native = _trigram_native.trigram_distinct(lengths, d)
    if native is not None:
        return np.sort(native)  # deterministic bloom bytes either path
    codes = (
        d[:-2].astype(np.uint32)
        | (d[1:-1].astype(np.uint32) << np.uint32(8))
        | (d[2:].astype(np.uint32) << np.uint32(16))
    )
    valid = np.ones(len(codes), dtype=bool)
    ends = np.cumsum(lengths.astype(np.int64, copy=False))
    for delta in (1, 2):
        bad = ends - delta
        bad = bad[(bad >= 0) & (bad < len(codes))]
        valid[bad] = False
    seen = np.zeros(1 << 24, dtype=bool)
    seen[codes[valid]] = True
    return np.nonzero(seen)[0].astype(np.uint32)


def _codes_to_buffers(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(lengths, data) of the 3-byte values the codes stand for, in the
    form hash_bytes_columns takes — so build/probe share one hash."""
    tri = np.empty((len(codes), 3), dtype=np.uint8)
    tri[:, 0] = codes & 0xFF
    tri[:, 1] = (codes >> np.uint32(8)) & np.uint32(0xFF)
    tri[:, 2] = (codes >> np.uint32(16)) & np.uint32(0xFF)
    return np.full(len(codes), 3, dtype=np.int64), tri.ravel()


def build_trigrams(lengths: np.ndarray, data: np.ndarray, fpp: float = _TRI_FPP) -> bytes:
    """Bloom filter over the distinct byte trigrams of a string
    column's values (same header/double-hash layout as build())."""
    codes = _trigram_codes(lengths, data)
    tl, td = _codes_to_buffers(codes)
    return build(tl, td, fpp)


def might_contain_substring(bloom: bytes, needle: str | bytes) -> bool:
    """False -> NO value in the stripe can contain `needle` (some
    trigram of the needle is definitively absent). Needles shorter
    than 3 bytes cannot be tested (always True, conservative)."""
    nb = needle.encode() if isinstance(needle, str) else bytes(needle)
    if len(nb) < 3:
        return True
    arr = np.frombuffer(nb, dtype=np.uint8)
    codes = (
        arr[:-2].astype(np.uint32)
        | (arr[1:-1].astype(np.uint32) << np.uint32(8))
        | (arr[2:].astype(np.uint32) << np.uint32(16))
    )
    tl, td = _codes_to_buffers(np.unique(codes))
    return bool(might_contain_buffers(bloom, tl, td).all())
