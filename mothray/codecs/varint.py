"""Vectorized LEB128 varints (unsigned + zigzag signed).

Semantics follow the ORC varint layer the reference uses for RLEv2
DELTA headers and decimal DATA streams (reference:
pkg/store/LongOutputStreamV2.go:531-544, pkg/store/LongDecode.go), but
the implementation is numpy-vectorized instead of per-value loops:
encode builds an (n, 10) byte matrix and masks it; decode gathers byte
columns per 7-bit group.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_MAX_BYTES = 10  # ceil(64 / 7)

# thresholds[i] = smallest value needing more than i+1 bytes
_THRESHOLDS = np.array([1 << (7 * k) for k in range(1, _MAX_BYTES)], dtype=np.object_)


def nbytes(values_u64: np.ndarray) -> np.ndarray:
    """Public alias: encoded byte length per value."""
    return _nbytes(values_u64.astype(np.uint64, copy=False))


def _nbytes(values_u64: np.ndarray) -> np.ndarray:
    """Bytes needed per value (1..10), vectorized."""
    nb = np.ones(len(values_u64), dtype=np.int64)
    for k in range(1, _MAX_BYTES):
        if k * 7 >= 64:
            break
        nb += (values_u64 >= _U64(1) << _U64(7 * k)).astype(np.int64)
    return nb


def encode_unsigned(values: np.ndarray) -> bytes:
    """LEB128-encode an array of non-negative ints (viewed as uint64)."""
    v = np.ascontiguousarray(values).astype(np.uint64, copy=True)
    n = len(v)
    if n == 0:
        return b""
    nb = _nbytes(v)
    out = np.zeros((n, _MAX_BYTES), dtype=np.uint8)
    work = v.copy()
    for i in range(_MAX_BYTES):
        out[:, i] = (work & _U64(0x7F)).astype(np.uint8)
        work >>= _U64(7)
    # continuation bit on all bytes except the last of each value
    cols = np.arange(_MAX_BYTES)
    mask = cols[None, :] < nb[:, None]
    cont = cols[None, :] < (nb - 1)[:, None]
    out[cont] |= 0x80
    return out[mask].tobytes()


def decode_unsigned(data: bytes | np.ndarray, count: int, offset: int = 0):
    """Decode `count` LEB128 values. Returns (uint64 array, bytes consumed)."""
    if count == 0:
        return np.empty(0, dtype=np.uint64), 0
    # cap the scan window at the max possible size so a decode of a few
    # values from a long stream stays O(count), not O(len(stream))
    window = count * _MAX_BYTES
    if isinstance(data, (bytes, bytearray, memoryview)):
        n_avail = min(window, len(data) - offset)
        b = np.frombuffer(data, dtype=np.uint8, count=n_avail, offset=offset)
    else:
        b = data[offset : offset + window]
    term = (b & 0x80) == 0
    ends = np.nonzero(term)[0]
    if len(ends) < count:
        raise ValueError("varint stream truncated")
    ends = ends[:count]
    starts = np.empty(count, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    group_len = ends - starts + 1
    vals = np.zeros(count, dtype=np.uint64)
    max_len = int(group_len.max())
    for i in range(max_len):
        sel = group_len > i
        idx = starts[sel] + i
        vals[sel] |= (b[idx].astype(np.uint64) & _U64(0x7F)) << _U64(7 * i)
    return vals, int(ends[-1] + 1)


_MAX_BYTES128 = 19  # ceil(128 / 7)


def encode_zigzag128(lo: np.ndarray, hi: np.ndarray) -> bytes:
    """Zigzag + LEB128 for 128-bit values given as little-endian limbs
    (lo: uint64, hi: int64 two's-complement high half). Byte-compatible
    with the scalar python-int encoding it replaces; fully vectorized
    ((n, 19) group matrix + mask select, like encode_unsigned)."""
    lo = np.ascontiguousarray(lo).astype(np.uint64, copy=False)
    hi_i = np.ascontiguousarray(hi).astype(np.int64, copy=False)
    n = len(lo)
    if n == 0:
        return b""
    hiu = hi_i.astype(np.uint64)
    s = (hi_i >> np.int64(63)).astype(np.uint64)  # sign mask (v >> 127)
    zlo = ((lo << _U64(1)) ^ s)
    zhi = (((hiu << _U64(1)) | (lo >> _U64(63))) ^ s)

    groups = np.zeros((n, _MAX_BYTES128), dtype=np.uint8)
    for k in range(_MAX_BYTES128):
        sh = 7 * k
        if sh < 64:
            g = zlo >> _U64(sh)
            if sh + 7 > 64:
                g = g | (zhi << _U64(64 - sh))
        else:
            g = zhi >> _U64(sh - 64)
        groups[:, k] = (g & _U64(0x7F)).astype(np.uint8)

    from . import bitpack

    bl = np.where(zhi != 0, bitpack.bit_width(zhi) + 64, bitpack.bit_width(zlo))
    nb = np.maximum((bl + 6) // 7, 1)
    cols = np.arange(_MAX_BYTES128)
    mask = cols[None, :] < nb[:, None]
    cont = cols[None, :] < (nb - 1)[:, None]
    groups[cont] |= 0x80
    return groups[mask].tobytes()


def decode_zigzag128(data, count: int, offset: int = 0):
    """Inverse of encode_zigzag128. Returns (lo uint64, hi uint64 —
    two's-complement high limb, consumed bytes)."""
    if count == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint64), 0
    window = count * _MAX_BYTES128
    if isinstance(data, (bytes, bytearray, memoryview)):
        n_avail = min(window, len(data) - offset)
        b = np.frombuffer(data, dtype=np.uint8, count=n_avail, offset=offset)
    else:
        b = data[offset : offset + window]
    term = (b & 0x80) == 0
    ends = np.nonzero(term)[0]
    if len(ends) < count:
        raise ValueError("varint128 stream truncated")
    ends = ends[:count]
    starts = np.empty(count, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    group_len = ends - starts + 1
    zlo = np.zeros(count, dtype=np.uint64)
    zhi = np.zeros(count, dtype=np.uint64)
    for i in range(int(group_len.max())):
        sel = group_len > i
        byte = (b[starts[sel] + i].astype(np.uint64)) & _U64(0x7F)
        sh = 7 * i
        if sh < 64:
            zlo[sel] |= byte << _U64(sh)
            if sh + 7 > 64:
                zhi[sel] |= byte >> _U64(64 - sh)
        else:
            zhi[sel] |= byte << _U64(sh - 64)
    s = np.where((zlo & _U64(1)) != 0, _U64(0xFFFFFFFFFFFFFFFF), _U64(0))
    rlo = ((zlo >> _U64(1)) | (zhi << _U64(63))) ^ s
    rhi = (zhi >> _U64(1)) ^ s
    return rlo, rhi, int(ends[-1] + 1)


def zigzag(values: np.ndarray) -> np.ndarray:
    """int64 -> uint64 zigzag."""
    v = np.ascontiguousarray(values).astype(np.int64, copy=False)
    return (v.astype(np.uint64) << _U64(1)) ^ (v >> np.int64(63)).astype(np.uint64)


def unzigzag(values: np.ndarray) -> np.ndarray:
    """uint64 zigzag -> int64."""
    u = np.ascontiguousarray(values).astype(np.uint64, copy=False)
    return ((u >> _U64(1)).astype(np.int64)) ^ -((u & _U64(1)).astype(np.int64))


def encode_signed(values: np.ndarray) -> bytes:
    return encode_unsigned(zigzag(values))


def decode_signed(data, count: int, offset: int = 0):
    u, consumed = decode_unsigned(data, count, offset)
    return unzigzag(u), consumed
