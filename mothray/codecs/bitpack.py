"""Vectorized MSB-first bitpacking at arbitrary widths 1..64.

Matches the bit layout the reference writes with its unrolled packers
(reference: pkg/store/LongOutputStreamV2.go:739-1107 writeInts /
pkg/store/LongBitPacker.go unpack) — each value's low `width` bits are
written most-significant-bit first, values back to back, final byte
zero-padded — but implemented as numpy unpackbits/packbits over the
big-endian byte view instead of per-value shifts.
"""

from __future__ import annotations

import numpy as np

# ORC's "closest fixed bit width" table (reference:
# pkg/store/LongOutputStreamV2.go getClosestFixedBits): 1..24 then
# 26,28,30,32,40,48,56,64.
_FIXED_BITS = list(range(1, 25)) + [26, 28, 30, 32, 40, 48, 56, 64]
_FIXED_BITS_ARR = np.array(_FIXED_BITS, dtype=np.int64)

# aligned widths used by PATCHED_BASE patch entries
_ALIGNED_BITS = np.array([1, 2, 4, 8, 16, 24, 32, 40, 48, 56, 64], dtype=np.int64)


def closest_fixed_bits(width: int) -> int:
    if width <= 0:
        return 1
    i = int(np.searchsorted(_FIXED_BITS_ARR, width))
    return int(_FIXED_BITS_ARR[min(i, len(_FIXED_BITS_ARR) - 1)])


def closest_fixed_bits_arr(widths: np.ndarray) -> np.ndarray:
    """Vectorized closest_fixed_bits."""
    idx = np.searchsorted(_FIXED_BITS_ARR, np.maximum(widths, 1))
    return _FIXED_BITS_ARR[np.minimum(idx, len(_FIXED_BITS_ARR) - 1)]


def closest_aligned_bits(width: int) -> int:
    if width <= 0:
        return 1
    i = int(np.searchsorted(_ALIGNED_BITS, width))
    return int(_ALIGNED_BITS[min(i, len(_ALIGNED_BITS) - 1)])


def encode_bit_width(width: int) -> int:
    """width (one of the fixed-bits table) -> 5-bit header code."""
    w = closest_fixed_bits(width)
    if w <= 24:
        return w - 1
    return 24 + (_FIXED_BITS.index(w) - 24)


def decode_bit_width(code: int) -> int:
    return _FIXED_BITS[code]


def bit_width(values_u64: np.ndarray) -> np.ndarray:
    """Elementwise minimal bit width (>=1 even for 0), any shape.

    uint64-safe (no float round-trip): counts via threshold compares on
    the high/low 32-bit halves.
    """
    v = values_u64.astype(np.uint64, copy=False)
    hi = (v >> np.uint64(32)).astype(np.uint32)
    lo = v.astype(np.uint32)
    w_hi = _bit_width32(hi)
    w_lo = _bit_width32(lo)
    return np.where(w_hi > 0, w_hi + 32, np.maximum(w_lo, 1)).astype(np.int64)


def _bit_width32(v: np.ndarray) -> np.ndarray:
    # float64 holds uint32 exactly
    f = v.astype(np.float64)
    w = np.zeros(v.shape, dtype=np.int64)
    nz = v != 0
    w[nz] = np.floor(np.log2(f[nz])).astype(np.int64) + 1
    # guard against log2 edge rounding at exact powers of two
    too_big = nz & (w < 64) & (f >= np.power(2.0, np.minimum(w, 63).astype(np.float64)))
    w[too_big] += 1
    return w


def _native():
    from . import _bitpack_native

    return _bitpack_native.get_lib()


def pack(values: np.ndarray, width: int) -> bytes:
    """Pack low `width` bits of each uint64 value, MSB-first."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0 or width == 0:
        return b""
    lib = _native()
    if lib is not None:
        import ctypes

        rb = packed_size(n, width)
        out = np.empty(rb, dtype=np.uint8)
        lib.pack_rows(
            v.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(1), ctypes.c_int64(n),
            ctypes.c_int(width), out.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(rb),
        )
        return out.tobytes()
    nb = (width + 7) // 8  # only expand the bytes that can carry bits
    be = v.astype(">u8").view(np.uint8).reshape(n, 8)[:, 8 - nb :]
    bits = np.unpackbits(np.ascontiguousarray(be), axis=1)  # (n, nb*8)
    sel = bits[:, nb * 8 - width :]
    return np.packbits(sel.reshape(-1)).tobytes()


def unpack(data, count: int, width: int, offset: int = 0) -> np.ndarray:
    """Inverse of pack -> uint64 array of `count` values."""
    if count == 0 or width == 0:
        return np.zeros(count, dtype=np.uint64)
    nbytes = (count * width + 7) // 8
    b = np.frombuffer(data, dtype=np.uint8, count=nbytes, offset=offset)
    lib = _native()
    if lib is not None:
        import ctypes

        bc = np.ascontiguousarray(b)
        out = np.empty(count, dtype=np.uint64)
        lib.unpack_rows(
            bc.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(1), ctypes.c_int64(count),
            ctypes.c_int(width), ctypes.c_int64(nbytes), out.ctypes.data_as(ctypes.c_void_p),
        )
        return out
    bits = np.unpackbits(b)[: count * width].reshape(count, width)
    nb = (width + 7) // 8
    full = np.zeros((count, nb * 8), dtype=np.uint8)
    full[:, nb * 8 - width :] = bits
    packed = np.packbits(full, axis=1)  # (count, nb) big-endian bytes
    out = np.zeros((count, 8), dtype=np.uint8)
    out[:, 8 - nb :] = packed
    return out.view(">u8").ravel().astype(np.uint64)


def packed_size(count: int, width: int) -> int:
    return (count * width + 7) // 8


def pack_rows(values_2d: np.ndarray, width: int) -> np.ndarray:
    """Pack each row of a (k, m) uint64 matrix independently at `width`
    bits, each row zero-padded to a byte boundary.

    Returns a (k, packed_size(m, width)) uint8 matrix. One numpy pass
    for k blocks — this is what lets the RLEv2 encoder emit hundreds of
    same-width runs without per-run Python.
    """
    k, m = values_2d.shape
    if k == 0 or m == 0 or width == 0:
        return np.zeros((k, packed_size(m, width)), dtype=np.uint8)
    v = np.ascontiguousarray(values_2d, dtype=np.uint64)
    lib = _native()
    if lib is not None:
        import ctypes

        rb = packed_size(m, width)
        out = np.empty((k, rb), dtype=np.uint8)
        lib.pack_rows(
            v.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(k), ctypes.c_int64(m),
            ctypes.c_int(width), out.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(rb),
        )
        return out
    nb = (width + 7) // 8
    be = np.ascontiguousarray(v.astype(">u8").view(np.uint8).reshape(k, m, 8)[:, :, 8 - nb :])
    bits = np.unpackbits(be.reshape(k, m * nb), axis=1).reshape(k, m, nb * 8)
    sel = bits[:, :, nb * 8 - width :].reshape(k, m * width) if width != nb * 8 else bits.reshape(k, m * width)
    pad = (-sel.shape[1]) % 8
    if pad:
        sel = np.concatenate([sel, np.zeros((k, pad), dtype=np.uint8)], axis=1)
    return np.packbits(sel, axis=1)


def unpack_rows(packed_2d: np.ndarray, m: int, width: int) -> np.ndarray:
    """Inverse of pack_rows -> (k, m) uint64."""
    k = packed_2d.shape[0]
    if k == 0 or m == 0 or width == 0:
        return np.zeros((k, m), dtype=np.uint64)
    lib = _native()
    if lib is not None:
        import ctypes

        src = np.ascontiguousarray(packed_2d)
        out = np.empty((k, m), dtype=np.uint64)
        lib.unpack_rows(
            src.ctypes.data_as(ctypes.c_void_p), ctypes.c_int64(k), ctypes.c_int64(m),
            ctypes.c_int(width), ctypes.c_int64(src.shape[1]), out.ctypes.data_as(ctypes.c_void_p),
        )
        return out
    bits = np.unpackbits(np.ascontiguousarray(packed_2d), axis=1)[:, : m * width]
    nb = (width + 7) // 8
    full = np.zeros((k, m, nb * 8), dtype=np.uint8)
    full[:, :, nb * 8 - width :] = bits.reshape(k, m, width)
    packed = np.packbits(full.reshape(k, m * nb * 8), axis=1).reshape(k, m, nb)
    out = np.zeros((k, m, 8), dtype=np.uint8)
    out[:, :, 8 - nb :] = packed
    return out.reshape(k, m * 8).view(">u8").reshape(k, m).astype(np.uint64)
