"""Split seconds+nanos timestamp encoding.

Mirrors the reference's TimestampColumnWriter (reference:
pkg/store/TimestampColumnWriter.go:70-84 wallTimestampToMothValues,
encodeNanos :306-320): a timestamp becomes

  DATA      = seconds relative to the 2015-01-01 UTC epoch, signed RLEv2
  SECONDARY = nanos-of-second with trailing-decimal-zero suppression,
              unsigned RLEv2: if nanos has k >= 2 trailing decimal
              zeros, store (nanos / 10^k) << 3 | (k - 1), else nanos << 3.

Divergence (documented per SURVEY.md §7.4): the reference reproduces
ORC's Go/Java truncating integer division for pre-epoch timestamps
(TimestampColumnWriter.go:31-51); we use floor division on both ends,
which round-trips exactly and keeps the vectorized path branch-free.

Our source columns are Arrow timestamp[us]; micros are converted to
(seconds, nanos) losslessly.
"""

from __future__ import annotations

import numpy as np

MOTH_EPOCH_MICROS = 1420070400_000000  # 2015-01-01T00:00:00Z in micros
_POW10 = np.array([1, 10, 100, 1000, 10000, 100000, 1000000, 10000000], dtype=np.int64)


def micros_to_seconds_nanos(micros: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    m = micros.astype(np.int64, copy=False)
    seconds = np.floor_divide(m, 1_000_000) - (MOTH_EPOCH_MICROS // 1_000_000)
    nanos = np.mod(m, 1_000_000) * 1000
    return seconds, nanos


def seconds_nanos_to_micros(seconds: np.ndarray, nanos: np.ndarray) -> np.ndarray:
    return (seconds + (MOTH_EPOCH_MICROS // 1_000_000)) * 1_000_000 + nanos // 1000


def encode_nanos(nanos: np.ndarray) -> np.ndarray:
    """Vectorized trailing-zero suppression -> uint64 encoded values."""
    n = nanos.astype(np.int64, copy=False)
    # k = number of trailing decimal zeros, capped at 7 (nanos < 1e9)
    k = np.zeros(len(n), dtype=np.int64)
    work = n.copy()
    for _ in range(7):
        divisible = (work != 0) & (work % 10 == 0)
        if not divisible.any():
            break
        k[divisible] += 1
        work[divisible] //= 10
    use = k >= 2
    enc = np.where(use, (n // np.where(use, _POW10[np.minimum(k, 7)], 1)) << 3 | (k - 1), n << 3)
    # nanos == 0 -> k capped path gives 0 << 3 | (k-1); reference encodes 0 as 0
    enc = np.where(n == 0, 0, enc)
    return enc.astype(np.uint64)


def decode_nanos(encoded: np.ndarray) -> np.ndarray:
    e = encoded.astype(np.int64, copy=False)
    k = e & 0x7
    base = e >> 3
    return np.where(k == 0, base, base * _POW10[np.minimum(k + 1, 7)]).astype(np.int64)
