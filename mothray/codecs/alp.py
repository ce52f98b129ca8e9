"""ALP-style adaptive lossless floating-point encoding.

Re-scales decimal-quantized doubles to integers (x -> round(x * 10^d))
so the existing RLEv2 integer machinery (delta / patched-base / FOR)
absorbs them, with bit-pattern-verified exceptions stored raw. This is
the core idea of ALP (Afroozeh & Boncz, "ALP: Adaptive Lossless
floating-Point compression", SIGMOD 2023), simplified to a single
per-stripe decimal exponent instead of per-vector (e, f) pairs — the
price-like business columns it targets (price, discount, tax, rate)
are uniformly quantized, so one exponent covers the stripe and the
per-vector machinery would buy nothing here.

Losslessness does not rely on float math being exact: every value is
verified by BIT comparison against the exact decode computation
(ints.astype(float64) / 10**d, cast to the column dtype); any value
that does not round-trip bit-identically (NaN, inf, -0.0, true
continuous values) becomes an exception carrying its raw IEEE-754 bit
pattern. IEEE division is correctly rounded and 10**d is exactly
representable for d <= 22, so a double that IS the nearest double to
i * 10^-d always survives; everything else is caught by the verify.

The reference writes floats as raw LE words (DoubleOutputStream.go:
26-28); ALP is a north-star extension like FSST/BSS, selected per
column by the same trial-compression philosophy as the rest of the
plan pass (DictionaryCompressionOptimizer.go:128-142).

Stream layout (column.py encoding "ALP"):
  DATA            RLEv2(signed) of the re-scaled integers (exceptions
                  hold the last preceding valid integer so they never
                  break a run)
  SECONDARY       1 exponent byte d, then RLEv2(unsigned) exception
                  positions (count derived from DICTIONARY_DATA size)
  DICTIONARY_DATA raw IEEE-754 bit patterns of the exception values
"""

from __future__ import annotations

import numpy as np

from . import rlev2

MAX_EXP = 18  # 10^18 < 2^63: re-scaled ints always fit int64
_POW10 = np.power(10.0, np.arange(MAX_EXP + 1))
# |i| bound so i is exactly representable as a double (the verify
# divides i as a float64); 2^51 leaves headroom under the 2^53 mantissa.
_SAFE_INT = float(1 << 51)
# A stripe where more than this fraction of values need raw exception
# storage is not ALP-shaped; fall back to the raw/bss/dict trial.
MAX_EXCEPTION_FRAC = 0.05


def _bits(v: np.ndarray) -> np.ndarray:
    return v.view(np.uint32 if v.dtype.itemsize == 4 else np.uint64)


def _try_exponent(v: np.ndarray, d: int) -> tuple[np.ndarray, np.ndarray]:
    """(rescaled int64s, per-value bit-exact-round-trip mask) for 10^d."""
    with np.errstate(invalid="ignore", over="ignore"):
        scaled = v.astype(np.float64) * _POW10[d]
        cand = np.isfinite(scaled) & (np.abs(scaled) < _SAFE_INT)
    ints = np.zeros(len(v), dtype=np.int64)
    ints[cand] = np.rint(scaled[cand]).astype(np.int64)
    back = (ints.astype(np.float64) / _POW10[d]).astype(v.dtype)
    ok = cand & (_bits(back) == _bits(v))
    return ints, ok


def choose_exponent(sample: np.ndarray) -> tuple[int, float]:
    """(best decimal exponent, its round-trip coverage fraction) over a
    sample. Smallest exponent wins ties — smaller ints RLEv2 tighter."""
    if len(sample) == 0:
        return 0, 0.0
    best_d, best_ok = 0, -1
    for d in range(MAX_EXP + 1):
        ok = int(_try_exponent(sample, d)[1].sum())
        if ok > best_ok:
            best_d, best_ok = d, ok
        if ok == len(sample):
            break
    return best_d, best_ok / len(sample)


def encode_parts(v: np.ndarray, d: int | None = None) -> dict | None:
    """Encode a float32/float64 array; returns the stream dict for an
    "ALP" EncodedColumn, or None when the stripe is not ALP-shaped
    (exception fraction above MAX_EXCEPTION_FRAC)."""
    n = len(v)
    if n == 0:
        return None
    if d is None:
        d, _ = choose_exponent(v[:4096])
    ints, ok = _try_exponent(v, d)
    exc_idx = np.flatnonzero(~ok)
    if len(exc_idx) > n * MAX_EXCEPTION_FRAC:
        return None
    if len(exc_idx):
        # Forward-fill exception slots with the last valid integer so a
        # lone exception inside a run does not split it; leading
        # exceptions take the first valid value.
        last_valid = np.maximum.accumulate(np.where(ok, np.arange(n), -1))
        first_valid = int(np.flatnonzero(ok)[0]) if ok.any() else 0
        last_valid[last_valid < 0] = first_valid
        ints = ints[last_valid]
    return {
        "DATA": rlev2.encode(ints, signed=True),
        "SECONDARY": bytes([d])
        + rlev2.encode(exc_idx.astype(np.uint64), signed=False),
        "DICTIONARY_DATA": _bits(v)[exc_idx].tobytes(),
    }


def decode(streams: dict, n: int, dtype) -> np.ndarray:
    """Inverse of encode_parts: float array of length n and dtype."""
    dt = np.dtype(dtype)
    d = streams["SECONDARY"][0]
    ints, _ = rlev2.decode(streams["DATA"], n, signed=True)
    out = (ints.astype(np.float64) / _POW10[d]).astype(dt)
    raw = streams.get("DICTIONARY_DATA", b"")
    n_exc = len(raw) // dt.itemsize
    if n_exc:
        pos, _ = rlev2.decode(streams["SECONDARY"][1:], n_exc, signed=False)
        patterns = np.frombuffer(
            raw, dtype=np.uint32 if dt.itemsize == 4 else np.uint64
        )
        _bits(out)[pos] = patterns
    return out
