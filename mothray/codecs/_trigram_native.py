"""Optional C fast path for trigram-bloom construction.

Collecting the distinct byte trigrams of a stripe's string column is
a single sequential pass in C (~1 GB/s), but costs several shifted
whole-buffer gathers + a 16 MB dedup scan in numpy — enough to show up
next to the FSST encoder on text-heavy stripes. Same lazy cc-compile /
ctypes pattern as _fsst_native (source-hash cached under /tmp, numpy
fallback when no compiler); both paths return the identical distinct
set, only ordering differs (the bloom build is order-insensitive).

No third-party packages involved (stdlib ctypes + cc only).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = r"""
#include <stdint.h>

/* Distinct trigram codes (b0 | b1<<8 | b2<<16) over concatenated
   values; windows never straddle value boundaries. `seen` is a
   caller-provided zeroed 2^24-byte scratch; distinct codes append to
   `out` (capacity >= min(total_windows, 2^24)). Returns the count. */
int64_t trigram_distinct(const uint8_t *data, const int64_t *lengths,
                         int64_t n_values, uint8_t *seen, uint32_t *out) {
    int64_t off = 0, cnt = 0;
    for (int64_t v = 0; v < n_values; v++) {
        int64_t L = lengths[v];
        if (L >= 3) {
            uint32_t w = (uint32_t)data[off] | ((uint32_t)data[off + 1] << 8);
            for (int64_t i = 2; i < L; i++) {
                w |= ((uint32_t)data[off + i] << 16);
                if (!seen[w]) { seen[w] = 1; out[cnt++] = w; }
                w >>= 8;
            }
        }
        off += L;
    }
    return cnt;
}
"""

_lib = None
_tried = False


def get_lib():
    """Compile (once, cached) and load the kernel; None if unavailable."""
    global _lib, _tried
    if os.environ.get("MOTHRAY_TRIGRAM_NUMPY"):  # force numpy (bench control)
        return None
    if _tried:
        return _lib
    _tried = True
    try:
        tag = hashlib.sha1(_SRC.encode()).hexdigest()[:16]
        so_path = os.path.join(tempfile.gettempdir(), f"mothray_trigram_{tag}.so")
        if not os.path.exists(so_path):
            with tempfile.NamedTemporaryFile("w", suffix=".c", delete=False) as f:
                f.write(_SRC)
                c_path = f.name
            try:
                subprocess.run(
                    ["cc", "-O2", "-shared", "-fPIC", "-o", so_path + ".tmp", c_path],
                    check=True,
                    capture_output=True,
                    timeout=60,
                )
                os.rename(so_path + ".tmp", so_path)
            finally:
                os.unlink(c_path)
        lib = ctypes.CDLL(so_path)
        lib.trigram_distinct.restype = ctypes.c_int64
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def trigram_distinct(lengths: np.ndarray, data: np.ndarray) -> np.ndarray | None:
    """Distinct trigram codes via the C kernel; None -> use the numpy
    fallback. `seen` is np.zeros = calloc: virtually zeroed, only the
    pages distinct codes actually land on fault in."""
    lib = get_lib()
    if lib is None:
        return None
    lengths = np.ascontiguousarray(lengths, dtype=np.int64)
    data = np.ascontiguousarray(data, dtype=np.uint8)
    total = int(np.maximum(lengths - 2, 0).sum())
    if total == 0:
        return np.empty(0, dtype=np.uint32)
    seen = np.zeros(1 << 24, dtype=np.uint8)
    out = np.empty(min(total, 1 << 24), dtype=np.uint32)
    cnt = lib.trigram_distinct(
        data.ctypes.data_as(ctypes.c_void_p),
        lengths.ctypes.data_as(ctypes.c_void_p),
        ctypes.c_int64(len(lengths)),
        seen.ctypes.data_as(ctypes.c_void_p),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out[:cnt]
