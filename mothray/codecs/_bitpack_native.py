"""Optional C fast path for MSB-first bitpacking (same lazy-compile +
ctypes + numpy-fallback scheme as _fsst_native). The numpy path
expands every value to a bit matrix (8 bytes of temporaries per
packed bit); the C loop is a rolling 64-bit accumulator."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_SRC = r"""
#include <stdint.h>
#include <string.h>

/* MSB-first bit-pointer pack/unpack; correct for all w in 1..64.
   Rows are independent, each padded to row_bytes. */
void pack_rows(const uint64_t *v, int64_t k, int64_t m, int w,
               uint8_t *out, int64_t row_bytes) {
    uint64_t mask = (w == 64) ? ~0ULL : ((1ULL << w) - 1);
    for (int64_t r = 0; r < k; r++) {
        const uint64_t *row = v + r * m;
        uint8_t *o = out + r * row_bytes;
        memset(o, 0, (size_t)row_bytes);
        int64_t bitpos = 0;
        for (int64_t i = 0; i < m; i++) {
            uint64_t val = row[i] & mask;
            int rem = w;
            while (rem > 0) {
                int off = (int)(bitpos & 7);
                int avail = 8 - off;
                int take = avail < rem ? avail : rem;
                uint8_t chunk = (uint8_t)((val >> (rem - take)) & ((1u << take) - 1));
                o[bitpos >> 3] |= (uint8_t)(chunk << (avail - take));
                bitpos += take;
                rem -= take;
            }
        }
    }
}

void unpack_rows(const uint8_t *in, int64_t k, int64_t m, int w,
                 int64_t row_bytes, uint64_t *out) {
    for (int64_t r = 0; r < k; r++) {
        const uint8_t *src = in + r * row_bytes;
        uint64_t *dst = out + r * m;
        int64_t bitpos = 0;
        for (int64_t i = 0; i < m; i++) {
            uint64_t val = 0;
            int need = w;
            while (need > 0) {
                int off = (int)(bitpos & 7);
                int avail = 8 - off;
                int take = avail < need ? avail : need;
                uint8_t chunk = (uint8_t)((src[bitpos >> 3] >> (avail - take)) & ((1u << take) - 1));
                val = (val << take) | chunk;
                bitpos += take;
                need -= take;
            }
            dst[i] = val;
        }
    }
}
"""

_lib = None
_tried = False


def get_lib():
    global _lib, _tried
    if os.environ.get("MOTHRAY_NO_NATIVE"):
        return None
    if _tried:
        return _lib
    _tried = True
    try:
        tag = hashlib.sha1(_SRC.encode()).hexdigest()[:16]
        so_path = os.path.join(tempfile.gettempdir(), f"mothray_bitpack_{tag}.so")
        if not os.path.exists(so_path):
            with tempfile.NamedTemporaryFile("w", suffix=".c", delete=False) as f:
                f.write(_SRC)
                c_path = f.name
            try:
                subprocess.run(
                    ["cc", "-O3", "-shared", "-fPIC", "-o", so_path + ".tmp", c_path],
                    check=True,
                    capture_output=True,
                    timeout=60,
                )
                os.rename(so_path + ".tmp", so_path)
            finally:
                os.unlink(c_path)
        lib = ctypes.CDLL(so_path)
        lib.pack_rows.restype = None
        lib.unpack_rows.restype = None
        _lib = lib
    except Exception:
        _lib = None
    return _lib
