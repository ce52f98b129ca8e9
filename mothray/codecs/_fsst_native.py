"""Optional C fast path for the FSST inner loops.

The greedy byte-at-a-time parse is inherently sequential; the numpy
encoder parallelizes across lanes (~25 element-ops per token), which
caps out near 20-30 MB/s/core. This module compiles a ~70-line C
kernel with the system compiler at first use (cached under /tmp by
source hash) and exposes it via ctypes. Everything falls back to the
pure-numpy path when no compiler is available — the stream format is
identical and the two implementations decode each other's output.

No third-party packages involved (stdlib ctypes + cc only).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_SRC = r"""
#include <stdint.h>
#include <string.h>

#define ESCAPE 255
#define HASH_BITS 12
static inline uint64_t hash3(uint64_t w) {
    return ((w & 0xFFFFFFULL) * 0x9E3779B97F4A7C15ULL) >> (64 - HASH_BITS);
}

/* greedy FSST encode; in must have >= 8 readable bytes past n (padded).
   returns bytes written to out (out must hold 2*n+8). */
int64_t fsst_encode(const uint8_t *in, int64_t n,
                    const uint8_t *short_code, const int8_t *short_len,
                    const uint64_t *hash_sym, const uint8_t *hash_code,
                    const int8_t *hash_len,
                    const uint8_t *byte_code, const uint8_t *byte_ok,
                    uint8_t *out) {
    static const uint64_t masks[9] = {0ULL, 0xFFULL, 0xFFFFULL, 0xFFFFFFULL,
        0xFFFFFFFFULL, 0xFFFFFFFFFFULL, 0xFFFFFFFFFFFFULL,
        0xFFFFFFFFFFFFFFULL, 0xFFFFFFFFFFFFFFFFULL};
    int64_t i = 0, o = 0;
    while (i < n) {
        uint64_t w;
        memcpy(&w, in + i, 8);           /* little-endian hosts only */
        int64_t rem = n - i;
        uint64_t h = hash3(w);
        int hl = hash_len[h];
        if (hl > 0 && hl <= rem && (w & masks[hl]) == hash_sym[h]) {
            out[o++] = hash_code[h];
            i += hl;
            continue;
        }
        uint32_t s2 = (uint32_t)(w & 0xFFFF);
        int sl = short_len[s2];
        if (sl > 0 && sl <= rem) {
            out[o++] = short_code[s2];
            i += sl;
            continue;
        }
        uint32_t b1 = (uint32_t)(w & 0xFF);
        if (byte_ok[b1]) {
            out[o++] = byte_code[b1];
            i += 1;
            continue;
        }
        out[o++] = ESCAPE;
        out[o++] = (uint8_t)b1;
        i += 1;
    }
    return o;
}

/* as fsst_encode, but also records each token's consumed input length
   (1..8) into tok_lens and the token count into *n_tokens — used by
   table training to count token/pair frequencies. */
int64_t fsst_encode_tok(const uint8_t *in, int64_t n,
                        const uint8_t *short_code, const int8_t *short_len,
                        const uint64_t *hash_sym, const uint8_t *hash_code,
                        const int8_t *hash_len,
                        const uint8_t *byte_code, const uint8_t *byte_ok,
                        uint8_t *out, uint8_t *tok_lens, int64_t *n_tokens) {
    static const uint64_t masks[9] = {0ULL, 0xFFULL, 0xFFFFULL, 0xFFFFFFULL,
        0xFFFFFFFFULL, 0xFFFFFFFFFFULL, 0xFFFFFFFFFFFFULL,
        0xFFFFFFFFFFFFFFULL, 0xFFFFFFFFFFFFFFFFULL};
    int64_t i = 0, o = 0, t = 0;
    while (i < n) {
        uint64_t w;
        memcpy(&w, in + i, 8);
        int64_t rem = n - i;
        uint64_t h = hash3(w);
        int hl = hash_len[h];
        if (hl > 0 && hl <= rem && (w & masks[hl]) == hash_sym[h]) {
            out[o++] = hash_code[h];
            tok_lens[t++] = (uint8_t)hl;
            i += hl;
            continue;
        }
        uint32_t s2 = (uint32_t)(w & 0xFFFF);
        int sl = short_len[s2];
        if (sl > 0 && sl <= rem) {
            out[o++] = short_code[s2];
            tok_lens[t++] = (uint8_t)sl;
            i += sl;
            continue;
        }
        uint32_t b1 = (uint32_t)(w & 0xFF);
        if (byte_ok[b1]) {
            out[o++] = byte_code[b1];
        } else {
            out[o++] = ESCAPE;
            out[o++] = (uint8_t)b1;
        }
        tok_lens[t++] = 1;
        i += 1;
    }
    *n_tokens = t;
    return o;
}

/* decode: codes -> bytes. returns output length, or -1 on overflow. */
int64_t fsst_decode(const uint8_t *in, int64_t n,
                    const uint8_t *sym_flat, const int64_t *sym_off,
                    const int64_t *sym_len,
                    uint8_t *out, int64_t out_cap) {
    int64_t i = 0, o = 0;
    while (i < n) {
        uint8_t c = in[i++];
        if (c == ESCAPE) {
            if (o + 1 > out_cap || i >= n) return -1;
            out[o++] = in[i++];
        } else {
            int64_t l = sym_len[c];
            if (o + l > out_cap) return -1;
            memcpy(out + o, sym_flat + sym_off[c], (size_t)l);
            o += l;
        }
    }
    return o;
}
"""

_lib = None
_tried = False


def get_lib():
    """Compile (once, cached) and load the kernel; None if unavailable."""
    global _lib, _tried
    if os.environ.get("MOTHRAY_FSST_NUMPY"):  # force the numpy path (bench control)
        return None
    if _tried:
        return _lib
    _tried = True
    try:
        tag = hashlib.sha1(_SRC.encode()).hexdigest()[:16]
        so_path = os.path.join(tempfile.gettempdir(), f"mothray_fsst_{tag}.so")
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
        lib.fsst_encode.restype = ctypes.c_int64
        lib.fsst_encode_tok.restype = ctypes.c_int64
        lib.fsst_decode.restype = ctypes.c_int64
        _lib = lib
    except Exception:
        _lib = None
    return _lib
