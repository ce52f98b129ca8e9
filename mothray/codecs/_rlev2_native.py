"""Optional C fast path for the RLEv2 codec (same lazy-compile +
ctypes + numpy-fallback scheme as _fsst_native / _bitpack_native).

The C encoder mirrors the numpy encoder's decisions BIT-EXACTLY —
same 512-value window classification, same sub-mode selection
formulas, same tail-block rules — so native and numpy builds produce
identical streams (resume byte-identity holds regardless of which
path ran). Bit-identity is enforced by fuzz tests comparing the two
encoders byte for byte (tests/test_codecs.py).

Reference semantics: pkg/store/LongOutputStreamV2.go:174-432 +
LongInputStreamV2.go:48-323 (see rlev2.py module docstring for the
documented divergences both implementations share).
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

static const int FIXED_BITS[32] = {
    1,2,3,4,5,6,7,8,9,10,11,12,13,14,15,16,17,18,19,20,21,22,23,24,
    26,28,30,32,40,48,56,64};

static int closest_fixed(int w) {
    if (w <= 0) return 1;
    if (w <= 24) return w;
    if (w <= 26) return 26;
    if (w <= 28) return 28;
    if (w <= 30) return 30;
    if (w <= 32) return 32;
    if (w <= 40) return 40;
    if (w <= 48) return 48;
    if (w <= 56) return 56;
    return 64;
}

static int width_code(int w) { /* w must already be a fixed width */
    if (w <= 24) return w - 1;
    switch (w) {
        case 26: return 24; case 28: return 25; case 30: return 26;
        case 32: return 27; case 40: return 28; case 48: return 29;
        case 56: return 30; default: return 31;
    }
}

static int closest_aligned(int w) {
    static const int A[11] = {1,2,4,8,16,24,32,40,48,56,64};
    for (int i = 0; i < 11; i++) if (w <= A[i]) return A[i];
    return 64;
}

static inline int bitlen(uint64_t x) { return x ? 64 - __builtin_clzll(x) : 0; }
static inline int bwnp(uint64_t x) { int b = bitlen(x); return b ? b : 1; }
static inline uint64_t zz(int64_t v) { return ((uint64_t)v << 1) ^ (uint64_t)(v >> 63); }
static inline int64_t unzz(uint64_t u) { return (int64_t)(u >> 1) ^ -(int64_t)(u & 1); }

static void wvarint(uint8_t *o, int64_t *p, uint64_t u) {
    for (;;) {
        uint8_t b = (uint8_t)(u & 0x7F);
        u >>= 7;
        if (u) { o[(*p)++] = b | 0x80; } else { o[(*p)++] = b; return; }
    }
}

static inline int64_t packed_size(int64_t n, int w) { return (n * w + 7) >> 3; }

/* MSB-first pack, output starts byte-aligned at o[*p]. */
static void wpack(uint8_t *o, int64_t *p, const uint64_t *vals, int64_t n, int w) {
    uint64_t mask = (w == 64) ? ~0ULL : ((1ULL << w) - 1);
    int64_t nb = packed_size(n, w);
    uint8_t *dst = o + *p;
    memset(dst, 0, (size_t)nb);
    int64_t bitpos = 0;
    for (int64_t i = 0; i < n; i++) {
        uint64_t val = vals[i] & mask;
        int rem = w;
        while (rem > 0) {
            int off = (int)(bitpos & 7);
            int avail = 8 - off;
            int take = avail < rem ? avail : rem;
            uint8_t chunk = (uint8_t)((val >> (rem - take)) & ((1u << take) - 1));
            dst[bitpos >> 3] |= (uint8_t)(chunk << (avail - take));
            bitpos += take; rem -= take;
        }
    }
    *p += nb;
}

static void wbig(uint8_t *o, int64_t *p, uint64_t v, int nbytes) {
    for (int i = nbytes - 1; i >= 0; i--) o[(*p)++] = (uint8_t)(v >> (8 * i));
}

static void wbase(uint8_t *o, int64_t *p, uint64_t v0, int sgn) {
    wvarint(o, p, sgn ? zz((int64_t)v0) : v0);
}

static void emit_direct(uint8_t *o, int64_t *p, const uint64_t *zzv, int64_t n, int w_raw) {
    int w = closest_fixed(w_raw);
    o[(*p)++] = (uint8_t)((1 << 6) | (width_code(w) << 1) | (int)((n - 1) >> 8));
    o[(*p)++] = (uint8_t)((n - 1) & 0xFF);
    wpack(o, p, zzv, n, w);
}

/* percentile (method="lower") over widths via 65-bin histogram:
   returns sorted_widths[idx] (0-based). */
static int hist_percentile(const int64_t hist[65], int64_t idx) {
    int64_t cum = 0;
    for (int w = 1; w <= 64; w++) {
        cum += hist[w];
        if (cum >= idx + 1) return w;
    }
    return 64;
}

/* Try PATCHED_BASE emission for a block of n values with reduction
   base `lo` (semantic signed value; lo_neg says it is negative).
   r[] = value - lo in modular u64, w95 already the fixed low width.
   Returns 1 and advances *p on success, 0 to fall back to DIRECT. */
static int emit_patched(uint8_t *o, int64_t *p, const uint64_t *r, int64_t n,
                        int w95, uint64_t lo_mag, int lo_neg) {
    int64_t gaps[1024]; uint64_t pvals[1024];
    int ne = 0;
    uint64_t pmax = 0; int64_t gmax = 0;
    int64_t prev = 0;
    for (int64_t i = 0; i < n; i++) {
        if (bwnp(r[i]) > w95) {
            int64_t g = i - prev; prev = i;
            uint64_t pv = r[i] >> w95;
            if (pv > pmax) pmax = pv;
            while (g > 255) {
                if (ne >= 1024) return 0;
                gaps[ne] = 255; pvals[ne] = 0; ne++; g -= 255;
                if (gmax < 255) gmax = 255; /* fillers count toward pgw */
            }
            if (ne >= 1024) return 0;
            gaps[ne] = g; pvals[ne] = pv;
            if (g > gmax) gmax = g;
            ne++;
        }
    }
    if (ne == 0 || ne > 31) return 0;
    int pw = closest_fixed(bitlen(pmax) ? bitlen(pmax) : 1);
    int pgw = closest_fixed(bitlen((uint64_t)gmax) ? bitlen((uint64_t)gmax) : 1);
    if (pgw > 8 || pgw + pw > 64) return 0;
    int combined = closest_aligned(pgw + pw);
    int bw = (bitlen(lo_mag) + 1 + 7) / 8;
    if (bw < 1) bw = 1;
    o[(*p)++] = (uint8_t)((2 << 6) | (width_code(w95) << 1) | (int)((n - 1) >> 8));
    o[(*p)++] = (uint8_t)((n - 1) & 0xFF);
    o[(*p)++] = (uint8_t)(((bw - 1) << 5) | width_code(pw));
    o[(*p)++] = (uint8_t)(((pgw - 1) << 5) | ne);
    uint64_t base_field = lo_neg ? ((1ULL << (bw * 8 - 1)) | lo_mag) : lo_mag;
    wbig(o, p, base_field, bw);
    uint64_t low[512];
    uint64_t mask = (w95 < 64) ? ((1ULL << w95) - 1) : ~0ULL;
    for (int64_t i = 0; i < n; i++) low[i] = r[i] & mask;
    wpack(o, p, low, n, w95);
    uint64_t ents[1024];
    for (int i = 0; i < ne; i++) ents[i] = ((uint64_t)gaps[i] << pw) | pvals[i];
    wpack(o, p, ents, ne, combined);
    return 1;
}

/* one full 512-value block, numpy _encode_super single-block rules */
static void enc512(const uint64_t *v, int sgn, uint8_t *o, int64_t *p) {
    const int64_t n = 512;
    uint64_t bmin_u, bmax_u; int64_t bmin_i, bmax_i;
    bmin_u = bmax_u = v[0];
    bmin_i = bmax_i = (int64_t)v[0];
    for (int64_t i = 1; i < n; i++) {
        if (v[i] < bmin_u) bmin_u = v[i];
        if (v[i] > bmax_u) bmax_u = v[i];
        if ((int64_t)v[i] < bmin_i) bmin_i = (int64_t)v[i];
        if ((int64_t)v[i] > bmax_i) bmax_i = (int64_t)v[i];
    }
    int span_unsafe;
    if (sgn)
        span_unsafe = (bmin_i < 0) && (bmax_i >= 0) &&
                      ((int64_t)((uint64_t)bmax_i - (uint64_t)bmin_i) < 0);
    else
        span_unsafe = (bmax_u - bmin_u) >= (1ULL << 63);

    int64_t d[511]; int64_t dmin, dmax;
    for (int64_t i = 0; i < n - 1; i++)
        d[i] = (int64_t)((uint64_t)v[i + 1] - (uint64_t)v[i]);
    dmin = dmax = d[0];
    for (int64_t i = 1; i < n - 1; i++) {
        if (d[i] < dmin) dmin = d[i];
        if (d[i] > dmax) dmax = d[i];
    }
    int fixed = (dmin == dmax) && !span_unsafe;
    int mono = ((dmin >= 0) || (dmax <= 0)) && !span_unsafe && !fixed;
    if (d[0] == 0 && dmin < 0) mono = 0;

    uint64_t zzv[512];
    int64_t hist[65]; memset(hist, 0, sizeof(hist));
    int w100raw = 1;
    for (int64_t i = 0; i < n; i++) {
        zzv[i] = sgn ? zz((int64_t)v[i]) : v[i];
        int w = bwnp(zzv[i]);
        hist[w]++;
        if (w > w100raw) w100raw = w;
    }
    int w90 = closest_fixed(hist_percentile(hist, (n * 90) / 100 - 1));
    int w100 = closest_fixed(w100raw);

    uint64_t mags[511]; uint64_t mag_max = 0;
    for (int64_t i = 0; i < n - 1; i++) {
        mags[i] = d[i] < 0 ? (uint64_t)(-(uint64_t)d[i]) : (uint64_t)d[i];
        if (i >= 1 && mags[i] > mag_max) mag_max = mags[i];
    }
    int wd = closest_fixed(bwnp(mag_max));
    if (wd < 2) wd = 2;
    int64_t delta_cost = 2 + 10 + 10 + (((n - 2) * wd + 7) >> 3);
    int64_t direct_cost = 2 + ((n * w100 + 7) >> 3);
    int delta_var = mono && (delta_cost <= direct_cost);
    int patched = !fixed && !delta_var && !span_unsafe && (w100 - w90 > 1);

    if (fixed) {
        o[(*p)++] = (uint8_t)((3 << 6) | (int)((n - 1) >> 8));
        o[(*p)++] = (uint8_t)((n - 1) & 0xFF);
        wbase(o, p, v[0], sgn);
        wvarint(o, p, zz(d[0]));
        return;
    }
    if (delta_var) {
        o[(*p)++] = (uint8_t)((3 << 6) | (width_code(wd) << 1) | (int)((n - 1) >> 8));
        o[(*p)++] = (uint8_t)((n - 1) & 0xFF);
        wbase(o, p, v[0], sgn);
        wvarint(o, p, zz(d[0]));
        wpack(o, p, mags + 1, n - 2, wd);
        return;
    }
    if (patched) {
        /* reduce in modular int64 against the dtype-matched min */
        int64_t lo_i = sgn ? bmin_i : (int64_t)bmin_u;
        uint64_t r[512];
        int64_t rhist[65]; memset(rhist, 0, sizeof(rhist));
        int64_t pll_probe = 0;
        for (int64_t i = 0; i < n; i++) {
            r[i] = (uint64_t)((int64_t)v[i] - lo_i);
            rhist[bwnp(r[i])]++;
        }
        int w95 = closest_fixed(hist_percentile(rhist, (n * 95) / 100 - 1));
        for (int64_t i = 0; i < n; i++) if (bwnp(r[i]) > w95) pll_probe++;
        uint64_t lo_mag; int lo_neg;
        if (sgn) { lo_neg = bmin_i < 0; lo_mag = lo_neg ? (uint64_t)(-(uint64_t)bmin_i) : (uint64_t)bmin_i; }
        else { lo_neg = 0; lo_mag = bmin_u; }
        int base_bits = bwnp(lo_mag) + 1;
        int ok = pll_probe > 0 && pll_probe <= 31 && w95 < 64 && base_bits <= 64;
        if (ok && emit_patched(o, p, r, n, w95, lo_mag, lo_neg)) return;
    }
    emit_direct(o, p, zzv, n, w100raw);
}

/* tail block (n < 512), numpy _encode_block rules */
static void enc_tail(const uint64_t *v, int64_t n, int sgn, uint8_t *o, int64_t *p) {
    if (n == 0) return;
    uint64_t zzv[512];
    for (int64_t i = 0; i < n; i++) zzv[i] = sgn ? zz((int64_t)v[i]) : v[i];
    if (n < 3) {
        int wmax = 1;
        for (int64_t i = 0; i < n; i++) { int w = bwnp(zzv[i]); if (w > wmax) wmax = w; }
        emit_direct(o, p, zzv, n, wmax);
        return;
    }
    int is_const = 1;
    for (int64_t i = 1; i < n; i++) if (v[i] != v[0]) { is_const = 0; break; }
    if (is_const) {
        if (n <= 10) {
            uint64_t u = sgn ? zz((int64_t)v[0]) : v[0];
            int nb = (bitlen(u) + 7) / 8; if (nb < 1) nb = 1;
            o[(*p)++] = (uint8_t)((0 << 6) | ((nb - 1) << 3) | (int)(n - 3));
            wbig(o, p, u, nb);
        } else {
            o[(*p)++] = (uint8_t)((3 << 6) | (int)((n - 1) >> 8));
            o[(*p)++] = (uint8_t)((n - 1) & 0xFF);
            wbase(o, p, v[0], sgn);
            wvarint(o, p, zz(0));
        }
        return;
    }

    uint64_t lo_u, hi_u; int64_t lo_i, hi_i;
    lo_u = hi_u = v[0]; lo_i = hi_i = (int64_t)v[0];
    for (int64_t i = 1; i < n; i++) {
        if (v[i] < lo_u) lo_u = v[i];
        if (v[i] > hi_u) hi_u = v[i];
        if ((int64_t)v[i] < lo_i) lo_i = (int64_t)v[i];
        if ((int64_t)v[i] > hi_i) hi_i = (int64_t)v[i];
    }
    uint64_t span = sgn ? ((uint64_t)hi_i - (uint64_t)lo_i) : (hi_u - lo_u);
    int span_safe = span < (1ULL << 63);

    int64_t d[511];
    for (int64_t i = 0; i < n - 1; i++)
        d[i] = (int64_t)((uint64_t)v[i + 1] - (uint64_t)v[i]);

    if (span_safe) {
        int all_eq = 1, mono_inc = 1, mono_dec = 1;
        for (int64_t i = 0; i < n - 1; i++) {
            if (d[i] != d[0]) all_eq = 0;
            if (d[i] < 0) mono_inc = 0;
            if (d[i] > 0) mono_dec = 0;
        }
        if (all_eq) {
            o[(*p)++] = (uint8_t)((3 << 6) | (int)((n - 1) >> 8));
            o[(*p)++] = (uint8_t)((n - 1) & 0xFF);
            wbase(o, p, v[0], sgn);
            wvarint(o, p, zz(d[0]));
            return;
        }
        if ((mono_inc || mono_dec) && (d[0] != 0 || mono_inc)) {
            uint64_t mags[511];
            for (int64_t i = 0; i < n - 1; i++)
                mags[i] = d[i] < 0 ? (uint64_t)(-(uint64_t)d[i]) : (uint64_t)d[i];
            int wd = 1;
            if (n > 2) {
                int wm = 1;
                for (int64_t i = 1; i < n - 1; i++) { int w = bwnp(mags[i]); if (w > wm) wm = w; }
                wd = closest_fixed(wm);
            }
            if (wd < 2) wd = 2;
            int64_t delta_cost = 2 + 10 + 10 + packed_size(n - 2, wd);
            int w100t = 1;
            for (int64_t i = 0; i < n; i++) { int w = bwnp(zzv[i]); if (w > w100t) w100t = w; }
            w100t = closest_fixed(w100t);
            int64_t direct_cost = 2 + packed_size(n, w100t);
            if (delta_cost <= direct_cost) {
                o[(*p)++] = (uint8_t)((3 << 6) | (width_code(wd) << 1) | (int)((n - 1) >> 8));
                o[(*p)++] = (uint8_t)((n - 1) & 0xFF);
                wbase(o, p, v[0], sgn);
                wvarint(o, p, zz(d[0]));
                if (n > 2) wpack(o, p, mags + 1, n - 2, wd);
                return;
            }
        }
    }

    int64_t hist[65]; memset(hist, 0, sizeof(hist));
    int w100raw = 1;
    for (int64_t i = 0; i < n; i++) {
        int w = bwnp(zzv[i]); hist[w]++;
        if (w > w100raw) w100raw = w;
    }
    int w90raw = hist_percentile(hist, (9 * (n - 1)) / 10);
    if (span_safe && closest_fixed(w100raw) - closest_fixed(w90raw) > 1) {
        /* tail patched attempt (numpy _try_write_patched) */
        int64_t lo = sgn ? lo_i : (int64_t)lo_u;
        uint64_t lo_mag; int lo_neg;
        if (sgn) { lo_neg = lo_i < 0; lo_mag = lo_neg ? (uint64_t)(-(uint64_t)lo_i) : (uint64_t)lo_i; }
        else { lo_neg = 0; lo_mag = lo_u; }
        int base_bits = bitlen(lo_mag) + 1;
        if (base_bits <= 64) {
            uint64_t r[512];
            int64_t rhist[65]; memset(rhist, 0, sizeof(rhist));
            for (int64_t i = 0; i < n; i++) {
                r[i] = (uint64_t)((int64_t)v[i] - lo);
                rhist[bwnp(r[i])]++;
            }
            int w95raw = hist_percentile(rhist, (19 * (n - 1)) / 20);
            int w = closest_fixed(w95raw);
            if (w < 64) {
                int64_t pll = 0;
                for (int64_t i = 0; i < n; i++) if (bwnp(r[i]) > w) pll++;
                if (pll > 0 && pll <= 31 && emit_patched(o, p, r, n, w, lo_mag, lo_neg))
                    return;
            }
        }
    }
    emit_direct(o, p, zzv, n, w100raw);
}

static void enc_region(const uint64_t *v, int64_t n, int sgn, uint8_t *o, int64_t *p) {
    int64_t nfull = n / 512;
    for (int64_t b = 0; b < nfull; b++) enc512(v + b * 512, sgn, o, p);
    enc_tail(v + nfull * 512, n - nfull * 512, sgn, o, p);
}

/* Constant runs >= MIN_SPLIT_RUN are carved out of the window stream
   (mirror of the numpy _segments split; the reference's sequential
   scanner takes runs as it finds them). */
#define MIN_SPLIT_RUN 128

int64_t rlev2_encode(const uint64_t *v, int64_t n, int sgn, uint8_t *out) {
    int64_t p = 0;
    int64_t i = 0, mix_start = 0;
    while (i < n) {
        int64_t j = i + 1;
        while (j < n && v[j] == v[i]) j++;
        if (j - i >= MIN_SPLIT_RUN) {
            enc_region(v + mix_start, i - mix_start, sgn, out, &p);
            for (int64_t s = i; s < j; s += 512) {
                int64_t c = j - s < 512 ? j - s : 512;
                enc_tail(v + s, c, sgn, out, &p);
            }
            mix_start = j;
        }
        i = j;
    }
    enc_region(v + mix_start, n - mix_start, sgn, out, &p);
    return p;
}

/* ------------------------------------------------------------ decode */

static int64_t rvarint(const uint8_t *buf, int64_t len, int64_t *pos, uint64_t *out) {
    uint64_t u = 0; int shift = 0;
    while (*pos < len) {
        uint8_t b = buf[(*pos)++];
        u |= (uint64_t)(b & 0x7F) << shift;
        shift += 7;
        if (!(b & 0x80)) { *out = u; return 0; }
        if (shift >= 70) return -1;
    }
    return -1;
}

static void runpack(const uint8_t *src, int64_t n, int w, uint64_t *dst) {
    int64_t bitpos = 0;
    for (int64_t i = 0; i < n; i++) {
        uint64_t val = 0; int need = w;
        while (need > 0) {
            int off = (int)(bitpos & 7);
            int avail = 8 - off;
            int take = avail < need ? avail : need;
            uint8_t chunk = (uint8_t)((src[bitpos >> 3] >> (avail - take)) & ((1u << take) - 1));
            val = (val << take) | chunk;
            bitpos += take; need -= take;
        }
        dst[i] = val;
    }
}

int64_t rlev2_decode(const uint8_t *buf, int64_t len, int64_t count, int sgn,
                     uint64_t *out) {
    int64_t pos = 0, filled = 0;
    while (filled < count) {
        if (pos >= len) return -1;
        uint8_t first = buf[pos];
        int mode = first >> 6;
        if (mode == 0) { /* SHORT_REPEAT */
            int nb = ((first >> 3) & 0x7) + 1;
            int64_t run = (first & 0x7) + 3;
            if (pos + 1 + nb > len || filled + run > count) return -1;
            uint64_t u = 0;
            for (int i = 0; i < nb; i++) u = (u << 8) | buf[pos + 1 + i];
            uint64_t val = sgn ? (uint64_t)unzz(u) : u;
            for (int64_t i = 0; i < run; i++) out[filled + i] = val;
            pos += 1 + nb; filled += run;
        } else if (mode == 1) { /* DIRECT */
            if (pos + 2 > len) return -1;
            int w = FIXED_BITS[(first >> 1) & 0x1F];
            int64_t run = (((int64_t)(first & 1) << 8) | buf[pos + 1]) + 1;
            int64_t ps = packed_size(run, w);
            if (pos + 2 + ps > len || filled + run > count) return -1;
            runpack(buf + pos + 2, run, w, out + filled);
            if (sgn)
                for (int64_t i = 0; i < run; i++)
                    out[filled + i] = (uint64_t)unzz(out[filled + i]);
            pos += 2 + ps; filled += run;
        } else if (mode == 2) { /* PATCHED_BASE */
            if (pos + 4 > len) return -1;
            int w = FIXED_BITS[(first >> 1) & 0x1F];
            int64_t run = (((int64_t)(first & 1) << 8) | buf[pos + 1]) + 1;
            int bw = ((buf[pos + 2] >> 5) & 0x7) + 1;
            int pw = FIXED_BITS[buf[pos + 2] & 0x1F];
            int pgw = ((buf[pos + 3] >> 5) & 0x7) + 1;
            int pll = buf[pos + 3] & 0x1F;
            pos += 4;
            if (pos + bw > len || filled + run > count || run > 512) return -1;
            uint64_t base_field = 0;
            for (int i = 0; i < bw; i++) base_field = (base_field << 8) | buf[pos++];
            int sign = (int)(base_field >> (bw * 8 - 1));
            uint64_t mag = base_field & ((bw == 8) ? ~(1ULL << 63) : ((1ULL << (bw * 8 - 1)) - 1));
            int64_t base = sign ? -(int64_t)mag : (int64_t)mag;
            int64_t ps = packed_size(run, w);
            if (pos + ps > len) return -1;
            uint64_t vals[512];
            runpack(buf + pos, run, w, vals);
            pos += ps;
            int combined = closest_aligned(pgw + pw);
            int64_t eps = packed_size(pll, combined);
            if (pos + eps > len) return -1;
            uint64_t ents[32];
            runpack(buf + pos, pll, combined, ents);
            pos += eps;
            int64_t cur = 0;
            uint64_t pmask = (pw < 64) ? ((1ULL << pw) - 1) : ~0ULL;
            for (int i = 0; i < pll; i++) {
                cur += (int64_t)(ents[i] >> pw);
                uint64_t pv = ents[i] & pmask;
                if (pv != 0 && cur < run) vals[cur] |= pv << w;
            }
            for (int64_t i = 0; i < run; i++)
                out[filled + i] = vals[i] + (uint64_t)base;
            filled += run;
        } else { /* DELTA */
            if (pos + 2 > len) return -1;
            int wcode = (first >> 1) & 0x1F;
            int64_t run = (((int64_t)(first & 1) << 8) | buf[pos + 1]) + 1;
            pos += 2;
            uint64_t ub, ud;
            if (rvarint(buf, len, &pos, &ub) || rvarint(buf, len, &pos, &ud)) return -1;
            uint64_t base = sgn ? (uint64_t)unzz(ub) : ub;
            int64_t d0 = unzz(ud);
            if (filled + run > count) return -1;
            if (wcode == 0 || run <= 2) {
                for (int64_t i = 0; i < run; i++)
                    out[filled + i] = base + (uint64_t)d0 * (uint64_t)i;
                if (wcode != 0 && run > 2)
                    pos += packed_size(run - 2, FIXED_BITS[wcode]);
            } else {
                int w = FIXED_BITS[wcode];
                int64_t ps = packed_size(run - 2, w);
                if (pos + ps > len || run > 512) return -1;
                uint64_t mags[512];
                runpack(buf + pos, run - 2, w, mags);
                pos += ps;
                uint64_t acc = base;
                out[filled] = acc;
                acc += (uint64_t)d0;
                out[filled + 1] = acc;
                for (int64_t i = 0; i < run - 2; i++) {
                    acc += (d0 < 0) ? (uint64_t)(-(int64_t)mags[i]) : mags[i];
                    out[filled + 2 + i] = acc;
                }
            }
            filled += run;
        }
    }
    return pos;
}
"""

_lib = None
_tried = False


def get_lib():
    global _lib, _tried
    if os.environ.get("MOTHRAY_NO_NATIVE") or os.environ.get("MOTHRAY_RLEV2_NUMPY"):
        return None
    if _tried:
        return _lib
    _tried = True
    try:
        tag = hashlib.sha1(_SRC.encode()).hexdigest()[:16]
        so_path = os.path.join(tempfile.gettempdir(), f"mothray_rlev2_{tag}.so")
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
        lib.rlev2_encode.restype = ctypes.c_int64
        lib.rlev2_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int, ctypes.c_void_p,
        ]
        lib.rlev2_decode.restype = ctypes.c_int64
        lib.rlev2_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_void_p,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib
