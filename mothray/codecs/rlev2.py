"""RLEv2 integer codec: SHORT_REPEAT / DIRECT / PATCHED_BASE / DELTA
with per-run data-driven sub-mode selection.

Reimplements the semantics of the reference's LongOutputStreamV2 /
LongInputStreamV2 (reference: pkg/store/LongOutputStreamV2.go:174-432
determineEncoding + the four writers; pkg/store/LongInputStreamV2.go:
48-323 the four readers), with the ORC v0.12 run headers:

  SHORT_REPEAT  00wwwccc               w=value bytes-1, c=count-3 (3..10)
  DIRECT        01wwwwwL LLLLLLLL      w=5-bit width code, L=len-1 (1..512)
  PATCHED_BASE  10wwwwwL LLLLLLLL  (BW-1)<<5|PW  (PGW-1)<<5|PLL
  DELTA         11wwwwwL LLLLLLLL      w=0 -> fixed delta

Deliberate divergences from the reference (we own both ends; round-trip
bit-identity is the contract, not on-disk ORC interop):

* Segmentation is fixed 512-value windows (the reference's MAX_SCOPE,
  LongOutputStreamV2.go:14) classified wholesale, instead of the
  reference's sequential variable-length run scanner — this keeps the
  encoder O(#blocks) numpy ops instead of O(n) Python. Constant runs
  >= MIN_SPLIT_RUN are carved out of the window stream first
  (_segments), recovering the scanner's ratio on run-heavy data.
* PATCHED_BASE patch gaps: first gap is the absolute patch index; a
  zero patch value is a gap-255 filler (same convention as ORC).
* Arithmetic is modular int64 (wrap-around) so INT64_MIN/MAX edges
  round-trip; unsafe (v - min) spans fall back to DIRECT, mirroring
  IsSafeSubtract (LongOutputStreamV2.go:1109-1111).
"""

from __future__ import annotations

import numpy as np

from . import bitpack, varint

MAX_SCOPE = 512
_U64 = np.uint64

SHORT_REPEAT = 0
DIRECT = 1
PATCHED_BASE = 2
DELTA = 3


# ---------------------------------------------------------------- encode

_SUPER = MAX_SCOPE * 512  # values per vectorized super-chunk (bounds temp bit matrices)


def _native():
    from . import _rlev2_native

    return _rlev2_native.get_lib()


def encode(values: np.ndarray, signed: bool = True) -> bytes:
    """RLEv2 encode. Native C sequential encoder when available (bit-
    identical decisions — see _rlev2_native), else the vectorized numpy
    path: classify all 512-value windows of a super-chunk at once
    (min/max/diff/bit-width stats as (k, 512) matrix ops), then emit
    same-mode same-width windows with bulk pack_rows calls."""
    v = np.ascontiguousarray(values)
    v = v.astype(np.int64, copy=False) if signed else v.astype(np.uint64, copy=False)
    lib = _native()
    if lib is not None and len(v):
        import ctypes

        out = np.empty(len(v) * 9 + 1024, dtype=np.uint8)
        n = lib.rlev2_encode(
            v.view(np.uint64).ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(len(v)),
            ctypes.c_int(1 if signed else 0),
            out.ctypes.data_as(ctypes.c_void_p),
        )
        return out[:n].tobytes()
    return _encode_numpy(v, signed)


MIN_SPLIT_RUN = 128  # constant runs at least this long are carved out


def _segments(v: np.ndarray) -> list[tuple[int, int, bool]]:
    """(start, end, is_const) segments: maximal constant runs of length
    >= MIN_SPLIT_RUN become their own segments (the reference's
    sequential scanner takes runs as it finds them,
    LongOutputStreamV2.go:174-239; the fixed-window classifier would
    otherwise forfeit ratio on constant runs that straddle mixed
    512-windows). Boundary detection is vectorized; the python loop is
    over LONG RUNS only."""
    n = len(v)
    if n == 0:
        return []
    change = np.nonzero(v[1:] != v[:-1])[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [n]))
    long = (ends - starts) >= MIN_SPLIT_RUN
    segs: list[tuple[int, int, bool]] = []
    cur = 0
    for s, e in zip(starts[long].tolist(), ends[long].tolist()):
        if s > cur:
            segs.append((cur, s, False))
        segs.append((s, e, True))
        cur = e
    if cur < n:
        segs.append((cur, n, False))
    return segs


def _encode_numpy(v: np.ndarray, signed: bool) -> bytes:
    chunks: list[bytes] = []
    for a, b, is_const in _segments(v):
        seg = v[a:b]
        if is_const:
            for s in range(0, len(seg), MAX_SCOPE):
                out = bytearray()
                _encode_block(seg[s : s + MAX_SCOPE], signed, out)
                chunks.append(bytes(out))
        else:
            for s in range(0, len(seg), _SUPER):
                _encode_super(seg[s : s + _SUPER], signed, chunks)
    return b"".join(chunks)


def _encode_super(v: np.ndarray, signed: bool, chunks: list[bytes]) -> None:
    n = len(v)
    nfull = n // MAX_SCOPE
    tail = v[nfull * MAX_SCOPE :]
    if nfull == 0:
        if len(tail):
            out = bytearray()
            _encode_block(tail, signed, out)
            chunks.append(bytes(out))
        return
    blocks = v[: nfull * MAX_SCOPE].reshape(nfull, MAX_SCOPE)
    i64 = blocks.astype(np.int64, copy=False)
    bmin = blocks.min(axis=1)
    bmax = blocks.max(axis=1)
    if signed:
        span_unsafe = (bmin < 0) & (bmax >= 0) & ((bmax - bmin) < 0)
    else:
        span_unsafe = (bmax - bmin) >= _U64(1) << _U64(63)
    d = np.diff(i64, axis=1)  # (k, 511); exact where span is safe
    dmin = d.min(axis=1)
    dmax = d.max(axis=1)
    fixed = (dmin == dmax) & ~span_unsafe
    mono = ((dmin >= 0) | (dmax <= 0)) & ~span_unsafe & ~fixed
    # A decreasing run whose FIRST delta is 0 must not use DELTA: the decoder
    # infers the sign of all later deltas from d0 (d0<0 ? -mags : mags), so
    # d0==0 would silently decode the run as increasing.
    mono &= ~((d[:, 0] == 0) & (dmin < 0))

    zz = varint.zigzag(i64) if signed else blocks.astype(np.uint64, copy=False)
    widths = bitpack.bit_width(zz)
    wsort = np.sort(widths, axis=1)
    w90 = bitpack.closest_fixed_bits_arr(wsort[:, (MAX_SCOPE * 90) // 100 - 1])
    w100 = bitpack.closest_fixed_bits_arr(wsort[:, -1])

    mags = np.abs(d).astype(np.uint64)
    mag_max = mags[:, 1:].max(axis=1)
    wd = np.maximum(bitpack.closest_fixed_bits_arr(bitpack.bit_width(mag_max)), 2)
    delta_cost = 2 + 10 + 10 + (((MAX_SCOPE - 2) * wd + 7) >> 3)
    direct_cost = 2 + ((MAX_SCOPE * w100 + 7) >> 3)
    delta_var = mono & (delta_cost <= direct_cost)

    patched = ~fixed & ~delta_var & ~span_unsafe & (w100 - w90 > 1)

    # 0 = delta fixed, 1 = delta var, 2 = direct, 3 = patched-base candidate
    mode = np.full(nfull, 2, dtype=np.int8)
    mode[fixed] = 0
    mode[delta_var] = 1
    mode[patched] = 3

    per_block: list[bytes | None] = [None] * nfull

    # base / first-delta varints for all delta blocks at once
    delta_rows = np.nonzero(mode <= 1)[0]
    if len(delta_rows):
        bases = i64[delta_rows, 0]
        ub = varint.zigzag(bases) if signed else blocks[delta_rows, 0].astype(np.uint64)
        base_bytes = varint.encode_unsigned(ub)
        base_off = np.concatenate(([0], np.cumsum(varint.nbytes(ub))))
        d0 = d[delta_rows, 0]
        d0_bytes = varint.encode_unsigned(varint.zigzag(d0))
        d0_off = np.concatenate(([0], np.cumsum(varint.nbytes(varint.zigzag(d0)))))
        base_pos = {int(r): j for j, r in enumerate(delta_rows)}

    hdr_df = bytes([(3 << 6) | ((MAX_SCOPE - 1) >> 8), (MAX_SCOPE - 1) & 0xFF])
    for r in np.nonzero(mode == 0)[0].tolist():
        j = base_pos[r]
        per_block[r] = (
            hdr_df
            + base_bytes[base_off[j] : base_off[j + 1]]
            + d0_bytes[d0_off[j] : d0_off[j + 1]]
        )

    dv_rows = np.nonzero(mode == 1)[0]
    if len(dv_rows):
        for w in np.unique(wd[dv_rows]).tolist():
            rows = dv_rows[wd[dv_rows] == w]
            packed = bitpack.pack_rows(mags[rows, 1:], int(w))
            code = bitpack.encode_bit_width(int(w))
            hdr = bytes([(3 << 6) | (code << 1) | ((MAX_SCOPE - 1) >> 8), (MAX_SCOPE - 1) & 0xFF])
            for i, r in enumerate(rows.tolist()):
                j = base_pos[r]
                per_block[r] = (
                    hdr
                    + base_bytes[base_off[j] : base_off[j + 1]]
                    + d0_bytes[d0_off[j] : d0_off[j + 1]]
                    + packed[i].tobytes()
                )

    dir_rows = np.nonzero(mode == 2)[0]
    if len(dir_rows):
        for w in np.unique(w100[dir_rows]).tolist():
            rows = dir_rows[w100[dir_rows] == w]
            packed = bitpack.pack_rows(zz[rows], int(w))
            code = bitpack.encode_bit_width(int(w))
            hdr = bytes([(1 << 6) | (code << 1) | ((MAX_SCOPE - 1) >> 8), (MAX_SCOPE - 1) & 0xFF])
            for i, r in enumerate(rows.tolist()):
                per_block[r] = hdr + packed[i].tobytes()

    pb_rows = np.nonzero(mode == 3)[0]
    if len(pb_rows):
        _emit_patched_rows(pb_rows, i64, bmin, zz, wsort, signed, per_block)

    chunks.extend(per_block)  # type: ignore[arg-type]
    if len(tail):
        out = bytearray()
        _encode_block(tail, signed, out)
        chunks.append(bytes(out))


def _zz(block: np.ndarray, signed: bool) -> np.ndarray:
    return varint.zigzag(block) if signed else block.astype(np.uint64, copy=False)


def _encode_block(block: np.ndarray, signed: bool, out: bytearray) -> None:
    n = len(block)
    if n == 0:
        return
    if n < 3:
        _write_direct(block, signed, out)
        return

    is_const = bool((block == block[0]).all())
    if is_const:
        if n <= 10:
            _write_short_repeat(block[0], n, signed, out)
        else:
            _write_delta_fixed(int(block[0]), 0, n, signed, out)
        return

    # deltas in python-int-safe space for overflow checks
    lo, hi = int(block.min()), int(block.max())
    span_safe = (hi - lo) < (1 << 63)
    d = np.diff(block.astype(np.int64, copy=False))  # modular; safe when span_safe

    if span_safe:
        if bool((d == d[0]).all()):
            _write_delta_fixed(int(block[0]), int(d[0]), n, signed, out)
            return
        mono_inc = bool((d >= 0).all())
        mono_dec = bool((d <= 0).all())
        # d0==0 on a decreasing run would decode as increasing (sign of
        # later deltas comes from d0); force DIRECT for that case.
        if (mono_inc or mono_dec) and (int(d[0]) != 0 or mono_inc):
            mags = np.abs(d).astype(np.uint64)
            wd = bitpack.closest_fixed_bits(int(bitpack.bit_width(mags[1:]).max())) if n > 2 else 1
            wd = max(wd, 2)  # width code 0 is reserved for fixed delta
            delta_cost = 2 + 10 + 10 + bitpack.packed_size(n - 2, wd)
            zzb = _zz(block, signed)
            w100 = bitpack.closest_fixed_bits(int(bitpack.bit_width(zzb).max()))
            direct_cost = 2 + bitpack.packed_size(n, w100)
            if delta_cost <= direct_cost:
                _write_delta_var(int(block[0]), d, wd, signed, out)
                return

    zzb = _zz(block, signed)
    widths = bitpack.bit_width(zzb)
    w100 = int(widths.max())
    w90 = int(np.percentile(widths, 90, method="lower"))
    if span_safe and bitpack.closest_fixed_bits(w100) - bitpack.closest_fixed_bits(w90) > 1:
        if _try_write_patched(block, signed, lo, out):
            return
    _write_direct_pre(zzb, w100, out)


def _emit_patched_rows(
    pb_rows: np.ndarray,
    i64: np.ndarray,
    bmin: np.ndarray,
    zz: np.ndarray,
    wsort: np.ndarray,
    signed: bool,
    per_block: list,
) -> None:
    """Bulk PATCHED_BASE emission: min-reduction, width percentiles and
    low-bit packing are matrix ops over all candidate windows; only the
    tiny patch lists (<=31 entries each) are assembled per window."""
    k = len(pb_rows)
    m = MAX_SCOPE
    # subtract in int64 (modular) — int64 minus uint64 would promote to
    # float64 and silently drop low bits of values beyond 2^53
    reduced = (i64[pb_rows] - bmin[pb_rows, None].astype(np.int64, copy=False)).astype(np.uint64)
    rw = bitpack.bit_width(reduced)
    rws = np.sort(rw, axis=1)
    w95 = bitpack.closest_fixed_bits_arr(rws[:, (m * 95) // 100 - 1])
    patch_mask = rw > w95[:, None]
    pll = patch_mask.sum(axis=1)

    lo_abs = np.abs(bmin[pb_rows]).astype(np.uint64)
    base_bits = bitpack.bit_width(lo_abs) + 1
    ok = (pll > 0) & (pll <= 31) & (w95 < 64) & (base_bits <= 64)

    for j in np.nonzero(~ok)[0].tolist():
        r = int(pb_rows[j])
        out = bytearray()
        _write_direct_pre(zz[r], int(wsort[r, -1]), out)
        per_block[r] = bytes(out)

    ok_idx = np.nonzero(ok)[0]
    # flat patch structure once: python small-int work per window only
    flat_rows, flat_pos = np.nonzero(patch_mask)
    counts = patch_mask.sum(axis=1)
    cum = np.concatenate(([0], np.cumsum(counts)))
    flat_vals = reduced[flat_rows, flat_pos]
    lo_all = bmin[pb_rows]
    for w in np.unique(w95[ok_idx]).tolist():
        rows = ok_idx[w95[ok_idx] == w]
        mask_bits = (_U64(1) << _U64(w)) - _U64(1) if w < 64 else _U64(0xFFFFFFFFFFFFFFFF)
        packed_low = bitpack.pack_rows(reduced[rows] & mask_bits, int(w))
        wcode = bitpack.encode_bit_width(int(w))
        hdr01 = bytes([(2 << 6) | (wcode << 1) | ((m - 1) >> 8), (m - 1) & 0xFF])
        pvals_w = (flat_vals >> _U64(w)).tolist()
        pos_l = flat_pos.tolist()
        for i, j in enumerate(rows.tolist()):
            r = int(pb_rows[j])
            s, e = int(cum[j]), int(cum[j + 1])
            ent_gaps: list[int] = []
            ent_vals: list[int] = []
            prev = 0
            pmax = 0
            for t in range(s, e):
                g = pos_l[t] - prev
                prev = pos_l[t]
                pv = pvals_w[t]
                if pv > pmax:
                    pmax = pv
                while g > 255:
                    ent_gaps.append(255)
                    ent_vals.append(0)
                    g -= 255
                ent_gaps.append(g)
                ent_vals.append(pv)
            if len(ent_gaps) > 31:
                out = bytearray()
                _write_direct_pre(zz[r], int(wsort[r, -1]), out)
                per_block[r] = bytes(out)
                continue
            pw = bitpack.closest_fixed_bits(max(1, pmax.bit_length()))
            pgw = bitpack.closest_fixed_bits(max(1, max(ent_gaps).bit_length()))
            if pgw + pw > 64:  # gap<<pw must fit one entry word
                out = bytearray()
                _write_direct_pre(zz[r], int(wsort[r, -1]), out)
                per_block[r] = bytes(out)
                continue
            combined = bitpack.closest_aligned_bits(pgw + pw)
            lo = int(lo_all[j])
            mag = abs(lo)
            bw = max(1, (mag.bit_length() + 1 + 7) // 8)
            base_field = (1 << (bw * 8 - 1)) | mag if lo < 0 else mag
            # pack the tiny patch list with python ints (<=31 entries),
            # MSB-first like bitpack.pack
            acc = 0
            for g, pv in zip(ent_gaps, ent_vals):
                acc = (acc << combined) | (g << pw) | pv
            total_bits = len(ent_gaps) * combined
            pad = (-total_bits) % 8
            patch_bytes = (acc << pad).to_bytes((total_bits + pad) // 8, "big")
            per_block[r] = (
                hdr01
                + bytes([((bw - 1) << 5) | bitpack.encode_bit_width(pw), ((pgw - 1) << 5) | len(ent_gaps)])
                + base_field.to_bytes(bw, "big")
                + packed_low[i].tobytes()
                + patch_bytes
            )


def _write_short_repeat(value, count: int, signed: bool, out: bytearray) -> None:
    u = int(varint.zigzag(np.array([value], dtype=np.int64))[0]) if signed else int(value)
    nbytes = max(1, (u.bit_length() + 7) // 8)
    out.append((0 << 6) | ((nbytes - 1) << 3) | (count - 3))
    out.extend(u.to_bytes(nbytes, "big"))


def _write_direct(block: np.ndarray, signed: bool, out: bytearray) -> None:
    zzb = _zz(block, signed)
    _write_direct_pre(zzb, int(bitpack.bit_width(zzb).max()), out)


def _write_direct_pre(zzb: np.ndarray, w100: int, out: bytearray) -> None:
    n = len(zzb)
    w = bitpack.closest_fixed_bits(w100)
    code = bitpack.encode_bit_width(w)
    out.append((1 << 6) | (code << 1) | ((n - 1) >> 8))
    out.append((n - 1) & 0xFF)
    out.extend(bitpack.pack(zzb, w))


def _write_delta_fixed(base: int, delta: int, n: int, signed: bool, out: bytearray) -> None:
    out.append((3 << 6) | (0 << 1) | ((n - 1) >> 8))
    out.append((n - 1) & 0xFF)
    out.extend(_base_varint(base, signed))
    out.extend(varint.encode_signed(np.array([delta], dtype=np.int64)))


def _write_delta_var(base: int, d: np.ndarray, wd: int, signed: bool, out: bytearray) -> None:
    n = len(d) + 1
    code = bitpack.encode_bit_width(wd)
    out.append((3 << 6) | (code << 1) | ((n - 1) >> 8))
    out.append((n - 1) & 0xFF)
    out.extend(_base_varint(base, signed))
    out.extend(varint.encode_signed(np.array([d[0]], dtype=np.int64)))
    if n > 2:
        out.extend(bitpack.pack(np.abs(d[1:]).astype(np.uint64), wd))


def _base_varint(base: int, signed: bool) -> bytes:
    if signed:
        return varint.encode_signed(np.array([base], dtype=np.int64))
    return varint.encode_unsigned(np.array([base], dtype=np.uint64))


def _try_write_patched(block: np.ndarray, signed: bool, lo: int, out: bytearray) -> bool:
    n = len(block)
    # base field: sign-magnitude, magnitude must leave the MSB free
    mag = abs(lo)
    base_bits = mag.bit_length() + 1
    if base_bits > 64:
        return False
    bw = max(1, (base_bits + 7) // 8)

    reduced = (block.astype(np.int64, copy=False) - np.int64(lo)).astype(np.uint64)
    widths = bitpack.bit_width(reduced)
    w95 = int(np.percentile(widths, 95, method="lower"))
    w = bitpack.closest_fixed_bits(w95)
    if w >= 64:
        return False
    patch_mask = widths > w
    pll = int(patch_mask.sum())
    if pll == 0 or pll > 31:
        return False

    patch_pos = np.nonzero(patch_mask)[0]
    patch_vals = (reduced[patch_pos] >> _U64(w)).astype(np.uint64)
    pw = bitpack.closest_fixed_bits(int(bitpack.bit_width(patch_vals).max()))

    gaps = np.diff(patch_pos, prepend=0).astype(np.int64)
    # expand gaps > 255 into (255, 0) fillers
    ent_gaps: list[int] = []
    ent_vals: list[int] = []
    for g, pv in zip(gaps.tolist(), patch_vals.tolist()):
        while g > 255:
            ent_gaps.append(255)
            ent_vals.append(0)
            g -= 255
        ent_gaps.append(g)
        ent_vals.append(pv)
    if len(ent_gaps) > 31:
        return False
    pll = len(ent_gaps)
    pgw = bitpack.closest_fixed_bits(max(1, max(ent_gaps).bit_length()))
    if pgw > 8 or pgw + pw > 64:  # gap<<pw must fit one entry word
        return False
    combined = bitpack.closest_aligned_bits(pgw + pw)

    wcode = bitpack.encode_bit_width(w)
    out.append((2 << 6) | (wcode << 1) | ((n - 1) >> 8))
    out.append((n - 1) & 0xFF)
    out.append(((bw - 1) << 5) | bitpack.encode_bit_width(pw))
    out.append(((pgw - 1) << 5) | pll)
    base_field = (1 << (bw * 8 - 1)) | mag if lo < 0 else mag
    out.extend(base_field.to_bytes(bw, "big"))
    low = reduced & ((_U64(1) << _U64(w)) - _U64(1)) if w < 64 else reduced
    out.extend(bitpack.pack(low, w))
    entries = (np.array(ent_gaps, dtype=np.uint64) << _U64(pw)) | np.array(ent_vals, dtype=np.uint64)
    out.extend(bitpack.pack(entries, combined))
    return True


# ---------------------------------------------------------------- decode

def _scan_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """(unsigned value, new pos) — tiny python scan for header varints."""
    u = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            return u, pos


def _unzz_int(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def decode(data, count: int, signed: bool = True, offset: int = 0):
    """Decode `count` values. Returns (int64|uint64 array, bytes consumed).

    Two passes: a sequential header scan (cheap python per run — run
    payload sizes are derivable from headers), then bulk decode with
    runs grouped by (mode, width, length) so same-shape runs unpack in
    one matrix op (mirror of the encoder's grouped emission)."""
    buf = data if isinstance(data, (bytes, memoryview)) else bytes(data)
    if isinstance(buf, memoryview) and buf.format != "B":
        buf = buf.cast("B")  # signed-format views break header byte scans
    dtype = np.int64 if signed else np.uint64
    out = np.empty(count, dtype=dtype)
    bview = np.frombuffer(buf, dtype=np.uint8)

    lib = _native()
    if lib is not None and count:
        import ctypes

        src = bview[offset:]
        if not src.flags.c_contiguous:
            src = np.ascontiguousarray(src)
        consumed = lib.rlev2_decode(
            src.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_int64(len(src)),
            ctypes.c_int64(count),
            ctypes.c_int(1 if signed else 0),
            out.view(np.uint64).ctypes.data_as(ctypes.c_void_p),
        )
        if consumed < 0:
            raise ValueError("RLEv2 stream misaligned")
        return out, int(consumed)

    direct_groups: dict[tuple[int, int], list[tuple[int, int]]] = {}
    df_groups: dict[int, list[tuple[int, int, int]]] = {}  # run -> (base, d0, dest)
    dv_groups: dict[tuple[int, int], list[tuple[int, int, int, int]]] = {}
    pos = offset
    filled = 0
    while filled < count:
        first = buf[pos]
        mode = first >> 6
        if mode == SHORT_REPEAT:
            nbytes = ((first >> 3) & 0x7) + 1
            run = (first & 0x7) + 3
            u = int.from_bytes(buf[pos + 1 : pos + 1 + nbytes], "big")
            out[filled : filled + run] = _unzz_int(u) if signed else u
            pos += 1 + nbytes
            filled += run
        elif mode == DIRECT:
            w = bitpack.decode_bit_width((first >> 1) & 0x1F)
            run = (((first & 1) << 8) | buf[pos + 1]) + 1
            direct_groups.setdefault((w, run), []).append((pos + 2, filled))
            pos += 2 + bitpack.packed_size(run, w)
            filled += run
        elif mode == PATCHED_BASE:
            run, pos = _decode_patched(buf, pos, out, filled, signed)
            filled += run
        else:  # DELTA
            wcode = (first >> 1) & 0x1F
            run = (((first & 1) << 8) | buf[pos + 1]) + 1
            pos += 2
            ub, pos = _scan_varint(buf, pos)
            base = _unzz_int(ub) if signed else (ub - (1 << 64) if ub >= 1 << 63 else ub)
            ud, pos = _scan_varint(buf, pos)
            d0 = _unzz_int(ud)
            if wcode == 0 or run <= 2:
                df_groups.setdefault(run, []).append((base, d0, filled))
                if wcode != 0 and run > 2:
                    pos += bitpack.packed_size(run - 2, bitpack.decode_bit_width(wcode))
            else:
                w = bitpack.decode_bit_width(wcode)
                dv_groups.setdefault((w, run), []).append((pos, base, d0, filled))
                pos += bitpack.packed_size(run - 2, w)
            filled += run
    if filled != count:
        raise ValueError("RLEv2 stream misaligned")

    for (w, run), entries in direct_groups.items():
        psize = bitpack.packed_size(run, w)
        offs = np.array([e[0] for e in entries], dtype=np.int64)
        dests = np.array([e[1] for e in entries], dtype=np.int64)
        payload = bview[offs[:, None] + np.arange(psize)]
        vals = bitpack.unpack_rows(payload, run, w)
        res = varint.unzigzag(vals.ravel()) if signed else vals.ravel()
        out[(dests[:, None] + np.arange(run)).ravel()] = res

    for run, entries in df_groups.items():
        bases = np.array([e[0] for e in entries], dtype=np.int64)
        d0s = np.array([e[1] for e in entries], dtype=np.int64)
        dests = np.array([e[2] for e in entries], dtype=np.int64)
        vals = bases[:, None] + d0s[:, None] * np.arange(run, dtype=np.int64)
        out[(dests[:, None] + np.arange(run)).ravel()] = vals.ravel().astype(dtype)

    for (w, run), entries in dv_groups.items():
        psize = bitpack.packed_size(run - 2, w)
        offs = np.array([e[0] for e in entries], dtype=np.int64)
        bases = np.array([e[1] for e in entries], dtype=np.int64)
        d0s = np.array([e[2] for e in entries], dtype=np.int64)
        dests = np.array([e[3] for e in entries], dtype=np.int64)
        payload = bview[offs[:, None] + np.arange(psize)]
        mags = bitpack.unpack_rows(payload, run - 2, w).astype(np.int64)
        deltas = np.empty((len(entries), run), dtype=np.int64)
        deltas[:, 0] = bases
        deltas[:, 1] = d0s
        deltas[:, 2:] = np.where(d0s[:, None] < 0, -mags, mags)
        vals = np.cumsum(deltas, axis=1, dtype=np.int64)
        out[(dests[:, None] + np.arange(run)).ravel()] = vals.ravel().astype(dtype)

    return out, pos - offset


def _decode_patched(buf: bytes, pos: int, out: np.ndarray, filled: int, signed: bool) -> tuple[int, int]:
    """Decode one PATCHED_BASE run in place; returns (run, new pos)."""
    first = buf[pos]
    w = bitpack.decode_bit_width((first >> 1) & 0x1F)
    run = (((first & 1) << 8) | buf[pos + 1]) + 1
    b3 = buf[pos + 2]
    b4 = buf[pos + 3]
    bw = ((b3 >> 5) & 0x7) + 1
    pw = bitpack.decode_bit_width(b3 & 0x1F)
    pgw = ((b4 >> 5) & 0x7) + 1
    pll = b4 & 0x1F
    pos += 4
    base_field = int.from_bytes(buf[pos : pos + bw], "big")
    sign = base_field >> (bw * 8 - 1)
    magnitude = base_field & ((1 << (bw * 8 - 1)) - 1)
    base = -magnitude if sign else magnitude
    pos += bw
    vals = bitpack.unpack(buf, run, w, pos)
    pos += bitpack.packed_size(run, w)
    combined = bitpack.closest_aligned_bits(pgw + pw)
    entries = bitpack.unpack(buf, pll, combined, pos)
    pos += bitpack.packed_size(pll, combined)
    gaps = (entries >> _U64(pw)).astype(np.int64)
    pvals = entries & ((_U64(1) << _U64(pw)) - _U64(1)) if pw < 64 else entries
    cur = 0
    for g, pv in zip(gaps.tolist(), pvals.tolist()):
        cur += g
        if pv != 0:
            vals[cur] |= _U64(pv) << _U64(w)
    res = vals.astype(np.int64) + np.int64(base)  # modular, exact for int64 inputs
    if out.dtype == np.int64:
        out[filled : filled + run] = res
    else:
        out[filled : filled + run] = res.astype(np.uint64)
    return run, pos
