"""Baseline JPEG (ITU-T T.81) codec — pure numpy + stdlib, no image
libraries.

Scope (stated, not hidden): baseline sequential DCT, 8-bit, grayscale
AND interleaved YCbCr color at 4:4:4 or 4:2:0 subsampling. The
decoder emits the Y PLANE as the image — Y of JFIF YCbCr IS the
ITU-R 601 luma every other decoder in ops/multimodal.py produces, so
chroma blocks are entropy-decoded (the bit stream demands it) but
never reconstructed. Progressive scans, arithmetic coding, 12-bit
precision, and exotic sampling factors return None and fall through
to the caller. The encoder exists so tests and fixtures round-trip
without external tools; it emits the spec's example Huffman tables
(Annex K) and the standard luminance quantization table scaled by a
quality factor.

Public-spec anchors: marker layout T.81 §B, Huffman coding §F.2,
zigzag Fig. A.6, example tables Annex K. The reference engine has no
image path at all — this extends the multimodal family the same way
FSST extends the codec family."""

from __future__ import annotations

import numpy as np

# Annex K.1 luminance quantization table (quality 50 base)
_QT50 = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

# zigzag order (T.81 Fig. A.6): zigzag[k] = flat index into the 8x8
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.3: example DC luminance table (bits per code length, values)
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
# Annex K.5: example AC luminance table
_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """8x8 DCT-II basis matrix C: coefficients = C @ block @ C.T."""
    k = np.arange(8)
    c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0] *= 1.0 / np.sqrt(2.0)
    return c


_C = _dct_matrix()


def _quant_table(quality: int) -> np.ndarray:
    """libjpeg-convention quality scaling of the Annex K table."""
    q = max(1, min(100, int(quality)))
    s = 5000 // q if q < 50 else 200 - 2 * q
    t = (_QT50 * s + 50) // 100
    return np.clip(t, 1, 255).astype(np.int32)


def _huff_encode_tables():
    """(code, length) lookup per symbol for the Annex K tables."""
    out = []
    for bits, vals in ((_DC_BITS, _DC_VALS), (_AC_BITS, _AC_VALS)):
        codes = {}
        code = 0
        vi = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                codes[vals[vi]] = (code, ln)
                code += 1
                vi += 1
            code <<= 1
        out.append(codes)
    return out


_DC_CODES, _AC_CODES = _huff_encode_tables()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing (B.1.1.5)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _pad_edge(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate a float plane up to multiples of (mh, mw)."""
    h, w = plane.shape
    ph, pw = -(-h // mh) * mh, -(-w // mw) * mw
    out = np.empty((ph, pw), dtype=np.float64)
    out[:h, :w] = plane
    out[h:, :w] = plane[-1:, :]
    out[:, w:] = out[:, w - 1 : w]
    return out


def _encode_block(bw: "_BitWriter", block: np.ndarray, qt: np.ndarray, prev_dc: int) -> int:
    coef = _C @ block @ _C.T
    q = np.round(coef / qt).astype(np.int64)
    zz = q.ravel()[_ZIGZAG]
    diff = int(zz[0]) - prev_dc
    cat = _category(diff)
    code, ln = _DC_CODES[cat]
    bw.write(code, ln)
    if cat:
        bw.write(diff if diff > 0 else diff + (1 << cat) - 1, cat)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = _AC_CODES[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        cat = _category(v)
        code, ln = _AC_CODES[(run << 4) | cat]
        bw.write(code, ln)
        bw.write(v if v > 0 else v + (1 << cat) - 1, cat)
        run = 0
    if run:
        code, ln = _AC_CODES[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def _headers(h: int, w: int, qt: np.ndarray, comps: list[tuple]) -> bytes:
    """SOI..SOS marker stream for `comps` = [(id, hv_byte)]."""
    import struct

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    zz_q = qt.ravel()[_ZIGZAG].astype(np.uint8).tobytes()
    sof = struct.pack(">BHHB", 8, h, w, len(comps)) + b"".join(
        bytes([cid, hv, 0]) for cid, hv in comps
    )
    sos = bytes([len(comps)]) + b"".join(bytes([cid, 0x00]) for cid, _ in comps) + bytes(
        [0, 63, 0]
    )
    return (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xDB, bytes([0x00]) + zz_q)
        + seg(0xC0, sof)
        + seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
        + seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
        + seg(0xDA, sos)
    )


def make_jpeg(gray: np.ndarray, quality: int = 75) -> bytes:
    """Encode (h, w) uint8 grayscale as a baseline JFIF JPEG."""
    h, w = gray.shape
    qt = _quant_table(quality)
    img = _pad_edge(gray.astype(np.float64), 8, 8) - 128.0
    bw = _BitWriter()
    prev_dc = 0
    for by in range(0, img.shape[0], 8):
        for bx in range(0, img.shape[1], 8):
            prev_dc = _encode_block(bw, img[by : by + 8, bx : bx + 8], qt, prev_dc)
    return _headers(h, w, qt, [(1, 0x11)]) + bw.flush() + b"\xff\xd9"


def rgb_to_ycbcr(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """JFIF YCbCr (T.871): float64 planes from a (h, w, 3) uint8 RGB."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return y, cb, cr


def make_jpeg_color(rgb: np.ndarray, quality: int = 75, subsample: int = 2) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a baseline interleaved YCbCr JFIF
    JPEG — 4:4:4 (subsample=1) or 4:2:0 (subsample=2, chroma averaged
    2x2). One quant/Huffman table set shared by all components (legal,
    and what this module's decoder exercises)."""
    if subsample not in (1, 2):
        raise ValueError("subsample must be 1 (4:4:4) or 2 (4:2:0)")
    h, w = rgb.shape[:2]
    qt = _quant_table(quality)
    y, cb, cr = rgb_to_ycbcr(rgb)
    s = subsample
    yp = _pad_edge(y, 8 * s, 8 * s) - 128.0
    if s == 2:
        cbs = _pad_edge(cb, 16, 16)
        crs = _pad_edge(cr, 16, 16)
        cbp = cbs.reshape(cbs.shape[0] // 2, 2, cbs.shape[1] // 2, 2).mean(axis=(1, 3)) - 128.0
        crp = crs.reshape(crs.shape[0] // 2, 2, crs.shape[1] // 2, 2).mean(axis=(1, 3)) - 128.0
    else:
        cbp = _pad_edge(cb, 8, 8) - 128.0
        crp = _pad_edge(cr, 8, 8) - 128.0
    bw = _BitWriter()
    dc = [0, 0, 0]
    mcuy, mcux = yp.shape[0] // (8 * s), yp.shape[1] // (8 * s)
    for my in range(mcuy):
        for mx in range(mcux):
            for vy in range(s):
                for vx in range(s):
                    by, bx = (my * s + vy) * 8, (mx * s + vx) * 8
                    dc[0] = _encode_block(bw, yp[by : by + 8, bx : bx + 8], qt, dc[0])
            for ci, plane in ((1, cbp), (2, crp)):
                by, bx = my * 8, mx * 8
                dc[ci] = _encode_block(bw, plane[by : by + 8, bx : bx + 8], qt, dc[ci])
    comps = [(1, (s << 4) | s), (2, 0x11), (3, 0x11)]
    return _headers(h, w, qt, comps) + bw.flush() + b"\xff\xd9"


def _build_decode_table(bits: list[int], vals: list[int]) -> dict:
    """{(length, code): symbol} — decoded by walking code lengths."""
    table = {}
    code = 0
    vi = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[vi]
            code += 1
            vi += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment with 0xFF00
    byte-unstuffing; stops at any other marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> bool:
        d = self.data
        if self.pos >= len(d):
            return False
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 < len(d) and d[self.pos + 1] == 0x00:
                self.pos += 2  # stuffed
            else:
                return False  # a real marker: scan over
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        return True

    def bit(self) -> int | None:
        if self.nbits == 0 and not self._fill():
            return None
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int | None:
        v = 0
        for _ in range(n):
            b = self.bit()
            if b is None:
                return None
            v = (v << 1) | b
        return v


def _receive_extend(br: _BitReader, cat: int) -> int | None:
    if cat == 0:
        return 0
    v = br.bits(cat)
    if v is None:
        return None
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def _huff_decode(br: _BitReader, table: dict) -> int | None:
    code = 0
    for ln in range(1, 17):
        b = br.bit()
        if b is None:
            return None
        code = (code << 1) | b
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    return None


def parse_jpeg(payload) -> np.ndarray | None:
    """Baseline-sequential GRAYSCALE JPEG -> uint8 (h, w). Progressive
    scans, multi-component (color) images, 12-bit precision, and
    arithmetic coding return None (honest fall-through); restart
    markers are handled."""
    data = bytes(payload)
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        return None
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dcs: dict[int, dict] = {}
    acs: dict[int, dict] = {}
    h = w = None
    comps: list[dict] = []  # SOF order: {cid, h, v, qid, dc, ac}
    restart = 0
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            return None  # no scan seen
        if 0xD0 <= marker <= 0xD8 or marker == 0x01:  # standalone markers
            pos += 2
            continue
        ln = int.from_bytes(data[pos + 2 : pos + 4], "big")
        body = data[pos + 4 : pos + 2 + ln]
        if ln < 2 or len(body) != ln - 2:
            return None  # truncated segment
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                if i + 65 > len(body):
                    return None  # lying table count
                prec = body[i] >> 4
                tid = body[i] & 0x0F
                if prec != 0:
                    return None  # 16-bit tables: not baseline-8
                tb = np.frombuffer(body, np.uint8, count=64, offset=i + 1)
                full = np.zeros(64, np.int32)
                full[_ZIGZAG] = tb
                qts[tid] = full.reshape(8, 8)
                i += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            return None  # progressive / extended / arithmetic
        elif marker == 0xC0:  # SOF0 baseline
            if len(body) < 6 or body[0] != 8:
                return None
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            if ncomp not in (1, 3) or len(body) < 6 + 3 * ncomp:
                return None  # gray or YCbCr (stated scope)
            comps = []
            for ci in range(ncomp):
                cid = body[6 + 3 * ci]
                hv = body[7 + 3 * ci]
                comps.append(
                    {"cid": cid, "h": hv >> 4, "v": hv & 0x0F, "qid": body[8 + 3 * ci]}
                )
            if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
                return None  # exotic sampling factors
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if comps[0]["h"] != hmax or comps[0]["v"] != vmax:
                return None  # Y must be the full-resolution component
        elif marker == 0xC4:  # DHT (possibly several)
            i = 0
            while i < len(body):
                if i + 17 > len(body):
                    return None
                cls = body[i] >> 4
                tid = body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                cnt = sum(bits)
                if i + 17 + cnt > len(body):
                    return None
                vals = list(body[i + 17 : i + 17 + cnt])
                (dcs if cls == 0 else acs)[tid] = _build_decode_table(bits, vals)
                i += 17 + cnt
        elif marker == 0xDD:  # DRI
            restart = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS
            if h is None or len(body) < 1 or body[0] != len(comps):
                return None
            if len(body) < 1 + 2 * len(comps) + 3:
                return None
            for si in range(len(comps)):
                scid = body[1 + 2 * si]
                sel = body[2 + 2 * si]
                match = [c for c in comps if c["cid"] == scid]
                if not match:
                    return None
                match[0]["dc"] = sel >> 4
                match[0]["ac"] = sel & 0x0F
            pos = pos + 2 + ln
            break
        pos += 2 + ln
    else:
        return None
    for c in comps:
        if c["qid"] not in qts or c.get("dc") not in dcs or c.get("ac") not in acs:
            return None
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    out = np.zeros((mcuy * 8 * vmax, mcux * 8 * hmax), dtype=np.float64)
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    qt0 = qts[comps[0]["qid"]].ravel()[_ZIGZAG]

    def decode_block(dct: dict, act: dict, ci: int, want_pixels: bool):
        sym = _huff_decode(br, dct)
        if sym is None:
            return None
        diff = _receive_extend(br, sym)
        if diff is None:
            return None
        pred[ci] += diff
        zz = np.zeros(64, dtype=np.int64)
        zz[0] = pred[ci]
        k = 1
        while k < 64:
            sym = _huff_decode(br, act)
            if sym is None:
                return None
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                k += 16
                continue
            k += sym >> 4
            cat = sym & 0x0F
            if k >= 64:
                return None
            v = _receive_extend(br, cat)
            if v is None:
                return None
            zz[k] = v
            k += 1
        if not want_pixels:
            return True  # chroma: stream consumed, pixels discarded
        coef = np.zeros(64, dtype=np.float64)
        coef[_ZIGZAG] = zz * qt0
        return _C.T @ coef.reshape(8, 8) @ _C

    for mi in range(mcux * mcuy):
        if restart and mi and mi % restart == 0:
            br.nbits = 0
            p = br.pos
            while p + 1 < n and not (data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7):
                p += 1
            if p + 1 >= n:
                return None
            br.pos = p + 2
            pred = [0] * len(comps)
        my, mx = divmod(mi, mcux)
        for ci, c in enumerate(comps):
            dct, act = dcs[c["dc"]], acs[c["ac"]]
            for vy in range(c["v"]):
                for vx in range(c["h"]):
                    blk = decode_block(dct, act, ci, want_pixels=(ci == 0))
                    if blk is None:
                        return None
                    if ci == 0:
                        by = (my * vmax + vy) * 8
                        bx = (mx * hmax + vx) * 8
                        out[by : by + 8, bx : bx + 8] = blk
    return np.clip(np.round(out[:h, :w] + 128.0), 0, 255).astype(np.uint8)
