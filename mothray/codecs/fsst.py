"""FSST string compression (Boncz, Neumann, Leis — "FSST: Fast Random
Access String Compression", VLDB 2020). Built from the published paper;
NOT present in the reference repo (north-star extension,
BASELINE.json:6).

Scheme: a table of up to 255 symbols (1..8 bytes each); the corpus
becomes a stream of 1-byte codes, code 255 escaping one literal byte.
Decoding is a table lookup per code — random access, no state.

Implementation notes (numpy, no native code):

* Encoding parallelizes ACROSS LANES, the numpy analog of the paper's
  AVX batch-of-8-strings trick: the buffer splits into K segments, one
  cursor each; every step advances all active cursors by their greedy
  longest match at once (8 masked searchsorted probes against the
  per-length symbol sets). Independently encoded segments concatenate
  into one decodable stream because every segment ends on a token
  boundary.
* Greedy longest match == the paper's parse; the symbol table is
  trained bottom-up over `N_ITER` iterations: encode a sample, count
  token and adjacent-token-pair frequencies, keep the 255 highest
  gain (freq * length) candidates.
* Decoding is fully vectorized: escape positions fall out of the
  parity of runs of 0xFF (a run always starts on a token boundary),
  then one gather/scatter expands all codes.

Table serialization: [n_symbols u8][len u8 x n][symbol bytes].
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
ESCAPE = 255
MAX_SYMBOLS = 255
MAX_SYMBOL_LEN = 8
N_ITER = 5
SAMPLE_BYTES = 1 << 16
_MASKS = np.array([(1 << (8 * l)) - 1 if l < 8 else 0xFFFFFFFFFFFFFFFF for l in range(9)], dtype=np.uint64)


# ------------------------------------------------------------------ table

_HASH_BITS = 12
_HASH_SIZE = 1 << _HASH_BITS
_HASH_MUL = _U64(0x9E3779B97F4A7C15)


def _hash3(w: np.ndarray) -> np.ndarray:
    """Hash of the low 3 bytes of each u64 window (paper §4.4)."""
    return ((w & _U64(0xFFFFFF)) * _HASH_MUL) >> _U64(64 - _HASH_BITS)


class SymbolTable:
    """Lookup layout per the paper: a 65536-entry shortCodes table
    resolves the best symbol of length <= 2 for any 2-byte prefix in
    one gather; symbols of length >= 3 live in a one-candidate-per-slot
    hash table keyed on their first 3 bytes (colliding long symbols are
    dropped at build — legal, they just stop being used)."""

    __slots__ = ("symbols", "short_code", "short_len", "hash_sym", "hash_code", "hash_len",
                 "byte_code", "byte_ok", "sym_flat", "sym_off", "sym_len")

    def __init__(self, symbols: list[bytes]):
        self.symbols = symbols[:MAX_SYMBOLS]
        self.short_code = np.full(65536, ESCAPE, dtype=np.uint8)
        self.short_len = np.zeros(65536, dtype=np.int8)
        self.byte_code = np.full(256, ESCAPE, dtype=np.uint8)
        self.byte_ok = np.zeros(256, dtype=bool)
        self.hash_sym = np.zeros(_HASH_SIZE, dtype=np.uint64)
        self.hash_code = np.full(_HASH_SIZE, ESCAPE, dtype=np.uint8)
        self.hash_len = np.zeros(_HASH_SIZE, dtype=np.int8)
        one_byte: dict[int, int] = {}
        for code, s in enumerate(self.symbols):
            u = int.from_bytes(s.ljust(8, b"\0"), "little") & int(_MASKS[len(s)])
            if len(s) == 1:
                one_byte[u] = code
            elif len(s) == 2:
                self.short_code[u] = code
                self.short_len[u] = 2
            else:
                idx = (((u & 0xFFFFFF) * 0x9E3779B97F4A7C15) % (1 << 64)) >> (64 - _HASH_BITS)
                if self.hash_len[idx] == 0 or len(s) > self.hash_len[idx]:
                    self.hash_sym[idx] = u
                    self.hash_code[idx] = code
                    self.hash_len[idx] = len(s)
        # fill 1-byte symbols into every 2-byte slot still unset
        for b, code in one_byte.items():
            self.byte_code[b] = code
            self.byte_ok[b] = True
            sel = np.arange(256, dtype=np.int64) * 256 + b  # slots whose low byte == b
            unset = self.short_len[sel] == 0
            self.short_code[sel[unset]] = code
            self.short_len[sel[unset]] = 1
        # decoder tables
        lens = np.array([len(s) for s in self.symbols], dtype=np.int64)
        self.sym_flat = np.frombuffer(b"".join(self.symbols), dtype=np.uint8) if self.symbols else np.empty(0, np.uint8)
        self.sym_off = np.concatenate(([0], np.cumsum(lens))).astype(np.int64) if len(lens) else np.zeros(1, np.int64)
        self.sym_len = lens

    def serialize(self) -> bytes:
        return (
            bytes([len(self.symbols)])
            + bytes(len(s) for s in self.symbols)
            + b"".join(self.symbols)
        )

    @classmethod
    def deserialize(cls, data: bytes) -> "SymbolTable":
        # cached: a broadcast plan table is deserialized once per
        # process instead of once per row group × column × stripe
        # (ctor builds a 64K short table + hash table each time)
        data = data if isinstance(data, bytes) else bytes(data)
        cached = _DESERIALIZE_CACHE.get(data)
        if cached is not None:
            return cached
        n = data[0]
        lens = list(data[1 : 1 + n])
        out = []
        pos = 1 + n
        for l in lens:
            out.append(bytes(data[pos : pos + l]))
            pos += l
        table = cls(out)
        if len(_DESERIALIZE_CACHE) >= 64:  # plans hold a handful of tables
            _DESERIALIZE_CACHE.clear()
        _DESERIALIZE_CACHE[data] = table
        return table


_DESERIALIZE_CACHE: dict[bytes, "SymbolTable"] = {}


# ------------------------------------------------------------------ encode

def _windows_u64(buf: np.ndarray) -> np.ndarray:
    """u64 little-endian window at every byte position (padded)."""
    padded = np.concatenate([buf, np.zeros(8, dtype=np.uint8)])
    return np.lib.stride_tricks.sliding_window_view(padded, 8).copy().view("<u8").ravel()


def _encode_lanes(
    buf: np.ndarray,
    table: SymbolTable,
    n_lanes: int,
    collect_tokens: bool = False,
):
    """Greedy longest-match parse of `buf` split into n_lanes segments.

    Returns (encoded bytes, token_starts, token_lens) — token arrays in
    parse order per lane, only when collect_tokens (used in training).
    """
    n = len(buf)
    if n == 0:
        return b"", None, None
    n_lanes = max(1, min(n_lanes, n))
    seg = (n + n_lanes - 1) // n_lanes
    starts = np.arange(n_lanes, dtype=np.int64) * seg
    ends = np.minimum(starts + seg, n)
    win = _windows_u64(buf)

    cursors = starts.copy()
    active = cursors < ends
    out = np.empty((n_lanes, 2 * seg + 2), dtype=np.uint8)
    out_pos = np.zeros(n_lanes, dtype=np.int64)

    tok_starts: list[np.ndarray] = []
    tok_lens: list[np.ndarray] = []
    tok_lane: list[np.ndarray] = []

    while active.any():
        idx = np.nonzero(active)[0]
        cur = cursors[idx]
        w = win[cur]
        rem = ends[idx] - cur
        # one hash probe for symbols of length >= 3
        hidx = _hash3(w)
        hlen = table.hash_len[hidx].astype(np.int64)
        hmatch = (hlen > 0) & (rem >= hlen) & ((w & _MASKS[hlen]) == table.hash_sym[hidx])
        # shortCodes for length <= 2, byte fallback at lane tails
        s2 = (w & _U64(0xFFFF)).astype(np.int64)
        slen = table.short_len[s2].astype(np.int64)
        sok = (slen > 0) & (rem >= slen)
        b1 = (w & _U64(0xFF)).astype(np.int64)
        bok = table.byte_ok[b1]
        best_len = np.where(hmatch, hlen, np.where(sok, slen, np.where(bok, 1, 0)))
        best_code = np.where(
            hmatch,
            table.hash_code[hidx],
            np.where(sok, table.short_code[s2], table.byte_code[b1]),
        ).astype(np.int64)

        is_esc = best_len == 0
        # emit: code byte (or ESCAPE + literal)
        p = out_pos[idx]
        out[idx, p] = np.where(is_esc, ESCAPE, best_code).astype(np.uint8)
        esc_i = idx[is_esc]
        out[esc_i, p[is_esc] + 1] = buf[cur[is_esc]]
        out_pos[idx] = p + 1 + is_esc
        adv = np.where(is_esc, 1, best_len)
        if collect_tokens:
            tok_starts.append(cur)
            tok_lens.append(adv)
            tok_lane.append(idx)
        cursors[idx] = cur + adv
        active[idx] = cursors[idx] < ends[idx]

    chunks = [out[i, : out_pos[i]] for i in range(n_lanes)]
    encoded = np.concatenate(chunks).tobytes() if chunks else b""
    if collect_tokens:
        return encoded, (tok_starts, tok_lens, tok_lane), (starts, ends)
    return encoded, None, None


def _tokens_for_training(buf: np.ndarray, table: SymbolTable):
    """(starts, lens, lane_ids) of the greedy parse, in parse order —
    via the C kernel when available (single sequential lane), else the
    numpy lane encoder."""
    if not table.symbols:  # empty table: every byte escapes (len-1 tokens)
        n = len(buf)
        return (
            np.arange(n, dtype=np.int64),
            np.ones(n, dtype=np.int64),
            np.zeros(n, dtype=np.int64),
        )
    from . import _fsst_native

    lib = _fsst_native.get_lib()
    if lib is not None:
        import ctypes

        n = len(buf)
        padded = np.concatenate([buf, np.zeros(8, dtype=np.uint8)])
        out = np.empty(2 * n + 8, dtype=np.uint8)
        tok_lens = np.empty(n + 1, dtype=np.uint8)
        n_tok = ctypes.c_int64(0)

        def p(a):
            return a.ctypes.data_as(ctypes.c_void_p)

        byte_ok = table.byte_ok.astype(np.uint8)
        lib.fsst_encode_tok(
            p(padded), ctypes.c_int64(n),
            p(table.short_code), p(table.short_len),
            p(table.hash_sym), p(table.hash_code), p(table.hash_len),
            p(table.byte_code), p(byte_ok),
            p(out), p(tok_lens), ctypes.byref(n_tok),
        )
        lens = tok_lens[: n_tok.value].astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        return starts, lens, np.zeros(len(lens), dtype=np.int64)
    n_lanes = max(1, len(buf) // 512)
    _, toks, _ = _encode_lanes(buf, table, n_lanes, collect_tokens=True)
    tok_starts, tok_lens_l, tok_lane = toks
    all_start = np.concatenate(tok_starts)
    all_len = np.concatenate(tok_lens_l)
    all_lane = np.concatenate(tok_lane)
    order = np.lexsort((all_start, all_lane))
    return all_start[order], all_len[order], all_lane[order]


def train(sample: bytes | np.ndarray, n_iter: int = N_ITER) -> SymbolTable:
    """Bottom-up symbol table construction (paper §3.3): iterate
    encode-sample -> count tokens + adjacent pairs -> keep top-gain."""
    buf = np.frombuffer(sample, dtype=np.uint8) if isinstance(sample, (bytes, bytearray)) else sample
    buf = buf[:SAMPLE_BYTES]
    if len(buf) == 0:
        return SymbolTable([])
    win = _windows_u64(buf)
    table = SymbolTable([])
    for _ in range(n_iter):
        s, ln, la = _tokens_for_training(buf, table)
        # singles
        key_s = (win[s] & _MASKS[np.minimum(ln, 8)]) if len(s) else np.empty(0, np.uint64)
        # pairs: adjacent tokens in same lane with combined len <= 8
        same = (la[1:] == la[:-1])
        comb = ln[:-1] + ln[1:]
        ok = same & (comb <= MAX_SYMBOL_LEN)
        key_p = win[s[:-1][ok]] & _MASKS[comb[ok]]
        len_p = comb[ok]

        # vectorized gain accumulation (a python loop over unique
        # symbols here was ~70% of no-plan encode wall): dedupe the
        # (key,len) combos of singles+pairs in one unique pass, sum
        # count*len per combo with bincount, rank with a stable argsort
        # (ties break by combo value — deterministic across runs)
        all_keys = np.concatenate([key_s, key_p]) if len(key_p) else key_s
        all_lens = (
            np.concatenate([np.minimum(ln, 8), len_p]) if len(key_p) else np.minimum(ln, 8)
        )
        if len(all_keys) == 0:
            table = SymbolTable([])
            continue
        combo = all_keys ^ (all_lens.astype(np.uint64) << _U64(60))
        uniq, inv, counts_per_occ = np.unique(combo, return_inverse=True, return_counts=True)
        first = np.zeros(len(uniq), dtype=np.int64)
        first[inv[::-1]] = np.arange(len(combo) - 1, -1, -1)
        rep_keys = all_keys[first]
        rep_lens = all_lens[first].astype(np.int64)
        gains_v = counts_per_occ * rep_lens
        top = np.argsort(-gains_v, kind="stable")[:MAX_SYMBOLS]
        symbols = [
            int(rep_keys[j]).to_bytes(8, "little")[: int(rep_lens[j])] for j in top
        ]
        table = SymbolTable(symbols)
    return table


# ------------------------------------------------------------------ API

def compress(data, n_iter: int = N_ITER) -> tuple[bytes, bytes]:
    """Returns (serialized symbol table, encoded bytes). Empty table
    means passthrough (callers store raw). Trains a fresh table — for
    repeated stripes prefer a shared table from a sampling pass
    (compress_with_table), the north-star actor-pool design.
    `data`: bytes or a uint8 numpy view (zero-copy callers)."""
    if len(data) < 64:
        return b"", data
    buf = data if isinstance(data, np.ndarray) else np.frombuffer(data, dtype=np.uint8)
    table = train(buf, n_iter)
    return compress_with_table(data, table, buf=buf)


def compress_with_table(data, table: SymbolTable, buf: np.ndarray | None = None) -> tuple[bytes, bytes]:
    """Encode with a pre-trained (e.g. broadcast) symbol table.

    Uses the C kernel when a system compiler is available (identical
    stream format), else the lane-parallel numpy encoder."""
    if not table.symbols or len(data) < 64:
        return b"", data
    if buf is None:
        buf = data if isinstance(data, np.ndarray) else np.frombuffer(data, dtype=np.uint8)
    encoded = _native_encode(buf, table)
    if encoded is None:
        n_lanes = int(np.clip(len(buf) // 1024, 1, 1 << 16))
        encoded, _, _ = _encode_lanes(buf, table, n_lanes)
    if len(encoded) >= len(data):
        return b"", data
    return table.serialize(), encoded


def _native_encode(buf: np.ndarray, table: SymbolTable) -> bytes | None:
    from . import _fsst_native

    lib = _fsst_native.get_lib()
    if lib is None:
        return None
    import ctypes

    n = len(buf)
    padded = np.concatenate([buf, np.zeros(8, dtype=np.uint8)])
    out = np.empty(2 * n + 8, dtype=np.uint8)
    byte_ok = table.byte_ok.astype(np.uint8)

    def p(a):
        return a.ctypes.data_as(ctypes.c_void_p)

    written = lib.fsst_encode(
        p(padded), ctypes.c_int64(n),
        p(table.short_code), p(table.short_len),
        p(table.hash_sym), p(table.hash_code), p(table.hash_len),
        p(table.byte_code), p(byte_ok),
        p(out),
    )
    return out[:written].tobytes()


def _native_decode(encoded: bytes, table: SymbolTable, raw_size: int) -> bytes | None:
    from . import _fsst_native

    lib = _fsst_native.get_lib()
    if lib is None:
        return None
    import ctypes

    codes = np.frombuffer(encoded, dtype=np.uint8)
    ns = len(table.symbols)
    sym_off = np.zeros(256, dtype=np.int64)
    sym_len = np.zeros(256, dtype=np.int64)
    sym_off[:ns] = table.sym_off[:ns]
    sym_len[:ns] = table.sym_len[:ns]
    out = np.empty(max(raw_size, 1), dtype=np.uint8)

    def p(a):
        return a.ctypes.data_as(ctypes.c_void_p)

    got = lib.fsst_decode(
        p(codes), ctypes.c_int64(len(codes)),
        p(table.sym_flat if len(table.sym_flat) else np.zeros(1, np.uint8)),
        p(sym_off), p(sym_len),
        p(out), ctypes.c_int64(raw_size),
    )
    if got != raw_size:
        return None  # fall back to numpy path (which raises precisely)
    return out[:raw_size].tobytes()


def decompress(table_bytes: bytes, encoded: bytes, raw_size: int) -> bytes:
    if not table_bytes:
        return encoded
    table = SymbolTable.deserialize(table_bytes)
    native = _native_decode(encoded, table, raw_size)
    if native is not None:
        return native
    codes = np.frombuffer(encoded, dtype=np.uint8)
    n = len(codes)
    if n == 0:
        return b""
    is_ff = codes == ESCAPE
    # runs of 0xFF always start on a token boundary: even offsets within
    # a run are escape markers, odd offsets are escaped literal bytes
    esc_marker = np.zeros(n, dtype=bool)
    ff_pos = np.nonzero(is_ff)[0]
    if len(ff_pos):
        starts_flag = np.ones(len(ff_pos), dtype=bool)
        starts_flag[1:] = np.diff(ff_pos) > 1
        run_idx = np.cumsum(starts_flag) - 1
        offset = ff_pos - ff_pos[starts_flag][run_idx]
        esc_marker[ff_pos[offset % 2 == 0]] = True
    # literal byte positions: marker + 1
    lit_pos = np.nonzero(esc_marker)[0] + 1
    literal = np.zeros(n, dtype=bool)
    literal[lit_pos[lit_pos < n]] = True

    token_start = ~literal
    tok_idx = np.nonzero(token_start)[0]
    tok_codes = codes[tok_idx]
    tok_is_esc = esc_marker[tok_idx]

    src_flat = np.concatenate([table.sym_flat, codes])
    base = len(table.sym_flat)
    sym_start = np.where(tok_is_esc, base + tok_idx + 1, table.sym_off[np.where(tok_is_esc, 0, tok_codes)])
    sym_len = np.where(tok_is_esc, 1, table.sym_len[np.where(tok_is_esc, 0, tok_codes)])

    total = int(sym_len.sum())
    # src index sequence via one cumsum: +1 within a token, jump at
    # token starts (avoids np.repeat over the full output)
    out_off = np.cumsum(sym_len)[:-1]
    d = np.ones(total, dtype=np.int64)
    d[0] = sym_start[0]
    d[out_off] = sym_start[1:] - sym_start[:-1] - sym_len[:-1] + 1
    src = np.cumsum(d)
    out = src_flat[src]
    if raw_size >= 0 and total != raw_size:
        raise ValueError(f"FSST decode size mismatch: {total} != {raw_size}")
    return out.tobytes()
