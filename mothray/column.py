"""Per-column encode/decode: Arrow array -> ORC-style streams and back.

This is the Ray-Data-side replacement for the reference's ColumnWriter /
ColumnReader families (reference: pkg/store/ColumnWriters.go:24-87
dispatch, pkg/store/ColumnReaders.go). Each writer's per-position Go
loops become vectorized numpy/pyarrow ops over Arrow buffers; the
stream kinds (PRESENT / DATA / LENGTH / DICTIONARY_DATA / SECONDARY)
and their encodings follow SURVEY.md §2.3:

  boolean    PRESENT, DATA(bit-pack over byte-RLE)     BooleanColumnWriter.go:61-93
  int8       PRESENT, DATA(byte-RLE)                   ByteColumnWriter.go:54-83
  int16/32/64, date  PRESENT, DATA(RLEv2 signed)       LongColumnWriter.go:29-77
  float/double       PRESENT, DATA(raw IEEE-754 LE)    DoubleColumnWriter.go:62-76
                     (+ BSS_LE / DICT_LE / ALP north-star extensions,
                      chosen by trial — see codecs/alp.py)
  decimal    PRESENT, DATA(zigzag varint unscaled),
             SECONDARY(scale RLEv2)                    DecimalColumnWriter.go:36-95
  timestamp  PRESENT, DATA(seconds RLEv2),
             SECONDARY(nanos RLEv2 unsigned)           TimestampColumnWriter.go:70-84
  string     dict: DATA(indices) LENGTH DICTIONARY_DATA
             direct: LENGTH, DATA                      SliceDictionaryColumnWriter.go:201-311
             fsst: direct layout + FSST'd DATA         (north-star extension, not in reference)
  binary     PRESENT, LENGTH, DATA                     SliceDirectColumnWriter.go:30-77
  list/map   PRESENT, LENGTH + children                ListColumnWriter.go:28-80
  struct     PRESENT + children                        StructColumnWriter.go:60-90

Null semantics: a PRESENT stream (validity bit-pack) is emitted only
when the column has nulls (equivalent to the reference's lazily
materialized PresentOutputStream, PresentOutputStream.go:27-55); value
streams carry non-null entries only. Divergence from the reference's
dictionary writer: dictionary index 0 is NOT reserved for null — nulls
live solely in PRESENT (simpler, and round-trip-equivalent).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .codecs import boolrle, byterle, rlev2, timestamp, varint
from .codecs import alp as alp_codec
from .codecs import fsst as fsst_codec

# Stream kinds
PRESENT = "PRESENT"
DATA = "DATA"
LENGTH = "LENGTH"
DICTIONARY_DATA = "DICTIONARY_DATA"
SECONDARY = "SECONDARY"

# String encodings
ENC_DIRECT = "DIRECT"
ENC_DICT = "DICT"
ENC_FSST = "FSST"

# reference DictionaryCompressionOptimizer.go:10
DICT_MIN_COMPRESSION_RATIO = 1.25
# reference dictionaryMaxMemory default, MothWriterOptions.go:16
DICT_MAX_BYTES = 16 << 20


@dataclass
class EncodedColumn:
    encoding: str
    num_values: int
    streams: dict[str, bytes] = field(default_factory=dict)
    children: list["EncodedColumn"] = field(default_factory=list)
    extra: dict = field(default_factory=dict)  # e.g. {"dict_size": N}

    def total_bytes(self) -> int:
        return sum(len(v) for v in self.streams.values()) + sum(
            c.total_bytes() for c in self.children
        )


# ------------------------------------------------------------------ helpers

def _flat(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr


def _validity(arr: pa.Array) -> np.ndarray:
    return pc.is_valid(arr).to_numpy(zero_copy_only=False)


def _string_parts_view(values: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(byte lengths, concatenated data VIEW) of a non-null
    string/binary array — zero-copy from the offsets + data buffers.
    The returned uint8 array aliases Arrow memory; callers must not
    mutate it and must keep it buffer-protocol-shaped (1-D uint8)."""
    if len(values) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, np.uint8)
    t = values.type
    odt = np.int64 if t in (pa.large_string(), pa.large_binary()) else np.int32
    bufs = values.buffers()
    offs = np.frombuffer(
        bufs[1], dtype=odt, count=len(values) + 1, offset=values.offset * np.dtype(odt).itemsize
    ).astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)[offs[0] : offs[-1]] if bufs[2] is not None else np.empty(0, np.uint8)
    lengths = np.diff(offs)
    return lengths, data


def _string_parts(values: pa.Array) -> tuple[np.ndarray, bytes]:
    """As _string_parts_view but with the data materialized to bytes
    (for callers that store or ship it; hot encode paths use the view)."""
    lengths, data = _string_parts_view(values)
    return lengths, data.tobytes()


def _offsets_dtype(t: pa.DataType):
    return np.int64 if t in (pa.large_string(), pa.large_binary()) or pa.types.is_large_list(t) else np.int32


def _primitive_np(values: pa.Array, dtype) -> np.ndarray:
    return values.to_numpy(zero_copy_only=False).astype(dtype, copy=False)


def _float_bits(v: np.ndarray):
    """The lossless uint view of a float array (bit patterns, so NaN
    payloads and -0.0 survive every dictionary/unique round trip)."""
    return v.view(np.uint32 if v.dtype.itemsize == 4 else np.uint64)


def _float_dict_parts(v: np.ndarray):
    """(dict_bytes, index_stream) of the per-stripe float dictionary,
    or None when the column's cardinality makes a dictionary useless
    (more than half the values distinct)."""
    u = _float_bits(v)
    uniq, inv = np.unique(u, return_inverse=True)
    if len(uniq) > max(len(u) // 2, 1):
        return None
    return uniq.tobytes(), rlev2.encode(inv.astype(np.uint64), signed=False)


def _int_dict_parts(v: np.ndarray, signed: bool):
    """(dict_bytes, index_stream) for an integer dictionary — sorted
    unique values as raw LE words (count = len/8, no header needed) +
    RLEv2 indices — or None when cardinality is too high. Wins over
    direct RLEv2 on WIDE low-cardinality columns (64-bit hash/id
    values repeated across rows: direct pays max-bit-width per row,
    the dictionary pays log2(card))."""
    uniq, inv = np.unique(v, return_inverse=True)
    if len(uniq) > max(len(v) // 2, 1):
        return None
    return uniq.tobytes(), rlev2.encode(inv.astype(np.uint64), signed=False)


_DICT_AMORTIZE_ROWS = 65536  # nominal stripe rows the dictionary amortizes over


def _int_trial(v: np.ndarray, codec: str, signed: bool, max_values: int = 4096) -> str:
    """Plan-pass rlev2-vs-dict choice for integer columns (same
    trial-compression philosophy as _float_trial), compared in BYTES
    PER ROW: the index stream scales with rows while the dictionary is
    a fixed cost paid once per stripe, so it is amortized over a
    nominal stripe row count rather than the (small) trial sample —
    otherwise wide hash/id columns never pick dict. Requires a 1.25x
    win (DICT_MIN_COMPRESSION_RATIO) so near-ties keep the
    reference-faithful RLEv2 path."""
    if codec == "none":
        return "rlev2"
    from .codecs import frames

    s = v[:max_values]
    _, zr = frames.compress_parts(rlev2.encode(s, signed=signed), codec)
    parts = _int_dict_parts(s, signed)
    if parts is None:
        return "rlev2"
    _, zd0 = frames.compress_parts(parts[0], codec)
    _, zd1 = frames.compress_parts(parts[1], codec)
    per_row_rlev2 = len(zr) / len(s)
    per_row_dict = len(zd1) / len(s) + len(zd0) / _DICT_AMORTIZE_ROWS
    return "dict" if per_row_rlev2 >= DICT_MIN_COMPRESSION_RATIO * per_row_dict else "rlev2"


def _float_trial(v: np.ndarray, codec: str, max_values: int = 4096,
                 allow_alp: bool = True) -> str:
    """Data-driven raw-vs-bss-vs-dict-vs-alp choice for float columns:
    trial-compress a bounded sample each way under the stripe codec and
    keep the smallest (the reference's compression-ratio-model
    philosophy, DictionaryCompressionOptimizer.go:128-142, applied to
    floats). 'dict' wins on decimal-quantized low-cardinality columns
    (discounts, rates); 'alp' wins on decimal-quantized HIGH-cardinality
    columns (prices) where the re-scaled integers RLEv2 tighter than any
    whole-value scheme; the per-stripe fallbacks in _encode_values
    protect against head-sample bias."""
    if codec == "none":
        return "raw"
    from .codecs import frames

    s = v[:max_values]
    w = s.dtype.itemsize
    planes = np.ascontiguousarray(s.view(np.uint8).reshape(-1, w).T)
    _, zb = frames.compress_parts(planes.tobytes(), codec)
    _, zr = frames.compress_parts(s.tobytes(), codec)
    best, size = ("bss", len(zb)) if len(zb) < len(zr) else ("raw", len(zr))
    dparts = _float_dict_parts(s)
    if dparts is not None:
        _, zd0 = frames.compress_parts(dparts[0], codec)
        _, zd1 = frames.compress_parts(dparts[1], codec)
        if len(zd0) + len(zd1) < size:
            best, size = "dict", len(zd0) + len(zd1)
    if allow_alp:
        aparts = alp_codec.encode_parts(s)
        if aparts is not None:
            asize = sum(
                len(frames.compress_parts(part, codec)[1])
                for part in aparts.values()
            )
            if asize < size:
                return "alp"
    return best


# ------------------------------------------------------------------ encode

def encode_array(arr: pa.Array | pa.ChunkedArray, opts: dict | None = None) -> EncodedColumn:
    arr = _flat(arr)
    opts = opts or {}
    n = len(arr)
    streams: dict[str, bytes] = {}
    if arr.null_count > 0:
        streams[PRESENT] = boolrle.encode(_validity(arr))
        values = arr.drop_null()
    else:
        values = arr

    t = arr.type
    enc = _encode_values(values, t, opts)
    enc.streams.update(streams)
    enc.num_values = n
    return enc


def _encode_values(values: pa.Array, t: pa.DataType, opts: dict) -> EncodedColumn:
    if pa.types.is_boolean(t):
        bools = values.to_numpy(zero_copy_only=False)
        return EncodedColumn("RLE", len(values), {DATA: boolrle.encode(bools)})
    if pa.types.is_int8(t):
        v = _primitive_np(values, np.int8)
        return EncodedColumn("BYTE_RLE", len(values), {DATA: byterle.encode(v.view(np.uint8))})
    if t in (pa.int16(), pa.int32(), pa.int64()):
        v = _primitive_np(values, np.int64)
        if opts.get("int_encoding") == "dict" and len(v) >= 64:
            parts = _int_dict_parts(v, signed=True)
            if parts is not None:
                return EncodedColumn(
                    "DICT_I64", len(values), {DICTIONARY_DATA: parts[0], DATA: parts[1]}
                )
        return EncodedColumn("RLEV2", len(values), {DATA: rlev2.encode(v, signed=True)})
    if t in (pa.uint8(), pa.uint16(), pa.uint32(), pa.uint64()):
        v = values.to_numpy(zero_copy_only=False).astype(np.uint64)
        if opts.get("int_encoding") == "dict" and len(v) >= 64:
            parts = _int_dict_parts(v, signed=False)
            if parts is not None:
                return EncodedColumn(
                    "DICT_U64", len(values), {DICTIONARY_DATA: parts[0], DATA: parts[1]}
                )
        return EncodedColumn("RLEV2U", len(values), {DATA: rlev2.encode(v, signed=False)})
    if pa.types.is_date32(t):
        v = values.cast(pa.int32()).to_numpy(zero_copy_only=False).astype(np.int64)
        return EncodedColumn("RLEV2", len(values), {DATA: rlev2.encode(v, signed=True)})
    if t in (pa.float32(), pa.float64()):
        v = values.to_numpy(zero_copy_only=False)
        mode = opts.get("float_encoding", "auto")
        if mode == "auto" and len(v) >= 64:
            mode = _float_trial(v, opts.get("compression", "zstd"))
        if mode == "alp" and len(v) > 0:
            # ALP (north-star extension, codecs/alp.py): decimal-rescaled
            # ints through RLEv2 + bit-verified raw exceptions. Falls
            # back to the non-ALP trial when THIS stripe's exception
            # fraction is too high (plan sample may not represent it).
            parts = alp_codec.encode_parts(v)
            if parts is not None:
                return EncodedColumn(
                    "ALP", len(values),
                    {DATA: parts["DATA"], SECONDARY: parts["SECONDARY"],
                     DICTIONARY_DATA: parts["DICTIONARY_DATA"]},
                )
            mode = _float_trial(v, opts.get("compression", "zstd"), allow_alp=False)
        if mode == "dict" and len(v) >= 64:
            # FLOAT DICTIONARY (north-star extension like FSST/BSS; the
            # reference only dictionaries strings): per-stripe unique
            # bit patterns + RLEv2 indices. Falls back to the raw/bss
            # trial when THIS stripe's cardinality is too high (the
            # plan's head sample may not represent every stripe).
            parts = _float_dict_parts(v)
            if parts is not None:
                return EncodedColumn(
                    "DICT_LE", len(values),
                    {DICTIONARY_DATA: parts[0], DATA: parts[1]},
                )
            mode = _float_trial(v, opts.get("compression", "zstd"))
        if mode == "bss" and len(v) >= 64:
            # BYTE-STREAM-SPLIT (north-star extension like FSST; the
            # reference writes raw LE, DoubleOutputStream.go:26-28):
            # transpose the w bytes of each value into w planes —
            # sign/exponent bytes become near-constant runs, which the
            # zstd stream framing then compresses far better. Lossless
            # byte permutation (NaN payloads, -0.0 preserved exactly).
            # Chosen per run by trial: BSS loses on decimal-quantized
            # values where zstd exploits whole-value repeats.
            w = v.dtype.itemsize
            planes = np.ascontiguousarray(v.view(np.uint8).reshape(-1, w).T)
            return EncodedColumn("BSS_LE", len(values), {DATA: planes.tobytes()})
        return EncodedColumn("RAW_LE", len(values), {DATA: v.tobytes()})
    if pa.types.is_timestamp(t):
        if t.unit == "ns":
            raw = values.cast(pa.int64()).to_numpy(zero_copy_only=False)
            seconds = np.floor_divide(raw, 1_000_000_000) - timestamp.MOTH_EPOCH_MICROS // 1_000_000
            nanos = np.mod(raw, 1_000_000_000)
        else:
            if t.unit != "us":
                values = values.cast(pa.timestamp("us", tz=t.tz))  # s/ms -> us lossless
            micros = values.cast(pa.int64()).to_numpy(zero_copy_only=False)
            seconds, nanos = timestamp.micros_to_seconds_nanos(micros)
        return EncodedColumn(
            "TS_SPLIT",
            len(values),
            {
                DATA: rlev2.encode(seconds, signed=True),
                SECONDARY: rlev2.encode(timestamp.encode_nanos(nanos), signed=False),
            },
        )
    if pa.types.is_time(t):
        # reference TimeColumnWriter.go:16-31 (picos->micros LongColumnWriter variant)
        v = values.cast(pa.int64() if t.bit_width == 64 else pa.int32()).to_numpy(zero_copy_only=False).astype(np.int64)
        return EncodedColumn("RLEV2", len(values), {DATA: rlev2.encode(v, signed=True)})
    if pa.types.is_decimal(t):
        return _encode_decimal(values, t)
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return _encode_strings(values, t, opts)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        counts = pc.list_value_length(values).to_numpy(zero_copy_only=False).astype(np.uint64)
        child = encode_array(values.flatten(), opts)
        return EncodedColumn(
            "LIST", len(values), {LENGTH: rlev2.encode(counts, signed=False)}, [child]
        )
    if pa.types.is_map(t):
        moffs = values.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(moffs).astype(np.uint64)
        lo, hi = (int(moffs[0]), int(moffs[-1])) if len(moffs) else (0, 0)
        keys = encode_array(values.keys.slice(lo, hi - lo), opts)
        items = encode_array(values.items.slice(lo, hi - lo), opts)
        return EncodedColumn(
            "MAP", len(values), {LENGTH: rlev2.encode(counts, signed=False)}, [keys, items]
        )
    if pa.types.is_struct(t):
        children = [encode_array(values.field(i), opts) for i in range(t.num_fields)]
        return EncodedColumn("STRUCT", len(values), {}, children)
    if pa.types.is_union(t):
        return _encode_union(values, t, opts)
    raise NotImplementedError(f"unsupported type: {t}")


def _encode_union(values: pa.Array, t, opts: dict) -> EncodedColumn:
    """UNION (dense or sparse): tag stream (byte-RLE of the child
    POSITION per row) + one child per field holding only that tag's
    values in row order. The reference READS union but its writer
    panics (reference pkg/store/ColumnReaders.go:39-44 vs
    ColumnWriters.go:83-86); we close the asymmetry and write it too.
    Dense offsets are re-derived canonically at decode (the k-th row
    of tag c maps to child-c index k), so arbitrary input offsets
    round-trip to logically equal arrays."""
    n = len(values)
    # read type codes / offsets from the RAW buffers with the slice
    # offset applied: the .type_codes/.offsets accessors ignore a
    # parent slice (pyarrow returns them from position 0), which would
    # silently encode the wrong rows for any sliced union
    off = values.offset
    bufs = values.buffers()
    codes = np.frombuffer(bufs[1], dtype=np.int8, count=n, offset=off)
    tcodes = np.array(t.type_codes, dtype=np.int8)
    pos_of = np.zeros(128, dtype=np.uint8)
    for p, c in enumerate(tcodes.tolist()):
        pos_of[c] = p
    positions = pos_of[codes]
    dense = t.mode == "dense"
    # dense: offsets reference the FULL (unsliced) children, which is
    # exactly what field(p) returns for a sliced dense union
    offs = np.frombuffer(bufs[2], dtype=np.int32, count=n, offset=4 * off) if dense else None
    children = []
    for p in range(t.num_fields):
        mask = positions == p
        child = values.field(p)
        if dense:
            gathered = child.take(pa.array(offs[mask]))
        else:
            gathered = child.filter(pa.array(mask))
        children.append(encode_array(gathered, opts))
    return EncodedColumn(
        "UNION", n, {DATA: byterle.encode(positions.astype(np.uint8))}, children
    )


def _encode_decimal(values: pa.Array, t) -> EncodedColumn:
    n = len(values)
    buf = values.buffers()[1]
    raw = np.frombuffer(buf, dtype=np.uint8, count=n * 16, offset=values.offset * 16).reshape(n, 16)
    lo = raw[:, :8].copy().view("<u8").ravel()
    hi = raw[:, 8:].copy().view("<i8").ravel()
    if t.precision <= 18:
        unscaled = lo.astype(np.int64)  # hi is pure sign extension
        data = varint.encode_signed(unscaled)
        enc = "DECIMAL64"
    else:
        data = varint.encode_zigzag128(lo, hi)  # vectorized 128-bit zigzag LEB128
        enc = "DECIMAL128"
    scale = np.full(n, t.scale, dtype=np.int64)
    return EncodedColumn(enc, n, {DATA: data, SECONDARY: rlev2.encode(scale, signed=True)})


def _encode_strings(values: pa.Array, t, opts: dict) -> EncodedColumn:
    n = len(values)
    # zero-copy view of the concatenated payload: direct/FSST streams
    # carry it through to the single-pass blob assembly uncopied
    lengths, data = _string_parts_view(values)
    choice = opts.get("string_encoding", "auto")
    is_text = pa.types.is_string(t) or pa.types.is_large_string(t)

    if choice in ("auto", "dict") and is_text and n > 0:
        dict_enc = _try_dictionary(
            values, lengths, data, force=(choice == "dict"), budget=opts.get("_dict_budget")
        )
        if dict_enc is not None:
            return dict_enc
        if choice == "auto" and opts.get("fsst_enabled", True) and len(data) >= 4096:
            choice = "fsst"

    if choice == "fsst" and len(data) >= 64:
        shared = opts.get("fsst_table")
        if shared is not None:  # broadcast table from the sampling pass
            table, enc_data = fsst_codec.compress_with_table(
                data, fsst_codec.SymbolTable.deserialize(shared)
            )
        else:
            table, enc_data = fsst_codec.compress(data)
        if len(enc_data) + len(table) < len(data):
            return EncodedColumn(
                ENC_FSST,
                n,
                {
                    LENGTH: rlev2.encode(lengths.astype(np.uint64), signed=False),
                    DATA: enc_data,
                    DICTIONARY_DATA: table,  # FSST symbol table rides the dict slot
                },
            )

    return EncodedColumn(
        ENC_DIRECT,
        n,
        {LENGTH: rlev2.encode(lengths.astype(np.uint64), signed=False), DATA: data},
    )


def _index_bytes_per_value(card: int) -> int:
    # reference DictionaryCompressionOptimizer.EstimateIndexBytesPerValue:214-225
    if card <= 256:
        return 1
    if card <= 65536:
        return 2
    if card <= 1 << 24:
        return 3
    return 4


def _try_dictionary(
    values: pa.Array, lengths: np.ndarray, data: bytes, force: bool, budget: dict | None = None
) -> EncodedColumn | None:
    n = len(values)
    dict_arr = pc.dictionary_encode(values)
    dictionary = dict_arr.dictionary
    card = len(dictionary)
    dlen, ddata = _string_parts(dictionary)
    raw_bytes = len(data)
    est_cost = len(ddata) + n * _index_bytes_per_value(card)
    if not force and (est_cost == 0 or raw_bytes / max(est_cost, 1) < DICT_MIN_COMPRESSION_RATIO):
        return None
    if len(ddata) > DICT_MAX_BYTES:  # reference per-dictionary memory cap
        return None
    if budget is not None:
        # CROSS-COLUMN budget per encode task (reference
        # DictionaryCompressionOptimizer.go:166-208: total dictionary
        # memory is bounded; columns beyond it convert to direct). A
        # wide schema of mid-cardinality strings can otherwise hold
        # many dictionaries at once. The sampling-pass plan performs
        # the ratio-ordered eviction (plan.build_plan); this in-task
        # counter is the hard backstop for the unplanned path.
        if budget.get("remaining", DICT_MAX_BYTES) < len(ddata):
            return None
        budget["remaining"] = budget.get("remaining", DICT_MAX_BYTES) - len(ddata)
    # sort dictionary lexically (UTF-8 byte order == codepoint order),
    # remap indices — reference SliceDictionaryColumnWriter.go:313-336
    perm = pc.sort_indices(dictionary).to_numpy(zero_copy_only=False).astype(np.int64)
    inv = np.empty(card, dtype=np.int64)
    inv[perm] = np.arange(card)
    indices = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    new_indices = inv[indices].astype(np.uint64)
    sorted_dict = dictionary.take(pa.array(perm))
    sdlen, sddata = _string_parts(sorted_dict)
    return EncodedColumn(
        ENC_DICT,
        n,
        {
            DATA: rlev2.encode(new_indices, signed=False),
            LENGTH: rlev2.encode(sdlen.astype(np.uint64), signed=False),
            DICTIONARY_DATA: sddata,
        },
        extra={"dict_size": card},
    )


# ------------------------------------------------------------------ decode

def decode_array(enc: EncodedColumn, t: pa.DataType) -> pa.Array:
    n = enc.num_values
    if PRESENT in enc.streams:
        valid, _ = boolrle.decode(enc.streams[PRESENT], n)
        n_valid = int(valid.sum())
        values = _decode_values(enc, t, n_valid)
        idx = np.full(n, -1, dtype=np.int64)
        idx[valid] = np.arange(n_valid)
        indices = pa.array(idx, mask=~valid, type=pa.int64())
        return values.take(indices)
    return _decode_values(enc, t, n)


def _decode_values(enc: EncodedColumn, t: pa.DataType, n: int) -> pa.Array:
    s = enc.streams
    if pa.types.is_boolean(t):
        bools, _ = boolrle.decode(s[DATA], n)
        return pa.array(bools, type=pa.bool_())
    if pa.types.is_int8(t):
        v, _ = byterle.decode(s[DATA], n)
        return pa.array(v.view(np.int8), type=t)
    if t in (pa.int16(), pa.int32(), pa.int64()):
        if enc.encoding == "DICT_I64":
            idx, _ = rlev2.decode(s[DATA], n, signed=False)
            uniq = np.frombuffer(s[DICTIONARY_DATA], dtype=np.int64)
            return pa.array(uniq[idx], type=pa.int64()).cast(t)
        v, _ = rlev2.decode(s[DATA], n, signed=True)
        return pa.array(v, type=pa.int64()).cast(t)
    if t in (pa.uint8(), pa.uint16(), pa.uint32(), pa.uint64()):
        if enc.encoding == "DICT_U64":
            idx, _ = rlev2.decode(s[DATA], n, signed=False)
            uniq = np.frombuffer(s[DICTIONARY_DATA], dtype=np.uint64)
            return pa.array(uniq[idx], type=pa.uint64()).cast(t)
        v, _ = rlev2.decode(s[DATA], n, signed=False)
        return pa.array(v, type=pa.uint64()).cast(t)
    if pa.types.is_date32(t):
        v, _ = rlev2.decode(s[DATA], n, signed=True)
        return pa.array(v.astype(np.int32), type=pa.int32()).cast(t)
    if t in (pa.float32(), pa.float64()):
        dt = np.float32 if t == pa.float32() else np.float64
        if enc.encoding == "ALP":
            return pa.array(alp_codec.decode(s, n, dt), type=t)
        if enc.encoding == "BSS_LE":
            w = np.dtype(dt).itemsize
            planes = np.frombuffer(s[DATA], dtype=np.uint8, count=n * w).reshape(w, n)
            v = np.ascontiguousarray(planes.T).reshape(-1).view(dt)
            return pa.array(v, type=t)
        if enc.encoding == "DICT_LE":
            idx, _ = rlev2.decode(s[DATA], n, signed=False)
            uniq = np.frombuffer(
                s[DICTIONARY_DATA], dtype=np.uint32 if dt == np.float32 else np.uint64
            )
            return pa.array(uniq[idx].view(dt), type=t)
        return pa.array(np.frombuffer(s[DATA], dtype=dt, count=n), type=t)
    if pa.types.is_timestamp(t):
        seconds, _ = rlev2.decode(s[DATA], n, signed=True)
        enc_nanos, _ = rlev2.decode(s[SECONDARY], n, signed=False)
        nanos = timestamp.decode_nanos(enc_nanos)
        if t.unit == "ns":
            raw = (seconds + timestamp.MOTH_EPOCH_MICROS // 1_000_000) * 1_000_000_000 + nanos
            return pa.array(raw, type=pa.int64()).cast(pa.timestamp("ns", tz=t.tz)).cast(t)
        micros = timestamp.seconds_nanos_to_micros(seconds, nanos)
        return pa.array(micros, type=pa.int64()).cast(pa.timestamp("us", tz=t.tz)).cast(t)
    if pa.types.is_time(t):
        v, _ = rlev2.decode(s[DATA], n, signed=True)
        if t.bit_width == 64:
            return pa.array(v, type=pa.int64()).cast(t)
        return pa.array(v.astype(np.int32), type=pa.int32()).cast(t)
    if pa.types.is_decimal(t):
        return _decode_decimal(enc, t, n)
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return _decode_strings(enc, t, n)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        counts, _ = rlev2.decode(s[LENGTH], n, signed=False)
        child = decode_array(enc.children[0], t.value_type)
        odt = np.int64 if pa.types.is_large_list(t) else np.int32
        offs = np.concatenate(([0], np.cumsum(counts.astype(np.int64)))).astype(odt)
        cls = pa.LargeListArray if pa.types.is_large_list(t) else pa.ListArray
        return cls.from_arrays(pa.array(offs), child).cast(t)
    if pa.types.is_map(t):
        counts, _ = rlev2.decode(s[LENGTH], n, signed=False)
        keys = decode_array(enc.children[0], t.key_type)
        items = decode_array(enc.children[1], t.item_type)
        offs = np.concatenate(([0], np.cumsum(counts.astype(np.int64)))).astype(np.int32)
        return pa.MapArray.from_arrays(pa.array(offs, type=pa.int32()), keys, items).cast(t)
    if pa.types.is_union(t):
        positions, _ = byterle.decode(enc.streams[DATA], n)
        positions = positions.astype(np.int64)
        tcodes = np.array(t.type_codes, dtype=np.int8)
        types_arr = pa.array(tcodes[positions], type=pa.int8())
        names = [t.field(i).name for i in range(t.num_fields)]
        children = [decode_array(c, t.field(i).type) for i, c in enumerate(enc.children)]
        if t.mode == "dense":
            offs = np.zeros(n, dtype=np.int32)
            for p in range(t.num_fields):
                m = positions == p
                offs[m] = np.arange(int(m.sum()), dtype=np.int32)
            return pa.UnionArray.from_dense(
                types_arr, pa.array(offs, type=pa.int32()), children, names, tcodes.tolist()
            )
        full = []
        for p, ch in enumerate(children):
            m = positions == p
            idx = np.full(n, -1, dtype=np.int64)
            idx[m] = np.arange(int(m.sum()))
            full.append(ch.take(pa.array(idx, mask=idx < 0)))
        return pa.UnionArray.from_sparse(types_arr, full, names, tcodes.tolist())
    if pa.types.is_struct(t):
        fields = [decode_array(c, t.field(i).type) for i, c in enumerate(enc.children)]
        return pa.StructArray.from_arrays(fields, fields=[t.field(i) for i in range(t.num_fields)])
    raise NotImplementedError(f"unsupported type: {t}")


def _decode_decimal(enc: EncodedColumn, t, n: int) -> pa.Array:
    s = enc.streams
    if enc.encoding == "DECIMAL64":
        unscaled, _ = varint.decode_signed(s[DATA], n)
        lo = unscaled.astype(np.int64)
        raw = np.empty((n, 16), dtype=np.uint8)
        raw[:, :8] = lo.view(np.uint8).reshape(n, 8)
        raw[:, 8:] = np.where(lo < 0, 255, 0)[:, None].astype(np.uint8)
        return pa.Array.from_buffers(t, n, [None, pa.py_buffer(raw.tobytes())])
    # DECIMAL128: vectorized 128-bit zigzag LEB128 into (lo, hi) limbs
    rlo, rhi, _ = varint.decode_zigzag128(s[DATA], n)
    raw = np.empty((n, 16), dtype=np.uint8)
    raw[:, :8] = rlo.view(np.uint8).reshape(n, 8)
    raw[:, 8:] = rhi.view(np.uint8).reshape(n, 8)
    return pa.Array.from_buffers(t, n, [None, pa.py_buffer(raw.tobytes())])


def _build_string_array(t, lengths: np.ndarray, data: bytes, n: int) -> pa.Array:
    odt = _offsets_dtype(t)
    offs = np.concatenate(([0], np.cumsum(lengths.astype(np.int64)))).astype(odt)
    return pa.Array.from_buffers(t, n, [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(data)])


def _decode_strings(enc: EncodedColumn, t, n: int) -> pa.Array:
    s = enc.streams
    if enc.encoding == ENC_DICT:
        indices, _ = rlev2.decode(s[DATA], n, signed=False)
        card = enc.extra["dict_size"]
        dlen, _ = rlev2.decode(s[LENGTH], card, signed=False)
        dict_arr = _build_string_array(
            pa.utf8() if not pa.types.is_large_string(t) else pa.large_utf8(),
            dlen.astype(np.int64),
            s[DICTIONARY_DATA],
            len(dlen),
        )
        return dict_arr.take(pa.array(indices.astype(np.int64))).cast(t)
    if enc.encoding == ENC_FSST:
        lengths, _ = rlev2.decode(s[LENGTH], n, signed=False)
        data = fsst_codec.decompress(s[DICTIONARY_DATA], s[DATA], int(lengths.astype(np.int64).sum()))
        return _build_string_array(t, lengths.astype(np.int64), data, n)
    lengths, _ = rlev2.decode(s[LENGTH], n, signed=False)
    return _build_string_array(t, lengths.astype(np.int64), s[DATA], n)
