"""Column round-trip property tests (SURVEY.md §5.2 item 2, FIXTURES.md
F3/F4): encode -> decode must be bit-identical (`pa.Array.equals`)."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mothray import column

rng = np.random.default_rng(7)


def roundtrip(arr: pa.Array, opts=None):
    enc = column.encode_array(arr, opts)
    dec = column.decode_array(enc, arr.type)
    assert dec.type == arr.type, f"{dec.type} != {arr.type}"
    assert dec.equals(arr), f"mismatch for {arr.type}: {arr[:10]} vs {dec[:10]}"
    return enc


def with_nulls(values, p=0.2):
    mask = rng.random(len(values)) < p
    return pa.array([None if m else v for v, m in zip(values, mask)])


# ---------------------------------------------------------------- primitives (F4)

def test_bool():
    roundtrip(pa.array(rng.integers(0, 2, 1000).astype(bool)))
    roundtrip(pa.array([True, None, False, None, True]))
    roundtrip(pa.array([], type=pa.bool_()))


@pytest.mark.parametrize("t", [pa.int8(), pa.int16(), pa.int32(), pa.int64()])
def test_ints(t):
    info = np.iinfo(t.to_pandas_dtype())
    v = rng.integers(info.min, int(info.max) + 1, 2000)
    roundtrip(pa.array(v, type=t))
    roundtrip(pa.array([info.min, info.max, 0, None], type=t))
    roundtrip(pa.array([], type=t))


@pytest.mark.parametrize("t", [pa.uint8(), pa.uint16(), pa.uint32(), pa.uint64()])
def test_uints(t):
    info = np.iinfo(t.to_pandas_dtype())
    v = rng.integers(0, int(info.max) + 1, 500, dtype=np.uint64)
    roundtrip(pa.array(v, type=t))


@pytest.mark.parametrize("t", [pa.float32(), pa.float64()])
def test_floats(t):
    v = rng.standard_normal(1000).astype(t.to_pandas_dtype())
    roundtrip(pa.array(v, type=t))
    special = pa.array([0.0, -0.0, np.nan, np.inf, -np.inf, None], type=t)
    enc = column.encode_array(special)
    dec = column.decode_array(enc, t)
    for a, b in zip(special.to_pylist(), dec.to_pylist()):
        assert (a is None and b is None) or (np.isnan(a) and np.isnan(b)) or a == b


@pytest.mark.parametrize("t", [pa.float32(), pa.float64()])
def test_float_dict(t):
    dt = t.to_pandas_dtype()
    # low-cardinality fixed-decimal values + bit-pattern specials:
    # two NaNs with DIFFERENT payloads, -0.0 vs 0.0 — the dictionary
    # must keep them distinct (uint bit view, not float equality)
    w = np.dtype(dt).itemsize
    ui = np.uint32 if w == 4 else np.uint64
    nan1 = np.frombuffer(ui(np.iinfo(ui).max - 1).tobytes(), dt)[0]
    nan2 = np.frombuffer(ui(np.iinfo(ui).max - 9).tobytes(), dt)[0]
    pool = np.array([0.0, -0.0, 0.01, 0.05, np.inf, -np.inf, nan1, nan2], dtype=dt)
    v = rng.choice(pool, 2000)
    arr = pa.array(v, type=t)
    enc = column.encode_array(arr, {"float_encoding": "dict"})
    assert enc.encoding == "DICT_LE"
    dec = column.decode_array(enc, t)
    assert dec.to_numpy(zero_copy_only=False).view(ui).tolist() == v.view(ui).tolist()
    # the auto trial picks dict for this distribution under zstd
    auto = column.encode_array(arr, {"compression": "zstd"})
    assert auto.encoding == "DICT_LE"
    # per-stripe cardinality fallback: a high-cardinality stripe must
    # NOT dictionary-encode even when the plan says dict
    hv = rng.standard_normal(2000).astype(dt)
    enc_hi = column.encode_array(pa.array(hv, type=t), {"float_encoding": "dict", "compression": "zstd"})
    assert enc_hi.encoding in ("RAW_LE", "BSS_LE")
    dec_hi = column.decode_array(enc_hi, t)
    assert dec_hi.to_numpy(zero_copy_only=False).view(ui).tolist() == hv.view(ui).tolist()
    # nulls ride the PRESENT stream unchanged
    nv = pa.array([0.5, None, 0.25, 0.5] * 100, type=t)
    enc_n = column.encode_array(nv, {"float_encoding": "dict"})
    assert column.decode_array(enc_n, t).equals(nv)


@pytest.mark.parametrize("t,enc_name", [(pa.int64(), "DICT_I64"), (pa.uint64(), "DICT_U64"),
                                        (pa.int32(), "DICT_I64"), (pa.int16(), "DICT_I64")])
def test_int_dict(t, enc_name):
    dt = t.to_pandas_dtype()
    info = np.iinfo(dt)
    pool = rng.integers(info.min, info.max, 500, dtype=dt, endpoint=True)
    v = rng.choice(pool, 5000)
    arr = pa.array(v, type=t)
    enc = column.encode_array(arr, {"int_encoding": "dict"})
    assert enc.encoding == enc_name
    assert column.decode_array(enc, t).to_numpy(zero_copy_only=False).tolist() == v.tolist()
    # nulls
    nv = pa.array([int(pool[0]), None, int(pool[1])] * 100, type=t)
    enc_n = column.encode_array(nv, {"int_encoding": "dict"})
    assert column.decode_array(enc_n, t).equals(nv)
    # high-cardinality stripe falls back to plain RLEv2
    hv = rng.integers(info.min, info.max, 5000, dtype=dt, endpoint=True)
    enc_hi = column.encode_array(pa.array(hv, type=t), {"int_encoding": "dict"})
    assert enc_hi.encoding in ("RLEV2", "RLEV2U")
    assert column.decode_array(enc_hi, t).to_numpy(zero_copy_only=False).tolist() == hv.tolist()


def test_int_trial_choices():
    r = np.random.default_rng(11)
    hashes = r.choice(r.integers(0, 2**63, 1000, dtype=np.int64), 50_000)
    assert column._int_trial(hashes, "zstd", True) == "dict"
    # sequential (RLEv2 DELTA) and narrow low-card values stay rlev2
    assert column._int_trial(np.arange(50_000, dtype=np.int64), "zstd", True) == "rlev2"
    assert column._int_trial(r.integers(0, 150, 50_000, dtype=np.int64), "zstd", True) == "rlev2"


def test_date32():
    v = pa.array(rng.integers(-30000, 30000, 1000).astype(np.int32), type=pa.int32()).cast(pa.date32())
    roundtrip(v)


@pytest.mark.parametrize("tz", [None, "UTC"])
def test_timestamp_us(tz):
    t = pa.timestamp("us", tz=tz)
    micros = rng.integers(-(2**50), 2**50, 1000)
    micros[0:3] = [0, -1, 1]  # pre-epoch edges
    roundtrip(pa.array(micros, type=pa.int64()).cast(t))
    roundtrip(pa.array([None, 1692300000123456, None], type=pa.int64()).cast(t))


def test_timestamp_ns():
    t = pa.timestamp("ns")
    v = rng.integers(-(2**60), 2**60, 500)
    roundtrip(pa.array(v, type=pa.int64()).cast(t))


@pytest.mark.parametrize("prec,scale", [(10, 2), (18, 0), (20, 2), (38, 10)])
def test_decimal(prec, scale):
    t = pa.decimal128(prec, scale)
    import decimal

    decimal.getcontext().prec = 50
    hi = decimal.Decimal(10**prec - 1).scaleb(-scale)  # max unscaled magnitude
    vals = [decimal.Decimal(int(x)).scaleb(-scale) for x in rng.integers(-(10**min(prec, 18)) + 1, 10**min(prec, 18), 200)]
    vals += [hi, -hi, None]
    roundtrip(pa.array(vals, type=t))


# ---------------------------------------------------------------- strings (F3)

def _rand_strings(n, card=None, minlen=0, maxlen=30):
    pool = None
    if card:
        pool = ["".join(chr(rng.integers(97, 123)) for _ in range(rng.integers(minlen, maxlen))) for _ in range(card)]
    out = []
    for _ in range(n):
        if pool is not None:
            out.append(pool[rng.integers(0, len(pool))])
        else:
            out.append("".join(chr(rng.integers(32, 1000)) for _ in range(rng.integers(minlen, maxlen))))
    return out


def test_string_low_card_uses_dict():
    arr = pa.array(_rand_strings(5000, card=10, minlen=5, maxlen=20))
    enc = roundtrip(arr)
    assert enc.encoding == column.ENC_DICT
    assert enc.total_bytes() < len(b"".join(s.encode() for s in arr.to_pylist())) / 1.25


def test_string_high_card_unique_goes_direct():
    arr = pa.array([f"{i:08x}-{rng.integers(0, 2**32):08x}" for i in range(3000)])
    enc = roundtrip(arr)
    assert enc.encoding in (column.ENC_DIRECT, column.ENC_FSST)


def test_string_empty_and_null():
    roundtrip(pa.array(["", None, "a", "", None, "bb"]))
    roundtrip(pa.array([], type=pa.string()))
    roundtrip(pa.array([None, None], type=pa.string()))


def test_string_unicode_dict_sorted():
    arr = pa.array(["zèbre", "äpfel", "zèbre", "猫", "äpfel", "á"] * 100)
    enc = roundtrip(arr)
    assert enc.encoding == column.ENC_DICT


def test_string_nulls_mixed():
    roundtrip(with_nulls(_rand_strings(2000, card=50)))


def test_large_string_and_binary():
    roundtrip(pa.array(_rand_strings(500), type=pa.large_string()))
    roundtrip(pa.array([bytes(rng.integers(0, 256, rng.integers(0, 100)).astype(np.uint8)) for _ in range(300)], type=pa.binary()))
    roundtrip(pa.array([b"", None, b"\x00\xff", None], type=pa.binary()))


# ---------------------------------------------------------------- nested (F4)

def test_list():
    arr = pa.array([[1, 2, 3], None, [], [None, 5], [6]], type=pa.list_(pa.int64()))
    roundtrip(arr)
    big = pa.array([rng.integers(0, 100, rng.integers(0, 10)).tolist() for _ in range(500)], type=pa.list_(pa.int64()))
    roundtrip(big)


def test_list_of_strings():
    roundtrip(pa.array([["a", "bb"], None, [], ["ccc", None]], type=pa.list_(pa.string())))


def test_struct():
    t = pa.struct([("a", pa.int64()), ("b", pa.string())])
    arr = pa.array([{"a": 1, "b": "x"}, None, {"a": None, "b": "y"}, {"a": 3, "b": None}], type=t)
    roundtrip(arr)


def test_map():
    t = pa.map_(pa.int32(), pa.string())
    arr = pa.array([[(1, "a"), (2, "b")], None, [], [(3, None)]], type=t)
    roundtrip(arr)


def test_list_of_float_embeddings():
    # embeddings.parquet shape: list<float>
    arr = pa.array([rng.standard_normal(16).astype(np.float32).tolist() for _ in range(200)], type=pa.list_(pa.float32()))
    roundtrip(arr)


# ---------------------------------------------------------------- real testdata columns

def test_testdata_columns_roundtrip():
    import pyarrow.parquet as pq

    for name in ["documents", "events", "lineitem", "embeddings", "orders"]:
        tbl = pq.read_table(f"/root/testdata/sf0.001/{name}.parquet")
        for col in tbl.column_names:
            arr = tbl.column(col).combine_chunks()
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks() if arr.num_chunks != 1 else arr.chunk(0)
            roundtrip(arr if isinstance(arr, pa.Array) else arr.chunk(0))


@pytest.mark.parametrize("t", [pa.time32("ms"), pa.time64("us")])
def test_time_types(t):
    unit_max = 86_400_000 if t.bit_width == 32 else 86_400_000_000
    v = rng.integers(0, unit_max, 500)
    arr = pa.array(v.astype(np.int64) if t.bit_width == 64 else v.astype(np.int32), type=pa.int64() if t.bit_width == 64 else pa.int32()).cast(t)
    roundtrip(arr)


@given(
    st.lists(
        st.integers(min_value=-(10**38 - 1), max_value=10**38 - 1),
        min_size=1,
        max_size=300,
    )
)
@settings(max_examples=40, deadline=None)
def test_decimal128_precision38_property(xs):
    """Vectorized DECIMAL128 (zigzag LEB128 over 128-bit limbs) must
    round-trip the full precision-38 range (VERDICT r1 item 9; the
    vectorized codec is byte-compatible with the scalar one it
    replaced)."""
    import decimal

    arr = pa.array([decimal.Decimal(v).scaleb(-6) for v in xs], type=pa.decimal128(38, 6))
    enc = column.encode_array(arr, {})
    assert enc.encoding == "DECIMAL128"
    dec = column.decode_array(enc, arr.type)
    assert dec.equals(arr)


def test_union_roundtrip():
    """UNION encode+decode (dense and sparse). The reference reads
    union but its writer panics (ColumnReaders.go:39-44 vs
    ColumnWriters.go:83-86); we write it too. Dense offsets come back
    canonical — logically equal, not necessarily buffer-equal."""
    ints = pa.array([5, None, 123456], type=pa.int64())
    strs = pa.array(["aa", "bb"], type=pa.string())
    types = pa.array([0, 1, 0, 1, 0], type=pa.int8())
    offsets = pa.array([0, 0, 1, 1, 2], type=pa.int32())
    du = pa.UnionArray.from_dense(types, offsets, [ints, strs], ["i", "s"], [0, 1])
    dec = column.decode_array(column.encode_array(du, {}), du.type)
    assert dec.to_pylist() == du.to_pylist()

    si = pa.array([1, 2, 3, 4], type=pa.int64())
    ss = pa.array(["x", "y", "z", "w"], type=pa.string())
    su = pa.UnionArray.from_sparse(pa.array([0, 1, 1, 0], type=pa.int8()), [si, ss], ["i", "s"], [0, 1])
    dec2 = column.decode_array(column.encode_array(su, {}), su.type)
    assert dec2.to_pylist() == su.to_pylist()

    # custom type codes + non-canonical dense offsets
    du4 = pa.UnionArray.from_dense(
        pa.array([7, 3, 7], type=pa.int8()),
        pa.array([1, 0, 0], type=pa.int32()),
        [pa.array([111], type=pa.int64()), pa.array(["q", "r"], type=pa.string())],
        ["i", "s"],
        [3, 7],
    )
    dec4 = column.decode_array(column.encode_array(du4, {}), du4.type)
    assert dec4.to_pylist() == du4.to_pylist()

    # through the stripe layer
    from mothray import stripe

    tbl = pa.table({"u": du, "k": pa.array(range(5), type=pa.int64())})
    enc = stripe.encode_batch(tbl)
    out = stripe.decode_stripe({n: enc.column(n)[0].as_py() for n in enc.column_names})
    assert out.column("u").to_pylist() == du.to_pylist()


def test_union_sliced_roundtrip():
    """Regression: pyarrow's .type_codes/.offsets ignore a parent slice
    offset, which silently encoded the wrong rows for sliced unions
    (stripe splitting slices batches)."""
    ints = pa.array([1, 2, 3], type=pa.int64())
    strs = pa.array(["a", "b"], type=pa.string())
    u = pa.UnionArray.from_dense(
        pa.array([0, 1, 0, 1, 0], type=pa.int8()),
        pa.array([0, 0, 1, 1, 2], type=pa.int32()),
        [ints, strs], ["i", "s"], [0, 1],
    )
    for sl in (u.slice(2, 3), u.slice(1, 2), u.slice(4, 1)):
        dec = column.decode_array(column.encode_array(sl, {}), sl.type)
        assert dec.to_pylist() == sl.to_pylist()
    sp = pa.UnionArray.from_sparse(
        pa.array([0, 1, 0, 1], type=pa.int8()),
        [pa.array([9, 8, 7, 6], type=pa.int64()), pa.array(["x", "y", "z", "w"])],
        ["i", "s"], [0, 1],
    )
    for sl in (sp.slice(1, 3), sp.slice(2, 1)):
        dec = column.decode_array(column.encode_array(sl, {}), sl.type)
        assert dec.to_pylist() == sl.to_pylist()
