"""Leaf codec unit tests — RLEv2 sub-modes, varints, bitpack, byte RLE,
boolean bit-pack, nanos encoding, compression frames (SURVEY.md §5.2
item 1, FIXTURES.md F2)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mothray.codecs import bitpack, boolrle, byterle, frames, rlev2, timestamp, varint

rng = np.random.default_rng(42)


# ---------------------------------------------------------------- varint

def test_varint_unsigned_roundtrip():
    vals = np.array([0, 1, 127, 128, 300, 2**32, 2**63, 2**64 - 1], dtype=np.uint64)
    enc = varint.encode_unsigned(vals)
    dec, consumed = varint.decode_unsigned(enc, len(vals))
    assert consumed == len(enc)
    np.testing.assert_array_equal(dec, vals)


def test_varint_signed_roundtrip():
    vals = np.array([0, -1, 1, -64, 64, 2**62, -(2**62), 2**63 - 1, -(2**63)], dtype=np.int64)
    dec, _ = varint.decode_signed(varint.encode_signed(vals), len(vals))
    np.testing.assert_array_equal(dec, vals)


@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=200))
@settings(max_examples=50, deadline=None)
def test_varint_signed_property(xs):
    vals = np.array(xs, dtype=np.int64)
    dec, _ = varint.decode_signed(varint.encode_signed(vals), len(vals))
    np.testing.assert_array_equal(dec, vals)


# ---------------------------------------------------------------- bitpack

@pytest.mark.parametrize("width", [1, 2, 3, 4, 7, 8, 13, 24, 26, 33, 40, 63, 64])
def test_bitpack_roundtrip(width):
    n = 517
    vals = rng.integers(0, 2, size=n).astype(np.uint64) if width == 1 else (
        rng.integers(0, 2**min(width, 63), size=n).astype(np.uint64)
    )
    if width == 64:
        vals = vals | (np.uint64(1) << np.uint64(63))
    packed = bitpack.pack(vals, width)
    assert len(packed) == bitpack.packed_size(n, width)
    out = bitpack.unpack(packed, n, width)
    np.testing.assert_array_equal(out, vals)


def test_bit_width_exact_edges():
    vals = np.array([0, 1, 2, 3, 4, 255, 256, 2**31, 2**32 - 1, 2**32, 2**63 - 1, 2**63, 2**64 - 1], dtype=np.uint64)
    expect = np.array([1, 1, 2, 2, 3, 8, 9, 32, 32, 33, 63, 64, 64])
    np.testing.assert_array_equal(bitpack.bit_width(vals), expect)


# ---------------------------------------------------------------- byte RLE

@pytest.mark.parametrize("case", ["runs", "literals", "mixed", "long_run", "single"])
def test_byterle_roundtrip(case):
    if case == "runs":
        v = np.repeat(np.array([5, 9, 5], dtype=np.uint8), [400, 3, 7])
    elif case == "literals":
        v = rng.integers(0, 256, 300).astype(np.uint8)
    elif case == "mixed":
        v = np.concatenate([rng.integers(0, 256, 50), np.full(200, 7), rng.integers(0, 256, 2)]).astype(np.uint8)
    elif case == "long_run":
        v = np.full(1000, 42, dtype=np.uint8)
    else:
        v = np.array([9], dtype=np.uint8)
    enc = byterle.encode(v)
    dec, consumed = byterle.decode(enc, len(v))
    assert consumed == len(enc)
    np.testing.assert_array_equal(dec, v)


def test_boolrle_roundtrip():
    for n in (1, 7, 8, 9, 1000):
        v = rng.integers(0, 2, n).astype(bool)
        dec, _ = boolrle.decode(boolrle.encode(v), n)
        np.testing.assert_array_equal(dec, v)
    allset = np.ones(10000, dtype=bool)
    dec, _ = boolrle.decode(boolrle.encode(allset), 10000)
    np.testing.assert_array_equal(dec, allset)


# ---------------------------------------------------------------- RLEv2 (FIXTURES.md F2)

F2_CASES = {
    "constant": np.full(2000, 123456, dtype=np.int64),
    "short_repeats": np.repeat(np.arange(100, dtype=np.int64), 5),
    "monotonic_inc": np.cumsum(rng.integers(0, 50, 2000)).astype(np.int64),
    "monotonic_dec": -np.cumsum(rng.integers(0, 50, 2000)).astype(np.int64),
    "fixed_stride": np.arange(0, 30000, 3, dtype=np.int64),
    "random_1bit": rng.integers(0, 2, 1500).astype(np.int64),
    "random_7bit": rng.integers(0, 2**7, 1500).astype(np.int64),
    "random_24bit": rng.integers(0, 2**24, 1500).astype(np.int64),
    "random_33bit": rng.integers(0, 2**33, 1500).astype(np.int64),
    "random_64bit": rng.integers(-(2**63), 2**63 - 1, 1500, dtype=np.int64),
    "outliers_5pct": np.where(rng.random(2000) < 0.05, 2**40, rng.integers(0, 100, 2000)).astype(np.int64),
    "negatives": -rng.integers(0, 2**20, 1500).astype(np.int64),
    "int64_minmax": np.array([np.iinfo(np.int64).min, np.iinfo(np.int64).max] * 10, dtype=np.int64),
    "run_boundary_512": np.repeat(np.arange(8, dtype=np.int64), 511),
    "tiny": np.array([7], dtype=np.int64),
    "pair": np.array([7, -9], dtype=np.int64),
}


@pytest.mark.parametrize("name", list(F2_CASES))
def test_rlev2_signed_roundtrip(name):
    v = F2_CASES[name]
    enc = rlev2.encode(v, signed=True)
    dec, consumed = rlev2.decode(enc, len(v), signed=True)
    assert consumed == len(enc)
    np.testing.assert_array_equal(dec, v)


def test_rlev2_unsigned_roundtrip():
    for v in [
        rng.integers(0, 2**64, 1500, dtype=np.uint64),
        np.full(700, 2**63 + 5, dtype=np.uint64),
        np.arange(0, 5000, 7, dtype=np.uint64),
        np.zeros(100, dtype=np.uint64),
    ]:
        dec, _ = rlev2.decode(rlev2.encode(v, signed=False), len(v), signed=False)
        np.testing.assert_array_equal(dec, v)


def test_rlev2_compression_effective():
    # constant data must compress massively; sorted data well
    const = np.full(10000, 42, dtype=np.int64)
    assert len(rlev2.encode(const, True)) < 100
    sorted_ = np.arange(10000, dtype=np.int64)
    assert len(rlev2.encode(sorted_, True)) < 10000 * 8 / 10
    outl = np.where(rng.random(512) < 0.03, 2**45, rng.integers(0, 128, 512)).astype(np.int64)
    assert len(rlev2.encode(outl, True)) < 512 * 2.5  # patched base, ~8-9 bits/val + patches


@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=1200))
@settings(max_examples=60, deadline=None)
def test_rlev2_property(xs):
    v = np.array(xs, dtype=np.int64)
    dec, _ = rlev2.decode(rlev2.encode(v, True), len(v), True)
    np.testing.assert_array_equal(dec, v)


@given(st.lists(st.sampled_from([0, 1, 2, 5, 1000, 2**40]), min_size=1, max_size=1200))
@settings(max_examples=40, deadline=None)
def test_rlev2_runs_property(xs):
    v = np.array(xs, dtype=np.int64)
    dec, _ = rlev2.decode(rlev2.encode(v, True), len(v), True)
    np.testing.assert_array_equal(dec, v)


# ---------------------------------------------------------------- nanos + frames

def test_nanos_encoding_golden():
    # golden table from reference TimestampColumnWriter.go:306-320 comments
    cases = {0: 0, 1000000: 0x0a, 100000: 0x0c, 999100000: 0x1f9d6, 1000: 10 << 3 | 2}
    nanos = np.array(list(cases), dtype=np.int64)
    enc = timestamp.encode_nanos(nanos)
    dec = timestamp.decode_nanos(enc)
    np.testing.assert_array_equal(dec, nanos)


def test_timestamp_split_roundtrip():
    micros = np.array([0, -1, 1, timestamp.MOTH_EPOCH_MICROS, -62135596800_000000, 253402300799_999999, 1692300000_123456], dtype=np.int64)
    s, n = timestamp.micros_to_seconds_nanos(micros)
    back = timestamp.seconds_nanos_to_micros(s, n)
    np.testing.assert_array_equal(back, micros)
    assert (n >= 0).all() and (n < 1_000_000_000).all()


@pytest.mark.parametrize("codec", ["zlib", "zstd", "lz4", "snappy", "none"])
def test_frames_roundtrip(codec):
    if codec not in ("zlib", "none") and codec not in frames.available_codecs():
        pytest.skip(f"{codec} unavailable")
    data = b"hello world " * 1000
    framed = frames.compress(data, codec)
    assert frames.decompress(framed, codec, len(data)) == data
    if codec != "none":
        assert len(framed) < len(data)
    # incompressible stays raw
    raw = rng.integers(0, 256, 4096).astype(np.uint8).tobytes()
    framed = frames.compress(raw, codec)
    assert framed[0] == frames.RAW
    assert frames.decompress(framed, codec, len(raw)) == raw


def test_rlev2_zero_first_delta_decreasing_regression():
    """Regression (advisor-found): a monotonically-DECREASING run whose
    first delta is 0 must not be DELTA-encoded — the decoder derives the
    sign of all later deltas from d0, so d0==0 decoded as increasing."""
    # 512-block path
    v = np.array([1000, 1000] + list(range(999, 999 - 510, -1)), dtype=np.int64)
    dec, _ = rlev2.decode(rlev2.encode(v, True), len(v), True)
    np.testing.assert_array_equal(dec, v)
    # tail (_encode_block) path
    v2 = np.array([100000, 100000] + list(range(99999, 99999 - 98, -1)), dtype=np.int64)
    dec2, _ = rlev2.decode(rlev2.encode(v2, True), len(v2), True)
    np.testing.assert_array_equal(dec2, v2)
    # increasing twin must still round-trip (and may use DELTA)
    v3 = np.array([1000, 1000] + list(range(1001, 1001 + 510)), dtype=np.int64)
    dec3, _ = rlev2.decode(rlev2.encode(v3, True), len(v3), True)
    np.testing.assert_array_equal(dec3, v3)
    # unsigned decreasing with d0==0
    v4 = np.array([5000, 5000] + list(range(4999, 4999 - 300, -1)), dtype=np.uint64)
    dec4, _ = rlev2.decode(rlev2.encode(v4, False), len(v4), False)
    np.testing.assert_array_equal(dec4, v4)


def test_rlev2_patched_wide_patch_regression():
    """Regression (hypothesis-found): huge outliers over tiny bases
    give patch width 64; gap<<pw must not overflow the entry word."""
    v = np.array([0, 0, 144115188075855872], dtype=np.int64)
    dec, _ = rlev2.decode(rlev2.encode(v, True), 3, True)
    np.testing.assert_array_equal(dec, v)
    r = np.random.default_rng(1)
    for k in [50, 57, 62]:
        big = np.where(r.random(2000) < 0.04, 2**k, r.integers(0, 3, 2000)).astype(np.int64)
        dec, _ = rlev2.decode(rlev2.encode(big, True), len(big), True)
        np.testing.assert_array_equal(dec, big)


def test_rlev2_unsigned_patched_large_values_regression():
    """Regression: unsigned PATCHED_BASE computed (int64 - uint64),
    which numpy promotes to float64 — outliers beyond 2^53 lost their
    low bits. Small base + huge outliers must round-trip exactly."""
    r = np.random.default_rng(3)
    v = r.integers(0, 100, 512).astype(np.uint64)
    v[::37] = (np.uint64(1) << np.uint64(62)) + np.uint64(12345)
    dec, _ = rlev2.decode(rlev2.encode(v, signed=False), len(v), signed=False)
    np.testing.assert_array_equal(dec, v)
    for seed in range(20):
        rr = np.random.default_rng(seed)
        n = int(rr.integers(3, 1300))
        u = rr.integers(0, 1 << int(rr.integers(3, 10)), n).astype(np.uint64)
        u[rr.random(n) < 0.05] = (np.uint64(1) << np.uint64(int(rr.integers(55, 64)))) + np.uint64(7)
        d, _ = rlev2.decode(rlev2.encode(u, False), n, False)
        np.testing.assert_array_equal(d, u)


def test_rlev2_native_bit_identity():
    """The C encoder must produce byte-identical streams to the numpy
    encoder (resume byte-identity must not depend on which path ran),
    and the C decoder must round-trip both."""
    from mothray.codecs import _rlev2_native

    if _rlev2_native.get_lib() is None:
        pytest.skip("native rlev2 unavailable")

    def np_encode(v, signed):
        return rlev2._encode_numpy(
            v.astype(np.int64 if signed else np.uint64, copy=False), signed
        )

    for name, v in F2_CASES.items():
        for signed in (True, False):
            arr = v if signed else v.astype(np.uint64)
            a, b = np_encode(arr, signed), rlev2.encode(arr, signed)
            assert a == b, (name, signed)
            dec, c = rlev2.decode(b, len(arr), signed)
            assert c == len(b)
            np.testing.assert_array_equal(dec.astype(arr.dtype), arr)
    for trial in range(150):
        r = np.random.default_rng(trial)
        n = int(r.integers(1, 1600))
        kind = trial % 5
        if kind == 0:
            v = r.integers(-(2**63), 2**63 - 1, n, dtype=np.int64)
        elif kind == 1:
            v = r.integers(0, 100, n).astype(np.int64)
            v[r.random(n) < 0.04] = 2 ** int(r.integers(30, 62))
        elif kind == 2:
            v = np.cumsum(r.integers(-3, 50, n)).astype(np.int64)
        elif kind == 3:
            v = np.repeat(r.integers(0, 10, max(n // 20, 1)), 20)[:n].astype(np.int64)
        else:
            v = r.integers(0, 2 ** int(r.integers(1, 64)), n).astype(np.int64)
        for signed in (True, False):
            arr = v if signed else v.astype(np.uint64)
            assert np_encode(arr, signed) == rlev2.encode(arr, signed), (trial, signed)


def test_rlev2_run_splitting_ratio():
    """Constant runs >= MIN_SPLIT_RUN straddling mixed 512-windows are
    carved into their own DELTA-fixed runs (reference's sequential
    run scanner, LongOutputStreamV2.go:174-239): the session-clustered
    shape must compress materially better than whole-window packing,
    and everything still round-trips."""
    r = np.random.default_rng(5)
    parts = []
    for s in range(60):  # sessions: ~300 constant ts + noise burst
        parts.append(np.full(int(r.integers(150, 400)), 1_700_000_000 + s * 3600, dtype=np.int64))
        parts.append(1_700_000_000 + s * 3600 + r.integers(0, 1800, int(r.integers(20, 90))).astype(np.int64))
    v = np.concatenate(parts)
    enc = rlev2.encode(v, True)
    dec, c = rlev2.decode(enc, len(v), True)
    assert c == len(enc)
    np.testing.assert_array_equal(dec, v)
    # whole-window-only baseline (no splitting): pure super-chunk loop
    chunks = []
    for s in range(0, len(v), rlev2._SUPER):
        rlev2._encode_super(v[s : s + rlev2._SUPER], True, chunks)
    baseline = b"".join(chunks)
    dec2, _ = rlev2.decode(baseline, len(v), True)  # old streams still decode
    np.testing.assert_array_equal(dec2, v)
    assert len(enc) < 0.8 * len(baseline), (len(enc), len(baseline))
