"""ALP float codec (codecs/alp.py): bit-exact round trips, exception
handling, trial selection, and the size win it exists for."""

import numpy as np
import pyarrow as pa
import pytest

from mothray import column
from mothray.codecs import alp, frames


def _bits(v):
    return v.view(np.uint32 if v.dtype.itemsize == 4 else np.uint64).tobytes()


def _roundtrip(v):
    parts = alp.encode_parts(v)
    assert parts is not None
    out = alp.decode(parts, len(v), v.dtype)
    assert _bits(out) == _bits(v)
    return parts


def test_prices_roundtrip_no_exceptions():
    rng = np.random.default_rng(7)
    v = np.round(rng.uniform(1, 100000, 20000), 2)
    parts = _roundtrip(v)
    assert parts["DICTIONARY_DATA"] == b""


def test_exceptions_nan_inf_negzero_continuous():
    rng = np.random.default_rng(8)
    v = np.concatenate(
        [np.round(rng.uniform(0, 100, 2000), 3),
         np.array([np.nan, np.inf, -np.inf, -0.0, 1e300]),
         rng.standard_normal(5)]
    )
    rng.shuffle(v)
    parts = _roundtrip(v)
    assert len(parts["DICTIONARY_DATA"]) // 8 >= 5  # at least the specials


def test_leading_exception_forward_fill():
    v = np.concatenate([np.array([np.nan, np.nan]), np.full(98, 1.25), [2.5]])
    _roundtrip(v)


def test_float32_roundtrip():
    rng = np.random.default_rng(9)
    v = np.round(rng.uniform(0, 1000, 5000), 1).astype(np.float32)
    parts = _roundtrip(v)
    assert parts["SECONDARY"][0] == 1


def test_continuous_rejected():
    rng = np.random.default_rng(10)
    assert alp.encode_parts(rng.standard_normal(5000)) is None


def test_exponent_choice_prefers_smallest_full_cover():
    v = np.round(np.linspace(0, 9.9, 1000), 1)
    d, frac = alp.choose_exponent(v)
    assert d == 1 and frac == 1.0


@pytest.mark.parametrize("null_frac", [0.0, 0.3])
def test_column_path_roundtrip(null_frac):
    rng = np.random.default_rng(11)
    v = np.round(rng.uniform(1, 9999, 8000), 2)
    mask = rng.random(8000) < null_frac
    arr = pa.array(v, type=pa.float64(), mask=mask)
    enc = column.encode_array(arr, {"compression": "zstd", "float_encoding": "alp"})
    assert enc.encoding == "ALP"
    assert column.decode_array(enc, pa.float64()).equals(arr)


def test_column_path_per_stripe_fallback():
    # plan said alp, but THIS stripe is continuous -> falls back cleanly
    rng = np.random.default_rng(12)
    arr = pa.array(rng.standard_normal(4000), type=pa.float64())
    enc = column.encode_array(arr, {"compression": "zstd", "float_encoding": "alp"})
    assert enc.encoding in ("RAW_LE", "BSS_LE", "DICT_LE")
    assert column.decode_array(enc, pa.float64()).equals(arr)


def test_trial_picks_alp_on_high_card_decimals_and_wins():
    rng = np.random.default_rng(13)
    v = np.round(rng.uniform(1, 100000, 20000), 2)  # price-like, high card
    assert column._float_trial(v, "zstd") == "alp"

    def zsize(enc):
        return sum(len(frames.compress_parts(b, "zstd")[1]) for b in enc.streams.values())

    arr = pa.array(v, type=pa.float64())
    new = column.encode_array(arr, {"compression": "zstd"})
    old = column.encode_array(arr, {"compression": "zstd", "float_encoding": "raw"})
    assert new.encoding == "ALP"
    assert zsize(new) < 0.85 * zsize(old)


def test_trial_keeps_dict_on_low_card_decimals():
    rng = np.random.default_rng(14)
    v = np.round(rng.uniform(0, 0.1, 20000), 2)  # 11 distinct values
    assert column._float_trial(v, "zstd") == "dict"
