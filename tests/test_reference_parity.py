"""Explicit reference-parity assertions, one per SURVEY.md §2 behavior,
each naming its reference citation. These pin the SEMANTICS carried
over from mothdb-bd/orc-go (not its bytes — our container is Arrow)."""

import json

import numpy as np
import pyarrow as pa
import pytest

from mothray import column, stats, stripe
from mothray.codecs import frames


# --- PresentOutputStream.go:27-55 — PRESENT materializes only when nulls exist
def test_present_stream_lazy_rule():
    no_nulls = column.encode_array(pa.array([1, 2, 3], type=pa.int64()))
    assert column.PRESENT not in no_nulls.streams
    with_nulls = column.encode_array(pa.array([1, None, 3], type=pa.int64()))
    assert column.PRESENT in with_nulls.streams


# --- SliceDictionaryColumnWriter.go:313-336 — dictionary sorted lexically,
#     indexes remapped to sorted order
def test_dictionary_sorted_and_remapped():
    arr = pa.array(["zz", "aa", "mm", "zz", "aa"] * 100)
    enc = column.encode_array(arr, {"string_encoding": "dict"})
    assert enc.encoding == column.ENC_DICT
    from mothray.codecs import rlev2

    card = enc.extra["dict_size"]
    dlen, _ = rlev2.decode(enc.streams[column.LENGTH], card, signed=False)
    ddata = enc.streams[column.DICTIONARY_DATA]
    offs = np.concatenate(([0], np.cumsum(dlen.astype(np.int64))))
    entries = [bytes(ddata[offs[i] : offs[i + 1]]) for i in range(card)]
    assert entries == sorted(entries)  # byte-lexical order
    idx, _ = rlev2.decode(enc.streams[column.DATA], len(arr), signed=False)
    assert bytes(entries[int(idx[0])]) == b"zz" and bytes(entries[int(idx[1])]) == b"aa"


# --- ColumnWriters stream layouts (SURVEY §2.3 table)
@pytest.mark.parametrize(
    "arr,kinds",
    [
        (pa.array([True, False] * 50), {"DATA"}),
        (pa.array(np.arange(100, dtype=np.int64)), {"DATA"}),
        (pa.array(np.arange(100, dtype=np.int8)), {"DATA"}),
        # continuous floats (raw-LE reference layout; decimal-quantized
        # floats now take the ALP extension's 3-stream layout instead)
        (pa.array(np.sin(np.arange(100, dtype=np.float64))), {"DATA"}),
        (pa.array([b"x", b"yy"] * 50, type=pa.binary()), {"LENGTH", "DATA"}),
        (
            pa.array(np.arange(100) * 1_000_000, type=pa.int64()).cast(pa.timestamp("us")),
            {"DATA", "SECONDARY"},
        ),
    ],
)
def test_stream_kinds_per_type(arr, kinds):
    enc = column.encode_array(arr)
    assert set(enc.streams) == kinds


def test_nested_length_stream_recursion():
    # ListColumnWriter.go:28-80: LENGTH + child writers
    arr = pa.array([[1, 2], [3]] * 50, type=pa.list_(pa.int64()))
    enc = column.encode_array(arr)
    assert set(enc.streams) == {"LENGTH"}
    assert len(enc.children) == 1 and "DATA" in enc.children[0].streams


# --- DictionaryCompressionOptimizer.go:10 — ratio < 1.25 abandons dict
def test_dict_ratio_threshold():
    unique = pa.array([f"{i:016x}{i:016x}" for i in range(2000)])
    enc = column.encode_array(unique, {"string_encoding": "auto", "fsst_enabled": False})
    assert enc.encoding == column.ENC_DIRECT


# --- DictionaryCompressionOptimizer.go:214-225 — index width model
def test_index_width_model():
    assert column._index_bytes_per_value(200) == 1
    assert column._index_bytes_per_value(60000) == 2
    assert column._index_bytes_per_value(1 << 22) == 3
    assert column._index_bytes_per_value(1 << 25) == 4


# --- MothOutputBuffer.go:358-369 — store-raw rule for incompressible streams
def test_store_raw_flag():
    rng = np.random.default_rng(0)
    incompressible = rng.integers(0, 256, 10000).astype(np.uint8).tobytes()
    flag, payload = frames.compress_parts(incompressible, "zstd")
    assert flag == frames.RAW and payload is incompressible  # no copy either
    compressible = b"abc" * 10000
    flag, payload = frames.compress_parts(compressible, "zstd")
    assert flag == frames.COMPRESSED


# --- StringStatisticsBuilder.go:111-119 + MothWriterOptions.go:9 —
#     >64-byte values drop string min/max
def test_string_stats_limit():
    short = stats.column_stats(pa.array(["aa", "bb"]))
    assert short["min"] == "aa" and short["max"] == "bb"
    long = stats.column_stats(pa.array(["x" * 100, "aa"]))
    assert "max" not in long and long["min"] == "aa"
    assert long["sum_lengths"] == 102


# --- DoubleStatisticsBuilder.go — NaN drops min/max
def test_nan_drops_float_stats():
    st = stats.column_stats(pa.array([1.0, float("nan"), 3.0]))
    assert "min" not in st and "max" not in st
    st2 = stats.column_stats(pa.array([1.0, 3.0]))
    assert st2["min"] == 1.0 and st2["max"] == 3.0


# --- BooleanStatisticsBuilder.go — trueCount
def test_bool_true_count():
    st = stats.column_stats(pa.array([True, True, False, None]))
    assert st["true_count"] == 2 and st["null_count"] == 1


# --- IntegerStatisticsBuilder.go:31-50,71-83 — sum dropped on overflow
def test_int_stats_sum_overflow_dropped():
    big = np.iinfo(np.int64).max
    st = stats.column_stats(pa.array([big, big], type=pa.int64()))
    assert "sum" not in st  # overflowed -> dropped, like the reference
    ok = stats.column_stats(pa.array([big, -big], type=pa.int64()))
    assert ok["sum"] == 0


# --- MothWriter.go:127-137 — chunking by row + logical byte budget
def test_stripe_byte_budget_splits():
    tbl = pa.table({"x": pa.array([b"y" * 1000] * 2000, type=pa.binary())})
    enc = stripe.encode_batch(tbl, {"stripe_bytes": 200_000})
    assert enc.num_rows >= 8
    assert all(r <= 2000 for r in enc.column("n_rows").to_pylist())


# --- TimestampColumnWriter.go:17 — 2015-01-01 epoch for seconds stream
def test_timestamp_epoch_2015():
    from mothray.codecs import rlev2, timestamp as ts_mod

    arr = pa.array([1420070400_000000], type=pa.int64()).cast(pa.timestamp("us"))
    enc = column.encode_array(arr)
    secs, _ = rlev2.decode(enc.streams["DATA"], 1, signed=True)
    assert secs[0] == 0  # 2015-01-01T00:00:00Z == epoch


# --- stripe meta carries encodings for the manifest metrics (north rule)
def test_codec_choices_in_meta():
    tbl = pa.table(
        {"s": pa.array(["alpha", "bravo"] * 500), "i": pa.array(np.arange(1000, dtype=np.int64))}
    )
    enc = stripe.encode_batch(tbl)
    codecs = json.loads(enc.column("meta")[0].as_py())["metrics"]["codecs"]
    assert codecs == {"s": "DICT", "i": "RLEV2"}
    # 1-char values: index bytes ~= raw bytes, ratio < 1.25 -> direct
    tiny = stripe.encode_batch(pa.table({"s": pa.array(["a", "b"] * 500)}), {"fsst_enabled": False})
    assert json.loads(tiny.column("meta")[0].as_py())["metrics"]["codecs"]["s"] == "DIRECT"


def test_merge_stats_drops_partial_stats():
    """A part that dropped a stat (overflow / string-limit) poisons the
    merged stat instead of being silently ignored (advisor finding)."""
    from mothray import stats

    full = {"count": 10, "null_count": 0, "min": 1, "max": 5, "sum": 30}
    dropped_sum = {"count": 10, "null_count": 0, "min": 0, "max": 9}
    merged = stats.merge_stats([full, dropped_sum])
    assert "sum" not in merged
    assert merged["min"] == 0 and merged["max"] == 9
    # a part with only nulls lacking min/max must NOT poison them
    all_null = {"count": 3, "null_count": 3}
    merged2 = stats.merge_stats([full, all_null])
    assert merged2["sum"] == 30 and merged2["min"] == 1 and merged2["max"] == 5
    assert merged2["count"] == 13 and merged2["null_count"] == 3
    # string min/max beyond the 64-byte limit dropped in one part
    s1 = {"count": 2, "null_count": 0, "sum_lengths": 10, "min": "a", "max": "b"}
    s2 = {"count": 2, "null_count": 0, "sum_lengths": 200}
    m3 = stats.merge_stats([s1, s2])
    assert "min" not in m3 and "max" not in m3
    assert m3["sum_lengths"] == 210


def test_cross_column_dict_budget():
    """Cross-column dictionary budget (reference
    DictionaryCompressionOptimizer.go:166-225): when total projected
    dictionary bytes exceed the budget, the LOWEST-ratio columns
    convert away from dict first; higher-ratio columns keep theirs."""
    from mothray import plan as plan_mod

    # 3 columns, each dict-eligible; budget fits only the best two
    stats = {}
    for i, (distinct, reps) in enumerate([(10, 1000), (50, 200), (400, 25)]):
        # ratio decreases as cardinality grows (same raw bytes)
        stats[f"c{i}"] = {
            "n": distinct * reps,
            "bytes": distinct * reps * 20,
            "distinct": distinct,
            "entropy": 7.5,  # not fsst-eligible -> evicts to direct
            "avg_len": 20.0,
        }
    p = plan_mod.build_plan(stats, dict_total_budget=(10 + 50) * 20 + 100)
    assert p.column_plans["c0"]["string_encoding"] == "dict"
    assert p.column_plans["c1"]["string_encoding"] == "dict"
    assert p.column_plans["c2"]["string_encoding"] == "direct"  # lowest ratio evicted
    # without pressure everything stays dict
    p2 = plan_mod.build_plan(stats)
    assert all(v["string_encoding"] == "dict" for v in p2.column_plans.values())

    # in-task hard backstop: a tiny budget forces later columns direct
    import json

    from mothray import stripe

    cols = {f"s{i}": pa.array([f"val{i}_{j % 40:03d}_{'x' * 30}" for j in range(4000)]) for i in range(6)}
    enc = stripe.encode_batch(pa.table(cols), {"dict_total_budget": 2 * 40 * 40, "fsst_enabled": False})
    codecs = json.loads(enc.column("meta")[0].as_py())["metrics"]["codecs"]
    kinds = [codecs[f"s{i}"] for i in range(6)]
    assert kinds.count("DICT") <= 2 and "DIRECT" in kinds
    # and the round trip still holds
    dec = stripe.decode_stripe({n: enc.column(n)[0].as_py() for n in enc.column_names})
    assert dec.num_rows == 4000
    for i in range(6):
        assert dec.column(f"s{i}").combine_chunks().equals(cols[f"s{i}"])


def test_native_and_numpy_stripe_bytes_identical(monkeypatch):
    """Full-stack invariant: the C kernels (rlev2/bitpack/fsst) must
    produce byte-identical stripe blobs to the numpy fallbacks, so a
    resumed job re-encodes identically no matter which path runs.
    MOTHRAY_NO_NATIVE is honored per call, so both modes run in-process
    on identical inputs."""
    import os

    import pyarrow.parquet as pq

    from mothray import datagen, stripe

    tables = {
        "cc": datagen.cc_pages(3000, seed=11),
        "lineitem": pq.read_table("/root/testdata/sf0.001/lineitem.parquet"),
        "events": pq.read_table("/root/testdata/sf0.001/events.parquet"),
    }
    for name, tbl in tables.items():
        monkeypatch.delenv("MOTHRAY_NO_NATIVE", raising=False)
        native = stripe.encode_batch(tbl, {"stripe_rows": 2048, "row_group_rows": 1000})
        monkeypatch.setenv("MOTHRAY_NO_NATIVE", "1")
        fallback = stripe.encode_batch(tbl, {"stripe_rows": 2048, "row_group_rows": 1000})
        monkeypatch.delenv("MOTHRAY_NO_NATIVE", raising=False)
        assert native.column("blob").equals(fallback.column("blob")), name
        assert native.column("meta").equals(fallback.column("meta")), name
        # and the numpy path can decode the native bytes
        monkeypatch.setenv("MOTHRAY_NO_NATIVE", "1")
        dec = stripe.decode_batch(native)
        monkeypatch.delenv("MOTHRAY_NO_NATIVE", raising=False)
        assert dec.num_rows == tbl.num_rows, name
