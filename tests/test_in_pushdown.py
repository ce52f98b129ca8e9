"""IN-list predicate pushdown through the encoded-scan stack:
zone-map [min,max] pruning, multi-needle bloom probing, dictionary-
domain evaluation, and exact row results."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def encoded_sorted(ray_session, tmp_path):
    """Sorted low-cardinality + numeric columns, small stripes so
    pruning has something to skip."""
    from mothray import pipeline

    n = 4000
    cat = np.repeat(["aa", "bb", "cc", "dd"], n // 4)
    num = np.arange(n, dtype=np.int64)
    src = tmp_path / "in.parquet"
    pq.write_table(pa.table({"cat": pa.array(cat), "num": pa.array(num)}), src)
    enc = str(tmp_path / "enc")
    pipeline.encode_parquet_to_dir(str(src), enc, opts={"stripe_rows": 500})
    return enc, cat, num


def test_in_rows_exact_string(ray_session, encoded_sorted):
    from mothray import pipeline

    enc, cat, num = encoded_sorted
    got = pipeline.filter_encoded_multi(enc, [("cat", "in", ["bb", "dd"])]).take_all()
    want = {int(v) for v, c in zip(num, cat) if c in ("bb", "dd")}
    assert {r["num"] for r in got} == want


def test_in_rows_exact_numeric_and_conjunction(ray_session, encoded_sorted):
    from mothray import pipeline

    enc, cat, num = encoded_sorted
    got = pipeline.filter_encoded_multi(
        enc, [("num", "in", [3, 700, 1500, 3999]), ("cat", "eq", "aa")]
    ).take_all()
    want = {
        int(v)
        for v, c in zip(num, cat)
        if v in (3, 700, 1500, 3999) and c == "aa"
    }
    assert {r["num"] for r in got} == want


def test_in_null_in_list_ignored(ray_session, encoded_sorted):
    from mothray import pipeline

    enc, cat, num = encoded_sorted
    got = pipeline.filter_encoded_multi(
        enc, [("cat", "in", ["cc", None])]
    ).take_all()
    assert {r["num"] for r in got} == {
        int(v) for v, c in zip(num, cat) if c == "cc"
    }


def test_in_empty_and_missing_literals(ray_session, encoded_sorted):
    from mothray import pipeline

    enc, _, _ = encoded_sorted
    assert (
        pipeline.filter_encoded_multi(enc, [("cat", "in", ["zz", "yy"])]).count()
        == 0
    )
    assert pipeline.filter_encoded_multi(enc, [("cat", "in", [])]).count() == 0


def test_not_in_rows_exact(ray_session, encoded_sorted):
    from mothray import pipeline

    enc, cat, num = encoded_sorted
    got = pipeline.filter_encoded_multi(
        enc, [("cat", "not_in", ["aa", "cc"])]
    ).take_all()
    want = {int(v) for v, c in zip(num, cat) if c not in ("aa", "cc")}
    assert {r["num"] for r in got} == want


def test_not_in_nulls_never_match(ray_session, tmp_path):
    from mothray import pipeline

    src = tmp_path / "n.parquet"
    pq.write_table(
        pa.table(
            {
                "s": pa.array(["x", None, "y", "z"]),
                "i": pa.array([1, 2, 3, 4], pa.int64()),
            }
        ),
        src,
    )
    enc = str(tmp_path / "enc")
    pipeline.encode_parquet_to_dir(str(src), enc)
    got = pipeline.filter_encoded_multi(enc, [("s", "not_in", ["x"])]).take_all()
    # SQL semantics: the NULL row is excluded
    assert sorted(r["i"] for r in got) == [3, 4]


def test_in_zone_map_prunes_stripes(ray_session, encoded_sorted):
    """Sorted numeric column: an IN list inside one narrow range must
    keep only the stripes overlapping [min(list), max(list)]."""
    from mothray import pipeline
    from mothray.ops import profile  # noqa: F401  (import parity)

    enc, _, _ = encoded_sorted
    meta = pipeline.read_encoded(enc, metadata_only=True)
    total = meta.count()
    assert total >= 8
    import mothray.stripe as stripe_mod

    lo, hi = stripe_mod.string_pred_bounds("in", [520, 540, 530])
    assert (lo, hi) == (520, 540)
    kept = pipeline.prune_stripes(meta, "num", lo, hi).count()
    assert kept == 1  # one 500-row stripe covers 500..999


def test_in_bloom_prunes_string_stripes(ray_session, tmp_path):
    """Unsorted strings with overlapping zone maps: the multi-needle
    bloom probe must still drop stripes containing none of the
    literals."""
    from mothray import pipeline

    rng = np.random.default_rng(9)
    # stripe 0 gets tokens t000..t499 shuffled, stripe 1 gets t500+,
    # but zone maps overlap via shared sentinel values at both ends
    a = [f"t{i:03d}" for i in range(500)]
    b = [f"t{i:03d}" for i in range(500, 1000)]
    vals = a + b
    src = tmp_path / "s.parquet"
    pq.write_table(
        pa.table({"s": pa.array(vals), "i": pa.array(range(1000), pa.int64())}),
        src,
    )
    enc = str(tmp_path / "enc")
    pipeline.encode_parquet_to_dir(str(src), enc, opts={"stripe_rows": 500})
    meta = pipeline.read_encoded(enc, metadata_only=True)
    assert meta.count() == 2
    needles = ["t600", "t777"]  # both only in stripe 1
    import mothray.stripe as stripe_mod

    lo, hi = stripe_mod.string_pred_bounds("in", needles)
    kept = pipeline.prune_stripes(meta, "s", lo, hi, needle=needles).count()
    assert kept == 1
    got = pipeline.filter_encoded_multi(enc, [("s", "in", needles)]).take_all()
    assert sorted(r["i"] for r in got) == [600, 777]
