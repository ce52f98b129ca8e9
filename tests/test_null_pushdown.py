"""IS NULL / IS NOT NULL predicate pushdown: null-count zone maps
prune stripes and files, the PRESENT stream alone answers the
predicate inside surviving stripes, and results match SQL null
semantics exactly."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def encoded_nulls(ray_session, tmp_path):
    """Two null patterns over 4000 rows in 500-row stripes: `s` is null
    on multiples of 7; `t` is non-null only on multiples of 3; stripe 0
    (rows 0..499) additionally holds an all-null run of `u`, every other
    stripe's `u` is null-free."""
    from mothray import pipeline

    n = 4000
    k = np.arange(n, dtype=np.int64)
    s = [None if i % 7 == 0 else f"v{i % 5}" for i in range(n)]
    t = [f"w{i}" if i % 3 == 0 else None for i in range(n)]
    u = [None if i < 500 else i * 2 for i in range(n)]
    src = tmp_path / "nulls.parquet"
    pq.write_table(
        pa.table(
            {
                "k": pa.array(k),
                "s": pa.array(s),
                "t": pa.array(t),
                "u": pa.array(u, pa.int64()),
            }
        ),
        src,
    )
    enc = str(tmp_path / "enc")
    pipeline.encode_parquet_to_dir(str(src), enc, opts={"stripe_rows": 500})
    return enc, n


def test_is_null_rows_exact(ray_session, encoded_nulls):
    from mothray import pipeline

    enc, n = encoded_nulls
    got = pipeline.filter_encoded(enc, "s", "is_null", None).take_all()
    assert sorted(r["k"] for r in got) == [i for i in range(n) if i % 7 == 0]


def test_not_null_rows_exact(ray_session, encoded_nulls):
    from mothray import pipeline

    enc, n = encoded_nulls
    got = pipeline.filter_encoded(enc, "t", "not_null", None).take_all()
    assert sorted(r["k"] for r in got) == [i for i in range(n) if i % 3 == 0]


def test_null_conjunction_multi(ray_session, encoded_nulls):
    from mothray import pipeline

    enc, n = encoded_nulls
    got = pipeline.filter_encoded_multi(
        enc,
        [("s", "is_null", None), ("t", "not_null", None), ("k", "ge", 2000)],
    ).take_all()
    want = [i for i in range(n) if i % 7 == 0 and i % 3 == 0 and i >= 2000]
    assert sorted(r["k"] for r in got) == want


def test_null_zone_maps_prune_stripes(ray_session, encoded_nulls):
    """`u` is all-null in stripe 0 and null-free elsewhere: IS NULL
    keeps exactly the all-null stripe, IS NOT NULL drops it."""
    from mothray import pipeline

    enc, _ = encoded_nulls
    meta = pipeline.read_encoded(enc, metadata_only=True)
    total = meta.count()
    assert total == 8
    assert pipeline.prune_stripes(meta, "u", null_op="is_null").count() == 1
    assert pipeline.prune_stripes(meta, "u", null_op="not_null").count() == total - 1
    # a column with nulls sprinkled everywhere prunes nothing
    assert pipeline.prune_stripes(meta, "s", null_op="is_null").count() == total


def test_null_file_index_prunes_files(ray_session, tmp_path):
    """Two part files — one null-free, one with nulls: the file-level
    skip index answers IS NULL without opening the null-free footer."""
    import os

    from mothray import pipeline

    enc = str(tmp_path / "enc")
    os.makedirs(enc)
    clean = pa.table({"v": pa.array([1, 2, 3], pa.int64())})
    dirty = pa.table({"v": pa.array([4, None, 6], pa.int64())})
    import ray.data

    from mothray import stripe as stripe_mod

    for name, tbl in (("a", clean), ("b", dirty)):
        rows = stripe_mod.encode_batch(tbl, key_prefix=name)
        pq.write_table(rows, os.path.join(enc, f"{name}.parquet"))
    pipeline.build_file_index(enc)
    kept = pipeline._index_prune_files(enc, "v", None, None, null_op="is_null")
    assert [os.path.basename(p) for p in kept] == ["b.parquet"]
    kept = pipeline._index_prune_files(enc, "v", None, None, null_op="not_null")
    assert [os.path.basename(p) for p in kept] == ["a.parquet", "b.parquet"]
    got = pipeline.filter_encoded(enc, "v", "is_null", None).take_all()
    assert len(got) == 1 and got[0]["v"] is None


def test_present_stream_only_mask(ray_session):
    """predicate_mask answers is_null/not_null for a null-free row
    group without decoding any value stream (metadata-only: the tree
    has no PRESENT entry)."""
    import json

    from mothray import stripe as stripe_mod

    tbl = pa.table({"v": pa.array([1, 2, None, 4], pa.int64())})
    row = stripe_mod.encode_batch(tbl).to_pylist()[0]
    meta = json.loads(row["meta"])
    tree = meta["columns"]["v"]["row_groups"][0]
    mask = stripe_mod.predicate_mask(tree, row["blob"], pa.int64(), 4, "is_null", None)
    assert list(mask) == [False, False, True, False]
    mask = stripe_mod.predicate_mask(tree, row["blob"], pa.int64(), 4, "not_null", None)
    assert list(mask) == [True, True, False, True]
    # null-free column: no PRESENT stream in the tree at all
    tbl2 = pa.table({"v": pa.array([1, 2, 3], pa.int64())})
    row2 = stripe_mod.encode_batch(tbl2).to_pylist()[0]
    tree2 = json.loads(row2["meta"])["columns"]["v"]["row_groups"][0]
    assert all(s["kind"] != "PRESENT" for s in tree2["streams"])
    mask = stripe_mod.predicate_mask(tree2, row2["blob"], pa.int64(), 3, "is_null", None)
    assert not mask.any()
