"""Surgical UPDATE tests: replace_column_in_stripe must re-encode ONLY
the assigned column (other columns' stream bytes memcpy through,
byte-identical after offset rebasing), and update_where must match the
SQL CASE-WHEN projection while copying untouched files verbatim."""

import json
import os
import shutil

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from mothray import bloom as bloom_mod
from mothray import stripe as stripe_mod

ORDERS = "/root/testdata/sf0.001/orders.parquet"


def _stream_bytes(row: dict, column: str) -> list[bytes]:
    """All stream payload slices of one column, in tree order."""
    meta = json.loads(row["meta"])
    blob = memoryview(row["blob"]).cast("B")
    out = []

    def walk(tree):
        for s in tree["streams"]:
            out.append(bytes(blob[s["off"] : s["off"] + s["len"]]))
        for c in tree["children"]:
            walk(c)

    for t in meta["columns"][column]["row_groups"]:
        walk(t)
    return out


def _sample_table(n=500):
    rng = np.random.default_rng(7)
    return pa.table(
        {
            "k": pa.array(np.arange(n, dtype=np.int64)),
            "price": pa.array(rng.uniform(0, 100, n)),
            "tag": pa.array([f"tag{int(i) % 17:03d}" for i in range(n)]),
            "note": pa.array(
                [None if i % 7 == 0 else f"note-{i}" for i in range(n)], pa.string()
            ),
        }
    )


# ------------------------------------------------- stripe-level replace


def test_replace_column_roundtrip_and_byte_reuse():
    tbl = _sample_table()
    row = stripe_mod.encode_stripe(tbl, stripe_key="t-0")
    new_price = pc.multiply(tbl.column("price"), 2.0).combine_chunks()
    out = stripe_mod.replace_column_in_stripe(row, "price", new_price)
    dec = stripe_mod.decode_stripe(out)
    assert dec.column("price").to_pylist() == new_price.to_pylist()
    for c in ("k", "tag", "note"):
        assert dec.column(c).to_pylist() == tbl.column(c).to_pylist()
        # the untouched columns' stream payloads are byte-identical
        assert _stream_bytes(out, c) == _stream_bytes(row, c)
    # checksum refreshed: decode verified it above; meta has new crc
    assert json.loads(out["meta"])["blob_crc32"] != json.loads(row["meta"])["blob_crc32"]


def test_replace_column_rebuilds_bloom_and_stats():
    tbl = _sample_table()
    row = stripe_mod.encode_stripe(tbl, stripe_key="t-0")
    new_tag = pa.array(["zz-" + s for s in tbl.column("tag").to_pylist()])
    out = stripe_mod.replace_column_in_stripe(row, "tag", new_tag)
    meta = json.loads(out["meta"])
    boff, blen = meta["blooms"]["tag"]
    bl = bytes(memoryview(out["blooms"])[boff : boff + blen])
    # no false negatives on the NEW values
    assert bloom_mod.might_contain(bl, ["zz-tag003"])[0]
    st = json.loads(out["stats"])["tag"]
    assert st["min"].startswith("zz-") and st["max"].startswith("zz-")
    # row-group min/max refreshed too
    rg = meta["row_groups"]["stats"]["tag"]
    assert all(mm[0].startswith("zz-") for mm in rg)


def test_replace_column_guards():
    tbl = _sample_table()
    row = stripe_mod.encode_stripe(tbl, stripe_key="t-0")
    with pytest.raises(KeyError):
        stripe_mod.replace_column_in_stripe(row, "nope", tbl.column("price").combine_chunks())
    with pytest.raises(TypeError):
        stripe_mod.replace_column_in_stripe(row, "price", pa.array([1] * tbl.num_rows))
    with pytest.raises(ValueError):
        stripe_mod.replace_column_in_stripe(row, "price", pa.array([1.0, 2.0]))


# ------------------------------------------------------- update_where


@pytest.fixture()
def encoded_orders(ray_session, tmp_path):
    from mothray import checkpoint

    enc = str(tmp_path / "enc")
    checkpoint.encode_job(ORDERS, enc, opts={"stripe_rows": 2048})
    return enc


def test_update_where_matches_sql(encoded_orders, tmp_path):
    from mothray import pipeline

    out = str(tmp_path / "out")
    res = pipeline.update_where(
        encoded_orders, out, "o_totalprice", 100000.0, 300000.0,
        assign={
            "o_totalprice": lambda t: pc.multiply(t.column("o_totalprice"), 1.1),
            "o_orderpriority": lambda t: pa.array(["UPDATED"] * t.num_rows),
        },
    )
    got = (
        pipeline.decode_files(out)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"""
        SELECT o_orderkey, o_custkey, o_orderstatus,
          CASE WHEN o_totalprice BETWEEN 100000.0 AND 300000.0
               THEN o_totalprice * CAST(1.1 AS DOUBLE) ELSE o_totalprice END AS o_totalprice,
          o_orderdate,
          CASE WHEN o_totalprice BETWEEN 100000.0 AND 300000.0
               THEN 'UPDATED' ELSE o_orderpriority END AS o_orderpriority
        FROM read_parquet('{ORDERS}') ORDER BY o_orderkey
        """
    ).df()
    assert res["rows_updated"] > 0
    assert (got["o_totalprice"].values == exp["o_totalprice"].values).all()
    assert (got["o_orderpriority"].values == exp["o_orderpriority"].values).all()
    assert (got["o_orderkey"].values == exp["o_orderkey"].values).all()


def test_update_where_copies_disjoint_files_verbatim(ray_session, tmp_path):
    """Two files with disjoint key ranges: an update hitting only one
    range must copy the other file byte-identical."""
    from mothray import pipeline

    t = _sample_table(400)
    enc = tmp_path / "enc"
    enc.mkdir()
    lo = stripe_mod.encode_batch(t.filter(pc.less(t.column("k"), 200)), key_prefix="lo")
    hi = stripe_mod.encode_batch(
        t.filter(pc.greater_equal(t.column("k"), 200)), key_prefix="hi"
    )
    pq.write_table(lo, str(enc / "part-lo.parquet"), row_group_size=8,
                   **pipeline.ENCODED_PARQUET_ARGS)
    pq.write_table(hi, str(enc / "part-hi.parquet"), row_group_size=8,
                   **pipeline.ENCODED_PARQUET_ARGS)
    out = tmp_path / "out"
    res = pipeline.update_where(
        str(enc), str(out), "k", 0, 99,
        assign={"price": lambda t: pc.add(t.column("price"), 1.0)},
    )
    assert res["files_rewritten"] == 1 and res["rows_updated"] == 100
    with open(enc / "part-hi.parquet", "rb") as a, open(out / "part-hi.parquet", "rb") as b:
        assert a.read() == b.read()  # untouched file: byte-identical copy


def test_update_where_null_predicate_rows_untouched(ray_session, tmp_path):
    from mothray import pipeline

    t = pa.table(
        {
            "k": pa.array([1, 2, 3, 4], pa.int64()),
            "v": pa.array([1.0, None, 3.0, None]),
            "w": pa.array([10.0, 20.0, 30.0, 40.0]),
        }
    )
    enc = tmp_path / "enc"
    enc.mkdir()
    pq.write_table(stripe_mod.encode_batch(t), str(enc / "p.parquet"),
                   row_group_size=8, **pipeline.ENCODED_PARQUET_ARGS)
    out = tmp_path / "out"
    res = pipeline.update_where(
        str(enc), str(out), "v", 0.0, 10.0,
        assign={"w": lambda t: pc.multiply(t.column("w"), 0.0)},
    )
    got = pipeline.decode_files(str(out)).to_pandas().sort_values("k")
    assert res["rows_updated"] == 2  # nulls in v never match
    assert got["w"].tolist() == [0.0, 20.0, 0.0, 40.0]


def test_cast_column_roundtrip_and_pruning(ray_session, tmp_path):
    from mothray import pipeline

    """float64 -> int64 migration: values survive exactly, the stripe
    schema record updates, and zone maps rebuilt from the CAST values
    still prune encoded scans correctly."""
    src = pa.table(
        {
            "k": pa.array(range(100), pa.int64()),
            "q": pa.array([float(i % 10) for i in range(100)], pa.float64()),
            "s": pa.array([f"s{i}" for i in range(100)]),
        }
    )
    raw = tmp_path / "src.parquet"
    pq.write_table(src, raw)
    enc, out = tmp_path / "enc", tmp_path / "cast"
    pipeline.encode_parquet_to_dir(str(raw), str(enc))
    res = pipeline.cast_column(str(enc), str(out), "q", pa.int64())
    assert res["stripes_rewritten"] >= 1
    got = pipeline.decode_files(str(out)).to_pandas().sort_values("k").reset_index(drop=True)
    assert got["q"].dtype == np.int64
    assert got["q"].tolist() == [i % 10 for i in range(100)]
    assert got["s"].tolist() == [f"s{i}" for i in range(100)]
    # predicate pushdown over the migrated column (int domain now)
    f = pipeline.filter_encoded_multi(str(out), [("q", "ge", 8)], columns=["k", "q"])
    vals = sorted(r["q"] for r in f.take_all())
    assert vals and all(v >= 8 for v in vals)
    assert len(vals) == 20


def test_cast_column_lossy_raises(ray_session, tmp_path):
    from mothray import pipeline

    src = pa.table({"k": [1, 2], "q": [1.5, 2.0]})
    raw = tmp_path / "src.parquet"
    pq.write_table(src, raw)
    enc, out = tmp_path / "enc", tmp_path / "cast"
    pipeline.encode_parquet_to_dir(str(raw), str(enc))
    with pytest.raises(Exception):
        pipeline.cast_column(str(enc), str(out), "q", pa.int64())


def test_cast_column_to_string(ray_session, tmp_path):
    from mothray import pipeline

    src = pa.table({"k": [1, 2, 3], "q": pa.array([10, None, 30], pa.int64())})
    raw = tmp_path / "src.parquet"
    pq.write_table(src, raw)
    enc, out = tmp_path / "enc", tmp_path / "cast"
    pipeline.encode_parquet_to_dir(str(raw), str(enc))
    pipeline.cast_column(str(enc), str(out), "q", pa.string())
    got = pipeline.decode_files(str(out)).to_pandas().sort_values("k")
    assert got["q"].tolist() == ["10", None, "30"]
