"""Stripe-level round-trip + stats + bloom tests (SURVEY.md §5.2 item 3
precursor; FIXTURES.md F1/F5)."""

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mothray import bloom, stripe


def roundtrip_table(tbl: pa.Table, opts=None):
    enc = stripe.encode_batch(tbl, opts)
    dec = stripe.decode_batch(enc)
    assert dec.schema == tbl.schema
    assert dec.num_rows == tbl.num_rows
    for name in tbl.column_names:
        a = tbl.column(name).combine_chunks()
        b = dec.column(name).combine_chunks()
        assert a.equals(b), f"column {name} not bit-identical"
    return enc


@pytest.mark.parametrize("name", ["documents", "events", "lineitem", "embeddings", "orders", "nation"])
def test_testdata_roundtrip(name):
    tbl = pq.read_table(f"/root/testdata/sf0.001/{name}.parquet")
    enc = roundtrip_table(tbl)
    # encoded+compressed should beat raw logical bytes on these tables
    total_enc = sum(enc.column("enc_bytes").to_pylist())
    assert total_enc < tbl.nbytes


def test_stripe_splitting():
    tbl = pa.table({"x": np.arange(100000, dtype=np.int64)})
    enc = stripe.encode_batch(tbl, {"stripe_bytes": 100_000})
    assert enc.num_rows > 1
    dec = stripe.decode_batch(enc)
    assert dec.column("x").equals(tbl.column("x"))
    keys = enc.column("stripe_key").to_pylist()
    assert len(set(keys)) == len(keys)


def test_column_projection():
    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    enc = stripe.encode_batch(tbl)
    dec = stripe.decode_batch(enc, columns=["doc_id", "lang"])
    assert dec.column_names == ["doc_id", "lang"]
    assert dec.column("doc_id").combine_chunks().equals(tbl.column("doc_id").combine_chunks())


def test_stats_present_and_correct():
    tbl = pq.read_table("/root/testdata/sf0.001/lineitem.parquet")
    enc = stripe.encode_batch(tbl)
    st = json.loads(enc.column("stats")[0].as_py())
    first = stripe.split_for_stripes(tbl)[0]
    qty = first.column("l_quantity")
    assert st["l_quantity"]["min"] == min(qty.to_pylist())
    assert st["l_quantity"]["max"] == max(qty.to_pylist())
    assert st["l_orderkey"]["sum"] == sum(first.column("l_orderkey").to_pylist())


def test_bloom_membership():
    lengths = np.array([5, 3, 7], dtype=np.int64)
    data = np.frombuffer(b"applebeecherry7", dtype=np.uint8)
    bf = bloom.build(lengths, data)
    hits = bloom.might_contain(bf, ["apple", "bee", "cherry7", "absent", "zzzzz"])
    assert hits[:3].all()
    assert not hits[3] or not hits[4]  # fpp 0.05: at least one miss of two


def test_bloom_fpp_reasonable():
    n = 5000
    vals = [f"key-{i}" for i in range(n)]
    bs = b"".join(v.encode() for v in vals)
    lengths = np.array([len(v) for v in vals], dtype=np.int64)
    bf = bloom.build(lengths, np.frombuffer(bs, dtype=np.uint8))
    probes = [f"miss-{i}" for i in range(2000)]
    fp = bloom.might_contain(bf, probes).sum() / 2000
    assert fp < 0.12, f"false positive rate {fp}"


def test_bloom_in_stripe_meta():
    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    enc = stripe.encode_batch(tbl)
    meta = json.loads(enc.column("meta")[0].as_py())
    assert "lang" in meta["blooms"] and "text" in meta["blooms"]
    blooms = enc.column("blooms")[0].as_py()
    off, ln = meta["blooms"]["lang"]
    langs = set(tbl.column("lang").to_pylist())
    bf = blooms[off : off + ln]
    assert bloom.might_contain(bf, list(langs)[:5]).all()
