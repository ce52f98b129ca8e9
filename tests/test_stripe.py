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


def _random_dense_union(r, n):
    codes = r.integers(0, 2, n).astype(np.int8)
    offs = np.zeros(n, dtype=np.int32)
    for c in (0, 1):
        m = codes == c
        offs[m] = np.arange(int(m.sum()), dtype=np.int32)
    child0 = pa.array(r.integers(-(2**40), 2**40, int((codes == 0).sum())), type=pa.int64())
    child1 = pa.array(
        ["".join(chr(r.integers(97, 123)) for _ in range(int(r.integers(0, 12)))) for _ in range(int((codes == 1).sum()))]
    )
    return pa.UnionArray.from_dense(
        pa.array(codes, type=pa.int8()), pa.array(offs, type=pa.int32()), [child0, child1], ["a", "b"], [0, 1]
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_stripe_random_mixed_table_roundtrip(seed):
    """Randomized mixed-type stripe round-trip (SURVEY §5.2 item 2 at
    stripe granularity): every column bit-identical."""
    r = np.random.default_rng(seed)
    n = int(r.integers(1, 4000))

    def nullify(arr, p=0.15):
        mask = r.random(n) < p
        return pa.array([None if m else v for v, m in zip(arr, mask)])

    strings = ["".join(chr(r.integers(32, 1200)) for _ in range(r.integers(0, 40))) for _ in range(n)]
    tbl = pa.table(
        {
            "i": nullify(r.integers(-(2**62), 2**62, n).tolist()),
            "f": pa.array(r.standard_normal(n)),
            "b": nullify(r.integers(0, 2, n).astype(bool).tolist()),
            "s": nullify(strings),
            "ts": pa.array(r.integers(-(2**48), 2**48, n), type=pa.int64()).cast(pa.timestamp("us")),
            "lst": pa.array([r.integers(0, 100, r.integers(0, 5)).tolist() for _ in range(n)], type=pa.list_(pa.int64())),
            "bin": pa.array([bytes(r.integers(0, 256, r.integers(0, 60)).astype(np.uint8)) for _ in range(n)], type=pa.binary()),
            "dec38": pa.array(
                [None if r.random() < 0.1 else __import__("decimal").Decimal(int(r.integers(-(2**62), 2**62)) * int(r.integers(1, 2**60))).scaleb(-7) for _ in range(n)],
                type=pa.decimal128(38, 7),
            ),
            "u": _random_dense_union(r, n),
        }
    )
    enc = stripe.encode_batch(tbl, {"stripe_rows": 1500})
    dec = stripe.decode_batch(enc)
    for c in tbl.column_names:
        assert dec.column(c).combine_chunks().equals(tbl.column(c).combine_chunks()), c


def test_beats_orc_zlib_oracle():
    """The BASELINE compression gate, pinned as a regression test:
    total encoded bytes <= pyarrow.orc (ZLIB) on testdata + CC pages."""
    import io

    import pyarrow.orc as orc

    from mothray import datagen

    for name, tbl in [
        ("documents", pq.read_table("/root/testdata/sf0.01/documents.parquet")),
        ("events", pq.read_table("/root/testdata/sf0.01/events.parquet")),
        ("cc_pages", datagen.cc_pages(4000, seed=3)),
    ]:
        enc = stripe.encode_batch(tbl)
        ours = sum(enc.column("enc_bytes").to_pylist())
        buf = io.BytesIO()
        orc.write_table(tbl, buf, compression="zlib")
        assert ours <= buf.tell(), f"{name}: ours {ours} > orc {buf.tell()}"


def test_decode_from_signed_format_memoryview():
    """pyarrow Buffers expose memoryview format 'b' (signed); codec
    header scans must still read bytes as 0..255 (regression: html
    LENGTH streams with header bytes >= 0x80 mis-parsed and overran)."""
    from mothray import datagen

    tbl = datagen.cc_pages(1500, seed=9)
    enc = stripe.encode_batch(tbl)
    row = {
        n: (
            memoryview(enc.column(n)[0].as_buffer())  # format 'b' on purpose
            if n in ("blob", "blooms")
            else enc.column(n)[0].as_py()
        )
        for n in enc.column_names
    }
    assert row["blob"].format == "b"
    out = stripe.decode_stripe(row)
    assert out.num_rows == tbl.num_rows
    for c in tbl.column_names:
        assert out.column(c).combine_chunks().equals(tbl.column(c).combine_chunks())


def test_stripe_dict_plan_roundtrip():
    """column_plans int/float dict encodings flow through encode_stripe
    and roundtrip (the per-column opts plumbing, not just encode_array)."""
    rng2 = np.random.default_rng(2)
    hashes = rng2.choice(rng2.integers(0, 2**63, 200, dtype=np.int64), 20000)
    disc = rng2.choice(np.array([0.0, 0.01, 0.05, 0.1]), 20000)
    tbl = pa.table({"h": pa.array(hashes), "d": pa.array(disc)})
    enc = stripe.encode_stripe(
        tbl,
        {"column_plans": {"h": {"int_encoding": "dict"}, "d": {"float_encoding": "dict"}}},
    )
    assert stripe.decode_stripe(enc).equals(tbl)


def test_trigram_bloom_membership():
    vals = [b"the quick brown fox", b"jumps over the lazy dog", b"merge sort"]
    lengths = np.array([len(v) for v in vals], dtype=np.int64)
    data = np.frombuffer(b"".join(vals), dtype=np.uint8)
    bf = bloom.build_trigrams(lengths, data)
    assert bloom.might_contain_substring(bf, "quick brown")
    assert bloom.might_contain_substring(bf, "merge sort")
    assert not bloom.might_contain_substring(bf, "zzqxv")
    # boundary straddle: "foxjumps" spans two values -> must say no
    assert not bloom.might_contain_substring(bf, "foxjump")
    # sub-3-byte needles are untestable -> conservative True
    assert bloom.might_contain_substring(bf, "zq")


def test_trigram_bloom_native_numpy_parity(monkeypatch):
    rng2 = np.random.default_rng(7)
    vals = [
        bytes(rng2.integers(0, 256, rng2.integers(0, 60)).astype(np.uint8))
        for _ in range(50)
    ]
    lengths = np.array([len(v) for v in vals], dtype=np.int64)
    data = np.frombuffer(b"".join(vals), dtype=np.uint8)
    b_native = bloom.build_trigrams(lengths, data)
    monkeypatch.setenv("MOTHRAY_TRIGRAM_NUMPY", "1")
    b_numpy = bloom.build_trigrams(lengths, data)
    assert b_native == b_numpy


def test_tri_bloom_in_stripe_meta_long_columns_only():
    tbl = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    enc = stripe.encode_batch(tbl)
    meta = json.loads(enc.column("meta")[0].as_py())
    # text is long -> tri bloom; lang/source are short categoricals -> skipped
    assert "text" in meta["tri_blooms"]
    assert "lang" not in meta["tri_blooms"] and "source" not in meta["tri_blooms"]
    blooms = enc.column("blooms")[0].as_py()
    off, ln = meta["tri_blooms"]["text"]
    tb = blooms[off : off + ln]
    sample = tbl.column("text")[0].as_py()
    assert bloom.might_contain_substring(tb, sample[10:24])
    assert not bloom.might_contain_substring(tb, "\x01\x02\x03\x04\x05")
    # value bloom offsets still index correctly alongside tri blooms
    voff, vln = meta["blooms"]["lang"]
    assert bloom.might_contain(
        blooms[voff : voff + vln], [tbl.column("lang")[0].as_py()]
    )[0]
