"""End-to-end Ray Data pipeline tests (SURVEY.md §5.2 item 3):
read_parquet -> encode -> write -> read -> decode -> bit-identical."""

import json
import os

import numpy as np

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mothray import datagen, pipeline, stripe


@pytest.fixture(scope="module")
def cc_table(tmp_path_factory):
    tbl = datagen.cc_pages(5000, seed=42)
    path = tmp_path_factory.mktemp("cc") / "cc_pages.parquet"
    pq.write_table(tbl, path)
    return tbl, str(path)


def _sorted_by_url(tbl: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    return tbl.take(pc.sort_indices(tbl.column("url")))


def test_cc_pages_e2e_roundtrip(ray_session, cc_table, tmp_path):
    import ray.data

    tbl, path = cc_table
    ds = ray.data.read_parquet(path)
    enc = pipeline.encode_dataset(ds, {"stripe_bytes": 1 << 20})
    out = str(tmp_path / "encoded")
    enc.write_parquet(out)

    back = pipeline.read_encoded(out)
    dec = pipeline.decode_dataset(back)
    result = pa.concat_tables(
        [b for b in dec.iter_batches(batch_format="pyarrow", batch_size=None)]
    ).combine_chunks()
    assert result.num_rows == tbl.num_rows
    # order-insensitive bit-identity: sort both by url
    a = _sorted_by_url(tbl.select(result.column_names))
    b = _sorted_by_url(result)
    for col in a.column_names:
        assert a.column(col).combine_chunks().equals(b.column(col).combine_chunks()), col
    # per-url byte-identical text: the cross-engine invariant (input_hint)
    assert a.column("text").equals(b.column("text"))


def test_decode_projection(ray_session, cc_table, tmp_path):
    import ray.data

    tbl, path = cc_table
    enc = pipeline.encode_dataset(ray.data.read_parquet(path))
    dec = pipeline.decode_dataset(enc, columns=["url", "lang"])
    got = dec.schema().names
    assert got == ["url", "lang"]


def test_stats_pruning(ray_session, tmp_path):
    """FIXTURES.md F5: clustered keys -> disjoint stripe ranges -> stripes
    skipped via stats without decoding."""
    import numpy as np
    import ray.data

    n = 40000
    tbl = pa.table(
        {
            "k": pa.array(np.sort(np.random.default_rng(1).integers(0, 1000, n))),
            "needle": pa.array([f"v{i//100}" for i in range(n)]),
        }
    )
    enc_tbl = stripe.encode_batch(tbl, {"stripe_bytes": 50_000})
    assert enc_tbl.num_rows >= 4
    enc = ray.data.from_arrow(enc_tbl)

    pruned = pipeline.prune_stripes(enc, "k", min_value=990, max_value=None)
    kept = pruned.count()
    assert 0 < kept < enc_tbl.num_rows
    dec = pa.concat_tables(
        pipeline.decode_dataset(pruned).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    ks = dec.column("k").to_pylist()
    assert max(ks) >= 990
    expect = [k for k in tbl.column("k").to_pylist() if k >= 990]
    got = [k for k in ks if k >= 990]
    assert sorted(got) == sorted(expect)

    # bloom pruning: needle guaranteed absent
    pruned2 = pipeline.prune_stripes(enc, "needle", needle="definitely-absent-xyz")
    assert pruned2.count() < enc_tbl.num_rows / 2  # most stripes bloom-skipped


def test_host_bucketing_and_salting(ray_session, cc_table):
    import ray.data

    tbl, path = cc_table
    ds = ray.data.read_parquet(path)
    hot = pipeline.sample_host_frequencies(ds, fraction=0.5, hot_fraction=0.02)
    assert isinstance(hot, dict)
    bucketed = pipeline.add_host_bucket(ds, num_buckets=8, hot_hosts=hot)
    pdf = bucketed.groupby("bucket").count().to_pandas()
    assert pdf["count()"].sum() == tbl.num_rows
    assert len(pdf) > 1  # rows actually spread across buckets


def test_encode_metrics_in_meta(ray_session, cc_table):
    tbl, _ = cc_table
    enc = stripe.encode_batch(tbl.slice(0, 1000))
    meta = json.loads(enc.column("meta")[0].as_py())
    assert "codecs" in meta["metrics"]
    assert meta["metrics"]["codecs"]["lang"] == "DICT"


def test_encode_clustered_by_host(ray_session, cc_table):
    """North-rule skew path: salted host-bucket shuffle -> per-bucket
    encode -> round-trip intact; clustering must not lose rows and the
    bucket keys show up in stripe lineage."""
    import ray.data

    tbl, path = cc_table
    ds = ray.data.read_parquet(path)
    enc = pipeline.encode_clustered(ds, num_buckets=8)
    stripes = pa.concat_tables(enc.iter_batches(batch_format="pyarrow", batch_size=None))
    assert sum(stripes.column("n_rows").to_pylist()) == tbl.num_rows
    keys = stripes.column("stripe_key").to_pylist()
    assert all(k.startswith("b") for k in keys)
    assert len({k.split("-")[0] for k in keys}) > 1  # multiple buckets

    dec = pipeline.decode_dataset(ray.data.from_arrow(stripes))
    got = pa.concat_tables(dec.iter_batches(batch_format="pyarrow", batch_size=None))
    a = _sorted_by_url(tbl.select(got.column_names))
    b = _sorted_by_url(got)
    for col in a.column_names:
        assert a.column(col).combine_chunks().equals(b.column(col).combine_chunks()), col


def test_row_group_pruning(ray_session):
    """Reference selectRowGroups semantics: decode only row groups whose
    min/max overlap the predicate; skipped groups never decompress."""
    import json

    import numpy as np
    import ray.data

    n = 50000
    tbl = pa.table(
        {
            "k": pa.array(np.sort(np.random.default_rng(2).integers(0, 1000, n))),
            "v": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    enc_tbl = stripe.encode_batch(tbl, {"row_group_rows": 5000})
    meta = json.loads(enc_tbl.column("meta")[0].as_py())
    assert meta["row_groups"]["count"] == 10
    assert "k" in meta["row_groups"]["stats"]

    # direct selection
    keep = stripe.select_row_groups(meta, "k", min_value=900)
    assert 0 < len(keep) < 10

    # pipeline decode with predicate: fewer rows out, all matches present
    enc = ray.data.from_arrow(enc_tbl)
    dec = pipeline.decode_dataset(enc, rg_predicate=("k", 900, None))
    got = pa.concat_tables(dec.iter_batches(batch_format="pyarrow", batch_size=None))
    assert got.num_rows < n
    expect = [k for k in tbl.column("k").to_pylist() if k >= 900]
    mine = [k for k in got.column("k").to_pylist() if k >= 900]
    assert sorted(mine) == sorted(expect)


def test_row_group_roundtrip_bit_identical(ray_session, cc_table):
    tbl, _ = cc_table
    enc = stripe.encode_batch(tbl, {"row_group_rows": 777})  # odd size, many groups
    dec = stripe.decode_batch(enc)
    for c in tbl.column_names:
        assert dec.column(c).combine_chunks().equals(tbl.column(c).combine_chunks()), c


def test_prune_read_metadata_only(ray_session, tmp_path, monkeypatch):
    """prune_read filters on a metadata-only read and fetches ONLY row
    groups containing surviving stripes — blob bytes read scale with
    survivors, not the corpus (VERDICT r1 item 5)."""
    import pyarrow.parquet as pq
    import ray.data

    n = 20000
    tbl = pa.table({"k": pa.array(range(n), type=pa.int64()), "v": [f"val{i:06d}" for i in range(n)]})
    ds = ray.data.from_arrow(tbl).sort("k")
    enc = pipeline.encode_dataset(ds, {"stripe_rows": 1000, "batch_rows": 1000})
    out = str(tmp_path / "enc")
    pipeline.write_encoded(enc, out, row_group_size=2)

    cutoff = n - 1500
    dec = pipeline.decode_dataset(pipeline.prune_read(out, "k", min_value=cutoff))
    got = pa.concat_tables(dec.iter_batches(batch_format="pyarrow", batch_size=None))
    ks = sorted(got.column("k").to_pylist())
    assert set(range(cutoff, n)) <= set(ks)  # no survivor lost
    assert len(ks) < n // 2  # stripes actually pruned

    # accounting: run the fetch stage directly with counted row-group reads
    meta = pipeline.read_encoded(out, metadata_only=True, include_paths=True)
    surv = pa.concat_tables(
        pipeline.prune_stripes(meta, "k", min_value=cutoff).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    calls = {"full": 0, "meta": 0}
    orig = pq.ParquetFile.read_row_group

    def counting(self, rg, columns=None, **kw):
        calls["meta" if columns == ["stripe_key"] else "full"] += 1
        return orig(self, rg, columns=columns, **kw)

    monkeypatch.setattr(pq.ParquetFile, "read_row_group", counting)
    fetched = pa.concat_tables(pipeline._FetchStripes()(surv))
    total_rg = sum(
        pq.ParquetFile(os.path.join(out, f)).metadata.num_row_groups
        for f in os.listdir(out)
        if f.endswith(".parquet")
    )
    assert fetched.num_rows == surv.num_rows
    assert calls["meta"] == total_rg  # key column scanned everywhere (tiny)
    assert calls["full"] < total_rg / 2  # blob reads only where survivors live


def test_cli_prune_command(ray_session, tmp_path):
    """python -m mothray prune: stats-pruned decode of a checkpointed
    job's output via the metadata-only path."""
    import pyarrow.compute as pc

    from mothray import __main__ as cli

    n = 6000
    rnd = np.random.default_rng(4)
    vals = ["".join(chr(97 + c) for c in rnd.integers(0, 26, 240)) for i in range(n)]
    tbl = pa.table({"k": pa.array(range(n), type=pa.int64()), "v": vals})
    src = str(tmp_path / "in.parquet")
    pq.write_table(tbl, src, row_group_size=1000)  # units for partition splitting
    enc = str(tmp_path / "enc")
    assert cli.main(["encode", src, enc, "--partition-mb", "1"]) == 0
    out = str(tmp_path / "pruned")
    assert cli.main(["prune", enc, out, "--column", "k", "--min", str(n - 500)]) == 0
    got = pq.read_table(out)
    ks = got.column("k").to_pylist()
    assert set(range(n - 500, n)) <= set(ks)  # no survivor lost
    assert len(ks) < n  # something pruned


def test_cli_scan_command(ray_session, tmp_path):
    """python -m mothray scan: exact conjunctive pushdown + projection,
    parquet out (row-exact, unlike stripe-level prune)."""
    import pyarrow.compute as pc

    from mothray import __main__ as cli

    n = 5000
    rnd = np.random.default_rng(9)
    tbl = pa.table(
        {
            "k": pa.array(range(n), type=pa.int64()),
            "grp": pa.array(rnd.choice(["a", "b", "c"], n)),
            "x": pa.array(rnd.uniform(0, 100, n)),
        }
    )
    src = str(tmp_path / "in.parquet")
    pq.write_table(tbl, src, row_group_size=1000)
    enc = str(tmp_path / "enc")
    assert cli.main(["encode", src, enc, "--partition-mb", "1"]) == 0
    out = str(tmp_path / "scanned")
    assert cli.main([
        "scan", enc, out, "--where", "grp eq b", "--where", "x ge 50.0",
        "--columns", "k,x",
    ]) == 0
    got = pq.read_table(out)
    mask = pc.and_(pc.equal(tbl.column("grp"), "b"), pc.greater_equal(tbl.column("x"), 50.0))
    exp = tbl.filter(mask)
    assert sorted(got.column_names) == ["k", "x"]
    assert sorted(got.column("k").to_pylist()) == sorted(exp.column("k").to_pylist())
    # projection-only path (no predicate)
    out2 = str(tmp_path / "proj")
    assert cli.main(["scan", enc, out2, "--columns", "grp"]) == 0
    assert pq.read_table(out2).num_rows == n


def test_schema_evolution_name_mapping(ray_session):
    """Name-based reader schema mapping (reference
    NameBasedFieldMapper.go:23-31): a target schema selects stored
    columns case-insensitively, casts widened types, and fills columns
    the writer never saw with typed nulls."""
    import ray.data

    tbl = pa.table(
        {
            "Id": pa.array(range(500), type=pa.int32()),
            "name": [f"n{i}" for i in range(500)],
            "score": pa.array(np.linspace(0, 1, 500), type=pa.float32()),
        }
    )
    enc = pipeline.encode_dataset(ray.data.from_arrow(tbl), {"stripe_rows": 128})
    target = pa.schema(
        [
            ("id", pa.int64()),        # case-insensitive match + widen int32 -> int64
            ("score", pa.float64()),   # widen float
            ("added_later", pa.string()),  # not in the file -> nulls
        ]
    )
    dec = pipeline.decode_dataset(enc, target_schema=target)
    got = pa.concat_tables(dec.iter_batches(batch_format="pyarrow", batch_size=None))
    assert got.schema == target
    assert sorted(got.column("id").to_pylist()) == list(range(500))
    assert got.column("added_later").null_count == 500
    import pyarrow.compute as pc

    assert abs(pc.sum(got.column("score")).as_py() - float(np.linspace(0, 1, 500).sum())) < 1e-6


def test_streaming_verify(ray_session, tmp_path):
    """Order-insensitive streaming verify: equal multisets match across
    different orderings; a single changed value is detected. Nothing
    materializes on the driver (one fingerprint row per batch)."""
    import ray.data

    tbl = datagen.cc_pages(3000, seed=3)
    enc = pipeline.encode_dataset(ray.data.from_arrow(tbl), {"stripe_rows": 512})
    dec = pipeline.decode_dataset(enc)
    assert pipeline.verify_roundtrip_streaming(ray.data.from_arrow(tbl), dec)
    # permuted rows still match (multiset semantics)
    perm = tbl.take(pa.array(np.random.default_rng(0).permutation(tbl.num_rows)))
    assert pipeline.verify_roundtrip_streaming(ray.data.from_arrow(perm), dec)
    # a one-cell corruption is detected
    bad = tbl.set_column(
        tbl.column_names.index("lang"),
        "lang",
        pa.array(["xx"] + tbl.column("lang").to_pylist()[1:]),
    )
    assert not pipeline.verify_roundtrip_streaming(ray.data.from_arrow(bad), dec)
    # a dropped row is detected even though sums could... (count differs)
    assert not pipeline.verify_roundtrip_streaming(ray.data.from_arrow(tbl.slice(1)), dec)


def test_encode_files_fused_roundtrip(ray_session, tmp_path):
    """encode_files reads row groups inside the encode task (no raw-row
    object-store hop) and must be (a) bit-identical on decode, (b)
    deterministic across runs (stable work-unit list + content-keyed
    stripes), (c) equivalent for single- and multi-file inputs."""
    import pyarrow.parquet as pq
    import ray.data

    from mothray import datagen

    tbl = datagen.cc_pages(3000, seed=33)
    single = str(tmp_path / "single.parquet")
    pq.write_table(tbl, single, row_group_size=500)
    multi = tmp_path / "multi"
    multi.mkdir()
    pq.write_table(tbl.slice(0, 1500), str(multi / "a.parquet"), row_group_size=500)
    pq.write_table(tbl.slice(1500), str(multi / "b.parquet"), row_group_size=500)

    orig = ray.data.from_arrow(tbl)
    for path in (single, str(multi)):
        enc = pipeline.encode_files(path, target_bytes=200_000)
        dec = pipeline.decode_dataset(enc)
        assert pipeline.verify_roundtrip(orig, dec, "url")

    # determinism: two executions produce identical stripe keys+bytes
    def fingerprint(path):
        enc = pipeline.encode_files(path, target_bytes=200_000).to_pandas()
        enc = enc.sort_values("stripe_key").reset_index(drop=True)
        return list(zip(enc["stripe_key"], enc["enc_bytes"], enc["blob"].map(hash)))

    assert fingerprint(single) == fingerprint(single)


def test_encode_files_giant_row_group_sliced(ray_session, tmp_path):
    """A file written as ONE giant row group (common writer default)
    must not collapse into a single encode task: encode_files slices
    the oversized unit into row ranges so parallelism is restored,
    and the roundtrip stays bit-identical."""
    import pyarrow.parquet as pq
    import ray.data

    from mothray import datagen

    tbl = datagen.cc_pages(4000, seed=44)
    path = str(tmp_path / "giant.parquet")
    pq.write_table(tbl, path)  # single row group
    assert pq.ParquetFile(path).metadata.num_row_groups == 1

    enc = pipeline.encode_files(path, target_bytes=150_000)
    enc_tbl = enc.to_pandas()
    # the giant unit was split into several slice work units
    assert enc_tbl["stripe_key"].str.contains(r"s\d+").any()
    assert len(enc_tbl) > 2
    dec = pipeline.decode_dataset(ray.data.from_pandas(enc_tbl))
    assert pipeline.verify_roundtrip(ray.data.from_arrow(tbl), dec, "url")

    # slice boundaries are deterministic across runs
    keys = sorted(enc_tbl["stripe_key"])
    enc2 = pipeline.encode_files(path, target_bytes=150_000).to_pandas()
    assert sorted(enc2["stripe_key"]) == keys


def test_compact_encoded(ray_session, tmp_path):
    """Compaction merges many small encoded part files into few big
    ones with bit-identical decode and no re-encoding (blob bytes are
    byte-equal across the rewrite)."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    from mothray import datagen, pipeline

    tbl = datagen.cc_pages(2000, seed=21)
    src = tmp_path / "parts"
    src.mkdir()
    # simulate a resumable job's many small outputs: one file per slice
    for i in range(8):
        enc = pipeline.encode_dataset(ray.data.from_arrow(tbl.slice(i * 250, 250)))
        pipeline.write_encoded(enc, str(src / f"job{i}"), row_group_size=2)
    files = [str(p / f) for p in sorted(src.iterdir()) for f in sorted(os.listdir(p))]
    out = tmp_path / "compacted"
    res = pipeline.compact_encoded(files, str(out), target_mb=1)
    assert res["files_in"] == len(files)
    assert res["files_out"] < res["files_in"]
    # decode parity: compacted vs original file set
    a = pipeline.decode_files(files)
    b = pipeline.decode_files(str(out))
    assert pipeline.verify_roundtrip(a, b, "url")
    # stripes survived byte-identical (no re-encode)
    def blobs(paths):
        t = pa.concat_tables([pq.read_table(p, columns=["stripe_key", "blob"]) for p in paths])
        return sorted(zip(t.column("stripe_key").to_pylist(), [b.as_py() for b in t.column("blob")]))
    out_files = [str(out / f) for f in sorted(os.listdir(out))]
    assert blobs(files) == blobs(out_files)


def test_blob_checksum_detects_corruption(ray_session):
    """A flipped byte anywhere in the stripe blob fails decode loudly
    instead of surfacing as codec garbage or silently wrong values."""
    import pytest as _pytest

    from mothray import datagen, stripe

    tbl = datagen.cc_pages(300, seed=4)
    enc = stripe.encode_batch(tbl)
    row = {name: enc.column(name)[0].as_py() for name in enc.column_names}
    assert stripe.decode_stripe(dict(row)).num_rows > 0  # clean decode

    blob = bytearray(row["blob"])
    blob[len(blob) // 2] ^= 0xFF
    bad = dict(row)
    bad["blob"] = bytes(blob)
    with _pytest.raises(ValueError, match="checksum mismatch"):
        stripe.decode_stripe(bad)


def test_delete_where_surgical(ray_session, tmp_path):
    """delete_where removes exactly the rows in the range, re-encodes
    only overlapping stripes, copies disjoint files byte-identical,
    and keeps decode bit-identity for survivors."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data

    from mothray import checkpoint, datagen

    tbl = datagen.cc_pages(3000, seed=55)
    # add a sortable int column with disjoint ranges per file
    tbl = tbl.append_column("page_id", pa.array(range(3000), type=pa.int64()))
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(tbl.slice(0, 1500), str(src / "a.parquet"), row_group_size=500)
    pq.write_table(tbl.slice(1500), str(src / "b.parquet"), row_group_size=500)
    enc = tmp_path / "enc"
    checkpoint.encode_job([str(src / "a.parquet"), str(src / "b.parquet")], str(enc),
                          target_partition_bytes=1 << 20)

    out = tmp_path / "out"
    res = pipeline.delete_where(str(enc), str(out), "page_id", 100, 200)
    assert res["rows_deleted"] == 101
    assert res["stripes_rewritten"] >= 1

    dec = pipeline.decode_files(str(out))
    expected = tbl.filter(
        pc.invert(pc.and_(pc.greater_equal(tbl.column("page_id"), 100),
                          pc.less_equal(tbl.column("page_id"), 200)))
    )
    assert pipeline.verify_roundtrip(ray.data.from_arrow(expected), dec, "page_id")

    # files whose stripes are all outside the range must be byte-identical
    touched = 0
    for f in sorted(os.listdir(enc)):
        if not f.endswith(".parquet"):
            continue
        a = open(enc / f, "rb").read()
        b = open(out / f, "rb").read()
        if a != b:
            touched += 1
    assert touched == res["files_rewritten"] >= 1
    assert touched < sum(1 for f in os.listdir(enc) if f.endswith(".parquet"))

    # one-sided + no-match delete
    res2 = pipeline.delete_where(str(enc), str(tmp_path / "out2"), "page_id", 999999, None)
    assert res2["rows_deleted"] == 0 and res2["files_rewritten"] == 0


def test_upsert_keys_surgical(ray_session, tmp_path):
    """upsert_keys replaces matching-key rows, appends the new batch,
    copies disjoint files byte-identical, result == anti-join + union."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data

    from mothray import checkpoint, datagen

    tbl = datagen.cc_pages(3000, seed=66)
    tbl = tbl.append_column("page_id", pa.array(range(3000), type=pa.int64()))
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(tbl.slice(0, 1500), str(src / "a.parquet"), row_group_size=500)
    pq.write_table(tbl.slice(1500), str(src / "b.parquet"), row_group_size=500)
    enc = tmp_path / "enc"
    checkpoint.encode_job([str(src / "a.parquet"), str(src / "b.parquet")], str(enc),
                          target_partition_bytes=1 << 20)

    # replace ids 50..80, add brand-new ids 90000..90009
    upd = tbl.filter(pc.and_(pc.greater_equal(tbl.column("page_id"), 50),
                             pc.less_equal(tbl.column("page_id"), 80)))
    upd = upd.set_column(upd.column_names.index("lang"), "lang",
                         pa.array(["xx"] * upd.num_rows))
    fresh = tbl.slice(0, 10).set_column(
        tbl.column_names.index("page_id"), "page_id",
        pa.array(range(90000, 90010), type=pa.int64()))
    batch = pa.concat_tables([upd, fresh])

    out = tmp_path / "out"
    res = pipeline.upsert_keys(str(enc), str(out), batch, key="page_id")
    assert res["rows_replaced"] == 31
    assert res["rows_upserted"] == 41

    dec = pipeline.decode_files(str(out))
    keep = pc.invert(pc.is_in(tbl.column("page_id"), value_set=batch.column("page_id").combine_chunks()))
    expected = pa.concat_tables([tbl.filter(keep), batch])
    assert pipeline.verify_roundtrip(ray.data.from_arrow(expected), dec, "page_id")

    # untouched files byte-identical
    changed = sum(
        1 for f in sorted(os.listdir(enc)) if f.endswith(".parquet")
        and open(enc / f, "rb").read() != open(out / f, "rb").read()
    )
    assert changed == res["files_rewritten"]
    assert changed < sum(1 for f in os.listdir(enc) if f.endswith(".parquet"))


def test_optimize_encoded_improves_pruning(ray_session, tmp_path):
    """optimize_encoded (distributed sort re-encode) keeps content
    bit-identical and makes zone maps selective: after optimize, a
    range predicate prunes most stripes; before, it prunes none."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from mothray import checkpoint, datagen

    rng = np.random.default_rng(9)
    tbl = datagen.cc_pages(4000, seed=77).append_column(
        "score", pa.array(rng.permutation(4000).astype(np.int64))
    )
    src = tmp_path / "src.parquet"
    pq.write_table(tbl, str(src), row_group_size=500)
    enc = tmp_path / "enc"
    checkpoint.encode_job(str(src), str(enc), target_partition_bytes=200_000)

    # unsorted: every stripe's [min,max] spans ~the full range -> no pruning
    before = pipeline.prune_read(str(enc), "score", min_value=3900)
    n_before = before.count()

    out = tmp_path / "opt"
    res = pipeline.optimize_encoded(str(enc), str(out), sort_by="score",
                                    opts={"stripe_rows": 500})
    assert res["rows"] == 4000

    after = pipeline.prune_read(str(out), "score", min_value=3900)
    n_after = after.count()
    assert n_after < n_before  # stripes actually skipped

    # content preserved exactly
    dec = pipeline.decode_files(str(out))
    assert pipeline.verify_roundtrip(ray.data.from_arrow(tbl), dec, "score")


def test_with_column_appends_streams_only(ray_session, tmp_path):
    """with_column decodes only the input projection, appends the new
    column's streams after the existing blob (old bytes verbatim), and
    the result decodes bit-identical to the full recompute."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data

    from mothray import checkpoint, datagen

    tbl = datagen.cc_pages(3000, seed=88)
    src = tmp_path / "src.parquet"
    pq.write_table(tbl, str(src), row_group_size=500)
    enc = tmp_path / "enc"
    checkpoint.encode_job(str(src), str(enc), target_partition_bytes=400_000)

    out = tmp_path / "out"
    res = pipeline.with_column(
        str(enc), str(out), "text_len",
        lambda t: pc.utf8_length(t.column("text").combine_chunks()).cast(pa.int64()),
        input_columns=["text"],
    )
    assert res["stripes"] > 0

    dec = pipeline.decode_files(str(out))
    exp = tbl.append_column("text_len", pc.utf8_length(tbl.column("text")).cast(pa.int64()))
    assert pipeline.verify_roundtrip(ray.data.from_arrow(exp), dec, "url")

    # old stream bytes reused verbatim: original blob is a prefix
    import os
    for f in sorted(os.listdir(enc)):
        if not f.endswith(".parquet"):
            continue
        a = pq.read_table(enc / f, columns=["stripe_key", "blob"])
        b = pq.read_table(out / f, columns=["stripe_key", "blob"])
        bm = {k: v for k, v in zip(b.column("stripe_key").to_pylist(), b.column("blob").to_pylist())}
        for k, blob in zip(a.column("stripe_key").to_pylist(), a.column("blob").to_pylist()):
            assert bm[k][: len(blob)] == blob

    # projection decode of JUST the derived column works + rg pruning stats exist
    only = pipeline.decode_files(str(out), columns=["text_len"]).to_pandas()
    assert sorted(only["text_len"]) == sorted(exp.column("text_len").to_pylist())


def test_agg_encoded_metadata_only_and_fallback(ray_session, tmp_path):
    """agg_encoded answers COUNT/MIN/MAX/SUM/AVG from stripe stats
    alone; stats the writer dropped (string min/max > 64 bytes) and
    float sums route through the projected decode fallback; SUM/AVG
    over zero non-null values is NULL (SQL semantics)."""
    import duckdb
    import pyarrow.parquet as pq

    from mothray import checkpoint

    n = 3000
    long_s = ["x" * 80 + f"{i:06d}" for i in range(n)]  # > 64-byte stats limit
    tbl = pa.table(
        {
            "k": pa.array(range(n), type=pa.int64()),
            "v": pa.array([float(i % 97) / 8 for i in range(n)]),
            "s": pa.array(long_s),
            "maybe": pa.array([None if i % 3 else i for i in range(n)], type=pa.int64()),
            "void": pa.array([None] * n, type=pa.int64()),
        }
    )
    src = tmp_path / "src.parquet"
    pq.write_table(tbl, str(src), row_group_size=500)
    enc = tmp_path / "enc"
    checkpoint.encode_job(str(src), str(enc), target_partition_bytes=120_000)

    res = pipeline.agg_encoded(
        str(enc),
        {
            "count_star": ("count_star",),
            "count_maybe": ("count", "maybe"),
            "nulls_maybe": ("null_count", "maybe"),
            "min_k": ("min", "k"),
            "max_k": ("max", "k"),
            "sum_k": ("sum", "k"),
            "avg_k": ("avg", "k"),
            "sum_v": ("sum", "v"),
            "min_s": ("min", "s"),  # fallback: stats dropped long-string min/max
            "max_s": ("max", "s"),
            "sum_void": ("sum", "void"),  # SQL NULL
            "avg_void": ("avg", "void"),
            "min_void": ("min", "void"),
        },
    ).to_pandas()
    exp = duckdb.sql(
        "SELECT count(*) count_star, count(maybe) count_maybe,"
        " count(*)-count(maybe) nulls_maybe, min(k) min_k, max(k) max_k,"
        " CAST(sum(k) AS BIGINT) sum_k, CAST(sum(k) AS DOUBLE)/count(k) avg_k,"
        " min(s) min_s, max(s) max_s"
        f" FROM read_parquet('{src}')"
    ).df()
    for c in exp.columns:
        assert str(res[c].iloc[0]) == str(exp[c].iloc[0]), c
    assert abs(res["sum_v"].iloc[0] - sum(tbl.column("v").to_pylist())) < 1e-6
    for c in ("sum_void", "avg_void", "min_void"):
        assert res[c].isna().iloc[0], c


def test_optimize_encoded_zorder_two_columns(ray_session, tmp_path):
    """Z-ORDER optimize: after clustering on (x, y), a range predicate
    on EITHER column alone prunes most stripes (a linear sort can only
    serve its leading key); content stays bit-identical."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from mothray import checkpoint, datagen

    rng = np.random.default_rng(5)
    n = 8000
    tbl = datagen.cc_pages(n, seed=55).append_column(
        "x", pa.array(rng.permutation(n).astype(np.int64))
    ).append_column("y", pa.array(rng.permutation(n).astype(np.int64)))
    src = tmp_path / "src.parquet"
    pq.write_table(tbl, str(src), row_group_size=500)
    enc = tmp_path / "enc"
    checkpoint.encode_job(str(src), str(enc), target_partition_bytes=200_000)

    out = tmp_path / "z"
    res = pipeline.optimize_encoded(str(enc), str(out), sort_by=["x", "y"],
                                    opts={"stripe_rows": 500})
    assert res["rows"] == n

    for col in ("x", "y"):
        before = pipeline.prune_read(str(enc), col, min_value=n - 200).count()
        after = pipeline.prune_read(str(out), col, min_value=n - 200).count()
        assert after < before, col
        assert after < n // 4, col  # most stripes actually skipped

    dec = pipeline.decode_files(str(out))
    assert pipeline.verify_roundtrip(ray.data.from_arrow(tbl), dec, "x")


def test_read_orc_input_stripe_granular(ray_session, tmp_path):
    """ORC migration source: multi-file, multi-stripe .orc reads back
    every row; encode->decode round-trips it."""
    import numpy as np
    import pyarrow as pa
    from pyarrow import orc

    from mothray import pipeline

    t = pa.table(
        {
            "id": pa.array(np.arange(5000)),
            "s": pa.array([f"row {i}" for i in range(5000)]),
        }
    )
    d = tmp_path / "orcs"
    d.mkdir()
    orc.write_table(t.slice(0, 2500), str(d / "a.orc"), stripe_size=16 << 10)
    orc.write_table(t.slice(2500), str(d / "b.orc"), stripe_size=16 << 10)
    assert orc.ORCFile(str(d / "a.orc")).nstripes > 1  # actually stripe-granular
    ds = pipeline.read_orc_input(str(d))
    assert ds.count() == 5000
    dec = pipeline.decode_dataset(pipeline.encode_dataset(pipeline.read_orc_input(str(d))))
    got = sorted(r["id"] for r in dec.take_all())
    assert got == list(range(5000))


def test_write_orc_output_roundtrip(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa

    from mothray import pipeline

    t = pa.table({"id": pa.array(np.arange(2000)), "v": pa.array(np.arange(2000) * 0.5)})
    import ray.data

    out = tmp_path / "orc_out"
    n = pipeline.write_orc_output(ray.data.from_arrow(t), str(out))
    assert n >= 1
    assert not any(p.name.endswith(".tmp") for p in out.iterdir())
    back = pipeline.read_orc_input(str(out))
    got = sorted(r["id"] for r in back.take_all())
    assert got == list(range(2000))


def test_encode_files_hierarchical_planning(ray_session, tmp_path):
    """Wide inputs (> 64 files) plan work units in fan-out probe tasks
    (driver holds O(files), not O(row-groups)); the encoded output
    round-trips and stripe keys stay deterministic across re-plans."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mothray import pipeline

    d = tmp_path / "many"
    d.mkdir()
    n_files, rows_per = 80, 300
    for i in range(n_files):
        t = pa.table(
            {
                "id": pa.array(np.arange(i * rows_per, (i + 1) * rows_per)),
                "s": pa.array([f"file {i} row {j}" for j in range(rows_per)]),
            }
        )
        pq.write_table(t, str(d / f"shard-{i:04d}.parquet"), row_group_size=100)

    enc = pipeline.encode_files(str(d))  # auto-hierarchical above 64 files
    out = str(tmp_path / "enc_h")
    pipeline.write_encoded(enc, out)
    dec = pipeline.decode_files(out)
    got = sorted(r["id"] for r in dec.take_all())
    assert got == list(range(n_files * rows_per))

    # deterministic re-plan: same stripe keys both times (retry identity)
    keys1 = sorted(
        r["stripe_key"] for r in pipeline.read_encoded(out, metadata_only=True).take_all()
    )
    enc2 = pipeline.encode_files(str(d), hierarchical=True)
    out2 = str(tmp_path / "enc_h2")
    pipeline.write_encoded(enc2, out2)
    keys2 = sorted(
        r["stripe_key"] for r in pipeline.read_encoded(out2, metadata_only=True).take_all()
    )
    assert keys1 == keys2

    # flat and hierarchical agree on decoded content for a narrow input
    enc3 = pipeline.encode_files(str(d), hierarchical=False)
    dec3 = pipeline.decode_dataset(enc3)
    assert sorted(r["id"] for r in dec3.take_all()) == got


def test_schema_evolution_rename_drop(ray_session, tmp_path):
    """Metadata-only RENAME/DROP on encoded data: blobs copy through
    untouched, decode sees the new schema, and the skipping stack
    (zone maps, blooms) still prunes under the new name."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mothray import pipeline

    t = pa.table(
        {
            "id": pa.array(np.arange(2000)),
            "txt": pa.array([f"value {i}" for i in range(2000)]),
            "score": pa.array(np.arange(2000) * 0.5),
        }
    )
    src = str(tmp_path / "src")
    pipeline.write_encoded(pipeline.encode_dataset(ray.data.from_arrow(t)), src)

    renamed = str(tmp_path / "renamed")
    pipeline.rename_column_encoded(src, renamed, "txt", "body")
    dec = pa.Table.from_pylist(
        pipeline.decode_dataset(pipeline.read_encoded(renamed)).take_all()
    )
    assert sorted(dec.column_names) == ["body", "id", "score"]
    got = dec.sort_by("id")
    assert got.column("body").to_pylist() == t.column("txt").to_pylist()
    # pruning still works under the new name (zone maps + blooms re-keyed)
    hits = pipeline.filter_encoded(renamed, "body", "eq", "value 7", columns=["id"])
    assert [r["id"] for r in hits.take_all()] == [7]

    # validation: typo'd old name and colliding new name must raise,
    # not silently no-op / overwrite
    import pytest

    with pytest.raises(KeyError):
        pipeline.rename_column_encoded(src, str(tmp_path / "x1"), "nope", "y")
    with pytest.raises(ValueError):
        pipeline.rename_column_encoded(src, str(tmp_path / "x2"), "txt", "score")
    with pytest.raises(KeyError):
        pipeline.drop_column_encoded(src, str(tmp_path / "x3"), ["nope"])
    with pytest.raises(ValueError):
        pipeline.drop_column_encoded(src, str(tmp_path / "x4"), ["id", "txt", "score"])

    dropped = str(tmp_path / "dropped")
    pipeline.drop_column_encoded(src, dropped, ["txt"])
    dec2 = pa.Table.from_pylist(
        pipeline.decode_dataset(pipeline.read_encoded(dropped)).take_all()
    )
    assert sorted(dec2.column_names) == ["id", "score"]
    assert dec2.num_rows == 2000
    # prune on a surviving column unaffected
    assert pipeline.filter_encoded(dropped, "id", "ge", 1990, columns=["id"]).count() == 10


def test_drop_column_reclaim_frees_bytes(ray_session, tmp_path):
    """dropcol --reclaim rebuilds blobs without the dropped streams
    (pure memcpy): encoded bytes shrink by the fat column's share,
    decode of survivors is identical to the metadata-only drop, and
    surviving stream bytes are reused verbatim."""
    import json as json_mod

    import numpy as np
    import pyarrow as pa
    import ray.data

    from mothray import pipeline
    from mothray import stripe as stripe_mod

    rng = np.random.default_rng(3)
    t = pa.table(
        {
            "id": pa.array(np.arange(3000)),
            # incompressible fat column: dominates the blob
            "fat": pa.array([rng.bytes(256).hex() for _ in range(3000)]),
            "score": pa.array(np.arange(3000) * 0.5),
        }
    )
    src = str(tmp_path / "src")
    pipeline.write_encoded(pipeline.encode_dataset(ray.data.from_arrow(t)), src)

    lazy = str(tmp_path / "lazy")
    eager = str(tmp_path / "eager")
    pipeline.drop_column_encoded(src, lazy, ["fat"])
    pipeline.drop_column_encoded(src, eager, ["fat"], reclaim=True)

    def enc_bytes(d):
        return sum(r["enc_bytes"] for r in pipeline.read_encoded(d, metadata_only=True).take_all())

    assert enc_bytes(eager) < enc_bytes(lazy) / 2  # fat column dominated
    a = pa.Table.from_pylist(pipeline.decode_dataset(pipeline.read_encoded(lazy)).take_all()).sort_by("id")
    b = pa.Table.from_pylist(pipeline.decode_dataset(pipeline.read_encoded(eager)).take_all()).sort_by("id")
    assert a.equals(b)
    assert b.column("score").to_pylist() == t.column("score").to_pylist()

    # stripe-level: vacuum is a no-op on a dense stripe (bytes identical)
    row = stripe_mod.encode_stripe(t.slice(0, 100), stripe_key="v-0")
    vac = stripe_mod.vacuum_stripe_blob(dict(row))
    assert bytes(vac["blob"]) == bytes(row["blob"])
    assert json_mod.loads(vac["meta"])["blob_crc32"] == json_mod.loads(row["meta"])["blob_crc32"]


def test_planning_skips_tmp_leftovers(ray_session, tmp_path):
    """A job killed between write and rename leaves '*.tmp' staging
    files; encode/decode planning must skip them (and hidden files) but
    still include extensionless parquet shards (Hive part-00000 style)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from mothray import pipeline

    d = tmp_path / "in"
    d.mkdir()
    t = pa.table({"id": pa.array(np.arange(500))})
    pq.write_table(t.slice(0, 250), str(d / "a.parquet"))
    pq.write_table(t.slice(250), str(d / "part-00001"))  # no extension
    (d / "b.parquet.tmp").write_bytes(b"garbage from a killed writer")
    (d / ".hidden").write_bytes(b"also skipped")

    out = str(tmp_path / "enc")
    pipeline.write_encoded(pipeline.encode_files(str(d)), out)
    # leftover tmp in the ENCODED dir must not break decode either
    (tmp_path / "enc" / "part-zzz.parquet.tmp").write_bytes(b"killed compactor")
    got = sorted(r["id"] for r in pipeline.decode_files(out).take_all())
    assert got == list(range(500))  # both real shards in, garbage out


def test_write_orc_output_preserves_duplicate_blocks(ray_session, tmp_path):
    """Two blocks holding identical rows must yield two part files —
    content-identical data is still data (the former content-only part
    naming silently coalesced them, losing half the rows)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mothray import pipeline

    t = pa.table({"id": pa.array(np.arange(100)), "v": pa.array(np.arange(100) * 2.0)})
    ds = ray.data.from_arrow(t).union(ray.data.from_arrow(t))  # identical twin blocks
    out = tmp_path / "orc_dup"
    n = pipeline.write_orc_output(ds, str(out))
    assert n == 2
    back = pipeline.read_orc_input(str(out))
    got = sorted(r["id"] for r in back.take_all())
    assert got == sorted(list(range(100)) * 2)  # every duplicate row kept


def test_read_text_source_csv_jsonl(ray_session, tmp_path):
    """CSV / JSONL ingestion sources round-trip through encode/decode;
    the csv schema pin keeps types stable across shards."""
    import pyarrow as pa
    from pyarrow import csv as pacsv

    from mothray import pipeline

    t = pa.table({"id": pa.array([1, 2, 3], pa.int64()), "s": ["a", "b", "c"]})
    d = tmp_path / "csv"
    d.mkdir()
    pacsv.write_csv(t, str(d / "x.csv"))
    ds = pipeline.read_text_source(str(d / "x.csv"), "csv", schema=t.schema)
    dec = pipeline.decode_dataset(pipeline.encode_dataset(ds), target_schema=t.schema)
    assert sorted(r["id"] for r in dec.take_all()) == [1, 2, 3]

    j = tmp_path / "rows.jsonl"
    j.write_text('{"id": 1, "s": "a"}\n{"id": 2, "s": "b"}\n')
    ds2 = pipeline.read_text_source(str(j), "jsonl")
    assert ds2.count() == 2

    import pytest

    with pytest.raises(ValueError):
        pipeline.read_text_source(str(j), "avro")


def test_read_orc_input_rejects_moth_magic(ray_session, tmp_path):
    """Reference-variant containers (magic 'MOTH') fail with a clear
    message, not an opaque pyarrow error."""
    import pytest
    import ray.exceptions

    from mothray import pipeline

    d = tmp_path / "moth"
    d.mkdir()
    (d / "ref.orc").write_bytes(b"MOTH" + b"\x00" * 64)
    with pytest.raises(Exception) as ei:
        pipeline.read_orc_input(str(d)).count()
    assert "MOTH" in str(ei.value)


def test_write_orc_output_retry_idempotent(ray_session, tmp_path):
    """A retried write task (same block re-sent to the sink) re-derives
    the same content-hash part name — no duplicate file, no extra rows."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mothray import pipeline

    t = pa.table({"id": pa.array(np.arange(3000)), "v": pa.array(np.arange(3000) * 1.5)})
    out = tmp_path / "orc_retry"
    pipeline.write_orc_output(ray.data.from_arrow(t), str(out))
    files1 = sorted(p.name for p in out.iterdir())
    mtimes1 = {p.name: p.stat().st_mtime_ns for p in out.iterdir()}
    # simulate a task retry after successful rename: run the whole sink
    # again over identical input blocks
    pipeline.write_orc_output(ray.data.from_arrow(t), str(out))
    files2 = sorted(p.name for p in out.iterdir())
    assert files1 == files2  # no new part file appeared
    # untouched outputs are byte-stable (skipped, not rewritten)
    assert {p.name: p.stat().st_mtime_ns for p in out.iterdir()} == mtimes1
    back = pipeline.read_orc_input(str(out))
    assert sorted(r["id"] for r in back.take_all()) == list(range(3000))


def test_cli_profile_and_card_commands(ray_session, tmp_path, capsys):
    """python -m mothray profile (metadata-only per-column stats) and
    card (corpus datasheet) over an encoded dataset."""
    import json as _json

    from mothray import __main__ as cli

    tbl = pa.table(
        {
            "doc_id": pa.array(range(6), type=pa.int64()),
            "text": pa.array(["a b", "a b", "c d e", None, "f", "g h"], pa.string()),
            "lang": pa.array(["en", "en", "de", "en", None, "de"], pa.string()),
        }
    )
    src = str(tmp_path / "in.parquet")
    pq.write_table(tbl, src)
    enc = str(tmp_path / "enc")
    assert cli.main(["encode", src, enc]) == 0
    capsys.readouterr()
    assert cli.main(["profile", enc, "--columns", "doc_id,lang"]) == 0
    prof = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert prof["doc_id"] == {"cnt": 6, "null_count": 0, "min_val": "0", "max_val": "5"}
    assert prof["lang"]["null_count"] == 1
    assert cli.main(["card", enc]) == 0
    card = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert card["n_docs"] == 6 and card["dup_docs"] == 1
    assert card["lang:en"] == 3 and card["lang:de"] == 2 and card["lang:<null>"] == 1


def test_contains_pushdown_trigram_prune(ray_session, tmp_path):
    """LIKE '%needle%' pushdown: stripes whose trigram bloom lacks a
    needle trigram are pruned on the METADATA read (no blob fetch);
    the residual match_substring keeps results exact."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mothray import pipeline

    texts = [
        f"stripe one filler row {i} with zebra pattern inside" for i in range(1000)
    ] + [f"stripe two plain filler row {i} nothing special here" for i in range(1000)]
    t = pa.table({"id": pa.array(np.arange(2000)), "text": pa.array(texts)})
    out = str(tmp_path / "enc")
    pipeline.write_encoded(
        pipeline.encode_dataset(
            ray.data.from_arrow(t), {"stripe_rows": 500, "batch_rows": 500}
        ),
        out,
    )
    # correctness: exact id set
    hits = pipeline.filter_encoded(out, "text", "contains", "zebra pattern")
    ids = sorted(r["id"] for r in hits.take_all())
    assert ids == list(range(1000))
    # prune evidence: metadata-only survivor count drops to the two
    # zebra stripes; an absent needle prunes everything
    meta = pipeline.read_encoded(out, metadata_only=True, include_paths=True)
    surv = pipeline.prune_stripes(meta, "text", tri_needles=["zebra pattern"])
    assert surv.count() == 2
    none = pipeline.prune_stripes(meta, "text", tri_needles=["qzxvw jklmp"])
    assert none.count() == 0
    # infix LIKE uses its literal runs the same way
    like_hits = pipeline.filter_encoded(out, "text", "like", "%zebra%inside%")
    assert like_hits.count() == 1000
    # conjunctive multi-predicate path prunes on contains too
    multi = pipeline.filter_encoded_multi(
        out, [("text", "contains", "zebra"), ("id", "lt", 10)]
    )
    assert sorted(r["id"] for r in multi.take_all()) == list(range(10))


def test_update_rebuilds_tri_bloom(ray_session, tmp_path):
    """Surgical UPDATE on a text column refreshes its trigram bloom:
    a substring that only exists in the NEW values must be found, and
    a stale bloom must not prune it away."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mothray import pipeline

    t = pa.table(
        {
            "id": pa.array(np.arange(400)),
            "text": pa.array([f"original content number {i} padded out" for i in range(400)]),
        }
    )
    src = str(tmp_path / "src")
    pipeline.write_encoded(pipeline.encode_dataset(ray.data.from_arrow(t)), src)
    dst = str(tmp_path / "dst")

    def rewrite(tbl):
        import pyarrow.compute as pc

        return pc.replace_substring(tbl.column("text"), "original", "flamingo")

    pipeline.update_where(src, dst, "id", 0, 99, assign={"text": rewrite})
    hits = pipeline.filter_encoded(dst, "text", "contains", "flamingo content")
    assert hits.count() == 100
    # the untouched rows still match their original substring
    assert pipeline.filter_encoded(dst, "text", "contains", "original content").count() == 300


def test_rename_keeps_tri_bloom_pruning(ray_session, tmp_path):
    """Metadata-only RENAME re-keys tri_blooms: substring pushdown on
    the new name still prunes and still answers exactly."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mothray import pipeline

    t = pa.table(
        {
            "id": pa.array(np.arange(500)),
            "txt": pa.array(
                [f"row {i} " + ("walrus melody " if i < 50 else "plain words ") * 3 for i in range(500)]
            ),
        }
    )
    src = str(tmp_path / "src")
    pipeline.write_encoded(pipeline.encode_dataset(ray.data.from_arrow(t)), src)
    renamed = str(tmp_path / "renamed")
    pipeline.rename_column_encoded(src, renamed, "txt", "body")
    hits = pipeline.filter_encoded(renamed, "body", "contains", "walrus melody")
    assert hits.count() == 50
    meta = pipeline.read_encoded(renamed, metadata_only=True, include_paths=True)
    assert pipeline.prune_stripes(meta, "body", tri_needles=["qqqzzzvvv"]).count() == 0


def test_cli_checksum_parquet_vs_encoded(ray_session, tmp_path):
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mothray.__main__ import main

    src = tmp_path / "t.parquet"
    pq.write_table(
        pa.table({"id": pa.array(range(200), pa.int64()),
                  "s": [f"row{i}" for i in range(200)]}),
        src,
    )
    enc = tmp_path / "enc"
    assert main(["encode", str(src), str(enc), "--partition-mb", "1"]) == 0
    import io
    from contextlib import redirect_stdout

    outs = []
    for path in (str(src), str(enc)):
        buf = io.StringIO()
        with redirect_stdout(buf):
            assert main(["checksum", path, "id", "s"]) == 0
        outs.append(json.loads(buf.getvalue().strip().splitlines()[-1]))
    assert outs[0] == outs[1]
    assert outs[0]["n_rows"] == 200
