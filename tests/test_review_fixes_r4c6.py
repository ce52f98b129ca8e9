"""Regression tests for the sixth-continuation review findings: null
keys in equality deletes, eqdel commit race, empty-dimension joins,
PNG palette bounds, integer-exact grouped sums, compaction
false-positive rewrites."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data


def _mk_table(tmp_path, with_null_keys=False):
    from mothray import pipeline, versions

    ks = [1, None, 3, 4, 5] if with_null_keys else [1, 2, 3, 4, 5]
    t = pa.table(
        {"k": pa.array(ks, pa.int64()), "v": pa.array([float(i) for i in range(5)])}
    )
    src = tmp_path / "t.parquet"
    pq.write_table(t, src)
    d = str(tmp_path / "tbl")
    pipeline.encode_parquet_to_dir(str(src), d)
    versions.adopt(d)
    return d


def test_null_in_eq_delete_key_list_never_deletes_null_rows(ray_session, tmp_path):
    """REGRESSION: pyarrow is_in treats a null IN the value set as
    matching null inputs — a null left in the key file deleted
    null-keyed rows. Keys are now null-dropped at commit."""
    from mothray import versions

    d = _mk_table(tmp_path, with_null_keys=True)
    m = versions.equality_delete(d, "k", [1, None, 5])
    assert m["metrics"]["n_keys"] == 2  # the null literal dropped
    got = sorted(
        r["v"] for r in versions.scan_version(d).take_all()
    )
    assert got == [1.0, 2.0, 3.0]  # k=None rows survive; 1 and 5 gone
    # compaction honors the same semantics
    versions.compact_deletes(d)
    got2 = sorted(r["v"] for r in versions.scan_version(d).take_all())
    assert got2 == [1.0, 2.0, 3.0]


def test_eqdel_key_file_commit_is_exclusive(ray_session, tmp_path):
    """REGRESSION: two writers racing the same parent must not
    interleave on the version-named key file — the loser now fails at
    the key-file link, before any manifest lands."""
    from mothray import versions

    d = _mk_table(tmp_path)
    head = versions.manifest(d)
    # simulate writer A's key file already landed for version N+1
    os.makedirs(os.path.join(d, "_deletes"), exist_ok=True)
    pq.write_table(
        pa.table({"k": pa.array([9], pa.int64())}),
        os.path.join(d, "_deletes", f"eqdel-v{head['version'] + 1}.parquet"),
    )
    with pytest.raises(versions.VersionConflict):
        versions.equality_delete(d, "k", [1])
    # writer A's key file is untouched
    t = pq.read_table(os.path.join(d, "_deletes", f"eqdel-v{head['version'] + 1}.parquet"))
    assert t.column("k").to_pylist() == [9]


def test_encoded_key_join_empty_dim_and_right_outer(ray_session, tmp_path):
    from mothray import pipeline
    from mothray.ops import join

    t = pa.table(
        {"k": pa.array(np.arange(50, dtype=np.int64)),
         "amt": pa.array(np.arange(50, dtype=np.float64))}
    )
    src = tmp_path / "f.parquet"
    pq.write_table(t, src)
    enc = str(tmp_path / "enc")
    pipeline.encode_parquet_to_dir(str(src), enc)
    empty = ray.data.from_arrow(
        pa.table({"k": pa.array([], pa.int64()), "name": pa.array([], pa.string())})
    )
    # empty dimension: inner join empty, NO TypeError
    assert join.encoded_key_join(enc, empty, "k").count() == 0
    # all-null dimension keys + right_outer: every right row surfaces
    nulldim = ray.data.from_arrow(
        pa.table({"k": pa.array([None, None], pa.int64()),
                  "name": pa.array(["a", "b"])})
    )
    rows = join.encoded_key_join(enc, nulldim, "k", how="right_outer").take_all()
    assert sorted(r["name"] for r in rows) == ["a", "b"]
    assert all(r.get("amt") is None for r in rows)


def test_png_palette_index_out_of_bounds_returns_none():
    import struct
    import zlib

    from mothray.ops import multimodal

    # 2x2 palette PNG with a 2-entry PLTE but pixel index 200
    scan = bytes([0, 200, 1, 0, 0, 1])
    def chunk(typ, body):
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )
    p = (
        multimodal._PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", bytes([0, 0, 0, 255, 255, 255]))
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )
    assert multimodal._parse_png(memoryview(p)) is None


def test_group_agg_integer_exact_beyond_2_53(ray_session, tmp_path):
    """Integer value columns at scale=0 must not route through float64
    (2**53 + 1 would silently round)."""
    from mothray import pipeline

    big = 2**53 + 1
    t = pa.table(
        {"g": pa.array(["a", "a", "b"]),
         "v": pa.array([big, 1, 7], pa.int64())}
    )
    src = tmp_path / "big.parquet"
    pq.write_table(t, src)
    enc = str(tmp_path / "enc")
    pipeline.encode_parquet_to_dir(str(src), enc)
    got = {r["g"]: r["sum_e0"] for r in pipeline.group_agg_encoded(
        enc, "g", "v", scale=0).take_all()}
    assert got == {"a": big + 1, "b": 7}


def test_compact_deletes_zone_map_false_positive_carries_file(ray_session, tmp_path):
    """A file whose zone maps overlap the eq key range but holds none
    of the keys must carry BY NAME (no rewrite I/O)."""
    from mothray import checkpoint, versions

    t = pa.table(
        {"k": pa.array([0, 2, 4, 6, 8, 100, 102, 104, 106, 108], pa.int64()),
         "v": pa.array([float(i) for i in range(10)])}
    )
    src = tmp_path / "fp.parquet"
    pq.write_table(t, src, row_group_size=5)
    d = str(tmp_path / "tbl")
    checkpoint.encode_job(str(src), d, target_partition_bytes=64)
    versions.adopt(d)
    n_files = len(versions.manifest(d)["files"])
    assert n_files >= 2
    # key 5 is inside the first file's [0, 8] range but absent
    m0 = versions.equality_delete(d, "k", [5])
    m = versions.compact_deletes(d)
    assert m["metrics"]["rows_removed"] == 0
    assert m["metrics"]["files_rewritten"] == 0
    assert m["files"] == versions.manifest(d, m0["version"])["files"]
