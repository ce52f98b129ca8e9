"""Arrow-IPC encoded interchange (r5): read+encode+write fused into one
task, mmap zero-copy decode. Parity with the durable parquet layout."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mothray import pipeline
from mothray import stripe as sm

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def enc_dir(ray_session, tmp_path):
    out = tmp_path / "enc_ipc"
    pipeline.encode_files_ipc(f"{SF}/documents.parquet", str(out)).take_all()
    return str(out)


def test_roundtrip_bit_identical(ray_session, enc_dir):
    orig = pq.read_table(f"{SF}/documents.parquet")
    got = pa.Table.from_pylist(pipeline.decode_files(enc_dir).take_all())
    got = got.select(orig.column_names).sort_by("doc_id")
    assert got.equals(orig.sort_by("doc_id").cast(got.schema))


def test_meta_rows_carry_no_blob(ray_session, tmp_path):
    out = tmp_path / "enc"
    meta = pipeline.encode_files_ipc(f"{SF}/documents.parquet", str(out))
    rows = meta.take_all()
    assert rows
    for r in rows:
        assert "blob" not in r and "blooms" not in r
        assert os.path.exists(r["path"])
    assert sum(r["n_rows"] for r in rows) == pq.read_metadata(
        f"{SF}/documents.parquet"
    ).num_rows


def test_retry_idempotent_file_set(ray_session, tmp_path):
    out = tmp_path / "enc"
    pipeline.encode_files_ipc(f"{SF}/documents.parquet", str(out)).take_all()
    first = {
        f: os.path.getsize(os.path.join(str(out), f)) for f in os.listdir(str(out))
    }
    # a rerun (retry / resumed job) re-derives the same names and
    # exists-skips: byte-stable output
    pipeline.encode_files_ipc(f"{SF}/documents.parquet", str(out)).take_all()
    second = {
        f: os.path.getsize(os.path.join(str(out), f)) for f in os.listdir(str(out))
    }
    assert first == second
    assert all(f.endswith(".arrow") for f in first)


def test_parquet_ipc_parity(ray_session, tmp_path):
    """Same input through both interchanges decodes identically and
    reports identical encoded byte counts (same codec work)."""
    ipc_dir, pq_dir = tmp_path / "ipc", tmp_path / "pq"
    pipeline.encode_files_ipc(f"{SF}/events.parquet", str(ipc_dir)).take_all()
    enc = pipeline.encode_files(f"{SF}/events.parquet")
    pipeline.write_encoded(enc, str(pq_dir))
    a = pa.Table.from_pylist(pipeline.decode_files(str(ipc_dir)).take_all())
    b = pa.Table.from_pylist(pipeline.decode_files(str(pq_dir)).take_all())
    key = "event_id" if "event_id" in a.column_names else a.column_names[0]
    assert a.sort_by(key).equals(b.select(a.column_names).sort_by(key))
    ma = pipeline.read_encoded(str(ipc_dir), metadata_only=True).take_all()
    mb = pipeline.read_encoded(str(pq_dir), metadata_only=True).take_all()
    assert sum(r["enc_bytes"] for r in ma) == sum(r["enc_bytes"] for r in mb)
    assert sum(r["raw_bytes"] for r in ma) == sum(r["raw_bytes"] for r in mb)


def test_metadata_read_selects_columns(ray_session, enc_dir):
    rows = pipeline.read_encoded(enc_dir, metadata_only=True).take_all()
    assert rows and set(rows[0]) == {
        "stripe_key", "n_rows", "raw_bytes", "enc_bytes", "meta", "stats", "blooms",
    }
    with_paths = pipeline.read_encoded(enc_dir, include_paths=True).take_all()
    assert all(r["path"].endswith(".arrow") for r in with_paths)


def test_decode_projection_over_ipc(ray_session, enc_dir):
    cols = ["doc_id", "lang"]
    got = pa.Table.from_pylist(
        pipeline.decode_files(enc_dir, columns=cols).take_all()
    )
    assert got.column_names == cols
    orig = pq.read_table(f"{SF}/documents.parquet", columns=cols)
    assert got.sort_by("doc_id").equals(orig.sort_by("doc_id"))


def test_pushdown_stack_over_ipc(ray_session, tmp_path):
    """filter_encoded / _multi / _or run the full skipping stack over
    the IPC layout (mmap IS the targeted fetch) and value-match DuckDB."""
    import duckdb

    src = f"{SF}/documents.parquet"
    out = tmp_path / "enc"
    pipeline.encode_files_ipc(src, str(out)).take_all()
    con = duckdb.connect()

    def oracle(sql):
        return con.execute(sql.replace("SRC", f"read_parquet('{src}')")).fetchone()[0]

    r = pipeline.filter_encoded(str(out), "lang", "eq", "en").take_all()
    assert len(r) == oracle("SELECT count(*) FROM SRC WHERE lang='en'")
    r = pipeline.filter_encoded(str(out), "n_chars", "ge", 500).take_all()
    assert len(r) == oracle("SELECT count(*) FROM SRC WHERE n_chars>=500")
    r = pipeline.filter_encoded_multi(
        str(out), [("lang", "eq", "en"), ("n_chars", "ge", 500)]
    ).take_all()
    assert len(r) == oracle("SELECT count(*) FROM SRC WHERE lang='en' AND n_chars>=500")
    r = pipeline.filter_encoded_or(
        str(out), [("lang", "eq", "en"), ("lang", "eq", "de")]
    ).take_all()
    assert len(r) == oracle("SELECT count(*) FROM SRC WHERE lang='en' OR lang='de'")


def test_compact_ipc_layout(ray_session, tmp_path):
    """compact_encoded merges small .arrow interchange files without
    re-encoding; decode output is bit-identical."""
    from mothray.pipeline import compact_encoded

    out = tmp_path / "enc"
    # tiny units so several files exist
    pipeline.encode_files_ipc(
        f"{SF}/documents.parquet", str(out), target_bytes=64 << 10
    ).take_all()
    n_in = len([f for f in os.listdir(str(out)) if f.endswith(".arrow")])
    assert n_in > 1
    dst = tmp_path / "compact"
    os.makedirs(dst, exist_ok=True)
    r = compact_encoded(str(out), str(dst))
    assert r["files_in"] == n_in and r["files_out"] < n_in
    a = pa.Table.from_pylist(pipeline.decode_files(str(out)).take_all())
    b = pa.Table.from_pylist(pipeline.decode_files(str(dst)).take_all())
    assert a.sort_by("doc_id").equals(b.select(a.column_names).sort_by("doc_id"))


def test_crc_still_verified_over_ipc(ray_session, tmp_path):
    """Corrupting a blob byte in the IPC file must fail decode loudly."""
    out = tmp_path / "enc"
    pipeline.encode_files_ipc(f"{SF}/region.parquet", str(out)).take_all()
    path = os.path.join(str(out), sorted(os.listdir(str(out)))[0])
    t = pa.ipc.open_file(pa.memory_map(path)).read_all()
    blob = bytearray(t.column("blob")[0].as_py())
    blob[len(blob) // 2] ^= 0xFF
    t2 = t.set_column(
        t.column_names.index("blob"), "blob", pa.array([bytes(blob)], pa.binary())
    )
    # write to a sibling then replace: t2 still references the mmap of
    # `path`, so truncating it in place would corrupt t2 mid-write
    with pa.OSFile(path + ".new", "wb") as f, pa.ipc.new_file(f, t2.schema) as w:
        w.write_table(t2)
    os.replace(path + ".new", path)
    with pytest.raises(Exception, match="checksum|corrupt"):
        sm.decode_batch(pa.Table.from_pylist(
            pipeline.read_encoded(str(out)).take_all(), schema=sm.STRIPE_SCHEMA
        ))
