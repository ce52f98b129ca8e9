"""WARC ingestion: record framing, HTTP envelope stripping, gzip
members, record-type filtering, truncation tolerance."""

import gzip

import pyarrow as pa
import pytest


def _records(n, with_request=False):
    recs = []
    for i in range(n):
        recs.append(
            {
                "url": f"http://example.com/page/{i}",
                "date": f"2024-03-{(i % 28) + 1:02d}T12:00:{i % 60:02d}Z",
                "body": (f"<html><body>doc {i} " + "x" * (i % 50) + "</body></html>").encode(),
            }
        )
        if with_request:
            recs.append(
                {
                    "url": f"http://example.com/page/{i}",
                    "date": "2024-03-01T00:00:00Z",
                    "body": b"GET / HTTP/1.1",
                    "type": "request",
                }
            )
    return recs


def test_warc_roundtrip_plain_and_gz(ray_session, tmp_path):
    from mothray import pipeline

    recs = _records(23)
    (tmp_path / "a.warc").write_bytes(pipeline.make_warc(recs[:11]))
    (tmp_path / "b.warc.gz").write_bytes(gzip.compress(pipeline.make_warc(recs[11:])))
    got = pipeline.read_warc_source(str(tmp_path)).take_all()
    assert len(got) == 23
    by_url = {r["url"]: r for r in got}
    for i, rec in enumerate(recs):
        r = by_url[rec["url"]]
        assert bytes(r["html"]) == rec["body"]  # HTTP envelope stripped
        assert r["warc_ts"] is not None


def test_warc_type_filter_and_concatenated_gzip_members(ray_session, tmp_path):
    from mothray import pipeline

    recs = _records(6, with_request=True)
    # Common Crawl style: each record its own gzip member, concatenated
    blob = b"".join(gzip.compress(pipeline.make_warc([r])) for r in recs)
    (tmp_path / "cc.warc.gz").write_bytes(blob)
    got = pipeline.read_warc_source(str(tmp_path)).take_all()
    assert len(got) == 6  # requests filtered out by default
    both = pipeline.read_warc_source(
        str(tmp_path / "cc.warc.gz"), record_types=("response", "request")
    ).take_all()
    assert len(both) == 12


def test_warc_truncated_tail_yields_prefix(ray_session, tmp_path):
    from mothray import pipeline

    full = pipeline.make_warc(_records(9))
    (tmp_path / "t.warc").write_bytes(full[: len(full) - 40])  # cut last record
    got = pipeline.read_warc_source(str(tmp_path / "t.warc")).take_all()
    assert len(got) == 8


def test_warc_to_encode_pipeline(ray_session, tmp_path):
    """The north-rule composition: WARC -> (url, warc_ts, html) ->
    encode -> decode, bit-identical."""
    from mothray import pipeline

    (tmp_path / "c.warc").write_bytes(pipeline.make_warc(_records(17)))
    ds = pipeline.read_warc_source(str(tmp_path / "c.warc"))
    enc_dir = str(tmp_path / "enc")
    pipeline.write_encoded(pipeline.encode_dataset(ds), enc_dir)
    back = pipeline.read_encoded(enc_dir)
    rows = pipeline.decode_dataset(back).take_all()
    assert len(rows) == 17
    want = {r["url"]: r["body"] for r in _records(17)}
    for r in rows:
        assert bytes(r["html"]) == want[r["url"]]


def test_ipc_export_roundtrip_and_retry_idempotent(ray_session, tmp_path):
    """write_ipc_output: digest names, exists-skip, read_ipc_source
    round trip."""
    import os

    import numpy as np
    import ray.data

    from mothray import pipeline

    t = pa.table({"a": pa.array(np.arange(500)), "b": pa.array([f"s{i}" for i in range(500)])})
    out = str(tmp_path / "ipc")
    n = pipeline.write_ipc_output(ray.data.from_arrow(t).repartition(4), out)
    assert n == 4 and len(os.listdir(out)) == 4
    mt = {f: os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out)}
    n2 = pipeline.write_ipc_output(ray.data.from_arrow(t).repartition(4), out)
    assert n2 == 4
    assert mt == {f: os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out)}
    back = pipeline.read_ipc_source(out).take_all()
    assert sorted(r["a"] for r in back) == list(range(500))
