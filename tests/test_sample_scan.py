"""Hash-sample scan pushdown: the encoded-side gate must reproduce
ops.sample.hash_sample exactly (same fingerprint contract) while
decoding only the key stream for non-sampled row groups."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data


@pytest.fixture()
def encoded_sample(ray_session, tmp_path):
    from mothray import pipeline

    n = 3000
    t = pa.table(
        {
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "val": pa.array(np.arange(n, dtype=np.float64) * 1.5),
            "txt": pa.array([f"row {i} payload" for i in range(n)]),
        }
    )
    src = tmp_path / "s.parquet"
    pq.write_table(t, src)
    enc = str(tmp_path / "enc")
    pipeline.encode_parquet_to_dir(str(src), enc, opts={"stripe_rows": 400})
    return enc, t


def test_sample_scan_matches_hash_sample(ray_session, encoded_sample):
    from mothray import pipeline
    from mothray.ops import sample as sample_ops

    enc, t = encoded_sample
    got = pipeline.sample_scan_encoded(enc, "id", 0.07, salt="ss").take_all()
    want = sample_ops.hash_sample(
        ray.data.from_arrow(t), rate=0.07, key_col="id", salt="ss"
    ).take_all()
    assert {r["id"] for r in got} == {r["id"] for r in want}
    assert 0 < len(got) < 3000


def test_sample_scan_projection_and_zero_rate(ray_session, encoded_sample):
    from mothray import pipeline

    enc, _ = encoded_sample
    got = pipeline.sample_scan_encoded(enc, "id", 0.05, salt="x", columns=["id", "val"])
    rows = got.take_all()
    assert rows and set(rows[0].keys()) == {"id", "val"}
    assert pipeline.sample_scan_encoded(enc, "id", 0.0, salt="x").count() == 0


def test_sample_scan_rate_one_is_full_table(ray_session, encoded_sample):
    from mothray import pipeline

    enc, t = encoded_sample
    assert pipeline.sample_scan_encoded(enc, "id", 1.0).count() == t.num_rows
