"""Hash-bucketed layout: lookup opens one bucket, results equal a full
filter, missing keys/buckets return empty, co-bucketing co-locates."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data


@pytest.fixture()
def bucketed(ray_session, tmp_path):
    from mothray import pipeline

    n = 3000
    t = pa.table(
        {
            "k": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array([f"val-{i}" for i in range(n)]),
        }
    )
    out = str(tmp_path / "bkt")
    pipeline.encode_bucketed(ray.data.from_arrow(t), out, "k", 8)
    return out, t


def test_bucket_lookup_exact(ray_session, bucketed):
    from mothray import pipeline

    out, t = bucketed
    for k in (0, 17, 1234, 2999):
        got = pipeline.bucket_lookup(out, k)
        assert got.num_rows == 1
        assert got.column("k")[0].as_py() == k
        assert got.column("v")[0].as_py() == f"val-{k}"
        assert "__bucket" not in got.column_names
    assert pipeline.bucket_lookup(out, 10**9).num_rows == 0


def test_bucket_dirs_and_colocation(ray_session, bucketed):
    import os

    from mothray import pipeline
    from mothray.ops.sample import _key_fingerprints

    out, t = bucketed
    dirs = pipeline.encoded_partition_dirs(out)
    assert 1 < len(dirs) <= 8
    # every key's bucket dir contains it: decode one bucket and check
    b = _key_fingerprints(t, "k", "") % np.uint64(8)
    some = sorted(dirs)[0]
    want = {int(k) for k, bb in zip(t.column("k").to_pylist(), b)
            if f"b{int(bb):05d}" == some}
    got_rows = pipeline.decode_dataset(pipeline.read_encoded(dirs[some])).take_all()
    assert {r["k"] for r in got_rows} == want
