"""GROUP BY COUNT(*) pushdown into the encoded format: dictionary
stripes answer from a bincount over the index stream, null keys form
their own group, and the exchange carries histograms, not rows."""

import collections

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def encoded_groups(ray_session, tmp_path):
    from mothray import pipeline

    n = 5000
    rng = np.random.default_rng(5)
    cat = rng.choice(["alpha", "beta", "gamma", "delta"], n).astype(object)
    cat[rng.choice(n, 200, replace=False)] = None  # null group
    num = rng.integers(0, 7, n)
    src = tmp_path / "g.parquet"
    pq.write_table(
        pa.table({"cat": pa.array(list(cat), pa.string()), "num": pa.array(num)}),
        src,
    )
    enc = str(tmp_path / "enc")
    pipeline.encode_parquet_to_dir(str(src), enc, opts={"stripe_rows": 700})
    return enc, cat, num


def test_group_count_string_with_nulls(ray_session, encoded_groups):
    from mothray import pipeline

    enc, cat, _ = encoded_groups
    got = {
        r["cat"]: r["cnt"] for r in pipeline.group_count_encoded(enc, "cat").take_all()
    }
    want = dict(collections.Counter(cat))
    assert got == want


def test_group_count_int_column(ray_session, encoded_groups):
    from mothray import pipeline

    enc, _, num = encoded_groups
    got = {
        r["num"]: r["cnt"] for r in pipeline.group_count_encoded(enc, "num").take_all()
    }
    want = dict(collections.Counter(int(v) for v in num))
    assert got == want


def test_group_count_uses_dictionary_stream(ray_session, encoded_groups):
    """The string column must actually be dictionary-encoded in the
    stripes (otherwise the fast path never runs and this test guards
    nothing)."""
    import json

    from mothray import column as column_mod
    from mothray import pipeline

    enc, cat, _ = encoded_groups
    rows = pipeline.read_encoded(enc).take_all()
    encs = {
        json.loads(r["meta"])["columns"]["cat"]["row_groups"][0]["encoding"]
        for r in rows
    }
    assert column_mod.ENC_DICT in encs
    # and the stripe partial alone matches a local counter
    from mothray import stripe as stripe_mod

    part = stripe_mod.group_count_stripe(
        {k: (memoryview(v) if isinstance(v, bytes) and k in ("blob", "blooms") else v)
         for k, v in rows[0].items()},
        "cat",
    )
    assert part.column("cnt").to_pylist() and sum(
        part.column("cnt").to_pylist()
    ) == rows[0]["n_rows"]
