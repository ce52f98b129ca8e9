"""Grouped SUM/MIN/MAX/COUNT pushdown: dictionary-code aggregation per
stripe, exact scaled-integer sums, SQL null semantics on both sides."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def encoded_agg(ray_session, tmp_path):
    from mothray import pipeline

    n = 4000
    rng = np.random.default_rng(9)
    cat = rng.choice(["a", "b", "c"], n).astype(object)
    cat[rng.choice(n, 150, replace=False)] = None
    v = np.round(rng.uniform(-100, 100, n), 2).astype(object)
    v[rng.choice(n, 200, replace=False)] = None
    src = tmp_path / "a.parquet"
    pq.write_table(
        pa.table({"cat": pa.array(list(cat), pa.string()),
                  "v": pa.array(list(v), pa.float64())}),
        src,
    )
    enc = str(tmp_path / "enc")
    pipeline.encode_parquet_to_dir(str(src), enc, opts={"stripe_rows": 600})
    return enc, cat, v


def test_group_agg_exact_vs_pandas(ray_session, encoded_agg):
    import collections

    from mothray import pipeline

    enc, cat, v = encoded_agg
    got = {
        r["cat"]: r
        for r in pipeline.group_agg_encoded(enc, "cat", "v", scale=2).take_all()
    }
    want: dict = collections.defaultdict(lambda: [0, 0, 0, np.inf, -np.inf])
    for c, x in zip(cat, v):
        a = want[c]
        a[0] += 1
        if x is not None:
            a[1] += 1
            sign = 1 if x >= 0 else -1
            a[2] += sign * int(abs(x) * 100 + 0.5)
            a[3] = min(a[3], x)
            a[4] = max(a[4], x)
    assert set(got) == set(want)
    for k, a in want.items():
        g = got[k]
        assert (g["cnt"], g["vcnt"], g["sum_e2"]) == (a[0], a[1], a[2])
        assert g["min_v"] == pytest.approx(a[3])
        assert g["max_v"] == pytest.approx(a[4])


def test_group_agg_int_key_no_dict(ray_session, encoded_agg):
    """Non-dictionary key path (int keys) falls back to per-group
    dictionary_encode and still merges exactly."""
    import pyarrow.parquet as _pq

    from mothray import pipeline

    enc, cat, v = encoded_agg
    # reuse the same data but group by a derived int key on the fly
    import tempfile

    import numpy as _np

    n = len(cat)
    key = _np.arange(n) % 4
    vals = [x if x is not None else None for x in v]
    d = tempfile.mkdtemp(prefix="gagg_int_")
    _pq.write_table(
        pa.table({"k": pa.array(key, pa.int64()), "v": pa.array(vals, pa.float64())}),
        f"{d}/x.parquet",
    )
    enc2 = f"{d}/enc"
    pipeline.encode_parquet_to_dir(f"{d}/x.parquet", enc2, opts={"stripe_rows": 600})
    got = {
        r["k"]: r for r in pipeline.group_agg_encoded(enc2, "k", "v", scale=2).take_all()
    }
    for kk in range(4):
        sel = [x for i, x in enumerate(vals) if i % 4 == kk and x is not None]
        sign_sum = sum((1 if x >= 0 else -1) * int(abs(x) * 100 + 0.5) for x in sel)
        assert got[kk]["sum_e2"] == sign_sum
        assert got[kk]["cnt"] == sum(1 for i in range(n) if i % 4 == kk)
