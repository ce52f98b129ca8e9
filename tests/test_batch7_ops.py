"""Relational division, centroid cosine similarity, day-of-week
anomaly against brute-force references."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(table: pa.Table):
    import ray.data

    return ray.data.from_arrow(table)


def test_relational_division(ray_session):
    from mothray.ops.setops import relational_division

    keys = [1, 1, 1, 2, 2, 3, 3, 3, 3]
    attrs = ["a", "b", "c", "a", "b", "a", "b", "c", "c"]
    tbl = pa.table({"k": pa.array(keys, pa.int64()), "a": pa.array(attrs)})
    out = {r["k"]: r["n_attrs"] for r in relational_division(_ds(tbl), "k", "a").take_all()}
    assert out == {1: 3, 3: 3}  # key 2 misses 'c'


def test_centroid_similarity_bruteforce(ray_session):
    from mothray.ops.ann import centroid_similarity

    rng = np.random.default_rng(51)
    n, d = 120, 8
    vecs = rng.normal(0, 1, (n, d)).astype(np.float32)
    labels = rng.integers(0, 3, n).astype(np.int32)
    tbl = pa.table(
        {
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    out = {
        (r["label_a"], r["label_b"]): r["cos_sim"]
        for r in centroid_similarity(_ds(tbl)).to_pylist()
    }
    cents = {}
    for l in (0, 1, 2):
        q = np.floor(vecs[labels == l].astype(np.float64) * 1e6 + 0.5)
        cents[l] = q.sum(axis=0) / (int((labels == l).sum()) * 1e6)
    for a in (0, 1, 2):
        for b in range(a + 1, 3):
            cos = (cents[a] * cents[b]).sum() / (
                np.sqrt((cents[a] ** 2).sum()) * np.sqrt((cents[b] ** 2).sum())
            )
            assert out[(a, b)] == pytest.approx(cos, abs=2e-6)


def test_dow_anomaly_bruteforce(ray_session):
    from mothray.ops.window import dow_anomaly

    day_us = 86400_000_000
    rng = np.random.default_rng(52)
    # 15 weeks: with n=15 days per weekday the max attainable |z| is
    # (n-1)/sqrt(n) ~ 3.6, so a genuine spike can clear the 2.0 bar
    ts = []
    for d in range(105):
        base = 20 + (5 if d % 7 == 3 else 0)
        k = base + int(rng.integers(0, 3))
        if d == 17:  # forced spike
            k += 40
        ts.extend(d * day_us + np.arange(k) * 1000)
    tbl = pa.table({"ts": pa.array(np.array(ts, np.int64), pa.timestamp("us"))})
    out = {r["day"]: r for r in dow_anomaly(_ds(tbl), "ts", 2.0).to_pylist()}
    # brute force
    from collections import Counter

    daily = Counter(t // day_us for t in ts)
    stats = {}
    for day, c in daily.items():
        stats.setdefault(day % 7, []).append((day, c))
    expect = {}
    for dow, cells in stats.items():
        cs = np.array([c for _, c in cells], np.int64)
        n = len(cs)
        var_num = int((cs * cs).sum()) - (int(cs.sum()) * int(cs.sum())) / n
        if n < 2 or var_num <= 0:
            continue
        mean = int(cs.sum()) / n
        sd = np.sqrt(var_num / (n - 1))
        for day, c in cells:
            z = (c - mean) / sd
            if abs(z) > 2.0:
                expect[day] = z
    assert set(out) == set(expect)
    assert 17 in out
    for day, z in expect.items():
        assert out[day]["z"] == pytest.approx(z, abs=1e-12)
