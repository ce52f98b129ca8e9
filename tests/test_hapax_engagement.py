"""Hapax ratio and engagement curve against brute-force references."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(table: pa.Table):
    import ray.data

    return ray.data.from_arrow(table)


def test_hapax_ratio_bruteforce(ray_session):
    from mothray.ops.webtext import hapax_ratio

    docs = ["a b b c", "d d e", "a unique words here"]
    srcs = ["s1", "s1", "s2"]
    tbl = pa.table({"text": pa.array(docs), "source": pa.array(srcs)})
    out = {r["source"]: r for r in hapax_ratio(_ds(tbl)).take_all()}
    # s1 tokens: a b b c d d e -> counts a1 b2 c1 d2 e1: vocab 5, hapax 3, tokens 7
    assert out["s1"]["n_tokens"] == 7
    assert out["s1"]["vocab"] == 5
    assert out["s1"]["n_hapax"] == 3
    assert out["s1"]["hapax_ratio"] == pytest.approx(3 / 5)
    # s2: all 4 tokens unique
    assert out["s2"]["vocab"] == 4 and out["s2"]["n_hapax"] == 4
    assert out["s2"]["hapax_ratio"] == pytest.approx(1.0)


def test_engagement_curve_bruteforce(ray_session):
    from mothray.ops.cohort import engagement_curve

    rng = np.random.default_rng(71)
    users = rng.integers(1, 40, 300)
    tbl = pa.table({"user_id": pa.array(users, pa.int64())})
    out = {r["k"]: r for r in engagement_curve(_ds(tbl), max_k=10).to_pylist()}
    from collections import Counter

    counts = Counter(users.tolist())
    total = len(counts)
    for k in range(1, 11):
        n_k = sum(1 for c in counts.values() if c >= k)
        assert out[k]["n_users"] == n_k
        assert out[k]["frac"] == pytest.approx(n_k / total, abs=1e-12)
