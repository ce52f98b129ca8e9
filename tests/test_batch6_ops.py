"""Type-token ratio, XmR control chart, Cox-Stuart, Markov entropy
rate against brute-force references."""

import math

import numpy as np
import pyarrow as pa
import pytest


def _ds(table: pa.Table):
    import ray.data

    return ray.data.from_arrow(table)


def test_type_token_ratio(ray_session):
    from mothray.ops.text import type_token_ratio

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["a b a C c", "", None, "x  y"]),
        }
    )
    out = {r["doc_id"]: r for r in type_token_ratio(_ds(tbl)).take_all()}
    assert (out[1]["n_tokens"], out[1]["n_distinct"]) == (5, 3)  # a b c
    assert out[1]["ttr"] == pytest.approx(3 / 5)
    assert out[2]["n_tokens"] == 0 and out[2]["ttr"] is None
    assert out[3]["n_tokens"] == 0 and out[3]["ttr"] is None
    assert (out[4]["n_tokens"], out[4]["n_distinct"]) == (2, 2)


def test_control_chart_bruteforce(ray_session):
    from mothray.ops.window import control_chart

    rng = np.random.default_rng(41)
    n = 80
    vals = np.round(rng.normal(50, 5, n), 2)
    vals[10] = 500.0  # forced out-of-control spike
    tbl = pa.table(
        {
            "k": pa.array([1] * n, pa.int64()),
            "o": pa.array(np.arange(n, dtype=np.int64)),
            "tb": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array(vals),
        }
    )
    r = control_chart(_ds(tbl), "k", "o", "v", "tb").take_all()[0]
    c = np.round(vals * 100).astype(np.int64)
    x_bar = c.sum() / n
    mr_bar = np.abs(np.diff(c)).sum() / (n - 1)
    ooc = int(
        ((c > x_bar + 2.66 * mr_bar) | (c < x_bar - 2.66 * mr_bar)).sum()
    )
    assert r["n"] == n
    assert r["x_bar"] == pytest.approx(x_bar, abs=1e-9)
    assert r["mr_bar"] == pytest.approx(mr_bar, abs=1e-9)
    assert r["n_ooc"] == ooc >= 1


def test_cox_stuart_bruteforce(ray_session):
    from mothray.ops.moments import cox_stuart

    day_us = 86400_000_000
    # user 1: strictly increasing daily activity -> all positive pairs
    rows_u, rows_t = [], []
    for d in range(14):
        for _ in range(d + 1):
            rows_u.append(1)
            rows_t.append(d * day_us + 1000)
    tbl = pa.table(
        {
            "user_id": pa.array(rows_u, pa.int64()),
            "ts": pa.array(rows_t, pa.timestamp("us")),
        }
    )
    r = cox_stuart(_ds(tbl), "user_id", "ts").take_all()[0]
    assert r["n_pairs"] == 7 and r["s_plus"] == 7
    assert r["z"] == pytest.approx((2.0 * 7 - 7) / math.sqrt(7), abs=1e-12)


def test_markov_entropy_bruteforce(ray_session):
    from mothray.ops.markov import entropy_rate

    rng = np.random.default_rng(42)
    n = 300
    users = rng.integers(1, 6, n)
    ts = np.arange(n, dtype=np.int64)
    states = rng.choice(["a", "b", "c"], n)
    tbl = pa.table(
        {
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "event_type": pa.array(states),
        }
    )
    out = entropy_rate(_ds(tbl)).to_pylist()[0]
    from collections import Counter

    grid: Counter = Counter()
    for u in set(users.tolist()):
        seq = states[users == u]  # ts already sorted
        for a, b in zip(seq[:-1], seq[1:]):
            grid[(a, b)] += 1
    N = sum(grid.values())
    ni: Counter = Counter()
    for (a, _), c in grid.items():
        ni[a] += c
    h = -sum((c / N) * math.log(c / ni[a]) for (a, _), c in grid.items())
    assert out["n_transitions"] == N
    assert out["n_states"] == len(ni)
    assert out["entropy_rate"] == pytest.approx(h, abs=2e-6)
