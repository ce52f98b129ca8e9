"""Round-4 continuation stats ops: two-sample KS/Wasserstein, Theil
index, Simpson/Shannon diversity, Wald-Wolfowitz runs test, Friedman
day-of-week test — each against a small brute-force reference."""

import datetime as dt
import math

import numpy as np
import pyarrow as pa
import pytest


def _ds(table: pa.Table):
    import ray.data

    return ray.data.from_arrow(table)


def test_ks_wasserstein_matches_bruteforce(ray_session):
    from mothray.ops.moments import ks_wasserstein_2samp

    rng = np.random.default_rng(11)
    a = rng.integers(1, 20, 300)
    b = rng.integers(5, 30, 200)
    tbl = pa.table(
        {
            "v": pa.array(np.r_[a, b].astype(np.float64)),
            "g": pa.array(["A"] * len(a) + ["B"] * len(b)),
        }
    )
    out = ks_wasserstein_2samp(_ds(tbl), "v", "g", "A", "B").to_pylist()[0]
    # brute force over the merged grid
    grid = sorted(set(a.tolist()) | set(b.tolist()))
    na, nb = len(a), len(b)
    d = 0.0
    w = 0.0
    for i, x in enumerate(grid):
        fa = (a <= x).sum() / na
        fb = (b <= x).sum() / nb
        d = max(d, abs(fa - fb))
        if i + 1 < len(grid):
            w += abs(fa - fb) * (grid[i + 1] - x)
    assert out["n_a"] == na and out["n_b"] == nb
    assert out["ks_d"] == pytest.approx(d, abs=1e-12)
    assert out["w1"] == pytest.approx(w, abs=1e-9)


def test_theil_index_matches_bruteforce(ray_session):
    from mothray.ops.moments import theil_index

    rng = np.random.default_rng(3)
    x = np.round(rng.lognormal(3, 1, 500), 2)
    g = rng.choice(["p", "q"], 500)
    tbl = pa.table({"x": pa.array(x), "g": pa.array(g)})
    out = {r["g"]: r for r in theil_index(_ds(tbl), "x", "g").take_all()}
    for grp in ("p", "q"):
        c = np.round(x[g == grp] * 100).astype(np.int64)
        c = c[c > 0]
        mu = c.sum() / len(c)
        t = float(np.mean((c / mu) * np.log(c / mu)))
        assert out[grp]["n"] == len(c)
        assert out[grp]["theil_t"] == pytest.approx(t, abs=2e-6)


def test_diversity_matches_bruteforce(ray_session):
    from mothray.ops.moments import diversity

    rng = np.random.default_rng(5)
    cats = rng.choice(["x", "y", "z", "w"], 400, p=[0.5, 0.3, 0.15, 0.05])
    grp = rng.choice(["g1", "g2"], 400)
    tbl = pa.table({"cat": pa.array(cats), "grp": pa.array(grp)})
    out = {r["grp"]: r for r in diversity(_ds(tbl), "grp", "cat").take_all()}
    for g in ("g1", "g2"):
        sub = cats[grp == g]
        n = len(sub)
        counts = np.array([int((sub == c).sum()) for c in set(sub.tolist())])
        simpson = 1.0 - (counts * (counts - 1)).sum() / (n * (n - 1))
        p = counts / n
        shannon = -(p * np.log(p)).sum()
        assert out[g]["n"] == n and out[g]["k"] == len(counts)
        assert out[g]["simpson"] == pytest.approx(simpson, abs=1e-12)
        assert out[g]["shannon"] == pytest.approx(shannon, abs=2e-6)


def test_runs_test_matches_bruteforce(ray_session):
    from mothray.ops.moments import runs_test

    rng = np.random.default_rng(9)
    n = 60
    vals = np.round(rng.normal(10, 3, n), 2)
    tbl = pa.table(
        {
            "k": pa.array(np.zeros(n, np.int64)),
            "o": pa.array(np.arange(n, dtype=np.int64)),
            "tb": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array(vals),
        }
    )
    out = runs_test(_ds(tbl), "k", "o", "v", "tb").take_all()
    # brute force
    c = np.round(vals * 100).astype(np.int64)
    sc = np.sort(c)
    med2 = int(sc[(n - 1) // 2]) + int(sc[n // 2])
    s = 2 * c - med2
    s = s[s != 0]
    npos, nneg = int((s > 0).sum()), int((s < 0).sum())
    nn = npos + nneg
    pos = s > 0
    runs = 1 + int((pos[1:] != pos[:-1]).sum())
    mu = 1.0 + 2.0 * npos * nneg / nn
    sigma = math.sqrt((mu - 1.0) * (mu - 2.0) / (nn - 1.0))
    assert len(out) == 1
    r = out[0]
    assert (r["n_pos"], r["n_neg"], r["runs"]) == (npos, nneg, runs)
    assert r["z"] == pytest.approx((runs - mu) / sigma, abs=1e-12)


def test_runs_test_drops_degenerate_keys(ray_session):
    from mothray.ops.moments import runs_test

    # constant values: everything ties with the median -> dropped
    tbl = pa.table(
        {
            "k": pa.array([1] * 20, pa.int64()),
            "o": pa.array(list(range(20)), pa.int64()),
            "tb": pa.array(list(range(20)), pa.int64()),
            "v": pa.array([5.0] * 20),
        }
    )
    assert runs_test(_ds(tbl), "k", "o", "v", "tb").take_all() == []


def test_friedman_matches_bruteforce(ray_session):
    from mothray.ops.moments import friedman_dow

    # 4 complete ISO weeks + a partial week; per-day row counts vary
    rng = np.random.default_rng(2)
    start = dt.datetime(2024, 1, 1)  # a Monday
    rows = []
    for d in range(30):
        day = start + dt.timedelta(days=d)
        for _ in range(int(rng.integers(1, 12))):
            rows.append(day)
    tbl = pa.table({"ts": pa.array(rows, pa.timestamp("us"))})
    out = friedman_dow(_ds(tbl), "ts").to_pylist()[0]

    # brute force
    from collections import Counter, defaultdict

    daily = Counter(r.date() for r in rows)
    weeks = defaultdict(dict)
    for day, cnt in daily.items():
        iso = day.isocalendar()
        weeks[(iso[0], iso[1])][iso[2]] = cnt
    complete = {w: v for w, v in weeks.items() if len(v) == 7}
    k = 7
    rj = np.zeros(k)
    for w in complete.values():
        counts = np.array([w[d] for d in range(1, 8)], dtype=np.float64)
        order = np.argsort(counts, kind="stable")
        ranks = np.empty(k)
        i = 0
        sv = counts[order]
        while i < k:
            j = i
            while j + 1 < k and sv[j + 1] == sv[i]:
                j += 1
            ranks[order[i : j + 1]] = (i + 1 + j + 1) / 2.0
            i = j + 1
        rj += ranks
    n = len(complete)
    q = 12.0 / (n * k * (k + 1)) * float((rj * rj).sum()) - 3.0 * n * (k + 1)
    assert out["n_weeks"] == n
    assert out["q"] == pytest.approx(q, abs=1e-9)
    for j in range(7):
        assert out[f"rs2_{j + 1}"] == int(round(2 * rj[j]))
