"""Round-4 fifth-batch ops: edge triangle support (k-truss support),
integer-exact classical decomposition, distance correlation,
mix-shift decomposition — each against a brute-force reference."""

import itertools

import numpy as np
import pyarrow as pa


def test_edge_support_bruteforce(ray_session):
    import ray.data

    from mothray.ops.graph import edge_support

    rng = np.random.default_rng(83)
    m = 300
    src = rng.integers(0, 30, m)
    dst = rng.integers(0, 30, m)
    edges = ray.data.from_arrow(
        pa.table({"s": pa.array(src, pa.int64()), "d": pa.array(dst, pa.int64())})
    )
    got = {
        (r["u"], r["v"]): r["support"]
        for r in edge_support(edges, "s", "d", min_support=1).take_all()
    }

    eset = {
        (min(a, b), max(a, b))
        for a, b in zip(src.tolist(), dst.tolist())
        if a != b
    }
    want: dict[tuple[int, int], int] = {}
    for x, y, z in itertools.combinations(sorted({n for e in eset for n in e}), 3):
        if (x, y) in eset and (x, z) in eset and (y, z) in eset:
            for e in [(x, y), (x, z), (y, z)]:
                want[e] = want.get(e, 0) + 1
    assert got == want
    assert all(v >= 1 for v in got.values())


def test_edge_support_triangle_identity(ray_session):
    """sum(support) == 3 * triangle count on the same graph."""
    import ray.data

    from mothray.ops.graph import edge_support, triangle_count

    rng = np.random.default_rng(7)
    src = rng.integers(0, 25, 250)
    dst = rng.integers(0, 25, 250)
    t = pa.table({"s": pa.array(src, pa.int64()), "d": pa.array(dst, pa.int64())})
    sup = edge_support(ray.data.from_arrow(t), "s", "d").take_all()
    tri = triangle_count(ray.data.from_arrow(t), "s", "d")
    assert sum(r["support"] for r in sup) == 3 * tri.column("triangles")[0].as_py()


def test_classical_decompose_exact(ray_session):
    import ray.data

    from mothray.ops.window import classical_decompose

    rng = np.random.default_rng(11)
    day_us = 24 * 3600 * 1_000_000
    # 21 consecutive days with varying counts, plus one gap day removed
    days = [d for d in range(100, 121) if d != 110]
    ts = []
    counts = {}
    for d in days:
        c = int(rng.integers(5, 40))
        counts[d] = c
        ts.extend([d * day_us + i for i in range(c)])
    ds = ray.data.from_arrow(
        pa.table({"ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us"))})
    )
    out = classical_decompose(ds, "ts", period=7)
    rows = {r["day"]: r for r in out.to_pylist()}
    # complete centered windows only: days 103..107 and 114..117
    expect_days = [
        d for d in days if all((d + k) in counts for k in range(-3, 4))
    ]
    assert sorted(rows) == sorted(expect_days)
    for d in expect_days:
        trend = sum(counts[d + k] for k in range(-3, 4))
        assert rows[d]["trend7"] == trend
        assert rows[d]["det7"] == 7 * counts[d] - trend
        assert rows[d]["n"] == counts[d]
    # seasonal pairs: per-dow exact sums over the reported days
    for d in expect_days:
        dow = d % 7
        dets = [
            7 * counts[e] - sum(counts[e + k] for k in range(-3, 4))
            for e in expect_days
            if e % 7 == dow
        ]
        assert rows[d]["seas_num"] == sum(dets)
        assert rows[d]["seas_den"] == len(dets)


def test_distance_correlation_matches_definition(ray_session):
    import ray.data

    from mothray.ops.moments import distance_correlation

    rng = np.random.default_rng(29)
    day_us = 24 * 3600 * 1_000_000
    ts, uid = [], []
    truth_x, truth_y = [], []
    for d in range(50, 62):
        n = int(rng.integers(3, 20))
        users = rng.integers(0, 8, n)
        truth_x.append(n)
        truth_y.append(len(set(users.tolist())))
        for u in users:
            ts.append(d * day_us + int(rng.integers(0, day_us)))
            uid.append(int(u))
    ds = ray.data.from_arrow(
        pa.table(
            {
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "user_id": pa.array(uid, pa.int64()),
            }
        )
    )
    out = distance_correlation(ds, "ts", "user_id").to_pylist()[0]
    n = len(truth_x)
    assert out["n_days"] == n

    def cen(v):
        v = np.array(v, np.int64)
        dm = np.abs(v[:, None] - v[None, :])
        rs = dm.sum(axis=1)
        return n * n * dm - n * rs[:, None] - n * rs[None, :] + int(dm.sum())

    a, b = cen(truth_x), cen(truth_y)
    assert out["s_ab"] == int((a * b).sum())
    assert out["s_aa"] == int((a * a).sum())
    assert out["s_bb"] == int((b * b).sum())
    # V-statistic distance covariance is nonnegative
    assert out["s_ab"] >= 0
    assert 0.0 <= out["dcor"] <= 1.0 + 1e-12


def test_mix_shift_identity(ray_session):
    """Effects sum to the overall average change (decomposition
    identity), and per-group integers match a pandas reference."""
    import ray.data

    from mothray.ops.moments import mix_shift

    rng = np.random.default_rng(41)
    day_us = 24 * 3600 * 1_000_000
    n = 500
    grp = rng.choice(["A", "B", "C"], n)
    day = rng.integers(90, 110, n)
    val = np.round(rng.uniform(1, 500, n), 2)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "g": pa.array(grp),
                "v": pa.array(val, pa.float64()),
                "ts": pa.array(day * day_us, pa.int64()).cast(pa.timestamp("us")),
            }
        )
    )
    out = mix_shift(ds, "g", "v", "ts", split_day=100).to_pylist()
    cents = np.rint(val * 100).astype(np.int64)
    p = np.where(day < 100, 1, 2)
    n1t = int((p == 1).sum())
    n2t = int((p == 2).sum())
    total = 0.0
    for r in out:
        m = grp == r["g"]
        n1 = int((m & (p == 1)).sum())
        n2 = int((m & (p == 2)).sum())
        s1 = int(cents[m & (p == 1)].sum())
        s2 = int(cents[m & (p == 2)].sum())
        assert (r["n1"], r["n2"], r["s1_cents"], r["s2_cents"]) == (n1, n2, s1, s2)
        total += r["mix_effect"] + r["rate_effect"]
    avg1 = cents[p == 1].sum() / n1t
    avg2 = cents[p == 2].sum() / n2t
    assert abs(total - (avg2 - avg1)) < 1e-6
