"""sssp_bounded (graph.py), changepoint (window.py) and pr_curve
(moments.py) against brute-force references."""

import collections
import itertools

import numpy as np
import pyarrow as pa


def _random_edges(rng, n_nodes, n_edges):
    a = rng.integers(0, n_nodes, n_edges)
    b = rng.integers(0, n_nodes, n_edges)
    return [(int(x), int(y)) for x, y in zip(a, b) if x != y]


def _weight(a, b):
    lo, hi = min(a, b), max(a, b)
    return 1 + (lo + 3 * hi) % 7


def _brute_sssp(edges, source, max_hops):
    adj = collections.defaultdict(list)
    for a, b in edges:
        w = _weight(a, b)
        adj[a].append((b, w))
        adj[b].append((a, w))
    best = {source: 0}
    frontier = dict(best)
    for _ in range(max_hops):
        nxt = {}
        for u, d in frontier.items():
            for v, w in adj[u]:
                nd = d + w
                if nd < best.get(v, 1 << 60) and nd < nxt.get(v, 1 << 60):
                    nxt[v] = nd
        for v, d in nxt.items():
            if d < best.get(v, 1 << 60):
                best[v] = d
        frontier = best  # full relaxation each round, like the op
    return best


def test_sssp_bounded_matches_brute_force(ray_session):
    import ray.data

    from mothray.ops import graph

    rng = np.random.default_rng(11)
    edges = _random_edges(rng, 50, 160)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    got = graph.sssp_bounded(ds, "src", "dst", max_hops=3).take_all()
    source = min(itertools.chain.from_iterable(edges))
    want = _brute_sssp(edges, source, 3)
    assert {r["node"]: r["dist"] for r in got} == want


def test_sssp_source_distance_zero(ray_session):
    import ray.data

    from mothray.ops import graph

    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([1, 2, 3], pa.int64()),
                "dst": pa.array([2, 3, 4], pa.int64()),
            }
        )
    )
    got = {r["node"]: r["dist"] for r in
           graph.sssp_bounded(ds, "src", "dst", max_hops=2).take_all()}
    assert got[1] == 0
    assert got[2] == _weight(1, 2)
    assert got[3] == _weight(1, 2) + _weight(2, 3)
    assert 4 not in got  # 3 hops away, budget is 2


def _brute_changepoint(days, cents):
    order = np.argsort(days, kind="stable")
    day = np.asarray(days)[order]
    c = np.asarray(cents, dtype=np.int64)[order]
    n = len(day)
    s1 = np.cumsum(c)[:-1]
    t = np.arange(1, n)
    a = s1 * n - t * int(c.sum())
    obj = a.astype(float) ** 2 / (t.astype(float) * (n - t).astype(float))
    best = int(np.argmax(obj))
    return n, int(day[best]), abs(int(a[best]))


def test_changepoint_finds_planted_shift(ray_session):
    import ray.data

    from mothray.ops import window

    # user A: flat 10.00/day for 10 days then 50.00/day for 10 days —
    # the split must land on the boundary (day index 9, 0-based day 9)
    base = 1_700_000_000_000_000  # us epoch
    days = list(range(20))
    vals = [10.0] * 10 + [50.0] * 10
    tbl = pa.table(
        {
            "user_id": pa.array(["A"] * 20),
            "ts": pa.array([base + d * 86_400_000_000 for d in days],
                           pa.timestamp("us")),
            "value": pa.array(vals, pa.float64()),
        }
    )
    got = window.changepoint(
        ray.data.from_arrow(tbl), "user_id", "ts", "value"
    ).take_all()
    assert len(got) == 1
    r = got[0]
    n, split_day, a_abs = _brute_changepoint(
        [(base // 86_400_000_000) + d for d in days],
        [int(v * 100) for v in vals],
    )
    assert r["n_days"] == n == 20
    assert r["split_day"] == split_day
    assert r["a_abs"] == a_abs
    # the planted boundary is day 9 (last flat-10 day)
    assert r["split_day"] == (base // 86_400_000_000) + 9


def test_changepoint_random_matches_brute(ray_session):
    import ray.data

    from mothray.ops import window

    rng = np.random.default_rng(3)
    base = 1_700_000_000_000_000
    rows_u, rows_t, rows_v = [], [], []
    want = {}
    for u in ["a", "b", "c"]:
        n = int(rng.integers(2, 30))
        days = sorted(rng.choice(200, size=n, replace=False).tolist())
        vals = np.round(rng.uniform(-50, 50, n), 2)
        rows_u += [u] * n
        rows_t += [base + d * 86_400_000_000 for d in days]
        rows_v += vals.tolist()
        want[u] = _brute_changepoint(
            [(base // 86_400_000_000) + d for d in days],
            np.floor(vals * 100 + 0.5).astype(np.int64).tolist(),
        )
    tbl = pa.table(
        {
            "user_id": pa.array(rows_u),
            "ts": pa.array(rows_t, pa.timestamp("us")),
            "value": pa.array(rows_v, pa.float64()),
        }
    )
    got = window.changepoint(
        ray.data.from_arrow(tbl), "user_id", "ts", "value"
    ).take_all()
    assert {r["user_id"]: (r["n_days"], r["split_day"], r["a_abs"]) for r in got} == want


def test_pr_curve_matches_brute(ray_session):
    import ray.data

    from mothray.ops import moments

    rng = np.random.default_rng(5)
    score = rng.uniform(0, 100, 500)
    y = (rng.uniform(0, 1, 500) < 0.3).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"s": pa.array(score), "y": pa.array(y)})
    ).repartition(7)
    thresholds = list(range(0, 110, 10))
    got = moments.pr_curve(ds, "s", "y", thresholds)
    npos = int(y.sum())
    for i, thr in enumerate(sorted(thresholds)):
        tp = int(((score >= thr) & (y == 1)).sum())
        fp = int(((score >= thr) & (y == 0)).sum())
        assert got.column("thr")[i].as_py() == thr
        assert got.column("tp")[i].as_py() == tp
        assert got.column("fp")[i].as_py() == fp
        assert got.column("fn")[i].as_py() == npos - tp
        prec = got.column("precision")[i].as_py()
        if tp + fp == 0:
            assert prec is None
        else:
            assert prec == tp / (tp + fp)
        assert got.column("recall")[i].as_py() == tp / npos
        assert got.column("f1")[i].as_py() == (2 * tp) / (2 * tp + fp + (npos - tp))


def test_tree_rollup_matches_brute(ray_session):
    import ray.data

    from mothray.ops import graph

    rng = np.random.default_rng(21)
    n = 30
    vals_n = rng.integers(0, n, 80)           # nodes may repeat / be missing
    vals_v = rng.integers(-5, 50, 80)
    vtbl = pa.table(
        {
            "child": pa.array(vals_n, pa.int64()),
            "v": pa.array(vals_v, pa.int64()),
        }
    )
    # complete tree: parent = child // 4 for every node 1..n-1, root 0
    kids = list(range(1, n))
    etbl = pa.table(
        {
            "child": pa.array(kids, pa.int64()),
            "parent": pa.array([k // 4 for k in kids], pa.int64()),
        }
    )
    got = {
        r["node"]: r["sum_v"]
        for r in graph.tree_rollup(
            ray.data.from_arrow(vtbl).repartition(4),
            ray.data.from_arrow(etbl),
            "child",
            "parent",
            ["v"],
        ).take_all()
    }
    want = collections.defaultdict(int)
    for node, v in zip(vals_n, vals_v):
        a = int(node)
        want[a] += int(v)
        while a > 0:
            a //= 4
            want[a] += int(v)
    assert got == dict(want)
