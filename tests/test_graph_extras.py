"""k_core (graph.py), gini_concentration and theil_sen_group
(moments.py) against brute-force references."""

import numpy as np
import pyarrow as pa


def _brute_k_core(edges, k):
    import collections

    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    alive = set(adj)
    changed = True
    while changed:
        changed = False
        dead = [n for n in alive if sum(1 for m in adj[n] if m in alive) < k]
        if dead:
            alive -= set(dead)
            changed = True
    return {n: sum(1 for m in adj[n] if m in alive) for n in alive}


def test_k_core_matches_brute_force(ray_session):
    import ray.data

    from mothray.ops import graph

    rng = np.random.default_rng(41)
    edges = set()
    while len(edges) < 400:
        a, b = rng.integers(0, 60, 2)
        if a != b:
            edges.add((min(int(a), int(b)), max(int(a), int(b))))
    edges = sorted(edges)
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    for k in (3, 8, 12):
        want = _brute_k_core(edges, k)
        got = {
            r["node"]: r["degree"]
            for r in graph.k_core(
                ray.data.from_arrow(t).repartition(4), "src", "dst", k
            ).take_all()
        }
        assert got == want, f"k={k}"


def test_k_core_empty_core(ray_session):
    import ray.data

    from mothray.ops import graph

    t = pa.table({"src": pa.array([1, 2], pa.int64()), "dst": pa.array([2, 3], pa.int64())})
    out = graph.k_core(ray.data.from_arrow(t), "src", "dst", 5).take_all()
    assert out == []


def test_gini_exact_vs_pairwise(ray_session):
    import ray.data

    from mothray.ops import moments

    rng = np.random.default_rng(42)
    v = np.round(rng.uniform(1, 500, 800), 2)
    t = pa.table({"v": v})
    out = moments.gini_concentration(
        ray.data.from_arrow(t).repartition(5), "v"
    ).to_pylist()[0]
    cents = np.rint(v * 100).astype(np.int64)
    pairwise = int(np.abs(cents[:, None] - cents[None, :]).sum() // 2)
    assert out["n"] == 800
    assert out["gmd_num"] == pairwise
    assert out["sum_scaled"] == int(cents.sum())
    assert abs(out["gini"] - pairwise / (800 * cents.sum())) < 1e-6


def test_gini_uniform_values_zero(ray_session):
    import ray.data

    from mothray.ops import moments

    t = pa.table({"v": [5.0] * 100})
    out = moments.gini_concentration(ray.data.from_arrow(t), "v").to_pylist()[0]
    assert out["gmd_num"] == 0 and out["gini"] == 0.0


def test_theil_sen_matches_naive(ray_session):
    import ray.data

    from mothray.ops import moments

    rng = np.random.default_rng(43)
    n = 60
    t_us = np.sort(rng.choice(10**9, n, replace=False)).astype(np.int64)
    v = np.round(2e-7 * t_us + rng.normal(0, 5, n), 2)
    v[10] += 500.0  # outlier: Theil-Sen shrugs, OLS would not
    tbl = pa.table(
        {
            "k": pa.array([1] * n, pa.int64()),
            "ts": pa.array(t_us, pa.int64()).cast(pa.timestamp("us")),
            "v": v,
        }
    )
    out = moments.theil_sen_group(
        ray.data.from_arrow(tbl).repartition(3), "k", "ts", "v"
    ).take_all()[0]
    slopes = []
    for i in range(n):
        for j in range(i + 1, n):
            if t_us[i] != t_us[j]:
                slopes.append((v[j] - v[i]) / ((t_us[j] - t_us[i]) / 1e6))
    assert out["n_pairs"] == len(slopes)
    assert out["slope"] == round(float(np.median(slopes)), 6)
    assert abs(out["slope"] - 2e-7 * 1e6) < 0.05  # robust to the outlier


def test_degree_distribution_and_assortativity(ray_session):
    import pyarrow as pa
    import ray.data

    from mothray.ops import graph

    # star graph: center degree 4, leaves degree 1 -> r = -1
    t = pa.table(
        {
            "src": pa.array([0, 0, 0, 0], pa.int64()),
            "dst": pa.array([1, 2, 3, 4], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(2)
    dd = {r["degree"]: r["n_nodes"] for r in graph.degree_distribution(ds, "src", "dst").take_all()}
    assert dd == {1: 4, 4: 1}
    out = graph.assortativity(ds, "src", "dst").to_pylist()[0]
    assert out["n_edges"] == 4 and out["r"] == -1.0

    # ring: all degrees equal -> r undefined (zero variance) -> None
    ring = pa.table(
        {
            "src": pa.array([0, 1, 2, 3], pa.int64()),
            "dst": pa.array([1, 2, 3, 0], pa.int64()),
        }
    )
    out2 = graph.assortativity(ray.data.from_arrow(ring), "src", "dst").to_pylist()[0]
    assert out2["r"] is None
