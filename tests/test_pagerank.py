"""PageRank vs a dense numpy reference with identical semantics
(multigraph edges, uniform dangling redistribution, fixed iterations)."""

import numpy as np
import pyarrow as pa
import pytest

from mothray.ops import graph


def ref_pagerank(pairs, d=0.85, iters=10):
    nodes = sorted({x for p in pairs for x in p})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for s, _ in pairs:
        outdeg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        m = np.zeros(n)
        for s, t in pairs:
            m[idx[t]] += r[idx[s]] / outdeg[idx[s]]
        dangling = 1.0 - m.sum()
        r = (1 - d) / n + d * (m + dangling / n)
    return {v: r[idx[v]] for v in nodes}


def _run(ray_session, pairs, parts=3, iters=10):
    import ray.data

    t = pa.table(
        {
            "src": pa.array([p[0] for p in pairs], pa.int64()),
            "dst": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(parts)
    got = graph.pagerank(ds, "src", "dst", iterations=iters).to_pandas()
    return dict(zip(got["node"], got["rank"]))


def test_pagerank_random_graph(ray_session):
    rng = np.random.default_rng(4)
    pairs = [tuple(map(int, rng.integers(0, 40, 2))) for _ in range(120)]
    got = _run(ray_session, pairs)
    exp = ref_pagerank(pairs)
    assert set(got) == set(exp)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_dangling_and_hub(ray_session):
    # 1,2,3 all point at 0; 0 has no out-edges (dangling)
    pairs = [(1, 0), (2, 0), (3, 0), (1, 2)]
    got = _run(ray_session, pairs, parts=1, iters=15)
    exp = ref_pagerank(pairs, iters=15)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-12)
    assert got[0] == max(got.values())  # the sink hub ranks highest


def test_pagerank_partition_invariance(ray_session):
    rng = np.random.default_rng(8)
    pairs = [tuple(map(int, rng.integers(0, 25, 2))) for _ in range(60)]
    a = _run(ray_session, pairs, parts=1, iters=5)
    b = _run(ray_session, pairs, parts=7, iters=5)
    for v in a:
        assert a[v] == pytest.approx(b[v], abs=1e-12)
