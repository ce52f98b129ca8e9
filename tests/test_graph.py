"""Connected-components tests: distributed label propagation vs a
union-find reference, on random graphs, long chains (exercising the
pointer-doubling shortcut), and messy inputs (nulls, self-loops,
duplicate edges). Partition-count invariance pins determinism."""

import numpy as np
import pyarrow as pa
import pytest

from mothray.ops import graph


class DSU:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def ref_components(pairs):
    d = DSU()
    for a, b in pairs:
        d.union(a, b)
    # canonical: min node of each component
    roots = {}
    for n in list(d.p):
        r = d.find(n)
        roots.setdefault(r, []).append(n)
    out = {}
    for r, members in roots.items():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def _run(ray_session, pairs, parts=3, **kw):
    import ray.data

    t = pa.table(
        {
            "src": pa.array([p[0] for p in pairs], pa.int64()),
            "dst": pa.array([p[1] for p in pairs], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(parts)
    got = graph.connected_components(ds, "src", "dst", **kw).to_pandas()
    return dict(zip(got["node"], got["component"]))


def test_cc_random_graph(ray_session):
    rng = np.random.default_rng(11)
    pairs = [tuple(map(int, rng.integers(0, 200, 2))) for _ in range(150)]
    assert _run(ray_session, pairs) == ref_components(pairs)


def test_cc_long_chain(ray_session):
    """A 400-node path: naive min-propagation needs ~400 rounds;
    pointer doubling must converge well inside max_rounds=50."""
    pairs = [(i, i + 1) for i in range(400)]
    got = _run(ray_session, pairs)
    assert set(got.values()) == {0}
    assert len(got) == 401


def test_cc_multiple_components_and_noise(ray_session):
    pairs = [(1, 2), (2, 3), (10, 11), (11, 10), (10, 10), (20, 21)]
    got = _run(ray_session, pairs)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_cc_null_endpoints_ignored(ray_session):
    import ray.data

    t = pa.table(
        {
            "src": pa.array([1, 2, None, 4], pa.int64()),
            "dst": pa.array([2, None, 3, 5], pa.int64()),
        }
    )
    got = graph.connected_components(ray.data.from_arrow(t), "src", "dst").to_pandas()
    m = dict(zip(got["node"], got["component"]))
    assert m == {1: 1, 2: 1, 4: 4, 5: 4}


def test_cc_partition_invariance(ray_session):
    rng = np.random.default_rng(5)
    pairs = [tuple(map(int, rng.integers(0, 80, 2))) for _ in range(60)]
    a = _run(ray_session, pairs, parts=1)
    b = _run(ray_session, pairs, parts=7, num_partitions=5)
    assert a == b == ref_components(pairs)
