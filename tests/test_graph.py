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


def test_triangle_count_known_graph(ray_session):
    """K4 plus a pendant edge: C(4,3)=4 triangles; wedges =
    sum d(d-1)/2 = 3 + 3 + 6 + 3 + 0 = 15 (degrees 3,3,4,3,1)."""
    import ray.data

    from mothray.ops import graph

    edges = pa.table(
        {
            "src": [0, 0, 0, 1, 1, 2, 2, 3],  # K4 on {0,1,2,3} + (2,4)
            "dst": [1, 2, 3, 2, 3, 3, 4, 2],  # includes a dup/reverse (3,2)
        }
    )
    out = graph.triangle_count(ray.data.from_arrow(edges)).to_pylist()[0]
    assert out["triangles"] == 4
    assert out["wedges"] == 15
    assert out["global_clustering"] == 3.0 * 4 / 15


def test_triangle_count_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from mothray.ops import graph

    src = "/root/testdata/sf0.001/orders.parquet"
    ds = ray.data.read_parquet(src, columns=["o_orderkey", "o_custkey"])

    def edge(t: pa.Table) -> pa.Table:
        s = t.column("o_orderkey").to_numpy(zero_copy_only=False) % 149
        d = t.column("o_custkey").to_numpy(zero_copy_only=False) % 149
        return pa.table({"src": pa.array(s, pa.int64()), "dst": pa.array(d, pa.int64())})

    got = graph.triangle_count(ds.map_batches(edge, batch_format="pyarrow")).to_pylist()[0]
    exp = duckdb.sql(
        f"WITH e0 AS (SELECT o_orderkey % 149 AS s, o_custkey % 149 AS d"
        f" FROM read_parquet('{src}')),"
        " p AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM e0 WHERE s <> d),"
        " tri AS (SELECT CAST(count(*) AS BIGINT) AS t FROM p x"
        "  JOIN p y ON x.a = y.a AND x.b < y.b JOIN p z ON z.a = x.b AND z.b = y.b),"
        " dg AS (SELECT node, CAST(count(*) AS BIGINT) AS dgr FROM"
        "  (SELECT a AS node FROM p UNION ALL SELECT b AS node FROM p) GROUP BY node),"
        " wd AS (SELECT CAST(sum((dgr * (dgr - 1)) // 2) AS BIGINT) AS w FROM dg)"
        " SELECT t, w FROM tri CROSS JOIN wd"
    ).fetchone()
    assert (got["triangles"], got["wedges"]) == exp


def test_triangle_count_no_triangles(ray_session):
    import ray.data

    from mothray.ops import graph

    path = pa.table({"src": [0, 1, 2], "dst": [1, 2, 3]})  # a path: 0 triangles
    out = graph.triangle_count(ray.data.from_arrow(path)).to_pylist()[0]
    assert out["triangles"] == 0 and out["wedges"] == 2
