"""Jaccard link prediction against a brute-force reference."""

import numpy as np
import pyarrow as pa
import pytest


def test_jaccard_links_bruteforce(ray_session):
    import ray.data

    from mothray.ops.graph import jaccard_links

    rng = np.random.default_rng(61)
    m = 200
    src = rng.integers(0, 40, m)
    dst = rng.integers(0, 40, m)
    edges = ray.data.from_arrow(
        pa.table({"s": pa.array(src, pa.int64()), "d": pa.array(dst, pa.int64())})
    )
    got = jaccard_links(edges, "s", "d", top_k=15).take_all()

    adj: dict[int, set[int]] = {}
    eset = set()
    for a, b in zip(src.tolist(), dst.tolist()):
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
        eset.add((min(a, b), max(a, b)))
    cand = []
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if (u, v) in eset:
                continue
            cn = len(adj[u] & adj[v])
            if cn == 0:
                continue
            jac = cn / (len(adj[u]) + len(adj[v]) - cn)
            cand.append((u, v, cn, jac))
    cand.sort(key=lambda t: (-t[3], t[0], t[1]))
    want = cand[:15]
    assert [(r["u"], r["v"], r["common"]) for r in got] == [
        (u, v, c) for u, v, c, _ in want
    ]
    for r, (_, _, _, jac) in zip(got, want):
        assert r["jac"] == pytest.approx(jac, abs=1e-12)
