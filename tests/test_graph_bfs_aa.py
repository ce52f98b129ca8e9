"""adamic_adar + bfs_levels (graph.py) and peak_concurrency
(window.py) against brute-force references."""

import collections
import math

import numpy as np
import pyarrow as pa


def _random_edges(rng, n_nodes, n_edges):
    a = rng.integers(0, n_nodes, n_edges)
    b = rng.integers(0, n_nodes, n_edges)
    return [(int(x), int(y)) for x, y in zip(a, b) if x != y]


def _brute_adamic_adar(edges):
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    edge_set = {(min(a, b), max(a, b)) for a, b in edges}
    scores = collections.defaultdict(float)
    for w, nbrs in adj.items():
        ns = sorted(nbrs)
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                scores[(ns[i], ns[j])] += 1.0 / math.log(len(nbrs))
    return {p: s for p, s in scores.items() if p not in edge_set}


def test_adamic_adar_matches_brute_force(ray_session):
    import ray.data

    from mothray.ops import graph

    rng = np.random.default_rng(7)
    edges = _random_edges(rng, 40, 120)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    got = graph.adamic_adar(ds, "src", "dst", top_k=15).take_all()
    want = _brute_adamic_adar(edges)
    ranked = sorted(
        ((round(s, 6), u, v) for (u, v), s in want.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:15]
    assert [(r["aa_r6"], r["u"], r["v"]) for r in got] == ranked


def test_adamic_adar_excludes_existing_edges(ray_session):
    import ray.data

    from mothray.ops import graph

    # path 0-1-2: only non-edge pair with a common neighbor is (0, 2)
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array([0, 1], pa.int64()), "dst": pa.array([1, 2], pa.int64())})
    )
    got = graph.adamic_adar(ds, "src", "dst", top_k=10).take_all()
    assert len(got) == 1
    assert (got[0]["u"], got[0]["v"]) == (0, 2)
    assert got[0]["aa_r6"] == round(1.0 / math.log(2), 6)


def _brute_bfs(edges, source, max_depth):
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    dist = {source: 0}
    frontier = [source]
    for d in range(1, max_depth + 1):
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    hist = collections.Counter(dist.values())
    return [hist[d] for d in sorted(hist)]


def test_bfs_levels_matches_brute_force(ray_session):
    import ray.data

    from mothray.ops import graph

    rng = np.random.default_rng(11)
    edges = _random_edges(rng, 60, 90)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([a for a, _ in edges], pa.int64()),
                "dst": pa.array([b for _, b in edges], pa.int64()),
            }
        )
    )
    src = min(min(a, b) for a, b in edges)
    got = graph.bfs_levels(ds, "src", "dst", max_depth=4)
    assert got.column("n_nodes").to_pylist() == _brute_bfs(edges, src, 4)
    assert got.column("dist").to_pylist() == list(range(got.num_rows))


def test_bfs_levels_frontier_exhausts_early(ray_session):
    import ray.data

    from mothray.ops import graph

    # two disconnected edges: from node 0 only dist 0/1 exist
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array([0, 5], pa.int64()), "dst": pa.array([1, 6], pa.int64())})
    )
    got = graph.bfs_levels(ds, "src", "dst", max_depth=5)
    assert got.column("dist").to_pylist() == [0, 1]
    assert got.column("n_nodes").to_pylist() == [1, 1]


def _brute_peak(ts_us, dur_us):
    deltas = collections.defaultdict(int)
    for t in ts_us:
        deltas[t] += 1
        deltas[t + dur_us] -= 1
    cum, best, at = 0, None, None
    for t in sorted(deltas):
        cum += deltas[t]
        if best is None or cum > best:
            best, at = cum, t
    return best, at


def test_peak_concurrency_matches_brute_force(ray_session):
    import ray.data

    from mothray.ops import window

    rng = np.random.default_rng(3)
    # spread over ~3 days so the per-day stitching is exercised
    ts = np.sort(rng.integers(0, 3 * 86_400_000_000, 500))
    ds = ray.data.from_arrow(
        pa.table({"ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us"))})
    ).repartition(7)
    got = window.peak_concurrency(ds, "ts", duration_s=1800)
    best, at = _brute_peak(ts.tolist(), 1800 * 1_000_000)
    assert got.column("max_concurrent").to_pylist() == [best]
    assert got.column("at_ts").cast(pa.int64()).to_pylist() == [at]


def test_peak_concurrency_nonoverlapping(ray_session):
    import ray.data

    from mothray.ops import window

    # events 1 hour apart with 30-minute lifetimes never overlap
    ts = np.arange(10, dtype=np.int64) * 3_600_000_000
    ds = ray.data.from_arrow(
        pa.table({"ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us"))})
    )
    got = window.peak_concurrency(ds, "ts", duration_s=1800)
    assert got.column("max_concurrent").to_pylist() == [1]
    assert got.column("at_ts").cast(pa.int64()).to_pylist() == [0]


def test_session_paths_brute_force(ray_session):
    import ray.data

    from mothray.ops import funnel

    rng = np.random.default_rng(61)
    n = 400
    uid = rng.integers(0, 5, n)
    ts = rng.integers(0, 86_400_000_000, n)
    types = rng.choice(["a", "b", "c"], n)
    tbl = pa.table(
        {
            "user_id": pa.array(uid, pa.int64()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "event_type": pa.array(types.astype(object), pa.string()),
            "event_id": pa.array(np.arange(n), pa.int64()),
        }
    )
    got = [
        (r["path"], r["n"])
        for r in funnel.session_paths(
            ray.data.from_arrow(tbl).repartition(5), path_len=3,
            gap_minutes=30, top_k=8
        ).take_all()
    ]
    gap = 30 * 60 * 1_000_000
    want = collections.Counter()
    for u in np.unique(uid):
        rows = sorted(zip(ts[uid == u], np.arange(n)[uid == u]))
        seq = [(t, types[i]) for t, i in rows]
        sid, sids = 0, []
        for k, (t, _) in enumerate(seq):
            if k == 0 or t - seq[k - 1][0] > gap:
                sid += 1
            sids.append(sid)
        for k in range(len(seq) - 2):
            if sids[k] == sids[k + 2]:
                want[">".join(x for _, x in seq[k:k + 3])] += 1
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
    assert got == ranked


def test_hits_matches_dense_power_iteration(ray_session):
    import ray.data

    from mothray.ops import graph

    rng = np.random.default_rng(67)
    n_nodes, n_edges = 25, 120
    s = rng.integers(0, n_nodes, n_edges)
    d = rng.integers(0, n_nodes, n_edges)
    ds = ray.data.from_arrow(
        pa.table({"src": pa.array(s, pa.int64()), "dst": pa.array(d, pa.int64())})
    )
    got = {(r["role"], r["node"]): r["score"]
           for r in graph.hits(ds, "src", "dst", iters=10, top_k=6).take_all()}
    # dense reference: distinct edges, same iteration/normalization order
    A = np.zeros((n_nodes, n_nodes))
    for a, b in set(zip(s.tolist(), d.tolist())):
        A[a, b] = 1.0
    present = (A.sum(axis=1) + A.sum(axis=0)) > 0
    h = np.where(present, 1.0 / math.sqrt(present.sum()), 0.0)
    for _ in range(10):
        a = A.T @ h
        a /= np.linalg.norm(a)
        h = A @ a
        h /= np.linalg.norm(h)
    idx = np.flatnonzero(present)
    hub_rank = sorted(((round(h[i], 4), i) for i in idx), key=lambda t: (-t[0], t[1]))[:6]
    auth_rank = sorted(((round(a[i], 4), i) for i in idx), key=lambda t: (-t[0], t[1]))[:6]
    for score, node in hub_rank:
        assert abs(got[("hub", node)] - score) < 2e-4
    for score, node in auth_rank:
        assert abs(got[("authority", node)] - score) < 2e-4
