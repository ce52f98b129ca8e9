"""Late round-4 operators: per-node clustering, Jarque-Bera,
Brown-Forsythe, OHLC bars, melt/unpivot — each against a small
brute-force reference."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(table: pa.Table):
    import ray.data

    return ray.data.from_arrow(table)


def test_node_clustering_matches_bruteforce(ray_session):
    from mothray.ops.graph import node_clustering

    rng = np.random.default_rng(7)
    n_nodes = 40
    m = 160
    src = rng.integers(0, n_nodes, m)
    dst = rng.integers(0, n_nodes, m)
    edges = _ds(pa.table({"src": pa.array(src, pa.int64()),
                          "dst": pa.array(dst, pa.int64())}))
    out = {r["node"]: (r["degree"], r["triangles"])
           for r in node_clustering(edges, "src", "dst").take_all()}

    # brute force: adjacency sets
    adj: dict[int, set[int]] = {}
    for a, b in zip(src.tolist(), dst.tolist()):
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for v, nbrs in adj.items():
        tri = 0
        nl = sorted(nbrs)
        for i in range(len(nl)):
            for j in range(i + 1, len(nl)):
                if nl[j] in adj.get(nl[i], set()):
                    tri += 1
        assert out[v] == (len(nbrs), tri), v
    assert set(out) == set(adj)


def test_node_clustering_triangle_total_consistent(ray_session):
    """Sum of per-node triangle counts == 3 * global triangle count."""
    from mothray.ops.graph import node_clustering, triangle_count

    rng = np.random.default_rng(11)
    src = rng.integers(0, 60, 300)
    dst = rng.integers(0, 60, 300)
    edges = pa.table({"src": pa.array(src, pa.int64()),
                      "dst": pa.array(dst, pa.int64())})
    per_node = node_clustering(_ds(edges), "src", "dst").take_all()
    total = triangle_count(_ds(edges), "src", "dst")
    assert sum(r["triangles"] for r in per_node) == 3 * total.column("triangles")[0].as_py()


def test_jarque_bera_matches_scipy_formula(ray_session):
    from mothray.ops.moments import jarque_bera

    rng = np.random.default_rng(3)
    g = np.repeat(np.array(["a", "b"], dtype=object), 500)
    x = np.concatenate([rng.integers(1, 51, 500), rng.integers(1, 11, 500)]).astype(
        np.float64
    )
    t = pa.table({"g": pa.array(g, pa.string()), "x": pa.array(x)})
    rows = {r["g"]: r for r in jarque_bera(_ds(t), "x", "g").take_all()}
    for key, sel in (("a", x[:500]), ("b", x[500:])):
        n = len(sel)
        m2 = ((sel - sel.mean()) ** 2).mean()
        m3 = ((sel - sel.mean()) ** 3).mean()
        m4 = ((sel - sel.mean()) ** 4).mean()
        skew = m3 / m2**1.5
        exk = m4 / m2**2 - 3
        jb = n / 6 * (skew**2 + exk**2 / 4)
        r = rows[key]
        assert r["n"] == n
        assert r["skewness"] == pytest.approx(skew, abs=1e-5)
        assert r["ex_kurtosis"] == pytest.approx(exk, abs=1e-5)
        assert r["jb"] == pytest.approx(jb, abs=1e-3)


def test_brown_forsythe_matches_bruteforce(ray_session):
    from mothray.ops.moments import brown_forsythe

    rng = np.random.default_rng(5)
    groups = ["a", "b", "c"]
    xs = {gname: rng.integers(1, 30, 200 + 37 * i).astype(np.float64)
          for i, gname in enumerate(groups)}
    g = np.concatenate([np.full(len(v), k, dtype=object) for k, v in xs.items()])
    x = np.concatenate(list(xs.values()))
    t = pa.table({"g": pa.array(g, pa.string()), "x": pa.array(x)})
    out = brown_forsythe(_ds(t), "x", "g").to_pylist()[0]

    zs = {k: np.abs(v - np.median(v)) for k, v in xs.items()}
    k = len(groups)
    n = sum(len(v) for v in zs.values())
    gm = sum(v.sum() for v in zs.values()) / n
    ssb = sum(len(v) * (v.mean() - gm) ** 2 for v in zs.values())
    ssw = sum(((v - v.mean()) ** 2).sum() for v in zs.values())
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert out["k"] == k and out["n"] == n
    assert out["f_stat"] == pytest.approx(f, abs=1e-5)


def test_ohlc_picks_by_ts_then_tiebreak(ray_session):
    from mothray.ops.window import ohlc

    ts = pa.array(
        [
            np.datetime64("2024-01-01T10:00:05", "us"),
            np.datetime64("2024-01-01T10:00:05", "us"),  # tie on ts
            np.datetime64("2024-01-01T10:59:59", "us"),
            np.datetime64("2024-01-01T11:30:00", "us"),
        ],
        pa.timestamp("us"),
    )
    t = pa.table(
        {
            "ts": ts,
            "event_id": pa.array([2, 1, 3, 4], pa.int64()),
            "value": pa.array([10.0, 20.0, 5.0, 7.5]),
        }
    )
    rows = sorted(
        ohlc(_ds(t), "ts", "value", "event_id", bucket="hour").take_all(),
        key=lambda r: r["bucket_ts"],
    )
    assert len(rows) == 2
    first = rows[0]
    # open = event_id 1 (ties on ts break by id), close = last by ts
    assert first["open"] == 20.0
    assert first["close"] == 5.0
    assert first["high"] == 20.0 and first["low"] == 5.0 and first["n_events"] == 3
    assert rows[1]["open"] == rows[1]["close"] == 7.5


def test_melt_shape_and_nulls(ray_session):
    from mothray.ops.setops import melt

    t = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "a": pa.array([1.5, None], pa.float64()),
            "b": pa.array([None, 4.0], pa.float64()),
        }
    )
    rows = sorted(
        melt(_ds(t), ["id"], ["a", "b"]).take_all(),
        key=lambda r: (r["id"], r["metric"]),
    )
    assert [(r["id"], r["metric"], r["value"]) for r in rows] == [
        (1, "a", 1.5),
        (1, "b", None),
        (2, "a", None),
        (2, "b", 4.0),
    ]
