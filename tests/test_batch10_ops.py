"""Round-4 fifth-batch ops, part 3: seasonal-naive forecast error,
stripe clustering audit, k-truss peeling, LOF outliers."""

import numpy as np
import pyarrow as pa
import pytest


def test_seasonal_naive_error_exact(ray_session):
    import ray.data

    from mothray.ops.window import seasonal_naive_error

    rng = np.random.default_rng(19)
    day_us = 24 * 3600 * 1_000_000
    days = [d for d in range(200, 220) if d != 209]  # one gap
    counts = {d: int(rng.integers(1, 30)) for d in days}
    ts = [d * day_us + i for d in days for i in range(counts[d])]
    ds = ray.data.from_arrow(
        pa.table({"ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us"))})
    )
    out = seasonal_naive_error(ds, "ts", period=7).to_pylist()[0]
    n = e1 = es = 0
    for d in days:
        if (d - 1) in counts and (d - 7) in counts:
            n += 1
            e1 += abs(counts[d] - counts[d - 1])
            es += abs(counts[d] - counts[d - 7])
    assert out["n_days"] == n
    assert out["sae_naive1"] == e1
    assert out["sae_seasonal"] == es
    assert out["ratio"] == es / e1


def test_clustering_report_sorted_vs_shuffled(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from mothray import pipeline
    from mothray.ops.profile import clustering_report

    rng = np.random.default_rng(3)
    n = 4000
    sorted_col = np.arange(n, dtype=np.int64)
    random_col = rng.permutation(n).astype(np.int64)
    src = tmp_path / "in.parquet"
    pq.write_table(
        pa.table({"a": pa.array(sorted_col), "b": pa.array(random_col)}), src
    )
    enc = str(tmp_path / "enc")
    pipeline.encode_parquet_to_dir(str(src), enc, opts={"stripe_rows": 500})
    rep = {r["col"]: r for r in clustering_report(enc, ["a", "b"]).to_pylist()}
    assert rep["a"]["n_stripes"] == rep["b"]["n_stripes"] >= 4
    assert rep["a"]["n_with_stats"] == rep["a"]["n_stripes"]
    # sorted column: disjoint stripe ranges
    assert rep["a"]["n_overlap_pairs"] == 0
    assert rep["a"]["max_depth"] == 1
    # shuffled column: every stripe spans ~the full domain
    s = rep["b"]["n_stripes"]
    assert rep["b"]["n_overlap_pairs"] == s * (s - 1) // 2
    assert rep["b"]["max_depth"] == s


def _brute_truss(edge_set: set, k: int) -> dict:
    edges = set(edge_set)
    while True:
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {
            (a, b): len(adj[a] & adj[b]) for a, b in edges
        }
        drop = {e for e, s in sup.items() if s < k - 2}
        if not drop:
            return sup
        edges -= drop


def test_k_truss_bruteforce(ray_session):
    import ray.data

    from mothray.ops.graph import k_truss

    rng = np.random.default_rng(67)
    src = rng.integers(0, 24, 260)
    dst = rng.integers(0, 24, 260)
    eset = {
        (min(a, b), max(a, b))
        for a, b in zip(src.tolist(), dst.tolist())
        if a != b
    }
    edges = ray.data.from_arrow(
        pa.table({"s": pa.array(src, pa.int64()), "d": pa.array(dst, pa.int64())})
    )
    for k in (3, 4, 5):
        got = {
            (r["u"], r["v"]): r["support"]
            for r in k_truss(edges, "s", "d", k=k).take_all()
        }
        assert got == _brute_truss(eset, k), f"k={k}"


def test_k_truss_rejects_small_k(ray_session):
    import ray.data

    from mothray.ops.graph import k_truss

    edges = ray.data.from_arrow(
        pa.table({"s": pa.array([1], pa.int64()), "d": pa.array([2], pa.int64())})
    )
    with pytest.raises(ValueError):
        k_truss(edges, "s", "d", k=2)


def _brute_lof(X: np.ndarray, k: int) -> np.ndarray:
    n = len(X)
    d = np.sqrt(
        np.maximum(
            (X * X).sum(1)[:, None] + (X * X).sum(1)[None, :] - 2 * X @ X.T, 0
        )
    )
    np.fill_diagonal(d, np.inf)
    order = np.argsort(d, axis=1, kind="stable")[:, :k]
    kdist = np.take_along_axis(d, order, 1)[:, -1]
    reach = np.maximum(np.take_along_axis(d, order, 1), kdist[order])
    lrd = k / reach.sum(axis=1)
    return lrd[order].mean(axis=1) / lrd


def test_lof_matches_definition(ray_session):
    import ray.data

    from mothray.ops.ann import lof_outliers

    rng = np.random.default_rng(5)
    X = rng.normal(0, 1, (120, 8))
    X[0] = 40.0  # planted far outlier
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(120), pa.int64()),
                "embedding": pa.array(
                    list(X.astype(np.float32)), pa.list_(pa.float32())
                ),
            }
        )
    )
    got = lof_outliers(ds, k=10, top_n=120).take_all()
    want = _brute_lof(X.astype(np.float32).astype(np.float64), 10)
    by_id = {r["vec_id"]: r["lof"] for r in got}
    assert set(by_id) == set(range(120))
    for i in range(120):
        assert by_id[i] == pytest.approx(want[i], rel=1e-9), i
    # the planted outlier dominates
    assert got[0]["vec_id"] == 0
    assert got[0]["lof"] > 5.0
