"""Tests for distributed PCA (ops/pca.py) and the standardize
transform (ops/moments.py)."""

import numpy as np
import pyarrow as pa
import pytest

from mothray.ops.pca import pca_fit, pca_transform


def _emb_table(n=400, d=16, seed=5):
    rng = np.random.default_rng(seed)
    # anisotropic cloud: distinct eigenvalues so axes are unambiguous
    scales = np.linspace(4.0, 0.2, d)
    m = rng.normal(size=(n, d)) * scales
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(m.astype(np.float32)), pa.list_(pa.float32())),
        }
    ), m.astype(np.float32).astype(np.float64)


def test_pca_fit_matches_numpy(ray_session):
    """Eigenvalues and (sign-fixed) eigenvectors match a single-node
    numpy eigendecomposition of the exact covariance."""
    import ray.data

    tbl, m = _emb_table()
    model = pca_fit(ray.data.from_arrow(tbl).repartition(6), k=5)
    mean = m.mean(axis=0)
    cov = (m - mean).T @ (m - mean) / len(m)
    ev, evec = np.linalg.eigh(cov)
    order = np.argsort(ev)[::-1][:5]
    np.testing.assert_allclose(model["explained_variance"], ev[order], rtol=1e-9)
    comps = evec[:, order].T
    flip = np.sign(comps[np.arange(5), np.argmax(np.abs(comps), axis=1)])
    np.testing.assert_allclose(model["components"], comps * flip[:, None], atol=1e-9)
    np.testing.assert_allclose(model["mean"], mean, rtol=1e-12)


def test_pca_partition_invariant(ray_session):
    import ray.data

    tbl, _ = _emb_table()
    a = pca_fit(ray.data.from_arrow(tbl).repartition(2), k=4)
    b = pca_fit(ray.data.from_arrow(tbl).repartition(9), k=4)
    np.testing.assert_allclose(a["components"], b["components"], atol=1e-10)
    np.testing.assert_allclose(a["explained_variance"], b["explained_variance"], rtol=1e-10)


def test_pca_transform_projects(ray_session):
    """Projected coordinates equal (x - mean) @ C^T and their per-dim
    variance equals the eigenvalues (the definition of PCA)."""
    import ray.data

    tbl, m = _emb_table()
    model = pca_fit(ray.data.from_arrow(tbl), k=4)
    rows = pca_transform(ray.data.from_arrow(tbl), model).take_all()
    got = np.array([r["pca"] for r in sorted(rows, key=lambda r: r["vec_id"])])
    exp = (m - model["mean"]) @ model["components"].T
    np.testing.assert_allclose(got, exp, atol=1e-9)
    np.testing.assert_allclose(got.var(axis=0), model["explained_variance"], rtol=1e-9)


def test_pca_empty_raises(ray_session):
    import ray.data

    tbl, _ = _emb_table(n=4)
    with pytest.raises(ValueError):
        pca_fit(ray.data.from_arrow(tbl).filter(lambda r: False), k=2)


def test_standardize_matches_sql(ray_session):
    """Grouped z-scores value-match the SQL window form, including
    null inputs and a zero-variance group (both -> null)."""
    import duckdb
    import ray.data

    from mothray.ops.moments import standardize

    tbl = pa.table(
        {
            "g": pa.array(["a", "a", "a", "b", "b", "c", "c"], pa.string()),
            "x": pa.array([1.0, 2.0, None, 10.0, 20.0, 7.0, 7.0], pa.float64()),
        }
    )
    out = standardize(ray.data.from_arrow(tbl).repartition(3), ["x"], group_col="g").take_all()
    key = lambda t: tuple(str(v) for v in t)
    got = sorted(((r["g"], r["x"], r["x_z"]) for r in out), key=key)
    con = duckdb.connect()
    con.register("t", tbl)
    exp = sorted(
        (
            tuple(r)
            for r in con.execute(
                "SELECT g, x, ROUND((x - AVG(x) OVER (PARTITION BY g))"
                " / NULLIF(STDDEV_POP(x) OVER (PARTITION BY g), 0), 6) FROM t"
            ).fetchall()
        ),
        key=key,
    )
    assert [key(t) for t in got] == [key(t) for t in exp]
    # zero-variance group 'c' and the null x both produced null z
    assert [z for g, x, z in got if g == "c"] == [None, None]


def test_standardize_global_no_group(ray_session):
    import duckdb
    import ray.data

    from mothray.ops.moments import standardize

    tbl = pa.table({"x": pa.array([3.0, 5.0, 9.0, 13.0], pa.float64())})
    out = standardize(ray.data.from_arrow(tbl).repartition(2), ["x"]).take_all()
    got = sorted(r["x_z"] for r in out)
    con = duckdb.connect()
    con.register("t", tbl)
    exp = sorted(
        r[0]
        for r in con.execute(
            "SELECT ROUND((x - AVG(x) OVER ()) / STDDEV_POP(x) OVER (), 6) FROM t"
        ).fetchall()
    )
    assert got == exp


def test_standardize_null_group(ray_session):
    """A null group key is a real SQL partition: its rows standardize
    against the null-group stats instead of crashing np.unique."""
    import duckdb
    import ray.data

    from mothray.ops.moments import standardize

    tbl = pa.table(
        {
            "g": pa.array(["a", "a", None, None, None], pa.string()),
            "x": pa.array([1.0, 3.0, 10.0, 20.0, 30.0], pa.float64()),
        }
    )
    out = standardize(ray.data.from_arrow(tbl).repartition(2), ["x"], group_col="g").take_all()
    key = lambda t: tuple(str(v) for v in t)
    got = sorted(((r["g"], r["x"], r["x_z"]) for r in out), key=key)
    con = duckdb.connect()
    con.register("t", tbl)
    exp = sorted(
        (
            tuple(r)
            for r in con.execute(
                "SELECT g, x, ROUND((x - AVG(x) OVER (PARTITION BY g))"
                " / NULLIF(STDDEV_POP(x) OVER (PARTITION BY g), 0), 6) FROM t"
            ).fetchall()
        ),
        key=key,
    )
    assert [key(t) for t in got] == [key(t) for t in exp]


def test_winsorize_matches_sql(ray_session):
    """Clipping at exact quantile_disc cut points matches the SQL
    LEAST/GREATEST form; nulls stay null; int columns stay int."""
    import duckdb
    import ray.data

    from mothray.ops.sketch import winsorize

    rng = np.random.default_rng(3)
    tbl = pa.table(
        {
            "x": pa.array(
                [None if i % 13 == 0 else int(v) for i, v in enumerate(rng.integers(0, 500, 400))],
                pa.int64(),
            )
        }
    )
    out = winsorize(ray.data.from_arrow(tbl).repartition(5), ["x"], 0.1, 0.9).take_all()
    got = sorted((str(r["x"]), str(r["x_w"])) for r in out)
    assert out[0]["x_w"] is None or isinstance(out[0]["x_w"], int)
    con = duckdb.connect()
    con.register("t", tbl)
    exp = sorted(
        (str(a), str(b))
        for a, b in con.execute(
            "SELECT x, CASE WHEN x IS NULL THEN NULL ELSE"
            " LEAST(GREATEST(x, (SELECT quantile_disc(x, 0.1) FROM t)),"
            " (SELECT quantile_disc(x, 0.9) FROM t)) END FROM t"
        ).fetchall()
    )
    assert got == exp


def test_winsorize_bad_bounds():
    import pytest as _pytest

    from mothray.ops.sketch import winsorize

    with _pytest.raises(ValueError):
        winsorize(None, ["x"], 0.9, 0.1)


def test_standardize_date_and_decimal_groups(ray_session):
    """Grouping by date32 or decimal columns works (the shuffle key is
    a string surrogate; the typed key rides as payload)."""
    import datetime
    from decimal import Decimal

    import ray.data

    from mothray.ops.moments import standardize

    d1, d2 = datetime.date(2024, 1, 1), datetime.date(2024, 6, 2)
    tbl = pa.table(
        {
            "g": pa.array([d1, d1, d2, d2], pa.date32()),
            "p": pa.array([Decimal("1.50"), Decimal("1.50"), Decimal("9.25"), None], pa.decimal128(15, 2)),
            "x": pa.array([1.0, 3.0, 10.0, 20.0], pa.float64()),
        }
    )
    out = standardize(ray.data.from_arrow(tbl).repartition(2), ["x"], group_col="g").take_all()
    by_date = {}
    for r in out:
        by_date.setdefault(r["g"], []).append(r["x_z"])
    assert sorted(by_date[d1]) == [-1.0, 1.0]
    assert sorted(by_date[d2]) == [-1.0, 1.0]
    out2 = standardize(ray.data.from_arrow(tbl).repartition(2), ["x"], group_col="p").take_all()
    zs = {r["p"]: r["x_z"] for r in out2 if r["p"] in (Decimal("9.25"), None)}
    assert zs[Decimal("9.25")] is None  # single-member group: std 0 -> null
    assert zs[None] is None
