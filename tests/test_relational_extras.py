"""array_agg / explode / cross_join / quantile_cont vs DuckDB."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from mothray.ops import groupsets, join, sketch


def test_array_agg_matches_duckdb(ray_session):
    import ray.data

    t = pa.table(
        {
            "g": pa.array([1, 1, 2, None, 2, 1], pa.int64()),
            "o": pa.array([3, 1, 5, 2, 4, 2], pa.int64()),
            "v": pa.array(["c", "a", None, "x", "d", "b"], pa.string()),
        }
    )
    got = groupsets.array_agg(
        ray.data.from_arrow(t).repartition(3), "g", "v", "o"
    ).take_all()
    got = {r["g"]: list(r["agg"]) for r in got}
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(
        "SELECT g, list(v ORDER BY o, v) AS agg FROM t GROUP BY g"
    ).fetchall()
    exp = {g: list(a) for g, a in exp}
    assert got == exp


def test_explode_matches_unnest(ray_session):
    import ray.data

    t = pa.table(
        {
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "xs": pa.array([[10, None, 30], [], None, [40]], pa.list_(pa.int64())),
        }
    )
    got = (
        groupsets.explode(ray.data.from_arrow(t).repartition(2), "xs", out_col="x",
                          with_ordinal=True)
        .to_pandas()
        .sort_values(["id", "ordinal"])
        .reset_index(drop=True)
    )
    # empty and NULL lists dropped; null ELEMENT survives
    assert got["id"].tolist() == [1, 1, 1, 4]
    assert [None if v != v else int(v) for v in got["x"]] == [10, None, 30, 40]
    assert got["ordinal"].tolist() == [1, 2, 3, 1]
    with pytest.raises(Exception, match="list column"):
        groupsets.explode(ray.data.from_arrow(t), "id").materialize()


def test_cross_join(ray_session):
    import ray.data

    left = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
    right = pa.table({"b": pa.array(["x", "y"], pa.string()),
                      "c": pa.array([10, 20], pa.int64())})
    got = (
        join.cross_join(ray.data.from_arrow(left).repartition(2), right)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert len(got) == 6
    assert got["a"].tolist() == [1, 1, 2, 2, 3, 3]
    assert got["b"].tolist() == ["x", "y"] * 3
    with pytest.raises(Exception, match="duplicate column"):
        join.cross_join(
            ray.data.from_arrow(left), pa.table({"a": pa.array([1])})
        ).materialize()
    with pytest.raises(ValueError, match="max_small_rows"):
        join.cross_join(
            ray.data.from_arrow(left),
            pa.table({"z": pa.array(np.arange(11), pa.int64())}),
            max_small_rows=10,
        )


def test_quantile_cont_matches_duckdb(ray_session):
    import ray.data

    rng = np.random.default_rng(12)
    vals = np.concatenate([rng.uniform(0, 100, 500), [np.nan] * 7])
    t = pa.table({"v": pa.array(vals)})
    qs = [0.0, 0.1, 0.5, 0.75, 0.99, 1.0]
    got = sketch.quantile_cont(ray.data.from_arrow(t).repartition(4), "v", qs)
    con = duckdb.connect()
    con.register("t", t)
    for q in qs:
        (exp,) = con.execute(
            f"SELECT quantile_cont(v, {q}) FROM t WHERE NOT isnan(v)"
        ).fetchone()
        assert got[q] == pytest.approx(exp, abs=1e-9), q


def test_quantile_cont_small_and_empty(ray_session):
    import ray.data

    t = pa.table({"v": pa.array([5.0, 1.0, 3.0])})
    got = sketch.quantile_cont(ray.data.from_arrow(t), "v", [0.5, 0.25])
    assert got[0.5] == 3.0
    assert got[0.25] == 2.0  # h = 0.5 between 1 and 3
    empty = pa.table({"v": pa.array([], pa.float64())})
    assert sketch.quantile_cont(ray.data.from_arrow(empty), "v", [0.5])[0.5] is None


def test_mad_matches_duckdb(ray_session):
    import ray.data

    rng = np.random.default_rng(5)
    vals = np.round(np.concatenate([rng.normal(50, 5, 2000), rng.uniform(0, 200, 50)]), 2)
    t = pa.table({"v": pa.array([None if i % 71 == 0 else float(x) for i, x in enumerate(vals)])})
    got = sketch.mad(ray.data.from_arrow(t).repartition(3), "v")
    con = duckdb.connect()
    con.register("t", t)
    med, d = con.execute("SELECT median(v), mad(v) FROM t").fetchone()
    assert got["median"] == pytest.approx(med, abs=1e-12)
    assert got["mad"] == pytest.approx(d, abs=1e-12)
    out = sketch.robust_outliers(
        ray.data.from_arrow(t).repartition(3), "v", k=1.512345
    ).to_pandas()
    exp = con.execute(
        "WITH s AS (SELECT median(v) m, mad(v) d FROM t)"
        " SELECT v FROM t, s WHERE abs(v - m) > 1.512345 * d"
    ).df()
    assert sorted(out["v"]) == sorted(exp["v"])
    # empty input
    empty = pa.table({"v": pa.array([], pa.float64())})
    assert sketch.mad(ray.data.from_arrow(empty), "v") == {"median": None, "mad": None}


def test_pareto_front_matches_brute(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mothray.ops import extreme

    rng = np.random.default_rng(71)
    n = 1000
    x = np.round(rng.uniform(1, 100, n), 2)
    y = np.round(rng.uniform(0, 1000, n), 2)
    t = pa.table({"id": pa.array(np.arange(n), pa.int64()), "x": x, "y": y})
    got = sorted(
        r["id"]
        for r in extreme.pareto_front(
            ray.data.from_arrow(t).repartition(5), "x", "y",
            keep_cols=["id", "x", "y"],
        ).take_all()
    )
    xc = np.rint(x * 100).astype(np.int64)
    dominated = [
        i
        for i in range(n)
        if ((xc < xc[i]) & (y > y[i])).any()
    ]
    want = sorted(set(range(n)) - set(dominated))
    assert got == want
    assert 0 < len(got) < n


def test_golden_record_null_skipping(ray_session):
    import pyarrow as pa
    import ray.data

    from mothray.ops import extreme

    t = pa.table(
        {
            "k": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "o": pa.array([10, 20, 30, 5, 6], pa.int64()),
            "tb": pa.array([0, 1, 2, 3, 4], pa.int64()),
            # latest (o=30) is null -> falls back to o=20's value
            "a": pa.array([1.0, 2.0, None, None, None], pa.float64()),
            "s": pa.array(["x", None, "z", "p", None], pa.string()),
        }
    )
    out = {
        r["k"]: r
        for r in extreme.golden_record(
            ray.data.from_arrow(t).repartition(3), "k", "o", "tb", ["a", "s"]
        ).take_all()
    }
    assert out[1] == {"k": 1, "a": 2.0, "s": "z"}
    assert out[2] == {"k": 2, "a": None, "s": "p"}


def test_golden_record_tiebreak(ray_session):
    import pyarrow as pa
    import ray.data

    from mothray.ops import extreme

    # same order value: higher tiebreak wins
    t = pa.table(
        {
            "k": pa.array([1, 1], pa.int64()),
            "o": pa.array([10, 10], pa.int64()),
            "tb": pa.array([1, 2], pa.int64()),
            "a": pa.array([5.0, 7.0], pa.float64()),
        }
    )
    out = extreme.golden_record(
        ray.data.from_arrow(t), "k", "o", "tb", ["a"]
    ).take_all()
    assert out[0]["a"] == 7.0


def test_keyed_diff_classes(ray_session):
    import pyarrow as pa
    import ray.data

    from mothray.ops import setops

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                  "v": pa.array(["a", "b", "c", "d"])})
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([2, 3, 5], pa.int64()),
                  "v": pa.array(["b", "C", "e"])})
    )
    got = setops.keyed_diff(left, right, "k", ["v"]).to_pylist()[0]
    assert got == {"added": 1, "removed": 2, "changed": 1, "unchanged": 1}


def test_keyed_diff_rejects_duplicate_keys(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data

    from mothray.ops import setops

    left = ray.data.from_arrow(
        pa.table({"k": pa.array([1, 1], pa.int64()), "v": pa.array(["a", "b"])})
    )
    right = ray.data.from_arrow(
        pa.table({"k": pa.array([1], pa.int64()), "v": pa.array(["a"])})
    )
    with pytest.raises(Exception):
        setops.keyed_diff(left, right, "k", ["v"])


def test_union_evolve_aligns_and_widens(ray_session):
    import pyarrow as pa
    import ray.data

    from mothray.ops import setops

    a = ray.data.from_arrow(
        pa.table({"x": pa.array([1, 2], pa.int32()),
                  "y": pa.array(["p", "q"])})
    )
    b = ray.data.from_arrow(
        pa.table({"x": pa.array([3], pa.int64()),
                  "z": pa.array([1.5], pa.float32())})
    )
    out = setops.union_evolve([a, b])
    sch = out.schema()
    types = dict(zip(sch.names, sch.types))
    assert types["x"] == pa.int64()
    assert types["z"] == pa.float64()
    rows = sorted(out.take_all(), key=lambda r: r["x"])
    assert [r["x"] for r in rows] == [1, 2, 3]
    assert rows[0]["z"] is None and rows[2]["y"] is None
    assert rows[2]["z"] == 1.5


def test_union_evolve_type_conflict_raises(ray_session):
    import pyarrow as pa
    import pytest
    import ray.data

    from mothray.ops import setops

    a = ray.data.from_arrow(pa.table({"x": pa.array(["s"])}))
    b = ray.data.from_arrow(pa.table({"x": pa.array([1], pa.int64())}))
    with pytest.raises(TypeError):
        setops.union_evolve([a, b])
