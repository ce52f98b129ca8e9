"""Null group keys are real SQL GROUP BY partitions.

Ray's sort-based groupby cannot order nullable key blocks, so every
grouped op shuffles on null-safe surrogate keys (ops/nullkeys.py).
These tests pin that each family (a) does not crash and (b) gives the
null group the same answer SQL does.
"""

import numpy as np
import pyarrow as pa

NULLG = pa.table(
    {
        "g": pa.array(["a", None, "a", "b", None, None], pa.string()),
        "x": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),
        "k": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
    }
)


def _ds(ray_session):
    import ray.data

    return ray.data.from_arrow(NULLG).repartition(3)


def _sql(q):
    import duckdb

    con = duckdb.connect()
    con.register("t", NULLG)
    return sorted((tuple(str(v) for v in r) for r in con.execute(q).fetchall()))


def _rows(rows, *cols):
    return sorted(tuple(str(r[c]) for c in cols) for r in rows)


def test_group_variance_null_group(ray_session):
    from mothray.ops import moments

    got = _rows(moments.group_variance(_ds(ray_session), "x", "g").take_all(), "g", "n", "var_samp")
    exp = _sql("SELECT g, COUNT(x), ROUND(var_samp(x), 6) FROM t GROUP BY g")
    assert got == exp


def test_group_mode_and_argmax_null_group(ray_session):
    from mothray.ops import extreme

    ds = _ds(ray_session)
    got = _rows(extreme.group_mode(ds, "g", "k").take_all(), "g", "mode_value")
    exp = _sql("SELECT g, MIN(k) FROM t GROUP BY g")  # all counts 1 -> smallest value
    assert got == exp
    got = _rows(extreme.arg_extreme(ds, "g", "x", "k").take_all(), "g", "x")
    exp = _sql("SELECT g, MAX(x) FROM t GROUP BY g")  # arg_extreme defaults to argmax
    assert got == exp


def test_rollup_null_group(ray_session):
    from mothray.ops import groupsets

    got = _rows(
        groupsets.rollup(_ds(ray_session), ["g"], {"s": ("x", "sum")}).take_all(),
        "g",
        "s",
    )
    exp = _sql("SELECT g, SUM(x) FROM t GROUP BY ROLLUP (g)")
    # rollup emits a grouping_id column too; compare the (g, s) pairs
    assert sorted(got) == sorted(exp)


def test_grouped_quantiles_and_count_distinct_null_group(ray_session):
    from mothray.ops import sketch

    ds = _ds(ray_session)
    got = _rows(
        sketch.grouped_quantiles(ds, "x", "g", [0.5]).take_all(), "g", "value"
    )
    exp = _sql("SELECT g, quantile_disc(x, 0.5) FROM t GROUP BY g")
    assert got == exp
    got = _rows(sketch.count_distinct(ds, "x", "g").take_all(), "g", "distinct_x")
    exp = _sql("SELECT g, COUNT(DISTINCT x) FROM t GROUP BY g")
    assert got == exp


def test_top_k_and_string_agg_null_group(ray_session):
    from mothray.ops import groupsets, sample

    ds = _ds(ray_session)
    got = _rows(sample.top_k_per_group(ds, "g", "x", 1).take_all(), "g", "x")
    exp = _sql("SELECT g, MIN(x) FROM t GROUP BY g")
    assert got == exp
    got = _rows(groupsets.string_agg(ds, "g", "k", "k").take_all(), "g", "agg")
    exp = _sql("SELECT g, string_agg(k, ',' ORDER BY k) FROM t GROUP BY g")
    assert got == exp


def test_setops_null_rows(ray_session):
    import ray.data

    from mothray.ops import setops

    left = ray.data.from_arrow(pa.table({"g": pa.array(["a", None, None, "b"])}))
    right = ray.data.from_arrow(pa.table({"g": pa.array([None, "b", "c"])}))
    got = _rows(setops.distinct(left).take_all(), "g")
    assert got == [("None",), ("a",), ("b",)]
    # SQL INTERSECT treats NULL = NULL (distinct-row semantics)
    got = _rows(setops.intersect(left, right).take_all(), "g")
    assert got == [("None",), ("b",)]
    got = _rows(setops.except_(left, right).take_all(), "g")
    assert got == [("a",)]


def test_windows_null_key(ray_session):
    import ray.data

    from mothray.ops import window as W

    ets = pa.table(
        {
            "ts": pa.array([1_000_000 * i for i in range(6)], pa.timestamp("us")),
            "u": pa.array(["a", None, "a", "b", None, "b"]),
            "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),
        }
    )
    eds = ray.data.from_arrow(ets).repartition(2)
    sess = W.session_windows(eds, "u", "ts").take_all()
    assert {r["u"] for r in sess} == {"a", "b", None}
    ll = W.lag_lead(eds, "u", "ts", "v", "ts").take_all()
    assert len(ll) == 6  # every row survives, null key included
    null_rows = sorted(r["v"] for r in ll if r["u"] is None)
    assert null_rows == [2.0, 5.0]


def test_null_safe_group_aggregate_recovers_keys(ray_session):
    import ray.data
    from ray.data.aggregate import Sum

    from mothray.ops.nullkeys import null_safe_group_aggregate

    ds = ray.data.from_arrow(NULLG).repartition(2)
    rows = null_safe_group_aggregate(ds, ["g"], [Sum("x", alias_name="s")]).take_all()
    got = sorted((str(r["g"]), r["s"]) for r in rows)
    assert got == [("None", 13.0), ("a", 4.0), ("b", 4.0)]
