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


def test_numeric_null_group_keys(ray_session):
    """Nullable NUMERIC group keys (the dtype real TPC-H-style keys
    have): numpy turns them into NaN, and NaN != NaN must not split
    the null group row-by-row."""
    import duckdb
    import ray.data

    tbl = pa.table(
        {
            "g": pa.array([1, None, None, None, 2, 1], pa.int64()),
            "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    from mothray.ops import moments, sample

    got = _rows(sample.top_k_per_group(ds, "g", "v", 1).take_all(), "g", "v")
    con = duckdb.connect()
    con.register("t", tbl)
    exp = sorted(
        tuple(str(v) for v in r)
        for r in con.execute("SELECT g, MIN(v) FROM t GROUP BY g").fetchall()
    )
    assert got == exp  # exactly ONE row per group, null group included
    got = _rows(moments.group_variance(ds, "v", "g").take_all(), "g", "n")
    exp = sorted(
        tuple(str(v) for v in r)
        for r in con.execute("SELECT g, COUNT(v) FROM t GROUP BY g").fetchall()
    )
    assert got == exp


def test_float_group_keys_negative_zero(ray_session):
    """-0.0 and 0.0 are ONE group key (SQL semantics); the string
    surrogate normalizes before casting."""
    import ray.data

    from mothray.ops import setops

    tbl = pa.table({"x": pa.array([0.0, -0.0, 1.0])})
    got = setops.distinct(ray.data.from_arrow(tbl)).take_all()
    assert len(got) == 2


def test_binary_keys_still_groupable(ray_session):
    """Binary key columns with non-UTF8 payloads group on raw bytes
    (the surrogate must not demand a string cast)."""
    import ray.data

    from mothray.ops import setops

    tbl = pa.table({"b": pa.array([b"\xff\xfe", b"\xff\xfe", b"ok", None], pa.binary())})
    got = setops.distinct(ray.data.from_arrow(tbl).repartition(2)).take_all()
    assert len(got) == 3  # \xff\xfe, ok, NULL


def test_group_variance_all_null_value_group(ray_session):
    """A group whose values are ALL null still exists in SQL GROUP BY:
    (g, 0, NULL, NULL, NULL), not a dropped row."""
    import duckdb
    import ray.data

    from mothray.ops import moments

    tbl = pa.table(
        {
            "g": pa.array(["a", "a", "b", "b", None], pa.string()),
            "x": pa.array([1.0, 2.0, None, None, 5.0]),
        }
    )
    got = _rows(
        moments.group_variance(ray.data.from_arrow(tbl).repartition(2), "x", "g").take_all(),
        "g",
        "n",
        "var_samp",
    )
    con = duckdb.connect()
    con.register("t", tbl)
    exp = sorted(
        tuple(str(v) for v in r)
        for r in con.execute("SELECT g, COUNT(x), ROUND(var_samp(x), 6) FROM t GROUP BY g").fetchall()
    )
    assert got == exp  # includes ('b', 0, None)


def test_pivot_null_pivot_value(ray_session):
    """A NULL pivot value becomes the 'NULL' column instead of an
    unsortable NaN label."""
    import ray.data

    from mothray.ops import groupsets

    tbl = pa.table(
        {
            "i": pa.array([1, 1, 2], pa.int64()),
            "p": pa.array(["x", None, "x"], pa.string()),
            "v": pa.array([10.0, 20.0, 30.0]),
        }
    )
    rows = groupsets.pivot(ray.data.from_arrow(tbl), "i", "p", "v").take_all()
    by_i = {r["i"]: r for r in rows}
    assert by_i[1]["x"] == 10.0 and by_i[1]["NULL"] == 20.0
    assert by_i[2]["x"] == 30.0 and by_i[2]["NULL"] is None


def test_cohort_null_user_ids(ray_session):
    """Null user ids do not crash retention (they form one pseudo-user
    group, the SQL GROUP BY reading)."""
    import ray.data

    from mothray.ops import cohort

    ets = pa.table(
        {
            "user_id": pa.array([1, None, 2, None], pa.int64()),
            "ts": pa.array([1_000_000 * i for i in range(4)], pa.timestamp("us")),
        }
    )
    rows = cohort.retention(ray.data.from_arrow(ets).repartition(2), "user_id", "ts").take_all()
    assert sum(r["n_users"] for r in rows) >= 3  # users 1, 2, and the null pseudo-user


def test_asof_and_range_join_null_keys(ray_session):
    """Null join keys never match (SQL semantics): ASOF LEFT keeps the
    null-key left row unmatched; the range join emits no null pairs —
    and neither crashes the shuffle."""
    import duckdb
    import ray.data

    from mothray.ops import join as J

    left = pa.table(
        {
            "u": pa.array(["a", None, "b"]),
            "t": pa.array([5_000_000, 6_000_000, 7_000_000], pa.timestamp("us")),
            "v": pa.array([1.0, 2.0, 3.0]),
        }
    )
    right = pa.table(
        {
            "u": pa.array(["a", None]),
            "t": pa.array([4_000_000, 5_000_000], pa.timestamp("us")),
            "p": pa.array([10.0, 20.0]),
        }
    )
    l = ray.data.from_arrow(left).repartition(2)
    r = ray.data.from_arrow(right)
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    got = sorted((str(x["u"]), x["v"], x["p"]) for x in J.asof_join(l, r, by="u", on="t").take_all())
    exp = sorted(
        (str(u), v, p)
        for u, v, p in con.execute(
            "SELECT l.u, l.v, r.p FROM l ASOF LEFT JOIN r ON l.u = r.u AND r.t <= l.t"
        ).fetchall()
    )
    assert got == exp
    got = sorted(
        (str(x["u"]), x["v"], x["p"])
        for x in J.range_join(l, r, by="u", on="t", lo_offset_us=-10_000_000, hi_offset_us=0).take_all()
    )
    exp = sorted(
        (str(u), v, p)
        for u, v, p in con.execute(
            "SELECT l.u, l.v, r.p FROM l JOIN r ON l.u = r.u"
            " AND r.t BETWEEN l.t - INTERVAL 10 SECOND AND l.t"
        ).fetchall()
    )
    assert got == exp
