"""skew_join: result parity with a plain DuckDB join on heavily skewed
keys, across join types, null keys, and hot-keys-absent-from-build."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from mothray.ops import join


def _skewed():
    rng = np.random.default_rng(13)
    n = 2000
    # key 0 holds ~40% of rows, key 1 ~10%, the rest are a long tail
    u = rng.uniform(0, 1, n)
    keys = np.where(u < 0.4, 0, np.where(u < 0.5, 1, rng.integers(2, 400, n)))
    keys = keys.astype(np.int64)
    left = pa.table(
        {
            "k": pa.array([None if i % 97 == 0 else int(keys[i]) for i in range(n)], pa.int64()),
            "lv": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    right = pa.table(
        {
            "k": pa.array(np.arange(0, 300, dtype=np.int64)),
            "rv": pa.array(np.arange(0, 300, dtype=np.int64) * 10),
        }
    )
    return left, right


def _sql(left, right, how):
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    q = {
        "inner": "SELECT l.k, l.lv, r.rv FROM l JOIN r ON l.k = r.k",
        "left": "SELECT l.k, l.lv, r.rv FROM l LEFT JOIN r ON l.k = r.k",
        "left_semi": "SELECT l.k, l.lv FROM l SEMI JOIN r ON l.k = r.k",
        "left_anti": "SELECT l.k, l.lv FROM l ANTI JOIN r ON l.k = r.k",
    }[how]
    return con.execute(q).df()


def _norm(df):
    df = df[sorted(df.columns)]
    return sorted(tuple(str(v) for v in row) for row in df.itertuples(index=False))


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_skew_join_matches_plain_join(ray_session, how):
    import ray.data

    left, right = _skewed()
    got = join.skew_join(
        ray.data.from_arrow(left).repartition(4),
        ray.data.from_arrow(right).repartition(2),
        on="k", how=how, hot_threshold=0.05,
    ).to_pandas()
    exp = _sql(left, right, how)
    assert _norm(got) == _norm(exp), how


def test_skew_join_hot_key_missing_from_build(ray_session):
    import ray.data

    left = pa.table({"k": pa.array([7] * 50 + [1, 2], pa.int64()),
                     "lv": pa.array(range(52), pa.int64())})
    right = pa.table({"k": pa.array([1, 2], pa.int64()),
                      "rv": pa.array([10, 20], pa.int64())})
    got = join.skew_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on="k", how="left", hot_threshold=0.2,
    ).to_pandas()
    exp = _sql(left, right, "left")
    assert _norm(got) == _norm(exp)


def test_skew_join_no_hot_keys_path(ray_session):
    import ray.data

    left = pa.table({"k": pa.array(range(100), pa.int64()),
                     "lv": pa.array(range(100), pa.int64())})
    right = pa.table({"k": pa.array(range(0, 100, 2), pa.int64()),
                      "rv": pa.array(range(50), pa.int64())})
    got = join.skew_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on="k", how="inner", hot_threshold=0.5,
    ).to_pandas()
    exp = _sql(left, right, "inner")
    assert _norm(got) == _norm(exp)


@pytest.mark.parametrize("how", ["inner", "left", "left_semi", "left_anti"])
def test_skew_join_every_key_hot(ray_session, how):
    """All left keys hot -> the cold slice is EMPTY; Ray's shuffle join
    cannot finalize schema-less empty partitions, so the op must
    short-circuit to the broadcast path alone (regression: crashed
    with ArrowInvalid on the op's headline single-hot-sentinel case)."""
    import ray.data

    left = pa.table({"k": pa.array([0] * 60 + [5] * 40, pa.int64()),
                     "lv": pa.array(range(100), pa.int64())})
    right = pa.table({"k": pa.array([0, 7], pa.int64()),
                      "rv": pa.array([10, 70], pa.int64())})
    got = join.skew_join(
        ray.data.from_arrow(left).repartition(3), ray.data.from_arrow(right),
        on="k", how=how, hot_threshold=0.2,
    ).to_pandas()
    exp = _sql(left, right, how)
    assert _norm(got) == _norm(exp), how


def test_skew_join_cold_right_empty(ray_session):
    """Hot keys cover the entire build side: the cold RIGHT slice is
    empty while cold left rows exist — each join type must keep its
    semantics without entering the shuffle."""
    import ray.data

    left = pa.table({"k": pa.array([0] * 50 + [1, 2, 3], pa.int64()),
                     "lv": pa.array(range(53), pa.int64())})
    right = pa.table({"k": pa.array([0], pa.int64()),
                      "rv": pa.array([10], pa.int64())})
    for how in ("inner", "left", "left_semi", "left_anti"):
        got = join.skew_join(
            ray.data.from_arrow(left), ray.data.from_arrow(right),
            on="k", how=how, hot_threshold=0.2,
        ).to_pandas()
        exp = _sql(left, right, how)
        assert _norm(got) == _norm(exp), how


def test_skew_join_guards(ray_session):
    import ray.data

    left = pa.table({"k": pa.array([1], pa.int64()), "v": pa.array([1], pa.int64())})
    right = pa.table({"k": pa.array([1], pa.int64()), "v": pa.array([2], pa.int64())})
    with pytest.raises(ValueError, match="disjoint"):
        join.skew_join(ray.data.from_arrow(left), ray.data.from_arrow(right), on="k")
    with pytest.raises(ValueError, match="supports"):
        join.skew_join(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right.rename_columns(["k", "rv"])),
            on="k", how="full",
        )
