"""target_encode / one_hot vs DuckDB (smoothed mean formula mirrored;
indicator columns as CASE expressions)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from mothray.ops import features


def _tbl():
    rng = np.random.default_rng(7)
    cats = rng.choice(["a", "b", "c", "d"], 800).tolist()
    cats[3] = None
    y = np.round(rng.uniform(0, 100, 800), 2)
    yl = [None if i % 61 == 0 else float(v) for i, v in enumerate(y)]
    return pa.table({"cat": pa.array(cats, pa.string()), "y": pa.array(yl)})


def test_target_encode_matches_duckdb(ray_session):
    import ray.data

    t = _tbl()
    got = (
        features.target_encode(ray.data.from_arrow(t).repartition(3), "cat", "y", m=10.0)
        .to_pandas()
    )
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(
        """
        WITH pr AS (SELECT SUM(y) / COUNT(y) AS prior FROM t),
         g AS (SELECT cat, SUM(y) AS s, COUNT(y) AS c FROM t
               WHERE cat IS NOT NULL AND y IS NOT NULL GROUP BY cat)
        SELECT t.cat, t.y,
          coalesce((g.s + pr.prior * 10.0) / (g.c + 10.0), pr.prior) AS enc
        FROM t CROSS JOIN pr LEFT JOIN g ON g.cat = t.cat
        """
    ).df()
    def key(cat, y):
        return (cat, -1.0 if y != y else round(float(y), 4))

    got_m = dict(
        zip(
            (key(c, y) for c, y in zip(got["cat"].where(got["cat"].notna(), "~"), got["y"])),
            got["cat__te"],
        )
    )
    for cat, y, enc in zip(exp["cat"].where(exp["cat"].notna(), "~"), exp["y"], exp["enc"]):
        assert got_m[key(cat, y)] == pytest.approx(enc, abs=1e-9), (cat, y)


def test_target_encode_unseen_and_null_get_prior(ray_session):
    import ray.data

    t = pa.table({"cat": pa.array(["a", "a", None], pa.string()),
                  "y": pa.array([10.0, 20.0, 99.0])})
    got = features.target_encode(ray.data.from_arrow(t), "cat", "y", m=0.0).to_pandas()
    prior = (10 + 20 + 99) / 3
    by_cat = dict(zip(got["cat"].where(got["cat"].notna(), "~"), got["cat__te"]))
    assert by_cat["a"] == pytest.approx(15.0)
    assert by_cat["~"] == pytest.approx(prior)


def test_one_hot(ray_session):
    import ray.data

    t = pa.table({"id": pa.array([1, 2, 3, 4], pa.int64()),
                  "cat": pa.array(["x", "y", None, "z"], pa.string())})
    got = (
        features.one_hot(ray.data.from_arrow(t).repartition(2), "cat",
                         categories=["x", "y"], drop_source=True)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert "cat" not in got.columns
    assert got["cat__x"].tolist() == [1, 0, 0, 0]
    assert got["cat__y"].tolist() == [0, 1, 0, 0]
    # derived categories: sorted distinct, nulls excluded
    got2 = features.one_hot(ray.data.from_arrow(t), "cat").to_pandas().sort_values("id")
    assert [c for c in got2.columns if c.startswith("cat__")] == [
        "cat__x", "cat__y", "cat__z"
    ]
    with pytest.raises(ValueError, match="max_categories"):
        features.one_hot(ray.data.from_arrow(t), "id", max_categories=2).materialize()
