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


def test_ewma_trailing_known_values(ray_session):
    """3 events for one key, alpha=0.5: weights 1, .5, .25 on the
    most-recent-first values -> (3 + 0.5*2 + 0.25*1)/1.75 = 2.428571."""
    import ray.data

    t = pa.table(
        {
            "k": ["u", "u", "u", "v"],
            "ts": [1, 2, 3, 9],
            "v": [1.0, 2.0, 3.0, 7.5],
            "id": [10, 11, 12, 13],
        }
    )
    rows = {
        r["k"]: r
        for r in features.ewma_trailing(
            ray.data.from_arrow(t), "k", "ts", "v", "id", alpha=0.5, window=20
        ).take_all()
    }
    assert rows["u"]["n_used"] == 3
    assert rows["u"]["ewma"] == round((3.0 + 0.5 * 2.0 + 0.25 * 1.0) / 1.75, 6)
    assert rows["v"]["ewma"] == 7.5


def test_ewma_trailing_window_and_nulls(ray_session):
    """Values beyond the window are ignored; null values drop before
    ranking (the next older value takes their weight slot)."""
    import ray.data

    t = pa.table(
        {
            "k": ["u"] * 4,
            "ts": [1, 2, 3, 4],
            "v": [100.0, 1.0, None, 2.0],
            "id": [1, 2, 3, 4],
        }
    )
    rows = features.ewma_trailing(
        ray.data.from_arrow(t), "k", "ts", "v", "id", alpha=0.5, window=2
    ).take_all()
    # survivors by recency: v=2.0 (ts=4), v=1.0 (ts=2); 100.0 beyond window
    assert rows[0]["n_used"] == 2
    assert rows[0]["ewma"] == round((2.0 + 0.5 * 1.0) / 1.5, 6)


def test_ewma_trailing_matches_duckdb(ray_session):
    import ray.data

    src = "/root/testdata/sf0.001/events.parquet"
    ds = ray.data.read_parquet(src, columns=["user_id", "ts", "value", "event_id"])
    got = (
        features.ewma_trailing(ds, "user_id", "ts", "value", "event_id", 0.3, 20)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"WITH r AS (SELECT user_id, value, row_number() OVER"
        f" (PARTITION BY user_id ORDER BY ts DESC, event_id ASC) AS rk"
        f" FROM read_parquet('{src}') WHERE value IS NOT NULL)"
        f" SELECT user_id, CAST(count(*) AS BIGINT) AS n_used,"
        f" round(sum(value * power(0.7, rk - 1)) / sum(power(0.7, rk - 1)), 6) AS ewma"
        f" FROM r WHERE rk <= 20 GROUP BY user_id ORDER BY user_id"
    ).df()
    assert got.equals(exp)


def test_date_features_matches_duckdb(ray_session):
    import ray.data

    src = "/root/testdata/sf0.001/orders.parquet"
    got = (
        features.date_features(ray.data.read_parquet(src), "o_orderdate")
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"SELECT *, CAST(isodow(o_orderdate) AS BIGINT) AS o_orderdate_isodow,"
        f" CAST(week(o_orderdate) AS BIGINT) AS o_orderdate_week,"
        f" CAST(month(o_orderdate) AS BIGINT) AS o_orderdate_month,"
        f" CAST(quarter(o_orderdate) AS BIGINT) AS o_orderdate_quarter,"
        f" CAST(year(o_orderdate) AS BIGINT) AS o_orderdate_year,"
        f" isodow(o_orderdate) >= 6 AS o_orderdate_is_weekend"
        f" FROM read_parquet('{src}') ORDER BY o_orderkey"
    ).df()
    assert got[sorted(got.columns)].equals(exp[sorted(exp.columns)])


def test_date_features_null_dates(ray_session):
    import ray.data

    t = pa.table({"d": pa.array([None], pa.timestamp("us"))})
    row = features.date_features(ray.data.from_arrow(t), "d").take_all()[0]
    assert row["d_isodow"] is None and row["d_is_weekend"] is None


def test_impute_strategies(ray_session):
    import ray.data

    t = pa.table(
        {
            "g": ["a", "a", "a", "b", "b", "c"],
            "v": [1.0, 3.0, None, 10.0, None, None],
        }
    )
    # global median: values [1,3,10] -> rank ceil(3/2)=2 -> 3.0
    rows = features.impute(ray.data.from_arrow(t), ["v"], "median").take_all()
    assert [r["v"] for r in rows if r["v"] == 3.0].count(3.0) >= 3
    # grouped mean: a -> 2.0; b -> 10.0; c (no data) -> global mean 14/3
    rows = {
        i: r
        for i, r in enumerate(
            features.impute(
                ray.data.from_arrow(t), ["v"], "mean", group_col="g", round_digits=6
            ).take_all()
        )
    }
    by_g = {}
    for r in rows.values():
        by_g.setdefault(r["g"], []).append(r["v"])
    assert sorted(by_g["a"]) == [1.0, 2.0, 3.0]
    assert sorted(by_g["b"]) == [10.0, 10.0]
    assert by_g["c"] == [round(14.0 / 3.0, 6)]


def test_impute_mode_deterministic_ties(ray_session):
    import ray.data

    t = pa.table({"v": ["b", "b", "a", "a", None]})
    rows = features.impute(ray.data.from_arrow(t), ["v"], "mode").take_all()
    assert [r["v"] for r in rows].count("a") == 3  # tie -> smallest value


def test_bin_numeric_width_and_quantile(ray_session):
    import ray.data

    t = pa.table({"x": [0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 10.0, None]})
    ds = ray.data.from_arrow(t)
    w = {r["x"]: r["x__bin"] for r in features.bin_numeric(ds, "x", bins=5).take_all()}
    assert w[0.0] == 1 and w[10.0] == 5 and w[None] is None
    assert w[1.0] == 1 and w[2.0] == 2 and w[4.0] == 3
    q = {
        r["x"]: r["qb"]
        for r in features.bin_numeric(
            ray.data.from_arrow(t), "x", bins=2, method="quantile", out_col="qb"
        ).take_all()
    }
    # median cut of 10 non-null values (duck rank ceil(5)=5) -> 4.0;
    # x equal to a cut belongs to the LOWER bin (bin = 1 + #cuts < x)
    assert q[None] is None
    assert q[3.0] == 1 and q[4.0] == 1 and q[5.0] == 2 and q[10.0] == 2


def test_bin_numeric_constant_column(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({"x": [7.0, 7.0]}))
    rows = features.bin_numeric(ds, "x", bins=4).take_all()
    assert [r["x__bin"] for r in rows] == [1, 1]


def test_info_gain_split_recovers_planted_threshold(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mothray.ops import features

    rng = np.random.default_rng(91)
    n = 4000
    x = np.round(rng.uniform(0, 100, n), 2)
    # class is (mostly) determined by x <= 40
    c = np.where(x <= 40.0, "lo", "hi").astype(object)
    flip = rng.random(n) < 0.05
    c[flip] = np.where(c[flip] == "lo", "hi", "lo")
    t = pa.table({"x": x, "c": pa.array(list(c), pa.string())})
    out = features.info_gain_split(
        ray.data.from_arrow(t).repartition(4), "x", "c"
    ).to_pylist()[0]
    assert abs(out["threshold"] - 40.0) < 1.0
    assert out["n_left"] + out["n_right"] == n
    assert out["gain"] > 0.4  # near-deterministic split -> large gain


def test_info_gain_split_uninformative_feature(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mothray.ops import features

    rng = np.random.default_rng(92)
    t = pa.table(
        {
            "x": np.round(rng.uniform(0, 10, 2000), 1),
            "c": pa.array(list(rng.choice(["a", "b"], 2000)), pa.string()),
        }
    )
    out = features.info_gain_split(ray.data.from_arrow(t), "x", "c").to_pylist()[0]
    assert out["gain"] < 0.02  # no structure -> tiny gain


def test_info_gain_split_single_value(ray_session):
    import pyarrow as pa
    import ray.data

    from mothray.ops import features

    t = pa.table({"x": [5.0] * 10, "c": ["a"] * 5 + ["b"] * 5})
    out = features.info_gain_split(ray.data.from_arrow(t), "x", "c").to_pylist()[0]
    assert out["threshold"] is None and out["gain"] is None
