"""rolling() vs the DuckDB ROWS-frame window oracle."""

import duckdb
import pyarrow as pa

from mothray.ops import window


def _norm(df, keys):
    return df.sort_values(keys).reset_index(drop=True)


def test_rolling_synthetic(ray_session):
    import ray.data

    tbl = pa.table(
        {
            "k": [1, 1, 1, 1, 2],
            "o": [1, 2, 3, 4, 1],
            "t": [1, 2, 3, 4, 5],
            "v": [10.0, 20.0, 30.0, 40.0, 7.0],
        }
    )
    out = _norm(
        window.rolling(
            ray.data.from_arrow(tbl).repartition(2), "k", "o", "v", "t", preceding=1
        ).to_pandas(),
        ["k", "o"],
    )
    assert out["moving_sum"].tolist() == [10.0, 30.0, 50.0, 70.0, 7.0]
    assert out["moving_avg"].tolist() == [10.0, 15.0, 25.0, 35.0, 7.0]
    assert out["moving_min"].tolist() == [10.0, 10.0, 20.0, 30.0, 7.0]
    assert out["moving_max"].tolist() == [10.0, 20.0, 30.0, 40.0, 7.0]


def test_rolling_orders_oracle(ray_session):
    import ray.data

    src = "/root/testdata/sf0.001/orders.parquet"
    ds = ray.data.read_parquet(
        src, columns=["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"]
    )
    got = _norm(
        window.rolling(ds, "o_custkey", "o_orderdate", "o_totalprice", "o_orderkey").to_pandas(),
        ["o_custkey", "o_orderkey"],
    )
    exp = _norm(
        duckdb.sql(
            "SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,"
            " round(sum(o_totalprice) OVER w, 4) AS moving_sum,"
            " round(avg(o_totalprice) OVER w, 4) AS moving_avg,"
            " min(o_totalprice) OVER w AS moving_min,"
            " max(o_totalprice) OVER w AS moving_max"
            f" FROM read_parquet('{src}') WINDOW w AS (PARTITION BY o_custkey"
            " ORDER BY o_orderdate, o_orderkey"
            " ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"
        ).df(),
        ["o_custkey", "o_orderkey"],
    )
    assert got[exp.columns.tolist()].equals(exp)
