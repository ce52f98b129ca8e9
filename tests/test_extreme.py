"""arg_extreme / group_mode vs DuckDB QUALIFY oracles."""

import duckdb
import pyarrow as pa

from mothray.ops import extreme


def _norm(df, keys):
    return df.sort_values(keys).reset_index(drop=True)


def test_arg_extreme_synthetic(ray_session):
    import ray.data

    tbl = pa.table(
        {
            "g": ["a", "a", "b", "b", "b"],
            "v": [1.0, 5.0, 3.0, 3.0, 2.0],
            "k": [10, 11, 22, 21, 20],
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    mx = _norm(extreme.arg_extreme(ds, "g", "v", "k").to_pandas(), ["g"])
    # b's v=3.0 tie breaks to the smaller k=21
    assert mx[["g", "k", "v"]].values.tolist() == [["a", 11, 5.0], ["b", 21, 3.0]]
    mn = _norm(extreme.arg_extreme(ds, "g", "v", "k", mode="min").to_pandas(), ["g"])
    assert mn[["g", "k", "v"]].values.tolist() == [["a", 10, 1.0], ["b", 20, 2.0]]


def test_arg_extreme_orders_oracle(ray_session):
    import ray.data

    src = "/root/testdata/sf0.001/orders.parquet"
    ds = ray.data.read_parquet(src, columns=["o_custkey", "o_totalprice", "o_orderkey"])
    got = _norm(
        extreme.arg_extreme(ds, "o_custkey", "o_totalprice", "o_orderkey").to_pandas(),
        ["o_custkey"],
    )
    exp = _norm(
        duckdb.sql(
            f"SELECT o_custkey, o_orderkey, o_totalprice"
            f" FROM read_parquet('{src}')"
            " QUALIFY row_number() OVER (PARTITION BY o_custkey"
            " ORDER BY o_totalprice DESC, o_orderkey) = 1"
        ).df(),
        ["o_custkey"],
    )
    assert got[["o_custkey", "o_orderkey", "o_totalprice"]].equals(
        exp[["o_custkey", "o_orderkey", "o_totalprice"]]
    )


def test_group_mode_oracle(ray_session):
    import ray.data

    src = "/root/testdata/sf0.001/lineitem.parquet"
    ds = ray.data.read_parquet(src, columns=["l_returnflag", "l_quantity"])
    got = _norm(
        extreme.group_mode(ds, "l_returnflag", "l_quantity", out_col="mode_qty").to_pandas(),
        ["l_returnflag"],
    )
    exp = _norm(
        duckdb.sql(
            f"WITH c AS (SELECT l_returnflag, l_quantity AS v,"
            f" CAST(count(*) AS BIGINT) AS c FROM read_parquet('{src}') GROUP BY 1, 2)"
            " SELECT l_returnflag, v AS mode_qty FROM c"
            " QUALIFY row_number() OVER (PARTITION BY l_returnflag"
            " ORDER BY c DESC, v) = 1"
        ).df(),
        ["l_returnflag"],
    )
    assert got.equals(exp)
