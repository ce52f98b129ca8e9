"""Join operator tests: broadcast and partitioned hash join vs DuckDB."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _orders_customers_expect():
    return duckdb.sql(
        "SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, c.c_name, c.c_mktsegment"
        " FROM read_parquet('/root/testdata/sf0.001/orders.parquet') o"
        " JOIN read_parquet('/root/testdata/sf0.001/customer.parquet') c"
        " ON o.o_custkey = c.c_custkey ORDER BY o_orderkey"
    ).df()


def test_broadcast_join(ray_session):
    import ray.data

    from mothray.ops import join

    orders = ray.data.read_parquet(
        "/root/testdata/sf0.001/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    cust = pq.read_table(
        "/root/testdata/sf0.001/customer.parquet",
        columns=["c_custkey", "c_name", "c_mktsegment"],
    ).rename_columns(["o_custkey", "c_name", "c_mktsegment"])
    out = (
        join.broadcast_join(orders, cust, on="o_custkey")
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    expect = _orders_customers_expect()
    assert len(out) == len(expect)
    assert out["o_orderkey"].tolist() == expect["o_orderkey"].tolist()
    assert out["c_name"].tolist() == expect["c_name"].tolist()


def test_partitioned_join(ray_session):
    import ray.data

    from mothray.ops import join

    orders = ray.data.read_parquet(
        "/root/testdata/sf0.001/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    )
    cust = ray.data.read_parquet(
        "/root/testdata/sf0.001/customer.parquet",
        columns=["c_custkey", "c_name", "c_mktsegment"],
    ).map_batches(
        lambda t: t.rename_columns(["o_custkey", "c_name", "c_mktsegment"]),
        batch_format="pyarrow",
    )
    out = (
        join.partitioned_join(orders, cust, on="o_custkey", num_buckets=8)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    expect = _orders_customers_expect()
    assert len(out) == len(expect)
    assert out["o_orderkey"].tolist() == expect["o_orderkey"].tolist()
    assert out["o_totalprice"].tolist() == expect["o_totalprice"].tolist()
    assert str(out["o_orderkey"].dtype) == "int64"  # no float corruption through the union
