"""Join operator tests: broadcast and partitioned hash join vs DuckDB."""

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mothray.ops import join


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


def test_partitioned_join_skewed_key(ray_session):
    """Skewed input: one key holds half the rows. The hash-shuffle join
    must stay correct (VERDICT r1 item 3 done-criterion) with
    size-derived partition counts."""
    import duckdb
    import numpy as np
    import ray.data

    n = 20000
    rng = np.random.default_rng(8)
    keys = np.where(rng.random(n) < 0.5, 7, rng.integers(0, 500, n)).astype(np.int64)
    lt = pa.table({"k": pa.array(keys), "a": pa.array(np.arange(n, dtype=np.int64))})
    rt = pa.table({"k": pa.array(np.arange(500, dtype=np.int64)), "b": [f"v{i}" for i in range(500)]})
    out = join.partitioned_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt), on="k"
    ).to_pandas()
    exp = duckdb.sql("SELECT l.k, l.a, r.b FROM lt l JOIN rt r ON l.k = r.k").df()
    assert len(out) == len(exp)
    assert out["a"].sum() == exp["a"].sum()
    assert sorted(out.columns) == sorted(exp.columns)


def test_auto_partitions_scales_with_size():
    """Partition count grows with input size instead of a constant 32
    (one task must never hold corpus/32 bytes)."""
    class FakeDs:
        def __init__(self, size):
            self._s = size

        def size_bytes(self):
            return self._s

    import ray as _ray

    ncpu = int(_ray.cluster_resources().get("CPU", 16)) if _ray.is_initialized() else 16
    cap = min(max(2 * ncpu, 2), 4096)  # ~2x cluster CPUs: Ray's join
    # aggregators deadlock when partitions far exceed CPUs (16 hang a
    # 4-cpu cluster, 8 run); a real 4N-node cluster raises the cap
    small = join._auto_partitions(FakeDs(1 << 20))
    mid = join._auto_partitions(FakeDs(4 << 30))
    huge = join._auto_partitions(FakeDs(100 << 40))  # ~100 TB
    assert small == 2
    assert mid == min((4 << 30) // (256 << 20) + 1, cap)
    assert huge == cap
    from mothray import pipeline

    assert pipeline._auto_bucket_count(FakeDs(100 << 40)) == 65536
    assert pipeline._auto_bucket_count(FakeDs(1 << 30)) == (1 << 30) // (128 << 20) + 1


def test_asof_join_name_collision_and_null_ts(ray_session):
    """A right value column sharing a left column's name rides the
    '_right' suffix (crashed on a duplicate-field schema before), and
    null timestamps stay UNMATCHED on the left / are never candidates
    on the right (DuckDB ASOF semantics)."""
    import datetime

    import pyarrow as pa
    import ray.data

    from mothray.ops import join as join_ops

    t0 = datetime.datetime(2024, 1, 1)

    def ts(m):
        return t0 + datetime.timedelta(minutes=m)

    left = pa.table(
        {
            "u": [1, 1, 1],
            "ts": pa.array([ts(5), None, ts(20)], pa.timestamp("us")),
            "score": [10.0, 20.0, 30.0],  # collides with right.score
        }
    )
    right = pa.table(
        {
            "u": [1, 1],
            "ts": pa.array([ts(1), None], pa.timestamp("us")),  # null right row: never a match
            "score": [0.5, 99.0],
        }
    )
    out = join_ops.asof_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right), by="u", on="ts"
    ).take_all()
    by_score = {r["score"]: r for r in out}
    assert by_score[10.0]["score_right"] == 0.5  # matched the ts(1) row
    assert by_score[20.0]["score_right"] is None  # null left ts: unmatched
    assert by_score[30.0]["score_right"] == 0.5  # not the null-ts 99.0 row


def test_asof_join_ms_unit_tolerance(ray_session):
    """tolerance_us applies to ms-unit columns correctly (a bare int64
    cast left values in ms, making the tolerance 1000x too strict)."""
    import datetime

    import pyarrow as pa
    import ray.data

    from mothray.ops import join as join_ops

    t0 = datetime.datetime(2024, 1, 1)
    left = pa.table(
        {"u": [1], "ts": pa.array([t0 + datetime.timedelta(seconds=30)], pa.timestamp("ms"))}
    )
    right = pa.table(
        {"u": [1], "ts": pa.array([t0], pa.timestamp("ms")), "v": [7]}
    )
    # 60s tolerance: the 30s gap must match
    out = join_ops.asof_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        by="u", on="ts", tolerance_us=60_000_000,
    ).take_all()
    assert out[0]["v"] == 7


def test_partitioned_join_sparse_small_right(ray_session):
    """An 8-row filtered dimension behind map_batches used to hit
    Ray's hash-join aggregator bug (a partition receiving zero right
    blocks builds a schema-less table; pa.Table.join dies with 'No
    match for key field'). The small-side routing broadcasts it."""
    import pyarrow.compute as pc
    import ray.data

    from mothray.ops import join as join_ops

    left = ray.data.from_arrow(
        pa.table({"k": list(range(1000)), "x": [i * 2 for i in range(1000)]})
    )
    dim = ray.data.from_arrow(
        pa.table({"k": list(range(100)), "tag": [f"t{i}" for i in range(100)]})
    ).map_batches(
        lambda t: t.filter(pc.less(t.column("k"), 8)),
        batch_format="pyarrow",
    )
    out = join_ops.partitioned_join(left, dim, on="k", num_buckets=16).take_all()
    assert len(out) == 8
    assert sorted(r["k"] for r in out) == list(range(8))
    assert all(r["tag"] == f"t{r['k']}" for r in out)


def test_partitioned_join_small_right_left_outer(ray_session):
    import ray.data

    from mothray.ops import join as join_ops

    left = ray.data.from_arrow(pa.table({"k": [1, 2, 3], "x": [10, 20, 30]}))
    right = ray.data.from_arrow(pa.table({"k": [2], "y": [99]})).map_batches(
        lambda t: t, batch_format="pyarrow"
    )
    rows = {
        r["k"]: r
        for r in join_ops.partitioned_join(left, right, on="k", how="left").take_all()
    }
    assert rows[2]["y"] == 99 and rows[1]["y"] is None and rows[3]["y"] is None


def test_partitioned_join_all_filtered_right(ray_session):
    """Right side where EVERY row filters out (schema may be lost
    entirely): inner joins yield zero rows, anti joins return left."""
    import pyarrow.compute as pc
    import ray.data

    from mothray.ops import join as join_ops

    left = ray.data.from_arrow(pa.table({"k": [1, 2], "x": [1.5, 2.5]}))
    right = ray.data.from_arrow(pa.table({"k": [5], "y": [1]})).map_batches(
        lambda t: t.filter(pc.less(t.column("k"), 0)), batch_format="pyarrow"
    )
    assert join_ops.partitioned_join(left, right, on="k").count() == 0
    anti = join_ops.partitioned_join(left, right, on="k", how="left_anti").take_all()
    assert sorted(r["k"] for r in anti) == [1, 2]
