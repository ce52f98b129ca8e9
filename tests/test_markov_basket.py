"""Markov transition matrix + market-basket pairs vs DuckDB oracles."""

import duckdb
import numpy as np
import pyarrow as pa

from mothray.ops import basket, markov


def test_transition_matrix_synthetic(ray_session):
    import ray.data

    # user 1: a -> b -> a -> a ; user 2: b -> a ; null state dropped
    tbl = pa.table(
        {
            "user_id": [1, 1, 1, 1, 1, 2, 2],
            "ts": pa.array([1, 2, 3, 3, 4, 1, 2], pa.int64()),
            "event_id": [1, 2, 3, 4, 5, 6, 7],
            "event_type": ["a", "b", None, "a", "a", "b", "a"],
        }
    )
    out = (
        markov.transition_matrix(
            ray.data.from_arrow(tbl).repartition(3), order_col="ts"
        )
        .to_pandas()
        .values.tolist()
    )
    assert out == [
        ["a", "a", 1, 0.5],
        ["a", "b", 1, 0.5],
        ["b", "a", 2, 1.0],
    ]


def test_transition_matrix_events_oracle(ray_session):
    import ray.data

    src = "/root/testdata/sf0.001/events.parquet"
    got = (
        markov.transition_matrix(ray.data.read_parquet(src))
        .to_pandas()
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        WITH s AS (SELECT user_id, ts, event_id, event_type
                   FROM read_parquet('{src}') WHERE event_type IS NOT NULL),
        p AS (SELECT lag(event_type) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) AS from_state,
              event_type AS to_state FROM s)
        SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS cnt,
               round(count(*)::DOUBLE /
                     sum(count(*)) OVER (PARTITION BY from_state), 6) AS prob_r6
        FROM p WHERE from_state IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).df()
    assert got["from_state"].tolist() == want["from_state"].tolist()
    assert got["to_state"].tolist() == want["to_state"].tolist()
    assert got["cnt"].tolist() == want["cnt"].tolist()
    assert np.allclose(got["prob_r6"], want["prob_r6"], atol=1e-12)


def test_copurchase_synthetic(ray_session):
    import ray.data

    # basket 1: {10, 20, 30}; basket 2: {10, 20, 20}; null item ignored
    tbl = pa.table(
        {
            "l_orderkey": [1, 1, 1, 2, 2, 2, 2],
            "l_partkey": [10, 20, 30, 10, 20, 20, None],
        }
    )
    out = (
        basket.copurchase_pairs(ray.data.from_arrow(tbl).repartition(3), k=10)
        .to_pandas()
        .values.tolist()
    )
    assert out == [
        [10, 20, 2],
        [10, 30, 1],
        [20, 30, 1],
    ]


def test_copurchase_lineitem_oracle(ray_session):
    import ray.data

    src = "/root/testdata/sf0.001/lineitem.parquet"
    got = (
        basket.copurchase_pairs(ray.data.read_parquet(src), k=50)
        .to_pandas()
        .values.tolist()
    )
    want = duckdb.sql(
        f"""
        WITH d AS (SELECT DISTINCT l_orderkey, l_partkey
                   FROM read_parquet('{src}'))
        SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
               CAST(count(*) AS BIGINT) AS cnt
        FROM d a JOIN d b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 ORDER BY cnt DESC, item_a, item_b LIMIT 50
        """
    ).df().values.tolist()
    assert got == want


def test_copurchase_max_basket_guard(ray_session):
    import ray.data

    tbl = pa.table(
        {"l_orderkey": [1] * 5 + [2, 2], "l_partkey": [1, 2, 3, 4, 5, 7, 8]}
    )
    out = (
        basket.copurchase_pairs(ray.data.from_arrow(tbl), k=100, max_basket=4)
        .to_pandas()
        .values.tolist()
    )
    # basket 1 (5 distinct items) exceeds max_basket and is dropped
    assert out == [[7, 8, 1]]
