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


def test_frequent_triples_matches_brute(ray_session):
    import itertools

    import numpy as np
    import pyarrow as pa
    import ray.data

    from mothray.ops import basket

    rng = np.random.default_rng(51)
    baskets, items = [], []
    for b in range(200):
        for it in rng.choice(30, rng.integers(2, 8), replace=False):
            baskets.append(b)
            items.append(int(it))
    t = pa.table({"b": pa.array(baskets, pa.int64()), "i": pa.array(items, pa.int64())})
    got = basket.frequent_triples(
        ray.data.from_arrow(t).repartition(4), "b", "i", k=20
    ).take_all()
    # brute force
    from collections import Counter, defaultdict

    bk = defaultdict(set)
    for b, i in zip(baskets, items):
        bk[b].add(i)
    cnt = Counter()
    for s in bk.values():
        for tr in itertools.combinations(sorted(s), 3):
            cnt[tr] += 1
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [
        ((r["item_a"], r["item_b"], r["item_c"]), r["cnt"]) for r in got
    ] == want


def test_weighted_median_small(ray_session):
    import pyarrow as pa
    import ray.data

    from mothray.ops import sketch

    # weights: value 1 w=1, value 2 w=5, value 3 w=1 -> wmedian 2;
    # group b: equal weights over 1..4 -> lower median 2
    t = pa.table(
        {
            "g": ["a", "a", "a", "b", "b", "b", "b"],
            "v": [1.0, 2.0, 3.0, 1.0, 2.0, 3.0, 4.0],
            "w": [1.0, 5.0, 1.0, 2.0, 2.0, 2.0, 2.0],
        }
    )
    out = {
        r["g"]: r
        for r in sketch.weighted_median(
            ray.data.from_arrow(t).repartition(3), "v", "w", "g"
        ).take_all()
    }
    assert out["a"]["wmedian"] == 2.0 and out["a"]["n"] == 3
    assert out["b"]["wmedian"] == 2.0 and out["b"]["n"] == 4
