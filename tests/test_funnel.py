"""Funnel analysis vs the SQL min-timestamp join chain."""

import duckdb
import pyarrow as pa
import pytest

from mothray.ops import funnel


def test_funnel_semantics_synthetic(ray_session):
    import ray.data

    # u1 completes a-b-c; u2 stops after a (its b precedes a);
    # u3 has a tie (b at the same ts as a never counts); u4 no a.
    tbl = pa.table(
        {
            "user_id": [1, 1, 1, 2, 2, 3, 3, 4],
            "ts": pa.array([10, 20, 30, 20, 10, 10, 10, 5], pa.int64()),
            "event_type": ["a", "b", "c", "a", "b", "a", "b", "b"],
        }
    )
    out = (
        funnel.funnel(ray.data.from_arrow(tbl).repartition(3), ["a", "b", "c"])
        .to_pandas()
    )
    assert out["step"].tolist() == [1, 2, 3]
    assert out["n_users"].tolist() == [3, 1, 1]

    with pytest.raises(ValueError):
        funnel.funnel(ray.data.from_arrow(tbl), [])


def test_funnel_events_oracle(ray_session):
    import ray.data

    src = "/root/testdata/sf0.001/events.parquet"
    ds = ray.data.read_parquet(src).filter(expr="value > 100.0")
    got = funnel.funnel(ds, ["view", "click", "purchase"]).to_pandas().astype("int64")
    exp = duckdb.sql(
        f"WITH ev AS (SELECT * FROM read_parquet('{src}') WHERE value > 100.0),"
        " s1 AS (SELECT user_id, min(ts) t FROM ev WHERE event_type='view' GROUP BY 1),"
        " s2 AS (SELECT e.user_id, min(e.ts) t FROM ev e JOIN s1 USING(user_id)"
        "        WHERE e.event_type='click' AND e.ts > s1.t GROUP BY 1),"
        " s3 AS (SELECT e.user_id, min(e.ts) t FROM ev e JOIN s2 USING(user_id)"
        "        WHERE e.event_type='purchase' AND e.ts > s2.t GROUP BY 1)"
        " SELECT 1 AS step, CAST(count(*) AS BIGINT) AS n_users FROM s1"
        " UNION ALL SELECT 2, count(*) FROM s2"
        " UNION ALL SELECT 3, count(*) FROM s3 ORDER BY step"
    ).df().astype("int64")
    assert got.equals(exp.reset_index(drop=True))
    assert (got["n_users"].diff().dropna() <= 0).all()  # monotone funnel
