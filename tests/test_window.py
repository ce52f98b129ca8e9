"""Windowed aggregate tests (streaming-shaped workloads over events)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from mothray.ops import window


def test_session_windows_matches_sql(ray_session):
    import ray.data

    ds = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet")
    out = (
        window.session_windows(ds, "user_id", "ts", gap_minutes=30)
        .to_pandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    expect = duckdb.sql(
        "WITH d AS (SELECT user_id, ts,"
        " CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL"
        "      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE"
        " THEN 1 ELSE 0 END AS new_s FROM read_parquet('/root/testdata/sf0.001/events.parquet')),"
        " s AS (SELECT user_id, ts, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_id FROM d)"
        " SELECT user_id, CAST(session_id AS BIGINT) AS session_id, min(ts) AS session_start,"
        " max(ts) AS session_end, CAST(count(*) AS BIGINT) AS n_events FROM s"
        " GROUP BY user_id, session_id ORDER BY user_id, session_id"
    ).df()
    assert len(out) == len(expect)
    pd.testing.assert_frame_equal(
        out[["user_id", "session_id", "n_events"]],
        expect[["user_id", "session_id", "n_events"]],
    )
    assert (out["session_start"].to_numpy() == expect["session_start"].to_numpy()).all()


def test_tumbling_window(ray_session):
    import ray.data
    from ray.data.aggregate import Count

    ds = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet")
    out = window.tumbling_window(ds, "ts", None, "hour", [Count(alias_name="cnt")]).to_pandas()
    assert out["cnt"].sum() == ds.count()


def test_sliding_window(ray_session):
    import ray.data
    from ray.data.aggregate import Count

    ts = pa.array(
        np.arange(0, 100 * 60 * 1_000_000, 60 * 1_000_000), type=pa.int64()
    ).cast(pa.timestamp("us"))  # one event per minute for 100 min
    ds = ray.data.from_arrow(pa.table({"ts": ts}))
    out = window.sliding_window(ds, "ts", size_minutes=10, slide_minutes=5, aggs=[Count(alias_name="cnt")]).to_pandas()
    full = out[(out["cnt"] == 10)]
    assert len(full) >= 15  # interior windows each hold size/slide_rate events
    assert out["cnt"].sum() == 100 * 2  # each event in exactly size/slide windows


def test_session_windows_null_ts_and_ms_unit(ray_session):
    """Null timestamps are ignored (SQL window semantics) instead of
    crashing the int64 cast, and ms-unit columns get correct gap
    semantics (gap compared in µs after normalization)."""
    import datetime

    import pyarrow as pa
    import ray.data

    from mothray.ops import window

    t0 = datetime.datetime(2024, 1, 1)

    def ts(m):
        return t0 + datetime.timedelta(minutes=m)

    t = pa.table(
        {
            "user_id": [1, 1, 1, 1],
            "ts": pa.array([ts(0), ts(5), None, ts(60)], pa.timestamp("ms")),
        }
    )
    out = window.session_windows(
        ray.data.from_arrow(t), "user_id", "ts", gap_minutes=30
    ).take_all()
    assert len(out) == 2  # {0,5} and {60}; the null event vanished
    n_events = sorted(r["n_events"] for r in out)
    assert n_events == [1, 2]
    starts = sorted(r["session_start"] for r in out)
    assert starts == [ts(0), ts(60)]  # ms unit preserved, values correct


def test_sliding_window_ms_unit(ray_session):
    """ms-unit events produce the same windows as µs-unit events (the
    old bare int64 cast made ms windows 1000x wider)."""
    import datetime

    import pyarrow as pa
    import ray.data

    from mothray.ops import window

    t0 = datetime.datetime(2024, 1, 1)
    times = [t0 + datetime.timedelta(minutes=m) for m in (0, 10, 20, 45)]
    va = list(range(4))
    outs = {}
    for unit in ("us", "ms"):
        t = pa.table({"ts": pa.array(times, pa.timestamp(unit)), "v": va})
        rows = window.sliding_window(
            ray.data.from_arrow(t), "ts", size_minutes=30, slide_minutes=15,
            aggs=[__import__("ray").data.aggregate.Count()],
        ).take_all()
        outs[unit] = sorted((r["window_start"], r["count()"]) for r in rows)
    assert outs["us"] == outs["ms"]


def test_daily_streaks_known(ray_session):
    import datetime as dt

    import numpy as np
    import pyarrow as pa
    import ray.data

    from mothray.ops import window

    def ts(day, hour=0):
        return dt.datetime(2024, 1, day, hour)

    rows = (
        # user 1: days 1,2,3 (streak 3), gap, day 6 -> 2 islands;
        # multiple events on day 2 must not inflate anything
        [(1, ts(1)), (1, ts(2)), (1, ts(2, 13)), (1, ts(3)), (1, ts(6))]
        # user 2: single day
        + [(2, ts(10))]
        # user 3: null ts only -> no output row
        + [(3, None)]
    )
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )
    got = {
        r["user_id"]: r
        for r in window.daily_streaks(
            ray.data.from_arrow(t).repartition(3), "user_id", "ts"
        ).take_all()
    }
    assert set(got) == {1, 2}
    assert (got[1]["n_active_days"], got[1]["longest_streak"], got[1]["n_islands"]) == (4, 3, 2)
    assert (got[2]["n_active_days"], got[2]["longest_streak"], got[2]["n_islands"]) == (1, 1, 1)
