"""resample (per-key time-series bucketing with gap fill) vs DuckDB:
generate_series grid + LEFT JOIN + IGNORE-NULLS last_value reproduce
the op exactly (round-6 on float aggregates, lm.py precedent)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from mothray.ops import window

EVERY_MIN = 360
EVERY_US = EVERY_MIN * 60 * 1_000_000


def _events():
    rng = np.random.default_rng(9)
    n = 400
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + rng.integers(0, 20 * 24 * 3600, n).astype("timedelta64[s]").astype(
        "timedelta64[us]"
    )
    t = pa.table(
        {
            "user_id": pa.array(
                [None if i % 37 == 0 else int(rng.integers(0, 6)) for i in range(n)],
                pa.int64(),
            ),
            "ts": pa.array(
                [None if i % 41 == 0 else v for i, v in enumerate(ts)],
                pa.timestamp("us"),
            ),
            "value": pa.array(
                [None if i % 11 == 0 else round(float(rng.uniform(0, 100)), 2) for i in range(n)]
            ),
        }
    )
    return t


def _oracle(t: pa.Table, agg_sql: str, fill: str, out: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("events", t)
    v = "last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY bkt)" if fill == "ffill" else (
        "coalesce(v, 0)" if fill == "zero" else "v"
    )
    q = f"""
    WITH b AS (
      SELECT user_id, (epoch_us(ts) // {EVERY_US}) * {EVERY_US} AS bkt, value
      FROM events WHERE ts IS NOT NULL
    ),
    agg AS (
      SELECT user_id, bkt, {agg_sql} AS v, count(*) AS n_obs
      FROM b GROUP BY user_id, bkt
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(mn, mx, {EVERY_US}::BIGINT)) AS bkt
      FROM (SELECT user_id, min(bkt) AS mn, max(bkt) AS mx FROM agg GROUP BY user_id)
    ),
    j AS (
      SELECT g.user_id, g.bkt, a.v, coalesce(a.n_obs, 0) AS n_obs
      FROM grid g LEFT JOIN agg a ON a.user_id IS NOT DISTINCT FROM g.user_id AND a.bkt = g.bkt
    )
    SELECT user_id, make_timestamp(bkt) AS bucket,
           ROUND(CAST({v} AS DOUBLE), 6) AS {out}, n_obs
    FROM j ORDER BY user_id NULLS FIRST, bucket
    """
    return con.execute(q).df()


def _norm(df: pd.DataFrame, out: str) -> list:
    df = df.sort_values(["user_id", "bucket"], na_position="first").reset_index(drop=True)
    return [
        (
            None if pd.isna(r.user_id) else int(r.user_id),
            str(r.bucket),
            None if pd.isna(getattr(r, out)) else round(float(getattr(r, out)), 6),
            int(r.n_obs),
        )
        for r in df.itertuples(index=False)
    ]


@pytest.mark.parametrize(
    "agg,agg_sql,fill",
    [
        ("sum", "SUM(value)", "ffill"),
        ("sum", "SUM(value)", "zero"),
        ("mean", "AVG(value)", "null"),
        ("min", "MIN(value)", "null"),
        ("max", "MAX(value)", "ffill"),
        ("count", "CAST(COUNT(value) AS DOUBLE)", "zero"),
    ],
)
def test_resample_matches_duckdb(ray_session, agg, agg_sql, fill):
    import ray.data

    t = _events()
    out = f"{agg}_value"
    got = window.resample(
        ray.data.from_arrow(t).repartition(3), "user_id", "ts", "value",
        EVERY_MIN, agg=agg, fill=fill,
    ).to_pandas()
    got[out] = got[out].round(6)
    exp = _oracle(t, agg_sql, fill, out)
    assert _norm(got, out) == _norm(exp, out)


def test_resample_preserves_timezone(ray_session):
    """tz-aware input -> tz-aware buckets at the same instants
    (regression: buckets came back naive, shifting on rejoin)."""
    import ray.data

    base = np.datetime64("2024-03-01T10:00:00", "us")
    t = pa.table(
        {
            "k": pa.array([1, 1], pa.int64()),
            "ts": pa.array(
                [base, base + np.timedelta64(3, "h")], pa.timestamp("us")
            ).cast(pa.timestamp("us", tz="America/New_York")),
            "v": pa.array([1.0, 2.0]),
        }
    )
    got = (
        window.resample(ray.data.from_arrow(t), "k", "ts", "v", 60, agg="sum", fill="zero")
        .to_pandas()
        .sort_values("bucket")
    )
    assert str(got["bucket"].dt.tz) == "America/New_York"
    assert len(got) == 4  # 10:00Z .. 13:00Z hourly
    assert got["sum_value"].tolist() == [1.0, 0.0, 0.0, 2.0]


def test_resample_validation():
    with pytest.raises(ValueError):
        window.resample(None, "k", "ts", "v", 5, agg="median")
    with pytest.raises(ValueError):
        window.resample(None, "k", "ts", "v", 5, fill="interpolate")


def test_resample_dense_grid_no_gaps(ray_session):
    """Every bucket between a key's first and last observation exists
    exactly once, even across empty stretches."""
    import ray.data

    t = pa.table(
        {
            "k": pa.array([1, 1, 1], pa.int64()),
            "ts": pa.array(
                np.array(
                    ["2024-01-01T00:05", "2024-01-01T00:10", "2024-01-03T00:00"],
                    dtype="datetime64[us]",
                )
            ),
            "v": pa.array([1.0, 2.0, 4.0]),
        }
    )
    got = (
        window.resample(ray.data.from_arrow(t), "k", "ts", "v", 60, agg="sum", fill="zero")
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    assert len(got) == 49  # 2024-01-01T00 .. 2024-01-03T00 hourly inclusive
    assert got["sum_value"].iloc[0] == 3.0 and got["sum_value"].iloc[-1] == 4.0
    assert (got["sum_value"].iloc[1:-1] == 0).all()
    assert got["n_obs"].sum() == 3
    diffs = got["bucket"].diff().dropna().unique()
    assert len(diffs) == 1 and diffs[0] == pd.Timedelta(hours=1)


def test_debounce_keeps_first_and_gapped(ray_session):
    import pyarrow as pa
    import ray.data

    from mothray.ops import window

    base = 1_700_000_000_000_000
    tbl = pa.table(
        {
            "u": pa.array(["a", "a", "a", "a", "b", None]),
            "t": pa.array(["x", "x", "x", "y", "x", "x"]),
            "ts": pa.array(
                [base, base + 30_000_000, base + 100_000_000, base + 1,
                 base, base + 5],
                pa.timestamp("us"),
            ),
            "eid": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        }
    )
    got = window.debounce(
        ray.data.from_arrow(tbl), ["u", "t"], "ts", "eid", min_gap_s=60
    ).take_all()
    kept = sorted(r["eid"] for r in got)
    # eid 2 is 30s after eid 1 (same partition) -> dropped; eid 3 is
    # 70s after eid 2 (the PRECEDING row, kept or not) -> kept; eid 4
    # other event_type; eid 5 other user; eid 6 null-user partition
    assert kept == [1, 3, 4, 5, 6]


def test_stickiness_ratio_exact(ray_session):
    import pyarrow as pa
    import ray.data

    from mothray.ops import window

    base = 1_700_000_000_000_000
    day = 86_400_000_000
    rows = [
        ("u1", 0), ("u2", 0),           # day 0: dau 2
        ("u1", 1),                       # day 1: dau 1, mau(28) 2
        ("u3", 30),                      # day 30: window [3..30] -> only u3
    ]
    tbl = pa.table(
        {
            "user_id": pa.array([u for u, _ in rows]),
            "ts": pa.array([base + d * day for _, d in rows], pa.timestamp("us")),
        }
    )
    got = {
        r["day"]: r
        for r in window.stickiness(
            ray.data.from_arrow(tbl), "ts", "user_id", window_days=28
        ).to_pylist()
    }
    days = sorted(got)
    assert [got[d]["dau"] for d in days] == [2, 1, 1]
    assert [got[d]["mau"] for d in days] == [2, 2, 1]
    assert got[days[1]]["stickiness"] == 0.5
    assert got[days[2]]["stickiness"] == 1.0
