"""Cohort retention vs the DuckDB distinct-week/min-week join oracle."""

import duckdb
import pyarrow as pa

from mothray.ops import cohort


def _norm(df):
    return (
        df.astype("int64")
        .sort_values(["cohort_week", "age_weeks"])
        .reset_index(drop=True)
    )


def test_retention_synthetic(ray_session):
    import ray.data

    wk = cohort._WEEK_US
    # u1 first week 0, active weeks 0/1/3 (two events in week 1 count once);
    # u2 first week 1, active week 1 only.
    tbl = pa.table(
        {
            "user_id": [1, 1, 1, 1, 2],
            "ts": pa.array([5, wk + 1, wk + 2, 3 * wk, wk + 9], pa.int64()).cast(
                pa.timestamp("us")
            ),
        }
    )
    out = _norm(
        cohort.retention(ray.data.from_arrow(tbl).repartition(3)).to_pandas()
    )
    assert out.values.tolist() == [
        [0, 0, 1],
        [0, 1, 1],
        [0, 3, 1],
        [1, 0, 1],
    ]


def test_retention_events_oracle(ray_session):
    import ray.data

    src = "/root/testdata/sf0.001/events.parquet"
    ds = ray.data.read_parquet(src, columns=["user_id", "ts", "event_type", "value"]).filter(
        expr="event_type == 'purchase' and value > 150.0"
    )
    got = _norm(cohort.retention(ds).to_pandas())
    exp = _norm(
        duckdb.sql(
            f"WITH ev AS (SELECT * FROM read_parquet('{src}')"
            "             WHERE event_type = 'purchase' AND value > 150.0),"
            " p AS (SELECT DISTINCT user_id,"
            "       CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS w FROM ev),"
            " f AS (SELECT user_id, min(w) AS cw FROM p GROUP BY 1)"
            " SELECT f.cw AS cohort_week, p.w - f.cw AS age_weeks,"
            " CAST(count(*) AS BIGINT) AS n_users"
            " FROM p JOIN f USING (user_id) GROUP BY 1, 2"
        ).df()
    )
    assert got.equals(exp)
    # age 0 row exists for every cohort (a user is active in its first week)
    assert set(exp[exp.age_weeks == 0].cohort_week) == set(exp.cohort_week)


def test_new_users_cumulative_known(ray_session):
    import datetime as dt

    import pyarrow as pa
    import ray.data

    from mothray.ops import cohort

    def ts(day, hour=0):
        return dt.datetime(2024, 2, day, hour)

    rows = [
        (1, ts(1)), (1, ts(3)),          # user 1 first on day 1
        (2, ts(1, 5)), (2, ts(1, 9)),    # user 2 first on day 1
        (3, ts(3)),                      # user 3 first on day 3
        (4, None),                       # never active
    ]
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )
    got = cohort.new_users_cumulative(
        ray.data.from_arrow(t).repartition(3), "user_id", "ts"
    ).take_all()
    assert [(r["day"], r["new_users"], r["cum_users"]) for r in got] == [
        ("2024-02-01", 2, 2),
        ("2024-02-03", 1, 3),
    ]


def test_kaplan_meier_textbook(ray_session):
    import datetime

    import pyarrow as pa
    import ray.data

    from mothray.ops import cohort

    # lifetimes (days): deaths at 2 (x2), 4 (x1); censored at 5 (x2, active
    # on the final observed day 10)
    def span(uid, start, end):
        return [
            (uid, datetime.datetime(2024, 1, start)),
            (uid, datetime.datetime(2024, 1, end)),
        ]

    rows = (
        span(1, 1, 3) + span(2, 2, 4) + span(3, 3, 7)  # deaths: dur 2,2,4
        + span(4, 5, 10) + span(5, 5, 10)              # censored: dur 5
    )
    t = pa.table(
        {
            "u": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows]).cast(pa.timestamp("us")),
        }
    )
    out = cohort.kaplan_meier(
        ray.data.from_arrow(t).repartition(3), "u", "ts", censor_gap_days=0
    ).to_pylist()
    assert [(r["t_days"], r["deaths"], r["at_risk"]) for r in out] == [
        (2, 2, 5),
        (4, 1, 3),
    ]
    import math

    assert abs(out[0]["survival"] - 3 / 5) < 1e-9
    assert abs(out[1]["survival"] - math.exp(math.log(3 / 5) + math.log(2 / 3))) < 1e-9


def test_kaplan_meier_all_die_reaches_zero(ray_session):
    import datetime

    import pyarrow as pa
    import ray.data

    from mothray.ops import cohort

    rows = []
    for uid, (s, e) in enumerate([(1, 2), (1, 3), (2, 4)]):
        rows += [(uid, datetime.datetime(2024, 1, s)), (uid, datetime.datetime(2024, 1, e))]
    rows.append((99, datetime.datetime(2024, 1, 20)))  # defines corpus end
    t = pa.table(
        {
            "u": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows]).cast(pa.timestamp("us")),
        }
    )
    out = cohort.kaplan_meier(
        ray.data.from_arrow(t), "u", "ts", censor_gap_days=0
    ).to_pylist()
    assert out[-1]["survival"] == 0.0  # the last at-risk key dies
