"""interval_union / cusum_max (window.py), group_power_means
(moments.py), key_gaps (profile.py)."""

import numpy as np
import pyarrow as pa


def _ts(us_list):
    return pa.array(np.array(us_list, dtype=np.int64), pa.int64()).cast(
        pa.timestamp("us")
    )


def test_interval_union_merges_islands(ray_session):
    import ray.data

    from mothray.ops import window

    s = 1_000_000  # one second in us
    t = pa.table(
        {
            "k": [1, 1, 1, 1, 2],
            # k=1: [0,10), [5,15) merge; [30,40) separate -> 2 islands, 25s
            # k=2: single interval -> 1 island, 10s
            "ts": _ts([0, 5 * s, 30 * s, 8 * s, 100 * s]),
        }
    )
    out = {
        r["k"]: r
        for r in window.interval_union(
            ray.data.from_arrow(t).repartition(3), "k", "ts", 10
        ).take_all()
    }
    assert out[1]["n_intervals"] == 2
    assert out[1]["covered_us"] == (18 - 0 + 10) * s
    assert out[2] == {"k": 2, "n_intervals": 1, "covered_us": 10 * s}


def test_interval_union_adjacent_do_not_merge(ray_session):
    import ray.data

    from mothray.ops import window

    s = 1_000_000
    # end of [0,10) is exactly the start of the next: s > run_max is
    # False at equality, so touching intervals DO merge (closed union)
    t = pa.table({"k": [1, 1], "ts": _ts([0, 10 * s])})
    out = window.interval_union(ray.data.from_arrow(t), "k", "ts", 10).take_all()
    assert out[0]["n_intervals"] == 1 and out[0]["covered_us"] == 20 * s


def test_cusum_max_float_and_scaled_agree(ray_session):
    import ray.data

    from mothray.ops import window

    rng = np.random.default_rng(31)
    n = 400
    v = np.round(rng.uniform(0, 100, n), 2)
    v[200:] += 10.0  # level shift -> big cusum
    t = pa.table(
        {
            "k": np.repeat([1, 2], n // 2),
            "o": np.tile(np.arange(n // 2), 2),
            "tb": np.arange(n),
            "v": v,
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    f = {r["k"]: r for r in window.cusum_max(ds, "k", "o", "v", "tb").take_all()}
    s = {
        r["k"]: r
        for r in window.cusum_max(ds, "k", "o", "v", "tb", decimal_scale=2).take_all()
    }
    for k in (1, 2):
        nk = f[k]["n"]
        assert abs(s[k]["cusum_scaled"] / (100.0 * nk) - f[k]["cusum"]) < 1e-3
    # the shifted series (k=2 holds the shift at its midpoint) spikes
    assert s[2]["cusum_scaled"] > 0


def test_group_power_means_matches_numpy(ray_session):
    import ray.data

    from mothray.ops import moments

    rng = np.random.default_rng(32)
    g = rng.choice(["a", "b"], 3000)
    v = rng.uniform(0.5, 50, 3000)
    v[::97] = -1.0  # non-positive rows must drop
    t = pa.table({"g": g, "v": v})
    out = {
        r["g"]: r
        for r in moments.group_power_means(
            ray.data.from_arrow(t).repartition(4), "v", "g"
        ).take_all()
    }
    for k in ("a", "b"):
        keep = v[(g == k) & (v > 0)]
        assert out[k]["n"] == len(keep)
        assert abs(out[k]["gmean"] - np.exp(np.log(keep).mean())) < 1e-4
        assert abs(out[k]["hmean"] - len(keep) / (1.0 / keep).sum()) < 1e-4


def test_key_gaps_exact(ray_session):
    import ray.data

    from mothray.ops import profile

    keys = [1, 2, 3, 7, 8, 20, 21, 22, 50]  # gaps: 3(4-6), 11(9-19), 27(23-49)
    t = pa.table({"k": pa.array(keys + [7], pa.int64())})  # one duplicate
    out = profile.key_gaps(
        ray.data.from_arrow(t).repartition(3), "k"
    ).to_pylist()[0]
    assert out == {
        "n_keys": 9,
        "key_min": 1,
        "key_max": 50,
        "n_gaps": 3,
        "missing_total": 3 + 11 + 27,
        "max_gap": 27,
    }


def test_key_gaps_no_gaps_and_empty(ray_session):
    import ray.data

    from mothray.ops import profile

    t = pa.table({"k": pa.array(list(range(100, 200)), pa.int64())})
    out = profile.key_gaps(ray.data.from_arrow(t).repartition(5), "k").to_pylist()[0]
    assert out["n_gaps"] == 0 and out["missing_total"] == 0 and out["n_keys"] == 100

    t0 = pa.table({"k": pa.array([None], pa.int64())})
    out0 = profile.key_gaps(ray.data.from_arrow(t0), "k").to_pylist()[0]
    assert out0["n_keys"] == 0 and out0["key_min"] is None


def test_rolling_distinct_exact(ray_session):
    import datetime

    import pyarrow as pa
    import ray.data

    from mothray.ops import window

    def ts(day, h=0):
        return datetime.datetime(2024, 1, day, h)

    # user 1 active days 1, 3; user 2 active day 2; user 3 active day 9
    t = pa.table(
        {
            "ts": pa.array([ts(1), ts(1, 5), ts(3), ts(2), ts(9)]).cast(
                pa.timestamp("us")
            ),
            "user_id": pa.array([1, 1, 1, 2, 3], pa.int64()),
        }
    )
    out = {
        r["day"]: r["users"]
        for r in window.rolling_distinct(
            ray.data.from_arrow(t).repartition(2), "ts", "user_id", window_days=7
        ).take_all()
    }
    # only observed days appear
    assert set(out) == {"2024-01-01", "2024-01-02", "2024-01-03", "2024-01-09"}
    assert out["2024-01-01"] == 1          # user 1
    assert out["2024-01-02"] == 2          # users 1, 2
    assert out["2024-01-03"] == 2          # users 1, 2 (both within 7d)
    assert out["2024-01-09"] == 2          # user 3 + user 1 (day 3 within 7d)
