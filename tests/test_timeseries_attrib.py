"""max_drawdown / holt_linear (window.py), last_touch_attribution
(funnel.py), calibration_bins (moments.py) against brute-force
references."""

import collections

import numpy as np
import pyarrow as pa

US_DAY = 86_400_000_000


def _mk_events(rng, n_users=8, n_rows=600):
    uid = rng.integers(0, n_users, n_rows)
    ts = rng.integers(0, 10 * US_DAY, n_rows)
    val = np.round(rng.uniform(0.01, 200.0, n_rows), 2)
    types = rng.choice(["view", "click", "purchase", "error"], n_rows)
    return pa.table(
        {
            "user_id": pa.array(uid, pa.int64()),
            "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array(val, pa.float64()),
            "event_type": pa.array(types.astype(object), pa.string()),
            "event_id": pa.array(np.arange(n_rows), pa.int64()),
        }
    )


def _daily_cents(tbl):
    per = collections.defaultdict(lambda: collections.defaultdict(int))
    uid = tbl.column("user_id").to_pylist()
    ts = tbl.column("ts").cast(pa.int64()).to_pylist()
    val = tbl.column("value").to_pylist()
    for u, t, v in zip(uid, ts, val):
        per[u][t // US_DAY] += int(np.floor(v * 100 + 0.5))
    return per


def test_max_drawdown_matches_brute_force(ray_session):
    import ray.data

    from mothray.ops import window

    rng = np.random.default_rng(5)
    tbl = _mk_events(rng)
    got = {
        r["user_id"]: (r["n_days"], r["max_drawdown_scaled"])
        for r in window.max_drawdown(
            ray.data.from_arrow(tbl).repartition(5), "user_id", "ts", "value"
        ).take_all()
    }
    for u, days in _daily_cents(tbl).items():
        cum = np.cumsum([days[d] for d in sorted(days)])
        dd = int((np.maximum.accumulate(cum) - cum).max())
        assert got[u] == (len(days), dd)


def test_holt_linear_matches_brute_force(ray_session):
    import ray.data

    from mothray.ops import window

    rng = np.random.default_rng(6)
    tbl = _mk_events(rng)
    got = {
        r["user_id"]: (r["n_days"], r["level"], r["trend"])
        for r in window.holt_linear(
            ray.data.from_arrow(tbl).repartition(4), "user_id", "ts", "value"
        ).take_all()
    }
    for u, days in _daily_cents(tbl).items():
        x = [days[d] / 100.0 for d in sorted(days)]
        if len(x) < 2:
            assert u not in got
            continue
        lvl, b = x[0], x[1] - x[0]
        for t in range(1, len(x)):
            prev = lvl
            lvl = 0.5 * x[t] + 0.5 * (lvl + b)
            b = 0.25 * (lvl - prev) + 0.75 * b
        assert got[u] == (len(x), lvl, b)  # bit-exact


def test_last_touch_attribution(ray_session):
    import ray.data

    from mothray.ops import funnel

    rng = np.random.default_rng(9)
    tbl = _mk_events(rng)
    got = {
        r["touch_type"]: r["n"]
        for r in funnel.last_touch_attribution(
            ray.data.from_arrow(tbl).repartition(6), "purchase"
        ).take_all()
    }
    want = collections.Counter()
    rows = sorted(
        zip(
            tbl.column("user_id").to_pylist(),
            tbl.column("ts").cast(pa.int64()).to_pylist(),
            tbl.column("event_id").to_pylist(),
            tbl.column("event_type").to_pylist(),
        ),
        key=lambda r: (r[0], r[1], r[2]),
    )
    by_user = collections.defaultdict(list)
    for u, t, i, ty in rows:
        by_user[u].append(ty)
    for seq in by_user.values():
        last = None
        for ty in seq:
            if ty == "purchase":
                want[last or "none"] += 1
            else:
                last = ty
    assert got == dict(want)


def test_calibration_bins_brute_force(ray_session):
    import ray.data

    from mothray.ops import moments

    rng = np.random.default_rng(12)
    n = 250
    s = rng.choice(np.round(rng.uniform(0, 50, 40), 1), n)  # ties guaranteed
    y = (rng.uniform(0, 1, n) < 0.3).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"s": pa.array(s, pa.float64()), "y": pa.array(y, pa.int64())})
    ).repartition(5)
    got = moments.calibration_bins(ds, "s", "y", n_bins=4)
    order = np.argsort(s, kind="stable")
    sv = s[order]
    # SQL rank(): min rank of the tie run, 1-based
    rank = np.empty(n, np.int64)
    uniq_start = np.r_[True, sv[1:] != sv[:-1]]
    rk_sorted = np.repeat(np.flatnonzero(uniq_start) + 1,
                          np.diff(np.r_[np.flatnonzero(uniq_start), n]))
    rank[order] = rk_sorted
    bins = (rank - 1) * 4 // n
    want = {}
    for b in np.unique(bins):
        m = bins == b
        want[int(b)] = (int(m.sum()), int(y[m].sum()))
    got_map = {
        r["bin"].as_py(): (r["n"].as_py(), r["n_pos"].as_py())
        for r in [dict(zip(got.column_names, row)) for row in zip(*got.columns)]
    }
    assert got_map == want


def test_resample_interp_linear_fill(ray_session):
    import ray.data

    from mothray.ops import window

    # user 0: observed buckets at hours 0 and 3 (values 10, 40) with a
    # 2-bucket gap -> interpolated 20, 30
    us_h = 3_600_000_000
    tbl = pa.table(
        {
            "user_id": pa.array([0, 0], pa.int64()),
            "ts": pa.array([0, 3 * us_h], pa.int64()).cast(pa.timestamp("us")),
            "value": pa.array([10.0, 40.0], pa.float64()),
        }
    )
    out = window.resample(
        ray.data.from_arrow(tbl), "user_id", "ts", "value", 60,
        agg="sum", fill="interp",
    ).take_all()
    vals = [r["sum_value"] for r in sorted(out, key=lambda r: r["bucket"])]
    assert vals == [10.0, 20.0, 30.0, 40.0]
    n_obs = [r["n_obs"] for r in sorted(out, key=lambda r: r["bucket"])]
    assert n_obs == [1, 0, 0, 1]


def test_twap_matches_brute_force(ray_session):
    import ray.data

    from mothray.ops import window

    rng = np.random.default_rng(71)
    tbl = _mk_events(rng, n_users=6, n_rows=300)
    got = {
        r["user_id"]: (r["n"], r["twap_scaled"])
        for r in window.twap(
            ray.data.from_arrow(tbl).repartition(5),
            "user_id", "ts", "value", "event_id",
        ).take_all()
    }
    uid = tbl.column("user_id").to_pylist()
    ts = tbl.column("ts").cast(pa.int64()).to_pylist()
    val = tbl.column("value").to_pylist()
    eid = tbl.column("event_id").to_pylist()
    per = collections.defaultdict(list)
    for u, t, v, i in zip(uid, ts, val, eid):
        per[u].append((t, i, int(np.floor(v * 100 + 0.5))))
    for u, rows in per.items():
        rows.sort()
        dur = rows[-1][0] - rows[0][0]
        if len(rows) < 2 or dur == 0:
            assert u not in got
            continue
        num = sum(c * (rows[k + 1][0] - t) for k, (t, _, c) in enumerate(rows[:-1]))
        assert got[u] == (len(rows), float(num) / float(dur))


def test_dod_change_brute_force(ray_session):
    import ray.data

    from mothray.ops import window

    rng = np.random.default_rng(73)
    tbl = _mk_events(rng, n_users=4, n_rows=400)
    got = window.dod_change(
        ray.data.from_arrow(tbl).repartition(4), "ts", "value"
    )
    ts = tbl.column("ts").cast(pa.int64()).to_pylist()
    val = tbl.column("value").to_pylist()
    days = collections.defaultdict(int)
    for t, v in zip(ts, val):
        days[t // US_DAY] += int(np.floor(v * 100 + 0.5))
    ordered = sorted(days)
    want = [
        (d, days[d], days[p], (days[d] - days[p]) / days[p])
        for d, p in zip(ordered[1:], ordered[:-1])
    ]
    rows = list(
        zip(
            got.column("day").to_pylist(),
            got.column("cents").to_pylist(),
            got.column("prev_cents").to_pylist(),
            got.column("pct_change").to_pylist(),
        )
    )
    assert rows == want
