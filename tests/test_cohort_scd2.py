"""weekly_churn, cadence and SCD2 against brute-force references."""

import numpy as np
import pyarrow as pa


def _ds(table: pa.Table):
    import ray.data

    return ray.data.from_arrow(table)


_WEEK_US = 7 * 24 * 3600 * 1_000_000


def test_weekly_churn_matches_bruteforce(ray_session):
    from mothray.ops.cohort import weekly_churn

    rng = np.random.default_rng(4)
    n = 500
    users = rng.integers(1, 30, n)
    ts = rng.integers(1_600_000_000_000_000, 1_603_000_000_000_000, n)
    tbl = pa.table(
        {
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    out = {
        r["week"]: (r["n_active"], r["n_churned"])
        for r in weekly_churn(_ds(tbl), "user_id", "ts").take_all()
    }
    pairs = {(u, t // _WEEK_US) for u, t in zip(users.tolist(), ts.tolist())}
    weeks = sorted({w for _, w in pairs})
    for w in weeks:
        act = {u for u, ww in pairs if ww == w}
        churn = {u for u in act if (u, w + 1) not in pairs}
        assert out[w] == (len(act), len(churn))


def test_cadence_matches_bruteforce(ray_session):
    from mothray.ops.cohort import cadence

    rng = np.random.default_rng(8)
    n = 200
    users = rng.integers(1, 10, n)
    ts = rng.integers(0, 10_000_000, n)
    tbl = pa.table(
        {
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    out = {
        r["user_id"]: (r["n_gaps"], r["median_gap_us"])
        for r in cadence(_ds(tbl), "user_id", "ts", "event_id").take_all()
    }
    for u in set(users.tolist()):
        mask = users == u
        order = np.lexsort((np.arange(n)[mask], ts[mask]))
        gaps = np.diff(ts[mask][order])
        if len(gaps) < 1:
            assert u not in out
            continue
        sg = np.sort(gaps)
        m = len(sg)
        med = (int(sg[(m - 1) // 2]) + int(sg[m // 2])) / 2.0
        assert out[u] == (m, med)


def test_scd2_matches_bruteforce(ray_session):
    from mothray.ops.window import scd2

    rng = np.random.default_rng(6)
    n = 300
    keys = rng.integers(1, 20, n)
    order = rng.integers(0, 50, n)
    attr = rng.choice(["a", "b", "c"], n)
    tbl = pa.table(
        {
            "k": pa.array(keys, pa.int64()),
            "o": pa.array(order, pa.int64()),
            "a": pa.array(attr),
            "tb": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    rows = scd2(_ds(tbl), "k", "o", "a", "tb").take_all()
    got = {}
    for r in rows:
        got.setdefault(r["k"], []).append(
            (r["version"], r["a"], r["valid_from"], r["valid_to"])
        )
    for k in set(keys.tolist()):
        mask = keys == k
        idx = np.lexsort((np.arange(n)[mask], order[mask]))
        seq = [(attr[mask][i], int(order[mask][i])) for i in idx]
        changes = []
        prev = None
        for a, o in seq:
            if prev is None or a != prev:
                changes.append([a, o, None])
                if len(changes) > 1:
                    changes[-2][2] = o
            prev = a
        expect = [
            (v + 1, a, f, t) for v, (a, f, t) in enumerate(changes)
        ]
        assert sorted(got[k]) == sorted(expect), k
