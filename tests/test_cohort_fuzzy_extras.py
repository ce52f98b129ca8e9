"""jaro_winkler_topk (fuzzy.py), burstiness / time_to_convert
(cohort.py), seasonality_index (window.py) against brute-force /
DuckDB references."""

import math
import random
import string

import numpy as np
import pyarrow as pa

US_DAY = 86_400_000_000


def _jw_ref(s1, s2):
    """Floored-transposition Jaro-Winkler (DuckDB semantics)."""
    if not s1 or not s2:
        return 0.0
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    window = max(max(l1, l2) // 2 - 1, 0)
    used = [False] * l2
    m1, m2pos = [], []
    for i, c in enumerate(s1):
        for j in range(max(0, i - window), min(l2, i + window + 1)):
            if not used[j] and s2[j] == c:
                used[j] = True
                m1.append(c)
                m2pos.append(j)
                break
    m = len(m1)
    if m == 0:
        return 0.0
    m2 = [s2[j] for j in sorted(m2pos)]
    t = sum(a != b for a, b in zip(m1, m2)) // 2
    j = (m / l1 + m / l2 + (m - t) / m) / 3
    if j > 0.7:
        p = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            p += 1
        j = j + 0.1 * p * (1 - j)
    return j


def test_jaro_winkler_topk_matches_reference(ray_session):
    import ray.data

    from mothray.ops import fuzzy

    rng = random.Random(17)
    alphabet = string.ascii_lowercase + " #0123456789"
    names = [
        "".join(rng.choices(alphabet, k=rng.randint(0, 22))) for _ in range(1200)
    ] + ["query str 42", "", "query str 4", "xx"]
    q = "query str 42"
    ds = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(range(len(names)), pa.int64()),
                "s": pa.array(names, pa.string()),
            }
        )
    ).repartition(5)
    got = [
        (r["k"], r["jw_r6"])
        for r in fuzzy.jaro_winkler_topk(ds, "s", "k", q, top_k=20).take_all()
    ]
    want = sorted(
        ((k, round(_jw_ref(n, q), 6)) for k, n in enumerate(names)),
        key=lambda t: (-t[1], t[0]),
    )[:20]
    assert got == want


def test_jaro_winkler_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from mothray.ops import fuzzy

    rng = random.Random(23)
    names = [
        "".join(rng.choices(string.printable[:80], k=rng.randint(0, 30)))
        for _ in range(600)
    ]
    q = "Customer#000000042"
    ds = ray.data.from_arrow(
        pa.table(
            {"k": pa.array(range(len(names)), pa.int64()), "s": pa.array(names)}
        )
    )
    got = [
        (r["k"], r["jw_r6"])
        for r in fuzzy.jaro_winkler_topk(ds, "s", "k", q, top_k=30).take_all()
    ]
    con = duckdb.connect()
    tbl = pa.table({"k": pa.array(range(len(names)), pa.int64()), "s": pa.array(names)})
    con.register("t", tbl)
    want = con.execute(
        "SELECT k, round(jaro_winkler_similarity(s, ?), 6) FROM t"
        " ORDER BY 2 DESC, k LIMIT 30",
        [q],
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_burstiness_matches_brute_force(ray_session):
    import ray.data

    from mothray.ops import cohort

    rng = np.random.default_rng(29)
    uid = rng.integers(0, 6, 400)
    ts = rng.integers(0, 20 * US_DAY, 400)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
            }
        )
    ).repartition(4)
    got = {
        r["user_id"]: (r["n_gaps"], r["cv_r6"])
        for r in cohort.burstiness(ds, "user_id", "ts").take_all()
    }
    for u in np.unique(uid):
        g = np.diff(np.sort(ts[uid == u]))
        n = len(g)
        if n < 2:
            assert u not in got
            continue
        s = float(sum(int(x) for x in g))
        ss = float(sum(int(x) * int(x) for x in g))
        var = max((ss - s * s / n) / (n - 1), 0.0)
        cv = math.sqrt(var) / (s / n)
        assert got[u] == (n, round(cv, 6))


def test_time_to_convert_brute_force(ray_session):
    import ray.data

    from mothray.ops import cohort

    rng = np.random.default_rng(31)
    n = 500
    uid = rng.integers(0, 10, n)
    ts = rng.integers(0, 5 * US_DAY, n)
    types = rng.choice(["view", "purchase", "click"], n)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "event_type": pa.array(types.astype(object), pa.string()),
            }
        )
    ).repartition(6)
    got = {
        r["user_id"]: r["convert_us"]
        for r in cohort.time_to_convert(
            ds, "user_id", "ts", "event_type", "view", "purchase"
        ).take_all()
    }
    want = {}
    for u in np.unique(uid):
        m = uid == u
        views = ts[m & (types == "view")]
        if len(views) == 0:
            continue
        t0 = views.min()
        buys = ts[m & (types == "purchase") & (ts > t0)]
        if len(buys):
            want[int(u)] = int(buys.min() - t0)
    assert got == want


def test_seasonality_index_brute_force(ray_session):
    import ray.data

    from mothray.ops import window

    rng = np.random.default_rng(37)
    n = 800
    ts = rng.integers(0, 30 * US_DAY, n)
    val = np.round(rng.uniform(0.01, 99.0, n), 2)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "value": pa.array(val, pa.float64()),
            }
        )
    ).repartition(5)
    got = window.seasonality_index(ds, "ts", "value")
    dow = (ts // US_DAY + 3) % 7
    cents = np.floor(val * 100 + 0.5).astype(np.int64)
    overall = cents.sum() / n
    for i, d in enumerate(got.column("dow").to_pylist()):
        m = dow == d
        assert got.column("n")[i].as_py() == int(m.sum())
        assert got.column("seasonal_index")[i].as_py() == (
            (cents[m].sum() / m.sum()) / overall
        )
