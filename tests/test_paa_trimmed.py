"""PAA/SAX and trimmed mean against brute-force references."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(table: pa.Table):
    import ray.data

    return ray.data.from_arrow(table)


def test_trimmed_mean_bruteforce(ray_session):
    from mothray.ops.moments import trimmed_mean

    rng = np.random.default_rng(31)
    n = 700
    v = rng.integers(0, 50, n).astype(np.float64)
    g = rng.choice(["x", "y"], n)
    tbl = pa.table({"v": pa.array(v), "g": pa.array(g)})
    out = {r["g"]: r for r in trimmed_mean(_ds(tbl), "v", "g").take_all()}
    for grp in ("x", "y"):
        s = np.sort(v[g == grp].astype(np.int64))
        nn = len(s)
        k = nn // 10
        kept = s[k: nn - k]
        r = out[grp]
        assert r["n"] == nn and r["n_kept"] == len(kept)
        assert r["kept_sum"] == int(kept.sum())
        assert r["trimmed_mean"] == pytest.approx(kept.mean(), abs=1e-12)


def test_paa_sax_bruteforce(ray_session):
    from mothray.ops.window import paa_sax

    rng = np.random.default_rng(32)
    n = 2000
    users = rng.integers(1, 15, n)
    day_us = 86400_000_000
    ts = rng.integers(0, 40, n) * day_us + rng.integers(0, day_us, n)
    tbl = pa.table(
        {
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    rows = paa_sax(_ds(tbl), "user_id", "ts", n_segments=4, alphabet=4).take_all()
    got = {(r["user_id"], r["seg"]): r for r in rows}

    # brute force
    from collections import Counter

    ud = Counter((u, t // day_us) for u, t in zip(users.tolist(), ts.tolist()))
    all_counts = sorted(ud.values())
    m = len(all_counts)

    def qdisc(q):
        return all_counts[int(np.floor(q * (m - 1)))]

    bps = [qdisc(0.25), qdisc(0.5), qdisc(0.75)]
    for u in set(users.tolist()):
        days = sorted(d for (uu, d) in ud if uu == u)
        nd = len(days)
        segs = {}
        for i, d in enumerate(days):
            segs.setdefault(i * 4 // nd, []).append(ud[(u, d)])
        for s, cs in segs.items():
            r = got[(u, s)]
            assert r["seg_n"] == len(cs)
            assert r["seg_sum"] == sum(cs)
            mean = sum(cs) / len(cs)
            assert r["seg_mean"] == pytest.approx(mean, abs=1e-12)
            assert r["sax"] == chr(97 + sum(1 for b in bps if b < mean))


def test_paa_sax_duckdb_quantile_convention(ray_session):
    # pin the quantile_disc lower-index convention against DuckDB
    import duckdb

    from mothray.ops.sketch import exact_quantiles

    rng = np.random.default_rng(33)
    vals = rng.integers(0, 30, 101).astype(np.int64)
    tbl = pa.table({"c": pa.array(vals)})
    got = exact_quantiles(_ds(tbl), "c", [0.25, 0.5, 0.75])
    con = duckdb.connect()
    con.register("t", tbl.to_pandas())
    for q in (0.25, 0.5, 0.75):
        want = con.execute(f"SELECT quantile_disc(c, {q}) FROM t").fetchone()[0]
        assert got[q] == want, q
