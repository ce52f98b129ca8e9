"""gains_curve, tv_hellinger, bounce_rate and TSV ingestion against
brute-force references."""

import numpy as np
import pyarrow as pa
import pytest


def _ds(table: pa.Table):
    import ray.data

    return ray.data.from_arrow(table)


def _ntile_ref(n, k, rn):
    q, r = divmod(n, k)
    big = r * (q + 1)
    rn0 = rn - 1
    return rn0 // (q + 1) + 1 if rn0 < big else r + (rn0 - big) // max(q, 1) + 1


def test_gains_curve_bruteforce(ray_session):
    from mothray.ops.moments import gains_curve

    rng = np.random.default_rng(21)
    n = 500
    score = np.round(rng.uniform(0, 100, n), 3)
    y = (rng.random(n) < 0.3).astype(np.int64)
    key = np.arange(n, dtype=np.int64)
    tbl = pa.table(
        {"s": pa.array(score), "k": pa.array(key), "y": pa.array(y)}
    )
    out = {
        r["decile"]: r
        for r in gains_curve(
            _ds(tbl).repartition(4), "s", "y", "k", n_tiles=10
        ).to_pylist()
    }
    order = sorted(range(n), key=lambda i: (-score[i], key[i]))
    tiles = [_ntile_ref(n, 10, pos + 1) for pos in range(n)]
    tot_pos = int(y.sum())
    cum_p = cum_r = 0
    for d in range(1, 11):
        members = [order[p] for p in range(n) if tiles[p] == d]
        npos = int(sum(y[i] for i in members))
        cum_p += npos
        cum_r += len(members)
        r = out[d]
        assert r["n_rows"] == len(members) and r["n_pos"] == npos
        assert r["cum_pos"] == cum_p
        assert r["gain"] == pytest.approx(cum_p / tot_pos, abs=1e-12)
        assert r["lift"] == pytest.approx((cum_p * n) / (tot_pos * cum_r), abs=1e-12)


def test_tv_hellinger_bruteforce(ray_session):
    from mothray.ops.moments import tv_hellinger

    rng = np.random.default_rng(22)
    n = 800
    v = rng.integers(0, 5000, n)
    g = rng.choice(["A", "B", "C"], n)
    tbl = pa.table({"v": pa.array(v, pa.int64()), "g": pa.array(g)})
    out = tv_hellinger(_ds(tbl), "v", "g", "A", bucket_width=500).to_pylist()[0]
    a = v[g == "A"] // 500
    b = v[g != "A"] // 500
    na, nb = len(a), len(b)
    grid = sorted(set(a.tolist()) | set(b.tolist()))
    tv = sum(
        abs(int((a == x).sum()) * nb - int((b == x).sum()) * na) for x in grid
    ) / (2 * na * nb)
    bc = sum(
        np.sqrt(((a == x).sum() / na) * ((b == x).sum() / nb)) for x in grid
    )
    assert out["n_a"] == na and out["n_b"] == nb
    assert out["tv"] == pytest.approx(tv, abs=1e-12)
    assert out["bc"] == pytest.approx(bc, abs=2e-6)
    assert out["hellinger"] == pytest.approx(np.sqrt(1 - bc), abs=2e-6)


def test_bounce_rate_bruteforce(ray_session):
    from mothray.ops.cohort import bounce_rate

    rng = np.random.default_rng(23)
    n = 400
    users = rng.integers(1, 12, n)
    ts = np.sort(rng.integers(0, 5 * 86400_000_000, n))
    tbl = pa.table(
        {
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    out = {
        r["day"]: (r["n_sessions"], r["n_bounces"])
        for r in bounce_rate(_ds(tbl), gap_s=1800).take_all()
    }
    gap_us = 1800 * 1_000_000
    ref: dict = {}
    for u in set(users.tolist()):
        t = np.sort(ts[users == u])
        starts = [0] + [i for i in range(1, len(t)) if t[i] - t[i - 1] > gap_us]
        sizes = np.diff(starts + [len(t)])
        for s, sz in zip(starts, sizes):
            day = int(t[s] // 86400_000_000)
            cell = ref.setdefault(day, [0, 0])
            cell[0] += 1
            cell[1] += int(sz == 1)
    assert out == {d: tuple(v) for d, v in ref.items()}


def test_tsv_source_roundtrip(ray_session, tmp_path):
    from pyarrow import csv as pacsv

    from mothray import pipeline

    tbl = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "txt": pa.array(["plain", "tab\there", "line\nbreak"]),
        }
    )
    p = str(tmp_path / "t.tsv")
    pacsv.write_csv(tbl, p, write_options=pacsv.WriteOptions(delimiter="\t"))
    ds = pipeline.read_text_source(str(tmp_path), "tsv", schema=tbl.schema)
    got = sorted(ds.take_all(), key=lambda r: r["id"])
    assert [r["txt"] for r in got] == ["plain", "tab\there", "line\nbreak"]
