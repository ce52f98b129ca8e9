"""Global row-number / NTILE machinery, RFM segmentation and ABC
classification against brute-force references."""

import numpy as np
import pyarrow as pa


def _ds(table: pa.Table):
    import ray.data

    return ray.data.from_arrow(table)


def _ntile_ref(n: int, k: int, rn: int) -> int:
    q, r = divmod(n, k)
    big = r * (q + 1)
    rn0 = rn - 1
    if rn0 < big:
        return rn0 // (q + 1) + 1
    return r + (rn0 - big) // max(q, 1) + 1


def test_global_row_number(ray_session):
    from mothray.ops.moments import with_global_row_number

    rng = np.random.default_rng(12)
    n = 400
    v = rng.integers(0, 40, n)  # heavy ties
    k = rng.permutation(n)
    tbl = pa.table({"v": pa.array(v, pa.int64()), "k": pa.array(k, pa.int64())})
    out, total = with_global_row_number(_ds(tbl).repartition(7), "v", "k")
    assert total == n
    rows = out.take_all()
    got = {r["k"]: r["rn"] for r in rows}
    order = np.lexsort((k, v))
    for pos, i in enumerate(order, start=1):
        assert got[k[i]] == pos


def test_sql_ntile_matches_reference(ray_session):
    from mothray.ops.moments import sql_ntile

    for n in (1, 3, 7, 10, 100):
        for k in (1, 2, 4, 7):
            rn = np.arange(1, n + 1, dtype=np.int64)
            got = sql_ntile(rn, n, k)
            want = [_ntile_ref(n, k, int(r)) for r in rn]
            assert got.tolist() == want, (n, k)


def test_abc_classification_bruteforce(ray_session):
    from mothray.ops.moments import abc_classification

    rng = np.random.default_rng(13)
    n = 2000
    keys = rng.integers(1, 200, n)
    vals = np.round(rng.lognormal(4, 1, n), 2)
    tbl = pa.table({"k": pa.array(keys, pa.int64()), "v": pa.array(vals)})
    out = {
        r["cls"]: (r["n_keys"], r["class_cents"])
        for r in abc_classification(_ds(tbl).repartition(5), "k", "v").take_all()
    }
    # brute force
    cents = {}
    for key, v in zip(keys.tolist(), vals.tolist()):
        cents[key] = cents.get(key, 0) + int(round(v * 100))
    items = sorted(cents.items(), key=lambda kv: (-kv[1], kv[0]))
    tot = sum(c for _, c in items)
    cum = 0
    ref = {"A": [0, 0], "B": [0, 0], "C": [0, 0]}
    for key, c in items:
        cum += c
        cls = "A" if cum * 100 <= 80 * tot else ("B" if cum * 100 <= 95 * tot else "C")
        ref[cls][0] += 1
        ref[cls][1] += c
    for cls, (nk, cc) in ref.items():
        if nk:
            assert out[cls] == (nk, cc), cls
        else:
            assert cls not in out


def test_rfm_tiles_bruteforce(ray_session):
    from mothray.ops.cohort import rfm

    rng = np.random.default_rng(14)
    n = 600
    keys = rng.integers(1, 50, n)
    days = rng.integers(19000, 19300, n)
    vals = np.round(rng.uniform(10, 500, n), 2)
    tbl = pa.table(
        {
            "k": pa.array(keys, pa.int64()),
            "ts": pa.array(days.astype("datetime64[D]").astype("datetime64[us]")),
            "v": pa.array(vals),
        }
    )
    rows = rfm(_ds(tbl).repartition(4), "k", "ts", "v").take_all()
    per = {}
    for key, d, v in zip(keys.tolist(), days.tolist(), vals.tolist()):
        rec = per.setdefault(key, [0, 0, 0])
        rec[0] = max(rec[0], d)
        rec[1] += 1
        rec[2] += int(round(v * 100))
    gmax = max(r[0] for r in per.values())
    nk = len(per)
    for metric_i, col in ((0, "r_q"), (1, "f_q"), (2, "m_q")):
        if metric_i == 0:
            metric = {k: gmax - r[0] for k, r in per.items()}
        else:
            metric = {k: r[metric_i] for k, r in per.items()}
        order = sorted(per, key=lambda k: (metric[k], k))
        rn = {k: i + 1 for i, k in enumerate(order)}
        want = {k: _ntile_ref(nk, 4, rn[k]) for k in per}
        got = {r["k"]: r[col] for r in rows}
        assert got == want, col
    for r in rows:
        assert r["recency_days"] == gmax - per[r["k"]][0]
        assert r["frequency"] == per[r["k"]][1]
        assert r["monetary_cents"] == per[r["k"]][2]
