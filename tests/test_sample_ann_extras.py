"""stratified_sample (sample.py), best_run (window.py),
reciprocal_nn (ann.py) against brute-force references."""

import numpy as np
import pyarrow as pa

US_DAY = 86_400_000_000


def test_stratified_sample_brute_force(ray_session):
    import ray.data

    from mothray import bloom
    from mothray.ops import sample
    from mothray.ops.text import fingerprint_batch

    rng = np.random.default_rng(41)
    n = 400
    keys = rng.permutation(n).astype(np.int64)
    strata = rng.choice(["a", "b", "c"], n)
    tbl = pa.table(
        {"k": pa.array(keys, pa.int64()), "g": pa.array(strata.astype(object))}
    )
    ds = ray.data.from_arrow(tbl).repartition(5)
    got = sorted(
        (r["g"], r["k"])
        for r in sample.stratified_sample(ds, "g", "k", k=7).take_all()
    )
    # brute force: same fingerprint + mix
    comp = pa.table({"k": pa.array(["st1" + str(int(x)) for x in keys])})
    fp = fingerprint_batch(comp, "k").column("fingerprint").to_numpy(
        zero_copy_only=False
    ).view(np.uint64)
    h = bloom._mix(fp)
    want = []
    for g in ("a", "b", "c"):
        m = strata == g
        rows = sorted(zip(h[m], keys[m]))[:7]
        want += [(g, int(k)) for _, k in rows]
    assert got == sorted(want)


def test_stratified_sample_partition_invariance(ray_session):
    import ray.data

    from mothray.ops import sample

    rng = np.random.default_rng(43)
    tbl = pa.table(
        {
            "k": pa.array(rng.permutation(300), pa.int64()),
            "g": pa.array(rng.choice(["x", "y"], 300).astype(object)),
        }
    )
    outs = []
    for parts in (1, 4, 11):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        outs.append(
            sorted(
                (r["g"], r["k"])
                for r in sample.stratified_sample(ds, "g", "k", k=9).take_all()
            )
        )
    assert outs[0] == outs[1] == outs[2]


def test_best_run_matches_brute_force(ray_session):
    import ray.data

    from mothray.ops import window

    rng = np.random.default_rng(47)
    n = 500
    uid = rng.integers(0, 7, n)
    ts = rng.integers(0, 12 * US_DAY, n)
    val = np.round(rng.uniform(-50, 60, n), 2)  # signed values: real runs
    ds = ray.data.from_arrow(
        pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "value": pa.array(val, pa.float64()),
            }
        )
    ).repartition(6)
    got = {
        r["user_id"]: (r["n_days"], r["best_run_scaled"])
        for r in window.best_run(ds, "user_id", "ts", "value").take_all()
    }
    for u in np.unique(uid):
        m = uid == u
        days = {}
        for t, v in zip(ts[m], val[m]):
            days[t // US_DAY] = days.get(t // US_DAY, 0) + int(np.floor(v * 100 + 0.5))
        series = [days[d] for d in sorted(days)]
        best = max(
            sum(series[i:j])
            for i in range(len(series))
            for j in range(i + 1, len(series) + 1)
        )
        assert got[u] == (len(series), best)


def test_reciprocal_nn_brute_force(ray_session):
    import ray.data

    from mothray.ops import ann

    rng = np.random.default_rng(53)
    n, d = 60, 16
    emb = rng.normal(size=(n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    ids = rng.permutation(1000)[:n].astype(np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        }
    )
    got = [
        (r["u"], r["v"], r["dot"])
        for r in ann.reciprocal_nn(ray.data.from_arrow(tbl).repartition(4)).take_all()
    ]
    q = np.clip(np.floor(emb.astype(np.float64) * 127 + 0.5), -127, 127).astype(
        np.int64
    )
    order = np.argsort(ids)
    sid, sq = ids[order], q[order]
    s = sq @ sq.T
    np.fill_diagonal(s, np.iinfo(np.int64).min)
    bj = s.argmax(axis=1)
    best = {int(sid[i]): (int(sid[bj[i]]), int(s[i, bj[i]])) for i in range(n)}
    want = sorted(
        (u, v, dv)
        for u, (v, dv) in best.items()
        if best[v][0] == u and u < v
    )
    assert got == want
