"""Round-4 fifth-batch ops, part 4: duplicate-invoice band pairs,
fragmentation report, z-order audit composition."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_dup_pairs_band_bruteforce(ray_session):
    import ray.data

    from mothray.ops.join import dup_pairs_band

    rng = np.random.default_rng(31)
    n = 400
    key = rng.integers(0, 12, n)
    amt = np.round(rng.uniform(10, 200, n), 2)
    ts = rng.integers(0, 50 * 86_400_000_000, n)
    ids = np.arange(n, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(key, pa.int64()),
                "amt": pa.array(amt, pa.float64()),
                "ts": pa.array(ts, pa.int64()).cast(pa.timestamp("us")),
                "id": pa.array(ids),
            }
        )
    )
    w = 3 * 86_400_000_000
    band = 1500  # $15
    got = {
        (r["k"], r["id1"], r["id2"])
        for r in dup_pairs_band(ds, "k", "amt", "ts", "id", w, band).take_all()
    }
    cents = np.rint(amt * 100).astype(np.int64)
    want = set()
    for i in range(n):
        for j in range(i + 1, n):
            if (
                key[i] == key[j]
                and abs(int(ts[i]) - int(ts[j])) <= w
                and abs(int(cents[i]) - int(cents[j])) <= band
            ):
                want.add((int(key[i]), min(i, j), max(i, j)))
    assert got == want
    assert len(want) > 0  # the band is loose enough to have signal


def test_dup_pairs_band_null_keys_dropped(ray_session):
    import ray.data

    from mothray.ops.join import dup_pairs_band

    t = pa.table(
        {
            "k": pa.array([1, 1, None], pa.int64()),
            "amt": pa.array([5.0, 5.0, 5.0], pa.float64()),
            "ts": pa.array([0, 1000, 2000], pa.int64()).cast(pa.timestamp("us")),
            "id": pa.array([1, 2, 3], pa.int64()),
        }
    )
    got = dup_pairs_band(
        ray.data.from_arrow(t), "k", "amt", "ts", "id", 10_000, 100
    ).take_all()
    assert [(r["id1"], r["id2"]) for r in got] == [(1, 2)]


def test_fragmentation_report(ray_session, tmp_path):
    from mothray import pipeline
    from mothray.ops.profile import fragmentation_report

    n = 1000
    src = tmp_path / "in.parquet"
    pq.write_table(
        pa.table({"a": pa.array(np.arange(n, dtype=np.int64))}), src
    )
    enc = str(tmp_path / "enc")
    pipeline.encode_parquet_to_dir(str(src), enc, opts={"stripe_rows": 300})
    rep = fragmentation_report(enc).take_all()
    assert sum(r["n_rows"] for r in rep) == n
    assert sum(r["n_stripes"] for r in rep) == 4  # 300+300+300+100
    assert min(r["min_stripe_rows"] for r in rep) == 100
    assert max(r["max_stripe_rows"] for r in rep) == 300
    assert all(r["enc_bytes"] > 0 for r in rep)


def test_zorder_improves_clustering_audit(ray_session, tmp_path):
    import pyarrow.compute as pc

    from mothray import pipeline
    from mothray.ops.profile import clustering_report

    rng = np.random.default_rng(13)
    n = 8000
    t = pa.table(
        {
            "x": pa.array(rng.integers(0, 1000, n), pa.int64()),
            "y": pa.array(rng.integers(0, 1000, n), pa.int64()),
        }
    )
    src = tmp_path / "in.parquet"
    pq.write_table(t, src)
    enc, opt = str(tmp_path / "enc"), str(tmp_path / "opt")
    pipeline.encode_parquet_to_dir(str(src), enc, opts={"stripe_rows": 1000})
    before = {r["col"]: r for r in clustering_report(enc, ["x", "y"]).to_pylist()}
    pipeline.optimize_encoded(enc, opt, ["x", "y"], opts={"stripe_rows": 1000})
    after = {r["col"]: r for r in clustering_report(opt, ["x", "y"]).to_pylist()}
    for c in ("x", "y"):
        assert after[c]["max_depth"] < before[c]["max_depth"]
        assert after[c]["n_overlap_pairs"] < before[c]["n_overlap_pairs"]


def test_linear_attribution_hand_check(ray_session):
    """Two journeys: J0 has touches a,b then conv (500k each); J1 has
    touch c then conv (1e6); a touchless conv credits 'none'."""
    import ray.data

    from mothray.ops import funnel

    rows = [
        {"user_id": 1, "ts": i, "event_type": t, "event_id": i}
        for i, t in enumerate(["a", "b", "conv", "c", "conv", "conv"])
    ]
    # ts must be timestamps? the op only sorts by (ts, id): ints fine
    out = {r["touch_type"]: r["credit_e6"] for r in funnel.linear_attribution(
        ray.data.from_items(rows), "conv").take_all()}
    assert out == {"a": 500000, "b": 500000, "c": 1000000, "none": 1000000}


def test_linear_attribution_layout_invariant(ray_session):
    import ray.data

    from mothray.ops import funnel

    rows = [
        {"user_id": u, "ts": i, "event_type": ["x", "y", "conv"][i % 3], "event_id": i}
        for u in range(6)
        for i in range(12)
    ]
    a = {r["touch_type"]: r["credit_e6"] for r in funnel.linear_attribution(
        ray.data.from_items(rows), "conv").take_all()}
    b = {r["touch_type"]: r["credit_e6"] for r in funnel.linear_attribution(
        ray.data.from_items(rows).repartition(5), "conv").take_all()}
    assert a == b and a


def test_time_decay_attribution_hand_check(ray_session):
    """Touch 2 days before conv gets 1e6>>2; same-day touch full 1e6;
    touchless conv credits 'none'."""
    import datetime as dt

    import ray.data

    from mothray.ops import funnel

    base = dt.datetime(2024, 1, 10)
    rows = [
        {"user_id": 1, "ts": base - dt.timedelta(days=2), "event_type": "a", "event_id": 1},
        {"user_id": 1, "ts": base - dt.timedelta(hours=1), "event_type": "b", "event_id": 2},
        {"user_id": 1, "ts": base, "event_type": "conv", "event_id": 3},
        {"user_id": 2, "ts": base, "event_type": "conv", "event_id": 4},
    ]
    out = {r["touch_type"]: r["credit_e6"] for r in funnel.time_decay_attribution(
        ray.data.from_items(rows), "conv").take_all()}
    assert out == {"a": 1000000 >> 2, "b": 1000000, "none": 1000000}


def test_u_shaped_attribution_hand_check(ray_session):
    """4 touches then conv: 400k/66667/66667/400k... wait: 40/20/40
    with two middles -> each middle round(200000/2)=100000."""
    import ray.data

    from mothray.ops import funnel

    rows = [
        {"user_id": 1, "ts": i, "event_type": t, "event_id": i}
        for i, t in enumerate(["a", "b", "c", "d", "conv"])
    ] + [
        {"user_id": 2, "ts": i, "event_type": t, "event_id": 100 + i}
        for i, t in enumerate(["x", "conv", "conv"])
    ]
    out = {r["touch_type"]: r["credit_e6"] for r in funnel.u_shaped_attribution(
        ray.data.from_items(rows), "conv").take_all()}
    # user 1: a=400k, b=c=100k, d=400k; user 2: x alone = 1e6 for the
    # first conv; the second conv's journey has no touch -> 'none'
    assert out == {"a": 400000, "b": 100000, "c": 100000, "d": 400000,
                   "x": 1000000, "none": 1000000}
