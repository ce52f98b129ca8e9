"""Layout-aware ORDER BY ... LIMIT n: stripe zone maps on the leading
key bound which stripes can contribute to the top-n; only those fetch
and decode. Results are exact on sorted AND unsorted layouts."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest


@pytest.fixture()
def layouts(ray_session, tmp_path):
    import ray.data

    from mothray import pipeline

    rng = np.random.default_rng(3)
    n = 20000
    v = rng.permutation(n).astype(np.int64)
    tbl = pa.table(
        {
            "v": pa.array(v),
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "s": pa.array([f"x{i % 11}" for i in range(n)]),
        }
    )
    shuffled = str(tmp_path / "shuffled")
    pipeline.write_encoded(
        pipeline.encode_dataset(
            ray.data.from_arrow(tbl).repartition(8), opts={"stripe_rows": 1000}
        ),
        shuffled,
    )
    st = tbl.take(pc.sort_indices(tbl, sort_keys=[("v", "ascending")]))
    clustered = str(tmp_path / "clustered")
    pipeline.write_encoded(
        pipeline.encode_dataset(ray.data.from_arrow(st), opts={"stripe_rows": 1000}),
        clustered,
    )
    return shuffled, clustered, v


def test_sorted_limit_exact_asc_desc(ray_session, layouts):
    from mothray import pipeline

    shuffled, clustered, v = layouts
    asc = sorted(v)[:50]
    desc = sorted(v, reverse=True)[:50]
    for enc in (shuffled, clustered):
        got = pipeline.sorted_limit(enc, ["v", "id"], 50)
        assert got.column("v").to_pylist() == asc
        got = pipeline.sorted_limit(enc, ["v", "id"], 50, descending=True)
        assert got.column("v").to_pylist() == desc


def test_sorted_limit_projection_keeps_sort_keys(ray_session, layouts):
    from mothray import pipeline

    _, clustered, v = layouts
    got = pipeline.sorted_limit(clustered, ["v", "id"], 25, columns=["v", "s"])
    assert got.column_names == ["v", "s"]
    assert got.column("v").to_pylist() == sorted(v)[:25]


def test_sorted_limit_clustered_layout_prunes(ray_session, layouts):
    """On the v-sorted layout, the contribution rule must keep O(1)
    stripes for a small n — not the whole dataset."""
    import json

    from mothray import pipeline

    _, clustered, _ = layouts
    meta = pipeline.read_encoded(clustered, metadata_only=True, include_paths=True)
    rows = meta.take_all()
    assert len(rows) == 20
    # replicate the survivor rule: with n=50 on 1000-row sorted stripes,
    # only the stripe holding ranks 0..999 (plus ties) can contribute
    survivors = []
    infos = []
    for r in rows:
        st = json.loads(r["stats"])["v"]
        infos.append((st["min"], st["max"], st["count"] - st["null_count"]))
    for lo, hi, _ in infos:
        guaranteed = sum(vr for l2, h2, vr in infos if h2 < lo)
        if guaranteed < 50:
            survivors.append((lo, hi))
    assert len(survivors) == 1


def test_sorted_limit_nulls_excluded_and_bounds(ray_session, tmp_path):
    import ray.data

    from mothray import pipeline

    t2 = pa.table(
        {
            "v": pa.array([3, None, 1, None, 2], pa.int64()),
            "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        }
    )
    enc = str(tmp_path / "enc")
    pipeline.write_encoded(pipeline.encode_dataset(ray.data.from_arrow(t2)), enc)
    assert pipeline.sorted_limit(enc, "v", 4).column("v").to_pylist() == [1, 2, 3]
    assert pipeline.sorted_limit(enc, "v", 0).num_rows == 0
    assert pipeline.sorted_limit(enc, "v", 100).num_rows == 3
