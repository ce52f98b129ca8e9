"""Incremental materialized aggregate views (mothray/matview.py):
incremental refresh == full recompute under appends; destructive ops
fall back to full; read_view never scans."""
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from mothray import matview, pipeline, versions

AGGS = [
    ("v", "sum", "sum_v"),
    ("v", "min", "min_v"),
    ("v", "max", "max_v"),
    ("v", "count", "n_v"),
]


def _table(seed: int, n: int = 3000) -> pa.Table:
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "id": pa.array(np.arange(n) + seed * 1_000_000),
            "k": pa.array(rng.choice(["a", "b", "c", "d"], n)),
            "v": pa.array(rng.normal(100.0, 25.0, n)),
        }
    )


def _expected(tbls: list[pa.Table]) -> list[tuple]:
    t = pa.concat_tables(tbls)
    agg = (
        t.group_by(["k"])
        .aggregate([("v", "sum"), ("v", "min"), ("v", "max"), ("v", "count")])
        .rename_columns(["k", "sum_v", "min_v", "max_v", "n_v"])
        .sort_by("k")
    )
    return [
        (r["k"], round(r["sum_v"], 6), r["min_v"], r["max_v"], r["n_v"])
        for r in agg.to_pylist()
    ]


def _got(tdir: str) -> list[tuple]:
    return [
        (r["k"], round(r["sum_v"], 6), r["min_v"], r["max_v"], r["n_v"])
        for r in matview.read_view(tdir, "by_k").to_pylist()
    ]


def test_incremental_refresh_matches_full(ray_session, tmp_path):
    import ray.data

    t0, t1, t2 = _table(0), _table(1), _table(2)
    tdir = str(tmp_path / "t")
    pipeline.write_encoded(pipeline.encode_dataset(ray.data.from_arrow(t0)), tdir)
    versions.adopt(tdir)
    r = matview.create_view(tdir, "by_k", ["k"], AGGS)
    assert r["mode"] == "full" and r["groups"] == 4
    assert _got(tdir) == _expected([t0])

    versions.append(tdir, ray.data.from_arrow(t1))
    r = matview.refresh_view(tdir, "by_k")
    assert r["mode"] == "incremental" and r["new_files"] >= 1
    assert _got(tdir) == _expected([t0, t1])

    versions.append(tdir, ray.data.from_arrow(t2))
    assert matview.refresh_view(tdir, "by_k")["mode"] == "incremental"
    assert _got(tdir) == _expected([t0, t1, t2])

    # up-to-date -> noop
    assert matview.refresh_view(tdir, "by_k")["mode"] == "noop"


def test_destructive_op_falls_back_to_full(ray_session, tmp_path):
    import ray.data

    t0 = _table(3)
    tdir = str(tmp_path / "t")
    pipeline.write_encoded(pipeline.encode_dataset(ray.data.from_arrow(t0)), tdir)
    versions.adopt(tdir)
    matview.create_view(tdir, "by_k", ["k"], AGGS)
    versions.delete_where(tdir, "id", 3_000_000, 3_000_999)
    r = matview.refresh_view(tdir, "by_k")
    assert r["mode"] == "full"
    kept = t0.filter(pc.invert(pc.and_(
        pc.greater_equal(t0.column("id"), 3_000_000),
        pc.less_equal(t0.column("id"), 3_000_999),
    )))
    assert _got(tdir) == _expected([kept])


def test_read_view_hides_internal_count(ray_session, tmp_path):
    import ray.data

    tdir = str(tmp_path / "t")
    pipeline.write_encoded(
        pipeline.encode_dataset(ray.data.from_arrow(_table(4))), tdir
    )
    versions.adopt(tdir)
    matview.create_view(tdir, "by_k", ["k"], AGGS)
    t = matview.read_view(tdir, "by_k")
    assert "__count" not in t.column_names
    assert "__count" in matview.read_view(tdir, "by_k", with_count=True).column_names
    with pytest.raises(FileExistsError):
        matview.create_view(tdir, "by_k", ["k"], AGGS)
    with pytest.raises(ValueError):
        matview.create_view(tdir, "other", ["k"], [("v", "median")])


def test_view_respects_deletion_vectors(ray_session, tmp_path):
    import ray.data

    t0 = _table(5)
    tdir = str(tmp_path / "t")
    pipeline.write_encoded(pipeline.encode_dataset(ray.data.from_arrow(t0)), tdir)
    versions.adopt(tdir)
    # DV-delete a slice BEFORE creating the view
    versions.delete_vector_where(tdir, "id", 5_000_000, 5_000_499)
    matview.create_view(tdir, "by_k", ["k"], AGGS)
    kept = t0.filter(pc.invert(pc.and_(
        pc.greater_equal(t0.column("id"), 5_000_000),
        pc.less_equal(t0.column("id"), 5_000_499),
    )))
    assert _got(tdir) == _expected([kept])
    # a new DV AFTER the view forces a full refresh (not a stale noop)
    versions.delete_vector_where(tdir, "id", 5_000_500, 5_000_999)
    r = matview.refresh_view(tdir, "by_k")
    assert r["mode"] == "full"
    kept2 = t0.filter(pc.invert(pc.and_(
        pc.greater_equal(t0.column("id"), 5_000_000),
        pc.less_equal(t0.column("id"), 5_000_999),
    )))
    assert _got(tdir) == _expected([kept2])
