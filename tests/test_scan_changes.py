"""Row-level change feed between snapshots (versions.scan_changes):
planned from manifests alone, decoding only files that differ; layout
commits report zero changes; multiset cancellation is exact."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture()
def versioned(ray_session, tmp_path):
    import ray.data

    from mothray import pipeline, versions

    d = str(tmp_path / "tbl")
    base = pa.table(
        {
            "k": pa.array(np.arange(100, dtype=np.int64)),
            "v": pa.array([f"s{i}" for i in range(100)]),
        }
    )
    pipeline.write_encoded(
        pipeline.encode_dataset(ray.data.from_arrow(base), opts={"stripe_rows": 25}), d
    )
    versions.adopt(d)  # v0
    versions.append(
        d,
        ray.data.from_arrow(
            pa.table(
                {
                    "k": pa.array(np.arange(100, 120, dtype=np.int64)),
                    "v": pa.array([f"s{i}" for i in range(100, 120)]),
                }
            )
        ),
    )  # v1
    versions.delete_where(d, "k", 10, 19)  # v2: COW rewrite
    up = pa.table(
        {"k": pa.array([5, 200], pa.int64()), "v": pa.array(["NEW5", "NEW200"])}
    )
    versions.upsert_keys(d, up, "k")  # v3: update + insert
    versions.optimize(d, "k")  # v4: layout only
    versions.delete_vector_where(d, "k", 30, 32)  # v5: merge-on-read delete
    return d


def _feed(d, a, b):
    from mothray import versions

    rows = versions.scan_changes(d, a, b).take_all()
    ins = sorted(r["k"] for r in rows if r["_change"] == "insert")
    dels = sorted(r["k"] for r in rows if r["_change"] == "delete")
    return ins, dels


def test_append_is_pure_insert(ray_session, versioned):
    ins, dels = _feed(versioned, 0, 1)
    assert ins == list(range(100, 120)) and dels == []


def test_cow_delete_is_pure_delete(ray_session, versioned):
    ins, dels = _feed(versioned, 1, 2)
    assert ins == [] and dels == list(range(10, 20))


def test_upsert_yields_pre_and_postimage(ray_session, versioned):
    ins, dels = _feed(versioned, 2, 3)
    assert ins == [5, 200] and dels == [5]


def test_layout_commit_reports_zero_changes(ray_session, versioned):
    from mothray import versions

    assert versions.scan_changes(versioned, 3, 4).count() == 0


def test_dv_delete_reports_deletes(ray_session, versioned):
    ins, dels = _feed(versioned, 4, 5)
    assert ins == [] and dels == [30, 31, 32]


def test_multiversion_net_changes(ray_session, versioned):
    ins, dels = _feed(versioned, 0, 5)
    # inserts: the 20 appended (minus none deleted in 10..19 range —
    # appended keys are 100.. so none), k=200, and k=5's postimage
    assert ins == [5] + list(range(100, 120)) + [200]
    # deletes: 10..19 (COW), 30..32 (DV), and k=5's preimage
    assert dels == [5] + list(range(10, 20)) + [30, 31, 32]


def test_changed_files_only_are_planned(ray_session, versioned):
    """A pure append plans exactly the appended file on the to side and
    nothing on the from side (carried files cost zero bytes)."""
    from mothray import versions

    ma = versions.manifest(versioned, 0)
    mb = versions.manifest(versioned, 1)
    assert set(ma["files"]) < set(mb["files"])
    added = set(mb["files"]) - set(ma["files"])
    assert len(added) >= 1
