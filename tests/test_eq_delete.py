"""Equality deletes (Iceberg-v2 shape): O(keys) commit, read-time
anti-filter, composition with positional DVs, compaction fold,
change-feed visibility, vacuum retention."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data


@pytest.fixture()
def table(ray_session, tmp_path):
    from mothray import pipeline, versions

    n = 2000
    t = pa.table(
        {
            "k": pa.array(np.arange(n, dtype=np.int64)),
            "grp": pa.array([f"g{i % 5}" for i in range(n)]),
            "v": pa.array(np.arange(n, dtype=np.float64) / 3),
        }
    )
    src = tmp_path / "t.parquet"
    pq.write_table(t, src, row_group_size=250)
    d = str(tmp_path / "tbl")
    from mothray import checkpoint

    # several part FILES so compaction's carry-forward is observable
    checkpoint.encode_job(
        str(src), d, opts={"stripe_rows": 300}, target_partition_bytes=8 << 10
    )
    versions.adopt(d)
    return d, t


def test_eq_delete_no_file_rewrite_and_exact_read(ray_session, table):
    from mothray import versions

    d, t = table
    before = {
        f: os.path.getmtime(os.path.join(d, f))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    }
    keys = [5, 17, 1999, 123456]  # one key absent
    m = versions.equality_delete(d, "k", keys)
    assert m["op"] == "equality_delete" and m["metrics"]["n_keys"] == 4
    after = {
        f: os.path.getmtime(os.path.join(d, f))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    }
    assert before == after  # no data file touched
    got = {r["k"] for r in versions.scan_version(d).take_all()}
    assert got == set(range(2000)) - {5, 17, 1999}


def test_eq_delete_projection_excluding_key(ray_session, table):
    from mothray import versions

    d, _ = table
    versions.equality_delete(d, "k", [0, 1, 2])
    rows = versions.scan_version(d, columns=["grp", "v"]).take_all()
    assert len(rows) == 1997
    assert set(rows[0].keys()) == {"grp", "v"}


def test_eq_delete_stacks_with_dv_and_more_eq(ray_session, table):
    from mothray import versions

    d, _ = table
    versions.delete_vector_where(d, "k", 0, 9)  # positions 0..9
    versions.equality_delete(d, "k", [100, 101])
    versions.equality_delete(d, "grp", ["g4"])
    got = {r["k"] for r in versions.scan_version(d).take_all()}
    want = {
        k for k in range(2000)
        if k > 9 and k not in (100, 101) and k % 5 != 4
    }
    assert got == want


def test_eq_delete_compaction_folds_and_clears(ray_session, table):
    from mothray import versions

    d, _ = table
    versions.equality_delete(d, "k", [7, 8, 9])
    m = versions.compact_deletes(d)
    assert m["eq_deletes"] == [] and m["deletes"] == {}
    assert m["metrics"]["rows_removed"] == 3
    got = {r["k"] for r in versions.scan_version(d).take_all()}
    assert got == set(range(2000)) - {7, 8, 9}
    # stripes outside the key range carried forward without rewrite
    assert m["metrics"]["files_rewritten"] < m["metrics"]["files"]


def test_eq_delete_change_feed_reports_deletes(ray_session, table):
    from mothray import versions

    d, _ = table
    v0 = versions.latest_version(d)
    versions.equality_delete(d, "k", [42, 43])
    feed = versions.scan_changes(d, v0).take_all()
    assert {(r["k"], r["_change"]) for r in feed} == {
        (42, "delete"),
        (43, "delete"),
    }


def test_eq_delete_null_keys_survive(ray_session, tmp_path):
    from mothray import pipeline, versions

    t = pa.table(
        {
            "k": pa.array([1, None, 3, None, 5], pa.int64()),
            "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0]),
        }
    )
    src = tmp_path / "n.parquet"
    pq.write_table(t, src)
    d = str(tmp_path / "tbl")
    pipeline.encode_parquet_to_dir(str(src), d)
    versions.adopt(d)
    versions.equality_delete(d, "k", [1, 3, 5])
    rows = versions.scan_version(d).take_all()
    assert sorted(r["v"] for r in rows) == [2.0, 4.0]  # null keys kept


def test_eq_delete_vacuum_keeps_live_eqdel_file(ray_session, table):
    from mothray import versions

    d, _ = table
    versions.equality_delete(d, "k", [1])
    versions.vacuum(d)
    got = {r["k"] for r in versions.scan_version(d).take_all()}
    assert 1 not in got and len(got) == 1999


def test_cow_ops_fold_outstanding_deletes_no_resurrection(ray_session, table):
    """REGRESSION: COW rewrites read raw part files, so an OPTIMIZE (or
    upsert/delete_where/with_column) issued while positional DVs or
    equality deletes are outstanding used to RESURRECT the deleted
    rows. The fold-first rule must keep them dead."""
    from mothray import versions

    d, _ = table
    versions.delete_vector_where(d, "k", 0, 4)  # merge-on-read
    versions.equality_delete(d, "k", [100, 200])
    versions.optimize(d, "k")  # COW full rewrite
    got = {r["k"] for r in versions.scan_version(d).take_all()}
    assert got == set(range(5, 2000)) - {100, 200}
    m = versions.manifest(d)
    assert not m.get("deletes") and not m.get("eq_deletes")
    # history shows the explicit fold commit
    assert any(h["op"] == "compact_deletes" for h in versions.history(d))


def test_append_carries_outstanding_deletes(ray_session, table):
    """APPEND touches no existing file, so outstanding merge-on-read
    deletes carry forward instead of folding — and keep filtering."""
    import ray.data

    from mothray import versions

    d, _ = table
    versions.equality_delete(d, "k", [0, 1])
    versions.append(
        d, ray.data.from_items([{"k": 9001, "grp": "gx", "v": 1.0}])
    )
    got = {r["k"] for r in versions.scan_version(d).take_all()}
    assert 9001 in got and 0 not in got and 1 not in got
    assert versions.manifest(d).get("eq_deletes")


def test_optimize_incremental_merges_small_carries_big(ray_session, table):
    import ray.data

    from mothray import versions

    d, _ = table
    # several appends leave a tail of tiny part files
    for j in range(3):
        versions.append(
            d, ray.data.from_items([{"k": 10000 + j, "grp": "gz", "v": 0.5}])
        )
    before = versions.manifest(d)["files"]
    mtimes = {
        f: os.path.getmtime(os.path.join(d, f)) for f in before
    }
    m = versions.optimize_incremental(d, target_bytes=1 << 30)  # all small
    assert m["op"].startswith("optimize_incremental")
    assert m["metrics"]["files_merged"] == len(before)
    assert len(m["files"]) < len(before)
    got = {r["k"] for r in versions.scan_version(d).take_all()}
    assert got == set(range(2000)) | {10000, 10001, 10002}
    # big-file carry: re-run with a tiny threshold -> no-op, no commit
    v = m["version"]
    m2 = versions.optimize_incremental(d, target_bytes=16)
    assert m2["version"] == v
    # carried (now merged) files untouched on the no-op path
    for f in m["files"]:
        assert os.path.exists(os.path.join(d, f))


def test_commit_is_exclusive_version_conflict(ray_session, table):
    """Two writers racing the same parent version: one wins, the loser
    gets VersionConflict — never a silent history overwrite."""
    import json

    from mothray import versions

    d, _ = table
    head = versions.manifest(d)
    # both writers derived version N+1 from the same head; the first
    # link wins, the second must refuse to overwrite it
    rogue = {**head, "version": head["version"] + 1, "parent": head["version"],
             "op": "other_writer"}
    versions._write_manifest(d, rogue)
    loser = {**head, "version": head["version"] + 1, "parent": head["version"],
             "op": "loser"}
    with pytest.raises(versions.VersionConflict):
        versions._write_manifest(d, loser)
    # the head is the first commit, untouched
    assert versions.manifest(d)["op"] == "other_writer"
    # an op retried AFTER re-reading the head lands on top of it
    m = versions.equality_delete(d, "k", [1])
    assert m["parent"] == rogue["version"]
    assert json.load(open(versions._vpath(d, m["version"])))["op"] == "equality_delete"


def test_clone_version_zero_copy_and_isolated(ray_session, table, tmp_path):
    """clone_version hard-links a snapshot (same inodes, no bytes
    moved), carries merge-on-read deletes, and diverges independently."""
    from mothray import versions

    d, _ = table
    versions.equality_delete(d, "k", [3])
    clone = str(tmp_path / "clone")
    c = versions.clone_version(d, clone)
    # the clone CONTINUES the source's version counter (name-collision
    # guard: mutation file names embed the committing version)
    assert c["version"] == versions.latest_version(d) and c["eq_deletes"]
    # shared inodes: zero data bytes copied
    f0 = c["files"][0]
    assert os.stat(os.path.join(d, f0)).st_ino == os.stat(
        os.path.join(clone, f0)
    ).st_ino
    base = set(range(2000)) - {3}
    assert {r["k"] for r in versions.scan_version(clone).take_all()} == base
    # divergence: mutate the clone, the source must not change
    versions.equality_delete(clone, "k", [10])
    assert {r["k"] for r in versions.scan_version(clone).take_all()} == base - {10}
    assert {r["k"] for r in versions.scan_version(d).take_all()} == base
    # vacuum on the clone must not break the source (immutable inodes)
    versions.compact_deletes(clone)
    versions.vacuum(clone)
    assert {r["k"] for r in versions.scan_version(d).take_all()} == base
