"""Snapshot versioning: COW delete, append, time travel, vacuum."""

import os

import duckdb
import pytest

from mothray import pipeline, versions


@pytest.fixture()
def table(ray_session, tmp_path):
    src = "/root/testdata/sf0.001/orders.parquet"
    d = str(tmp_path / "tbl")
    from mothray import checkpoint

    checkpoint.encode_job(src, d, target_partition_bytes=1 << 20)
    versions.adopt(d)
    return d, src


def _ids(ds):
    return sorted(ds.to_pandas()["o_orderkey"].tolist())


def test_versioned_delete_and_time_travel(table):
    d, src = table
    n_parts0 = len(versions.files(d))
    before = {f: os.path.getmtime(os.path.join(d, f)) for f in versions.manifest(d)["files"]}

    m = versions.delete_where(d, "o_totalprice", min_value=200000.0)
    assert m["version"] == 1 and m["metrics"]["rows_deleted"] > 0

    # head = filtered, v0 = original, both readable concurrently
    exp_head = [
        r[0]
        for r in duckdb.sql(
            f"SELECT o_orderkey FROM read_parquet('{src}')"
            f" WHERE o_totalprice IS NULL OR o_totalprice < 200000.0 ORDER BY 1"
        ).fetchall()
    ]
    exp_all = [
        r[0]
        for r in duckdb.sql(f"SELECT o_orderkey FROM read_parquet('{src}') ORDER BY 1").fetchall()
    ]
    assert _ids(versions.decode_version(d)) == exp_head
    assert _ids(versions.decode_version(d, version=0)) == exp_all

    # COW: v0's files were never modified; unchanged files are SHARED
    for f, mt in before.items():
        assert os.path.getmtime(os.path.join(d, f)) == mt
    shared = set(versions.manifest(d, 0)["files"]) & set(versions.manifest(d, 1)["files"])
    rewritten = set(versions.manifest(d, 1)["files"]) - set(versions.manifest(d, 0)["files"])
    assert len(shared) + len(rewritten) == len(versions.files(d))
    assert m["metrics"]["files_rewritten"] == len(rewritten)
    assert n_parts0 == len(versions.manifest(d, 0)["files"])


def test_versioned_append_and_history(table):
    d, src = table
    import ray.data

    extra = ray.data.read_parquet(src).limit(50)
    m = versions.append(d, extra)
    assert m["version"] == 1 and m["metrics"]["files_added"] >= 1

    n0 = versions.decode_version(d, version=0).count()
    n1 = versions.decode_version(d).count()
    assert n1 == n0 + 50

    h = versions.history(d)
    assert [x["version"] for x in h] == [0, 1]
    assert h[1]["op"] == "append" and h[1]["parent"] == 0


def test_vacuum_drops_unreferenced(table):
    d, _ = table
    versions.delete_where(d, "o_totalprice", min_value=1.0)  # touches many files
    all_parquet = {f for f in os.listdir(d) if f.endswith(".parquet")}
    head_files = set(versions.manifest(d)["files"])
    assert head_files < all_parquet  # v0-only files still on disk

    res = versions.vacuum(d)
    assert res["removed_files"] == len(all_parquet - head_files)
    assert res["removed_versions"] == 1  # v0 manifest dropped
    left = {f for f in os.listdir(d) if f.endswith(".parquet")}
    assert left == head_files
    # head still reads fine after vacuum
    assert versions.decode_version(d).count() >= 0
    with pytest.raises(FileNotFoundError):
        versions.manifest(d, 0)


def test_adopt_idempotent(table):
    d, _ = table
    m0 = versions.manifest(d)
    assert versions.adopt(d)["version"] == m0["version"]


def test_versioned_upsert(table):
    import pyarrow as pa

    d, src = table
    # replace 3 keys, add 2 new ones
    new = pa.table(
        {
            "o_orderkey": pa.array([0, 1, 2, 10**6, 10**6 + 1], pa.int64()),
            "o_custkey": pa.array([9, 9, 9, 9, 9], pa.int64()),
            "o_orderstatus": pa.array(["X"] * 5),
            "o_totalprice": pa.array([1.0] * 5, pa.float64()),
            "o_orderdate": pa.array([None] * 5, pa.timestamp("us")),
            "o_orderpriority": pa.array(["X"] * 5),
        }
    )
    base = versions.decode_version(d).to_pandas()
    m = versions.upsert_keys(d, new, "o_orderkey")
    assert m["metrics"]["rows_replaced"] == 3 and m["metrics"]["rows_upserted"] == 5

    head = versions.decode_version(d).to_pandas()
    assert len(head) == len(base) + 2
    got = head[head["o_orderkey"].isin([0, 1, 2, 10**6, 10**6 + 1])].sort_values(
        "o_orderkey"
    )
    assert got["o_custkey"].tolist() == [9] * 5
    # v0 unchanged
    v0 = versions.decode_version(d, version=0).to_pandas()
    assert len(v0) == len(base)
    assert v0[v0["o_orderkey"] == 0]["o_custkey"].tolist() != [9]


def test_versioned_prune_read_no_duplicates(table):
    d, _ = table
    versions.delete_where(d, "o_totalprice", min_value=200000.0)
    # manifest-scoped prune: no rows from superseded files
    n_head = versions.decode_version(d).count()
    from mothray import pipeline

    pruned = versions.prune_read(d, "o_orderkey", None, None)
    assert pipeline.decode_dataset(pruned).count() == n_head


def test_versioned_optimize_and_with_column(table):
    import pyarrow.compute as pc

    d, src = table
    m = versions.optimize(d, "o_totalprice")
    assert m["op"].startswith("optimize") and m["metrics"]["files_added"] >= 1
    # content identical to v0, now clustered
    assert _ids(versions.decode_version(d)) == _ids(versions.decode_version(d, 0))

    m2 = versions.with_column(
        d, "price_bucket", lambda t: pc.round(pc.divide(t.column("o_totalprice"), 1000.0)),
        ["o_totalprice"],
    )
    assert m2["version"] == 2
    head = versions.decode_version(d).to_pandas()
    assert "price_bucket" in head.columns
    # old version keeps the old schema
    v1 = versions.decode_version(d, 1).to_pandas()
    assert "price_bucket" not in v1.columns
    h = versions.history(d)
    assert [x["version"] for x in h] == [0, 1, 2]


def test_history_survives_vacuum(table):
    """vacuum() removes dropped versions' manifests; history() must
    skip the holes, not crash with FileNotFoundError."""
    d, _ = table
    versions.delete_where(d, "o_totalprice", min_value=200000.0)
    versions.delete_where(d, "o_totalprice", min_value=100000.0)
    versions.vacuum(d)  # keeps latest only
    h = versions.history(d)
    assert [m["version"] for m in h] == [2]  # holes skipped silently


def test_delete_all_rows_then_read_and_mutate(table):
    """A DELETE matching every row commits files=[]; later reads return
    empty datasets and later mutations commit trivially instead of
    crashing on a schemaless empty work-unit dataset."""
    import pyarrow as pa

    d, _ = table
    m = versions.delete_where(d, "o_orderkey", min_value=-1)  # everything
    assert m["files"] == [] and m["metrics"]["files"] == 0
    assert versions.decode_version(d).count() == 0
    assert versions.read_version(d).count() == 0
    # subsequent mutations on the empty version do not crash
    m2 = versions.delete_where(d, "o_orderkey", min_value=0)
    assert m2["files"] == [] and m2["metrics"]["rows_deleted"] == 0
    import pyarrow.parquet as pq

    up = pq.read_table("/root/testdata/sf0.001/orders.parquet").slice(0, 1)
    # upsert into the empty table = plain append of the batch
    m3 = versions.upsert_keys(d, up, "o_orderkey")
    assert m3["metrics"]["rows_upserted"] == 1
    assert versions.decode_version(d).count() == 1


def test_stray_file_in_versions_dir_ignored(table):
    """A stray non-manifest file in _versions/ must not crash every
    entry point (the old parser int()'d a fixed 6-char slice)."""
    d, _ = table
    with open(os.path.join(d, "_versions", "vacuumed.json"), "w") as f:
        f.write("{}")
    assert versions.latest_version(d) == 0
    versions.delete_where(d, "o_totalprice", min_value=200000.0)
    assert versions.latest_version(d) == 1


def test_delete_metrics_distinguish_rewrites_from_deletions(table):
    d, _ = table
    m = versions.delete_where(d, "o_orderkey", min_value=-1)
    # every file fully deleted: rewrites must be 0, deletions == files
    assert m["metrics"]["files_rewritten"] == 0
    assert m["metrics"]["files_deleted"] > 0


def test_deletion_vectors_merge_on_read(table):
    d, src = table
    v0_files = list(versions.manifest(d)["files"])
    mtimes = {f: os.path.getmtime(os.path.join(d, f)) for f in v0_files}

    m = versions.delete_vector_where(d, "o_totalprice", 200000.0, None)
    assert m["metrics"]["rows_deleted"] > 0
    # merge-on-read: data files byte-untouched, same file list
    assert m["files"] == v0_files
    for f, t0 in mtimes.items():
        assert os.path.getmtime(os.path.join(d, f)) == t0

    exp = [
        r[0]
        for r in duckdb.sql(
            f"SELECT o_orderkey FROM read_parquet('{src}')"
            " WHERE o_totalprice IS NULL OR o_totalprice < 200000.0 ORDER BY 1"
        ).fetchall()
    ]
    assert _ids(versions.scan_version(d)) == exp
    # v0 time-travel still sees everything
    assert versions.scan_version(d, 0).count() == duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{src}')"
    ).fetchone()[0]

    # stacked second DV: union of positions, idempotent re-delete
    m2 = versions.delete_vector_where(d, "o_totalprice", 200000.0, None)
    assert m2["metrics"]["rows_deleted"] == 0  # nothing new
    m3 = versions.delete_vector_where(d, "o_orderkey", None, 50)
    exp2 = [x for x in exp if x > 50]
    assert _ids(versions.scan_version(d)) == exp2

    # projection through the DV mask
    proj = versions.scan_version(d, columns=["o_orderkey"])
    assert sorted(proj.to_pandas()["o_orderkey"].tolist()) == exp2


def test_compact_deletes_folds_to_cow(table):
    d, src = table
    versions.delete_vector_where(d, "o_totalprice", 200000.0, None)
    exp = _ids(versions.scan_version(d))
    m = versions.compact_deletes(d)
    assert m["metrics"]["files_rewritten"] >= 1 and not m["deletes"]
    # the compacted head reads identically through BOTH paths
    assert _ids(versions.decode_version(d)) == exp
    assert _ids(versions.scan_version(d)) == exp
    # metadata-only row counts are exact again after compaction
    n_meta = sum(
        r["n_rows"] for r in versions.read_version(d, metadata_only=True).take_all()
    )
    assert n_meta == len(exp)


def test_vacuum_drops_unreferenced_dvs(table):
    d, _ = table
    versions.delete_vector_where(d, "o_totalprice", 200000.0, None)
    versions.compact_deletes(d)
    dv_dir = os.path.join(d, "_deletes")
    assert any(f.endswith(".parquet") for f in os.listdir(dv_dir))
    res = versions.vacuum(d)
    assert res["removed_files"] > 0
    assert not any(f.endswith(".parquet") for f in os.listdir(dv_dir))
    # head still reads fine
    assert versions.decode_version(d).count() > 0
