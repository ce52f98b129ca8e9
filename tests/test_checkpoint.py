"""Resume test (SURVEY.md §5.2 item 4): kill after K partitions,
restart, verify no recompute of done partitions + identical output."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mothray import checkpoint, datagen, pipeline


@pytest.fixture(scope="module")
def multi_rg_input(tmp_path_factory):
    tbl = datagen.cc_pages(8000, seed=5)
    path = tmp_path_factory.mktemp("ccin") / "pages.parquet"
    pq.write_table(tbl, path, row_group_size=500)  # 16 row groups
    return tbl, str(path)


def test_partition_plan_deterministic(multi_rg_input):
    _, path = multi_rg_input
    p1 = checkpoint.plan_partitions(path, target_bytes=200_000)
    p2 = checkpoint.plan_partitions(path, target_bytes=200_000)
    assert p1 == p2
    assert len(p1) > 3


def test_encode_job_and_resume(ray_session, multi_rg_input, tmp_path):
    tbl, path = multi_rg_input
    out = str(tmp_path / "encoded")
    summary = checkpoint.encode_job(path, out, target_partition_bytes=200_000)
    assert summary["encoded"] == summary["partitions"] > 3
    assert summary["n_rows"] == tbl.num_rows

    # decode everything and verify bit-identity
    import ray.data

    dec = pipeline.decode_dataset(checkpoint.read_job_output(out))
    got = pa.concat_tables(dec.iter_batches(batch_format="pyarrow", batch_size=None))
    assert got.num_rows == tbl.num_rows

    # simulate a crash that lost two partitions
    victims = ["part-00001", "part-00003"]
    for v in victims:
        os.remove(f"{out}/{v}.parquet")
        os.remove(f"{out}/{checkpoint.MANIFEST_DIR}/{v}.json")
    mtimes = {
        f: os.path.getmtime(os.path.join(out, f))
        for f in os.listdir(out)
        if f.endswith(".parquet")
    }

    summary2 = checkpoint.encode_job(path, out, target_partition_bytes=200_000)
    assert summary2["encoded"] == 2
    assert summary2["skipped"] == summary["partitions"] - 2
    assert summary2["n_rows"] == tbl.num_rows
    # untouched partitions were NOT recomputed
    for f, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out, f)) == m, f

    dec2 = pipeline.decode_dataset(checkpoint.read_job_output(out))
    got2 = pa.concat_tables(dec2.iter_batches(batch_format="pyarrow", batch_size=None))
    import pyarrow.compute as pc

    key = pc.sort_indices(got2.column("url"))
    key1 = pc.sort_indices(got.column("url"))
    for col in tbl.column_names:
        assert got2.take(key).column(col).equals(got.take(key1).column(col)), col


def test_manifest_lineage_and_metrics(ray_session, multi_rg_input, tmp_path):
    _, path = multi_rg_input
    out = str(tmp_path / "enc2")
    checkpoint.encode_job(path, out, target_partition_bytes=300_000)
    mdir = os.path.join(out, checkpoint.MANIFEST_DIR)
    manifests = [
        json.load(open(os.path.join(mdir, f)))
        for f in sorted(os.listdir(mdir))
        if f.startswith("part-")
    ]
    assert all("lineage" in m and m["lineage"] for m in manifests)
    assert all(m["enc_bytes"] > 0 and m["raw_bytes"] > m["enc_bytes"] for m in manifests)
    assert all("codecs" in m and m["codecs"].get("lang") for m in manifests)


def test_resume_byte_identical_parts(ray_session, multi_rg_input, tmp_path):
    """Re-encoded partitions after a crash are byte-identical to the
    originals (persisted codec plan + deterministic codecs)."""
    _, path = multi_rg_input
    out = str(tmp_path / "enc3")
    checkpoint.encode_job(path, out, target_partition_bytes=200_000)
    victim = f"{out}/part-00002.parquet"
    orig = open(victim, "rb").read()
    os.remove(victim)
    os.remove(f"{out}/{checkpoint.MANIFEST_DIR}/part-00002.json")
    checkpoint.encode_job(path, out, target_partition_bytes=200_000)
    assert open(victim, "rb").read() == orig


def test_resume_reencodes_on_input_change(ray_session, tmp_path):
    """Manifests whose recorded inputs no longer match the planned
    partition are re-encoded, not silently kept (advisor finding); a
    shrunken input set with orphan manifests is an error."""
    d = tmp_path / "in"
    d.mkdir()
    t1 = datagen.cc_pages(2000, seed=1)
    pq.write_table(t1, d / "a.parquet", row_group_size=500)
    out = str(tmp_path / "enc")
    s1 = checkpoint.encode_job(str(d), out, target_partition_bytes=150_000)
    assert s1["encoded"] == s1["partitions"]

    # add a file that sorts FIRST -> every partition boundary shifts
    t0 = datagen.cc_pages(1000, seed=2)
    pq.write_table(t0, d / "0first.parquet", row_group_size=500)
    s2 = checkpoint.encode_job(str(d), out, target_partition_bytes=150_000)
    assert s2["skipped"] == 0  # all stale manifests invalidated
    assert s2["n_rows"] == t0.num_rows + t1.num_rows

    # decoded output matches the new input exactly (no stale/dup rows)
    dec = pipeline.decode_dataset(checkpoint.read_job_output(out))
    got = pa.concat_tables(dec.iter_batches(batch_format="pyarrow", batch_size=None))
    assert got.num_rows == t0.num_rows + t1.num_rows

    # shrink the input set -> orphan manifests beyond the plan = error
    os.remove(d / "a.parquet")
    with pytest.raises(RuntimeError, match="beyond"):
        checkpoint.encode_job(str(d), out, target_partition_bytes=150_000)


def test_resume_invalidates_regenerated_input(ray_session, tmp_path):
    """Regression (ADVICE r2): an input file regenerated in place with
    the SAME row-group count used to pass the resume check, silently
    keeping stale outputs. Row-group byte sizes are now part of the
    partition identity, so the changed file re-encodes."""
    path = str(tmp_path / "pages.parquet")
    out = str(tmp_path / "encoded")
    tbl1 = datagen.cc_pages(1200, seed=21)
    pq.write_table(tbl1, path, row_group_size=300)  # 4 row groups
    s1 = checkpoint.encode_job(path, out, target_partition_bytes=100_000)
    assert s1["encoded"] == s1["partitions"] >= 2

    # regenerate in place: same schema, same row-group COUNT, new data
    tbl2 = datagen.cc_pages(1200, seed=22)
    pq.write_table(tbl2, path, row_group_size=300)
    s2 = checkpoint.encode_job(path, out, target_partition_bytes=100_000)
    assert s2["skipped"] == 0  # every partition re-encoded
    assert s2["n_rows"] == tbl2.num_rows

    dec = pipeline.decode_dataset(checkpoint.read_job_output(out))
    got = pa.concat_tables(dec.iter_batches(batch_format="pyarrow", batch_size=None))
    # decoded output reflects the NEW file, not stale partitions
    assert sorted(got.column("url").to_pylist()) == sorted(tbl2.column("url").to_pylist())
