"""Hive-partitioned encoded sink: directory-per-value layout,
whole-partition pruning, lossless round trip."""
import pyarrow as pa
import pyarrow.compute as pc
import pytest


@pytest.fixture()
def docs_ds(ray_session):
    import ray.data

    return ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")


def test_partitioned_roundtrip_and_prune(ray_session, docs_ds, tmp_path):
    import pyarrow.parquet as pq

    from mothray import pipeline

    out = str(tmp_path / "bylang")
    pipeline.encode_partitioned(docs_ds, out, "lang")

    src = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    langs = sorted(set(src.column("lang").to_pylist()))
    dirs = pipeline.encoded_partition_dirs(out)
    assert sorted(dirs) == langs  # one directory per value

    # single-partition read decodes exactly that language's rows
    one = pipeline.decode_dataset(pipeline.read_encoded_partitions(out, ["de"]))
    got = pa.Table.from_pylist(one.take_all())
    want = src.filter(pc.equal(src.column("lang"), "de"))
    assert got.num_rows == want.num_rows
    assert sorted(got.column("doc_id").to_pylist()) == sorted(want.column("doc_id").to_pylist())
    assert set(got.column("lang").to_pylist()) == {"de"}  # column kept in data

    # full read round-trips the corpus
    full = pipeline.decode_dataset(pipeline.read_encoded_partitions(out))
    assert full.count() == src.num_rows

    with pytest.raises(KeyError):
        pipeline.read_encoded_partitions(out, ["xx"])
