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


def test_partition_values_url_encoded(ray_session, tmp_path):
    """Writer URL-encodes unusual partition values in directory names;
    lookups still use the original values."""
    import ray.data

    from mothray import pipeline

    t = pa.table({"doc_id": [1, 2, 3], "text": ["a", "b", "c"], "k": ["a/b", "café", "x y"]})
    out = str(tmp_path / "edge")
    pipeline.encode_partitioned(ray.data.from_arrow(t), out, "k")
    dirs = pipeline.encoded_partition_dirs(out)
    assert sorted(dirs) == ["a/b", "café", "x y"]
    one = pipeline.decode_dataset(pipeline.read_encoded_partitions(out, ["a/b"])).take_all()
    assert [r["doc_id"] for r in one] == [1]


def test_partition_null_values_routed_not_dropped(ray_session, tmp_path):
    """NULL partition values land in __HIVE_DEFAULT_PARTITION__ (Hive
    convention) instead of silently vanishing from the encoded output."""
    import ray.data

    from mothray import pipeline

    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": ["a", "b", "c", "d", "e"],
            "k": pa.array(["en", None, "de", None, "en"], pa.string()),
        }
    )
    out = str(tmp_path / "withnull")
    pipeline.encode_partitioned(ray.data.from_arrow(t), out, "k")
    dirs = pipeline.encoded_partition_dirs(out)
    assert sorted(dirs) == ["__HIVE_DEFAULT_PARTITION__", "de", "en"]
    # no row lost: full decode round-trips all 5 rows, nulls intact
    full = pa.Table.from_pylist(
        pipeline.decode_dataset(pipeline.read_encoded_partitions(out)).take_all()
    )
    assert full.num_rows == 5
    assert sorted(full.column("doc_id").to_pylist()) == [1, 2, 3, 4, 5]
    null_rows = full.filter(pc.is_null(full.column("k")))
    assert sorted(null_rows.column("doc_id").to_pylist()) == [2, 4]
    only_null = pipeline.decode_dataset(
        pipeline.read_encoded_partitions(out, ["__HIVE_DEFAULT_PARTITION__"])
    ).take_all()
    assert sorted(r["doc_id"] for r in only_null) == [2, 4]


def test_compact_partitioned(ray_session, docs_ds, tmp_path):
    from mothray import pipeline

    out = str(tmp_path / "p")
    pipeline.encode_partitioned(docs_ds, out, "lang")
    comp = str(tmp_path / "c")
    res = pipeline.compact_partitioned(out, comp)
    assert res["partitions"] == len(pipeline.encoded_partition_dirs(out))
    assert res["files_out"] <= res["files_in"]
    assert sorted(pipeline.encoded_partition_dirs(comp)) == sorted(
        pipeline.encoded_partition_dirs(out)
    )
    a = pipeline.decode_dataset(pipeline.read_encoded_partitions(out)).count()
    b = pipeline.decode_dataset(pipeline.read_encoded_partitions(comp)).count()
    assert a == b
