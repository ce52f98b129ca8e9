"""encoded_union_schema: union-by-name schema derivation across
heterogeneous encoded stripes + padded decode."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _enc(tmp_path, name, tbl):
    from mothray import pipeline

    src = tmp_path / f"{name}.parquet"
    pq.write_table(tbl, src)
    out = str(tmp_path / f"enc_{name}")
    pipeline.encode_parquet_to_dir(str(src), out)
    import os

    return [
        os.path.join(out, f) for f in sorted(os.listdir(out)) if f.endswith(".parquet")
    ]


def test_union_schema_and_padded_decode(ray_session, tmp_path):
    from mothray import pipeline

    f1 = _enc(
        tmp_path,
        "a",
        pa.table({"id": pa.array([1, 2], pa.int64()), "x": pa.array(["a", "b"])}),
    )
    f2 = _enc(
        tmp_path,
        "b",
        pa.table(
            {
                "id": pa.array([3], pa.int64()),
                "x": pa.array(["c"]),
                "y": pa.array([9.5], pa.float64()),
            }
        ),
    )
    files = f1 + f2
    sch = pipeline.encoded_union_schema(files)
    assert sch.names == ["id", "x", "y"]
    assert sch.field("y").type == pa.float64()
    rows = sorted(
        pipeline.decode_dataset(
            pipeline.read_encoded(files), target_schema=sch
        ).take_all(),
        key=lambda r: r["id"],
    )
    assert rows == [
        {"id": 1, "x": "a", "y": None},
        {"id": 2, "x": "b", "y": None},
        {"id": 3, "x": "c", "y": 9.5},
    ]


def test_union_schema_type_conflict_raises(ray_session, tmp_path):
    from mothray import pipeline

    f1 = _enc(tmp_path, "c", pa.table({"id": pa.array([1], pa.int64())}))
    f2 = _enc(tmp_path, "d", pa.table({"ID": pa.array(["x"], pa.string())}))
    with pytest.raises(TypeError, match="stored as both"):
        pipeline.encoded_union_schema(f1 + f2)
