"""Surgical ADD COLUMN on encoded data: correctness of the computed
column, byte-level passthrough of untouched columns, and validation
errors."""

import json

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest


def _encode(tmp_path, tbl: pa.Table, sub: str):
    import ray.data

    from mothray import pipeline

    src = str(tmp_path / f"{sub}.parquet")
    pq.write_table(tbl, src)
    out = str(tmp_path / sub)
    pipeline.write_encoded(
        pipeline.encode_dataset(ray.data.read_parquet(src)), out
    )
    return out


def test_add_column_values_and_passthrough(ray_session, tmp_path):
    from mothray import pipeline

    n = 1000
    tbl = pa.table(
        {
            "id": pa.array(range(n), pa.int64()),
            "txt": pa.array([f"row-{i % 37}" * (i % 5 + 1) for i in range(n)]),
            "x": pa.array([float(i) * 0.5 for i in range(n)]),
        }
    )
    enc = _encode(tmp_path, tbl, "enc")
    out = str(tmp_path / "out")
    pipeline.add_column_encoded(
        enc,
        out,
        "txt_len",
        lambda t: pc.cast(pc.utf8_length(t.column("txt")), pa.int64()),
        ["txt"],
    )
    dec = pa.Table.from_pylist(pipeline.decode_files(out).take_all())
    got = dict(zip(dec.column("id").to_pylist(), dec.column("txt_len").to_pylist()))
    for i, s in enumerate(tbl.column("txt").to_pylist()):
        assert got[i] == len(s)
    # untouched columns survive bit-identically
    dec_sorted = dec.sort_by("id")
    for col in ("id", "txt", "x"):
        assert dec_sorted.column(col).to_pylist() == tbl.column(col).to_pylist()
    # existing columns' stream bytes must be UNCHANGED (memcpy, not
    # re-encode): compare per-column stream byte slices before/after
    import glob

    def stream_bytes(d, keep_cols):
        out_b = {}
        for f in sorted(glob.glob(f"{d}/*.parquet")):
            t = pq.read_table(f)
            for i in range(t.num_rows):
                meta = json.loads(t.column("meta")[i].as_py())
                blob = t.column("blob")[i].as_py()
                key = t.column("stripe_key")[i].as_py().rstrip("a")

                def walk(tree, acc):
                    for s in tree["streams"]:
                        acc.append(bytes(blob[s["off"]: s["off"] + s["len"]]))
                    for c in tree["children"]:
                        walk(c, acc)

                for col in keep_cols:
                    acc: list = []
                    for tree in meta["columns"][col]["row_groups"]:
                        walk(tree, acc)
                    out_b[(key, col)] = b"".join(acc)
        return out_b

    before = stream_bytes(enc, ["id", "txt", "x"])
    after = stream_bytes(out, ["id", "txt", "x"])
    assert before == after


def test_add_column_validation(ray_session, tmp_path):
    from mothray import pipeline

    tbl = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
    enc = _encode(tmp_path, tbl, "enc2")
    with pytest.raises(ValueError, match="already exists"):
        pipeline.add_column_encoded(
            enc, str(tmp_path / "o1"), "a", lambda t: t.column("a"), ["a"]
        )
    with pytest.raises(KeyError, match="not in encoded dataset"):
        pipeline.add_column_encoded(
            enc, str(tmp_path / "o2"), "b", lambda t: t.column("zz"), ["zz"]
        )
