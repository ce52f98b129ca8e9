"""Nested-field projection (reference ProjectedLayout,
/root/reference/pkg/store/MothReader.go:184-255): decode only the
requested struct SUBFIELDS' streams — sibling subfields' stream bytes
are never decompressed."""

import pyarrow as pa
import pytest

from mothray import stripe as sm
from mothray.codecs import frames


def _struct_table(n=200):
    return pa.table(
        {
            "id": pa.array(range(n), pa.int64()),
            "props": pa.array(
                [
                    {
                        "user_id": i,
                        "country": "c%d" % (i % 5),
                        "deep": {"x": i * 2, "y": i * 3},
                    }
                    if i % 7
                    else None
                    for i in range(n)
                ],
                pa.struct(
                    [
                        ("user_id", pa.int64()),
                        ("country", pa.string()),
                        ("deep", pa.struct([("x", pa.int64()), ("y", pa.int64())])),
                    ]
                ),
            ),
        }
    )


def _stripe_row(t, opts=None):
    enc = sm.encode_batch(t, {"stripe_rows": 10_000, **(opts or {})})
    assert enc.num_rows == 1
    return {
        k: (
            memoryview(enc.column(k)[0].as_buffer()).cast("B")
            if k in ("blob", "blooms")
            else enc.column(k)[0].as_py()
        )
        for k in enc.column_names
    }


def test_projected_values_match_full_decode():
    t = _struct_table()
    row = _stripe_row(t)
    full = sm.decode_stripe(row, columns=["props"]).column("props").combine_chunks()
    out = sm.decode_stripe(row, columns=["props.user_id"])
    assert out.schema == pa.schema(
        [("props", pa.struct([("user_id", pa.int64())]))]
    )
    proj = out.column("props").combine_chunks()
    assert proj.field("user_id").equals(full.field("user_id"))
    assert proj.null_count == full.null_count


def test_deep_projection_and_grouping():
    t = _struct_table()
    row = _stripe_row(t)
    out = sm.decode_stripe(row, columns=["id", "props.deep.y", "props.user_id"])
    assert out.column_names == ["id", "props"]
    props = out.column("props").combine_chunks()
    assert [f.name for f in props.type] == ["deep", "user_id"]
    full = sm.decode_stripe(row, columns=["props"]).column("props").combine_chunks()
    assert props.field("deep").field("y").equals(full.field("deep").field("y"))
    assert props.field("user_id").equals(full.field("user_id"))
    assert out.column("id").combine_chunks().equals(t.column("id").combine_chunks())


def test_sibling_streams_never_decompressed(monkeypatch):
    """The contract: projecting one subfield touches that subfield's
    streams (+ the struct node's own PRESENT), nothing else."""
    t = _struct_table()
    row = _stripe_row(t)

    calls: list[int] = []
    orig = frames.decompress

    def counting(framed, codec, raw):
        calls.append(len(framed))
        return orig(framed, codec, raw)

    monkeypatch.setattr(frames, "decompress", counting)
    monkeypatch.setattr(sm.frames, "decompress", counting)

    sm.decode_stripe(row, columns=["props.user_id"])
    n_proj = len(calls)
    calls.clear()
    sm.decode_stripe(row, columns=["props"])
    n_full = len(calls)
    # full struct decode touches user_id + country(2 streams) + deep.x +
    # deep.y + PRESENT; projection touches user_id + PRESENT only
    assert n_proj < n_full
    assert n_proj <= 2


def test_whole_column_wins_over_subset():
    t = _struct_table()
    row = _stripe_row(t)
    out = sm.decode_stripe(row, columns=["props.user_id", "props"])
    props = out.column("props").combine_chunks()
    assert [f.name for f in props.type] == ["user_id", "country", "deep"]


def test_projection_errors():
    t = _struct_table()
    row = _stripe_row(t)
    with pytest.raises(KeyError):
        sm.decode_stripe(row, columns=["props.nope"])
    with pytest.raises(KeyError):
        sm.decode_stripe(row, columns=["missing.x"])
    with pytest.raises(TypeError):
        sm.decode_stripe(row, columns=["id.x"])


def test_projection_through_list_of_struct():
    """Dotted projection passes through list levels: items.price on
    list<struct> decodes only the price child's streams."""
    n = 120
    t = pa.table(
        {
            "id": pa.array(range(n), pa.int64()),
            "items": pa.array(
                [
                    [
                        {"sku": f"s{i}-{j}", "price": i * 10 + j, "qty": j}
                        for j in range(i % 4)
                    ]
                    for i in range(n)
                ],
                pa.list_(
                    pa.struct(
                        [("sku", pa.string()), ("price", pa.int64()), ("qty", pa.int64())]
                    )
                ),
            ),
        }
    )
    row = _stripe_row(t)
    full = sm.decode_stripe(row, columns=["items"]).column("items").combine_chunks()
    out = sm.decode_stripe(row, columns=["id", "items.price"])
    items = out.column("items").combine_chunks()
    assert items.type == pa.list_(pa.struct([("price", pa.int64())]))
    assert items.values.field("price").equals(full.values.field("price"))
    assert pa.compute.list_value_length(items).equals(
        pa.compute.list_value_length(full)
    )

    calls: list[int] = []
    orig = sm.frames.decompress

    def counting(framed, codec, raw):
        calls.append(len(framed))
        return orig(framed, codec, raw)

    sm.frames.decompress = counting
    try:
        sm.decode_stripe(row, columns=["items.price"])
        n_proj = len(calls)
        calls.clear()
        sm.decode_stripe(row, columns=["items"])
        n_full = len(calls)
    finally:
        sm.frames.decompress = orig
    # full: LENGTH + sku(2 streams) + price + qty; projected: LENGTH + price
    assert n_proj < n_full and n_proj <= 2


def test_projection_through_decode_files(ray_session, tmp_path):
    """End-to-end: encode to the IPC interchange, decode with a dotted
    projection through the public decode_files API."""
    import pyarrow.parquet as pq

    import ray  # noqa: F401

    from mothray import pipeline

    t = _struct_table(500)
    src = tmp_path / "in.parquet"
    pq.write_table(t, src)
    out = tmp_path / "enc"
    pipeline.encode_files_ipc(str(src), str(out)).take_all()
    dec = pipeline.decode_files(str(out), columns=["id", "props.user_id"])
    got = pa.Table.from_pylist(dec.take_all()).sort_by("id")
    assert got.column_names == ["id", "props"]
    full = sm.decode_batch(
        pa.Table.from_pylist(
            pipeline.read_encoded(str(out)).take_all(), schema=sm.STRIPE_SCHEMA
        )
    )
    want = [
        None if v is None else v["user_id"]
        for v in full.column("props").to_pylist()
    ]
    assert [None if v is None else v["user_id"] for v in got.column("props").to_pylist()] == want
