"""Property/fuzz coverage for the r5 features: nested-field projection
(random nested schemas, projected decode must equal the corresponding
slice of the full decode) and the IPC interchange (odd unit shapes)."""

import numpy as np
import pyarrow as pa
import pytest

from mothray import stripe as sm


def _rand_struct_type(rng, depth=0):
    fields = []
    n = rng.integers(2, 5)
    for i in range(n):
        r = rng.random()
        if depth < 2 and r < 0.3:
            fields.append((f"s{i}", _rand_struct_type(rng, depth + 1)))
        elif r < 0.5:
            fields.append((f"f{i}", pa.int64()))
        elif r < 0.7:
            fields.append((f"g{i}", pa.string()))
        else:
            fields.append((f"h{i}", pa.float64()))
    return pa.struct(fields)


def _rand_value(rng, t):
    if pa.types.is_struct(t):
        if rng.random() < 0.1:
            return None
        return {f.name: _rand_value(rng, f.type) for f in t}
    if pa.types.is_int64(t):
        return int(rng.integers(-1000, 1000))
    if pa.types.is_string(t):
        return "v%d" % rng.integers(0, 50)
    return float(rng.random())


def _leaf_paths(t, prefix=""):
    out = []
    for f in t:
        p = f"{prefix}{f.name}"
        if pa.types.is_struct(f.type):
            out.extend(_leaf_paths(f.type, p + "."))
        else:
            out.append(p)
    return out


def _get_path(v, path):
    for part in path.split("."):
        if v is None:
            return None
        v = v[part]
    return v


@pytest.mark.parametrize("seed", range(8))
def test_random_struct_projection_matches_full(seed):
    rng = np.random.default_rng(seed)
    t = _rand_struct_type(rng)
    n = 150
    vals = [_rand_value(rng, t) for _ in range(n)]
    tbl = pa.table({"id": pa.array(range(n), pa.int64()), "c": pa.array(vals, t)})
    enc = sm.encode_batch(tbl, {"stripe_rows": 10_000})
    row = {
        k: (
            memoryview(enc.column(k)[0].as_buffer()).cast("B")
            if k in ("blob", "blooms")
            else enc.column(k)[0].as_py()
        )
        for k in enc.column_names
    }
    paths = _leaf_paths(t)
    k = int(rng.integers(1, min(len(paths), 3) + 1))
    chosen = list(rng.choice(paths, size=k, replace=False))
    out = sm.decode_stripe(row, columns=["c." + p for p in chosen])
    full = sm.decode_stripe(row, columns=["c"]).column("c").to_pylist()
    got = out.column("c").to_pylist()
    for p in chosen:
        want = [_get_path(v, p) for v in full]
        have = [_get_path(v, p) for v in got]
        assert have == want, (p, seed)


def test_projection_with_row_groups():
    """Projection composes with row-group selection (both prune)."""
    n = 500
    t = pa.table(
        {
            "k": pa.array(range(n), pa.int64()),
            "s": pa.array(
                [{"a": i, "b": "x%d" % i} for i in range(n)],
                pa.struct([("a", pa.int64()), ("b", pa.string())]),
            ),
        }
    )
    enc = sm.encode_batch(t, {"stripe_rows": 10_000, "row_group_rows": 100})
    row = {
        k: (
            memoryview(enc.column(k)[0].as_buffer()).cast("B")
            if k in ("blob", "blooms")
            else enc.column(k)[0].as_py()
        )
        for k in enc.column_names
    }
    out = sm.decode_stripe(row, columns=["k", "s.a"], row_groups=[1, 3])
    ks = out.column("k").to_pylist()
    assert ks == list(range(100, 200)) + list(range(300, 400))
    assert [v["a"] for v in out.column("s").to_pylist()] == ks


def test_ipc_many_tiny_units_roundtrip(ray_session, tmp_path):
    """Tiny target_bytes → one .arrow file per row-group cluster; the
    clustered decode must see every unit exactly once."""
    import os

    import pyarrow.parquet as pq

    from mothray import pipeline

    n = 4000
    t = pa.table(
        {
            "i": pa.array(range(n), pa.int64()),
            "s": pa.array(["r%d" % (i % 17) for i in range(n)]),
        }
    )
    src = tmp_path / "in.parquet"
    pq.write_table(t, src, row_group_size=250)
    out = tmp_path / "enc"
    pipeline.encode_files_ipc(str(src), str(out), target_bytes=1 << 12).take_all()
    n_files = len([f for f in os.listdir(str(out)) if f.endswith(".arrow")])
    assert n_files > 4
    got = pa.Table.from_pylist(
        pipeline.decode_files(str(out)).take_all()
    ).sort_by("i")
    assert got.equals(t)


def test_ipc_all_null_and_empty_columns(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from mothray import pipeline

    t = pa.table(
        {
            "i": pa.array(range(64), pa.int64()),
            "n": pa.array([None] * 64, pa.string()),
            "f": pa.array([None] * 64, pa.float64()),
        }
    )
    src = tmp_path / "in.parquet"
    pq.write_table(t, src)
    out = tmp_path / "enc"
    pipeline.encode_files_ipc(str(src), str(out)).take_all()
    got = pa.Table.from_pylist(
        pipeline.decode_files(str(out)).take_all()
    ).sort_by("i")
    assert got.cast(t.schema).equals(t)
