"""Predicated aggregate pushdown with boundary refinement: interior
stripes answer from stats, only straddling stripes decode."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def encoded_sorted_nulls(ray_session, tmp_path):
    from mothray import pipeline

    n = 5000
    vals = np.arange(n).astype(object)
    vals[::97] = None  # sprinkle nulls
    src = tmp_path / "s.parquet"
    pq.write_table(pa.table({"x": pa.array(list(vals), pa.float64())}), src)
    enc = str(tmp_path / "enc")
    pipeline.encode_parquet_to_dir(str(src), enc, opts={"stripe_rows": 500})
    return enc, vals


def test_agg_where_exact_and_mostly_metadata(ray_session, encoded_sorted_nulls):
    from mothray import pipeline

    enc, vals = encoded_sorted_nulls
    out, rep = pipeline.agg_where_encoded(enc, "x", 750.0, 4200.0)
    match = [v for v in vals if v is not None and 750.0 <= v <= 4200.0]
    assert out.column("cnt")[0].as_py() == len(match)
    assert out.column("min_v")[0].as_py() == min(match)
    assert out.column("max_v")[0].as_py() == max(match)
    # sorted layout: only the two range-boundary stripes decode; the
    # rest answer from stats or fall fully outside
    assert rep["stripes_decoded"] <= 2
    assert rep["stripes_metadata_only"] >= 6
    assert (
        rep["stripes_metadata_only"] + rep["stripes_decoded"] + rep["stripes_outside"]
        == rep["stripes_total"]
    )


def test_agg_where_empty_and_open_ranges(ray_session, encoded_sorted_nulls):
    from mothray import pipeline

    enc, vals = encoded_sorted_nulls
    out, rep = pipeline.agg_where_encoded(enc, "x", 10**9, None)
    assert out.column("cnt")[0].as_py() == 0
    assert out.column("min_v")[0].as_py() is None
    assert rep["stripes_decoded"] == 0
    nn = [v for v in vals if v is not None]
    out2, _ = pipeline.agg_where_encoded(enc, "x", None, None)
    assert out2.column("cnt")[0].as_py() == len(nn)
    out3, _ = pipeline.agg_where_encoded(enc, "x", 4900.0, None)
    want = [v for v in nn if v >= 4900.0]
    assert out3.column("cnt")[0].as_py() == len(want)
    assert out3.column("max_v")[0].as_py() == max(want)


def test_agg_where_rejects_non_numeric(ray_session, tmp_path):
    from mothray import pipeline

    src = tmp_path / "t.parquet"
    pq.write_table(pa.table({"s": pa.array(["a", "b"])}), src)
    enc = str(tmp_path / "enc")
    pipeline.encode_parquet_to_dir(str(src), enc)
    with pytest.raises(ValueError):
        pipeline.agg_where_encoded(enc, "s", "a", "b")


def test_quantile_bounds_bracket_exact_quantile(ray_session, tmp_path):
    import numpy as _np

    from mothray import pipeline

    rng = _np.random.default_rng(3)
    vals = rng.normal(100, 25, 6000)
    src = tmp_path / "q.parquet"
    pq.write_table(pa.table({"x": pa.array(vals, pa.float64())}), src)
    enc = str(tmp_path / "enc_q")
    pipeline.encode_parquet_to_dir(str(src), enc, opts={"stripe_rows": 500})
    s = _np.sort(vals)
    for q in (0.1, 0.5, 0.9):
        b = pipeline.quantile_bounds_encoded(enc, "x", q)
        exact = s[max(1, int(-(-q * len(s) // 1))) - 1]  # ceil(qN), 1-based
        assert b["lower"] <= exact <= b["upper"], (q, b, exact)
    # clustered layout: the interval tightens to ~one stripe's range
    enc2 = str(tmp_path / "enc_sorted")
    pq.write_table(pa.table({"x": pa.array(_np.sort(vals), pa.float64())}),
                   tmp_path / "qs.parquet")
    pipeline.encode_parquet_to_dir(str(tmp_path / "qs.parquet"), enc2,
                                   opts={"stripe_rows": 500})
    loose = pipeline.quantile_bounds_encoded(enc, "x", 0.5)
    tight = pipeline.quantile_bounds_encoded(enc2, "x", 0.5)
    assert (tight["upper"] - tight["lower"]) < (loose["upper"] - loose["lower"])
    exact = s[max(1, int(-(-0.5 * len(s) // 1))) - 1]
    assert tight["lower"] <= exact <= tight["upper"]
