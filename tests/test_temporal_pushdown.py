"""Timestamp predicates through the pushdown stack: zone-map stats
store epoch ints in the column's unit, so datetime predicate values
must be translated at every stats-comparison layer (stripe zone maps,
row-group min/max, file index) while the row mask still compares in
the value domain."""
import datetime
import tempfile

import numpy as np
import pyarrow as pa
import pytest


def _table(unit="us", tz=None, n=1000):
    base = np.datetime64("1995-01-01T00:00:00", unit)
    step = np.timedelta64(3600, "s").astype(f"timedelta64[{unit}]")
    ts = base + np.arange(n) * step
    t = pa.table({"id": pa.array(np.arange(n)), "ts": pa.array(ts)})
    if tz:
        t = t.set_column(1, "ts", t.column("ts").cast(pa.timestamp(unit, tz=tz)))
    return t


@pytest.mark.parametrize("unit,tz", [("us", None), ("ns", None), ("us", "UTC")])
def test_filter_encoded_timestamp(ray_session, unit, tz):
    import ray.data

    from mothray import pipeline

    t = _table(unit, tz)
    out = tempfile.mkdtemp(prefix=f"ts_push_{unit}_")
    pipeline.encode_dataset(ray.data.from_arrow(t)).write_parquet(out)
    cut = datetime.datetime(1995, 1, 15, tzinfo=datetime.timezone.utc if tz else None)
    got = pipeline.filter_encoded(out, "ts", "lt", cut).take_all()
    import pyarrow.compute as pc

    want = t.filter(pc.less(t.column("ts"), pa.scalar(cut))).num_rows
    assert len(got) == want > 0
    # conjunctive path + a no-overlap bound prunes to zero
    lo = datetime.datetime(1990, 1, 1, tzinfo=datetime.timezone.utc if tz else None)
    assert pipeline.filter_encoded_multi(out, [("ts", "lt", lo)]).count() == 0


def test_rg_predicate_datetime(ray_session):
    import ray.data

    from mothray import pipeline

    t = _table()
    enc = pipeline.encode_dataset(ray.data.from_arrow(t), opts={"row_group_rows": 100})
    cut = datetime.datetime(1995, 1, 3)
    dec = pipeline.decode_dataset(enc, rg_predicate=("ts", None, cut))
    # rg skipping is advisory (whole groups) — decoded superset, then
    # exact filter must equal the arrow-side count
    import pyarrow.compute as pc

    rows = dec.take_all()
    assert len(rows) < t.num_rows  # some row groups actually skipped
    exact = sum(1 for r in rows if r["ts"] <= cut)
    want = t.filter(pc.less_equal(t.column("ts"), pa.scalar(cut))).num_rows
    assert exact == want


def test_rg_predicate_date32(ray_session):
    """date32 predicates prune row groups in the StripeDecoder path too
    (stats store epoch-day ints; the decoder derives unit='D' just like
    filter_stripe's stat_bounds_for)."""
    import numpy as np
    import pyarrow.compute as pc
    import ray.data

    from mothray import pipeline

    days = pa.array(np.arange(1000, dtype=np.int32), pa.int32()).cast(pa.date32())
    t = pa.table({"d": days, "v": pa.array(np.arange(1000))})
    enc = pipeline.encode_dataset(ray.data.from_arrow(t), opts={"row_group_rows": 100})
    cut = datetime.date(1970, 4, 11)  # epoch day 100
    dec = pipeline.decode_dataset(enc, rg_predicate=("d", None, cut))
    rows = dec.take_all()
    assert len(rows) < t.num_rows  # row groups actually skipped, not a full decode
    exact = sum(1 for r in rows if r["d"] <= cut)
    want = t.filter(pc.less_equal(t.column("d"), pa.scalar(cut))).num_rows
    assert exact == want


def test_file_index_timestamp_prune(ray_session, tmp_path):
    import ray.data

    from mothray import pipeline

    out = str(tmp_path / "enc")
    ds = ray.data.from_arrow(_table())
    pipeline.encode_dataset(ds).write_parquet(out)
    pipeline.build_file_index(out)
    kept = pipeline._index_prune_files(
        out, "ts", None, datetime.datetime(1990, 1, 1)
    )
    assert kept == []  # every file's range is above the bound
    kept2 = pipeline._index_prune_files(
        out, "ts", datetime.datetime(1990, 1, 1), None
    )
    assert kept2  # lower bound below the range keeps files


def test_delete_where_timestamp_range(ray_session, tmp_path):
    import ray.data

    from mothray import pipeline

    t = _table(n=500)
    src = str(tmp_path / "src")
    pipeline.encode_dataset(ray.data.from_arrow(t)).write_parquet(src)
    out = str(tmp_path / "out")
    lo = datetime.datetime(1995, 1, 5)
    hi = datetime.datetime(1995, 1, 10)
    res = pipeline.delete_where(src, out, "ts", lo, hi)
    import pyarrow.compute as pc

    want_deleted = t.filter(
        pc.and_(pc.greater_equal(t.column("ts"), pa.scalar(lo)),
                pc.less_equal(t.column("ts"), pa.scalar(hi)))
    ).num_rows
    assert res["rows_deleted"] == want_deleted > 0
    left = pipeline.decode_dataset(pipeline.read_encoded(out))
    assert left.count() == t.num_rows - want_deleted


def test_date32_zone_map_prune_and_filter(ray_session, tmp_path):
    """date32 stats are epoch-day ints with unit 'D': zone maps prune,
    row-group selection works, exact filter counts match."""
    import ray.data

    from mothray import pipeline

    d = pa.array(np.arange(1000).astype("datetime64[D]"))
    t = pa.table({"id": pa.array(np.arange(1000)), "d": d})
    out = str(tmp_path / "dates")
    pipeline.encode_dataset(
        ray.data.from_arrow(t), opts={"row_group_rows": 100}
    ).write_parquet(out)
    cut = datetime.date(1970, 2, 1)
    assert pipeline.filter_encoded(out, "d", "lt", cut).count() == 31
    # datetime bound with a time-of-day: the zone-map day truncation is
    # conservative; the mask promotes date -> timestamp (SQL semantics),
    # so Feb 1 (midnight) < Feb 1 12:30 is included
    cutdt = datetime.datetime(1970, 2, 1, 12, 30)
    assert pipeline.filter_encoded(out, "d", "lt", cutdt).count() == 32
    # no-overlap bound prunes to zero via stats alone
    assert pipeline.filter_encoded(out, "d", "lt", datetime.date(1960, 1, 1)).count() == 0
    # metadata-only aggregate serves typed dates from the int stats
    agg = pipeline.agg_encoded(out, {"dmin": ("min", "d"), "dmax": ("max", "d")})
    assert agg.column("dmin")[0].as_py() == datetime.date(1970, 1, 1)
    assert agg.column("dmax")[0].as_py() == datetime.date(1972, 9, 26)


def test_explain_scan_reports_pruning(ray_session, tmp_path):
    """explain_scan counts each skipping level; a sorted dataset shows
    row-group pruning and fetched bytes << total."""
    import ray.data

    from mothray import pipeline

    t = _table(n=2000)
    raw = str(tmp_path / "raw")
    pipeline.encode_dataset(
        ray.data.from_arrow(t), opts={"row_group_rows": 200}
    ).write_parquet(raw)
    pipeline.build_file_index(raw)
    cut = datetime.datetime(1995, 1, 3)
    r = pipeline.explain_scan(raw, [("ts", "lt", cut)])
    assert r["stripes_total"] >= r["stripes_after_zonemaps"] >= 1
    assert r["row_groups_after_stats"] < r["row_groups_in_survivors"]
    assert 0 < r["stream_bytes_fetched"] < r["stream_bytes_total"]
    # non-overlapping predicate: file index drops everything
    r0 = pipeline.explain_scan(raw, [("ts", "lt", datetime.datetime(1990, 1, 1))])
    assert r0["stream_bytes_fetched"] == 0
