"""json_to_columns vs DuckDB json_extract: typed scalar and nested
extraction, null/missing/extra-key semantics, and the malformed-input
guards."""

import duckdb
import pyarrow as pa
import pytest

from mothray.ops import jsoncol


def _ds(rows, parts=2):
    import ray.data

    t = pa.table({"id": pa.array(range(len(rows)), pa.int64()),
                  "js": pa.array(rows, pa.string())})
    return ray.data.from_arrow(t).repartition(parts), t


def test_scalar_fields_match_duckdb(ray_session):
    rows = [
        '{"k": 87, "name": "a", "ok": true, "score": 1.5}',
        '{"k": 0, "name": "b b", "ok": false}',
        '{"name": null, "extra": [1,2]}',
        None,
        '{"k": -3, "score": -0.25, "ok": null}',
        "{}",
    ]
    ds, t = _ds(rows)
    got = (
        jsoncol.json_to_columns(
            ds, "js",
            {"k": pa.int64(), "name": pa.string(), "ok": pa.bool_(), "score": pa.float64()},
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(
        """
        SELECT id,
          CAST(json_extract(js, '$.k') AS BIGINT) AS k,
          json_extract_string(js, '$.name') AS name,
          CAST(json_extract(js, '$.ok') AS BOOLEAN) AS ok,
          CAST(json_extract(js, '$.score') AS DOUBLE) AS score
        FROM t ORDER BY id
        """
    ).df()
    for c in ("k", "name", "ok", "score"):
        assert [None if v != v else v for v in got[c].where(got[c].notna(), None)] == [
            None if v != v else v for v in exp[c].where(exp[c].notna(), None)
        ], c


def test_nested_fields(ray_session):
    rows = ['{"a": {"b": 5}, "tags": ["x","y"]}', '{"a": {}}', '{"tags": []}']
    ds, _ = _ds(rows, parts=1)
    rows_out = jsoncol.json_to_columns(
        ds, "js",
        {"a": pa.struct([("b", pa.int64())]), "tags": pa.list_(pa.string())},
        drop_source=True,
    ).take_all()
    rows_out.sort(key=lambda r: r["id"])
    assert all("js" not in r for r in rows_out)
    assert [r["a"] for r in rows_out] == [{"b": 5}, {"b": None}, None]
    assert [list(r["tags"]) if r["tags"] is not None else None for r in rows_out] == [
        ["x", "y"], None, []
    ]


def test_malformed_raises_multiline_parses(ray_session):
    ds, _ = _ds(['{"k": 1}', "not json"], parts=1)
    with pytest.raises(Exception, match="not a JSON object"):
        jsoncol.json_to_columns(ds, "js", {"k": pa.int64()}).materialize()
    # object-shaped but malformed inside: caught by the parser itself
    ds_bad, _ = _ds(['{"k": 1}', '{"k": oops}'], parts=1)
    with pytest.raises(Exception, match="not parseable as JSON"):
        jsoncol.json_to_columns(ds_bad, "js", {"k": pa.int64()}).materialize()
    # two values split across two objects each: pretty-printed JSON
    # objects parse correctly (the reader consumes object sequences);
    # escaped \n inside strings never merges values
    ds2, _ = _ds(['{\n  "k": 1\n}', '{"k": 2, "s": "a\\nb"}'], parts=1)
    got = (
        jsoncol.json_to_columns(ds2, "js", {"k": pa.int64(), "s": pa.string()})
        .to_pandas()
        .sort_values("id")
    )
    assert got["k"].tolist() == [1, 2]
    assert got["s"].tolist()[1] == "a\nb"


def test_compensating_misalignment_rejected(ray_session):
    """A value holding TWO objects plus a whitespace-only value parse
    to exactly n rows — the shape guard must reject the zero-object
    value instead of silently misaligning (regression)."""
    ds, _ = _ds(['{"k":1} {"k":2}', "  ", '{"k":3}'], parts=1)
    with pytest.raises(Exception, match="not a JSON object"):
        jsoncol.json_to_columns(ds, "js", {"k": pa.int64()}).materialize()
    # and a two-object value alone now trips the row-count check
    ds2, _ = _ds(['{"k":1} {"k":2}', '{"k":3}'], parts=1)
    with pytest.raises(Exception, match="exactly one JSON object"):
        jsoncol.json_to_columns(ds2, "js", {"k": pa.int64()}).materialize()


def test_collision_and_type_guards(ray_session):
    ds, _ = _ds(['{"id": 5}'], parts=1)
    with pytest.raises(Exception, match="collide"):
        jsoncol.json_to_columns(ds, "js", {"id": pa.int64()}).materialize()
    import ray.data

    bad = ray.data.from_arrow(pa.table({"js": pa.array([1, 2], pa.int64())}))
    with pytest.raises(Exception, match="string column"):
        jsoncol.json_to_columns(bad, "js", {"k": pa.int64()}).materialize()
