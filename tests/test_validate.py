"""Tests for the data-quality validation op (ops/validate.py)."""

import numpy as np
import pyarrow as pa

from mothray.ops.validate import validate


def _viol(t: pa.Table) -> dict:
    return {(r["rule"], r["col"]): r["violations"] for r in t.to_pylist()}


def test_validate_planted_violations(ray_session):
    """Each rule kind counts exactly its planted violations; nulls
    never violate range/regex/in_set/foreign_key (SQL semantics)."""
    import ray.data

    tbl = pa.table(
        {
            "id": pa.array([1, 1, 2, 3, None], pa.int64()),
            "v": pa.array([5.0, -1.0, 99.0, None, 3.0]),
            "s": pa.array(["ok", "bad", "ok", None, "zz"], pa.string()),
            "fk": pa.array([10, 11, 99, None, 10], pa.int64()),
        }
    )
    parent = ray.data.from_arrow(pa.table({"pk": pa.array([10, 11], pa.int64())}))
    got = _viol(
        validate(
            ray.data.from_arrow(tbl).repartition(3),
            [
                {"rule": "not_null", "column": "id"},
                {"rule": "unique", "columns": ["id"]},
                {"rule": "range", "column": "v", "min": 0.0, "max": 50.0},
                {"rule": "in_set", "column": "s", "values": ["ok"]},
                {"rule": "regex", "column": "s", "pattern": "^o"},
                {"rule": "foreign_key", "column": "fk", "ref": parent, "ref_column": "pk"},
            ],
        )
    )
    assert got == {
        ("not_null", "id"): 1,
        # ids (1,1,2,3,NULL): COUNT(*)=5 - COUNT(DISTINCT id)=3 -> 2
        # (one extra copy of 1, plus the null row which SQL DISTINCT
        # never counts)
        ("unique", "id"): 2,
        ("range", "v"): 2,  # -1 below, 99 above; null exempt
        ("in_set", "s"): 2,  # bad, zz; null exempt
        ("regex", "s"): 2,
        ("foreign_key", "fk"): 1,  # 99 unreferenced; null exempt
    }


def test_validate_unique_nulls_match_sql(ray_session):
    """COUNT(*) - COUNT(DISTINCT k) with many nulls: each null row is
    a violation (SQL DISTINCT ignores nulls entirely)."""
    import duckdb
    import ray.data

    tbl = pa.table({"k": pa.array([1, 1, None, None, None], pa.int64())})
    got = _viol(validate(ray.data.from_arrow(tbl).repartition(2), [{"rule": "unique", "columns": ["k"]}]))
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.execute("SELECT COUNT(*) - COUNT(DISTINCT k) FROM t").fetchone()[0]
    assert got[("unique", "k")] == exp == 4


def test_validate_clean_and_multicolumn_unique(ray_session):
    """A clean table reports all zeros; uniqueness over a column PAIR
    counts duplicate tuples, not duplicate single columns."""
    import ray.data

    tbl = pa.table(
        {
            "a": pa.array([1, 1, 2, 2], pa.int64()),
            "b": pa.array(["x", "y", "x", "y"], pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(2)
    got = _viol(
        validate(
            ds,
            [
                {"rule": "not_null", "column": "a"},
                {"rule": "unique", "columns": ["a"]},
                {"rule": "unique", "columns": ["a", "b"]},
            ],
        )
    )
    assert got[("not_null", "a")] == 0
    assert got[("unique", "a")] == 2  # two extra copies of single-col keys
    assert got[("unique", "a,b")] == 0  # all (a, b) tuples distinct


def test_validate_fk_empty_parent(ray_session):
    """An EMPTY parent side means every non-null child key is an
    orphan — the union+groupby shape handles it (a join would not)."""
    import ray.data

    child = ray.data.from_arrow(pa.table({"fk": pa.array([1, 2, 2, None], pa.int64())}))
    parent = ray.data.from_arrow(pa.table({"pk": pa.array([], pa.int64())}))
    got = _viol(
        validate(child, [{"rule": "foreign_key", "column": "fk", "ref": parent, "ref_column": "pk"}])
    )
    assert got[("foreign_key", "fk")] == 3


def test_validate_matches_duckdb_on_random_data(ray_session):
    """Randomized cross-check of every rule against its SQL form."""
    import duckdb
    import ray.data

    rng = np.random.default_rng(23)
    n = 3000
    tbl = pa.table(
        {
            "k": pa.array(rng.integers(0, 1000, n), pa.int64()),
            "x": pa.array(
                [None if i % 17 == 0 else float(v) for i, v in enumerate(rng.normal(50, 30, n))]
            ),
            "c": pa.array([f"c{v}" for v in rng.integers(0, 8, n)], pa.string()),
        }
    )
    parent = pa.table({"pk": pa.array(np.arange(0, 900), pa.int64())})
    got = _viol(
        validate(
            ray.data.from_arrow(tbl).repartition(7),
            [
                {"rule": "unique", "columns": ["k"]},
                {"rule": "range", "column": "x", "min": 0.0, "max": 100.0},
                {"rule": "in_set", "column": "c", "values": ["c0", "c1", "c2"]},
                {"rule": "regex", "column": "c", "pattern": "^c[0-3]$"},
                {
                    "rule": "foreign_key",
                    "column": "k",
                    "ref": ray.data.from_arrow(parent),
                    "ref_column": "pk",
                },
            ],
        )
    )
    con = duckdb.connect()
    con.register("t", tbl)
    con.register("p", parent)
    uq, rg, inset, rx, fk = con.execute(
        "SELECT COUNT(*) - COUNT(DISTINCT k),"
        " COUNT(*) FILTER (x < 0 OR x > 100),"
        " COUNT(*) FILTER (c NOT IN ('c0','c1','c2')),"
        " COUNT(*) FILTER (NOT regexp_matches(c, '^c[0-3]$')),"
        " (SELECT COUNT(*) FROM t WHERE k NOT IN (SELECT pk FROM p)) FROM t"
    ).fetchone()
    assert got[("unique", "k")] == uq
    assert got[("range", "x")] == rg
    assert got[("in_set", "c")] == inset
    assert got[("regex", "c")] == rx
    assert got[("foreign_key", "k")] == fk


def test_validate_unique_binary_keys(ray_session):
    """Uniqueness over a binary column with non-UTF8 bytes hashes raw
    bytes (no string cast), single- and multi-column."""
    import ray.data

    tbl = pa.table(
        {
            "b": pa.array([b"\xff\xfe", b"\xff\xfe", b"ok", None], pa.binary()),
            "k": pa.array([1, 1, 2, 3], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(2)
    got = _viol(
        validate(
            ds,
            [
                {"rule": "unique", "columns": ["b"]},
                {"rule": "unique", "columns": ["b", "k"]},
            ],
        )
    )
    # b: 4 rows - 2 distinct non-null = 2; (b,k): 4 - 2 distinct = 2
    assert got[("unique", "b")] == 2
    assert got[("unique", "b,k")] == 2


def test_validate_encoded_stats_fast_path(ray_session, tmp_path):
    """not_null is answered purely from stripe stats; range counts
    proven-clean and proven-all-violating stripes from metadata and
    decodes ONLY the straddling stripes — totals match validate() on
    the decoded data exactly."""
    import ray.data

    from mothray import pipeline
    from mothray.ops.validate import validate_encoded

    import pytest as _pytest

    # three value regimes so stripes hit all three verdicts
    tbl = pa.table(
        {
            "x": pa.array(
                list(range(0, 50))        # clean [0, 49]
                + list(range(1000, 1050))  # all above max
                + [25, 999, 30, 1001, None, 40] * 5,  # straddling + nulls
                pa.int64(),
            )
        }
    )
    enc_dir = str(tmp_path / "enc")
    pipeline.write_encoded(
        pipeline.encode_dataset(ray.data.from_arrow(tbl).repartition(3)), enc_dir
    )
    got = {
        (r["rule"], r["col"]): r["violations"]
        for r in validate_encoded(
            enc_dir,
            [
                {"rule": "not_null", "column": "x"},
                {"rule": "range", "column": "x", "min": 0, "max": 500},
            ],
        ).to_pylist()
    }
    vals = tbl["x"].to_pylist()
    exp_nulls = sum(v is None for v in vals)
    exp_range = sum(v is not None and (v < 0 or v > 500) for v in vals)
    assert got[("not_null", "x")] == exp_nulls
    assert got[("range", "x")] == exp_range
    with _pytest.raises(ValueError):
        validate_encoded(enc_dir, [{"rule": "unique", "column": "x"}])


def test_validate_encoded_temporal_and_unknown_column(ray_session, tmp_path):
    """Range bounds on date columns translate into the epoch-int stats
    domain (no raw int-vs-date compare); unknown columns raise instead
    of silently passing."""
    import datetime

    import ray.data

    import pytest as _pytest

    from mothray import pipeline
    from mothray.ops.validate import validate_encoded

    base = datetime.date(2024, 1, 1)
    days = [base + datetime.timedelta(days=i) for i in range(120)]
    tbl = pa.table({"d": pa.array(days, pa.date32())})
    enc_dir = str(tmp_path / "enc")
    pipeline.write_encoded(
        pipeline.encode_dataset(ray.data.from_arrow(tbl).repartition(3)), enc_dir
    )
    cut = datetime.date(2024, 3, 1)
    got = {
        (r["rule"], r["col"]): r["violations"]
        for r in validate_encoded(
            enc_dir, [{"rule": "range", "column": "d", "max": cut}]
        ).to_pylist()
    }
    exp = sum(d > cut for d in days)
    assert got[("range", "d")] == exp
    with _pytest.raises(KeyError):
        validate_encoded(enc_dir, [{"rule": "not_null", "column": "nope"}])


def test_validate_encoded_randomized_vs_decoded(ray_session, tmp_path):
    """Differential fuzz: for random tables/stripe layouts/bounds, the
    metadata-first counts equal validate() on the decoded data."""
    import ray.data

    from mothray import pipeline
    from mothray.ops.validate import validate, validate_encoded

    rng = np.random.default_rng(77)
    for trial in range(4):
        n = int(rng.integers(200, 800))
        x = rng.integers(-1000, 1000, n).astype(float)
        x[rng.random(n) < 0.1] = np.nan  # -> nulls via masked array build
        mask = np.isnan(x)
        tbl = pa.table(
            {
                "i": pa.array(rng.integers(0, 100, n), pa.int64()),
                "f": pa.array(np.where(mask, 0.0, x), mask=mask),
            }
        )
        enc_dir = str(tmp_path / f"enc{trial}")
        parts = int(rng.integers(1, 6))
        pipeline.write_encoded(
            pipeline.encode_dataset(ray.data.from_arrow(tbl).repartition(parts)), enc_dir
        )
        lo = float(rng.integers(-1200, 0))
        hi = float(rng.integers(0, 1200))
        rules = [
            {"rule": "not_null", "column": "f"},
            {"rule": "range", "column": "f", "min": lo, "max": hi},
            {"rule": "range", "column": "i", "min": 10, "max": 90},
        ]
        got = {
            (r["rule"], r["col"]): r["violations"]
            for r in validate_encoded(enc_dir, rules).to_pylist()
        }
        exp = {
            (r["rule"], r["col"]): r["violations"]
            for r in validate(ray.data.from_arrow(tbl), rules).to_pylist()
        }
        assert got == exp, (trial, got, exp)
