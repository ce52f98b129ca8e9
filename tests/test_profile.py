"""Tests for the distributed per-column profiler (ops/profile.py)."""

import numpy as np
import pyarrow as pa
import pytest

from mothray.ops.profile import _pair_unique, profile


def _rows(t: pa.Table) -> dict:
    return {r["col"]: r for r in t.to_pylist()}


def test_profile_matches_duckdb(ray_session):
    """Full value match (count/nulls/distinct/min/max) against DuckDB
    over a mixed-type table with nulls, across several blocks."""
    import duckdb
    import ray.data

    rng = np.random.default_rng(7)
    n = 2000
    ints = rng.integers(-50, 50, n)
    strs = np.array([f"k{v}" for v in rng.integers(0, 37, n)], dtype=object)
    tbl = pa.table(
        {
            "a": pa.array([None if i % 7 == 0 else int(v) for i, v in enumerate(ints)], pa.int64()),
            "b": pa.array([None if i % 11 == 0 else s for i, s in enumerate(strs)], pa.string()),
            "c": pa.array(rng.normal(size=n)),
        }
    )
    got = _rows(profile(ray.data.from_arrow(tbl).repartition(8)))
    con = duckdb.connect()
    con.register("t", tbl)
    for c in ["a", "b", "c"]:
        cnt, nulls, nd, mn, mx = con.execute(
            f"SELECT COUNT(*), COUNT(*) - COUNT({c}), COUNT(DISTINCT {c}),"
            f" MIN({c}), MAX({c}) FROM t"
        ).fetchone()
        r = got[c]
        assert r["cnt"] == cnt and r["null_count"] == nulls and r["n_distinct"] == nd, (c, r)
        assert r["min_val"] == str(mn) and r["max_val"] == str(mx), (c, r)


def test_profile_typed_min_max_not_string_ordered(ray_session):
    """Min/max combine in the column's own type: 9 < 10 numerically
    even though '9' > '10' lexically — the classic stringly-typed
    profiling bug."""
    import ray.data

    tbl = pa.table({"x": pa.array([10, 9, 100, 2], pa.int64())})
    r = _rows(profile(ray.data.from_arrow(tbl).repartition(4)))["x"]
    assert r["min_val"] == "2" and r["max_val"] == "100"


def test_profile_all_null_and_nested_columns(ray_session):
    """An all-null column reports nulls == cnt with null min/max; a
    nested (list) column still counts nulls but reports null
    min/max/n_distinct instead of failing."""
    import ray.data

    tbl = pa.table(
        {
            "dead": pa.array([None, None, None], pa.string()),
            "lst": pa.array([[1, 2], None, [3]], pa.list_(pa.int64())),
        }
    )
    got = _rows(profile(ray.data.from_arrow(tbl)))
    assert got["dead"]["cnt"] == 3 and got["dead"]["null_count"] == 3
    assert got["dead"]["min_val"] is None and got["dead"]["max_val"] is None
    assert got["dead"]["n_distinct"] == 0
    assert got["lst"]["null_count"] == 1
    assert got["lst"]["n_distinct"] is None
    assert got["lst"]["min_val"] is None


def test_profile_unknown_column_raises(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({"x": pa.array([1], pa.int64())}))
    with pytest.raises(KeyError):
        profile(ds, columns=["nope"])


def test_pair_unique():
    h1 = np.array([1, 1, 2, 2, 1], dtype=np.uint64)
    h2 = np.array([5, 5, 6, 7, 9], dtype=np.uint64)
    u1, u2 = _pair_unique(h1, h2)
    assert sorted(zip(u1.tolist(), u2.tolist())) == [(1, 5), (1, 9), (2, 6), (2, 7)]


def test_profile_encoded_metadata_only(ray_session, tmp_path):
    """profile_encoded answers from stripe stats alone and agrees with
    the full profile() on count/nulls/min/max (n_distinct null by
    design — not in writer metadata)."""
    import ray.data

    from mothray import pipeline
    from mothray.ops.profile import profile_encoded

    tbl = pa.table(
        {
            "k": pa.array([3, 1, None, 7, 5], pa.int64()),
            "s": pa.array(["b", "a", "c", None, "a"], pa.string()),
        }
    )
    enc_dir = str(tmp_path / "enc")
    pipeline.write_encoded(pipeline.encode_dataset(ray.data.from_arrow(tbl)), enc_dir)
    got = _rows(profile_encoded(enc_dir, ["k", "s"]))
    assert got["k"]["cnt"] == 5 and got["k"]["null_count"] == 1
    assert got["k"]["min_val"] == "1" and got["k"]["max_val"] == "7"
    assert got["s"]["min_val"] == "a" and got["s"]["max_val"] == "c"
    assert got["k"]["n_distinct"] is None and got["s"]["n_distinct"] is None


def test_profile_empty_dataset(ray_session):
    """An empty input (a real corpus-triage case: a 0-row partition)
    reports zeros, not a crash."""
    import ray.data

    ds = ray.data.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
    got = _rows(profile(ds))
    assert got["x"]["cnt"] == 0 and got["x"]["null_count"] == 0
    assert got["x"]["n_distinct"] == 0
    assert got["x"]["min_val"] is None and got["x"]["max_val"] is None


def test_profile_negative_zero_and_binary(ray_session):
    """-0.0 and 0.0 are ONE distinct value (SQL semantics), and binary
    columns with non-UTF8 bytes hash raw instead of failing a string
    cast."""
    import ray.data

    tbl = pa.table(
        {
            "f": pa.array([0.0, -0.0, 1.0], pa.float64()),
            "b": pa.array([b"\xff\xfe", b"\xff\xfe", b"ok"], pa.binary()),
        }
    )
    got = _rows(profile(ray.data.from_arrow(tbl)))
    assert got["f"]["n_distinct"] == 2
    assert got["b"]["n_distinct"] == 2


def test_dataset_card_matches_sql(ray_session):
    """Datasheet metrics (doc/char/token totals, exact dup count, lang
    mix) match their SQL forms, including null text (counts as the
    empty document) and null lang."""
    import duckdb
    import ray.data

    from mothray.ops.webtext import dataset_card

    tbl = pa.table(
        {
            "text": pa.array(
                ["a b c", "a b c", None, "", "x y", "solo doc here"], pa.string()
            ),
            "lang": pa.array(["en", "en", None, "", "de", "en"], pa.string()),
        }
    )
    got = {
        r["metric"]: r["value"]
        for r in dataset_card(ray.data.from_arrow(tbl).repartition(3)).to_pylist()
    }
    con = duckdb.connect()
    con.register("t", tbl)
    n, chars, toks, dups = con.execute(
        "SELECT COUNT(*), SUM(length(coalesce(text,''))),"
        " SUM(length(string_split(coalesce(text,''), ' '))),"
        " COUNT(*) - COUNT(DISTINCT coalesce(text,'')) FROM t"
    ).fetchone()
    assert got["n_docs"] == n and got["total_chars"] == chars
    assert got["total_tokens"] == toks
    assert got["dup_docs"] == dups == 2  # the 'a b c' copy + null==''
    # NULL lang and empty-string lang are DISTINCT categories
    assert got["lang:en"] == 3 and got["lang:de"] == 1
    assert got["lang:<null>"] == 1 and got["lang:"] == 1


def test_profile_float16_column(ray_session):
    """float16 columns profile without a kernel error (the -0.0
    normalization widens to float32 first)."""
    import ray.data

    tbl = pa.table({"h": pa.array(np.array([1.5, 1.5, -0.0, 0.0], dtype=np.float16))})
    got = _rows(profile(ray.data.from_arrow(tbl)))
    assert got["h"]["n_distinct"] == 2  # {1.5, 0.0}; -0.0 == 0.0


def test_profile_approx_distinct(ray_session):
    """approx_distinct=True estimates via one shuffle-free HLL pass,
    within ~3% of exact on a 10k-distinct column; all-null columns
    still report 0."""
    import ray.data

    rng = np.random.default_rng(41)
    tbl = pa.table(
        {
            "k": pa.array(rng.integers(0, 10_000, 60_000), pa.int64()),
            "dead": pa.array([None] * 60_000, pa.string()),
        }
    )
    got = _rows(profile(ray.data.from_arrow(tbl).repartition(8), approx_distinct=True))
    exact = len(np.unique(tbl["k"].to_numpy()))
    assert abs(got["k"]["n_distinct"] - exact) / exact < 0.03
    assert got["dead"]["n_distinct"] == 0
    # count/nulls/min/max stay exact in approx mode
    assert got["k"]["cnt"] == 60_000 and got["k"]["null_count"] == 0


def test_drift_bins_and_psi(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pytest as _pytest
    import ray.data

    from mothray.ops import profile as prof

    rng = np.random.default_rng(1)
    tr = pa.table({"v": pa.array(np.round(rng.normal(100, 20, 3000), 2))})
    tn = pa.table({"v": pa.array(np.round(rng.normal(115, 25, 2500), 2))})
    got = prof.drift_bins(
        ray.data.from_arrow(tr).repartition(3),
        ray.data.from_arrow(tn).repartition(2), "v", 10,
    ).to_pandas()
    con = duckdb.connect()
    con.register("r", tr)
    con.register("n", tn)
    exp = con.execute(
        """
        WITH s AS (SELECT min(v) AS lo, max(v) AS hi FROM r),
         rb AS (SELECT CAST(greatest(least(floor(((v - s.lo) * 10) / (s.hi - s.lo)), 9), 0) AS BIGINT) AS bin FROM r, s),
         nb AS (SELECT CAST(greatest(least(floor(((v - s.lo) * 10) / (s.hi - s.lo)), 9), 0) AS BIGINT) AS bin FROM n, s),
         g AS (SELECT unnest(generate_series(0, 9)) AS bin)
        SELECT g.bin, CAST(coalesce(rc.c, 0) AS BIGINT) AS n_ref, CAST(coalesce(nc.c, 0) AS BIGINT) AS n_new
        FROM g LEFT JOIN (SELECT bin, count(*) c FROM rb GROUP BY 1) rc ON rc.bin = g.bin
         LEFT JOIN (SELECT bin, count(*) c FROM nb GROUP BY 1) nc ON nc.bin = g.bin ORDER BY g.bin
        """
    ).df()
    assert (got["n_ref"].values == exp["n_ref"].values).all()
    assert (got["n_new"].values == exp["n_new"].values).all()
    # psi detects the shift; self-drift is ~zero
    assert prof.psi(ray.data.from_arrow(tr), ray.data.from_arrow(tn), "v") > 0.1
    assert prof.psi(ray.data.from_arrow(tr), ray.data.from_arrow(tr), "v") == 0.0
    # constant reference: everything in bin 0, no crash
    c = pa.table({"v": pa.array([7.0] * 20)})
    bins = prof.drift_bins(ray.data.from_arrow(c), ray.data.from_arrow(c), "v", 10).to_pandas()
    assert bins["n_ref"].iloc[0] == 20 and bins["n_ref"].iloc[1:].sum() == 0
    # all-null reference raises
    nn = pa.table({"v": pa.array([None, None], pa.float64())})
    with _pytest.raises(ValueError, match="all null"):
        prof.drift_bins(ray.data.from_arrow(nn), ray.data.from_arrow(c), "v")


def test_ks_stat_matches_sql(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pytest as _pytest
    import ray.data

    from mothray.ops import profile as prof

    rng = np.random.default_rng(2)
    tr = pa.table({"v": pa.array(np.round(rng.normal(100, 20, 2000), 2))})
    tn = pa.table({"v": pa.array(np.round(rng.normal(110, 20, 1500), 2))})
    got = prof.ks_stat(
        ray.data.from_arrow(tr).repartition(3), ray.data.from_arrow(tn).repartition(2), "v"
    )
    con = duckdb.connect()
    con.register("r", tr)
    con.register("n", tn)
    d, at = con.execute(
        """
        WITH u AS (SELECT v, 1 AS is_r, 0 AS is_n FROM r UNION ALL SELECT v, 0, 1 FROM n),
         g AS (SELECT v, SUM(is_r) AS cr, SUM(is_n) AS cn FROM u GROUP BY v),
         c AS (SELECT v, SUM(cr) OVER (ORDER BY v) AS fr, SUM(cn) OVER (ORDER BY v) AS fn FROM g),
         t AS (SELECT (SELECT count(*) FROM r) AS nr, (SELECT count(*) FROM n) AS nn)
        SELECT abs(c.fr / t.nr - c.fn / t.nn) AS d, c.v FROM c, t ORDER BY d DESC, c.v LIMIT 1
        """
    ).fetchone()
    assert got["d"] == d and got["at"] == at
    assert prof.ks_stat(ray.data.from_arrow(tr), ray.data.from_arrow(tr), "v")["d"] == 0.0
    empty = pa.table({"v": pa.array([], pa.float64())})
    with _pytest.raises(ValueError, match="empty"):
        prof.ks_stat(ray.data.from_arrow(tr), ray.data.from_arrow(empty), "v")


def test_benford_profile_matches_duckdb(ray_session):
    import duckdb
    import ray.data

    from mothray.ops import profile as prof

    src = "/root/testdata/sf0.001/orders.parquet"
    got = prof.benford_profile(
        ray.data.read_parquet(src, columns=["o_totalprice"]), "o_totalprice"
    ).to_pylist()
    exp = duckdb.sql(
        f"WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v"
        f" FROM read_parquet('{src}')"
        f" WHERE o_totalprice IS NOT NULL AND round(o_totalprice * 100) > 0),"
        f" d AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit FROM c),"
        f" g AS (SELECT digit, CAST(count(*) AS BIGINT) AS cnt FROM d GROUP BY digit)"
        f" SELECT digit, cnt,"
        f" round(CAST(cnt AS DOUBLE) / (SELECT CAST(count(*) AS DOUBLE) FROM d), 6),"
        f" round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6)"
        f" FROM g ORDER BY digit"
    ).fetchall()
    assert [(r["digit"], r["cnt"], r["p_obs"], r["p_benford"]) for r in got] == exp
    assert abs(sum(r["p_obs"] for r in got) - 1.0) < 1e-4


def test_benford_profile_drops_nonpositive(ray_session):
    import ray.data

    from mothray.ops import profile as prof

    t = pa.table({"x": [1.23, -5.0, 0.0, None, 912.0, 0.004]})
    rows = prof.benford_profile(ray.data.from_arrow(t), "x").to_pylist()
    # 0.004 -> cents 0 (rounds to zero) -> dropped; survivors: 123, 91200
    assert [(r["digit"], r["cnt"]) for r in rows] == [(1, 1), (9, 1)]
