"""Distributed second-moment aggregates vs DuckDB."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from mothray.ops import moments


def test_group_variance_lineitem(ray_session):
    import ray.data

    src = "/root/testdata/sf0.001/lineitem.parquet"
    ds = ray.data.read_parquet(src, columns=["l_returnflag", "l_quantity"])
    got = (
        moments.group_variance(ds, "l_quantity", "l_returnflag")
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"SELECT l_returnflag, CAST(count(l_quantity) AS BIGINT) AS n,"
        f" round(avg(l_quantity), 6) AS mean,"
        f" round(var_samp(l_quantity), 6) AS var_samp,"
        f" round(stddev_samp(l_quantity), 6) AS std_samp"
        f" FROM read_parquet('{src}') GROUP BY 1 ORDER BY 1"
    ).df()
    assert got.equals(exp)


def test_group_corr_lineitem(ray_session):
    import ray.data

    src = "/root/testdata/sf0.001/lineitem.parquet"
    ds = ray.data.read_parquet(src, columns=["l_returnflag", "l_quantity", "l_discount"])
    got = (
        moments.group_corr(ds, "l_quantity", "l_discount", "l_returnflag")
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,"
        f" round(covar_samp(l_quantity, l_discount), 6) AS covar_samp,"
        f" round(corr(l_quantity, l_discount), 6) AS corr"
        f" FROM read_parquet('{src}') GROUP BY 1 ORDER BY 1"
    ).df()
    assert got.equals(exp)


def test_moments_nulls_and_tiny_groups(ray_session):
    import ray.data

    tbl = pa.table(
        {
            "g": ["a", "a", "a", "b", "c", "c"],
            "x": pa.array([1.0, 2.0, None, 5.0, None, None], pa.float64()),
            "y": pa.array([2.0, None, 3.0, 7.0, None, 1.0], pa.float64()),
        }
    )
    # many tiny blocks so the merge path actually merges partials
    ds = ray.data.from_arrow(tbl).repartition(4)

    var = (
        moments.group_variance(ds, "x", "g")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    # group a: n=2 var_samp=0.5; group b: n=1 var None; group c (all
    # values null): n=0 with NULL stats — SQL GROUP BY still emits it
    assert var["g"].tolist() == ["a", "b", "c"]
    assert var["n"].tolist() == [2, 1, 0]
    assert var["var_samp"].tolist()[0] == pytest.approx(0.5)
    assert np.isnan(var["var_samp"].tolist()[1])
    assert np.isnan(var["var_samp"].tolist()[2]) and np.isnan(var["mean"].tolist()[2])

    corr = (
        moments.group_corr(ds, "x", "y", "g").to_pandas().sort_values("g").reset_index(drop=True)
    )
    # pairwise-complete: a has ONE complete pair (1,2); b one pair; c
    # none — but the c group still exists (n=0, NULL stats)
    assert corr["g"].tolist() == ["a", "b", "c"]
    assert corr["n"].tolist() == [1, 1, 0]
    assert np.isnan(corr["covar_samp"]).all()


def test_global_variance_matches_numpy(ray_session):
    import ray.data

    rng = np.random.default_rng(7)
    x = rng.normal(3.0, 2.5, size=10_000)
    ds = ray.data.from_arrow(pa.table({"x": x})).repartition(8)
    got = moments.group_variance(ds, "x").to_pandas().iloc[0]
    assert got["n"] == 10_000
    assert got["mean"] == pytest.approx(round(float(x.mean()), 6), abs=1e-6)
    assert got["var_samp"] == pytest.approx(round(float(x.var(ddof=1)), 6), abs=1e-6)


def test_heavy_hitters_exact_regime(ray_session):
    import duckdb
    import ray.data

    from mothray.ops import sketch

    src = "/root/testdata/sf0.001/events.parquet"
    ds = ray.data.read_parquet(src, columns=["user_id"])
    got = sketch.heavy_hitters(ds, "user_id", k=10, capacity=4096).to_pandas()
    exp = duckdb.sql(
        f"SELECT user_id, CAST(count(*) AS BIGINT) AS cnt, CAST(0 AS BIGINT) AS err"
        f" FROM read_parquet('{src}') GROUP BY 1 ORDER BY cnt DESC, user_id LIMIT 10"
    ).df()
    assert got.reset_index(drop=True).equals(exp)


def test_heavy_hitters_tight_capacity_guarantee(ray_session):
    import collections

    import ray.data

    from mothray.ops import sketch

    rng = np.random.default_rng(11)
    vals = rng.zipf(1.4, 100_000).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"v": vals})).repartition(8)
    hh = sketch.heavy_hitters(ds, "v", k=10, capacity=24).to_pandas()
    true = collections.Counter(vals.tolist())
    bound = len(vals) / 25  # n/(capacity+1)
    for _, r in hh.iterrows():
        t = true[r["v"]]
        assert r["cnt"] <= t <= r["cnt"] + bound  # lower bound + MG error
    present = set(hh["v"].tolist())
    for v, c in true.most_common(50):
        if c > bound:  # guaranteed-present regime
            assert v in present


def test_grouped_quantiles_lineitem(ray_session):
    import duckdb
    import ray.data

    from mothray.ops import sketch

    src = "/root/testdata/sf0.001/lineitem.parquet"
    ds = ray.data.read_parquet(src, columns=["l_returnflag", "l_quantity"])
    got = (
        sketch.grouped_quantiles(ds, "l_quantity", "l_returnflag", [0.25, 0.5, 0.9])
        .to_pandas()
        .sort_values(["l_returnflag", "q"])
        .reset_index(drop=True)
    )
    sql = " UNION ALL ".join(
        f"SELECT l_returnflag, {q} AS q, quantile_disc(l_quantity, {q}) AS value"
        f" FROM read_parquet('{src}') GROUP BY 1"
        for q in (0.25, 0.5, 0.9)
    )
    exp = duckdb.sql(f"SELECT * FROM ({sql}) ORDER BY l_returnflag, q").df()
    assert got.equals(exp.reset_index(drop=True))


def test_histogram_lineitem(ray_session):
    import duckdb
    import ray.data

    from mothray.ops import sketch

    src = "/root/testdata/sf0.001/lineitem.parquet"
    ds = ray.data.read_parquet(src, columns=["l_extendedprice"])
    got = (
        sketch.histogram(ds, "l_extendedprice", 16)
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"WITH b AS (SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi"
        f" FROM read_parquet('{src}'))"
        f" SELECT LEAST(CAST(floor((l_extendedprice - lo) / ((hi - lo) / 16)) AS BIGINT), 15)"
        f" AS bin, CAST(count(*) AS BIGINT) AS cnt"
        f" FROM read_parquet('{src}'), b GROUP BY 1 ORDER BY 1"
    ).df()
    assert got.equals(exp.reset_index(drop=True))
    assert got["cnt"].sum() == duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{src}')"
    ).fetchone()[0]

    with pytest.raises(ValueError):
        sketch.histogram(ds, "l_extendedprice", 10, lo=5.0, hi=5.0)


def test_regex_extract_documents(ray_session):
    import duckdb
    import ray.data

    from mothray.ops import text as T

    src = "/root/testdata/sf0.001/documents.parquet"
    ds = ray.data.read_parquet(src, columns=["doc_id", "text"])
    got = (
        ds.map_batches(lambda b: T.regex_extract_batch(b, "[0-9]+"), batch_format="pyarrow")
        .select_columns(["doc_id", "extracted"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"SELECT doc_id, regexp_extract(text, '[0-9]+') AS extracted"
        f" FROM read_parquet('{src}') ORDER BY doc_id"
    ).df()
    assert got.equals(exp.reset_index(drop=True))

    # null-in -> null-out; no-match -> ''
    t = pa.table({"doc_id": [1, 2, 3], "text": ["a1b", "zzz", None]})
    out = T.regex_extract_batch(t, "[0-9]+")
    assert out.column("extracted").to_pylist() == ["1", "", None]


def test_string_agg_orders(ray_session):
    import duckdb
    import ray.data

    from mothray.ops import groupsets

    src = "/root/testdata/sf0.001/orders.parquet"
    ds = ray.data.read_parquet(src, columns=["o_custkey", "o_orderkey"])
    got = (
        groupsets.string_agg(ds, "o_custkey", "o_orderkey", "o_orderkey", sep="|")
        .to_pandas()
        .sort_values("o_custkey")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"SELECT o_custkey, string_agg(o_orderkey, '|' ORDER BY o_orderkey) AS agg"
        f" FROM read_parquet('{src}') GROUP BY 1 ORDER BY 1"
    ).df()
    assert got.equals(exp.reset_index(drop=True))


def test_spearman_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mothray.ops import moments

    rng = np.random.default_rng(21)
    n = 3000
    x = rng.integers(0, 25, n).astype(float)
    y = np.round(x * -1.5 + rng.normal(0, 8, n), 1)
    t = pa.table(
        {
            "x": pa.array([None if i % 41 == 0 else float(v) for i, v in enumerate(x)]),
            "y": pa.array([None if i % 37 == 0 else float(v) for i, v in enumerate(y)]),
        }
    )
    got = moments.spearman_corr(ray.data.from_arrow(t).repartition(5), "x", "y").to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(
        """
        WITH f AS (SELECT x, y FROM t WHERE x IS NOT NULL AND y IS NOT NULL),
         r AS (SELECT RANK() OVER (ORDER BY x) + (COUNT(*) OVER (PARTITION BY x) - 1) / 2.0 AS rx,
                      RANK() OVER (ORDER BY y) + (COUNT(*) OVER (PARTITION BY y) - 1) / 2.0 AS ry FROM f)
        SELECT CAST(COUNT(*) AS BIGINT) AS n, ROUND(covar_samp(rx, ry), 6) AS covar_samp,
               ROUND(corr(rx, ry), 6) AS corr FROM r
        """
    ).df()
    assert got["n"].iloc[0] == exp["n"].iloc[0]
    assert abs(got["corr"].iloc[0] - exp["corr"].iloc[0]) < 1e-9
    # perfectly monotone -> rho = 1 exactly (ranks identical)
    mono = pa.table({"x": pa.array([1.0, 2.0, 5.0, 9.0]), "y": pa.array([3.0, 4.0, 8.0, 20.0])})
    r = moments.spearman_corr(ray.data.from_arrow(mono), "x", "y").to_pandas()
    assert r["corr"].iloc[0] == 1.0


def test_spearman_distinct_guard(ray_session):
    import numpy as np
    import pyarrow as pa
    import pytest as _pytest
    import ray.data

    from mothray.ops import moments

    t = pa.table({"x": pa.array(np.arange(100.0)), "y": pa.array(np.arange(100.0))})
    with _pytest.raises(ValueError, match="max_distinct"):
        moments.spearman_corr(ray.data.from_arrow(t), "x", "y", max_distinct=10)


def test_chi2_independence(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mothray.ops import moments

    rng = np.random.default_rng(9)
    # dependent columns: b correlates with a
    a = rng.choice(["x", "y", "z"], 2000)
    b = np.where(rng.uniform(size=2000) < 0.7, a, rng.choice(["x", "y", "z"], 2000))
    t = pa.table(
        {
            "a": pa.array([None if i % 97 == 0 else v for i, v in enumerate(a)], pa.string()),
            "b": pa.array([None if i % 89 == 0 else v for i, v in enumerate(b)], pa.string()),
        }
    )
    got = moments.chi2_independence(
        ray.data.from_arrow(t).repartition(3), "a", "b"
    ).to_pandas()
    con = duckdb.connect()
    con.register("t", t)
    exp = con.execute(
        """
        WITH c AS (SELECT a, b, count(*) AS o FROM t
                   WHERE a IS NOT NULL AND b IS NOT NULL GROUP BY a, b),
         ra AS (SELECT a, SUM(o) AS tc FROM c GROUP BY a),
         rb AS (SELECT b, SUM(o) AS tc FROM c GROUP BY b),
         tot AS (SELECT SUM(o) AS n FROM c),
         e AS (SELECT c.o, ra.tc * rb.tc / tot.n AS ex
               FROM c JOIN ra USING(a) JOIN rb USING(b) CROSS JOIN tot)
        SELECT ROUND(SUM((o - ex) * (o - ex) / ex) + (SELECT n FROM tot) - SUM(ex), 6) AS chi2,
          CAST(((SELECT count(*) FROM ra) - 1) * ((SELECT count(*) FROM rb) - 1) AS BIGINT) AS dof,
          CAST((SELECT n FROM tot) AS BIGINT) AS n FROM e
        """
    ).df()
    assert got["n"].iloc[0] == exp["n"].iloc[0]
    assert got["dof"].iloc[0] == exp["dof"].iloc[0] == 4
    assert abs(got["chi2"].iloc[0] - exp["chi2"].iloc[0]) < 1e-6
    assert got["chi2"].iloc[0] > 100  # strongly dependent

    # hand-checked 2x2: [[10, 20], [20, 10]] -> chi2 = 60/9 * ... known
    rows = (["p"] * 30) + (["q"] * 30)
    cols = (["u"] * 10 + ["v"] * 20) + (["u"] * 20 + ["v"] * 10)
    t2 = pa.table({"a": pa.array(rows), "b": pa.array(cols)})
    got2 = moments.chi2_independence(ray.data.from_arrow(t2), "a", "b").to_pandas()
    # e = 15 everywhere; chi2 = 4 * 25/15 = 6.666667
    assert got2["chi2"].iloc[0] == round(4 * 25 / 15, 6)
    assert got2["dof"].iloc[0] == 1


def test_group_linregress_lineitem(ray_session):
    import ray.data

    src = "/root/testdata/sf0.001/lineitem.parquet"
    ds = ray.data.read_parquet(
        src, columns=["l_returnflag", "l_quantity", "l_extendedprice"]
    )
    got = (
        moments.group_linregress(ds, "l_quantity", "l_extendedprice", "l_returnflag")
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    exp = duckdb.sql(
        f"SELECT l_returnflag, CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,"
        f" round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,"
        f" round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,"
        f" round(regr_r2(l_extendedprice, l_quantity), 6) AS r2"
        f" FROM read_parquet('{src}') GROUP BY 1 ORDER BY 1"
    ).df()
    assert got.equals(exp)


def test_group_linregress_degenerate(ray_session):
    """Constant x -> slope/intercept/r2 NULL; constant y -> r2 = 1;
    null pairs drop — mirrors DuckDB regr_* semantics."""
    import ray.data

    t = pa.table(
        {
            "g": ["cx", "cx", "cx", "cy", "cy", "cy", "nn", "nn", "nn"],
            "x": [1.0, 1.0, 1.0, 1.0, 2.0, 3.0, 1.0, 2.0, None],
            "y": [1.0, 2.0, 3.0, 5.0, 5.0, 5.0, 2.0, 4.0, 9.0],
        }
    )
    ds = ray.data.from_arrow(t)
    got = {
        r["g"]: r
        for r in moments.group_linregress(ds, "x", "y", "g").take_all()
    }
    assert got["cx"]["slope"] is None and got["cx"]["r2"] is None
    assert got["cx"]["n"] == 3
    assert got["cy"]["r2"] == 1.0 and got["cy"]["slope"] == 0.0
    assert got["nn"]["n"] == 2 and got["nn"]["slope"] == 2.0
    exp = duckdb.sql(
        "SELECT g, CAST(regr_count(y, x) AS BIGINT) n, round(regr_slope(y, x), 6) s,"
        " round(regr_intercept(y, x), 6) i, round(regr_r2(y, x), 6) r2"
        " FROM t GROUP BY g"
    ).fetchall()
    for g, n, s, i, r2 in exp:
        r = got[g]
        assert (r["n"], r["slope"], r["intercept"], r["r2"]) == (n, s, i, r2)


def test_welch_t_lineitem(ray_session):
    import ray.data

    src = "/root/testdata/sf0.001/lineitem.parquet"
    ds = ray.data.read_parquet(src, columns=["l_returnflag", "l_quantity"])
    got = moments.welch_t_test(ds, "l_quantity", "l_returnflag", "A", "R").to_pylist()[0]
    exp = duckdb.sql(
        f"WITH s AS (SELECT l_returnflag AS g, CAST(count(l_quantity) AS DOUBLE) AS n,"
        f" avg(l_quantity) AS m, var_samp(l_quantity) AS v FROM read_parquet('{src}')"
        f" WHERE l_returnflag IN ('A', 'R') GROUP BY 1)"
        f" SELECT CAST(a.n AS BIGINT), CAST(b.n AS BIGINT), round(a.m, 6), round(b.m, 6),"
        f" round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 6),"
        f" round((a.v / a.n + b.v / b.n) * (a.v / a.n + b.v / b.n)"
        f"  / ((a.v / a.n) * (a.v / a.n) / (a.n - 1)"
        f"   + (b.v / b.n) * (b.v / b.n) / (b.n - 1)), 6)"
        f" FROM s a, s b WHERE a.g = 'A' AND b.g = 'R'"
    ).fetchone()
    assert (
        got["n_a"], got["n_b"], got["mean_a"], got["mean_b"], got["t"], got["welch_df"]
    ) == exp


def test_welch_t_missing_group(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({"g": ["A", "A"], "v": [1.0, 2.0]}))
    row = moments.welch_t_test(ds, "v", "g", "A", "Z").to_pylist()[0]
    assert row["n_b"] == 0 and row["t"] is None and row["welch_df"] is None
    assert row["n_a"] == 2


def test_mann_whitney_lineitem(ray_session):
    import ray.data

    src = "/root/testdata/sf0.001/lineitem.parquet"
    ds = ray.data.read_parquet(src, columns=["l_returnflag", "l_quantity"])
    got = moments.mann_whitney_u(ds, "l_quantity", "l_returnflag", "A", "R").to_pylist()[0]
    exp = duckdb.sql(
        f"WITH t AS (SELECT l_returnflag AS g, l_quantity AS v FROM read_parquet('{src}')"
        f" WHERE l_returnflag IN ('A', 'R') AND l_quantity IS NOT NULL),"
        f" r AS (SELECT g, CAST(rank() OVER (ORDER BY v) AS DOUBLE)"
        f"  + (CAST(count(*) OVER (PARTITION BY v) AS DOUBLE) - 1) / 2.0 AS ar FROM t),"
        f" s AS (SELECT CAST(count(*) FILTER (g = 'A') AS DOUBLE) AS na,"
        f"  CAST(count(*) FILTER (g = 'R') AS DOUBLE) AS nb,"
        f"  sum(ar) FILTER (g = 'A') AS ra, sum(ar) FILTER (g = 'R') AS rb FROM s0),"
        f" s0 AS (SELECT * FROM r)"
        f" SELECT CAST(na AS BIGINT), CAST(nb AS BIGINT),"
        f" ra - na * (na + 1) / 2.0, rb - nb * (nb + 1) / 2.0 FROM s"
    ).fetchone()
    assert (got["n_a"], got["n_b"], got["u_a"], got["u_b"]) == exp
    # U_a + U_b == n_a * n_b is an identity of the statistic
    assert got["u_a"] + got["u_b"] == got["n_a"] * got["n_b"]
    # z against a direct scipy-free recomputation on the driver
    import pyarrow.parquet as pq

    lt = pq.read_table(src, columns=["l_returnflag", "l_quantity"])
    mask = np.isin(lt.column("l_returnflag").to_numpy(zero_copy_only=False), ["A", "R"])
    v = lt.column("l_quantity").to_numpy(zero_copy_only=False)[mask]
    _, counts = np.unique(v, return_counts=True)
    na, nb, n = float(got["n_a"]), float(got["n_b"]), float(len(v))
    ties = float((counts.astype(np.float64) ** 3 - counts).sum())
    sigma2 = na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    z = (got["u_a"] - na * nb / 2.0) / np.sqrt(sigma2)
    assert got["z"] == round(z, 6)


def test_mann_whitney_batch_invariance(ray_session):
    """Rank sums are exact half-integer arithmetic: 1-block and
    8-block runs agree bit-for-bit."""
    import ray.data

    rng = np.random.default_rng(7)
    t = pa.table(
        {
            "g": pa.array(rng.choice(["A", "B"], size=5000)),
            "v": pa.array(rng.integers(0, 40, size=5000).astype(np.float64)),
        }
    )
    one = moments.mann_whitney_u(ray.data.from_arrow(t), "v", "g", "A", "B").to_pylist()[0]
    many = moments.mann_whitney_u(
        ray.data.from_arrow(t).repartition(8), "v", "g", "A", "B"
    ).to_pylist()[0]
    assert one == many


def test_corr_matrix_matches_duckdb(ray_session):
    import ray.data

    src = "/root/testdata/sf0.001/lineitem.parquet"
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    got = moments.corr_matrix(ray.data.read_parquet(src, columns=cols), cols).to_pylist()
    for r in got:
        exp = duckdb.sql(
            f"SELECT round(corr({r['col_x']}, {r['col_y']}), 6) FROM read_parquet('{src}')"
            f" WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL"
            f" AND l_discount IS NOT NULL AND l_tax IS NOT NULL"
        ).fetchone()[0]
        assert r["corr"] == exp, (r, exp)
    assert len(got) == 6


def test_corr_matrix_partition_invariant_and_degenerate(ray_session):
    import ray.data

    t = pa.table(
        {
            "a": [1.0, 2.0, 3.0, 4.0],
            "b": [2.0, 4.0, 6.0, 8.0],
            "c": [5.0, 5.0, 5.0, 5.0],  # zero variance -> corr NULL
        }
    )
    one = moments.corr_matrix(ray.data.from_arrow(t), ["a", "b", "c"]).to_pylist()
    many = moments.corr_matrix(
        ray.data.from_arrow(t).repartition(4), ["a", "b", "c"]
    ).to_pylist()
    assert one == many
    d = {(r["col_x"], r["col_y"]): r["corr"] for r in one}
    assert d[("a", "b")] == 1.0
    assert d[("a", "c")] is None and d[("b", "c")] is None


def test_mutual_information_matches_sklearn_formula(ray_session):
    """Hand-checkable 2x2 table: counts [[2,1],[1,2]]."""
    import ray.data

    t = pa.table(
        {
            "a": ["x", "x", "x", "y", "y", "y", None],
            "b": ["p", "p", "q", "p", "q", "q", "p"],
        }
    )
    got = moments.mutual_information(ray.data.from_arrow(t), "a", "b").to_pylist()[0]
    n = 6.0
    mi = 0.0
    for o, ta, tb in [(2, 3, 3), (1, 3, 3), (1, 3, 3), (2, 3, 3)]:
        mi += (o / n) * np.log(o * n / (ta * tb))
    chi2 = sum(
        (o - ta * tb / n) ** 2 / (ta * tb / n)
        for o, ta, tb in [(2, 3, 3), (1, 3, 3), (1, 3, 3), (2, 3, 3)]
    )
    assert got["n"] == 6
    assert got["mi_nats"] == round(mi, 6)
    assert got["cramers_v"] == round(float(np.sqrt(chi2 / (6 * 1))), 6)


def test_mutual_information_independent_columns(ray_session):
    """A perfectly independent 2x2 design has MI exactly 0."""
    import ray.data

    t = pa.table({"a": ["x", "x", "y", "y"], "b": ["p", "q", "p", "q"]})
    got = moments.mutual_information(ray.data.from_arrow(t), "a", "b").to_pylist()[0]
    assert got["mi_nats"] == 0.0 and got["cramers_v"] == 0.0


def test_global_frac_rank_matches_duckdb(ray_session):
    """Bucketed sort-ranks == SQL fractional ranks, exactly, across
    partitionings (ties never straddle a bucket). Compared as the
    (value -> rank) map — (l_orderkey, l_linenumber) is NOT unique in
    the synthetic data, so a row-level merge would explode."""
    import ray.data

    from mothray.ops.moments import with_global_frac_rank

    src = "/root/testdata/sf0.001/lineitem.parquet"
    exp = dict(
        duckdb.sql(
            f"SELECT DISTINCT l_quantity,"
            f" CAST(rank() OVER (ORDER BY l_quantity) AS DOUBLE)"
            f"  + (CAST(count(*) OVER (PARTITION BY l_quantity) AS DOUBLE) - 1) / 2.0"
            f" FROM read_parquet('{src}') WHERE l_quantity IS NOT NULL"
        ).fetchall()
    )
    n_exp = duckdb.sql(
        f"SELECT count(l_quantity) FROM read_parquet('{src}')"
    ).fetchone()[0]
    for parts in (1, 6):
        ds = ray.data.read_parquet(src, columns=["l_orderkey", "l_linenumber", "l_quantity"])
        if parts > 1:
            ds = ds.repartition(parts)
        got = with_global_frac_rank(ds, "l_quantity").to_pandas()
        assert len(got) == n_exp
        per_value = got.groupby("l_quantity")["frac_rank"]
        assert (per_value.nunique() == 1).all()
        assert dict(per_value.first()) == exp


def test_global_frac_rank_null_values(ray_session):
    import ray.data

    from mothray.ops.moments import with_global_frac_rank

    t = pa.table({"id": [1, 2, 3, 4], "v": [10.0, None, 5.0, 10.0]})
    rows = {r["id"]: r for r in with_global_frac_rank(
        ray.data.from_arrow(t), "v").take_all()}
    assert rows[2]["frac_rank"] is None
    assert rows[3]["frac_rank"] == 1.0
    assert rows[1]["frac_rank"] == 2.5 and rows[4]["frac_rank"] == 2.5


def test_spearman_sorted_agrees_with_histogram_spearman(ray_session):
    """The sort path and the broadcast-histogram path are two
    implementations of the same statistic — identical round-6 corr."""
    import ray.data

    src = "/root/testdata/sf0.001/lineitem.parquet"
    ds = ray.data.read_parquet(src, columns=["l_quantity", "l_discount"])
    a = moments.spearman_corr(ds, "l_quantity", "l_discount").take_all()[0]
    ds2 = ray.data.read_parquet(src, columns=["l_quantity", "l_discount"])
    b = moments.spearman_corr_sorted(ds2, "l_quantity", "l_discount").take_all()[0]
    assert a["n"] == b["n"] and a["corr"] == b["corr"]


def test_count_min_overestimates_and_is_partition_invariant(ray_session):
    """Forced collisions (width 7): every estimate >= its true count,
    within the eps*N bound, and 1-block vs 8-block runs agree
    exactly (partials merge by addition)."""
    import ray.data

    from mothray.ops import sketch as sketch_mod

    rng = np.random.default_rng(3)
    keys = [f"k{int(i)}" for i in rng.zipf(1.5, 4000) if i < 60]
    t = pa.table({"k": pa.array(keys + [None] * 5)})
    cm1 = sketch_mod.count_min_sketch(ray.data.from_arrow(t), "k", width=7, depth=3)
    cm8 = sketch_mod.count_min_sketch(
        ray.data.from_arrow(t).repartition(8), "k", width=7, depth=3
    )
    assert np.array_equal(cm1, cm8)
    assert cm1.sum() == 3 * len(keys)  # nulls excluded; each row counts all
    import collections

    truth = collections.Counter(keys)
    uniq = sorted(truth)
    est = sketch_mod.count_min_estimate(cm1, uniq)
    n = len(keys)
    for k, e in zip(uniq, est):
        assert e >= truth[k]
        assert e <= truth[k] + n  # trivial sanity; real bound is e*N/width
    # a wide sketch on the same data is exact for every key
    cmw = sketch_mod.count_min_sketch(ray.data.from_arrow(t), "k", width=4099, depth=4)
    estw = sketch_mod.count_min_estimate(cmw, uniq)
    assert [int(x) for x in estw] == [truth[k] for k in uniq]


def test_grouped_mad_matches_duckdb_and_null_group(ray_session):
    import ray.data

    from mothray.ops import sketch as sketch_mod

    src = "/root/testdata/sf0.001/lineitem.parquet"
    got = sketch_mod.grouped_mad(
        ray.data.read_parquet(src, columns=["l_returnflag", "l_quantity"]),
        "l_quantity",
        "l_returnflag",
    ).to_pylist()
    exp = {
        r[0]: r[1:]
        for r in duckdb.sql(
            f"SELECT l_returnflag, CAST(count(l_quantity) AS BIGINT),"
            f" round(median(l_quantity), 6), round(mad(l_quantity), 6)"
            f" FROM read_parquet('{src}') GROUP BY 1"
        ).fetchall()
    }
    assert len(got) == len(exp)
    for r in got:
        assert (r["n"], r["median"], r["mad"]) == exp[r["l_returnflag"]]
    # null group key is a legal partition with its own median/mad
    t = pa.table(
        {"g": ["a", "a", None, None, None], "v": [1.0, 3.0, 10.0, 20.0, None]}
    )
    rows = {
        r["g"]: r
        for r in sketch_mod.grouped_mad(
            ray.data.from_arrow(t), "v", "g"
        ).to_pylist()
    }
    assert rows["a"]["median"] == 2.0 and rows["a"]["mad"] == 1.0
    assert rows[None]["median"] == 15.0 and rows[None]["mad"] == 5.0
    assert rows[None]["n"] == 2


def test_grouped_mode_brute_force(ray_session):
    import ray.data

    from mothray.ops import moments

    tbl = pa.table(
        {
            "g": ["a", "a", "a", "b", "b", None, None, "a"],
            "v": pa.array([1, 2, 2, 7, 7, 3, 3, None], pa.int64()),
        }
    )
    got = sorted(
        moments.grouped_mode(
            ray.data.from_arrow(tbl).repartition(3), "g", "v"
        ).take_all(),
        key=lambda r: (r["g"] is None, r["g"]),
    )
    # 'a': 2 twice beats 1 once (null v ignored); 'b': 7; null group: 3
    assert got == [
        {"g": "a", "mode_value": 2, "mode_cnt": 2},
        {"g": "b", "mode_value": 7, "mode_cnt": 2},
        {"g": None, "mode_value": 3, "mode_cnt": 2},
    ]


def test_grouped_mode_tie_breaks_smallest(ray_session):
    import ray.data

    from mothray.ops import moments

    tbl = pa.table({"g": ["x", "x"], "v": pa.array([9, 4], pa.int64())})
    got = moments.grouped_mode(ray.data.from_arrow(tbl), "g", "v").take_all()
    assert got == [{"g": "x", "mode_value": 4, "mode_cnt": 1}]


def test_key_skew_uniform_and_hot(ray_session):
    import math

    import ray.data

    from mothray.ops import profile as profile_mod

    uni = pa.table({"k": pa.array(list(range(8)) * 4, pa.int64())})
    row = profile_mod.key_skew(
        ray.data.from_arrow(uni).repartition(3), "k", top_k=3
    ).to_pylist()[0]
    assert row["n_rows"] == 32 and row["n_keys"] == 8
    assert row["norm_entropy_r6"] == 1.0  # uniform
    assert row["top1_frac_r6"] == round(4 / 32, 6)
    assert row["topk_frac_r6"] == round(12 / 32, 6)

    hot = pa.table({"k": pa.array([0] * 97 + [1, 2, 3], pa.int64())})
    row = profile_mod.key_skew(ray.data.from_arrow(hot), "k", top_k=1).to_pylist()[0]
    assert row["top1_frac_r6"] == 0.97
    ent = -(0.97 * math.log(0.97) + 3 * 0.01 * math.log(0.01))
    assert abs(row["entropy_r6"] - ent) < 1e-6
    assert row["norm_entropy_r6"] < 0.2  # one hot key

    nullkey = pa.table({"k": pa.array([None, None, 5], pa.int64())})
    row = profile_mod.key_skew(ray.data.from_arrow(nullkey), "k").to_pylist()[0]
    assert row["n_keys"] == 2 and row["top1_frac_r6"] == round(2 / 3, 6)


def test_ols_multi_recovers_coefficients(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mothray.ops import moments

    rng = np.random.default_rng(11)
    n = 5000
    x1 = rng.normal(10, 3, n)
    x2 = rng.uniform(0, 1, n)
    y = 4.0 + 2.5 * x1 - 7.0 * x2 + rng.normal(0, 0.01, n)
    t = pa.table({"y": y, "x1": x1, "x2": x2})
    out = moments.ols_multi(
        ray.data.from_arrow(t).repartition(4), "y", ["x1", "x2"]
    ).to_pylist()[0]
    assert out["n"] == n
    assert abs(out["b0_r4"] - 4.0) < 0.01
    assert abs(out["b1_r4"] - 2.5) < 0.001
    assert abs(out["b2_r4"] + 7.0) < 0.01
    assert out["r2_r6"] > 0.999
    # matches numpy lstsq on the same data
    X = np.column_stack([np.ones(n), x1, x2])
    beta = np.linalg.lstsq(X, y, rcond=None)[0]
    for i, b in enumerate(beta):
        assert abs(out[f"b{i}_r4"] - round(b, 4)) < 1e-3


def test_ols_multi_null_rows_excluded(ray_session):
    import pyarrow as pa
    import ray.data

    from mothray.ops import moments

    t = pa.table(
        {
            "y": pa.array([1.0, 2.0, None, 4.0, 100.0]),
            "x1": pa.array([1.0, 2.0, 3.0, 4.0, None]),
        }
    )
    out = moments.ols_multi(ray.data.from_arrow(t), "y", ["x1"]).to_pylist()[0]
    # only the 3 complete rows (1,1),(2,2),(4,4): y = x exactly
    assert out["n"] == 3
    assert out["b0_r4"] == 0.0 and out["b1_r4"] == 1.0


def test_anova_oneway_matches_direct_formula(ray_session):
    import pyarrow as pa
    import ray.data

    from mothray.ops import moments

    rng = np.random.default_rng(21)
    g = rng.choice(["a", "b", "c"], 3000)
    v = rng.normal(0, 1, 3000) + (g == "b") * 0.3
    out = moments.anova_oneway(
        ray.data.from_arrow(pa.table({"g": g, "v": v})).repartition(4), "v", "g"
    ).to_pylist()[0]
    # direct numpy F
    groups = [v[g == k] for k in "abc"]
    gm = v.mean()
    msb = sum(len(x) * (x.mean() - gm) ** 2 for x in groups) / 2
    msw = sum((len(x) - 1) * x.var(ddof=1) for x in groups) / (3000 - 3)
    assert out["k"] == 3 and out["n"] == 3000
    assert abs(out["f_stat"] - msb / msw) < 1e-4


def test_anova_single_group_null_f(ray_session):
    import pyarrow as pa
    import ray.data

    from mothray.ops import moments

    t = pa.table({"g": ["x"] * 10, "v": list(range(10))})
    out = moments.anova_oneway(ray.data.from_arrow(t), "v", "g").to_pylist()[0]
    assert out["k"] == 1 and out["f_stat"] is None


def test_kruskal_wallis_matches_direct(ray_session):
    import pyarrow as pa
    import ray.data

    from mothray.ops import moments

    rng = np.random.default_rng(22)
    g = rng.choice(["a", "b", "c"], 2000)
    v = rng.integers(0, 50, 2000).astype(float)  # heavy ties
    out = moments.kruskal_wallis(
        ray.data.from_arrow(pa.table({"g": g, "v": v})).repartition(4), "v", "g"
    ).to_pylist()[0]
    # direct tie-corrected H via numpy ranks
    order = np.argsort(v, kind="stable")
    ranks = np.empty(len(v))
    sv = v[order]
    uniq, start = np.unique(sv, return_index=True)
    cnt = np.diff(np.concatenate((start, [len(sv)])))
    avg = start + (cnt + 1) / 2.0
    ranks[order] = np.repeat(avg, cnt)
    n = float(len(v))
    h = sum(ranks[g == k].sum() ** 2 / (g == k).sum() for k in "abc")
    h = 12.0 / (n * (n + 1)) * h - 3 * (n + 1)
    ties = float((cnt.astype(float) ** 3 - cnt).sum())
    hc = h / (1 - ties / (n**3 - n))
    assert out["k"] == 3 and out["n"] == 2000
    assert abs(out["h_stat"] - hc) < 1e-6


def test_kendall_tau_known_values():
    import pyarrow as pa

    from mothray.ops import moments

    # perfect concordance
    t = pa.table({"x": [1.0, 2.0, 3.0, 4.0], "y": [10.0, 20.0, 30.0, 40.0]})
    out = moments.kendall_tau(t, "x", "y").to_pylist()[0]
    assert out["tau_b"] == 1.0 and out["concordant"] == 6 and out["discordant"] == 0
    # perfect discordance
    t = pa.table({"x": [1.0, 2.0, 3.0], "y": [3.0, 2.0, 1.0]})
    assert moments.kendall_tau(t, "x", "y").to_pylist()[0]["tau_b"] == -1.0
    # ties in both: pair (0,1) tied in x, pair (2,3) tied in y
    t = pa.table({"x": [1.0, 1.0, 2.0, 3.0], "y": [1.0, 2.0, 3.0, 3.0]})
    out = moments.kendall_tau(t, "x", "y").to_pylist()[0]
    assert out["n"] == 4 and out["concordant"] == 4 and out["discordant"] == 0
    n0 = 6
    expect = round(4 / ((n0 - 1) * (n0 - 1)) ** 0.5, 6)
    assert out["tau_b"] == expect


def test_kendall_tau_chunking_consistent():
    import pyarrow as pa

    from mothray.ops import moments

    rng = np.random.default_rng(23)
    x = rng.integers(0, 20, 300).astype(float)
    y = x + rng.normal(0, 5, 300)
    t = pa.table({"x": x, "y": y})
    full = moments.kendall_tau(t, "x", "y").to_pylist()[0]
    out2 = moments.kendall_tau(t, "x", "y", max_rows=300).to_pylist()[0]
    assert full == out2
    assert -1.0 <= full["tau_b"] <= 1.0 and full["concordant"] > full["discordant"]


def test_bootstrap_ci_deterministic_and_sane(ray_session):
    import pyarrow as pa
    import ray.data

    from mothray.ops import moments

    rng = np.random.default_rng(61)
    n = 5000
    v = np.round(rng.normal(100, 15, n), 2)
    t = pa.table({"id": pa.array(np.arange(n), pa.int64()), "v": v})
    ds = ray.data.from_arrow(t).repartition(4)
    a = moments.bootstrap_mean_ci(ds, "v", "id", b=100).to_pylist()[0]
    b = moments.bootstrap_mean_ci(
        ray.data.from_arrow(t).repartition(7), "v", "id", b=100
    ).to_pylist()[0]
    assert a == b  # partition-count invariant (hash-derived resamples)
    assert a["n"] == n and a["b"] == 100
    assert a["ci_lo"] < a["mean"] < a["ci_hi"]
    # CI width ~ 2*1.96*sigma/sqrt(n) ~ 0.83; allow generous slack
    assert 0.3 < a["ci_hi"] - a["ci_lo"] < 2.0
    # the exact mean is inside and near the center
    assert abs((a["ci_hi"] + a["ci_lo"]) / 2 - v.mean()) < 0.5


def test_bootstrap_poisson_ladder_counts():
    # the integer ladder maps u6 to the Poisson(1) inverse CDF
    import numpy as np

    from mothray.ops.moments import POISSON1_T6

    thr = np.array(POISSON1_T6)
    assert np.searchsorted(thr, 0, side="right") == 0
    assert np.searchsorted(thr, 367878, side="right") == 0
    assert np.searchsorted(thr, 367879, side="right") == 1
    assert np.searchsorted(thr, 999998, side="right") == 9
    # expected count == 1 within ladder truncation error
    probs = np.diff(np.concatenate(([0], thr, [1_000_000]))) / 1e6
    assert abs((probs * np.arange(10)).sum() - 1.0) < 1e-4


def test_isotonic_fit_matches_brute_pava(ray_session):
    import pyarrow as pa
    import ray.data

    from mothray.ops import moments

    rng = np.random.default_rng(81)
    n = 3000
    x = rng.integers(0, 60, n)
    y = np.round(2.0 * x + rng.normal(0, 20, n), 2)  # noisy increasing
    t = pa.table({"x": pa.array(x, pa.int64()), "y": y})
    out = moments.isotonic_fit(
        ray.data.from_arrow(t).repartition(5), "x", "y"
    ).to_pylist()

    # brute PAVA over pre-averaged distinct x (float reference)
    import collections

    agg = collections.defaultdict(lambda: [0.0, 0])
    for xi, yi in zip(x, y):
        agg[int(xi)][0] += yi
        agg[int(xi)][1] += 1
    pools = []
    for xi in sorted(agg):
        s, w = agg[xi]
        cur = [s, w, xi, xi]
        while pools and pools[-1][0] / pools[-1][1] >= cur[0] / cur[1] - 1e-12:
            p = pools.pop()
            cur = [p[0] + cur[0], p[1] + cur[1], p[2], cur[3]]
        pools.append(cur)
    assert len(out) == len(pools)
    for got, want in zip(out, pools):
        assert (got["x_lo"], got["x_hi"], got["n"]) == (want[2], want[3], want[1])
        assert abs(got["fitted"] - want[0] / want[1]) < 1e-6
    # fit properties: nondecreasing, mean-preserving, n-preserving
    fits = [r["fitted"] for r in out]
    assert all(a < b for a, b in zip(fits, fits[1:]))  # strictly after pooling
    assert sum(r["n"] for r in out) == n
    tot = sum(r["fitted"] * r["n"] for r in out)
    assert abs(tot / n - y.mean()) < 1e-4


def test_isotonic_fit_monotone_input_identity(ray_session):
    import pyarrow as pa
    import ray.data

    from mothray.ops import moments

    # already increasing -> every distinct x is its own pool
    t = pa.table({"x": pa.array([1, 2, 3, 4], pa.int64()),
                  "y": [1.0, 2.0, 3.0, 4.0]})
    out = moments.isotonic_fit(ray.data.from_arrow(t), "x", "y").to_pylist()
    assert [r["fitted"] for r in out] == [1.0, 2.0, 3.0, 4.0]


def test_isotonic_fit_decreasing_input_single_pool(ray_session):
    import pyarrow as pa
    import ray.data

    from mothray.ops import moments

    t = pa.table({"x": pa.array([1, 2, 3], pa.int64()), "y": [3.0, 2.0, 1.0]})
    out = moments.isotonic_fit(ray.data.from_arrow(t), "x", "y").to_pylist()
    assert len(out) == 1 and out[0]["fitted"] == 2.0 and out[0]["n"] == 3


def test_cmh_matches_direct_formula(ray_session):
    import pyarrow as pa
    import ray.data

    from mothray.ops import moments

    rng = np.random.default_rng(121)
    n = 6000
    s = rng.integers(0, 5, n)
    x = (rng.random(n) < 0.4).astype(np.int64)
    # association within strata: y depends on x
    y = (rng.random(n) < np.where(x == 1, 0.6, 0.3)).astype(np.int64)
    t = pa.table({"x": x, "y": y, "s": pa.array(s, pa.int64())})
    out = moments.cmh_test(
        ray.data.from_arrow(t).repartition(4), "x", "y", "s"
    ).to_pylist()[0]
    # direct
    num = var = 0.0
    for k in range(5):
        m = s == k
        nk = float(m.sum())
        a = float((x[m] * y[m]).sum())
        r1, c1 = float(x[m].sum()), float(y[m].sum())
        num += a - r1 * c1 / nk
        var += r1 * (nk - r1) * c1 * (nk - c1) / (nk * nk * (nk - 1))
    assert out["k"] == 5 and out["n"] == n
    assert abs(out["cmh"] - num * num / var) < 1e-4
    assert out["cmh"] > 50  # the planted association is strong


def test_cmh_no_association_small(ray_session):
    import pyarrow as pa
    import ray.data

    from mothray.ops import moments

    rng = np.random.default_rng(122)
    n = 4000
    t = pa.table(
        {
            "x": pa.array((rng.random(n) < 0.5).astype(np.int64)),
            "y": pa.array((rng.random(n) < 0.5).astype(np.int64)),
            "s": pa.array(rng.integers(0, 4, n), pa.int64()),
        }
    )
    out = moments.cmh_test(ray.data.from_arrow(t), "x", "y", "s").to_pylist()[0]
    assert out["cmh"] < 6.0  # ~chi2(1) under the null


def test_auc_known_values(ray_session):
    import pyarrow as pa
    import ray.data

    from mothray.ops import moments

    # perfect separation -> AUC 1; reversed -> 0; ties -> 0.5 credit
    t = pa.table({"s": [1.0, 2.0, 3.0, 4.0], "y": pa.array([0, 0, 1, 1], pa.int64())})
    assert moments.auc_score(ray.data.from_arrow(t), "s", "y").to_pylist()[0]["auc"] == 1.0
    t2 = pa.table({"s": [4.0, 3.0, 2.0, 1.0], "y": pa.array([0, 0, 1, 1], pa.int64())})
    assert moments.auc_score(ray.data.from_arrow(t2), "s", "y").to_pylist()[0]["auc"] == 0.0
    t3 = pa.table({"s": [1.0, 1.0], "y": pa.array([0, 1], pa.int64())})
    assert moments.auc_score(ray.data.from_arrow(t3), "s", "y").to_pylist()[0]["auc"] == 0.5


def test_auc_matches_pair_counting(ray_session):
    import pyarrow as pa
    import ray.data

    from mothray.ops import moments

    rng = np.random.default_rng(131)
    n = 2000
    y = (rng.random(n) < 0.3).astype(np.int64)
    s = np.round(rng.normal(0, 1, n) + y * 0.8, 2)  # informative with ties
    t = pa.table({"s": s, "y": pa.array(y)})
    out = moments.auc_score(
        ray.data.from_arrow(t).repartition(4), "s", "y"
    ).to_pylist()[0]
    pos, neg = s[y == 1], s[y == 0]
    wins = (pos[:, None] > neg[None, :]).sum() + 0.5 * (pos[:, None] == neg[None, :]).sum()
    assert abs(out["auc"] - wins / (len(pos) * len(neg))) < 1e-12
    assert out["n_pos"] == int(y.sum())
