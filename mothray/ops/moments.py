"""Distributed second-moment aggregates: variance / stddev / covariance
/ correlation, grouped or global.

COMBINER pattern (the only scalable shape for these at corpus size):
each batch reduces to one tiny partial row per (group) — counts, means
and CENTERED second moments (M2 = sum (x-mean)^2, C2 = sum
(x-mx)(y-my)) — so only group-width rows enter the exchange. Partials
merge with Chan et al.'s parallel formula, which is a ONE-SHOT
vectorized reduction, not a sequential fold:

    n   = sum n_i
    mean= sum n_i*mean_i / n
    M2  = sum M2_i + sum n_i*(mean_i - mean)^2
    C2  = sum C2_i + sum n_i*(mx_i - mx)*(my_i - my)

(exact in exact arithmetic: substitute and expand the inner sums).
Centering per batch first keeps the magnitudes small, so the merged
result agrees with a numerically-stable single pass to ~ulp — which is
what makes the round-6 DuckDB oracle (var_samp / stddev_samp /
covar_samp / corr) a stable cross-engine check.

No reference analog as a query operator (orc-go's stats are min/max/
sum writer metadata; reference: pkg/store metadata statistics
builders) — engine extension alongside the quantile/HLL sketches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_GRP = "__grp"  # constant-key stand-in when no group column is given


def _var_partials(batch: pa.Table, value_col: str, group_col: str | None) -> pa.Table:
    """One row per in-batch group: (group, n, mean, m2). Arrow hash
    aggregates do the heavy lifting (variance ddof=0 -> m2 = var*n);
    nulls are ignored per SQL aggregate semantics."""
    gcol = group_col or _GRP
    t = pa.table(
        {
            gcol: batch.column(group_col)
            if group_col
            else pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
            "v": pc.cast(batch.column(value_col), pa.float64()),
        }
    )
    agg = t.group_by(gcol, use_threads=False).aggregate(
        [("v", "count"), ("v", "mean"), ("v", "variance", pc.VarianceOptions(ddof=0))]
    )
    n = agg.column("v_count").to_numpy(zero_copy_only=False).astype(np.float64)
    var = np.nan_to_num(agg.column("v_variance").to_numpy(zero_copy_only=False))
    return pa.table(
        {
            gcol: agg.column(gcol),
            "n": pa.array(n),
            "mean": pa.array(np.nan_to_num(agg.column("v_mean").to_numpy(zero_copy_only=False))),
            "m2": pa.array(var * n),
        }
    )


def _merge_var(group: pa.Table, gcol: str, ddof: int, round_digits: int) -> pa.Table:
    n_i = group.column("n").to_numpy(zero_copy_only=False)
    mean_i = group.column("mean").to_numpy(zero_copy_only=False)
    m2_i = group.column("m2").to_numpy(zero_copy_only=False)
    n = n_i.sum()
    if n == 0:
        # a group whose values are ALL null still exists in SQL GROUP
        # BY: emit (g, 0, NULL, NULL, NULL), full schema
        return pa.table(
            {
                gcol: group.column(gcol).slice(0, 1),
                "n": pa.array([0], pa.int64()),
                "mean": pa.array([None], pa.float64()),
                "var_samp": pa.array([None], pa.float64()),
                "std_samp": pa.array([None], pa.float64()),
            }
        )
    mean = float((n_i * mean_i).sum() / n)
    m2 = float(m2_i.sum() + (n_i * (mean_i - mean) ** 2).sum())
    var = m2 / (n - ddof) if n > ddof else None
    return pa.table(
        {
            gcol: group.column(gcol).slice(0, 1),
            "n": pa.array([int(n)], pa.int64()),
            "mean": pa.array([round(mean, round_digits)]),
            "var_samp": pa.array([None if var is None else round(var, round_digits)], pa.float64()),
            "std_samp": pa.array(
                [None if var is None else round(float(np.sqrt(var)), round_digits)], pa.float64()
            ),
        }
    )


def group_variance(
    ds,
    value_col: str,
    group_col: str | None = None,
    ddof: int = 1,
    round_digits: int = 6,
):
    """n / mean / var_samp / std_samp per group (or global). Matches
    DuckDB `count / round(avg,6) / round(var_samp,6) /
    round(stddev_samp,6)`."""
    gcol = group_col or _GRP

    partials = ds.map_batches(
        lambda b: _var_partials(b, value_col, group_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    from .nullkeys import null_safe_group_map

    merged = null_safe_group_map(
        partials, [gcol], lambda g: _merge_var(g, gcol, ddof, round_digits)
    )
    if group_col is None:
        merged = merged.drop_columns([_GRP])
    return merged


def _corr_partials(batch: pa.Table, x_col: str, y_col: str, group_col: str | None) -> pa.Table:
    """One row per in-batch group: (group, n, mx, my, m2x, m2y, c2).
    Pairwise-complete semantics (rows where either side is null drop,
    as SQL corr/covar do). Centered within the batch via raw sums —
    batch-local magnitudes keep that exact to ~ulp."""
    gcol = group_col or _GRP
    x = pc.cast(batch.column(x_col), pa.float64())
    y = pc.cast(batch.column(y_col), pa.float64())
    ok = pc.and_(pc.is_valid(x), pc.is_valid(y))
    # MASK incomplete pairs to null rather than filtering the rows out:
    # a group with zero complete pairs must still emit an n=0 partial
    # (SQL GROUP BY keeps the group; a filter would erase it)
    null_f64 = pa.scalar(None, pa.float64())
    x = pc.if_else(ok, x, null_f64)
    y = pc.if_else(ok, y, null_f64)
    t = pa.table(
        {
            gcol: batch.column(group_col)
            if group_col
            else pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
            "x": x,
            "y": y,
            "xy": pc.multiply(x, y),
            "xx": pc.multiply(x, x),
            "yy": pc.multiply(y, y),
        }
    )
    agg = t.group_by(gcol, use_threads=False).aggregate(
        [("x", "count"), ("x", "sum"), ("y", "sum"), ("xy", "sum"), ("xx", "sum"), ("yy", "sum")]
    )
    n = agg.column("x_count").to_numpy(zero_copy_only=False).astype(np.float64)
    sx = np.nan_to_num(agg.column("x_sum").to_numpy(zero_copy_only=False))
    sy = np.nan_to_num(agg.column("y_sum").to_numpy(zero_copy_only=False))
    with np.errstate(invalid="ignore", divide="ignore"):
        mx = np.where(n > 0, sx / n, 0.0)
        my = np.where(n > 0, sy / n, 0.0)
    sxx = np.nan_to_num(agg.column("xx_sum").to_numpy(zero_copy_only=False))
    syy = np.nan_to_num(agg.column("yy_sum").to_numpy(zero_copy_only=False))
    sxy = np.nan_to_num(agg.column("xy_sum").to_numpy(zero_copy_only=False))
    return pa.table(
        {
            gcol: agg.column(gcol),
            "n": pa.array(n),
            "mx": pa.array(mx),
            "my": pa.array(my),
            "m2x": pa.array(sxx - n * mx * mx),
            "m2y": pa.array(syy - n * my * my),
            "c2": pa.array(sxy - n * mx * my),
        }
    )


def _merge_corr(group: pa.Table, gcol: str, round_digits: int) -> pa.Table:
    n_i = group.column("n").to_numpy(zero_copy_only=False)
    n = n_i.sum()
    if n == 0:
        # all pairs null-incomplete: SQL still emits the group
        return pa.table(
            {
                gcol: group.column(gcol).slice(0, 1),
                "n": pa.array([0], pa.int64()),
                "covar_samp": pa.array([None], pa.float64()),
                "corr": pa.array([None], pa.float64()),
            }
        )
    mx_i = group.column("mx").to_numpy(zero_copy_only=False)
    my_i = group.column("my").to_numpy(zero_copy_only=False)
    mx = float((n_i * mx_i).sum() / n)
    my = float((n_i * my_i).sum() / n)
    dx = mx_i - mx
    dy = my_i - my
    m2x = float(group.column("m2x").to_numpy(zero_copy_only=False).sum() + (n_i * dx * dx).sum())
    m2y = float(group.column("m2y").to_numpy(zero_copy_only=False).sum() + (n_i * dy * dy).sum())
    c2 = float(group.column("c2").to_numpy(zero_copy_only=False).sum() + (n_i * dx * dy).sum())
    covar = c2 / (n - 1) if n > 1 else None
    denom = np.sqrt(m2x * m2y)
    corr = c2 / denom if denom > 0 else None
    return pa.table(
        {
            gcol: group.column(gcol).slice(0, 1),
            "n": pa.array([int(n)], pa.int64()),
            "covar_samp": pa.array(
                [None if covar is None else round(covar, round_digits)], pa.float64()
            ),
            "corr": pa.array([None if corr is None else round(corr, round_digits)], pa.float64()),
        }
    )


def group_corr(
    ds,
    x_col: str,
    y_col: str,
    group_col: str | None = None,
    round_digits: int = 6,
):
    """n / covar_samp / corr per group (or global). Matches DuckDB
    `count / round(covar_samp,6) / round(corr,6)` with
    pairwise-complete null handling."""
    gcol = group_col or _GRP

    partials = ds.map_batches(
        lambda b: _corr_partials(b, x_col, y_col, group_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    from .nullkeys import null_safe_group_map

    merged = null_safe_group_map(
        partials, [gcol], lambda g: _merge_corr(g, gcol, round_digits)
    )
    if group_col is None:
        merged = merged.drop_columns([_GRP])
    return merged


def spearman_corr(
    ds,
    x_col: str,
    y_col: str,
    round_digits: int = 6,
    max_distinct: int = 2_000_000,
):
    """Spearman rank correlation = Pearson correlation over AVERAGE
    ranks (the tie-aware fractional-rank convention SQL reproduces as
    RANK() + (ties-1)/2). Rows with a null in either column are
    excluded first (pairwise-complete). Output: one row (n,
    covar_samp, corr) over the rank columns, round_digits applied —
    the same shape/rounding as group_corr.

    Scale shape: ranks come from the distinct-value-count histogram
    (sketch._value_histogram — the exchange carries distinct values,
    not rows); the two value->rank maps broadcast once via ray.put and
    each batch translates by one searchsorted. Suited to bounded-
    cardinality columns (quantities, scores, buckets); a continuous
    column with ~n distinct values makes the broadcast map O(n) —
    `max_distinct` guards that, and a global sort-rank is the honest
    path there."""
    import pyarrow.compute as pc
    import ray

    from .sketch import _value_histogram

    def pairwise(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col)
        y = batch.column(y_col)
        ok = pc.and_(pc.is_valid(x), pc.is_valid(y))
        t = batch.filter(ok)
        return t.select([x_col, y_col])

    pairs = ds.map_batches(pairwise, batch_format="pyarrow", zero_copy_batch=True).materialize()

    def rank_map(col: str):
        values, cum = _value_histogram(pairs, col)
        if len(values) > max_distinct:
            raise ValueError(
                f"spearman_corr: column {col!r} has {len(values)} distinct values "
                f"(max_distinct={max_distinct}) — the broadcast rank map would be "
                "corpus-sized; rank via a global sort instead"
            )
        counts = np.diff(np.concatenate(([0], cum)))
        avg_rank = (cum - counts) + (counts + 1) / 2.0
        return ray.put((np.asarray(values), avg_rank))

    x_ref, y_ref = rank_map(x_col), rank_map(y_col)

    def to_ranks(batch: pa.Table) -> pa.Table:
        import ray as ray_api

        xv, xr = ray_api.get(x_ref)
        yv, yr = ray_api.get(y_ref)
        x = batch.column(x_col).to_numpy(zero_copy_only=False)
        y = batch.column(y_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "rx": pa.array(xr[np.searchsorted(xv, x)]),
                "ry": pa.array(yr[np.searchsorted(yv, y)]),
            }
        )

    ranked = pairs.map_batches(to_ranks, batch_format="pyarrow", zero_copy_batch=True)
    return group_corr(ranked, "rx", "ry", round_digits=round_digits)


def chi2_independence(ds, a_col: str, b_col: str, round_digits: int = 6) -> pa.Table:
    """Pearson chi-square test of independence for two categorical
    columns: one row (chi2, dof, n). Rows with a null in either column
    are excluded (SQL convention). The contingency table comes from
    ONE combiner-reduced groupby((a, b)).count(); margins and the
    statistic evaluate driver-side over the bounded cell set.

    Cells absent from the data still contribute their expected count:
    sum of e over missing cells = n - sum of e over observed cells
    (total expected mass is n), so both this op and the SQL oracle sum
    only OBSERVED cells plus that closed-form remainder — no cross
    join over the full category product."""
    import pyarrow.compute as pc

    def clean(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col)
        b = batch.column(b_col)
        ok = pc.and_(pc.is_valid(a), pc.is_valid(b))
        return batch.filter(ok).select([a_col, b_col])

    rows = (
        ds.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([a_col, b_col])
        .count()
        .take_all()
    )
    if not rows:
        return pa.table(
            {
                "chi2": pa.array([None], pa.float64()),
                "dof": pa.array([0], pa.int64()),
                "n": pa.array([0], pa.int64()),
            }
        )
    import collections

    ta: dict = collections.defaultdict(int)
    tb: dict = collections.defaultdict(int)
    for r in rows:
        ta[r[a_col]] += r["count()"]
        tb[r[b_col]] += r["count()"]
    n = sum(ta.values())
    chi2 = 0.0
    e_observed = 0.0
    for r in rows:
        o = r["count()"]
        e = ta[r[a_col]] * tb[r[b_col]] / n
        chi2 += (o - e) * (o - e) / e
        e_observed += e
    chi2 += n - e_observed  # missing cells contribute exactly e each
    dof = (len(ta) - 1) * (len(tb) - 1)
    return pa.table(
        {
            "chi2": pa.array([round(chi2, round_digits)], pa.float64()),
            "dof": pa.array([dof], pa.int64()),
            "n": pa.array([n], pa.int64()),
        }
    )


def standardize(
    ds,
    value_cols: list[str],
    group_col: str | None = None,
    ddof: int = 0,
    round_digits: int | None = 6,
    suffix: str = "_z",
):
    """Two-pass distributed z-score transform — the feature-scaling
    step before k-means / ANN / model training. Pass 1 reduces each
    batch to one (column, group) Chan partial (the exchange carries
    cols x in-batch-groups tiny rows, never values); the merged stats
    table — bounded by cols x groups, not the corpus — broadcasts
    once via ray.put. Pass 2 is a pure map_batches: z = (x - mean) /
    std, matching ROUND((x - AVG(x) OVER (PARTITION BY g)) /
    NULLIF(STDDEV_POP(x) OVER (PARTITION BY g), 0), 6). Null x or a
    zero-variance group yields null z (both sides agree via NULLIF)."""
    import ray

    gcol = group_col or _GRP

    def partials(batch: pa.Table) -> pa.Table:
        parts = []
        for c in value_cols:
            p = _var_partials(batch, c, group_col)
            parts.append(p.append_column("__col", pa.array([c] * p.num_rows, pa.string())))
        t = pa.concat_tables(parts)
        # Ray's sort-based groupby cannot order a NULLABLE key, but a
        # null group is a real SQL partition: shuffle on a string-cast
        # SURROGATE key plus a null flag (works for any scalar group
        # type — date/decimal/float included), carrying the original
        # typed key through as a payload column for the stats map
        garr = t.column(gcol)
        isnull = pc.is_null(garr)
        gkey = pc.fill_null(pc.cast(garr, pa.string()), "")
        t = t.append_column("__gkey", gkey)
        return t.append_column("__gnull", pc.cast(isnull, pa.int8()))

    def merge(group: pa.Table) -> pa.Table:
        n_i = group.column("n").to_numpy(zero_copy_only=False)
        mean_i = group.column("mean").to_numpy(zero_copy_only=False)
        m2_i = group.column("m2").to_numpy(zero_copy_only=False)
        n = n_i.sum()
        if n == 0:
            return group.select([gcol, "__col"]).slice(0, 0)
        mean = float((n_i * mean_i).sum() / n)
        m2 = float(m2_i.sum() + (n_i * (mean_i - mean) ** 2).sum())
        var = m2 / (n - ddof) if n > ddof else 0.0
        return pa.table(
            {
                gcol: group.column(gcol).slice(0, 1),  # typed, null for the null group
                "__col": group.column("__col").slice(0, 1),
                "mean": pa.array([mean], pa.float64()),
                "std": pa.array([float(np.sqrt(max(var, 0.0)))], pa.float64()),
            }
        )

    stats_rows = (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["__gkey", "__gnull", "__col"])
        .map_groups(merge, batch_format="pyarrow")
        .take_all()
    )
    stats = {(r["__col"], r[gcol]): (r["mean"], r["std"]) for r in stats_rows}
    ref = ray.put(stats)

    def apply(batch: pa.Table) -> pa.Table:
        st = ray.get(ref)
        out = batch
        if group_col is not None:
            # dictionary_encode instead of np.unique: null groups are a
            # real SQL partition, and np.unique on an object array with
            # None cannot sort. Codes are -1 for null -> slot len(uniq).
            gcol = batch.column(group_col)
            gcol = gcol.combine_chunks() if isinstance(gcol, pa.ChunkedArray) else gcol
            denc = gcol.dictionary_encode()
            inv = denc.indices.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
            uniq = denc.dictionary.to_pylist() + [None]
            inv = np.where(inv < 0, len(uniq) - 1, inv)
        for c in value_cols:
            col = batch.column(c)
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            x = pc.cast(col, pa.float64()).to_numpy(zero_copy_only=False)
            valid = col.is_valid().to_numpy(zero_copy_only=False)
            if group_col is not None:
                means = np.array([st.get((c, u), (0.0, 0.0))[0] for u in uniq])
                stds = np.array([st.get((c, u), (0.0, 0.0))[1] for u in uniq])
                mean_r, std_r = means[inv], stds[inv]
            else:
                mean_r, std_r = st.get((c, 0), (0.0, 0.0))
            with np.errstate(invalid="ignore", divide="ignore"):
                z = (x - mean_r) / np.where(std_r == 0.0, np.nan, std_r)
            if round_digits is not None:
                z = np.round(z, round_digits)
            mask = ~valid | np.isnan(z)
            out = out.append_column(f"{c}{suffix}", pa.array(z, pa.float64(), mask=mask))
        return out

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)


def _merge_linregress(group: pa.Table, gcol: str, round_digits: int) -> pa.Table:
    """Chan-merge of _corr_partials rows into the OLS line of y on x:
    slope = C2/M2x, intercept = my - slope*mx, r2 = C2^2/(M2x*M2y).
    Degenerate-group semantics follow SQL regr_*: M2x == 0 (constant
    or absent x) -> slope/intercept/r2 all NULL; M2y == 0 with
    M2x > 0 (constant y) -> r2 = 1."""
    n_i = group.column("n").to_numpy(zero_copy_only=False)
    n = n_i.sum()
    null_row = pa.table(
        {
            gcol: group.column(gcol).slice(0, 1),
            "n": pa.array([int(n)], pa.int64()),
            "slope": pa.array([None], pa.float64()),
            "intercept": pa.array([None], pa.float64()),
            "r2": pa.array([None], pa.float64()),
        }
    )
    if n == 0:
        return null_row
    mx_i = group.column("mx").to_numpy(zero_copy_only=False)
    my_i = group.column("my").to_numpy(zero_copy_only=False)
    mx = float((n_i * mx_i).sum() / n)
    my = float((n_i * my_i).sum() / n)
    dx = mx_i - mx
    dy = my_i - my
    m2x = float(group.column("m2x").to_numpy(zero_copy_only=False).sum() + (n_i * dx * dx).sum())
    m2y = float(group.column("m2y").to_numpy(zero_copy_only=False).sum() + (n_i * dy * dy).sum())
    c2 = float(group.column("c2").to_numpy(zero_copy_only=False).sum() + (n_i * dx * dy).sum())
    if m2x <= 0:
        return null_row
    slope = c2 / m2x
    intercept = my - slope * mx
    r2 = 1.0 if m2y == 0 else (c2 * c2) / (m2x * m2y)
    return pa.table(
        {
            gcol: group.column(gcol).slice(0, 1),
            "n": pa.array([int(n)], pa.int64()),
            "slope": pa.array([round(slope, round_digits)], pa.float64()),
            "intercept": pa.array([round(intercept, round_digits)], pa.float64()),
            "r2": pa.array([round(r2, round_digits)], pa.float64()),
        }
    )


def group_linregress(
    ds,
    x_col: str,
    y_col: str,
    group_col: str | None = None,
    round_digits: int = 6,
):
    """Simple OLS regression of y on x per group (or global):
    n / slope / intercept / r2, matching DuckDB
    `regr_count / round(regr_slope,6) / round(regr_intercept,6) /
    round(regr_r2,6)` with pairwise-complete null handling. Same
    combiner shape (one partial row per in-batch group) as group_corr
    — only group-width rows enter the exchange."""
    gcol = group_col or _GRP
    partials = ds.map_batches(
        lambda b: _corr_partials(b, x_col, y_col, group_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    from .nullkeys import null_safe_group_map

    merged = null_safe_group_map(
        partials, [gcol], lambda g: _merge_linregress(g, gcol, round_digits)
    )
    if group_col is None:
        merged = merged.drop_columns([_GRP])
    return merged


def welch_t_test(
    ds,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    round_digits: int = 6,
) -> pa.Table:
    """Two-sample Welch t statistic (unequal variances) between the
    rows whose group_col equals group_a vs group_b. One row out:
    (n_a, n_b, mean_a, mean_b, t, welch_df). The heavy pass is the
    group_variance combiner (one partial row per batch-group); the
    final formula evaluates driver-side over TWO rows, written in the
    same operation order as the SQL oracle so the round-6 cells agree:

        se2 = va/na + vb/nb;  t = (ma - mb)/sqrt(se2)
        df  = se2*se2 / ((va/na)^2/(na-1) + (vb/nb)^2/(nb-1))
    """

    def keep(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        m = pc.or_(pc.equal(g, group_a), pc.equal(g, group_b))
        return batch.filter(pc.fill_null(m, False)).select([group_col, value_col])

    two = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    # round_digits=12 on the intermediate moments: 1e-12-relative noise
    # on ~1e2-scale means/vars is invisible after the round-6 output
    rows = {
        r[group_col]: r
        for r in group_variance(two, value_col, group_col, round_digits=12).take_all()
    }
    a, b = rows.get(group_a), rows.get(group_b)

    def _one(na, nb, ma, mb, t, df):
        return pa.table(
            {
                "n_a": pa.array([na], pa.int64()),
                "n_b": pa.array([nb], pa.int64()),
                "mean_a": pa.array([ma], pa.float64()),
                "mean_b": pa.array([mb], pa.float64()),
                "t": pa.array([t], pa.float64()),
                "welch_df": pa.array([df], pa.float64()),
            }
        )

    if a is None or b is None or a["n"] < 2 or b["n"] < 2:
        return _one(
            a["n"] if a else 0,
            b["n"] if b else 0,
            round(a["mean"], round_digits) if a and a["n"] else None,
            round(b["mean"], round_digits) if b and b["n"] else None,
            None,
            None,
        )
    na, nb = float(a["n"]), float(b["n"])
    va_n, vb_n = a["var_samp"] / na, b["var_samp"] / nb
    se2 = va_n + vb_n
    t = (a["mean"] - b["mean"]) / float(np.sqrt(se2)) if se2 > 0 else None
    df = (
        se2 * se2 / (va_n * va_n / (na - 1) + vb_n * vb_n / (nb - 1))
        if se2 > 0
        else None
    )
    return _one(
        a["n"],
        b["n"],
        round(a["mean"], round_digits),
        round(b["mean"], round_digits),
        None if t is None else round(t, round_digits),
        None if df is None else round(df, round_digits),
    )


def mann_whitney_u(
    ds,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    round_digits: int = 6,
    max_distinct: int = 2_000_000,
) -> pa.Table:
    """Mann-Whitney U rank-sum test between two groups. One row out:
    (n_a, n_b, u_a, u_b, z) where u_a = R_a - n_a(n_a+1)/2 over
    tie-averaged fractional ranks and z is the normal approximation
    with the tie correction (no continuity correction):

        sigma^2 = n_a*n_b/12 * ((N+1) - sum(t^3 - t)/(N*(N-1)))

    EXACTNESS: fractional ranks are half-integers <= N, so every rank
    sum is a multiple of 0.5 well below 2^52 — float64 addition is
    exact in ANY merge order, making u_a/u_b bit-deterministic (the
    same trick as the KS statistic). Only z involves real float math,
    written in the same operation order as the SQL oracle.

    Scale shape: ranks come from the distinct-value histogram (the
    exchange carries distinct values, not rows) and broadcast once via
    ray.put — same contract and max_distinct guard as spearman_corr."""
    import ray

    from .sketch import _value_histogram

    def keep(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        v = batch.column(value_col)
        m = pc.and_(
            pc.or_(pc.equal(g, group_a), pc.equal(g, group_b)), pc.is_valid(v)
        )
        return batch.filter(pc.fill_null(m, False)).select([group_col, value_col])

    two = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True).materialize()
    values, cum = _value_histogram(two, value_col)
    if len(values) > max_distinct:
        raise ValueError(
            f"mann_whitney_u: column {value_col!r} has {len(values)} distinct values "
            f"(max_distinct={max_distinct}) — rank via a global sort instead"
        )
    counts = np.diff(np.concatenate(([0], cum))).astype(np.float64)
    avg_rank = (cum - counts) + (counts + 1) / 2.0
    ref = ray.put((np.asarray(values), avg_rank))

    def partial(batch: pa.Table) -> pa.Table:
        import ray as ray_api

        vv, rr = ray_api.get(ref)
        g = batch.column(group_col)
        is_a = pc.equal(g, group_a).to_numpy(zero_copy_only=False)
        r = rr[np.searchsorted(vv, batch.column(value_col).to_numpy(zero_copy_only=False))]
        return pa.table(
            {
                "ra": pa.array([float(r[is_a].sum())]),
                "na": pa.array([int(is_a.sum())], pa.int64()),
                "rb": pa.array([float(r[~is_a].sum())]),
                "nb": pa.array([int((~is_a).sum())], pa.int64()),
            }
        )

    p = two.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    ra = p.sum("ra") or 0.0
    na = int(p.sum("na") or 0)
    rb = p.sum("rb") or 0.0
    nb = int(p.sum("nb") or 0)
    if na == 0 or nb == 0:
        return pa.table(
            {
                "n_a": pa.array([na], pa.int64()),
                "n_b": pa.array([nb], pa.int64()),
                "u_a": pa.array([None], pa.float64()),
                "u_b": pa.array([None], pa.float64()),
                "z": pa.array([None], pa.float64()),
            }
        )
    u_a = ra - na * (na + 1) / 2.0
    u_b = rb - nb * (nb + 1) / 2.0
    n_tot = float(na + nb)
    ties = float(((counts**3 - counts)).sum())
    sigma2 = na * nb / 12.0 * ((n_tot + 1) - ties / (n_tot * (n_tot - 1)))
    z = (u_a - na * nb / 2.0) / float(np.sqrt(sigma2)) if sigma2 > 0 else None
    return pa.table(
        {
            "n_a": pa.array([na], pa.int64()),
            "n_b": pa.array([nb], pa.int64()),
            "u_a": pa.array([u_a], pa.float64()),
            "u_b": pa.array([u_b], pa.float64()),
            "z": pa.array([None if z is None else round(z, round_digits)], pa.float64()),
        }
    )


def corr_matrix(ds, cols: list[str], round_digits: int = 6) -> pa.Table:
    """Pairwise Pearson correlations of k numeric columns in ONE pass:
    each batch reduces to (n, mean vector, centered scatter matrix
    S = (X-mu)^T (X-mu)) — a single k^2-double row — and partials
    merge with the multivariate Chan formula

        S = sum S_i + sum n_i (mu_i - mu)(mu_i - mu)^T.

    Rows with a null in ANY selected column drop first (LISTWISE
    deletion, so every pair shares one sample — the convention that
    makes the matrix positive semidefinite; SQL oracle mirrors it
    with a WHERE over all columns). Output: one row per unordered
    pair (col_x, col_y, corr), x before y in the given column order.

    Scale shape: the exchange carries one k^2-width row per batch;
    the driver reduces bounded partials exactly like kmeans_fit."""
    import pyarrow.compute as pc

    k = len(cols)

    def partial(batch: pa.Table) -> pa.Table:
        X = np.column_stack(
            [
                pc.cast(batch.column(c), pa.float64()).to_numpy(zero_copy_only=False)
                for c in cols
            ]
        )
        X = X[~np.isnan(X).any(axis=1)]
        n = len(X)
        mu = X.mean(axis=0) if n else np.zeros(k)
        C = X - mu
        S = C.T @ C if n else np.zeros((k, k))
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "mu": pa.array([mu.tobytes()], pa.binary()),
                "s": pa.array([S.tobytes()], pa.binary()),
            }
        )

    n_tot = 0
    mu_parts: list[tuple[int, np.ndarray, np.ndarray]] = []
    for b in (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_format="pyarrow")
    ):
        for i in range(b.num_rows):
            n_i = int(b.column("n")[i].as_py())
            if n_i == 0:
                continue
            mu_i = np.frombuffer(b.column("mu")[i].as_py(), dtype=np.float64)
            s_i = np.frombuffer(b.column("s")[i].as_py(), dtype=np.float64).reshape(k, k)
            mu_parts.append((n_i, mu_i, s_i))
            n_tot += n_i
    names_x, names_y, vals = [], [], []
    if n_tot:
        mu = sum(n_i * mu_i for n_i, mu_i, _ in mu_parts) / n_tot
        S = sum(
            s_i + n_i * np.outer(mu_i - mu, mu_i - mu) for n_i, mu_i, s_i in mu_parts
        )
        d = np.sqrt(np.diag(S))
        with np.errstate(invalid="ignore", divide="ignore"):
            R = S / np.outer(d, d)
    for i in range(k):
        for j in range(i + 1, k):
            names_x.append(cols[i])
            names_y.append(cols[j])
            if n_tot == 0 or not np.isfinite(R[i, j]):
                vals.append(None)
            else:
                vals.append(round(float(R[i, j]), round_digits))
    return pa.table(
        {
            "col_x": pa.array(names_x, pa.string()),
            "col_y": pa.array(names_y, pa.string()),
            "corr": pa.array(vals, pa.float64()),
        }
    )


def mutual_information(ds, a_col: str, b_col: str, round_digits: int = 6) -> pa.Table:
    """Association measures for two categorical columns from ONE
    combiner-reduced contingency pass (the same shape as
    chi2_independence): mutual information in nats

        MI = sum_ij p_ij * ln(p_ij / (p_i * p_j))

    (absent cells contribute exactly 0) and Cramér's V =
    sqrt(chi2 / (n * min(r-1, c-1))) with chi2 via the same
    missing-cell closed form as chi2_independence. One row out:
    (mi_nats, cramers_v, n). Null rows drop (SQL convention)."""
    import collections

    import pyarrow.compute as pc

    def clean(batch: pa.Table) -> pa.Table:
        a = batch.column(a_col)
        b = batch.column(b_col)
        ok = pc.and_(pc.is_valid(a), pc.is_valid(b))
        return batch.filter(ok).select([a_col, b_col])

    rows = (
        ds.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([a_col, b_col])
        .count()
        .take_all()
    )
    if not rows:
        return pa.table(
            {
                "mi_nats": pa.array([None], pa.float64()),
                "cramers_v": pa.array([None], pa.float64()),
                "n": pa.array([0], pa.int64()),
            }
        )
    ta: dict = collections.defaultdict(int)
    tb: dict = collections.defaultdict(int)
    for r in rows:
        ta[r[a_col]] += r["count()"]
        tb[r[b_col]] += r["count()"]
    n = sum(ta.values())
    mi = 0.0
    chi2 = 0.0
    e_observed = 0.0
    for r in rows:
        o = r["count()"]
        pij = o / n
        e = ta[r[a_col]] * tb[r[b_col]] / n
        mi += pij * float(np.log(o * n / (ta[r[a_col]] * tb[r[b_col]])))
        chi2 += (o - e) * (o - e) / e
        e_observed += e
    chi2 += n - e_observed
    denom = min(len(ta) - 1, len(tb) - 1)
    v = float(np.sqrt(chi2 / (n * denom))) if denom > 0 else None
    return pa.table(
        {
            "mi_nats": pa.array([round(mi, round_digits)], pa.float64()),
            "cramers_v": pa.array(
                [None if v is None else round(v, round_digits)], pa.float64()
            ),
            "n": pa.array([n], pa.int64()),
        }
    )


def with_global_frac_rank(ds, col: str, out_col: str = "frac_rank",
                          n_buckets: int | None = None, method: str = "average"):
    """Append the GLOBAL tie-averaged fractional rank of `col` (SQL
    rank() + (ties-1)/2), or with method="min" the SQL rank() itself
    (minimum rank of the tie run), via a range-partitioned sort — the honest
    scale path when the distinct-value count is too large for
    spearman_corr's broadcast histogram:

    1. order-preserving range boundaries from pack.sample_boundaries
       (bounded fingerprint sample, KMV-sized bucket count);
    2. one exact per-bucket count pass -> driver-side offsets
       (bucket-width rows only);
    3. one groupby(bucket) exchange; local fractional ranks + the
       bucket offset. Rows with equal values land in ONE bucket
       (searchsorted on value boundaries), so ties never straddle a
       boundary and ranks are exact half-integers — bit-deterministic
       under any partitioning, like the Mann-Whitney rank sums.

    Null values keep a NULL rank and do not consume rank positions.
    Per-bucket state is O(corpus / n_buckets); nothing corpus-sized
    touches the driver."""
    import ray

    from .nullkeys import null_safe_group_map
    from .pack import sample_boundaries

    def non_null(batch: pa.Table) -> pa.Table:
        c = batch.column(col)
        return batch.filter(pc.is_valid(c)).select([col])

    bnd, _ = sample_boundaries(
        ds.map_batches(non_null, batch_format="pyarrow", zero_copy_batch=True),
        col,
        n_buckets=n_buckets,
    )

    def bucketize(batch: pa.Table) -> pa.Table:
        v = batch.column(col)
        v = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
        valid = v.is_valid().to_numpy(zero_copy_only=False)
        if len(bnd):
            x = v.to_numpy(zero_copy_only=False)
            bkt = np.searchsorted(bnd, x, side="right").astype(np.int64)
        else:
            bkt = np.zeros(batch.num_rows, dtype=np.int64)
        bkt = np.where(valid, bkt, -1)  # null values: marker bucket
        return batch.append_column("__bkt", pa.array(bkt, pa.int64()))

    bucketed = ds.map_batches(
        bucketize, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def count_partial(t: pa.Table) -> pa.Table:
        b = pa.table({"__bkt": t.column("__bkt")})
        return b.group_by("__bkt", use_threads=False).aggregate([("__bkt", "count")])

    counts = {
        r["__bkt"]: r["sum(__bkt_count)"]
        for r in bucketed.map_batches(
            count_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("__bkt")
        .sum("__bkt_count")
        .take_all()
    }
    offsets = {}
    acc = 0
    for b in sorted(k for k in counts if k >= 0):
        offsets[b] = acc
        acc += counts[b]
    off_ref = ray.put(offsets)

    def rank_group(g: pa.Table) -> pa.Table:
        import ray as ray_api

        bkt = int(g.column("__bkt")[0].as_py())
        g = g.drop_columns(["__bkt"])
        if bkt < 0:  # the null-value bucket
            return g.append_column(out_col, pa.nulls(g.num_rows, pa.float64()))
        off = ray_api.get(off_ref)[bkt]
        v = g.column(col).to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        sv = v[order]
        new_val = np.r_[True, sv[1:] != sv[:-1]]
        starts = np.flatnonzero(new_val)
        sizes = np.diff(np.r_[starts, len(sv)])
        if method == "min":
            # SQL rank(): every row of a tie run gets the run's start
            rk = (starts + 1).astype(np.float64)
        else:
            # avg rank of a tie run starting at s (0-based) with size t:
            # (s+1 + s+t) / 2  -> exact half-integers
            rk = starts + (sizes + 1) / 2.0
        ranks_sorted = np.repeat(rk, sizes) + off
        ranks = np.empty(len(sv))
        ranks[order] = ranks_sorted
        return g.append_column(out_col, pa.array(ranks, pa.float64()))

    return null_safe_group_map(bucketed, ["__bkt"], rank_group)


def spearman_corr_sorted(ds, x_col: str, y_col: str, round_digits: int = 6):
    """Spearman rank correlation for UNBOUNDED-cardinality columns:
    pairwise-complete rows get global fractional ranks per column via
    two range-partitioned sorts (with_global_frac_rank), then the
    Pearson combiner runs over the rank pair. Same output shape as
    spearman_corr (n / covar_samp / corr) — but callers comparing
    against SQL should project n and corr only: covar_samp of ranks
    is O(n^2)-scale and round-6 of a ~1e8 double exceeds what
    cross-engine float determinism guarantees."""
    import pyarrow.compute as pc

    def pairwise(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col)
        y = batch.column(y_col)
        ok = pc.and_(pc.is_valid(x), pc.is_valid(y))
        return batch.filter(ok).select([x_col, y_col])

    pairs = ds.map_batches(pairwise, batch_format="pyarrow", zero_copy_batch=True)
    ranked = with_global_frac_rank(
        with_global_frac_rank(pairs, x_col, out_col="__rx"), y_col, out_col="__ry"
    )
    return group_corr(ranked, "__rx", "__ry", round_digits=round_digits)


def grouped_mode(ds, group_col: str, value_col: str):
    """SQL mode() per group, ties broken by smallest value: (group,
    mode_value, mode_cnt BIGINT). Exchange: per-batch (group, value,
    cnt) combiner partials -> one groupby over distinct (group, value)
    pairs -> per-group argmax via a second tiny grouped pass (rows =
    distinct pairs, never the input). Oracle: row_number() OVER
    (PARTITION BY g ORDER BY cnt DESC, v) = 1."""
    import pyarrow as pa

    from ray.data.aggregate import Sum

    from .nullkeys import null_safe_group_aggregate, null_safe_group_map

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # SQL mode() ignores NULL values (null GROUP keys still form
        # their own legal partition, handled by nullkeys)
        batch = batch.filter(pc.is_valid(batch.column(value_col)))
        g = (
            batch.select([group_col, value_col])
            .group_by([group_col, value_col], use_threads=False)
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                group_col: g.column(group_col),
                value_col: g.column(value_col),
                "cnt": g.column("count_all").cast(pa.int64()),
            }
        )

    pairs = null_safe_group_aggregate(
        ds.select_columns(sorted({group_col, value_col})).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        [group_col, value_col],
        [Sum("cnt", alias_name="cnt")],
    )

    def argmax(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(
            group, sort_keys=[("cnt", "descending"), (value_col, "ascending")]
        )
        top = group.take(idx.slice(0, 1))
        return pa.table(
            {
                group_col: top.column(group_col),
                "mode_value": top.column(value_col),
                "mode_cnt": top.column("cnt"),
            }
        )

    # no trailing sort: a null group key would crash Ray's sort; the
    # result is one row per group, order-free by contract
    return null_safe_group_map(pairs, [group_col], argmax)


def ols_multi(ds, y_col: str, x_cols: list[str], round_digits: int = 4):
    """Multiple linear regression via distributed NORMAL EQUATIONS:
    each batch contributes one row of cross-product sums (the (k+1)²
    Gram matrix X'X with intercept, X'y, y'y), a single global-sum
    exchange merges them, and the (k+1)-dim solve runs driver-side —
    the classic one-pass distributed OLS (k is feature count, so the
    exchange is O(k²) per batch regardless of row count).

    Output (one row): n BIGINT, b0_r{d} (intercept), b{i}_r{d} per
    feature (coefficients rounded to `round_digits` — cross-product
    sums of ~1e10 magnitude leave ~1e-9 relative merge-order noise
    after the normal-matrix condition number, so round-4 is the honest
    resolution), r2_r6. Rows with ANY null among y/x are excluded
    (SQL regr_* pairwise-complete semantics). SQL mirror: the same
    sums + explicit Cramer solve."""
    from ray.data.aggregate import Sum

    cols = [y_col] + list(x_cols)
    k = len(x_cols)

    def partial(batch: pa.Table) -> pa.Table:
        valid = None
        for c in cols:
            v = pc.is_valid(batch.column(c))
            valid = v if valid is None else pc.and_(valid, v)
        sub = batch.filter(valid) if pc.any(pc.invert(valid)).as_py() else batch
        y = sub.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
        X = np.column_stack(
            [np.ones(len(y))]
            + [
                sub.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
                for c in x_cols
            ]
        )
        A = X.T @ X
        b = X.T @ y
        out = {"n": pa.array([len(y)], pa.int64())}
        for i in range(k + 1):
            for j in range(i, k + 1):
                out[f"a_{i}_{j}"] = pa.array([A[i, j]], pa.float64())
            out[f"b_{i}"] = pa.array([b[i]], pa.float64())
        out["syy"] = pa.array([float(y @ y)], pa.float64())
        return pa.table(out)

    partials = ds.select_columns(sorted(set(cols))).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    sum_cols = (
        ["n"]
        + [f"a_{i}_{j}" for i in range(k + 1) for j in range(i, k + 1)]
        + [f"b_{i}" for i in range(k + 1)]
        + ["syy"]
    )
    tot = partials.aggregate(*[Sum(c, alias_name=c) for c in sum_cols])
    A = np.empty((k + 1, k + 1))
    for i in range(k + 1):
        for j in range(i, k + 1):
            A[i, j] = A[j, i] = tot[f"a_{i}_{j}"]
    rhs = np.array([tot[f"b_{i}"] for i in range(k + 1)])
    beta = np.linalg.solve(A, rhs)
    n, syy, sy = int(tot["n"]), tot["syy"], tot["b_0"]
    sse = syy - float(beta @ rhs)
    sst = syy - sy * sy / n
    r2 = 1.0 - sse / sst if sst else 0.0
    out = {"n": pa.array([n], pa.int64())}
    for i in range(k + 1):
        out[f"b{i}_r{round_digits}"] = pa.array(
            [float(np.round(beta[i], round_digits))], pa.float64()
        )
    out["r2_r6"] = pa.array([float(np.round(r2, 6))], pa.float64())
    return pa.table(out)


def anova_oneway(ds, value_col: str, group_col: str, round_digits: int = 6) -> pa.Table:
    """One-way ANOVA F statistic of value_col across group_col levels.
    One row out: (k, n, f_stat). The heavy pass is the group_variance
    combiner (one partial row per batch-group); the final formula runs
    driver-side over k rows in the same operation order as the SQL
    oracle:

        gm  = sum(n_g * mean_g) / N
        ssb = sum(n_g * (mean_g - gm)^2);      msb = ssb / (k - 1)
        ssw = sum((n_g - 1) * var_samp_g);     msw = ssw / (N - k)
        F   = msb / msw
    """
    rows = [
        r
        for r in group_variance(ds, value_col, group_col, round_digits=12).take_all()
        if r["n"] > 0
    ]
    k = len(rows)
    n_g = np.array([float(r["n"]) for r in rows])
    n = float(n_g.sum())
    if k < 2 or n <= k:
        return pa.table(
            {
                "k": pa.array([k], pa.int64()),
                "n": pa.array([int(n)], pa.int64()),
                "f_stat": pa.array([None], pa.float64()),
            }
        )
    mean_g = np.array([r["mean"] for r in rows])
    var_g = np.array([0.0 if r["var_samp"] is None else r["var_samp"] for r in rows])
    gm = float((n_g * mean_g).sum() / n)
    msb = float((n_g * (mean_g - gm) ** 2).sum()) / (k - 1)
    msw = float(((n_g - 1) * var_g).sum()) / (n - k)
    f = msb / msw if msw > 0 else None
    return pa.table(
        {
            "k": pa.array([k], pa.int64()),
            "n": pa.array([int(n)], pa.int64()),
            "f_stat": pa.array(
                [None if f is None else round(f, round_digits)], pa.float64()
            ),
        }
    )


def kruskal_wallis(
    ds,
    value_col: str,
    group_col: str,
    round_digits: int = 6,
    max_distinct: int = 2_000_000,
) -> pa.Table:
    """Kruskal-Wallis H test (tie-corrected) of value_col across
    group_col levels. One row out: (k, n, h_stat) with

        H  = 12/(N(N+1)) * sum(R_g^2 / n_g) - 3(N+1)
        Hc = H / (1 - sum(t^3 - t) / (N^3 - N))

    over tie-averaged fractional ranks. Same exactness argument as
    mann_whitney_u: fractional ranks are half-integers, so per-group
    rank sums are bit-deterministic in any merge order; only the final
    driver-side formula (written in the oracle's operation order) does
    real float math. Ranks come from the distinct-value histogram
    broadcast once via ray.put — the exchange carries distinct values
    and one (group, rank-sum, count) row per batch-group, never rows."""
    import ray

    from .nullkeys import null_safe_group_map
    from .sketch import _value_histogram

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch.column(value_col))).select(
            [group_col, value_col]
        )

    vals = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True).materialize()
    values, cum = _value_histogram(vals, value_col)
    if len(values) > max_distinct:
        raise ValueError(
            f"kruskal_wallis: column {value_col!r} has {len(values)} distinct values "
            f"(max_distinct={max_distinct}) — rank via a global sort instead"
        )
    counts = np.diff(np.concatenate(([0], cum))).astype(np.float64)
    avg_rank = (cum - counts) + (counts + 1) / 2.0
    ref = ray.put((np.asarray(values), avg_rank))

    def partial(batch: pa.Table) -> pa.Table:
        import ray as ray_api

        vv, rr = ray_api.get(ref)
        r = rr[np.searchsorted(vv, batch.column(value_col).to_numpy(zero_copy_only=False))]
        t = pa.table(
            {
                group_col: batch.column(group_col),
                "rsum": pa.array(r, pa.float64()),
            }
        )
        g = t.group_by([group_col]).aggregate([("rsum", "sum"), ("rsum", "count")])
        return g.rename_columns([group_col, "rsum", "cnt"])

    p = vals.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def merge(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                group_col: group.column(group_col).slice(0, 1),
                "rsum": pa.array(
                    [float(group.column("rsum").to_numpy(zero_copy_only=False).sum())]
                ),
                "cnt": pa.array(
                    [int(group.column("cnt").to_numpy(zero_copy_only=False).sum())],
                    pa.int64(),
                ),
            }
        )

    rows = null_safe_group_map(p, [group_col], merge).take_all()
    k = len(rows)
    n = float(sum(r["cnt"] for r in rows))
    if k < 2 or n < 2:
        return pa.table(
            {
                "k": pa.array([k], pa.int64()),
                "n": pa.array([int(n)], pa.int64()),
                "h_stat": pa.array([None], pa.float64()),
            }
        )
    h = 0.0
    for r in sorted(rows, key=lambda r: str(r[group_col])):
        h += r["rsum"] * r["rsum"] / r["cnt"]
    h = 12.0 / (n * (n + 1)) * h - 3.0 * (n + 1)
    ties = float((counts**3 - counts).sum())
    denom = 1.0 - ties / (n**3 - n)
    hc = h / denom if denom > 0 else None
    return pa.table(
        {
            "k": pa.array([k], pa.int64()),
            "n": pa.array([int(n)], pa.int64()),
            "h_stat": pa.array(
                [None if hc is None else round(hc, round_digits)], pa.float64()
            ),
        }
    )


def kendall_tau(ds, x_col: str, y_col: str, round_digits: int = 6,
                max_rows: int = 20_000) -> pa.Table:
    """Kendall tau-b between two columns of a SMALL dataset (intended
    for pre-aggregated series — e.g. daily revenue vs daily order
    count — whose size is bounded by the key domain, not the corpus;
    the max_rows guard enforces that contract). One row out:
    (n, concordant, discordant, tau_b) with the standard tie-corrected

        tau_b = (C - D) / sqrt((n0 - n1)(n0 - n2)),  n0 = n(n-1)/2

    Pairs are evaluated vectorized in row chunks (chunk x n sign
    products, so memory stays bounded while every pair is covered
    exactly once via the j > i mask) — exact integer counts, so only
    the final ratio is float math."""
    tbl = pa.Table.from_pylist(ds.take_all()) if not isinstance(ds, pa.Table) else ds
    x = tbl.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64)
    y = tbl.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
    ok = ~(np.isnan(x) | np.isnan(y))
    x, y = x[ok], y[ok]
    n = len(x)
    if n > max_rows:
        raise ValueError(
            f"kendall_tau: {n} rows exceeds max_rows={max_rows} — "
            "pre-aggregate the series first"
        )
    if n < 2:
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "concordant": pa.array([0], pa.int64()),
                "discordant": pa.array([0], pa.int64()),
                "tau_b": pa.array([None], pa.float64()),
            }
        )
    c = d = n1 = n2 = 0
    chunk = max(1, 4_000_000 // n)
    col = np.arange(n)[None, :]
    for i0 in range(0, n, chunk):
        i1 = min(i0 + chunk, n)
        upper = col > np.arange(i0, i1)[:, None]  # each pair once
        sx = np.sign(x[i0:i1, None] - x[None, :])
        sy = np.sign(y[i0:i1, None] - y[None, :])
        prod = sx * sy
        c += int(((prod > 0) & upper).sum())
        d += int(((prod < 0) & upper).sum())
        n1 += int(((sx == 0) & upper).sum())
        n2 += int(((sy == 0) & upper).sum())
    n0 = n * (n - 1) // 2
    denom = float(np.sqrt(float(n0 - n1) * float(n0 - n2)))
    tau = (c - d) / denom if denom > 0 else None
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "concordant": pa.array([c], pa.int64()),
            "discordant": pa.array([d], pa.int64()),
            "tau_b": pa.array(
                [None if tau is None else round(tau, round_digits)], pa.float64()
            ),
        }
    )


def group_power_means(ds, value_col: str, group_col: str, round_digits: int = 6):
    """Geometric and harmonic means per group (requires strictly
    positive values; non-positive and null rows drop, as SQL ln/1/x
    would). Matches DuckDB `exp(sum(ln(v))/count(v))` and
    `count(v)/sum(1.0/v)`. Combiner-shaped: each batch reduces to one
    (group, n, sum_ln, sum_inv) row, so only group-width rows enter
    the exchange."""
    gcol = group_col or _GRP

    def partial(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch.column(value_col), pa.float64())
        ok = pc.and_(pc.is_valid(v), pc.greater(v, 0.0))
        null_f64 = pa.scalar(None, pa.float64())
        v = pc.if_else(pc.fill_null(ok, False), v, null_f64)
        vv = v.to_numpy(zero_copy_only=False)
        valid = ~np.isnan(vv)
        gt = pa.table(
            {
                gcol: batch.column(group_col),
                "v": v,  # null where dropped -> count() = kept rows
                "sln": pa.array(np.log(vv, where=valid, out=np.zeros(len(vv)))),
                "sinv": pa.array(np.divide(1.0, vv, where=valid, out=np.zeros(len(vv)))),
            }
        )
        agg = gt.group_by([gcol], use_threads=False).aggregate(
            [("v", "count"), ("sln", "sum"), ("sinv", "sum")]
        )
        return pa.table(
            {
                gcol: agg.column(gcol),
                "n": agg.column("v_count"),
                "sln": agg.column("sln_sum"),
                "sinv": agg.column("sinv_sum"),
            }
        )

    p = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    from .nullkeys import null_safe_group_map

    def merge(group: pa.Table) -> pa.Table:
        n = int(group.column("n").to_numpy(zero_copy_only=False).sum())
        sln = float(group.column("sln").to_numpy(zero_copy_only=False).sum())
        sinv = float(group.column("sinv").to_numpy(zero_copy_only=False).sum())
        gm = round(float(np.exp(sln / n)), round_digits) if n else None
        hm = round(n / sinv, round_digits) if n and sinv != 0 else None
        return pa.table(
            {
                gcol: group.column(gcol).slice(0, 1),
                "n": pa.array([n], pa.int64()),
                "gmean": pa.array([gm], pa.float64()),
                "hmean": pa.array([hm], pa.float64()),
            }
        )

    return null_safe_group_map(p, [gcol], merge)


def gini_concentration(ds, value_col: str, decimal_scale: int = 2) -> pa.Table:
    """Gini coefficient / mean-difference numerator of a value column,
    BIT-EXACT in scaled integers (values quantized to decimal_scale
    decimals). Uses the sorted-rank identity

        sum_{i<j} |x_j - x_i| = sum_i (2i - n - 1) * x_(i)   (i 1-based)

    so one distributed sort replaces the O(n^2) pairwise sum. Each
    sorted block reduces to (count, sum_x, sum of i_local * x); the
    driver combines O(blocks) markers with exact Python ints, adding
    2 * offset * sum_x per block to translate local ranks to global
    ones. Ties are safe: any permutation of equal values leaves the
    sum unchanged. Output one row: (n, sum_scaled, gmd_num, gini)
    where gini = gmd_num / (n * sum_scaled), round-6."""

    def keep(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch.column(value_col), pa.float64())
        x = pc.cast(pc.round(pc.multiply(v, 10.0**decimal_scale)), pa.int64())
        return pa.table({"x": x}).filter(pc.is_valid(x))

    def marker(batch: pa.Table) -> pa.Table:
        x = batch.column("x").to_numpy(zero_copy_only=False)
        i_local = np.arange(1, len(x) + 1, dtype=np.int64)
        return pa.table(
            {
                "cnt": pa.array([len(x)], pa.int64()),
                "sum_x": pa.array([int(x.sum())], pa.int64()),
                "sum_ix": pa.array([int((i_local * x).sum())], pa.int64()),
            }
        )

    markers = (
        ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
        .sort("x")
        .map_batches(marker, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()  # dataset order after sort IS global order
    )
    n = sum(r["cnt"] for r in markers)
    sum_x = sum(r["sum_x"] for r in markers)
    acc = 0
    offset = 0
    for r in markers:
        acc += r["sum_ix"] + offset * r["sum_x"]
        offset += r["cnt"]
    gmd_num = 2 * acc - (n + 1) * sum_x
    gini = (
        round(float(gmd_num) / (float(n) * float(sum_x)), 6)
        if n > 1 and sum_x != 0
        else None
    )
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "sum_scaled": pa.array([sum_x], pa.int64()),
            "gmd_num": pa.array([gmd_num], pa.int64()),
            "gini": pa.array([gini], pa.float64()),
        }
    )


def theil_sen_group(
    ds,
    key_col: str,
    ts_col: str,
    value_col: str,
    round_digits: int = 6,
    max_group_rows: int = 10_000,
) -> "object":
    """Per-key Theil-Sen slope estimator: the median of all pairwise
    slopes (value_j - value_i) / (seconds_j - seconds_i) over the
    key's rows — the classic robust trend estimate (Sen 1968), immune
    to outliers that wreck OLS. Pairs with identical timestamps are
    excluded (vertical slope). Output: (key, n_pairs, slope).

    One groupby shuffle; pair slopes are a vectorized O(m^2) numpy
    broadcast per group, guarded by max_group_rows (per-key series at
    corpus scale are bounded by the key's activity, not corpus size).
    Each slope is one float division — bit-identical to the SQL
    oracle's — and the median of an even count is the midpoint average,
    matching quantile_cont(0.5)."""

    def per_key(group: pa.Table) -> pa.Table:
        m = group.num_rows
        if m > max_group_rows:
            raise ValueError(
                f"theil_sen_group: key group has {m} rows (max {max_group_rows})"
            )
        t = (
            group.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        )
        v = group.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        dt = (t[:, None] - t[None, :]) / 1_000_000.0
        dv = v[:, None] - v[None, :]
        iu = np.triu_indices(m, k=1)
        dts, dvs = dt[iu], dv[iu]
        ok = dts != 0.0
        slopes = dvs[ok] / dts[ok]
        slope = (
            round(float(np.median(slopes)), round_digits) if len(slopes) else None
        )
        return pa.table(
            {
                key_col: group.column(key_col).slice(0, 1),
                "n_pairs": pa.array([int(ok.sum())], pa.int64()),
                "slope": pa.array([slope], pa.float64()),
            }
        )

    def keep(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.is_valid(batch.column(ts_col)), pc.is_valid(batch.column(value_col))
        )
        return batch.select([key_col, ts_col, value_col]).filter(ok)

    from .nullkeys import null_safe_group_map

    proj = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    return null_safe_group_map(proj, [key_col], per_key)


# floor(CDF_Poisson(1)(k) * 1e6), k = 0..8 — the integer threshold
# ladder both the op and its SQL oracle use verbatim, so replicate
# counts are bit-identical across engines (anything past T8 draws 9)
POISSON1_T6 = (367879, 735758, 919698, 981011, 996340, 999405, 999916, 999989, 999998)


def bootstrap_mean_ci(
    ds,
    value_col: str,
    id_col: str,
    b: int = 200,
    salt: str = "bs",
    alpha: float = 0.05,
    decimal_scale: int = 2,
    round_digits: int | None = 6,
) -> pa.Table:
    """DETERMINISTIC Poisson bootstrap confidence interval for the
    mean (Chamandy et al.'s 'Estimating Uncertainty for Massive Data
    Streams' construction): instead of resampling n rows with
    replacement (which needs global coordination), every row enters
    replicate j a Poisson(1)-distributed number of times — with the
    count drawn from a HASH of (salt, row id, j), not an RNG, so any
    engine replays the exact same resamples. One row out:
    (n, b, mean, ci_lo, ci_hi) with the (alpha/2, 1-alpha/2)
    percentile interval over the b replicate means.

    Exactness: u = splitmix64(fnv(salt|id) + j) % 1e6 is an integer,
    the Poisson inverse-CDF is the integer ladder POISSON1_T6, and
    values accumulate as integer cents — every replicate mean is a
    ratio of exact int64 sums, so the order statistics match the SQL
    oracle bit-for-bit (round_digits=None skips rounding entirely —
    with exact inputs the raw doubles already compare equal). Scale
    shape: each batch reduces to b partial rows (j, sum_count,
    sum_count*cents); nothing row-width ever shuffles."""
    from .. import bloom as bloom_mod
    from .sample import _key_fingerprints

    thr = np.array(POISSON1_T6, dtype=np.int64)
    scale = 10.0**decimal_scale
    js = np.arange(b, dtype=np.uint64)

    def partial(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch.column(value_col), pa.float64())
        ok = pc.and_(pc.is_valid(v), pc.is_valid(batch.column(id_col)))
        t = batch.filter(ok)
        if t.num_rows == 0:
            return pa.table(
                {
                    "j": pa.array([], pa.int64()),
                    "sc": pa.array([], pa.int64()),
                    "scv": pa.array([], pa.int64()),
                }
            )
        cents = np.rint(
            pc.cast(t.column(value_col), pa.float64()).to_numpy(zero_copy_only=False)
            * scale
        ).astype(np.int64)
        base = _key_fingerprints(t.select([id_col]), id_col, f"{salt}|")
        h = bloom_mod._mix(base[:, None] + js[None, :])
        u6 = (h % np.uint64(1_000_000)).astype(np.int64)
        c = np.searchsorted(thr, u6.ravel(), side="right").reshape(u6.shape)
        rows = pa.table(
            {
                "j": pa.array(np.arange(b, dtype=np.int64)),
                "sc": pa.array(c.sum(axis=0).astype(np.int64)),
                "scv": pa.array((c * cents[:, None]).sum(axis=0)),
            }
        )
        # j = -1 carries the plain-sample partial (n, sum of cents)
        plain = pa.table(
            {
                "j": pa.array([-1], pa.int64()),
                "sc": pa.array([len(cents)], pa.int64()),
                "scv": pa.array([int(cents.sum())], pa.int64()),
            }
        )
        return pa.concat_tables([plain, rows])

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("j")
        .aggregate(Sum("sc", alias_name="sc"), Sum("scv", alias_name="scv"))
        .take_all()
    )
    plain = next(r for r in agg if r["j"] == -1)
    n = int(plain["sc"])
    means = sorted(
        (float(r["scv"]) / float(r["sc"])) / scale
        for r in agg
        if r["j"] >= 0 and r["sc"] > 0
    )
    b_eff = len(means)
    if n == 0 or b_eff == 0:
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "b": pa.array([b_eff], pa.int64()),
                "mean": pa.array([None], pa.float64()),
                "ci_lo": pa.array([None], pa.float64()),
                "ci_hi": pa.array([None], pa.float64()),
            }
        )
    kk = int(alpha / 2 * b_eff)
    rnd = (lambda x: x) if round_digits is None else (lambda x: round(x, round_digits))
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "b": pa.array([b_eff], pa.int64()),
            "mean": pa.array([rnd((float(plain["scv"]) / n) / scale)], pa.float64()),
            "ci_lo": pa.array([rnd(means[kk])], pa.float64()),
            "ci_hi": pa.array([rnd(means[b_eff - 1 - kk])], pa.float64()),
        }
    )


def isotonic_fit(
    ds,
    x_col: str,
    y_col: str,
    y_decimal_scale: int = 2,
    round_digits: int = 6,
) -> pa.Table:
    """Isotonic (monotone nondecreasing) least-squares fit of y on x
    via pool-adjacent-violators (PAVA, Barlow et al. 1972). Returns
    the fitted step function as pool rows (x_lo, x_hi, n, fitted),
    ascending in x.

    Exactness: equal-x points pre-average (the standard tie rule) via
    a distributed (x, sum, count) combiner — the exchange carries the
    distinct-x grid, bounded by the x DOMAIN — with y accumulated as
    integer 10^s units; the PAVA merge condition compares pool means
    by INTEGER cross-multiplication (s_i * w_j >= s_j * w_i), so the
    pooling is bit-deterministic and only the final fitted value is
    float. The stack-based scan is O(distinct x) on the driver — the
    right trade at corpus scale, where the value domain is bounded but
    rows are not."""
    scale = 10.0**y_decimal_scale

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col)
        y = pc.cast(batch.column(y_col), pa.float64())
        ok = pc.and_(pc.is_valid(x), pc.is_valid(y))
        t = batch.filter(ok)
        cents = np.rint(
            pc.cast(t.column(y_col), pa.float64()).to_numpy(zero_copy_only=False)
            * scale
        ).astype(np.int64)
        g = pa.table(
            {
                "x": t.column(x_col),
                "s": pa.array(cents),
                "w": pa.array(np.ones(len(cents), dtype=np.int64)),
            }
        ).group_by(["x"], use_threads=False).aggregate([("s", "sum"), ("w", "sum")])
        return g.rename_columns(["x", "s", "w"])

    from ray.data.aggregate import Sum

    grid = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("x")
        .aggregate(Sum("s", alias_name="s"), Sum("w", alias_name="w"))
        .take_all()
    )
    grid.sort(key=lambda r: r["x"])
    # PAVA over (weight, integer sum) pools; x extents ride along
    pools: list[list] = []  # [s, w, x_lo, x_hi]
    for r in grid:
        cur = [int(r["s"]), int(r["w"]), r["x"], r["x"]]
        while pools and pools[-1][0] * cur[1] >= cur[0] * pools[-1][1]:
            prev = pools.pop()
            cur = [prev[0] + cur[0], prev[1] + cur[1], prev[2], cur[3]]
        pools.append(cur)
    return pa.table(
        {
            "x_lo": pa.array([p[2] for p in pools]),
            "x_hi": pa.array([p[3] for p in pools]),
            "n": pa.array([p[1] for p in pools], pa.int64()),
            "fitted": pa.array(
                [round((p[0] / p[1]) / scale, round_digits) for p in pools],
                pa.float64(),
            ),
        }
    )


def cmh_test(ds, x_col: str, y_col: str, strata_col: str,
             round_digits: int = 6) -> pa.Table:
    """Cochran-Mantel-Haenszel chi-square for two binary variables
    across K strata (the stratified 2x2 association test — does x
    relate to y AFTER controlling for the stratum?). x_col and y_col
    must be 0/1 integers. One row out: (k, n, cmh) with

        CMH = (sum_k (a_k - r1_k c1_k / n_k))^2
            / sum_k r1_k (n_k - r1_k) c1_k (n_k - c1_k) / (n_k^2 (n_k - 1))

    Combiner-shaped: each batch reduces to one (stratum, n, a, r1, c1)
    integer-count row; strata with n <= 1 drop (zero variance), as the
    oracle does."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        x = pc.cast(batch.column(x_col), pa.int64())
        y = pc.cast(batch.column(y_col), pa.int64())
        ok = pc.and_(
            pc.and_(pc.is_valid(x), pc.is_valid(y)),
            pc.is_valid(batch.column(strata_col)),
        )
        t = pa.table(
            {
                "s": batch.column(strata_col),
                "one": pc.cast(ok, pa.int64()),
                "x": pc.if_else(ok, x, pa.scalar(0, pa.int64())),
                "y": pc.if_else(ok, y, pa.scalar(0, pa.int64())),
                "xy": pc.if_else(ok, pc.multiply(x, y), pa.scalar(0, pa.int64())),
            }
        )
        g = t.group_by(["s"], use_threads=False).aggregate(
            [("one", "sum"), ("xy", "sum"), ("x", "sum"), ("y", "sum")]
        )
        return g.rename_columns(["s", "n", "a", "r1", "c1"])

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("s")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("a", alias_name="a"),
            Sum("r1", alias_name="r1"),
            Sum("c1", alias_name="c1"),
        )
        .take_all()
    )
    rows = [r for r in rows if r["n"] > 1]
    k = len(rows)
    n_total = int(sum(r["n"] for r in rows))
    if k == 0:
        return pa.table(
            {
                "k": pa.array([0], pa.int64()),
                "n": pa.array([0], pa.int64()),
                "cmh": pa.array([None], pa.float64()),
            }
        )
    num = 0.0
    var = 0.0
    for r in sorted(rows, key=lambda r: str(r["s"])):
        n = float(r["n"])
        a, r1, c1 = float(r["a"]), float(r["r1"]), float(r["c1"])
        num += a - r1 * c1 / n
        var += r1 * (n - r1) * c1 * (n - c1) / (n * n * (n - 1))
    cmh = num * num / var if var > 0 else None
    return pa.table(
        {
            "k": pa.array([k], pa.int64()),
            "n": pa.array([n_total], pa.int64()),
            "cmh": pa.array(
                [None if cmh is None else round(cmh, round_digits)], pa.float64()
            ),
        }
    )


def auc_score(ds, score_col: str, label_col: str,
              max_distinct: int = 2_000_000) -> pa.Table:
    """Exact ROC AUC of a numeric score against a 0/1 label via the
    rank-sum identity AUC = (R1 - n1(n1+1)/2) / (n1 * n0) over
    tie-averaged fractional ranks (ties contribute 1/2, the standard
    convention). One row out: (n_pos, n_neg, auc).

    Same exactness as mann_whitney_u: fractional ranks are
    half-integers so R1 is bit-deterministic in any merge order, and
    the single final division is identical across engines — no
    rounding needed. Ranks come from the broadcast distinct-value
    histogram; the exchange carries distinct score values, not rows."""
    import ray

    from .sketch import _value_histogram

    def keep(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch.column(score_col), pa.float64())
        y = pc.cast(batch.column(label_col), pa.int64())
        ok = pc.and_(pc.is_valid(s), pc.is_valid(y))
        return pa.table({"s": s, "y": y}).filter(ok)

    two = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True).materialize()
    values, cum = _value_histogram(two, "s")
    if len(values) > max_distinct:
        raise ValueError(
            f"auc_score: {len(values)} distinct scores exceeds max_distinct "
            f"({max_distinct}) — rank via a global sort instead"
        )
    counts = np.diff(np.concatenate(([0], cum))).astype(np.float64)
    avg_rank = (cum - counts) + (counts + 1) / 2.0
    ref = ray.put((np.asarray(values), avg_rank))

    def partial(batch: pa.Table) -> pa.Table:
        import ray as ray_api

        vv, rr = ray_api.get(ref)
        r = rr[np.searchsorted(vv, batch.column("s").to_numpy(zero_copy_only=False))]
        y = batch.column("y").to_numpy(zero_copy_only=False)
        pos = y == 1
        return pa.table(
            {
                "r1": pa.array([float(r[pos].sum())]),
                "n1": pa.array([int(pos.sum())], pa.int64()),
                "n0": pa.array([int((~pos).sum())], pa.int64()),
            }
        )

    p = two.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    r1 = p.sum("r1") or 0.0
    n1 = int(p.sum("n1") or 0)
    n0 = int(p.sum("n0") or 0)
    auc = (
        (r1 - n1 * (n1 + 1) / 2.0) / (float(n1) * float(n0))
        if n1 > 0 and n0 > 0
        else None
    )
    return pa.table(
        {
            "n_pos": pa.array([n1], pa.int64()),
            "n_neg": pa.array([n0], pa.int64()),
            "auc": pa.array([auc], pa.float64()),
        }
    )


def calibration_bins(ds, score_col: str, label_col: str, n_bins: int = 10) -> pa.Table:
    """Reliability-curve bins for a numeric score against a 0/1 label:
    rows are assigned to `n_bins` rank buckets by bin =
    (rank() - 1) * n_bins // n (SQL rank over the score, so TIED
    scores always share a bin — deterministic, unlike SQL ntile), and
    each bin reports (bin, n, n_pos, frac_pos). Everything but the
    final frac_pos division is integer arithmetic, so results are
    bit-deterministic under any partitioning.

    Ranks come from the range-partitioned global sort
    (with_global_frac_rank, method="min") — the exchange carries
    (score, label) rows once; bin partials fold in a combiner-shaped
    grouped sum."""
    from ray.data.aggregate import Sum

    def keep(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch.column(score_col), pa.float64())
        y = pc.cast(batch.column(label_col), pa.int64())
        ok = pc.and_(pc.is_valid(s), pc.is_valid(y))
        return pa.table({"s": s, "y": y}).filter(ok)

    two = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True).materialize()
    n = int(two.count())
    if n == 0:
        return pa.table(
            {"bin": pa.array([], pa.int64()), "n": pa.array([], pa.int64()),
             "n_pos": pa.array([], pa.int64()), "frac_pos": pa.array([], pa.float64())}
        )
    ranked = with_global_frac_rank(two, "s", out_col="__rk", method="min")

    def partial(batch: pa.Table) -> pa.Table:
        rk = batch.column("__rk").to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch.column("y").to_numpy(zero_copy_only=False)
        b = (rk - 1) * n_bins // n
        t = pa.table(
            {"bin": pa.array(b, pa.int64()), "y": pa.array(y, pa.int64()),
             "one": pa.array(np.ones(len(b), np.int64))}
        )
        return t.group_by("bin", use_threads=False).aggregate([("y", "sum"), ("one", "sum")])

    agg = (
        ranked.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin")
        .aggregate(Sum("y_sum", alias_name="n_pos"), Sum("one_sum", alias_name="nn"))
        .sort("bin")
        .take_all()
    )
    bins = [r["bin"] for r in agg]
    npos = [int(r["n_pos"]) for r in agg]
    nn = [int(r["nn"]) for r in agg]
    return pa.table(
        {
            "bin": pa.array(bins, pa.int64()),
            "n": pa.array(nn, pa.int64()),
            "n_pos": pa.array(npos, pa.int64()),
            "frac_pos": pa.array(
                [p / c for p, c in zip(npos, nn)], pa.float64()
            ),
        }
    )


def pr_curve(ds, score_col: str, label_col: str,
             thresholds: list[int]) -> pa.Table:
    """Precision / recall / F1 at each integer score threshold
    ("predict positive when score >= thr"). Output one row per
    threshold: (thr, tp, fp, fn int64; precision, recall, f1 float64)
    — precision is null when nothing is predicted positive. The
    counts are integer-exact in any merge order; the three ratios are
    single divisions of those ints, evaluated with the same
    expression shape the SQL oracle uses.

    Scale: each batch bins its scores once per class (two
    searchsorted passes over the sorted threshold grid) and emits a
    len(thresholds)-row partial; one tiny groupby-sum over
    n_thresholds rows finishes — the exchange never carries corpus
    rows."""
    grid = np.asarray(sorted(thresholds), dtype=np.float64)

    def partial(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch.column(score_col), pa.float64())
        y = pc.cast(batch.column(label_col), pa.int64())
        ok = pc.and_(pc.is_valid(s), pc.is_valid(y))
        sv = s.filter(ok).to_numpy(zero_copy_only=False)
        yv = y.filter(ok).to_numpy(zero_copy_only=False)
        pos, neg = sv[yv == 1], sv[yv != 1]
        # count(score >= thr) = n - searchsorted(sorted_scores, thr, 'left')
        pos_s, neg_s = np.sort(pos), np.sort(neg)
        tp = len(pos_s) - np.searchsorted(pos_s, grid, side="left")
        fp = len(neg_s) - np.searchsorted(neg_s, grid, side="left")
        return pa.table(
            {
                "thr": pa.array(grid.astype(np.int64)),
                "tp": pa.array(tp.astype(np.int64)),
                "fp": pa.array(fp.astype(np.int64)),
                "npos": pa.array(np.full(len(grid), len(pos_s), dtype=np.int64)),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("thr")
        .sum(["tp", "fp", "npos"])
        .take_all()
    )  # n_thresholds rows — driver-safe
    rows = sorted(agg, key=lambda r: r["thr"])
    thr = np.array([r["thr"] for r in rows], dtype=np.int64)
    tp = np.array([r["sum(tp)"] for r in rows], dtype=np.int64)
    fp = np.array([r["sum(fp)"] for r in rows], dtype=np.int64)
    npos = rows[0]["sum(npos)"]  # every row carries the same global sum
    fn = npos - tp
    pp = tp + fp
    with np.errstate(invalid="ignore", divide="ignore"):
        precision = np.where(
            pp > 0, tp.astype(np.float64) / pp.astype(np.float64), np.nan
        )
        recall = tp.astype(np.float64) / np.float64(npos)
        f1 = np.where(
            (2 * tp + fp + fn) > 0,
            (2 * tp).astype(np.float64) / (2 * tp + fp + fn).astype(np.float64),
            np.nan,
        )
    return pa.table(
        {
            "thr": pa.array(thr),
            "tp": pa.array(tp),
            "fp": pa.array(fp),
            "fn": pa.array(fn),
            # from_pandas=True maps the pp==0 NaN sentinel to a real null,
            # matching the oracle's CASE WHEN ... THEN NULL
            "precision": pa.array(precision, pa.float64(), from_pandas=True),
            "recall": pa.array(recall, pa.float64()),
            "f1": pa.array(f1, pa.float64(), from_pandas=True),
        }
    )


def wilson_ci(ds, group_col: str, flag_col: str, z: float = 1.96,
              ) -> pa.Table:
    """Per-group Wilson score confidence interval for a binomial
    proportion (Wilson 1927 — the interval A/B dashboards use because
    it behaves at p near 0/1): with p = s/n,

        center = (p + z^2/(2n)) / (1 + z^2/n)
        half   = z * sqrt(p(1-p)/n + z^2/(4n^2)) / (1 + z^2/n)

    Output per group: (group, n, successes int64; p, lo, hi float64).
    The counts are integer-exact in any merge order and the interval
    arithmetic is a fixed chain of IEEE double ops evaluated in the
    same textual order as the SQL oracle, so the doubles (all in
    [-0.1, 1.1]) stringify identically.

    Scale: per-batch (group, n, s) combiner then one tiny group-sum —
    the classic pre-aggregated proportion, one scan, no corpus rows
    in the exchange."""
    from ray.data.aggregate import Sum

    from .nullkeys import null_safe_group_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        f = pc.cast(
            pc.fill_null(pc.cast(batch.column(flag_col), pa.bool_()), False),
            pa.int64(),
        )
        t = pa.table(
            {
                group_col: batch.column(group_col),
                "n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "s": f,
            }
        )
        agg = t.group_by([group_col], use_threads=False).aggregate(
            [("n", "sum"), ("s", "sum")]
        )
        return agg.rename_columns([group_col, "n", "s"])

    totals = null_safe_group_aggregate(
        ds.select_columns(sorted({group_col, flag_col})).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        [group_col],
        [Sum("n", alias_name="n"), Sum("s", alias_name="s")],
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        s = t.column("s").to_numpy(zero_copy_only=False).astype(np.float64)
        p = s / n
        d = 1.0 + (z * z) / n
        center = (p + (z * z) / (2.0 * n)) / d
        half = z * np.sqrt(p * (1.0 - p) / n + (z * z) / (4.0 * n * n)) / d
        return pa.table(
            {
                group_col: t.column(group_col),
                "n": t.column("n"),
                "successes": t.column("s"),
                "p": pa.array(p, pa.float64()),
                "lo": pa.array(center - half, pa.float64()),
                "hi": pa.array(center + half, pa.float64()),
            }
        )

    return totals.map_batches(finish, batch_format="pyarrow").sort(group_col)


def jarque_bera(ds, value_col: str, group_col: str, round_digits: int = 6) -> pa.Table:
    """Grouped Jarque-Bera normality statistic: one row per group with
    (group, n, skewness, ex_kurtosis, jb). The exchange carries one
    (group, s1..s4) raw-power-sum row per batch-group; when value_col
    holds small integers (l_quantity-style) every power sum is an
    exact double, so the merged sums are bit-deterministic in any
    order and only the final per-group formula does real float math —
    written with EXPLICIT multiplications (no pow()) in the same
    operation order as the SQL oracle:

        mu = s1/n;  m2 = s2/n - mu*mu
        m3 = s3/n - 3*mu*(s2/n) + 2*mu*mu*mu
        m4 = s4/n - 4*mu*(s3/n) + 6*mu*mu*(s2/n) - 3*mu*mu*mu*mu
        skew = m3 / (m2*sqrt(m2));  exk = m4/(m2*m2) - 3
        jb = n/6 * (skew*skew + exk*exk/4)
    """
    from .nullkeys import null_safe_group_map

    def partial(batch: pa.Table) -> pa.Table:
        x = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        ok = ~np.isnan(x)
        t = pa.table(
            {
                group_col: batch.column(group_col).filter(pa.array(ok)),
                "n": pa.array(np.ones(int(ok.sum()), np.int64)),
                "s1": pa.array(x[ok]),
                "s2": pa.array(x[ok] * x[ok]),
                "s3": pa.array(x[ok] * x[ok] * x[ok]),
                "s4": pa.array(x[ok] * x[ok] * x[ok] * x[ok]),
            }
        )
        return t.group_by([group_col], use_threads=False).aggregate(
            [("n", "sum"), ("s1", "sum"), ("s2", "sum"), ("s3", "sum"), ("s4", "sum")]
        ).rename_columns([group_col, "n", "s1", "s2", "s3", "s4"])

    p = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def merge(group: pa.Table) -> pa.Table:
        n = int(group.column("n").to_numpy(zero_copy_only=False).sum())
        s1 = float(group.column("s1").to_numpy(zero_copy_only=False).sum())
        s2 = float(group.column("s2").to_numpy(zero_copy_only=False).sum())
        s3 = float(group.column("s3").to_numpy(zero_copy_only=False).sum())
        s4 = float(group.column("s4").to_numpy(zero_copy_only=False).sum())
        if n < 2:
            skew = exk = jb = None
        else:
            mu = s1 / n
            m2 = s2 / n - mu * mu
            m3 = s3 / n - 3.0 * mu * (s2 / n) + 2.0 * mu * mu * mu
            m4 = (
                s4 / n
                - 4.0 * mu * (s3 / n)
                + 6.0 * mu * mu * (s2 / n)
                - 3.0 * mu * mu * mu * mu
            )
            if m2 <= 0:
                skew = exk = jb = None
            else:
                skew = m3 / (m2 * float(np.sqrt(m2)))
                exk = m4 / (m2 * m2) - 3.0
                jb = n / 6.0 * (skew * skew + exk * exk / 4.0)
        rd = lambda v: None if v is None else float(np.round(v, round_digits))
        return pa.table(
            {
                group_col: group.column(group_col).slice(0, 1),
                "n": pa.array([n], pa.int64()),
                "skewness": pa.array([rd(skew)], pa.float64()),
                "ex_kurtosis": pa.array([rd(exk)], pa.float64()),
                "jb": pa.array([rd(jb)], pa.float64()),
            }
        )

    return null_safe_group_map(p, [group_col], merge)


def brown_forsythe(ds, value_col: str, group_col: str,
                   round_digits: int = 6, max_distinct: int = 100_000) -> pa.Table:
    """Brown-Forsythe (median-centered Levene) equality-of-variance
    test: z_ij = |x_ij - median_j|, then the one-way ANOVA F over z.
    One row out: (k, n, f_stat).

    Pass 1 is a grouped distinct-value histogram (value_col must be
    low-cardinality — quantities, ratings; guarded by max_distinct)
    from which exact per-group medians fall out driver-side; medians
    of integer-valued data are half-integers, so every z is a
    half-integer and z*z a quarter-integer — the per-group (n, sz1,
    sz2) sums the second pass ships are exact doubles and merge
    bit-deterministically. The final F formula (same operation order
    as the SQL oracle, k rows):

        gm = sum(sz1) / N
        ssb = sum(n_g*(mean_g - gm)*(mean_g - gm));  msb = ssb/(k-1)
        ssw = sum(sz2 - sz1*sz1/n_g);                msw = ssw/(N-k)
    """
    from .nullkeys import null_safe_group_map

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch.column(value_col))).select(
            [group_col, value_col]
        )

    vals = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True).materialize()

    def hist_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({group_col: batch.column(group_col), "v": batch.column(value_col)})
        g = t.group_by([group_col, "v"], use_threads=False).aggregate([("v", "count")])
        return g.rename_columns([group_col, "v", "cnt"])

    hist = (
        vals.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([group_col, "v"])
        .sum("cnt")
        .take_all()
    )
    if len(hist) > max_distinct:
        raise ValueError(
            f"brown_forsythe: {len(hist)} distinct (group, value) cells "
            f"(max_distinct={max_distinct}) — use a sort-based median instead"
        )
    by_group: dict = {}
    for r in hist:
        by_group.setdefault(r[group_col], []).append((float(r["v"]), int(r["sum(cnt)"])))
    medians: dict = {}
    for g, cells in by_group.items():
        cells.sort()
        n_g = sum(c for _, c in cells)
        lo_idx, hi_idx = (n_g - 1) // 2, n_g // 2  # 0-based middle pair
        run = 0
        lo = hi = None
        for v, c in cells:
            run += c
            if lo is None and run > lo_idx:
                lo = v
            if hi is None and run > hi_idx:
                hi = v
                break
        medians[g] = (lo + hi) / 2.0
    med_items = sorted(medians.items(), key=lambda kv: str(kv[0]))
    med_keys = [k for k, _ in med_items]
    med_vals = np.array([v for _, v in med_items], np.float64)
    key_to_idx = {k: i for i, k in enumerate(med_keys)}

    def z_partial(batch: pa.Table) -> pa.Table:
        gcol = batch.column(group_col).to_pylist()
        idx = np.array([key_to_idx[g] for g in gcol], np.int64)
        x = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        z = np.abs(x - med_vals[idx])
        t = pa.table(
            {
                group_col: batch.column(group_col),
                "n": pa.array(np.ones(len(z), np.int64)),
                "sz1": pa.array(z),
                "sz2": pa.array(z * z),
            }
        )
        return t.group_by([group_col], use_threads=False).aggregate(
            [("n", "sum"), ("sz1", "sum"), ("sz2", "sum")]
        ).rename_columns([group_col, "n", "sz1", "sz2"])

    p = vals.map_batches(z_partial, batch_format="pyarrow", zero_copy_batch=True)

    def merge(group: pa.Table) -> pa.Table:
        return pa.table(
            {
                group_col: group.column(group_col).slice(0, 1),
                "n": pa.array(
                    [int(group.column("n").to_numpy(zero_copy_only=False).sum())],
                    pa.int64(),
                ),
                "sz1": pa.array(
                    [float(group.column("sz1").to_numpy(zero_copy_only=False).sum())]
                ),
                "sz2": pa.array(
                    [float(group.column("sz2").to_numpy(zero_copy_only=False).sum())]
                ),
            }
        )

    rows = sorted(
        null_safe_group_map(p, [group_col], merge).take_all(),
        key=lambda r: str(r[group_col]),
    )
    k = len(rows)
    n = float(sum(r["n"] for r in rows))
    if k < 2 or n <= k:
        f = None
    else:
        gm = sum(r["sz1"] for r in rows) / n
        ssb = 0.0
        ssw = 0.0
        for r in rows:
            mean_g = r["sz1"] / r["n"]
            ssb += r["n"] * (mean_g - gm) * (mean_g - gm)
            ssw += r["sz2"] - r["sz1"] * r["sz1"] / r["n"]
        msb = ssb / (k - 1)
        msw = ssw / (n - k)
        f = msb / msw if msw > 0 else None
    return pa.table(
        {
            "k": pa.array([k], pa.int64()),
            "n": pa.array([int(n)], pa.int64()),
            "f_stat": pa.array(
                [None if f is None else float(np.round(f, round_digits))], pa.float64()
            ),
        }
    )


def ks_wasserstein_2samp(ds, value_col: str, group_col: str,
                         group_a, group_b, decimal_scale: int = 0,
                         max_distinct: int = 100_000) -> pa.Table:
    """Two-sample Kolmogorov-Smirnov D and 1-Wasserstein (earth
    mover's) distance between the value distributions of two groups,
    EXACT: values are quantized to decimal_scale decimals, one grouped
    distinct-value histogram is the only exchange (domain-bounded like
    brown_forsythe's pass 1, guarded by max_distinct), and both
    statistics reduce to integer arithmetic over the merged grid:

        D  = max_k |cumA_k * nB - cumB_k * nA| / (nA * nB)
        W1 = sum_k |cumA_k * nB - cumB_k * nA| * dx_k / (nA*nB*scale)

    Each is ONE division of exact int64s, so the doubles are
    bit-deterministic under any partitioning / merge order. Output a
    single row (n_a, n_b, ks_d, w1)."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        keep = pc.and_(
            pc.is_valid(batch.column(value_col)),
            pc.is_in(g, value_set=pa.array([group_a, group_b], g.type)),
        )
        t = batch.filter(keep)
        v = pc.cast(
            pc.round(pc.multiply(pc.cast(t.column(value_col), pa.float64()),
                                 10.0 ** decimal_scale)),
            pa.int64(),
        )
        h = pa.table({"g": t.column(group_col), "v": v})
        return (
            h.group_by(["g", "v"], use_threads=False)
            .aggregate([("v", "count")])
            .rename_columns(["g", "v", "cnt"])
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["g", "v"])
        .sum("cnt")
        .take_all()
    )
    if len(hist) > max_distinct:
        raise ValueError(
            f"ks_wasserstein_2samp: {len(hist)} distinct cells "
            f"(max_distinct={max_distinct})"
        )
    ca: dict[int, int] = {}
    cb: dict[int, int] = {}
    for r in hist:
        (ca if r["g"] == group_a else cb)[int(r["v"])] = int(r["sum(cnt)"])
    na, nb = sum(ca.values()), sum(cb.values())
    grid = sorted(set(ca) | set(cb))
    cum_a = cum_b = 0
    d_num = 0
    w_num = 0
    for i, x in enumerate(grid):
        cum_a += ca.get(x, 0)
        cum_b += cb.get(x, 0)
        diff = abs(cum_a * nb - cum_b * na)
        d_num = max(d_num, diff)
        if i + 1 < len(grid):
            w_num += diff * (grid[i + 1] - x)
    denom = na * nb
    return pa.table(
        {
            "n_a": pa.array([na], pa.int64()),
            "n_b": pa.array([nb], pa.int64()),
            "ks_d": pa.array(
                [None if denom == 0 else d_num / denom], pa.float64()
            ),
            "w1": pa.array(
                [None if denom == 0 else w_num / denom / 10.0 ** decimal_scale],
                pa.float64(),
            ),
        }
    )


def theil_index(ds, value_col: str, group_col: str,
                decimal_scale: int = 2, round_digits: int = 6) -> pa.Table:
    """Per-group Theil T inequality index over a positive value column:
    T = (1/n) sum (x_i/mu) ln(x_i/mu). Pass 1 is an exact
    integer-cents (sum, count) groupby -> per-group mu (one division,
    bit-deterministic) broadcast into pass 2, which ships one
    (group, sum_term) partial per batch-group where each term
    (c/mu)*ln(c/mu) is a bit-identical double; only the term-sum merge
    is order-sensitive, and terms are O(1), so round-6 of T (itself
    O(1)) is stable. Rows with value <= 0 or null are excluded (and
    counted). Output (group, n, theil_t)."""
    from .nullkeys import null_safe_group_map

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.round(pc.multiply(pc.cast(batch.column(value_col), pa.float64()),
                                 10.0 ** decimal_scale)),
            pa.int64(),
        )
        t = pa.table({group_col: batch.column(group_col), "c": c})
        t = t.filter(
            pc.and_(
                pc.greater(pc.coalesce(c, pa.scalar(0, pa.int64())), 0),
                pc.is_valid(t.column(group_col)),
            )
        )
        g = t.group_by([group_col], use_threads=False).aggregate(
            [("c", "sum"), ("c", "count")]
        )
        return g.rename_columns([group_col, "sum_c", "n"])

    base = (
        ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .sum(["sum_c", "n"])
        .take_all()
    )
    mu = {r[group_col]: r["sum(sum_c)"] / r["sum(n)"] for r in base}
    n_by = {r[group_col]: int(r["sum(n)"]) for r in base}

    def term_partial(batch: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.round(pc.multiply(pc.cast(batch.column(value_col), pa.float64()),
                                 10.0 ** decimal_scale)),
            pa.int64(),
        )
        t = pa.table({group_col: batch.column(group_col), "c": c})
        t = t.filter(
            pc.and_(
                pc.greater(pc.coalesce(c, pa.scalar(0, pa.int64())), 0),
                pc.is_valid(t.column(group_col)),
            )
        )
        gvals = t.column(group_col).to_pylist()
        cv = t.column("c").to_numpy(zero_copy_only=False).astype(np.float64)
        m = np.array([mu[g] for g in gvals], np.float64)
        r = cv / m
        term = r * np.log(r)
        p = pa.table({group_col: t.column(group_col), "s": pa.array(term)})
        return (
            p.group_by([group_col], use_threads=False)
            .aggregate([("s", "sum")])
            .rename_columns([group_col, "s"])
        )

    p = ds.map_batches(term_partial, batch_format="pyarrow", zero_copy_batch=True)

    def merge(group: pa.Table) -> pa.Table:
        g = group.column(group_col)[0].as_py()
        s = float(group.column("s").to_numpy(zero_copy_only=False).sum())
        n = n_by[g]
        return pa.table(
            {
                group_col: group.column(group_col).slice(0, 1),
                "n": pa.array([n], pa.int64()),
                "theil_t": pa.array(
                    [float(np.round(s / n, round_digits))], pa.float64()
                ),
            }
        )

    return null_safe_group_map(p, [group_col], merge)


def diversity(ds, group_col: str, cat_col: str) -> pa.Table:
    """Per-group category diversity over a categorical column: distinct
    category count k, unbiased Simpson diversity
    1 - sum c*(c-1) / (n*(n-1)) (exact integers, ONE division ->
    bit-deterministic) and Shannon entropy in nats
    -sum (c/n) ln(c/n) (k is small; terms are O(1) bit-identical
    doubles, round-6 absorbs the sum-order ulp). The only exchange is
    the (group, cat) count grid. Output (group, n, k, simpson,
    shannon)."""
    from .nullkeys import null_safe_group_map

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.and_(
                pc.is_valid(batch.column(cat_col)),
                pc.is_valid(batch.column(group_col)),
            )
        ).select([group_col, cat_col])
        g = t.group_by([group_col, cat_col], use_threads=False).aggregate(
            [(cat_col, "count")]
        )
        return g.rename_columns([group_col, cat_col, "cnt"])

    p = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([group_col, cat_col])
        .sum("cnt")
    )

    def merge(group: pa.Table) -> pa.Table:
        c = group.column("sum(cnt)").to_numpy(zero_copy_only=False).astype(np.int64)
        n = int(c.sum())
        k = len(c)
        if n < 2:
            simpson = None
        else:
            simpson = 1.0 - int((c * (c - 1)).sum()) / (n * (n - 1))
        pr = c.astype(np.float64) / n
        shannon = float(np.round(-(pr * np.log(pr)).sum(), 6))
        return pa.table(
            {
                group_col: group.column(group_col).slice(0, 1),
                "n": pa.array([n], pa.int64()),
                "k": pa.array([k], pa.int64()),
                "simpson": pa.array([simpson], pa.float64()),
                "shannon": pa.array([shannon], pa.float64()),
            }
        )

    return null_safe_group_map(p, [group_col], merge)


def runs_test(ds, key_col: str, order_col: str, value_col: str,
              tiebreak_col: str, decimal_scale: int = 2,
              min_runs_n: int = 10) -> pa.Table:
    """Per-key Wald-Wolfowitz runs test for randomness around the
    median: values (quantized to decimal_scale, so integers) in
    (order, tiebreak) order are signed against 2*median (= lo+hi
    middle-pair sum, an exact integer compare); ties with the median
    are dropped per the classical test; R = number of sign runs.

        mu    = 1 + 2*np*nm / n
        sigma = sqrt((mu-1)*(mu-2)/(n-1))
        z     = (R - mu) / sigma

    All inputs to the formula are integers and the expression order
    matches the SQL oracle, so z is bit-deterministic (no rounding).
    Keys with n_pos == 0, n_neg == 0 or n < min_runs_n are dropped.
    One groupby shuffle; per-key work is a numpy sort + sign scan.
    Output (key, n_pos, n_neg, runs, z)."""
    from .nullkeys import null_safe_group_map

    def keep(batch: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.round(pc.multiply(pc.cast(batch.column(value_col), pa.float64()),
                                 10.0 ** decimal_scale)),
            pa.int64(),
        )
        t = pa.table(
            {
                key_col: batch.column(key_col),
                "o": batch.column(order_col),
                "tb": batch.column(tiebreak_col),
                "c": c,
            }
        )
        return t.filter(pc.is_valid(c))

    src = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)

    def per_key(g: pa.Table) -> pa.Table:
        o = g.column("o").to_numpy(zero_copy_only=False)
        tb = g.column("tb").to_numpy(zero_copy_only=False)
        c = g.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((tb, o))
        c = c[order]
        sc = np.sort(c)
        n_all = len(sc)
        med2 = int(sc[(n_all - 1) // 2]) + int(sc[n_all // 2])
        s = 2 * c - med2
        s = s[s != 0]
        n_pos = int((s > 0).sum())
        n_neg = int((s < 0).sum())
        n = n_pos + n_neg
        if n_pos == 0 or n_neg == 0 or n < min_runs_n:
            return pa.table(
                {
                    key_col: g.column(key_col).slice(0, 0),
                    "n_pos": pa.array([], pa.int64()),
                    "n_neg": pa.array([], pa.int64()),
                    "runs": pa.array([], pa.int64()),
                    "z": pa.array([], pa.float64()),
                }
            )
        pos = s > 0
        runs = 1 + int((pos[1:] != pos[:-1]).sum())
        mu = 1.0 + 2.0 * n_pos * n_neg / n
        sigma = float(np.sqrt((mu - 1.0) * (mu - 2.0) / (n - 1.0)))
        z = (runs - mu) / sigma
        return pa.table(
            {
                key_col: g.column(key_col).slice(0, 1),
                "n_pos": pa.array([n_pos], pa.int64()),
                "n_neg": pa.array([n_neg], pa.int64()),
                "runs": pa.array([runs], pa.int64()),
                "z": pa.array([z], pa.float64()),
            }
        )

    return null_safe_group_map(src, [key_col], per_key)


def friedman_dow(ds, ts_col: str) -> pa.Table:
    """Friedman rank test of day-of-week effect on daily event counts:
    blocks = ISO weeks (only weeks with all 7 days present), treatments
    = ISO weekday 1..7, observations = daily counts. Within each block
    the 7 counts get tie-averaged ranks (exact half-integers);
    R_j = sum of ranks per weekday, and

        Q = 12 / (n*k*(k+1)) * sum R_j^2 - 3*n*(k+1)

    with k = 7, n = #complete weeks. Rank sums are exact, the formula
    matches the SQL oracle's operation order, so Q is
    bit-deterministic. The only exchange is the daily-count groupby
    (date-domain bounded, driver-merged like kendall_tau). Output one
    row (n_weeks, k, q) plus per-weekday rank sums as 2*R_j integers."""
    import ray.data as _rd
    from ray.data.aggregate import Count

    def day_key(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        return pa.table({"day": pc.cast(ts, pa.date32())}).filter(
            pc.is_valid(ts)
        )

    daily = (
        ds.map_batches(day_key, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .aggregate(Count(alias_name="cnt"))
        .take_all()
    )
    import datetime as _dt

    by_week: dict = {}
    for r in daily:
        d = r["day"]
        if isinstance(d, _dt.datetime):
            d = d.date()
        iso = d.isocalendar()
        by_week.setdefault((iso[0], iso[1]), {})[iso[2]] = int(r["cnt"])
    complete = {wk: v for wk, v in by_week.items() if len(v) == 7}
    n = len(complete)
    k = 7
    r2 = np.zeros(k, dtype=np.int64)  # 2 * rank sums (exact ints)
    for wk in sorted(complete):
        counts = np.array([complete[wk][d] for d in range(1, 8)], np.int64)
        order = np.argsort(counts, kind="stable")
        sv = counts[order]
        new_val = np.r_[True, sv[1:] != sv[:-1]]
        starts = np.flatnonzero(new_val)
        sizes = np.diff(np.r_[starts, k])
        rk2 = np.repeat(2 * starts + sizes + 1, sizes)  # 2 * avg rank
        two_ranks = np.empty(k, dtype=np.int64)
        two_ranks[order] = rk2
        r2 += two_ranks
    if n == 0:
        q = None
    else:
        sum_rj2 = float((r2.astype(np.float64) / 2.0) ** 2 @ np.ones(k))
        q = 12.0 / (n * k * (k + 1)) * sum_rj2 - 3.0 * n * (k + 1)
    cols = {"n_weeks": pa.array([n], pa.int64()), "k": pa.array([k], pa.int64())}
    for j in range(k):
        cols[f"rs2_{j + 1}"] = pa.array([int(r2[j])], pa.int64())
    cols["q"] = pa.array([q], pa.float64())
    return pa.table(cols)


def with_global_row_number(ds, col: str, tiebreak_col: str, out_col: str = "rn"):
    """Append the GLOBAL 1-based row number in (col, tiebreak) order —
    the deterministic total order behind NTILE / top-N-percent — via
    the same range-partitioned plan as with_global_frac_rank:
    order-preserving sample boundaries on col (ties land in ONE
    bucket), one exact per-bucket count pass -> driver offsets, one
    groupby(bucket) exchange with a local lexsort. Null col values get
    a null row number and consume no positions. Returns
    (dataset_with_out_col, total_non_null_rows)."""
    import ray

    from .nullkeys import null_safe_group_map
    from .pack import sample_boundaries

    def non_null(batch: pa.Table) -> pa.Table:
        c = batch.column(col)
        return batch.filter(pc.is_valid(c)).select([col])

    bnd, _ = sample_boundaries(
        ds.map_batches(non_null, batch_format="pyarrow", zero_copy_batch=True), col
    )

    def bucketize(batch: pa.Table) -> pa.Table:
        v = batch.column(col)
        v = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
        valid = v.is_valid().to_numpy(zero_copy_only=False)
        if len(bnd):
            x = v.to_numpy(zero_copy_only=False)
            bkt = np.searchsorted(bnd, x, side="right").astype(np.int64)
        else:
            bkt = np.zeros(batch.num_rows, dtype=np.int64)
        bkt = np.where(valid, bkt, -1)
        return batch.append_column("__bkt", pa.array(bkt, pa.int64()))

    bucketed = ds.map_batches(
        bucketize, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def count_partial(t: pa.Table) -> pa.Table:
        b = pa.table({"__bkt": t.column("__bkt")})
        return b.group_by("__bkt", use_threads=False).aggregate([("__bkt", "count")])

    counts = {
        r["__bkt"]: r["sum(__bkt_count)"]
        for r in bucketed.map_batches(
            count_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("__bkt")
        .sum("__bkt_count")
        .take_all()
    }
    offsets = {}
    acc = 0
    for b in sorted(k for k in counts if k >= 0):
        offsets[b] = acc
        acc += counts[b]
    total = acc
    off_ref = ray.put(offsets)

    def rn_group(g: pa.Table) -> pa.Table:
        import ray as ray_api

        bkt = int(g.column("__bkt")[0].as_py())
        g = g.drop_columns(["__bkt"])
        if bkt < 0:
            return g.append_column(out_col, pa.nulls(g.num_rows, pa.int64()))
        off = ray_api.get(off_ref)[bkt]
        v = g.column(col).to_numpy(zero_copy_only=False)
        tb = g.column(tiebreak_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, v))
        rn = np.empty(len(v), dtype=np.int64)
        rn[order] = np.arange(1, len(v) + 1, dtype=np.int64) + off
        return g.append_column(out_col, pa.array(rn, pa.int64()))

    return null_safe_group_map(bucketed, ["__bkt"], rn_group), total


def sql_ntile(rn: np.ndarray, n: int, k: int) -> np.ndarray:
    """SQL NTILE(k) from 1-based row numbers over n rows: the first
    (n mod k) tiles get ceil(n/k) rows, the rest floor(n/k)."""
    q, r = divmod(n, k)
    big = r * (q + 1)
    rn0 = rn - 1
    return np.where(
        rn0 < big,
        rn0 // (q + 1) + 1 if q + 1 > 0 else 1,
        r + (np.maximum(rn0 - big, 0) // max(q, 1)) + 1,
    ).astype(np.int64)


def abc_classification(ds, key_col: str, value_col: str,
                       decimal_scale: int = 2,
                       thresholds: tuple = (80, 95)) -> "object":
    """ABC (Pareto) classification: keys ranked by total value
    DESCENDING; class A while the running cumulative share stays
    within thresholds[0]% of the grand total (compared as exact
    integers: cum*100 <= thr*total), B within thresholds[1]%, else C.
    Stage 1 is the per-key integer-cents groupby; stage 2 range-
    buckets the key totals by value (ties in one bucket), one
    per-bucket sum pass gives exact DESCENDING driver offsets, and the
    per-bucket local cumsum classifies; the final class rollup is a
    3-cell combiner. Output (cls, n_keys, class_cents) — all exact
    integers. Tie order is (value DESC, key ASC), mirroring the SQL
    window ORDER BY."""
    import ray

    from .nullkeys import null_safe_group_map
    from .pack import sample_boundaries

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.round(pc.multiply(pc.cast(batch.column(value_col), pa.float64()),
                                 10.0 ** decimal_scale)),
            pa.int64(),
        )
        t = pa.table({key_col: batch.column(key_col), "c": c})
        t = t.filter(pc.and_(pc.is_valid(c), pc.is_valid(t.column(key_col))))
        return (
            t.group_by([key_col], use_threads=False)
            .aggregate([("c", "sum")])
            .rename_columns([key_col, "c"])
        )

    per_key = (
        ds.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col)
        .sum("c")
        .map_batches(
            lambda t: t.rename_columns([key_col, "c"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )

    bnd, _ = sample_boundaries(per_key, "c")

    def bucketize(batch: pa.Table) -> pa.Table:
        x = batch.column("c").to_numpy(zero_copy_only=False)
        bkt = (
            np.searchsorted(bnd, x, side="right").astype(np.int64)
            if len(bnd)
            else np.zeros(batch.num_rows, dtype=np.int64)
        )
        return batch.append_column("__bkt", pa.array(bkt, pa.int64()))

    bucketed = per_key.map_batches(
        bucketize, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def sum_partial(t: pa.Table) -> pa.Table:
        b = pa.table({"__bkt": t.column("__bkt"), "s": t.column("c")})
        return (
            b.group_by("__bkt", use_threads=False)
            .aggregate([("s", "sum")])
            .rename_columns(["__bkt", "s"])
        )

    sums = {
        r["__bkt"]: int(r["sum(s)"])
        for r in bucketed.map_batches(
            sum_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("__bkt")
        .sum("s")
        .take_all()
    }
    total = sum(sums.values())
    # descending traversal: offset of bucket b = sum of buckets ABOVE it
    offsets = {}
    acc = 0
    for b in sorted(sums, reverse=True):
        offsets[b] = acc
        acc += sums[b]
    off_ref = ray.put((offsets, total))
    t_a, t_b = thresholds

    def classify(g: pa.Table) -> pa.Table:
        import ray as ray_api

        offs, tot = ray_api.get(off_ref)
        bkt = int(g.column("__bkt")[0].as_py())
        off = offs[bkt]
        c = g.column("c").to_numpy(zero_copy_only=False)
        k = g.column(key_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((k, -c))
        cum = np.cumsum(c[order]) + off
        cls = np.where(
            cum * 100 <= t_a * tot, "A", np.where(cum * 100 <= t_b * tot, "B", "C")
        )
        out = pa.table({"cls": pa.array(cls), "cc": pa.array(c[order], pa.int64())})
        return (
            out.group_by(["cls"], use_threads=False)
            .aggregate([("cls", "count"), ("cc", "sum")])
            .rename_columns(["cls", "n_keys", "class_cents"])
        )

    partial = null_safe_group_map(bucketed, ["__bkt"], classify)
    return (
        partial.groupby("cls")
        .sum(["n_keys", "class_cents"])
        .map_batches(
            lambda t: t.rename_columns(["cls", "n_keys", "class_cents"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    )


def gains_curve(ds, score_col: str, label_col: str, tiebreak_col: str,
                n_tiles: int = 10):
    """Cumulative gains / lift table: rows ranked by score DESC
    (tiebreak ASC — NTILE(n) OVER (ORDER BY score DESC, tiebreak)),
    split into n_tiles deciles; per decile n_rows, n_pos, cumulative
    positives, gain = cum_pos / total_pos and
    lift = (cum_pos * total) / (total_pos * cum_rows) — every ratio is
    ONE division of exact int64s (bit-deterministic). The ranking pass
    is the range-partitioned global row-number over the NEGATED score
    (ties land in one bucket); cumulative sums evaluate over the
    n_tiles-row grid driver-side. label_col must be 0/1 int. Rows with
    a null score are excluded."""
    from .nullkeys import null_safe_group_map

    def prep(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch.column(score_col), pa.float64())
        t = pa.table(
            {
                "neg": pc.negate(s),
                "tb": batch.column(tiebreak_col),
                "y": pc.cast(batch.column(label_col), pa.int64()),
            }
        )
        return t.filter(pc.is_valid(s))

    src = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    ranked, total = with_global_row_number(src, "neg", "tb", out_col="__rn")

    def tile_partial(batch: pa.Table, _n=total) -> pa.Table:
        rn = batch.column("__rn").to_numpy(zero_copy_only=False).astype(np.int64)
        dec = sql_ntile(rn, _n, n_tiles)
        t = pa.table(
            {
                "decile": pa.array(dec, pa.int64()),
                "one": pa.array(np.ones(len(dec), np.int64)),
                "y": batch.column("y"),
            }
        )
        return (
            t.group_by(["decile"], use_threads=False)
            .aggregate([("one", "sum"), ("y", "sum")])
            .rename_columns(["decile", "n_rows", "n_pos"])
        )

    grid = sorted(
        ranked.map_batches(tile_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("decile")
        .sum(["n_rows", "n_pos"])
        .take_all(),
        key=lambda r: r["decile"],
    )
    tot_pos = sum(int(r["sum(n_pos)"]) for r in grid)
    cum_r = cum_p = 0
    rows = []
    for r in grid:
        cum_r += int(r["sum(n_rows)"])
        cum_p += int(r["sum(n_pos)"])
        rows.append(
            {
                "decile": int(r["decile"]),
                "n_rows": int(r["sum(n_rows)"]),
                "n_pos": int(r["sum(n_pos)"]),
                "cum_pos": cum_p,
                "gain": cum_p / tot_pos if tot_pos else None,
                "lift": (cum_p * total) / (tot_pos * cum_r) if tot_pos else None,
            }
        )
    return pa.Table.from_pylist(rows)


def tv_hellinger(ds, value_col: str, group_col: str, group_a,
                 bucket_width: int = 500) -> pa.Table:
    """Total-variation and Hellinger distance between the bucketed
    value distribution of group_a and EVERYONE ELSE: bucket =
    value // bucket_width (exact integer floor), one grouped histogram
    is the only exchange. TV = sum |ca*nb - cb*na| / (2*na*nb) is one
    exact-integer division; the Bhattacharyya coefficient
    BC = sum sqrt((ca/na) * (cb/nb)) and hellinger = sqrt(1 - BC) are
    round-6 (terms are bit-identical doubles, only the cell-sum order
    varies). Output one row (n_a, n_b, tv, bc, hellinger)."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col)
        ok = pc.and_(pc.is_valid(v), pc.is_valid(batch.column(group_col)))
        t = batch.filter(ok)
        x = t.column(value_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) // bucket_width
        is_a = pc.equal(t.column(group_col), group_a)
        h = pa.table(
            {
                "a": pc.cast(is_a, pa.int64()),
                "b": pa.array(x.astype(np.int64)),
            }
        )
        return (
            h.group_by(["a", "b"], use_threads=False)
            .aggregate([("a", "count")])
            .rename_columns(["a", "b", "cnt"])
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"])
        .sum("cnt")
        .take_all()
    )
    ca: dict[int, int] = {}
    cb: dict[int, int] = {}
    for r in hist:
        (ca if r["a"] == 1 else cb)[int(r["b"])] = int(r["sum(cnt)"])
    na, nb = sum(ca.values()), sum(cb.values())
    grid = sorted(set(ca) | set(cb))
    tv_num = 0
    bc = 0.0
    for x in grid:
        A, B = ca.get(x, 0), cb.get(x, 0)
        tv_num += abs(A * nb - B * na)
        bc += float(np.sqrt((A / na) * (B / nb))) if na and nb else 0.0
    tv = tv_num / (2 * na * nb) if na and nb else None
    bc_r = float(np.round(bc, 6)) if na and nb else None
    hel = float(np.round(np.sqrt(max(0.0, 1.0 - bc)), 6)) if na and nb else None
    return pa.table(
        {
            "n_a": pa.array([na], pa.int64()),
            "n_b": pa.array([nb], pa.int64()),
            "tv": pa.array([tv], pa.float64()),
            "bc": pa.array([bc_r], pa.float64()),
            "hellinger": pa.array([hel], pa.float64()),
        }
    )


def trimmed_mean(ds, value_col: str, group_col: str,
                 trim_num: int = 1, trim_den: int = 10,
                 decimal_scale: int = 0, max_distinct: int = 100_000) -> pa.Table:
    """Per-group trimmed mean: drop the k = n * trim_num // trim_den
    (exact integer) lowest and highest ROWS, then mean the rest —
    values quantized to decimal_scale decimals so the kept sum is an
    exact integer from the grouped distinct-value histogram (the only
    exchange, domain-bounded like brown_forsythe; guarded by
    max_distinct) and the mean is ONE int division. Ties at the trim
    boundary are safe: equal values contribute the same sum whichever
    rows are dropped. Output (group, n, n_kept, kept_sum,
    trimmed_mean)."""
    from .nullkeys import null_safe_group_map

    def partial(batch: pa.Table) -> pa.Table:
        c = pc.cast(
            pc.round(pc.multiply(pc.cast(batch.column(value_col), pa.float64()),
                                 10.0 ** decimal_scale)),
            pa.int64(),
        )
        t = pa.table({group_col: batch.column(group_col), "v": c})
        t = t.filter(pc.and_(pc.is_valid(c), pc.is_valid(t.column(group_col))))
        return (
            t.group_by([group_col, "v"], use_threads=False)
            .aggregate([("v", "count")])
            .rename_columns([group_col, "v", "cnt"])
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([group_col, "v"])
        .sum("cnt")
    )

    def merge(group: pa.Table) -> pa.Table:
        v = group.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
        c = group.column("sum(cnt)").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(v) > max_distinct:
            raise ValueError(
                f"trimmed_mean: {len(v)} distinct values (max_distinct={max_distinct})"
            )
        order = np.argsort(v, kind="stable")
        v, c = v[order], c[order]
        n = int(c.sum())
        k = n * trim_num // trim_den
        # kept rows are ranks (k, n-k]; per distinct value the kept
        # multiplicity is overlap of [cum_lo, cum_hi) with [k, n-k)
        hi = np.cumsum(c)
        lo = hi - c
        kept = np.minimum(hi, n - k) - np.maximum(lo, k)
        kept = np.maximum(kept, 0)
        n_kept = int(kept.sum())
        kept_sum = int((kept * v).sum())
        return pa.table(
            {
                group_col: group.column(group_col).slice(0, 1),
                "n": pa.array([n], pa.int64()),
                "n_kept": pa.array([n_kept], pa.int64()),
                "kept_sum": pa.array([kept_sum], pa.int64()),
                "trimmed_mean": pa.array(
                    [kept_sum / n_kept if n_kept else None], pa.float64()
                ),
            }
        )

    return null_safe_group_map(hist, [group_col], merge)


def cox_stuart(ds, key_col: str, ts_col: str, min_pairs: int = 5) -> "object":
    """Per-key Cox-Stuart trend test on the daily activity series:
    days (epoch-day index) sorted, the i-th day's count paired with
    the (i + ceil(n/2))-th; zero differences drop (classical
    convention); S+ = #positive differences over m nonzero pairs and
    z = (2.0 * S+ - m) / sqrt(m) — all inputs integers and the
    expression order matches the SQL oracle, so bit-deterministic.
    Keys with m < min_pairs drop. Two exchanges: the (key, day) count
    groupby, then groupby(key). Output (key, s_plus, n_pairs, z)."""
    from ray.data.aggregate import Count

    from .nullkeys import null_safe_group_map

    day_us = 24 * 3600 * 1_000_000

    def day_key(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        batch = batch.filter(pc.is_valid(ts))
        d = batch.column(ts_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) // day_us
        return pa.table(
            {key_col: batch.column(key_col), "day": pa.array(d.astype(np.int64))}
        )

    ud = (
        ds.map_batches(day_key, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key_col, "day"])
        .aggregate(Count(alias_name="c"))
    )

    def per_key(g: pa.Table) -> pa.Table:
        day = g.column("day").to_numpy(zero_copy_only=False)
        c = g.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(day, kind="stable")
        x = c[order]
        n = len(x)
        h = (n + 1) // 2
        d = x[h:] - x[: n - h]
        d = d[d != 0]
        sp = int((d > 0).sum())
        m = len(d)
        if m < min_pairs:
            return pa.table(
                {
                    key_col: g.column(key_col).slice(0, 0),
                    "s_plus": pa.array([], pa.int64()),
                    "n_pairs": pa.array([], pa.int64()),
                    "z": pa.array([], pa.float64()),
                }
            )
        z = (2.0 * sp - m) / float(np.sqrt(float(m)))
        return pa.table(
            {
                key_col: g.column(key_col).slice(0, 1),
                "s_plus": pa.array([sp], pa.int64()),
                "n_pairs": pa.array([m], pa.int64()),
                "z": pa.array([z], pa.float64()),
            }
        )

    return null_safe_group_map(ud, [key_col], per_key)


def distance_correlation(ds, ts_col: str, user_col: str):
    """Szekely-Rizzo DISTANCE CORRELATION between the daily event
    count and the daily distinct-user count — detects nonlinear
    dependence that Pearson misses (dcor = 0 iff independent, for the
    population statistic).

    Integer-exact evaluation: with n days and integer series x, y the
    double-centered distance matrix scaled by n^2,

        A~_ij = n^2*|x_i-x_j| - n*rowsum_i - n*rowsum_j + grandsum,

    is INTEGER for every pair, so S_ab = sum A~_ij B~_ij, S_aa, S_bb
    are exact int64 sums (magnitudes ~1e15 at 1e2 days, well inside
    int64) and dcor = S_ab / sqrt(double(S_aa) * double(S_bb)) is a
    single deterministic float expression — no order-dependent float
    accumulation anywhere. n^4 * dCov^2 = S_ab / n^2 (V-statistic).

    Scale shape: the corpus reduces to one (day, count, users) row per
    day via a distributed groupby (distinct users per day via a
    two-level groupby); the O(n^2) pair work runs on that tiny series
    on the driver. Output one row: (n_days, s_ab, s_aa, s_bb, dcor).
    """
    from ray.data.aggregate import Count

    day_us = 24 * 3600 * 1_000_000

    def day_user(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        keep = pc.and_(pc.is_valid(ts), pc.is_valid(batch.column(user_col)))
        batch = batch.filter(keep)
        d = batch.column(ts_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) // day_us
        t = pa.table(
            {
                "day": pa.array(d.astype(np.int64)),
                "u": pc.cast(batch.column(user_col), pa.int64()),
            }
        )
        # batch-local pre-dedup of (day, user) shrinks both exchanges
        g = t.group_by(["day", "u"], use_threads=False).aggregate([("u", "count")])
        return pa.table(
            {
                "day": g.column("day"),
                "u": g.column("u"),
                "c": pc.cast(g.column("u_count"), pa.int64()),
            }
        )

    per_user = (
        ds.map_batches(day_user, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["day", "u"])
        .sum("c")
        .take_all()
    )
    days: dict[int, list[int]] = {}
    for r in per_user:
        cell = days.setdefault(int(r["day"]), [0, 0])
        cell[0] += int(r["sum(c)"])  # events that day
        cell[1] += 1  # distinct users that day
    series = sorted(days.items())
    n = len(series)
    if n < 2:
        return pa.table(
            {
                "n_days": pa.array([n], pa.int64()),
                "s_ab": pa.array([None], pa.int64()),
                "s_aa": pa.array([None], pa.int64()),
                "s_bb": pa.array([None], pa.int64()),
                "dcor": pa.array([None], pa.float64()),
            }
        )
    x = np.array([c for _, (c, _) in series], np.int64)
    y = np.array([u for _, (_, u) in series], np.int64)

    def centered(v: np.ndarray) -> np.ndarray:
        d = np.abs(v[:, None] - v[None, :])  # int64
        rs = d.sum(axis=1)  # int64 rowsums
        gs = int(d.sum())
        return (n * n) * d - n * rs[:, None] - n * rs[None, :] + gs

    a = centered(x)
    b = centered(y)
    s_ab = int((a * b).sum())
    s_aa = int((a * a).sum())
    s_bb = int((b * b).sum())
    denom = float(s_aa) * float(s_bb)
    dcor = s_ab / np.sqrt(denom) if denom > 0 else None
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "s_ab": pa.array([s_ab], pa.int64()),
            "s_aa": pa.array([s_aa], pa.int64()),
            "s_bb": pa.array([s_bb], pa.int64()),
            "dcor": pa.array([dcor], pa.float64()),
        }
    )


def mix_shift(ds, group_col: str, value_col: str, ts_col: str, split_day: int):
    """Mix-shift (composition vs rate) decomposition of the change in
    the overall average value between two periods, per group — the
    classic business-analytics identity

        avg2 - avg1 = sum_g [ (w2_g - w1_g) * r1_g     (mix effect)
                            + w2_g * (r2_g - r1_g) ]   (rate effect)

    with w = group share of rows, r = group mean. Values accumulate
    as INTEGER CENTS (sum, count per (group, period) — exact under
    any merge order); the four reported effects derive from those
    exact integers through one fixed float expression each, so the
    result is bit-deterministic and matches the SQL oracle.

    period 1 = rows with epoch-day(ts) < split_day, else period 2.
    Output per group: n1, n2, s1_cents, s2_cents (exact BIGINT), mix
    and rate effects in cents (float64). Scale shape: per-batch
    combiner emits <= 2*|groups| fixed-width partial rows; only those
    enter the groupby exchange."""
    day_us = 24 * 3600 * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(
                pc.is_valid(batch.column(ts_col)),
                pc.is_valid(batch.column(value_col)),
            ),
            pc.is_valid(batch.column(group_col)),
        )
        batch = batch.filter(keep)
        d = batch.column(ts_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) // day_us
        cents = np.rint(
            batch.column(value_col).to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        t = pa.table(
            {
                "g": batch.column(group_col),
                "p": pa.array(np.where(d < split_day, 1, 2).astype(np.int64)),
                "s": pa.array(cents),
                "n": pa.array(np.ones(len(cents), np.int64)),
            }
        )
        return t.group_by(["g", "p"], use_threads=False).aggregate(
            [("s", "sum"), ("n", "sum")]
        )

    parts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["g", "p"])
        .sum(["s_sum", "n_sum"])
        .take_all()
    )
    cells: dict[str, dict[int, tuple[int, int]]] = {}
    for r in parts:
        cells.setdefault(r["g"], {})[int(r["p"])] = (
            int(r["sum(s_sum)"]),
            int(r["sum(n_sum)"]),
        )
    n_tot = {1: 0, 2: 0}
    for periods in cells.values():
        for p, (_, cnt) in periods.items():
            n_tot[p] += cnt
    rows = []
    for g in sorted(cells):
        s1, n1 = cells[g].get(1, (0, 0))
        s2, n2 = cells[g].get(2, (0, 0))
        if n1 == 0 or n2 == 0 or n_tot[1] == 0 or n_tot[2] == 0:
            mix = rate = None
        else:
            r1 = s1 / n1
            mix = (n2 / n_tot[2] - n1 / n_tot[1]) * r1
            rate = (n2 / n_tot[2]) * (s2 / n2 - r1)
        rows.append((g, n1, n2, s1, s2, mix, rate))
    return pa.table(
        {
            group_col: pa.array([r[0] for r in rows]),
            "n1": pa.array([r[1] for r in rows], pa.int64()),
            "n2": pa.array([r[2] for r in rows], pa.int64()),
            "s1_cents": pa.array([r[3] for r in rows], pa.int64()),
            "s2_cents": pa.array([r[4] for r in rows], pa.int64()),
            "mix_effect": pa.array([r[5] for r in rows], pa.float64()),
            "rate_effect": pa.array([r[6] for r in rows], pa.float64()),
        }
    )


def permutation_test(
    ds,
    value_col: str,
    id_col: str,
    group_col: str,
    group_a,
    b: int = 200,
    salt: str = "pt",
    decimal_scale: int = 2,
):
    """DETERMINISTIC two-sample permutation-style test for a mean
    difference (group_a vs the rest): the null distribution comes from
    b random RELABELINGS of the rows — row i joins pseudo-group A in
    replicate j iff splitmix64(fnv(salt|id_i) + j) % 1e6 falls below
    the integer threshold floor(1e6 * n_a / n), so expected group
    sizes match the observed split and any engine replays the exact
    same relabelings (Chamandy-style hash randomness, same mixer as
    bootstrap_mean_ci). p = (#extreme + 1) / (b_eff + 1), the
    add-one-smoothed Monte-Carlo estimate.

    Exactness: per-replicate sums/counts are exact int64 (integer
    cents x 0/1 assignment); each replicate's mean difference and the
    observed difference evaluate through the same fixed float
    expression (two int->double divisions and a subtraction), so the
    |diff_j| >= |diff_obs| comparisons are bit-deterministic and the
    extreme COUNT is exact. Two passes over the input: a tiny
    (side, n, sum) aggregate to fix the threshold, then the b-wide
    relabeling combiner (each batch reduces to b fixed-width rows).

    Output one row: (n_a, n_b, diff_obs_cents, b, n_extreme, p_value).
    """
    from .. import bloom as bloom_mod
    from .sample import _key_fingerprints

    scale = 10.0**decimal_scale
    js = np.arange(b, dtype=np.uint64)

    def obs_partial(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.and_(
                pc.is_valid(batch.column(value_col)),
                pc.is_valid(batch.column(id_col)),
            ),
            pc.is_valid(batch.column(group_col)),
        )
        t = batch.filter(ok)
        cents = np.rint(
            pc.cast(t.column(value_col), pa.float64()).to_numpy(zero_copy_only=False)
            * scale
        ).astype(np.int64)
        ga = pc.equal(t.column(group_col), group_a).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "ga": pa.array([1, 0], pa.int64()),
                "n": pa.array(
                    [int(ga.sum()), int((~ga).sum())], pa.int64()
                ),
                "s": pa.array(
                    [int(cents[ga].sum()), int(cents[~ga].sum())], pa.int64()
                ),
            }
        )

    from ray.data.aggregate import Sum

    obs = (
        ds.map_batches(obs_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ga")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"))
        .take_all()
    )
    side = {int(r["ga"]): (int(r["n"]), int(r["s"])) for r in obs}
    n_a, s_a = side.get(1, (0, 0))
    n_b, s_b = side.get(0, (0, 0))
    n = n_a + n_b
    if n_a == 0 or n_b == 0:
        return pa.table(
            {
                "n_a": pa.array([n_a], pa.int64()),
                "n_b": pa.array([n_b], pa.int64()),
                "diff_obs_cents": pa.array([None], pa.float64()),
                "b": pa.array([0], pa.int64()),
                "n_extreme": pa.array([None], pa.int64()),
                "p_value": pa.array([None], pa.float64()),
            }
        )
    thr6 = (n_a * 1_000_000) // n
    diff_obs = float(s_a) / float(n_a) - float(s_b) / float(n_b)

    def rep_partial(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.and_(
                pc.is_valid(batch.column(value_col)),
                pc.is_valid(batch.column(id_col)),
            ),
            pc.is_valid(batch.column(group_col)),
        )
        t = batch.filter(ok)
        if t.num_rows == 0:
            return pa.table(
                {
                    "j": pa.array([], pa.int64()),
                    "nca": pa.array([], pa.int64()),
                    "sca": pa.array([], pa.int64()),
                }
            )
        cents = np.rint(
            pc.cast(t.column(value_col), pa.float64()).to_numpy(zero_copy_only=False)
            * scale
        ).astype(np.int64)
        base = _key_fingerprints(t.select([id_col]), id_col, f"{salt}|")
        h = bloom_mod._mix(base[:, None] + js[None, :])
        assign = (h % np.uint64(1_000_000)).astype(np.int64) < thr6
        return pa.table(
            {
                "j": pa.array(np.arange(b, dtype=np.int64)),
                "nca": pa.array(assign.sum(axis=0).astype(np.int64)),
                "sca": pa.array((assign * cents[:, None]).sum(axis=0)),
            }
        )

    reps = (
        ds.map_batches(rep_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("j")
        .aggregate(Sum("nca", alias_name="nca"), Sum("sca", alias_name="sca"))
        .take_all()
    )
    s_tot = s_a + s_b
    b_eff = 0
    n_extreme = 0
    for r in reps:
        nca, sca = int(r["nca"]), int(r["sca"])
        if nca == 0 or nca == n:
            continue
        b_eff += 1
        dj = float(sca) / float(nca) - float(s_tot - sca) / float(n - nca)
        if abs(dj) >= abs(diff_obs):
            n_extreme += 1
    return pa.table(
        {
            "n_a": pa.array([n_a], pa.int64()),
            "n_b": pa.array([n_b], pa.int64()),
            "diff_obs_cents": pa.array([diff_obs], pa.float64()),
            "b": pa.array([b_eff], pa.int64()),
            "n_extreme": pa.array([n_extreme], pa.int64()),
            "p_value": pa.array([(n_extreme + 1) / (b_eff + 1)], pa.float64()),
        }
    )
