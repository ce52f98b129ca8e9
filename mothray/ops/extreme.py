"""arg_max / arg_min (max_by, min_by) and MODE aggregates.

Both are exact, deterministic, and carry SQL oracles (QUALIFY
row_number chains). Scale shape: a per-batch combiner reduces each
batch to at most one row per (group) — or one (group, value, count)
row per distinct pair for mode — before the single groupby exchange;
the per-group finisher repeats the same pick, so results are
independent of batch layout and partitioning.

Tie-breaking is explicit (it must be, for a value oracle): arg_extreme
breaks order-column ties by ascending tiebreak column; group_mode
breaks count ties by ascending value.

No reference analog (orc-go has no aggregate engine) — SQL-surface
extension alongside the moments / sketch family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _best_rows(t: pa.Table, group_col: str, order_col: str, tiebreak_col: str,
               descending: bool) -> pa.Table:
    """First row per group under (group asc, order asc|desc, tiebreak
    asc) — Arrow sort + boundary mask, no Python per row."""
    if t.num_rows == 0:
        return t
    idx = pc.sort_indices(
        t,
        sort_keys=[
            (group_col, "ascending"),
            (order_col, "descending" if descending else "ascending"),
            (tiebreak_col, "ascending"),
        ],
    )
    s = t.take(idx)
    g = s.column(group_col).combine_chunks()
    n = len(g)
    first = np.ones(n, dtype=bool)
    if n > 1:
        a, b = g.slice(1), g.slice(0, n - 1)
        # null-safe boundary: not_equal(null, x) is NULL, which would
        # silently merge the null group into its neighbor — a null key
        # is a real group; boundary = values differ OR validity differs
        neq = pc.fill_null(pc.not_equal(a, b), False).to_numpy(zero_copy_only=False)
        va = a.is_valid().to_numpy(zero_copy_only=False)
        vb = b.is_valid().to_numpy(zero_copy_only=False)
        first[1:] = neq | (va != vb)
    return s.filter(pa.array(first))


def arg_extreme(ds, group_col: str, order_col: str, tiebreak_col: str,
                columns: list[str] | None = None, mode: str = "max"):
    """One row per group: the row with the max (or min) order_col,
    ties by ascending tiebreak_col. `columns` selects the output
    payload (default: group, order, tiebreak)."""
    if mode not in ("max", "min"):
        raise ValueError(f"mode must be 'max' or 'min', got {mode!r}")
    desc = mode == "max"
    cols = columns or sorted({group_col, order_col, tiebreak_col})

    def partial(batch: pa.Table) -> pa.Table:
        return _best_rows(
            batch.select(cols), group_col, order_col, tiebreak_col, desc
        )

    def finish(group: pa.Table) -> pa.Table:
        return _best_rows(group, group_col, order_col, tiebreak_col, desc)

    from .nullkeys import null_safe_group_map

    return null_safe_group_map(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        [group_col],
        finish,
    )


def group_mode(ds, group_col: str, value_col: str, out_col: str = "mode_value"):
    """(group, mode): most frequent value per group, count ties broken
    by the smallest value. Combiner = per-batch (group, value, count)
    partials; only distinct pairs enter the exchange."""

    def partial(batch: pa.Table) -> pa.Table:
        counted = batch.select([group_col, value_col]).group_by(
            [group_col, value_col]
        ).aggregate([([], "count_all")])
        return counted.rename_columns([group_col, value_col, "cnt"])

    def finish(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group,
            sort_keys=[("cnt", "descending"), (value_col, "ascending")],
        )
        top = group.take(idx.slice(0, 1))
        return pa.table(
            {
                group_col: top.column(group_col),
                out_col: top.column(value_col),
            }
        )

    from ray.data.aggregate import Sum

    from .nullkeys import null_safe_group_aggregate, null_safe_group_map

    counted = null_safe_group_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        [group_col, value_col],
        [Sum("cnt", alias_name="cnt")],
    )
    return null_safe_group_map(counted, [group_col], finish)


def pareto_front(ds, x_col: str, y_col: str, x_decimal_scale: int = 2,
                 keep_cols: list[str] | None = None):
    """2-D Pareto front / skyline: the rows NOT strictly dominated —
    row b is dominated iff some row a has x_a < x_b AND y_a > y_b
    (minimize x, maximize y; the classic price-vs-recency frontier).

    Scale shape (no quadratic pass, no global sort of the corpus):
    pass 1 reduces each batch to its distinct (x, max y) pairs and one
    grouped exchange merges them into the distinct-x grid — bounded by
    the x DOMAIN, not the row count; the driver prefix-scans that
    sorted grid into a map x -> max y over all strictly smaller x,
    broadcast via ray.put; pass 2 streams the corpus once more and
    keeps rows whose y >= that running max. x quantizes to exact
    integers (x_decimal_scale) so the strict < grid is unambiguous."""
    import ray
    import pyarrow.compute as pc

    scale = 10.0**x_decimal_scale
    cols = keep_cols or [x_col, y_col]

    def ynorm(col):
        # temporal y compares as epoch int64; numeric y as float64
        t = col.type
        if pa.types.is_timestamp(t) or pa.types.is_date(t):
            return pc.cast(pc.cast(col, pa.timestamp("us") if pa.types.is_timestamp(t) else pa.date32()), pa.int64() if pa.types.is_timestamp(t) else pa.int32()).cast(pa.int64())
        return pc.cast(col, pa.float64())

    def xgrid(batch: pa.Table) -> pa.Table:
        x = pc.cast(pc.round(pc.multiply(pc.cast(batch.column(x_col), pa.float64()), scale)), pa.int64())
        t = pa.table({"xs": x, "y": ynorm(batch.column(y_col))}).filter(
            pc.and_(pc.is_valid(x), pc.is_valid(batch.column(y_col)))
        )
        g = t.group_by(["xs"], use_threads=False).aggregate([("y", "max")])
        return g.rename_columns(["xs", "ymax"])

    grid = (
        ds.map_batches(xgrid, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("xs")
        .max("ymax")
        .take_all()
    )
    grid.sort(key=lambda r: r["xs"])
    xs = np.array([r["xs"] for r in grid], dtype=np.int64)
    ymax = np.array([r["max(ymax)"] for r in grid], dtype=np.float64)
    # prev_best[i] = max ymax over all strictly smaller x
    prev_best = np.concatenate(([-np.inf], np.maximum.accumulate(ymax)[:-1]))
    ref = ray.put((xs, prev_best))

    def keep(batch: pa.Table) -> pa.Table:
        import ray as ray_api

        gxs, gprev = ray_api.get(ref)
        x = pc.cast(pc.round(pc.multiply(pc.cast(batch.column(x_col), pa.float64()), scale)), pa.int64())
        ok = pc.and_(pc.is_valid(x), pc.is_valid(batch.column(y_col)))
        t = batch.filter(ok)
        xv = pc.cast(
            pc.round(pc.multiply(pc.cast(t.column(x_col), pa.float64()), scale)),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        yv = ynorm(t.column(y_col)).to_numpy(zero_copy_only=False).astype(np.float64)
        pos = np.searchsorted(gxs, xv)
        not_dominated = yv >= gprev[pos]
        return t.select(cols).filter(pa.array(not_dominated))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def golden_record(ds, key_col: str, order_col: str, tiebreak_col: str,
                  value_cols: list[str]):
    """Survivorship consolidation ('golden record'): one row per key
    where each value column independently takes its LATEST NON-NULL
    value in (order, tiebreak) order — the standard master-data merge
    rule (newest wins, but a null never overwrites older data).
    Output: (key, *value_cols).

    Scale shape: a per-batch combiner keeps, per key and per column,
    only the latest non-null (value, order, tiebreak) — one wide row
    per key per batch enters the exchange — and the per-group finisher
    repeats the same pick over those candidates."""

    def reduce_batch(batch: pa.Table) -> pa.Table:
        schema_cols: dict = {}
        n = batch.num_rows
        if n == 0:
            schema_cols[key_col] = pa.array([], batch.schema.field(key_col).type)
            for vc in value_cols:
                schema_cols[vc] = pa.array([], batch.schema.field(vc).type)
                schema_cols[f"__o_{vc}"] = pa.array([], batch.schema.field(order_col).type)
                schema_cols[f"__tb_{vc}"] = pa.array([], batch.schema.field(tiebreak_col).type)
            return pa.table(schema_cols)
        idx = pc.sort_indices(
            batch,
            sort_keys=[
                (key_col, "ascending"),
                (order_col, "descending"),
                (tiebreak_col, "descending"),
            ],
        )
        g = batch.take(idx)
        kk = g.column(key_col).combine_chunks()
        first = np.ones(n, dtype=bool)
        if n > 1:
            a, b = kk.slice(1), kk.slice(0, n - 1)
            neq = pc.fill_null(pc.not_equal(a, b), False).to_numpy(zero_copy_only=False)
            va = a.is_valid().to_numpy(zero_copy_only=False)
            vb = b.is_valid().to_numpy(zero_copy_only=False)
            first[1:] = neq | (va != vb)
        starts = np.flatnonzero(first)
        ends = np.r_[starts[1:], n]
        schema_cols[key_col] = kk.take(pa.array(starts, pa.int64()))
        pos = np.arange(n, dtype=np.int64)
        for vc in value_cols:
            col = g.column(vc).combine_chunks()
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            pm = np.where(valid, pos, n)
            fv = np.minimum.reduceat(pm, starts)
            has = fv < ends
            take = pa.array(np.where(has, fv, 0), pa.int64())
            hm = pa.array(has)
            null_v = pa.scalar(None, batch.schema.field(vc).type)
            null_o = pa.scalar(None, batch.schema.field(order_col).type)
            null_tb = pa.scalar(None, batch.schema.field(tiebreak_col).type)
            schema_cols[vc] = pc.if_else(hm, col.take(take), null_v)
            schema_cols[f"__o_{vc}"] = pc.if_else(hm, g.column(order_col).take(take), null_o)
            schema_cols[f"__tb_{vc}"] = pc.if_else(hm, g.column(tiebreak_col).take(take), null_tb)
        return pa.table(schema_cols)

    def finish(group: pa.Table) -> pa.Table:
        out = {key_col: group.column(key_col).slice(0, 1)}
        for vc in value_cols:
            sub = pa.table(
                {
                    "v": group.column(vc),
                    "o": group.column(f"__o_{vc}"),
                    "tb": group.column(f"__tb_{vc}"),
                }
            ).filter(pc.is_valid(group.column(vc)))
            if sub.num_rows == 0:
                out[vc] = pa.array([None], group.schema.field(vc).type)
                continue
            pick = sub.take(
                pc.sort_indices(
                    sub, sort_keys=[("o", "descending"), ("tb", "descending")]
                ).slice(0, 1)
            )
            out[vc] = pick.column("v")
        return pa.table(out)

    from .nullkeys import null_safe_group_map

    proj = ds.select_columns(
        sorted({key_col, order_col, tiebreak_col, *value_cols})
    ).map_batches(reduce_batch, batch_format="pyarrow", zero_copy_batch=True)
    return null_safe_group_map(proj, [key_col], finish)


def topn_other(ds, group_col: str, n: int = 10, other_label: str = "OTHER"):
    """Value counts with an OTHER rollup: the n most frequent values
    of group_col (ties break on the smaller value) keep their own
    rows; the rest collapse into one OTHER row. Nulls count as the
    literal value 'NULL' (they may legitimately be frequent enough to
    rank). The standard reporting "lump the tail" op. Output
    (value string, cnt int64).

    Scale: one combiner-shaped value-count groupby (distinct values
    cross the wire, not rows); the top-n cut happens on the counted
    table."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(group_col)
        v = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
        if not (pa.types.is_string(v.type) or pa.types.is_large_string(v.type)):
            v = pc.cast(v, pa.string())
        v = pc.fill_null(v, "NULL")
        t = pa.table({"v": v})
        agg = t.group_by(["v"], use_threads=False).aggregate([([], "count_all")])
        return agg.rename_columns(["v", "cnt"])

    counts = (
        ds.select_columns([group_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("v")
        .sum("cnt")
        .take_all()
    )  # distinct-values-sized
    rows = sorted(counts, key=lambda r: (-r["sum(cnt)"], r["v"]))
    head = rows[:n]
    tail_cnt = sum(r["sum(cnt)"] for r in rows[n:])
    vals = [r["v"] for r in head]
    cnts = [r["sum(cnt)"] for r in head]
    if tail_cnt:
        vals.append(other_label)
        cnts.append(tail_cnt)
    return pa.table({"value": pa.array(vals), "cnt": pa.array(cnts, pa.int64())})
