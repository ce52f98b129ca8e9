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
