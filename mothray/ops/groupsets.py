"""GROUPING SETS / ROLLUP / CUBE over a Dataset.

SQL's multi-level aggregates, computed the scale-correct way: ONE
corpus shuffle builds the finest grouping (the union of every
requested key set); every coarser set then re-aggregates the SMALL
finest result — sums of sums, mins of mins — so the corpus never
moves twice. This only works for decomposable aggregates, which is
exactly the supported set: sum / count / min / max (count re-
aggregates as sum). Matches the classic Gray et al. data-cube
construction (public paper: "Data Cube: A Relational Aggregation
Operator").

The finest result is bounded by the product of the key-column
cardinalities — grouping-set keys are reporting dimensions (flags,
statuses, dates), so it fits on the driver by construction; the
coarser levels are then derived there with Arrow group_by (no extra
cluster shuffles at all). Corpus-cardinality keys don't belong in a
ROLLUP on any engine.

Output carries SQL's GROUPING() bitmask (`grouping_id`): bit i (MSB =
first listed key) set when key i is aggregated away in that row, so
results are value-comparable to `GROUP BY ROLLUP/CUBE + GROUPING()`.

Oracle caveat inherited from the driver contract: float sums are
addition-order-sensitive; use integer or integral-double measures in
value-checked queries.
"""

from __future__ import annotations

from itertools import chain, combinations

import numpy as np
import pyarrow as pa

_REAGG = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def _finest(ds, union_keys: list[str], specs: dict[str, tuple[str, str]]) -> pa.Table:
    """The one corpus shuffle: groupby the union of all key sets with
    the raw aggregates, named to the caller's output columns."""
    from ray.data.aggregate import Count, Max, Min, Sum

    ctor = {"sum": Sum, "min": Min, "max": Max}
    aggs = [
        Count(alias_name=name)
        if fn == "count"
        else ctor[fn](col, alias_name=name)
        for name, (col, fn) in specs.items()
    ]
    from .nullkeys import null_safe_group_aggregate

    df = null_safe_group_aggregate(ds, union_keys, aggs).to_pandas()
    return pa.Table.from_pandas(df, preserve_index=False)


def grouping_sets(ds, keys: list[str], sets: list[list[str]], specs: dict[str, tuple[str, str]]):
    """specs: {out_name: (measure_col, fn)} with fn in sum|count|min|max.
    `keys` fixes the GROUPING() bit order; every set must be a subset.
    Returns one Dataset with all key columns (null when aggregated
    away), the aggregate columns, and grouping_id."""
    import ray.data

    for s in sets:
        if not set(s) <= set(keys):
            raise ValueError(f"set {s} not a subset of keys {keys}")
    union_keys = [k for k in keys if any(k in s for s in sets)] or [keys[0]]
    finest = _finest(ds, union_keys, specs)
    key_types = {k: finest.schema.field(k).type for k in union_keys}
    agg_types = {name: finest.schema.field(name).type for name in specs}

    parts = []
    for s in sets:
        gid = 0
        for i, k in enumerate(keys):
            if k not in s:
                gid |= 1 << (len(keys) - 1 - i)
        reagg = [(name, _REAGG[specs[name][1]]) for name in specs]
        if s:
            grp = finest.group_by(s, use_threads=False).aggregate(reagg)
            agg_cols = {
                name: grp.column(f"{name}_{fn}").cast(agg_types[name])
                for name, fn in reagg
            }
            n = grp.num_rows
        else:
            import pyarrow.compute as pc

            agg_cols = {
                name: pa.array(
                    [getattr(pc, fn)(finest.column(name)).as_py()],
                    type=agg_types[name],
                )
                for name, fn in reagg
            }
            grp, n = None, 1
        cols, names = [], []
        for k in keys:
            names.append(k)
            if s and k in s:
                cols.append(grp.column(k).combine_chunks())
            else:
                cols.append(pa.nulls(n, type=key_types.get(k, pa.string())))
        for name in specs:
            names.append(name)
            cols.append(agg_cols[name])
        names.append("grouping_id")
        cols.append(pa.array([gid] * n, type=pa.int64()))
        parts.append(pa.Table.from_arrays([pa.chunked_array([c]) if isinstance(c, pa.Array) else c for c in cols], names=names))

    return ray.data.from_arrow(pa.concat_tables(parts))


def rollup(ds, keys: list[str], specs: dict[str, tuple[str, str]]):
    """GROUP BY ROLLUP(keys): prefixes of the key list, finest first."""
    sets = [keys[:i] for i in range(len(keys), -1, -1)]
    return grouping_sets(ds, keys, sets, specs)


def cube(ds, keys: list[str], specs: dict[str, tuple[str, str]]):
    """GROUP BY CUBE(keys): every subset of the key list."""
    sets = [list(c) for c in chain.from_iterable(combinations(keys, r) for r in range(len(keys), -1, -1))]
    return grouping_sets(ds, keys, sets, specs)


def pivot(ds, index: str, pivot_col: str, value_col: str, fn: str = "sum"):
    """PIVOT: one corpus shuffle aggregates (index, pivot) cells, the
    bounded cell grid reshapes on the driver — column per pivot value
    (sorted, so output schema is deterministic), row per index value.
    Matches DuckDB `PIVOT t ON pivot USING fn(value) GROUP BY index`
    (missing cells are NULL)."""
    import ray.data

    finest = _finest(ds, [index, pivot_col], {"v": (value_col, fn)})
    pdf = finest.to_pandas()
    # a NULL pivot value is a legal group: pandas would make it a NaN
    # column label (unsortable against strings) — name it 'NULL'
    pdf[pivot_col] = pdf[pivot_col].astype(object).where(pdf[pivot_col].notna(), "NULL")
    pdf = pdf.pivot(index=index, columns=pivot_col, values="v")
    pdf = pdf[sorted(pdf.columns)].reset_index()
    pdf.columns = [str(c) for c in pdf.columns]
    return ray.data.from_arrow(pa.Table.from_pandas(pdf, preserve_index=False))


def unpivot(ds, id_cols: list[str], value_cols: list[str],
            var_name: str = "name", value_name: str = "value"):
    """UNPIVOT/melt: wide -> long, streamed per batch with zero-copy
    column reuse (each value column becomes a stacked slice; id
    columns replicate by take). No shuffle at all."""
    import pyarrow.compute as pc

    def melt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        common = pa.float64() if all(
            pa.types.is_floating(batch.schema.field(c).type)
            or pa.types.is_integer(batch.schema.field(c).type)
            for c in value_cols
        ) else pa.string()
        cols = []
        idx = pa.array(np.tile(np.arange(n), len(value_cols)))
        for c in id_cols:
            cols.append(batch.column(c).take(idx))
        cols.append(pa.array(np.repeat(np.array(value_cols, dtype=object), n)))
        cols.append(
            pa.concat_arrays(
                [pc.cast(batch.column(c).combine_chunks(), common) for c in value_cols]
            )
        )
        return pa.Table.from_arrays(cols, names=[*id_cols, var_name, value_name])

    return ds.map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)


def array_agg(ds, group_col: str, value_col: str, order_col: str):
    """Per-group ordered list aggregation (SQL array_agg / list(...
    ORDER BY)): one groupby shuffle; inside each group a sort + one
    zero-copy ListArray wrap — no per-row Python. Output (group, agg
    list<value type>). Nulls in value_col are kept in position (SQL
    list() keeps them); deterministic via (order_col, value) sort.
    Groups must fit a task, the unbounded-aggregate contract."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def collect(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[(order_col, "ascending"), (value_col, "ascending")]
        )
        vals = group.column(value_col).take(idx)
        vals = vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals
        lst = pa.ListArray.from_arrays(pa.array([0, len(vals)], pa.int32()), vals)
        return pa.table(
            {
                group_col: group.column(group_col).combine_chunks().slice(0, 1),
                "agg": lst,
            }
        )

    from .nullkeys import null_safe_group_map

    proj = ds.select_columns(sorted({group_col, value_col, order_col}))
    return null_safe_group_map(proj, [group_col], collect)


def explode(ds, list_col: str, out_col: str | None = None, with_ordinal: bool = False):
    """UNNEST a list column to one row per element, other columns
    repeated (SQL UNNEST / CROSS JOIN LATERAL). Pure per-batch reshape
    — no shuffle, vectorized via the list offsets and one take():
    scalar columns repeat by element count, the flattened child array
    becomes `out_col` (default: the list column's name). Rows whose
    list is NULL or EMPTY are dropped (SQL UNNEST semantics); null
    ELEMENTS survive. `with_ordinal` appends a 1-based position column
    `ordinal` (SQL WITH ORDINALITY)."""
    import numpy as np
    import pyarrow as pa

    out_name = out_col or list_col

    def run(batch: pa.Table) -> pa.Table:
        arr = batch.column(list_col).combine_chunks()
        if not (pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)):
            raise TypeError(f"column {list_col!r} must be a list column, got {arr.type}")
        others_names = set(batch.column_names) - {list_col}
        if out_name in others_names:
            raise ValueError(f"explode out_col {out_name!r} collides with an existing column")
        if with_ordinal and "ordinal" in others_names:
            raise ValueError("explode: batch already has an 'ordinal' column")
        offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offs)
        if arr.null_count:
            lens = np.where(arr.is_valid().to_numpy(zero_copy_only=False), lens, 0)
        flat = arr.flatten()  # list_flatten skips NULL list slots
        total = int(lens.sum())
        if len(flat) != total:
            raise AssertionError(
                f"explode: flatten() yielded {len(flat)} elements, offsets say {total}"
            )
        reps = pa.array(np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens))
        others = batch.drop_columns([list_col]).take(reps)
        ends = np.cumsum(lens)
        within = np.arange(total, dtype=np.int64) - np.repeat(ends - lens, lens)
        out = others.append_column(out_name, flat)
        if with_ordinal:
            out = out.append_column("ordinal", pa.array(within + 1))
        return out

    return ds.map_batches(run, batch_format="pyarrow", zero_copy_batch=True)


def string_agg(ds, group_col: str, value_col: str, order_col: str, sep: str = ","):
    """Per-group ordered string concatenation (SQL string_agg ... ORDER
    BY): one groupby shuffle; inside each group a sort + one
    binary_join kernel call builds the row — no per-row Python. Output
    (group, agg). Groups must fit a task (same contract as every SQL
    engine's unbounded-aggregate)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def join(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[(order_col, "ascending")])
        vals = group.column(value_col).take(idx)
        vals = vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals
        vals = vals.drop_null()
        lst = pa.ListArray.from_arrays(pa.array([0, len(vals)], pa.int32()), vals.cast(pa.string()))
        return pa.table(
            {
                group_col: group.column(group_col).combine_chunks().slice(0, 1),
                "agg": pc.binary_join(lst, sep),
            }
        )

    from .nullkeys import null_safe_group_map

    proj = ds.select_columns(sorted({group_col, value_col, order_col}))
    return null_safe_group_map(proj, [group_col], join)
