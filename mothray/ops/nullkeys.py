"""Null-safe grouped shuffles.

Ray's sort-based groupby cannot order a NULLABLE key block (the range
partitioner compares raw Python values, and None < str raises), but a
null group key is a perfectly legal SQL GROUP BY partition. The fix
used across the engine: shuffle on SURROGATE keys — a string-cast,
null-filled copy of each key column plus an is-null flag — while the
original typed key columns ride through as payload, so group UDFs and
output rows still see the real (possibly null) values. The flag keeps
a true null distinct from an empty string / "0" cast.

Any op of the shape ds.groupby(keys).map_groups(fn) becomes
null_safe_group_map(ds, keys, fn) with identical semantics on
null-free keys and correct (rather than crashing) semantics when a
key column contains nulls.
"""

from __future__ import annotations

import pyarrow as pa


def _surrogate_names(n: int) -> list[str]:
    out = []
    for i in range(n):
        out += [f"__gk{i}", f"__gn{i}"]
    return out


def append_surrogates(t: pa.Table, key_cols: list[str]) -> pa.Table:
    """Append (__gk{i}, __gn{i}) shuffle surrogates for each key col."""
    import pyarrow.compute as pc

    for i, c in enumerate(key_cols):
        arr = t.column(c)
        t = t.append_column(f"__gk{i}", pc.fill_null(pc.cast(arr, pa.string()), ""))
        t = t.append_column(f"__gn{i}", pc.cast(pc.is_null(arr), pa.int8()))
    return t


def null_safe_group_map(ds, key_cols: list[str], fn, batch_format: str = "pyarrow"):
    """ds.groupby(key_cols).map_groups(fn) that tolerates nulls in any
    key column. `fn` receives the group WITHOUT the surrogate columns
    (exactly what plain map_groups would hand it) and its output passes
    through unchanged."""
    surr = _surrogate_names(len(key_cols))

    def add(batch: pa.Table) -> pa.Table:
        return append_surrogates(batch, key_cols)

    def wrapped(group: pa.Table) -> pa.Table:
        return fn(group.drop_columns(surr))

    return (
        ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(surr)
        .map_groups(wrapped, batch_format=batch_format)
    )


def null_safe_group_aggregate(ds, key_cols: list[str], aggs: list, batch_format: str = "pyarrow"):
    """ds.groupby(key_cols).aggregate(*aggs) that tolerates nulls in
    any key column: the shuffle runs on surrogates; each original key
    column is recovered per group via a Min aggregate (all values in a
    group are equal; an all-null key group recovers null). Output
    schema matches the plain form: key columns then agg columns, no
    surrogates."""
    from ray.data.aggregate import Min

    surr = _surrogate_names(len(key_cols))

    def add(batch: pa.Table) -> pa.Table:
        return append_surrogates(batch, key_cols)

    key_aggs = [Min(c, alias_name=c) for c in key_cols]
    out = (
        ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(surr)
        .aggregate(*key_aggs, *aggs)
    )

    def strip(batch: pa.Table) -> pa.Table:
        return batch.drop_columns([c for c in surr if c in batch.column_names])

    return out.map_batches(strip, batch_format=batch_format)
