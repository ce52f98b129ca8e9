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


def _surrogate_values(arr, pc):
    """Null-filled, shuffle-sortable image of a key column. The fill
    value can never collide with real data because the __gn flag
    separates null rows from everything else; what matters is that
    equal SQL keys map to equal surrogates:

    * binary stays raw bytes (a string cast would demand valid UTF-8);
    * floats normalize -0.0 to 0.0 before the cast (SQL GROUP BY
      treats them as one key; their strings differ) and float16
      widens first (no `equal` kernel);
    * nested/dictionary types pass through untouched — same nullable
      limits as the plain groupby, no new failure introduced;
    * everything else takes the (injective) string cast."""
    t = arr.type
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return pc.fill_null(arr, b"")
    if pa.types.is_nested(t) or pa.types.is_dictionary(t):
        return arr
    if pa.types.is_floating(t):
        if pa.types.is_float16(t):
            arr = pc.cast(arr, pa.float32())
        arr = pc.if_else(pc.equal(arr, 0.0), pa.scalar(0.0, arr.type), arr)
    return pc.fill_null(pc.cast(arr, pa.string()), "")


def append_surrogates(t: pa.Table, key_cols: list[str]) -> pa.Table:
    """Append (__gk{i}, __gn{i}) shuffle surrogates for each key col."""
    import pyarrow.compute as pc

    for i, c in enumerate(key_cols):
        arr = t.column(c)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        t = t.append_column(f"__gk{i}", _surrogate_values(arr, pc))
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
    schema = ds.schema().base_schema
    key_types = {c: schema.field(c).type for c in key_cols}

    def add(batch: pa.Table) -> pa.Table:
        return append_surrogates(batch, key_cols)

    key_aggs = [Min(c, alias_name=c) for c in key_cols]
    out = (
        ds.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(surr)
        .aggregate(*key_aggs, *aggs)
    )

    def strip(batch: pa.Table) -> pa.Table:
        batch = batch.drop_columns([c for c in surr if c in batch.column_names])
        # a block whose groups ALL have a null key comes back with the
        # key column typed `null` (Min over nothing); restore the real
        # type so blocks agree on schema
        for c, t in key_types.items():
            col = batch.column(c)
            if col.type != t:
                batch = batch.set_column(
                    batch.schema.get_field_index(c), c, col.cast(t)
                )
        return batch

    return out.map_batches(strip, batch_format=batch_format)
