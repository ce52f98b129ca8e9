"""SQL set operations over Datasets: DISTINCT, INTERSECT, EXCEPT,
UNION [DISTINCT] — bag-to-set semantics on whole rows.

Shape: per-batch DISTINCT first (Arrow group_by — the combiner, so
only unique rows per batch enter the exchange), then ONE groupby over
all columns resolves global membership. INTERSECT/EXCEPT tag the two
sides with a bit mask and aggregate it per row-group: intersect keeps
rows seen on both sides (mask == 3), except keeps rows seen only on
the left (mask == 1) — SQL INTERSECT/EXCEPT DISTINCT semantics, which
is what SQL's unqualified INTERSECT/EXCEPT mean.

The reference engine has no set operators (encode/decode only); these
extend the relational surface like the join family does.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _batch_distinct(batch: pa.Table) -> pa.Table:
    if batch.num_rows == 0:
        return batch
    return batch.group_by(batch.column_names, use_threads=False).aggregate([])


def distinct(ds):
    """SELECT DISTINCT *: per-batch distinct combiner, then one
    groupby over all columns emits each row once."""
    cols = ds.schema().names

    def first(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    from .nullkeys import null_safe_group_map

    return null_safe_group_map(
        ds.map_batches(_batch_distinct, batch_format="pyarrow", zero_copy_batch=True),
        cols,
        first,
    )


def _tagged_setop(left, right, keep_masks: tuple[int, ...]):
    cols = left.schema().names
    if right.schema().names != cols:
        raise ValueError("set operations require identical schemas")

    def tag(side: int):
        def f(batch: pa.Table) -> pa.Table:
            d = _batch_distinct(batch)
            return d.append_column("__side", pa.array(np.full(d.num_rows, side, dtype=np.int64)))

        return f

    both = left.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True).union(
        right.map_batches(tag(2), batch_format="pyarrow", zero_copy_batch=True)
    )

    def resolve(group: pa.Table) -> pa.Table:
        mask = int(np.bitwise_or.reduce(group.column("__side").to_numpy(zero_copy_only=False)))
        if mask in keep_masks:
            return group.slice(0, 1).drop_columns(["__side"])
        return group.schema.empty_table().drop_columns(["__side"])

    from .nullkeys import null_safe_group_map

    return null_safe_group_map(both, cols, resolve)


def _counted_setop(left, right, kind: str):
    """Bag-semantics INTERSECT ALL / EXCEPT ALL.

    Per-batch combiner: group the batch's rows and count multiplicity,
    so only (unique-row, count) pairs enter the exchange regardless of
    how many duplicates a batch holds. One groupby over all columns
    then sums per-side multiplicities l and r; each row is emitted
    min(l, r) times (INTERSECT ALL) or max(l - r, 0) times (EXCEPT
    ALL) — exactly SQL's bag semantics.
    """
    cols = left.schema().names
    if right.schema().names != cols:
        raise ValueError("set operations require identical schemas")

    def count_side(side: str):
        other = "__rc" if side == "__lc" else "__lc"

        def f(batch: pa.Table) -> pa.Table:
            g = batch.group_by(batch.column_names, use_threads=False).aggregate(
                [([], "count_all")]
            )
            g = g.rename_columns([*batch.column_names, side])
            return g.append_column(
                other, pa.array(np.zeros(g.num_rows, dtype=np.int64))
            )

        return f

    both = left.map_batches(
        count_side("__lc"), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        right.map_batches(count_side("__rc"), batch_format="pyarrow", zero_copy_batch=True)
    )

    def resolve(group: pa.Table) -> pa.Table:
        l = int(np.sum(group.column("__lc").to_numpy(zero_copy_only=False)))
        r = int(np.sum(group.column("__rc").to_numpy(zero_copy_only=False)))
        k = min(l, r) if kind == "intersect" else max(l - r, 0)
        payload = group.drop_columns(["__lc", "__rc"])
        if k == 0:
            return payload.schema.empty_table()
        return payload.take(np.zeros(k, dtype=np.int64))

    from .nullkeys import null_safe_group_map

    return null_safe_group_map(both, cols, resolve)


def intersect(left, right):
    """SQL INTERSECT (distinct rows present on BOTH sides)."""
    return _tagged_setop(left, right, (3,))


def intersect_all(left, right):
    """SQL INTERSECT ALL: each row min(left-count, right-count) times."""
    return _counted_setop(left, right, "intersect")


def except_all(left, right):
    """SQL EXCEPT ALL: each row max(left-count - right-count, 0) times."""
    return _counted_setop(left, right, "except")


def except_(left, right):
    """SQL EXCEPT (distinct left rows absent from right)."""
    return _tagged_setop(left, right, (1,))


def union_distinct(left, right):
    """SQL UNION (as opposed to UNION ALL)."""
    return distinct(left.union(right))


def diff_summary(left, right) -> pa.Table:
    """Snapshot diff in ONE tagged exchange: how many DISTINCT whole
    rows exist only_left / only_right / in both. The two sides tag
    with 1 (left) / 2 (right), per-batch DISTINCT combines, and one
    groupby over all columns takes MIN and MAX of the tag — (1,1) =
    left only, (2,2) = right only, (1,2) = both — which is exact even
    when a row repeats within a side (sum would double-count; min/max
    cannot). Counts reduce from the per-group masks; rows never reach
    the driver. The audit primitive behind "what changed between two
    dataset versions" (versions.py snapshots, re-crawled corpora,
    repaired partitions)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min

    def tag(mask: int):
        def fn(batch: pa.Table) -> pa.Table:
            d = _batch_distinct(batch)
            return d.append_column("__mask", pa.array(np.full(d.num_rows, mask, np.int64)))

        return fn

    both = left.map_batches(tag(1), batch_format="pyarrow", zero_copy_batch=True).union(
        right.map_batches(tag(2), batch_format="pyarrow", zero_copy_batch=True)
    )
    cols = [c for c in both.schema().names if c != "__mask"]
    # group on NULL-SAFE surrogate keys (nullkeys contract): any data
    # column may hold nulls, and Ray's sort-based groupby cannot order
    # a nullable key; only the (surrogates, mask) width shuffles
    from .nullkeys import _surrogate_names, append_surrogates

    surr = _surrogate_names(len(cols))

    def to_surrogates(batch: pa.Table) -> pa.Table:
        return append_surrogates(batch, cols).select(surr + ["__mask"])

    keyed = both.map_batches(to_surrogates, batch_format="pyarrow", zero_copy_batch=True)
    merged = keyed.groupby(surr).aggregate(Min("__mask"), Max("__mask"))

    def count_masks(t: pa.Table) -> pa.Table:
        lo = t.column("min(__mask)")
        hi = t.column("max(__mask)")
        def n(cond):
            return pa.array([pc.sum(pc.cast(cond, pa.int64())).as_py() or 0], pa.int64())
        return pa.table(
            {
                "only_left": n(pc.and_(pc.equal(lo, 1), pc.equal(hi, 1))),
                "only_right": n(pc.equal(lo, 2)),
                "in_both": n(pc.and_(pc.equal(lo, 1), pc.equal(hi, 2))),
            }
        )

    parts = merged.map_batches(count_masks, batch_format="pyarrow", zero_copy_batch=True)
    return pa.table(
        {
            "only_left": pa.array([int(parts.sum("only_left") or 0)], pa.int64()),
            "only_right": pa.array([int(parts.sum("only_right") or 0)], pa.int64()),
            "in_both": pa.array([int(parts.sum("in_both") or 0)], pa.int64()),
        }
    )


def keyed_diff(left, right, key_col: str, content_cols: list[str]) -> pa.Table:
    """Keyed snapshot diff (the SCD audit): classify every key as
    added (right only), removed (left only), changed (both sides,
    content differs) or unchanged. Keys must be unique per side (the
    primary-key contract; duplicate keys raise). Content equality is
    via the 128-bit content hash of the concatenated content columns
    (collision odds ~2^-128 — bitwise-equal in practice, and the SQL
    oracle compares the raw columns). One summary row out, all int64.

    Scale: each side ships only (key, h1, h2) — one tagged exchange,
    one groupby over keys; content never moves."""
    import pyarrow.compute as pc

    from .dedup import content_hash_batch

    def prep(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            ok = pc.is_valid(batch.column(key_col))
            t = batch.filter(ok)
            joined = t.column(content_cols[0]).cast(pa.large_string())
            for c in content_cols[1:]:
                joined = pc.binary_join_element_wise(
                    joined, t.column(c).cast(pa.large_string()), "\x1f",
                    null_handling="replace", null_replacement="\x00",
                )
            joined = pc.fill_null(joined, "\x00")
            h = content_hash_batch(pa.table({"text": joined}), "text")
            return pa.table(
                {
                    "k": t.column(key_col),
                    "side": pa.array(np.full(t.num_rows, side, np.int64)),
                    "h1": h.column("h1"),
                    "h2": h.column("h2"),
                }
            )

        return fn

    both = left.map_batches(prep(1), batch_format="pyarrow", zero_copy_batch=True).union(
        right.map_batches(prep(2), batch_format="pyarrow", zero_copy_batch=True)
    )

    def classify(group: pa.Table) -> pa.Table:
        sides = group.column("side").to_numpy(zero_copy_only=False)
        if len(sides) > 2 or (len(sides) == 2 and sides[0] == sides[1]):
            raise ValueError(
                f"keyed_diff: duplicate key within one side ({group.column('k')[0]})"
            )
        out = {"added": 0, "removed": 0, "changed": 0, "unchanged": 0}
        if len(sides) == 1:
            out["added" if sides[0] == 2 else "removed"] = 1
        else:
            h1 = group.column("h1").to_numpy(zero_copy_only=False)
            h2 = group.column("h2").to_numpy(zero_copy_only=False)
            same = h1[0] == h1[1] and h2[0] == h2[1]
            out["unchanged" if same else "changed"] = 1
        return pa.table({c: pa.array([v], pa.int64()) for c, v in out.items()})

    from .nullkeys import null_safe_group_map

    per_key = null_safe_group_map(both, ["k"], classify)
    return pa.table(
        {
            c: pa.array([int(per_key.sum(c) or 0)], pa.int64())
            for c in ["added", "removed", "changed", "unchanged"]
        }
    )


def union_evolve(datasets):
    """UNION ALL BY NAME with schema evolution: aligns every input's
    columns by NAME into the union schema — missing columns null-fill,
    integer widths widen to int64, float32 widens to float64,
    otherwise types must agree (raise on conflict; no silent string
    coercion). The ingestion primitive for heterogeneous parquet drops
    (re-crawled corpora adding columns, renamed exports).

    Scale: pure per-batch cast/null-fill map — no shuffle, no
    materialization; the union stays streaming."""
    import pyarrow.compute as pc  # noqa: F401
    import ray.data  # noqa: F401

    schemas = [ds.schema() for ds in datasets]
    merged: dict[str, pa.DataType] = {}
    for sch in schemas:
        for name, typ in zip(sch.names, sch.types):
            if pa.types.is_integer(typ):
                typ = pa.int64()
            elif pa.types.is_floating(typ):
                typ = pa.float64()
            if name not in merged:
                merged[name] = typ
            elif merged[name] != typ:
                raise TypeError(
                    f"union_evolve: column {name!r} has conflicting types "
                    f"{merged[name]} vs {typ}"
                )
    names = list(merged)

    def align(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {}
        for name in names:
            if name in batch.column_names:
                cols[name] = batch.column(name).cast(merged[name])
            else:
                cols[name] = pa.nulls(n, merged[name])
        return pa.table(cols)

    out = datasets[0].map_batches(align, batch_format="pyarrow", zero_copy_batch=True)
    for ds in datasets[1:]:
        out = out.union(
            ds.map_batches(align, batch_format="pyarrow", zero_copy_batch=True)
        )
    return out


def melt(ds, id_cols: list[str], value_cols: list[str],
         name_col: str = "metric", value_col: str = "value"):
    """UNPIVOT / melt: turn each row's value_cols into len(value_cols)
    output rows (id_cols..., name_col, value_col). Every value column
    is cast to float64 (the common UNPIVOT supertype here); nulls are
    kept — SQL UNPIVOT ... INCLUDE NULLS semantics — so row counts are
    exactly n_rows * len(value_cols).

    Embarrassingly parallel: one zero-copy map_batches, no exchange.
    The id columns are repeated via Arrow take (no Python loop)."""
    import pyarrow.compute as pc

    cols = list(value_cols)

    def unfold(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        k = len(cols)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
        out: dict = {}
        for c in id_cols:
            out[c] = batch.column(c).take(idx)
        out[name_col] = pa.array(np.tile(np.array(cols, dtype=object), n), pa.string())
        vals = [
            pc.cast(batch.column(c), pa.float64()).to_numpy(zero_copy_only=False)
            for c in cols
        ]
        stacked = np.empty(n * k, np.float64)
        for j, v in enumerate(vals):
            stacked[j::k] = v
        mask = np.zeros(n * k, bool)
        for j, c in enumerate(cols):
            nulls = pc.is_null(batch.column(c)).to_numpy(zero_copy_only=False)
            mask[j::k] = nulls
        out[value_col] = pa.array(stacked, pa.float64(), mask=mask)
        return pa.table(out)

    return ds.map_batches(unfold, batch_format="pyarrow", zero_copy_batch=True)


def relational_division(ds, key_col: str, attr_col: str):
    """Relational division ("FOR ALL"): keys that carry EVERY distinct
    value of attr_col present in the corpus. Distinct (key, attr)
    pairs reduce inside each batch before the one groupby(key)
    exchange; the divisor cardinality comes from a tiny attr-domain
    aggregate broadcast as a closure constant. Output (key, n_attrs)
    for qualifying keys only — exact integers."""
    import pyarrow.compute as pc

    from .nullkeys import null_safe_group_map

    def pairs(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.and_(
                pc.is_valid(batch.column(attr_col)),
                pc.is_valid(batch.column(key_col)),
            )
        ).select([key_col, attr_col])
        return t.group_by([key_col, attr_col], use_threads=False).aggregate([])

    dp = ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)

    def attr_partial(batch: pa.Table) -> pa.Table:
        return pa.table({attr_col: batch.column(attr_col)}).group_by(
            [attr_col], use_threads=False
        ).aggregate([])

    k_total = (
        dp.map_batches(attr_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(attr_col)
        .count()
        .count()
    )

    def per_key(g: pa.Table) -> pa.Table:
        import pyarrow as _pa

        n = len(
            g.column(attr_col)
            .combine_chunks()
            .unique()
        )
        if n != k_total:
            return pa.table(
                {
                    key_col: g.column(key_col).slice(0, 0),
                    "n_attrs": _pa.array([], _pa.int64()),
                }
            )
        return pa.table(
            {
                key_col: g.column(key_col).slice(0, 1),
                "n_attrs": _pa.array([n], _pa.int64()),
            }
        )

    return null_safe_group_map(dp, [key_col], per_key)
