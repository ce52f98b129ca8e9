"""Joins for training-data pipelines (metadata enrichment).

The reference has no joins (SURVEY.md §2.9); these follow the ray
guide's two patterns:

* broadcast_join — small side is `ray.put` ONCE as an Arrow table,
  gathered per task (zero-copy from the object store), joined per
  batch with Arrow's native hash join (Acero). No shuffle; the
  default for dimension tables / vocab / blocklists.
* partitioned_join — both sides large: Ray Data's hash-shuffle join
  (Dataset.join). Partition count is derived from the input size
  (target ~256 MB per partition) so per-task memory stays bounded at
  any corpus scale instead of a fixed bucket count; skewed keys can
  be salted upstream with add_host_bucket-style fanout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_JOIN_TYPES = {
    "inner": "inner",
    "left": "left_outer",
    "right": "right_outer",
    "outer": "full_outer",
    "left_outer": "left_outer",
    "right_outer": "right_outer",
    "full_outer": "full_outer",
    "left_semi": "left_semi",
    "left_anti": "left_anti",
    "right_semi": "right_semi",
    "right_anti": "right_anti",
}

_TARGET_PARTITION_BYTES = 256 << 20


def _ts_us_int64(col):
    """Timestamp column → int64 MICROSECONDS as numpy (nulls become NaN
    via float promotion — callers mask them). A bare cast(int64) keeps
    the column's own unit, silently making tolerance/offset parameters
    (specified in µs) wrong by 1000x on ms/s-unit data."""
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    t = col.type
    if pa.types.is_timestamp(t) and t.unit != "us":
        col = col.cast(pa.timestamp("us", tz=t.tz) if t.tz else pa.timestamp("us"))
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False)


def _metadata_size_bytes(ds) -> int | None:
    """Size from plan METADATA only — ds.size_bytes() silently EXECUTES
    a lazy pipeline when metadata is missing (Ray 2.49 falls back to
    plan.execute()), which would materialize an entire filtered probe
    side just to pick a partition count. Objects without a plan (tests,
    plain tables) keep their cheap size_bytes()."""
    plan = getattr(ds, "_plan", None)
    if plan is None:
        try:
            return ds.size_bytes()
        except Exception:
            return None
    try:
        return plan.infer_metadata().size_bytes  # None for transformed datasets
    except Exception:
        return None


def _auto_partitions(*datasets, target_bytes: int = _TARGET_PARTITION_BYTES) -> int:
    """Partition count from METADATA sizes of both sides so one join
    partition holds ~target_bytes — scales with the data instead of a
    fixed constant that would put ~N/32 bytes in one task at corpus
    scale. Sides whose size is unknown without executing (post-map
    datasets) size to the CLUSTER instead of forcing a materialization.
    The count is capped at ~2x cluster CPUs: Ray's hash-shuffle join
    spawns per-partition aggregators and measurably DEADLOCKS when
    partitions far exceed available CPUs (16 partitions hang a 4-cpu
    cluster; 8 run fine), so the cap tracks the cluster, not a
    constant."""
    import ray as ray_api

    ncpu = 16
    try:
        # never auto-init Ray from a sizing heuristic
        if ray_api.is_initialized():
            ncpu = int(ray_api.cluster_resources().get("CPU", 16))
    except Exception:
        pass
    cap = min(max(2 * ncpu, 2), 4096)
    total = 0
    unknown = False
    for ds in datasets:
        s = _metadata_size_bytes(ds)
        if s:
            total += s
        else:
            unknown = True
    if not total:
        return min(max(ncpu, 2), cap)
    n = total // target_bytes + 1
    if unknown:  # partial information: at least one partition per CPU
        n = max(n, ncpu)
    return int(min(max(n, 2), cap))


# Join types that are sound when evaluated independently per batch
# against the full broadcast side: each LEFT row is seen exactly once,
# so inner/left/left_semi/left_anti compose across batches. Right/full
# variants would emit unmatched SMALL-side rows once per batch
# (duplicates) — those must go through partitioned_join.
_BROADCAST_SOUND = {"inner", "left_outer", "left_semi", "left_anti"}


def broadcast_join(ds, small: pa.Table, on: str, how: str = "inner"):
    """Join a Dataset against a small in-memory table (broadcast once
    via ray.put; per-batch Arrow-native hash join, no pandas hop).

    Only per-batch-sound join types are accepted (inner/left/
    left_semi/left_anti); right/full-outer would duplicate unmatched
    small-side rows per batch — use partitioned_join for those."""
    import ray

    join_type = _JOIN_TYPES.get(how, how)
    if join_type not in _BROADCAST_SOUND:
        raise ValueError(
            f"broadcast_join cannot evaluate {how!r} per batch (unmatched "
            "small-side rows would be emitted once per batch); use "
            "partitioned_join for right/full outer/semi/anti variants"
        )
    small_ref = ray.put(small)
    # pyarrow.Table.join spells types with spaces ("left outer"),
    # Ray's Dataset.join with underscores ("left_outer")
    pa_join_type = join_type.replace("_", " ")

    def merge(batch: pa.Table) -> pa.Table:
        right = ray.get(small_ref)
        return batch.join(right, keys=on, join_type=pa_join_type)

    return ds.map_batches(merge, batch_format="pyarrow", zero_copy_batch=True)


def cross_join(ds, small: pa.Table, max_small_rows: int = 100_000):
    """CROSS JOIN a Dataset against a small in-memory table: the small
    side broadcasts once via ray.put; per batch the cartesian product
    is two vectorized takes (batch rows repeated, small rows tiled) —
    no shuffle. Output columns: batch columns then small columns
    (duplicate names rejected). The result has |ds| x |small| rows by
    definition — `max_small_rows` guards an accidental big-side
    argument (a large x large cartesian product is a modeling error on
    any engine)."""
    import ray

    if small.num_rows > max_small_rows:
        raise ValueError(
            f"cross_join small side has {small.num_rows} rows "
            f"(max_small_rows={max_small_rows}); the output is |ds| x |small|"
        )
    # fail fast at the call site, not as a deep RayTaskError per batch
    dup = set(ds.schema().names) & set(small.column_names)
    if dup:
        raise ValueError(f"cross_join duplicate column names: {sorted(dup)}")
    small_ref = ray.put(small.combine_chunks())

    def merge(batch: pa.Table) -> pa.Table:
        import numpy as np

        right = ray.get(small_ref)
        n, m = batch.num_rows, right.num_rows
        left_idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), m))
        right_idx = pa.array(np.tile(np.arange(m, dtype=np.int64), n))
        out = batch.take(left_idx)
        rt = right.take(right_idx)
        for name in right.column_names:
            out = out.append_column(name, rt.column(name))
        return out

    return ds.map_batches(merge, batch_format="pyarrow", zero_copy_batch=True)


_BROADCAST_ROUTE_BYTES = 64 << 20


def _collect_table(mat, schema=None) -> pa.Table | None:
    """MaterializedDataset -> one in-memory pa.Table. Blocks that lost
    their schema (Ray represents an all-filtered-out block as a
    zero-column table) are dropped; if NOTHING carries a schema, fall
    back to the dataset-level schema, else None."""
    import ray as ray_api

    tables = [t for t in ray_api.get(mat.to_arrow_refs()) if t.num_columns]
    if tables:
        return pa.concat_tables(tables, promote_options="default").combine_chunks()
    if schema is None:
        try:
            schema = mat.schema().base_schema
        except Exception:
            schema = None
    if schema is not None and len(schema.names):
        return pa.table({f.name: pa.nulls(0, f.type) for f in schema})
    return None


def partitioned_join(
    left,
    right,
    on: str,
    num_buckets: int | None = None,
    how: str = "inner",
    broadcast_bytes: int = _BROADCAST_ROUTE_BYTES,
):
    """Large x large: Ray Data hash-shuffle join. `num_buckets` (kept
    for API compatibility; now = join partitions) defaults to a
    size-derived count targeting ~256 MB per partition.

    SMALL-SIDE AUTO-ROUTING: when the join type is per-batch sound
    (inner / left / left_semi / left_anti) and the right side proves
    small (metadata size, or exact size after a one-time materialize
    when metadata can't know — e.g. a filtered dimension behind
    map_batches), the join takes the BROADCAST path instead: the
    probe side never shuffles, and Ray's hash-join aggregator bug
    with sparse builds is bypassed entirely (a partition that
    receives ZERO blocks of one side builds a schema-less empty
    table and pa.Table.join then dies with 'No match for key field' —
    exactly what a 16-partition join over an 8-row dimension hits).
    When the right side is genuinely large, the materialized copy
    feeds the hash join directly (its blocks are reused, not
    recomputed; the build side is fully held by aggregators either
    way). Callers convention: put the SMALLER side on the right;
    pass broadcast_bytes=0 to force the shuffle path."""
    join_type = _JOIN_TYPES.get(how, how)
    if broadcast_bytes and join_type in _BROADCAST_SOUND:
        est = _metadata_size_bytes(right)
        mat = None
        if est is None:
            mat = right.materialize()
            est = mat.size_bytes() or 0
        if est <= broadcast_bytes:
            tbl = _collect_table(mat if mat is not None else right.materialize())
            if tbl is not None:
                return broadcast_join(left, tbl, on=on, how=join_type)
            # schema-less EMPTY right: nothing can match
            if join_type in ("left_anti", "left_outer"):
                return left  # left_outer: no right columns exist to null-pad
            return left.limit(0)
        if mat is not None:
            right = mat
    n = num_buckets or _auto_partitions(left, right)
    return left.join(
        right,
        join_type=join_type,
        num_partitions=n,
        on=(on,),
    )


def skew_join(
    left,
    right,
    on: str,
    how: str = "inner",
    hot_threshold: float = 0.01,
    hot_key_cap: int = 1024,
    num_partitions: int | None = None,
):
    """Skew-aware large x large join: HOT keys (left-side frequency >=
    `hot_threshold` as a fraction of rows, or an absolute count when
    >= 1) take a BROADCAST path — their right rows ship once via
    ray.put and join per batch with no exchange — while the cold tail
    runs the normal hash-shuffle join. A single hot key (a null-like
    sentinel, a default user id, an empty-string URL host) otherwise
    lands every one of its rows in ONE shuffle partition and that task
    becomes the straggler; here hot rows never enter the exchange at
    all. Results are identical to a plain join (keys partition rows
    disjointly; per-key join output is path-independent), which is the
    driver query's oracle.

    Assumption the split relies on: the RIGHT rows of hot keys fit in
    memory (hot_key_cap x rows-per-key) — the classic fact x dimension
    shape. how: inner | left | left_semi | left_anti (null left keys
    follow the cold path and get plain-join null semantics)."""
    import ray

    import pyarrow.compute as pc

    join_type = _JOIN_TYPES.get(how, how)
    if join_type not in ("inner", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"skew_join supports inner/left/left_semi/left_anti, got {how!r}")

    l_names = list(left.schema().names)
    r_schema = right.schema()
    dup = (set(l_names) & set(r_schema.names)) - {on}
    if dup:
        raise ValueError(f"skew_join requires disjoint value columns, collisions: {sorted(dup)}")
    out_names = l_names if join_type in ("left_semi", "left_anti") else (
        l_names + [c for c in r_schema.names if c != on]
    )

    # both inputs execute their lazy plan ONCE; the frequency pass, the
    # hot/cold filters and the shuffle all read the cached blocks (an
    # unmaterialized left would re-run its whole upstream plan 3x)
    left = left.materialize()
    right = right.materialize()
    # exact left-key frequencies (combiner-reduced exchange of distinct
    # keys), hottest first, bounded by the cap; total derives from the
    # counts aggregate — no extra pass over left
    counts = left.groupby(on).count().materialize()
    total = counts.sum("count()") or 0
    thresh = hot_threshold if hot_threshold >= 1 else max(int(total * hot_threshold), 2)
    top = counts.sort("count()", descending=True).limit(hot_key_cap).take_all()
    hot = [r[on] for r in top if r[on] is not None and r["count()"] >= thresh]
    align = lambda t: t.select(out_names)  # noqa: E731
    if not hot:  # no skew: plain hash-shuffle join
        cold = _rename_join(left, right, on, join_type, num_partitions)
        return cold.map_batches(align, batch_format="pyarrow")
    hot_arr = pa.array(hot)

    def _in_hot(t: pa.Table, invert: bool) -> pa.Table:
        m = pc.fill_null(pc.is_in(t.column(on), value_set=hot_arr), False)
        return t.filter(pc.invert(m) if invert else m)

    left_hot = left.map_batches(lambda t: _in_hot(t, False), batch_format="pyarrow")
    left_cold = left.map_batches(
        lambda t: _in_hot(t, True), batch_format="pyarrow"
    ).materialize()
    right_cold = right.map_batches(
        lambda t: _in_hot(t, True), batch_format="pyarrow"
    ).materialize()
    # the hot slice of the build side materializes once and broadcasts
    hot_right_tbls = ray.get(
        right.map_batches(lambda t: _in_hot(t, False), batch_format="pyarrow").to_arrow_refs()
    )
    hot_right_tbls = [t for t in hot_right_tbls if t.num_rows]
    if hot_right_tbls:
        hot_right = pa.concat_tables(hot_right_tbls).combine_chunks()
    else:  # hot left keys absent from the build side entirely
        hot_right = pa.table(
            {c: pa.array([], type=t) for c, t in zip(r_schema.names, r_schema.types)}
        )
    hot_joined = broadcast_join(left_hot, hot_right, on=on, how=join_type).map_batches(
        align, batch_format="pyarrow"
    )
    # empty-slice short circuits: Ray's hash-shuffle join cannot
    # finalize schema-less empty partitions (same guard as the dedup
    # anti-join), and an all-hot key domain is this op's headline case
    if left_cold.count() == 0:
        return hot_joined
    if right_cold.count() == 0:
        if join_type in ("inner", "left_semi"):
            return hot_joined  # cold rows cannot match anything
        if join_type == "left_anti":
            return hot_joined.union(left_cold.map_batches(align, batch_format="pyarrow"))
        # left_outer: cold rows survive with null right columns
        def null_right(t: pa.Table) -> pa.Table:
            for c, typ in zip(r_schema.names, r_schema.types):
                if c != on:
                    t = t.append_column(c, pa.nulls(t.num_rows, type=typ))
            return t.select(out_names)

        return hot_joined.union(
            left_cold.map_batches(null_right, batch_format="pyarrow")
        )
    cold_joined = _rename_join(left_cold, right_cold, on, join_type, num_partitions)
    return hot_joined.union(cold_joined.map_batches(align, batch_format="pyarrow"))


def _rename_join(left, right, on: str, join_type: str, num_partitions: int | None):
    """Dataset.join with the right key renamed away (Ray's join keeps
    both key columns; same-name keys collide)."""
    n = num_partitions or _auto_partitions(left, right)
    rk = "__rk_" + on

    def ren(t: pa.Table) -> pa.Table:
        return t.rename_columns([rk if c == on else c for c in t.column_names])

    out = left.join(
        right.map_batches(ren, batch_format="pyarrow"),
        join_type=join_type,
        num_partitions=n,
        on=(on,),
        right_on=(rk,),
    )
    if join_type in ("left_semi", "left_anti"):
        return out
    return out.map_batches(
        lambda t: t.drop_columns([rk]) if rk in t.column_names else t,
        batch_format="pyarrow",
    )


def asof_join(
    left,
    right,
    by: str,
    on: str = "ts",
    right_columns: list[str] | None = None,
    tolerance_us: int | None = None,
):
    """AS-OF join (event-time enrichment): for each left row, attach
    the LATEST right row with right.on <= left.on within the same `by`
    key (backward direction — DuckDB `ASOF LEFT JOIN` semantics, so the
    op carries an exact SQL oracle). Left rows with no prior right row
    keep nulls. `tolerance_us` optionally rejects matches older than
    the given gap.

    Ray Data has no as-of join; per the brief this is built as a
    composition: tag sides -> one groupby(by) exchange -> per-key
    vectorized merge (sort both sides by `on`, one searchsorted). The
    partitioning assumption it relies on: one key's rows fit in one
    task (same contract as session windows; salt/split hot keys
    upstream if a single key exceeds memory).

    Output columns: all left columns + right_columns (default: every
    right column except `by`/`on`) suffixed '_right' on collision.
    """
    import numpy as np
    import pyarrow.compute as pc

    r_schema = right.schema()
    r_cols = right_columns or [c for c in r_schema.names if c not in (by, on)]
    l_schema = left.schema()
    l_names = list(l_schema.names)
    out_r_names = [c + "_right" if c in l_names else c for c in r_cols]

    # union-compatible frame: left columns + right value columns + side.
    # DEDUP'd like range_join: a right value column sharing a left name
    # rides in the left-named slot (null on left rows), else the frame
    # would carry a duplicate field and every select/column call raises
    all_names = l_names + [c for c in r_cols if c not in l_names]
    types = {n: t for n, t in zip(l_schema.names, l_schema.types)}
    for n, t in zip(r_schema.names, r_schema.types):
        types.setdefault(n, t)

    def widen(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            nrows = batch.num_rows
            arrays = [
                batch.column(c) if c in batch.column_names else pa.nulls(nrows, type=types[c])
                for c in all_names
            ]
            arrays.append(pa.array(np.full(nrows, side, dtype=np.int8)))
            return pa.table(arrays, names=all_names + ["__side"])

        return fn

    def drop_null_keys(batch: pa.Table) -> pa.Table:
        # SQL join semantics: a null `by` key never matches — right
        # rows with null keys are dead weight, and filtering them means
        # the null group (shuffled null-safely) holds only left rows,
        # which the merge then emits unmatched, exactly as ASOF LEFT
        import pyarrow.compute as _pc

        return batch.filter(_pc.is_valid(batch.column(by)))

    tagged = left.map_batches(widen(0), batch_format="pyarrow", zero_copy_batch=True).union(
        right.map_batches(widen(1), batch_format="pyarrow", zero_copy_batch=True).map_batches(
            drop_null_keys, batch_format="pyarrow"
        )
    )

    def merge(group: pa.Table) -> pa.Table:
        side = group.column("__side").to_numpy(zero_copy_only=False)
        ts = _ts_us_int64(group.column(on))
        # nulls surface as NaN (float promotion): a NaN left ts must be
        # UNMATCHED (DuckDB ASOF leaves it null — searchsorted would
        # otherwise pair it with the max-ts right row), and NaN right
        # rows must never be match candidates
        nan = np.isnan(ts) if ts.dtype.kind == "f" else np.zeros(len(ts), dtype=bool)
        l_idx = np.nonzero(side == 0)[0]
        r_idx = np.nonzero((side == 1) & ~nan)[0]
        l_tbl = group.take(pa.array(l_idx)).select(l_names)
        if len(r_idx) == 0:
            return pa.table(
                list(l_tbl.columns)
                + [pa.nulls(len(l_idx), type=types[c]) for c in r_cols],
                names=l_names + out_r_names,
            )
        r_ts = ts[r_idx]
        r_order = np.argsort(r_ts, kind="stable")
        r_ts_sorted = r_ts[r_order]
        # latest right position with r_ts <= l_ts (argsort is stable, so
        # ties at the same timestamp resolve to the LAST right row in
        # input order — mirror DuckDB by making the match unique upstream)
        pos = np.searchsorted(r_ts_sorted, ts[l_idx], side="right") - 1
        matched = (pos >= 0) & ~nan[l_idx]
        if tolerance_us is not None:
            gap = ts[l_idx] - r_ts_sorted[np.maximum(pos, 0)]
            matched &= gap <= tolerance_us
        # unmatched rows take index 0 (any valid position) and are
        # nulled by the mask below — Arrow take rejects negatives
        take_idx = r_idx[r_order][np.maximum(pos, 0)]
        r_sorted = group.take(pa.array(take_idx, type=pa.int64()))
        out_cols = list(l_tbl.columns)
        valid = pa.array(matched)
        for c in r_cols:
            col = r_sorted.column(c).combine_chunks()
            out_cols.append(pc.if_else(valid, col, pa.nulls(len(l_idx), type=types[c])))
        return pa.table(out_cols, names=l_names + out_r_names)

    from .nullkeys import null_safe_group_map

    return null_safe_group_map(tagged, [by], merge)


def range_join(
    left,
    right,
    by: str,
    on: str = "ts",
    lo_offset_us: int = 0,
    hi_offset_us: int = 0,
    right_columns: list[str] | None = None,
):
    """RANGE join: emit a row for every (left, right) pair with the
    same `by` key and right.on in [left.on + lo_offset, left.on +
    hi_offset] (e.g. "purchases in the hour before each click":
    lo=-3600e6, hi=0). Exactly a SQL inequality join, so it carries a
    DuckDB oracle.

    Scale shape: rows are BINNED by time (bin width = window span) so
    only same-bin/adjacent-bin rows ever meet — each left row lands in
    at most two bins, right rows in one, and the exchange key is
    (by, bin), which also spreads one hot `by` key's rows over time
    bins. Inside a bucket the pair generation is vectorized
    (sort + searchsorted + segmented ranges). Output size is the true
    match count; pick the window so per-bucket matches stay bounded.
    """
    import numpy as np
    import pyarrow.compute as pc

    span = int(hi_offset_us - lo_offset_us)
    if span < 0:
        raise ValueError("hi_offset_us must be >= lo_offset_us")
    w = max(span, 1)

    r_schema = right.schema()
    r_cols = right_columns or [c for c in r_schema.names if c != by]
    l_schema = left.schema()
    l_names = list(l_schema.names)
    out_r_names = [c + "_right" if c in l_names else c for c in r_cols]
    all_names = l_names + [c for c in r_cols if c not in l_names]
    types = {n: t for n, t in zip(l_schema.names, l_schema.types)}
    for n, t in zip(r_schema.names, r_schema.types):
        types.setdefault(n, t)

    def widen(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            ts = _ts_us_int64(batch.column(on))
            if ts.dtype.kind == "f":  # null ts: SQL inequality never
                # matches NULL — drop the rows (also guards the int bin
                # math below against NaN)
                ok = ~np.isnan(ts)
                batch = batch.filter(pa.array(ok))
                ts = ts[ok].astype(np.int64)
            nrows = batch.num_rows
            cols = {
                c: (batch.column(c) if c in batch.column_names else pa.nulls(nrows, type=types[c]))
                for c in all_names
            }
            if side == 0:
                # left: replicate into the (<=2) bins its window spans
                b0 = (ts + lo_offset_us) // w
                b1 = (ts + hi_offset_us) // w
                reps = (b1 != b0).astype(np.int64) + 1
                idx = np.repeat(np.arange(nrows, dtype=np.int64), reps)
                bins = np.concatenate([b0[:, None], b1[:, None]], axis=1).ravel()
                keep = np.ones(2 * nrows, dtype=bool)
                keep[1::2] = b1 != b0
                bins = bins[keep]
                t = pa.table(
                    {c: a.take(pa.array(idx)) for c, a in cols.items()}
                )
            else:
                bins = ts // w
                t = pa.table(cols)
            t = t.append_column("__bin", pa.array(bins.astype(np.int64)))
            return t.append_column(
                "__side", pa.array(np.full(t.num_rows, side, dtype=np.int8))
            )

        return fn

    def drop_null_keys(batch: pa.Table) -> pa.Table:
        # inner-style pair emission: a null `by` key can never pair
        # (SQL inequality-join semantics), so drop null-key rows from
        # BOTH sides before the shuffle
        import pyarrow.compute as _pc

        return batch.filter(_pc.is_valid(batch.column(by)))

    tagged = (
        left.map_batches(widen(0), batch_format="pyarrow", zero_copy_batch=True)
        .union(right.map_batches(widen(1), batch_format="pyarrow", zero_copy_batch=True))
        .map_batches(drop_null_keys, batch_format="pyarrow")
    )

    def merge(group: pa.Table) -> pa.Table:
        side = group.column("__side").to_numpy(zero_copy_only=False)
        ts = _ts_us_int64(group.column(on))
        l_idx = np.nonzero(side == 0)[0]
        r_idx = np.nonzero(side == 1)[0]
        empty = pa.table(
            [pa.chunked_array([[]], type=types[c]) for c in l_names]
            + [pa.chunked_array([[]], type=types[c]) for c in r_cols],
            names=l_names + out_r_names,
        )
        if len(l_idx) == 0 or len(r_idx) == 0:
            return empty
        r_order = r_idx[np.argsort(ts[r_idx], kind="stable")]
        r_ts = ts[r_order]
        lo = np.searchsorted(r_ts, ts[l_idx] + lo_offset_us, side="left")
        hi = np.searchsorted(r_ts, ts[l_idx] + hi_offset_us, side="right")
        # guard against double-counting ACROSS the two bins a left row
        # was replicated into: inside this bucket, only right rows whose
        # bin == this bucket's bin exist, so pairs are naturally unique
        cnt = hi - lo
        m = cnt > 0
        if not m.any():
            return empty
        l_take = np.repeat(l_idx[m], cnt[m])
        starts = lo[m]
        # segmented ranges: right positions for each left row
        total = int(cnt[m].sum())
        seg = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(cnt[m])[:-1])), cnt[m]
        )
        r_take = r_order[np.repeat(starts, cnt[m]) + seg]
        l_tbl = group.take(pa.array(l_take)).select(l_names)
        r_tbl = group.take(pa.array(r_take)).select(r_cols)
        return pa.table(list(l_tbl.columns) + list(r_tbl.columns), names=l_names + out_r_names)

    from .nullkeys import null_safe_group_map

    return null_safe_group_map(tagged, [by, "__bin"], merge)


def build_key_bloom(ds, on: str, fpp: float = 0.001) -> bytes:
    """Distributed bloom over a dataset's join-key column: geometry
    fixed from a row-count estimate, each batch emits one headerless
    partial (bitwise-OR-mergeable), the driver unions bytes — key
    values never reach the driver.

    Sizing prefers METADATA row counts (free); for a lazy transformed
    dataset — where ds.count() would execute the whole build side once
    EXTRA, before the bloom pass and the join both run it again — the
    geometry over-provisions from metadata-size/32B-per-row instead.
    Over-sizing only lowers the fpp; the single honest count() fallback
    remains for datasets with no metadata at all."""
    import pyarrow.compute as pc

    from .. import bloom as bloom_mod
    from .. import column as column_mod

    n_rows = None
    try:
        meta = ds._plan.infer_metadata()
        n_rows = meta.num_rows
        if n_rows is None and meta.size_bytes:
            n_rows = max(meta.size_bytes // 32, 1024)  # over-provision
    except Exception:
        pass
    if n_rows is None:
        n_rows = ds.count()  # documented full-pass fallback
    num_bits, k = bloom_mod.params_for(n_rows, fpp)

    def partial(batch: pa.Table) -> pa.Table:
        key = batch.column(on)
        key = key.combine_chunks() if isinstance(key, pa.ChunkedArray) else key
        if not pa.types.is_string(key.type):
            key = pc.cast(key, pa.string())
        key = key.drop_null()
        lengths, data = column_mod._string_parts_view(key)
        bits = bloom_mod.partial_bits(lengths, data, num_bits, k)
        return pa.table({"bits": pa.array([bits.tobytes()], type=pa.binary())})

    merged = np.zeros(num_bits // 8, dtype=np.uint8)
    for b in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
        batch_format="pyarrow"
    ):
        for v in b.column("bits"):
            merged |= np.frombuffer(v.as_py(), dtype=np.uint8)
    return bloom_mod.assemble(merged, num_bits, k)


def bloom_filter_join(left, right, on: str, how: str = "inner",
                      fpp: float = 0.001, num_buckets: int | None = None):
    """Shuffle join with a BLOOM PREFILTER on the probe side — the
    standard large-join optimization: the right side's keys fold into
    a distributed bloom (build_key_bloom), the filter broadcasts once
    via ray.put, and left rows that cannot match are dropped BEFORE
    the all-to-all exchange. Results are identical to partitioned_join
    (false positives only pass extra rows the join then drops); what
    shrinks is shuffle volume — for a selective join the probe side's
    exchange drops to ~match-rate + fpp.

    Sound for inner / right_outer / left_semi (a bloom-dropped left
    row can never appear in the output); refused for left/full outer,
    where dropped rows must still surface with nulls."""
    import pyarrow.compute as pc
    import ray

    from .. import bloom as bloom_mod
    from .. import column as column_mod

    resolved = _JOIN_TYPES.get(how, how)
    if resolved in ("left_outer", "full_outer", "left_anti"):
        raise ValueError(f"bloom prefilter unsound for {resolved}; use partitioned_join")
    bloom_ref = ray.put(build_key_bloom(right, on, fpp))

    def flt(batch: pa.Table) -> pa.Table:
        bloom = ray.get(bloom_ref)
        key = batch.column(on)
        key = key.combine_chunks() if isinstance(key, pa.ChunkedArray) else key
        if not pa.types.is_string(key.type):
            key = pc.cast(key, pa.string())
        mask = np.zeros(batch.num_rows, dtype=bool)
        vmask = key.is_valid().to_numpy(zero_copy_only=False)
        kv = key.drop_null()
        lengths, data = column_mod._string_parts_view(kv)
        mask[vmask] = bloom_mod.might_contain_buffers(bloom, lengths, data)
        return batch.filter(pa.array(mask))

    pre = left.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)
    return partitioned_join(pre, right, on, num_buckets=num_buckets, how=how)


def dup_pairs_band(
    ds,
    key_col: str,
    amount_col: str,
    ts_col: str,
    id_col: str,
    window_us: int,
    amount_band_cents: int,
    decimal_scale: int = 2,
):
    """Duplicate-transaction candidate pairs (the classic
    double-invoice / double-charge audit): unordered pairs of rows
    with the SAME key, timestamps within `window_us` of each other,
    and amounts within `amount_band_cents` (amounts compared as exact
    integer cents). Exactly a SQL inequality self-join, so it carries
    a value oracle.

    Scale shape: one `range_join` banded on (key, time-bin) does the
    pair generation — the only exchange; the amount band and the
    id1 < id2 de-mirroring are vectorized post-filters inside the
    joined batches, so per-bucket pair counts stay bounded by the
    time window. Output: (key, id1, id2, cents1, cents2) — all exact
    int64, sorted by (key, id1, id2)."""
    import numpy as np
    import pyarrow.compute as pc

    scale = 10.0**decimal_scale

    def keyed(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.and_(
                pc.is_valid(batch.column(key_col)),
                pc.is_valid(batch.column(amount_col)),
            ),
            pc.and_(
                pc.is_valid(batch.column(ts_col)),
                pc.is_valid(batch.column(id_col)),
            ),
        )
        t = batch.filter(ok)
        cents = np.rint(
            pc.cast(t.column(amount_col), pa.float64()).to_numpy(
                zero_copy_only=False
            )
            * scale
        ).astype(np.int64)
        return pa.table(
            {
                "bk": pc.cast(t.column(key_col), pa.int64()),
                "bid": pc.cast(t.column(id_col), pa.int64()),
                "bcents": pa.array(cents),
                "bts": t.column(ts_col),
            }
        )

    left = ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
    right = ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True)
    pairs = range_join(
        left,
        right,
        by="bk",
        on="bts",
        lo_offset_us=-window_us,
        hi_offset_us=window_us,
        right_columns=["bid", "bcents"],
    )

    def finish(t: pa.Table) -> pa.Table:
        i1 = t.column("bid").to_numpy(zero_copy_only=False)
        i2 = t.column("bid_right").to_numpy(zero_copy_only=False)
        c1 = t.column("bcents").to_numpy(zero_copy_only=False)
        c2 = t.column("bcents_right").to_numpy(zero_copy_only=False)
        keep = (i1 < i2) & (np.abs(c1 - c2) <= amount_band_cents)
        return pa.table(
            {
                key_col: t.column("bk").filter(pa.array(keep)),
                "id1": pa.array(i1[keep], pa.int64()),
                "id2": pa.array(i2[keep], pa.int64()),
                "cents1": pa.array(c1[keep], pa.int64()),
                "cents2": pa.array(c2[keep], pa.int64()),
            }
        )

    out = pairs.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    return out.sort(key=[key_col, "id1", "id2"])


def encoded_key_join(
    left_path,
    right,
    on: str,
    columns: list[str] | None = None,
    how: str = "inner",
    fpp: float = 0.001,
):
    """Join PUSHDOWN into the encoded format — the fact side never
    fully decodes: the dimension side contributes (a) its global key
    [min, max], so fact stripes and row groups outside the range are
    never FETCHED (zone maps at both levels), and (b) its distributed
    key bloom (build_key_bloom), so decoded fact rows that cannot
    match drop before the exchange. The remaining shuffle is
    partitioned_join over survivors. Same soundness rule as
    bloom_filter_join: inner / right_outer / left_semi only (a pruned
    fact row must never need to surface with nulls). `right` is a
    Dataset whose join column is already named `on`."""
    from ray.data.aggregate import Max, Min

    from .. import pipeline

    resolved = _JOIN_TYPES.get(how, how)
    if resolved in ("left_outer", "full_outer", "left_anti"):
        raise ValueError(f"key-range prune unsound for {resolved}; use partitioned_join")
    mm = right.aggregate(Min(on), Max(on))  # None when right is EMPTY
    rmin = mm[f"min({on})"] if mm else None
    rmax = mm[f"max({on})"] if mm else None
    if rmin is None:
        # empty or all-null-key dimension: no key can ever match. For
        # inner/semi that means an empty result; right_outer must still
        # surface every right row with null left columns, so fall back
        # to the unpruned join rather than silently dropping them
        if resolved == "right_outer":
            dec_all = pipeline.decode_dataset(
                pipeline.read_encoded(left_path), columns=columns
            )
            return partitioned_join(dec_all, right, on, how=how)
        import ray.data

        return ray.data.from_items([])
    enc = pipeline.prune_read(left_path, on, rmin, rmax)
    dec = pipeline.decode_dataset(enc, columns=columns, rg_predicate=(on, rmin, rmax))
    return bloom_filter_join(dec, right, on, how=how, fpp=fpp)
