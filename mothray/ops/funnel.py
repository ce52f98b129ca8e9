"""Funnel analysis: ordered event-sequence conversion counts.

Greedy earliest-completion matching (the standard funnel semantics):
a user reaches step i when, scanning their events in time order, an
event of type steps[0] occurs, then one of steps[1] strictly after
it, and so on. Exactly reproducible in SQL as a chain of
min-timestamp self-joins — the DuckDB oracle builds that chain, so
the operator is value-checked, not rows-only.

Scale shape: project (user, ts, type) only; ONE groupby(user)
shuffle; per-group matching is a numpy scan over the user's (sorted)
events per step — no corpus-sized state, no driver work beyond the
k-row result. The depth histogram reduces per batch (combiner), so
only (depth, count) rows leave the match stage.

No reference analog (orc-go has no analytics operators) — engine
extension alongside the window/sessionization family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def funnel(ds, steps: list[str], user_col: str = "user_id",
           ts_col: str = "ts", type_col: str = "event_type"):
    """(step BIGINT, n_users BIGINT) for step = 1..len(steps): users
    whose event sequence greedily matches the first `step` entries."""
    if not steps:
        raise ValueError("steps must be non-empty")
    k = len(steps)

    def depth(group: pa.Table) -> pa.Table:
        ts = group.column(ts_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        masks = [
            pc.fill_null(pc.equal(group.column(type_col), s), False).to_numpy(
                zero_copy_only=False
            )
            for s in steps
        ]
        d = 0
        prev_t = -(1 << 62)
        for m in masks:
            # earliest event of this type STRICTLY after the previous
            # match's timestamp (ties never satisfy two steps — same
            # rule the SQL min-timestamp join chain applies)
            cand = ts[np.asarray(m, dtype=bool) & (ts > prev_t)]
            if len(cand) == 0:
                break
            prev_t = int(cand.min())
            d += 1
        return pa.table({"depth": pa.array([d], pa.int64())})

    def hist(batch: pa.Table) -> pa.Table:
        c = np.bincount(
            batch.column("depth").to_numpy(zero_copy_only=False), minlength=k + 1
        )
        return pa.table(
            {"depth": pa.array(np.arange(k + 1), pa.int64()), "cnt": pa.array(c, pa.int64())}
        )

    from .nullkeys import null_safe_group_map

    depths = (
        null_safe_group_map(
            ds.select_columns(sorted({user_col, ts_col, type_col})), [user_col], depth
        )
        .map_batches(hist, batch_format="pyarrow")
        .groupby("depth")
        .sum("cnt")
        .to_pandas()
    )
    by_depth = dict(zip(depths["depth"], depths["sum(cnt)"]))
    total = np.array([by_depth.get(d, 0) for d in range(k + 1)], dtype=np.int64)
    # users at step i = users whose depth >= i
    reached = np.cumsum(total[::-1])[::-1]
    return pa.table(
        {
            "step": pa.array(np.arange(1, k + 1), pa.int64()),
            "n_users": pa.array(reached[1:], pa.int64()),
        }
    )


def last_touch_attribution(ds, conversion_type: str, user_col: str = "user_id",
                           ts_col: str = "ts", type_col: str = "event_type",
                           id_col: str = "event_id"):
    """Last-touch marketing attribution: every `conversion_type` event
    is credited to the user's most recent STRICTLY-PRIOR event of any
    other type (prior = smaller (ts, id) — the id tiebreak makes
    same-microsecond sequences deterministic); conversions with no
    prior touch credit the pseudo-type 'none'. Output:
    (touch_type, n) — conversions credited per touch type.

    Scale shape: project 4 columns, ONE groupby(user) shuffle; the
    per-user scan is a vectorized running-last-index
    (maximum.accumulate over non-conversion positions); per-group
    COUNT partials fold in a combiner-shaped grouped sum, so only
    (touch_type, n) rows leave the match stage."""
    from .nullkeys import null_safe_group_map

    def keep(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.and_(pc.is_valid(batch.column(ts_col)), pc.is_valid(batch.column(type_col))),
            pc.is_valid(batch.column(id_col)),
        )
        return batch.select(sorted({user_col, ts_col, type_col, id_col})).filter(ok)

    def per_user(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[(ts_col, "ascending"), (id_col, "ascending")]
        )
        g = group.take(idx)
        types = g.column(type_col).to_numpy(zero_copy_only=False)
        is_conv = types == conversion_type
        n = len(types)
        if not is_conv.any():
            return pa.table(
                {"touch_type": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        last_touch = np.maximum.accumulate(
            np.where(~is_conv, np.arange(n), -1)
        )
        conv_pos = np.flatnonzero(is_conv)
        prior = np.where(conv_pos > 0, last_touch[np.maximum(conv_pos - 1, 0)], -1)
        credited = np.where(prior >= 0, types[np.maximum(prior, 0)], "none")
        t = pa.table(
            {"touch_type": pa.array(credited.astype(object), pa.string()),
             "one": pa.array(np.ones(len(credited), np.int64))}
        )
        p = t.group_by("touch_type", use_threads=False).aggregate([("one", "sum")])
        return pa.table({"touch_type": p.column("touch_type"), "n": p.column("one_sum")})

    proj = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    return (
        null_safe_group_map(proj, [user_col], per_user)
        .groupby("touch_type")
        .sum("n")
        .map_batches(
            lambda t: pa.table({"touch_type": t.column("touch_type"),
                                "n": t.column("sum(n)")}),
            batch_format="pyarrow",
        )
    )


def session_paths(ds, path_len: int = 3, gap_minutes: int = 30, top_k: int = 10,
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type", id_col: str = "event_id"):
    """Top-k most frequent length-`path_len` event-type paths WITHIN
    gap-based sessions (clickstream path mining): a user's events are
    ordered by (ts, id), a new session starts when the gap exceeds
    `gap_minutes`, and every window of `path_len` consecutive
    same-session events contributes one 'a>b>c' path. Output:
    (path, n) — top_k by (n DESC, path), deterministic.

    Scale shape: one grouped shuffle on a 4-column projection; the
    per-user scan is vectorized (cumsum session ids + shifted
    equality masks); per-group partial counts fold in a
    combiner-shaped grouped sum, so only (path, n) rows leave the
    match stage."""
    from .nullkeys import null_safe_group_map

    gap_us = gap_minutes * 60 * 1_000_000

    def keep(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.and_(pc.is_valid(batch.column(ts_col)), pc.is_valid(batch.column(type_col))),
            pc.is_valid(batch.column(id_col)),
        )
        return batch.select(sorted({user_col, ts_col, type_col, id_col})).filter(ok)

    def per_user(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {"path": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
        if group.num_rows < path_len:
            return empty
        idx = pc.sort_indices(
            group, sort_keys=[(ts_col, "ascending"), (id_col, "ascending")]
        )
        g = group.take(idx)
        ts = g.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        types = g.column(type_col).to_numpy(zero_copy_only=False)
        sid = np.cumsum(np.r_[1, (np.diff(ts) > gap_us).astype(np.int64)])
        n = len(ts)
        m = n - path_len + 1
        same = sid[: m] == sid[path_len - 1:]
        if not same.any():
            return empty
        parts = [types[k: k + m][same] for k in range(path_len)]
        paths = parts[0].astype(object)
        for p in parts[1:]:
            paths = paths + ">" + p.astype(object)
        t = pa.table(
            {"path": pa.array(paths, pa.string()),
             "one": pa.array(np.ones(len(paths), np.int64))}
        )
        p = t.group_by("path", use_threads=False).aggregate([("one", "sum")])
        return pa.table({"path": p.column("path"), "n": p.column("one_sum")})

    proj = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    counts = (
        null_safe_group_map(proj, [user_col], per_user)
        .groupby("path")
        .sum("n")
        .map_batches(
            lambda t: pa.table({"path": t.column("path"), "n": t.column("sum(n)")}),
            batch_format="pyarrow",
        )
    )
    return counts.sort(key=["n", "path"], descending=[True, False]).limit(top_k)


def linear_attribution(ds, conversion_type: str, user_col: str = "user_id",
                       ts_col: str = "ts", type_col: str = "event_type",
                       id_col: str = "event_id", scale: int = 1_000_000):
    """Linear multi-touch attribution: every `conversion_type` event
    credits ALL the user's touches since their previous conversion
    EQUALLY — each touch earns round(scale / n_touches) integer credit
    units (the repo's exact-integer convention, so the grouped sums
    value-match SQL regardless of float order); a conversion whose
    journey has no touch credits the pseudo-type 'none' with the full
    `scale`. Output: (touch_type, credit_e6) — total integer credit
    per touch type.

    Scale shape mirrors last_touch_attribution: 4-column projection,
    ONE groupby(user) shuffle, vectorized per-user journey math
    (cumsum journey ids + two bincounts), combiner-shaped grouped sum
    of (type, credit) partials."""
    from .nullkeys import null_safe_group_map

    def keep(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.and_(pc.is_valid(batch.column(ts_col)), pc.is_valid(batch.column(type_col))),
            pc.is_valid(batch.column(id_col)),
        )
        return batch.select(sorted({user_col, ts_col, type_col, id_col})).filter(ok)

    def per_user(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[(ts_col, "ascending"), (id_col, "ascending")]
        )
        g = group.take(idx)
        types = g.column(type_col).to_numpy(zero_copy_only=False)
        is_conv = types == conversion_type
        if not is_conv.any():
            return pa.table(
                {"touch_type": pa.array([], pa.string()),
                 "credit_e6": pa.array([], pa.int64())}
            )
        n = len(types)
        # journey id = number of PRIOR conversions (a conversion ends
        # its own journey)
        j = np.concatenate([[0], np.cumsum(is_conv)[:-1]]).astype(np.int64)
        touch = ~is_conv
        n_j = np.bincount(j[touch], minlength=int(j.max()) + 2)
        conv_js = j[is_conv]
        credited_j = np.zeros(len(n_j), dtype=bool)
        credited_j[conv_js] = True
        sel = touch & credited_j[j] & (n_j[j] > 0)
        per_touch = np.zeros(n, dtype=np.int64)
        with np.errstate(divide="ignore"):
            per_touch[sel] = np.trunc(scale / n_j[j][sel] + 0.5).astype(np.int64)
        out_types = list(types[sel])
        out_credit = list(per_touch[sel])
        n_none = int((n_j[conv_js] == 0).sum())
        if n_none:
            out_types.append("none")
            out_credit.append(n_none * scale)
        t = pa.table(
            {"touch_type": pa.array(out_types, pa.string()),
             "credit_e6": pa.array(out_credit, pa.int64())}
        )
        p = t.group_by("touch_type", use_threads=False).aggregate([("credit_e6", "sum")])
        return pa.table(
            {"touch_type": p.column("touch_type"),
             "credit_e6": p.column("credit_e6_sum")}
        )

    proj = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    return (
        null_safe_group_map(proj, [user_col], per_user)
        .groupby("touch_type")
        .sum("credit_e6")
        .map_batches(
            lambda t: pa.table({"touch_type": t.column("touch_type"),
                                "credit_e6": t.column("sum(credit_e6)")}),
            batch_format="pyarrow",
        )
    )


def time_decay_attribution(ds, conversion_type: str, user_col: str = "user_id",
                           ts_col: str = "ts", type_col: str = "event_type",
                           id_col: str = "event_id", scale: int = 1_000_000,
                           max_age_days: int = 20):
    """Time-decay attribution with a one-day half-life, INTEGER-EXACT:
    every `conversion_type` event credits each touch since the user's
    previous conversion with `scale >> age_days` credit units (age =
    whole days between touch and conversion, capped at max_age_days —
    a bit shift, so both engines compute identical integers; no float
    pow anywhere). Touchless conversions credit 'none' with the full
    scale. Output: (touch_type, credit_e6).

    Same scale shape as linear_attribution: one groupby(user)
    shuffle, vectorized journey math, combiner-shaped grouped sum."""
    from .nullkeys import null_safe_group_map

    def keep(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.and_(pc.is_valid(batch.column(ts_col)), pc.is_valid(batch.column(type_col))),
            pc.is_valid(batch.column(id_col)),
        )
        return batch.select(sorted({user_col, ts_col, type_col, id_col})).filter(ok)

    def per_user(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[(ts_col, "ascending"), (id_col, "ascending")]
        )
        g = group.take(idx)
        types = g.column(type_col).to_numpy(zero_copy_only=False)
        # normalize to MICROSECONDS whatever the source unit (Ray's
        # from_items hands back timestamp[s]; parquet sources are us)
        ts = pc.cast(
            pc.cast(g.column(ts_col), pa.timestamp("us")), pa.int64()
        ).to_numpy(zero_copy_only=False)
        is_conv = types == conversion_type
        if not is_conv.any():
            return pa.table(
                {"touch_type": pa.array([], pa.string()),
                 "credit_e6": pa.array([], pa.int64())}
            )
        n = len(types)
        j = np.concatenate([[0], np.cumsum(is_conv)[:-1]]).astype(np.int64)
        touch = ~is_conv
        n_j = np.bincount(j[touch], minlength=int(j.max()) + 2)
        conv_js = j[is_conv]
        conv_ts_by_j = np.zeros(len(n_j), dtype=np.int64)
        conv_ts_by_j[conv_js] = ts[is_conv]
        credited_j = np.zeros(len(n_j), dtype=bool)
        credited_j[conv_js] = True
        sel = touch & credited_j[j]
        age_days = np.minimum(
            np.maximum(conv_ts_by_j[j[sel]] - ts[sel], 0) // 86_400_000_000,
            max_age_days,
        ).astype(np.int64)
        per_touch = np.int64(scale) >> age_days
        out_types = list(types[sel])
        out_credit = list(per_touch)
        n_none = int((n_j[conv_js] == 0).sum())
        if n_none:
            out_types.append("none")
            out_credit.append(n_none * scale)
        t = pa.table(
            {"touch_type": pa.array(out_types, pa.string()),
             "credit_e6": pa.array(np.asarray(out_credit, np.int64))}
        )
        p = t.group_by("touch_type", use_threads=False).aggregate([("credit_e6", "sum")])
        return pa.table(
            {"touch_type": p.column("touch_type"),
             "credit_e6": p.column("credit_e6_sum")}
        )

    proj = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    return (
        null_safe_group_map(proj, [user_col], per_user)
        .groupby("touch_type")
        .sum("credit_e6")
        .map_batches(
            lambda t: pa.table({"touch_type": t.column("touch_type"),
                                "credit_e6": t.column("sum(credit_e6)")}),
            batch_format="pyarrow",
        )
    )


def u_shaped_attribution(ds, conversion_type: str, user_col: str = "user_id",
                         ts_col: str = "ts", type_col: str = "event_type",
                         id_col: str = "event_id", scale: int = 1_000_000):
    """Position-based (U-shaped / 40-20-40) attribution, INTEGER-EXACT:
    within each journey (touches since the user's previous conversion)
    the FIRST touch earns 40% of `scale`, the LAST 40%, and the middle
    touches split the remaining 20% equally as round(scale/5/(n-2))
    each; a single touch takes the full scale, two touches take half
    each, a touchless conversion credits 'none'. Output:
    (touch_type, credit_e6). Same one-shuffle scale shape as the other
    attribution ops."""
    from .nullkeys import null_safe_group_map

    def keep(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.and_(pc.is_valid(batch.column(ts_col)), pc.is_valid(batch.column(type_col))),
            pc.is_valid(batch.column(id_col)),
        )
        return batch.select(sorted({user_col, ts_col, type_col, id_col})).filter(ok)

    def per_user(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            group, sort_keys=[(ts_col, "ascending"), (id_col, "ascending")]
        )
        g = group.take(idx)
        types = g.column(type_col).to_numpy(zero_copy_only=False)
        is_conv = types == conversion_type
        if not is_conv.any():
            return pa.table(
                {"touch_type": pa.array([], pa.string()),
                 "credit_e6": pa.array([], pa.int64())}
            )
        n = len(types)
        j = np.concatenate([[0], np.cumsum(is_conv)[:-1]]).astype(np.int64)
        touch = ~is_conv
        nj = int(j.max()) + 2
        n_j = np.bincount(j[touch], minlength=nj)
        conv_js = j[is_conv]
        credited_j = np.zeros(nj, dtype=bool)
        credited_j[conv_js] = True
        # position of each touch within its journey (0-based),
        # vectorized: j is non-decreasing over the sorted touches, so
        # the journey start offsets are a running maximum of change
        # points
        pos = np.zeros(n, dtype=np.int64)
        ti = np.flatnonzero(touch)
        if len(ti):
            jj = j[ti]
            starts = np.zeros(len(ti), dtype=np.int64)
            ch = np.flatnonzero(np.diff(jj)) + 1
            starts[ch] = ch
            starts = np.maximum.accumulate(starts)
            pos[ti] = np.arange(len(ti)) - starts
        sel = touch & credited_j[j] & (n_j[j] > 0)
        nn = n_j[j]
        first = pos == 0
        last = pos == nn - 1
        credit = np.zeros(n, dtype=np.int64)
        one = (nn == 1) & first
        credit[one & sel] = scale
        two_plus = nn >= 2
        credit[two_plus & first & sel] = (2 * scale) // 5
        credit[two_plus & last & sel] = (2 * scale) // 5
        mid = two_plus & ~first & ~last
        with np.errstate(divide="ignore", invalid="ignore"):
            mid_credit = np.where(
                nn > 2,
                np.trunc(scale / 5 / np.maximum(nn - 2, 1) + 0.5).astype(np.int64),
                0,
            )
        credit[mid & sel] = mid_credit[mid & sel]
        out_types = list(types[sel])
        out_credit = list(credit[sel])
        n_none = int((n_j[conv_js] == 0).sum())
        if n_none:
            out_types.append("none")
            out_credit.append(n_none * scale)
        t = pa.table(
            {"touch_type": pa.array(out_types, pa.string()),
             "credit_e6": pa.array(np.asarray(out_credit, np.int64))}
        )
        p = t.group_by("touch_type", use_threads=False).aggregate([("credit_e6", "sum")])
        return pa.table(
            {"touch_type": p.column("touch_type"),
             "credit_e6": p.column("credit_e6_sum")}
        )

    proj = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    return (
        null_safe_group_map(proj, [user_col], per_user)
        .groupby("touch_type")
        .sum("credit_e6")
        .map_batches(
            lambda t: pa.table({"touch_type": t.column("touch_type"),
                                "credit_e6": t.column("sum(credit_e6)")}),
            batch_format="pyarrow",
        )
    )
