"""Cohort retention analysis: (cohort_week, age_weeks, n_users).

Users are grouped into cohorts by the week of their FIRST activity;
the retention matrix counts, for each cohort and each age (weeks since
the cohort week), how many of that cohort's users were active. Week
index = floor(epoch_seconds / 604800) — a plain integer division both
engines compute identically (DuckDB's date_trunc('week') anchors to
Monday while epoch division anchors to Thursday; using the raw index
keeps the oracle exact without calendar fixups).

Scale shape: project (user, ts) only; distinct (user, week) pairs are
reduced INSIDE each batch before the single groupby(user) exchange, so
at most one row per user-week moves; per-group work is a tiny numpy
unique; a (cohort, age) count combiner runs per batch so only matrix
cells reach the final groupby. No driver-side state.

No reference analog (orc-go has no analytics operators) — engine
extension alongside the window / funnel family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_WEEK_US = 7 * 24 * 3600 * 1_000_000


def retention(ds, user_col: str = "user_id", ts_col: str = "ts"):
    """(cohort_week BIGINT, age_weeks BIGINT, n_users BIGINT), one row
    per non-empty retention-matrix cell."""

    def to_weeks(batch: pa.Table) -> pa.Table:
        w = batch.column(ts_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) // _WEEK_US
        # Arrow group_by instead of np.unique: a null user id (one
        # legal SQL group) becomes NaN in numpy and breaks both the
        # stack-unique and the int64 rebuild; Arrow dedupes pairs
        # null-safely and keeps the user column's own type
        t = pa.table(
            {user_col: batch.column(user_col), "w": pa.array(w.astype(np.int64))}
        )
        return t.group_by([user_col, "w"], use_threads=False).aggregate([])

    def ages(group: pa.Table) -> pa.Table:
        w = np.unique(group.column("w").to_numpy(zero_copy_only=False))
        cw = w[0] if len(w) else 0
        return pa.table(
            {
                "cohort_week": pa.array(np.full(len(w), cw), pa.int64()),
                "age_weeks": pa.array(w - cw, pa.int64()),
            }
        )

    def cell_counts(batch: pa.Table) -> pa.Table:
        c = batch.column("cohort_week").to_numpy(zero_copy_only=False)
        a = batch.column("age_weeks").to_numpy(zero_copy_only=False)
        cells, cnt = np.unique(np.stack([c, a], axis=1), axis=0, return_counts=True)
        return pa.table(
            {
                "cohort_week": pa.array(cells[:, 0], pa.int64()),
                "age_weeks": pa.array(cells[:, 1], pa.int64()),
                "n_users": pa.array(cnt, pa.int64()),
            }
        )

    from .nullkeys import null_safe_group_map

    out = (
        null_safe_group_map(
            ds.select_columns(sorted({user_col, ts_col})).map_batches(
                to_weeks, batch_format="pyarrow", zero_copy_batch=True
            ),
            [user_col],
            ages,
        )
        .map_batches(cell_counts, batch_format="pyarrow")
        .groupby(["cohort_week", "age_weeks"])
        .sum("n_users")
    )
    return out.map_batches(
        lambda t: t.rename_columns(["cohort_week", "age_weeks", "n_users"]),
        batch_format="pyarrow",
    )


def new_users_cumulative(ds, user_col: str = "user_id", ts_col: str = "ts"):
    """Exact cumulative distinct-user curve by day. Output:
    (day DATE, new_users BIGINT, cum_users BIGINT) ordered by day.

    The exact-cumulative-distinct trick that avoids carrying sets:
    cumulative distinct users at day d == count of users whose FIRST
    activity day <= d, so the heavy exchange is one (user, min day)
    row per user (per-batch min combiner first), the day histogram is
    group-cardinality sized, and the running sum evaluates over that
    tiny table in one final block. Null timestamps are no activity."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    from .nullkeys import null_safe_group_aggregate

    def first_seen_partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).combine_chunks()
        users = batch.column(user_col)
        mask = pc.is_valid(ts)
        if pc.any(pc.invert(mask)).as_py():
            ts, users = ts.filter(mask), users.filter(mask)
        days = ts.cast(pa.date32()).cast(pa.int32())
        t = pa.table({user_col: users, "day": days})
        return (
            t.group_by([user_col])
            .aggregate([("day", "min")])
            .rename_columns([user_col, "day"])
        )

    firsts = null_safe_group_aggregate(
        ds.select_columns(sorted({user_col, ts_col})).map_batches(
            first_seen_partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        [user_col],
        [Min("day", alias_name="day")],
    )

    def day_counts(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "day": batch.column("day"),
                "new_users": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        )
        return (
            t.group_by(["day"])
            .aggregate([("new_users", "sum")])
            .rename_columns(["day", "new_users"])
        )

    from ray.data.aggregate import Sum

    daily = null_safe_group_aggregate(
        firsts.map_batches(day_counts, batch_format="pyarrow", zero_copy_batch=True),
        ["day"],
        [Sum("new_users", alias_name="new_users")],
    ).sort("day")

    def finish(t: pa.Table) -> pa.Table:
        nu = t.column("new_users").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                # ISO 'YYYY-MM-DD' string: stable across consumers
                # (date32 survives Arrow but pandas-izes inconsistently)
                "day": t.column("day").cast(pa.int32()).cast(pa.date32()).cast(pa.string()),
                "new_users": t.column("new_users"),
                "cum_users": pa.array(np.cumsum(nu).astype(np.int64)),
            }
        )

    # the day histogram is tiny (one row per active day) — a single
    # block carries the running sum
    return daily.repartition(1).map_batches(finish, batch_format="pyarrow")


def kaplan_meier(
    ds,
    key_col: str,
    ts_col: str,
    censor_gap_days: int = 7,
    round_digits: int = 6,
) -> pa.Table:
    """Kaplan-Meier survival curve over per-key activity lifetimes:
    duration = days between a key's first and last event; a key whose
    last activity falls within `censor_gap_days` of the corpus's last
    observed day is CENSORED (still alive — its true lifetime is only
    known to exceed the observed one). Output: one row per distinct
    event duration t with

        S(t) = exp( sum_{t_i <= t} ln(1 - d_i / n_i) )

    (at_risk n_i counts keys with duration >= t_i; d_i = deaths at
    t_i). The exp-sum-ln form, not a running product, so the SQL
    oracle's windowed sum reproduces the floats to round-6.

    Scale shape: one grouped (min ts, max ts) pass reduces the corpus
    to key-width lifetimes; the duration histogram is another grouped
    count; the KM scan runs over the DISTINCT DURATIONS (bounded by
    the day domain)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min

    def keep(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.is_valid(batch.column(key_col)), pc.is_valid(batch.column(ts_col))
        )
        t = batch.filter(ok)
        return pa.table(
            {
                "k": t.column(key_col),
                "d": pc.cast(pc.cast(t.column(ts_col), pa.date32()), pa.int32()),
            }
        )

    spans = (
        ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("k")
        .aggregate(Min("d", alias_name="first_d"), Max("d", alias_name="last_d"))
        .materialize()
    )
    last_row = spans.aggregate(Max("last_d", alias_name="m"))
    corpus_last = int(last_row["m"])

    def to_life(batch: pa.Table) -> pa.Table:
        f = batch.column("first_d").to_numpy(zero_copy_only=False)
        l = batch.column("last_d").to_numpy(zero_copy_only=False)
        dur = (l - f).astype(np.int64)
        event = (l < corpus_last - censor_gap_days).astype(np.int64)
        t = pa.table({"dur": pa.array(dur), "event": pa.array(event),
                      "one": pa.array(np.ones(len(dur), dtype=np.int64))})
        g = t.group_by(["dur"], use_threads=False).aggregate(
            [("event", "sum"), ("one", "sum")]
        )
        return g.rename_columns(["dur", "deaths", "total"])

    from ray.data.aggregate import Sum

    hist = (
        spans.map_batches(to_life, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("dur")
        .aggregate(Sum("deaths", alias_name="deaths"), Sum("total", alias_name="total"))
        .take_all()
    )
    hist.sort(key=lambda r: r["dur"])
    totals = np.array([r["total"] for r in hist], dtype=np.int64)
    deaths = np.array([r["deaths"] for r in hist], dtype=np.int64)
    durs = [r["dur"] for r in hist]
    n_after = np.concatenate((np.cumsum(totals[::-1])[::-1], [0]))  # at risk at each t
    out_t, out_d, out_n, out_s = [], [], [], []
    log_s = 0.0
    for i, t_i in enumerate(durs):
        n_i = int(n_after[i])
        d_i = int(deaths[i])
        if d_i == 0:
            continue
        with np.errstate(divide="ignore"):
            log_s += float(np.log(1.0 - d_i / n_i))  # d_i == n_i -> -inf -> S = 0
        out_t.append(int(t_i))
        out_d.append(d_i)
        out_n.append(n_i)
        out_s.append(round(float(np.exp(log_s)), round_digits))
    return pa.table(
        {
            "t_days": pa.array(out_t, pa.int64()),
            "deaths": pa.array(out_d, pa.int64()),
            "at_risk": pa.array(out_n, pa.int64()),
            "survival": pa.array(out_s, pa.float64()),
        }
    )


def burstiness(ds, key_col: str, ts_col: str, min_gaps: int = 2,
               round_digits: int = 6):
    """Per-key coefficient of variation of inter-arrival times — the
    classic burstiness signal (CV > 1: bursty, CV < 1: regular, = 1:
    Poisson). Gaps are integer microseconds between consecutive
    events in time order (the gap MULTISET is tie-order independent,
    so the statistic is deterministic even with duplicate
    timestamps); sums and sums-of-squares are exact arbitrary-
    precision integers (gap^2 overflows int64 on multi-day gaps),
    converted to float64 only for the final raw-sums variance —
    written in the oracle's exact op order. Keys with fewer than
    `min_gaps` gaps are dropped. Output: (key, n_gaps, cv_r6).

    One grouped shuffle on a 2-column projection; per-group state is
    the key's timestamps."""
    import pyarrow.compute as pc

    from .nullkeys import null_safe_group_map

    def keep(batch: pa.Table) -> pa.Table:
        return batch.select(sorted({key_col, ts_col})).filter(
            pc.is_valid(batch.column(ts_col))
        )

    def per_key(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: group.column(key_col).slice(0, 0),
                "n_gaps": pa.array([], pa.int64()),
                "cv_r6": pa.array([], pa.float64()),
            }
        )
        ts = np.sort(group.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False))
        if len(ts) < min_gaps + 1:
            return empty
        gaps = np.diff(ts)
        n = len(gaps)
        s = float(sum(int(g) for g in gaps))
        ss = float(sum(int(g) * int(g) for g in gaps))
        var = max((ss - s * s / n) / (n - 1), 0.0)
        mean = s / n
        cv = float(np.sqrt(var)) / mean if mean > 0 else None
        return pa.table(
            {
                key_col: group.column(key_col).slice(0, 1),
                "n_gaps": pa.array([n], pa.int64()),
                "cv_r6": pa.array(
                    [None if cv is None else round(cv, round_digits)], pa.float64()
                ),
            }
        )

    proj = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    return null_safe_group_map(proj, [key_col], per_key)


def time_to_convert(ds, user_col: str, ts_col: str, type_col: str,
                    from_type: str, to_type: str):
    """Per-user conversion latency: microseconds from the user's FIRST
    `from_type` event to their first `to_type` event STRICTLY after
    it; users who never convert are dropped. Output:
    (user, convert_us) — all integer, bit-deterministic.

    One grouped shuffle on a 3-column projection; the per-user scan is
    two vectorized min-reductions."""
    import pyarrow.compute as pc

    from .nullkeys import null_safe_group_map

    def keep(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.is_valid(batch.column(ts_col)), pc.is_valid(batch.column(type_col))
        )
        m = pc.or_(
            pc.equal(batch.column(type_col), from_type),
            pc.equal(batch.column(type_col), to_type),
        )
        return batch.select(sorted({user_col, ts_col, type_col})).filter(
            pc.and_(ok, pc.fill_null(m, False))
        )

    def per_user(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                user_col: group.column(user_col).slice(0, 0),
                "convert_us": pa.array([], pa.int64()),
            }
        )
        ts = group.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        types = group.column(type_col).to_numpy(zero_copy_only=False)
        src = ts[types == from_type]
        if len(src) == 0:
            return empty
        t0 = src.min()
        dst = ts[(types == to_type) & (ts > t0)]
        if len(dst) == 0:
            return empty
        return pa.table(
            {
                user_col: group.column(user_col).slice(0, 1),
                "convert_us": pa.array([int(dst.min() - t0)], pa.int64()),
            }
        )

    proj = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
    return null_safe_group_map(proj, [user_col], per_user)


def weekly_churn(ds, user_col: str = "user_id", ts_col: str = "ts"):
    """Weekly churn: for each week index w (floor(epoch_us / week_us),
    same calendar-free anchor as retention), n_active = distinct users
    active in w, n_churned = those with no activity in w+1, and
    churn_rate = n_churned / n_active (ONE exact int/int division —
    bit-deterministic). Distinct (user, week) pairs are reduced inside
    each batch, one groupby(user) exchange flags per-user week
    transitions, and a (week) count combiner finishes — only user-week
    pairs and week cells move. Output (week, n_active, n_churned,
    churn_rate)."""
    import pyarrow.compute as pc

    from .nullkeys import null_safe_group_map

    def keep(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        batch = batch.filter(pc.is_valid(ts))
        wk = batch.column(ts_col).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        ) // _WEEK_US  # exact integer floor division (matches SQL //)
        t = pa.table(
            {
                user_col: batch.column(user_col),
                "wk": pa.array(wk.astype(np.int64)),
            }
        )
        # batch-local distinct: at most one row per (user, week) moves
        return t.group_by([user_col, "wk"], use_threads=False).aggregate([])

    pairs = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)

    def per_user(g: pa.Table) -> pa.Table:
        wk = np.unique(g.column("wk").to_numpy(zero_copy_only=False))
        nxt = np.isin(wk + 1, wk, assume_unique=False)
        return pa.table(
            {
                "week": pa.array(wk, pa.int64()),
                "act": pa.array(np.ones(len(wk), np.int64)),
                "chn": pa.array((~nxt).astype(np.int64)),
            }
        )

    flags = null_safe_group_map(pairs, [user_col], per_user)

    def week_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["week"], use_threads=False).aggregate(
            [("act", "sum"), ("chn", "sum")]
        )
        return g.rename_columns(["week", "act", "chn"])

    agg = (
        flags.map_batches(week_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("week")
        .sum(["act", "chn"])
    )

    def finish(batch: pa.Table) -> pa.Table:
        a = batch.column("sum(act)").to_numpy(zero_copy_only=False)
        c = batch.column("sum(chn)").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "week": batch.column("week"),
                "n_active": pa.array(a, pa.int64()),
                "n_churned": pa.array(c, pa.int64()),
                "churn_rate": pa.array(c / a, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def cadence(ds, user_col: str = "user_id", ts_col: str = "ts",
            tiebreak_col: str = "event_id", min_gaps: int = 1):
    """Per-user event cadence: the MEDIAN inter-event gap in
    microseconds over consecutive events in (ts, tiebreak) order, plus
    the gap count. Gaps are exact int64 microseconds; the median of
    ints is an exact half-integer double ((lo + hi) / 2.0,
    bit-deterministic). Users with fewer than min_gaps gaps are
    dropped. One groupby(user) exchange; per-group work is a numpy
    lexsort + diff. Output (user, n_gaps, median_gap_us)."""
    import pyarrow.compute as pc

    from .nullkeys import null_safe_group_map

    def keep(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        return pa.table(
            {
                user_col: batch.column(user_col),
                "us": pc.cast(ts, pa.int64()),
                "tb": batch.column(tiebreak_col),
            }
        ).filter(pc.is_valid(ts))

    proj = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)

    def per_user(g: pa.Table) -> pa.Table:
        us = g.column("us").to_numpy(zero_copy_only=False)
        tb = g.column("tb").to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, us))
        gaps = np.diff(us[order])
        if len(gaps) < min_gaps:
            return pa.table(
                {
                    user_col: g.column(user_col).slice(0, 0),
                    "n_gaps": pa.array([], pa.int64()),
                    "median_gap_us": pa.array([], pa.float64()),
                }
            )
        sg = np.sort(gaps)
        n = len(sg)
        med = (int(sg[(n - 1) // 2]) + int(sg[n // 2])) / 2.0
        return pa.table(
            {
                user_col: g.column(user_col).slice(0, 1),
                "n_gaps": pa.array([n], pa.int64()),
                "median_gap_us": pa.array([med], pa.float64()),
            }
        )

    return null_safe_group_map(proj, [user_col], per_user)


def rfm(ds, key_col: str, ts_col: str, value_col: str,
        n_tiles: int = 4, decimal_scale: int = 2):
    """RFM segmentation: per key, recency_days (days between the key's
    last activity day and the global max day), frequency (row count)
    and monetary (exact integer cents), each scored into SQL-NTILE
    tiles over (metric ASC, key ASC) — tile 1 = most recent / least
    frequent / lowest spend, matching NTILE(n) OVER (ORDER BY metric,
    key). The per-key rollup is one combiner-shaped groupby; each tile
    pass is a range-partitioned global row-number
    (moments.with_global_row_number) over the KEY-domain table, never
    the raw corpus. All outputs are exact integers. Output (key,
    recency_days, frequency, monetary_cents, r_q, f_q, m_q)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Sum

    from .moments import sql_ntile, with_global_row_number
    from .nullkeys import null_safe_group_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        batch = batch.filter(
            pc.and_(pc.is_valid(ts), pc.is_valid(batch.column(key_col)))
        )
        day = pc.cast(pc.cast(batch.column(ts_col), pa.date32()), pa.int32())
        cents = pc.cast(
            pc.round(
                pc.multiply(
                    pc.cast(batch.column(value_col), pa.float64()),
                    10.0 ** decimal_scale,
                )
            ),
            pa.int64(),
        )
        t = pa.table(
            {
                key_col: batch.column(key_col),
                "d": day,
                "one": pa.array(np.ones(batch.num_rows, np.int64)),
                "cents": cents,
            }
        )
        return (
            t.group_by([key_col], use_threads=False)
            .aggregate([("d", "max"), ("one", "sum"), ("cents", "sum")])
            .rename_columns([key_col, "d", "one", "cents"])
        )

    per_key = null_safe_group_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        [key_col],
        [
            Max("d", alias_name="d"),
            Sum("one", alias_name="frequency"),
            Sum("cents", alias_name="monetary_cents"),
        ],
    ).materialize()
    gmax = int(per_key.max("d"))

    def metrics(batch: pa.Table) -> pa.Table:
        d = batch.column("d").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                key_col: batch.column(key_col),
                "recency_days": pa.array(gmax - d, pa.int64()),
                "frequency": pc.cast(batch.column("frequency"), pa.int64()),
                "monetary_cents": pc.cast(batch.column("monetary_cents"), pa.int64()),
            }
        )

    cur = per_key.map_batches(metrics, batch_format="pyarrow", zero_copy_batch=True)
    for metric, out in (
        ("recency_days", "r_q"),
        ("frequency", "f_q"),
        ("monetary_cents", "m_q"),
    ):
        cur, total = with_global_row_number(cur, metric, key_col, out_col="__rn")

        def tile(batch: pa.Table, _n=total, _out=out) -> pa.Table:
            rn = batch.column("__rn").to_numpy(zero_copy_only=False)
            t = sql_ntile(rn.astype(np.int64), _n, n_tiles)
            return batch.drop_columns(["__rn"]).append_column(
                _out, pa.array(t, pa.int64())
            )

        cur = cur.map_batches(tile, batch_format="pyarrow", zero_copy_batch=True)
    return cur


_DAY_US = 24 * 3600 * 1_000_000


def bounce_rate(ds, user_col: str = "user_id", ts_col: str = "ts",
                tiebreak_col: str = "event_id", gap_s: int = 1800):
    """Daily bounce rate: sessions split per user on gaps strictly
    greater than gap_s seconds (events in (ts, tiebreak) order); a
    BOUNCE is a single-event session; sessions are attributed to the
    epoch-day index (first_event_us // day_us, exact integer) of their
    first event. One groupby(user) exchange emits one (day, bounce)
    row per session; a day combiner finishes. bounce_rate =
    n_bounces / n_sessions is ONE exact int division. Output (day,
    n_sessions, n_bounces, bounce_rate)."""
    import pyarrow.compute as pc

    from .nullkeys import null_safe_group_map

    gap_us = gap_s * 1_000_000

    def keep(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        return pa.table(
            {
                user_col: batch.column(user_col),
                "us": pc.cast(ts, pa.int64()),
                "tb": batch.column(tiebreak_col),
            }
        ).filter(pc.is_valid(ts))

    proj = ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)

    def per_user(g: pa.Table) -> pa.Table:
        us = g.column("us").to_numpy(zero_copy_only=False)
        tb = g.column("tb").to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, us))
        su = us[order]
        new_s = np.r_[True, np.diff(su) > gap_us]
        starts = np.flatnonzero(new_s)
        sizes = np.diff(np.r_[starts, len(su)])
        days = su[starts] // _DAY_US
        return pa.table(
            {
                "day": pa.array(days.astype(np.int64)),
                "one": pa.array(np.ones(len(starts), np.int64)),
                "bounce": pa.array((sizes == 1).astype(np.int64)),
            }
        )

    sess = null_safe_group_map(proj, [user_col], per_user)

    def day_partial(batch: pa.Table) -> pa.Table:
        return (
            batch.group_by(["day"], use_threads=False)
            .aggregate([("one", "sum"), ("bounce", "sum")])
            .rename_columns(["day", "one", "bounce"])
        )

    agg = (
        sess.map_batches(day_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("day")
        .sum(["one", "bounce"])
    )

    def finish(batch: pa.Table) -> pa.Table:
        s = batch.column("sum(one)").to_numpy(zero_copy_only=False)
        b = batch.column("sum(bounce)").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "day": batch.column("day"),
                "n_sessions": pa.array(s, pa.int64()),
                "n_bounces": pa.array(b, pa.int64()),
                "bounce_rate": pa.array(b / s, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def engagement_curve(ds, user_col: str = "user_id", max_k: int = 10):
    """Engagement curve: for k = 1..max_k, how many users have at
    least k events and what fraction of all users that is (ONE exact
    int division per row). The exchange is the per-user count rollup
    (combiner first); the count-of-counts histogram is value-domain
    bounded and evaluates driver-side. Output (k, n_users, frac)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .nullkeys import null_safe_group_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                user_col: batch.column(user_col),
                "one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        ).filter(pc.is_valid(batch.column(user_col)))
        return (
            t.group_by([user_col], use_threads=False)
            .aggregate([("one", "sum")])
            .rename_columns([user_col, "one"])
        )

    per_user = null_safe_group_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        [user_col],
        [Sum("one", alias_name="n")],
    )

    def hist_partial(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch.column("n"), pa.int64())
        t = pa.table(
            {"n": n, "u": pa.array(np.ones(batch.num_rows, np.int64))}
        )
        return (
            t.group_by(["n"], use_threads=False)
            .aggregate([("u", "sum")])
            .rename_columns(["n", "u"])
        )

    hist = {
        int(r["n"]): int(r["sum(u)"])
        for r in per_user.map_batches(
            hist_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("n")
        .sum("u")
        .take_all()
    }
    total = sum(hist.values())
    rows = []
    for k in range(1, max_k + 1):
        n_k = sum(u for n, u in hist.items() if n >= k)
        rows.append(
            {"k": k, "n_users": n_k, "frac": n_k / total if total else None}
        )
    return pa.Table.from_pylist(rows)
