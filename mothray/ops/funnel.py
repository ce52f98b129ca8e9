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
