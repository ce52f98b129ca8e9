"""Windowed aggregates over stream-shaped tables (events).

Ray Data has no event-time windowing; per the guide these are built
from groupby + map_groups with an explicit ordering assumption: events
for one key are sorted by ts INSIDE each group before windowing (the
groupby shuffle collects a key's rows; order across batches is not
assumed).

* tumbling_window — fixed-size windows via floor_temporal + grouped
  aggregate (no per-row Python).
* session_windows — gap-based sessions per key: sorted-group cumsum of
  (gap exceeded) flags; exactly reproducible in SQL with window
  functions, so it carries a DuckDB oracle.
* sliding_window — each row replicated into the windows covering it
  (slide | size), then a grouped aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_window(ds, ts_col: str, key_col: str | None, window: str, aggs):
    """window: pyarrow floor_temporal unit ('hour', 'day', 'minute')."""

    def add_window(t: pa.Table) -> pa.Table:
        return t.append_column("window_start", pc.floor_temporal(t[ts_col], unit=window))

    keys = ["window_start"] if key_col is None else [key_col, "window_start"]
    return ds.map_batches(add_window, batch_format="pyarrow").groupby(keys).aggregate(*aggs)


def session_windows(ds, key_col: str, ts_col: str, gap_minutes: int = 30):
    """Per-key gap sessions. Output: key, session_id (1-based per key),
    session_start, session_end, n_events."""
    gap_us = gap_minutes * 60 * 1_000_000

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(ts_col)
        ts = g[ts_col].astype("int64").to_numpy()
        new_session = np.ones(len(g), dtype=np.int64)
        new_session[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        sid = np.cumsum(new_session)
        out = (
            pd.DataFrame({key_col: g[key_col].to_numpy(), "session_id": sid, ts_col: g[ts_col].to_numpy()})
            .groupby([key_col, "session_id"], as_index=False)
            .agg(session_start=(ts_col, "min"), session_end=(ts_col, "max"), n_events=(ts_col, "count"))
        )
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return ds.groupby(key_col).map_groups(sessions, batch_format="pandas")


def sliding_window(ds, ts_col: str, size_minutes: int, slide_minutes: int, aggs, key_col: str | None = None):
    """Replicate each row into the size/slide windows covering it, then
    aggregate per window_start (shuffle payload grows by size/slide —
    callers pick ratios accordingly)."""
    size_us = size_minutes * 60 * 1_000_000
    slide_us = slide_minutes * 60 * 1_000_000
    n_windows = (size_us + slide_us - 1) // slide_us

    def explode(t: pa.Table) -> pa.Table:
        ts = t[ts_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(ts)
        parts = []
        for k in range(int(n_windows)):
            w_start = ((ts - k * slide_us) // slide_us) * slide_us
            keep = ts < w_start + size_us
            sub = t.filter(pa.array(keep)).append_column(
                "window_start",
                pa.array(w_start[keep], type=pa.int64()).cast(pa.timestamp("us")),
            )
            parts.append(sub)
        return pa.concat_tables(parts)

    keys = ["window_start"] if key_col is None else [key_col, "window_start"]
    return ds.map_batches(explode, batch_format="pyarrow").groupby(keys).aggregate(*aggs)
