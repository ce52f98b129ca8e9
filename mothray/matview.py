"""Incremental materialized aggregate views over versioned tables.

A view is a grouped aggregate (count / sum / min / max — the
self-mergeable ones) whose result is persisted next to the version log
and kept current by folding in ONLY the data that changed:

* `create_view` computes the aggregate over the table's current
  version (one distributed scan) and stores the small grouped state
  under `<dir>/_views/<name>/`.
* `refresh_view` diffs the latest manifest against the one the view
  reflects. Appends / compactions that only ADD part files aggregate
  just the new files and MERGE group-wise into the stored state
  (sum += sum, count += count, min = min(min), max = max(max)) — the
  classic incremental-view-maintenance fast path (self-maintainable
  aggregates; Gupta & Mumick, "Maintenance of Materialized Views").
  A version that REWROTE or REMOVED a reflected file (DELETE, UPDATE,
  MERGE, OPTIMIZE) invalidates per-file deltas, so the view falls
  back to a full recompute — correct under every op, fast under the
  dominant one (append-mostly ingest).
* `read_view` returns the stored state instantly — no scan.

At 100 TB the point is that steady-state ingest touches only the delta:
a daily append re-aggregates the day, not the corpus; the exchange is
one small grouped table per refresh. View states are grouped results
(bounded by key cardinality), so the driver-side merge is tiny.

No reference analog (the reference has no table state at all,
pkg/store/MothDataSink.go) — this extends the snapshot layer
(`versions.py`) the same way OPTIMIZE/time-travel do.

`avg` is intentionally absent as a stored aggregate: persist sum +
count and divide at read time (exactly what SQL engines' IVM does).
Count-distinct is not self-mergeable and is excluded (an HLL-backed
approximate view would merge; see ops/sketch.py).
"""

from __future__ import annotations

import json
import os

import numpy as np  # noqa: F401  (kept: callers' fns often need it)
import pyarrow as pa
import pyarrow.parquet as pq

from . import versions

_FNS = ("count", "sum", "min", "max")


def _view_dir(table_dir: str, name: str) -> str:
    return os.path.join(table_dir, "_views", name)


def _normalize(aggs: list[tuple]) -> list[tuple[str, str, str]]:
    out = []
    for a in aggs:
        col, fn = a[0], a[1]
        alias = a[2] if len(a) > 2 else f"{fn}_{col}"
        if fn not in _FNS:
            raise ValueError(f"unsupported view aggregate {fn!r} (use {_FNS})")
        out.append((col, fn, alias))
    return out


def _grouped_agg(ds, keys: list[str], aggs: list[tuple[str, str, str]]) -> pa.Table:
    """Distributed grouped aggregate: per-batch Arrow combiner, then a
    null-safe group exchange of partials, collected to one small table
    (group-cardinality rows)."""
    from ray.data.aggregate import Max, Min, Sum

    from .ops.nullkeys import null_safe_group_aggregate

    value_cols = sorted({c for c, _, _ in aggs})

    def partial(batch: pa.Table) -> pa.Table:
        cols = {k: batch.column(k) for k in keys}
        cols["__rows"] = pa.array(np.ones(batch.num_rows, dtype=np.int64))
        for col in value_cols:
            cols.setdefault(col, batch.column(col))
        t = pa.table(cols)
        specs = [("__rows", "sum")]
        names = ["__count"]
        for col, fn, alias in aggs:
            specs.append((col, "count" if fn == "count" else fn))
            names.append(alias)
        agg = t.group_by(keys).aggregate(specs)
        return agg.rename_columns(keys + names)

    ray_aggs = [Sum("__count", alias_name="__count")]
    for col, fn, alias in aggs:
        if fn in ("count", "sum"):
            ray_aggs.append(Sum(alias, alias_name=alias))
        elif fn == "min":
            ray_aggs.append(Min(alias, alias_name=alias))
        else:
            ray_aggs.append(Max(alias, alias_name=alias))

    totals = null_safe_group_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        keys,
        ray_aggs,
    )
    t = pa.concat_tables(
        totals.iter_batches(batch_format="pyarrow", batch_size=None)
    ) if totals.count() else None
    if t is None:
        cols = {k: pa.array([], pa.string()) for k in keys}
        cols["__count"] = pa.array([], pa.int64())
        for _, _, alias in aggs:
            cols[alias] = pa.array([], pa.float64())
        t = pa.table(cols)
    order = keys + ["__count"] + [alias for _, _, alias in aggs]
    return t.select(order).sort_by([(k, "ascending") for k in keys])


def _merge_states(a: pa.Table, b: pa.Table, keys: list[str],
                  aggs: list[tuple[str, str, str]]) -> pa.Table:
    """Group-wise merge of two view states (tiny, driver-side)."""
    both = pa.concat_tables([a, b], promote_options="permissive")
    specs = [("__count", "sum")]
    names = ["__count"]
    for col, fn, alias in aggs:
        specs.append((alias, "sum" if fn in ("count", "sum") else fn))
        names.append(alias)
    merged = both.group_by(keys).aggregate(specs).rename_columns(keys + names)
    order = keys + ["__count"] + [alias for _, _, alias in aggs]
    return merged.select(order).sort_by([(k, "ascending") for k in keys])


def _decode_files(fs: list[str], columns: list[str]):
    from . import pipeline

    return pipeline.decode_dataset(pipeline.read_encoded(fs), columns=columns)


def _scan_head(table_dir: str, columns: list[str]):
    """Full-table scan for (re)computes — through scan_version so
    active deletion vectors mask correctly."""
    return versions.scan_version(table_dir, columns=columns)


def create_view(table_dir: str, name: str, keys: list[str],
                aggs: list[tuple], replace: bool = False) -> dict:
    """Materialize the view over the table's LATEST version. `aggs` is
    a list of (column, fn[, alias]) with fn in count|sum|min|max."""
    naggs = _normalize(aggs)
    vdir = _view_dir(table_dir, name)
    if os.path.exists(os.path.join(vdir, "spec.json")) and not replace:
        raise FileExistsError(f"view {name!r} exists (replace=True to rebuild)")
    m = versions.manifest(table_dir)
    cols = sorted(set(keys) | {c for c, _, _ in naggs})
    state = _grouped_agg(_scan_head(table_dir, cols), keys, naggs)
    os.makedirs(vdir, exist_ok=True)
    pq.write_table(state, os.path.join(vdir, "state.parquet"))
    spec = {
        "name": name,
        "keys": keys,
        "aggs": [list(a) for a in naggs],
        "version": m["version"],
        "files": m["files"],
        "deletes": m.get("deletes", {}),
    }
    tmp = os.path.join(vdir, "spec.json.tmp")
    with open(tmp, "w") as f:
        json.dump(spec, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(vdir, "spec.json"))
    return {"view": name, "version": m["version"], "groups": state.num_rows,
            "mode": "full"}


def _spec(table_dir: str, name: str) -> dict:
    with open(os.path.join(_view_dir(table_dir, name), "spec.json")) as f:
        return json.load(f)


def refresh_view(table_dir: str, name: str) -> dict:
    """Bring the view up to the table's latest version. Add-only
    version chains (appends, file adds) fold in just the NEW part
    files; anything that removed/rewrote a reflected file triggers a
    full recompute."""
    spec = _spec(table_dir, name)
    keys = spec["keys"]
    naggs = [tuple(a) for a in spec["aggs"]]
    m = versions.manifest(table_dir)
    if m["version"] == spec["version"]:
        return {"view": name, "version": m["version"], "mode": "noop",
                "new_files": 0}
    old_files = set(spec["files"])
    new_files = [f for f in m["files"] if f not in old_files]
    removed = old_files - set(m["files"])
    dv_changed = m.get("deletes", {}) != spec.get("deletes", {})
    vdir = _view_dir(table_dir, name)
    cols = sorted(set(keys) | {c for c, _, _ in naggs})
    if removed or dv_changed:
        # a rewritten/removed file or a deletion-vector change
        # invalidates per-file deltas (DV deltas are anti-rows; min/max
        # cannot be incrementally maintained under deletes)
        mode = "full"
        state = _grouped_agg(_scan_head(table_dir, cols), keys, naggs)
    else:
        mode = "incremental"
        state = pq.read_table(os.path.join(vdir, "state.parquet"))
        if new_files:
            delta = _grouped_agg(
                _decode_files([os.path.join(table_dir, f) for f in new_files], cols),
                keys, naggs,
            )
            state = _merge_states(state, delta, keys, naggs)
    pq.write_table(state, os.path.join(vdir, "state.parquet"))
    spec.update(
        {"version": m["version"], "files": m["files"],
         "deletes": m.get("deletes", {})}
    )
    tmp = os.path.join(vdir, "spec.json.tmp")
    with open(tmp, "w") as f:
        json.dump(spec, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(vdir, "spec.json"))
    return {"view": name, "version": m["version"], "mode": mode,
            "new_files": len(new_files), "groups": state.num_rows}


def read_view(table_dir: str, name: str, with_count: bool = False) -> pa.Table:
    """The stored state — no scan. `__count` (group row count) is
    internal bookkeeping unless requested."""
    t = pq.read_table(os.path.join(_view_dir(table_dir, name), "state.parquet"))
    return t if with_count else t.drop_columns(["__count"])
