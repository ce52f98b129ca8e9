"""Distributed data-quality validation (constraint checking).

The pre-encode triage step of a corpus pipeline: before committing
100 TB to an encode, check the contracts the downstream consumers
assume — no nulls where none are allowed, keys unique, values in
range/set/pattern, references resolvable. Reference parity: orc-go
validates only physical invariants at write time (type/chunk shape,
pkg/store MothWriter argument checks); this op lifts the idea to
LOGICAL row contracts, the Great-Expectations/dbt-tests shape.

Every rule is exact and SQL-checkable, and every shape is bounded:

* row-local rules (not_null / range / regex / in_set) fuse into ONE
  partial pass — a single tiny counters row per batch, summed by one
  Dataset.aggregate().
* unique — the 128-bit hash-pair exchange (batch-deduped (h1, h2,
  cnt) rows; only distinct keys cross the wire), violations =
  sum(cnt - 1) over key groups.
* foreign_key — DISTINCT child keys union DISTINCT parent keys with
  a side tag, one groupby: a key group with no parent row emits its
  child multiplicity. No join operator involved, so an empty parent
  (or child) side degrades gracefully instead of tripping Acero's
  empty-build-side failure.

Returns one (rule, column, violations) row per rule — a table small
enough to assert on, alert on, or persist next to the dataset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import content_hash_batch

_SEP = "\x1f"
_NULL = "\x00\x00N"


def _key_strings(batch: pa.Table, columns: list[str]) -> pa.Array:
    """One string per row: null-sentinel-filled casts joined by an
    unlikely separator (tuple identity for hashing)."""
    import pyarrow.compute as pc

    parts = [pc.fill_null(pc.cast(batch.column(c), pa.string()), _NULL) for c in columns]
    if len(parts) == 1:
        return parts[0].combine_chunks() if isinstance(parts[0], pa.ChunkedArray) else parts[0]
    out = parts[0]
    for p in parts[1:]:
        out = pc.binary_join_element_wise(out, p, _SEP)
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def _hash_counts(ds, columns: list[str]):
    """(h1, h2, cnt) per batch-distinct key tuple."""

    def rows(batch: pa.Table) -> pa.Table:
        keys = _key_strings(batch, columns)
        hashed = content_hash_batch(pa.table({"v": keys}), "v")
        h1 = hashed.column("h1").to_numpy(zero_copy_only=False)
        h2 = hashed.column("h2").to_numpy(zero_copy_only=False)
        order = np.lexsort((h2, h1))
        a, b = h1[order], h2[order]
        first = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
        run = np.cumsum(first) - 1
        cnt = np.bincount(run)
        return pa.table(
            {
                "h1": pa.array(a[first]),
                "h2": pa.array(b[first]),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    return ds.map_batches(rows, batch_format="pyarrow", zero_copy_batch=True)


def _unique_violations(ds, columns: list[str]) -> int:
    """COUNT(*) - COUNT(DISTINCT tuple): extra copies beyond the first
    per key. Two bounded aggregations over distinct-key rows."""
    from ray.data.aggregate import Sum

    per_key = _hash_counts(ds, columns).groupby(["h1", "h2"]).sum("cnt")

    def extras(batch: pa.Table) -> pa.Table:
        c = batch.column("sum(cnt)").to_numpy(zero_copy_only=False)
        return pa.table({"x": pa.array([int((c - 1).sum())], pa.int64())})

    out = per_key.map_batches(extras, batch_format="pyarrow").aggregate(Sum("x", alias_name="x"))
    return int(out["x"] or 0)


def _fk_violations(ds, column: str, ref, ref_column: str) -> int:
    """Child rows (non-null) whose value has no parent row. Distinct
    keys + side tag -> one groupby; no join, so empty sides are fine."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def child_rows(batch: pa.Table) -> pa.Table:
        keys = pc.drop_null(pc.cast(batch.column(column), pa.string()))
        keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
        counts = pa.table({"k": keys}).group_by("k", use_threads=False).aggregate([("k", "count")])
        return pa.table(
            {
                "k": counts.column("k"),
                "cnt": pc.cast(counts.column("k_count"), pa.int64()),
                "parent": pa.array(np.zeros(counts.num_rows, dtype=np.int64)),
            }
        )

    def parent_rows(batch: pa.Table) -> pa.Table:
        keys = pc.unique(pc.drop_null(pc.cast(batch.column(ref_column), pa.string())))
        return pa.table(
            {
                "k": keys,
                "cnt": pa.array(np.zeros(len(keys), dtype=np.int64)),
                "parent": pa.array(np.ones(len(keys), dtype=np.int64)),
            }
        )

    tagged = ds.map_batches(child_rows, batch_format="pyarrow", zero_copy_batch=True).union(
        ref.map_batches(parent_rows, batch_format="pyarrow", zero_copy_batch=True)
    )

    def orphans(group: pa.Table) -> pa.Table:
        has_parent = bool(
            np.any(group.column("parent").to_numpy(zero_copy_only=False) > 0)
        )
        n = 0 if has_parent else int(group.column("cnt").to_numpy(zero_copy_only=False).sum())
        return pa.table({"x": pa.array([n], pa.int64())})

    out = tagged.groupby("k").map_groups(orphans, batch_format="pyarrow").aggregate(
        Sum("x", alias_name="x")
    )
    return int(out["x"] or 0)


def validate(ds, rules: list[dict]) -> pa.Table:
    """Evaluate `rules` and return (rule, column, violations) per rule.

    Supported rules (each a dict):
      {"rule": "not_null", "column": c}
      {"rule": "range", "column": c, "min": lo, "max": hi}  # inclusive;
          either bound optional; nulls do not violate
      {"rule": "regex", "column": c, "pattern": p}  # non-null must match
      {"rule": "in_set", "column": c, "values": [...]}  # non-null must be in
      {"rule": "unique", "columns": [c, ...]}
      {"rule": "foreign_key", "column": c, "ref": <Dataset>,
       "ref_column": rc}  # non-null c must exist in ref[rc]
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    row_local = [r for r in rules if r["rule"] in ("not_null", "range", "regex", "in_set")]
    counters = {}
    if row_local:

        def partial(batch: pa.Table) -> pa.Table:
            out = {}
            for i, r in enumerate(row_local):
                col = batch.column(r["column"])
                col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                kind = r["rule"]
                if kind == "not_null":
                    v = col.null_count
                elif kind == "range":
                    bad = pa.array(np.zeros(len(col), dtype=bool))
                    if r.get("min") is not None:
                        bad = pc.or_(bad, pc.less(col, r["min"]))
                    if r.get("max") is not None:
                        bad = pc.or_(bad, pc.greater(col, r["max"]))
                    v = pc.sum(bad).as_py() or 0
                elif kind == "regex":
                    ok = pc.match_substring_regex(col, r["pattern"])
                    v = pc.sum(pc.invert(ok)).as_py() or 0
                else:  # in_set
                    ok = pc.is_in(col, value_set=pa.array(r["values"]))
                    v = pc.sum(pc.and_(pc.invert(ok), col.is_valid())).as_py() or 0
                out[f"r{i}"] = pa.array([int(v)], pa.int64())
            return pa.table(out)

        aggs = [Sum(f"r{i}", alias_name=f"r{i}") for i in range(len(row_local))]
        got = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).aggregate(
            *aggs
        )
        for i, r in enumerate(row_local):
            counters[id(r)] = int(got[f"r{i}"] or 0)

    names, cols, viols = [], [], []
    for r in rules:
        kind = r["rule"]
        if kind == "unique":
            v = _unique_violations(ds, list(r["columns"]))
            c = ",".join(r["columns"])
        elif kind == "foreign_key":
            v = _fk_violations(ds, r["column"], r["ref"], r["ref_column"])
            c = r["column"]
        else:
            v = counters[id(r)]
            c = r["column"]
        names.append(kind)
        cols.append(c)
        viols.append(v)
    return pa.table(
        {
            "rule": pa.array(names, pa.string()),
            "col": pa.array(cols, pa.string()),
            "violations": pa.array(viols, pa.int64()),
        }
    )
