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


def _key_strings(batch: pa.Table, columns: list[str]) -> pa.Array:
    """One string (or binary, when any component is binary — raw bytes
    need not be valid UTF-8, so no string cast) per row: tuple
    identity for hashing, joined by an unlikely separator. NULL if ANY
    component is null — SQL COUNT(DISTINCT) semantics, where
    null-containing tuples never count as distinct."""
    import pyarrow.compute as pc

    def _is_bin(t: pa.DataType) -> bool:
        return pa.types.is_binary(t) or pa.types.is_large_binary(t)

    cols = [batch.column(c) for c in columns]
    if any(_is_bin(c.type) for c in cols):
        parts = [c if _is_bin(c.type) else pc.cast(pc.cast(c, pa.string()), pa.binary()) for c in cols]
        sep: bytes | str = _SEP.encode()
    else:
        parts = [pc.cast(c, pa.string()) for c in cols]
        sep = _SEP
    if len(parts) == 1:
        out = parts[0]
    else:
        # binary_join_element_wise propagates any null component
        out = parts[0]
        for p in parts[1:]:
            out = pc.binary_join_element_wise(out, p, sep)
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def _hash_counts(ds, columns: list[str]):
    """(h1, h2, cnt, nulls) per batch: one row per batch-distinct
    NON-NULL key tuple, with the batch's null-tuple row count carried
    on the first emitted row (0 elsewhere) so one pipeline feeds both
    the distinct sum and the null total."""
    from .profile import _pair_unique

    def rows(batch: pa.Table) -> pa.Table:
        keys = _key_strings(batch, columns)
        n_null = keys.null_count
        keys = keys.drop_null()
        if len(keys):
            hashed = content_hash_batch(pa.table({"v": keys}), "v")
            h1, h2, cnt = _pair_unique(
                hashed.column("h1").to_numpy(zero_copy_only=False),
                hashed.column("h2").to_numpy(zero_copy_only=False),
                return_counts=True,
            )
            nulls = np.zeros(len(h1), dtype=np.int64)
            nulls[0] = n_null
            return pa.table(
                {
                    "h1": pa.array(h1),
                    "h2": pa.array(h2),
                    "cnt": pa.array(cnt),
                    "nulls": pa.array(nulls),
                }
            )
        return pa.table(
            {
                "h1": pa.array([None], pa.int64()),
                "h2": pa.array([None], pa.int64()),
                "cnt": pa.array([0], pa.int64()),
                "nulls": pa.array([n_null], pa.int64()),
            }
        )

    return ds.map_batches(rows, batch_format="pyarrow", zero_copy_batch=True)


def _unique_violations(ds, columns: list[str]) -> int:
    """COUNT(*) - COUNT(DISTINCT tuple) with SQL null semantics: every
    null-containing tuple counts toward COUNT(*) but never toward
    DISTINCT, so each such row is a violation, plus every extra copy
    of a non-null key. One bounded pipeline: groupby over distinct-key
    rows, then a vectorized extras sum."""
    from ray.data.aggregate import Sum

    per_key = _hash_counts(ds, columns).groupby(["h1", "h2"]).sum(["cnt", "nulls"])

    def extras(batch: pa.Table) -> pa.Table:
        c = batch.column("sum(cnt)").to_numpy(zero_copy_only=False)
        n = batch.column("sum(nulls)").to_numpy(zero_copy_only=False)
        # the all-null sentinel group has cnt 0: clamp, don't credit -1
        x = int(np.maximum(c - 1, 0).sum() + n.sum())
        return pa.table({"x": pa.array([x], pa.int64())})

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

    # one vectorized sum per key, then a vectorized orphan filter —
    # no per-key Python (a map_groups here would cost one UDF call per
    # distinct parent key)
    per_key = tagged.groupby("k").sum(["cnt", "parent"])

    def orphans(batch: pa.Table) -> pa.Table:
        cnt = batch.column("sum(cnt)").to_numpy(zero_copy_only=False)
        par = batch.column("sum(parent)").to_numpy(zero_copy_only=False)
        return pa.table({"x": pa.array([int(cnt[par == 0].sum())], pa.int64())})

    out = per_key.map_batches(orphans, batch_format="pyarrow").aggregate(
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
      {"rule": "unique", "columns": [c, ...]}  # violations =
          COUNT(*) - COUNT(DISTINCT tuple), SQL nulls: a tuple with
          any null component never counts as distinct
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


def validate_encoded(in_dir: str | list[str], rules: list[dict]) -> pa.Table:
    """not_null and range contracts over an ENCODED dataset, answered
    from stripe statistics wherever they decide the verdict — the
    predicate-skipping stack applied to data validation:

    * not_null — exact from per-stripe null counts, ZERO value streams
      decoded.
    * range — a stripe whose [min, max] sits inside the bounds is
      proven clean (skipped); one entirely outside contributes all its
      non-null rows; only UNDECIDED stripes (range straddles a bound,
      or the writer kept no min/max for the type) get a projected
      decode of that one column. On contract-conforming data the whole
      check is metadata-only.

    Rules: {"rule": "not_null"|"range", "column": c, "min":, "max":}
    (same semantics as validate(); other rule kinds need values — run
    validate() on the decoded Dataset for those; range bounds on
    temporal columns take datetime/date values, translated into the
    epoch-int stats domain for the metadata verdicts and applied typed
    in the residual decode). Returns the same (rule, col, violations)
    table."""
    import json

    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    from .. import checkpoint, pipeline, stripe as stripe_mod

    first_file = (
        checkpoint.job_output_files(in_dir)[0] if isinstance(in_dir, str) else sorted(in_dir)[0]
    )
    import pyarrow.parquet as pq

    schema = stripe_mod._deserialize_schema(
        pq.read_table(first_file, columns=["schema_ipc"]).column(0)[0].as_py()
    )
    specs = []
    for r in rules:
        if r["rule"] not in ("not_null", "range"):
            raise ValueError(
                f"validate_encoded supports not_null/range only, got {r['rule']!r}"
            )
        c = r["column"]
        if schema.get_field_index(c) < 0:
            raise KeyError(f"column {c!r} not in encoded dataset (have {schema.names})")
        specs.append((r["rule"], c, r.get("min"), r.get("max")))

    def _stat_domain(c: str, lo, hi):
        """(stats-domain bounds, trust) for the classify pass: temporal
        bounds translate to the epoch ints stats store; decimal min/max
        stats are lossy floats (advisory, per stats.py) so they NEVER
        decide a verdict — every non-null-free stripe is undecided."""
        t = schema.field(c).type
        if pa.types.is_decimal(t):
            return None, None, False
        if pa.types.is_timestamp(t):
            return stripe_mod.stat_bound(lo, t.unit), stripe_mod.stat_bound(hi, t.unit), True
        if pa.types.is_date(t):
            unit = "D" if t.bit_width == 32 else "ms"
            return stripe_mod.stat_bound(lo, unit), stripe_mod.stat_bound(hi, unit), True
        return lo, hi, True

    stat_specs = []
    for kind, c, lo, hi in specs:
        slo, shi, trust = _stat_domain(c, lo, hi)
        # a bound the stats domain cannot express (e.g. unknown unit)
        # must not silently weaken the check: distrust the stats
        if trust and ((lo is not None and slo is None) or (hi is not None and shi is None)):
            trust = False
        stat_specs.append((kind, c, slo, shi, trust))

    meta = pipeline.read_encoded(in_dir, metadata_only=True, include_paths=True)

    def classify(batch: pa.Table) -> pa.Table:
        ri_l, key_l, cnt_l, und_l = [], [], [], []
        keys = batch.column("stripe_key").to_pylist()
        nrows = batch.column("n_rows").to_pylist()
        for sj, key, n in zip(batch.column("stats").to_pylist(), keys, nrows):
            st = json.loads(sj)
            for ri, (kind, c, lo, hi, trust) in enumerate(stat_specs):
                s = st.get(c, {})
                nulls = int(s.get("null_count", 0))
                nn = int(s.get("count", n)) - nulls
                if kind == "not_null":
                    if nulls:
                        ri_l.append(ri); key_l.append(key); cnt_l.append(nulls); und_l.append(False)
                    continue
                if nn == 0:
                    continue
                mn, mx = s.get("min"), s.get("max")
                if not trust or mn is None or mx is None:
                    ri_l.append(ri); key_l.append(key); cnt_l.append(0); und_l.append(True)
                elif (lo is None or mn >= lo) and (hi is None or mx <= hi):
                    continue  # proven clean
                elif (hi is not None and mn > hi) or (lo is not None and mx < lo):
                    ri_l.append(ri); key_l.append(key); cnt_l.append(nn); und_l.append(False)
                else:
                    ri_l.append(ri); key_l.append(key); cnt_l.append(0); und_l.append(True)
        return pa.table(
            {
                "ri": pa.array(ri_l, pa.int32()),
                "key": pa.array(key_l, pa.string()),
                "cnt": pa.array(cnt_l, pa.int64()),
                "und": pa.array(und_l, pa.bool_()),
            }
        )

    verdicts = meta.map_batches(classify, batch_format="pyarrow").take_all()
    definite = np.zeros(len(specs), dtype=np.int64)
    undecided: dict[int, set[str]] = {}
    for r in verdicts:
        if r["und"]:
            undecided.setdefault(r["ri"], set()).add(r["key"])
        else:
            definite[r["ri"]] += r["cnt"]

    if undecided:
        # metadata-first fetch (the prune_read pattern): filter the
        # METADATA rows to undecided stripe keys — a vectorized is_in
        # over tiny rows — then _FetchStripes reads only the parquet
        # row groups holding survivors. Blob bytes read scale with
        # undecided stripes, never the corpus.
        keyset = pa.array(sorted(set().union(*undecided.values())))
        und_ref = ray.put(undecided)

        def keep_undecided(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.is_in(batch.column("stripe_key"), value_set=keyset))

        enc = meta.map_batches(keep_undecided, batch_format="pyarrow").map_batches(
            pipeline._FetchStripes(), batch_format="pyarrow"
        )

        def residual(batch: pa.Table) -> pa.Table:
            und = ray.get(und_ref)
            counts = np.zeros(len(specs), dtype=np.int64)
            for i in range(batch.num_rows):
                key = batch.column("stripe_key")[i].as_py()
                need = [ri for ri, ks in und.items() if key in ks]
                if not need:
                    continue
                row = {c: batch.column(c)[i].as_py() for c in batch.column_names}
                want = sorted({specs[ri][1] for ri in need})
                t = stripe_mod.decode_stripe(row, columns=want)
                for ri in need:
                    _, c, lo, hi = specs[ri]
                    col = t.column(c)
                    bad = pa.array(np.zeros(len(col), dtype=bool))
                    if lo is not None:
                        bad = pc.or_(bad, pc.less(col, lo))
                    if hi is not None:
                        bad = pc.or_(bad, pc.greater(col, hi))
                    counts[ri] += int(pc.sum(bad).as_py() or 0)
            return pa.table({f"r{ri}": pa.array([int(counts[ri])], pa.int64()) for ri in range(len(specs))})

        got = enc.map_batches(residual, batch_format="pyarrow").aggregate(
            *[Sum(f"r{ri}", alias_name=f"r{ri}") for ri in range(len(specs))]
        )
        for ri in range(len(specs)):
            definite[ri] += int(got[f"r{ri}"] or 0)

    return pa.table(
        {
            "rule": pa.array([k for k, _, _, _ in specs], pa.string()),
            "col": pa.array([c for _, c, _, _ in specs], pa.string()),
            "violations": pa.array(definite.tolist(), pa.int64()),
        }
    )


def table_checksum(ds, columns: list[str]) -> pa.Table:
    """Order-independent content checksum: the mod-2^64 SUM of per-row
    FNV fingerprints of the `sep`-joined column strings, plus the row
    count. Two replicas / two engines holding the same rows in ANY
    order and ANY partitioning produce the same (n_rows, checksum) —
    the cheap anti-entropy check before trusting a copy (a full sorted
    compare, verify_roundtrip, costs a shuffle; this costs one pass).
    Rows join with the \x1f unit separator (_key_strings); columns
    should stringify identically across engines: integers and plain
    strings are safe, floats/timestamps are not (format drift). Rows
    where any component is NULL hash as the empty-ish null fingerprint
    consistently (choose non-null columns for cross-engine checks).

    Combiner-shaped: each batch reduces to one (count, wrapped-sum)
    row; uint64 wrap-around addition is associative, so partials merge
    in any order."""
    import pyarrow.compute as pc

    from .text import fingerprint_batch

    def partial(batch: pa.Table) -> pa.Table:
        joined = _key_strings(batch, columns)
        fp = (
            fingerprint_batch(pa.table({"k": joined}), "k")
            .column("fingerprint")
            .to_numpy(zero_copy_only=False)
            .view(np.uint64)
        )
        total = np.add.reduce(fp, dtype=np.uint64) if len(fp) else np.uint64(0)
        return pa.table(
            {
                "n": pa.array([batch.num_rows], pa.int64()),
                "s": pa.array([int(total)], pa.uint64()),
            }
        )

    rows = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).take_all()
    n = sum(r["n"] for r in rows)
    s = 0
    for r in rows:
        s = (s + int(r["s"])) % (1 << 64)
    return pa.table(
        {
            "n_rows": pa.array([n], pa.int64()),
            "checksum": pa.array([s], pa.uint64()),
        }
    )
