"""Distributed per-column data profiling (a DuckDB-SUMMARIZE-alike).

profile() answers "what is in this table" — row count and, per column,
null count, exact distinct count, and typed min/max — without ever
materializing the corpus on the driver. Reference parity: orc-go's
statistics builders (pkg/store/metadata statistics) expose the same
facts per stripe at WRITE time; this op computes them over any
Dataset at READ/curation time, which is what a corpus-triage step
needs before committing to an encode.

Two bounded passes, both Ray-Data-shaped:

1. wide partials — ONE row per batch holding typed per-column
   partials (rows, nulls, min, max), combined by a single
   Dataset.aggregate() (Sum/Min/Max). Min/max stay in the COLUMN'S
   OWN TYPE until the final render, so "10" < "9" string-ordering
   bugs cannot happen; only the finished scalars render to VARCHAR.
2. distinct exchange — batch-deduped (column, h1, h2) hash pairs
   (the same 128-bit content hash as exact_dedup, so the count is
   exact up to a ~n^2/2^129 collision bound) -> groupby dedup ->
   per-column row counts. Only one fixed-width row per
   batch-distinct value crosses the wire; the values themselves
   never shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import content_hash_batch


def profile_encoded(in_dir: str | list[str], columns: list[str]) -> pa.Table:
    """The profile() surface answered from an ENCODED dataset's stripe
    statistics ONLY — count/nulls/min/max come out of the per-stripe
    stats JSON via pipeline.agg_encoded (zero value-stream bytes
    touched, the footer-stats fast path; reference file-stats merge:
    pkg/store/MothWriter.go:339-353). n_distinct is not derivable from
    writer metadata and reports null — run profile() on the decoded
    Dataset when distincts matter. Same output schema as profile()."""
    from ..pipeline import agg_encoded

    specs: dict[str, tuple] = {"__cnt": ("count_star",)}
    for c in columns:
        specs[f"{c}__nulls"] = ("null_count", c)
        specs[f"{c}__min"] = ("min", c)
        specs[f"{c}__max"] = ("max", c)
    row = agg_encoded(in_dir, specs).to_pylist()[0]

    def render(v) -> str | None:
        return None if v is None else str(v)

    return pa.table(
        {
            "col": pa.array(columns, pa.string()),
            "cnt": pa.array([int(row["__cnt"]) for _ in columns], pa.int64()),
            "null_count": pa.array([int(row[f"{c}__nulls"]) for c in columns], pa.int64()),
            "n_distinct": pa.array([None] * len(columns), pa.int64()),
            "min_val": pa.array([render(row[f"{c}__min"]) for c in columns], pa.string()),
            "max_val": pa.array([render(row[f"{c}__max"]) for c in columns], pa.string()),
        }
    )


def _pair_unique(h1: np.ndarray, h2: np.ndarray, return_counts: bool = False):
    """Unique (h1, h2) pairs via one lexsort (no 128-bit dtype needed);
    optionally with each pair's multiplicity. Shared by the profile
    distinct pass and validate's uniqueness rule."""
    if len(h1) == 0:
        return (h1, h2, np.zeros(0, dtype=np.int64)) if return_counts else (h1, h2)
    order = np.lexsort((h2, h1))
    a, b = h1[order], h2[order]
    keep = np.concatenate(([True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])))
    if not return_counts:
        return a[keep], b[keep]
    run = np.cumsum(keep) - 1
    cnt = np.bincount(run).astype(np.int64)
    return a[keep], b[keep], cnt


def profile(ds, columns: list[str] | None = None, approx_distinct: bool = False) -> pa.Table:
    """One row per column: (col, cnt, null_count, n_distinct, min_val,
    max_val) with min/max rendered as strings (computed typed). Columns
    whose type supports neither ordering nor a string cast (nested
    lists, maps) report null min/max/n_distinct but still count nulls.

    approx_distinct=True swaps the exact distinct exchange (two
    groupby shuffles over distinct-key rows) for one shuffle-free HLL
    pass — a 16 KiB register row per column per batch is all that
    moves. ~0.8% standard error; the right mode when the distinct sets
    themselves are corpus-sized (URLs / hashes at 100 TB)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Min, Sum

    schema = ds.schema().base_schema
    cols = list(columns) if columns is not None else list(schema.names)
    missing = [c for c in cols if c not in schema.names]
    if missing:
        raise KeyError(f"profile columns {missing} not in dataset (have {schema.names})")

    def _orderable(t: pa.DataType) -> bool:
        return (
            pa.types.is_integer(t)
            or pa.types.is_floating(t)
            or pa.types.is_decimal(t)
            or pa.types.is_boolean(t)
            or pa.types.is_string(t)
            or pa.types.is_large_string(t)
            or pa.types.is_binary(t)
            or pa.types.is_large_binary(t)
            or pa.types.is_temporal(t)
        )

    ordered = {c for c in cols if _orderable(schema.field(c).type)}

    def partials(batch: pa.Table) -> pa.Table:
        out: dict[str, pa.Array] = {"__rows": pa.array([batch.num_rows], pa.int64())}
        for c in cols:
            col = batch.column(c)
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            out[f"{c}__nulls"] = pa.array([col.null_count], pa.int64())
            if c in ordered:
                if pa.types.is_float16(col.type):  # min_max lacks a halffloat kernel
                    col = pc.cast(col, pa.float32())
                mm = pc.min_max(col)
                out[f"{c}__min"] = pa.array([mm["min"].as_py()], col.type)
                out[f"{c}__max"] = pa.array([mm["max"].as_py()], col.type)
        return pa.table(out)

    aggs = [Sum("__rows", alias_name="rows")]
    for c in cols:
        aggs.append(Sum(f"{c}__nulls", alias_name=f"{c}__nulls"))
        if c in ordered:
            aggs += [
                Min(f"{c}__min", alias_name=f"{c}__min"),
                Max(f"{c}__max", alias_name=f"{c}__max"),
            ]
    stats = ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True).aggregate(
        *aggs
    )

    hashable = [
        c
        for c in cols
        if not (
            pa.types.is_nested(schema.field(c).type) or pa.types.is_dictionary(schema.field(c).type)
        )
    ]
    ci_of = {c: i for i, c in enumerate(hashable)}

    float_cols = {c for c in hashable if pa.types.is_floating(schema.field(c).type)}
    binary_cols = {
        c
        for c in hashable
        if pa.types.is_binary(schema.field(c).type)
        or pa.types.is_large_binary(schema.field(c).type)
    }

    def _norm_values(batch: pa.Table, c: str) -> pa.Array:
        """Non-null values of column c normalized for hashing: floats
        fold -0.0 into 0.0 (and widen float16 — no `equal` kernel);
        binary passes raw (need not be valid UTF-8); everything else
        casts to string."""
        col = batch.column(c)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if c in float_cols:
            if pa.types.is_float16(col.type):
                col = pc.cast(col, pa.float32())
            col = pc.if_else(pc.equal(col, 0.0), pa.scalar(0.0, col.type), col)
        if c in binary_cols:
            return pc.drop_null(col)
        return pc.drop_null(pc.cast(col, pa.string()))

    def pair_rows(batch: pa.Table) -> pa.Table:
        cis, h1s, h2s = [], [], []
        for c in hashable:
            s = _norm_values(batch, c)
            if len(s) == 0:
                continue
            hashed = content_hash_batch(pa.table({"v": s}), "v")
            h1 = hashed.column("h1").to_numpy(zero_copy_only=False)
            h2 = hashed.column("h2").to_numpy(zero_copy_only=False)
            u1, u2 = _pair_unique(h1, h2)
            cis.append(np.full(len(u1), ci_of[c], dtype=np.int32))
            h1s.append(u1)
            h2s.append(u2)
        if not cis:
            return pa.table(
                {
                    "ci": pa.array([], pa.int32()),
                    "h1": pa.array([], pa.int64()),
                    "h2": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "ci": pa.array(np.concatenate(cis)),
                "h1": pa.array(np.concatenate(h1s)),
                "h2": pa.array(np.concatenate(h2s)),
            }
        )

    distinct: dict[str, int] = {}
    if hashable and approx_distinct:
        # scale path: ONE shuffle-free pass — each batch reduces every
        # column to a 16 KiB HLL register row (element-wise max-merge),
        # so nothing corpus-sized ever moves. ~0.8% standard error.
        from .sketch import HyperLogLog

        mixer = np.uint64(0x9E3779B97F4A7C15)

        def hll_partial(batch: pa.Table) -> pa.Table:
            out = {}
            for c in hashable:
                s = _norm_values(batch, c)
                h = HyperLogLog()
                if len(s):
                    h1 = (
                        content_hash_batch(pa.table({"v": s}), "v")
                        .column("h1")
                        .to_numpy(zero_copy_only=False)
                        .view(np.uint64)
                    )
                    h.add_hashes(h1 * mixer ^ (h1 >> np.uint64(29)))
                out[c] = pa.array([h.registers.tobytes()], pa.binary())
            return pa.table(out)

        accs = {c: HyperLogLog() for c in hashable}
        for b in ds.map_batches(
            hll_partial, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_format="pyarrow"):
            for c in hashable:
                for regs in b.column(c):
                    accs[c] = accs[c].merge(
                        HyperLogLog(np.frombuffer(regs.as_py(), dtype=np.uint8).copy())
                    )
        zero = HyperLogLog()
        for c in hashable:  # all-null column: registers untouched -> 0
            distinct[c] = 0 if (accs[c].registers == zero.registers).all() else accs[c].estimate()
    elif hashable:
        pairs = ds.map_batches(pair_rows, batch_format="pyarrow", zero_copy_batch=True)
        per_value = pairs.groupby(["ci", "h1", "h2"]).count()
        per_col = per_value.groupby("ci").count()
        for r in per_col.take_all():
            distinct[hashable[r["ci"]]] = int(r["count()"])

    def render(v) -> str | None:
        return None if v is None else str(v)

    total = int(stats["rows"] or 0)  # aggregate() is all-None on an empty dataset
    return pa.table(
        {
            "col": pa.array(cols, pa.string()),
            "cnt": pa.array([total for _ in cols], pa.int64()),
            "null_count": pa.array([int(stats[f"{c}__nulls"] or 0) for c in cols], pa.int64()),
            "n_distinct": pa.array(
                # hashable but absent from the exchange = all-null = 0
                # distinct; non-hashable (nested) columns report null
                [distinct.get(c, 0) if c in ci_of else None for c in cols],
                pa.int64(),
            ),
            "min_val": pa.array(
                [render(stats[f"{c}__min"]) if c in ordered else None for c in cols],
                pa.string(),
            ),
            "max_val": pa.array(
                [render(stats[f"{c}__max"]) if c in ordered else None for c in cols],
                pa.string(),
            ),
        }
    )


def drift_bins(ref, new, column: str, bins: int = 10) -> pa.Table:
    """Fixed-width bin counts of `column` over a REFERENCE dataset and
    a NEW dataset, on edges derived from the reference's min/max — the
    contingency table behind data-drift monitors. Bin of x is
    floor(((x - m) * bins) / (M - m)) clamped to [0, bins-1]; the
    expression is written identically in SQL, so bucket assignment is
    bit-deterministic even for values exactly on an edge, and the
    output is pure integers (no float cells to flake). Nulls are
    ignored; new-data values outside the reference range clamp into
    the edge bins. Each side is one streamed bincount combiner; only
    (bin, count) rows reach the driver.

    Returns (bin, n_ref, n_new). Use psi() for the scalar index."""
    import pyarrow.compute as pc

    def minmax(ds):
        lo = ds.min(column)
        hi = ds.max(column)
        return lo, hi

    m, M = minmax(ref)
    if m is None or M is None:
        raise ValueError(f"drift_bins: reference column {column!r} is all null")
    m, M = float(m), float(M)
    span = M - m
    if span <= 0:
        span = 1.0  # constant reference: everything lands in bin 0

    def counts(ds) -> np.ndarray:
        def partial(batch: pa.Table) -> pa.Table:
            x = batch.column(column).combine_chunks().cast(pa.float64())
            x = x.drop_null().to_numpy(zero_copy_only=False)
            # EXACT expression order mirrored in the SQL oracle:
            # ((x - m) * bins) / span, floored, clamped
            b = np.floor(((x - m) * bins) / span)
            b = np.clip(b, 0, bins - 1).astype(np.int64)
            n = np.bincount(b, minlength=bins)
            return pa.table(
                {
                    "bin": pa.array(np.arange(bins, dtype=np.int64)),
                    "n": pa.array(n),
                }
            )

        rows = (
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("bin")
            .sum("n")
            .take_all()
        )
        out = np.zeros(bins, dtype=np.int64)
        for r in rows:
            out[r["bin"]] = r["sum(n)"]
        return out

    n_ref = counts(ref)
    n_new = counts(new)
    return pa.table(
        {
            "bin": pa.array(np.arange(bins, dtype=np.int64)),
            "n_ref": pa.array(n_ref),
            "n_new": pa.array(n_new),
        }
    )


def psi(ref, new, column: str, bins: int = 10, eps: float = 1e-4) -> float:
    """Population Stability Index between a reference and a new slice:
    sum over bins of (p - q) * ln(p / q) with eps-floored proportions
    (the standard drift score; <0.1 stable, >0.25 shifted)."""
    t = drift_bins(ref, new, column, bins)
    n_ref = t.column("n_ref").to_numpy()
    n_new = t.column("n_new").to_numpy()
    p = np.maximum(n_ref / max(n_ref.sum(), 1), eps)
    q = np.maximum(n_new / max(n_new.sum(), 1), eps)
    return float(np.sum((p - q) * np.log(p / q)))


def ks_stat(ref, new, column: str) -> dict:
    """Two-sample Kolmogorov-Smirnov statistic: the max absolute gap
    between the empirical CDFs — PSI's bin-free companion for drift
    detection. Both sides reduce to distinct-value histograms (the
    exchange carries distinct values, not rows); the step CDFs merge
    on the union of values, and D evaluates as (cum_ref/n_ref) -
    (cum_new/n_new) in exactly the operation order the SQL oracle
    uses, so the double result is bit-deterministic. Nulls ignored.

    Returns {d, at} — the statistic and the value where the gap
    peaks (smallest such value on ties)."""
    from .sketch import _value_histogram

    rv, rc = _value_histogram(ref, column)
    nv, nc = _value_histogram(new, column)
    if len(rv) == 0 or len(nv) == 0:
        raise ValueError(f"ks_stat: a side of column {column!r} is empty/all null")
    nr = int(rc[-1])
    nn = int(nc[-1])
    merged = np.union1d(np.asarray(rv, dtype=np.float64), np.asarray(nv, dtype=np.float64))
    fr = np.zeros(len(merged))
    fn = np.zeros(len(merged))
    ir = np.searchsorted(np.asarray(rv, dtype=np.float64), merged, side="right")
    iq = np.searchsorted(np.asarray(nv, dtype=np.float64), merged, side="right")
    fr[ir > 0] = rc[ir[ir > 0] - 1]
    fn[iq > 0] = nc[iq[iq > 0] - 1]
    gaps = np.abs(fr / nr - fn / nn)
    i = int(np.argmax(gaps))  # first max = smallest value on ties
    return {"d": float(gaps[i]), "at": float(merged[i]), "n_ref": nr, "n_new": nn}


def benford_profile(ds, column: str, round_digits: int = 6) -> pa.Table:
    """First-significant-digit distribution of a 2-decimal money
    column vs Benford's law. One row per digit 1..9 present in the
    data: (digit, cnt, p_obs, p_benford) with p_benford =
    log10(1 + 1/d). A leading anomaly detector for synthetic /
    fabricated numeric columns in a corpus-triage pass.

    EXACTNESS: values convert to integer cents first (the repo's
    standard exact-money idiom — round(x*100) is the same double op
    in numpy and SQL), and the leading digit comes from INTEGER
    arithmetic (power-of-ten searchsorted), never log10 of the value
    — so digit assignment is bit-deterministic and the only float
    cells are the two round-6 proportions. Non-positive and null
    values drop (Benford is defined on positive magnitudes).

    Scale shape: each batch reduces to <= 9 (digit, count) rows; one
    tiny groupby-sum merges them; proportions evaluate driver-side
    over the 9-row result."""
    import pyarrow.compute as pc

    pow10 = 10 ** np.arange(1, 20, dtype=np.float64)  # 10^1 .. 10^19

    def partial(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch.column(column), pa.float64())
        cents = pc.cast(pc.round(pc.multiply(v, 100.0)), pa.int64())
        cents = cents.drop_null().to_numpy(zero_copy_only=False)
        cents = cents[cents > 0]
        # digits(c) = searchsorted(pow10, c, 'right') + 1 is exact for
        # int64 < 2^53; leading digit = c // 10^(digits-1)
        nd = np.searchsorted(pow10, cents.astype(np.float64), side="right")
        lead = cents // (10 ** nd).astype(np.int64)
        dig, cnt = np.unique(lead, return_counts=True)
        return pa.table(
            {"digit": pa.array(dig, pa.int64()), "cnt": pa.array(cnt, pa.int64())}
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("digit")
        .sum("cnt")
        .take_all()
    )
    rows.sort(key=lambda r: r["digit"])
    n = float(sum(r["sum(cnt)"] for r in rows))
    digits = [int(r["digit"]) for r in rows]
    cnts = [int(r["sum(cnt)"]) for r in rows]
    return pa.table(
        {
            "digit": pa.array(digits, pa.int64()),
            "cnt": pa.array(cnts, pa.int64()),
            "p_obs": pa.array(
                [round(c / n, round_digits) for c in cnts], pa.float64()
            ),
            "p_benford": pa.array(
                [round(float(np.log10(1.0 + 1.0 / d)), round_digits) for d in digits],
                pa.float64(),
            ),
        }
    )


def key_skew(ds, column: str, top_k: int = 10, round_digits: int = 6) -> pa.Table:
    """Key-distribution skew profile — the pre-shuffle diagnostic that
    decides between plain, salted and skew_join paths: one row
    (n_rows, n_keys BIGINT, top1_frac_r6, topk_frac_r6, entropy_r6,
    norm_entropy_r6). Entropy in nats over key frequencies;
    norm_entropy = entropy / ln(n_keys) (1.0 = uniform, ->0 = one hot
    key). NULL keys count as a key (they land in one shuffle
    partition like any other — exactly the straggler this measures).

    Exchange: per-batch (key, cnt) combiner partials -> one null-safe
    groupby over distinct keys; entropy is a distributed term sum and
    top-k a sort-limit over the count table, never the input."""
    import numpy as np

    from ray.data.aggregate import Sum

    from .nullkeys import null_safe_group_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        g = (
            batch.select([column])
            .group_by([column], use_threads=False)
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {"k": g.column(column), "cnt": g.column("count_all").cast(pa.int64())}
        )

    counts = null_safe_group_aggregate(
        ds.select_columns([column]).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        ["k"],
        [Sum("cnt", alias_name="cnt")],
    ).materialize()

    n_keys = int(counts.count())
    n_rows = float(counts.sum("cnt"))
    top = counts.select_columns(["cnt"]).sort("cnt", descending=True).limit(top_k).take_all()
    top_cnts = [r["cnt"] for r in top]
    top1_frac = top_cnts[0] / n_rows if top_cnts else 0.0
    topk_frac = float(sum(top_cnts)) / n_rows if top_cnts else 0.0

    def term(t: pa.Table) -> pa.Table:
        c = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {"term": pa.array(-(c / n_rows) * np.log(c / n_rows), pa.float64())}
        )

    entropy = float(counts.map_batches(term, batch_format="pyarrow").sum("term"))
    norm = entropy / float(np.log(n_keys)) if n_keys > 1 else 0.0
    r = lambda v: float(np.round(v, round_digits))
    return pa.table(
        {
            "n_rows": pa.array([int(n_rows)], pa.int64()),
            "n_keys": pa.array([n_keys], pa.int64()),
            "top1_frac_r6": pa.array([r(top1_frac)], pa.float64()),
            "topk_frac_r6": pa.array([r(topk_frac)], pa.float64()),
            "entropy_r6": pa.array([r(entropy)], pa.float64()),
            "norm_entropy_r6": pa.array([r(norm)], pa.float64()),
        }
    )


def key_gaps(ds, key_col: str) -> pa.Table:
    """Gap summary over an integer key column that SHOULD be unique
    (duplicate keys are tolerated — they contribute zero-length gaps):
    one row (n_keys, key_min, key_max, n_gaps, missing_total, max_gap)
    where n_keys counts DISTINCT keys and a gap is a run of absent
    values between two present keys.
    Detects sequence holes (lost batches, failed id ranges) without
    materializing the key domain.

    Scale shape: one distributed sort range-partitions the keys; each
    sorted block reduces to (block min, block max, rows, in-block gap
    count / missing sum / max run) via np.diff, and the driver merges
    the O(blocks) markers — cross-block gaps come from consecutive
    block boundaries, so no block ever sees another block's rows."""
    import pyarrow.compute as pc

    def keep(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col)
        return batch.select([key_col]).filter(pc.is_valid(k))

    def block_marker(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        d = np.diff(k)
        gaps = d[d > 1] - 1
        return pa.table(
            {
                "bmin": pa.array([int(k[0])], pa.int64()),
                "bmax": pa.array([int(k[-1])], pa.int64()),
                "rows": pa.array([1 + int((d > 0).sum())], pa.int64()),
                "ngaps": pa.array([len(gaps)], pa.int64()),
                "missing": pa.array([int(gaps.sum())], pa.int64()),
                "maxgap": pa.array([int(gaps.max()) if len(gaps) else 0], pa.int64()),
            }
        )

    markers = (
        ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)
        .sort(key_col)
        .map_batches(block_marker, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    markers.sort(key=lambda r: r["bmin"])
    n_keys = sum(r["rows"] for r in markers)
    if not markers:
        return pa.table(
            {
                "n_keys": pa.array([0], pa.int64()),
                "key_min": pa.array([None], pa.int64()),
                "key_max": pa.array([None], pa.int64()),
                "n_gaps": pa.array([0], pa.int64()),
                "missing_total": pa.array([0], pa.int64()),
                "max_gap": pa.array([0], pa.int64()),
            }
        )
    n_gaps = sum(r["ngaps"] for r in markers)
    missing = sum(r["missing"] for r in markers)
    max_gap = max(r["maxgap"] for r in markers)
    for prev, nxt in zip(markers, markers[1:]):
        d = nxt["bmin"] - prev["bmax"]
        if d > 1:
            n_gaps += 1
            missing += d - 1
            max_gap = max(max_gap, d - 1)
        elif d == 0:
            # the same key straddles a block boundary: the two markers
            # both counted it as distinct
            n_keys -= 1
    return pa.table(
        {
            "n_keys": pa.array([n_keys], pa.int64()),
            "key_min": pa.array([markers[0]["bmin"]], pa.int64()),
            "key_max": pa.array([markers[-1]["bmax"]], pa.int64()),
            "n_gaps": pa.array([n_gaps], pa.int64()),
            "missing_total": pa.array([missing], pa.int64()),
            "max_gap": pa.array([max_gap], pa.int64()),
        }
    )


def fd_check(ds, det_col: str, dep_col: str):
    """Functional-dependency audit: does det_col -> dep_col hold?
    Reports, over rows where both sides are non-null, the number of
    determinant keys, how many of them map to more than one distinct
    dependent value (violations), the worst key's distinct count, and
    the total surplus rows a repair would rewrite (sum of extra
    distinct values). One row out, all int64 — the discovery probe FD
    mining / normalization tooling runs per column pair.

    Scale: per-batch local (det, dep) distinct combiner, one global
    distinct groupby, then a det-keyed count — the exchange carries
    distinct pairs, never raw rows."""
    import pyarrow.compute as pc

    def pairs(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.is_valid(batch.column(det_col)), pc.is_valid(batch.column(dep_col))
        )
        t = batch.select([det_col, dep_col]).filter(ok)
        return t.group_by([det_col, dep_col], use_threads=False).aggregate([])

    per_key = (
        ds.select_columns(sorted({det_col, dep_col}))
        .map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([det_col, dep_col])
        .count()
        .groupby(det_col)
        .count()
    )

    def partial(batch: pa.Table) -> pa.Table:
        c = batch.column("count()").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_keys": pa.array([len(c)], pa.int64()),
                "n_violating": pa.array([int((c > 1).sum())], pa.int64()),
                "max_distinct": pa.array([int(c.max()) if len(c) else 0], pa.int64()),
                "surplus": pa.array([int((c - 1).sum()) if len(c) else 0], pa.int64()),
            }
        )

    rows = per_key.map_batches(partial, batch_format="pyarrow").take_all()
    return pa.table(
        {
            "n_keys": pa.array([sum(r["n_keys"] for r in rows)], pa.int64()),
            "n_violating": pa.array([sum(r["n_violating"] for r in rows)], pa.int64()),
            "max_distinct": pa.array(
                [max((r["max_distinct"] for r in rows), default=0)], pa.int64()
            ),
            "surplus": pa.array([sum(r["surplus"] for r in rows)], pa.int64()),
        }
    )


def clustering_report(in_dir: str | list[str], columns: list[str]) -> pa.Table:
    """Physical-layout clustering audit of an ENCODED dataset from its
    stripe zone maps ONLY (no value-stream bytes touched): per column,
    how much the stripes' [min, max] ranges overlap. A column the data
    is sorted/Z-ordered on has disjoint stripe ranges (overlap pairs =
    0, max depth = 1), which is exactly what makes min/max pruning
    effective; a randomly-laid-out column has every stripe overlapping
    every other. Pair of this op with optimize_sort / zorder_optimize
    to quantify a re-layout's pruning benefit before paying for it.

    Output per column: (col, n_stripes, n_with_stats,
    n_overlap_pairs, max_depth) — all exact int64. n_overlap_pairs
    counts unordered stripe pairs with intersecting CLOSED ranges
    (touching endpoints overlap, matching the conservative zone-map
    pruning rule in pipeline._stripe_overlaps); max_depth is the
    largest number of stripes any single probe value could hit.

    Scale shape: only the stats JSON column is read (one row per
    stripe — metadata-sized by construction); the O(S log S) interval
    sweep runs on the driver over (min, max) pairs."""
    import heapq
    import json

    import ray.data

    stats_rows = (
        ray.data.read_parquet(in_dir, columns=["stats"])
        .take_all()
    )
    out = {c: {"n": 0, "with": 0, "pairs": 0, "depth": 0} for c in columns}
    per_col: dict[str, list] = {c: [] for c in columns}
    for r in stats_rows:
        st = json.loads(r["stats"])
        for c in columns:
            out[c]["n"] += 1
            cell = st.get(c, {})
            lo, hi = cell.get("min"), cell.get("max")
            if lo is None or hi is None:
                continue
            out[c]["with"] += 1
            per_col[c].append((lo, hi))
    for c, ivals in per_col.items():
        ivals.sort(key=lambda p: (p[0], p[1]))
        # overlap pairs: sweep by min with a heap of active maxes
        heap: list = []
        pairs = 0
        for lo, hi in ivals:
            while heap and heap[0] < lo:
                heapq.heappop(heap)
            pairs += len(heap)  # all active ranges have max >= lo (closed overlap)
            heapq.heappush(heap, hi)
        out[c]["pairs"] = pairs
        # max depth: +1 at min, -1 after max (starts before ends on ties)
        events = [(lo, 0) for lo, _ in ivals] + [(hi, 1) for _, hi in ivals]
        events.sort(key=lambda e: (e[0], e[1]))
        depth = best = 0
        for _, kind in events:
            depth += 1 if kind == 0 else -1
            best = max(best, depth)
        out[c]["depth"] = best
    return pa.table(
        {
            "col": pa.array(columns, pa.string()),
            "n_stripes": pa.array([out[c]["n"] for c in columns], pa.int64()),
            "n_with_stats": pa.array([out[c]["with"] for c in columns], pa.int64()),
            "n_overlap_pairs": pa.array([out[c]["pairs"] for c in columns], pa.int64()),
            "max_depth": pa.array([out[c]["depth"] for c in columns], pa.int64()),
        }
    )


def fragmentation_report(in_dir: str | list[str]) -> pa.Table:
    """Housekeeping audit of an ENCODED dataset's physical layout from
    metadata only: per part file, how many stripes it holds, their row
    counts (min/avg context for 'are my stripes too small?'), and the
    encoded stream bytes — the input to an OPTIMIZE/compaction
    decision (many small stripes = footer overhead + poor scan
    locality; reference analog: the stripe-size budgeting in
    MothWriterOptions). Output per file, sorted by path:
    (path, n_stripes, n_rows, min_stripe_rows, max_stripe_rows,
    enc_bytes) — all exact int64; enc_bytes sums every stream's
    framed length out of the stripe meta JSON (no blob bytes read)."""
    import json

    from .. import pipeline

    meta = pipeline.read_encoded(in_dir, metadata_only=True, include_paths=True)

    def per_file(batch: pa.Table) -> pa.Table:
        rows: dict[str, list[int]] = {}
        for i in range(batch.num_rows):
            p = batch.column("path")[i].as_py()
            n = int(batch.column("n_rows")[i].as_py())
            m = json.loads(batch.column("meta")[i].as_py())
            b = sum(
                s["len"]
                for col in m["columns"].values()
                for tree in col["row_groups"]
                for s in tree["streams"]
            )
            cell = rows.setdefault(p, [0, 0, 1 << 62, 0, 0])
            cell[0] += 1
            cell[1] += n
            cell[2] = min(cell[2], n)
            cell[3] = max(cell[3], n)
            cell[4] += b
        ps = sorted(rows)
        return pa.table(
            {
                "path": pa.array(ps, pa.string()),
                "n_stripes": pa.array([rows[p][0] for p in ps], pa.int64()),
                "n_rows": pa.array([rows[p][1] for p in ps], pa.int64()),
                "min_stripe_rows": pa.array([rows[p][2] for p in ps], pa.int64()),
                "max_stripe_rows": pa.array([rows[p][3] for p in ps], pa.int64()),
                "enc_bytes": pa.array([rows[p][4] for p in ps], pa.int64()),
            }
        )

    from ray.data.aggregate import Max, Min, Sum

    parts = meta.map_batches(per_file, batch_format="pyarrow", zero_copy_batch=True)
    agg = (
        parts.groupby("path")
        .aggregate(
            Sum("n_stripes", alias_name="n_stripes"),
            Sum("n_rows", alias_name="n_rows"),
            Min("min_stripe_rows", alias_name="min_stripe_rows"),
            Max("max_stripe_rows", alias_name="max_stripe_rows"),
            Sum("enc_bytes", alias_name="enc_bytes"),
        )
    )
    return agg.sort("path")
