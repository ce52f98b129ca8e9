"""Deterministic sampling / corpus-mixture operators.

Training-data curation needs samples that are (a) reproducible across
reruns and cluster widths, (b) computable per batch with no global
pass or RNG state, and (c) auditable in SQL. A hash gate gives all
three: keep a row iff FNV(key || salt) mod 10^6 < rate * 10^6. The
FNV-over-codepoints hash is the same one as ops.text.fingerprint_batch,
which the DuckDB oracle reproduces exactly (list_reduce + HUGEINT
modular arithmetic), so sampled sets are value-checkable.

No reference analog (orc-go has no sampling); engine extension like
FSST. Changing `salt` draws an independent sample; `rate_by_key` turns
the gate into stratified mixture weighting (per-source rates — the
standard corpus-mixing knob for LLM training sets).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import text as text_mod

_DENOM = 1_000_000
# FNV_PRIME^8 mod 2^64: order-spreading multiplier for sample_k_per_group
_ORDER_MIX = np.uint64(pow(1099511628211, 8, 1 << 64))


def _key_fingerprints(batch: pa.Table, key_col: str, salt: str) -> np.ndarray:
    """uint64 FNV fingerprint of str(key) || salt per row (vectorized)."""
    import pyarrow.compute as pc

    key = batch.column(key_col)
    key = key.combine_chunks() if isinstance(key, pa.ChunkedArray) else key
    if not (pa.types.is_string(key.type) or pa.types.is_large_string(key.type)):
        key = pc.cast(key, pa.string())
    if salt:
        # salt PREPENDED: the rolling hash is h = fold(h*P + cp), so an
        # appended salt would only shift h by the ord-difference of the
        # last char (salts 'x' vs 'y' kept near-identical samples); a
        # leading salt is multiplied through the whole chain
        key = pc.binary_join_element_wise(salt, key, "")
    fp = text_mod.fingerprint_batch(pa.table({"k": key}), "k").column("fingerprint")
    return fp.to_numpy(zero_copy_only=False).view(np.uint64)


def hash_sample_batch(
    batch: pa.Table,
    rate: float = 0.1,
    key_col: str = "doc_id",
    salt: str = "",
    rate_by_key: dict | None = None,
    strat_col: str | None = None,
) -> pa.Table:
    """Filter a batch to its deterministic sample. With `rate_by_key`
    (+ `strat_col`), each stratum value gets its own rate (missing
    values fall back to `rate`) — weighted corpus mixture in one pass."""
    import pyarrow.compute as pc

    u = _key_fingerprints(batch, key_col, salt) % np.uint64(_DENOM)
    if rate_by_key is not None:
        strat = batch.column(strat_col or key_col)
        strat = strat.combine_chunks() if isinstance(strat, pa.ChunkedArray) else strat
        d = pc.dictionary_encode(strat)
        # fill_null(-1): a null stratum otherwise becomes NaN indices
        # (IndexError on the gather); -1 selects the appended fallback
        # slot, so null-stratum rows sample at the DEFAULT rate — the
        # same ELSE-arm a SQL CASE mixture gives them
        codes = d.indices.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        dict_rates = np.array(
            [rate_by_key.get(v.as_py(), rate) for v in d.dictionary] + [rate],
            dtype=np.float64,
        )
        thresholds = (dict_rates[codes] * _DENOM).astype(np.uint64)
    else:
        thresholds = np.uint64(int(rate * _DENOM))
    return batch.filter(pa.array(u < thresholds))


def hash_sample(
    ds,
    rate: float = 0.1,
    key_col: str = "doc_id",
    salt: str = "",
    rate_by_key: dict | None = None,
    strat_col: str | None = None,
):
    """Dataset-level deterministic sample / stratified mixture: one
    fused map_batches, nothing shuffles, output identical for any
    partitioning or cluster width."""

    def run(batch: pa.Table) -> pa.Table:
        return hash_sample_batch(batch, rate, key_col, salt, rate_by_key, strat_col)

    return ds.map_batches(run, batch_format="pyarrow", zero_copy_batch=True)


def token_budget_sample(
    ds,
    group_col: str,
    budget: int,
    key_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
    salt: str = "",
    n_buckets: int = 256,
):
    """Corpus-mixture curation under a per-group token budget: within
    each group (source / domain / language), rank docs by the salted
    FNV hash of their key and keep docs while the running token total
    stays <= budget. Deterministic across reruns and cluster widths;
    equals SQL `sum(tok) OVER (PARTITION BY g ORDER BY h, key) <= B`.

    Scale shape — almost nothing shuffles:
      1. NARROW pass: per-(group, hash-bucket) token sums (a
         groups x n_buckets table, tiny) come to the driver, which
         finds each group's budget-crossing bucket and the budget
         remaining at that bucket's start.
      2. FULL pass: rows in buckets before the crossing bucket are
         kept by a pure fused filter (no exchange); only the crossing
         bucket — ~1/n_buckets of each group — shuffles through one
         groupby for the exact boundary cumsum.
    The input is read twice (both passes re-derive the cheap FNV
    gate); full rows cross the exchange only for boundary buckets.
    Groups whose total fits the budget are kept whole.

    Output = input columns + `tok_cnt` (count(' ')+1 whitespace tokens
    when `token_col` is None, else the given column unchanged).
    No reference analog (orc-go has no sampling); this is the standard
    per-domain token-budget knob for LLM training mixtures
    (DataTrove/Dolma-style curation).
    """
    import pyarrow.compute as pc

    if n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two")
    shift = np.uint64(64 - int(np.log2(n_buckets)))
    tok_name = token_col or "tok_cnt"

    def with_aux(batch: pa.Table) -> pa.Table:
        """Append __h, __bucket and (if derived) tok_cnt."""
        if batch.num_rows == 0:
            batch = batch if token_col else batch.append_column(tok_name, pa.array([], pa.int64()))
            batch = batch.append_column("__h", pa.array([], pa.uint64()))
            return batch.append_column("__bucket", pa.array([], pa.int64()))
        if token_col is None and tok_name not in batch.column_names:
            spaces = pc.count_substring(batch.column(text_col), " ")
            batch = batch.append_column(tok_name, pc.add(spaces, 1).cast(pa.int64()))
        h = _key_fingerprints(batch, key_col, salt)
        batch = batch.append_column("__h", pa.array(h))
        return batch.append_column("__bucket", pa.array((h >> shift).astype(np.int64)))

    def narrow_partial(batch: pa.Table) -> pa.Table:
        b = with_aux(batch)
        return (
            b.select([group_col, "__bucket", tok_name])
            .group_by([group_col, "__bucket"], use_threads=False)
            .aggregate([(tok_name, "sum")])
            .rename_columns([group_col, "__bucket", "__part"])
        )

    from ray.data.aggregate import Sum as _Sum

    from .nullkeys import null_safe_group_aggregate

    agg = null_safe_group_aggregate(
        ds.map_batches(narrow_partial, batch_format="pyarrow", zero_copy_batch=True),
        [group_col, "__bucket"],
        [_Sum("__part", alias_name="sum(__part)")],
    ).take_all()  # groups x n_buckets rows — bounded, driver-side by design

    per_group: dict = {}
    for r in agg:
        per_group.setdefault(r[group_col], []).append((r["__bucket"], r["sum(__part)"]))
    # plan[g] = (crossing_bucket, budget remaining at its start);
    # crossing_bucket = n_buckets when the whole group fits
    plan: dict = {}
    for g, pairs in per_group.items():
        pairs.sort()
        cum = 0
        cb, rem = n_buckets, 0
        for bkt, s in pairs:
            if cum + s > budget:
                cb, rem = bkt, budget - cum
                break
            cum += s
        plan[g] = (cb, rem)

    def tag(batch: pa.Table) -> pa.Table:
        b = with_aux(batch)
        grp = b.column(group_col)
        grp = grp.combine_chunks() if isinstance(grp, pa.ChunkedArray) else grp
        d = pc.dictionary_encode(grp)
        # fill_null(-1): a null group otherwise yields NaN indices; the
        # appended slot routes null-group rows to plan[None] (the null
        # group's own budget plan — a legitimate SQL group)
        codes = d.indices.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        cb_by_code = np.array(
            [plan.get(v.as_py(), (n_buckets, 0))[0] for v in d.dictionary]
            + [plan.get(None, (n_buckets, 0))[0]],
            dtype=np.int64,
        )
        cb = cb_by_code[codes]
        bkt = b.column("__bucket").to_numpy(zero_copy_only=False)
        cls = np.where(bkt < cb, 1, np.where(bkt == cb, 2, 0)).astype(np.int8)
        return b.append_column("__cls", pa.array(cls))

    tagged = ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    bulk = tagged.filter(expr="__cls == 1").drop_columns(["__h", "__bucket", "__cls"])

    def resolve_boundary(group: pa.Table) -> pa.Table:
        g = group.column(group_col)[0].as_py()
        rem = plan.get(g, (n_buckets, 0))[1]
        idx = pc.sort_indices(group, sort_keys=[("__h", "ascending"), (key_col, "ascending")])
        s = group.take(idx)
        cum = np.cumsum(s.column(tok_name).to_numpy(zero_copy_only=False))
        return s.filter(pa.array(cum <= rem)).drop_columns(["__h", "__bucket", "__cls"])

    from .nullkeys import null_safe_group_map

    boundary = null_safe_group_map(
        tagged.filter(expr="__cls == 2"), [group_col], resolve_boundary
    )
    return bulk.union(boundary)


def top_k_per_group(ds, group_col: str, order_col: str, k: int, ascending: bool = True,
                    tiebreak_col: str | None = None):
    """First/last k rows per group by (order, tiebreak) — the SQL
    ROW_NUMBER() OVER (PARTITION BY g ORDER BY o) <= k pattern, and the
    standard per-host document cap in corpus curation.

    Scale path: a COMBINER runs inside map_batches first (vectorized
    lexsort + within-group rank, no Python loop), so at most k rows per
    (batch, group) enter the shuffle; the groupby then finishes the
    same top-k over the per-batch survivors. The shuffle payload is
    bounded by k * groups, not the corpus."""
    import pyarrow.compute as pc

    tb = tiebreak_col or order_col

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        keys = [
            (group_col, "ascending"),
            (order_col, "ascending" if ascending else "descending"),
            (tb, "ascending"),
        ]
        idx = pc.sort_indices(batch, sort_keys=keys)
        g = batch.take(idx)
        garr = g.column(group_col).combine_chunks()
        n = len(garr)
        first = np.ones(n, dtype=bool)
        if n > 1:
            # null-safe boundary: numpy turns nullable numeric keys into
            # NaN and NaN != NaN would split the null group into one
            # "group" per row; compare via Arrow equality + validity
            a, b = garr.slice(1), garr.slice(0, n - 1)
            neq = pc.fill_null(pc.not_equal(a, b), False).to_numpy(zero_copy_only=False)
            va = a.is_valid().to_numpy(zero_copy_only=False)
            vb = b.is_valid().to_numpy(zero_copy_only=False)
            first[1:] = neq | (va != vb)
        starts = np.flatnonzero(first)
        rank = np.arange(n) - np.repeat(starts, np.diff(np.r_[starts, n]))
        return g.filter(pa.array(rank < k))

    from .nullkeys import null_safe_group_map

    return null_safe_group_map(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        [group_col],
        partial,
    )


def sample_k_per_group(ds, group_col: str, key_col: str, k: int = 5, salt: str = ""):
    """Deterministic EXACT-k per-group sample: the k rows with the
    smallest FNV(salt || str(key)) fingerprint per group — a fixed-size
    stratified sample that is reproducible across reruns, partitioning
    and cluster width (rate-based hash_sample gives a fixed RATE, this
    gives a fixed COUNT). Composition: fingerprint column + the
    top_k_per_group combiner, so at most k rows per (batch, group)
    enter the exchange; SQL-auditable via the fingerprint oracle +
    QUALIFY row_number.

    The raw FNV value is post-multiplied by FNV_PRIME^8 mod 2^64 (a
    bijection — odd multiplier): short keys never wrap 2^64, so their
    raw hashes order by string LENGTH then consecutive digits (doc_id
    0..9 would always win); the extra multiply spreads consecutive
    values across the full range. One HUGEINT multiply in SQL."""

    def add_fp(batch: pa.Table) -> pa.Table:
        fp = _key_fingerprints(batch, key_col, salt) * _ORDER_MIX
        return batch.append_column("__fp", pa.array(fp, type=pa.uint64()))

    with_fp = ds.map_batches(add_fp, batch_format="pyarrow", zero_copy_batch=True)
    out = top_k_per_group(
        with_fp, group_col, "__fp", k, ascending=True, tiebreak_col=key_col
    )
    return out.map_batches(
        lambda t: t.drop_columns(["__fp"]), batch_format="pyarrow"
    )


def weighted_sample_k(
    ds,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
    max_weight: int = 10_000,
):
    """Deterministic weighted sample WITHOUT replacement: the k rows
    selected with probability proportional to integer `weight_col`
    (A-ES, Efraimidis & Spirakis 2006). Each row's selection key is
    the MAX of `weight` independent fingerprints
    fnv(salt || key || '#' || j), j = 1..weight — the max of w uniforms
    has CDF x^w, exactly A-ES's u^(1/w) key, but in pure integer
    arithmetic: ranking is engine-independent (no float pow whose last
    ulp differs across libms), so the chosen set is SQL-auditable.
    Ties break on key_col ascending.

    Rows with null or < 1 weights are excluded (SQL filter semantics).
    Cost is O(sum of weights) hash evaluations per batch — meant for
    SMALL weights (quality tiers, duplication counts, source
    priorities); `max_weight` guards accidental token-count weights.
    Scale shape: the per-batch A-ES keys feed the top-k combiner, so
    at most k rows per batch cross the exchange."""
    import pyarrow.compute as pc

    if k < 1:
        raise ValueError("k must be >= 1")

    def add_aes(batch: pa.Table) -> pa.Table:
        w_arr = batch.column(weight_col)
        w_arr = w_arr.combine_chunks() if isinstance(w_arr, pa.ChunkedArray) else w_arr
        w = w_arr.cast(pa.int64()).fill_null(0).to_numpy(zero_copy_only=False)
        keep = w >= 1
        batch = batch.filter(pa.array(keep))
        w = w[keep]
        if len(w) == 0:
            return batch.append_column("__aes", pa.array([], pa.uint64()))
        wmax = int(w.max())
        if wmax > max_weight:
            raise ValueError(
                f"weight {wmax} exceeds max_weight={max_weight}: A-ES cost is "
                "O(sum of weights) — rescale weights to small integers"
            )
        # one fingerprint per weight unit: key repeated w times, each
        # copy suffixed '#j' (all Arrow kernels; j built by segmented
        # arange)
        reps = np.repeat(np.arange(len(w), dtype=np.int64), w)
        ends = np.cumsum(w)
        j = np.arange(ends[-1], dtype=np.int64) - np.repeat(ends - w, w) + 1
        key = batch.column(key_col)
        key = key.combine_chunks() if isinstance(key, pa.ChunkedArray) else key
        if not (pa.types.is_string(key.type) or pa.types.is_large_string(key.type)):
            key = pc.cast(key, pa.string())
        composite = pc.binary_join_element_wise(
            key.take(pa.array(reps)), "#", pc.cast(pa.array(j), pa.string()), ""
        )
        # fmix the fingerprints before the max: raw FNV over short
        # structured keys is skewed in its HIGH bits (same reason the
        # KMV estimator mixes, ops/pack.py), and max-ranking reads the
        # high bits; the splitmix64 finalizer is exactly reproducible
        # in SQL (UBIGINT xor/shift + HUGEINT-mod multiplies)
        from .. import bloom as bloom_mod

        fp = bloom_mod._mix(_key_fingerprints(pa.table({"k": composite}), "k", salt))
        aes = np.maximum.reduceat(fp, np.r_[0, ends[:-1]])
        return batch.append_column("__aes", pa.array(aes, pa.uint64()))

    with_aes = ds.map_batches(add_aes, batch_format="pyarrow", zero_copy_batch=True)

    def const_group(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__g", pa.array(np.zeros(batch.num_rows, dtype=np.int32))
        )

    out = top_k_per_group(
        with_aes.map_batches(const_group, batch_format="pyarrow"),
        "__g", "__aes", k, ascending=False, tiebreak_col=key_col,
    )
    return out.map_batches(
        lambda t: t.drop_columns(["__aes", "__g"]), batch_format="pyarrow"
    )


def train_split(
    ds,
    fractions: tuple = (("test", 0.1), ("val", 0.1)),
    key_col: str = "doc_id",
    salt: str = "",
    out_col: str = "split",
    default: str = "train",
):
    """Deterministic train/val/test assignment — the standard holdout
    split of a training corpus, as a pure per-batch hash gate.

    Each row's salted FNV fingerprint mod 10^6 is cut against the
    cumulative fraction thresholds: the first `fractions` entry owns
    [0, f1*10^6), the next [f1*10^6, (f1+f2)*10^6), ... and everything
    above falls into `default`. Splits are disjoint, exhaustive, and a
    pure function of the key — the same doc lands in the same split on
    any cluster width, any partitioning, and across reruns; appending
    new data never reassigns old rows (the property decontamination
    workflows rely on). One fused map_batches, nothing shuffles; the
    same FNV-over-codepoints hash as hash_sample, so assignments are
    value-checkable in SQL."""

    names = [n for n, _ in fractions]
    # int-truncate each cumulative threshold (the same convention as
    # hash_sample's int(rate * _DENOM)) so the interval bounds are the
    # exact integers an SQL oracle replicates
    cuts = [np.uint64(int(c)) for c in np.cumsum([f for _, f in fractions]) * _DENOM]
    if cuts and cuts[-1] > _DENOM:
        raise ValueError("split fractions sum past 1.0")

    def run(batch: pa.Table) -> pa.Table:
        if not names:  # no holdouts: everything is `default`
            lab = pa.array([default] * batch.num_rows, pa.string())
            return batch.append_column(out_col, lab)
        u = _key_fingerprints(batch, key_col, salt) % np.uint64(_DENOM)
        lab = np.select([u < c for c in cuts], names, default=default)
        return batch.append_column(out_col, pa.array(lab, pa.string()))

    return ds.map_batches(run, batch_format="pyarrow", zero_copy_batch=True)


def temperature_mix(
    ds,
    source_col: str,
    alpha: float = 0.7,
    target_rows: int | None = None,
    target_frac: float = 0.5,
    key_col: str = "doc_id",
    salt: str = "tm",
):
    """Temperature-based corpus mixing (the multilingual-LM standard:
    sample sources proportional to n^alpha, alpha<1 flattening the
    size distribution so head domains stop drowning the tail). One
    bounded per-source count pass computes keep rates

        rate_s = min(1, T * (n_s^alpha / sum n^alpha) / n_s)

    (without-replacement semantics: an upsampled tail source caps at
    rate 1 and under-delivers rather than duplicating rows), then the
    deterministic FNV hash gate streams with NO shuffle — the same
    gate the mixture oracles replay in SQL. Null-source rows drop
    (rate 0). Returns the sampled Dataset."""
    import pyarrow.compute as pc

    def cnt_partial(batch: pa.Table) -> pa.Table:
        # value_counts + a non-null pre-filter: Ray's sort groupby
        # cannot order a NULLABLE key, and null sources drop anyway
        col = batch.column(source_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        vc = pc.value_counts(col.drop_null())
        return pa.table(
            {source_col: vc.field("values"), "c": vc.field("counts").cast(pa.int64())}
        )

    rows = (
        ds.map_batches(cnt_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(source_col)
        .sum("c")
        .take_all()
    )
    counts = {r[source_col]: r["sum(c)"] for r in rows}
    if not counts:
        return ds.limit(0)
    total = sum(counts.values())
    t = target_rows if target_rows is not None else int(total * target_frac)
    weights = {s: float(n) ** alpha for s, n in counts.items()}
    sw = sum(weights.values())
    rates = {s: min(1.0, t * (weights[s] / sw) / counts[s]) for s in counts}
    return hash_sample(
        ds, rate=0.0, key_col=key_col, salt=salt, rate_by_key=rates, strat_col=source_col
    )


def stratified_sample(ds, strat_col: str, key_col: str, k: int, salt: str = "st1"):
    """Deterministic stratified sample: the k rows per stratum with the
    SMALLEST mixed fingerprints splitmix64(fnv(salt || key)) — a
    uniform without-replacement draw per stratum (rank statistics of a
    hash are uniform), fully hash-auditable: the SQL oracle replays
    the exact FNV fold + splitmix64 finalizer and picks the same rows.
    Ties (hash collisions) break on key_col ascending.

    Scale shape: per-batch combiner caps the exchange at k rows per
    (batch, stratum) via top_k_per_group — the shuffle payload is
    bounded by k * strata, not the corpus."""
    from .. import bloom as bloom_mod

    def add_hash(batch: pa.Table) -> pa.Table:
        h = bloom_mod._mix(_key_fingerprints(batch, key_col, salt))
        return batch.append_column("__h", pa.array(h, pa.uint64()))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", zero_copy_batch=True)
    out = top_k_per_group(hashed, strat_col, "__h", k, ascending=True,
                          tiebreak_col=key_col)
    return out.map_batches(lambda t: t.drop_columns(["__h"]), batch_format="pyarrow")
