"""Distributed quantiles: exact (value-count reduction) and t-digest.

The reference carries a TDigest sketch as writer telemetry
(reference: pkg/store metadata distribution builders; SURVEY.md §2.6
row "TDigest/Distribution") but never exposes it as a query operator —
here both forms are first-class:

* exact_quantiles — COMBINER pattern: each batch reduces to its
  distinct (value, count) pairs, a single groupby sums counts per
  value, and the driver walks the (small) sorted value histogram to
  the target ranks. EXACT for any column whose distinct-value count
  is bounded (flags, quantities, scores, dates — the common quantile
  targets); the histogram size, not the corpus size, is what reaches
  the driver. Matches DuckDB quantile_disc bit-for-bit
  (rank = max(ceil(q*n), 1), 1-based over the sorted multiset).
* tdigest_quantiles — Dunning's MERGING t-digest, vectorized: per
  batch, sort + cumulative-weight scale-function binning builds <=
  ~delta centroids with NO per-value Python; per-batch digests (tiny
  (mean, weight) tables) concatenate and re-compress on the driver.
  Approximate but bounded-memory for unbounded cardinality; accuracy
  is tightest in the tails (k1 scale function), the property LLM
  data curation uses for p99 length/score cuts.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _duck_rank(q: float, n: int) -> int:
    return max(int(math.ceil(q * n)), 1)


def _value_histogram(ds, column: str):
    """(sorted distinct values, cumulative counts) of a column — the
    shared combiner behind exact_quantiles and quantile_cont: each
    batch ships (value, count) pairs, one groupby-sum over DISTINCT
    values, nulls dropped. Empty input yields two empty arrays."""

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column(column).combine_chunks())
        return pa.table({column: vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())})

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(column)
        .sum("cnt")
        .sort(column)
        .to_pandas()
    )
    if column not in hist.columns:  # empty input: no groups at all
        return np.array([]), np.array([], dtype=np.int64)
    hist = hist.dropna(subset=[column])
    return hist[column].to_numpy(), np.cumsum(hist["sum(cnt)"].to_numpy())


def exact_quantiles(ds, column: str, qs: list[float]) -> dict[float, float]:
    """Exact quantile_disc over a Dataset column (combiner + one
    groupby over DISTINCT VALUES; see module docstring)."""
    values, cum = _value_histogram(ds, column)
    n = int(cum[-1]) if len(cum) else 0
    out = {}
    for q in qs:
        if n == 0:
            out[q] = None
            continue
        r = _duck_rank(q, n)
        out[q] = values[int(np.searchsorted(cum, r))]
    return out


def quantile_cont(ds, column: str, qs: list[float]) -> dict[float, float]:
    """Exact INTERPOLATED quantiles (SQL quantile_cont / PERCENTILE_
    CONT): the shared _value_histogram combiner, then linear
    interpolation between the order statistics at floor/ceil of
    h = q*(n-1). Nulls ignored. Exchange payload is distinct values,
    not rows."""
    values, cum = _value_histogram(ds, column)
    values = values.astype(np.float64)
    n = int(cum[-1]) if len(cum) else 0
    out = {}
    for q in qs:
        if n == 0:
            out[q] = None
            continue
        h = q * (n - 1)  # 0-indexed fractional rank
        lo_r, hi_r = int(np.floor(h)), int(np.ceil(h))
        lo = values[int(np.searchsorted(cum, lo_r + 1))]
        hi = values[int(np.searchsorted(cum, hi_r + 1))]
        out[q] = float(lo + (h - lo_r) * (hi - lo))
    return out


def mad(ds, column: str) -> dict:
    """Median absolute deviation: {median, mad} with SQL median()/mad()
    semantics (interpolated medians, nulls ignored) — the robust
    spread statistic quality filters use where variance is hostage to
    tails. Two bounded passes, each a distinct-value-count combiner:
    one histogram for the median, one for |x - median|."""
    import pyarrow.compute as pc

    med = quantile_cont(ds, column, [0.5])[0.5]
    if med is None:
        return {"median": None, "mad": None}

    def absdev(batch: pa.Table) -> pa.Table:
        x = batch.column(column).combine_chunks().cast(pa.float64())
        return pa.table({"__ad": pc.abs(pc.subtract(x, med))})

    dev = ds.map_batches(absdev, batch_format="pyarrow", zero_copy_batch=True)
    d = quantile_cont(dev, "__ad", [0.5])[0.5]
    return {"median": float(med), "mad": float(d)}


def robust_outliers(ds, column: str, k: float = 3.0):
    """Rows whose |x - median| exceeds k * MAD — robust outlier
    flagging (a 3-sigma rule that heavy tails cannot inflate). The
    median/MAD scalars compute once (two bounded histogram passes) and
    the filter streams with no further exchange; null values are never
    outliers (SQL comparison semantics)."""
    import pyarrow.compute as pc

    stats = mad(ds, column)
    med, d = stats["median"], stats["mad"]
    if med is None:
        return ds.limit(0)  # all-null column: nothing is an outlier
    thresh = k * d

    def flag(batch: pa.Table) -> pa.Table:
        x = batch.column(column).combine_chunks().cast(pa.float64())
        keep = pc.fill_null(pc.greater(pc.abs(pc.subtract(x, med)), thresh), False)
        return batch.filter(keep)

    return ds.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------------ t-digest

_DELTA = 200


def _k1(q: np.ndarray, delta: float) -> np.ndarray:
    return (delta / (2 * np.pi)) * np.arcsin(2 * np.clip(q, 0.0, 1.0) - 1)


def _compress(means: np.ndarray, weights: np.ndarray, delta: float):
    """Merge sorted weighted points into t-digest centroids: bin by the
    integer part of k1(q) at each point's cumulative midpoint — fully
    vectorized (sort + cumsum + bincount)."""
    order = np.argsort(means, kind="stable")
    m, w = means[order], weights[order]
    total = w.sum()
    if total <= 0:
        return np.empty(0), np.empty(0)
    cum = np.cumsum(w)
    qmid = (cum - w / 2) / total
    bins = np.floor(_k1(qmid, delta) - _k1(np.array([0.0]), delta)[0]).astype(np.int64)
    bins -= bins.min()
    wsum = np.bincount(bins, weights=w)
    msum = np.bincount(bins, weights=m * w)
    keep = wsum > 0
    return msum[keep] / wsum[keep], wsum[keep]


class TDigest:
    """Mergeable quantile sketch (Dunning & Ertl, public paper /
    github.com/tdunning/t-digest). Serializes to a (mean, weight)
    table; merging = concatenate + one _compress pass."""

    def __init__(self, means: np.ndarray | None = None, weights: np.ndarray | None = None,
                 delta: float = _DELTA, vmin: float = np.inf, vmax: float = -np.inf):
        self.delta = delta
        self.means = means if means is not None else np.empty(0)
        self.weights = weights if weights is not None else np.empty(0)
        self.vmin, self.vmax = vmin, vmax

    @classmethod
    def from_values(cls, vals: np.ndarray, delta: float = _DELTA) -> "TDigest":
        vals = vals[~np.isnan(vals)]
        if len(vals) == 0:
            return cls(delta=delta)
        m, w = _compress(vals.astype(np.float64), np.ones(len(vals)), delta)
        return cls(m, w, delta, float(vals.min()), float(vals.max()))

    def merge(self, other: "TDigest") -> "TDigest":
        if len(other.means) == 0:
            return self
        if len(self.means) == 0:
            return other
        m, w = _compress(
            np.concatenate([self.means, other.means]),
            np.concatenate([self.weights, other.weights]),
            self.delta,
        )
        return TDigest(m, w, self.delta, min(self.vmin, other.vmin), max(self.vmax, other.vmax))

    def quantile(self, q: float) -> float:
        if len(self.means) == 0:
            return float("nan")
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - self.weights / 2
        target = q * total
        if target <= cum[0]:
            return self.vmin if q <= 0 else float(
                self.vmin + (self.means[0] - self.vmin) * (target / cum[0])
            )
        if target >= cum[-1]:
            rem = total - cum[-1]
            return self.vmax if rem <= 0 or q >= 1 else float(
                self.means[-1] + (self.vmax - self.means[-1]) * ((target - cum[-1]) / rem)
            )
        i = int(np.searchsorted(cum, target)) - 1
        frac = (target - cum[i]) / (cum[i + 1] - cum[i])
        return float(self.means[i] + (self.means[i + 1] - self.means[i]) * frac)


def tdigest_quantiles(ds, column: str, qs: list[float], delta: float = _DELTA) -> dict[float, float]:
    """Distributed t-digest: one tiny (mean, weight, min, max) table
    per batch leaves each task; the driver merge touches centroids,
    never values."""

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(column).combine_chunks().cast(pa.float64()).drop_null()
        d = TDigest.from_values(v.to_numpy(zero_copy_only=False), delta)
        return pa.table(
            {
                "mean": pa.array(d.means, type=pa.float64()),
                "weight": pa.array(d.weights, type=pa.float64()),
                "vmin": pa.array(np.full(len(d.means), d.vmin)),
                "vmax": pa.array(np.full(len(d.means), d.vmax)),
            }
        )

    cents = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    if len(cents) == 0:
        return {q: float("nan") for q in qs}
    d = TDigest(
        cents["mean"].to_numpy().copy(),
        cents["weight"].to_numpy().copy(),
        delta,
        float(cents["vmin"].min()),
        float(cents["vmax"].max()),
    )
    m, w = _compress(d.means, d.weights, delta)
    d = TDigest(m, w, delta, d.vmin, d.vmax)
    return {q: d.quantile(q) for q in qs}


# ------------------------------------------------------- distinct counting

def count_distinct(ds, value_col: str, group_col: str | None = None):
    """EXACT COUNT(DISTINCT value) [GROUP BY group]: per-batch distinct
    (group, value) pairs (Arrow group_by — vectorized) are the only
    rows that shuffle, then one groupby counts uniques per group. The
    exchange is bounded by batches x distinct-pairs-per-batch, not the
    corpus. Global form returns an int; grouped form a Dataset with
    column distinct_<value_col>."""

    def partial(batch: pa.Table) -> pa.Table:
        cols = [value_col] if group_col is None else [group_col, value_col]
        t = batch.select(cols)
        # drop null VALUES here (SQL COUNT(DISTINCT) rule): the global
        # form otherwise counted the null group as one extra distinct,
        # diverging from the grouped form's drop_null and from hll
        t = t.filter(pc.is_valid(t.column(value_col)))
        return t.group_by(cols).aggregate([])

    dd = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    if group_col is None:
        return dd.groupby(value_col).count().count()

    out_col = f"distinct_{value_col}"

    def finish(group: pa.Table) -> pa.Table:
        vals = group.column(value_col).combine_chunks()
        n = len(pc.unique(vals.drop_null()))
        return pa.table(
            {
                group_col: group.column(group_col).slice(0, 1),
                out_col: pa.array([n], type=pa.int64()),
            }
        )

    from .nullkeys import null_safe_group_map

    return null_safe_group_map(dd, [group_col], finish)


# ------------------------------------------------------------- HyperLogLog

_HLL_P = 14
_HLL_M = 1 << _HLL_P
_HLL_SEED = np.uint64(0x9E3779B97F4A7C15)


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (frexp is exact for
    values < 2^32, so split hi/lo words)."""
    hi = (x >> np.uint64(32)).astype(np.float64)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.float64)
    ehi = np.frexp(hi)[1]
    elo = np.frexp(lo)[1]
    return np.where(hi > 0, 32 + ehi, elo).astype(np.int64)


def _hll_hash_column(arr: pa.Array) -> np.ndarray:
    """64-bit well-mixed hash per value. Numerics hash their bit
    pattern through splitmix64; strings/binary go through the FNV
    fingerprint first. Nulls are dropped (SQL COUNT DISTINCT rule)."""
    from .. import bloom as bloom_mod
    from . import text as text_mod

    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    arr = arr.drop_null()
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    t = arr.type
    if pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_temporal(t):
        if pa.types.is_floating(t):
            raw = pc.cast(arr, pa.float64()).to_numpy().view(np.uint64)
        else:
            raw = pc.cast(arr, pa.int64(), safe=False).to_numpy().view(np.uint64)
    else:
        s = arr if pa.types.is_string(t) or pa.types.is_large_string(t) else pc.cast(arr, pa.string())
        fp = text_mod.fingerprint_batch(pa.table({"k": s}), "k").column("fingerprint")
        raw = fp.to_numpy(zero_copy_only=False).view(np.uint64)
    return bloom_mod._mix(raw ^ _HLL_SEED)


class HyperLogLog:
    """Flajolet et al. HLL with linear-counting small-range correction
    (public papers; p=14 -> 16 KiB registers, ~0.8% standard error).
    Mergeable by element-wise register max — the partial each batch
    emits is the 2^p-byte register array, so corpus size never reaches
    the driver."""

    def __init__(self, registers: np.ndarray | None = None):
        self.registers = (
            registers if registers is not None else np.zeros(_HLL_M, dtype=np.uint8)
        )

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        if len(h):
            idx = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
            w = h & np.uint64((1 << (64 - _HLL_P)) - 1)
            rank = (64 - _HLL_P + 1 - _bit_length_u64(w)).astype(np.uint8)
            np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        return HyperLogLog(np.maximum(self.registers, other.registers))

    def estimate(self) -> int:
        m = float(_HLL_M)
        alpha = 0.7213 / (1 + 1.079 / m)
        raw = alpha * m * m / np.sum(np.exp2(-self.registers.astype(np.float64)))
        zeros = int(np.count_nonzero(self.registers == 0))
        if raw <= 2.5 * m and zeros:
            return int(round(m * math.log(m / zeros)))
        return int(round(raw))


def hll_distinct(ds, value_col: str) -> int:
    """Approximate COUNT(DISTINCT) in one streaming pass: each batch
    reduces to one 16 KiB register row; the driver max-merges. Use when
    the distinct set itself is too big to shuffle (URLs/hashes at
    100 TB) — count_distinct is the exact path for bounded sets."""

    def partial(batch: pa.Table) -> pa.Table:
        h = HyperLogLog().add_hashes(_hll_hash_column(batch.column(value_col)))
        return pa.table({"regs": pa.array([h.registers.tobytes()], type=pa.binary())})

    acc = HyperLogLog()
    for b in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).iter_batches(
        batch_format="pyarrow"
    ):
        for regs in b.column("regs"):
            acc = acc.merge(HyperLogLog(np.frombuffer(regs.as_py(), dtype=np.uint8).copy()))
    return acc.estimate()


def quantile_filter(ds, column: str, q: float, keep: str = "below"):
    """Percentile-cut filter — the standard webtext tail trim (drop
    docs beyond the p99 of a length/score signal). Pass 1 computes the
    EXACT quantile_disc cut via the distinct-value-count combiner;
    pass 2 streams the corpus through a vectorized comparison. Two
    passes are inherent (the cut must exist before the filter); only
    the tiny histogram ever reaches the driver."""
    cut = exact_quantiles(ds, column, [q])[q]
    if cut is None:
        return ds
    op = {"below": "less_equal", "above": "greater_equal"}[keep]

    def flt(batch: pa.Table) -> pa.Table:
        return batch.filter(getattr(pc, op)(batch.column(column), cut))

    return ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


def _mg_reduce(values: pa.Array, counts: np.ndarray, errs: np.ndarray, capacity: int):
    """Misra-Gries reduction of a histogram to <= `capacity` counters:
    subtract the (capacity+1)-th largest count from all, keep the
    positive ones, and fold the subtraction into each survivor's
    undercount bound. Returns (values, counts, errs)."""
    if len(counts) <= capacity:
        return values, counts, errs
    order = np.argsort(counts, kind="stable")[::-1]
    delta = int(counts[order[capacity]])
    keep = order[:capacity]
    kept = counts[keep] - delta
    pos = kept > 0
    keep = keep[pos]
    return values.take(pa.array(keep)), counts[keep] - delta, errs[keep] + delta


def heavy_hitters(ds, column: str, k: int = 20, capacity: int = 4096):
    """Top-k frequent values via MERGEABLE Misra-Gries summaries
    (Agarwal et al., "Mergeable Summaries", PODS'12): each batch
    reduces to <= `capacity` (value, count) counters, one groupby sums
    them, and a final reduction re-caps. Counter values are LOWER
    bounds on true counts; the GLOBAL undercount of any value is
    <= n/(capacity+1) (MG mergeability), so any value with true
    frequency above that is guaranteed present. The per-value `err`
    column sums the deltas subtracted while that counter was resident
    — the exact undercount for counters that never dropped out (the
    top-k survivors in practice), an underestimate for ones that
    cycled; the global bound covers all cases. With
    `capacity` >= the column's distinct count no subtraction ever
    fires, err = 0 and counts are EXACT (the regime the DuckDB oracle
    checks); at 100 TB the point is the other regime — counter state
    stays `capacity`-bounded no matter the cardinality, where the
    exact top-k combiner's per-batch histograms do not.

    Output: (column, cnt, err) — top-k by cnt desc, value asc."""

    def partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column(column).combine_chunks())
        cnts0 = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        vals, cnts, errs = _mg_reduce(
            vc.field("values"), cnts0, np.zeros(len(cnts0), dtype=np.int64), capacity
        )
        return pa.table(
            {
                column: vals,
                "cnt": pa.array(cnts, pa.int64()),
                "err": pa.array(errs, pa.int64()),
            }
        )

    def block_cap(t: pa.Table) -> pa.Table:
        # re-cap each post-groupby block so the driver merge sees at
        # most capacity rows per block (not the global distinct count)
        c = t.column("sum(cnt)").to_numpy(zero_copy_only=False).astype(np.int64)
        e = t.column("sum(err)").to_numpy(zero_copy_only=False).astype(np.int64)
        vals, cnts, errs = _mg_reduce(t.column(column).combine_chunks(), c, e, capacity)
        return pa.table(
            {column: vals, "sum(cnt)": pa.array(cnts), "sum(err)": pa.array(errs)}
        )

    merged = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(column)
        .sum(["cnt", "err"])
        .map_batches(block_cap, batch_format="pyarrow")
        .to_pandas()
    )
    merged = merged.dropna(subset=[column])
    vals = pa.Array.from_pandas(merged[column])
    cnts = merged["sum(cnt)"].to_numpy().astype(np.int64)
    # summing per-batch undercounts is the conservative merge; the
    # total stays <= n/(capacity+1) by the MG mergeability theorem
    errs = merged["sum(err)"].to_numpy().astype(np.int64)
    vals, cnts, errs = _mg_reduce(vals, cnts, errs, capacity)
    out = pa.table(
        {column: vals, "cnt": pa.array(cnts, pa.int64()), "err": pa.array(errs, pa.int64())}
    )
    order = pc.sort_indices(out, sort_keys=[("cnt", "descending"), (column, "ascending")])
    return out.take(order).slice(0, k)


def grouped_quantiles(ds, column: str, group_col: str, qs: list[float]):
    """Exact per-group quantile_disc: the distinct-value-count combiner
    keyed by (group, value) — batch partials collapse duplicates before
    the exchange, one groupby sums, and each group's (small) sorted
    histogram walks to the target ranks inside map_groups. Output long:
    (group, q, value); rank = max(ceil(q*n), 1) over the sorted
    multiset, matching DuckDB quantile_disc bit-for-bit."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([group_col, column])
        # drop null VALUES only — a null GROUP key is still a group in
        # SQL GROUP BY (drop_null() on the pair silently omitted the
        # whole NULL group from the output)
        t = t.filter(pc.is_valid(t.column(column)))
        agg = t.group_by([group_col, column], use_threads=False).aggregate([([], "count_all")])
        return pa.table(
            {
                group_col: agg.column(group_col),
                column: agg.column(column),
                "cnt": agg.column("count_all").cast(pa.int64()),
            }
        )

    def walk(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group.column(column))
        vals = group.column(column).take(order)
        cum = np.cumsum(group.column("cnt").to_numpy(zero_copy_only=False)[
            order.to_numpy(zero_copy_only=False)
        ])
        n = int(cum[-1])
        picks = [int(np.searchsorted(cum, _duck_rank(q, n))) for q in qs]
        return pa.table(
            {
                group_col: pa.concat_arrays([group.column(group_col).combine_chunks().slice(0, 1)] * len(qs)),
                "q": pa.array(qs, pa.float64()),
                "value": vals.take(pa.array(picks)),
            }
        )

    from ray.data.aggregate import Sum as _Sum

    from .nullkeys import null_safe_group_aggregate, null_safe_group_map

    counted = null_safe_group_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        [group_col, column],
        [_Sum("cnt", alias_name="cnt")],
    )
    return null_safe_group_map(counted, [group_col], walk)


def histogram(ds, column: str, nbins: int = 20, lo: float | None = None, hi: float | None = None):
    """Equi-width histogram: one (Min, Max) aggregate pass fixes the
    range when bounds aren't given, then each batch bincounts into
    `nbins` and only (bin, cnt) rows reach the exchange. Bin rule
    floor((x - lo) / ((hi - lo) / nbins)) clamped to nbins-1, the same
    IEEE expression a SQL engine evaluates, so counts are exactly
    reproducible; empty bins are absent (GROUP BY semantics). Nulls
    (and NaNs) drop."""
    import ray.data

    if lo is None or hi is None:
        mm = ds.aggregate(
            ray.data.aggregate.Min(column, ignore_nulls=True),
            ray.data.aggregate.Max(column, ignore_nulls=True),
        )
        lo = float(mm[f"min({column})"]) if lo is None else lo
        hi = float(mm[f"max({column})"]) if hi is None else hi
    width = (hi - lo) / nbins
    if width <= 0:
        raise ValueError(f"degenerate range [{lo}, {hi}] for {column}")

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(column).combine_chunks().cast(pa.float64()).drop_null()
        x = v.to_numpy(zero_copy_only=False)
        x = x[~np.isnan(x)]
        bins = np.floor((x - lo) / width)
        bins = np.clip(bins, 0, nbins - 1).astype(np.int64)
        cnt = np.bincount(bins, minlength=0)
        nz = np.flatnonzero(cnt)
        return pa.table({"bin": pa.array(nz, pa.int64()), "cnt": pa.array(cnt[nz], pa.int64())})

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bin")
        .sum("cnt")
        .map_batches(lambda t: t.rename_columns(["bin", "cnt"]), batch_format="pyarrow")
    )


def winsorize(
    ds,
    value_cols: list[str],
    lower: float = 0.05,
    upper: float = 0.95,
    suffix: str = "_w",
):
    """Quantile clipping (outlier capping) — the robust-preprocessing
    companion to moments.standardize: cap each column at its exact
    [lower, upper] quantile_disc cut points, computed by the
    distinct-value combiner above (one bounded exchange per column;
    the cut points are actual data values, so clipping never leaves
    the column's own type/domain). The clip itself is a pure Arrow
    min/max_element_wise map_batches with skip_nulls=False, so null
    inputs stay null — matching CASE WHEN x IS NULL THEN NULL ELSE
    LEAST(GREATEST(x, q_lo), q_hi) END with quantile_disc cut points.
    Note: cut points run one quantile pass per column; winsorize the
    (few) columns that need it, not the whole schema."""
    if not 0.0 <= lower <= upper <= 1.0:
        raise ValueError("need 0 <= lower <= upper <= 1")
    cuts = {}
    for c in value_cols:
        qs = exact_quantiles(ds, c, [lower, upper])
        cuts[c] = (qs[lower], qs[upper])

    def apply(batch: pa.Table) -> pa.Table:
        opts = pc.ElementWiseAggregateOptions(skip_nulls=False)
        out = batch
        for c in value_cols:
            col = batch.column(c)
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            lo, hi = cuts[c]
            if lo is None:  # empty column: clip is the identity
                out = out.append_column(f"{c}{suffix}", col)
                continue
            lo_s = pa.scalar(lo.item() if hasattr(lo, "item") else lo, col.type)
            hi_s = pa.scalar(hi.item() if hasattr(hi, "item") else hi, col.type)
            clipped = pc.min_element_wise(
                pc.max_element_wise(col, lo_s, options=opts), hi_s, options=opts
            )
            out = out.append_column(f"{c}{suffix}", clipped)
        return out

    return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)


def count_min_sketch(ds, col: str, width: int = 2039, depth: int = 4, salt: str = ""):
    """Count-Min sketch (Cormode & Muthukrishnan 2005) over a column:
    a depth x width int64 counter matrix where row j counts keys at
    bucket splitmix64(FNV(f'{salt}{j}|' || str(key))) % width — the
    splitmix finalizer is REQUIRED: FNV is a rolling hash, so for two
    same-length keys h_j(k1) - h_j(k2) is independent of the prefix j
    and an unmixed pair that collides in one row collides in EVERY
    row; the mixer breaks that affine relation (same mixer the
    sampling/bloom oracles already replay in SQL). Point estimate =
    min over rows — always >= the true count, and <= true + eps*N
    with probability 1-delta for width=ceil(e/eps), depth=ceil(ln
    1/delta). The mergeable low-memory frequency structure that
    complements Misra-Gries heavy hitters (exact-ish top-k) with
    arbitrary point queries.

    Scale shape: each batch reduces its value_counts into ONE
    depth*width partial row (vectorized np.add.at; the FNV fingerprint
    machinery is the same one the sampling oracles replay in SQL, so
    the whole sketch is SQL-reproducible); partials merge by plain
    matrix addition. A prime width kills FNV's weak low bits under
    the modulo."""
    import pyarrow.compute as pc

    from .sample import _key_fingerprints

    def partial(batch: pa.Table) -> pa.Table:
        key = batch.column(col)
        key = key.combine_chunks() if isinstance(key, pa.ChunkedArray) else key
        vc = pc.value_counts(key.drop_null())
        kt = pa.table({col: vc.field("values")})
        cnt = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        from .. import bloom as bloom_mod

        m = np.zeros((depth, width), dtype=np.int64)
        for j in range(depth):
            h = bloom_mod._mix(_key_fingerprints(kt, col, f"{salt}{j}|")) % np.uint64(width)
            np.add.at(m[j], h.astype(np.int64), cnt)
        return pa.table({"m": pa.array([m.tobytes()], pa.binary())})

    total = np.zeros((depth, width), dtype=np.int64)
    for b in ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_format="pyarrow"):
        for i in range(b.num_rows):
            total += np.frombuffer(b.column("m")[i].as_py(), dtype=np.int64).reshape(
                depth, width
            )
    return total


def count_min_estimate(sketch: np.ndarray, keys, salt: str = "") -> np.ndarray:
    """Point estimates for `keys` (a pa.Array / list) from a
    count_min_sketch matrix: min over depth rows at each key's
    buckets. Vectorized over the key set."""
    from .sample import _key_fingerprints

    depth, width = sketch.shape
    arr = keys if isinstance(keys, pa.Array) else pa.array(keys)
    kt = pa.table({"k": arr})
    from .. import bloom as bloom_mod

    est = np.full(len(arr), np.iinfo(np.int64).max, dtype=np.int64)
    for j in range(depth):
        h = bloom_mod._mix(_key_fingerprints(kt, "k", f"{salt}{j}|")) % np.uint64(width)
        est = np.minimum(est, sketch[j, h.astype(np.int64)])
    return est


def grouped_mad(ds, column: str, group_col: str, round_digits: int = 6) -> "pa.Table":
    """Per-group median + MAD (SQL median()/mad() semantics:
    interpolated medians, nulls ignored) — the grouped form of mad()
    for per-domain robust quality thresholds. Two grouped
    distinct-value-count passes: each shuffles only (group, value,
    count) rows; the per-group median evaluates inside the group task
    over its bounded histogram, medians broadcast once, and the
    deviation pass repeats the same shape. Null group keys are a legal
    partition (nullkeys shuffle)."""
    import pyarrow.compute as pc
    import ray

    from .nullkeys import null_safe_group_map

    def _interp_median(vals: np.ndarray, counts: np.ndarray):
        order = np.argsort(vals, kind="stable")
        vals, counts = vals[order], counts[order]
        cum = np.cumsum(counts)
        n = int(cum[-1])
        h = 0.5 * (n - 1)
        lo_i = int(np.searchsorted(cum, int(np.floor(h)) + 1))
        hi_i = int(np.searchsorted(cum, int(np.ceil(h)) + 1))
        lo, hi = float(vals[lo_i]), float(vals[hi_i])
        return lo + (h - np.floor(h)) * (hi - lo)

    def hist_pass(src, val_col: str, out_name: str) -> dict:
        def partial(batch: pa.Table) -> pa.Table:
            g = batch.column(group_col)
            v = pc.cast(batch.column(val_col), pa.float64())
            t = pa.table({group_col: g, "__v": v}).filter(pc.is_valid(v))
            agg = t.group_by([group_col, "__v"], use_threads=False).aggregate(
                [("__v", "count")]
            )
            return agg.rename_columns([group_col, "__v", "__c"])

        parts = src.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

        def per_group_dedup(grp: pa.Table) -> pa.Table:
            agg = grp.select([group_col, "__v", "__c"]).group_by(
                ["__v"], use_threads=False
            ).aggregate([("__c", "sum")])
            vals = agg.column("__v").to_numpy(zero_copy_only=False)
            cnts = agg.column("__c_sum").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    group_col: grp.column(group_col).slice(0, 1),
                    out_name: pa.array([_interp_median(vals, cnts)], pa.float64()),
                    "__n": pa.array([int(cnts.sum())], pa.int64()),
                }
            )

        rows = null_safe_group_map(parts, [group_col], per_group_dedup).take_all()
        return {r[group_col]: (r[out_name], r["__n"]) for r in rows}

    meds = hist_pass(ds, column, "__med")
    med_ref = ray.put(meds)

    def dev(batch: pa.Table) -> pa.Table:
        import ray as ray_api

        m = ray_api.get(med_ref)
        keys = [k for k in m if k is not None]
        kv = pa.array(keys)
        mv = np.array([m[k][0] for k in keys], dtype=np.float64)
        gcol_arr = batch.column(group_col).combine_chunks()
        idx = pc.index_in(gcol_arr, value_set=kv)
        med_row = mv[pc.fill_null(idx, 0).to_numpy(zero_copy_only=False)]
        found = idx.is_valid().to_numpy(zero_copy_only=False)
        # the NULL group is a legal partition: its rows take its own
        # median (index_in cannot match nulls)
        if None in m:
            isnull = pc.is_null(gcol_arr).to_numpy(zero_copy_only=False)
            med_row = np.where(isnull, m[None][0], med_row)
            found = found | isnull
        x = pc.cast(batch.column(column), pa.float64()).to_numpy(zero_copy_only=False)
        d = np.abs(x - med_row)
        d = np.where(found, d, np.nan)
        return pa.table(
            {
                group_col: batch.column(group_col),
                "__d": pa.array(d, pa.float64(), mask=np.isnan(d)),
            }
        )

    mads = hist_pass(
        ds.map_batches(dev, batch_format="pyarrow", zero_copy_batch=True), "__d", "__mad"
    )
    keys = sorted(meds, key=lambda k: (k is None, str(k)))
    return pa.table(
        {
            group_col: pa.array(keys),
            "n": pa.array([meds[k][1] for k in keys], pa.int64()),
            "median": pa.array(
                [round(meds[k][0], round_digits) for k in keys], pa.float64()
            ),
            "mad": pa.array(
                [round(mads[k][0], round_digits) if k in mads else None for k in keys],
                pa.float64(),
            ),
        }
    )


def weighted_median(
    ds,
    value_col: str,
    weight_col: str,
    group_col: str,
    weight_decimal_scale: int = 2,
):
    """Lower weighted median of value_col per group: the smallest
    value v with 2 * cumweight(v) >= total weight. Weights quantize to
    weight_decimal_scale decimals and accumulate as exact int64, so
    the crossing comparison is bit-deterministic (no float cumsum).
    Output: (group, n, wmedian).

    Combiner shape: each batch reduces to (group, value, weight-sum)
    rows — the exchange carries the DISTINCT (group, value) grid, not
    rows — then one grouped merge sorts each group's values and scans
    the cumulative weights."""
    scale = 10.0**weight_decimal_scale

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        w = pc.cast(
            pc.round(pc.multiply(pc.cast(batch.column(weight_col), pa.float64()), scale)),
            pa.int64(),
        )
        t = pa.table(
            {
                group_col: batch.column(group_col),
                "v": batch.column(value_col),
                "w": w,
                "one": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
            }
        ).filter(pc.and_(pc.is_valid(batch.column(value_col)), pc.is_valid(w)))
        g = t.group_by([group_col, "v"], use_threads=False).aggregate(
            [("w", "sum"), ("one", "sum")]
        )
        return g.rename_columns([group_col, "v", "w", "n"])

    def merge(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        idx = pc.sort_indices(group, sort_keys=[("v", "ascending")])
        g = group.take(idx)
        v = g.column("v").to_numpy(zero_copy_only=False)
        w = g.column("w").to_numpy(zero_copy_only=False)
        n = int(g.column("n").to_numpy(zero_copy_only=False).sum())
        # the same (group, v) cell appears once per upstream block:
        # collapse duplicates before the scan
        uniq_v, start = np.unique(v, return_index=True)
        w_per_v = np.add.reduceat(w, start)
        cw = np.cumsum(w_per_v)
        tw = cw[-1] if len(cw) else 0
        hit = np.flatnonzero(2 * cw >= tw)
        med = float(uniq_v[hit[0]]) if len(hit) else None
        return pa.table(
            {
                group_col: group.column(group_col).slice(0, 1),
                "n": pa.array([n], pa.int64()),
                "wmedian": pa.array([med], pa.float64()),
            }
        )

    from .nullkeys import null_safe_group_map

    proj = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return null_safe_group_map(proj, [group_col], merge)
