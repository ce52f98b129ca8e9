"""Per-column statistics: partial (per stripe) + merge (stripe -> file).

Mirrors the reference's statistics builders (SURVEY.md §2.6;
reference: pkg/store/metadata/IntegerStatisticsBuilder.go:31-50,
DoubleStatisticsBuilder.go [NaN drops stats],
StringStatisticsBuilder.go:45-57 [values > 64 bytes drop min/max,
MothWriterOptions.go:9], BooleanStatisticsBuilder.go [trueCount],
BinaryStatisticsBuilder.go [sum of lengths], merge at
pkg/store/MothWriter.go:339-353). Computed with pyarrow.compute inside
the encode task; JSON-serializable so stripe stats ride a parquet
string column that pruning can read without touching stream blobs.
"""

from __future__ import annotations

import math
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

STRING_STATS_LIMIT = 64  # bytes; reference MothWriterOptions.go:9


def column_stats(arr: pa.Array | pa.ChunkedArray, string_limit: int | None = STRING_STATS_LIMIT) -> dict[str, Any]:
    t = arr.type
    n = len(arr)
    nulls = arr.null_count
    out: dict[str, Any] = {"count": n, "null_count": nulls}
    if n == nulls:
        return out
    if pa.types.is_boolean(t):
        out["true_count"] = int(pc.sum(arr.cast(pa.int64())).as_py() or 0)
        return out
    if pa.types.is_integer(t) or pa.types.is_date(t):
        if pa.types.is_date(t):
            # epoch ints + unit, same scheme as timestamps, so temporal
            # predicate bounds translate via stripe.stat_bound and date
            # columns get zone-map pruning (was: iso strings, no prune)
            vals = (
                arr.cast(pa.int32()).cast(pa.int64())
                if t.bit_width == 32
                else arr.cast(pa.int64())
            )
            mm = pc.min_max(vals)
            out["min"] = mm["min"].as_py()
            out["max"] = mm["max"].as_py()
            out["unit"] = "D" if t.bit_width == 32 else "ms"
        else:
            mm = pc.min_max(arr)
            vals = arr.cast(pa.int64())
            out["min"] = _plain(mm["min"])
            out["max"] = _plain(mm["max"])
        # int64 sums wrap in arrow; the reference drops the sum when it
        # overflows (IntegerStatisticsBuilder overflow flag) — detect
        # via a float shadow sum
        isum = int(pc.sum(vals).as_py())
        fsum = pc.sum(pc.cast(vals, pa.float64(), safe=False)).as_py() or 0.0
        if abs(fsum - isum) < max(1.0, abs(fsum)) * 1e-6:
            out["sum"] = isum
        return out
    if pa.types.is_floating(t):
        has_nan = bool(pc.any(pc.is_nan(arr.drop_null())).as_py()) if n > nulls else False
        if not has_nan:  # NaN drops min/max, reference DoubleStatisticsBuilder
            mm = pc.min_max(arr)
            out["min"] = mm["min"].as_py()
            out["max"] = mm["max"].as_py()
            s = pc.sum(arr).as_py()
            if s is not None and math.isfinite(s):
                out["sum"] = s
        return out
    if pa.types.is_timestamp(t):
        mm = pc.min_max(arr.cast(pa.int64()))
        out["min"] = mm["min"].as_py()
        out["max"] = mm["max"].as_py()
        out["unit"] = t.unit
        return out
    if pa.types.is_decimal(t):
        # floats, not strings: stats are advisory (pruning) and string
        # min/max would merge lexically ("9.9" > "10.0")
        mm = pc.min_max(arr)
        out["min"] = float(mm["min"].as_py())
        out["max"] = float(mm["max"].as_py())
        return out
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        lens = pc.binary_length(arr)
        out["sum_lengths"] = int(pc.sum(lens).as_py() or 0)
        mm = pc.min_max(arr)
        mn, mx = mm["min"].as_py(), mm["max"].as_py()
        # drop min/max beyond the 64-byte limit like the reference
        # (string_limit=None lifts the cap — agg_encoded's decode
        # fallback needs unrestricted min/max)
        if mn is not None and (string_limit is None or len(mn.encode()) <= string_limit):
            out["min"] = mn
        if mx is not None and (string_limit is None or len(mx.encode()) <= string_limit):
            out["max"] = mx
        return out
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        out["sum_lengths"] = int(pc.sum(pc.binary_length(arr)).as_py() or 0)
        return out
    return out  # nested types: counts only


def _plain(scalar: pa.Scalar):
    v = scalar.as_py()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def merge_stats(parts: list[dict[str, Any]]) -> dict[str, Any]:
    """Merge per-stripe stats into file-level stats (partial -> final,
    reference MothWriter.go:339-353).

    A stat survives the merge only if EVERY part that has values carries
    it: a stripe that dropped sum (int64 overflow) or string min/max
    (>64-byte limit) poisons the merged stat, mirroring the reference's
    overflow/limit propagation (IntegerStatisticsBuilder overflow flag,
    StringStatisticsBuilder 64-byte drop)."""
    out: dict[str, Any] = {"count": 0, "null_count": 0}
    valued = [p for p in parts if p.get("count", 0) > p.get("null_count", 0)]
    for p in parts:
        out["count"] += p.get("count", 0)
        out["null_count"] += p.get("null_count", 0)
    for key in ("true_count", "sum", "sum_lengths"):
        if valued and all(key in p for p in valued):
            out[key] = sum(p[key] for p in valued)
    if valued and all("min" in p for p in valued):
        out["min"] = min(p["min"] for p in valued)
    if valued and all("max" in p for p in valued):
        out["max"] = max(p["max"] for p in valued)
    if valued and "unit" in valued[0]:
        out["unit"] = valued[0]["unit"]
    return out
