"""Codec auto-selection from a sampling pass (the macro optimizer).

The reference optimizes codecs ONLINE: every chunk write re-evaluates
dictionary compression ratios and converts columns to direct encoding
mid-stripe with buffered-row replay (reference:
pkg/store/DictionaryCompressionOptimizer.go:128-208, ratio threshold
1.25 at :10, index width model :214-225). In a streaming Ray pipeline
that convert-and-replay machinery is replaced by a cheap FIRST PASS
over a sample (`ds.random_sample` -> map_batches partial stats ->
driver merge), which fixes a per-column CodecPlan before the encode
pass (SURVEY.md §2.5 mapping). The same thresholds carry over:

  dictionary   when estimated raw/(dict+index) ratio >= 1.25
  FSST         when not dict, values are text-ish (avg len >= 8) and
               byte entropy says compressible (< 6.8 bits/byte)
  direct       otherwise (plus stream-level store-raw framing)

Integer/timestamp/boolean codecs stay per-run inside RLEv2 (the micro
selector) — no plan entry needed.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

DICT_MIN_RATIO = 1.25  # reference DictionaryCompressionOptimizer.go:10
FSST_MAX_ENTROPY = 6.8
FSST_MIN_AVG_LEN = 8.0


@dataclass
class CodecPlan:
    column_plans: dict[str, dict] = field(default_factory=dict)
    compression: str = "zstd"
    sampled_rows: int = 0

    def to_opts(self, base: dict | None = None) -> dict:
        o = dict(base or {})
        o["column_plans"] = self.column_plans
        o.setdefault("compression", self.compression)
        return o


def _index_bytes(card: int) -> int:
    if card <= 256:
        return 1
    if card <= 65536:
        return 2
    if card <= 1 << 24:
        return 3
    return 4


def _batch_string_stats(arr: pa.ChunkedArray | pa.Array) -> dict:
    import pyarrow.compute as pc

    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    values = arr.drop_null()
    n = len(values)
    if n == 0:
        return {"n": 0, "bytes": 0, "distinct": 0, "entropy": 0.0}
    lens = pc.binary_length(values)
    total = int(pc.sum(lens).as_py() or 0)
    distinct = len(pc.unique(values))
    from .column import _string_parts

    _, data = _string_parts(values)
    buf = np.frombuffer(data, dtype=np.uint8)
    sample = buf[:: max(len(buf) // 65536, 1)]
    hist = np.bincount(sample, minlength=256).astype(np.float64)
    p = hist / max(hist.sum(), 1)
    nz = p > 0
    entropy = float(-(p[nz] * np.log2(p[nz])).sum())
    return {"n": n, "bytes": total, "distinct": distinct, "entropy": entropy}


_SAMPLE_CACHE_ATTR = "_mothray_head_sample"


def _head_sample(ds, cols: list[str], rows: int) -> pa.Table:
    """One bounded head fetch, cached on the Dataset object so the
    stats pass and the FSST-training pass share a single execution."""
    cached = getattr(ds, _SAMPLE_CACHE_ATTR, None)
    if cached is None or cached.num_rows < min(rows, 1):
        cached = ds.take_batch(rows, batch_format="pyarrow")
        try:
            setattr(ds, _SAMPLE_CACHE_ATTR, cached)
        except AttributeError:
            pass
    return cached.select([c for c in cols if c in cached.column_names])


def sample_stats(ds, fraction: float = 0.05, seed: int = 23, sample_rows: int = 4096) -> dict[str, dict]:
    """Pass 1: per-column cardinality / byte-entropy stats over a
    BOUNDED head sample (`ds.limit` -> streaming early-stop, so only
    the first blocks are read — at 100 TB the planning pass must not
    scan the corpus; head bias is acceptable for codec choice and is
    corrected per stripe by the store-raw / dict-ratio fallbacks).

    `fraction >= 1.0` forces a full scan (tests)."""
    schema = ds.schema()
    str_cols = [
        n
        for n, t in zip(schema.names, schema.types)
        if pa.types.is_string(t) or pa.types.is_large_string(t)
    ]
    if not str_cols:
        return {}
    if fraction >= 1.0:
        batches = ds.select_columns(str_cols).iter_batches(batch_format="pyarrow", batch_size=None)
    else:
        batches = [_head_sample(ds, str_cols, sample_rows)]

    merged: dict[str, dict] = {c: {"n": 0, "bytes": 0, "distinct": 0, "entropy": []} for c in str_cols}
    for b in batches:
        for c in str_cols:
            st = _batch_string_stats(b.column(c))
            m = merged[c]
            m["n"] += st["n"]
            m["bytes"] += st["bytes"]
            m["distinct"] = max(m["distinct"], st["distinct"])  # lower bound
            if st["n"]:
                m["entropy"].append(st["entropy"])
    for c, m in merged.items():
        m["entropy"] = float(np.mean(m["entropy"])) if m["entropy"] else 0.0
        m["avg_len"] = m["bytes"] / max(m["n"], 1)
    return merged


DICT_TOTAL_BUDGET = 16 << 20  # reference dictionaryMaxMemory default


def build_plan(
    stats: dict[str, dict],
    compression: str = "zstd",
    dict_total_budget: int = DICT_TOTAL_BUDGET,
) -> CodecPlan:
    plans: dict[str, dict] = {}
    dict_cands: list[tuple[float, int, str]] = []  # (ratio, dict_bytes, col)
    total_n = 0
    for col, st in stats.items():
        n, distinct, avg_len = st["n"], max(st["distinct"], 1), st["avg_len"]
        total_n += n
        if n == 0:
            continue
        raw = st["bytes"]
        dict_cost = distinct * avg_len + n * _index_bytes(distinct)
        ratio = raw / max(dict_cost, 1)
        if ratio >= DICT_MIN_RATIO:
            plans[col] = {"string_encoding": "dict"}
            dict_cands.append((ratio, int(distinct * avg_len), col))
        elif avg_len >= FSST_MIN_AVG_LEN and st["entropy"] <= FSST_MAX_ENTROPY:
            plans[col] = {"string_encoding": "fsst"}
        else:
            plans[col] = {"string_encoding": "direct"}
    # Cross-column dictionary memory budget with eviction by projected
    # ratio (reference DictionaryCompressionOptimizer.go:166-225
    # selectDictionaryColumnToConvert: when total dictionary memory
    # exceeds the budget, the column with the LOWEST projected
    # compression converts to direct encoding first).
    total_dict = sum(b for _, b, _ in dict_cands)
    if total_dict > dict_total_budget:
        for ratio, dbytes, col in sorted(dict_cands):
            st = stats[col]
            if st["avg_len"] >= FSST_MIN_AVG_LEN and st["entropy"] <= FSST_MAX_ENTROPY:
                plans[col] = {"string_encoding": "fsst"}
            else:
                plans[col] = {"string_encoding": "direct"}
            total_dict -= dbytes
            if total_dict <= dict_total_budget:
                break
    return CodecPlan(column_plans=plans, compression=compression, sampled_rows=total_n)


def _plan_float_columns(sample: pa.Table, plans: dict, compression: str = "zstd") -> None:
    """Fix float_encoding (bss vs raw) per float column from the
    sampling pass, so the encode pass skips the per-row-group trial
    (mirrors how string codec choices are planned once)."""
    from .column import _float_trial

    for name, t in zip(sample.column_names, sample.schema.types):
        if t not in (pa.float32(), pa.float64()):
            continue
        arr = sample.column(name)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        v = arr.drop_null().to_numpy(zero_copy_only=False)
        if len(v) < 64:
            continue
        plans.setdefault(name, {})["float_encoding"] = _float_trial(v, compression)


_INT_PLAN_TYPES = (pa.int16(), pa.int32(), pa.int64(), pa.uint16(), pa.uint32(), pa.uint64())


def _plan_int_columns(sample: pa.Table, plans: dict, compression: str = "zstd") -> None:
    """Fix int_encoding (dict vs rlev2) per integer column from the
    sampling pass. Only columns where the dictionary wins by 1.25x on
    the sample get a plan entry — the default stays the
    reference-faithful RLEv2 path with zero per-stripe trial cost."""
    from .column import _int_trial

    for name, t in zip(sample.column_names, sample.schema.types):
        if t not in _INT_PLAN_TYPES:
            continue
        arr = sample.column(name)
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        signed = pa.types.is_signed_integer(t)
        v = arr.drop_null().to_numpy(zero_copy_only=False).astype(
            np.int64 if signed else np.uint64
        )
        if len(v) < 64:
            continue
        if _int_trial(v, compression, signed) == "dict":
            plans.setdefault(name, {})["int_encoding"] = "dict"


def plan_from_table(tbl: pa.Table, compression: str = "zstd") -> CodecPlan:
    """CodecPlan from an in-hand sample table (e.g. the first row group
    of a checkpointed job's input) — no Dataset execution needed."""
    stats = {}
    for name, t in zip(tbl.column_names, tbl.schema.types):
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            st = _batch_string_stats(tbl.column(name))
            st["avg_len"] = st["bytes"] / max(st["n"], 1)
            stats[name] = st
    p = build_plan(stats, compression)
    _plan_float_columns(tbl, p.column_plans, compression)
    _plan_int_columns(tbl, p.column_plans, compression)
    fsst_cols = [c for c, v in p.column_plans.items() if v.get("string_encoding") == "fsst"]
    if fsst_cols:
        from .codecs import fsst as fsst_codec
        from .column import _string_parts

        for c in fsst_cols:
            arr = tbl.column(c)
            arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
            _, data = _string_parts(arr.drop_null())
            table = fsst_codec.train(data)
            if table.symbols:
                p.column_plans[c]["fsst_table"] = table.serialize()
    return p


def plan_from_path_cached(
    path: str, cache_path: str | None = None, compression: str = "zstd", max_rows: int = 8192
) -> CodecPlan:
    """CodecPlan from the FIRST ROW GROUP of the first file at `path`
    — a plain pq read on the driver, no Ray pipeline (spinning a
    streaming executor for a 4k-row sample costs ~1.5s per job; the
    checkpoint layer already plans this way). Head bias is the same
    deliberate trade as sample_stats."""
    import os

    import pyarrow.parquet as pq

    if cache_path and os.path.exists(cache_path):
        return plan_dataset_cached(None, cache_path, compression=compression)
    files = (
        [path]
        if os.path.isfile(path)
        else sorted(
            os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
        )
    )
    sample = pq.ParquetFile(files[0]).read_row_group(0)
    if sample.num_rows > max_rows:
        sample = sample.slice(0, max_rows)
    p = plan_from_table(sample, compression)
    if cache_path:
        _store_plan(p, cache_path)
    return p


def _store_plan(p: CodecPlan, cache_path: str) -> None:
    import base64
    import json
    import os

    ser = {
        c: {
            **v,
            **(
                {"fsst_table": base64.b64encode(v["fsst_table"]).decode()}
                if "fsst_table" in v
                else {}
            ),
        }
        for c, v in p.column_plans.items()
    }
    os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
    tmp = cache_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"column_plans": ser, "compression": p.compression, "sampled_rows": p.sampled_rows},
            f,
        )
    os.rename(tmp, cache_path)


def plan_dataset_cached(
    ds, cache_path: str | None, fraction: float = 0.05, compression: str = "zstd"
) -> CodecPlan:
    """plan_dataset with a JSON disk cache: the sampling/training pass
    is paid once per INPUT, not once per run (the job-checkpoint layer
    already persists plans this way — this gives the ad-hoc pipeline /
    bench path the same amortization)."""
    import base64
    import json
    import os

    if cache_path and os.path.exists(cache_path):
        with open(cache_path) as f:
            stored = json.load(f)
        plans = {
            c: {
                **v,
                **({"fsst_table": base64.b64decode(v["fsst_table"])} if "fsst_table" in v else {}),
            }
            for c, v in stored["column_plans"].items()
        }
        return CodecPlan(plans, stored.get("compression", compression), stored.get("sampled_rows", 0))
    p = plan_dataset(ds, fraction, compression)
    if cache_path:
        _store_plan(p, cache_path)
    return p


def plan_dataset(ds, fraction: float = 0.05, compression: str = "zstd") -> CodecPlan:
    """Sampling pass -> CodecPlan, including one shared FSST symbol
    table per FSST column (trained once here, broadcast to every encode
    task — the reference's shared-writer-state equivalent without a
    single-process bottleneck, SURVEY.md §7.2)."""
    p = build_plan(sample_stats(ds, fraction), compression)
    fsst_cols = [c for c, v in p.column_plans.items() if v.get("string_encoding") == "fsst"]
    if fsst_cols:
        from .codecs import fsst as fsst_codec
        from .column import _string_parts

        head = _head_sample(ds, fsst_cols, 4096)
        for c in fsst_cols:
            arr = head.column(c)
            arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
            _, data = _string_parts(arr.drop_null())
            table = fsst_codec.train(data)
            if table.symbols:
                p.column_plans[c]["fsst_table"] = table.serialize()
    schema = ds.schema()
    float_cols = [
        n for n, t in zip(schema.names, schema.types) if t in (pa.float32(), pa.float64())
    ]
    if float_cols:
        _plan_float_columns(_head_sample(ds, float_cols, 4096), p.column_plans, compression)
    int_cols = [n for n, t in zip(schema.names, schema.types) if t in _INT_PLAN_TYPES]
    if int_cols:
        _plan_int_columns(_head_sample(ds, int_cols, 4096), p.column_plans, compression)
    return p
