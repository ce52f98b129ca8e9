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
        codes = d.indices.to_numpy(zero_copy_only=False)
        dict_rates = np.array(
            [rate_by_key.get(v.as_py(), rate) for v in d.dictionary], dtype=np.float64
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
        gv = g.column(group_col).to_numpy(zero_copy_only=False)
        first = np.r_[True, gv[1:] != gv[:-1]]
        starts = np.flatnonzero(first)
        rank = np.arange(len(gv)) - np.repeat(starts, np.diff(np.r_[starts, len(gv)]))
        return g.filter(pa.array(rank < k))

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(group_col)
        .map_groups(partial, batch_format="pyarrow")
    )
