"""ML feature-engineering operators: classic tabular preprocessing
over Datasets (the step between curation and training).

* target_encode — smoothed mean-target (impact) encoding of a
  categorical column: enc(c) = (sum_c + prior * m) / (count_c + m),
  the standard leakage-damped category encoder. One combiner-reduced
  (category, sum, count) exchange; the bounded category map broadcasts
  via ray.put and the encode pass streams with no further shuffle.
* one_hot — 0/1 indicator columns for a bounded category set. With
  `categories` given the op is a pure per-batch transform (no pass at
  all); otherwise one distinct-value pass derives them (guarded —
  one-hotting an unbounded column is a modeling error on any engine).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def target_encode(
    ds,
    cat_col: str,
    target_col: str,
    m: float = 10.0,
    out_col: str | None = None,
    max_categories: int = 100_000,
):
    """Append `out_col` (default f'{cat_col}__te') with the smoothed
    mean of `target_col` per category. Null targets are ignored in the
    sums (SQL AVG semantics); null/unseen categories fall back to the
    global prior. The prior is the global mean of the non-null
    targets."""
    import pyarrow.compute as pc
    import ray

    out_name = out_col or f"{cat_col}__te"

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([cat_col, target_col])
        tv = t.column(target_col).combine_chunks().cast(pa.float64())
        ok = pc.is_valid(tv)
        t = t.filter(pc.and_(ok, pc.is_valid(t.column(cat_col))))
        g = t.group_by(cat_col, use_threads=False).aggregate(
            [(target_col, "sum"), (target_col, "count")]
        )
        return g.rename_columns([cat_col, "s", "c"])

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(cat_col)
        .sum(["s", "c"])
        .take_all()
    )
    if len(rows) > max_categories:
        raise ValueError(
            f"target_encode: {len(rows)} categories exceed max_categories="
            f"{max_categories} — a corpus-cardinality key is not a category column"
        )
    cats = [r[cat_col] for r in rows]
    sums = np.array([r["sum(s)"] for r in rows], dtype=np.float64)
    cnts = np.array([r["sum(c)"] for r in rows], dtype=np.float64)
    # prior = GLOBAL target mean (all non-null targets, including rows
    # whose category is null — they carry training signal too)
    def gpartial(batch: pa.Table) -> pa.Table:
        tv = batch.column(target_col).combine_chunks().cast(pa.float64())
        tv = tv.drop_null()
        return pa.table(
            {
                "gs": pa.array([pc.sum(tv).as_py() or 0.0], pa.float64()),
                "gc": pa.array([len(tv)], pa.int64()),
            }
        )

    tot = ds.select_columns([target_col]).map_batches(
        gpartial, batch_format="pyarrow", zero_copy_batch=True
    ).sum(["gs", "gc"])
    total_n = tot["sum(gc)"] or 0
    if total_n == 0:
        raise ValueError(f"target_encode: target column {target_col!r} is all null")
    prior = float(tot["sum(gs)"] / total_n)
    enc = (sums + prior * m) / (cnts + m)
    # broadcast map keyed by category value (values as arrow array for
    # typed index_in lookup)
    map_ref = ray.put((pa.array(cats), pa.array(enc, pa.float64()), prior))

    def encode(batch: pa.Table) -> pa.Table:
        import ray as ray_api

        keys, vals, pr = ray_api.get(map_ref)
        idx = pc.index_in(batch.column(cat_col).combine_chunks(), value_set=keys)
        looked = vals.take(pc.fill_null(idx, 0))
        out = pc.if_else(pc.is_valid(idx), looked, pa.scalar(pr, pa.float64()))
        return batch.append_column(out_name, out)

    return ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)


def one_hot(
    ds,
    cat_col: str,
    categories: list | None = None,
    max_categories: int = 256,
    drop_source: bool = False,
):
    """Append one int8 0/1 column per category, named
    f'{cat_col}__{value}'. Null and out-of-set values get all zeros.
    With `categories` given this is a pure per-batch transform; else
    one distinct pass derives the sorted category set (bounded by
    `max_categories`)."""
    import pyarrow.compute as pc

    if categories is None:
        rows = ds.groupby(cat_col).count().take_all()
        categories = sorted(r[cat_col] for r in rows if r[cat_col] is not None)
    if len(categories) > max_categories:
        raise ValueError(
            f"one_hot: {len(categories)} categories exceed max_categories={max_categories}"
        )
    cats = list(categories)

    def encode(batch: pa.Table) -> pa.Table:
        col = batch.column(cat_col).combine_chunks()
        out = batch.drop_columns([cat_col]) if drop_source else batch
        for c in cats:
            flag = pc.fill_null(pc.equal(col, c), False)
            out = out.append_column(f"{cat_col}__{c}", pc.cast(flag, pa.int8()))
        return out

    return ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True)


def ewma_trailing(
    ds,
    key_col: str,
    order_col: str,
    value_col: str,
    tiebreak_col: str,
    alpha: float = 0.3,
    window: int = 20,
    round_digits: int = 6,
):
    """Trailing exponentially-weighted moving average per key — the
    standard recency-weighted feature for event streams: over each
    key's LAST `window` rows ordered by (order DESC, tiebreak ASC),

        ewma = sum((1-alpha)^r_i * x_i) / sum((1-alpha)^r_i)

    with r = 0 for the most recent row (pandas ewm(adjust=True)
    restricted to a trailing window). Null values drop before
    ranking. One row per key: (key, n_used, ewma).

    Scale shape: the top-k-per-group COMBINER bounds the exchange to
    `window` rows per (batch, key) and the group task holds at most
    `window` rows — the corpus never sorts globally and per-key state
    is O(window)."""
    import pyarrow.compute as pc

    from .sample import top_k_per_group

    def drop_null(batch: pa.Table) -> pa.Table:
        keep = pc.is_valid(batch.column(value_col))
        return batch.filter(keep).select(
            sorted({key_col, order_col, value_col, tiebreak_col})
        )

    recent = top_k_per_group(
        ds.map_batches(drop_null, batch_format="pyarrow", zero_copy_batch=True),
        key_col,
        order_col,
        window,
        ascending=False,
        tiebreak_col=tiebreak_col,
    )

    r = 1.0 - alpha

    def wavg(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[(order_col, "descending"), (tiebreak_col, "ascending")]
        )
        x = (
            pc.cast(g.take(idx).column(value_col), pa.float64())
            .to_numpy(zero_copy_only=False)
        )
        w = np.power(r, np.arange(len(x), dtype=np.float64))
        ewma = float((w * x).sum() / w.sum()) if len(x) else None
        return pa.table(
            {
                key_col: g.column(key_col).slice(0, 1),
                "n_used": pa.array([len(x)], pa.int64()),
                "ewma": pa.array(
                    [None if ewma is None else round(ewma, round_digits)], pa.float64()
                ),
            }
        )

    from .nullkeys import null_safe_group_map

    return null_safe_group_map(recent, [key_col], wavg)
