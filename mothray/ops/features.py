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


def date_features(ds, col: str, prefix: str | None = None):
    """Calendar feature columns from a timestamp/date column — the
    standard ML date expansion: ISO day-of-week (Mon=1..Sun=7), ISO
    week, month, quarter, year, is_weekend. Pure per-batch Arrow
    kernels (no shuffle, no state); null dates yield null features.
    Column names follow DuckDB's functions (isodow/week/month/quarter/
    year) so the SQL oracle is a direct rewrite."""
    import pyarrow.compute as pc

    p = f"{prefix or col}_"

    def expand(batch: pa.Table) -> pa.Table:
        c = batch.column(col)
        i64 = pa.int64()
        dow = pc.cast(
            pc.day_of_week(
                c, options=pc.DayOfWeekOptions(count_from_zero=False, week_start=1)
            ),
            i64,
        )
        return (
            batch.append_column(f"{p}isodow", dow)
            .append_column(f"{p}week", pc.cast(pc.iso_week(c), i64))
            .append_column(f"{p}month", pc.cast(pc.month(c), i64))
            .append_column(f"{p}quarter", pc.cast(pc.quarter(c), i64))
            .append_column(f"{p}year", pc.cast(pc.year(c), i64))
            .append_column(f"{p}is_weekend", pc.greater_equal(dow, 6))
        )

    return ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True)


def impute(
    ds,
    cols: list[str],
    strategy: str = "mean",
    group_col: str | None = None,
    round_digits: int | None = None,
):
    """Null imputation — the ML-pipeline staple: fill nulls in `cols`
    with the column's mean / median / mode, optionally per group
    (cold-start groups with NO observed value fall back to the global
    statistic). Two passes: one combiner-reduced statistics pass
    (moments / histogram machinery — group-width rows only), then the
    broadcast fill streams with no shuffle.

    * mean  — SQL avg() semantics (nulls excluded);
    * median — exact quantile_disc(0.5) (lower-of-two convention, so
      the fill value is always a REAL observed value, never an
      engine-dependent interpolation);
    * mode  — most frequent value, ties to the smallest (SQL
      mode() ... but with a DETERMINISTIC tie, which DuckDB's mode
      does not guarantee — the oracle must break ties explicitly).
    """
    import pyarrow.compute as pc
    import ray

    if strategy not in ("mean", "median", "mode"):
        raise ValueError(f"impute: unknown strategy {strategy!r}")

    def hist_stat(vals: np.ndarray, counts: np.ndarray):
        """sorted (distinct values, counts) -> fill value."""
        if len(vals) == 0:
            return None
        cum = np.cumsum(counts)
        if strategy == "mean":
            return float((vals * counts).sum() / cum[-1])
        if strategy == "median":
            # quantile_disc(0.5): smallest value with cum >= ceil(n/2)
            need = (cum[-1] + 1) // 2
            return vals[np.searchsorted(cum, need)]
        best = counts.max()
        return vals[np.flatnonzero(counts == best)[0]]  # ties: smallest value

    def global_stat(c: str):
        if strategy == "mean":
            # sum/count combiner — a distinct-value histogram would be
            # corpus-sized on a continuous column
            def p(batch: pa.Table) -> pa.Table:
                v = batch.column(c).combine_chunks().cast(pa.float64()).drop_null()
                import pyarrow.compute as _pc

                return pa.table(
                    {
                        "s": pa.array([_pc.sum(v).as_py() or 0.0], pa.float64()),
                        "n": pa.array([len(v)], pa.int64()),
                    }
                )

            tot = ds.select_columns([c]).map_batches(
                p, batch_format="pyarrow", zero_copy_batch=True
            ).sum(["s", "n"])
            n = tot["sum(n)"] or 0
            return float(tot["sum(s)"] / n) if n else None
        from .sketch import _value_histogram

        vals, cum = _value_histogram(ds.select_columns([c]), c)
        return hist_stat(np.asarray(vals), np.diff(np.concatenate(([0], cum))))

    def table_stat(tbl: pa.Table, c: str):
        if strategy == "mean":
            v = tbl.column(c).combine_chunks().cast(pa.float64()).drop_null()
            return float(pc.sum(v).as_py() / len(v)) if len(v) else None
        vc = pc.value_counts(tbl.column(c).combine_chunks().drop_null())
        vals = vc.field("values").to_numpy(zero_copy_only=False)
        counts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(vals, kind="stable")
        return hist_stat(vals[order], counts[order])

    # statistics pass: per (group, col) over non-null values; the
    # GLOBAL fallback lives under group key None — null-group rows use
    # it too (a cold-start convention, documented above)
    stats: dict = {}
    for c in cols:
        stats[(c, None)] = global_stat(c)
        if group_col is not None:
            from .nullkeys import null_safe_group_map

            def per_group(g: pa.Table, c=c) -> pa.Table:
                v = table_stat(g, c)
                return pa.table(
                    {
                        "g": g.column(group_col).slice(0, 1),
                        "v": pa.array(
                            [v],
                            pa.float64() if strategy == "mean" else g.column(c).type,
                        ),
                    }
                )

            rows = null_safe_group_map(
                ds.select_columns([group_col, c]), [group_col], per_group
            ).take_all()
            for r in rows:
                if r["g"] is not None:
                    stats[(c, r["g"])] = r["v"]
    # per-column broadcast maps: (group keys array, fill values array,
    # global fallback) — vectorized index_in lookup per batch, no
    # per-row Python
    maps = {}
    for c in cols:
        gk = [g for (cc, g) in stats if cc == c and g is not None]
        gv = [stats[(c, g)] for g in gk]
        maps[c] = (
            pa.array(gk) if gk else None,
            pa.array(gv, pa.float64()) if strategy == "mean" and gk else (pa.array(gv) if gk else None),
            stats.get((c, None)),
        )
    ref = ray.put(maps)

    def fill(batch: pa.Table) -> pa.Table:
        st = ray.get(ref)
        out = batch
        for c in cols:
            keys, vals, fallback = st[c]
            col = out.column(c)
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            base = pc.cast(col, pa.float64()) if strategy == "mean" else col
            if group_col is None or keys is None:
                filled = base if fallback is None else pc.fill_null(base, fallback)
            else:
                idx = pc.index_in(out.column(group_col).combine_chunks(), value_set=keys)
                looked = vals.take(pc.fill_null(idx, 0))
                repl = pc.if_else(
                    pc.and_(pc.is_valid(idx), pc.is_valid(looked)),
                    looked.cast(base.type),
                    pa.scalar(fallback, base.type),
                )
                filled = pc.if_else(pc.is_valid(base), base, repl)
            if round_digits is not None and pa.types.is_floating(filled.type):
                filled = pa.array(
                    np.round(filled.to_numpy(zero_copy_only=False), round_digits),
                    pa.float64(),
                )
            out = out.set_column(out.schema.get_field_index(c), c, filled)
        return out

    return ds.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)


def bin_numeric(
    ds,
    col: str,
    bins: int = 10,
    method: str = "width",
    out_col: str | None = None,
):
    """Numeric binning feature: append `out_col` (default
    f'{col}__bin') with the 1-based bin index.

    * method='width' — equal-width bins over the observed [min, max]
      (SQL width_bucket semantics: values below/above the range would
      take 0 / bins+1, but min/max come FROM the data so only the
      max-value edge case matters — width_bucket puts x == max in
      bins+1; this op CLAMPS to `bins`, the conventional histogram
      choice, and the oracle mirrors with LEAST).
    * method='quantile' — equal-frequency bins at exact
      quantile_disc cut points (broadcast; searchsorted per batch).
    Null values get a null bin. One bounded statistics pass, then a
    shuffle-free streaming apply."""
    import pyarrow.compute as pc

    if method not in ("width", "quantile"):
        raise ValueError(f"bin_numeric: unknown method {method!r}")
    oc = out_col or f"{col}__bin"

    if method == "width":
        from ray.data.aggregate import Max, Min

        mm = ds.aggregate(Min(col), Max(col))  # one pass, not two
        lo, hi = mm[f"min({col})"], mm[f"max({col})"]
        width = (hi - lo) / bins if hi is not None and hi > lo else None

        def apply(batch: pa.Table) -> pa.Table:
            c = batch.column(col)
            c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
            x = pc.cast(c, pa.float64()).to_numpy(zero_copy_only=False)
            if width is None:
                b = np.where(np.isnan(x), -1, 1)
            else:
                # mirror SQL width_bucket: floor((x-lo)/width)+1, clamped
                b = np.floor((x - lo) / width) + 1
                b = np.where(np.isnan(x), -1, np.clip(b, 1, bins))
            arr = pa.array(b.astype(np.int64), pa.int64(),
                           mask=(b == -1))
            return batch.append_column(oc, arr)

        return ds.map_batches(apply, batch_format="pyarrow", zero_copy_batch=True)

    from .sketch import exact_quantiles

    qs = [i / bins for i in range(1, bins)]
    cuts_map = exact_quantiles(ds, col, qs)
    cuts = np.array([cuts_map[q] for q in qs if cuts_map[q] is not None], dtype=np.float64)

    def applyq(batch: pa.Table) -> pa.Table:
        c = batch.column(col)
        c = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        x = pc.cast(c, pa.float64()).to_numpy(zero_copy_only=False)
        b = np.searchsorted(cuts, x, side="left") + 1
        arr = pa.array(
            np.where(np.isnan(x), 0, b).astype(np.int64), pa.int64(), mask=np.isnan(x)
        )
        return batch.append_column(oc, arr)

    return ds.map_batches(applyq, batch_format="pyarrow", zero_copy_batch=True)


def info_gain_split(
    ds,
    feature_col: str,
    class_col: str,
    decimal_scale: int = 2,
    round_digits: int = 6,
) -> pa.Table:
    """Best decision-stump split of a numeric feature against a
    categorical class: the threshold t maximizing information gain

        gain(t) = H(class) - nL/n * H(class | x <= t)
                           - nR/n * H(class | x > t)

    (entropy in nats). One row out: (threshold, n_left, n_right,
    gain) — the CART/C4.5 building block, useful standalone for
    feature scoring at corpus scale.

    Scale shape: one combiner pass reduces the corpus to the
    (distinct feature value x class) count grid — bounded by the
    DOMAINS, not rows (features quantize to decimal_scale decimals) —
    and the driver scans the sorted grid with vectorized cumulative
    counts. Ties in gain break on the smallest threshold; gain is
    rounded to 9 digits before the argmax so the float summation
    order cannot flip near-plateau candidates between engines."""
    import pyarrow.compute as pc

    scale = 10.0**decimal_scale

    def partial(batch: pa.Table) -> pa.Table:
        x = pc.cast(
            pc.round(pc.multiply(pc.cast(batch.column(feature_col), pa.float64()), scale)),
            pa.int64(),
        )
        t = pa.table({"v": x, "c": batch.column(class_col)}).filter(
            pc.and_(pc.is_valid(x), pc.is_valid(batch.column(class_col)))
        )
        g = t.group_by(["v", "c"], use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(["v", "c", "n"])

    from ray.data.aggregate import Sum

    grid = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["v", "c"])
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    if not grid:
        return pa.table(
            {
                "threshold": pa.array([None], pa.float64()),
                "n_left": pa.array([0], pa.int64()),
                "n_right": pa.array([0], pa.int64()),
                "gain": pa.array([None], pa.float64()),
            }
        )
    classes = sorted({str(r["c"]) for r in grid})
    values = sorted({r["v"] for r in grid})
    vi = {v: i for i, v in enumerate(values)}
    ci = {c: j for j, c in enumerate(classes)}
    m = np.zeros((len(values), len(classes)), dtype=np.int64)
    for r in grid:
        m[vi[r["v"]], ci[str(r["c"])]] = r["n"]
    tot = m.sum(axis=0).astype(np.float64)
    n = float(tot.sum())

    def ent(counts, denom):
        with np.errstate(divide="ignore", invalid="ignore"):
            p = counts / denom[..., None]
            terms = np.where(counts > 0, -p * np.log(p), 0.0)
        return terms.sum(axis=-1)

    h0 = float(ent(tot[None, :], np.array([n]))[0])
    cum = np.cumsum(m, axis=0).astype(np.float64)  # left counts per split at v
    nl = cum.sum(axis=1)
    if len(values) < 2:
        return pa.table(
            {
                "threshold": pa.array([None], pa.float64()),
                "n_left": pa.array([int(n)], pa.int64()),
                "n_right": pa.array([0], pa.int64()),
                "gain": pa.array([None], pa.float64()),
            }
        )
    # candidate splits: x <= values[i], i = 0..len-2 (last splits nothing)
    cum, nl = cum[:-1], nl[:-1]
    nr = n - nl
    hl = ent(cum, nl)
    hr = ent(tot[None, :] - cum, nr)
    gain = h0 - (nl / n) * hl - (nr / n) * hr
    gr = np.round(gain, 9)
    best = int(np.argmax(gr))  # argmax takes the FIRST max -> smallest v
    return pa.table(
        {
            "threshold": pa.array([values[best] / scale], pa.float64()),
            "n_left": pa.array([int(nl[best])], pa.int64()),
            "n_right": pa.array([int(nr[best])], pa.int64()),
            "gain": pa.array([round(float(gain[best]), round_digits)], pa.float64()),
        }
    )


def _split_words(texts: pa.Array | pa.ChunkedArray):
    """Split on single spaces (SQL string_split(text, ' ') semantics),
    returning (words_per_doc int64, flat word StringArray)."""
    import pyarrow.compute as pc

    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    words = pc.split_pattern(arr.fill_null(""), " ")
    words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
    offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    return np.diff(offs - offs[0]), words.flatten()


def _word_buckets(flat_words, k: int) -> np.ndarray:
    """Bucket id per word: rolling codepoint-FNV fingerprint mod k —
    the exact hash the SQL oracles replicate via list_reduce."""
    from .text import fingerprint_batch

    fp = fingerprint_batch(pa.table({"w": flat_words}), "w").column("fingerprint")
    return (fp.to_numpy(zero_copy_only=False).view(np.uint64) % np.uint64(k)).astype(
        np.int64
    )


def feature_hash(ds, id_col: str = "doc_id", column: str = "text", k: int = 64):
    """Hashing-trick vectorizer (Weinberger et al. 2009): each document
    becomes a fixed k-bucket token-count vector, bucket = FNV(word) %
    k over the single-space word split (empty words dropped). The
    standard collision-tolerant featurizer when the vocabulary is
    unbounded — no vocabulary pass, no shuffle, output schema is fixed
    at plan time. Returns (id, features list<int64> of length k) —
    vector construction is one np.add.at scatter per batch."""

    def vecs(batch: pa.Table) -> pa.Table:
        counts, flat = _split_words(batch.column(column))
        keep = np.asarray(
            pa.compute.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
        )
        parent = np.repeat(np.arange(len(counts), dtype=np.int64), counts)[keep]
        b = _word_buckets(flat.filter(pa.array(keep)), k)
        mat = np.zeros((len(counts), k), dtype=np.int64)
        np.add.at(mat, (parent, b), 1)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.reshape(-1), pa.int64()), k
                ),
            }
        )

    return ds.select_columns(sorted({id_col, column})).map_batches(
        vecs, batch_format="pyarrow", zero_copy_batch=True
    )


def feature_hash_histogram(ds, column: str = "text", k: int = 64):
    """Global audit of a feature_hash space: per bucket, total token
    occurrences and distinct words landing there (the collision-load
    report read before committing to a k). Exact and SQL-checkable
    (the oracle replays the FNV in list_reduce).

    Scale: token totals ride a per-batch k-row combiner; distinct
    words need one (bucket, word) distinct groupby whose exchange
    carries each batch's LOCAL distinct words once — vocabulary-sized,
    not corpus-sized."""

    def partial(batch: pa.Table) -> pa.Table:
        counts, flat = _split_words(batch.column(column))
        keep = np.asarray(
            pa.compute.utf8_length(flat).to_numpy(zero_copy_only=False) > 0
        )
        flat = flat.filter(pa.array(keep))
        b = _word_buckets(flat, k)
        t = pa.table({"b": pa.array(b), "w": flat})
        agg = t.group_by(["b", "w"], use_threads=False).aggregate([([], "count_all")])
        return agg.rename_columns(["b", "w", "cnt"])

    pairs = (
        ds.select_columns([column])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["b", "w"])
        .sum("cnt")
    )

    def per_bucket(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "b": t.column("b"),
                "n_tokens": t.column("sum(cnt)"),
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    out = (
        pairs.map_batches(per_bucket, batch_format="pyarrow")
        .groupby("b")
        .sum(["n_tokens", "one"])
        .take_all()
    )  # k rows
    rows = sorted(out, key=lambda r: r["b"])
    return pa.table(
        {
            "bucket": pa.array([r["b"] for r in rows], pa.int64()),
            "n_tokens": pa.array([r["sum(n_tokens)"] for r in rows], pa.int64()),
            "n_words": pa.array([r["sum(one)"] for r in rows], pa.int64()),
        }
    )
