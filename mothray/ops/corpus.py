"""Corpus-level token statistics for webtext curation: Zipf-law fit,
out-of-vocabulary rate, and PMI-scored bigram collocations.

All three share the same exchange shape as ops/text.token_top_k: a
per-batch pyarrow value_counts combiner means only (token, cnt)
partials cross the object store — never raw tokens — and the final
statistics run over reduced count tables.

- zipf_slope: OLS fit of ln(cnt) ~ ln(rank) over the top-k tokens.
  A natural-language corpus fits slope ~ -1 (Zipf's law); synthetic
  or templated text shows flatter slopes. The regression runs on the
  k-row result (repartition(1) is O(k)).
- oov_rate: share of token occurrences outside the top-v global
  vocabulary, per document source — the standard cheap proxy for
  "weird" text (OCR noise, boilerplate, non-target languages). Two
  passes: vocab combiner groupby, then a broadcast is_in scan.
- pmi_bigrams: pointwise mutual information of adjacent word pairs,
  ln(p(xy) / (p(x) p(y))) — collocation mining (Church & Hanks 1990).
  Unigram and bigram counts reduce independently; bigrams passing
  min_count join their word marginals through partitioned_join (which
  auto-broadcasts small sides), so no raw text is ever re-shuffled.

Tokenization matches the ngram/token_top_k family exactly (lower,
split on single space) so the SQL oracles stay string_split-exact.

No reference analog (orc-go has no analytics operators) — engine
extension alongside the tfidf / lm / ngram webtext family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _token_counts(ds, column: str):
    """Distributed (token, cnt) counts with a per-batch combiner."""

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.utf8_lower(batch.column(column).combine_chunks().fill_null("")), " "
        )
        vc = pc.value_counts(toks.flatten())
        return pa.table(
            {"token": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .sum("cnt")
        .map_batches(
            lambda t: t.rename_columns(["token", "cnt"]), batch_format="pyarrow"
        )
    )


def zipf_slope(ds, column: str = "text", k: int = 100, round_digits: int = 6):
    """One row (n_tokens BIGINT, slope_r6, intercept_r6, r2_r6): OLS of
    ln(cnt) on ln(rank) over the top-k tokens ranked by (cnt DESC,
    token). Tied counts permute ranks only within equal-cnt blocks, so
    the (ln rank, ln cnt) pair multiset — and the fit — is
    order-stable. Equivalent SQL: row_number window + regr_* over the
    LIMIT k count table."""
    counts = _token_counts(ds, column)
    top = counts.sort(["cnt", "token"], descending=[True, False]).limit(k)

    def fit(t: pa.Table) -> pa.Table:
        # re-sort inside the (single, k-row) batch so ranks never
        # depend on repartition preserving the upstream sort order
        t = t.sort_by([("cnt", "descending"), ("token", "ascending")])
        c = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
        x = np.log(np.arange(1, len(c) + 1, dtype=np.float64))
        y = np.log(c)
        mx, my = x.mean(), y.mean()
        sxx = ((x - mx) ** 2).sum()
        sxy = ((x - mx) * (y - my)).sum()
        syy = ((y - my) ** 2).sum()
        slope = sxy / sxx
        intercept = my - slope * mx
        r2 = (sxy * sxy) / (sxx * syy)
        return pa.table(
            {
                "n_tokens": pa.array([len(c)], pa.int64()),
                "slope_r6": pa.array([np.round(slope, round_digits)]),
                "intercept_r6": pa.array([np.round(intercept, round_digits)]),
                "r2_r6": pa.array([np.round(r2, round_digits)]),
            }
        )

    return top.repartition(1).map_batches(fit, batch_format="pyarrow")


def oov_rate(
    ds,
    column: str = "text",
    group_col: str = "source",
    vocab_k: int = 100,
    round_digits: int = 6,
):
    """(group, n_tokens BIGINT, oov BIGINT, oov_rate_r6) per source:
    token occurrences outside the global top-`vocab_k` vocabulary.
    Pass 1 builds the vocabulary (count combiner, k-row result,
    ray.put broadcast); pass 2 is a shuffle-free is_in scan with a
    per-batch (group, n, oov) combiner before the tiny group-sum."""
    import ray

    vocab_tbl = (
        _token_counts(ds.select_columns([column]), column)
        .sort(["cnt", "token"], descending=[True, False])
        .limit(vocab_k)
        .take_all()
    )
    vocab_ref = ray.put(pa.array([r["token"] for r in vocab_tbl], pa.string()))

    def partial(batch: pa.Table) -> pa.Table:
        vocab = ray.get(vocab_ref)
        toks = pc.split_pattern(
            pc.utf8_lower(batch.column(column).combine_chunks().fill_null("")), " "
        )
        flat = toks.flatten()
        oov = pc.invert(pc.is_in(flat, value_set=vocab))
        offs = np.asarray(toks.offsets, dtype=np.int64)
        offs = offs - offs[0]  # flatten() trims to the logical range
        lens = np.diff(offs)
        doc_oov = np.add.reduceat(
            np.asarray(oov, dtype=np.int64), offs[:-1], dtype=np.int64
        ) * (lens > 0)
        g = pa.table(
            {
                group_col: batch.column(group_col),
                "n_tokens": pa.array(lens),
                "oov": pa.array(doc_oov),
            }
        )
        agg = g.group_by([group_col]).aggregate([("n_tokens", "sum"), ("oov", "sum")])
        return agg.rename_columns([group_col, "n_tokens", "oov"])

    from ray.data.aggregate import Sum

    from .nullkeys import null_safe_group_aggregate

    totals = null_safe_group_aggregate(
        ds.select_columns(sorted({column, group_col})).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        [group_col],
        [Sum("n_tokens", alias_name="n_tokens"), Sum("oov", alias_name="oov")],
    )

    def rate(t: pa.Table) -> pa.Table:
        n = t.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.float64)
        o = t.column("oov").to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column(
            "oov_rate_r6", pa.array(np.round(o / n, round_digits), pa.float64())
        )

    return totals.map_batches(rate, batch_format="pyarrow").sort(group_col)


def pmi_bigrams(
    ds,
    column: str = "text",
    k: int = 30,
    min_count: int = 5,
    round_digits: int = 6,
):
    """Top-k adjacent-word collocations by PMI among bigrams with
    cnt >= min_count: (w1, w2, cnt BIGINT, pmi_r6), ordered by
    (pmi_r6 DESC, w1, w2). pmi = ln(c_xy * N1^2 / (N2 * c_x * c_y))
    with N1 = total tokens, N2 = total bigram windows."""
    from .join import partitioned_join

    shared = ds.select_columns([column])
    uni = _token_counts(shared, column).materialize()
    n1 = float(uni.sum("cnt"))

    def bipartial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.utf8_lower(batch.column(column).combine_chunks().fill_null("")), " "
        )
        flat = toks.flatten()
        offs = np.asarray(toks.offsets, dtype=np.int64)
        offs = offs - offs[0]  # flatten() trims to the logical range
        starts = np.arange(max(len(flat) - 1, 0), dtype=np.int64)
        doc_first = np.searchsorted(offs[1:], starts, side="right")
        doc_last = np.searchsorted(offs[1:], starts + 1, side="right")
        starts = starts[doc_first == doc_last]
        if len(starts) == 0:
            return pa.table(
                {
                    "w1": pa.array([], pa.string()),
                    "w2": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        w1 = flat.take(pa.array(starts))
        w2 = flat.take(pa.array(starts + 1))
        g = (
            pa.table({"w1": w1, "w2": w2})
            .group_by(["w1", "w2"])
            .aggregate([([], "count_all")])
        )
        return pa.table(
            {
                "w1": g.column("w1"),
                "w2": g.column("w2"),
                "cnt": g.column("count_all").cast(pa.int64()),
            }
        )

    big = (
        shared.map_batches(bipartial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["w1", "w2"])
        .sum("cnt")
        .map_batches(
            lambda t: t.rename_columns(["w1", "w2", "cnt"]), batch_format="pyarrow"
        )
        .materialize()
    )
    n2 = float(big.sum("cnt"))

    filt = big.filter(expr=f"cnt >= {min_count}")
    u1 = uni.map_batches(
        lambda t: t.rename_columns(["w1", "c1"]), batch_format="pyarrow"
    )
    u2 = uni.map_batches(
        lambda t: t.rename_columns(["w2", "c2"]), batch_format="pyarrow"
    )
    joined = partitioned_join(partitioned_join(filt, u1, on="w1"), u2, on="w2")

    def score(t: pa.Table) -> pa.Table:
        c = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
        c1 = t.column("c1").to_numpy(zero_copy_only=False).astype(np.float64)
        c2 = t.column("c2").to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.round(np.log(c * n1 * n1 / (n2 * c1 * c2)), round_digits)
        return pa.table(
            {
                "w1": t.column("w1"),
                "w2": t.column("w2"),
                "cnt": t.column("cnt"),
                "pmi_r6": pa.array(pmi, pa.float64()),
            }
        )

    return (
        joined.map_batches(score, batch_format="pyarrow")
        .sort(["pmi_r6", "w1", "w2"], descending=[True, False, False])
        .limit(k)
    )


def js_divergence(
    ds,
    column: str = "text",
    group_col: str = "source",
    a: str = "src1",
    b: str = "src2",
    round_digits: int = 6,
):
    """Jensen-Shannon divergence (nats) between the token
    distributions of groups `a` and `b` — the standard symmetric,
    bounded corpus-drift measure (Lin 1991), the token analog of
    profile.psi for numeric columns. One row: (n_a BIGINT, n_b
    BIGINT, jsd_r6) with JSD = 0.5 KL(p||m) + 0.5 KL(q||m),
    m = (p + q) / 2.

    Exchange: per-batch (token, ca, cb) count partials -> one groupby
    over the (vocabulary-sized) count table; the final reduction is a
    distributed sum of per-token terms, never a driver-side scan."""

    def partial(batch: pa.Table) -> pa.Table:
        grp = batch.column(group_col).to_numpy(zero_copy_only=False)
        isa = grp == a
        isb = grp == b
        keep = isa | isb
        if not keep.all():
            batch = batch.filter(pa.array(keep))
            isa, isb = isa[keep], isb[keep]
        toks = pc.split_pattern(
            pc.utf8_lower(batch.column(column).combine_chunks().fill_null("")), " "
        )
        offs = np.asarray(toks.offsets, dtype=np.int64)
        lens = np.diff(offs - offs[0])
        t = pa.table(
            {
                "tok": toks.flatten(),
                "ca": pa.array(np.repeat(isa.astype(np.int64), lens)),
                "cb": pa.array(np.repeat(isb.astype(np.int64), lens)),
            }
        )
        return t.group_by(["tok"]).aggregate([("ca", "sum"), ("cb", "sum")])

    counts = (
        ds.select_columns(sorted({column, group_col}))
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tok")
        .sum(["ca_sum", "cb_sum"])
        .map_batches(
            lambda t: t.rename_columns(["tok", "ca", "cb"]), batch_format="pyarrow"
        )
        .materialize()
    )
    na = float(counts.sum("ca"))
    nb = float(counts.sum("cb"))

    def term(t: pa.Table) -> pa.Table:
        ca = t.column("ca").to_numpy(zero_copy_only=False).astype(np.float64)
        cb = t.column("cb").to_numpy(zero_copy_only=False).astype(np.float64)
        p = ca / na
        q = cb / nb
        m = 0.5 * (p + q)
        with np.errstate(divide="ignore", invalid="ignore"):
            ta = np.where(p > 0, 0.5 * p * np.log(p / m), 0.0)
            tb = np.where(q > 0, 0.5 * q * np.log(q / m), 0.0)
        return pa.table({"term": pa.array(ta + tb, pa.float64())})

    jsd = float(counts.map_batches(term, batch_format="pyarrow").sum("term"))
    return pa.table(
        {
            "n_a": pa.array([int(na)], pa.int64()),
            "n_b": pa.array([int(nb)], pa.int64()),
            "jsd_r6": pa.array([float(np.round(jsd, round_digits))], pa.float64()),
        }
    )


RAKE_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "at", "by",
    "for", "with", "as", "is", "it", "be", "was", "are", "this", "that",
)


def rake_keywords(ds, column: str = "text", k: int = 15,
                  stopwords: tuple = RAKE_STOPWORDS, round_digits: int = 6):
    """RAKE keyword extraction (Rose et al. 2010) over the corpus:
    candidate phrases are maximal stopword-free token runs; a word's
    score is deg(w)/freq(w) where freq counts its candidate occurrences
    and deg sums the lengths of the phrases it appears in; a phrase
    scores the sum of its member word scores. Output: top-`k`
    (phrase, n_words BIGINT, cnt BIGINT, score_r6) by
    (score DESC, phrase).

    Two shuffle-light passes sharing one tokenize+island kernel:
    pass 1 ships (token, deg, freq) combiner partials (vocabulary-
    bounded), pass 2 broadcasts the word-score map and ships
    (phrase, cnt) partials (candidate-vocabulary-bounded). The island
    split, per-phrase degree, and score reduction are all reduceat over
    the flattened token stream — no Python loop over rows."""
    import ray
    from ray.data.aggregate import Sum

    from .nullkeys import null_safe_group_aggregate

    stop_arr = pa.array(list(stopwords), pa.string())

    def _islands(batch: pa.Table):
        """(flat tokens, island_id per token, island lengths) for the
        batch — islands never straddle documents."""
        toks = pc.split_pattern(
            pc.utf8_lower(batch.column(column).combine_chunks().fill_null("")), " "
        )
        flat = toks.flatten()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        offs = np.asarray(toks.offsets, dtype=np.int64)
        offs = offs - offs[0]
        n = len(flat)
        is_stop = pc.is_in(flat, value_set=stop_arr).to_numpy(zero_copy_only=False)
        is_stop = np.asarray(is_stop, dtype=bool) | (
            np.asarray(pc.equal(flat, "").to_numpy(zero_copy_only=False), dtype=bool)
        )
        keep = ~is_stop
        # a new island starts at a kept token whose predecessor is not
        # kept, or at a document boundary
        prev_keep = np.concatenate(([False], keep[:-1]))
        doc_start = np.zeros(n, dtype=bool)
        doc_start[offs[:-1][offs[:-1] < n]] = True
        start = keep & (~prev_keep | doc_start)
        island_id = np.cumsum(start) - 1  # valid only where keep
        return flat, keep, island_id, start

    def word_partials(batch: pa.Table) -> pa.Table:
        flat, keep, island_id, start = _islands(batch)
        if not keep.any():
            return pa.table({"token": pa.array([], pa.string()),
                             "deg": pa.array([], pa.int64()),
                             "freq": pa.array([], pa.int64())})
        ids = island_id[keep]
        lens = np.bincount(ids).astype(np.int64)  # phrase length per island
        deg_per_tok = lens[ids]  # each member token contributes its
        # phrase's length to its degree
        t = pa.table(
            {
                "token": flat.filter(pa.array(keep)),
                "deg": pa.array(deg_per_tok),
                "freq": pa.array(np.ones(int(keep.sum()), dtype=np.int64)),
            }
        )
        return (
            t.group_by(["token"])
            .aggregate([("deg", "sum"), ("freq", "sum")])
            .rename_columns(["token", "deg", "freq"])
        )

    base = ds.select_columns([column])
    words = null_safe_group_aggregate(
        base.map_batches(word_partials, batch_format="pyarrow", zero_copy_batch=True),
        ["token"],
        [Sum("deg", alias_name="deg"), Sum("freq", alias_name="freq")],
    )
    wt = pa.concat_tables(words.iter_batches(batch_format="pyarrow", batch_size=None))
    score_map = dict(
        zip(
            wt.column("token").to_pylist(),
            (
                wt.column("deg").to_numpy(zero_copy_only=False)
                / wt.column("freq").to_numpy(zero_copy_only=False)
            ).tolist(),
        )
    )
    score_ref = ray.put(score_map)

    def phrase_partials(batch: pa.Table) -> pa.Table:
        flat, keep, island_id, start = _islands(batch)
        if not keep.any():
            return pa.table({"phrase": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        smap = ray.get(score_ref)
        kept = flat.filter(pa.array(keep))
        ids = island_id[keep]
        bounds = np.nonzero(np.concatenate(([True], np.diff(ids) > 0)))[0]
        counts = np.diff(np.concatenate((bounds, [len(ids)])))
        lst = pa.ListArray.from_arrays(
            pa.array(np.concatenate((bounds, [len(ids)])), pa.int32()), kept
        )
        phrases = pc.binary_join(lst, " ")
        t = pa.table(
            {
                "phrase": phrases,
                "cnt": pa.array(np.ones(len(counts), dtype=np.int64)),
            }
        )
        return (
            t.group_by(["phrase"])
            .aggregate([("cnt", "sum")])
            .rename_columns(["phrase", "cnt"])
        )

    phr = null_safe_group_aggregate(
        base.map_batches(phrase_partials, batch_format="pyarrow", zero_copy_batch=True),
        ["phrase"],
        [Sum("cnt", alias_name="cnt")],
    )
    pt = pa.concat_tables(phr.iter_batches(batch_format="pyarrow", batch_size=None))
    phrases = pt.column("phrase").to_pylist()
    cnts = pt.column("cnt").to_numpy(zero_copy_only=False)
    smap = score_map
    scores = [
        float(np.round(sum(smap[w] for w in p.split(" ")), round_digits))
        for p in phrases
    ]
    n_words = [len(p.split(" ")) for p in phrases]
    out = pa.table(
        {
            "phrase": pa.array(phrases, pa.string()),
            "n_words": pa.array(n_words, pa.int64()),
            "cnt": pa.array(cnts),
            "score_r6": pa.array(scores, pa.float64()),
        }
    )
    return out.sort_by([("score_r6", "descending"), ("phrase", "ascending")]).slice(0, k)
