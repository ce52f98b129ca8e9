"""Text-analysis operators for a training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting. All
vectorized per batch (Arrow kernels / numpy over byte buffers); no
per-row Python in any hot path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import bloom as bloom_mod

_U64 = np.uint64


def token_count_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """tok_cnt = number of single-space-separated fields, defined as
    count(' ') + 1 (matches SQL `length(string_split(text, ' '))`)."""
    import pyarrow.compute as pc

    texts = batch.column(column)
    spaces = pc.count_substring(texts, " ")
    toks = pc.add(spaces, 1).cast(pa.int64())
    return batch.append_column("tok_cnt", toks)


_BPE_ISH = r"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]"


def regex_token_count_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """BPE-ish tokenization (letter runs | short digit runs | single
    punctuation — the GPT-2 pre-tokenizer shape, ASCII classes so RE2
    oracles agree): adds `regex_tok_cnt`."""
    import pyarrow.compute as pc

    counts = pc.count_substring_regex(batch.column(column), _BPE_ISH)
    return batch.append_column("regex_tok_cnt", counts.cast(pa.int64()))


def quality_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Quality heuristics per doc (all defined over characters so a SQL
    oracle can reproduce them exactly):

      char_cnt     = length(text)                       (codepoints)
      alpha_ratio  = [a-zA-Z] chars / max(char_cnt, 1)
      digit_ratio  = [0-9] chars / max(char_cnt, 1)
      space_ratio  = ' ' chars / max(char_cnt, 1)
    """
    import pyarrow.compute as pc

    texts = batch.column(column)
    n = pc.utf8_length(texts).cast(pa.int64())
    denom = pc.max_element_wise(n, 1).cast(pa.float64())
    alpha = pc.utf8_length(pc.replace_substring_regex(texts, "[^a-zA-Z]", "")).cast(pa.float64())
    digit = pc.utf8_length(pc.replace_substring_regex(texts, "[^0-9]", "")).cast(pa.float64())
    space = pc.count_substring(texts, " ").cast(pa.float64())
    out = batch.append_column("char_cnt", n)
    out = out.append_column("alpha_ratio", pc.divide(alpha, denom))
    out = out.append_column("digit_ratio", pc.divide(digit, denom))
    out = out.append_column("space_ratio", pc.divide(space, denom))
    return out


_FNV_PRIME = _U64(1099511628211)  # 0x100000001B3


def _utf8_codepoints(buf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized UTF-8 decode of a byte buffer: returns (byte position
    of each codepoint start, codepoint values). Arrow strings guarantee
    valid UTF-8, so lead-byte classification is sufficient."""
    b = buf
    pad = np.concatenate([b, np.zeros(3, dtype=np.uint8)])
    starts = (b < 0x80) | (b >= 0xC0)  # ASCII or any lead byte
    pos = np.nonzero(starts)[0]
    b1 = b[pos].astype(np.uint32)
    b2 = (pad[pos + 1] & 0x3F).astype(np.uint32)
    b3 = (pad[pos + 2] & 0x3F).astype(np.uint32)
    b4 = (pad[pos + 3] & 0x3F).astype(np.uint32)
    cp = b1.copy()
    m2 = (b1 & 0xE0) == 0xC0
    m3 = (b1 & 0xF0) == 0xE0
    m4 = (b1 & 0xF8) == 0xF0
    cp[m2] = ((b1[m2] & 0x1F) << 6) | b2[m2]
    cp[m3] = ((b1[m3] & 0x0F) << 12) | (b2[m3] << 6) | b3[m3]
    cp[m4] = ((b1[m4] & 0x07) << 18) | (b2[m4] << 12) | (b3[m4] << 6) | b4[m4]
    return pos, cp.astype(np.uint64)


def fingerprint_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """64-bit ROLLING-HASH content fingerprint per doc: the FNV-prime
    polynomial hash over Unicode codepoints mod 2^64 —
    h = fold(h * 0x100000001B3 + codepoint), empty/null docs -> 0.

    Deterministic and exactly reproducible in SQL (DuckDB list_reduce
    over string_split + ord with HUGEINT modular arithmetic), so the op
    carries a value oracle. Fully vectorized: one UTF-8 decode pass,
    power table by u64 accumulate (natural mod-2^64 wraparound), one
    segmented product-sum."""
    from ..column import _string_parts

    arr = batch.column(column).combine_chunks().fill_null("")
    lengths, data = _string_parts(arr)
    n = len(lengths)
    buf = np.frombuffer(data, dtype=np.uint8)
    h = np.zeros(n, dtype=np.uint64)
    if len(buf):
        pos, cp = _utf8_codepoints(buf)
        offs = np.concatenate(([0], np.cumsum(lengths.astype(np.int64))))
        doc_of = np.searchsorted(offs[1:], pos, side="right")
        cnts = np.bincount(doc_of, minlength=n)
        bounds = np.concatenate(([0], np.cumsum(cnts)))
        maxlen = int(cnts.max())
        powers = np.ones(max(maxlen, 1), dtype=np.uint64)
        if maxlen > 1:
            powers[1:] = np.multiply.accumulate(
                np.full(maxlen - 1, _FNV_PRIME, dtype=np.uint64)
            )
        within = np.arange(len(cp), dtype=np.int64) - np.repeat(bounds[:-1], cnts)
        expo = np.repeat(cnts, cnts) - 1 - within
        terms = cp * powers[expo]
        nz = cnts > 0
        if nz.any():
            h[nz] = np.add.reduceat(terms, bounds[:-1][nz])
    return batch.append_column("fingerprint", pa.array(h.view(np.int64)))


def token_top_k(ds, column: str = "text", k: int = 50):
    """EXACT distributed top-k tokens by count (vocab / stopword
    discovery): per-batch partial counts (the combiner — only (token,
    cnt) pairs enter the exchange, one row per distinct token per
    batch), a groupby-sum, then a small sort-limit. Tokenization is
    single-space split of lowercased text, matching SQL
    string_split(lower(text), ' ') exactly, so the op carries an
    oracle. Ties break by token ascending (deterministic)."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(batch.column(column).combine_chunks().fill_null("")), " ")
        flat = toks.flatten()
        vc = pc.value_counts(flat)
        return pa.table({"token": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())})

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .sum("cnt")
        .map_batches(
            lambda t: t.rename_columns(["token", "cnt"]), batch_format="pyarrow"
        )
    )
    return counts.sort(["cnt", "token"], descending=[True, False]).limit(k)


def ngram_top_k(ds, column: str = "text", n: int = 2, k: int = 50):
    """EXACT distributed top-k word n-grams by count (phrase mining /
    boilerplate discovery): same combiner shape as token_top_k — only
    (ngram, cnt) partials enter the exchange. N-grams are built
    vectorized: one split, then n shifted `take`s over the flat token
    buffer joined by binary_join_element_wise; window validity (no
    cross-document grams) is a numpy searchsorted over the list
    offsets. Matches SQL list_zip over string_split(lower(text), ' ')
    exactly, so the op carries a value oracle."""
    import pyarrow.compute as pc

    if n < 2:
        return token_top_k(ds, column=column, k=k)

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(
            pc.utf8_lower(batch.column(column).combine_chunks().fill_null("")), " "
        )
        flat = toks.flatten()
        offs = np.asarray(toks.offsets)
        starts = np.arange(max(len(flat) - n + 1, 0), dtype=np.int64)
        # a window starting at i is valid iff token i+n-1 is in the
        # same document as token i
        doc_first = np.searchsorted(offs[1:], starts, side="right")
        doc_last = np.searchsorted(offs[1:], starts + n - 1, side="right")
        starts = starts[doc_first == doc_last]
        if len(starts) == 0:
            return pa.table(
                {"ngram": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
            )
        parts = []
        for j in range(n):
            parts.append(flat.take(pa.array(starts + j)))
        grams = pc.binary_join_element_wise(*parts, " ")
        vc = pc.value_counts(grams)
        return pa.table(
            {"ngram": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())}
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ngram")
        .sum("cnt")
        .map_batches(
            lambda t: t.rename_columns(["ngram", "cnt"]), batch_format="pyarrow"
        )
    )
    return counts.sort(["cnt", "ngram"], descending=[True, False]).limit(k)


def normalize_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Canonical text normalization (training-data prep): lowercase,
    collapse whitespace runs to single spaces, trim. Pure Arrow
    kernels; exactly reproducible in SQL (lower + regexp_replace +
    trim), so it carries an oracle."""
    import pyarrow.compute as pc

    t = batch.column(column)
    t = pc.utf8_lower(t)
    t = pc.replace_substring_regex(t, r"\s+", " ")
    t = pc.utf8_trim_whitespace(t)
    return batch.append_column("norm_text", t)


def html_text_batch(batch: pa.Table, column: str = "html", out: str = "extracted_text") -> pa.Table:
    """Extract visible text from an HTML binary/string column (the
    north-rule webtext schema carries both html and text): drop
    script/style subtrees, strip tags, decode the common entities,
    collapse whitespace. Pure Arrow regex kernels (RE2), so the exact
    same chain is reproducible in SQL (DuckDB regexp_replace) — no
    parser dependency, which is also why it is deliberately a
    whitespace-text approximation, not a DOM renderer."""
    import pyarrow.compute as pc

    t = batch.column(column)
    if pa.types.is_binary(t.type) or pa.types.is_large_binary(t.type):
        t = t.cast(pa.string())
    t = pc.replace_substring_regex(t, r"(?is)<script\b[^>]*>.*?</script>", " ")
    t = pc.replace_substring_regex(t, r"(?is)<style\b[^>]*>.*?</style>", " ")
    t = pc.replace_substring_regex(t, r"(?s)<[^>]*>", " ")
    for ent, rep in (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " ")):
        t = pc.replace_substring(t, ent, rep)
    t = pc.utf8_trim_whitespace(pc.replace_substring_regex(t, r"\s+", " "))
    return batch.append_column(out, t)


def entropy_batch(batch: pa.Table, column: str = "text", round_digits: int = 6) -> pa.Table:
    """Per-doc Shannon entropy (bits) over Unicode codepoints — a
    cheap gibberish/boilerplate quality signal (low entropy = repeated
    filler, high = random bytes). Adds `char_entropy`; empty/null docs
    get 0.0. Matches DuckDB's log2 `entropy()` aggregate (rounded to 6
    digits on both sides — accumulation order differs at ~1e-15).

    Vectorized: one UTF-8 decode pass, one sort-free unique over
    (doc, codepoint) packed keys, two bincounts."""
    from ..column import _string_parts

    arr = batch.column(column).combine_chunks().fill_null("")
    lengths, data = _string_parts(arr)
    n = len(lengths)
    ent = np.zeros(n, dtype=np.float64)
    buf = np.frombuffer(data, dtype=np.uint8)
    if len(buf):
        pos, cp = _utf8_codepoints(buf)
        offs = np.concatenate(([0], np.cumsum(lengths.astype(np.int64))))
        doc_of = np.searchsorted(offs[1:], pos, side="right")
        n_cp = np.bincount(doc_of, minlength=n).astype(np.float64)
        # pack (doc, codepoint) into one u64 key: cp <= 0x10FFFF < 2^21
        key = (doc_of.astype(np.uint64) << np.uint64(21)) | cp
        ukeys, cnts = np.unique(key, return_counts=True)
        udoc = (ukeys >> np.uint64(21)).astype(np.int64)
        c = cnts.astype(np.float64)
        s = np.bincount(udoc, weights=c * np.log2(c), minlength=n)
        nz = n_cp > 0
        ent[nz] = np.log2(n_cp[nz]) - s[nz] / n_cp[nz]
    if round_digits is not None:
        ent = np.round(ent, round_digits)
    return batch.append_column("char_entropy", pa.array(ent))


# PII patterns, RE2-safe and ASCII-class-only so the DuckDB oracle's
# regexp_replace chain is character-identical. Deliberately the
# precision-over-recall shapes used in corpus prep (emails, intl/US
# phone-ish digit runs, IPv4) — a production pass would add locale packs.
_PII_RULES = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9]{1,3}[ .-]?\(?[0-9]{2,4}\)?[ .-]?[0-9]{3,4}[ .-]?[0-9]{3,4}", "<PHONE>"),
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
)


def pii_redact_batch(batch: pa.Table, column: str = "text", out: str = "redacted_text") -> pa.Table:
    """Redact common PII (emails, phone numbers, IPv4 addresses) with
    typed placeholder tokens — standard LLM-training-data prep. One RE2
    pass per rule over the whole column; adds `redacted_text` plus a
    per-doc `pii_cnt` (matches found, cheap quality/filter signal)."""
    import pyarrow.compute as pc

    t = batch.column(column)
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    cnt = pa.nulls(len(t), pa.int64()).fill_null(0)
    for pat, rep in _PII_RULES:
        cnt = pc.add(cnt, pc.count_substring_regex(t, pat).cast(pa.int64()))
        t = pc.replace_substring_regex(t, pat, rep)
    out_t = batch.append_column(out, t)
    return out_t.append_column("pii_cnt", cnt)


# ------------------------------------------------------------------ langid

# tiny per-language marker vocabularies (top function words); a doc is
# scored by marker hits per language — an n-gram/stopword heuristic, not
# a model (nothing external in the sandbox).
_PROFILES = {
    "en": "the and of to in is was for that with his are had they this have",
    "de": "der die und das ist ein nicht mit sich auf für dem werden",
    "fr": "le la les des une est dans pour que qui sur avec pas être",
    "es": "el la los las una es en para que por con del como más",
    "it": "il la che di è per una con del non sono alla come",
    "pt": "o que do da em um para com não uma os mais das",
    "nl": "de het een van en in is dat op voor met zijn niet",
    "ru": "и в не на что с как это по его был она так",
    "pl": "w i na się nie z że do jest to jak po tak",
    "tr": "bir ve bu da için ile olarak çok daha sonra gibi",
    "sv": "och det att i en som är av för på med den inte",
    "id": "yang dan di untuk dengan ini dari dalam pada adalah tidak",
    "vi": "của và các là có trong được cho người những một không",
    "cs": "a se na je v to že s z do by si jako",
}


class LangId:
    """Stateful stage (actor-pool candidate): the marker vocabulary and
    its word->language matrix are built once per actor in __init__ (ray
    guide: stateful stages = actor pools). Scoring is fully vectorized:
    lower + whitespace-split (Arrow kernels), one index_in against the
    vocab, then per-language bincounts — no per-row Python."""

    def __init__(self):
        self.langs = list(_PROFILES)
        words = sorted({w for p in _PROFILES.values() for w in p.split()})
        word_idx = {w: i for i, w in enumerate(words)}
        self.vocab = pa.array(words)
        self.W = np.zeros((len(words), len(self.langs)), dtype=np.int32)
        for li, prof in enumerate(_PROFILES.values()):
            for w in prof.split():
                self.W[word_idx[w], li] = 1

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = batch.column("text").combine_chunks().fill_null("")
        n = len(texts)
        toks = pc.utf8_split_whitespace(pc.utf8_lower(texts))
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        idx = pc.index_in(toks.flatten(), value_set=self.vocab).fill_null(-1)
        idx = idx.to_numpy(zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(offsets))
        m = idx >= 0
        di, vi = doc_of[m], idx[m]
        scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        for li in range(len(self.langs)):
            w = self.W[vi, li]
            if w.any():
                scores[:, li] = np.bincount(di, weights=w, minlength=n).astype(np.int64)
        best = scores.argmax(axis=1)
        conf = scores.max(axis=1)
        pred = np.where(conf > 0, np.array(self.langs)[best], "und")
        return batch.append_column("lang_pred", pa.array(pred.tolist()))


def langid(ds):
    return ds.map_batches(LangId, batch_format="pyarrow", concurrency=2, batch_size=4096)


def tfidf_top_terms(ds, column: str = "text", id_column: str = "doc_id",
                    k: int = 3, min_df: int = 1, round_digits: int = 6):
    """Per-doc top-k terms by TF-IDF (keyword extraction / vocab
    signal). Two passes:

    pass 1 — document frequency: per batch, per-doc DISTINCT terms
    (Arrow group_by) are the only rows that shuffle; a groupby-sum
    yields the (term, df) table, pruned by min_df and broadcast via
    ray.put (at corpus scale min_df IS the vocab cap — df follows a
    Zipf law so even min_df=2 drops most of the long tail).
    pass 2 — the corpus streams: per-(doc, term) counts, a vectorized
    searchsorted vocab lookup, lexsort rank within doc.

    Selection ranks by (tf DESC, df ASC, term ASC) — integer keys
    only, so the chosen rows are bit-reproducible in SQL across
    engines; the emitted tfidf weight (tf * ln(N/df)) is rounded to
    round_digits so libm-vs-SQL ln ulp noise cannot leak into value
    comparisons. Tokenization = single-space split
    of lowercased text (same contract as token_top_k)."""
    import pyarrow.compute as pc
    import ray

    def split(batch: pa.Table):
        texts = pc.utf8_lower(batch.column(column).combine_chunks().fill_null(""))
        toks = pc.split_pattern(texts, " ")
        return toks.flatten(), pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)

    def df_partial(batch: pa.Table) -> pa.Table:
        flat, didx = split(batch)
        distinct = pa.table({"d": didx, "term": flat}).group_by(["d", "term"]).aggregate([])
        vc = pc.value_counts(distinct.column("term").combine_chunks())
        return pa.table({"term": vc.field("values"), "df": vc.field("counts").cast(pa.int64())})

    df_tbl = (
        ds.map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("term")
        .sum("df")
        .to_pandas()
    )
    df_tbl = df_tbl[df_tbl["sum(df)"] >= min_df].sort_values("term")
    vocab = df_tbl["term"].to_numpy(dtype=object)
    dfs = df_tbl["sum(df)"].to_numpy(dtype=np.int64)
    n_docs = ds.count()
    vocab_ref = ray.put((vocab, dfs))

    def score(batch: pa.Table) -> pa.Table:
        vocab, dfs = ray.get(vocab_ref)
        flat, didx = split(batch)
        pairs = (
            pa.table({"d": didx, "term": flat})
            .group_by(["d", "term"])
            .aggregate([([], "count_all")])
        )
        d = pairs.column("d").to_numpy(zero_copy_only=False)
        terms = pairs.column("term").to_numpy(zero_copy_only=False)
        tf = pairs.column("count_all").to_numpy(zero_copy_only=False).astype(np.int64)
        vi = np.searchsorted(vocab, terms)
        found = (vi < len(vocab)) & (vocab[np.clip(vi, 0, len(vocab) - 1)] == terms)
        d, terms, tf, vi = d[found], terms[found], tf[found], vi[found]
        tdf = dfs[vi]
        order = np.lexsort((vi, tdf, -tf, d))
        d, terms, tf, tdf = d[order], terms[order], tf[order], tdf[order]
        new_doc = np.r_[True, d[1:] != d[:-1]]
        starts = np.flatnonzero(new_doc)
        sizes = np.diff(np.r_[starts, len(d)])
        rank = np.arange(len(d)) - np.repeat(starts, sizes) + 1
        keep = rank <= k
        ids = batch.column(id_column).take(pa.array(d[keep]))
        return pa.table(
            {
                id_column: ids,
                "term": pa.array(terms[keep], type=pa.string()),
                "tf": pa.array(tf[keep]),
                "df": pa.array(tdf[keep]),
                "rank": pa.array(rank[keep]),
                "tfidf": pa.array(
                    np.round(tf[keep] * np.log(n_docs / tdf[keep]), round_digits),
                    type=pa.float64(),
                ),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def regex_extract_batch(
    batch: pa.Table,
    pattern: str,
    column: str = "text",
    out_column: str = "extracted",
) -> pa.Table:
    """First regex match per row (compiled RE2 kernel, no Python).
    SQL regexp_extract parity: null in -> null out, no match -> ''
    (Arrow's extract_regex yields null for both, so the two cases are
    re-split on input validity). Unnamed patterns are wrapped in one
    named group — the whole-match (group 0) semantics."""
    import pyarrow.compute as pc

    pat = pattern if "(?P<" in pattern else f"(?P<g0>{pattern})"
    name = pat.split("(?P<", 1)[1].split(">", 1)[0]
    col = batch.column(column)
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    m = pc.struct_field(pc.extract_regex(col, pat), name)
    out = pc.if_else(pc.is_valid(col), pc.fill_null(m, ""), pa.scalar(None, pa.string()))
    return batch.append_column(out_column, out)


def type_token_ratio(ds, column: str = "text", id_column: str = "doc_id"):
    """Per-document type-token ratio (lexical diversity): tokens are
    the single-space split of lowercased text (same contract as
    token_top_k / tfidf_top_terms), empties dropped; n_distinct /
    n_tokens is ONE exact int division. Shuffle-free per-doc
    map_batches; per batch the distinct count is one Arrow group_by +
    bincount, no Python loop over tokens. Docs with no tokens (null or
    empty text) report 0 / 0 / null. Output (id, n_tokens, n_distinct,
    ttr)."""
    import pyarrow.compute as pc

    def per_batch(batch: pa.Table) -> pa.Table:
        texts = pc.utf8_lower(batch.column(column).combine_chunks().fill_null(""))
        toks = pc.split_pattern(texts, " ")
        flat = toks.flatten()
        didx = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "")
        keep_np = keep.to_numpy(zero_copy_only=False)
        flat = flat.filter(keep)
        didx = didx[keep_np]
        n = batch.num_rows
        totals = np.bincount(didx, minlength=n).astype(np.int64)
        distinct_pairs = (
            pa.table({"d": pa.array(didx), "t": flat})
            .group_by(["d", "t"], use_threads=False)
            .aggregate([])
        )
        dists = np.bincount(
            distinct_pairs.column("d").to_numpy(zero_copy_only=False), minlength=n
        ).astype(np.int64)
        ttr = np.where(totals > 0, dists / np.maximum(totals, 1), np.nan)
        return pa.table(
            {
                id_column: batch.column(id_column),
                "n_tokens": pa.array(totals),
                "n_distinct": pa.array(dists),
                "ttr": pa.array(ttr, pa.float64(), mask=(totals == 0)),
            }
        )

    return ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)
