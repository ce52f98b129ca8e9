"""Webtext corpus-quality operators: repetition signals and benchmark
decontamination.

Both are standard LLM training-data pipeline stages (Gopher's
repetition filters, GPT-3-style eval-set decontamination) that the
reference engine does not provide; they extend the documents-table
operator family (SURVEY.md §2.9). Everything is vectorized over ONE
shared word-hash pass:

* word n-grams are hashed as a polynomial over per-word 64-bit content
  hashes (`_segmented_content_hash` — the same kernel exact_dedup
  uses), with windows masked to positions fully inside each document,
  so a batch of N docs costs O(total_words) numpy work and zero
  Python-per-row.
* repetition_batch — per-doc duplicate-word fraction, top-2/3-gram
  fraction, duplicated-3-gram fraction (Rae et al., Gopher §A1.1
  shapes, word-based because the synthetic corpus has no line
  structure). Exact DuckDB oracle via string_split + list slicing.
* decontaminate — drop corpus docs sharing any word n-gram with a
  (small) benchmark set. The benchmark's gram-hash set is built once
  on the driver and broadcast via ray.put (eval sets are MB-scale;
  the corpus side streams and never shuffles). Exact DuckDB oracle:
  string n-gram equality — equal strings hash equal; distinct grams
  collide with probability ~2^-64.

Scale notes (100 TB): no exchange anywhere — both ops are pure
map_batches; decontamination's only shared state is the sorted
benchmark gram array, put ONCE and binary-searched per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _segmented_content_hash

_U64 = np.uint64
_WORD_SEED = _U64(0x1B873593C2B2AE35)
_GRAM_C = _U64(0x100000001B3)  # FNV prime: odd -> bijective u64 multiply


def _word_hash_parts(texts: pa.ChunkedArray | pa.Array):
    """Split on single spaces (mirrors SQL string_split(text, ' '),
    including empty words from doubled spaces and the [''] result for
    empty/null docs) and hash every word. Returns (words_per_doc int64,
    flat word hashes u64) — one vectorized pass, no Python per row."""
    from ..column import _string_parts

    arr = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
    words = pc.split_pattern(arr.fill_null(""), " ")
    words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
    offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offs - offs[0])
    w_lengths, data = _string_parts(words.flatten())
    buf = np.frombuffer(data, dtype=np.uint8)
    return counts, _segmented_content_hash(w_lengths, buf, _WORD_SEED)


def _doc_gram_hash_starts(word_counts: np.ndarray, word_h: np.ndarray, n: int):
    """Polynomial hash of every n-word window fully inside a doc.
    Returns (doc_of, start, gram_vals) aligned 1-D arrays (doc order);
    `start` is the 0-based word offset of the window inside its doc."""
    total = int(word_counts.sum())
    offs = np.concatenate(([0], np.cumsum(word_counts)))
    cnt = np.maximum(word_counts - (n - 1), 0)
    if total == 0 or not cnt.any():
        e = np.empty(0, dtype=np.int64)
        return e, e, np.empty(0, dtype=np.uint64)
    padded = np.concatenate([word_h, np.zeros(n - 1, dtype=np.uint64)])
    acc = padded[:total].copy()
    for j in range(1, n):
        acc = acc * _GRAM_C + padded[j : j + total]
    # keep only window starts whose n words lie inside one doc
    delta = np.zeros(total + 1, dtype=np.int64)
    np.add.at(delta, offs[:-1], 1)
    np.add.at(delta, np.minimum(offs[:-1] + cnt, total), -1)
    pos = np.nonzero(np.cumsum(delta[:-1]) > 0)[0]
    doc_of = np.searchsorted(offs[1:], pos, side="right")
    return doc_of, pos - offs[doc_of], acc[pos]


def _doc_gram_hashes(word_counts: np.ndarray, word_h: np.ndarray, n: int):
    """(doc_of, gram_vals) view of _doc_gram_hash_starts."""
    doc_of, _, vals = _doc_gram_hash_starts(word_counts, word_h, n)
    return doc_of, vals


def _per_doc_run_stats(doc_of: np.ndarray, vals: np.ndarray, n_docs: int):
    """Group (doc, value) pairs and return per-doc (total positions,
    distinct values, max run count, positions in values seen >=2x).
    One lexsort + run-length pass — no Python loops, no dicts."""
    total = np.zeros(n_docs, dtype=np.int64)
    distinct = np.zeros(n_docs, dtype=np.int64)
    maxc = np.zeros(n_docs, dtype=np.int64)
    dup_pos = np.zeros(n_docs, dtype=np.int64)
    if len(doc_of) == 0:
        return total, distinct, maxc, dup_pos
    order = np.lexsort((vals, doc_of))
    d = doc_of[order]
    v = vals[order]
    run_start = np.ones(len(d), dtype=bool)
    run_start[1:] = (d[1:] != d[:-1]) | (v[1:] != v[:-1])
    starts = np.nonzero(run_start)[0]
    run_len = np.diff(np.concatenate([starts, [len(d)]]))
    run_doc = d[starts]
    np.add.at(total, run_doc, run_len)
    np.add.at(distinct, run_doc, 1)
    np.maximum.at(maxc, run_doc, run_len)
    np.add.at(dup_pos, run_doc, np.where(run_len >= 2, run_len, 0))
    return total, distinct, maxc, dup_pos


def repetition_batch(
    batch: pa.Table, column: str = "text", round_digits: int = 6
) -> pa.Table:
    """Per-doc repetition quality signals (word-level Gopher shapes):

    * words          — word count (string_split semantics)
    * dup_word_frac  — 1 - distinct_words / words
    * top2gram_frac  — occurrences of the most frequent word 2-gram
                       x 2 / words (0 when < 2 words)
    * top3gram_frac  — same with 3-grams
    * dup3gram_frac  — fraction of 3-gram positions whose gram occurs
                       >= 2 times in the doc

    All fractions rounded to `round_digits` so the DuckDB oracle's
    float64 arithmetic compares stringwise."""
    n_docs = batch.num_rows
    counts, word_h = _word_hash_parts(batch.column(column))
    w_doc = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    w_total, w_distinct, _, _ = _per_doc_run_stats(w_doc, word_h, n_docs)
    safe_w = np.maximum(w_total, 1)
    out = {
        "words": pa.array(w_total),
        "dup_word_frac": np.round(1.0 - w_distinct / safe_w, round_digits),
    }
    for n in (2, 3):
        g_doc, g_vals = _doc_gram_hashes(counts, word_h, n)
        g_total, _, g_max, g_dup = _per_doc_run_stats(g_doc, g_vals, n_docs)
        frac = np.where(g_total > 0, g_max * float(n) / safe_w, 0.0)
        out[f"top{n}gram_frac"] = np.round(frac, round_digits)
        if n == 3:
            dup_frac = np.where(g_total > 0, g_dup / np.maximum(g_total, 1), 0.0)
            out["dup3gram_frac"] = np.round(dup_frac, round_digits)
    for name, arr in out.items():
        batch = batch.append_column(
            name, arr if isinstance(arr, pa.Array) else pa.array(arr)
        )
    return batch


def benchmark_gram_hashes(texts: pa.ChunkedArray | pa.Array, n: int = 8) -> np.ndarray:
    """Sorted unique word-n-gram hashes of a benchmark text column —
    the broadcast side of decontaminate (driver-side: eval sets are
    small by construction)."""
    counts, word_h = _word_hash_parts(texts)
    _, vals = _doc_gram_hashes(counts, word_h, n)
    return np.unique(vals)


def contamination_counts_batch(
    batch: pa.Table, grams_sorted: np.ndarray, column: str = "text", n: int = 8
) -> pa.Table:
    """Append contam_gram_cnt: how many of the doc's n-gram positions
    match a benchmark gram (binary search against the broadcast set)."""
    n_docs = batch.num_rows
    counts, word_h = _word_hash_parts(batch.column(column))
    doc_of, vals = _doc_gram_hashes(counts, word_h, n)
    hits = np.zeros(n_docs, dtype=np.int64)
    if len(vals) and len(grams_sorted):
        pos = np.searchsorted(grams_sorted, vals)
        pos = np.minimum(pos, len(grams_sorted) - 1)
        np.add.at(hits, doc_of[grams_sorted[pos] == vals], 1)
    return batch.append_column("contam_gram_cnt", pa.array(hits))


def decontaminate(
    ds,
    benchmark: pa.Table | pa.Array | pa.ChunkedArray,
    column: str = "text",
    n: int = 8,
):
    """Drop corpus docs sharing any word n-gram with the benchmark
    texts. The gram-hash set is built once here and ray.put ONCE; each
    map_batches task binary-searches the shared sorted array — no
    shuffle, the corpus streams.

    `benchmark`: a small table with `column`, or a string array."""
    import ray

    texts = benchmark.column(column) if isinstance(benchmark, pa.Table) else benchmark
    grams_ref = ray.put(benchmark_gram_hashes(texts, n))

    def keep_clean(batch: pa.Table) -> pa.Table:
        grams = ray.get(grams_ref)
        flagged = contamination_counts_batch(batch, grams, column, n)
        clean = pc.equal(flagged.column("contam_gram_cnt"), 0)
        return batch.filter(clean)

    return ds.map_batches(keep_clean, batch_format="pyarrow", zero_copy_batch=True)


def dataset_card(ds, column: str = "text", lang_col: str | None = "lang") -> pa.Table:
    """Corpus datasheet ("Datasheets for Datasets", Gebru et al. 2021,
    public paper) — the summary card shipped alongside a training
    corpus: document/char/token totals, exact duplicate-document
    count, and the language mix, all exact and SQL-checkable.

    Two bounded passes: ONE fused map_batches partial (counts + a
    per-lang value_counts partial per batch) combined under a single
    groupby, and the 128-bit content-hash distinct exchange (shared
    with exact_dedup/profile) for the duplicate count — text itself
    never shuffles. Returns (metric, value) rows with BIGINT values:
    n_docs, total_chars, total_tokens (single-space convention,
    matching length(string_split(text, ' '))), dup_docs
    (COUNT(*) - COUNT(DISTINCT coalesce(text, '')) — null text counts
    as the empty document), and one lang:<code> row per language.
    A NULL language is its own category, 'lang:<null>', distinct from
    an empty-string code ('lang:')."""
    from ray.data.aggregate import Sum

    from .profile import _pair_unique
    from .dedup import content_hash_batch

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch.column(column)
        texts = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
        filled = pc.fill_null(texts, "")
        toks = pc.list_value_length(pc.split_pattern(filled, " "))
        rows = [
            ("n_docs", batch.num_rows),
            ("total_chars", int(pc.sum(pc.utf8_length(filled)).as_py() or 0)),
            ("total_tokens", int(pc.sum(toks).as_py() or 0)),
        ]
        if lang_col is not None:
            lang = pc.fill_null(pc.cast(batch.column(lang_col), pa.string()), "<null>")
            vc = pc.value_counts(lang.combine_chunks() if isinstance(lang, pa.ChunkedArray) else lang)
            rows += [
                (f"lang:{v}", int(c))
                for v, c in zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist())
            ]
        return pa.table(
            {
                "metric": pa.array([m for m, _ in rows], pa.string()),
                "value": pa.array([v for _, v in rows], pa.int64()),
            }
        )

    counts = {
        r["metric"]: int(r["sum(value)"])
        for r in ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("metric")
        .sum("value")
        .take_all()
    }

    def hash_rows(batch: pa.Table) -> pa.Table:
        hashed = content_hash_batch(batch.select([column]), column)
        h1, h2 = _pair_unique(
            hashed.column("h1").to_numpy(zero_copy_only=False),
            hashed.column("h2").to_numpy(zero_copy_only=False),
        )
        return pa.table({"h1": pa.array(h1), "h2": pa.array(h2)})

    n_distinct = (
        ds.map_batches(hash_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["h1", "h2"])
        .count()
        .count()
    )
    n_docs = counts.get("n_docs", 0)
    metrics = [
        ("n_docs", n_docs),
        ("total_chars", counts.get("total_chars", 0)),
        ("total_tokens", counts.get("total_tokens", 0)),
        ("dup_docs", n_docs - int(n_distinct)),
    ]
    metrics += sorted((m, v) for m, v in counts.items() if m.startswith("lang:"))
    return pa.table(
        {
            "metric": pa.array([m for m, _ in metrics], pa.string()),
            "value": pa.array([v for _, v in metrics], pa.int64()),
        }
    )


def dup_ngram_spans(
    ds,
    column: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_docs: int = 2,
):
    """Cross-document duplicated-substring removal, the word-n-gram
    approximation of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better"): every n-word window that occurs in
    >= `min_docs` DISTINCT documents is a duplicated span; the union
    of those spans is cut from each document's token stream.

    Per doc: (id, n_tokens, dup_grams, covered_tokens, clean_text)
    where dup_grams counts duplicated window starts, covered_tokens
    the tokens under the merged span union, and clean_text the
    document with covered tokens removed (space re-joined).

    Exchange shape (100 TB): pass 1 ships per-batch (gram_hash,
    distinct_docs) partials — each doc lives in exactly ONE batch, so
    batch-local distinct-doc counts sum to the global distinct-doc
    count — and one groupby reduces them. Occurrences of the
    surviving dup grams (id, start) join the dup-gram table through
    partitioned_join (auto-broadcast when the dup set is small, honest
    hash shuffle otherwise), collapse to one (id, starts list) row per
    affected doc, and join back to the corpus; raw text therefore
    moves at most once, and only when the dup-starts side is too big
    to broadcast. Grams compare by 64-bit polynomial content hash
    (collision ~2^-64), the same contract as `decontaminate`'s
    exact-string SQL oracle. Final span-merge/rebuild is one
    vectorized numpy diff-trick + Arrow binary_join per batch."""
    from .groupsets import array_agg
    from .join import partitioned_join

    def gram_partials(batch: pa.Table) -> pa.Table:
        counts, word_h = _word_hash_parts(batch.column(column))
        doc_of, _, gh = _doc_gram_hash_starts(counts, word_h, n)
        pairs = pa.table(
            {"g": pa.array(gh.view(np.int64)), "d": pa.array(doc_of)}
        ).group_by(["g", "d"]).aggregate([])
        nd = pairs.group_by(["g"]).aggregate([("d", "count")])
        return pa.table(
            {"g": nd.column("g"), "nd": nd.column("d_count").cast(pa.int64())}
        )

    def occurrences(batch: pa.Table) -> pa.Table:
        counts, word_h = _word_hash_parts(batch.column(column))
        doc_of, start, gh = _doc_gram_hash_starts(counts, word_h, n)
        ids = batch.column(id_col).take(pa.array(doc_of))
        return pa.table(
            {"g": pa.array(gh.view(np.int64)), id_col: ids, "s": pa.array(start)}
        )

    shared = ds.select_columns(sorted({id_col, column}))
    dup_grams = (
        shared.select_columns([column])
        .map_batches(gram_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("g")
        .sum("nd")
        .map_batches(
            lambda t: t.rename_columns(["g", "nd"]), batch_format="pyarrow"
        )
        .filter(expr=f"nd >= {min_docs}")
        .select_columns(["g"])
    )
    occ = shared.map_batches(
        occurrences, batch_format="pyarrow", zero_copy_batch=True
    )
    dup_occ = partitioned_join(occ, dup_grams, on="g").select_columns([id_col, "s"])

    def pack_starts(t: pa.Table) -> pa.Table:
        # hash joins can't carry list payloads: ship the per-doc start
        # list as one comma-joined string (decoded vectorized in clean)
        as_str = pc.cast(t.column("agg").combine_chunks(), pa.list_(pa.string()))
        return pa.table(
            {id_col: t.column(id_col), "dup_starts": pc.binary_join(as_str, ",")}
        )

    starts = array_agg(dup_occ, id_col, "s", "s").map_batches(
        pack_starts, batch_format="pyarrow"
    )
    joined = partitioned_join(shared, starts, on=id_col, how="left")

    def clean(batch: pa.Table) -> pa.Table:
        texts = batch.column(column).combine_chunks()
        words = pc.split_pattern(texts.fill_null(""), " ")
        words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = offs - offs[0]
        counts = np.diff(offs)
        total = int(offs[-1])
        flat = words.flatten()
        covered = np.zeros(total, dtype=bool)
        n_dup = np.zeros(batch.num_rows, dtype=np.int64)
        if "dup_starts" in batch.schema.names:
            packed = batch.column("dup_starts").combine_chunks()
            lst = pc.split_pattern(packed.drop_null(), ",")
            lst = lst.combine_chunks() if isinstance(lst, pa.ChunkedArray) else lst
            # map split-list rows back to their batch rows (nulls own none)
            valid = np.nonzero(
                ~np.asarray(pc.is_null(packed), dtype=bool)
            )[0]
            doc_idx = valid[pc.list_parent_indices(lst).to_numpy(zero_copy_only=False)]
            if len(doc_idx):
                s = pc.cast(lst.flatten(), pa.int64()).to_numpy(zero_copy_only=False)
                gs = offs[doc_idx] + s
                delta = np.zeros(total + 1, dtype=np.int64)
                np.add.at(delta, gs, 1)
                np.add.at(delta, gs + n, -1)
                covered = np.cumsum(delta[:-1]) > 0
                n_dup = np.bincount(doc_idx, minlength=batch.num_rows).astype(np.int64)
        cov_per_doc = np.add.reduceat(covered.astype(np.int64), offs[:-1]) * (counts > 0)
        kept = ~covered
        kept_flat = flat.filter(pa.array(kept))
        if isinstance(kept_flat, pa.ChunkedArray):
            kept_flat = kept_flat.combine_chunks()
        kept_counts = np.add.reduceat(kept.astype(np.int64), offs[:-1]) * (counts > 0)
        new_offs = np.concatenate(([0], np.cumsum(kept_counts)))
        lst_out = pa.LargeListArray.from_arrays(
            pa.array(new_offs, pa.int64()), kept_flat
        )
        clean_text = pc.binary_join(lst_out, " ")
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": pa.array(counts),
                "dup_grams": pa.array(n_dup),
                "covered_tokens": pa.array(cov_per_doc),
                "clean_text": clean_text,
            }
        )

    return joined.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True)


def readability(
    ds,
    column: str = "text",
    group_col: str = "source",
    round_digits: int = 6,
):
    """Per-group Flesch Reading Ease profile (Flesch 1948; the
    readability gate used by C4-style corpus curation):

        flesch = 206.835 - 1.015*(words/sentences) - 84.6*(syll/words)

    with deterministic, regex-only structure counts so a DuckDB oracle
    reproduces every value bit-for-bit:

    * words     = non-overlapping ``[a-z]+`` runs of the lowercased text
    * sentences = ``[.!?]+`` runs, clamped to >=1 (headline-only docs)
    * syllables = vowel-group count ``[aeiouy]+`` plus one per word with
      no vowel at all (``max(1, groups)`` per word, computed batch-wide
      as ``groups + (words - vowel_containing_words)`` — a maximal
      ``[a-z]+`` run with a vowel is exactly one ``[a-z]*[aeiouy][a-z]*``
      match, so no per-word loop is needed)

    Output: (group, n_docs BIGINT, avg_flesch_r6, wps_r6, spw_r6) where
    wps/spw are corpus-level ratios (total words / total sentences,
    total syllables / total words). Docs with zero words are excluded.

    Scale: one shuffle-free pass — four RE2 count kernels per batch, a
    per-batch (group, sums) combiner, then a tiny group-sum exchange of
    one row per (block, group). 100 TB of text costs exactly one scan.
    """
    from ray.data.aggregate import Sum

    from .nullkeys import null_safe_group_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        text = batch.column(column).combine_chunks().fill_null("")
        lower = pc.utf8_lower(text)
        w = pc.count_substring_regex(lower, "[a-z]+").to_numpy().astype(np.int64)
        wv = (
            pc.count_substring_regex(lower, "[a-z]*[aeiouy][a-z]*")
            .to_numpy()
            .astype(np.int64)
        )
        g = pc.count_substring_regex(lower, "[aeiouy]+").to_numpy().astype(np.int64)
        sen = np.maximum(
            pc.count_substring_regex(text, "[.!?]+").to_numpy().astype(np.int64), 1
        )
        s = g + (w - wv)
        keep = w > 0
        # per-doc doubles in the exact operation order the SQL oracle
        # uses: 206.835 - 1.015*(w/sen) - 84.6*(s/w)
        wf = w.astype(np.float64)
        flesch = 206.835 - 1.015 * (wf / sen) - 84.6 * (s / wf)
        t = pa.table(
            {
                group_col: batch.column(group_col).filter(pa.array(keep)),
                "n_docs": pa.array(np.ones(int(keep.sum()), dtype=np.int64)),
                "sum_flesch": pa.array(flesch[keep]),
                "sum_w": pa.array(w[keep]),
                "sum_sen": pa.array(sen[keep]),
                "sum_s": pa.array(s[keep]),
            }
        )
        agg = t.group_by([group_col]).aggregate(
            [
                ("n_docs", "sum"),
                ("sum_flesch", "sum"),
                ("sum_w", "sum"),
                ("sum_sen", "sum"),
                ("sum_s", "sum"),
            ]
        )
        return agg.rename_columns(
            [group_col, "n_docs", "sum_flesch", "sum_w", "sum_sen", "sum_s"]
        )

    totals = null_safe_group_aggregate(
        ds.select_columns(sorted({column, group_col})).map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ),
        [group_col],
        [
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_flesch", alias_name="sum_flesch"),
            Sum("sum_w", alias_name="sum_w"),
            Sum("sum_sen", alias_name="sum_sen"),
            Sum("sum_s", alias_name="sum_s"),
        ],
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t.column("n_docs").to_numpy(zero_copy_only=False).astype(np.float64)
        fsum = t.column("sum_flesch").to_numpy(zero_copy_only=False)
        wsum = t.column("sum_w").to_numpy(zero_copy_only=False).astype(np.float64)
        sensum = t.column("sum_sen").to_numpy(zero_copy_only=False).astype(np.float64)
        ssum = t.column("sum_s").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                group_col: t.column(group_col),
                "n_docs": t.column("n_docs"),
                "avg_flesch_r6": pa.array(
                    np.round(fsum / n, round_digits), pa.float64()
                ),
                "wps_r6": pa.array(np.round(wsum / sensum, round_digits), pa.float64()),
                "spw_r6": pa.array(np.round(ssum / wsum, round_digits), pa.float64()),
            }
        )

    return totals.map_batches(finish, batch_format="pyarrow").sort(group_col)


def compression_quality(
    ds,
    id_col: str = "doc_id",
    column: str = "text",
    level: int = 6,
    round_digits: int = 6,
):
    """Per-document compression-ratio quality signal (the
    entropy-by-compressor gate from Gopher/RefinedWeb-style curation:
    highly compressible text is boilerplate/repetition, ratio ~1 text
    is random noise — both tails get filtered). Emits per doc:

        raw_bytes   = UTF-8 byte length
        comp_bytes  = len(zlib.compress(utf8, level))
        ratio_r6    = comp_bytes / max(raw_bytes, 1)

    Deterministic for a fixed zlib (CPython bundles one zlib per
    build), but not SQL-expressible — covered by invariant tests, not
    a value oracle.

    Scale: shuffle-free single pass; the per-doc zlib.compress call is
    C-level work (the batch loop dispatches compressions, it does no
    Python-level byte math), so this behaves like any other
    CPU-bound map_batches stage and streams at 100 TB."""
    import zlib

    def score(batch: pa.Table) -> pa.Table:
        texts = batch.column(column).combine_chunks().fill_null("")
        raw = pc.binary_length(texts).cast(pa.int64())
        comp = np.fromiter(
            (len(zlib.compress(t.encode("utf-8"), level)) for t in texts.to_pylist()),
            dtype=np.int64,
            count=len(texts),
        )
        denom = np.maximum(raw.to_numpy(zero_copy_only=False), 1).astype(np.float64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "raw_bytes": raw,
                "comp_bytes": pa.array(comp),
                "ratio_r6": pa.array(np.round(comp / denom, round_digits)),
            }
        )

    return ds.select_columns(sorted({id_col, column})).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


def source_overlap(ds, group_col: str = "source", column: str = "text"):
    """Pairwise vocabulary overlap between corpus partitions: for each
    unordered pair of groups, the exact Jaccard similarity of their
    distinct lowercase ``[a-z]+`` word sets — the corpus-drift /
    contamination report run before mixing web-scrape snapshots.
    Output per pair (s1 < s2): (s1, s2, n1, n2, inter int64, jaccard
    float64); pairs with empty intersection appear with inter = 0.

    Scale: per-batch local distinct (group, word) combiner, one global
    distinct groupby, a self-equi-join on the word key (multiplicity =
    groups-per-word, i.e. tiny for real partition counts), and a
    pair-count groupby; only (group, word) pairs cross the wire, never
    documents. Vocab sizes and the final pair table are
    groups^2-sized — driver-safe by construction."""
    from .join import partitioned_join

    def words(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch.column(group_col)))
        texts = pc.utf8_lower(t.column(column).combine_chunks().fill_null(""))
        cleaned = pc.replace_substring_regex(texts, "[^a-z]+", " ")
        lists = pc.utf8_split_whitespace(cleaned)
        lists = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
        counts = np.diff(lists.offsets.to_numpy(zero_copy_only=False))
        parent = np.repeat(np.arange(len(lists), dtype=np.int64), counts)
        flat = pa.table(
            {
                "g": t.column(group_col).combine_chunks().take(pa.array(parent)),
                "w": lists.flatten(),
            }
        )
        # split_whitespace emits empty tokens at string edges — drop them
        flat = flat.filter(pc.greater(pc.utf8_length(flat.column("w")), 0))
        return flat.group_by(["g", "w"], use_threads=False).aggregate([])

    pairs = (
        ds.select_columns(sorted({group_col, column}))
        .map_batches(words, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["g", "w"])
        .count()
        .drop_columns(["count()"])
        .materialize()
    )
    sizes = {
        r["g"]: r["count()"]
        for r in pairs.groupby("g").count().take_all()
    }

    def right_side(t: pa.Table) -> pa.Table:
        return pa.table({"w": t.column("w"), "g2": t.column("g")})

    joined = partitioned_join(
        pairs, pairs.map_batches(right_side, batch_format="pyarrow"), on="w"
    )
    inter_rows = (
        joined.map_batches(
            lambda t: t.filter(pc.less(t.column("g"), t.column("g2"))),
            batch_format="pyarrow",
        )
        .groupby(["g", "g2"])
        .count()
        .take_all()
    )
    inter = {(r["g"], r["g2"]): r["count()"] for r in inter_rows}
    gs = sorted(sizes)
    s1c, s2c, n1c, n2c, ic, jc = [], [], [], [], [], []
    for i in range(len(gs)):
        for j in range(i + 1, len(gs)):
            a, b = gs[i], gs[j]
            iv = inter.get((a, b), 0)
            s1c.append(a)
            s2c.append(b)
            n1c.append(sizes[a])
            n2c.append(sizes[b])
            ic.append(iv)
            jc.append(float(iv) / float(sizes[a] + sizes[b] - iv))
    return pa.table(
        {
            "s1": pa.array(s1c),
            "s2": pa.array(s2c),
            "n1": pa.array(n1c, pa.int64()),
            "n2": pa.array(n2c, pa.int64()),
            "inter": pa.array(ic, pa.int64()),
            "jaccard": pa.array(jc, pa.float64()),
        }
    )


def c4_filters_batch(batch: pa.Table, column: str = "text",
                     id_column: str = "doc_id") -> pa.Table:
    """C4-style document filter signals (Raffel et al. 2020, §2.2),
    shuffle-free per-doc: terminal-punctuation line fraction (trimmed
    non-empty lines whose last char is . ! ? or \"), curly-brace and
    'lorem ipsum' flags, sentence-mark count and word count. keep =
    n_term_marks >= 3 AND no curly brace AND no lorem ipsum AND
    n_words >= 5. Every signal is an exact integer or one int
    division; flags are int 0/1 so the SQL oracle stringifies
    identically. Arrow kernels only (split / match_substring /
    count_substring), no Python loop over docs."""
    txt = batch.column(column).combine_chunks().fill_null("")
    lower = pc.utf8_lower(txt)
    has_curly = pc.cast(pc.match_substring(txt, "{"), pa.int64())
    has_lorem = pc.cast(pc.match_substring(lower, "lorem ipsum"), pa.int64())
    n_marks = pc.add(
        pc.add(pc.count_substring(txt, "."), pc.count_substring(txt, "!")),
        pc.count_substring(txt, "?"),
    )
    # words: single-space split, empties dropped (token_top_k contract)
    toks = pc.split_pattern(lower, " ")
    flat = toks.flatten()
    widx = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    wkeep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    n_words = np.bincount(widx[wkeep], minlength=batch.num_rows).astype(np.int64)
    # lines: newline split, trimmed; terminal = last char in .!?"
    lines = pc.split_pattern(txt, "\n")
    lflat = pc.utf8_trim_whitespace(lines.flatten())
    lidx = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    nonempty = pc.not_equal(lflat, "").to_numpy(zero_copy_only=False)
    term = pc.match_substring_regex(lflat, '[.!?"]$').to_numpy(
        zero_copy_only=False
    )
    n_lines = np.bincount(lidx[nonempty], minlength=batch.num_rows).astype(np.int64)
    n_term = np.bincount(
        lidx[nonempty & term], minlength=batch.num_rows
    ).astype(np.int64)
    frac = np.where(n_lines > 0, n_term / np.maximum(n_lines, 1), np.nan)
    n_marks_np = pc.cast(n_marks, pa.int64()).to_numpy(zero_copy_only=False)
    keep = (
        (n_marks_np >= 3)
        & (has_curly.to_numpy(zero_copy_only=False) == 0)
        & (has_lorem.to_numpy(zero_copy_only=False) == 0)
        & (n_words >= 5)
    ).astype(np.int64)
    return pa.table(
        {
            id_column: batch.column(id_column),
            "n_lines": pa.array(n_lines),
            "n_term_lines": pa.array(n_term),
            "term_line_frac": pa.array(frac, pa.float64(), mask=(n_lines == 0)),
            "has_curly": pa.array(has_curly),
            "has_lorem": pa.array(has_lorem),
            "n_term_marks": pa.array(n_marks_np, pa.int64()),
            "n_words": pa.array(n_words),
            "keep": pa.array(keep),
        }
    )


def log_odds_terms(ds, column: str = "text", group_col: str = "source",
                   group_a="src0", min_count: int = 5, top_k: int = 15,
                   alpha: float = 0.5):
    """Monroe et al. (2008) informative-Dirichlet log-odds lexical
    drift between group_a's token distribution and the rest of the
    corpus: per term w,

        delta = ln((ca+a) / (na+2a-ca-a)) - ln((cb+a) / (nb+2a-cb-a))
        z     = delta / sqrt(1/(ca+a) + 1/(cb+a))

    with a = alpha (Haldane 0.5 default); z is rounded to 6 digits
    (ln is not IEEE-correctly-rounded, so libm and SQL differ by
    ~1 ulp) and the ROUNDED z is the ranking key. The exchange is the (term, side) count grid (per-batch
    combiner first); min_count prunes the Zipf tail so the scored
    vocabulary is bounded. Returns the top_k terms in each direction:
    (term, ca, cb, z, direction 'a'|'b'), ordered by |z| within
    direction, ties by term. Tokens = single-space split of lowercased
    text (token_top_k contract)."""
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        ok = pc.is_valid(g)
        t = batch.filter(ok)
        texts = pc.utf8_lower(t.column(column).combine_chunks().fill_null(""))
        toks = pc.split_pattern(texts, " ")
        flat = toks.flatten()
        didx = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "")
        keep_np = keep.to_numpy(zero_copy_only=False)
        flat = flat.filter(keep)
        didx = didx[keep_np]
        is_a = pc.equal(t.column(group_col), group_a).to_numpy(zero_copy_only=False)
        side = is_a[didx].astype(np.int64)
        h = pa.table({"term": flat, "a": pa.array(side)})
        return (
            h.group_by(["term", "a"], use_threads=False)
            .aggregate([("a", "count")])
            .rename_columns(["term", "a", "cnt"])
        )

    grid = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["term", "a"])
        .sum("cnt")
        .take_all()
    )
    ca: dict[str, int] = {}
    cb: dict[str, int] = {}
    for r in grid:
        (ca if r["a"] == 1 else cb)[r["term"]] = int(r["sum(cnt)"])
    na, nb = sum(ca.values()), sum(cb.values())
    rows = []
    for term in set(ca) | set(cb):
        A, B = ca.get(term, 0), cb.get(term, 0)
        if A + B < min_count:
            continue
        da = np.log((A + alpha) / (na + 2 * alpha - A - alpha))
        db = np.log((B + alpha) / (nb + 2 * alpha - B - alpha))
        z = (da - db) / np.sqrt(1.0 / (A + alpha) + 1.0 / (B + alpha))
        # libm ln differs from SQL ln by ~1 ulp (sqrt is IEEE-exact,
        # log is not): round-6 is both the emitted value AND the sort
        # key so selection boundaries match the oracle exactly
        rows.append({"term": term, "ca": A, "cb": B, "z": float(np.round(z, 6))})
    rows.sort(key=lambda r: (-r["z"], r["term"]))
    top_a = [{**r, "direction": "a"} for r in rows[:top_k]]
    rows.sort(key=lambda r: (r["z"], r["term"]))
    top_b = [{**r, "direction": "b"} for r in rows[:top_k]]
    out = top_a + top_b
    if not out:
        return rd.from_arrow(
            pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "ca": pa.array([], pa.int64()),
                    "cb": pa.array([], pa.int64()),
                    "z": pa.array([], pa.float64()),
                    "direction": pa.array([], pa.string()),
                }
            )
        )
    return rd.from_arrow(pa.Table.from_pylist(out))


def hapax_ratio(ds, column: str = "text", group_col: str = "source"):
    """Per-group hapax legomena statistics: vocabulary size, number of
    terms occurring exactly once, total tokens, and hapax_ratio =
    n_hapax / vocab (ONE exact int division). The exchange is the
    (group, term) count grid with a per-batch combiner; the per-group
    rollup is another combiner over grid cells (cnt == 1 flags), so
    nothing token-sized reaches the driver. Tokens = single-space
    split of lowercased text, empties dropped. Output (group,
    n_tokens, vocab, n_hapax, hapax_ratio)."""
    from .nullkeys import null_safe_group_map

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        t = batch.filter(pc.is_valid(g))
        texts = pc.utf8_lower(t.column(column).combine_chunks().fill_null(""))
        toks = pc.split_pattern(texts, " ")
        flat = toks.flatten()
        didx = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "")
        keep_np = keep.to_numpy(zero_copy_only=False)
        flat = flat.filter(keep)
        gv = t.column(group_col).take(pa.array(didx[keep_np]))
        h = pa.table({group_col: gv, "term": flat})
        return (
            h.group_by([group_col, "term"], use_threads=False)
            .aggregate([("term", "count")])
            .rename_columns([group_col, "term", "cnt"])
        )

    grid = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([group_col, "term"])
        .sum("cnt")
    )

    def cell_partial(batch: pa.Table) -> pa.Table:
        c = batch.column("sum(cnt)").to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {
                group_col: batch.column(group_col),
                "tok": pa.array(c),
                "v": pa.array(np.ones(len(c), np.int64)),
                "hap": pa.array((c == 1).astype(np.int64)),
            }
        )
        return (
            t.group_by([group_col], use_threads=False)
            .aggregate([("tok", "sum"), ("v", "sum"), ("hap", "sum")])
            .rename_columns([group_col, "tok", "v", "hap"])
        )

    p = grid.map_batches(cell_partial, batch_format="pyarrow", zero_copy_batch=True)

    def merge(group: pa.Table) -> pa.Table:
        tok = int(group.column("tok").to_numpy(zero_copy_only=False).sum())
        v = int(group.column("v").to_numpy(zero_copy_only=False).sum())
        hap = int(group.column("hap").to_numpy(zero_copy_only=False).sum())
        return pa.table(
            {
                group_col: group.column(group_col).slice(0, 1),
                "n_tokens": pa.array([tok], pa.int64()),
                "vocab": pa.array([v], pa.int64()),
                "n_hapax": pa.array([hap], pa.int64()),
                "hapax_ratio": pa.array(
                    [hap / v if v else None], pa.float64()
                ),
            }
        )

    return null_safe_group_map(p, [group_col], merge)


def gopher_rules_batch(batch: pa.Table, column: str = "text",
                       id_column: str = "doc_id") -> pa.Table:
    """Gopher-style document quality rules (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", repetition/quality filter subset),
    shuffle-free per-doc, ALL-INTEGER output (ratio thresholds are
    evaluated as cross-multiplied integer comparisons, so no float
    ever materializes):

      n_words          single-space-split non-empty words
      sum_word_chars   total codepoints across those words
      n_alpha_words    words containing at least one [A-Za-z]
      n_hash           '#' characters
      n_ellipsis       non-overlapping '...' occurrences
      n_lines          trimmed non-empty lines
      n_bullet_lines   lines starting with '-', '*' or a bullet dot
      n_ellipsis_lines lines ending with '...'
      keep             1 iff 50 <= n_words <= 100000
                         AND 3*n_words <= sum_word_chars <= 10*n_words
                         AND 10*(n_hash + n_ellipsis) <= n_words
                         AND 10*n_bullet_lines <= 9*n_lines
                         AND 10*n_ellipsis_lines <= 3*n_lines
                         AND 10*n_alpha_words >= 8*n_words

    Arrow kernels only (split / count_substring / regex match +
    bincount over list parent indices); word/line split contracts
    match c4_filters_batch so the SQL oracle reuses the same CTEs."""
    txt = batch.column(column).combine_chunks().fill_null("")
    n_hash = pc.cast(pc.count_substring(txt, "#"), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    n_ell = pc.cast(pc.count_substring(txt, "..."), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    # words: single-space split of the ORIGINAL text, empties dropped
    toks = pc.split_pattern(txt, " ")
    flat = toks.flatten()
    widx = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    wkeep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    alpha = pc.match_substring_regex(flat, "[A-Za-z]").to_numpy(
        zero_copy_only=False
    )
    nr = batch.num_rows
    n_words = np.bincount(widx[wkeep], minlength=nr).astype(np.int64)
    sum_chars = np.bincount(
        widx[wkeep], weights=wlen[wkeep], minlength=nr
    ).astype(np.int64)
    n_alpha = np.bincount(widx[wkeep & alpha], minlength=nr).astype(np.int64)
    # lines: newline split, trimmed
    lines = pc.split_pattern(txt, "\n")
    lflat = pc.utf8_trim_whitespace(lines.flatten())
    lidx = pc.list_parent_indices(lines).to_numpy(zero_copy_only=False)
    nonempty = pc.not_equal(lflat, "").to_numpy(zero_copy_only=False)
    bullet = pc.match_substring_regex(lflat, "^[-*•]").to_numpy(
        zero_copy_only=False
    )
    ell_end = pc.ends_with(lflat, "...").to_numpy(zero_copy_only=False)
    n_lines = np.bincount(lidx[nonempty], minlength=nr).astype(np.int64)
    n_bullet = np.bincount(lidx[nonempty & bullet], minlength=nr).astype(np.int64)
    n_ell_lines = np.bincount(lidx[nonempty & ell_end], minlength=nr).astype(
        np.int64
    )
    keep = (
        (n_words >= 50)
        & (n_words <= 100000)
        & (3 * n_words <= sum_chars)
        & (sum_chars <= 10 * n_words)
        & (10 * (n_hash + n_ell) <= n_words)
        & (10 * n_bullet <= 9 * n_lines)
        & (10 * n_ell_lines <= 3 * n_lines)
        & (10 * n_alpha >= 8 * n_words)
    ).astype(np.int64)
    return pa.table(
        {
            id_column: batch.column(id_column),
            "n_words": pa.array(n_words),
            "sum_word_chars": pa.array(sum_chars),
            "n_alpha_words": pa.array(n_alpha),
            "n_hash": pa.array(n_hash),
            "n_ellipsis": pa.array(n_ell),
            "n_lines": pa.array(n_lines),
            "n_bullet_lines": pa.array(n_bullet),
            "n_ellipsis_lines": pa.array(n_ell_lines),
            "keep": pa.array(keep),
        }
    )


def dsir_weights(
    ds,
    target_col: str = "source",
    target_value: str = "src0",
    id_col: str = "doc_id",
    column: str = "text",
    k: int = 64,
):
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): estimate hashed-token
    bucket distributions for a TARGET slice (rows where target_col ==
    target_value) and for the RAW corpus, then score every document by
    its log importance weight

        w(doc) = sum_b c_doc[b] * ( ln(p[b]+1) + ln(Q+k)
                                  - ln(q[b]+1) - ln(P+k) )

    — add-1-smoothed ln(p_hat/q_hat) summed over the doc's hashed
    tokens. High weight = looks like the target domain; resampling by
    w is the paper's selection rule. Bucket = rolling codepoint-FNV
    (the repo-wide hash the SQL oracles replay) % k over the
    single-space word split, empty words dropped; weights round to 6
    digits (float sum order differs across engines).

    Scale shape: ONE k-row combiner exchange carries both histograms
    (per-batch np.bincount partials), the k-float log-ratio table
    broadcasts once via ray.put, and scoring streams with zero
    shuffles — the corpus text is read exactly twice and never moves.
    """
    import ray

    from .features import _split_words, _word_buckets

    def hist(batch: pa.Table) -> pa.Table:
        counts, flat = _split_words(batch.column(column))
        keep = np.asarray(pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0)
        parent = np.repeat(np.arange(len(counts), dtype=np.int64), counts)[keep]
        b = _word_buckets(flat.filter(pa.array(keep)), k)
        is_t = np.asarray(
            pc.equal(batch.column(target_col), target_value)
            .combine_chunks()
            .fill_null(False)
            .to_numpy(zero_copy_only=False),
            dtype=bool,
        )
        tok_t = is_t[parent]
        q = np.bincount(b, minlength=k)
        p = np.bincount(b[tok_t], minlength=k)
        return pa.table(
            {
                "b": pa.array(np.arange(k, dtype=np.int64)),
                "p": pa.array(p.astype(np.int64)),
                "q": pa.array(q.astype(np.int64)),
            }
        )

    agg = (
        ds.select_columns(sorted({column, target_col}))
        .map_batches(hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("b")
        .sum(["p", "q"])
        .to_pandas()
        .sort_values("b")
    )
    p = agg["sum(p)"].to_numpy(dtype=np.int64)
    q = agg["sum(q)"].to_numpy(dtype=np.int64)
    P, Q = int(p.sum()), int(q.sum())
    logdiff = (
        np.log((p + 1).astype(np.float64))
        + np.log(float(Q + k))
        - np.log((q + 1).astype(np.float64))
        - np.log(float(P + k))
    )
    ref = ray.put(logdiff)

    def score(batch: pa.Table) -> pa.Table:
        ld = ray.get(ref)
        counts, flat = _split_words(batch.column(column))
        keep = np.asarray(pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0)
        parent = np.repeat(np.arange(len(counts), dtype=np.int64), counts)[keep]
        b = _word_buckets(flat.filter(pa.array(keep)), k)
        w = np.zeros(len(counts), dtype=np.float64)
        np.add.at(w, parent, ld[b])
        return pa.table(
            {
                id_col: batch.column(id_col),
                "dsir_wt": pa.array(np.round(w, 6)),
            }
        )

    return ds.select_columns(sorted({id_col, column})).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )
