"""Byte-pair-encoding tokenizer training over a distributed corpus.

Sennrich, Haddow & Birch, "Neural Machine Translation of Rare Words
with Subword Units" (ACL 2016): BPE merges are a function of the WORD
FREQUENCY table, not the raw corpus. So the distributed part is ONE
map_batches word-count pass (the same bounded combiner shape as
text.token_top_k — only (word, cnt) partials enter the exchange) and
the iterative merge loop runs over the compact capped vocab table,
never the corpus. The loop itself is vectorized: words live in one
flat int32 symbol array with -1 sentinels at word boundaries, pair
counting is a numpy unique/bincount over packed (left, right) keys
weighted by word frequency, and greedy left-to-right merging resolves
overlap runs ("aaa" + merge (a,a) -> "aa a") with a cumsum parity
trick — no per-word Python in the training loop.

No reference analog (orc-go has no tokenizer); engine extension like
FSST, and the same shape as FSST's sampling pass: heavy corpus work
distributed once, compact model fit centrally, model applied
distributed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_END = "</w>"


def word_frequencies(ds, column: str = "text", max_vocab: int = 20000):
    """(word, cnt) Dataset: lowercased whitespace words, distributed
    partial counts, groupby-sum, truncated to the max_vocab most
    frequent (ties break by word ascending, deterministic)."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(batch.column(column).combine_chunks().fill_null("")), r"\s+"
        )
        flat = pc.drop_null(toks.flatten())
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        vc = pc.value_counts(flat)
        return pa.table({"word": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())})

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word")
        .sum("cnt")
        .map_batches(lambda t: t.rename_columns(["word", "cnt"]), batch_format="pyarrow")
        .sort(["cnt", "word"], descending=[True, False])
        .limit(max_vocab)
    )


def _pack(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    return (left.astype(np.int64) << 32) | right.astype(np.int64)


def _greedy_merge_positions(match: np.ndarray) -> np.ndarray:
    """Of the positions where the best pair matches, keep the greedy
    left-to-right non-overlapping subset: within every run of
    CONSECUTIVE match positions, keep the 0th, 2nd, 4th, ... (a merge
    at p consumes p+1, so an immediately following match is skipped)."""
    if not match.any():
        return np.empty(0, dtype=np.int64)
    m = match.astype(np.int64)
    starts = m & ~np.concatenate(([0], m[:-1]))
    pos_in_run = np.arange(len(m)) - np.maximum.accumulate(np.where(starts, np.arange(len(m)), -1))
    return np.nonzero(match & (pos_in_run % 2 == 0))[0]


def bpe_train(
    ds,
    column: str = "text",
    num_merges: int = 100,
    max_vocab: int = 20000,
    min_freq: int = 2,
) -> pa.Table:
    """Learn `num_merges` BPE merge rules; returns (rank, left, right,
    freq) with deterministic tie-breaks (max weighted count, then
    lexicographically smallest (left, right) pair).

    The materialized state is the CAPPED word-frequency table
    (max_vocab rows), not the corpus; merge frequencies are provably
    nonincreasing (every post-merge pair instance contains an instance
    of the pair it replaced), which the driver invariants query
    checks. Training stops early when no pair reaches min_freq."""
    rows = word_frequencies(ds, column, max_vocab).take_all()
    words = [r["word"] for r in rows]
    weights = np.array([r["cnt"] for r in rows], dtype=np.int64)

    # symbol table: chars + end-of-word marker, then learned merges
    symbols: list[str] = []
    sym_id: dict[str, int] = {}

    def sid(s: str) -> int:
        i = sym_id.get(s)
        if i is None:
            i = len(symbols)
            sym_id[s] = i
            symbols.append(s)
        return i

    flat: list[int] = []
    wt: list[int] = []
    for w, c in zip(words, weights):
        for ch in w:
            flat.append(sid(ch))
            wt.append(c)
        flat.append(sid(_END))
        wt.append(int(c))
        flat.append(-1)  # word boundary sentinel: pairs never cross it
        wt.append(0)
    syms = np.array(flat, dtype=np.int64)
    wts = np.array(wt, dtype=np.int64)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        if len(syms) < 2:
            break
        left, right = syms[:-1], syms[1:]
        valid = (left >= 0) & (right >= 0)
        if not valid.any():
            break
        packed = _pack(left[valid], right[valid])
        keys, inv = np.unique(packed, return_inverse=True)
        counts = np.bincount(inv, weights=wts[:-1][valid]).astype(np.int64)
        best_cnt = counts.max()
        if best_cnt < min_freq:
            break
        # deterministic tie-break: smallest (left_str, right_str) pair
        cand = keys[counts == best_cnt]
        pairs = [(symbols[int(k >> 32)], symbols[int(k & 0xFFFFFFFF)], int(k)) for k in cand]
        l_str, r_str, best_key = min(pairs)
        new_id = sid(l_str + r_str)
        merges.append((rank, l_str, r_str, int(best_cnt)))
        match = np.zeros(len(syms), dtype=bool)
        match[:-1][valid] = packed == best_key
        take = _greedy_merge_positions(match)
        syms[take] = new_id
        drop = np.zeros(len(syms), dtype=bool)
        drop[take + 1] = True
        syms = syms[~drop]
        wts = wts[~drop]

    return pa.table(
        {
            "rank": pa.array([m[0] for m in merges], pa.int64()),
            "left": pa.array([m[1] for m in merges], pa.string()),
            "right": pa.array([m[2] for m in merges], pa.string()),
            "freq": pa.array([m[3] for m in merges], pa.int64()),
        }
    )


def bpe_apply(ds, merges: pa.Table, column: str = "text", out: str = "bpe_tokens"):
    """Tokenize `column` with learned merges: a stateless map_batches
    stage; the merge table is broadcast once via ray.put and each task
    segment-merges only the batch's DISTINCT words (memoized), so work
    is bounded by per-batch vocabulary, not row count."""
    import ray

    ranks = {
        (l, r): i
        for i, (l, r) in enumerate(zip(merges.column("left").to_pylist(), merges.column("right").to_pylist()))
    }
    ranks_ref = ray.put(ranks)

    def encode_word(w: str, ranks: dict) -> list[str]:
        parts = list(w) + [_END]
        while len(parts) > 1:
            best, bi = None, -1
            for i in range(len(parts) - 1):
                r = ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best is None or r < best):
                    best, bi = r, i
            if best is None:
                break
            parts[bi : bi + 2] = [parts[bi] + parts[bi + 1]]
        return parts

    def run(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rk = ray.get(ranks_ref)
        texts = pc.utf8_lower(batch.column(column).combine_chunks().fill_null(""))
        memo: dict[str, list[str]] = {}
        out_rows = []
        for t in texts.to_pylist():
            toks: list[str] = []
            for w in t.split():
                got = memo.get(w)
                if got is None:
                    got = memo[w] = encode_word(w, rk)
                toks.extend(got)
            out_rows.append(toks)
        return batch.append_column(out, pa.array(out_rows, pa.list_(pa.string())))

    return ds.map_batches(run, batch_format="pyarrow", zero_copy_batch=True)
