"""Sequence packing: concatenate the corpus token stream in key order
and cut it into fixed-length training sequences (concat-and-chunk, the
standard LLM pre-training layout).

Semantics (deterministic, cluster-width-independent): order documents
by `key_col`; each doc contributes `tok_cnt` tokens (count(' ')+1,
the same whitespace definition as ops.text.token_count_batch so the
DuckDB oracle `length(string_split(text,' '))` agrees); the global
concatenated stream is cut every `seq_len` tokens. Output is one row
per sequence: seq_id, n_tokens (seq_len except the last), n_docs
(documents overlapping the sequence), first_doc, last_doc.

Scale shape — the corpus text NEVER shuffles; only (key, tok_cnt,
bucket) rows (~24 B/doc) cross one exchange:

  0. BOUNDARY pass (reads only `key_col`): each batch emits its
     `per_batch_k` smallest FNV fingerprints (bottom-k = a uniform
     sample without knowing N); the driver merges, estimates N with
     the KMV estimator (N ~= k * 2^64 / h_(k)), sizes the bucket
     count (~`rows_per_bucket` docs/bucket, capped), and picks
     order-preserving key boundaries from the sample's quantiles.
  1. NARROW pass: per-bucket token sums (one tiny groupby) come to
     the driver, which forms exclusive prefix offsets per bucket —
     the distributed prefix-sum trick, same as
     ops.sample.token_budget_sample.
  2. BUCKET pass: (key, tok_cnt, bucket) rows shuffle once by
     bucket; each group sorts by key, cumsums from its broadcast
     base offset, and emits PER-SEQUENCE partials (seq_id, n_docs,
     first, last) — sequences straddling a bucket boundary appear in
     at most two buckets, so the final merge groupby exchanges only
     ~n_sequences rows, not ~n_docs.
  3. MERGE: groupby(seq_id) -> sum/min/max; n_tokens is derived from
     the broadcast grand total.

Correctness does not depend on the sampled boundaries (any
order-preserving split yields the same output); a test varies
n_buckets to enforce this. No reference analog (orc-go has no
tokenizer); this is the Dolma/GPT-NeoX "pack into context windows"
curation step.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


def _tok_counts(batch: pa.Table, text_col: str, token_col: str | None) -> np.ndarray:
    """int64 tokens per row: count(' ')+1 (nulls -> 0, matching the
    oracle's COALESCE(length(string_split(text,' ')),0))."""
    import pyarrow.compute as pc

    if token_col is not None:
        n = pc.fill_null(batch.column(token_col).cast(pa.int64()), 0)
    else:
        spaces = pc.count_substring(batch.column(text_col), " ")
        n = pc.fill_null(pc.add(spaces, 1).cast(pa.int64()), 0)
    return n.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def _keys_np(batch: pa.Table, key_col: str) -> np.ndarray:
    col = batch.column(key_col)
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return col.to_numpy(zero_copy_only=False)


def sample_boundaries(
    ds,
    key_col: str,
    n_buckets: int | None = None,
    rows_per_bucket: int = 2_000_000,
    max_buckets: int = 4096,
    sample_k: int = 4096,
    per_batch_k: int = 256,
):
    """Order-preserving range boundaries over `key_col` from a
    deterministic bottom-k fingerprint sample. Returns a sorted numpy
    array of n_buckets-1 boundary keys (possibly empty).

    Each batch ships at most `per_batch_k` (key, hash) rows to the
    driver; the kth-smallest merged hash doubles as a KMV estimate of
    the corpus size, which sizes n_buckets when not given."""
    from .sample import _key_fingerprints

    from .. import bloom as bloom_mod

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"__k": pa.array([], batch.column(key_col).type),
                             "__h": pa.array([], pa.uint64()),
                             "__t": pa.array([], pa.bool_())})
        # fmix64 the FNV fingerprint: raw FNV over structured keys (e.g.
        # sequential int ids as strings) has a SKEWED bottom tail, and
        # the KMV estimator assumes uniform hashes — measured 3.5x
        # under-estimates on arange(50k,100k) keys without the mixer.
        # Only this estimator mixes; the sampling gates keep raw FNV
        # because their SQL oracles replicate it.
        h = bloom_mod._mix(_key_fingerprints(batch, key_col, ""))
        take = min(per_batch_k, len(h))
        idx = np.argpartition(h, take - 1)[:take]
        keys = batch.column(key_col).take(pa.array(idx))
        # __t: this batch TRUNCATED its sample (shipped fewer fingerprints
        # than it had rows) — only when no batch truncated is len(hs) the
        # exact corpus size
        return pa.table({"__k": keys, "__h": pa.array(h[idx]),
                         "__t": pa.array([len(h) > take] * take)})

    rows = (
        ds.select_columns([key_col])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .take_all()
    )
    if not rows:
        return np.array([]), 1
    hs = np.array([r["__h"] for r in rows], dtype=np.uint64)
    order = np.argsort(hs, kind="stable")[: min(sample_k, len(hs))]
    if n_buckets is None:
        if not any(r["__t"] for r in rows):
            # every batch shipped ALL its fingerprints: exact N. (A mere
            # len(hs) < sample_k test mis-sizes large corpora held in few
            # big blocks: 8 blocks × 1M rows → 2048 samples "exact" 2048.)
            n_est = len(hs)
        else:
            k_eff = len(order)  # KMV with the effective k, not sample_k
            n_est = int(k_eff * (2.0**64) / float(hs[order[-1]]))
        n_buckets = int(np.clip(n_est // rows_per_bucket + 1, 1, max_buckets))
    keys = np.array([rows[i]["__k"] for i in order])
    keys.sort(kind="stable")
    if n_buckets <= 1 or len(keys) < 2:
        return np.array([]), max(1, n_buckets)
    cut = np.linspace(0, len(keys), n_buckets, endpoint=False)[1:].astype(np.int64)
    bnd = np.unique(keys[cut])
    return bnd, len(bnd) + 1


def pack_tokens(
    ds,
    seq_len: int,
    key_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int | None = None,
):
    """MATERIALIZED packing: the actual `seq_len`-token training
    windows as (seq_id, n_tokens, tokens list<string>), tokens being
    the single-space fields in `key_col` order (the same stream
    pack_sequences indexes). Materialization inherently moves the
    corpus once — through ONE groupby(bucket) exchange (paragraph_dedup
    precedent); after that, each bucket emits its COMPLETE sequences
    as zero-copy list slices and ships only the ragged head/tail runs
    of boundary sequences (a few rows per bucket) into a tiny
    groupby(seq_id) merge. The final short sequence arrives as a
    partial too, so no special-casing."""
    import pyarrow.compute as pc

    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    bnd, _ = sample_boundaries(ds, key_col, n_buckets=n_buckets)
    L = int(seq_len)

    def bucket_of(keys: np.ndarray) -> np.ndarray:
        if len(bnd) == 0:
            return np.zeros(len(keys), dtype=np.int64)
        return np.searchsorted(bnd, keys, side="right").astype(np.int64)

    def narrow(batch: pa.Table) -> pa.Table:
        n = _tok_counts(batch, text_col, None)
        b = bucket_of(_keys_np(batch, key_col))
        t = pa.table({"__bucket": pa.array(b), "__n": pa.array(n)})
        return t.group_by("__bucket", use_threads=False).aggregate([("__n", "sum")])

    agg = (
        ds.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .sum("__n_sum")
        .take_all()
    )
    agg.sort(key=lambda r: r["__bucket"])
    base: dict[int, int] = {}
    off = 0
    for r in agg:
        base[r["__bucket"]] = off
        off += int(r["sum(__n_sum)"])

    def with_cols(batch: pa.Table) -> pa.Table:
        b = bucket_of(_keys_np(batch, key_col))
        return pa.table(
            {
                key_col: batch.column(key_col),
                text_col: batch.column(text_col),
                "__bucket": pa.array(b),
            }
        )

    out_schema = pa.schema(
        [
            ("seq_id", pa.int64()),
            ("__order", pa.int64()),
            ("__complete", pa.bool_()),
            ("tokens", pa.large_list(pa.string())),
        ]
    )

    def per_bucket(group: pa.Table) -> pa.Table:
        bkt = group.column("__bucket")[0].as_py()
        g0 = base.get(bkt, 0)
        s = group.take(pc.sort_indices(group, sort_keys=[(key_col, "ascending")]))
        toks = pc.split_pattern(pc.fill_null(s.column(text_col), ""), " ")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = toks.flatten()
        # null text contributed 0 tokens in the narrow pass; fill_null
        # + split gives [''] (1 token) — drop those lists' elements to
        # keep offsets consistent with the counted stream
        nulls = pc.is_null(s.column(text_col))
        if pc.any(nulls).as_py():
            lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
            keep_doc = ~nulls.to_numpy(zero_copy_only=False)
            keep_mask = np.repeat(keep_doc, lens)
            flat = flat.filter(pa.array(keep_mask))
        m = len(flat)
        if m == 0:
            return out_schema.empty_table()
        s_first = g0 // L  # seq the bucket's first token lands in
        s_start = s_first if g0 % L == 0 else s_first + 1  # first seq fully startable here
        s_end = (g0 + m) // L  # first seq NOT fully ended in this bucket
        rows_seq, rows_ord, rows_c, offsets = [], [], [], [0]
        chunks = []
        if s_start > s_end:  # bucket sits inside one sequence
            head_n = m
        else:
            head_n = s_start * L - g0  # tokens finishing the previous seq
        if head_n > 0:
            rows_seq.append(s_first)
            rows_ord.append(g0)
            rows_c.append(False)
            chunks.append((0, head_n))
        for si in range(max(s_start, s_first), s_end):
            a = si * L - g0
            rows_seq.append(si)
            rows_ord.append(g0 + a)
            rows_c.append(True)
            chunks.append((a, L))
        tail_a = s_end * L - g0
        if s_end >= s_start and tail_a < m:
            rows_seq.append(s_end)
            rows_ord.append(g0 + tail_a)
            rows_c.append(False)
            chunks.append((tail_a, m - tail_a))
        # chunks tile [0, m) exactly in order (head | complete... | tail),
        # so the list array wraps the flat token buffer zero-copy
        for a, ln in chunks:
            offsets.append(offsets[-1] + ln)
        lists = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), flat)
        return pa.table(
            {
                "seq_id": pa.array(np.asarray(rows_seq, dtype=np.int64)),
                "__order": pa.array(np.asarray(rows_ord, dtype=np.int64)),
                "__complete": pa.array(rows_c),
                "tokens": lists,
            }
        )

    # the bucket pass feeds two branches (final complete rows + the
    # boundary merge); Ray re-executes shared lineage per consumer, so
    # materialize once — the output is corpus-sized either way and the
    # object store spills; the merge exchange then sees only the few
    # boundary rows per bucket
    parts = (
        ds.map_batches(with_cols, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .materialize()
    )

    def finish_complete(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.equal(t.column("__complete"), True))
        return pa.table(
            {
                "seq_id": keep.column("seq_id"),
                "n_tokens": pc.list_value_length(keep.column("tokens")).cast(pa.int64()),
                "tokens": keep.column("tokens"),
            }
        )

    def merge_partials(group: pa.Table) -> pa.Table:
        s = group.take(pc.sort_indices(group, sort_keys=[("__order", "ascending")]))
        col = s.column("tokens")
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        flat = col.flatten()
        return pa.table(
            {
                "seq_id": s.column("seq_id").slice(0, 1),
                "n_tokens": pa.array([len(flat)], pa.int64()),
                "tokens": pa.LargeListArray.from_arrays(pa.array([0, len(flat)], pa.int64()), flat),
            }
        )

    def only_partials(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("__complete"), False))

    complete = parts.map_batches(finish_complete, batch_format="pyarrow", zero_copy_batch=True)
    boundary = (
        parts.map_batches(only_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("seq_id")
        .map_groups(merge_partials, batch_format="pyarrow")
    )
    return complete.union(boundary)


def pack_sequences(
    ds,
    seq_len: int,
    key_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    n_buckets: int | None = None,
):
    """Pack the corpus into fixed `seq_len`-token sequences in
    `key_col` order. Returns a Dataset with columns (seq_id,
    n_tokens, n_docs, first_doc, last_doc). See module docstring."""
    from ray.data.aggregate import Max, Min, Sum

    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    bnd, nb = sample_boundaries(ds, key_col, n_buckets=n_buckets)

    def bucket_of(keys: np.ndarray) -> np.ndarray:
        if len(bnd) == 0:
            return np.zeros(len(keys), dtype=np.int64)
        return np.searchsorted(bnd, keys, side="right").astype(np.int64)

    def narrow(batch: pa.Table) -> pa.Table:
        n = _tok_counts(batch, text_col, token_col)
        b = bucket_of(_keys_np(batch, key_col))
        t = pa.table({"__bucket": pa.array(b), "__n": pa.array(n)})
        return t.group_by("__bucket", use_threads=False).aggregate([("__n", "sum")])

    agg = (
        ds.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .sum("__n_sum")
        .take_all()
    )  # <= n_buckets rows, driver-side by design
    agg.sort(key=lambda r: r["__bucket"])
    base: dict[int, int] = {}
    total = 0
    for r in agg:
        base[r["__bucket"]] = total
        total += int(r["sum(__n_sum)"])

    def with_cols(batch: pa.Table) -> pa.Table:
        n = _tok_counts(batch, text_col, token_col)
        keys = batch.column(key_col)
        b = bucket_of(_keys_np(batch, key_col))
        return pa.table({key_col: keys, "__n": pa.array(n), "__bucket": pa.array(b)})

    L = int(seq_len)

    def per_bucket(group: pa.Table) -> pa.Table:
        bkt = group.column("__bucket")[0].as_py()
        off = base.get(bkt, 0)
        import pyarrow.compute as pc

        s = group.take(pc.sort_indices(group, sort_keys=[(key_col, "ascending")]))
        n = s.column("__n").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        keys = _keys_np(s, key_col)
        hi = off + np.cumsum(n)
        lo = hi - n
        pos = n > 0
        s0 = np.where(pos, lo // L, 0)
        s1 = np.where(pos, (hi - 1) // L, -1)
        reps = np.where(pos, s1 - s0 + 1, 0).astype(np.int64)
        tot = int(reps.sum())
        idx = np.repeat(np.arange(len(n), dtype=np.int64), reps)
        starts = np.repeat(np.cumsum(reps) - reps, reps)
        seq = s0[idx] + (np.arange(tot, dtype=np.int64) - starts)
        # rows are key-sorted and lo is nondecreasing, so `seq` is
        # already sorted: unique's first index + count-1 bound each
        # sequence's doc span within this bucket
        uniq, first_i, counts = np.unique(seq, return_index=True, return_counts=True)
        return pa.table(
            {
                "seq_id": pa.array(uniq),
                "__d": pa.array(counts.astype(np.int64)),
                "__f": pa.array(keys[idx[first_i]]),
                "__l": pa.array(keys[idx[first_i + counts - 1]]),
            }
        )

    parts = (
        ds.map_batches(with_cols, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    merged = parts.groupby("seq_id").aggregate(
        Sum("__d", alias_name="n_docs"),
        Min("__f", alias_name="first_doc"),
        Max("__l", alias_name="last_doc"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        seq = batch.column("seq_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ntok = np.minimum((seq + 1) * L, total) - seq * L
        out = pa.table(
            {
                "seq_id": batch.column("seq_id").cast(pa.int64()),
                "n_tokens": pa.array(ntok),
                "n_docs": batch.column("n_docs").cast(pa.int64()),
                "first_doc": batch.column("first_doc"),
                "last_doc": batch.column("last_doc"),
            }
        )
        return out

    return merged.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
