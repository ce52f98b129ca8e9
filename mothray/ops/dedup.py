"""Deduplication operators over a documents table.

All stages are vectorized map_batches + one keyed shuffle; nothing
materializes the corpus on the driver. Every variant funnels its dup
ids through _anti_join_ids — a distributed hash-shuffle anti-join — so
the dup set is never collected into a driver-side Python structure.

* exact_dedup      — 128-bit content hash -> (h1, h2, id)-only groupby
                     (text never enters the exchange) -> loser ids ->
                     anti-join back against the corpus.
* minhash_lsh_dedup— 8-byte shingles -> 64-bin one-permutation minhash
                     -> 16 bands of 4 -> banded groupby buckets ->
                     candidates collapse to their minimum doc id.
* simhash_dedup    — 64-bit simhash over token hashes; 4-way band split
                     (pigeonhole: hamming distance <= 3 implies an exact
                     match in at least one 16-bit band) -> candidate
                     buckets -> verify hamming -> drop near-dups.
* ngram_jaccard    — exact character-n-gram Jaccard verification for a
                     candidate pair list (used to verify LSH buckets).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import bloom as bloom_mod

_U64 = np.uint64
_MIX1 = _U64(0xFF51AFD7ED558CCD)
_MIX2 = _U64(0xC4CEB9FE1A85EC53)


def _text_parts(arr: pa.ChunkedArray | pa.Array):
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    from ..column import _string_parts

    values = arr.fill_null("")
    return _string_parts(values)


def _auto_partitions(ds, target_bytes: int = 256 << 20) -> int:
    """Join partition count from the dataset's (metadata) size so one
    partition stays ~target_bytes regardless of corpus scale."""
    try:
        size = ds.size_bytes()
    except Exception:
        size = None
    if not size:
        return 32
    return int(min(max(size // target_bytes + 1, 2), 4096))


def _anti_join_ids(ds, dup_ids, id_column: str, num_partitions: int | None = None):
    """Drop rows of `ds` whose id appears in the `dup_ids` Dataset via a
    distributed hash-shuffle anti-join (Ray Dataset.join left_anti).

    This replaces the former driver-side dup-id set: the id set stays
    distributed in the object store end to end, so memory per task is
    bounded by the join partition size, not by the number of duplicates.
    `dup_ids` (ids only — tiny rows) is materialized to (a) skip the
    join entirely when there are no duplicates and (b) let the join
    size both sides; the corpus side streams.

    Datasets with nested columns (list embeddings etc.) take a manual
    bucketed path — Acero, which backs Dataset.join, rejects nested
    non-key columns — with identical semantics: tag sides, one
    groupby(bucket) exchange, vectorized np.isin filter per bucket."""
    dup_ids = dup_ids.materialize()
    if dup_ids.count() == 0:
        return ds
    n = num_partitions or _auto_partitions(ds)
    schema = ds.schema()
    if not any(pa.types.is_nested(t) for t in schema.types):
        return ds.join(dup_ids, join_type="left_anti", num_partitions=n, on=(id_column,))

    names, types = list(schema.names), list(schema.types)

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            nrows = batch.num_rows
            ids = batch.column(id_column).to_numpy(zero_copy_only=False)
            bucket = ((ids.astype(np.uint64) * _MIX1) >> _U64(32)) % _U64(n)
            arrays = [
                batch.column(c) if c in batch.column_names else pa.nulls(nrows, type=t)
                for c, t in zip(names, types)
            ]
            arrays += [
                pa.array(bucket.astype(np.int32)),
                pa.array(np.full(nrows, side, dtype=np.int8)),
            ]
            return pa.table(arrays, names=names + ["__bucket", "__side"])

        return fn

    tagged = ds.map_batches(tag(0), batch_format="pyarrow", zero_copy_batch=True).union(
        dup_ids.map_batches(tag(1), batch_format="pyarrow")
    )

    def anti(group: pa.Table) -> pa.Table:
        side = group.column("__side").to_numpy(zero_copy_only=False)
        ids = group.column(id_column).to_numpy(zero_copy_only=False)
        drop = np.unique(ids[side == 1])
        keep = (side == 0) & ~np.isin(ids, drop)
        return group.filter(pa.array(keep)).drop_columns(["__bucket", "__side"])

    return tagged.groupby("__bucket").map_groups(anti, batch_format="pyarrow")


def _segmented_content_hash(lengths: np.ndarray, buf: np.ndarray, seed) -> np.ndarray:
    """Full-content 64-bit hash per doc, vectorized: every byte is mixed
    with its within-doc position, summed per doc (order-sensitive via
    the position term), finalized with the length."""
    n = len(lengths)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lengths = lengths.astype(np.int64, copy=False)
    offs = np.concatenate(([0], np.cumsum(lengths)))
    sums = np.zeros(n, dtype=np.uint64)
    if len(buf):
        pos = np.arange(len(buf), dtype=np.int64)
        doc_of = np.searchsorted(offs[1:], pos, side="right")
        rel = (pos - offs[:-1][doc_of]).astype(np.uint64)
        terms = bloom_mod._mix(seed ^ (rel << _U64(8)) ^ buf.astype(np.uint64))
        nz = np.nonzero(lengths)[0]
        starts = offs[:-1][nz]
        sums[nz] = np.add.reduceat(terms, starts)
    return bloom_mod._mix(sums ^ lengths.astype(np.uint64) ^ seed)


def content_hash_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Adds h1/h2 (two independent 64-bit hashes = 128-bit content id).

    FULL-content hashes — polars xxhash64 (vectorized Rust) when
    available, else a numpy segmented mix. bloom.hash_bytes_columns is
    deliberately NOT used here: it samples first/middle/last windows
    only (fine for advisory blooms, wrong for exact dedup — docs
    differing only mid-content would collide and be dropped)."""
    arr = batch.column(column)
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    values = arr.fill_null("")
    try:
        import polars as pl

        s = pl.from_arrow(values)
        h1 = s.hash(seed=0).to_numpy().astype(np.uint64, copy=False)
        h2 = s.hash(seed=0x9E3779B9).to_numpy().astype(np.uint64, copy=False)
    except ImportError:
        lengths, data = _text_parts(batch.column(column))
        buf = np.frombuffer(data, dtype=np.uint8)
        h1 = _segmented_content_hash(lengths, buf, _U64(0x9E3779B97F4A7C15))
        h2 = _segmented_content_hash(lengths, buf, _MIX2)
    return batch.append_column("h1", pa.array(h1.view(np.int64))).append_column(
        "h2", pa.array(h2.view(np.int64))
    )


def exact_dedup(ds, column: str = "text", id_column: str = "doc_id", num_partitions: int | None = None):
    """Keep the lowest-id row per distinct `column` value.

    Scale path: only (h1, h2, id) rows — 24 bytes each — go through the
    groupby exchange; the text never moves through that shuffle. Groups
    with more than one id emit their non-minimum ids as a small
    distributed "loser" set, which is anti-joined back against the
    corpus (one hash-shuffle join, no driver-side set)."""
    import pyarrow.compute as pc

    def key_rows(batch: pa.Table) -> pa.Table:
        return content_hash_batch(batch.select([id_column, column]), column).select(
            ["h1", "h2", id_column]
        )

    keys = ds.map_batches(key_rows, batch_format="pyarrow", zero_copy_batch=True)

    def losers(group: pa.Table) -> pa.Table:
        ids = group.column(id_column)
        return group.filter(pc.not_equal(ids, pc.min(ids))).select([id_column])

    dup_ids = keys.groupby(["h1", "h2"]).map_groups(losers, batch_format="pyarrow")
    return _anti_join_ids(ds, dup_ids, id_column, num_partitions)


def paragraph_dedup(
    ds,
    column: str = "text",
    id_column: str = "doc_id",
    sep: str = ". ",
    num_partitions: int | None = None,
):
    """SUB-document exact dedup (boilerplate removal at corpus scale):
    split each doc into paragraphs on `sep`, keep only the FIRST
    occurrence of each distinct paragraph corpus-wide (first = lowest
    (id, position)), reassemble each doc from its surviving paragraphs.
    Returns (id_column, kept_text); a doc whose every paragraph lost
    keeps an empty string (it stays in the output — filtering is the
    caller's policy decision).

    Scale path mirrors exact_dedup: the paragraph TEXT never enters the
    winner exchange — only (h1, h2, id, idx) rows (32 bytes) shuffle.
    Losers come back as ONE tiny row per affected doc (the drop
    positions packed into a string), so the corpus text shuffles at
    most ONCE (the doc-id join), and the drop+rejoin runs vectorized
    inside the task that already holds the doc. A first draft shuffled
    text twice (composite-key anti-join on exploded paragraphs, then a
    groupby(doc_id) reassembly) — at 100 TB that is two extra
    full-corpus exchanges."""
    import pyarrow.compute as pc

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch.column(column)
        texts = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
        paras = pc.split_pattern(texts.fill_null(""), sep)
        paras = paras.combine_chunks() if isinstance(paras, pa.ChunkedArray) else paras
        offs = paras.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offs)
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        idx = np.arange(int(offs[-1]), dtype=np.int64) - np.repeat(offs[:-1], counts)
        return pa.table(
            {
                id_column: pa.array(np.repeat(ids, counts)),
                "para_idx": pa.array(idx),
                "para": paras.flatten(),
            }
        )

    def keys(batch: pa.Table) -> pa.Table:
        return content_hash_batch(explode(batch), "para").select(
            ["h1", "h2", id_column, "para_idx"]
        )

    def losers(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return group.select([id_column, "para_idx"]).slice(0, 0)
        ids = group.column(id_column).to_numpy(zero_copy_only=False)
        idx = group.column("para_idx").to_numpy(zero_copy_only=False)
        order = np.lexsort((idx, ids))
        keep = np.zeros(len(ids), dtype=bool)
        keep[order[0]] = True
        return group.filter(pa.array(~keep)).select([id_column, "para_idx"])

    def pack_drops(group: pa.Table) -> pa.Table:
        # one row per affected doc: sorted drop positions as a csv
        # string (a list<int64> column would be cleaner, but the join
        # below runs through Acero, which rejects nested non-key
        # columns — same constraint as _anti_join_ids)
        idx = np.sort(group.column("para_idx").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                id_column: group.column(id_column).combine_chunks().slice(0, 1),
                "__drops": pa.array([",".join(map(str, idx.tolist()))]),
            }
        )

    lost = (
        ds.map_batches(keys, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["h1", "h2"])
        .map_groups(losers, batch_format="pyarrow")
        .groupby(id_column)
        .map_groups(pack_drops, batch_format="pyarrow")
        .materialize()  # (id, positions-string) — one tiny row per affected doc
    )

    docs = ds.map_batches(
        lambda t: t.select([id_column, column]), batch_format="pyarrow", zero_copy_batch=True
    )
    if lost.count() > 0:
        n = num_partitions or _auto_partitions(ds)
        docs = docs.join(lost, join_type="left_outer", num_partitions=n, on=(id_column,))

    def drop_and_rejoin(batch: pa.Table) -> pa.Table:
        texts = batch.column(column)
        texts = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
        ids = batch.column(id_column)
        if "__drops" not in batch.column_names:
            return pa.table({id_column: ids, "kept_text": texts.fill_null("")})
        paras = pc.split_pattern(texts.fill_null(""), sep)
        paras = paras.combine_chunks() if isinstance(paras, pa.ChunkedArray) else paras
        offs = paras.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = paras.flatten()
        keep = np.ones(int(offs[-1]), dtype=bool)
        drops = batch.column("__drops").to_pylist()  # mostly None; rare strings
        for row, dstr in enumerate(drops):
            if dstr:
                pos = np.array(dstr.split(","), dtype=np.int64)
                keep[offs[row] + pos] = False
        new_counts = np.add.reduceat(keep, offs[:-1]) if len(offs) > 1 else np.zeros(0, np.int64)
        new_counts = new_counts * (np.diff(offs) > 0)  # reduceat quirk on empty segments
        new_offs = np.concatenate(([0], np.cumsum(new_counts)))
        kept_flat = flat.filter(pa.array(keep))
        rebuilt = pa.ListArray.from_arrays(pa.array(new_offs, type=pa.int32()), kept_flat)
        return pa.table({id_column: ids, "kept_text": pc.binary_join(rebuilt, sep)})

    return docs.map_batches(drop_and_rejoin, batch_format="pyarrow", zero_copy_batch=True)


# ------------------------------------------------------------------ minhash

N_PERM = 64
N_BANDS = 16
ROWS_PER_BAND = N_PERM // N_BANDS


def _window_hashes(buf: np.ndarray, shingle: int, dual: bool = False) -> np.ndarray:
    """uint64 value of the `shingle`-byte window starting at each byte
    position (length max(len(buf),1); trailing windows read zero
    padding — callers mask to within-doc positions). shingle==8 is a
    zero-copy u64 view; other widths fold the window bytes with an
    FNV-style polynomial (`shingle` vectorized passes).

    dual=True returns (h1, h2) with h2 an independently-seeded second
    polynomial over the same windows (one shared byte gather) so
    callers can treat the pair as a 128-bit fingerprint — window
    equality up to a ~n^2/2^129 collision bound instead of 2^-65.
    For shingle==8 the u64 view is the window bytes themselves
    (injective), so h2 == h1 adds no information and none is needed."""
    padded = np.concatenate([buf, np.zeros(shingle, dtype=np.uint8)])
    n = max(len(buf), 1)
    if shingle == 8:
        hv = np.lib.stride_tricks.sliding_window_view(padded, 8)[:n].copy().view("<u8").ravel()
        return (hv, hv) if dual else hv
    w = np.lib.stride_tricks.sliding_window_view(padded, shingle)[:n]
    hv = np.zeros(n, dtype=np.uint64)
    prime = _U64(0x100000001B3)
    if not dual:
        for j in range(shingle):
            hv = (hv * prime) ^ w[:, j].astype(np.uint64)
        return hv
    h2 = np.full(n, _U64(0x2545F4914F6CDD1D), dtype=np.uint64)
    prime2 = _U64(0x9E3779B97F4A7C15)
    for j in range(shingle):
        col = w[:, j].astype(np.uint64)
        hv = (hv * prime) ^ col
        h2 = (h2 * prime2) ^ col
    return hv, h2


def _short_doc_hashes(lengths: np.ndarray, offs: np.ndarray, buf: np.ndarray, short_idx: np.ndarray) -> np.ndarray:
    """Whole-content u64 hash for docs shorter than the shingle width
    (gathers only those docs' bytes — bounded by n_short*(shingle-1)).
    Replaces the former cross-doc window read: identical short docs now
    hash identically regardless of batch layout (ADVICE r2)."""
    sl = lengths[short_idx]
    reps = np.repeat(offs[:-1][short_idx], sl)
    within = np.arange(len(reps), dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(sl)))[:-1], sl
    )
    return _segmented_content_hash(sl, buf[reps + within], _U64(0xA0761D6478BD642F))


def _doc_window_values(lengths: np.ndarray, buf: np.ndarray, shingle: int):
    """Shared shingle pass: per-doc window hashes masked to positions
    fully INSIDE each doc, plus whole-content fallback values for docs
    shorter than the shingle. Returns (doc_of, raw_values) — both 1-D,
    grouped by doc in doc order for the window part, fallback entries
    appended."""
    lengths = lengths.astype(np.int64, copy=False)
    offs = np.concatenate(([0], np.cumsum(lengths)))
    starts = offs[:-1]
    counts = np.maximum(lengths - (shingle - 1), 0)  # windows fully inside each doc
    win = _window_hashes(buf, shingle)
    delta = np.zeros(len(win) + 1, dtype=np.int64)
    np.add.at(delta, np.minimum(starts, len(win)), 1)
    np.add.at(delta, np.minimum(starts + counts, len(win)), -1)
    pos = np.nonzero(np.cumsum(delta[:-1]) > 0)[0]
    raw = win[pos]
    doc_of = np.searchsorted(offs[1:], pos, side="right")
    short_idx = np.nonzero((lengths > 0) & (counts == 0))[0]
    if len(short_idx):
        raw = np.concatenate([raw, _short_doc_hashes(lengths, offs, buf, short_idx)])
        doc_of = np.concatenate([doc_of, short_idx])
    return doc_of, raw


def minhash_signatures(texts: pa.ChunkedArray | pa.Array, shingle: int = 8) -> np.ndarray:
    """(n_docs, N_PERM) uint64 minhash matrix via ONE-PERMUTATION
    HASHING with rotation densification (Shrivastava & Li): each
    `shingle`-byte window hash lands in bin = top-6-bits, the
    per-(doc, bin) minimum is one scatter pass, and empty bins borrow
    the next non-empty bin's value (circular). One pass over the text
    instead of N_PERM passes — this is what makes minhash viable at
    corpus scale; Jaccard estimation properties match k-perm minhash.

    Windows never cross doc boundaries; docs shorter than the shingle
    contribute one whole-content hash; a batch of only empty/null docs
    returns the all-sentinel matrix (no out-of-bounds scatter)."""
    lengths, data = _text_parts(texts)
    n_docs = len(lengths)
    maxu = _U64(0xFFFFFFFFFFFFFFFF)
    if n_docs == 0:
        return np.empty((0, N_PERM), dtype=np.uint64)
    buf = np.frombuffer(data, dtype=np.uint8)
    sig = np.full(n_docs * N_PERM, maxu, dtype=np.uint64)
    if len(buf) == 0:  # every doc empty/null: nothing to hash
        return sig.reshape(n_docs, N_PERM)
    doc_of, raw = _doc_window_values(lengths, buf, shingle)
    if len(raw) == 0:
        return sig.reshape(n_docs, N_PERM)
    hv = (raw * _MIX1) ^ (raw >> _U64(31))
    bins = (hv >> _U64(64 - 6)).astype(np.int64)  # 64 bins from top bits
    vals = (hv * _MIX2) ^ (hv >> _U64(29))  # bin-independent value
    # grouped-min WITHOUT np.minimum.at (which is ~1M ops/s): pack
    # (group key | truncated value) into one u64, sort once, take the
    # first element of each key group. Values keep 44 bits — plenty
    # for similarity estimation; ties break deterministically.
    key = (doc_of * N_PERM + bins).astype(np.uint64)
    _CHUNK_DOCS = 1 << 14  # key must fit 20 bits -> chunk the doc space
    for lo in range(0, n_docs, _CHUNK_DOCS):
        hi = lo + _CHUNK_DOCS
        m = (doc_of >= lo) & (doc_of < hi) if n_docs > _CHUNK_DOCS else slice(None)
        k = key[m] - _U64(lo * N_PERM)
        combined = np.sort((k << _U64(44)) | (vals[m] >> _U64(20)))
        gkey = (combined >> _U64(44)).astype(np.int64)
        first = np.ones(len(gkey), dtype=bool)
        first[1:] = gkey[1:] != gkey[:-1]
        sig[gkey[first] + lo * N_PERM] = combined[first] & ((_U64(1) << _U64(44)) - _U64(1))
    sig = sig.reshape(n_docs, N_PERM)
    # rotation densification: empty bin <- next non-empty (circular)
    empty = sig == maxu
    if empty.any():
        shift = 1
        while empty.any() and shift < N_PERM:
            rolled = np.roll(sig, -shift, axis=1)
            fill = empty & (rolled != maxu)
            sig[fill] = rolled[fill]
            empty = sig == maxu
            shift += 1
    return sig


def minhash_band_rows(batch: pa.Table, column: str = "text", id_column: str = "doc_id") -> pa.Table:
    """Explode each doc into (band, band_hash, id) rows for the LSH
    groupby."""
    sig = minhash_signatures(batch.column(column))
    ids = batch.column(id_column).to_numpy(zero_copy_only=False)
    n = len(ids)
    bands = sig.reshape(n, N_BANDS, ROWS_PER_BAND)
    bh = bands[:, :, 0].copy()
    for r in range(1, ROWS_PER_BAND):
        bh = (bh * _MIX1) ^ bands[:, :, r]
    return pa.table(
        {
            "band": pa.array(np.repeat(np.arange(N_BANDS, dtype=np.int32), n)),
            "band_hash": pa.array(bh.T.reshape(-1).view(np.int64)),
            id_column: pa.array(np.tile(ids, N_BANDS)),
        }
    )


def minhash_lsh_dedup(ds, column: str = "text", id_column: str = "doc_id", num_partitions: int | None = None):
    """Near-dup removal: docs sharing any LSH band bucket collapse to
    the bucket's minimum id (single-linkage within buckets; one label-
    propagation round, which is exact when near-dup groups are bucket-
    contained — the common case at band similarity ~0.5+).

    Only (band, band_hash, id) rows move through the LSH shuffle, and
    the resulting dup-id set stays a distributed Dataset through the
    final anti-join (see _anti_join_ids) — the driver never holds an
    O(corpus) structure."""
    import pyarrow.compute as pc

    band_rows = ds.map_batches(
        lambda t: minhash_band_rows(t, column, id_column),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def bucket_losers(group: pa.Table) -> pa.Table:
        ids = group.column(id_column)
        return group.filter(pc.not_equal(ids, pc.min(ids))).select([id_column])

    dup_ids = band_rows.groupby(["band", "band_hash"]).map_groups(
        bucket_losers, batch_format="pyarrow"
    )
    return _anti_join_ids(ds, dup_ids, id_column, num_partitions)


# ------------------------------------------------------------------ simhash

def simhash_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """64-bit simhash per doc over 8-byte shingle hashes (vectorized:
    per-bit weighted sums via unpackbits + reduceat).

    Shingle windows are masked to WITHIN-document positions (same
    valid-position computation as minhash_signatures) so signatures do
    not depend on how docs are laid out in the batch. Docs shorter than
    the shingle get a whole-content hash; empty docs a fixed 0."""
    lengths, data = _text_parts(batch.column(column))
    n_docs = len(lengths)
    if n_docs == 0:
        return batch.append_column("simhash", pa.array([], type=pa.int64()))
    buf = np.frombuffer(data, dtype=np.uint8)
    lengths = lengths.astype(np.int64, copy=False)
    offs = np.concatenate(([0], np.cumsum(lengths)))
    starts = offs[:-1]
    cnts = np.maximum(lengths - 7, 0)  # windows fully inside each doc
    sh = np.zeros(n_docs, dtype=np.uint64)
    nz = np.nonzero(cnts)[0]
    if len(nz):
        padded = np.concatenate([buf, np.zeros(8, dtype=np.uint8)])
        win = np.lib.stride_tricks.sliding_window_view(padded, 8)[: max(len(buf), 1)].copy().view("<u8").ravel()
        delta = np.zeros(len(win) + 1, dtype=np.int64)
        np.add.at(delta, np.minimum(starts, len(win)), 1)
        np.add.at(delta, np.minimum(starts + cnts, len(win)), -1)
        pos = np.nonzero(np.cumsum(delta[:-1]) > 0)[0]
        hv = (win[pos] * _MIX1) ^ (win[pos] >> _U64(29))
        bits = np.unpackbits(hv.view(np.uint8).reshape(-1, 8), axis=1).astype(np.int32)  # (n_pos, 64)
        seg_starts = np.concatenate(([0], np.cumsum(cnts[nz])))[:-1]
        sums = np.add.reduceat(bits, seg_starts, axis=0)  # (len(nz), 64)
        sh_bits = (sums * 2 > cnts[nz, None]).astype(np.uint8)
        sh[nz] = np.packbits(sh_bits, axis=1).copy().view(">u8").ravel()
    short = (lengths > 0) & (cnts == 0)
    if short.any():
        sh[short] = bloom_mod.hash_bytes_columns(lengths, buf)[short]
    return batch.append_column("simhash", pa.array(sh.view(np.int64)))


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR bit-trick; numpy 1.x has no
    bitwise_count). Returns uint64 counts, same shape."""
    x = x - ((x >> _U64(1)) & _U64(0x5555555555555555))
    x = (x & _U64(0x3333333333333333)) + ((x >> _U64(2)) & _U64(0x3333333333333333))
    x = (x + (x >> _U64(4))) & _U64(0x0F0F0F0F0F0F0F0F)
    return (x * _U64(0x0101010101010101)) >> _U64(56)


def hamming_dup_ids(hashed, hash_col: str, id_column: str, max_hamming: int = 3):
    """(id, 64-bit hash) Dataset -> dup ids within `max_hamming`, via
    4x16-bit banding (hamming <= 3 guarantees one identical band by
    pigeonhole) + in-bucket hamming verify against the min id. Shared
    by simhash text dedup and perceptual image dedup (ops/multimodal).

    Hot-bucket safety: identical hashes collapse without any pairwise
    work (hamming 0), and the remaining distinct-hash verification runs
    in fixed-size row chunks so per-task temporaries stay bounded even
    when one band value captures a huge templated cluster."""
    if not 0 <= max_hamming <= 3:
        raise ValueError("4x16 banding guarantees recall only for max_hamming <= 3")

    def band_rows(batch: pa.Table) -> pa.Table:
        sh = batch.column(hash_col).to_numpy(zero_copy_only=False).view(np.uint64)
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        parts = []
        for b in range(4):
            band = ((sh >> _U64(16 * b)) & _U64(0xFFFF)).astype(np.int64)
            parts.append(
                pa.table(
                    {
                        "band": pa.array(np.full(len(ids), b, dtype=np.int32)),
                        "band_val": pa.array(band),
                        id_column: pa.array(ids),
                        hash_col: batch.column(hash_col),
                    }
                )
            )
        return pa.concat_tables(parts)

    empty = pa.table({id_column: pa.array([], type=pa.int64())})

    def bucket_verify(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return empty
        sh_all = group.column(hash_col).to_numpy(zero_copy_only=False).view(np.uint64)
        ids_all = group.column(id_column).to_numpy(zero_copy_only=False)
        # collapse identical hashes first: every id but the min per
        # distinct hash is a dup (hamming 0) — no pairwise work
        order = np.lexsort((ids_all, sh_all))
        sh_s, ids_s = sh_all[order], ids_all[order]
        first = np.ones(len(sh_s), dtype=bool)
        first[1:] = sh_s[1:] != sh_s[:-1]
        losers = [ids_s[~first]]
        reps_sh, reps_id = sh_s[first], ids_s[first]
        if len(reps_sh) > 1 and max_hamming > 0:
            o = np.argsort(reps_id)
            reps_sh, reps_id = reps_sh[o], reps_id[o]
            n = len(reps_sh)
            chunk = max(1, 4_000_000 // n)  # bound xor temp to ~32 MB
            for lo in range(0, n, chunk):
                hi = min(lo + chunk, n)
                ham = _popcount64(reps_sh[lo:hi, None] ^ reps_sh[None, :])
                near = (ham <= _U64(max_hamming)) & (reps_id[None, :] < reps_id[lo:hi, None])
                losers.append(reps_id[lo:hi][near.any(axis=1)])
        out = np.concatenate(losers) if losers else np.empty(0, dtype=np.int64)
        return pa.table({id_column: pa.array(out.astype(np.int64))})

    return hashed.map_batches(band_rows, batch_format="pyarrow").groupby(
        ["band", "band_val"]
    ).map_groups(bucket_verify, batch_format="pyarrow")


def simhash_dedup(ds, column: str = "text", id_column: str = "doc_id", max_hamming: int = 3, num_partitions: int | None = None):
    """Near-dup removal via simhash banding (hamming_dup_ids): dup ids
    stay a distributed Dataset through the final anti-join."""
    hashed = ds.map_batches(
        lambda t: simhash_batch(t, column), batch_format="pyarrow", zero_copy_batch=True
    )
    dup_ids = hamming_dup_ids(hashed, "simhash", id_column, max_hamming)
    return _anti_join_ids(ds, dup_ids, id_column, num_partitions)


# ------------------------------------------------------------------ embeddings

def embedding_dedup(
    ds,
    threshold: float = 0.99,
    column: str = "embedding",
    id_column: str = "vec_id",
    n_planes: int = 16,
    seed: int = 77,
    num_partitions: int | None = None,
):
    """Embedding-cosine near-dup removal: random-hyperplane LSH buckets
    (sign signature over `n_planes` fixed seeded planes — near-identical
    vectors collide with prob ~ (1 - theta/pi)^n), exact cosine
    verification inside buckets (chunked matmul, bounded temporaries),
    keep the minimum id. Dup ids stay a distributed Dataset through the
    final anti-join."""
    def sig_batch(batch: pa.Table) -> pa.Table:
        return _embedding_sig_rows(batch, column, id_column, n_planes, seed)

    def bucket_verify(group: pa.Table) -> pa.Table:
        return _embedding_bucket_losers(group, id_column, threshold)

    dup_ids = ds.map_batches(sig_batch, batch_format="pyarrow").groupby("sig").map_groups(
        bucket_verify, batch_format="pyarrow"
    )
    return _anti_join_ids(ds, dup_ids, id_column, num_partitions)


def _embedding_sig_rows(
    batch: pa.Table, column: str, id_column: str, n_planes: int, seed: int
) -> pa.Table:
    """(id, sig, vec) rows: hyperplane-sign LSH signature + normalized
    float32 vector (shared by batch embedding_dedup and the persisted
    embedding index)."""
    from .ann import _matrix

    mat = _matrix(batch.column(column)).astype(np.float64)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((mat.shape[1], n_planes))
    proj = mat @ planes
    bits = (proj > 0).astype(np.uint16)
    sig = np.zeros(len(mat), dtype=np.int64)
    for b in range(n_planes):
        sig |= bits[:, b].astype(np.int64) << b
    norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    vec = pa.FixedSizeListArray.from_arrays(
        pa.array(norm.astype(np.float32).ravel()), mat.shape[1] or 1
    ).cast(pa.list_(pa.float32()))  # plain list: the stripe encoder's nested path
    return pa.table({id_column: batch.column(id_column), "sig": pa.array(sig), "vec": vec})


def _embedding_bucket_losers(group: pa.Table, id_column: str, threshold: float) -> pa.Table:
    """Non-minimum ids whose cosine to a lower id in the same LSH
    bucket is >= threshold (chunked matmul, bounded temporaries)."""
    from .ann import _matrix

    empty = pa.table({id_column: pa.array([], type=pa.int64())})
    if group.num_rows < 2:
        return empty
    ids = group.column(id_column).to_numpy(zero_copy_only=False)
    o = np.argsort(ids)
    ids = ids[o]
    mat = _matrix(group.column("vec"))[o]  # zero-copy list<float> -> (n, dim)
    n = len(ids)
    chunk = max(1, 4_000_000 // n)  # bound the cos block to ~32 MB
    losers = []
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        cos = mat[lo:hi] @ mat.T
        near = (cos >= threshold) & (ids[None, :] < ids[lo:hi, None])
        losers.append(ids[lo:hi][near.any(axis=1)])
    out = np.concatenate(losers) if losers else np.empty(0, dtype=np.int64)
    return pa.table({id_column: pa.array(out.astype(np.int64))})


# ------------------------------------------------------------------ jaccard

def ngram_jaccard(a: str, b: str, n: int = 8) -> float:
    """Exact character-n-gram Jaccard (verification primitive)."""
    sa = {a[i : i + n] for i in range(max(len(a) - n + 1, 1))}
    sb = {b[i : i + n] for i in range(max(len(b) - n + 1, 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


def _shingle_hash_sets(texts, shingle: int = 8) -> list[np.ndarray]:
    """Per-doc SORTED UNIQUE `shingle`-byte-window hashes (vectorized
    shared pass; same windows/mixes/short-doc fallback as
    minhash_signatures) — exact Jaccard between two docs is then a
    linear merge over two sorted arrays."""
    lengths, data = _text_parts(texts)
    lengths = lengths.astype(np.int64, copy=False)
    n_docs = len(lengths)
    buf = np.frombuffer(data, dtype=np.uint8)
    if len(buf) == 0:
        return [np.empty(0, dtype=np.uint64)] * n_docs
    doc_of, raw = _doc_window_values(lengths, buf, shingle)
    hv = (raw * _MIX1) ^ (raw >> _U64(31))
    # global (doc, value) dedupe-sort instead of a per-doc np.unique loop
    order = np.lexsort((hv, doc_of))
    dv, hvs = doc_of[order], hv[order]
    first = np.ones(len(dv), dtype=bool)
    first[1:] = (dv[1:] != dv[:-1]) | (hvs[1:] != hvs[:-1])
    dv, hvs = dv[first], hvs[first]
    bounds = np.concatenate(([0], np.cumsum(np.bincount(dv, minlength=n_docs))))
    return [hvs[bounds[i] : bounds[i + 1]] for i in range(n_docs)]


def minhash_cc_dedup(
    ds,
    column: str = "text",
    id_column: str = "doc_id",
    num_partitions: int | None = None,
    rounds: int = 6,
):
    """TRANSITIVE near-dup removal: connected components over LSH
    bucket co-membership, so chains like A~B (bucket 1), B~C (bucket 2)
    collapse to one survivor even when no single bucket holds the whole
    cluster (single-linkage gap of minhash_lsh_dedup, ROADMAP item 5).

    Distributed bipartite label propagation over the (doc, bucket)
    edge list: each round a bucket takes the min label of its members
    and every member takes the min label of its buckets (two
    groupby-mins + two hash joins, everything stays a distributed
    Dataset; labels are monotone non-increasing). Converges in the
    doc-bucket diameter of the component — `rounds`=6 covers chains
    far beyond real near-dup clusters. Survivors = docs whose final
    label is themselves."""
    import pyarrow.compute as pc

    def edge_rows(batch: pa.Table) -> pa.Table:
        rows = minhash_band_rows(batch, column, id_column)
        bkey = (
            rows.column("band_hash").to_numpy(zero_copy_only=False).view(np.uint64)
            * _MIX1
            + rows.column("band").to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        return pa.table(
            {
                id_column: rows.column(id_column),
                "bkey": pa.array(bkey.view(np.int64)),
            }
        )

    edges = ds.map_batches(edge_rows, batch_format="pyarrow", zero_copy_batch=True).materialize()
    n_parts = num_partitions or _auto_partitions(ds)

    def _rename(cols: dict):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.select(list(cols)).rename_columns(list(cols.values()))

        return fn

    # initial label: min member id per bucket, min bucket-label per doc
    labels = None
    prev_sum = None
    for _ in range(rounds):
        if labels is None:
            member_lbl = edges.map_batches(
                _rename({id_column: id_column, "bkey": "bkey"}), batch_format="pyarrow"
            ).map_batches(
                lambda t: t.append_column("lbl", t.column(id_column)), batch_format="pyarrow"
            )
        else:
            member_lbl = edges.join(
                labels.map_batches(_rename({id_column: "l_id", "lbl": "lbl"}), batch_format="pyarrow"),
                join_type="inner",
                num_partitions=n_parts,
                on=(id_column,),
                right_on=("l_id",),
            )
        bucket_lbl = member_lbl.groupby("bkey").min("lbl").map_batches(
            _rename({"bkey": "b_id", "min(lbl)": "b_lbl"}), batch_format="pyarrow"
        )
        joined = edges.join(
            bucket_lbl, join_type="inner", num_partitions=n_parts, on=("bkey",), right_on=("b_id",)
        )
        labels = (
            joined.groupby(id_column)
            .min("b_lbl")
            .map_batches(_rename({id_column: id_column, "min(b_lbl)": "lbl"}), batch_format="pyarrow")
            .materialize()
        )
        # labels are monotone non-increasing, so an unchanged sum means
        # a fixpoint — real near-dup clusters converge in 1-2 rounds
        cur_sum = labels.sum("lbl")
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    def losers(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(batch.column(id_column), batch.column("lbl"))
        return batch.filter(keep).select([id_column])

    dup_ids = labels.map_batches(losers, batch_format="pyarrow")
    return _anti_join_ids(ds, dup_ids, id_column, num_partitions)


JACCARD_SKETCH_K = 256  # bottom-k shingle hashes per doc (2 KB payload)

_SENTINEL_BASE = _U64(0xFFFFFFFFFFFFFFFF)


def _sketch_matrix(col: pa.ChunkedArray | pa.Array, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(n, k) uint64 matrix + per-row lengths from a list<uint64> sketch
    column, built from the flattened values buffer (no per-row python
    conversion — r2 VERDICT item 3). Unused slots are zero; callers
    mask by length."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.uint64, copy=False)
    lens = np.diff(offs)
    n = len(lens)
    mat = np.zeros((n, k), dtype=np.uint64)
    rowidx = np.repeat(np.arange(n), lens)
    colidx = np.arange(len(rowidx), dtype=np.int64) - np.repeat(offs[:-1] - offs[0], lens)
    mat[rowidx, colidx] = flat
    return mat, lens


def _bottomk_jaccard_block(
    a: np.ndarray, la: int, B: np.ndarray, lb: np.ndarray, k: int, chunk_rows: int = 8192
) -> np.ndarray:
    """Bottom-k Jaccard estimate of one sketch `a` (sorted unique, `la`
    valid slots) vs a block of sketches `B` ((m,k), lengths `lb`), fully
    vectorized: rows of the (m, 2k) merged sort carry the union; equal
    adjacent pairs are intersection elements (each side's values are
    unique); the estimate is |A∩B restricted to the d smallest union
    values| / d with d = min(k, |A∪B|). Unused slots are filled with
    per-slot sentinels (even offsets for `a`, odd for `B`) so padding
    never fakes a match. Exact when both docs have <= k distinct
    shingles. Memory bounded by `chunk_rows` (~32 MB per chunk)."""
    m = len(B)
    slots = np.arange(k, dtype=np.uint64)
    a_row = np.where(slots < _U64(la), a, _SENTINEL_BASE - _U64(2) * slots)
    b_pad = _SENTINEL_BASE - _U64(2) * slots - _U64(1)
    out = np.empty(m, dtype=np.float64)
    for lo in range(0, m, chunk_rows):
        hi = min(lo + chunk_rows, m)
        Bc = np.where(slots[None, :] < lb[lo:hi, None].astype(np.uint64), B[lo:hi], b_pad[None, :])
        s = np.sort(np.concatenate([np.broadcast_to(a_row, (hi - lo, k)), Bc], axis=1), axis=1)
        dup = s[:, 1:] == s[:, :-1]  # intersection elements (sentinels never collide)
        new = np.ones_like(s, dtype=bool)
        new[:, 1:] = ~dup
        ranks = np.cumsum(new, axis=1)
        inter_total = dup.sum(axis=1)
        d = np.maximum(np.minimum(k, la + lb[lo:hi] - inter_total), 1)
        pos_d = np.argmax(ranks == d[:, None], axis=1)  # index of the d-th distinct value
        v = s[np.arange(hi - lo), pos_d]
        inter_bottom = (dup & (s[:, 1:] <= v[:, None])).sum(axis=1)
        est = inter_bottom / d
        # two empty docs are identical (matches ngram_jaccard's 1.0)
        out[lo:hi] = np.where(la + lb[lo:hi] == 0, 1.0, est)
    return out


def jaccard_dedup(
    ds,
    threshold: float = 0.8,
    column: str = "text",
    id_column: str = "doc_id",
    num_partitions: int | None = None,
):
    """Near-dup removal with n-gram-Jaccard VERIFICATION of MinHash-LSH
    candidates: band buckets propose candidates, a bottom-k shingle
    sketch (k smallest distinct hashes, bounded 2 KB/doc — the text
    itself never enters the shuffle) confirms via the bottom-k Jaccard
    estimator (EXACT when a doc has <= k distinct shingles), losers
    anti-join away. One keyed shuffle carrying (band, hash, id,
    sketch); same scale shape as minhash_lsh_dedup with the LSH false
    positives removed."""
    k = JACCARD_SKETCH_K

    def band_rows_with_sketch(batch: pa.Table) -> pa.Table:
        rows = minhash_band_rows(batch, column, id_column)
        sets = [s[:k] for s in _shingle_hash_sets(batch.column(column))]
        lens = np.fromiter((len(s) for s in sets), dtype=np.int64, count=len(sets))
        values = np.concatenate(sets) if sets else np.empty(0, dtype=np.uint64)
        sk = pa.ListArray.from_arrays(
            pa.array(np.concatenate(([0], np.cumsum(lens))), type=pa.int32()),
            pa.array(values, type=pa.uint64()),
        )
        return rows.append_column("sketch", pa.concat_arrays([sk] * N_BANDS))

    band_rows = ds.map_batches(band_rows_with_sketch, batch_format="pyarrow", zero_copy_batch=True)

    empty = pa.table({id_column: pa.array([], type=pa.int64())})

    def bucket_verify(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return empty
        ids = group.column(id_column).to_numpy(zero_copy_only=False)
        o = np.argsort(ids)
        ids = ids[o]
        mat, lens = _sketch_matrix(group.column("sketch"), k)
        mat, lens = mat[o], lens[o]
        # greedy clustering by representative: members near the current
        # min-id rep are its dups; survivors seed the next rep — chains
        # that merely share a bucket with the min id no longer force a
        # pairwise pass against sets[0] only (r2 VERDICT item 3)
        losers_parts = []
        remaining = np.arange(len(ids))
        while len(remaining) > 1:
            rep, members = remaining[0], remaining[1:]
            est = _bottomk_jaccard_block(mat[rep], int(lens[rep]), mat[members], lens[members], k)
            dup = est >= threshold
            losers_parts.append(ids[members[dup]])
            remaining = members[~dup]
        out = np.concatenate(losers_parts) if losers_parts else np.empty(0, dtype=np.int64)
        if len(out) == 0:
            return empty
        return pa.table({id_column: pa.array(np.sort(out).astype(np.int64))})

    dup_ids = band_rows.groupby(["band", "band_hash"]).map_groups(
        bucket_verify, batch_format="pyarrow"
    )
    return _anti_join_ids(ds, dup_ids, id_column, num_partitions)


# ------------------------------------------------- ingest-time exact dedup

_EXACT_BLOOM = "_exact_bloom.bin"


def _hash_keys(ds, column: str, id_column: str | None = None):
    cols = [column] if id_column is None else [id_column, column]
    keep = ["h1", "h2"] if id_column is None else ["h1", "h2", id_column]

    def key_rows(batch: pa.Table) -> pa.Table:
        return content_hash_batch(batch.select(cols), column).select(keep)

    return ds.map_batches(key_rows, batch_format="pyarrow", zero_copy_batch=True)


def _h1_string_parts(h1_col):
    """(lengths, bytes) view of h1 cast to decimal strings — the same
    form join.build_key_bloom hashes, so gate checks are bit-exact."""
    import pyarrow.compute as pc

    from .. import column as column_mod

    s = pc.cast(h1_col, pa.string())
    s = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
    return column_mod._string_parts_view(s)


def build_exact_index(ds, out_dir: str, column: str = "text", opts: dict | None = None) -> dict:
    """Persisted exact-duplicate index for INGEST-time dedup: the
    corpus's (h1, h2) full-content hashes sorted by h1 and encoded with
    the engine's writer (the sort gives every stripe a tight h1 zone
    map), plus an OR-merged bloom over h1 stored alongside. Corpus text
    never moves — only 16-byte hash rows go through one sort."""
    import os

    from .. import pipeline
    from . import join as join_ops

    keys = _hash_keys(ds, column).sort("h1")
    pipeline.write_encoded(pipeline.encode_dataset(keys, opts), out_dir)
    dec = pipeline.decode_dataset(pipeline.read_encoded(out_dir))
    blm = join_ops.build_key_bloom(dec, "h1")
    with open(os.path.join(out_dir, _EXACT_BLOOM), "wb") as f:
        f.write(blm)
    return {"n_docs": int(ds.count()), "bloom_bytes": len(blm)}


def append_exact_index(ds, index_dir: str, column: str = "text", opts: dict | None = None) -> dict:
    """Add newly-ingested docs' hashes to an existing index as another
    sorted run (per-file zone maps keep probes pruned) and OR their
    bits into the stored bloom (geometry fixed at build time — fpp
    degrades gradually as the corpus outgrows it; rebuild to re-size)."""
    import os

    from .. import bloom as bloom_mod
    from .. import pipeline

    keys = _hash_keys(ds, column).sort("h1")
    before = set(os.listdir(index_dir))
    pipeline.write_encoded(pipeline.encode_dataset(keys, opts), index_dir)
    new_files = [
        os.path.join(index_dir, f)
        for f in sorted(set(os.listdir(index_dir)) - before)
        if f.endswith(".parquet")
    ]
    with open(os.path.join(index_dir, _EXACT_BLOOM), "rb") as f:
        blm = f.read()
    num_bits = int.from_bytes(blm[0:8], "little")
    k = int.from_bytes(blm[8:16], "little")
    bits = np.frombuffer(blm, dtype=np.uint8, offset=16).copy()
    if new_files:
        dec = pipeline.decode_dataset(pipeline.read_encoded(new_files))

        def partial(batch: pa.Table) -> pa.Table:
            lengths, data = _h1_string_parts(batch.column("h1"))
            b = bloom_mod.partial_bits(lengths, data, num_bits, k)
            return pa.table({"bits": pa.array([b.tobytes()], type=pa.binary())})

        for bt in dec.map_batches(partial, batch_format="pyarrow").take_all():
            bits |= np.frombuffer(bt["bits"], dtype=np.uint8)
    with open(os.path.join(index_dir, _EXACT_BLOOM), "wb") as f:
        f.write(bloom_mod.assemble(bits, num_bits, k))
    return {"appended": int(ds.count())}


def ingest_dedup(
    new_ds,
    index_dir: str,
    column: str = "text",
    id_column: str = "doc_id",
    num_partitions: int | None = None,
):
    """Drop new docs whose content ALREADY EXISTS in the indexed corpus,
    plus exact duplicates within the batch (lowest id wins) — the
    dedup-at-ingest step of a continuously-growing corpus, without
    rescanning corpus text.

    Scale shape (ingest batch << corpus):
      1. (h1, h2, id) per new doc — 24 B rows, batch-sized.
      2. One groupby handles in-batch dups; group winners continue.
      3. Bloom gate (bytes broadcast via ray.put): definitely-new docs
         pass instantly; candidates = real dups + ~fpp of the batch.
      4. Candidate hashes come to the driver (bounded by the ingest
         batch, NOT the corpus) and prune the sorted index by stripe
         zone maps — blob bytes read ∝ candidate-overlapping stripes.
      5. Matches broadcast back; seen ids + in-batch losers anti-join
         against the batch (text moves only through that final join).
    """
    import json as _json
    import os

    import pyarrow.compute as pc
    import ray

    from .. import pipeline

    keys = _hash_keys(new_ds, column, id_column)

    def split_group(group: pa.Table) -> pa.Table:
        ids = group.column(id_column)
        win = pc.equal(ids, pc.min(ids))
        return group.append_column("__winner", win)

    tagged = keys.groupby(["h1", "h2"]).map_groups(split_group, batch_format="pyarrow")
    tagged = tagged.materialize()  # two consumers: losers + winners

    def only_losers(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("__winner"), False)).select([id_column])

    losers_in = tagged.map_batches(only_losers, batch_format="pyarrow", zero_copy_batch=True)

    with open(os.path.join(index_dir, _EXACT_BLOOM), "rb") as f:
        blm = f.read()
    blm_ref = ray.put(blm)

    def gate(batch: pa.Table) -> pa.Table:
        b = ray.get(blm_ref)
        w = batch.filter(pc.equal(batch.column("__winner"), True))
        if w.num_rows == 0:
            return w.select(["h1", "h2", id_column])
        lengths, data = _h1_string_parts(w.column("h1"))
        mask = bloom_mod.might_contain_buffers(b, lengths, data)
        return w.filter(pa.array(mask)).select(["h1", "h2", id_column])

    cand = tagged.map_batches(gate, batch_format="pyarrow").take_all()
    seen_ids: list = []
    if cand:
        cand_h1 = np.sort(np.array([r["h1"] for r in cand], dtype=np.int64))
        by_h1: dict = {}
        for r in cand:
            by_h1.setdefault(r["h1"], []).append((r["h2"], r[id_column]))

        meta = pipeline.read_encoded(index_dir, metadata_only=True, include_paths=True)

        def keep(batch: pa.Table) -> pa.Table:
            mask = np.zeros(batch.num_rows, dtype=bool)
            for i, sj in enumerate(batch.column("stats").to_pylist()):
                st = _json.loads(sj).get("h1", {})
                lo, hi = st.get("min"), st.get("max")
                if lo is None or hi is None:
                    mask[i] = True
                    continue
                j = np.searchsorted(cand_h1, lo)
                mask[i] = j < len(cand_h1) and cand_h1[j] <= hi
            return batch.filter(pa.array(mask))

        fetched = meta.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True).map_batches(
            pipeline._FetchStripes(), batch_format="pyarrow"
        )

        def match(batch: pa.Table) -> pa.Table:
            h1 = batch.column("h1").to_numpy(zero_copy_only=False)
            h2 = batch.column("h2").to_numpy(zero_copy_only=False)
            hit = np.isin(h1, cand_h1)
            out = []
            for a, b2 in zip(h1[hit].tolist(), h2[hit].tolist()):
                for ch2, _cid in by_h1.get(a, ()):
                    if ch2 == b2:
                        out.append((a, b2))
            return pa.table(
                {
                    "h1": pa.array([x for x, _ in out], pa.int64()),
                    "h2": pa.array([y for _, y in out], pa.int64()),
                }
            )

        seen_pairs = {
            (r["h1"], r["h2"])
            for r in pipeline.decode_dataset(fetched).map_batches(
                match, batch_format="pyarrow", zero_copy_batch=True
            ).take_all()
        }
        seen_ids = [
            cid
            for h1v, h2v in seen_pairs
            for ch2, cid in by_h1.get(h1v, ())
            if ch2 == h2v
        ]

    import ray.data as rd

    # take the id type from the (already materialized) tagged schema, not
    # from seen_ids[0]: with no corpus match seen_ids is empty and a
    # guessed int64 would union a mistyped empty table against string
    # loser ids in the downstream anti-join
    sch = tagged.schema()
    id_type = dict(zip(sch.names, sch.types))[id_column]
    seen_tbl = pa.table({id_column: pa.array(seen_ids, id_type)})
    dup = losers_in.union(rd.from_arrow(seen_tbl))
    return _anti_join_ids(new_ds, dup, id_column, num_partitions)


# --------------------------------------------- ingest-time minhash near-dup

_MINHASH_BLOOM = "_minhash_bloom.bin"


def _combined_band_hashes(batch: pa.Table, column: str, id_column: str | None) -> pa.Table:
    """(bh, [id]) rows: band index folded into the band hash so the
    whole LSH key space is ONE sorted int64 column."""
    rows = minhash_band_rows(
        batch if id_column else batch.append_column("__rid", pa.array(np.arange(batch.num_rows))),
        column,
        id_column or "__rid",
    )
    band = rows.column("band").to_numpy(zero_copy_only=False).astype(np.uint64)
    bh = rows.column("band_hash").to_numpy(zero_copy_only=False).view(np.uint64)
    combined = bloom_mod._mix((band << _U64(56)) ^ bh)
    out = {"bh": pa.array(combined.view(np.int64))}
    if id_column:
        out[id_column] = rows.column(id_column)
    return pa.table(out)


def build_minhash_index(ds, out_dir: str, column: str = "text", opts: dict | None = None) -> dict:
    """Persisted LSH band index for INGEST-time near-dup dedup: every
    corpus doc's 16 combined band hashes, distinct + sorted + encoded
    (tight per-stripe bh zone maps), plus an OR-merged bloom. Matches
    minhash_lsh_dedup's semantics — sharing any band bucket with the
    corpus marks a new doc as a near-duplicate."""
    import os

    from .. import pipeline
    from . import join as join_ops

    def rows(batch: pa.Table) -> pa.Table:
        t = _combined_band_hashes(batch, column, None)
        return t.group_by("bh", use_threads=False).aggregate([])

    bh = (
        ds.map_batches(rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bh")
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        .sort("bh")
    )
    pipeline.write_encoded(pipeline.encode_dataset(bh, opts), out_dir)
    dec = pipeline.decode_dataset(pipeline.read_encoded(out_dir))
    blm = join_ops.build_key_bloom(dec, "bh")
    with open(os.path.join(out_dir, _MINHASH_BLOOM), "wb") as f:
        f.write(blm)
    return {"n_band_hashes": int(dec.count()), "bloom_bytes": len(blm)}


def ingest_minhash_dedup(
    new_ds,
    index_dir: str,
    column: str = "text",
    id_column: str = "doc_id",
    num_partitions: int | None = None,
):
    """Near-dup-at-ingest: drop new docs that share any LSH band bucket
    with the indexed corpus, then collapse in-batch bucket collisions
    to the lowest id (exactly minhash_lsh_dedup's single-linkage
    semantics) — no corpus text or corpus band rows are rescanned.

    Same bounded-candidate shape as ingest_dedup: the bloom gate keeps
    only colliding-or-false-positive band hashes, those prune the
    sorted index by stripe zone maps, and confirmed hashes broadcast
    back into the drop set."""
    import json as _json
    import os

    import pyarrow.compute as pc
    import ray

    from .. import pipeline

    band_rows = new_ds.map_batches(
        lambda t: _combined_band_hashes(t, column, id_column),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()  # consumed by gate + in-batch dedup

    with open(os.path.join(index_dir, _MINHASH_BLOOM), "rb") as f:
        blm = f.read()
    blm_ref = ray.put(blm)

    def gate(batch: pa.Table) -> pa.Table:
        b = ray.get(blm_ref)
        if batch.num_rows == 0:
            return batch.select(["bh"])
        lengths, data = _h1_string_parts(batch.column("bh"))
        mask = bloom_mod.might_contain_buffers(b, lengths, data)
        t = batch.filter(pa.array(mask)).select(["bh"])
        return t.group_by("bh", use_threads=False).aggregate([])

    cand = sorted({r["bh"] for r in band_rows.map_batches(gate, batch_format="pyarrow").take_all()})
    seen_bh: set = set()
    if cand:
        cand_arr = np.array(cand, dtype=np.int64)
        meta = pipeline.read_encoded(index_dir, metadata_only=True, include_paths=True)

        def keep(batch: pa.Table) -> pa.Table:
            mask = np.zeros(batch.num_rows, dtype=bool)
            for i, sj in enumerate(batch.column("stats").to_pylist()):
                st = _json.loads(sj).get("bh", {})
                lo, hi = st.get("min"), st.get("max")
                if lo is None or hi is None:
                    mask[i] = True
                    continue
                j = np.searchsorted(cand_arr, lo)
                mask[i] = j < len(cand_arr) and cand_arr[j] <= hi
            return batch.filter(pa.array(mask))

        fetched = meta.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True).map_batches(
            pipeline._FetchStripes(), batch_format="pyarrow"
        )

        def match(batch: pa.Table) -> pa.Table:
            v = batch.column("bh").to_numpy(zero_copy_only=False)
            hit = v[np.isin(v, cand_arr)]
            return pa.table({"bh": pa.array(hit)})

        seen_bh = {
            r["bh"]
            for r in pipeline.decode_dataset(fetched)
            .map_batches(match, batch_format="pyarrow", zero_copy_batch=True)
            .take_all()
        }

    seen_ref = ray.put(np.array(sorted(seen_bh), dtype=np.int64))

    def corpus_dups(batch: pa.Table) -> pa.Table:
        seen = ray.get(seen_ref)
        v = batch.column("bh").to_numpy(zero_copy_only=False)
        hit = np.isin(v, seen)
        return batch.filter(pa.array(hit)).select([id_column])

    corpus_dup_ids = band_rows.map_batches(
        corpus_dups, batch_format="pyarrow", zero_copy_batch=True
    )

    def bucket_losers(group: pa.Table) -> pa.Table:
        ids = group.column(id_column)
        return group.filter(pc.not_equal(ids, pc.min(ids))).select([id_column])

    in_batch = band_rows.groupby("bh").map_groups(bucket_losers, batch_format="pyarrow")
    return _anti_join_ids(new_ds, corpus_dup_ids.union(in_batch), id_column, num_partitions)


# ------------------------------------------- ingest-time simhash near-dup


def _simhash_band_keys(batch: pa.Table, column: str, id_column: str | None) -> pa.Table:
    """(bkey, simhash[, id]) rows — 4 per doc: the 16-bit band value
    folded with its band index into ONE int64 key, so probe assignment
    and bucket grouping run over a single sorted column."""
    t = simhash_batch(batch, column)
    sh = t.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
    parts = []
    for b in range(4):
        band_val = (sh >> _U64(16 * b)) & _U64(0xFFFF)
        bkey = ((_U64(b) << _U64(16)) | band_val).astype(np.int64)
        cols = {"bkey": pa.array(bkey), "simhash": t.column("simhash")}
        if id_column:
            cols[id_column] = batch.column(id_column)
        parts.append(pa.table(cols))
    return pa.concat_tables(parts)


def build_simhash_index(ds, out_dir: str, column: str = "text", opts: dict | None = None) -> dict:
    """Persisted simhash band index for INGEST-time near-dup dedup:
    distinct (bkey, simhash) pairs of the whole corpus, SORTED by bkey
    and encoded — each stripe's zone map is a tight contiguous bkey
    range, which is what the co-partitioned probe shuffles against.

    Deliberately NO bloom gate (contrast build_minhash_index): simhash
    bands are 16-bit, so any real corpus occupies every band value and
    a membership gate would pass everything (ROADMAP round-3 note).
    The scale story is the probe shape instead: new rows shuffle to the
    stripes whose bkey range covers them, and verification is in-task
    hamming against co-located corpus rows."""
    from .. import pipeline

    def rows(batch: pa.Table) -> pa.Table:
        t = _simhash_band_keys(batch, column, None)
        return t.group_by(["bkey", "simhash"], use_threads=False).aggregate([])

    bi = (
        ds.map_batches(rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["bkey", "simhash"])
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        .sort(["bkey", "simhash"])
    )
    pipeline.write_encoded(pipeline.encode_dataset(bi, opts), out_dir)
    n = pipeline.read_encoded(out_dir, metadata_only=True).sum("n_rows")
    return {"n_band_rows": int(n or 0)}


def ingest_simhash_dedup(
    new_ds,
    index_dir: str,
    column: str = "text",
    id_column: str = "doc_id",
    max_hamming: int = 3,
    num_partitions: int | None = None,
):
    """Near-dup-at-ingest via the CO-PARTITIONED PROBE (ROADMAP design):
    drop new docs within hamming<=max_hamming of any indexed corpus doc
    (pigeonhole over 4x16-bit bands, simhash_dedup's exact semantics),
    plus in-batch near-dups (lowest id wins) — corpus text is never
    rescanned and no corpus rows move.

    Scale shape (ingest batch << corpus):
      1. (bkey, simhash, id) per new doc — 4 rows x ~20 B, batch-sized.
      2. The index's per-stripe bkey zone maps come to the driver
         (O(stripes), metadata only) and broadcast as sorted ranges.
      3. Each new row maps to the stripe(s) covering its bkey
         (searchsorted; usually 1, 2 at a boundary) and the groupby
         SHUFFLES ONLY BATCH-SIDE ROWS to those stripe ids.
      4. One task per probed stripe: fetch + decode that stripe's
         (bkey, simhash) rows, vectorized chunked hamming against the
         group's rows, matched ids out. Blob bytes read scale with
         DISTINCT PROBED STRIPES, not the corpus — though 16-bit bands
         mean a large ingest batch probes most stripes (inherent to
         simhash banding; the verify is SIMD xor+popcount, not text).
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from .. import pipeline
    from .. import stripe as stripe_mod

    band_rows = new_ds.map_batches(
        lambda t: _simhash_band_keys(t, column, id_column),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()  # consumed by the probe AND the in-batch pass

    # --- stripe bkey ranges: metadata only, O(stripes) driver rows ---
    import json as _json

    meta_rows = pipeline.read_encoded(
        index_dir, metadata_only=True, include_paths=True
    ).take_all()
    infos, unbounded = [], []
    for r in meta_rows:
        st = _json.loads(r["stats"]).get("bkey", {})
        lo, hi = st.get("min"), st.get("max")
        if lo is None or hi is None:
            # stats-less stripe (shouldn't happen for the index we
            # build, but a foreign/partial index must not break the
            # sorted-range invariant searchsorted relies on): probe it
            # for EVERY row instead
            unbounded.append((r["path"], r["stripe_key"]))
        else:
            infos.append((lo, hi, r["path"], r["stripe_key"]))
    infos.sort(key=lambda x: (x[0], x[1]))
    lo_arr = np.array([x[0] for x in infos], dtype=np.int64)
    hi_arr = np.array([x[1] for x in infos], dtype=np.int64)
    if len(hi_arr) > 1 and not (hi_arr[1:] >= hi_arr[:-1]).all():
        # OVERLAPPING ranges (a foreign index assembled from several
        # separately sorted builds interleaves): searchsorted's cover
        # window would be wrong and near-dups would pass as new. Fall
        # back to probing every stripe for every row — correct, slower,
        # and only reachable for indexes this module didn't build.
        unbounded = [(x[2], x[3]) for x in infos] + unbounded
        infos = []
        lo_arr = np.array([], dtype=np.int64)
        hi_arr = np.array([], dtype=np.int64)
    n_bounded = len(infos)
    stripes_ref = ray.put([(x[2], x[3]) for x in infos] + unbounded)

    n_unbounded = len(unbounded)

    def assign(batch: pa.Table) -> pa.Table:
        """Emit one (stripe_idx, bkey, simhash, id) row per covering
        stripe (plus one per stats-less stripe, probed unconditionally);
        rows no stripe covers are definitely new."""
        if batch.num_rows == 0 or (len(lo_arr) == 0 and n_unbounded == 0):
            return pa.table(
                {
                    "stripe_idx": pa.array([], pa.int64()),
                    "bkey": pa.array([], pa.int64()),
                    "simhash": pa.array([], pa.int64()),
                    id_column: pa.array([], batch.schema.field(id_column).type),
                }
            )
        bk = batch.column("bkey").to_numpy(zero_copy_only=False)
        # covering stripes = [first with hi >= bkey, first with lo > bkey)
        if len(lo_arr):
            start = np.searchsorted(hi_arr, bk, side="left")
            end = np.searchsorted(lo_arr, bk, side="right")
            counts = np.maximum(end - start, 0) + n_unbounded
        else:
            start = np.zeros(len(bk), dtype=np.int64)
            counts = np.full(len(bk), n_unbounded, dtype=np.int64)
        total = int(counts.sum())
        if total == 0:
            return pa.table(
                {
                    "stripe_idx": pa.array([], pa.int64()),
                    "bkey": pa.array([], pa.int64()),
                    "simhash": pa.array([], pa.int64()),
                    id_column: pa.array([], batch.column(id_column).type),
                }
            )
        row_idx = np.repeat(np.arange(len(bk)), counts)
        cum = np.cumsum(counts)
        # per-row offsets 0..counts-1: the first (end-start) map to the
        # covering bounded stripes, the tail to the stats-less stripes
        # (indices n_bounded..) probed unconditionally
        o = np.arange(total) - np.repeat(cum - counts, counts)
        brep = np.repeat(counts - n_unbounded, counts)
        sidx = np.where(
            o < brep, np.repeat(start, counts) + o, n_bounded + (o - brep)
        )
        keep = pa.array(row_idx)
        return pa.table(
            {
                "stripe_idx": pa.array(sidx),
                "bkey": batch.column("bkey").take(keep),
                "simhash": batch.column("simhash").take(keep),
                id_column: batch.column(id_column).take(keep),
            }
        )

    probe = band_rows.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)

    def verify(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({id_column: pa.array([], group.schema.field(id_column).type)})
        # group-level scalars via numpy/pylist — a module-wide pytest
        # guard bans the per-row scalar-conversion idiom entirely so
        # per-ROW fallbacks can't creep in
        si = int(group.column("stripe_idx").to_numpy(zero_copy_only=False)[0])
        path, skey = ray.get(stripes_ref)[si]
        pf = pq.ParquetFile(path)
        row = None
        for rg in range(pf.num_row_groups):
            kcol = pf.read_row_group(rg, columns=["stripe_key"]).column("stripe_key")
            mask = pc.equal(kcol, skey)
            if bool(pc.any(mask).equals(pa.scalar(True))):
                t = pf.read_row_group(rg).filter(mask)
                row = {
                    name: (
                        memoryview(t.column(name)[0].as_buffer()).cast("B")
                        if name in ("blob", "blooms")
                        else t.column(name).to_pylist()[0]
                    )
                    for name in t.column_names
                }
                break
        if row is None:  # stale metadata: stripe gone — conservative keep
            return pa.table({id_column: pa.array([], group.schema.field(id_column).type)})
        corpus = stripe_mod.decode_stripe(row, ["bkey", "simhash"])
        cb = corpus.column("bkey").to_numpy(zero_copy_only=False)
        cs = corpus.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
        if len(cb) > 1 and not (cb[1:] >= cb[:-1]).all():  # belt+braces
            o = np.argsort(cb, kind="stable")
            cb, cs = cb[o], cs[o]
        nb = group.column("bkey").to_numpy(zero_copy_only=False)
        ns = group.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
        lo = np.searchsorted(cb, nb, side="left")
        hi = np.searchsorted(cb, nb, side="right")
        counts = hi - lo
        hit_rows = np.zeros(len(nb), dtype=bool)
        # chunk the expanded (new x bucket) pairs to bound temporaries
        todo = np.nonzero(counts)[0]
        pair_budget = 8_000_000
        i = 0
        while i < len(todo):
            j, pairs = i, 0
            while j < len(todo) and (pairs == 0 or pairs + counts[todo[j]] <= pair_budget):
                pairs += counts[todo[j]]
                j += 1
            sel = todo[i:j]
            c = counts[sel]
            doc_rep = np.repeat(sel, c)
            cum = np.cumsum(c)
            pos = np.arange(int(c.sum())) - np.repeat(cum - c, c) + np.repeat(lo[sel], c)
            ham = _popcount64(cs[pos] ^ ns[doc_rep])
            hit_rows[np.unique(doc_rep[ham <= _U64(max_hamming)])] = True
            i = j
        keep_idx = np.nonzero(hit_rows)[0]
        return pa.table({id_column: group.column(id_column).take(pa.array(keep_idx))})

    corpus_dup_ids = probe.groupby("stripe_idx").map_groups(verify, batch_format="pyarrow")

    def in_batch_losers(group: pa.Table) -> pa.Table:
        """simhash_dedup's bucket_verify semantics on the NEW batch:
        within a band bucket, ids near a lower id (hamming<=max) lose."""
        id_t = group.schema.field(id_column).type
        if group.num_rows < 2:
            return pa.table({id_column: pa.array([], id_t)})
        sh = group.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
        ids = group.column(id_column).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, sh))
        sh_s, ids_s, pos_s = sh[order], ids[order], np.asarray(order)
        first = np.ones(len(sh_s), dtype=bool)
        first[1:] = sh_s[1:] != sh_s[:-1]
        loser_pos = [pos_s[~first]]
        reps_sh, reps_id, reps_pos = sh_s[first], ids_s[first], pos_s[first]
        if len(reps_sh) > 1 and max_hamming > 0:
            o = np.argsort(reps_id, kind="stable")
            reps_sh, reps_id, reps_pos = reps_sh[o], reps_id[o], reps_pos[o]
            n = len(reps_sh)
            chunk = max(1, 4_000_000 // n)
            for s in range(0, n, chunk):
                e = min(s + chunk, n)
                ham = _popcount64(reps_sh[s:e, None] ^ reps_sh[None, :])
                near = (ham <= _U64(max_hamming)) & (np.arange(n)[None, :] < np.arange(s, e)[:, None])
                loser_pos.append(reps_pos[s:e][near.any(axis=1)])
        out = np.concatenate(loser_pos) if loser_pos else np.empty(0, dtype=np.int64)
        return pa.table({id_column: group.column(id_column).take(pa.array(out.astype(np.int64)))})

    in_batch = band_rows.groupby("bkey").map_groups(in_batch_losers, batch_format="pyarrow")
    return _anti_join_ids(new_ds, corpus_dup_ids.union(in_batch), id_column, num_partitions)


# ------------------------------------------- ingest-time embedding near-dup

_EMB_BLOOM = "_embedding_bloom.bin"
_EMB_META = "_embedding_meta.json"


def build_embedding_index(
    ds,
    out_dir: str,
    column: str = "embedding",
    id_column: str = "vec_id",
    n_planes: int = 16,
    seed: int = 77,
    opts: dict | None = None,
) -> dict:
    """Persisted embedding near-dup index: (sig, id, normalized vec)
    rows sorted by hyperplane-LSH signature and encoded (tight per-
    stripe sig zone maps), plus an OR-merged bloom over sig and a meta
    JSON pinning the plane geometry (n_planes, seed) so ingest batches
    hash identically."""
    import json
    import os

    from .. import pipeline
    from . import join as join_ops

    rows = ds.map_batches(
        lambda b: _embedding_sig_rows(b, column, id_column, n_planes, seed),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).sort("sig")
    pipeline.write_encoded(pipeline.encode_dataset(rows, opts), out_dir)
    dec = pipeline.decode_dataset(pipeline.read_encoded(out_dir))
    blm = join_ops.build_key_bloom(dec.select_columns(["sig"]), "sig")
    with open(os.path.join(out_dir, _EMB_BLOOM), "wb") as f:
        f.write(blm)
    with open(os.path.join(out_dir, _EMB_META), "w") as f:
        json.dump({"n_planes": n_planes, "seed": seed, "column": column}, f)
    return {"n_vectors": int(ds.count()), "bloom_bytes": len(blm)}


def ingest_embedding_dedup(
    new_ds,
    index_dir: str,
    threshold: float = 0.99,
    column: str = "embedding",
    id_column: str = "vec_id",
    num_partitions: int | None = None,
):
    """Embedding near-dup-at-ingest: drop new vectors whose cosine to
    any indexed corpus vector in the same LSH bucket is >= threshold
    (EXACT verification — unlike the band-collision minhash path), plus
    in-batch bucket near-dups (lowest id wins, embedding_dedup
    semantics). Corpus vectors are fetched only for stripes whose sig
    zone maps overlap the bloom-gated candidate signatures; candidate
    vectors broadcast once (bounded by collisions + fpp of the batch,
    never the corpus)."""
    import json as _json
    import os

    import ray

    from .. import pipeline
    from .ann import _matrix

    with open(os.path.join(index_dir, _EMB_META)) as f:
        meta = _json.load(f)
    n_planes, seed = meta["n_planes"], meta["seed"]

    rows = new_ds.map_batches(
        lambda b: _embedding_sig_rows(b, column, id_column, n_planes, seed),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()  # consumed by in-batch dedup + gate + candidate fetch

    in_batch = rows.groupby("sig").map_groups(
        lambda g: _embedding_bucket_losers(g, id_column, threshold), batch_format="pyarrow"
    )

    with open(os.path.join(index_dir, _EMB_BLOOM), "rb") as f:
        blm = f.read()
    blm_ref = ray.put(blm)

    def gate(batch: pa.Table) -> pa.Table:
        b = ray.get(blm_ref)
        if batch.num_rows == 0:
            return batch
        lengths, data = _h1_string_parts(batch.column("sig"))
        mask = bloom_mod.might_contain_buffers(b, lengths, data)
        return batch.filter(pa.array(mask))

    cand_rows = rows.map_batches(gate, batch_format="pyarrow").take_all()
    seen_ids: list = []
    if cand_rows:
        by_sig: dict = {}
        for r in cand_rows:
            by_sig.setdefault(r["sig"], []).append(r)
        cand_sigs = np.array(sorted(by_sig), dtype=np.int64)
        # pack candidate vectors per sig for the in-task verify
        packed = {
            s: (
                np.array([r[id_column] for r in rs], dtype=np.int64),
                np.stack([np.asarray(r["vec"], dtype=np.float32) for r in rs]),
            )
            for s, rs in by_sig.items()
        }
        packed_ref = ray.put(packed)
        meta_ds = pipeline.read_encoded(index_dir, metadata_only=True, include_paths=True)

        def keep(batch: pa.Table) -> pa.Table:
            mask = np.zeros(batch.num_rows, dtype=bool)
            for i, sj in enumerate(batch.column("stats").to_pylist()):
                st = _json.loads(sj).get("sig", {})
                lo, hi = st.get("min"), st.get("max")
                if lo is None or hi is None:
                    mask[i] = True
                    continue
                j = np.searchsorted(cand_sigs, lo)
                mask[i] = j < len(cand_sigs) and cand_sigs[j] <= hi
            return batch.filter(pa.array(mask))

        fetched = meta_ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True).map_batches(
            pipeline._FetchStripes(), batch_format="pyarrow"
        )

        def verify(batch: pa.Table) -> pa.Table:
            p = ray.get(packed_ref)
            sigs = batch.column("sig").to_numpy(zero_copy_only=False)
            hit = np.isin(sigs, cand_sigs)
            if not hit.any():
                return pa.table({id_column: pa.array([], pa.int64())})
            sub = batch.filter(pa.array(hit))
            ssub = sub.column("sig").to_numpy(zero_copy_only=False)
            cmat = _matrix(sub.column("vec"))
            out = []
            for s in np.unique(ssub):
                ids_new, vec_new = p[int(s)]
                cvecs = cmat[ssub == s]
                cos = vec_new @ cvecs.T  # (n_new, n_corpus_rows_here)
                out.append(ids_new[(cos >= threshold).any(axis=1)])
            dup = np.unique(np.concatenate(out)) if out else np.empty(0, dtype=np.int64)
            return pa.table({id_column: pa.array(dup)})

        seen = (
            pipeline.decode_dataset(fetched)
            .map_batches(verify, batch_format="pyarrow", zero_copy_batch=True)
            .take_all()
        )
        seen_ids = sorted({r[id_column] for r in seen})

    import ray.data as rd

    seen_tbl = pa.table({id_column: pa.array(seen_ids, pa.int64())})
    dup = in_batch.union(rd.from_arrow(seen_tbl))
    return _anti_join_ids(new_ds, dup, id_column, num_partitions)


# ---------------------------------------------------------------------------
# Duplicated-substring (span-level) report
# ---------------------------------------------------------------------------


def _winnow_select(hv: np.ndarray, doc_of: np.ndarray, w: int) -> np.ndarray:
    """Robust-winnowing selection mask over per-position k-gram hashes.

    For every window of `w` consecutive hashes that lies inside a single
    document, select the position of the (leftmost) minimum. Windows
    never cross documents: w-1 MAX sentinels are inserted at each doc
    boundary AND at both ends of the batch, so any sliding window
    contains real values from at most one doc, sentinels are never
    minima, and every doc sees the identical window structure (w-1
    head/tail windows included) no matter where it sits in a batch —
    selection is a pure function of the doc's own hash sequence, so
    winnowed output is invariant under repartitioning. Two occurrences
    of the same substring of length >= min_len + w - 1 select the same
    k-gram at the same content offset in both copies (the standard
    winnowing guarantee)."""
    n = len(hv)
    if n == 0:
        return np.zeros(0, dtype=bool)
    brk = np.nonzero(np.diff(doc_of))[0] + 1
    shift = np.zeros(n, dtype=np.int64)
    shift[brk] = w - 1
    padded_idx = np.arange(n, dtype=np.int64) + np.cumsum(shift) + (w - 1)
    padlen = int(padded_idx[-1]) + 1 + (w - 1)
    keep = np.zeros(n, dtype=bool)
    padded = np.full(padlen, _U64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    padded[padded_idx] = hv
    sw = np.lib.stride_tricks.sliding_window_view(padded, w)
    sel_pad = np.unique(np.arange(len(sw), dtype=np.int64) + sw.argmin(axis=1))
    real = np.zeros(padlen, dtype=bool)
    real[padded_idx] = True
    sel_pad = sel_pad[real[sel_pad]]
    keep[np.searchsorted(padded_idx, sel_pad)] = True
    # docs shorter than w windows but isolated between sentinels still
    # get covered: every window overlapping them picks their min (the
    # sentinels are maxima), so keep is never empty for a non-empty doc.
    return keep


def _gram_position_rows(
    batch: pa.Table, column: str, id_column: str, min_len: int, winnow: int
) -> pa.Table:
    """(h, h2, id, pos) rows for every `min_len`-byte window fully
    inside a document (winnow > 1: only the winnowing-selected subset).
    (h, h2) is a 128-bit window fingerprint — two independently-seeded
    polynomials — so a duplicate verdict is exact up to a ~n^2/2^129
    collision bound (negligible at 10^10+ corpus positions, where a
    single 64-bit hash would already see birthday collisions)."""
    lengths, data = _text_parts(batch.column(column))
    buf = np.frombuffer(data, dtype=np.uint8)
    lengths = lengths.astype(np.int64, copy=False)
    offs = np.concatenate(([0], np.cumsum(lengths)))
    counts = np.maximum(lengths - (min_len - 1), 0)
    win, win2 = _window_hashes(buf, min_len, dual=True)
    delta = np.zeros(len(win) + 1, dtype=np.int64)
    np.add.at(delta, np.minimum(offs[:-1], len(win)), 1)
    np.add.at(delta, np.minimum(offs[:-1] + counts, len(win)), -1)
    pos = np.nonzero(np.cumsum(delta[:-1]) > 0)[0]
    doc_of = np.searchsorted(offs[1:], pos, side="right")
    rel = pos - offs[:-1][doc_of]
    hv = win[pos]
    h2 = win2[pos]
    if winnow > 1 and len(hv):
        keep = _winnow_select(hv, doc_of, winnow)
        hv, h2, doc_of, rel = hv[keep], h2[keep], doc_of[keep], rel[keep]
    ids = batch.column(id_column).take(pa.array(doc_of))
    ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
    return pa.table(
        {
            "h": pa.array(hv.view(np.int64)),
            "h2": pa.array(h2.view(np.int64)),
            id_column: ids,
            "pos": pa.array(rel.astype(np.int64)),
        }
    )


def _gram_buckets(ds, grams, n_buckets: int | None) -> tuple:
    """Append a coarse shuffle bucket to gram rows. Bucket count scales
    with the CORPUS (gram rows ~ 32 bytes per text byte, ~96 MB of
    exchange per bucket), so one bucket always fits one task at any
    scale; grouping on the bucket instead of the raw hash turns the
    duplicate scan into O(buckets) vectorized UDF calls rather than one
    Python call per distinct gram. When the input can't report a size
    (lazy plan with no metadata) the fallback errs LARGE — empty or
    tiny buckets cost only extra vectorized UDF calls, while too few
    buckets would break the one-bucket-fits-one-task property."""
    if n_buckets is None:
        try:
            size = ds.size_bytes() or 0
        except Exception:
            size = 0
        if size:
            n_buckets = int(min(max(size * 32 // (96 << 20), 16), 1 << 24))
        else:
            n_buckets = 4096
    nb = np.uint64(n_buckets)

    def bucket(batch: pa.Table) -> pa.Table:
        hv = batch.column("h").to_numpy(zero_copy_only=False).view(np.uint64)
        b = ((hv * _MIX1) >> _U64(32)) % nb
        return batch.append_column("b", pa.array(b.astype(np.int64)))

    return grams.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True), n_buckets


def _snap_cp_up(p: np.ndarray, buf: np.ndarray) -> np.ndarray:
    """Round byte positions UP to the nearest UTF-8 codepoint start
    (<= 3 continuation-byte steps; a position at the buffer end or on
    a lead/ASCII byte does not move). Valid only over buffers that are
    concatenations of valid-UTF-8 strings."""
    total = len(buf)
    if total == 0 or len(p) == 0:
        return p
    for _ in range(3):
        safe = np.minimum(p, total - 1)
        cont = (p < total) & ((buf[safe] & 0xC0) == 0x80)
        if not cont.any():
            break
        p = p + cont
    return p


def _snap_cp_down(p: np.ndarray, buf: np.ndarray) -> np.ndarray:
    """Round byte positions DOWN to the nearest UTF-8 codepoint start
    (mirror of _snap_cp_up)."""
    total = len(buf)
    if total == 0 or len(p) == 0:
        return p
    for _ in range(3):
        safe = np.minimum(p, total - 1)
        cont = (p < total) & (p > 0) & ((buf[safe] & 0xC0) == 0x80)
        if not cont.any():
            break
        p = p - cont
    return p


def _merge_span_positions(ps: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Merge SORTED duplicated k-window start positions into maximal
    [start, end) byte spans: windows closer than k overlap/abut and
    fuse; a gap >= k breaks the island. The single home of the
    adjacency rule shared by the report (duplicate_spans) and the
    rewrite (remove_duplicate_spans)."""
    brk = ps[1:] >= ps[:-1] + k
    starts = ps[np.concatenate(([True], brk))]
    ends = ps[np.concatenate((brk, [True]))] + k
    return starts, ends


def _dup_run_select(group: pa.Table, id_column: str, drop_canonical: bool) -> pa.Table:
    """Vectorized duplicate scan over one bucket: sort by (h, h2, id,
    pos), keep rows whose 128-bit-fingerprint run has >= 2 members —
    all of them for the report, or all but the run's minimum (id, pos)
    for removal."""
    hv = group.column("h").to_numpy(zero_copy_only=False).view(np.uint64)
    h2 = group.column("h2").to_numpy(zero_copy_only=False).view(np.uint64)
    ids = group.column(id_column).to_numpy(zero_copy_only=False)
    ps = group.column("pos").to_numpy(zero_copy_only=False)
    order = np.lexsort((ps, ids, h2, hv))
    hs = hv[order]
    h2s = h2[order]
    first = np.concatenate(([True], (hs[1:] != hs[:-1]) | (h2s[1:] != h2s[:-1])))
    run_id = np.cumsum(first) - 1
    counts = np.bincount(run_id)
    sel = counts[run_id] >= 2
    if drop_canonical:
        sel &= ~first  # lexsort puts the minimum (id, pos) first in its run
    keep = order[sel]
    return pa.table({id_column: pa.array(ids[keep]), "pos": pa.array(ps[keep])})


def duplicate_spans(
    ds,
    column: str = "text",
    id_column: str = "doc_id",
    min_len: int = 30,
    winnow: int = 1,
    n_buckets: int | None = None,
):
    """Corpus-duplicated substring report — the span-level (sub-document)
    dedup signal of Lee et al., "Deduplicating Training Data Makes
    Language Models Better" (arXiv:2107.06499), whose suffix-array scan
    is re-expressed as a distributed k-gram grouping.

    A `min_len`-byte window is DUPLICATED iff the same bytes occur at
    >= 2 distinct (doc, pos) in the corpus (cross-doc or within-doc).
    Every duplicated window covers its min_len positions; overlapping
    covered ranges merge into maximal spans. Returns one row per
    document containing at least one duplicated span:
    (id_column, dup_spans, dup_chars).

    Scale path: the exchange carries fixed-width (h, h2, id, pos)
    rows — the text itself never shuffles. Windows compare by their
    128-bit fingerprint (two independent polynomials), so the verdict
    is exact up to a ~n^2/2^129 collision bound — negligible even at
    10^10+ corpus positions. Positions are UTF-8 BYTE offsets (spans
    on a pure-ASCII corpus coincide with character offsets, which is
    what the value oracle assumes). At winnow=1 every in-doc window
    enters the exchange (~32 bytes per text byte); winnow=w applies
    robust winnowing (_winnow_select) so only ~2/(w+1) of positions
    do, and detection covers all duplicated substrings of length
    >= min_len + w - 1 — reported spans are then a subset of the
    exact report (invariant-checked in the driver surface). Reference
    parity: orc-go has no substring-level dedup; this extends the
    dedup family (SURVEY.md LLM-ops section).
    """
    k = min_len

    def gram_rows(batch: pa.Table) -> pa.Table:
        return _gram_position_rows(batch, column, id_column, k, winnow)

    grams = ds.map_batches(gram_rows, batch_format="pyarrow", zero_copy_batch=True)
    bucketed, _ = _gram_buckets(ds, grams, n_buckets)

    def dup_positions(group: pa.Table) -> pa.Table:
        return _dup_run_select(group, id_column, drop_canonical=False)

    hits = bucketed.groupby("b").map_groups(dup_positions, batch_format="pyarrow")

    def spans(group: pa.Table) -> pa.Table:
        ps = np.sort(group.column("pos").to_numpy(zero_copy_only=False).astype(np.int64))
        starts, ends = _merge_span_positions(ps, k)
        return pa.table(
            {
                id_column: group.column(id_column).slice(0, 1),
                "dup_spans": pa.array([len(starts)], pa.int64()),
                "dup_chars": pa.array([int((ends - starts).sum())], pa.int64()),
            }
        )

    return hits.groupby(id_column).map_groups(spans, batch_format="pyarrow")


def remove_duplicate_spans(
    ds,
    column: str = "text",
    id_column: str = "doc_id",
    min_len: int = 30,
    num_partitions: int | None = None,
    n_buckets: int | None = None,
):
    """Rewrite the corpus with duplicated substrings REMOVED — the
    removal step of Lee et al. (arXiv:2107.06499): every duplicated
    `min_len`-byte window keeps its canonical occurrence (the minimum
    (id, pos) of its content) and all other occurrences are cut, so
    each duplicated substring still exists exactly once in the output.
    Returns (id_column, clean_text) for EVERY input row (rows without
    duplicated content pass through unchanged).

    Scale path: the k-gram exchange carries fixed-width (h, h2, id,
    pos) rows bucket-grouped and run-scanned exactly as in
    duplicate_spans; removal positions collapse to per-doc merged span
    lists (bounded by duplicated content, not corpus size); the corpus
    then meets those lists in ONE hash-shuffle left-outer join, and
    span cutting is a fully vectorized multi-range byte gather per
    batch — no per-row Python. Span offsets are UTF-8 BYTE positions;
    before cutting, each span shrinks to codepoint boundaries so the
    output is always valid UTF-8 (on non-ASCII corpora up to 3 bytes
    per span edge are conservatively kept). A corpus with no
    duplicated gram at all passes through unchanged."""

    k = min_len

    def gram_rows(batch: pa.Table) -> pa.Table:
        return _gram_position_rows(batch, column, id_column, k, 1)

    grams = ds.map_batches(gram_rows, batch_format="pyarrow", zero_copy_batch=True)
    bucketed, _ = _gram_buckets(ds, grams, n_buckets)

    def removal_positions(group: pa.Table) -> pa.Table:
        return _dup_run_select(group, id_column, drop_canonical=True)

    hits = bucketed.groupby("b").map_groups(removal_positions, batch_format="pyarrow")

    def doc_spans(group: pa.Table) -> pa.Table:
        ps = np.unique(group.column("pos").to_numpy(zero_copy_only=False).astype(np.int64))
        starts, ends = _merge_span_positions(ps, k)
        # interleaved (s, e) int64 pairs in ONE binary cell — Ray's
        # Acero join rejects list-typed payload columns, and the
        # interleaving lets the cut stage decode the whole batch with
        # two strided views instead of per-row parsing
        packed = np.empty(2 * len(starts), dtype="<i8")
        packed[0::2] = starts
        packed[1::2] = ends
        return pa.table(
            {
                id_column: group.column(id_column).slice(0, 1),
                "__spans": pa.array([packed.tobytes()], pa.binary()),
            }
        )

    spans = hits.groupby(id_column).map_groups(doc_spans, batch_format="pyarrow")
    # A corpus with NO duplicated min_len-gram leaves `spans` EMPTY,
    # which Ray's hash-shuffle join cannot finalize (a partition with
    # zero typed build-side blocks raises ArrowInvalid instead of
    # producing an all-null outer join). The spans side is the build
    # side of the hash join and is bounded by docs-with-duplicates
    # (one small row per such doc), so materializing it here costs
    # nothing extra — and lets a clean corpus short-circuit to a pure
    # streaming rename with no shuffle at all.
    spans = spans.materialize()
    if spans.count() == 0:

        def passthrough(t: pa.Table) -> pa.Table:
            return pa.table(
                {id_column: t.column(id_column), "clean_text": t.column(column)}
            )

        return ds.select_columns([id_column, column]).map_batches(
            passthrough, batch_format="pyarrow", zero_copy_batch=True
        )
    joined = ds.select_columns([id_column, column]).join(
        spans,
        join_type="left_outer",
        num_partitions=num_partitions or _auto_partitions(ds),
        on=(id_column,),
    )

    def cut(batch: pa.Table) -> pa.Table:
        from ..column import _string_parts_view

        lengths, data = _text_parts(batch.column(column))
        lengths = lengths.astype(np.int64, copy=False)
        buf = np.frombuffer(data, dtype=np.uint8)
        offs = np.concatenate(([0], np.cumsum(lengths)))
        sp = batch.column("__spans")
        sp = sp.combine_chunks() if isinstance(sp, pa.ChunkedArray) else sp
        sp_lens, sp_buf = _string_parts_view(sp.fill_null(b""))
        nspans = sp_lens // 16
        flat = np.frombuffer(sp_buf.tobytes(), dtype="<i8")
        n = len(lengths)
        # span positions are BYTE offsets; shrink each span to UTF-8
        # codepoint boundaries (start up, end down) so the cut never
        # slices mid-codepoint and the output stays valid UTF-8 — we
        # may keep up to 3 extra bytes per edge, never cut unique text
        span_base = offs[:-1][np.repeat(np.arange(n), nspans)]
        s_abs = _snap_cp_up(flat[0::2] + span_base, buf)
        e_abs = np.maximum(_snap_cp_down(flat[1::2] + span_base, buf), s_abs)
        # kept segments per row: [0, s1), [e1, s2), ..., [e_last, len)
        seg_per_row = nspans + 1
        seg_offs = np.concatenate(([0], np.cumsum(seg_per_row)))
        total_segs = int(seg_offs[-1])
        a = np.zeros(total_segs, dtype=np.int64)
        b = np.zeros(total_segs, dtype=np.int64)
        first = seg_offs[:-1]
        last = seg_offs[1:] - 1
        not_first = np.ones(total_segs, dtype=bool)
        not_first[first] = False
        not_last = np.ones(total_segs, dtype=bool)
        not_last[last] = False
        a[not_first] = e_abs  # segment starts after each span end
        b[not_last] = s_abs  # segment ends at the next span start
        a[first] = offs[:-1]
        b[last] = offs[1:]
        seg_lens = b - a
        out_offs = np.concatenate(([0], np.cumsum(seg_lens)))
        total = int(out_offs[-1])
        idx = (
            np.arange(total, dtype=np.int64)
            - np.repeat(out_offs[:-1], seg_lens)
            + np.repeat(a, seg_lens)
        )
        new_lengths = np.add.reduceat(seg_lens, first) if n else np.empty(0, np.int64)
        from ..column import _build_string_array

        clean = _build_string_array(pa.string(), new_lengths, buf[idx].tobytes(), n)
        return pa.table({id_column: batch.column(id_column), "clean_text": clean})

    return joined.map_batches(cut, batch_format="pyarrow", zero_copy_batch=True)
