"""Deduplication operators over a documents table.

All stages are vectorized map_batches + one keyed shuffle; nothing
materializes the corpus on the driver.

* exact_dedup      — 128-bit content hash -> hash-partitioned groupby ->
                     keep lowest id per group. The hash pre-aggregation
                     keeps the shuffle payload at (h1, h2, id), not text.
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


def _dup_id_set(edges, id_column: str) -> set:
    """Collect {id -> min dup_of} safely (empty edge sets lose their
    schema through groupby on some paths)."""
    try:
        pdf = edges.groupby(id_column).min("dup_of").to_pandas()
    except Exception:
        return set()
    if id_column not in pdf.columns or len(pdf) == 0:
        return set()
    return set(pdf[id_column].tolist())


def content_hash_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Adds h1/h2 (two independent 64-bit hashes = 128-bit content id)."""
    lengths, data = _text_parts(batch.column(column))
    buf = np.frombuffer(data, dtype=np.uint8)
    h1 = bloom_mod.hash_bytes_columns(lengths, buf)
    h2 = (h1 ^ (h1 >> _U64(33))) * _MIX1
    h2 = (h2 ^ (h2 >> _U64(29))) * _MIX2
    h2 ^= h2 >> _U64(32)
    return batch.append_column("h1", pa.array(h1.view(np.int64))).append_column(
        "h2", pa.array(h2.view(np.int64))
    )


def exact_dedup(ds, column: str = "text", id_column: str = "doc_id"):
    """Keep the lowest-id row per distinct `column` value.

    Scale path: the groupby shuffles only after batches are reduced to
    per-key minima inside each batch (partial aggregate before the
    exchange — ray guide 'Aggregation at scale')."""
    import pandas as pd

    hashed = ds.map_batches(
        lambda t: content_hash_batch(t, column), batch_format="pyarrow", zero_copy_batch=True
    )

    def local_min(batch: pa.Table) -> pa.Table:
        # partial pre-aggregation: one candidate row per key per batch
        df = batch.to_pandas()
        out = df.sort_values(id_column).groupby(["h1", "h2"], as_index=False).first()
        return pa.Table.from_pandas(out, preserve_index=False).select(
            batch.column_names
        ).cast(batch.schema.remove_metadata())

    def keep_first(group: pd.DataFrame) -> pd.DataFrame:
        return group.nsmallest(1, id_column)

    dedup = (
        hashed.map_batches(local_min, batch_format="pyarrow")
        .groupby(["h1", "h2"])
        .map_groups(keep_first, batch_format="pandas")
    )
    return dedup.drop_columns(["h1", "h2"])


# ------------------------------------------------------------------ minhash

N_PERM = 64
N_BANDS = 16
ROWS_PER_BAND = N_PERM // N_BANDS


def minhash_signatures(texts: pa.ChunkedArray | pa.Array, shingle: int = 8) -> np.ndarray:
    """(n_docs, N_PERM) uint64 minhash matrix via ONE-PERMUTATION
    HASHING with rotation densification (Shrivastava & Li): each
    8-byte shingle hash lands in bin = top-6-bits, the per-(doc, bin)
    minimum is one scatter pass, and empty bins borrow the next
    non-empty bin's value (circular). One pass over the text instead
    of N_PERM passes — this is what makes minhash viable at corpus
    scale; Jaccard estimation properties match k-perm minhash."""
    lengths, data = _text_parts(texts)
    n_docs = len(lengths)
    if n_docs == 0:
        return np.empty((0, N_PERM), dtype=np.uint64)
    buf = np.frombuffer(data, dtype=np.uint8)
    padded = np.concatenate([buf, np.zeros(shingle, dtype=np.uint8)])
    win = np.lib.stride_tricks.sliding_window_view(padded, 8)[: max(len(buf), 1)].copy().view("<u8").ravel()
    offs = np.concatenate(([0], np.cumsum(lengths)))
    starts = offs[:-1].astype(np.int64)
    counts = np.maximum(lengths - shingle + 1, 1).astype(np.int64)
    # valid shingle positions per doc (windows must not cross doc ends)
    delta = np.zeros(len(win) + 1, dtype=np.int64)
    np.add.at(delta, np.minimum(starts, len(win)), 1)
    np.add.at(delta, np.minimum(starts + counts, len(win)), -1)
    valid = np.cumsum(delta[:-1]) > 0
    pos = np.nonzero(valid)[0]
    hv = (win[pos] * _MIX1) ^ (win[pos] >> _U64(31))
    # doc id per valid position
    doc_of = np.searchsorted(offs[1:], pos, side="right")
    bins = (hv >> _U64(64 - 6)).astype(np.int64)  # 64 bins from top bits
    vals = (hv * _MIX2) ^ (hv >> _U64(29))  # bin-independent value

    maxu = _U64(0xFFFFFFFFFFFFFFFF)
    sig = np.full(n_docs * N_PERM, maxu, dtype=np.uint64)
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


def minhash_lsh_dedup(ds, column: str = "text", id_column: str = "doc_id"):
    """Near-dup removal: docs sharing any LSH band bucket collapse to
    the bucket's minimum id (single-linkage within buckets; one label-
    propagation round, which is exact when near-dup groups are bucket-
    contained — the common case at band similarity ~0.5+)."""
    import pandas as pd

    band_rows = ds.map_batches(
        lambda t: minhash_band_rows(t, column, id_column),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def bucket_min(group: pd.DataFrame) -> pd.DataFrame:
        m = group[id_column].min()
        out = group[group[id_column] != m][[id_column]].copy()
        out["dup_of"] = np.int64(m)
        if out.empty:
            return pd.DataFrame(
                {id_column: pd.Series([], dtype="int64"), "dup_of": pd.Series([], dtype="int64")}
            )
        return out

    dup_edges = band_rows.groupby(["band", "band_hash"]).map_groups(
        bucket_min, batch_format="pandas"
    )
    # a doc may appear in many buckets; keep the smallest dup target
    dup_ids = _dup_id_set(dup_edges, id_column)

    import ray

    dup_ref = ray.put(dup_ids)

    def drop_dups(batch: pa.Table) -> pa.Table:
        dups = ray.get(dup_ref)
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        mask = np.array([i not in dups for i in ids.tolist()])
        return batch.filter(pa.array(mask))

    return ds.map_batches(drop_dups, batch_format="pyarrow")


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


def simhash_dedup(ds, column: str = "text", id_column: str = "doc_id", max_hamming: int = 3):
    """Near-dup removal via simhash banding: split the 64-bit hash into
    4 16-bit bands; hamming <= 3 guarantees one identical band
    (pigeonhole); verify hamming inside buckets."""
    import pandas as pd

    hashed = ds.map_batches(
        lambda t: simhash_batch(t, column), batch_format="pyarrow", zero_copy_batch=True
    )

    def band_rows(batch: pa.Table) -> pa.Table:
        sh = batch.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
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
                        "simhash": batch.column("simhash"),
                    }
                )
            )
        return pa.concat_tables(parts)

    empty = pd.DataFrame(
        {id_column: pd.Series([], dtype="int64"), "dup_of": pd.Series([], dtype="int64")}
    )

    def bucket_verify(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return empty.copy()
        g = group.sort_values(id_column)
        sh = g["simhash"].to_numpy().view(np.uint64)
        ids = g[id_column].to_numpy()
        xor = sh[None, :] ^ sh[:, None]
        ham = np.unpackbits(xor.view(np.uint8).reshape(len(g), len(g), 8), axis=2).sum(axis=2)
        near = (ham <= max_hamming) & (ids[None, :] > ids[:, None])
        out = [(ids[j], ids[i]) for i, j in zip(*np.nonzero(near))]
        if not out:
            return empty.copy()
        return pd.DataFrame(out, columns=[id_column, "dup_of"]).astype("int64")

    edges = hashed.map_batches(band_rows, batch_format="pyarrow").groupby(
        ["band", "band_val"]
    ).map_groups(bucket_verify, batch_format="pandas")
    dup_ids = _dup_id_set(edges, id_column)

    import ray

    dup_ref = ray.put(dup_ids)

    def drop(batch: pa.Table) -> pa.Table:
        dups = ray.get(dup_ref)
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        mask = np.array([i not in dups for i in ids.tolist()])
        return batch.filter(pa.array(mask))

    return ds.map_batches(drop, batch_format="pyarrow")


# ------------------------------------------------------------------ embeddings

def embedding_dedup(
    ds,
    threshold: float = 0.99,
    column: str = "embedding",
    id_column: str = "vec_id",
    n_planes: int = 16,
    seed: int = 77,
):
    """Embedding-cosine near-dup removal: random-hyperplane LSH buckets
    (sign signature over `n_planes` fixed seeded planes — near-identical
    vectors collide with prob ~ (1 - theta/pi)^n), exact cosine
    verification inside buckets, keep the minimum id."""
    import pandas as pd

    from .ann import _matrix

    state = {}

    def sig_batch(batch: pa.Table) -> pa.Table:
        mat = _matrix(batch.column(column)).astype(np.float64)
        if "planes" not in state:
            rng = np.random.default_rng(seed)
            state["planes"] = rng.standard_normal((mat.shape[1], n_planes))
        proj = mat @ state["planes"]
        bits = (proj > 0).astype(np.uint16)
        sig = np.zeros(len(mat), dtype=np.int64)
        for b in range(n_planes):
            sig |= bits[:, b].astype(np.int64) << b
        norm = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        return pa.table(
            {
                id_column: batch.column(id_column),
                "sig": pa.array(sig),
                "vec": pa.array(list(norm.astype(np.float32))),
            }
        )

    empty = pd.DataFrame(
        {id_column: pd.Series([], dtype="int64"), "dup_of": pd.Series([], dtype="int64")}
    )

    def bucket_verify(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return empty.copy()
        g = group.sort_values(id_column)
        mat = np.stack(g["vec"].to_numpy())
        ids = g[id_column].to_numpy()
        cos = mat @ mat.T
        near = (cos >= threshold) & (ids[None, :] > ids[:, None])
        out = [(ids[j], ids[i]) for i, j in zip(*np.nonzero(near))]
        return pd.DataFrame(out, columns=[id_column, "dup_of"]).astype("int64") if out else empty.copy()

    edges = ds.map_batches(sig_batch, batch_format="pyarrow").groupby("sig").map_groups(
        bucket_verify, batch_format="pandas"
    )
    dup_ids = _dup_id_set(edges, id_column)

    import ray

    dup_ref = ray.put(dup_ids)

    def drop(batch: pa.Table) -> pa.Table:
        dups = ray.get(dup_ref)
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        mask = np.array([i not in dups for i in ids.tolist()])
        return batch.filter(pa.array(mask))

    return ds.map_batches(drop, batch_format="pyarrow")


# ------------------------------------------------------------------ jaccard

def ngram_jaccard(a: str, b: str, n: int = 8) -> float:
    """Exact character-n-gram Jaccard (verification primitive)."""
    sa = {a[i : i + n] for i in range(max(len(a) - n + 1, 1))}
    sb = {b[i : i + n] for i in range(max(len(b) - n + 1, 1))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)
