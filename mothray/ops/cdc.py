"""Content-defined chunking (CDC) — sub-document dedup at byte level.

Gear-hash CDC (the FastCDC/rsync family, public literature): a chunk
boundary falls where a rolling hash of the last 64 bytes has
`avg_bits` low zero bits, subject to min/max chunk lengths. Because
boundaries depend only on LOCAL content, an edit reshuffles only the
chunks it touches — the property that makes CDC the standard tool for
dedup storage and for catching near-identical web pages that differ by
an inserted banner.

Vectorized: the gear hash at every byte position is a 64-tap shifted
sum computed with 64 numpy passes (no per-byte Python); the min/max
length walk touches only candidate positions (~n / 2^avg_bits of the
input). Emits (id, chunk_idx, start, length, chunk_hash) rows — chunk
hashes feed exact_dedup-style groupbys; text never needs to move.

No reference analog (engine extension, like FSST/sampling).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .. import bloom as bloom_mod
from .dedup import _segmented_content_hash, _text_parts

_U64 = np.uint64

# deterministic gear table: one mixed u64 per byte value
_GEAR = bloom_mod._mix(np.arange(256, dtype=np.uint64) ^ _U64(0xA076_1D64_78BD_642F))


def _gear_hashes(buf: np.ndarray) -> np.ndarray:
    """h[t] = sum_{j=0..63} gear[buf[t-j]] << j  (mod 2^64) — the
    64-byte-window gear hash at every position, as 64 vector passes."""
    n = len(buf)
    g = _GEAR[buf]
    acc = np.zeros(n, dtype=np.uint64)
    for j in range(64):
        if j >= n:
            break
        acc[j:] += g[: n - j] << _U64(j)
    return acc


def cdc_chunk_batch(
    batch: pa.Table,
    column: str = "text",
    id_column: str = "doc_id",
    avg_bits: int = 8,
    min_len: int = 64,
    max_len: int = 2048,
) -> pa.Table:
    """Chunk every doc in a batch. Returns one row per chunk:
    (id, chunk_idx, start, length, chunk_hash) where chunk_hash is the
    full-content 64-bit hash of the chunk bytes (dedup key)."""
    mask = _U64((1 << avg_bits) - 1)
    lengths, data = _text_parts(batch.column(column))
    buf = np.frombuffer(data, dtype=np.uint8)
    n_docs = len(lengths)
    offs = np.concatenate(([0], np.cumsum(lengths.astype(np.int64))))
    ids = batch.column(id_column).to_numpy(zero_copy_only=False)

    h = _gear_hashes(buf)
    cand = np.nonzero((h & mask) == 0)[0] if len(buf) else np.empty(0, np.int64)
    cand_doc = np.searchsorted(offs[1:], cand, side="right")

    # the walk below is Python per CHUNK, not per byte: iterations =
    # number of emitted chunks (~bytes / 2^avg_bits), and the heavy
    # per-byte work (gear hash, candidate scan, chunk hashing) is all
    # vectorized above/below
    out_idx, out_start, out_len, per_doc = [], [], [], np.zeros(n_docs, dtype=np.int64)
    cj = 0
    for d in range(n_docs):
        start, end = int(offs[d]), int(offs[d + 1])
        pos = start
        k = 0
        while pos < end:
            lo = pos + min_len
            hi = min(pos + max_len, end)
            cut = hi
            while cj < len(cand) and (cand_doc[cj] < d or (cand_doc[cj] == d and cand[cj] < lo)):
                cj += 1
            if cj < len(cand) and cand_doc[cj] == d and cand[cj] < hi:
                cut = int(cand[cj]) + 1  # boundary AFTER the matching byte
            out_idx.append(k)
            out_start.append(pos - start)
            out_len.append(cut - pos)
            pos = cut
            k += 1
        if end == start:  # empty doc: one empty chunk (doc stays visible)
            out_idx.append(0)
            out_start.append(0)
            out_len.append(0)
            k = 1
        per_doc[d] = k

    out_ids = np.repeat(ids, per_doc)
    ch_lens = np.asarray(out_len, dtype=np.int64)
    # chunks tile each doc contiguously and docs are contiguous in buf,
    # so the chunk-ordered byte stream IS buf — one segmented hash pass
    hashes = _segmented_content_hash(ch_lens, buf, _U64(0x9E3779B97F4A7C15))

    return pa.table(
        {
            id_column: pa.array(np.asarray(out_ids)),
            "chunk_idx": pa.array(np.asarray(out_idx, dtype=np.int64)),
            "start": pa.array(np.asarray(out_start, dtype=np.int64)),
            "length": pa.array(ch_lens),
            "chunk_hash": pa.array(hashes.view(np.int64)),
        }
    )


def cdc_chunks(
    ds,
    column: str = "text",
    id_column: str = "doc_id",
    avg_bits: int = 8,
    min_len: int = 64,
    max_len: int = 2048,
):
    """Dataset-level chunker: one fused map_batches, chunk rows out."""

    def run(batch: pa.Table) -> pa.Table:
        return cdc_chunk_batch(batch, column, id_column, avg_bits, min_len, max_len)

    return ds.map_batches(run, batch_format="pyarrow", zero_copy_batch=True)
