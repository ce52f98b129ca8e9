"""Document chunking for RAG / context-window preparation.

Two deterministic, exactly-SQL-reproducible chunkers (the fixture the
rest of the repo uses for value oracles), both flat-map-shaped: one
input document row fans out to `n_chunks` chunk rows. No shuffle — a
pure `map_batches` stage, so at corpus scale chunking streams block by
block with zero exchange.

Chunk rule (shared by both): window `size`, overlap `overlap`,
stride = size - overlap; window starts are s in {0, stride, 2*stride,
...} with s < max(n - overlap, 1) where n is the unit count (chars or
words). Every document emits at least one chunk (an empty doc emits
one empty chunk), and no start lies inside the final window's overlap
tail, so a chunk that is wholly contained in its predecessor is never
emitted. In SQL the same start set is
`generate_series(0, greatest(n - overlap - 1, 0), stride)`.

Vectorization: the loop is over CHUNK POSITIONS (bounded by the
longest doc in the batch), not rows — each iteration slices every
surviving row at once with `utf8_slice_codeunits` / `list_slice`
(both slice by codepoint / element, matching SQL `substr` /
`list_slice` semantics exactly).

The reference engine has no chunker; this extends the preprocessing
family (SURVEY.md "beyond the reference" track) the same way
`ops/pack.py` extends packing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _starts_per_row(n_units: np.ndarray, size: int, overlap: int) -> np.ndarray:
    """Number of chunk windows per row under the shared start rule."""
    stride = size - overlap
    stop = np.maximum(n_units - overlap, 1)
    return -(-stop // stride)  # ceil(stop / stride)


def _expand(
    batch: pa.Table,
    n_units: np.ndarray,
    slice_one,
    size: int,
    overlap: int,
    id_column: str,
) -> pa.Table:
    """Shared fan-out: for chunk index j, slice every row that still
    has a j-th window. `slice_one(table_subset, start, stop)` returns
    the chunk-text array for those rows."""
    import pyarrow.compute as pc

    stride = size - overlap
    n_chunks = _starts_per_row(n_units, size, overlap)
    ids = batch.column(id_column)
    parts: list[pa.Table] = []
    for j in range(int(n_chunks.max(initial=0))):
        mask = n_chunks > j
        if not mask.any():
            break
        sel = pa.array(mask)
        start = j * stride
        text = slice_one(batch.filter(sel), start, start + size)
        k = int(mask.sum())
        parts.append(
            pa.table(
                {
                    id_column: ids.filter(sel),
                    "chunk_idx": pa.array(np.full(k, j, dtype=np.int64)),
                    "chunk_start": pa.array(np.full(k, start, dtype=np.int64)),
                    "chunk_text": text,
                    "chunk_len": pc.utf8_length(text).cast(pa.int64()),
                }
            )
        )
    if not parts:
        return pa.table(
            {
                id_column: pa.array([], ids.type),
                "chunk_idx": pa.array([], pa.int64()),
                "chunk_start": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
                "chunk_len": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(parts)


def chunk_chars(
    ds,
    size: int = 200,
    overlap: int = 40,
    text_column: str = "text",
    id_column: str = "doc_id",
):
    """Fixed-size character-window chunking with overlap (the classic
    RAG splitter): chunk j covers codepoints [j*stride, j*stride+size).
    SQL-exact:
      substr(coalesce(text,''), s+1, size) for
      s in generate_series(0, greatest(length(text)-overlap-1, 0), stride)
    """
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    import pyarrow.compute as pc

    def fan_out(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch.column(text_column).combine_chunks(), "")
        batch = batch.set_column(
            batch.schema.get_field_index(text_column), text_column, texts
        )
        n = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)

        def slice_one(sub: pa.Table, start: int, stop: int) -> pa.Array:
            return pc.utf8_slice_codeunits(
                sub.column(text_column).combine_chunks(), start=start, stop=stop
            )

        return _expand(batch, n, slice_one, size, overlap, id_column)

    return ds.map_batches(fan_out, batch_format="pyarrow", zero_copy_batch=True)


def chunk_words(
    ds,
    size: int = 40,
    overlap: int = 8,
    text_column: str = "text",
    id_column: str = "doc_id",
):
    """Word-window chunking: the unit is a single-space-separated field
    (the repo-wide `string_split(text, ' ')` token convention), chunk
    text is the window re-joined with ' '. SQL-exact:
      array_to_string(list_slice(string_split(coalesce(text,''), ' '),
                                 s+1, s+size), ' ')
      for s in generate_series(0, greatest(nw-overlap-1, 0), stride),
      nw = length(string_split(coalesce(text,''), ' ')).
    `chunk_start` is the word offset; `chunk_len` is in characters.
    """
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    import pyarrow.compute as pc

    def fan_out(batch: pa.Table) -> pa.Table:
        texts = pc.fill_null(batch.column(text_column).combine_chunks(), "")
        toks = pc.split_pattern(texts, " ")
        batch = batch.append_column("__toks", toks)
        nw = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)

        def slice_one(sub: pa.Table, start: int, stop: int) -> pa.Array:
            return pc.binary_join(
                pc.list_slice(sub.column("__toks").combine_chunks(), start, stop), " "
            )

        return _expand(batch, nw, slice_one, size, overlap, id_column)

    return ds.map_batches(fan_out, batch_format="pyarrow", zero_copy_batch=True)
