"""Inverted-index text search over an encoded-on-disk dataset.

Build: tokenize each document (lowercased `[a-z0-9]+` runs — the SQL
oracle reproduces it with `string_split_regex(lower(text),
'[^a-z0-9]+')`), emit distinct (token, doc_id) postings, sort by
(token, doc_id) — the one all-to-all any clustered index build pays —
and encode with the engine's own writer. The sort gives each stripe a
tight token range, so stripe zone maps + string blooms make a term
lookup touch only the stripes that can hold the term: a query reads
metadata plus ~1/stripes of the postings, never the corpus.

Search: per-term predicate-pushdown scans (`pipeline.filter_encoded`)
union'd; AND intersects by counting per-doc distinct-term hits
(postings are distinct per (token, doc), so count == n_terms iff all
terms present); OR is a distinct over doc ids. Both shuffles are over
id-width rows only.

No reference analog (orc-go stores and scans; it has no secondary
indexes) — engine extension like FSST, built ON the encoded format so
the index inherits compression (token dictionary/FSST + doc-id RLE)
and pruning for free.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_SPLIT = "[^a-z0-9]+"


def postings_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """(token, id) DISTINCT pairs for one batch, fully vectorized:
    lower -> regex split to list -> flatten with parent indices ->
    drop empties -> per-batch distinct (the combiner; corpus-wide
    distinctness follows because a doc's postings live in one row)."""
    if batch.num_rows == 0:
        return pa.table(
            {"token": pa.array([], pa.string()), id_col: pa.array([], batch.schema.field(id_col).type)}
        )
    toks = pc.split_pattern_regex(pc.utf8_lower(batch.column(text_col)), _TOKEN_SPLIT)
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    parent = pc.list_parent_indices(toks)
    flat_toks = toks.flatten()
    flat = pa.table(
        {"token": flat_toks, id_col: batch.column(id_col).take(parent)}
    ).filter(pc.not_equal(flat_toks, ""))
    return flat.group_by(["token", id_col], use_threads=False).aggregate([])


def build_text_index(
    ds,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    opts: dict | None = None,
) -> None:
    """Tokenize -> distinct postings -> sort by (token, id) -> encode.
    The sort is the canonical index-build exchange; everything after it
    streams (encode fuses into the sorted blocks)."""
    from .. import pipeline

    def mk(batch: pa.Table) -> pa.Table:
        return postings_batch(batch, id_col, text_col)

    postings = ds.map_batches(mk, batch_format="pyarrow", zero_copy_batch=True).sort(
        ["token", id_col]
    )
    pipeline.write_encoded(pipeline.encode_dataset(postings, opts), out_dir)


def search_text_index(index_dir: str, terms: list[str], mode: str = "and", id_col: str = "doc_id"):
    """Doc ids matching ALL (`and`) or ANY (`or`) of `terms`. Each term
    is one pruned scan of the index (zone maps + blooms skip stripes);
    only (token, id) survivor rows reach the exchange."""
    from .. import pipeline

    uniq = sorted(set(terms))
    scans = [
        pipeline.filter_encoded(index_dir, "token", "eq", t, columns=["token", id_col])
        for t in uniq
    ]
    hits = scans[0].union(*scans[1:]) if len(scans) > 1 else scans[0]
    ids = hits.select_columns([id_col])
    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    # native hash aggregation, not per-group Python: postings are
    # distinct per (token, id), so hits-per-id == terms matched;
    # OR keeps any id, AND keeps ids hit by every term
    counted = ids.groupby(id_col).count()
    if mode == "and":
        n = len(uniq)

        def all_terms(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("count()"), n))

        counted = counted.map_batches(all_terms, batch_format="pyarrow")
    return counted.select_columns([id_col])
