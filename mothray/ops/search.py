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


def bm25_postings_batch(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """(token, id, tf, dl) rows for one batch: term frequency per
    (token, doc) plus the doc's token count, both needed at BM25
    scoring time without touching the corpus again. dl repeats per
    posting by design — it RLE-compresses inside the sorted index and
    saves a doc-length join on every query."""
    import numpy as np

    if batch.num_rows == 0:
        return pa.table(
            {
                "token": pa.array([], pa.string()),
                id_col: pa.array([], batch.schema.field(id_col).type),
                "tf": pa.array([], pa.int64()),
                "dl": pa.array([], pa.int64()),
            }
        )
    toks = pc.split_pattern_regex(pc.utf8_lower(batch.column(text_col)), _TOKEN_SPLIT)
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    parent = pc.list_parent_indices(toks)
    flat_toks = toks.flatten()
    keep = pc.not_equal(flat_toks, "")
    parent = parent.filter(keep)
    flat = pa.table(
        {"token": flat_toks.filter(keep), "__row": parent}
    )
    tf = flat.group_by(["token", "__row"], use_threads=False).aggregate([([], "count_all")])
    dl_per_row = np.bincount(
        parent.to_numpy(zero_copy_only=False), minlength=batch.num_rows
    ).astype(np.int64)
    rows = tf.column("__row").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "token": tf.column("token"),
            id_col: batch.column(id_col).take(tf.column("__row")),
            "tf": tf.column("count_all").cast(pa.int64()),
            "dl": pa.array(dl_per_row[rows]),
        }
    )


_BM25_META = "_bm25_meta.json"


def _write_meta_atomic(dir_: str, meta: dict) -> None:
    """tmp+rename: a crash mid-write (or a concurrent reader) must never
    see a torn meta JSON — that bricks every later search/append."""
    import json as _json
    import os as _os
    import uuid as _uuid

    path = _os.path.join(dir_, _BM25_META)
    tmp = path + "." + _uuid.uuid4().hex + ".tmp"
    with open(tmp, "w") as f:
        _json.dump(meta, f)
    _os.rename(tmp, path)


def _normalize_terms(terms: list[str]) -> list[str]:
    """Apply the INDEX tokenizer to query terms (lowercase + the same
    [^a-z0-9]+ split): an uppercase or punctuated query term would
    otherwise do exact token equality against a lowercased index and
    silently match nothing. 'foo-bar' becomes the terms foo AND bar."""
    import re as _re

    out = []
    for t in terms:
        out.extend(p for p in _re.split(_TOKEN_SPLIT, str(t).lower()) if p)
    if not out:
        raise ValueError(f"no searchable tokens in query terms {terms!r}")
    return sorted(set(out))



def build_bm25_index(
    ds,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    opts: dict | None = None,
) -> dict:
    """BM25-ready inverted index: tf/dl postings sorted by (token, id)
    and encoded with the engine's writer (token dict/FSST, tf/dl RLE),
    plus a meta JSON carrying the two corpus constants scoring needs
    (N = corpus docs incl. empty, avgdl = total tokens / N)."""
    import json
    import os

    from .. import pipeline

    def mk(batch: pa.Table) -> pa.Table:
        return bm25_postings_batch(batch, id_col, text_col)

    postings = ds.map_batches(mk, batch_format="pyarrow", zero_copy_batch=True).sort(
        ["token", id_col]
    )
    pipeline.write_encoded(pipeline.encode_dataset(postings, opts), out_dir)

    # distributed corpus constants: docs + token total (dl repeats per
    # posting, so sum tf — the actual token count — not dl)
    n_docs = ds.count()
    tok_total = 0
    enc = pipeline.read_encoded(out_dir, metadata_only=True)
    import json as _json

    for r in enc.select_columns(["stats"]).take_all():
        st = _json.loads(r["stats"])
        tok_total += int(st.get("tf", {}).get("sum", 0))
    meta = {
        "n_docs": int(n_docs),
        "tok_total": int(tok_total),  # exact int so appends stay drift-free
        "avgdl": (tok_total / n_docs) if n_docs else 0.0,
    }
    _write_meta_atomic(out_dir, meta)
    return meta


def append_bm25_index(
    ds,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    opts: dict | None = None,
) -> dict:
    """Incrementally add documents to an existing BM25 index WITHOUT
    rebuilding: the new docs' postings encode as an additional sorted
    run (new part files in the same directory — queries scan every
    file and zone maps/blooms prune per file, so a term lookup still
    touches only stripes that can hold it), and the corpus constants
    update by exact running totals kept in the meta JSON. Scores after
    append are identical to a from-scratch build over the union —
    pytest-enforced. Callers own id uniqueness across appends (same
    contract as the reference's append-only writer)."""
    import json
    import os

    from .. import pipeline

    with open(os.path.join(index_dir, _BM25_META)) as f:
        meta = json.load(f)
    old_tokens = meta.get("tok_total", round(meta["n_docs"] * meta["avgdl"]))

    def mk(batch: pa.Table) -> pa.Table:
        return bm25_postings_batch(batch, id_col, text_col)

    postings = ds.map_batches(mk, batch_format="pyarrow", zero_copy_batch=True).sort(
        ["token", id_col]
    )
    before = set(os.listdir(index_dir))
    pipeline.write_encoded(pipeline.encode_dataset(postings, opts), index_dir)
    new_files = [
        os.path.join(index_dir, f)
        for f in sorted(set(os.listdir(index_dir)) - before)
        if f.endswith(".parquet")
    ]
    import json as _json

    add_tokens = 0
    if new_files:
        enc = pipeline.read_encoded(new_files, metadata_only=True)
        for r in enc.select_columns(["stats"]).take_all():
            add_tokens += int(_json.loads(r["stats"]).get("tf", {}).get("sum", 0))
    n_docs = meta["n_docs"] + ds.count()
    tok_total = int(old_tokens) + int(add_tokens)
    meta = {
        "n_docs": int(n_docs),
        "tok_total": tok_total,
        "avgdl": (tok_total / n_docs) if n_docs else 0.0,
    }
    _write_meta_atomic(index_dir, meta)
    return meta


def bm25_search(
    index_dir: str,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
):
    """BM25 top-k over the index (Robertson/Sparck Jones idf with +1
    smoothing, the Lucene formulation): each unique query term is one
    pruned scan (zone maps + blooms skip stripes), df per term comes
    from the scans themselves (≤ n_terms driver-side rows), scoring is
    one vectorized pass over survivor postings, and the per-doc sum is
    a groupby over id-width rows. Returns (id, score_r6) sorted by
    (score desc, id), deterministically tie-broken; scores round to 6
    decimals so a SQL double oracle string-matches (ops/lm.py
    precedent)."""
    import json
    import math
    import os

    import numpy as np

    from .. import pipeline

    with open(os.path.join(index_dir, _BM25_META)) as f:
        meta = json.load(f)
    n, avgdl = meta["n_docs"], meta["avgdl"]

    uniq = _normalize_terms(terms)
    scans = [
        pipeline.filter_encoded(index_dir, "token", "eq", t, columns=["token", id_col, "tf", "dl"])
        for t in uniq
    ]
    hits = scans[0].union(*scans[1:]) if len(scans) > 1 else scans[0]
    # two consumers (df pass + scoring pass): materialize once or every
    # per-term pruned scan re-executes for each
    hits = hits.materialize()
    df_rows = hits.groupby("token").count().take_all()  # ≤ n_terms rows
    idf = {
        r["token"]: math.log(1.0 + (n - r["count()"] + 0.5) / (r["count()"] + 0.5))
        for r in df_rows
    }

    # vectorized idf lookup: index_in against the (tiny) query-term
    # vocabulary instead of a Python dict comprehension over postings
    idf_terms = pa.array(sorted(idf), pa.string())
    idf_w = np.array([idf[t] for t in sorted(idf)] + [0.0])  # [-1] = miss

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], t.schema.field(id_col).type),
                             "s": pa.array([], pa.float64())})
        pos = pc.index_in(t.column("token").combine_chunks(), idf_terms)
        w = idf_w[pos.fill_null(-1).to_numpy(zero_copy_only=False)]
        tf = t.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        s = w * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        return pa.table({id_col: t.column(id_col), "s": pa.array(s)})

    scored = hits.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    per_doc = scored.groupby(id_col).sum("s")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t.column(id_col),
                "score_r6": pc.round(t.column("sum(s)"), ndigits=6),
            }
        )

    return (
        per_doc.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["score_r6", id_col], descending=[True, False])
        .limit(k)
    )


def search_text_index(index_dir: str, terms: list[str], mode: str = "and", id_col: str = "doc_id"):
    """Doc ids matching ALL (`and`) or ANY (`or`) of `terms`. Each term
    is one pruned scan of the index (zone maps + blooms skip stripes);
    only (token, id) survivor rows reach the exchange."""
    from .. import pipeline

    uniq = _normalize_terms(terms)
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


def rrf_fuse(rankings, id_col: str = "doc_id", k: int = 10, c: int = 60,
             round_digits: int = 6):
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of
    ranked result lists: score(d) = sum over lists of 1/(c + rank_d),
    ranks 1-based within each list ordered by (score_r6 DESC, id).
    The standard way to combine retrieval runs (e.g. two BM25 queries,
    or BM25 + ANN) without score calibration.

    Inputs are top-N result Datasets/Tables from bm25_search — K rows
    each by construction — so fusion itself is a tiny driver-side
    numpy pass (the heavy work already happened inside each pruned
    index scan). Returns (id, rrf_r6) sorted by (rrf_r6 DESC, id),
    round-6 so a SQL double oracle string-matches."""
    import numpy as np

    scores: dict = {}
    for r in rankings:
        tbl = r if isinstance(r, pa.Table) else pa.Table.from_pylist(r.take_all())
        order = pc.sort_indices(
            tbl,
            sort_keys=[("score_r6", "descending"), (id_col, "ascending")],
        )
        ids = tbl.column(id_col).take(order).to_pylist()
        for rank, did in enumerate(ids, start=1):
            scores[did] = scores.get(did, 0.0) + 1.0 / (c + rank)
    items = sorted(
        ((did, float(np.round(s, round_digits))) for did, s in scores.items()),
        key=lambda t: (-t[1], t[0]),
    )[:k]
    return pa.table(
        {
            id_col: pa.array([d for d, _ in items]),
            "rrf_r6": pa.array([s for _, s in items], pa.float64()),
        }
    )


def positional_postings_batch(
    batch: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """(token, id, pos) rows — one per token OCCURRENCE, `pos` the
    0-based index in the doc's empty-filtered token sequence (matching
    list_filter(string_split_regex(...), x -> x <> '') positions in
    the SQL oracle). Fully vectorized: the per-doc position counter is
    arange minus each doc's first flat index (parent indices are
    sorted, so searchsorted(parent, parent) finds it)."""
    import numpy as np

    if batch.num_rows == 0:
        return pa.table(
            {
                "token": pa.array([], pa.string()),
                id_col: pa.array([], batch.schema.field(id_col).type),
                "pos": pa.array([], pa.int64()),
            }
        )
    toks = pc.split_pattern_regex(pc.utf8_lower(batch.column(text_col)), _TOKEN_SPLIT)
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    parent = pc.list_parent_indices(toks)
    flat_toks = toks.flatten()
    keep = pc.not_equal(flat_toks, "")
    parent_f = parent.filter(keep).to_numpy(zero_copy_only=False).astype(np.int64)
    pos = np.arange(len(parent_f), dtype=np.int64) - np.searchsorted(
        parent_f, parent_f, side="left"
    )
    return pa.table(
        {
            "token": flat_toks.filter(keep),
            id_col: batch.column(id_col).take(pa.array(parent_f)),
            "pos": pa.array(pos),
        }
    )


def build_positional_index(
    ds,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    opts: dict | None = None,
) -> None:
    """Positional inverted index: (token, id, pos) occurrences sorted
    by (token, id, pos) and encoded with the engine's writer — token
    dictionary/FSST, id and pos RLE/delta-friendly. Same pruning
    contract as the term index: stripe zone maps + blooms skip
    everything a term can't live in."""
    from .. import pipeline

    def mk(batch: pa.Table) -> pa.Table:
        return positional_postings_batch(batch, id_col, text_col)

    postings = ds.map_batches(mk, batch_format="pyarrow", zero_copy_batch=True).sort(
        ["token", id_col, "pos"]
    )
    pipeline.write_encoded(pipeline.encode_dataset(postings, opts), out_dir)


def _normalize_phrase(phrase: str) -> list[str]:
    """Index tokenizer applied to the phrase, ORDER PRESERVED (phrase
    semantics depend on it, unlike the sorted-set term queries)."""
    import re as _re

    toks = [p for p in _re.split(_TOKEN_SPLIT, str(phrase).lower()) if p]
    if not toks:
        raise ValueError(f"no searchable tokens in phrase {phrase!r}")
    return toks


def phrase_search(index_dir: str, phrase: str, id_col: str = "doc_id"):
    """Exact phrase match over the positional index: doc ids with at
    least one occurrence of the phrase's tokens at ADJACENT positions,
    plus the occurrence count. Classic positional-postings adjacency
    (Manning et al., IR ch. 2) made distributed: each DISTINCT term is
    one pruned scan; slot i's postings shift to a = pos - i; a phrase
    anchored at position a exists iff all k slots agree on (id, a) —
    one groupby-count over (id, a) width rows, never the corpus.

    Returns (id, n_matches BIGINT) sorted by id."""
    from .. import pipeline

    toks = _normalize_phrase(phrase)
    k = len(toks)
    scans = {}
    for t in set(toks):
        s = pipeline.filter_encoded(
            index_dir, "token", "eq", t, columns=[id_col, "pos"]
        )
        # a term filling several slots is scanned once and reused
        scans[t] = s.materialize() if toks.count(t) > 1 else s

    legs = []
    for i, t in enumerate(toks):
        def shift(batch: pa.Table, i=i) -> pa.Table:
            return pa.table(
                {
                    id_col: batch.column(id_col),
                    "a": pc.subtract(batch.column("pos"), i),
                }
            )

        legs.append(scans[t].map_batches(shift, batch_format="pyarrow"))
    u = legs[0].union(*legs[1:]) if k > 1 else legs[0]
    anchors = u.groupby([id_col, "a"]).count()

    def full(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("count()"), k)).select([id_col])

    hits = anchors.map_batches(full, batch_format="pyarrow")
    counted = hits.groupby(id_col).count()

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_matches": t.column("count()").cast(pa.int64()),
            }
        )

    return counted.map_batches(finish, batch_format="pyarrow").sort(id_col)
