"""Stripe assembly: Arrow table slice -> one encoded-stripe row and back.

The Ray-Data analog of the reference's stripe write/read path
(reference: pkg/store/MothWriter.go:187-266 flushStripe /
bufferStripeData, pkg/store/StripeReader.go:40-109 ReadStripe). A
"stripe" here is one output row of a parquet-friendly Arrow schema:

  stripe_key  lineage id ("{partition}-{seq}")
  n_rows / raw_bytes / enc_bytes
  meta        JSON: per-column encoding + stream index into `blob`
  schema_ipc  Arrow schema (IPC) of the original table
  stats       JSON per-column min/max/sum/null stats (pruning reads
              ONLY this column - SURVEY.md §2.7)
  blooms      concatenated per-column bloom bitsets (offsets in meta)
  blob        all encoded streams, each framed by codecs.frames

Stream blobs are general-compressed per stream with the store-raw rule
(reference MothOutputBuffer.go:348-371). Inside a stripe, columns are
encoded in independent row-group segments (10k rows, reference
MothWriterOptions.go:15) with per-group min/max riding in `meta`, so
readers skip non-matching groups without decompressing them
(select_row_groups / decode_stripe(row_groups=...)). Bloom filters
stay per-stripe.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import bloom as bloom_mod
from . import column as column_mod
from . import stats as stats_mod
from .codecs import frames

DEFAULT_OPTS = {
    "compression": "zstd",        # zstd|zlib|lz4|snappy|none (per-stream, store-raw rule)
    "string_encoding": "auto",    # auto|dict|direct|fsst
    "stripe_bytes": 64 << 20,     # reference stripeMaxSize, MothWriterOptions.go:13
    "stripe_rows": 1 << 20,
    "row_group_rows": 10_000,     # reference rowGroupMaxRowCount, MothWriterOptions.go:15
    "bloom": True,                # bloom filters for string columns
    "tri_bloom": True,            # trigram blooms: LIKE '%needle%' stripe pruning
    "fsst_enabled": True,
    "compress_min_bytes": 64,
}

STRIPE_SCHEMA = pa.schema(
    [
        ("stripe_key", pa.string()),
        ("n_rows", pa.int64()),
        ("raw_bytes", pa.int64()),
        ("enc_bytes", pa.int64()),
        ("meta", pa.string()),
        ("schema_ipc", pa.binary()),
        ("stats", pa.string()),
        ("blooms", pa.binary()),
        ("blob", pa.binary()),
    ]
)


def _serialize_schema(schema: pa.Schema) -> bytes:
    return schema.serialize().to_pybytes()


def _deserialize_schema(data: bytes) -> pa.Schema:
    return pa.ipc.read_schema(pa.BufferReader(data))


def _flatten_column(
    enc: column_mod.EncodedColumn, blob: list[bytes], pos: list[int], codec: str, min_comp: int
) -> dict:
    streams = []
    for kind, data in enc.streams.items():
        use_codec = codec if len(data) >= min_comp else "none"
        flag, payload = frames.compress_parts(data, use_codec)
        flen = 1 + len(payload)
        streams.append(
            {"kind": kind, "off": pos[0], "len": flen, "raw": len(data), "codec": use_codec}
        )
        blob.append(bytes([flag]))
        blob.append(payload)  # raw path: the original buffer, uncopied
        pos[0] += flen
    return {
        "encoding": enc.encoding,
        "num_values": enc.num_values,
        "extra": enc.extra,
        "streams": streams,
        "children": [_flatten_column(c, blob, pos, codec, min_comp) for c in enc.children],
    }


def _rebuild_column(meta: dict, blob) -> column_mod.EncodedColumn:
    # zero-copy slices; raw streams never copy. cast("B") so byte
    # indexing yields 0..255 regardless of the source buffer's format
    view = memoryview(blob).cast("B")
    streams = {}
    for s in meta["streams"]:
        framed = view[s["off"] : s["off"] + s["len"]]
        streams[s["kind"]] = frames.decompress(framed, s["codec"], s["raw"])
    return column_mod.EncodedColumn(
        encoding=meta["encoding"],
        num_values=meta["num_values"],
        streams=streams,
        children=[_rebuild_column(c, blob) for c in meta["children"]],
        extra=meta.get("extra", {}),
    )


def _rg_minmax(arr: pa.Array):
    """Compact per-row-group [min, max] for pruning; None when the type
    has no orderable stats (binary/nested) or values exceed the string
    stats limit."""
    import pyarrow.compute as pc

    t = arr.type
    if len(arr) == arr.null_count:
        return None
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        mm = pc.min_max(arr)
        return [mm["min"].as_py(), mm["max"].as_py()]
    if pa.types.is_timestamp(t):
        mm = pc.min_max(arr.cast(pa.int64()))
        return [mm["min"].as_py(), mm["max"].as_py()]
    if pa.types.is_date(t):  # epoch ints, matching the stripe stats unit
        vals = arr.cast(pa.int32()).cast(pa.int64()) if t.bit_width == 32 else arr.cast(pa.int64())
        mm = pc.min_max(vals)
        return [mm["min"].as_py(), mm["max"].as_py()]
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        mm = pc.min_max(arr)
        mn, mx = mm["min"].as_py(), mm["max"].as_py()
        if mn is not None and len(mn.encode()) <= stats_mod.STRING_STATS_LIMIT and len(mx.encode()) <= stats_mod.STRING_STATS_LIMIT:
            return [mn, mx]
    return None


def encode_stripe(tbl: pa.Table, opts: dict | None = None, stripe_key: str = "0-0") -> dict:
    """Encode one table slice into one stripe-row dict.

    Columns are encoded in ROW GROUPS of `row_group_rows` (reference
    10k default) with independent stream segments per row group, so the
    reader can decode only matching row groups (the reference's
    row-group seek/skip, StripeReader.selectRowGroups:272-293, without
    needing sub-stream checkpoints — each group's streams are simply
    separate blob slices)."""
    o = {**DEFAULT_OPTS, **(opts or {})}
    # fresh per-stripe cross-column dictionary budget (reference
    # DictionaryCompressionOptimizer dictionaryMaxMemory; see
    # column._try_dictionary) — column order is schema order, so
    # acceptance is deterministic under retries
    o["_dict_budget"] = {"remaining": o.get("dict_total_budget", column_mod.DICT_MAX_BYTES)}
    tbl = tbl.combine_chunks()
    n = tbl.num_rows
    rg_rows = o.get("row_group_rows") or n or 1
    rg_bounds = list(range(0, n, rg_rows)) or [0]
    blob: list[bytes] = []
    pos = [0]
    col_metas = {}
    col_stats = {}
    rg_stats: dict[str, list] = {}
    blooms: list[bytes] = []
    bloom_index = {}
    tri_index = {}
    bpos = 0
    col_plans = o.get("column_plans", {})
    for name in tbl.column_names:
        arr = tbl.column(name)
        arr = arr.chunk(0) if arr.num_chunks == 1 else arr.combine_chunks()
        if isinstance(arr, pa.ChunkedArray):  # 0-chunk empty table edge
            arr = pa.array([], type=arr.type)
        col_o = {**o, **col_plans[name]} if name in col_plans else o
        rg_trees = []
        rg_mm = []
        for s in rg_bounds:
            piece = arr.slice(s, rg_rows)
            enc = column_mod.encode_array(piece, col_o)
            rg_trees.append(
                _flatten_column(enc, blob, pos, o["compression"], o["compress_min_bytes"])
            )
            rg_mm.append(_rg_minmax(piece))
        col_metas[name] = {"row_groups": rg_trees}
        col_stats[name] = stats_mod.column_stats(arr)
        if any(m is not None for m in rg_mm):
            rg_stats[name] = rg_mm
        if (o["bloom"] or o.get("tri_bloom")) and (
            pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)
        ):
            values = arr.drop_null()
            lengths, data = column_mod._string_parts_view(values)
            if o["bloom"]:
                bf = bloom_mod.build(lengths, data)
                blooms.append(bf)
                bloom_index[name] = [bpos, len(bf)]
                bpos += len(bf)
            # trigram blooms only pay off on long-text columns —
            # short/categorical values (codes, enums) answer substring
            # predicates cheaply dictionary-domain and their stripes
            # rarely prune, so skip them at encode time
            if o.get("tri_bloom") and len(lengths) and (
                len(data) / len(lengths) >= o.get("tri_bloom_min_avg_len", 16)
            ):
                tb = bloom_mod.build_trigrams(lengths, data)
                blooms.append(tb)
                tri_index[name] = [bpos, len(tb)]
                bpos += len(tb)
    # single-pass assembly (r2 VERDICT item): stream payloads may be
    # zero-copy Arrow views (numpy uint8) — each part is copied exactly
    # ONCE into the preallocated blob instead of tobytes + join
    blob_bytes = bytearray(pos[0])
    mv = memoryview(blob_bytes)
    off = 0
    for part in blob:
        ln = len(part)
        mv[off : off + ln] = part
        off += ln
    del mv
    # NOTE: no timings inside the stripe row — stripe bytes must be
    # deterministic under task retries / job resume (wall-clock metrics
    # live in the checkpoint manifests instead)
    import zlib

    meta = {
        "columns": col_metas,
        "blooms": bloom_index,
        "tri_blooms": tri_index,
        "row_groups": {"rows": rg_rows, "count": len(rg_bounds), "stats": rg_stats},
        # end-to-end integrity: decode verifies the blob against this
        # before touching any stream (the reference has no stripe
        # checksum; bit-flips between writer and reader would surface
        # as codec garbage or silently wrong values)
        "blob_crc32": zlib.crc32(blob_bytes),
        "metrics": {
            "codecs": {n: m["row_groups"][0]["encoding"] for n, m in col_metas.items()},
            "compression": o["compression"],
        },
    }
    return {
        "stripe_key": stripe_key,
        "n_rows": tbl.num_rows,
        "raw_bytes": tbl.nbytes,
        "enc_bytes": len(blob_bytes),
        "meta": json.dumps(meta),
        "schema_ipc": _serialize_schema(tbl.schema),
        "stats": json.dumps(col_stats),
        "blooms": b"".join(blooms),
        "blob": blob_bytes,
    }


def split_for_stripes(tbl: pa.Table, opts: dict | None = None) -> list[pa.Table]:
    """Split a batch into stripe-sized slices by row and logical-byte
    budget (the reference's chunking loop, MothWriter.go:127-137)."""
    o = {**DEFAULT_OPTS, **(opts or {})}
    n = tbl.num_rows
    if n == 0:
        return []
    bytes_per_row = max(tbl.nbytes / n, 1)
    rows_budget = int(min(o["stripe_rows"], max(64, o["stripe_bytes"] / bytes_per_row)))
    return [tbl.slice(s, rows_budget) for s in range(0, n, rows_budget)]


def _batch_fsst_tables(tbl: pa.Table, opts: dict | None) -> dict | None:
    """Train one FSST symbol table per eligible string column per BATCH
    instead of per stripe/row-group: the table rides in every stripe's
    DICTIONARY_DATA slot exactly as before (decode unchanged), but the
    training pass — the dominant string-encode cost — runs once per
    batch. Columns already carrying a plan (sampling-pass fsst_table)
    are left alone. Returns augmented column_plans, or None."""
    from .codecs import fsst as fsst_codec

    o = {**DEFAULT_OPTS, **(opts or {})}
    if not o.get("fsst_enabled", True) or o.get("string_encoding") not in (None, "auto", "fsst"):
        return None
    plans = dict(o.get("column_plans", {}))
    added = False
    for name in tbl.column_names:
        arr = tbl.column(name)
        if not (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)):
            continue
        if name in plans:
            p = plans[name]
            if "fsst_table" in p:
                continue  # sampling-pass table already broadcast
            if p.get("string_encoding") not in (None, "auto", "fsst"):
                continue  # planned dict/direct: no table needed
        values = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        if values.null_count:
            values = values.fill_null("")
        _, data = column_mod._string_parts_view(values)
        if len(data) < 4096:
            continue
        table = fsst_codec.train(data)
        plans[name] = {**plans.get(name, {}), "fsst_table": table.serialize()}
        added = True
    return plans if added else None


def encode_batch(tbl: pa.Table, opts: dict | None = None, key_prefix: str = "0") -> pa.Table:
    """Table batch -> table of stripe rows (>= 1)."""
    plans = _batch_fsst_tables(tbl, opts)
    if plans is not None:
        opts = {**(opts or {}), "column_plans": plans}
    rows = [
        encode_stripe(part, opts, stripe_key=f"{key_prefix}-{i}")
        for i, part in enumerate(split_for_stripes(tbl, opts))
    ]
    if not rows:
        return STRIPE_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=STRIPE_SCHEMA)


def select_row_groups(meta: dict, column: str, min_value=None, max_value=None) -> list[int] | None:
    """Row-group indices whose [min,max] overlaps the predicate — the
    reference's selectRowGroups. None = no per-rg stats (keep all)."""
    rg = meta.get("row_groups", {})
    mm = rg.get("stats", {}).get(column)
    if not mm:
        return None
    keep = []
    for i, entry in enumerate(mm):
        if entry is None:
            keep.append(i)
            continue
        lo, hi = entry
        if min_value is not None and hi is not None and hi < min_value:
            continue
        if max_value is not None and lo is not None and lo > max_value:
            continue
        keep.append(i)
    return keep


def decode_stripe(
    row: dict,
    columns: list[str] | None = None,
    row_groups: list[int] | None = None,
    target_schema: pa.Schema | None = None,
) -> pa.Table:
    """One stripe-row dict -> original table slice (bit-identical).

    `row_groups` decodes only the named groups (stats-driven skipping
    at reference row-group granularity — unselected groups' streams
    are never decompressed)."""
    schema = _deserialize_schema(row["schema_ipc"])
    meta = json.loads(row["meta"])
    blob = row["blob"]
    expect_crc = meta.get("blob_crc32")  # absent on pre-checksum stripes
    if expect_crc is not None:
        import zlib

        got = zlib.crc32(blob)
        if got != expect_crc:
            raise ValueError(
                f"stripe {row.get('stripe_key')}: blob checksum mismatch "
                f"(stored {expect_crc:#010x}, computed {got:#010x}) — "
                "encoded data corrupted between write and read"
            )
    if target_schema is not None:
        # schema evolution via case-insensitive NAME-based field mapping
        # (reference NameBasedFieldMapper.go:23-31): the output follows
        # target_schema; fields absent from the stored schema come back
        # as typed nulls, stored fields cast to the requested type.
        # Only the matched stored columns are decoded.
        stored = {n.lower(): n for n in schema.names}
        n_rows = row["n_rows"]
        matched = [
            stored[f.name.lower()] for f in target_schema if f.name.lower() in stored
        ]
        base = decode_stripe(row, matched, row_groups)
        if matched:
            out_rows = base.num_rows
        elif row_groups is None:
            out_rows = n_rows
        else:
            rg = meta["row_groups"]
            r, c = rg["rows"], rg["count"]
            out_rows = sum(
                (n_rows - r * (c - 1)) if i == c - 1 else r for i in row_groups
            )
        by_name = {n.lower(): base.column(n) for n in base.column_names}
        arrays = []
        for f in target_schema:
            col = by_name.get(f.name.lower())
            if col is None:
                arrays.append(pa.nulls(out_rows, type=f.type))
            else:
                arrays.append(col if col.type == f.type else col.cast(f.type))
        return pa.Table.from_arrays(arrays, schema=target_schema)
    names = columns if columns is not None else schema.names
    arrays = []
    fields = []
    for name, paths in _group_projection(names, meta["columns"]):
        trees = meta["columns"][name]["row_groups"]
        idx = row_groups if row_groups is not None else range(len(trees))
        field = schema.field(name)
        if paths is not None:
            # nested-field projection (reference ProjectedLayout,
            # MothReader.go:184-255): prune the stream tree BEFORE
            # rebuild, so unselected sibling subfields' streams are
            # never decompressed, let alone decoded
            t0 = field.type
            pruned_type = None
            pieces = []
            for i in idx:
                ptree, pruned_type = _prune_struct_tree(trees[i], t0, paths)
                pieces.append(
                    column_mod.decode_array(_rebuild_column(ptree, blob), pruned_type)
                )
            if pruned_type is None:  # empty row-group selection
                _, pruned_type = _prune_struct_tree(trees[0], t0, paths)
            field = pa.field(field.name, pruned_type, field.nullable)
        else:
            t = field.type
            pieces = [
                column_mod.decode_array(_rebuild_column(trees[i], blob), t) for i in idx
            ]
        if not pieces:
            arrays.append(pa.array([], type=field.type))
        else:
            arrays.append(pa.concat_arrays(pieces) if len(pieces) != 1 else pieces[0])
        fields.append(field)
    return pa.Table.from_arrays(arrays, schema=pa.schema(fields))


def _group_projection(names: list[str], stored_columns: dict) -> list[tuple]:
    """Parse a projection list into [(top_name, paths_dict | None)].

    `paths_dict` is a nested {child_name: {} | deeper} tree for dotted
    names ("props.user_id"); None means the whole column. A stored
    column whose NAME contains a literal dot always wins over the
    projection parse (compat with pre-existing dotted names). Multiple
    subfields of one struct group into a single output column, order of
    first appearance."""
    order: list[str] = []
    spec: dict[str, dict | None] = {}
    for name in names:
        if name in stored_columns or "." not in name:
            if name not in spec or spec[name] is not None:
                if name not in spec:
                    order.append(name)
                spec[name] = None
            continue
        top, rest = name.split(".", 1)
        if top not in stored_columns:
            raise KeyError(f"projection {name!r}: no stored column {top!r}")
        if top not in spec:
            order.append(top)
            spec[top] = {}
        node = spec[top]
        if node is None:
            continue  # whole column already requested; subset is moot
        for part in rest.split("."):
            node = node.setdefault(part, {})
    return [(n, spec[n]) for n in order]


def _prune_struct_tree(tree: dict, t: pa.DataType, paths: dict) -> tuple[dict, pa.DataType]:
    """Pruned (stream-tree meta, arrow type) keeping only `paths`'
    subfields of a struct column. The struct node's own streams
    (PRESENT) survive; unselected children vanish from the tree, so
    _rebuild_column never touches their stream bytes (the pytest
    contract for nested projection). Projection passes THROUGH list
    levels transparently ("items.price" on list<struct<...>> keeps the
    LIST node's LENGTH/PRESENT streams and prunes inside the element
    struct), matching the reference ProjectedLayout's recursive
    included-subtree walk (MothReader.go:184-255)."""
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        ctree, ctype = _prune_struct_tree(tree["children"][0], t.value_type, paths)
        outer = pa.large_list(ctype) if pa.types.is_large_list(t) else pa.list_(ctype)
        return {**tree, "children": [ctree]}, outer
    if not pa.types.is_struct(t):
        raise TypeError(f"nested projection into non-struct type {t}")
    fields = []
    children = []
    for child_name, sub in paths.items():
        i = t.get_field_index(child_name)
        if i < 0:
            raise KeyError(f"projection: struct has no field {child_name!r}")
        f = t.field(i)
        child_tree = tree["children"][i]
        if sub:
            ctree, ctype = _prune_struct_tree(child_tree, f.type, sub)
            children.append(ctree)
            fields.append(pa.field(f.name, ctype, f.nullable))
        else:
            children.append(child_tree)
            fields.append(f)
    pruned = {**tree, "children": children}
    return pruned, pa.struct(fields)


def decode_batch(stripes: pa.Table, columns: list[str] | None = None) -> pa.Table:
    """Table of stripe rows -> concatenated decoded table."""
    parts = [decode_stripe(row, columns) for row in stripes.to_pylist()]
    if not parts:
        return pa.table({})
    return pa.concat_tables(parts)


def add_column_to_stripe(row: dict, name: str, values, opts: dict | None = None) -> dict:
    """Append ONE new column to an existing stripe row WITHOUT touching
    any existing stream: the new column's streams are encoded into a
    segment appended after the current blob, existing offsets stay
    valid, and meta/schema/stats gain the new entry. Row-group
    boundaries mirror the stripe's existing layout so rg-granular
    pruning works on the added column too. (No bloom filter is built
    for added columns — blooms are an encode-time feature.)"""
    import zlib

    o = {**DEFAULT_OPTS, **(opts or {})}
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    meta = json.loads(row["meta"])
    schema = _deserialize_schema(row["schema_ipc"])
    if name in meta["columns"]:
        raise ValueError(f"column {name!r} already present in stripe")
    n = row["n_rows"]
    if len(values) != n:
        raise ValueError(f"values length {len(values)} != stripe rows {n}")
    rg_rows = meta["row_groups"]["rows"]
    rg_bounds = list(range(0, n, rg_rows)) or [0]
    old_blob = row["blob"]
    parts: list = []
    pos = [len(old_blob)]
    rg_trees = []
    rg_mm = []
    for s in rg_bounds:
        piece = values.slice(s, rg_rows)
        enc = column_mod.encode_array(piece, o)
        rg_trees.append(_flatten_column(enc, parts, pos, o["compression"], o["compress_min_bytes"]))
        rg_mm.append(_rg_minmax(piece))
    new_blob = bytearray(pos[0])
    mv = memoryview(new_blob)
    mv[: len(old_blob)] = old_blob
    off = len(old_blob)
    for part in parts:
        ln = len(part)
        mv[off : off + ln] = part
        off += ln
    del mv
    meta["columns"][name] = {"row_groups": rg_trees}
    if any(m is not None for m in rg_mm):
        meta["row_groups"].setdefault("stats", {})[name] = rg_mm
    meta["blob_crc32"] = zlib.crc32(new_blob)
    meta.setdefault("metrics", {}).setdefault("codecs", {})[name] = rg_trees[0]["encoding"]
    col_stats = json.loads(row["stats"])
    col_stats[name] = stats_mod.column_stats(values)
    return {
        **row,
        "raw_bytes": row["raw_bytes"] + values.nbytes,
        "enc_bytes": len(new_blob),
        "meta": json.dumps(meta),
        "schema_ipc": _serialize_schema(schema.append(pa.field(name, values.type))),
        "stats": json.dumps(col_stats),
        "blob": new_blob,
    }


def replace_column_in_stripe(
    row: dict,
    name: str,
    values,
    opts: dict | None = None,
    old_nbytes: int | None = None,
    allow_type_change: bool = False,
    add: bool = False,
) -> dict:
    """Replace ONE existing column's values in a stripe row re-encoding
    ONLY that column: the new streams are encoded fresh, every other
    column's stream bytes are memcpy'd (never decoded or re-encoded)
    into a rebuilt blob with rebased offsets — no dead bytes are left
    behind. Stats, row-group min/max and the column's bloom filter (if
    the encode built one) are rebuilt from the new values; the type
    must match the stored schema (UPDATE preserves schema). This is
    the columnar-native UPDATE write path: cost scales with the
    updated column, not the stripe width."""
    import zlib

    o = {**DEFAULT_OPTS, **(opts or {})}
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    meta = json.loads(row["meta"])
    schema = _deserialize_schema(row["schema_ipc"])
    new_schema_ipc = None
    if add:
        # ADD COLUMN: append a fresh field; everything below then
        # treats it like a replace whose "old" streams are empty
        if name in meta["columns"]:
            raise KeyError(f"column {name!r} already present in stripe")
        schema = schema.append(pa.field(name, values.type, nullable=True))
        new_schema_ipc = _serialize_schema(schema)
    elif name not in meta["columns"]:
        raise KeyError(f"column {name!r} not present in stripe")
    t = values.type if add else schema.field(name).type
    if values.type != t:
        if not allow_type_change:
            raise TypeError(
                f"UPDATE must preserve type: column {name!r} is {t}, got {values.type}"
            )
        # schema evolution (cast_column): swap the field type in the
        # stripe's own schema — decode reads per-stripe schemas, so
        # each rewritten stripe is immediately self-consistent
        i = schema.get_field_index(name)
        schema = schema.set(i, pa.field(name, values.type, schema.field(i).nullable))
        new_schema_ipc = _serialize_schema(schema)
    n = row["n_rows"]
    if len(values) != n:
        raise ValueError(f"values length {len(values)} != stripe rows {n}")
    rg_rows = meta["row_groups"]["rows"]
    rg_bounds = list(range(0, n, rg_rows)) or [0]
    # encode the new column into its own contiguous segment
    new_parts: list = []
    pos = [0]
    new_trees = []
    rg_mm = []
    for s in rg_bounds:
        piece = values.slice(s, rg_rows)
        enc = column_mod.encode_array(piece, o)
        new_trees.append(_flatten_column(enc, new_parts, pos, o["compression"], o["compress_min_bytes"]))
        rg_mm.append(_rg_minmax(piece))
    new_seg = bytearray(pos[0])
    mv = memoryview(new_seg)
    off = 0
    for part in new_parts:
        ln = len(part)
        mv[off : off + ln] = part
        off += ln
    del mv
    meta["columns"][name] = {"row_groups": new_trees}
    # rebase every column's streams into one fresh blob (schema order):
    # unchanged columns slice out of the old blob, the replaced column
    # out of its new segment — pure memcpy either way
    old_view = memoryview(row["blob"]).cast("B")
    new_view = memoryview(new_seg)
    out_parts: list = []
    new_off = [0]

    def rebase(tree: dict, src) -> None:
        for s in tree["streams"]:
            out_parts.append(src[s["off"] : s["off"] + s["len"]])
            s["off"] = new_off[0]
            new_off[0] += s["len"]
        for c in tree["children"]:
            rebase(c, src)

    for col in schema.names:
        src = new_view if col == name else old_view
        for tree in meta["columns"][col]["row_groups"]:
            rebase(tree, src)
    blob = bytearray(new_off[0])
    mv = memoryview(blob)
    off = 0
    for part in out_parts:
        ln = len(part)
        mv[off : off + ln] = part
        off += ln
    del mv
    # row-group stats for the replaced column
    rg_stats = meta["row_groups"].setdefault("stats", {})
    if any(m is not None for m in rg_mm):
        rg_stats[name] = rg_mm
    else:
        rg_stats.pop(name, None)
    # bloom rebuild: blooms live in a separate concatenated buffer
    blooms = row["blooms"]
    bloom_index = meta.get("blooms", {})
    tri_index = meta.get("tri_blooms", {})
    if name in bloom_index or name in tri_index:
        is_str = pa.types.is_string(values.type) or pa.types.is_large_string(values.type)
        if is_str:
            nn = values.drop_null()
            lengths, data = column_mod._string_parts_view(nn)
            new_bloom = bloom_mod.build(lengths, data) if name in bloom_index else None
            new_tri = bloom_mod.build_trigrams(lengths, data) if name in tri_index else None
        else:  # type-changing replace: the column sheds its blooms
            new_bloom = new_tri = None
            bloom_index.pop(name, None)
            tri_index.pop(name, None)
        parts = []
        bpos = 0
        for idx_map, fresh in ((bloom_index, new_bloom), (tri_index, new_tri)):
            for col, (boff, blen) in idx_map.items():
                part = (
                    fresh
                    if col == name and fresh is not None
                    else bytes(memoryview(blooms)[boff : boff + blen])
                )
                idx_map[col] = [bpos, len(part)]
                parts.append(part)
                bpos += len(part)
        blooms = b"".join(parts)
    meta["blob_crc32"] = zlib.crc32(blob)
    meta.setdefault("metrics", {}).setdefault("codecs", {})[name] = new_trees[0]["encoding"]
    col_stats = json.loads(row["stats"])
    col_stats[name] = stats_mod.column_stats(values)
    raw_bytes = row["raw_bytes"]
    if old_nbytes is not None:
        raw_bytes += values.nbytes - old_nbytes
    out = {
        **row,
        "raw_bytes": raw_bytes,
        "enc_bytes": len(blob),
        "meta": json.dumps(meta),
        "stats": json.dumps(col_stats),
        "blooms": blooms,
        "blob": blob,
    }
    if new_schema_ipc is not None:
        out["schema_ipc"] = new_schema_ipc
    return out


def vacuum_stripe_blob(row: dict) -> dict:
    """Rebuild the blob keeping only the streams meta still references,
    rebasing offsets — a pure memcpy that reclaims the dead bytes a
    metadata-only DROP (_rewrite_stripe_columns) leaves behind, without
    decoding or re-encoding anything. A no-op (same bytes, new
    checksum) on stripes with no dead streams."""
    import zlib

    meta = json.loads(row["meta"])
    old_view = memoryview(row["blob"]).cast("B")
    out_parts: list = []
    new_off = [0]

    def rebase(tree: dict) -> None:
        for s in tree["streams"]:
            out_parts.append(old_view[s["off"] : s["off"] + s["len"]])
            s["off"] = new_off[0]
            new_off[0] += s["len"]
        for c in tree["children"]:
            rebase(c)

    for col in meta["columns"]:
        for tree in meta["columns"][col]["row_groups"]:
            rebase(tree)
    blob = bytearray(new_off[0])
    mv = memoryview(blob)
    off = 0
    for part in out_parts:
        ln = len(part)
        mv[off : off + ln] = part
        off += ln
    del mv
    meta["blob_crc32"] = zlib.crc32(blob)
    return {**row, "enc_bytes": len(blob), "meta": json.dumps(meta), "blob": blob}


_PC_OPS = {
    "eq": "equal",
    "ne": "not_equal",
    "lt": "less",
    "le": "less_equal",
    "gt": "greater",
    "ge": "greater_equal",
}


def like_prefix(pattern: str) -> str:
    """Literal prefix of a SQL LIKE pattern (text before the first
    % or _ wildcard) — the part zone maps can prune on."""
    for i, ch in enumerate(pattern):
        if ch in "%_":
            return pattern[:i]
    return pattern


def like_literal_runs(pattern: str) -> list[str]:
    """Literal segments of a LIKE pattern (text between % / _
    wildcards) long enough to carry a trigram — each is a REQUIRED
    substring of any match, so all are conjunctive trigram-bloom
    prune keys ('%quick%brown%' -> ['quick', 'brown'])."""
    import re as _re

    return [r for r in _re.split(r"[%_]", pattern) if len(r.encode()) >= 3]


def prefix_upper(prefix: str) -> str | None:
    """Smallest string (by code-point order, which is how zone-map
    stats compare) greater than EVERY string starting with `prefix`;
    None when no finite upper bound exists. Standard prefix->range
    rewrite: value LIKE 'ab%'  <=>  'ab' <= value < prefix_upper('ab')."""
    cps = list(prefix)
    while cps and ord(cps[-1]) >= 0x10FFFF:
        cps.pop()
    if not cps:
        return None
    return "".join(cps[:-1]) + chr(ord(cps[-1]) + 1)


def string_pred_bounds(op: str, value) -> tuple:
    """(lo, hi) zone-map bounds implied by a predicate, for stripe and
    row-group pruning. hi for prefix/like is the exclusive upper bound
    of the prefix range (inclusive pruning keeps it conservative)."""
    if op in ("contains", "is_null", "not_null"):
        return (None, None)  # no zone-map bounds (blooms / null counts prune)
    if op in ("prefix", "like"):
        pre = value if op == "prefix" else like_prefix(value)
        return (pre or None, prefix_upper(pre) if pre else None)
    if op == "in":
        # conservative zone map for an IN list: [min, max] of the
        # non-null values (SQL semantics: nulls in the list never match)
        vals = [v for v in value if v is not None]
        if not vals:
            return (None, None)
        return (min(vals), max(vals))
    lo = value if op in ("eq", "ge", "gt") else None
    hi = value if op in ("eq", "le", "lt") else None
    return (lo, hi)


def is_temporal_value(value) -> bool:
    import datetime as _dt

    return isinstance(value, (_dt.date, _dt.datetime, np.datetime64))


def stat_bound(value, unit: str | None):
    """Translate a temporal predicate bound into the int64 epoch domain
    zone-map stats store for timestamp columns (stats.py keeps min/max
    as `arr.cast(int64)` in the column's own unit). Non-temporal values
    and None pass through; a temporal value with UNKNOWN unit returns
    None (prune conservatively: no bound)."""
    import datetime as _dt

    if value is None or not is_temporal_value(value):
        return value
    if unit is None:
        return None
    if unit == "D":  # date32 stats: epoch days; truncation is
        # conservative in both bound directions (day containing the
        # value overlaps the value)
        if isinstance(value, np.datetime64):
            return int(value.astype("datetime64[D]").astype(np.int64))
        d = value.date() if isinstance(value, _dt.datetime) else value
        return (d - _dt.date(1970, 1, 1)).days
    if isinstance(value, _dt.datetime):
        ts_t = pa.timestamp(unit, tz="UTC") if value.tzinfo else pa.timestamp(unit)
        return pa.scalar(value, type=ts_t).value
    if isinstance(value, _dt.date):
        return pa.scalar(_dt.datetime.combine(value, _dt.time()), type=pa.timestamp(unit)).value
    return pa.scalar(value).cast(pa.timestamp(unit)).value  # np.datetime64


def stat_bounds_for(op: str, value, t: pa.DataType | None) -> tuple:
    """string_pred_bounds normalized for the stats domain of column
    type `t`: timestamp predicates become int64 epoch ints in t's
    unit, so select_row_groups / zone-map compares stay same-type."""
    import datetime as _dt

    lo, hi = string_pred_bounds(op, value)
    if t is not None and pa.types.is_timestamp(t):
        return stat_bound(lo, t.unit), stat_bound(hi, t.unit)
    if t is not None and pa.types.is_date(t):
        unit = "D" if t.bit_width == 32 else "ms"
        return stat_bound(lo, unit), stat_bound(hi, unit)
    probe = lo if op == "in" else value  # IN carries a list; test a bound
    if is_temporal_value(probe) or isinstance(probe, _dt.time):
        return None, None  # temporal pred on other storage: no stats prune
    return lo, hi


def _apply_pred(arr, op: str, value):
    """Evaluate one predicate on an Arrow array: comparison ops via
    _PC_OPS; `prefix` -> starts_with; `like` -> SQL LIKE semantics
    (pc.match_like: % = any run, _ = any one char)."""
    if op == "is_null":
        return pc.is_null(arr)
    if op == "not_null":
        return pc.is_valid(arr)
    if op == "prefix":
        return pc.starts_with(arr, pattern=value)
    if op == "like":
        return pc.match_like(arr, value)
    if op == "contains":
        return pc.match_substring(arr, value)
    if op in ("in", "not_in"):
        vals = [v for v in value if v is not None]
        t = arr.type
        try:
            vset = pa.array(vals, type=t)
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            vset = pa.array(vals)
        hit = pc.is_in(arr, value_set=vset)
        if op == "in":
            return hit
        # NOT IN: nulls never match (predicate_mask ANDs validity)
        return pc.invert(hit)
    return getattr(pc, _PC_OPS[op])(arr, value)


def predicate_mask(tree: dict, blob, t: pa.DataType, n: int, op: str, value) -> np.ndarray:
    """Boolean hit mask for ONE row group of ONE column, decoding as
    little as possible. Dictionary-encoded strings take the
    dictionary-domain fast path: the predicate runs on the `card`
    dictionary values only, then the (integer) index stream is tested
    against the matching-code lookup — per-row strings are never
    materialized (the classic late-materialization trick; reference
    decodes values before any predicate, StripeReader.NextBatch).
    Nulls never match (SQL comparison semantics). `is_null`/`not_null`
    evaluate on the PRESENT stream ALONE — that one stream is the only
    thing decompressed; a null-free row group (PRESENT omitted) answers
    from stream metadata without touching the blob at all."""
    from .codecs import boolrle, rlev2

    if op in ("is_null", "not_null"):
        pres = next(
            (s for s in tree["streams"] if s["kind"] == column_mod.PRESENT), None
        )
        if pres is None:  # null-free group: PRESENT stream omitted
            return (
                np.zeros(n, dtype=bool) if op == "is_null" else np.ones(n, dtype=bool)
            )
        view = memoryview(blob).cast("B")
        framed = view[pres["off"] : pres["off"] + pres["len"]]
        valid, _ = boolrle.decode(
            frames.decompress(framed, pres["codec"], pres["raw"]), n
        )
        valid = np.asarray(valid, dtype=bool)
        return ~valid if op == "is_null" else valid

    enc = _rebuild_column(tree, blob)
    valid = None
    n_eff = n
    if column_mod.PRESENT in enc.streams:
        valid, _ = boolrle.decode(enc.streams[column_mod.PRESENT], n)
        n_eff = int(valid.sum())
    if (
        (pa.types.is_string(t) or pa.types.is_large_string(t))
        and enc.encoding == column_mod.ENC_DICT
    ):
        import pyarrow.compute as pc

        s = enc.streams
        card = enc.extra["dict_size"]
        dlen, _ = rlev2.decode(s[column_mod.LENGTH], card, signed=False)
        dict_arr = column_mod._build_string_array(
            pa.utf8(), dlen.astype(np.int64), s[column_mod.DICTIONARY_DATA], card
        )
        lut = _apply_pred(dict_arr, op, value).to_numpy(zero_copy_only=False)
        lut = np.asarray(lut, dtype=bool)
        indices, _ = rlev2.decode(s[column_mod.DATA], n_eff, signed=False)
        hits = lut[indices.astype(np.int64)]
    else:
        import pyarrow.compute as pc

        arr = column_mod._decode_values(enc, t, n_eff)
        h = _apply_pred(arr, op, value)
        hits = np.asarray(pc.fill_null(h, False).to_numpy(zero_copy_only=False), dtype=bool)
    if valid is None:
        return hits
    full = np.zeros(n, dtype=bool)
    full[valid] = hits
    return full


def _dict_key_codes(enc, t: pa.DataType, n: int):
    """Shared dictionary fast path for the aggregate pushdowns: for a
    dict-encoded string column, (dict_values list, FULL-LENGTH int64
    code vector with `card` as the null slot, card) — per-row strings
    never materialize. None when the column is not dict-encoded (the
    caller decodes values instead). predicate_mask keeps its own
    valid-only variant (it needs the mask, not full-length codes)."""
    from .codecs import boolrle, rlev2

    if not (
        (pa.types.is_string(t) or pa.types.is_large_string(t))
        and enc.encoding == column_mod.ENC_DICT
    ):
        return None
    s = enc.streams
    card = enc.extra["dict_size"]
    dlen, _ = rlev2.decode(s[column_mod.LENGTH], card, signed=False)
    dict_vals = column_mod._build_string_array(
        pa.utf8(), dlen.astype(np.int64), s[column_mod.DICTIONARY_DATA], card
    ).to_pylist()
    if column_mod.PRESENT in s:
        valid, _ = boolrle.decode(s[column_mod.PRESENT], n)
        valid = np.asarray(valid, dtype=bool)
        n_eff = int(valid.sum())
    else:
        valid, n_eff = None, n
    idx, _ = rlev2.decode(s[column_mod.DATA], n_eff, signed=False)
    codes = np.full(n, card, dtype=np.int64)
    if valid is None:
        codes = idx.astype(np.int64)
    else:
        codes[valid] = idx.astype(np.int64)
    return dict_vals, codes, card


def group_count_stripe(row: dict, column: str) -> pa.Table:
    """GROUP BY <column> COUNT(*) partial from ONE stripe without
    materializing per-row values: a dictionary-encoded string row group
    answers from its dictionary + ONE np.bincount over the integer
    index stream (per-row strings never build — the same
    late-materialization trick predicate_mask uses, aimed at
    aggregation); other encodings decode the single column and run an
    Arrow value_counts. Null keys form their own group (SQL GROUP BY
    semantics), counted from the PRESENT stream alone. Only the one
    column's streams are decompressed; the rest of the stripe's blob is
    never touched. Output: (column, cnt) rows bounded by the stripe's
    local cardinality."""
    from .codecs import boolrle, rlev2

    schema = _deserialize_schema(row["schema_ipc"])
    meta = json.loads(row["meta"])
    blob = row["blob"]
    t = schema.field(column).type
    rg = meta["row_groups"]
    rgr, rgc = rg["rows"], rg["count"]
    n_rows = row["n_rows"]
    trees = meta["columns"][column]["row_groups"]
    counts: dict = {}
    null_cnt = 0
    val_parts: list[pa.Array] = []
    for i in range(rgc):
        n = (n_rows - rgr * (rgc - 1)) if i == rgc - 1 else rgr
        enc = _rebuild_column(trees[i], blob)
        dk = _dict_key_codes(enc, t, n)
        if dk is not None:
            dict_vals, codes, card = dk
            bc = np.bincount(codes, minlength=card + 1)
            null_cnt += int(bc[card])
            for v, c in zip(dict_vals, bc[:card].tolist()):
                if c:
                    counts[v] = counts.get(v, 0) + c
            continue
        n_eff = n
        if column_mod.PRESENT in enc.streams:
            valid, _ = boolrle.decode(enc.streams[column_mod.PRESENT], n)
            n_eff = int(np.asarray(valid, dtype=bool).sum())
            null_cnt += n - n_eff
        if n_eff == 0:
            continue
        val_parts.append(column_mod._decode_values(enc, t, n_eff))
    if val_parts:
        import pyarrow.compute as pc

        vc = pc.value_counts(pa.chunked_array(val_parts))
        for rec in vc.to_pylist():
            counts[rec["values"]] = counts.get(rec["values"], 0) + rec["counts"]
    keys = list(counts.keys())
    cnts = list(counts.values())
    if null_cnt:
        keys.append(None)
        cnts.append(null_cnt)
    return pa.table(
        {column: pa.array(keys, type=t), "cnt": pa.array(cnts, type=pa.int64())}
    )


def filter_stripe(row: dict, column: str, op: str, value, columns: list[str] | None = None) -> pa.Table:
    """Predicate-pushdown decode of one stripe: row groups prune by
    min/max stats first; survivors build a hit mask from the predicate
    column ALONE (dictionary-domain when dict-encoded); only row
    groups with hits decode the projected columns (late
    materialization at row-group granularity — a no-hit group's other
    streams are never decompressed)."""
    schema = _deserialize_schema(row["schema_ipc"])
    meta = json.loads(row["meta"])
    blob = row["blob"]
    names = columns if columns is not None else schema.names
    t = schema.field(column).type
    lo, hi = stat_bounds_for(op, value, t)
    keep = None if op in ("ne", "not_in") else select_row_groups(meta, column, lo, hi)
    trees = meta["columns"][column]["row_groups"]
    if keep is None:
        keep = list(range(len(trees)))
    rg = meta["row_groups"]
    rgr, rgc = rg["rows"], rg["count"]
    n_rows = row["n_rows"]
    out_schema = pa.schema([schema.field(nm) for nm in names])
    parts = []
    for i in keep:
        n = (n_rows - rgr * (rgc - 1)) if i == rgc - 1 else rgr
        mask = predicate_mask(trees[i], blob, t, n, op, value)
        if not mask.any():
            continue
        parts.append(decode_stripe(row, names, [i]).filter(pa.array(mask)))
    if not parts:
        return out_schema.empty_table()
    return pa.concat_tables(parts)


def filter_stripe_multi(
    row: dict, preds: list[tuple], columns: list[str] | None = None
) -> pa.Table:
    """Conjunctive (AND) predicate-pushdown decode of one stripe: the
    surviving row-group set is the INTERSECTION of each predicate's
    zone-map selection, and the hit mask is the AND of the per-column
    masks — evaluated short-circuit (a row group that zeroes out on
    one predicate never evaluates the rest, and never decodes the
    projected columns)."""
    schema = _deserialize_schema(row["schema_ipc"])
    meta = json.loads(row["meta"])
    blob = row["blob"]
    names = columns if columns is not None else schema.names
    rg = meta["row_groups"]
    rgr, rgc = rg["rows"], rg["count"]
    n_rows = row["n_rows"]
    keep = set(range(rgc))
    for col, op, value in preds:
        if op in ("ne", "not_in"):
            continue
        lo, hi = stat_bounds_for(op, value, schema.field(col).type)
        sel = select_row_groups(meta, col, lo, hi)
        if sel is not None:
            keep &= set(sel)
    out_schema = pa.schema([schema.field(nm) for nm in names])
    parts = []
    for i in sorted(keep):
        n = (n_rows - rgr * (rgc - 1)) if i == rgc - 1 else rgr
        mask = np.ones(n, dtype=bool)
        for col, op, value in preds:
            trees = meta["columns"][col]["row_groups"]
            mask &= predicate_mask(trees[i], blob, schema.field(col).type, n, op, value)
            if not mask.any():
                break
        if not mask.any():
            continue
        parts.append(decode_stripe(row, names, [i]).filter(pa.array(mask)))
    if not parts:
        return out_schema.empty_table()
    return pa.concat_tables(parts)


def group_agg_stripe(
    row: dict, key_column: str, value_column: str, scale: int = 0
) -> pa.Table:
    """GROUP BY <key> {COUNT(*), SUM(value), MIN(value), MAX(value)}
    partial from ONE stripe: the key side reuses the dictionary-index
    fast path (full-length code vector per row group — per-row strings
    never materialize), the value side decodes its single column, and
    the aggregates are one weighted np.add.at / minimum.at pass per
    row group. SUM is EXACT and order-independent: integer value
    columns at scale=0 accumulate pure int64 (no float anywhere, no
    2^53 cap); float columns scale to int64 by 10^scale
    (round-half-away, the repo's money convention) — exact while the
    scaled magnitude stays below 2^53, the float64 integer limit
    (min_v/max_v report as float64 with the same caveat). Null keys
    group separately (SQL GROUP BY); null values count into cnt but
    not vcnt/sum/min/max (SQL aggregate semantics). Output rows are
    bounded by local key cardinality."""
    schema = _deserialize_schema(row["schema_ipc"])
    meta = json.loads(row["meta"])
    blob = row["blob"]
    t_k = schema.field(key_column).type
    rg = meta["row_groups"]
    rgr, rgc = rg["rows"], rg["count"]
    n_rows = row["n_rows"]
    trees_k = meta["columns"][key_column]["row_groups"]
    acc: dict = {}  # key -> [cnt, vcnt, sum_scaled, min, max]
    mult = float(10**scale)
    t_v = schema.field(value_column).type
    int_exact = pa.types.is_integer(t_v) and scale == 0
    for i in range(rgc):
        n = (n_rows - rgr * (rgc - 1)) if i == rgc - 1 else rgr
        enc_k = _rebuild_column(trees_k[i], blob)
        dk = _dict_key_codes(enc_k, t_k, n)
        if dk is not None:
            dict_vals, codes, card = dk
        else:
            arr_k = decode_stripe(row, [key_column], [i]).column(key_column)
            import pyarrow.compute as pc

            d = pc.dictionary_encode(
                arr_k.combine_chunks() if isinstance(arr_k, pa.ChunkedArray) else arr_k
            )
            card = len(d.dictionary)
            dict_vals = d.dictionary.to_pylist()
            codes = (
                d.indices.fill_null(card).to_numpy(zero_copy_only=False).astype(np.int64)
            )
        vals = decode_stripe(row, [value_column], [i]).column(value_column)
        vals = vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals
        import pyarrow.compute as pc

        vmask = np.asarray(pc.is_valid(vals).to_numpy(zero_copy_only=False), dtype=bool)
        nb = card + 1
        cnt = np.bincount(codes, minlength=nb)
        vcodes = codes[vmask]
        vcnt = np.bincount(vcodes, minlength=nb)
        if int_exact:
            # integer column, no scaling: pure-int64 path — no float
            # cast anywhere (a value past 2^53 would not survive one)
            ints = np.asarray(
                pc.fill_null(pc.cast(vals, pa.int64()), 0).to_numpy(
                    zero_copy_only=False
                ),
                dtype=np.int64,
            )[vmask]
            vv = ints.astype(np.float64)  # min/max report float64
        else:
            v = np.asarray(
                pc.cast(vals, pa.float64()).to_numpy(zero_copy_only=False),
                dtype=np.float64,
            )
            vv = v[vmask]
            # round-half-away-from-zero to int64 (np.round is half-even)
            ints = np.trunc(np.abs(vv) * mult + 0.5).astype(np.int64) * np.sign(
                vv
            ).astype(np.int64)
        sums = np.zeros(nb, dtype=np.int64)
        np.add.at(sums, vcodes, ints)
        mins = np.full(nb, np.inf)
        maxs = np.full(nb, -np.inf)
        np.minimum.at(mins, vcodes, vv)
        np.maximum.at(maxs, vcodes, vv)
        for c in np.nonzero(cnt)[0]:
            key = dict_vals[c] if c < card else None
            a = acc.get(key)
            if a is None:
                acc[key] = [int(cnt[c]), int(vcnt[c]), int(sums[c]), mins[c], maxs[c]]
            else:
                a[0] += int(cnt[c])
                a[1] += int(vcnt[c])
                a[2] += int(sums[c])
                a[3] = min(a[3], mins[c])
                a[4] = max(a[4], maxs[c])
    keys = list(acc.keys())
    rows = [acc[k] for k in keys]
    return pa.table(
        {
            key_column: pa.array(keys, type=t_k),
            "cnt": pa.array([r[0] for r in rows], pa.int64()),
            "vcnt": pa.array([r[1] for r in rows], pa.int64()),
            "sum_scaled": pa.array([r[2] for r in rows], pa.int64()),
            "min_v": pa.array(
                [None if r[1] == 0 else r[3] for r in rows], pa.float64()
            ),
            "max_v": pa.array(
                [None if r[1] == 0 else r[4] for r in rows], pa.float64()
            ),
        }
    )


def sample_stripe(
    row: dict, key_column: str, rate: float, salt: str = "", columns: list[str] | None = None
) -> pa.Table:
    """Deterministic hash-sample decode of one stripe with LATE
    MATERIALIZATION: each row group decodes the key column ALONE,
    gates rows by the repo-wide FNV fingerprint (fnv(salt || str(key))
    mod 1e6 < rate*1e6 — the ops.sample.hash_sample contract, so the
    sampled set is SQL-auditable and identical across layouts and
    cluster widths), and only groups holding sampled rows decode the
    projected columns. At low rates whole row groups skip their wide
    streams; at any rate the non-projected columns never decompress."""
    from .ops.sample import _DENOM, _key_fingerprints

    schema = _deserialize_schema(row["schema_ipc"])
    names = columns if columns is not None else schema.names
    meta = json.loads(row["meta"])
    rg = meta["row_groups"]
    rgc = rg["count"]
    threshold = np.uint64(int(rate * _DENOM))
    out_schema = pa.schema([schema.field(nm) for nm in names])
    rest = [nm for nm in names if nm != key_column]
    parts = []
    for i in range(rgc):
        keys = decode_stripe(row, [key_column], [i])
        u = _key_fingerprints(keys, key_column, salt) % np.uint64(_DENOM)
        mask = u < threshold
        if not mask.any():
            continue
        amask = pa.array(mask)
        # the key column decoded once for the gate is REUSED in the
        # output; only the remaining projection decodes for hit groups
        cols = {key_column: keys.column(key_column).filter(amask)}
        if rest:
            dec = decode_stripe(row, rest, [i]).filter(amask)
            for nm in rest:
                cols[nm] = dec.column(nm)
        parts.append(
            pa.table({nm: cols[nm] for nm in names if nm in cols})
        )
    if not parts:
        return out_schema.empty_table()
    return pa.concat_tables(parts)


def filter_stripe_or(
    row: dict, preds: list[tuple], columns: list[str] | None = None
) -> pa.Table:
    """Disjunctive (OR) predicate-pushdown decode of one stripe: the
    surviving row-group set is the UNION of each disjunct's zone-map
    selection (one unprunable disjunct — ne / not_in / null test /
    substring — keeps every group), and the hit mask is the OR of the
    per-disjunct masks, short-circuit the other way around: a row group
    whose mask saturates to all-ones stops evaluating the remaining
    disjuncts. Null comparisons never match (SQL OR semantics: a row
    joins the result iff at least one disjunct is TRUE)."""
    schema = _deserialize_schema(row["schema_ipc"])
    meta = json.loads(row["meta"])
    blob = row["blob"]
    names = columns if columns is not None else schema.names
    rg = meta["row_groups"]
    rgr, rgc = rg["rows"], rg["count"]
    n_rows = row["n_rows"]
    keep: set[int] = set()
    for col, op, value in preds:
        if op in ("ne", "not_in", "is_null", "not_null", "contains") or (
            op == "like" and not like_prefix(value)
        ):
            keep = set(range(rgc))
            break
        lo, hi = stat_bounds_for(op, value, schema.field(col).type)
        sel = select_row_groups(meta, col, lo, hi)
        if sel is None:
            keep = set(range(rgc))
            break
        keep |= set(sel)
    out_schema = pa.schema([schema.field(nm) for nm in names])
    parts = []
    for i in sorted(keep):
        n = (n_rows - rgr * (rgc - 1)) if i == rgc - 1 else rgr
        mask = np.zeros(n, dtype=bool)
        for col, op, value in preds:
            trees = meta["columns"][col]["row_groups"]
            mask |= predicate_mask(trees[i], blob, schema.field(col).type, n, op, value)
            if mask.all():
                break
        if not mask.any():
            continue
        parts.append(decode_stripe(row, names, [i]).filter(pa.array(mask)))
    if not parts:
        return out_schema.empty_table()
    return pa.concat_tables(parts)
