"""JSON-object column parsing — typed field extraction from string
columns holding JSON objects (event properties, API payloads, metadata
sidecars riding next to webtext).

The parse is pyarrow's C++ JSON reader run on the WHOLE batch at once:
the column's values are joined with newlines (one binary_join kernel
call) and the resulting buffer is fed to pyarrow.json.read_json with
an explicit schema — one vectorized parser pass, no per-row Python, no
regex. The reader consumes a SEQUENCE of objects (newlines inside
pretty-printed objects are fine — a JSON string value can only carry a
newline as the \\n escape, so values never merge); malformed input
errors in the parser, and a defensive row-count check rejects any
parse that would misalign rows.

The reference engine has no JSON functions; this extends the engine's
text/webtext family (SURVEY.md §2 extensions).
"""

from __future__ import annotations

import pyarrow as pa


def json_to_columns(
    ds,
    column: str,
    fields: dict,
    drop_source: bool = False,
):
    """Parse a string column of JSON OBJECTS into typed columns
    appended to each batch.

    `fields` maps output column name -> pyarrow type (nested values
    via struct/list types). Keys absent from an object come back null,
    extra keys are ignored, null source rows yield all-null fields
    (SQL json_extract semantics); pretty-printed multi-line objects
    parse fine. Malformed JSON raises with a clear message rather than
    silently misaligning rows."""
    schema = pa.schema([(k, v) for k, v in fields.items()])

    def parse(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.json as pj

        hit = set(fields) & (set(batch.column_names) - {column})
        if hit:
            raise ValueError(f"field names collide with batch columns: {sorted(hit)}")
        vals = batch.column(column).combine_chunks()
        if not (pa.types.is_string(vals.type) or pa.types.is_large_string(vals.type)):
            raise TypeError(f"column {column!r} must be a string column, got {vals.type}")
        n = len(vals)
        null_mask = vals.is_null()
        if n == 0:
            parsed = pa.table({f.name: pa.array([], type=f.type) for f in schema})
        else:
            filled = pc.fill_null(vals.cast(pa.large_string()), "{}")
            # every non-null value must LOOK like one object (trimmed,
            # starts with '{'): a whitespace-only value parses to ZERO
            # rows and could compensate for a value holding TWO objects,
            # fooling the row-count check below (review finding, round
            # 4). With zero-object values rejected, each value yields
            # >= 1 row, so parsed == n implies exactly one per value.
            heads = pc.utf8_ltrim_whitespace(filled)
            bad = pc.invert(pc.starts_with(heads, pattern="{"))
            if pc.any(bad).as_py():
                i = pc.index(bad, True).as_py()
                raise ValueError(
                    f"column {column!r} row {i} is not a JSON object: "
                    f"{vals[i].as_py()!r:.80}"
                )
            # one list row over the whole column -> one join kernel call
            lst = pa.LargeListArray.from_arrays(
                pa.array([0, n], pa.int64()), filled
            )
            joined = pc.binary_join(lst, pa.scalar("\n", pa.large_string())).cast(
                pa.large_binary()
            )
            buf = joined.combine_chunks().buffers()[2] if isinstance(joined, pa.ChunkedArray) else joined.buffers()[2]
            try:
                parsed = pj.read_json(
                    pa.BufferReader(buf),
                    parse_options=pj.ParseOptions(
                        explicit_schema=schema, unexpected_field_behavior="ignore"
                    ),
                )
            except pa.ArrowInvalid as e:
                raise ValueError(
                    f"column {column!r} is not parseable as JSON objects: {e}"
                ) from e
            if parsed.num_rows != n:
                raise ValueError(
                    f"column {column!r}: parsed {parsed.num_rows} JSON rows from "
                    f"{n} values — every value must be exactly one JSON object"
                )
            parsed = parsed.combine_chunks()
            if null_mask.true_count:
                # null source rows -> all-null fields, via take with a
                # sentinel null row (works for nested types too, where
                # if_else does not)
                import numpy as np

                nm = null_mask.to_numpy(zero_copy_only=False)
                idx = pa.array(np.where(nm, n, np.arange(n)), pa.int64())
                parsed = pa.table(
                    {
                        f.name: pa.concat_arrays(
                            [parsed.column(f.name).combine_chunks(), pa.nulls(1, type=f.type)]
                        ).take(idx)
                        for f in schema
                    }
                )
        out = batch.drop_columns([column]) if drop_source else batch
        for f in schema:
            out = out.append_column(f.name, parsed.column(f.name))
        return out

    return ds.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)
