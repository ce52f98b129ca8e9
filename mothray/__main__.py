"""CLI: the Ray-Data analog of the reference's demo driver
(reference: pkg/main/main.go Write/Read + pkg/store/main chunk scan).

  python -m mothray encode  IN_PARQUET... OUT_DIR   [--partition-mb N] [--partition-by COL] [--ipc]
  python -m mothray decode  ENC_DIR OUT_DIR [--columns a,b.nested]
  python -m mothray verify  IN_PARQUET ENC_DIR --key COLUMN
  python -m mothray stats   ENC_DIR
  python -m mothray prune   ENC_DIR OUT_DIR --column C [--min X] [--max Y] [--needle S]
  python -m mothray explain ENC_DIR --where "col OP value" (metadata-only prune report)

`encode` is the resumable checkpointed job (re-run after a crash to
finish); `decode` streams stripes back to parquet; `verify` is the
validateFile analog (bit-identity by key); `stats` prints the merged
manifest. The CLI owns its Ray session (library code never inits)."""

from __future__ import annotations

import argparse
import json
import sys


def _ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR", log_to_driver=False)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="mothray")
    sub = p.add_subparsers(dest="cmd", required=True)

    e = sub.add_parser("encode")
    e.add_argument("inputs", nargs="+")
    e.add_argument("out_dir")
    e.add_argument("--partition-mb", type=int, default=256)
    e.add_argument(
        "--partition-by",
        default=None,
        help="hive-partition the encoded output by this column "
        "(one __part=<value>/ directory per value; whole-partition pruned reads)",
    )
    e.add_argument(
        "--ipc",
        action="store_true",
        help="write the Arrow-IPC interchange layout (read+encode+write fused "
        "per task, mmap zero-copy decode); retries/re-runs exists-skip by "
        "deterministic unit names instead of checkpoint manifests",
    )

    d = sub.add_parser("decode")
    d.add_argument("enc_dir")
    d.add_argument("out_dir")
    d.add_argument("--columns", default=None)

    v = sub.add_parser("verify")
    v.add_argument("input")
    v.add_argument("enc_dir")
    v.add_argument("--key", default=None, help="sort key for exact byte compare; omit for the streaming multiset-hash check")

    s = sub.add_parser("stats")
    s.add_argument("enc_dir")
    s.add_argument(
        "--per-column",
        action="store_true",
        help="add per-column encoded stream bytes + codec (from stripe metadata)",
    )

    pf = sub.add_parser(
        "profile",
        help="per-column profile of an encoded dataset from stripe stats only (count/nulls/min/max; no value streams decoded)",
    )
    pf.add_argument("enc_dir")
    pf.add_argument("--columns", help="comma-separated subset (default: every column)")

    cd = sub.add_parser(
        "card",
        help="corpus datasheet over an encoded dataset: doc/char/token totals, exact dup count, language mix",
    )
    cd.add_argument("enc_dir")
    cd.add_argument("--column", default="text", help="document text column (default: text)")
    cd.add_argument("--lang", default=None, help="language column (default: 'lang' if present)")

    cp = sub.add_parser("compact")
    cp.add_argument("enc_dir")
    cp.add_argument("out_dir")
    cp.add_argument("--target-mb", type=int, default=256)

    pr = sub.add_parser("prune")
    pr.add_argument("enc_dir")
    pr.add_argument("out_dir")
    pr.add_argument("--column", required=True)
    pr.add_argument("--min", dest="min_value", default=None)
    pr.add_argument("--max", dest="max_value", default=None)
    pr.add_argument("--needle", default=None)

    dl = sub.add_parser("delete", help="surgical DELETE: drop rows with column in [min,max]; untouched files copy byte-identical")
    dl.add_argument("enc_dir")
    dl.add_argument("out_dir")
    dl.add_argument("--column", required=True)
    dl.add_argument("--min", dest="min_value", default=None)
    dl.add_argument("--max", dest="max_value", default=None)

    sc = sub.add_parser("scan", help="exact predicate-pushdown scan: --where 'col OP value' (AND-able), projected columns, parquet out")
    sc.add_argument("enc_dir")
    sc.add_argument("out_dir")
    sc.add_argument(
        "--where",
        action="append",
        default=[],
        metavar="COL OP VALUE",
        help="predicate 'column op value' with op in eq/ne/lt/le/gt/ge/like; repeat for AND",
    )
    sc.add_argument("--columns", default=None, help="comma-separated projection")
    sc.add_argument(
        "--any",
        action="store_true",
        help="OR the --where predicates (disjunctive pushdown) instead of AND",
    )

    ex = sub.add_parser(
        "explain",
        help="dry-run the skipping stack for a predicate: files/stripes/"
        "row-groups pruned + stream bytes fetched vs total (metadata-only)",
    )
    ex.add_argument("enc_dir")
    ex.add_argument(
        "--where",
        action="append",
        default=[],
        metavar="COL OP VALUE",
        help="predicate 'column op value' with op in eq/lt/le/gt/ge/prefix/like; repeat for AND",
    )

    mg = sub.add_parser(
        "migrate",
        help="re-encode STANDARD .orc files (magic 'ORC') into the engine's "
        "format (stripe-granular distributed read; Ray has no ORC reader). "
        "Reference MOTH-magic variant containers are detected and rejected "
        "with a clear message",
    )
    mg.add_argument("orc_path", help=".orc file or directory of .orc files")
    mg.add_argument("out_dir")

    ix = sub.add_parser("index", help="build the file-level skip index (prune_read then skips whole files without opening footers)")
    ix.add_argument("enc_dir")

    hv = sub.add_parser("history", help="version log of a versioned table (adopt runs implicitly on first mutation)")
    hv.add_argument("table_dir")

    vd = sub.add_parser("vdelete", help="VERSIONED delete: commits a new version; untouched files shared by name (COW)")
    vd.add_argument("table_dir")
    vd.add_argument("--column", required=True)
    vd.add_argument("--min", dest="min_value", default=None)
    vd.add_argument("--max", dest="max_value", default=None)

    dv = sub.add_parser("dvdelete", help="merge-on-read delete: record deletion vectors, rewrite NO data file")
    dv.add_argument("table_dir")
    dv.add_argument("--column", required=True)
    dv.add_argument("--min", dest="min_value", default=None)
    dv.add_argument("--max", dest="max_value", default=None)

    eqd = sub.add_parser("eqdelete", help="equality delete: O(keys) key-file commit, read-time anti-filter (GDPR delete-by-id shape)")
    eqd.add_argument("table_dir")
    eqd.add_argument("--column", required=True)
    eqd.add_argument("--keys", required=True, help="comma-separated key values")

    cdv = sub.add_parser("compactdv", help="fold deletion vectors AND equality deletes into a COW rewrite (metadata fast paths exact again)")
    cdv.add_argument("table_dir")

    vw = sub.add_parser("view", help="materialized aggregate views: create/refresh/read over a versioned table")
    vw.add_argument("action", choices=["create", "refresh", "read"])
    vw.add_argument("table_dir")
    vw.add_argument("name")
    vw.add_argument("--keys", default=None, help="comma-separated group keys (create)")
    vw.add_argument("--agg", action="append", default=[],
                    help="col:fn[:alias] with fn in count|sum|min|max (create, repeatable)")

    tt = sub.add_parser("timetravel", help="decode a historical version to parquet")
    tt.add_argument("table_dir")
    tt.add_argument("out_dir")
    tt.add_argument("--version", type=int, default=None)

    cl = sub.add_parser("clone", help="zero-copy shallow clone of a snapshot (hard links; clone diverges independently)")
    cl.add_argument("table_dir")
    cl.add_argument("out_dir")
    cl.add_argument("--version", type=int, default=None)

    vc = sub.add_parser("vacuum", help="drop part files unreferenced by the kept versions (default: keep latest)")
    vc.add_argument("table_dir")
    vc.add_argument("--keep", default=None, help="comma-separated versions to keep")

    rn = sub.add_parser("rename", help="metadata-only column RENAME (COW: blobs copy through, nothing re-encodes)")
    rn.add_argument("enc_dir")
    rn.add_argument("out_dir")
    rn.add_argument("old")
    rn.add_argument("new")

    dc = sub.add_parser("dropcol", help="metadata-only column DROP (stream bytes freed at next OPTIMIZE, or now with --reclaim)")
    dc.add_argument("enc_dir")
    dc.add_argument("out_dir")
    dc.add_argument("columns", nargs="+")
    dc.add_argument("--reclaim", action="store_true",
                    help="rebuild blobs without the dropped streams (memcpy, no re-encode)")

    ck = sub.add_parser("checksum", help="order-independent content checksum over encoded or parquet data (anti-entropy compare of two copies)")
    ck.add_argument("path", help="encoded dir or parquet file/dir")
    ck.add_argument("columns", nargs="+", help="columns to hash (ints/strings stringify stably across engines)")

    args = p.parse_args(argv)

    try:
        return _dispatch(args)
    except FileNotFoundError as e:
        print(f"error: input not found: {e}", file=sys.stderr)
        return 2
    except KeyError as e:
        print(f"error: unknown column {e} (see `stats` for the schema)", file=sys.stderr)
        return 2


def _parse_preds(wheres: list[str]) -> list[tuple]:
    preds = []
    for w in wheres:
        parts = w.split(None, 2)
        if len(parts) != 3:
            raise SystemExit(f"bad --where {w!r}: expected 'column op value'")
        col, op, val = parts
        preds.append((col, op, _parse_value(val)))
    return preds


def _parse_value(x):
    """CLI predicate literal -> typed value: int, float, ISO date /
    datetime ('1996-01-01', '1996-01-01T12:30:00'), else string.
    Timestamp bounds then flow through the same stats-domain
    translation as library predicates."""
    if x is None:
        return None
    s = str(x)
    if "." in s:
        try:
            return float(s)
        except ValueError:
            pass
    else:
        try:
            return int(s)
        except ValueError:
            pass
    import datetime

    try:
        return datetime.datetime.fromisoformat(s)
    except ValueError:
        return s


def _dispatch(args) -> int:
    if args.cmd == "encode":
        ray = _ray()
        from mothray import checkpoint

        inputs = args.inputs if len(args.inputs) > 1 else args.inputs[0]
        if args.partition_by:
            from mothray import pipeline

            ds = pipeline.read_input(inputs)
            pipeline.encode_partitioned(ds, args.out_dir, args.partition_by)
            parts = pipeline.encoded_partition_dirs(args.out_dir)
            print(json.dumps({"partitions": sorted(parts), "out_dir": args.out_dir}))
        elif getattr(args, "ipc", False):
            from mothray import pipeline

            meta = pipeline.encode_files_ipc(inputs, args.out_dir).take_all()
            print(json.dumps({
                "stripes": len(meta),
                "n_rows": sum(r["n_rows"] for r in meta),
                "raw_bytes": sum(r["raw_bytes"] for r in meta),
                "enc_bytes": sum(r["enc_bytes"] for r in meta),
                "out_dir": args.out_dir,
            }))
        else:
            summary = checkpoint.encode_job(
                inputs, args.out_dir, target_partition_bytes=args.partition_mb << 20
            )
            print(json.dumps(summary))
        ray.shutdown()
        return 0

    if args.cmd == "decode":
        cols = args.columns.split(",") if args.columns else None
        if cols:  # validate against the encoded schema before launching
            import pyarrow as _pa
            import pyarrow.parquet as pq

            from mothray import checkpoint as _cp
            from mothray import stripe as stripe_mod

            files = _cp.job_output_files(args.enc_dir)  # incl. __part=*/
            if files[0].endswith(".arrow"):
                t0 = _pa.ipc.open_file(_pa.memory_map(files[0])).read_all()
                blob = t0.column("schema_ipc")[0].as_py()
            else:
                ipc = pq.ParquetFile(files[0]).read_row_group(0, columns=["schema_ipc"])
                blob = ipc.column("schema_ipc")[0].as_py()
            names = stripe_mod._deserialize_schema(blob).names
            # dotted names are nested projections: validate the top level
            unknown = [
                c for c in cols if c not in names and c.split(".", 1)[0] not in names
            ]
            if unknown:
                print(f"error: unknown column(s) {unknown}; encoded columns: {names}", file=sys.stderr)
                return 2
        ray = _ray()
        from mothray import checkpoint, pipeline

        dec = pipeline.decode_files(checkpoint.job_output_files(args.enc_dir), cols)
        dec.write_parquet(args.out_dir)
        print(json.dumps({"rows": dec.count(), "out_dir": args.out_dir}))
        ray.shutdown()
        return 0

    if args.cmd == "verify":
        ray = _ray()
        import ray.data

        from mothray import checkpoint, pipeline

        original = ray.data.read_parquet(args.input)
        decoded = pipeline.decode_files(checkpoint.job_output_files(args.enc_dir))
        if args.key:
            ok = pipeline.verify_roundtrip(original, decoded, args.key)
        else:  # streaming: nothing materializes on the driver
            ok = pipeline.verify_roundtrip_streaming(original, decoded)
        print(json.dumps({"bit_identical": ok}))
        ray.shutdown()
        return 0 if ok else 1

    if args.cmd == "prune":
        # metadata-only stripe pruning (stats + bloom), then decode only
        # the surviving stripes' row groups (blob reads ∝ survivors)
        ray = _ray()
        from mothray import pipeline

        num = _parse_value

        import os

        files = sorted(  # explicit list: job dirs also hold _manifest/
            os.path.join(args.enc_dir, f)
            for f in os.listdir(args.enc_dir)
            if f.endswith(".parquet")
        )
        pruned = pipeline.prune_read(
            files or args.enc_dir, args.column, num(args.min_value), num(args.max_value), args.needle
        )
        dec = pipeline.decode_dataset(pruned)
        dec.write_parquet(args.out_dir)
        print(json.dumps({"rows": dec.count(), "out_dir": args.out_dir}))
        ray.shutdown()
        return 0

    if args.cmd == "delete":
        ray = _ray()
        from mothray import pipeline

        num = _parse_value

        res = pipeline.delete_where(
            args.enc_dir, args.out_dir, args.column, num(args.min_value), num(args.max_value)
        )
        print(json.dumps(res))
        ray.shutdown()
        return 0

    if args.cmd == "compact":
        ray = _ray()
        from mothray import pipeline

        if pipeline.encoded_partition_dirs(args.enc_dir):
            res = pipeline.compact_partitioned(args.enc_dir, args.out_dir, target_mb=args.target_mb)
        else:
            res = pipeline.compact_encoded(args.enc_dir, args.out_dir, target_mb=args.target_mb)
        print(json.dumps(res))
        ray.shutdown()
        return 0

    if args.cmd == "migrate":
        ray = _ray()
        from mothray import pipeline

        ds = pipeline.read_orc_input(args.orc_path)
        pipeline.write_encoded(pipeline.encode_dataset(ds), args.out_dir)
        enc = pipeline.read_encoded(args.out_dir, metadata_only=True)
        rows = int(enc.sum("n_rows") or 0)
        print(json.dumps({"rows": rows, "out_dir": args.out_dir}))
        ray.shutdown()
        return 0

    if args.cmd == "explain":
        ray = _ray()
        from mothray import pipeline

        print(json.dumps(pipeline.explain_scan(args.enc_dir, _parse_preds(args.where))))
        ray.shutdown()
        return 0

    if args.cmd == "scan":
        ray = _ray()
        from mothray import pipeline

        preds = _parse_preds(args.where)
        cols = args.columns.split(",") if args.columns else None
        if not preds:
            ds = pipeline.decode_dataset(pipeline.read_encoded(args.enc_dir))
            if cols:
                ds = ds.select_columns(cols)
        elif len(preds) == 1:
            ds = pipeline.filter_encoded(args.enc_dir, *preds[0], columns=cols)
        elif args.any:
            ds = pipeline.filter_encoded_or(args.enc_dir, preds, columns=cols)
        else:
            ds = pipeline.filter_encoded_multi(args.enc_dir, preds, columns=cols)
        ds.write_parquet(args.out_dir)
        import pyarrow.dataset as pads

        n = pads.dataset(args.out_dir).count_rows()
        print(json.dumps({"rows": n, "out_dir": args.out_dir}))
        ray.shutdown()
        return 0

    if args.cmd == "index":
        from mothray import pipeline

        idx = pipeline.build_file_index(args.enc_dir)
        print(json.dumps({"files_indexed": len(idx)}))
        return 0

    if args.cmd == "history":
        from mothray import versions

        print(json.dumps(versions.history(args.table_dir)))
        return 0

    if args.cmd == "dvdelete":
        ray = _ray()
        from mothray import versions

        num = _parse_value

        versions.adopt(args.table_dir)
        m = versions.delete_vector_where(
            args.table_dir, args.column, num(args.min_value), num(args.max_value)
        )
        print(json.dumps(m["metrics"] | {"version": m["version"]}))
        ray.shutdown()
        return 0

    if args.cmd == "eqdelete":
        ray = _ray()
        from mothray import versions

        versions.adopt(args.table_dir)
        keys = [_parse_value(k) for k in args.keys.split(",")]
        m = versions.equality_delete(args.table_dir, args.column, keys)
        print(json.dumps(m["metrics"] | {"version": m["version"]}))
        ray.shutdown()
        return 0

    if args.cmd == "compactdv":
        ray = _ray()
        from mothray import versions

        m = versions.compact_deletes(args.table_dir)
        print(json.dumps(m["metrics"] | {"version": m["version"]}))
        ray.shutdown()
        return 0

    if args.cmd == "view":
        ray = _ray()
        from mothray import matview, versions

        if args.action == "create":
            versions.adopt(args.table_dir)
            aggs = []
            for spec in args.agg:
                parts = spec.split(":")
                aggs.append(tuple(parts[:3]) if len(parts) > 2 else (parts[0], parts[1]))
            r = matview.create_view(
                args.table_dir, args.name,
                [k for k in (args.keys or "").split(",") if k], aggs,
            )
            print(json.dumps(r))
        elif args.action == "refresh":
            print(json.dumps(matview.refresh_view(args.table_dir, args.name)))
        else:
            t = matview.read_view(args.table_dir, args.name)
            for row in t.to_pylist():
                print(json.dumps(row))
        ray.shutdown()
        return 0

    if args.cmd == "vdelete":
        ray = _ray()
        from mothray import versions

        num = _parse_value

        versions.adopt(args.table_dir)
        m = versions.delete_where(
            args.table_dir, args.column, num(args.min_value), num(args.max_value)
        )
        print(json.dumps(m))
        ray.shutdown()
        return 0

    if args.cmd == "timetravel":
        ray = _ray()
        from mothray import versions

        # scan_version, not decode_version: a historical snapshot may
        # carry merge-on-read deletes (DVs / equality keys) that must
        # apply to the export
        dec = versions.scan_version(args.table_dir, version=args.version)
        dec.write_parquet(args.out_dir)
        print(json.dumps({"rows": dec.count(), "out_dir": args.out_dir}))
        ray.shutdown()
        return 0

    if args.cmd == "clone":
        from mothray import versions

        m = versions.clone_version(args.table_dir, args.out_dir, args.version)
        print(json.dumps(m["metrics"] | {"version": m["version"], "op": m["op"]}))
        return 0

    if args.cmd == "vacuum":
        from mothray import versions

        keep = [int(v) for v in args.keep.split(",")] if args.keep else None
        print(json.dumps(versions.vacuum(args.table_dir, keep_versions=keep)))
        return 0

    if args.cmd == "rename":
        from mothray import pipeline

        pipeline.rename_column_encoded(args.enc_dir, args.out_dir, args.old, args.new)
        print(json.dumps({"renamed": {args.old: args.new}, "out_dir": args.out_dir}))
        return 0

    if args.cmd == "dropcol":
        from mothray import pipeline

        pipeline.drop_column_encoded(args.enc_dir, args.out_dir, args.columns, reclaim=args.reclaim)
        print(json.dumps({"dropped": args.columns, "out_dir": args.out_dir, "reclaim": args.reclaim}))
        return 0

    if args.cmd == "profile":
        ray = _ray()
        from mothray.pipeline import _encoded_column_names
        from mothray.ops.profile import profile_encoded

        names = _encoded_column_names(args.enc_dir)
        cols = args.columns.split(",") if args.columns else names
        unknown = [c for c in cols if c not in names]
        if unknown:
            raise KeyError(", ".join(unknown))
        t = profile_encoded(args.enc_dir, cols)
        print(json.dumps({r["col"]: {k: r[k] for k in ("cnt", "null_count", "min_val", "max_val")} for r in t.to_pylist()}))
        ray.shutdown()
        return 0

    if args.cmd == "card":
        ray = _ray()
        from mothray.ops.webtext import dataset_card
        from mothray.pipeline import _encoded_column_names, decode_dataset, read_encoded

        names = _encoded_column_names(args.enc_dir)
        if args.column not in names:
            raise KeyError(args.column)
        lang = args.lang if args.lang is not None else ("lang" if "lang" in names else None)
        if lang is not None and lang not in names:
            raise KeyError(lang)
        want = [args.column] + ([lang] if lang else [])
        ds = decode_dataset(read_encoded(args.enc_dir), columns=want)
        t = dataset_card(ds, column=args.column, lang_col=lang)
        print(json.dumps({r["metric"]: r["value"] for r in t.to_pylist()}))
        ray.shutdown()
        return 0

    if args.cmd == "checksum":
        import os

        ray = _ray()
        import ray.data

        from mothray.ops.validate import table_checksum
        from mothray.pipeline import decode_dataset, read_encoded

        if os.path.isdir(args.path) and os.path.isdir(os.path.join(args.path, "_manifest")):
            ds = decode_dataset(read_encoded(args.path), columns=list(args.columns))
        else:
            ds = ray.data.read_parquet(args.path, columns=list(args.columns))
        out = table_checksum(ds, list(args.columns)).to_pylist()[0]
        print(json.dumps(out))
        ray.shutdown()
        return 0

    if args.cmd == "stats":
        from mothray import checkpoint

        if getattr(args, "per_column", False):
            # per-column stream bytes + codec, straight from stripe
            # metadata (no blob bytes read)
            import pyarrow.parquet as pq

            per: dict[str, dict] = {}
            for f in checkpoint.job_output_files(args.enc_dir):
                t = pq.read_table(f, columns=["meta"])
                for mj in t.column("meta").to_pylist():
                    m = json.loads(mj)
                    for col, trees in m["columns"].items():
                        e = per.setdefault(col, {"enc_bytes": 0, "raw_bytes": 0, "codec": None})
                        for tree in trees["row_groups"]:
                            for st in tree["streams"]:
                                e["enc_bytes"] += st["len"]
                                e["raw_bytes"] += st["raw"]
                            e["codec"] = tree["encoding"]
            for e in per.values():
                e["ratio"] = round(e["raw_bytes"] / max(e["enc_bytes"], 1), 3)
            print(json.dumps(per, sort_keys=True))
            return 0

        done = checkpoint.completed_parts(args.enc_dir)
        if not done:
            # no job manifests (e.g. a hive-partitioned encode):
            # summarize from the stripe rows' bookkeeping columns
            import pyarrow.parquet as pq

            files = checkpoint.job_output_files(args.enc_dir)
            if files:
                from mothray import pipeline as _pl

                hive = _pl.encoded_partition_dirs(args.enc_dir)
                n_rows = raw = enc_b = 0
                codecs: dict = {}
                for f in files:
                    t = pq.read_table(f, columns=["n_rows", "raw_bytes", "enc_bytes", "meta"])
                    n_rows += sum(t.column("n_rows").to_pylist())
                    raw += sum(t.column("raw_bytes").to_pylist())
                    enc_b += sum(t.column("enc_bytes").to_pylist())
                    if not codecs and t.num_rows:
                        codecs = json.loads(t.column("meta")[0].as_py()).get(
                            "metrics", {}
                        ).get("codecs", {})
                print(
                    json.dumps(
                        {
                            "partitions": len(hive) or len(files),
                            "n_rows": n_rows,
                            "raw_bytes": raw,
                            "enc_bytes": enc_b,
                            "compression_ratio": round(raw / max(enc_b, 1), 3),
                            "codecs": codecs,
                        }
                    )
                )
                return 0
        raw = sum(m["raw_bytes"] for m in done.values())
        enc = sum(m["enc_bytes"] for m in done.values())
        print(
            json.dumps(
                {
                    "partitions": len(done),
                    "n_rows": sum(m["n_rows"] for m in done.values()),
                    "raw_bytes": raw,
                    "enc_bytes": enc,
                    "compression_ratio": round(raw / max(enc, 1), 3),
                    "codecs": next(iter(done.values()))["codecs"] if done else {},
                }
            )
        )
        return 0
    return 2


if __name__ == "__main__":
    sys.exit(main())
