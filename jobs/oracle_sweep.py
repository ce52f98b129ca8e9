"""Run EVERY registered driver query against its DuckDB oracle and
write a machine-readable report — the one-command version of the
verification sweep the round judges previously had to hand-write
(r4 VERDICT next-round item 7).

    python jobs/oracle_sweep.py [--sf /root/testdata/sf0.01] \
        [--out /tmp/oracle_sweep.json] [--only name1,name2] [--cpus 8]

For each query in __ray_entry__.queries():
  * with an oracle_sql() entry: rows / schema (sorted column names) /
    canonical value-hash compared against DuckDB over the same parquet
    tables — the same contract as the driver's CORRECTNESS_r{N}.json;
  * without one (rows-only by nature — approximate dedup, HLL, k-means,
    iterative ops): row count + schema recorded, no value compare.

The report is {name: {rows_match, schema_match, hash_match, ray_rows,
oracle_rows, sec, err}} plus a summary line; exit code 1 if any
oracle-backed query mismatches."""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _to_pandas(result):
    import pandas as pd
    import pyarrow as pa

    import ray
    import ray.data

    if isinstance(result, ray.data.Dataset):
        # collect as Arrow blocks, not via from_pylist: pylist round-trip
        # re-infers types, overflowing uint64 cells (checksums) into the
        # int64 a C long holds
        tables = [t for t in ray.get(result.to_arrow_refs()) if t.num_rows]
        if not tables:
            return pd.DataFrame()
        tbl = pa.concat_tables(tables, promote_options="default")
        return tbl.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    if isinstance(result, pd.DataFrame):
        return result.reset_index(drop=True)
    raise TypeError(f"unsupported query result type {type(result)}")


def _cell(v) -> str:
    import datetime
    import decimal

    import numpy as np

    if v is None:
        return "\x00"
    if isinstance(v, (np.floating, np.integer)):
        # widen through float64/int BEFORE formatting: a float32 cell
        # (embeddings round trip) never string-matches the float64 the
        # oracle returns otherwise, though the values are identical
        v = v.item()
    if isinstance(v, float):
        if v != v:
            return "\x00"
        return "%.10g" % v
    if isinstance(v, decimal.Decimal):
        return "%.10g" % float(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray, memoryview)):
        return hashlib.sha1(bytes(v)).hexdigest()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_cell(e) for e in v) + "]"
    return str(v)


def _canon(df):
    """(value-hash, sorted column names, row count): columns sorted by
    name, every cell stringified with a stable float format, rows
    sorted lexicographically — representation-independent equality."""
    import numpy as np
    import pandas as pd

    cols = sorted(df.columns)
    df = df[cols]
    rows = [
        "\x01".join(_cell(v) for v in rec)
        for rec in df.itertuples(index=False, name=None)
    ]
    rows.sort()
    h = hashlib.sha1("\n".join(rows).encode()).hexdigest()
    return h, cols, len(df)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/oracle_sweep.json")
    ap.add_argument("--only", default="")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "8")))
    args = ap.parse_args()

    import duckdb
    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=args.cpus,
            include_dashboard=False, logging_level="ERROR",
        )
    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = {s for s in args.only.split(",") if s}
    if only:
        qs = {k: v for k, v in qs.items() if k in only}

    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    report: dict[str, dict] = {}
    n_val = n_val_ok = n_rows_only = n_err = 0
    for i, (name, fn) in enumerate(qs.items()):
        t0 = time.monotonic()
        rec: dict = {"err": None}
        try:
            df = _to_pandas(fn(args.sf))
            rh, rcols, rn = _canon(df)
            rec["ray_rows"] = rn
            sql = oracles.get(name)
            if sql is None:
                rec["oracle"] = False
                rec["rows_nonneg"] = rn >= 0
                n_rows_only += 1
            else:
                odf = con.execute(sql).df()
                oh, ocols, on = _canon(odf)
                rec.update(
                    oracle=True, oracle_rows=on,
                    rows_match=rn == on,
                    schema_match=rcols == ocols,
                    hash_match=rh == oh,
                )
                n_val += 1
                if rec["rows_match"] and rec["schema_match"] and rec["hash_match"]:
                    n_val_ok += 1
        except Exception as e:  # noqa: BLE001 — a sweep records, never aborts
            rec["err"] = f"{type(e).__name__}: {e}"[:500]
            n_err += 1
            if name in oracles:
                n_val += 1
        rec["sec"] = round(time.monotonic() - t0, 2)
        report[name] = rec
        status = (
            "ERR" if rec["err"]
            else "ok" if rec.get("hash_match", rec.get("rows_nonneg")) else "MISMATCH"
        )
        print(f"[{i + 1}/{len(qs)}] {name}: {status} ({rec['sec']}s)", flush=True)

    summary = {
        "sf": args.sf,
        "queries": len(qs),
        "value_checked": n_val,
        "value_ok": n_val_ok,
        "rows_only": n_rows_only,
        "errors": n_err,
    }
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "results": report}, f, indent=1)
    print(json.dumps(summary))
    ray.shutdown()
    return 0 if (n_val_ok == n_val and n_err == 0) else 1


if __name__ == "__main__":
    sys.exit(main())
