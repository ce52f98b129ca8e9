"""Soak run (r4 VERDICT next-round item 3): a ~10x-bench-scale pass to
expose any hidden whole-dataset materialization before a real cluster
would — generate a ~30 GB synthetic Common-Crawl-pages input, then run
the headline encode/decode plus the three heaviest operator families
(minhash dedup, substring span dedup, sequence packing) at full local
width, recording wall time, PEAK system memory, object-store peak and
bytes SPILLED per stage.

    python jobs/soak.py [--rows 10000000] [--cpus 32] \
        [--stages encode,decode,minhash,substring,pack] \
        [--out /tmp/soak_report.json]

The input generates ONCE (parallel Ray tasks, one shard per task) and
caches under /tmp/mothray_soak; a re-run reuses it. Every stage streams:
a stage whose peak memory tracks input size rather than (batch x
concurrency) is the bug this job exists to catch."""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mem_used_gb() -> float:
    with open("/proc/meminfo") as f:
        m = dict(
            (line.split(":")[0], int(line.split()[1])) for line in f if ":" in line
        )
    return (m["MemTotal"] - m["MemAvailable"]) / (1 << 20)


class MemSampler:
    """Background thread: peak system-used memory over a stage window
    (includes every Ray worker + the object store's shm pages)."""

    def __init__(self, period: float = 0.25):
        self.period = period
        self.peak = 0.0
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        while not self._stop.is_set():
            self.peak = max(self.peak, _mem_used_gb())
            self._stop.wait(self.period)

    def __enter__(self):
        self.peak = _mem_used_gb()
        self._t.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._t.join()


def _spilled_mb() -> float:
    """Cumulative object-store spill for this Ray session (raylet
    counter via the memory summary; 0.0 when nothing spilled)."""
    try:
        from ray._private.internal_api import memory_summary

        s = memory_summary(stats_only=True)
        m = re.search(r"Spilled (\d+) MiB", s)
        return float(m.group(1)) if m else 0.0
    except Exception:
        return 0.0


def _gen_input(rows: int, out_dir: str, shard_rows: int = 250_000) -> str:
    import ray

    if os.path.exists(out_dir) and any(
        f.endswith(".parquet") for f in os.listdir(out_dir)
    ):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    @ray.remote(num_cpus=1)
    def gen(i: int, n: int) -> int:
        import pyarrow.parquet as pq

        from mothray import datagen

        t = datagen.cc_pages(
            n, seed=1000 + i, html_len=(400, 4000), text_len=(200, 2000)
        )
        tmp = f"{out_dir}/shard-{i:04d}.parquet.tmp"
        pq.write_table(t, tmp, row_group_size=8192)
        os.rename(tmp, f"{out_dir}/shard-{i:04d}.parquet")
        return n

    futures = []
    done = 0
    for i in range(0, rows, shard_rows):
        futures.append(gen.remote(i // shard_rows, min(shard_rows, rows - i)))
    while futures:
        ready, futures = ray.wait(futures, num_returns=min(8, len(futures)))
        done += sum(ray.get(ready))
        print(f"datagen: {done}/{rows} rows", flush=True)
    return out_dir


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)  # ~30 GB raw
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--stages", default="encode,decode,minhash,substring,pack")
    ap.add_argument("--out", default="/tmp/soak_report.json")
    args = ap.parse_args()

    import pyarrow as pa

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=args.cpus,
            include_dashboard=False, logging_level="ERROR",
        )
    ray.data.DataContext.get_current().enable_progress_bars = False

    from mothray import pipeline

    base = f"/tmp/mothray_soak/cc_{args.rows}"
    t0 = time.monotonic()
    src = _gen_input(args.rows, base)
    gen_sec = round(time.monotonic() - t0, 1)
    src_bytes = sum(
        os.path.getsize(os.path.join(src, f)) for f in os.listdir(src)
    )
    print(f"input ready: {src_bytes / 1e9:.1f} GB parquet in {gen_sec}s", flush=True)

    stages = [s for s in args.stages.split(",") if s]
    report: dict = {
        "rows": args.rows,
        "cpus": args.cpus,
        "input_parquet_gb": round(src_bytes / 1e9, 2),
        "stages": {},
    }
    enc_dir = f"/tmp/mothray_soak/enc_{args.rows}"

    def run_stage(name, fn):
        spill0 = _spilled_mb()
        t = time.monotonic()
        err = None
        extra = {}
        with MemSampler() as ms:
            try:
                extra = fn() or {}
            except Exception as e:  # noqa: BLE001 — soak records, never aborts
                err = f"{type(e).__name__}: {e}"[:300]
        rec = {
            "sec": round(time.monotonic() - t, 1),
            "peak_mem_gb": round(ms.peak, 2),
            "spilled_mb": round(_spilled_mb() - spill0, 1),
            **({"err": err} if err else {}),
            **extra,
        }
        report["stages"][name] = rec
        # incremental: a stage that dies (OOM/disk) leaves the prior
        # stages' numbers on disk
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"{name}: {json.dumps(rec)}", flush=True)

    if "encode" in stages:
        def encode():
            import subprocess

            subprocess.run(["rm", "-rf", enc_dir], check=True)
            meta = pipeline.encode_files_ipc(src, enc_dir).take_all()
            raw = sum(r["raw_bytes"] for r in meta)
            enc = sum(r["enc_bytes"] for r in meta)
            return {
                "raw_gb": round(raw / 1e9, 2),
                "encoded_gb": round(enc / 1e9, 2),
                "ratio": round(raw / max(enc, 1), 3),
                "stripes": len(meta),
            }

        run_stage("encode_ipc", encode)

    if "decode" in stages:
        def decode():
            counted = pipeline.decode_files(enc_dir).map_batches(
                lambda t: pa.table({"n": pa.array([t.num_rows], pa.int64())}),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            n = sum(r["n"] for r in counted.take_all())
            assert n == args.rows, (n, args.rows)
            return {"rows_decoded": n}

        run_stage("decode_ipc", decode)

    def _with_int_id(columns):
        """Read + derive an int64 doc id from the url (FNV). The first
        soak run used the url STRING itself as id_column — every k-gram
        row then carried a ~50-byte id through the dedup exchanges,
        blowing the exchange volume ~3x and spilling the box's disk
        full: exactly the class of finding this job exists to catch. A
        corpus-scale pipeline keys sub-document ops by a fixed-width
        id, always."""
        import numpy as np

        from mothray.ops.sample import _key_fingerprints

        ds = ray.data.read_parquet(src, columns=columns)

        def add_id(t: pa.Table) -> pa.Table:
            fp = _key_fingerprints(t, "url", "").astype(np.int64)
            return t.append_column("doc_id", pa.array(fp, pa.int64()))

        return ds.map_batches(add_id, batch_format="pyarrow")

    if "minhash" in stages:
        def minhash():
            from mothray.ops import dedup

            ds = _with_int_id(["url", "text"]).drop_columns(["url"])
            kept = dedup.minhash_lsh_dedup(ds, column="text", id_column="doc_id")
            n = kept.count()
            return {"rows_kept": n}

        run_stage("minhash_dedup", minhash)

    if "substring" in stages:
        def substring():
            from mothray.ops import dedup

            ds = _with_int_id(["url", "text"]).drop_columns(["url"])
            # winnowed scale path (content-defined k-gram sampling):
            # the exact variant is the sf-scale correctness surface.
            # winnow=16 keeps the gram exchange ~3% of text bytes —
            # sized to this single box's spill disk; a cluster spreads
            # the same exchange across nodes
            dup = dedup.duplicate_spans(
                ds, column="text", id_column="doc_id", min_len=30, winnow=16
            )
            return {"dup_spans": dup.count()}

        run_stage("substring_dup", substring)

    if "pack" in stages:
        def pack():
            from mothray.ops import pack as pack_mod

            ds = _with_int_id(["url", "text"]).drop_columns(["url"])
            packed = pack_mod.pack_sequences(ds, 2048, key_col="doc_id", text_col="text")
            return {"sequences": packed.count()}

        run_stage("pack_sequences", pack)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "stages"}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
