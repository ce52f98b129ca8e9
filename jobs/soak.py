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
    """Cumulative object-store spill: raylet counter when the memory
    summary reports one, PLUS the on-disk bytes under the session's
    spill directory (the counter lags/misses under pressure — the
    first soak run spilled tens of GB while the counter read 0)."""
    total = 0.0
    try:
        from ray._private.internal_api import memory_summary

        s = memory_summary(stats_only=True)
        m = re.search(r"Spilled (\d+) MiB", s)
        if m:
            total += float(m.group(1))
    except Exception:
        pass
    try:
        import subprocess

        out = subprocess.run(
            ["du", "-sm", "/tmp/ray"], capture_output=True, text=True, check=True
        ).stdout
        total = max(total, float(out.split()[0]))
    except Exception:
        pass
    return total


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


def _gen_text_input(rows: int, out_dir: str, shard_rows: int = 250_000) -> str:
    """Realistic-entropy text table (doc_id int64, text) for the
    CONTENT stages. The cc_pages word-soup draws from a ~100-word
    vocabulary, which makes EVERY 30-byte window corpus-duplicated at
    10M docs (8-char shingle sets converge to the full universe, so
    minhash says everything is near-everything and the substring
    hits-exchange becomes the whole corpus — measured OutOfDiskError,
    BASELINE.md soak table). Web text is the opposite: high entropy
    with a few percent duplication. This generator samples a 65,536-
    token vocabulary (30-byte windows then collide only by planting)
    and plants 10% exact duplicates + 5% near duplicates (tail-token
    edits), so the dedup stages see realistic selectivity AND a known
    signal to find."""
    import numpy as np

    import ray

    if os.path.exists(out_dir) and any(
        f.endswith(".parquet") for f in os.listdir(out_dir)
    ):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    @ray.remote(num_cpus=1)
    def gen(i: int, n: int) -> int:
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = np.random.default_rng(7000 + i)
        vocab = np.array([f"w{j:05x}" for j in range(1 << 16)])
        lens = rng.integers(120, 240, n)  # ~150 tokens ≈ 1 KB text
        texts = [
            " ".join(vocab[rng.integers(0, len(vocab), k)]) for k in lens
        ]
        # plant: 10% exact copies of an earlier doc in this shard,
        # 5% near copies (last 8 tokens re-rolled)
        n_exact, n_near = n // 10, n // 20
        src = rng.integers(0, n, n_exact + n_near)
        dst = rng.choice(n, n_exact + n_near, replace=False)
        for d, s in zip(dst[:n_exact], src[:n_exact]):
            texts[d] = texts[s]
        for d, s in zip(dst[n_exact:], src[n_exact:]):
            toks = texts[s].split(" ")
            toks[-8:] = list(vocab[rng.integers(0, len(vocab), 8)])
            texts[d] = " ".join(toks)
        t = pa.table(
            {
                "doc_id": pa.array(
                    np.arange(i * shard_rows, i * shard_rows + n, dtype=np.int64)
                ),
                "text": pa.array(texts),
            }
        )
        tmp = f"{out_dir}/shard-{i:04d}.parquet.tmp"
        pq.write_table(t, tmp, row_group_size=8192)
        os.rename(tmp, f"{out_dir}/shard-{i:04d}.parquet")
        return n

    futures = [
        gen.remote(i // shard_rows, min(shard_rows, rows - i))
        for i in range(0, rows, shard_rows)
    ]
    done = 0
    while futures:
        ready, futures = ray.wait(futures, num_returns=min(8, len(futures)))
        done += sum(ray.get(ready))
        print(f"textgen: {done}/{rows} rows", flush=True)
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
    if os.path.exists(args.out):  # merge: re-run only the named stages
        try:
            with open(args.out) as f:
                prev = json.load(f)
            if prev.get("rows") == args.rows:
                report["stages"].update(prev.get("stages", {}))
        except Exception:
            pass
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

    # content stages run over the realistic-entropy text table (see
    # _gen_text_input; id is already a fixed-width int64 — the first
    # soak run keyed by the ~50-byte url string and tripled the gram
    # exchange into a full disk)
    text_src = None
    if any(s in stages for s in ("minhash", "substring", "pack")):
        text_src = _gen_text_input(args.rows, f"/tmp/mothray_soak/text_{args.rows}")

    if "minhash" in stages:
        def minhash():
            from mothray.ops import dedup

            ds = ray.data.read_parquet(text_src)
            kept = dedup.minhash_lsh_dedup(ds, column="text", id_column="doc_id")
            n = kept.count()
            return {"rows_kept": n}

        run_stage("minhash_dedup", minhash)

    if "substring" in stages:
        def substring():
            from mothray.ops import dedup

            ds = ray.data.read_parquet(text_src)
            # winnowed scale path (content-defined k-gram sampling):
            # the exact variant is the sf-scale correctness surface.
            # winnow sized to ONE box: the gram exchange is
            # ~2/(w+1) x 32 B per text byte and a sort-shuffle holds
            # ~2 copies in flight; at w=16 over 11 GB of text that is
            # ~84 GB against a 37 GB object store + 62 GB spill disk —
            # measured OutOfDiskError (BASELINE.md soak table). w=32
            # halves the exchange; a cluster's aggregate store/disk
            # scales with nodes, the exchange does not.
            dup = dedup.duplicate_spans(
                ds, column="text", id_column="doc_id", min_len=30, winnow=32
            )
            return {"dup_spans": dup.count()}

        run_stage("substring_dup", substring)

    if "pack" in stages:
        def pack():
            from mothray.ops import pack as pack_mod

            ds = ray.data.read_parquet(text_src)
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
