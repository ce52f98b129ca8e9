"""Cluster job entrypoint for the encode pipeline — the `ray job
submit` deployment path the north rule names:

    ray job submit --working-dir . -- \
        python jobs/encode_job.py --input s3://bucket/pages/ \
            --output /mnt/shared/encoded --partition-mb 256

On a cluster, `ray.init()` (no address) attaches to the running Ray
instance the job server provides; in this sandbox the same script runs
standalone against local parquet (it falls back to a local session).
The job is RESUMABLE: re-submitting after a failure skips finished
partitions via the checkpoint manifests, so a preempted 100 TB run
loses only in-flight work units.

Exit code 0 = every partition encoded and manifest-committed."""
from __future__ import annotations

import argparse
import json
import os
import sys

# `ray job submit --working-dir .` ships the repo root; make the
# package importable whether the entrypoint runs from the root or from
# inside jobs/
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="encode_job")
    p.add_argument("--input", required=True, help="parquet file/dir/glob of input pages")
    p.add_argument("--output", required=True, help="encoded dataset directory (shared storage)")
    p.add_argument("--partition-mb", type=int, default=256)
    p.add_argument("--partition-by", default=None, help="optional hive partition column")
    p.add_argument(
        "--ipc", action="store_true",
        help="write the Arrow-IPC interchange layout (fused in-task "
        "write, mmap decode) instead of the durable parquet layout; "
        "retry-idempotent via deterministic unit-named files, so a "
        "resubmitted job skips finished units without manifests",
    )
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        # on a cluster the job server injects the address; standalone
        # falls back to a local session
        ray.init(include_dashboard=False, logging_level="ERROR", log_to_driver=False)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from mothray import checkpoint, pipeline

    if args.partition_by:
        ds = pipeline.read_input(args.input)
        pipeline.encode_partitioned(ds, args.output, args.partition_by)
        summary = {"partitions": sorted(pipeline.encoded_partition_dirs(args.output))}
    elif args.ipc:
        meta = pipeline.encode_files_ipc(args.input, args.output).take_all()
        summary = {
            "stripes": len(meta),
            "n_rows": sum(r["n_rows"] for r in meta),
            "raw_bytes": sum(r["raw_bytes"] for r in meta),
            "enc_bytes": sum(r["enc_bytes"] for r in meta),
            "out_dir": args.output,
        }
    else:
        summary = checkpoint.encode_job(
            args.input, args.output, target_partition_bytes=args.partition_mb << 20
        )
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
