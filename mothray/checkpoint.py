"""Resumable encode jobs: per-partition checkpoints with lineage ids,
byte counts and codec metrics (BASELINE.json north_rule).

The reference has no job-level resume (its checkpoints are intra-file
seek points, reference pkg/store/Checkpoints.go:10-51 — SURVEY.md
§2.8); this layer is the Ray-side design from SURVEY.md §4.2: one
output parquet file per input partition, written atomically
(tmp+rename), plus a JSON manifest per partition. A restarted job
lists manifests and encodes only missing partitions.

Partitions are derived deterministically from the input layout (file
paths + row-group ranges), so a rerun maps the same data to the same
partition ids. Partition tasks are plain @ray.remote tasks rather than
a Dataset stage: Dataset blocks have no stable identity across runs,
and resume requires a stable partition <-> output mapping (documented
divergence from the everything-is-a-Dataset rule; inside each task the
encode is the same vectorized stripe path)."""

from __future__ import annotations

import json
import os
import time

import pyarrow.dataset as pads
import pyarrow.parquet as pq

import ray

from . import stripe as stripe_mod

MANIFEST_DIR = "_manifest"
TARGET_PARTITION_BYTES = 256 << 20


_PARALLEL_PROBE_FILES = 64  # above this, footer reads fan out as Ray tasks


def _rg_units_for_paths(paths: list[str]) -> list[tuple]:
    out = []
    for p in paths:
        md = pq.ParquetFile(p).metadata
        for rg in range(md.num_row_groups):
            out.append((p, rg, md.row_group(rg).total_byte_size))
    return out


def plan_partitions(
    input_path: str | list[str], target_bytes: int = TARGET_PARTITION_BYTES
) -> list[dict]:
    """Deterministic partition list: row-group clusters of input files,
    each at most `target_bytes` (compressed). Partition id = index in
    path-sorted row-group order, so reruns reproduce the mapping.

    Wide inputs fan the footer reads out as Ray tasks (a 10^5-file
    corpus would otherwise open every footer SERIALLY on the driver —
    minutes to hours on remote storage); chunks preserve path-sorted
    order, so the unit list — and therefore every partition id and the
    whole resume identity — is byte-identical to the serial plan."""
    dataset = pads.dataset(input_path, format="parquet")
    paths = sorted(f.path for f in dataset.get_fragments())
    if len(paths) > _PARALLEL_PROBE_FILES and ray.is_initialized():
        probe = ray.remote(_rg_units_for_paths)
        chunks = [paths[i : i + 16] for i in range(0, len(paths), 16)]
        units = [u for part in ray.get([probe.remote(c) for c in chunks]) for u in part]
    else:
        units = _rg_units_for_paths(paths)
    parts: list[dict] = []
    cur: dict | None = None
    for path, rg, size in units:
        if cur is None or cur["bytes"] + size > target_bytes:
            cur = {"part_id": len(parts), "inputs": [], "bytes": 0}
            parts.append(cur)
        # the per-row-group byte size is part of the resume identity: a
        # file regenerated in place with the same row-group COUNT but
        # different contents must invalidate its partitions (ADVICE r2)
        cur["inputs"].append([path, rg, int(size)])
        cur["bytes"] += size
    return parts


def completed_parts(out_dir: str) -> dict[int, dict]:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    done = {}
    if os.path.isdir(mdir):
        for fn in os.listdir(mdir):
            if fn.startswith("part-") and fn.endswith(".json"):
                with open(os.path.join(mdir, fn)) as f:
                    m = json.load(f)
                done[m["part_id"]] = m
    return done


@ray.remote
def _encode_partition(part: dict, out_dir: str, opts: dict | None) -> dict:
    t0 = time.monotonic()
    tables = []
    for path, rg, _size in part["inputs"]:
        pf = pq.ParquetFile(path)
        tables.append(pf.read_row_group(rg))
    import pyarrow as pa

    tbl = pa.concat_tables(tables)
    pid = part["part_id"]
    enc = stripe_mod.encode_batch(tbl, opts, key_prefix=f"p{pid:05d}")
    out_path = os.path.join(out_dir, f"part-{pid:05d}.parquet")
    tmp = out_path + ".tmp"
    # small parquet row groups: stripe rows are MB-sized and prune_read
    # fetches at row-group granularity (see pipeline.write_encoded);
    # blob/blooms are codec-compressed already — parquet snappy on them
    # is wasted CPU on every write and read
    pq.write_table(enc, tmp, row_group_size=8, compression={"blob": "NONE", "blooms": "NONE"})
    os.rename(tmp, out_path)

    metrics = [json.loads(m)["metrics"] for m in enc.column("meta").to_pylist()]
    manifest = {
        "part_id": pid,
        "inputs": part["inputs"],
        "lineage": [k for k in enc.column("stripe_key").to_pylist()],
        "n_rows": int(tbl.num_rows),
        "raw_bytes": int(sum(enc.column("raw_bytes").to_pylist())),
        "enc_bytes": int(sum(enc.column("enc_bytes").to_pylist())),
        "codecs": metrics[0]["codecs"] if metrics else {},
        "duration_sec": round(time.monotonic() - t0, 3),
        "output": os.path.basename(out_path),
    }
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    mpath = os.path.join(mdir, f"part-{pid:05d}.json")
    with open(mpath + ".tmp", "w") as f:
        json.dump(manifest, f)
    os.rename(mpath + ".tmp", mpath)
    return manifest


def _load_or_build_plan(out_dir: str, pending: list[dict], opts: dict | None) -> dict:
    import base64

    from . import plan as plan_mod

    mdir = os.path.join(out_dir, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    ppath = os.path.join(mdir, "codec_plan.json")
    if os.path.exists(ppath):
        with open(ppath) as f:
            stored = json.load(f)
        plans = {
            c: {
                **v,
                **({"fsst_table": base64.b64decode(v["fsst_table"])} if "fsst_table" in v else {}),
            }
            for c, v in stored["column_plans"].items()
        }
        return {**(opts or {}), "column_plans": plans}
    path0, rg0, _size0 = pending[0]["inputs"][0]
    sample = pq.ParquetFile(path0).read_row_group(rg0)
    p = plan_mod.plan_from_table(sample)
    serializable = {
        c: {
            **v,
            **({"fsst_table": base64.b64encode(v["fsst_table"]).decode()} if "fsst_table" in v else {}),
        }
        for c, v in p.column_plans.items()
    }
    with open(ppath + ".tmp", "w") as f:
        json.dump({"column_plans": serializable}, f)
    os.rename(ppath + ".tmp", ppath)
    return p.to_opts(opts)


def job_output_files(out_dir: str) -> list[str]:
    """A job's encoded partition files (explicit list — the manifest
    dir lives alongside the parquet parts). Hive-partitioned outputs
    (`__part=<value>/` subdirectories from pipeline.encode_partitioned)
    are included recursively."""
    files = [
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith((".parquet", ".arrow"))  # IPC interchange layouts too
    ]
    for sub in os.listdir(out_dir):
        p = os.path.join(out_dir, sub)
        if sub.startswith("__part=") and os.path.isdir(p):
            files.extend(
                os.path.join(p, f) for f in os.listdir(p) if f.endswith(".parquet")
            )
    return sorted(files)


def read_job_output(out_dir: str):
    """Dataset over a job's encoded partitions."""
    import ray.data

    return ray.data.read_parquet(job_output_files(out_dir))


def encode_job(
    input_path: str | list[str],
    out_dir: str,
    opts: dict | None = None,
    target_partition_bytes: int = TARGET_PARTITION_BYTES,
    max_in_flight: int = 64,
) -> dict:
    """Run (or resume) a partition-checkpointed encode job.

    Returns a summary: partitions total/skipped/encoded, bytes, and the
    merged manifest. Safe to re-run after a crash: finished partitions
    (manifest present) are skipped."""
    os.makedirs(out_dir, exist_ok=True)
    parts = plan_partitions(input_path, target_partition_bytes)
    recorded = completed_parts(out_dir)
    # A manifest only marks its partition done if its recorded inputs
    # — (path, row-group, row-group BYTE SIZE) triples — match the
    # freshly planned partition: if input files changed between runs,
    # partition boundaries shift (or a regenerated file's row-group
    # sizes differ) and stale outputs would otherwise be silently kept
    # (wrong/duplicated rows).
    done = {
        pid: m
        for pid, m in recorded.items()
        if pid < len(parts) and m.get("inputs") == parts[pid]["inputs"]
    }
    orphans = [pid for pid in recorded if pid >= len(parts)]
    if orphans:
        raise RuntimeError(
            f"encode_job: manifest dir {out_dir!r} has partitions {orphans} beyond "
            f"the planned {len(parts)} — the input set shrank since the previous "
            "run; use a fresh out_dir (stale outputs would pollute the result)"
        )
    pending = [p for p in parts if p["part_id"] not in done]

    if pending and (opts is None or "column_plans" not in opts):
        # one shared codec plan (incl. FSST tables) from the first
        # partition's first row group; persisted alongside the
        # manifests so a RESUMED run reuses the original plan and
        # re-encoded partitions come out byte-identical
        opts = _load_or_build_plan(out_dir, pending, opts)

    results = list(done.values())
    refs = []
    for p in pending:
        refs.append(_encode_partition.remote(p, out_dir, opts))
        if len(refs) >= max_in_flight:
            ready, refs = ray.wait(refs, num_returns=1)
            results.extend(ray.get(ready))
    results.extend(ray.get(refs))

    return {
        "partitions": len(parts),
        "skipped": len(done),
        "encoded": len(pending),
        "n_rows": sum(m["n_rows"] for m in results),
        "raw_bytes": sum(m["raw_bytes"] for m in results),
        "enc_bytes": sum(m["enc_bytes"] for m in results),
        "out_dir": out_dir,
    }
