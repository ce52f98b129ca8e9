"""Ray Data wiring: streaming encode/decode pipelines.

The reference's single-process writer loop (reference:
pkg/store/MothWriter.go:122-177) becomes a `map_batches` stage over
zero-copy Arrow blocks; its pull-based reader (MothRecordReader.go:
184-287) becomes a `map_batches` decode stage. Ray's streaming
executor supplies what the reference lacks: parallelism over splits,
backpressure, spilling, retries (SURVEY.md §4.2).

Determinism under retries: stripe keys are content hashes, and every
codec (sorted dictionaries, seeded FSST tables) is deterministic, so a
retried task reproduces bit-identical stripes (SURVEY.md §7.4 item 3).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Iterator

import numpy as np
import pyarrow as pa

import ray.data

from . import stripe as stripe_mod


def _batch_key(tbl: pa.Table) -> str:
    """Deterministic lineage id for a batch: stable across task retries
    (content-derived, not uuid). Hashes up to 16 evenly-spaced rows
    (incl. first and last) plus shape, so batches that merely share a
    first row and sizes (common with sorted/duplicated data) do not
    collide; genuinely identical batches produce identical stripes, so
    equal keys remain correct."""
    h = hashlib.sha1()
    h.update(str(tbl.num_rows).encode())
    h.update(str(tbl.nbytes).encode())
    n = tbl.num_rows
    if n:
        idx = np.unique(np.linspace(0, n - 1, num=min(16, n), dtype=np.int64))
        sample = tbl.take(pa.array(idx))
        h.update(json.dumps(sample.to_pylist(), default=str).encode())
    return h.hexdigest()[:12]


class StripeEncoder:
    """Callable for map_batches: Arrow batch -> stripe rows.

    A plain function would also work (the default plan is stateless,
    mirroring the reference's per-stripe dictionaries); using a class
    lets actor pools reuse a shared codec plan / FSST symbol table
    broadcast via ray.put (SURVEY.md §7.2).
    """

    def __init__(self, opts: dict | None = None, plan_ref=None):
        self.opts = dict(opts or {})
        if plan_ref is not None:  # broadcast CodecPlan opts (ray.put once)
            import ray

            self.opts = {**self.opts, **ray.get(plan_ref)}

    def __call__(self, batch: pa.Table) -> pa.Table:
        return stripe_mod.encode_batch(batch, self.opts, key_prefix=_batch_key(batch))


class StripeDecoder:
    """Callable for map_batches: stripe rows -> original Arrow batches.

    Yields one table per stripe so a block of many stripes never
    materializes fully decoded (reference's incremental NextPage loop,
    MothRecordReader.go:184-228, via Ray generator UDF).

    `rg_predicate=(column, min, max)` decodes only row groups whose
    stats overlap (reference selectRowGroups:272-293) — skipped groups'
    streams are never decompressed.

    `max_rows` caps each yielded table (zero-copy slices) — the
    reference reader's batch limit (MothReader.go:21-23 max 8196 rows,
    MothRecordReader.go:218-229 adaptive shrink), so a stripe of very
    wide rows never lands on downstream stages as one huge block."""

    def __init__(
        self,
        columns: list[str] | None = None,
        rg_predicate: tuple | None = None,
        max_rows: int = 8192,
        target_schema: pa.Schema | None = None,
    ):
        self.columns = columns
        self.rg_predicate = rg_predicate
        self.max_rows = max_rows
        self.target_schema = target_schema

    def __call__(self, batch: pa.Table) -> Iterator[pa.Table]:
        for i in range(batch.num_rows):
            # binary payloads ride as zero-copy Arrow buffers (memoryview
            # slices downstream); .as_py() would copy the whole blob
            # .cast("B"): pyarrow buffers expose format 'b' (signed), which
            # would make byte indexing return negatives in codec scans
            row = {
                name: (
                    memoryview(batch.column(name)[i].as_buffer()).cast("B")
                    if name in ("blob", "blooms")
                    else batch.column(name)[i].as_py()
                )
                for name in batch.column_names
            }
            rgs = None
            if self.rg_predicate is not None:
                col, lo, hi = self.rg_predicate
                if stripe_mod.is_temporal_value(lo) or stripe_mod.is_temporal_value(hi):
                    sch = stripe_mod._deserialize_schema(row["schema_ipc"])
                    t = sch.field(col).type
                    # same unit derivation as stat_bounds_for: timestamp
                    # units from the type, date32 → epoch days ('D'),
                    # date64 → epoch millis — row-group stats store epoch
                    # ints for ALL temporal columns, so date predicates
                    # must prune here exactly like filter_stripe does
                    if pa.types.is_timestamp(t):
                        unit = t.unit
                    elif pa.types.is_date(t):
                        unit = "D" if t.bit_width == 32 else "ms"
                    else:
                        unit = None
                    lo, hi = stripe_mod.stat_bound(lo, unit), stripe_mod.stat_bound(hi, unit)
                rgs = stripe_mod.select_row_groups(json.loads(row["meta"]), col, lo, hi)
                if rgs == []:
                    continue  # whole stripe skipped
            out = stripe_mod.decode_stripe(
                row, self.columns, row_groups=rgs, target_schema=self.target_schema
            )
            dv = row.get("dv")
            if dv:
                # merge-on-read deletion vector (versions.py): mask the
                # stripe-absolute deleted positions, translated to the
                # decoded row-group selection
                meta_dv = json.loads(row["meta"])
                n_all = row["n_rows"]
                keep = np.ones(n_all, dtype=bool)
                keep[np.asarray(dv, dtype=np.int64)] = False
                rgr = meta_dv["row_groups"]["rows"]
                sel = rgs if rgs is not None else range(meta_dv["row_groups"]["count"])
                mask = np.concatenate(
                    [keep[i * rgr : min((i + 1) * rgr, n_all)] for i in sel]
                )
                if not mask.all():
                    out = out.filter(pa.array(mask))
            if self.max_rows and out.num_rows > self.max_rows:
                for s in range(0, out.num_rows, self.max_rows):
                    yield out.slice(s, self.max_rows)
            else:
                yield out


DEFAULT_ENCODE_BATCH_ROWS = 32768
_TARGET_TASK_DISK_BYTES = 4 << 20  # per-task input (on-disk); ~3x in memory


def _auto_batch_rows(ds: ray.data.Dataset) -> int:
    """Rows per encode batch from parquet METADATA (no execution):
    big enough to amortize per-stripe overhead, small enough that a
    bench-sized input still fans out across the CPUs."""
    try:
        size = ds.size_bytes()
        rows = ds.count()  # metadata-only for parquet sources
        if size and rows:
            bpr = max(size / rows, 1)
            return int(min(max(_TARGET_TASK_DISK_BYTES / bpr, 1024), 262144))
    except Exception:
        pass
    return DEFAULT_ENCODE_BATCH_ROWS


def _read_blocks_stripe_sized(ds: ray.data.Dataset) -> bool:
    """True when the input's PLANNED read blocks are already stripe-
    sized (>= the per-task target, metadata-only check): batch_size=None
    then lets read blocks flow straight into the encode UDF with no
    coalescing buffer between the operators. (True read-task fusion is
    impossible in this Ray version — ReadParquet sets an
    additional_split_factor > 1 which vetoes operator fusion; use
    encode_files for the fully-fused path.)"""
    try:
        size = ds.size_bytes()
        nblocks = ds._plan.initial_num_blocks()
        if size and nblocks:
            return size / nblocks >= _TARGET_TASK_DISK_BYTES
    except Exception:
        pass
    return False


def _encode_batch_size(ds: ray.data.Dataset, opts: dict | None):
    import os

    o = opts or {}
    if "batch_rows" in o:
        return o["batch_rows"]
    if os.environ.get("MOTHRAY_NO_FUSE"):  # A/B diagnostics
        return _auto_batch_rows(ds)
    return None if _read_blocks_stripe_sized(ds) else _auto_batch_rows(ds)


def encode_dataset(ds: ray.data.Dataset, opts: dict | None = None) -> ray.data.Dataset:
    """Dataset of raw rows -> Dataset of encoded stripe rows (streaming).

    When read blocks are already stripe-sized (read_input sizes them),
    batch_size=None fuses ReadParquet->encode into one task; otherwise
    batch_size coalesces Ray's read blocks into stripe-sized batches
    (tiny stripes waste dictionary/FSST table overhead and per-task
    startup). The stripe byte budget inside encode re-splits oversized
    batches, mirroring the reference's chunking loop."""
    return ds.map_batches(
        StripeEncoder(opts),
        batch_format="pyarrow",
        batch_size=_encode_batch_size(ds, opts),
        zero_copy_batch=True,
    )


def encode_dataset_planned(
    ds: ray.data.Dataset, opts: dict | None = None, sample_fraction: float = 0.05
) -> ray.data.Dataset:
    """Two-pass encode: sampling pass fixes the per-column CodecPlan
    (SURVEY.md §2.5), broadcast via ray.put, then the streaming encode
    pass skips per-stripe trial encodings."""
    import ray as ray_api

    from . import plan as plan_mod

    codec_plan = plan_mod.plan_dataset(ds, sample_fraction)
    plan_ref = ray_api.put(codec_plan.to_opts())
    return ds.map_batches(
        StripeEncoder(opts, plan_ref=plan_ref),
        batch_format="pyarrow",
        batch_size=_encode_batch_size(ds, opts),
        zero_copy_batch=True,
    )


class _ReadEncode:
    """Work-unit UDF: each input row names a cluster of parquet row
    groups; the task READS those row groups itself (pyarrow) and
    encodes them in place. Raw rows never enter the object store —
    only encoded stripes (~6-7x smaller) move. This is the encode-leg
    fusion Ray cannot do natively: ReadParquet carries an
    additional_split_factor > 1 in this Ray version, which disables
    operator fusion with the downstream map regardless of batch_size
    (r2 VERDICT item 1: the coalesce was one extra full-corpus pass
    over the bus at 100 TB)."""

    def __init__(self, opts: dict | None = None, plan_ref=None, columns: list[str] | None = None):
        self.opts = dict(opts or {})
        self.columns = columns
        if plan_ref is not None:
            import ray

            self.opts = {**self.opts, **ray.get(plan_ref)}

    def __call__(self, batch: pa.Table) -> Iterator[pa.Table]:
        import pyarrow.parquet as pq

        has_slice = "row_start" in batch.column_names
        has_key = "part_key" in batch.column_names  # hierarchical planner
        for i in range(batch.num_rows):
            inputs = json.loads(batch.column("inputs")[i].as_py())
            by_path: dict[str, list[int]] = {}
            for path, rg, _size in inputs:
                by_path.setdefault(path, []).append(rg)
            tables = [
                # use_threads=False: parallelism belongs to Ray's task
                # lanes. Ray workers pin OMP_NUM_THREADS=1 (which
                # pyarrow's pool honors — measured: no wall change),
                # but that is an env-dependent accident; the contract
                # is explicit here so a different launcher can't
                # silently give every 1-cpu task a socket-wide pool
                pq.ParquetFile(path).read_row_groups(
                    rgs, columns=self.columns, use_threads=False
                )
                for path, rgs in by_path.items()
            ]
            tbl = pa.concat_tables(tables) if len(tables) > 1 else tables[0]
            if has_key:
                prefix = batch.column("part_key")[i].as_py()
            else:
                prefix = f"p{batch.column('part_id')[i].as_py():05d}"
            if has_slice:
                start = batch.column("row_start")[i].as_py()
                count = batch.column("row_count")[i].as_py()
                if start is not None:
                    # sub-row-group work unit (single giant row group):
                    # this task decompresses the group but encodes only
                    # its slice — decode cost is shared, encode
                    # parallelism restored
                    tbl = tbl.slice(start, count)
                    prefix = f"{prefix}s{start}"
            yield stripe_mod.encode_batch(tbl, self.opts, key_prefix=prefix)


class _ReadEncodeIPC(_ReadEncode):
    """_ReadEncode with the WRITE fused into the task too, targeting
    the Arrow IPC interchange: each work unit's stripe rows are written
    as ONE `.arrow` file straight from the encode task, and only tiny
    metadata rows (stripe_key, byte counts, stats — no blob) leave the
    task. Object-store traffic on the encode leg drops from
    one-encoded-copy-per-stripe to ~1 KB/unit, and the parquet page
    assembly memcpy on the blob column disappears (IPC writes the blob
    buffer as-is). File names derive from the deterministic work-unit
    key, so a retried task re-derives the same name and the
    exists-skip keeps finished units byte-stable (same contract as
    write_ipc_output / the checkpointed parquet sink)."""

    def __init__(self, out_dir: str, opts: dict | None = None, plan_ref=None,
                 columns: list[str] | None = None):
        super().__init__(opts, plan_ref, columns)
        self.out_dir = out_dir

    def __call__(self, batch: pa.Table) -> Iterator[pa.Table]:
        import uuid

        for stripes in super().__call__(batch):
            if stripes.num_rows == 0:
                continue
            prefix = stripes.column("stripe_key")[0].as_py().rsplit("-", 1)[0]
            final = os.path.join(self.out_dir, f"enc-{prefix}.arrow")
            if not os.path.exists(final):
                tmp = f"{final}.{uuid.uuid4().hex}.tmp"
                with pa.OSFile(tmp, "wb") as f, pa.ipc.new_file(f, stripes.schema) as w:
                    w.write_table(stripes)
                os.rename(tmp, final)
            yield stripes.drop_columns(["blob", "blooms", "schema_ipc"]).append_column(
                "path", pa.array([final] * stripes.num_rows)
            )


_HIERARCHICAL_FILES = 64  # above this, plan per-file in fan-out tasks


def _discover_parquet_files(input_path: str | list[str]) -> list[str]:
    """One directory LISTING (os.listdir — no footer opens, unlike a
    pads.dataset construction which inspects a fragment for schema):
    keeps every data file regardless of naming (Hive 'part-00000'
    shards carry no extension) but skips hidden files and the
    '*.tmp' staging names this repo's own atomic writers leave behind
    when killed between write and rename."""
    if isinstance(input_path, str) and os.path.isdir(input_path):
        return sorted(
            os.path.join(input_path, f)
            for f in os.listdir(input_path)
            if not f.startswith((".", "_")) and not f.endswith(".tmp")
            and os.path.isfile(os.path.join(input_path, f))
        )
    if isinstance(input_path, list):
        return sorted(input_path)
    return [input_path]


def _unit_rows_for_file(path: str, fidx: int, target_bytes: int) -> list[dict]:
    """Work-unit rows for ONE file: row-group clusters up to
    target_bytes, giant single row groups sliced (same rules as the
    driver-side planner, but derivable per-file so the planning itself
    fans out). part_key is deterministic from (file index, first row
    group), independent of other files."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    out: list[dict] = []
    cur: list | None = None
    cur_bytes = 0
    clusters: list[list] = []
    for rg in range(md.num_row_groups):
        size = md.row_group(rg).total_byte_size
        if cur is None or cur_bytes + size > target_bytes:
            cur, cur_bytes = [], 0
            clusters.append(cur)
        cur.append([path, rg, int(size)])
        cur_bytes += size
    for cl in clusters:
        key = f"f{fidx:06d}g{cl[0][1]:05d}"
        total = sum(s for _, _, s in cl)
        if len(cl) == 1 and total > 2 * target_bytes:
            _, rg, size = cl[0]
            n_rows = md.row_group(rg).num_rows
            k = max(int(-(-size // target_bytes)), 1)
            per = -(-n_rows // k)
            for start in range(0, n_rows, per):
                out.append(
                    {"part_key": key, "inputs": json.dumps(cl),
                     "row_start": start, "row_count": min(per, n_rows - start)}
                )
        else:
            out.append(
                {"part_key": key, "inputs": json.dumps(cl),
                 "row_start": None, "row_count": None}
            )
    return out


def _encode_files_hierarchical(
    files: list[str],
    opts: dict | None,
    plan_ref,
    columns: list[str] | None,
    target_bytes: int,
    ncpu: int,
    ipc_sink: str | None = None,
) -> ray.data.Dataset:
    """Fan-out planning for wide inputs: the driver holds O(files)
    paths; each probe TASK opens its files' footers and emits that
    file's work-unit rows (read_orc_input's probe pattern). Units are
    within-file row-group clusters — cross-file packing is given up so
    per-file plans stay independent (only sub-unit-sized files lose a
    little task granularity). The tiny unit table materializes once,
    then repartitions so encode tasks hold ~1 unit each at sandbox
    widths (capped at 64 blocks/cpu so a 10^6-unit corpus doesn't make
    a block per unit)."""

    def probe(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for p, fi in zip(
            batch.column("path").to_pylist(), batch.column("fidx").to_pylist()
        ):
            rows.extend(_unit_rows_for_file(p, fi, target_bytes))
        if not rows:
            return pa.table(
                {"part_key": pa.array([], pa.string()), "inputs": pa.array([], pa.string()),
                 "row_start": pa.array([], pa.int64()), "row_count": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "part_key": pa.array([r["part_key"] for r in rows]),
                "inputs": pa.array([r["inputs"] for r in rows]),
                "row_start": pa.array([r["row_start"] for r in rows], pa.int64()),
                "row_count": pa.array([r["row_count"] for r in rows], pa.int64()),
            }
        )

    units = (
        ray.data.from_items(
            [{"path": p, "fidx": i} for i, p in enumerate(files)],
            # ~16 files per probe task: footer opens parallelize without
            # one task per file
            override_num_blocks=max(1, len(files) // 16),
        )
        .map_batches(probe, batch_format="pyarrow")
        .materialize()  # tiny (part_key, inputs) rows; count is then free
    )
    n_units = units.count()
    units = units.repartition(max(1, min(n_units, ncpu * 64)))
    udf = (
        _ReadEncodeIPC(ipc_sink, opts, plan_ref=plan_ref, columns=columns)
        if ipc_sink is not None
        else _ReadEncode(opts, plan_ref=plan_ref, columns=columns)
    )
    return units.map_batches(
        udf,
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )


def encode_files(
    input_path: str | list[str],
    opts: dict | None = None,
    plan_ref=None,
    columns: list[str] | None = None,
    target_bytes: int | None = None,
    hierarchical: bool | None = None,
    ipc_sink: str | None = None,
) -> ray.data.Dataset:
    """Parquet files -> Dataset of encoded stripe rows, with the read
    FUSED into the encode task (see _ReadEncode). The work-unit list is
    deterministic (row-group clusters), so retries reproduce identical
    stripes. `target_bytes` sizes one task's read (default: spread the
    input over ~8 tasks per CPU, floor 4 MB, cap 32 MB — at cluster
    scale the cap dominates and tasks stay uniform).

    Inputs wider than 64 files plan HIERARCHICALLY (r3 VERDICT item 6):
    per-file row-group enumeration runs in fan-out probe tasks, so the
    driver holds O(files) paths instead of O(row-groups) items — at
    100 TB / 32 MB units the flat plan is ~3M driver-resident rows.
    Override with hierarchical=True/False."""
    import ray as ray_api

    from . import checkpoint as ckpt

    try:
        ncpu = int(ray_api.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    files = _discover_parquet_files(input_path)
    if hierarchical is None:
        hierarchical = len(files) > _HIERARCHICAL_FILES
    if hierarchical:
        # footer reads fan out; the 32 MB cap (operative at any corpus
        # scale) is used directly rather than probing total bytes
        return _encode_files_hierarchical(
            files, opts, plan_ref, columns, target_bytes or (32 << 20), ncpu,
            ipc_sink=ipc_sink,
        )
    if target_bytes is None:
        import pyarrow.dataset as pads

        total = sum(
            f.metadata.row_group(i).total_byte_size
            for f in pads.dataset(files, format="parquet").get_fragments()
            for i in range(f.metadata.num_row_groups)
        )
        # ~8 units per CPU: fine enough that stragglers/a noisy core
        # don't serialize the tail, floored at 4 MB (per-task overhead),
        # capped at 32 MB — the cap is the operative size at corpus
        # scale and is deliberately small: a 190 MB unit decompresses to
        # ~600 MB of Arrow in one task (heap churn measurably beat the
        # saved overhead at every level tested), and a constant cap
        # keeps units identical across cluster widths
        target_bytes = int(min(max(total // max(ncpu * 8, 1), 4 << 20), 32 << 20))
    parts = ckpt.plan_partitions(files, target_bytes)
    items = []
    any_slice = False
    for p in parts:
        # a unit holding ONE row group far above target (writers that
        # emit whole files as a single giant row group — common) would
        # otherwise serialize the whole file into one encode task
        if len(p["inputs"]) == 1 and p["bytes"] > 2 * target_bytes:
            import pyarrow.parquet as pq

            path, rg, size = p["inputs"][0]
            n_rows = pq.ParquetFile(path).metadata.row_group(rg).num_rows
            k = max(int(-(-size // target_bytes)), 1)
            per = -(-n_rows // k)
            for start in range(0, n_rows, per):
                items.append(
                    {
                        "part_id": p["part_id"],
                        "inputs": json.dumps(p["inputs"]),
                        "row_start": start,
                        "row_count": min(per, n_rows - start),
                    }
                )
            any_slice = True
        else:
            items.append(
                {"part_id": p["part_id"], "inputs": json.dumps(p["inputs"]),
                 "row_start": None, "row_count": None}
            )
    if not any_slice:
        items = [{"part_id": it["part_id"], "inputs": it["inputs"]} for it in items]
    units = ray.data.from_items(items, override_num_blocks=max(len(items), 1))
    udf = (
        _ReadEncodeIPC(ipc_sink, opts, plan_ref=plan_ref, columns=columns)
        if ipc_sink is not None
        else _ReadEncode(opts, plan_ref=plan_ref, columns=columns)
    )
    return units.map_batches(
        udf,
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )


def decode_dataset(
    ds: ray.data.Dataset,
    columns: list[str] | None = None,
    rg_predicate: tuple | None = None,
    max_rows: int = 8192,
    target_schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    """Dataset of stripe rows -> Dataset of original rows (streaming).

    `columns` projects at decode time: only the requested columns'
    streams are decompressed+decoded (reference StripeReader.go:46-49).
    `rg_predicate=(column, min, max)` additionally skips non-matching
    row groups inside each stripe."""
    return ds.map_batches(
        StripeDecoder(columns, rg_predicate, max_rows, target_schema),
        batch_format="pyarrow",
        # full read blocks: no coalescing buffer between ReadParquet
        # and decode (a fixed batch_size forced one — 2x wall on the
        # decode leg, r2); the generator still yields one bounded table
        # per stripe / max_rows slice, so memory stays capped
        # regardless of block size
        batch_size=None,
        zero_copy_batch=True,
    )


class _ReadDecodeIPC:
    """Decode-leg work unit over Arrow-IPC encoded files (the internal
    interchange): each file is MEMORY-MAPPED and read zero-copy — blob
    buffers are page-cache references, never copied into the task heap.
    The parquet interchange pays a page-assembly memcpy on write and a
    page-read memcpy on read per encoded byte; IPC pays neither, which
    is what matters at 4N worker lanes sharing one memory bus (the
    8→32 scaling decomposition in BASELINE.md). The mapped file object
    is NOT closed explicitly: pyarrow buffers hold a reference to the
    mapping, so it lives exactly as long as any table derived from it."""

    def __init__(
        self,
        columns: list[str] | None = None,
        rg_predicate: tuple | None = None,
        max_rows: int = 8192,
        target_schema: pa.Schema | None = None,
    ):
        self.dec = StripeDecoder(columns, rg_predicate, max_rows, target_schema)

    def __call__(self, batch: pa.Table) -> Iterator[pa.Table]:
        for paths_json in batch.column("paths").to_pylist():
            for path in json.loads(paths_json):
                mm = pa.memory_map(path)
                yield from self.dec(pa.ipc.open_file(mm).read_all())


def _discover_ipc_files(input_path: str | list[str]) -> list[str]:
    """Arrow-IPC encoded files under a path (the `.arrow` suffix is the
    interchange's signature; parquet and IPC stripes never mix in one
    directory because the two sinks are distinct calls)."""
    if isinstance(input_path, str) and os.path.isdir(input_path):
        return sorted(
            os.path.join(input_path, f)
            for f in os.listdir(input_path)
            if f.endswith(".arrow")
        )
    if isinstance(input_path, list):
        return sorted(p for p in input_path if p.endswith(".arrow"))
    return [input_path] if str(input_path).endswith(".arrow") else []


def _cluster_by_size(files: list[str], target_bytes: int) -> list[list[str]]:
    """Deterministic size-bounded clusters (decode work units: one
    task per cluster; single files above target stay their own unit)."""
    clusters: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for f in files:
        s = os.path.getsize(f)
        if cur and cur_bytes + s > target_bytes:
            clusters.append(cur)
            cur, cur_bytes = [], 0
        cur.append(f)
        cur_bytes += s
    if cur:
        clusters.append(cur)
    return clusters


def encode_files_ipc(
    input_path: str | list[str],
    out_dir: str,
    opts: dict | None = None,
    plan_ref=None,
    columns: list[str] | None = None,
    target_bytes: int | None = None,
    hierarchical: bool | None = None,
) -> ray.data.Dataset:
    """Parquet files -> Arrow-IPC encoded files, read+encode+write all
    FUSED into one task per work unit (r4 VERDICT next-round item 1a:
    parquet as the internal interchange paid an encode/decode memcpy
    per side on the blob column; IPC writes the codec-framed blob
    buffer as-is and reads it back via mmap with zero copies).

    Returns the (lazy) dataset of per-stripe METADATA rows — consuming
    it (take_all / write) executes the pipeline; the rows are ~1 KB
    each, so driver-side take_all is fine at any corpus scale where
    stripe count is driver-manageable (the same contract as the
    checkpoint planner). Stripe payloads land only in `out_dir`."""
    os.makedirs(out_dir, exist_ok=True)
    return encode_files(
        input_path, opts, plan_ref=plan_ref, columns=columns,
        target_bytes=target_bytes, hierarchical=hierarchical, ipc_sink=out_dir,
    )


class _ReadDecode:
    """Work-unit UDF mirroring _ReadEncode for the DECODE leg: each
    input row names a cluster of parquet row groups of encoded stripe
    rows; the task reads those row groups itself (pyarrow) and decodes
    them in place. The encoded bytes never enter the object store, and
    task granularity is set by the work-unit planner instead of by
    however many files the writer happened to produce (a plain
    read_parquet over N encoded files plans N read tasks × split
    factor, each holding ~1 stripe row — per-task overhead dominated
    the decode leg's scaling profile)."""

    def __init__(
        self,
        columns: list[str] | None = None,
        rg_predicate: tuple | None = None,
        max_rows: int = 8192,
        target_schema: pa.Schema | None = None,
    ):
        self.dec = StripeDecoder(columns, rg_predicate, max_rows, target_schema)

    def __call__(self, batch: pa.Table) -> Iterator[pa.Table]:
        import pyarrow.parquet as pq

        for inputs_json in batch.column("inputs").to_pylist():
            by_path: dict[str, list[int]] = {}
            for path, rg, _size in json.loads(inputs_json):
                by_path.setdefault(path, []).append(rg)
            for path, rgs in by_path.items():
                # one file's surviving groups at a time: in-task memory
                # is bounded by the unit target, decoded output by the
                # decoder's max_rows slicing
                # use_threads=False: same single-lane contract as
                # _ReadEncode — the task IS the unit of parallelism
                yield from self.dec(
                    pq.ParquetFile(path).read_row_groups(rgs, use_threads=False)
                )


def decode_files(
    input_path: str | list[str],
    columns: list[str] | None = None,
    rg_predicate: tuple | None = None,
    max_rows: int = 8192,
    target_schema: pa.Schema | None = None,
    target_bytes: int | None = None,
) -> ray.data.Dataset:
    """Encoded parquet files -> Dataset of original rows, with the read
    FUSED into the decode task (decode-leg analog of encode_files; a
    downstream map_batches fuses onto this too, so read -> decode ->
    consume can run as ONE task with nothing crossing the object
    store). Work units are deterministic row-group clusters; inputs
    wider than 64 files plan per-file in fan-out probe tasks like
    encode_files (driver holds O(files), not O(row-groups))."""
    import ray as ray_api

    from . import checkpoint as ckpt

    try:
        ncpu = int(ray_api.cluster_resources().get("CPU", 8))
    except Exception:
        ncpu = 8
    ipc_files = _discover_ipc_files(input_path)
    if ipc_files:
        # IPC interchange: one .arrow file per encode work unit, so one
        # file is already a decode-sized unit; tiny files cluster by
        # size. Planning is os.stat only — no footer opens.
        clusters = _cluster_by_size(ipc_files, target_bytes or (8 << 20))
        units = ray.data.from_items(
            [{"paths": json.dumps(c)} for c in clusters],
            override_num_blocks=max(len(clusters), 1),
        )
        return units.map_batches(
            _ReadDecodeIPC(columns, rg_predicate, max_rows, target_schema),
            batch_format="pyarrow",
            batch_size=None,
            zero_copy_batch=True,
        )
    files = _discover_parquet_files(input_path)
    if len(files) > _HIERARCHICAL_FILES:
        tb = target_bytes or (8 << 20)

        def probe(batch: pa.Table) -> pa.Table:
            rows = []
            for p, fi in zip(
                batch.column("path").to_pylist(), batch.column("fidx").to_pylist()
            ):
                # keep ONE row per unit: the planner emits several slice
                # rows for a giant row group (encode-side parallelism);
                # the decoder reads whole groups, so slices would decode
                # the same rows repeatedly
                rows.extend(
                    r for r in _unit_rows_for_file(p, fi, tb)
                    if r["row_start"] in (None, 0)
                )
            return pa.table(
                {"inputs": pa.array([r["inputs"] for r in rows], pa.string())}
            )

        units = (
            ray.data.from_items(
                [{"path": p, "fidx": i} for i, p in enumerate(files)],
                override_num_blocks=max(1, len(files) // 16),
            )
            .map_batches(probe, batch_format="pyarrow")
            .materialize()
        )
        units = units.repartition(max(1, min(units.count(), ncpu * 64)))
        return units.map_batches(
            _ReadDecode(columns, rg_predicate, max_rows, target_schema),
            batch_format="pyarrow",
            batch_size=None,
            zero_copy_batch=True,
        )
    if target_bytes is None:
        import pyarrow.dataset as pads

        total = sum(
            f.metadata.row_group(i).total_byte_size
            for f in pads.dataset(files, format="parquet").get_fragments()
            for i in range(f.metadata.num_row_groups)
        )
        # encoded bytes decode to ~5-8x their size, so the unit target is
        # smaller than the encode leg's: floor 2 MB, cap 8 MB encoded
        # (~50 MB decoded peak per task at worst-case expansion)
        target_bytes = int(min(max(total // max(ncpu * 8, 1), 2 << 20), 8 << 20))
    parts = ckpt.plan_partitions(files, target_bytes)
    items = [{"part_id": p["part_id"], "inputs": json.dumps(p["inputs"])} for p in parts]
    units = ray.data.from_items(items, override_num_blocks=max(len(items), 1))
    return units.map_batches(
        _ReadDecode(columns, rg_predicate, max_rows, target_schema),
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
    )


def compact_partitioned(in_dir: str, out_dir: str, target_mb: int = 256) -> dict:
    """compact_encoded applied per hive partition: each __part=<value>/
    directory compacts independently into the same layout under
    out_dir (partition = the natural compaction and resume unit)."""
    totals = {"files_in": 0, "files_out": 0, "bytes": 0, "partitions": 0}
    for value, src in encoded_partition_dirs(in_dir).items():
        dst = os.path.join(out_dir, os.path.basename(src))
        os.makedirs(dst, exist_ok=True)
        r = compact_encoded(src, dst, target_mb=target_mb)
        for k in ("files_in", "files_out", "bytes"):
            totals[k] += r[k]
        totals["partitions"] += 1
    return totals


def compact_encoded(
    in_dir: str | list[str],
    out_dir: str,
    target_mb: int = 256,
    row_group_size: int = 8,
) -> dict:
    """Merge small encoded partition files into ~target_mb outputs
    WITHOUT re-encoding: stripe rows are self-contained (meta + stats +
    blob), so compaction is a pure parquet rewrite. At corpus scale a
    resumable job leaves one file per work unit (possibly thousands of
    small parts after retries/reruns); readers pay per-file open +
    scheduling costs, so periodic compaction keeps the file count
    ∝ data size, not ∝ task history. Decode output is bit-identical.

    Streaming: files are planned into deterministic clusters by size,
    each task rewrites one cluster (no shuffle, no driver
    materialization). Returns {files_in, files_out, bytes}."""
    import os

    import pyarrow.parquet as pq

    ipc = False
    if isinstance(in_dir, str):
        files = sorted(
            os.path.join(in_dir, f) for f in os.listdir(in_dir) if f.endswith(".parquet")
        )
        ipc_files = _discover_ipc_files(in_dir)
        if not files and ipc_files:  # IPC interchange layout compacts too
            files, ipc = ipc_files, True
    else:
        files = sorted(in_dir)
        if files and all(f.endswith(".arrow") for f in files):
            ipc = True
    sizes = [os.path.getsize(f) for f in files]
    target = target_mb << 20
    clusters: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for f, s in zip(files, sizes):
        if cur and cur_bytes + s > target:
            clusters.append(cur)
            cur, cur_bytes = [], 0
        cur.append(f)
        cur_bytes += s
    if cur:
        clusters.append(cur)

    def rewrite(batch: pa.Table) -> pa.Table:
        out = []
        for cid, paths_json in zip(
            batch.column("cluster_id").to_pylist(), batch.column("paths").to_pylist()
        ):
            paths = json.loads(paths_json)
            if ipc:
                tbl = pa.concat_tables(
                    [pa.ipc.open_file(pa.memory_map(p)).read_all() for p in paths]
                )
                dst = os.path.join(out_dir, f"compact-{cid:05d}.arrow")
                tmp = dst + ".tmp"
                with pa.OSFile(tmp, "wb") as f, pa.ipc.new_file(f, tbl.schema) as w:
                    w.write_table(tbl)
            else:
                tbl = pa.concat_tables([pq.read_table(p) for p in paths])
                dst = os.path.join(out_dir, f"compact-{cid:05d}.parquet")
                tmp = dst + ".tmp"
                pq.write_table(
                    tbl, tmp, row_group_size=row_group_size,
                    compression={"blob": "NONE", "blooms": "NONE"},
                )
            os.rename(tmp, dst)
            out.append((cid, len(paths), int(tbl.num_rows)))
        return pa.table(
            {
                "cluster_id": pa.array([c for c, _, _ in out], type=pa.int64()),
                "files_in": pa.array([f for _, f, _ in out], type=pa.int64()),
                "stripes": pa.array([s for _, _, s in out], type=pa.int64()),
            }
        )

    os.makedirs(out_dir, exist_ok=True)
    items = [
        {"cluster_id": i, "paths": json.dumps(c)} for i, c in enumerate(clusters)
    ]
    units = ray.data.from_items(items, override_num_blocks=max(len(items), 1))
    res = units.map_batches(rewrite, batch_format="pyarrow").to_pandas()
    return {
        "files_in": len(files),
        "files_out": len(clusters),
        "stripes": int(res["stripes"].sum()) if len(res) else 0,
        "bytes": sum(sizes),
    }


def _stripe_overlaps(stats_json: str, column: str, min_value, max_value) -> bool:
    """Conservative zone-map overlap: a stripe with no stats for the
    column (binary/nested, or all-null) must be treated as overlapping."""
    st = json.loads(stats_json).get(column, {})
    lo, hi = st.get("min"), st.get("max")
    if lo is None or hi is None:
        return True
    # timestamp stats are epoch ints in the column's unit: translate
    # temporal bounds (unknown unit -> bound drops, stay conservative)
    mn = stripe_mod.stat_bound(min_value, st.get("unit"))
    mx = stripe_mod.stat_bound(max_value, st.get("unit"))
    if mn is not None and hi < mn:
        return False
    if mx is not None and lo > mx:
        return False
    return True


def _delete_in_file(path: str, column: str, min_value, max_value):
    """DELETE-in-range applied to ONE encoded part file. Returns
    (changed, new_table | None, stripes_rewritten, rows_deleted):
    changed=False -> no stripe's zone map overlaps the range (caller
    keeps the original file, byte-identical); new_table=None with
    changed=True -> every row deleted (caller drops the file). The
    metadata probe never touches the blob column; only overlapping
    stripes decode and re-encode."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from . import stripe as stripe_mod

    meta_tbl = pq.read_table(path, columns=["stripe_key", "stats"])
    overlaps = [
        _stripe_overlaps(sj, column, min_value, max_value)
        for sj in meta_tbl.column("stats").to_pylist()
    ]
    if not any(overlaps):
        return False, None, 0, 0
    full = pq.read_table(path)
    keep_rows = []
    stripes_rewritten = 0
    rows_deleted = 0
    for i in range(full.num_rows):
        row = {c: full.column(c)[i].as_py() for c in full.column_names}
        if not overlaps[i]:
            keep_rows.append(pa.Table.from_pylist([row], schema=stripe_mod.STRIPE_SCHEMA))
            continue
        dec = stripe_mod.decode_stripe(row)
        col = dec.column(column)
        hit = pa.array(np.ones(dec.num_rows, dtype=bool))
        if min_value is not None:
            hit = pc.and_(hit, pc.greater_equal(col, min_value))
        if max_value is not None:
            hit = pc.and_(hit, pc.less_equal(col, max_value))
        hit = pc.fill_null(hit, False)  # nulls survive
        n_hit = pc.sum(pc.cast(hit, pa.int64())).as_py() or 0
        if n_hit == 0:
            keep_rows.append(pa.Table.from_pylist([row], schema=stripe_mod.STRIPE_SCHEMA))
            continue
        rows_deleted += n_hit
        stripes_rewritten += 1
        kept = dec.filter(pc.invert(hit))
        if kept.num_rows:
            keep_rows.append(stripe_mod.encode_batch(kept, key_prefix=f"{row['stripe_key']}d"))
    if stripes_rewritten == 0:
        return False, None, 0, 0  # zone maps overlapped but no row hit
    new_tbl = pa.concat_tables(keep_rows) if keep_rows else None
    return True, new_tbl, stripes_rewritten, rows_deleted


def delete_where(
    in_dir: str | list[str],
    out_dir: str,
    column: str,
    min_value=None,
    max_value=None,
) -> dict:
    """Surgical DELETE on an encoded-on-disk dataset: remove every row
    with `column` in [min_value, max_value] (inclusive; one-sided when
    either bound is None; nulls are never deleted — SQL BETWEEN
    semantics) and write the result as a new encoded dataset.

    Scale shape: the unit of work is one source FILE. Files whose
    stripes' zone maps all land outside the range are COPIED
    byte-identical (no decode, no re-encode — at corpus scale a
    selective delete touches a sliver of stripes and everything else
    moves at raw I/O speed). Only overlapping stripes are decoded,
    filtered and re-encoded; sibling stripes in the same file pass
    through as their original rows. No shuffle anywhere; the file list
    fans out as deterministic work units (same pattern as
    compact_encoded). The reference has no delete path (append-only
    writer, MothDataSink); this extends the engine the way a lakehouse
    table format would.
    """
    import os
    import shutil

    import pyarrow.parquet as pq

    from . import stripe as stripe_mod

    if isinstance(in_dir, str):
        files = sorted(
            os.path.join(in_dir, f) for f in os.listdir(in_dir) if f.endswith(".parquet")
        )
    else:
        files = sorted(in_dir)
    os.makedirs(out_dir, exist_ok=True)

    def process(batch: pa.Table) -> pa.Table:
        out_rows = []
        for fid, path in zip(
            batch.column("file_id").to_pylist(), batch.column("path").to_pylist()
        ):
            dst = os.path.join(out_dir, os.path.basename(path))
            tmp = dst + ".tmp"
            changed, new_tbl, stripes_rewritten, rows_deleted = _delete_in_file(
                path, column, min_value, max_value
            )
            if not changed:
                shutil.copyfile(path, tmp)  # byte-identical passthrough
                os.rename(tmp, dst)
                out_rows.append((fid, 0, 0))
                continue
            if new_tbl is not None:
                pq.write_table(new_tbl, tmp, row_group_size=8, **ENCODED_PARQUET_ARGS)
                os.rename(tmp, dst)
            out_rows.append((fid, stripes_rewritten, rows_deleted))
        return pa.table(
            {
                "file_id": pa.array([f for f, _, _ in out_rows], type=pa.int64()),
                "stripes_rewritten": pa.array([s for _, s, _ in out_rows], type=pa.int64()),
                "rows_deleted": pa.array([r for _, _, r in out_rows], type=pa.int64()),
            }
        )

    items = [{"file_id": i, "path": p} for i, p in enumerate(files)]
    units = ray.data.from_items(items, override_num_blocks=max(len(items), 1))
    res = units.map_batches(process, batch_format="pyarrow").to_pandas()
    return {
        "files": len(files),
        "files_rewritten": int((res["stripes_rewritten"] > 0).sum()) if len(res) else 0,
        "stripes_rewritten": int(res["stripes_rewritten"].sum()) if len(res) else 0,
        "rows_deleted": int(res["rows_deleted"].sum()) if len(res) else 0,
    }


def update_where(
    in_dir: str | list[str],
    out_dir: str,
    column: str,
    min_value=None,
    max_value=None,
    assign: dict | None = None,
    input_columns: list[str] | None = None,
    opts: dict | None = None,
) -> dict:
    """Surgical UPDATE on an encoded-on-disk dataset: for every row with
    `column` in [min_value, max_value] (inclusive; one-sided when either
    bound is None; nulls never match — SQL BETWEEN semantics), replace
    each target column in `assign` with `fn(projected_table)`'s value
    for that row; non-matching rows keep their stored values
    (CASE WHEN pred THEN expr ELSE col END). `assign` maps target
    column name -> vectorized fn(pa.Table) -> pa.Array of the FULL
    replacement column (the blend with the predicate happens here).
    `input_columns` is the projection the fns need (default: the
    predicate column plus the targets).

    Scale shape (completes the DELETE / MERGE / UPDATE lakehouse
    triple): the unit of work is one source FILE; files whose stripes'
    zone maps all miss the range copy byte-identical. Within a touched
    stripe only the predicate + input projection DECODES and only the
    ASSIGNED columns' streams re-encode — every other column's bytes
    memcpy through with rebased offsets (stripe.replace_column_in_
    stripe). Cost scales with (matching stripes) x (updated columns),
    not table width or corpus size. No shuffle anywhere. The reference
    writer is append-only (MothDataSink); this is the lakehouse
    extension of it."""
    import os
    import shutil

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from . import stripe as stripe_mod

    if not assign:
        raise ValueError("assign must name at least one target column")
    targets = list(assign)
    needed = sorted({column, *targets, *(input_columns or [])})

    if isinstance(in_dir, str):
        files = sorted(
            os.path.join(in_dir, f) for f in os.listdir(in_dir) if f.endswith(".parquet")
        )
    else:
        files = sorted(in_dir)
    os.makedirs(out_dir, exist_ok=True)

    def update_in_file(path: str):
        meta_tbl = pq.read_table(path, columns=["stripe_key", "stats"])
        overlaps = [
            _stripe_overlaps(sj, column, min_value, max_value)
            for sj in meta_tbl.column("stats").to_pylist()
        ]
        if not any(overlaps):
            return False, None, 0, 0
        full = pq.read_table(path)
        out_rows = []
        stripes_rewritten = 0
        rows_updated = 0
        for i in range(full.num_rows):
            row = {c: full.column(c)[i].as_py() for c in full.column_names}
            if overlaps[i]:
                proj = stripe_mod.decode_stripe(row, columns=needed)
                col = proj.column(column)
                hit = pa.array(np.ones(proj.num_rows, dtype=bool))
                if min_value is not None:
                    hit = pc.and_(hit, pc.greater_equal(col, min_value))
                if max_value is not None:
                    hit = pc.and_(hit, pc.less_equal(col, max_value))
                hit = pc.fill_null(hit, False)
                n_hit = pc.sum(pc.cast(hit, pa.int64())).as_py() or 0
                if n_hit:
                    rows_updated += n_hit
                    stripes_rewritten += 1
                    for target, fn in assign.items():
                        old = proj.column(target)
                        if isinstance(old, pa.ChunkedArray):
                            old = old.combine_chunks()
                        new = fn(proj)
                        if isinstance(new, pa.ChunkedArray):
                            new = new.combine_chunks()
                        blended = pc.if_else(hit, new.cast(old.type), old)
                        row = stripe_mod.replace_column_in_stripe(
                            row, target, blended, opts, old_nbytes=old.nbytes
                        )
                    row["stripe_key"] = row["stripe_key"] + "u"
            out_rows.append(row)
        if stripes_rewritten == 0:
            return False, None, 0, 0  # zone maps overlapped but no row hit
        return True, pa.Table.from_pylist(out_rows, schema=stripe_mod.STRIPE_SCHEMA), stripes_rewritten, rows_updated

    def process(batch: pa.Table) -> pa.Table:
        out = []
        for fid, path in zip(
            batch.column("file_id").to_pylist(), batch.column("path").to_pylist()
        ):
            dst = os.path.join(out_dir, os.path.basename(path))
            tmp = dst + ".tmp"
            changed, new_tbl, stripes, rows = update_in_file(path)
            if not changed:
                shutil.copyfile(path, tmp)  # byte-identical passthrough
            else:
                pq.write_table(new_tbl, tmp, row_group_size=8, **ENCODED_PARQUET_ARGS)
            os.rename(tmp, dst)
            out.append((fid, stripes, rows))
        return pa.table(
            {
                "file_id": pa.array([f for f, _, _ in out], type=pa.int64()),
                "stripes_rewritten": pa.array([s for _, s, _ in out], type=pa.int64()),
                "rows_updated": pa.array([r for _, _, r in out], type=pa.int64()),
            }
        )

    items = [{"file_id": i, "path": p} for i, p in enumerate(files)]
    units = ray.data.from_items(items, override_num_blocks=max(len(items), 1))
    res = units.map_batches(process, batch_format="pyarrow").to_pandas()
    return {
        "files": len(files),
        "files_rewritten": int((res["stripes_rewritten"] > 0).sum()) if len(res) else 0,
        "stripes_rewritten": int(res["stripes_rewritten"].sum()) if len(res) else 0,
        "rows_updated": int(res["rows_updated"].sum()) if len(res) else 0,
    }


def cast_column(
    in_dir: str | list[str],
    out_dir: str,
    column: str,
    target_type: "pa.DataType",
    opts: dict | None = None,
    safe: bool = True,
) -> dict:
    """Schema evolution on an encoded-on-disk dataset: migrate ONE
    column to a new Arrow type re-encoding only that column — per
    stripe, just the target column decodes, casts (`safe=True` raises
    on lossy values, SQL CAST semantics), and re-encodes; every other
    column's stream bytes memcpy through with rebased offsets, and the
    stripe's own schema record updates so each rewritten stripe is
    self-consistent (stripe.replace_column_in_stripe with
    allow_type_change). Cost scales with the migrated column, not
    table width; file-level fan-out, no shuffle. The reference format
    has no schema evolution (append-only writer); this completes the
    rename/drop/with_column DDL family with the type-change leg."""
    import os

    import pyarrow.parquet as pq

    from . import stripe as stripe_mod

    if isinstance(in_dir, str):
        files = sorted(
            os.path.join(in_dir, f) for f in os.listdir(in_dir) if f.endswith(".parquet")
        )
    else:
        files = sorted(in_dir)
    os.makedirs(out_dir, exist_ok=True)
    tt = target_type

    def cast_in_file(path: str):
        full = pq.read_table(path)
        out_rows = []
        stripes = 0
        for i in range(full.num_rows):
            row = {c: full.column(c)[i].as_py() for c in full.column_names}
            proj = stripe_mod.decode_stripe(row, columns=[column])
            old = proj.column(column)
            if isinstance(old, pa.ChunkedArray):
                old = old.combine_chunks()
            if old.type == tt:
                out_rows.append(row)
                continue
            new = old.cast(tt, safe=safe)
            row = stripe_mod.replace_column_in_stripe(
                row, column, new, opts, old_nbytes=old.nbytes, allow_type_change=True
            )
            row["stripe_key"] = row["stripe_key"] + "c"
            stripes += 1
            out_rows.append(row)
        return pa.Table.from_pylist(out_rows, schema=stripe_mod.STRIPE_SCHEMA), stripes

    def process(batch: pa.Table) -> pa.Table:
        out = []
        for fid, path in zip(
            batch.column("file_id").to_pylist(), batch.column("path").to_pylist()
        ):
            dst = os.path.join(out_dir, os.path.basename(path))
            tmp = dst + ".tmp"
            new_tbl, stripes = cast_in_file(path)
            pq.write_table(new_tbl, tmp, row_group_size=8, **ENCODED_PARQUET_ARGS)
            os.rename(tmp, dst)
            out.append((fid, stripes))
        return pa.table(
            {
                "file_id": pa.array([f for f, _ in out], type=pa.int64()),
                "stripes_rewritten": pa.array([s for _, s in out], type=pa.int64()),
            }
        )

    items = [{"file_id": i, "path": p} for i, p in enumerate(files)]
    units = ray.data.from_items(items, override_num_blocks=max(len(items), 1))
    res = units.map_batches(process, batch_format="pyarrow").to_pandas()
    return {
        "files": len(files),
        "stripes_rewritten": int(res["stripes_rewritten"].sum()) if len(res) else 0,
    }


def with_column(
    in_dir: str | list[str],
    out_dir: str,
    name: str,
    fn,
    input_columns: list[str],
    opts: dict | None = None,
) -> dict:
    """Add a DERIVED column to an encoded dataset re-encoding ONLY the
    new column: per stripe, only `input_columns` are decoded
    (projection decode — other columns' streams are never touched),
    `fn(projected_table) -> pa.Array` computes the values, and the new
    column's streams append after the existing blob
    (stripe.add_column_to_stripe), leaving every existing stream byte
    identical. At corpus scale this costs decode(inputs) +
    encode(new column), not a full-table rewrite. File-level fan-out,
    no shuffle. `fn` must be deterministic and vectorized."""
    import os

    import pyarrow.parquet as pq

    from . import stripe as stripe_mod

    if isinstance(in_dir, str):
        files = sorted(
            os.path.join(in_dir, f) for f in os.listdir(in_dir) if f.endswith(".parquet")
        )
    else:
        files = sorted(in_dir)
    os.makedirs(out_dir, exist_ok=True)

    def process(batch: pa.Table) -> pa.Table:
        out_rows = []
        for fid, path in zip(
            batch.column("file_id").to_pylist(), batch.column("path").to_pylist()
        ):
            full = pq.read_table(path)
            new_rows = []
            for i in range(full.num_rows):
                row = {c: full.column(c)[i].as_py() for c in full.column_names}
                proj = stripe_mod.decode_stripe(row, columns=input_columns)
                vals = fn(proj)
                if isinstance(vals, pa.ChunkedArray):
                    vals = vals.combine_chunks()
                new_rows.append(stripe_mod.add_column_to_stripe(row, name, vals, opts))
            dst = os.path.join(out_dir, os.path.basename(path))
            tmp = dst + ".tmp"
            pq.write_table(
                pa.Table.from_pylist(new_rows, schema=stripe_mod.STRIPE_SCHEMA),
                tmp, row_group_size=8, **ENCODED_PARQUET_ARGS,
            )
            os.rename(tmp, dst)
            out_rows.append((fid, len(new_rows)))
        return pa.table(
            {
                "file_id": pa.array([f for f, _ in out_rows], type=pa.int64()),
                "stripes": pa.array([s for _, s in out_rows], type=pa.int64()),
            }
        )

    items = [{"file_id": i, "path": p} for i, p in enumerate(files)]
    units = ray.data.from_items(items, override_num_blocks=max(len(items), 1))
    res = units.map_batches(process, batch_format="pyarrow").to_pandas()
    return {"files": len(files), "stripes": int(res["stripes"].sum()) if len(res) else 0}


def _order_u64(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Order-preserving uint64 image of a column, for z-order key
    construction: ints/dates/timestamps shift into unsigned space,
    floats use the IEEE total-order bit trick, strings/binary map to
    their big-endian 8-byte prefix (ties beyond 8 bytes collapse —
    fine for clustering). Nulls sort first (image 0)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    FLIP = np.uint64(1) << np.uint64(63)
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t) or pa.types.is_large_binary(t):
        a = arr.cast(pa.large_binary())
        bufs = a.buffers()
        offs = np.frombuffer(bufs[1], dtype=np.int64)[a.offset : a.offset + len(a) + 1]
        data = np.frombuffer(bufs[2] or b"", dtype=np.uint8)
        starts, lens = offs[:-1], np.diff(offs)
        out = np.zeros(len(a), dtype=np.uint64)
        for j in range(8):
            has = lens > j
            byte = np.zeros(len(a), dtype=np.uint64)
            byte[has] = data[starts[has] + j]
            out = (out << np.uint64(8)) | byte
        if arr.null_count:
            out[a.is_null().to_numpy(zero_copy_only=False)] = 0
        return out
    if pa.types.is_floating(t):
        v = arr.cast(pa.float64()).fill_null(float("-inf")).to_numpy(zero_copy_only=False).view(np.int64)
        v = v ^ ((v >> 63) & np.int64(0x7FFFFFFFFFFFFFFF))
        return v.view(np.uint64) ^ FLIP
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        arr = arr.cast(pa.int32()).cast(pa.int64()) if pa.types.is_date32(t) else arr.cast(pa.int64())
    elif pa.types.is_integer(t):
        arr = arr.cast(pa.int64())
    else:
        raise TypeError(f"z-order does not support column type {t}")
    v = arr.fill_null(np.iinfo(np.int64).min).to_numpy(zero_copy_only=False)
    return v.view(np.uint64) ^ FLIP


def _zorder_key(cols: list[np.ndarray], bounds: list[tuple[int, int]]) -> np.ndarray:
    """Interleave each column's 16-bit min-max-quantized image into one
    uint64 Morton key (up to 4 columns). Vectorized: 16 bit-gather
    passes per column, no per-row Python."""
    k = len(cols)
    if not 2 <= k <= 4:
        raise ValueError("z-order needs 2-4 columns")
    z = np.zeros(len(cols[0]), dtype=np.uint64)
    for j, (u, (lo, hi)) in enumerate(zip(cols, bounds)):
        span = max(float(hi - lo), 1.0)
        q = ((u - np.uint64(lo)).astype(np.float64) * (65535.0 / span)).clip(0, 65535).astype(np.uint64)
        for bit in range(16):
            z |= ((q >> np.uint64(bit)) & np.uint64(1)) << np.uint64(bit * k + j)
    return z


def optimize_encoded(
    in_dir: str | list[str],
    out_dir: str,
    sort_by: str | list[str],
    opts: dict | None = None,
) -> dict:
    """OPTIMIZE (cluster-by) an encoded dataset: decode, distributed
    sort, re-encode, write. One key = linear sort: stripes get disjoint
    zone-map ranges, so prune_read / rg_predicate after optimize skip
    ∝ selectivity instead of scanning everything. Multiple keys (2-4) =
    Z-ORDER: rows sort by an interleaved-bit Morton key over the
    min-max-quantized columns, so zone maps stay selective on EVERY
    listed column at once (Delta/Iceberg OPTIMIZE ... ZORDER analog).
    Quantization bounds come from agg_encoded — stripe metadata only,
    no extra decode pass. The sort is Ray Data's range-partitioned
    shuffle — the ONE all-to-all this op needs (unavoidable: clustering
    is a global permutation); z-key computation fuses onto the decode
    tasks and encode fuses onto the sorted blocks. Returns
    {stripes, rows}."""
    keys = [sort_by] if isinstance(sort_by, str) else list(sort_by)
    dec = decode_files(in_dir)
    if len(keys) == 1:
        ordered = dec.sort(keys[0])
    else:
        b = agg_encoded(
            in_dir,
            {f"{c}__{op}": (op, c) for c in keys for op in ("min", "max")},
        )
        bounds = [
            (
                int(_order_u64(b.column(f"{c}__min").combine_chunks())[0]),
                int(_order_u64(b.column(f"{c}__max").combine_chunks())[0]),
            )
            for c in keys
        ]

        def add_z(batch: pa.Table) -> pa.Table:
            z = _zorder_key([_order_u64(batch.column(c)) for c in keys], bounds)
            # uint64, NOT an int64 view: at 4 keys the Morton key uses
            # bit 63 and a signed view would invert the sort
            return batch.append_column("__mothray_z", pa.array(z))

        ordered = (
            dec.map_batches(add_z, batch_format="pyarrow", zero_copy_batch=True)
            .sort("__mothray_z")
            .map_batches(
                lambda t: t.drop_columns(["__mothray_z"]),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        )
    enc = encode_dataset(ordered, opts)
    write_encoded(enc, out_dir)
    meta = read_encoded(out_dir, metadata_only=True)
    n = meta.count()
    rows = sum(r["n_rows"] for r in meta.select_columns(["n_rows"]).take_all())
    return {"stripes": n, "rows": rows}


def agg_encoded(in_dir: str | list[str], specs: dict[str, tuple]) -> pa.Table:
    """SQL-shaped aggregates answered from stripe METADATA only —
    COUNT(*) / COUNT(col) / MIN / MAX / SUM / AVG read the per-stripe
    stats JSON column (zero value-stream bytes touched), the footer-
    stats fast path every columnar engine exposes (reference file
    stats: pkg/store/MothWriter.go:339-353 merge; here the merge runs
    distributed — one partial row per metadata batch, O(#blocks) rows
    to the driver). Stats the writer deliberately dropped (string
    min/max > 64 bytes per MothWriterOptions.go:9, overflowed int
    sums, decimal min/max stored as advisory floats, nested types)
    fall back to ONE projected decode pass over just those columns.

    `specs` maps output column name -> ("count_star",) | (op, column)
    with op in count/null_count/min/max/sum/avg. Returns a one-row
    typed pa.Table; SUM/AVG over zero non-null values is NULL (SQL
    semantics). Known divergence: float columns containing NaN fall
    back to a decode pass whose min/max skip NaN, where SQL treats
    NaN as greater than any value."""
    import pyarrow.compute as pc

    from . import stats as stats_mod

    cols = sorted({s[1] for s in specs.values() if len(s) > 1})

    def partial(batch: pa.Table) -> pa.Table:
        rows = [json.loads(s) for s in batch.column("stats").to_pylist()]
        merged = {c: stats_mod.merge_stats([r.get(c, {"count": 0, "null_count": 0}) for r in rows]) for c in cols}
        return pa.table(
            {
                "n_rows": pa.array([int(pc.sum(batch.column("n_rows")).as_py() or 0)], type=pa.int64()),
                "stats": pa.array([json.dumps(merged)]),
                "schema_ipc": batch.column("schema_ipc").slice(0, 1),
            }
        )

    parts = (
        read_encoded(in_dir, columns=["n_rows", "stats", "schema_ipc"])
        .map_batches(partial, batch_format="pyarrow")
        .take_all()
    )
    total_rows = sum(r["n_rows"] for r in parts)
    merged = {
        c: stats_mod.merge_stats([json.loads(r["stats"])[c] for r in parts]) for c in cols
    }
    schema = stripe_mod._deserialize_schema(parts[0]["schema_ipc"]) if parts else pa.schema([])

    def typed(value, col: str, st: dict):
        t = schema.field(col).type if schema.get_field_index(col) >= 0 else None
        if t is not None and pa.types.is_timestamp(t):
            return pa.scalar(value, type=pa.timestamp(st.get("unit", t.unit), t.tz))
        if t is not None and pa.types.is_date(t):
            import datetime

            if isinstance(value, str):  # pre-epoch-int stats format
                return pa.scalar(datetime.date.fromisoformat(value), type=t)
            if st.get("unit") == "ms":  # date64
                d = datetime.date(1970, 1, 1) + datetime.timedelta(milliseconds=value)
            else:
                d = datetime.date(1970, 1, 1) + datetime.timedelta(days=value)
            return pa.scalar(d, type=t)
        return pa.scalar(value, type=t) if t is not None else pa.scalar(value)

    out: dict[str, pa.Scalar] = {}
    fallback: dict[str, tuple[str, str]] = {}
    for name, spec in specs.items():
        op = spec[0]
        if op == "count_star":
            out[name] = pa.scalar(total_rows, type=pa.int64())
            continue
        col = spec[1]
        st = merged.get(col, {})
        cnt = st.get("count", 0) - st.get("null_count", 0)
        field_t = schema.field(col).type if schema.get_field_index(col) >= 0 else None
        exact_minmax = field_t is not None and not pa.types.is_decimal(field_t)
        if op == "count":
            out[name] = pa.scalar(cnt, type=pa.int64())
        elif op == "null_count":
            out[name] = pa.scalar(st.get("null_count", 0), type=pa.int64())
        elif op in ("min", "max"):
            if op in st and exact_minmax:
                out[name] = typed(st[op], col, st)
            elif cnt == 0:
                out[name] = pa.scalar(None, type=field_t)
            else:
                fallback[name] = (op, col)
        elif op == "sum":
            if cnt == 0:
                out[name] = pa.scalar(None, type=pa.int64() if field_t is None or pa.types.is_integer(field_t) else pa.float64())
            elif "sum" in st and not pa.types.is_floating(field_t or pa.float64()):
                out[name] = pa.scalar(st["sum"], type=pa.int64())
            else:
                # float sums are order-sensitive; recompute in one
                # deterministic pass rather than serving the partial-
                # merge ordering
                fallback[name] = ("sum", col)
        elif op == "avg":
            if cnt == 0:
                out[name] = pa.scalar(None, type=pa.float64())
            elif "sum" in st and not pa.types.is_floating(field_t or pa.float64()):
                out[name] = pa.scalar(float(st["sum"]) / cnt, type=pa.float64())
            else:
                fallback[name] = ("avg", col)
        else:
            raise ValueError(f"unknown aggregate op {op!r}")

    if fallback:
        fcols = sorted({c for _, c in fallback.values()})
        dec = decode_files(in_dir, columns=fcols)

        def fpartial(batch: pa.Table) -> pa.Table:
            arrs = {}
            for c in fcols:
                a = batch.column(c)
                mm = pc.min_max(a)
                t = batch.schema.field(c).type
                arrs[f"{c}__min"] = pa.array([mm["min"].as_py()], type=t)
                arrs[f"{c}__max"] = pa.array([mm["max"].as_py()], type=t)
                if pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_decimal(t):
                    arrs[f"{c}__sum"] = pa.array([pc.sum(a).as_py()], type=pa.float64() if pa.types.is_floating(t) else None)
            return pa.table(arrs)

        frows = pa.Table.from_pylist(
            dec.map_batches(fpartial, batch_format="pyarrow").take_all()
        )
        for name, (op, col) in fallback.items():
            st = merged.get(col, {})
            cnt = st.get("count", 0) - st.get("null_count", 0)
            t = schema.field(col).type
            if op in ("min", "max"):
                red = pc.min_max(pa.array(frows.column(f"{col}__{op}").to_pylist(), type=t))
                out[name] = red[op]
            else:
                vals = [v for v in frows.column(f"{col}__sum").to_pylist() if v is not None]
                total = sum(vals)
                if op == "sum":
                    out[name] = pa.scalar(total, type=pa.float64() if pa.types.is_floating(t) else None)
                else:
                    out[name] = pa.scalar(float(total) / cnt, type=pa.float64())

    return pa.table({name: pa.array([out[name].as_py()], type=out[name].type) for name in specs})


def _upsert_in_file(path: str, keys: pa.Array, key: str):
    """Drop-matching-keys applied to ONE encoded part file (the
    rewrite half of MERGE). Returns (changed, new_table | None,
    stripes_rewritten, rows_replaced) with the same contract as
    _delete_in_file. Zone-map probe first; only stripes whose [min,
    max] can contain an upserted key decode."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from . import stripe as stripe_mod

    def _range_has_keys(lo, hi) -> bool:
        if lo is None or hi is None:
            return True  # no stats: conservative
        m = pc.and_(pc.greater_equal(keys, lo), pc.less_equal(keys, hi))
        return bool(pc.any(pc.fill_null(m, False)).as_py())

    meta_tbl = pq.read_table(path, columns=["stripe_key", "stats"])
    overlaps = []
    for sj in meta_tbl.column("stats").to_pylist():
        st = json.loads(sj).get(key, {})
        overlaps.append(_range_has_keys(st.get("min"), st.get("max")))
    if not any(overlaps):
        return False, None, 0, 0
    full = pq.read_table(path)
    keep_rows = []
    stripes_rewritten = 0
    rows_replaced = 0
    for i in range(full.num_rows):
        row = {c: full.column(c)[i].as_py() for c in full.column_names}
        if not overlaps[i]:
            keep_rows.append(pa.Table.from_pylist([row], schema=stripe_mod.STRIPE_SCHEMA))
            continue
        dec = stripe_mod.decode_stripe(row)
        hit = pc.fill_null(pc.is_in(dec.column(key), value_set=keys), False)
        n_hit = pc.sum(pc.cast(hit, pa.int64())).as_py() or 0
        if n_hit == 0:
            keep_rows.append(pa.Table.from_pylist([row], schema=stripe_mod.STRIPE_SCHEMA))
            continue
        rows_replaced += n_hit
        stripes_rewritten += 1
        kept = dec.filter(pc.invert(hit))
        if kept.num_rows:
            keep_rows.append(stripe_mod.encode_batch(kept, key_prefix=f"{row['stripe_key']}u"))
    if stripes_rewritten == 0:
        return False, None, 0, 0
    new_tbl = pa.concat_tables(keep_rows) if keep_rows else None
    return True, new_tbl, stripes_rewritten, rows_replaced


def upsert_keys(
    in_dir: str | list[str],
    out_dir: str,
    new_rows: pa.Table,
    key: str,
) -> dict:
    """MERGE (upsert) into an encoded-on-disk dataset: rows whose `key`
    appears in `new_rows` are replaced; keys not present are appended.

    Scale shape mirrors delete_where: the upsert BATCH is assumed small
    relative to the corpus (the usual merge pattern) — its key set is
    `ray.put` ONCE and broadcast; each file task checks its stripes'
    [min,max] zone maps against the sorted key set and copies the file
    byte-identical when no stripe can contain an upserted key. Only
    overlapping stripes decode → drop-matching-keys → re-encode. The
    new rows are encoded as one extra partition file. No shuffle.
    (A corpus-sized upsert should instead use a distributed anti-join
    + full re-encode — ops.dedup._anti_join_ids is that path.)
    """
    import os
    import shutil

    import pyarrow.parquet as pq

    from . import stripe as stripe_mod

    if isinstance(in_dir, str):
        files = sorted(
            os.path.join(in_dir, f) for f in os.listdir(in_dir) if f.endswith(".parquet")
        )
    else:
        files = sorted(in_dir)
    os.makedirs(out_dir, exist_ok=True)

    keys_ref = ray.put(new_rows.column(key).combine_chunks())

    def process(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        out_rows = []
        for fid, path in zip(
            batch.column("file_id").to_pylist(), batch.column("path").to_pylist()
        ):
            dst = os.path.join(out_dir, os.path.basename(path))
            tmp = dst + ".tmp"
            changed, new_tbl, stripes_rewritten, rows_replaced = _upsert_in_file(
                path, keys, key
            )
            if not changed:
                shutil.copyfile(path, tmp)
                os.rename(tmp, dst)
                out_rows.append((fid, 0, 0))
                continue
            if new_tbl is not None:
                pq.write_table(new_tbl, tmp, row_group_size=8, **ENCODED_PARQUET_ARGS)
                os.rename(tmp, dst)
            out_rows.append((fid, stripes_rewritten, rows_replaced))
        return pa.table(
            {
                "file_id": pa.array([f for f, _, _ in out_rows], type=pa.int64()),
                "stripes_rewritten": pa.array([s for _, s, _ in out_rows], type=pa.int64()),
                "rows_replaced": pa.array([r for _, _, r in out_rows], type=pa.int64()),
            }
        )

    items = [{"file_id": i, "path": p} for i, p in enumerate(files)]
    units = ray.data.from_items(items, override_num_blocks=max(len(items), 1))
    res = units.map_batches(process, batch_format="pyarrow").to_pandas()

    # append the upsert batch as its own encoded partition file
    import pyarrow.parquet as _pq

    enc_new = stripe_mod.encode_batch(new_rows, key_prefix="upsert")
    tmp = os.path.join(out_dir, "part-upsert.parquet.tmp")
    _pq.write_table(enc_new, tmp, row_group_size=8, **ENCODED_PARQUET_ARGS)
    os.rename(tmp, os.path.join(out_dir, "part-upsert.parquet"))

    return {
        "files": len(files),
        "files_rewritten": int((res["stripes_rewritten"] > 0).sum()) if len(res) else 0,
        "stripes_rewritten": int(res["stripes_rewritten"].sum()) if len(res) else 0,
        "rows_replaced": int(res["rows_replaced"].sum()) if len(res) else 0,
        "rows_upserted": int(new_rows.num_rows),
    }


def _pred_needles(op: str, value) -> list[str] | None:
    """Bloom-probe needles implied by a predicate: the literal for
    string equality, every non-null literal for an IN list (the stripe
    survives if ANY might be present), None otherwise."""
    if op == "eq" and isinstance(value, str):
        return [value]
    if op == "in":
        vals = [v for v in value if isinstance(v, str)]
        # probe only when the whole list is strings (a mixed/numeric
        # list can't be tested against the string bloom)
        if vals and len(vals) == len([v for v in value if v is not None]):
            return vals
    return None


def prune_stripes(
    ds: ray.data.Dataset,
    column: str,
    min_value=None,
    max_value=None,
    needle: str | list[str] | None = None,
    tri_needles: list[str] | None = None,
    null_op: str | None = None,
) -> ray.data.Dataset:
    """Stats/bloom-based stripe pruning WITHOUT touching stream blobs —
    the Ray-side analog of row-group skipping (reference
    StripeReader.selectRowGroups:272-293 + bloom merge :249-270).

    Filters the encoded dataset to stripes whose [min,max] overlaps the
    predicate range and (if `needle` given) whose bloom filter might
    contain the needle. `null_op` ('is_null' / 'not_null') prunes on the
    per-stripe null counts instead: IS NULL drops null-free stripes,
    IS NOT NULL drops all-null stripes (missing counts keep the stripe).
    """
    from . import bloom as bloom_mod

    def keep(batch: pa.Table) -> pa.Table:
        from . import stripe as stripe_mod

        mask = np.ones(batch.num_rows, dtype=bool)
        stats_col = batch.column("stats").to_pylist()
        for i, sj in enumerate(stats_col):
            st = json.loads(sj).get(column, {})
            if null_op is not None:
                nc, cnt = st.get("null_count"), st.get("count")
                if null_op == "is_null" and nc == 0:
                    mask[i] = False
                elif null_op == "not_null" and nc is not None and nc == cnt:
                    mask[i] = False
                continue
            lo, hi = st.get("min"), st.get("max")
            # timestamp stats are int64 epoch in the column's unit:
            # translate temporal predicate bounds into that domain
            # (unknown unit -> bound drops, prune stays conservative)
            mn = stripe_mod.stat_bound(min_value, st.get("unit"))
            mx = stripe_mod.stat_bound(max_value, st.get("unit"))
            if mn is not None and hi is not None and hi < mn:
                mask[i] = False
            if mx is not None and lo is not None and lo > mx:
                mask[i] = False
        needles = [needle] if isinstance(needle, str) else needle
        if needles is not None or tri_needles:
            metas = batch.column("meta").to_pylist()
            blooms = batch.column("blooms").to_pylist()
            for i, (mj, bl) in enumerate(zip(metas, blooms)):
                if not mask[i] or not bl:
                    continue
                m = json.loads(mj)
                if needles is not None:
                    idx = m.get("blooms", {}).get(column)
                    if idx:
                        off, ln = idx
                        if not bloom_mod.might_contain(
                            bl[off : off + ln], needles
                        ).any():
                            mask[i] = False
                            continue
                if tri_needles:
                    # substring prune: the stripe must contain EVERY
                    # needle's trigrams (conjunctive literal runs)
                    idx = m.get("tri_blooms", {}).get(column)
                    if idx:
                        off, ln = idx
                        tb = bl[off : off + ln]
                        if not all(
                            bloom_mod.might_contain_substring(tb, nd)
                            for nd in tri_needles
                        ):
                            mask[i] = False
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


class _FetchStripes:
    """Phase 2 of prune_read: for surviving METADATA rows, re-open the
    source parquet files and read only the row groups that contain
    surviving stripes — blob bytes read scale with survivors, not with
    the corpus. (Parquet scan filters would still read every row
    group's blob chunk before filtering; this fetch targets groups.)"""

    def __call__(self, batch: pa.Table) -> Iterator[pa.Table]:
        import collections

        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        by_path: dict[str, list[str]] = collections.defaultdict(list)
        for p, k in zip(batch.column("path").to_pylist(), batch.column("stripe_key").to_pylist()):
            by_path[p].append(k)
        for p, ks in by_path.items():
            kset = pa.array(ks)
            if p.endswith(".arrow"):
                # IPC interchange layout: the file is memory-mapped, so
                # selecting surviving stripes faults only their pages —
                # the mmap is the row-group-targeted fetch
                t = pa.ipc.open_file(pa.memory_map(p)).read_all()
                mask = pc.is_in(t.column("stripe_key").combine_chunks(), value_set=kset)
                if pc.any(mask).as_py():
                    yield t.filter(mask)
                continue
            pf = pq.ParquetFile(p)
            for rg in range(pf.num_row_groups):
                # key column of one group: tiny read, prunes the blob read
                kcol = pf.read_row_group(rg, columns=["stripe_key"]).column("stripe_key")
                mask = pc.is_in(kcol, value_set=kset)
                if pc.any(mask).as_py():
                    yield pf.read_row_group(rg).filter(mask)


_FILE_INDEX = "_file_index.json"


def build_file_index(dir_path: str) -> dict:
    """FILE-level skip index: one JSON at the dataset root mapping each
    part file to its per-column [min, max] (the union of its stripes'
    zone maps) plus (size, mtime) for staleness detection. With it,
    prune_read skips whole files WITHOUT opening their parquet footers
    — at 10^5 part files that turns a metadata scan into one small JSON
    read + a driver-side range check. The index is advisory: files
    missing from it (appended later) or whose size/mtime changed
    (rewritten in place) are always kept, so a stale index can only
    under-prune, never drop data."""
    import os

    import pyarrow.parquet as pq

    files = sorted(f for f in os.listdir(dir_path) if f.endswith(".parquet"))

    def summarize(batch: pa.Table) -> pa.Table:
        names, entries = [], []
        for name in batch.column("name").to_pylist():
            p = os.path.join(dir_path, name)
            stats_col = pq.read_table(p, columns=["stats"]).column("stats").to_pylist()
            ranges: dict[str, list] = {}
            units: dict[str, str] = {}
            # col -> [null_sum, count_sum, stripes_seen]; a column is
            # null-prunable only when EVERY stripe reported its counts
            nullsums: dict[str, list] = {}
            for sj in stats_col:
                for col, st in json.loads(sj).items():
                    if "unit" in st:  # timestamp mins/maxes are epoch ints
                        units[col] = st["unit"]
                    nc, cnt = st.get("null_count"), st.get("count")
                    if nc is not None and cnt is not None:
                        ns = nullsums.setdefault(col, [0, 0, 0])
                        ns[0] += nc
                        ns[1] += cnt
                        ns[2] += 1
                    lo, hi = st.get("min"), st.get("max")
                    if lo is None or hi is None:
                        ranges[col] = [None, None]  # unknown -> never prunable
                        continue
                    cur = ranges.get(col)
                    if cur is None:
                        ranges[col] = [lo, hi]
                    elif cur != [None, None]:
                        cur[0] = min(cur[0], lo)
                        cur[1] = max(cur[1], hi)
            st = os.stat(p)
            names.append(name)
            entries.append(
                json.dumps(
                    {
                        "columns": ranges,
                        "units": units,
                        "nulls": {
                            c: ns[:2]
                            for c, ns in nullsums.items()
                            if ns[2] == len(stats_col)
                        },
                        "size": st.st_size,
                        "mtime_ns": st.st_mtime_ns,
                    }
                )
            )
        return pa.table({"name": pa.array(names), "entry": pa.array(entries)})

    # fan out: each task reads only its files' stats columns; one tiny
    # (name, ranges) row per file returns — the driver never reads a
    # footer, so 1e5-part datasets index at task parallelism
    if files:
        units = ray.data.from_items(
            [{"name": n} for n in files], override_num_blocks=len(files)
        )
        rows = units.map_batches(summarize, batch_format="pyarrow").to_pandas()
        index = {n: json.loads(e) for n, e in zip(rows["name"], rows["entry"])}
    else:
        index = {}
    out = os.path.join(dir_path, _FILE_INDEX)
    tmp = out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(index, f, sort_keys=True)
    os.rename(tmp, out)
    return index


def _index_prune_files(
    dir_path: str, column: str, min_value, max_value, null_op: str | None = None
) -> list[str] | None:
    """File paths that may hold rows in range, per the file index; None
    when no index exists (caller scans everything). Same inclusive
    overlap rule as prune_stripes; unindexed or size/mtime-changed
    files always survive. With `null_op`, prune on the file's summed
    null counts instead (entries from pre-null indexes survive)."""
    import os

    ipath = os.path.join(dir_path, _FILE_INDEX)
    if not os.path.exists(ipath):
        return None
    with open(ipath) as f:
        index = json.load(f)
    keep = []
    for name in sorted(f for f in os.listdir(dir_path) if f.endswith(".parquet")):
        p = os.path.join(dir_path, name)
        entry = index.get(name)
        if entry is not None:
            st = os.stat(p)
            if st.st_size != entry["size"] or st.st_mtime_ns != entry["mtime_ns"]:
                entry = None  # rewritten in place -> distrust
        if entry is None:
            keep.append(p)
            continue
        if null_op is not None:
            ns = entry.get("nulls", {}).get(column)
            if ns is not None:
                nc, cnt = ns
                if null_op == "is_null" and nc == 0:
                    continue
                if null_op == "not_null" and nc == cnt:
                    continue
            keep.append(p)
            continue
        lo, hi = entry["columns"].get(column, [None, None])
        unit = entry.get("units", {}).get(column)
        mn = stripe_mod.stat_bound(min_value, unit)
        mx = stripe_mod.stat_bound(max_value, unit)
        if mn is not None and hi is not None and hi < mn:
            continue
        if mx is not None and lo is not None and lo > mx:
            continue
        keep.append(p)
    return keep


def prune_read(
    path: str | list[str],
    column: str,
    min_value=None,
    max_value=None,
    needle: str | None = None,
    tri_needles: list[str] | None = None,
    null_op: str | None = None,
) -> ray.data.Dataset:
    """Metadata-only pruning over an encoded-on-disk dataset: consult
    the file-level skip index first (whole files drop without their
    footers being opened; see build_file_index), then read ONLY the
    surviving files' metadata columns (stats/blooms/meta — never the
    blob), filter stripes by stats + bloom, and fetch surviving
    stripes' row groups by key. Blob bytes read ∝ surviving stripes
    (VERDICT r1 item 5)."""
    if isinstance(path, str) and os.path.isdir(path):
        kept = _index_prune_files(path, column, min_value, max_value, null_op)
        if kept:
            path = kept
        elif kept is not None:
            # nothing overlaps: keep ONE file so the empty result still
            # carries the encoded schema (its stripes prune to zero)
            first = sorted(
                f for f in os.listdir(path) if f.endswith(".parquet")
            )[:1]
            if first:
                path = [os.path.join(path, first[0])]
    meta = read_encoded(path, metadata_only=True, include_paths=True)
    surv = prune_stripes(
        meta, column, min_value, max_value, needle, tri_needles, null_op
    )
    return surv.map_batches(_FetchStripes(), batch_format="pyarrow")


def read_orc_input(path: str | list[str]) -> ray.data.Dataset:
    """Migration source for STANDARD .orc files (magic 'ORC';
    pyarrow.orc backs this — Ray Data has no ORC reader). Stripe-granular
    and fully distributed: a fan-out probe pass reads each file's footer
    for its stripe count (the driver never opens a footer), then every
    task reads its (file, stripe) units via ORCFile.read_stripe — one
    reference stripe ≈ one block, so a migration re-encode streams with
    the same parallelism the reference wrote with.

    NOTE: the reference's own writer emits a VARIANT container with
    magic 'MOTH' (reference pkg/store/metadata/PostScript.go), which
    pyarrow.orc rejects; the probe detects that magic and fails with a
    clear message instead of an opaque pyarrow error. Exporting such
    files to standard ORC is reference-side work."""
    if isinstance(path, str):
        if os.path.isdir(path):
            files = sorted(
                os.path.join(path, f) for f in os.listdir(path) if f.endswith(".orc")
            )
        else:
            files = [path]
    else:
        files = sorted(path)
    if not files:
        raise FileNotFoundError(f"no .orc files under {path!r}")

    def probe(batch: pa.Table) -> pa.Table:
        from pyarrow import orc

        paths, stripes = [], []
        for p in batch.column("path").to_pylist():
            with open(p, "rb") as fh:
                magic = fh.read(4)
            if magic[:4] == b"MOTH":
                raise ValueError(
                    f"{p}: reference-variant container (magic 'MOTH'), not"
                    " standard ORC — pyarrow.orc cannot read it. Re-export"
                    " from the reference as standard ORC (or parquet) first."
                )
            n = orc.ORCFile(p).nstripes
            paths.extend([p] * n)
            stripes.extend(range(n))
        return pa.table({"path": pa.array(paths), "stripe": pa.array(stripes, pa.int64())})

    units = (
        ray.data.from_items([{"path": p} for p in files], override_num_blocks=len(files))
        .map_batches(probe, batch_format="pyarrow")
        # (path, stripe) rows only — tiny; materialize ONCE so the row
        # count is free metadata instead of a second probe execution
        # (each probe task opens file footers).
        .materialize()
    )
    # spread (file, stripe) units so big files don't serialize, but
    # bound the block count — one block per stripe would mean 10^6
    # tiny Ray blocks on a large migration; tasks loop a few units each
    n_units = units.count()
    units = units.repartition(max(1, min(n_units, 1024)))

    def read(batch: pa.Table):
        import collections

        from pyarrow import orc

        by_path = collections.defaultdict(list)
        for p, s in zip(batch.column("path").to_pylist(), batch.column("stripe").to_pylist()):
            by_path[p].append(s)
        for p, ss in by_path.items():
            f = orc.ORCFile(p)  # one footer open per file per task
            for s in sorted(ss):
                yield pa.Table.from_batches([f.read_stripe(s)])

    return units.map_batches(read, batch_format="pyarrow")


def _block_digest(batch: pa.Table) -> str:
    """Deterministic LOGICAL content digest of a block: blake2b over
    the Arrow IPC stream of the combined table. IPC serializes values
    (it honors slice offsets and null masks), so two blocks that merely
    share parent buffers at different offsets hash differently, and a
    retried task over the identical block re-derives the identical
    digest."""
    import hashlib

    import pyarrow.ipc as ipc

    t = batch.combine_chunks()
    sink = pa.BufferOutputStream()
    with ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    h = hashlib.blake2b(digest_size=16)
    h.update(memoryview(sink.getvalue()))
    return h.hexdigest()


def write_orc_output(ds: ray.data.Dataset, out_dir: str, stripe_size: int = 64 << 20) -> int:
    """Interop sink: write a Dataset as reference-format .orc files
    (pyarrow.orc), one file per block, named
    `part-{content digest}-{occurrence}.orc`. The name set is a pure
    function of the block MULTISET, independent of completion order
    (Ray's streaming executor yields blocks in completion order and a
    Dataset's captured DataContext ignores late preserve_order flips):
    distinct blocks get distinct digests; blocks with IDENTICAL content
    share a digest and take occurrence suffixes -000, -001, ... — any
    assignment among them writes the identical bytes to each name, so
    the OUTPUT is deterministic, duplicates survive (no silent row
    loss), and a retry or full re-run re-derives the same names
    (exists-skip keeps finished parts byte-stable). Unique tmp per
    attempt + atomic rename; concurrent attempts on one name both
    produce valid files. NOTE: names require the global digest
    multiset, so this export sink materializes its input to the object
    store (two passes over refs: digest, then write) — for outputs
    larger than object-store memory let it spill, or export per
    partition. Returns the file count. Pairs with read_orc_input for
    round-trip migration."""
    import collections
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def digest(block) -> tuple:
        batch = pa.table(block) if not isinstance(block, pa.Table) else block
        return _block_digest(batch), batch.num_rows

    @ray.remote
    def write(block, name: str) -> int:
        from pyarrow import orc

        batch = pa.table(block) if not isinstance(block, pa.Table) else block
        final = os.path.join(out_dir, name)
        if not os.path.exists(final):  # retry after successful rename: no-op
            tmp = os.path.join(out_dir, f".{name}.{uuid.uuid4().hex}.tmp")
            orc.write_table(batch, tmp, stripe_size=stripe_size)
            os.rename(tmp, final)  # atomic; concurrent attempts both valid
        return 1

    refs = ds.to_arrow_refs()
    digs = ray.get([digest.remote(r) for r in refs])
    seen: collections.Counter = collections.Counter()
    futures = []
    for r, (dg, n_rows) in zip(refs, digs):
        if n_rows == 0:
            continue
        futures.append(write.remote(r, f"part-{dg}-{seen[dg]:03d}.orc"))
        seen[dg] += 1
    return int(sum(ray.get(futures)))


def write_ipc_output(ds: ray.data.Dataset, out_dir: str) -> int:
    """Interop sink: write a Dataset as Arrow IPC files, one per block,
    named `part-{content digest}-{occurrence}.arrow` — the same
    deterministic multiset-naming contract as write_orc_output (retry
    re-derives the same names; exists-skip keeps finished parts
    byte-stable; duplicate blocks survive). Pairs with read_ipc_source
    for round-trip migration. Returns the file count."""
    import collections
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def digest(block) -> tuple:
        batch = pa.table(block) if not isinstance(block, pa.Table) else block
        return _block_digest(batch), batch.num_rows

    @ray.remote
    def write(block, name: str) -> int:
        batch = pa.table(block) if not isinstance(block, pa.Table) else block
        final = os.path.join(out_dir, name)
        if not os.path.exists(final):
            tmp = os.path.join(out_dir, f".{name}.{uuid.uuid4().hex}.tmp")
            with pa.ipc.new_file(tmp, batch.schema) as w:
                w.write_table(batch)
            os.rename(tmp, final)
        return 1

    refs = ds.to_arrow_refs()
    digs = ray.get([digest.remote(r) for r in refs])
    seen: collections.Counter = collections.Counter()
    futures = []
    for r, (dg, n_rows) in zip(refs, digs):
        if n_rows == 0:
            continue
        futures.append(write.remote(r, f"part-{dg}-{seen[dg]:03d}.arrow"))
        seen[dg] += 1
    return int(sum(ray.get(futures)))


def explain_scan(path: str | list[str], preds: list[tuple]) -> dict:
    """Dry-run the skipping stack for a conjunctive predicate and report
    what each level would prune — file skip index, stripe zone maps
    (+ blooms for string equality), per-row-group min/max — plus the
    stream bytes a scan would fetch vs the dataset total. Metadata-only:
    no blob bytes are read and nothing decodes. The tuning loop for
    'is my predicate actually pruning?' on a 10^5-file dataset."""
    from . import stripe as stripe_mod_

    usable = [
        (col, op, value)
        for col, op, value in preds
        if op not in ("ne", "not_in") and not (op == "like" and not stripe_mod_.like_prefix(value))
    ]
    files_total = files_kept = None
    if isinstance(path, str) and os.path.isdir(path):
        files_total = len(
            [f for f in os.listdir(path) if f.endswith((".parquet", ".arrow"))]
        )
        kept: set[str] | None = None
        for col, op, value in usable:
            lo, hi = stripe_mod_.string_pred_bounds(op, value)
            k = _index_prune_files(path, col, lo, hi)
            if k is None:
                kept = None
                break
            kept = set(k) if kept is None else kept & set(k)
        files_kept = len(kept) if kept is not None else files_total
        if kept is not None:
            path = sorted(kept) or path

    meta = read_encoded(path, metadata_only=True)
    pruned = meta
    for col, op, value in usable:
        lo, hi = stripe_mod_.string_pred_bounds(op, value)
        needle = _pred_needles(op, value)
        pruned = prune_stripes(pruned, col, lo, hi, needle)

    def totals(batch: pa.Table) -> pa.Table:
        rgs_total = rgs_kept = kept_bytes = 0
        for i in range(batch.num_rows):
            m = json.loads(batch.column("meta")[i].as_py())
            rgc = m["row_groups"]["count"]
            import pyarrow as _pa

            sch = stripe_mod_._deserialize_schema(batch.column("schema_ipc")[i].as_py()) if "schema_ipc" in batch.column_names else None
            keep = set(range(rgc))
            for col, op, value in usable:
                t = sch.field(col).type if sch is not None else None
                lo, hi = stripe_mod_.stat_bounds_for(op, value, t)
                sel = stripe_mod_.select_row_groups(m, col, lo, hi)
                if sel is not None:
                    keep &= set(sel)
            rgs_total += rgc
            rgs_kept += len(keep)
            for trees in m["columns"].values():
                for gi, tree in enumerate(trees["row_groups"]):
                    if gi in keep:
                        kept_bytes += sum(s["len"] for s in tree["streams"])
        return pa.table(
            {
                "stripes": pa.array([batch.num_rows], pa.int64()),
                "rgs_total": pa.array([rgs_total], pa.int64()),
                "rgs_kept": pa.array([rgs_kept], pa.int64()),
                "kept_bytes": pa.array([kept_bytes], pa.int64()),
            }
        )

    # schema_ipc rides along for typed bound translation
    meta_cols = ["stripe_key", "n_rows", "raw_bytes", "enc_bytes", "meta", "stats", "blooms", "schema_ipc"]
    meta_full = read_encoded(path, columns=meta_cols)
    total_stripes = meta_full.count()
    total_bytes = int(meta_full.sum("enc_bytes") or 0)
    surv = pruned  # stripes surviving zone maps (metadata rows)
    # re-read survivors with schema for rg-level accounting
    surv_keys = {r["stripe_key"] for r in surv.select_columns(["stripe_key"]).take_all()}

    def only_surv(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys = pa.array(sorted(surv_keys), pa.string())
        return batch.filter(pc.is_in(batch.column("stripe_key"), value_set=keys))

    parts = (
        meta_full.map_batches(only_surv, batch_format="pyarrow")
        .map_batches(totals, batch_format="pyarrow")
        .take_all()
    )
    stripes_kept = sum(r["stripes"] for r in parts)
    return {
        "files_total": files_total,
        "files_after_index": files_kept,
        "stripes_total": int(total_stripes),
        "stripes_after_zonemaps": int(stripes_kept),
        "row_groups_in_survivors": int(sum(r["rgs_total"] for r in parts)),
        "row_groups_after_stats": int(sum(r["rgs_kept"] for r in parts)),
        "stream_bytes_total": total_bytes,
        "stream_bytes_fetched": int(sum(r["kept_bytes"] for r in parts)),
    }


def explain_scan_or(path: str | list[str], preds: list[tuple]) -> dict:
    """explain_scan's disjunctive dual: dry-run the OR skipping stack —
    union stripe pruning (prune_stripes_or), row-group set UNION inside
    survivors — and report per-level survivors plus the stream bytes a
    scan would fetch. Metadata-only. An unprunable disjunct (ne /
    not_in / bare substring) reports honest full-scan numbers."""
    from . import stripe as stripe_mod_

    plans = or_pred_plans(preds)
    meta_cols = [
        "stripe_key", "n_rows", "raw_bytes", "enc_bytes", "meta", "stats",
        "blooms", "schema_ipc",
    ]
    meta_full = read_encoded(path, columns=meta_cols)
    total_stripes = meta_full.count()
    total_bytes = int(meta_full.sum("enc_bytes") or 0)
    surv = meta_full if plans is None else prune_stripes_or(meta_full, plans)

    rangeable = [
        (col, op, value)
        for col, op, value in preds
        if op not in ("ne", "not_in", "is_null", "not_null", "contains")
        and not (op == "like" and not stripe_mod_.like_prefix(value))
    ]
    all_rangeable = len(rangeable) == len(preds)

    def totals(batch: pa.Table) -> pa.Table:
        rgs_total = rgs_kept = kept_bytes = 0
        for i in range(batch.num_rows):
            m = json.loads(batch.column("meta")[i].as_py())
            rgc = m["row_groups"]["count"]
            sch = stripe_mod_._deserialize_schema(batch.column("schema_ipc")[i].as_py())
            if all_rangeable:
                keep: set = set()
                for col, op, value in rangeable:
                    lo, hi = stripe_mod_.stat_bounds_for(op, value, sch.field(col).type)
                    sel = stripe_mod_.select_row_groups(m, col, lo, hi)
                    if sel is None:
                        keep = set(range(rgc))
                        break
                    keep |= set(sel)
            else:
                keep = set(range(rgc))  # an unrangeable disjunct keeps all
            rgs_total += rgc
            rgs_kept += len(keep)
            for trees in m["columns"].values():
                for gi, tree in enumerate(trees["row_groups"]):
                    if gi in keep:
                        kept_bytes += sum(s["len"] for s in tree["streams"])
        return pa.table(
            {
                "stripes": pa.array([batch.num_rows], pa.int64()),
                "rgs_total": pa.array([rgs_total], pa.int64()),
                "rgs_kept": pa.array([rgs_kept], pa.int64()),
                "kept_bytes": pa.array([kept_bytes], pa.int64()),
            }
        )

    parts = surv.map_batches(totals, batch_format="pyarrow").take_all()
    return {
        "prunable": plans is not None,
        "stripes_total": int(total_stripes),
        "stripes_after_zonemaps": int(sum(r["stripes"] for r in parts)),
        "row_groups_in_survivors": int(sum(r["rgs_total"] for r in parts)),
        "row_groups_after_stats": int(sum(r["rgs_kept"] for r in parts)),
        "stream_bytes_total": total_bytes,
        "stream_bytes_fetched": int(sum(r["kept_bytes"] for r in parts)),
    }


def _iter_stripe_rows(batch: pa.Table):
    """Stripe-row dicts with blob/blooms as ZERO-COPY memoryviews over
    the Arrow buffers (same walk as StripeDecoder; .as_py() would copy
    each MB-sized blob before the codecs even look at it)."""
    for i in range(batch.num_rows):
        yield {
            name: (
                memoryview(batch.column(name)[i].as_buffer()).cast("B")
                if name in ("blob", "blooms")
                else batch.column(name)[i].as_py()
            )
            for name in batch.column_names
        }


def filter_encoded(
    path: str | list[str],
    column: str,
    op: str,
    value,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Predicate-pushdown SCAN over an encoded-on-disk dataset — the
    full skipping stack in one call, each level touching strictly less
    data than the one above:

      1. stripe prune: metadata-only read + zone maps (+ bloom for
         string equality) — non-overlapping stripes' blobs are never
         FETCHED (prune_read);
      2. row-group prune: per-rg min/max inside surviving stripes;
      3. dictionary-domain predicate: dict-encoded string stripes
         evaluate on the tiny dictionary and test only the integer
         index stream (stripe.predicate_mask);
      4. late materialization: only row groups with hits decode the
         projected columns, then filter by the row mask.

    op: eq | ne | lt | le | gt | ge | prefix | like | contains |
    is_null | not_null. Nulls never match the comparison ops;
    `is_null`/`not_null` (value ignored) prune stripes/files by the
    zone-map NULL COUNTS and evaluate on the PRESENT stream alone —
    a null-free row group never touches the blob.
    `prefix`/`like` (SQL %/_ wildcards) rewrite their
    literal prefix to the range [prefix, prefix_upper) so zone maps
    still prune; the residual pattern evaluates dictionary-domain
    where the column is dict-encoded. `contains` (value LIKE
    '%needle%') and the literal runs of infix LIKE patterns prune on
    per-stripe TRIGRAM blooms (pg_trgm-style: a stripe survives only
    if every byte trigram of every required literal might be present
    — no zone map can serve a substring predicate)."""
    from . import stripe as stripe_mod

    tri_needles: list[str] | None = None
    if op == "contains":
        tri_needles = [value] if len(str(value).encode()) >= 3 else None
    elif op == "like":
        tri_needles = stripe_mod.like_literal_runs(value) or None
    if op in ("is_null", "not_null"):
        enc = prune_read(path, column, null_op=op)
    elif op in ("ne", "not_in") or (
        op in ("like", "contains")
        and not (op == "like" and stripe_mod.like_prefix(value))
        and not tri_needles
    ):
        enc = read_encoded(path)  # no stats or blooms can prune these
    else:
        lo, hi = stripe_mod.string_pred_bounds(op, value)
        needle = _pred_needles(op, value)
        enc = prune_read(path, column, lo, hi, needle, tri_needles)

    def flt(batch: pa.Table) -> pa.Table:
        parts = [
            stripe_mod.filter_stripe(row, column, op, value, columns)
            for row in _iter_stripe_rows(batch)
        ]
        parts = [p for p in parts if p.num_rows] or parts[:1]
        if not parts:
            return pa.table({})
        return pa.concat_tables(parts)

    return enc.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


def filter_encoded_multi(
    path: str | list[str],
    preds: list[tuple],
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Conjunctive (AND) predicate-pushdown scan: every predicate's
    stripe prune chains on the metadata read (a stripe survives only
    if it overlaps ALL predicates — blobs of the rest are never
    fetched), then row-group sets intersect and hit masks AND inside
    the stripe with short-circuit evaluation. `preds` is a list of
    (column, op, value) with the same ops filter_encoded takes."""
    from . import stripe as stripe_mod

    usable = [
        (col, op, value)
        for col, op, value in preds
        if op not in ("ne", "not_in", "is_null", "not_null")
        and not (op == "like" and not stripe_mod.like_prefix(value))
    ]
    null_preds = [(col, op) for col, op, _ in preds if op in ("is_null", "not_null")]
    if isinstance(path, str) and os.path.isdir(path) and (usable or null_preds):
        # file-level skip index: intersect per-predicate file survivors
        kept: set[str] | None = None
        for col, op, value in usable:
            lo, hi = stripe_mod.string_pred_bounds(op, value)
            k = _index_prune_files(path, col, lo, hi)
            if k is None:
                kept = None
                break
            kept = set(k) if kept is None else kept & set(k)
        if kept is not None or not usable:
            for col, op in null_preds:
                k = _index_prune_files(path, col, None, None, null_op=op)
                if k is None:
                    break
                kept = set(k) if kept is None else kept & set(k)
        if kept is not None:
            files = sorted(kept) or sorted(
                os.path.join(path, f)
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )[:1]
            path = files
    pruned = read_encoded(path, metadata_only=True, include_paths=True)
    for col, op, value in usable:
        lo, hi = stripe_mod.string_pred_bounds(op, value)
        needle = _pred_needles(op, value)
        pruned = prune_stripes(pruned, col, lo, hi, needle)
    for col, op in null_preds:  # null-count zone maps
        pruned = prune_stripes(pruned, col, null_op=op)
    for col, op, value in preds:  # substring predicates: trigram prune
        tri = None
        if op == "contains" and len(str(value).encode()) >= 3:
            tri = [value]
        elif op == "like":
            tri = stripe_mod.like_literal_runs(value) or None
        if tri:
            pruned = prune_stripes(pruned, col, tri_needles=tri)
    enc = pruned.map_batches(_FetchStripes(), batch_format="pyarrow")

    def flt(batch: pa.Table) -> pa.Table:
        parts = [
            stripe_mod.filter_stripe_multi(row, preds, columns)
            for row in _iter_stripe_rows(batch)
        ]
        parts = [p for p in parts if p.num_rows] or parts[:1]
        if not parts:
            return pa.table({})
        return pa.concat_tables(parts)

    return enc.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


def group_count_encoded(path: str | list[str], column: str) -> ray.data.Dataset:
    """`SELECT <column>, COUNT(*) ... GROUP BY <column>` pushed into
    the encoded format: every stripe emits a tiny (key, cnt) histogram
    partial — dictionary-encoded stripes via ONE np.bincount over the
    integer index stream, per-row strings never materializing
    (stripe.group_count_stripe) — and a single null-safe groupby sums
    partials whose row count is bounded by column CARDINALITY x
    stripes, not data rows. The exchange therefore carries a few KB per
    stripe at any corpus size; the reference answers the same query by
    decoding every value and aggregating downstream
    (StripeReader.NextBatch feeds the full column out)."""
    from ray.data.aggregate import Sum

    from . import stripe as stripe_mod
    from .ops import nullkeys

    enc = read_encoded(path)

    def partial(batch: pa.Table) -> pa.Table:
        parts = [
            stripe_mod.group_count_stripe(row, column)
            for row in _iter_stripe_rows(batch)
        ]
        parts = [p for p in parts if p.num_rows] or parts[:1]
        if not parts:
            return pa.table({})
        return pa.concat_tables(parts)

    partials = enc.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return nullkeys.null_safe_group_aggregate(
        partials, [column], [Sum("cnt", alias_name="cnt")]
    )


def group_agg_encoded(
    path: str | list[str], key_column: str, value_column: str, scale: int = 0
) -> ray.data.Dataset:
    """`SELECT key, COUNT(*), SUM(v), MIN(v), MAX(v) ... GROUP BY key`
    pushed into the encoded format: every stripe emits a
    cardinality-bounded partial (stripe.group_agg_stripe — dictionary
    key codes + one weighted bincount/minimum.at pass per row group,
    per-row key strings never materialize), then ONE null-safe groupby
    merges partials. SUM is exact int64 at 10^scale (order-independent
    merge); output columns: key, cnt, vcnt, sum_e{scale} (int64),
    min_v, max_v. The exchange carries a few rows per stripe at any
    corpus size — the TPC-H-Q1 shape answered without the value column
    ever leaving its task at full width."""
    from ray.data.aggregate import Max, Min, Sum

    from . import stripe as stripe_mod
    from .ops import nullkeys

    enc = read_encoded(path)

    def partial(batch: pa.Table) -> pa.Table:
        parts = [
            stripe_mod.group_agg_stripe(row, key_column, value_column, scale)
            for row in _iter_stripe_rows(batch)
        ]
        parts = [p for p in parts if p.num_rows] or parts[:1]
        if not parts:
            return pa.table({})
        return pa.concat_tables(parts)

    partials = enc.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = nullkeys.null_safe_group_aggregate(
        partials,
        [key_column],
        [
            Sum("cnt", alias_name="cnt"),
            Sum("vcnt", alias_name="vcnt"),
            Sum("sum_scaled", alias_name=f"sum_e{scale}"),
            Min("min_v", alias_name="min_v"),
            Max("max_v", alias_name="max_v"),
        ],
    )

    def fix_types(batch: pa.Table) -> pa.Table:
        # Ray's Sum widens to double on some paths; the scaled sum is
        # an exact integer by construction — pin int64 in the output
        for c in ("cnt", "vcnt", f"sum_e{scale}"):
            i = batch.column_names.index(c)
            if batch.column(c).type != pa.int64():
                batch = batch.set_column(i, c, batch.column(c).cast(pa.int64()))
        return batch

    return merged.map_batches(fix_types, batch_format="pyarrow", zero_copy_batch=True)


def quantile_bounds_encoded(path: str | list[str], column: str, q: float) -> dict:
    """GUARANTEED bounds on the exact q-quantile (quantile_disc
    semantics: the ceil(q*N)-th smallest non-null value) from stripe
    zone maps ALONE — no blob byte is read. Over candidate values
    drawn from the stripe mins/maxes: values GUARANTEED <= c = sum of
    counts of stripes whose max <= c (so the quantile is <= the first
    candidate where that reaches the target rank), and values POSSIBLY
    <= c = sum over stripes whose min <= c (so the quantile is > every
    candidate where that stays below the rank). The planner's 'roughly
    where is the median' question answered for the cost of a metadata
    scan; on a clustered layout (OPTIMIZE) the interval collapses to
    ~one stripe's range. Driver holds one (min, max, count) row per
    stripe — a planning diagnostic, not a data path. Returns
    {lower, upper, n, rank}; None bounds when the column has no
    non-null stats."""
    meta = read_encoded(path, metadata_only=True)

    def extract(batch: pa.Table) -> pa.Table:
        mns, mxs, cnts = [], [], []
        for sj in batch.column("stats").to_pylist():
            st = json.loads(sj).get(column, {})
            c = (st.get("count") or 0) - (st.get("null_count") or 0)
            if c > 0 and st.get("min") is not None and st.get("max") is not None:
                mns.append(float(st["min"]))
                mxs.append(float(st["max"]))
                cnts.append(int(c))
        return pa.table(
            {
                "mn": pa.array(mns, pa.float64()),
                "mx": pa.array(mxs, pa.float64()),
                "c": pa.array(cnts, pa.int64()),
            }
        )

    rows = meta.map_batches(extract, batch_format="pyarrow", zero_copy_batch=True).take_all()
    if not rows:
        return {"lower": None, "upper": None, "n": 0, "rank": 0}
    mn = np.array([r["mn"] for r in rows])
    mx = np.array([r["mx"] for r in rows])
    c = np.array([r["c"] for r in rows], dtype=np.int64)
    n_total = int(c.sum())
    target = max(1, int(-(-q * n_total // 1)))  # ceil(q*N), 1-based rank
    cands = np.unique(np.concatenate([mn, mx]))
    # guaranteed <= cand: stripes fully below; possibly <= cand: any overlap
    gle = (mx[None, :] <= cands[:, None]) @ c
    ple = (mn[None, :] <= cands[:, None]) @ c
    upper = float(cands[np.argmax(gle >= target)]) if (gle >= target).any() else float(
        cands[-1]
    )
    below = cands[ple < target]
    lower = float(below[-1]) if len(below) else float(cands[0])
    return {"lower": lower, "upper": upper, "n": n_total, "rank": target}


def agg_where_encoded(path: str | list[str], column: str, lo, hi):
    """COUNT(*) / MIN / MAX over rows where `column` BETWEEN lo AND hi
    with BOUNDARY REFINEMENT: a stripe whose zone map lies FULLY
    INSIDE the range answers from stats alone (matching rows = count -
    null_count; min/max are the stats values), a stripe fully outside
    contributes nothing, and only STRADDLING stripes fetch + decode —
    the predicate column alone, through the row-group mask machinery.
    On a clustered layout (OPTIMIZE / naturally ordered ingest) the
    decode cost is O(boundary stripes) ~ O(1) regardless of table
    size; the metadata pass is the only full scan and touches no blob
    bytes. Returns (one-row Table {cnt, min_v, max_v}, report dict
    {stripes_total, stripes_metadata_only, stripes_decoded}).
    SQL semantics: nulls never match; empty result -> cnt 0, null
    min/max. Numeric predicate columns only (min_v/max_v report as
    float64; use filter_encoded + agg for temporal/string ranges)."""
    from . import stripe as stripe_mod

    t = encoded_union_schema(path).field(column).type
    if not (pa.types.is_integer(t) or pa.types.is_floating(t)):
        raise ValueError(
            f"agg_where_encoded needs a numeric column; {column} is {t}"
        )
    meta = read_encoded(path, metadata_only=True, include_paths=True)

    def classify(batch: pa.Table) -> pa.Table:
        kinds = []
        cnts = []
        mns, mxs = [], []
        for sj in batch.column("stats").to_pylist():
            st = json.loads(sj).get(column, {})
            smin, smax = st.get("min"), st.get("max")
            cnt, nc = st.get("count"), st.get("null_count", 0)
            b_lo = stripe_mod.stat_bound(lo, st.get("unit"))
            b_hi = stripe_mod.stat_bound(hi, st.get("unit"))
            if smin is None or smax is None or cnt is None:
                kind = "b"  # no stats: must decode
            elif (b_lo is not None and smax < b_lo) or (
                b_hi is not None and smin > b_hi
            ):
                kind = "o"  # fully outside
            elif (b_lo is None or smin >= b_lo) and (b_hi is None or smax <= b_hi):
                kind = "m"  # fully inside: metadata answers
            else:
                kind = "b"
            kinds.append(kind)
            if kind == "m":
                cnts.append(int(cnt) - int(nc or 0))
                mns.append(smin)
                mxs.append(smax)
        return pa.table(
            {
                "stripe_key": batch.column("stripe_key"),
                "kind": pa.array(kinds, pa.string()),
                "m_cnt": pa.array(
                    [cnts.pop(0) if k == "m" else 0 for k in kinds], pa.int64()
                ),
                "m_min": pa.array(
                    [mns.pop(0) if k == "m" else None for k in kinds], pa.float64()
                ),
                "m_max": pa.array(
                    [mxs.pop(0) if k == "m" else None for k in kinds], pa.float64()
                ),
            }
        )

    cls = meta.map_batches(classify, batch_format="pyarrow", zero_copy_batch=True)
    rows = cls.take_all()  # one tiny row per stripe
    n_total = len(rows)
    n_meta = sum(1 for r in rows if r["kind"] == "m")
    boundary_keys = {r["stripe_key"] for r in rows if r["kind"] == "b"}
    cnt = sum(r["m_cnt"] for r in rows if r["kind"] == "m")
    mins = [r["m_min"] for r in rows if r["kind"] == "m" and r["m_min"] is not None]
    maxs = [r["m_max"] for r in rows if r["kind"] == "m" and r["m_max"] is not None]
    if boundary_keys:
        import pyarrow.compute as pc

        keyset = pa.array(sorted(boundary_keys), pa.string())

        def keep_boundary(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.is_in(batch.column("stripe_key"), value_set=keyset)
            )

        enc = meta.map_batches(
            keep_boundary, batch_format="pyarrow", zero_copy_batch=True
        ).map_batches(_FetchStripes(), batch_format="pyarrow")

        preds = [(column, "ge", lo)] if lo is not None else []
        if hi is not None:
            preds.append((column, "le", hi))

        def partial(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            c = 0
            mn = mx = None
            for row in _iter_stripe_rows(batch):
                if preds:
                    t = stripe_mod.filter_stripe_multi(row, preds, columns=[column])
                else:  # fully open range: count the non-null values
                    t = stripe_mod.decode_stripe(row, [column]).drop_null()
                if t.num_rows:
                    c += t.num_rows
                    m = pc.min_max(t.column(column))
                    vmn, vmx = m["min"].as_py(), m["max"].as_py()
                    mn = vmn if mn is None else min(mn, vmn)
                    mx = vmx if mx is None else max(mx, vmx)
            return pa.table(
                {
                    "cnt": pa.array([c], pa.int64()),
                    "mn": pa.array([mn], pa.float64()),
                    "mx": pa.array([mx], pa.float64()),
                }
            )

        for r in enc.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).take_all():
            cnt += r["cnt"]
            if r["mn"] is not None:
                mins.append(r["mn"])
            if r["mx"] is not None:
                maxs.append(r["mx"])
    out = pa.table(
        {
            "cnt": pa.array([cnt], pa.int64()),
            "min_v": pa.array([min(mins) if mins else None], pa.float64()),
            "max_v": pa.array([max(maxs) if maxs else None], pa.float64()),
        }
    )
    report = {
        "stripes_total": n_total,
        "stripes_metadata_only": n_meta,
        "stripes_decoded": len(boundary_keys),
        "stripes_outside": n_total - n_meta - len(boundary_keys),
    }
    return out, report


def sample_scan_encoded(
    path: str | list[str],
    key_column: str,
    rate: float,
    salt: str = "",
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Deterministic hash-sample SCAN pushed into the encoded format:
    the gate (fnv(salt || str(key)) % 1e6 < rate*1e6 — the exact
    ops.sample.hash_sample contract) evaluates on the KEY COLUMN ALONE
    per row group, and only groups holding sampled rows decode the
    projected columns (stripe.sample_stripe). A post-decode
    hash_sample reads every stream of every column; this scan
    decompresses the key stream plus survivors only — the difference
    is the whole point at 100 TB, where a 1% audit sample should cost
    ~1% of the decode. Sampled sets are identical to hash_sample's
    (same fingerprint, SQL-replayable) at any rate, layout, or
    cluster width."""
    from . import stripe as stripe_mod

    enc = read_encoded(path)

    def flt(batch: pa.Table) -> pa.Table:
        parts = [
            stripe_mod.sample_stripe(row, key_column, rate, salt, columns)
            for row in _iter_stripe_rows(batch)
        ]
        parts = [p for p in parts if p.num_rows] or parts[:1]
        if not parts:
            return pa.table({})
        return pa.concat_tables(parts)

    return enc.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


def prune_stripes_or(ds: ray.data.Dataset, plans: list[dict]) -> ray.data.Dataset:
    """Disjunctive stripe pruning in ONE metadata pass: a stripe
    survives iff AT LEAST ONE disjunct plan might match it — zone-map
    range, then (only if the range passes) bloom needles and trigram
    runs can each rule the disjunct out. Each plan dict carries `col`
    plus one of: `null_op`; `tri`; or `lo`/`hi` (+ optional `needles`,
    `tri`). Plans come from filter_encoded_or; the conjunctive analog
    is the chained prune_stripes."""
    from . import bloom as bloom_mod
    from . import stripe as stripe_mod

    def keep(batch: pa.Table) -> pa.Table:
        mask = np.zeros(batch.num_rows, dtype=bool)
        stats_col = batch.column("stats").to_pylist()
        metas = batch.column("meta").to_pylist()
        blooms = batch.column("blooms").to_pylist()
        for i in range(batch.num_rows):
            st_all = json.loads(stats_col[i])
            m = None
            for p in plans:
                st = st_all.get(p["col"], {})
                if p.get("null_op"):
                    nc, cnt = st.get("null_count"), st.get("count")
                    if p["null_op"] == "is_null" and nc == 0:
                        continue  # null-free stripe: disjunct can't match
                    if p["null_op"] == "not_null" and nc is not None and nc == cnt:
                        continue  # all-null stripe
                    mask[i] = True
                    break
                lo_, hi_ = st.get("min"), st.get("max")
                mn = stripe_mod.stat_bound(p.get("lo"), st.get("unit"))
                mx = stripe_mod.stat_bound(p.get("hi"), st.get("unit"))
                if mn is not None and hi_ is not None and hi_ < mn:
                    continue  # zone map rules this disjunct out
                if mx is not None and lo_ is not None and lo_ > mx:
                    continue
                bl = blooms[i]
                if bl:
                    if m is None:
                        m = json.loads(metas[i])
                    if p.get("needles") is not None:
                        idx = m.get("blooms", {}).get(p["col"])
                        if idx:
                            off, ln = idx
                            if not bloom_mod.might_contain(
                                bl[off : off + ln], p["needles"]
                            ).any():
                                continue  # bloom rules it out
                    if p.get("tri"):
                        idx = m.get("tri_blooms", {}).get(p["col"])
                        if idx:
                            off, ln = idx
                            tb = bl[off : off + ln]
                            if not all(
                                bloom_mod.might_contain_substring(tb, nd)
                                for nd in p["tri"]
                            ):
                                continue
                mask[i] = True  # this disjunct might match -> fetch
                break
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


def or_pred_plans(preds: list[tuple]) -> list[dict] | None:
    """Compile OR disjuncts into prune plans for prune_stripes_or, or
    None when any disjunct is unprunable (ne / not_in / substring with
    no >=3-byte literal) — one such disjunct means every stripe could
    hold a match, so pruning must not run at all."""
    from . import stripe as stripe_mod

    plans: list[dict] = []
    for col, op, value in preds:
        if op in ("ne", "not_in"):
            return None
        if op in ("is_null", "not_null"):
            plans.append({"col": col, "null_op": op})
            continue
        if op == "contains":
            if len(str(value).encode()) < 3:
                return None
            plans.append({"col": col, "tri": [value]})
            continue
        if op == "like" and not stripe_mod.like_prefix(value):
            tri = stripe_mod.like_literal_runs(value) or None
            if tri is None:
                return None
            plans.append({"col": col, "tri": tri})
            continue
        lo, hi = stripe_mod.string_pred_bounds(op, value)
        plans.append(
            {
                "col": col,
                "lo": lo,
                "hi": hi,
                "needles": _pred_needles(op, value),
                "tri": (stripe_mod.like_literal_runs(value) or None)
                if op == "like"
                else None,
            }
        )
    return plans


def filter_encoded_or(
    path: str | list[str],
    preds: list[tuple],
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Disjunctive (OR) predicate-pushdown scan — the dual of
    filter_encoded_multi: a stripe is FETCHED iff AT LEAST ONE disjunct
    might match it. Per-disjunct zone-map / bloom / trigram judgments
    evaluate in ONE metadata pass and OR together (the AND path chains
    per-predicate prune filters; chaining cannot express a union), then
    row-group sets UNION and hit masks OR inside the stripe
    (stripe.filter_stripe_or), with all-ones short-circuit. One
    unprunable disjunct (ne / not_in / LIKE with neither an anchored
    prefix nor a >=3-byte literal run) makes every stripe a potential
    match, so the scan honestly degrades to a full fetch with the same
    OR mask semantics. `preds` are (column, op, value) rows with the
    ops filter_encoded takes."""
    from . import stripe as stripe_mod

    if not preds:
        raise ValueError("filter_encoded_or needs at least one predicate")

    plans = or_pred_plans(preds)
    if plans is None:
        enc = read_encoded(path)
    else:
        pruned = prune_stripes_or(
            read_encoded(path, metadata_only=True, include_paths=True), plans
        )
        enc = pruned.map_batches(_FetchStripes(), batch_format="pyarrow")

    def flt(batch: pa.Table) -> pa.Table:
        parts = [
            stripe_mod.filter_stripe_or(row, preds, columns)
            for row in _iter_stripe_rows(batch)
        ]
        parts = [p for p in parts if p.num_rows] or parts[:1]
        if not parts:
            return pa.table({})
        return pa.concat_tables(parts)

    return enc.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


def sorted_limit(
    path: str | list[str],
    keys: str | list[str],
    n: int,
    descending: bool = False,
    columns: list[str] | None = None,
) -> pa.Table:
    """`ORDER BY <keys> LIMIT n` over an encoded dataset WITHOUT a full
    sort — the layout-aware top-k the reference answers with a whole-
    table sort (MothRecordReader feeds an external sort; here the
    stripe zone maps already order the scan):

      1. metadata pass: every stripe's (min, max, non-null rows) of the
         LEADING key — tiny fixed-width rows, never the blob;
      2. contribution rule: a stripe survives iff fewer than n rows are
         GUARANTEED to precede its best value (sum of non-null rows of
         stripes whose max < this stripe's min; mirrored under
         descending) — exact, and on a sort-clustered layout (OPTIMIZE
         / Z-ORDER) it keeps O(n / rows_per_stripe) stripes;
      3. surviving stripes fetch + decode (projected columns only) with
         a per-batch partial top-n, so the driver merges at most
         blocks x n rows.

    Null leading keys are EXCLUDED (SQL `WHERE key IS NOT NULL ORDER BY
    ... LIMIT n` semantics). `descending` orders the leading key;
    tiebreak keys always ascend. Returns the n-row Arrow table."""
    from . import stripe as stripe_mod

    keys = [keys] if isinstance(keys, str) else list(keys)
    lead = keys[0]

    def summarize(batch: pa.Table) -> pa.Table:
        ks, los, his, rows_ = [], [], [], []
        for sj, sk in zip(
            batch.column("stats").to_pylist(), batch.column("stripe_key").to_pylist()
        ):
            st = json.loads(sj).get(lead, {})
            ks.append(sk)
            los.append(json.dumps(st.get("min")))
            his.append(json.dumps(st.get("max")))
            cnt, nc = st.get("count"), st.get("null_count")
            rows_.append(cnt - nc if cnt is not None and nc is not None else None)
        return pa.table(
            {
                "stripe_key": pa.array(ks),
                "path": batch.column("path"),
                "lo": pa.array(los),
                "hi": pa.array(his),
                "vrows": pa.array(rows_, pa.int64()),
            }
        )

    meta = read_encoded(path, metadata_only=True, include_paths=True)
    info = meta.map_batches(summarize, batch_format="pyarrow").take_all()
    for r in info:
        r["lo"], r["hi"] = json.loads(r["lo"]), json.loads(r["hi"])

    # guaranteed-preceding counts via one sort + prefix sums (O(m log m)
    # in the stripe count, never O(m^2)); stripes without stats always
    # survive and guarantee nothing (conservative both ways)
    import bisect

    known = sorted(
        ((r["hi"], r["lo"])[descending], r["vrows"] or 0)
        for r in info
        if r["lo"] is not None and r["hi"] is not None and r["vrows"] is not None
    )
    bounds = [k for k, _ in known]
    prefix = [0]
    for _, v in known:
        prefix.append(prefix[-1] + v)

    survivors = []
    for r in info:
        best = (r["lo"], r["hi"])[descending]  # the stripe's first value in scan order
        if best is None:
            survivors.append(r)
            continue
        if descending:
            # rows guaranteed after (greater than) this stripe's max
            guaranteed = prefix[-1] - prefix[bisect.bisect_right(bounds, best)]
        else:
            # rows guaranteed before (less than) this stripe's min
            guaranteed = prefix[bisect.bisect_left(bounds, best)]
        if guaranteed < n:
            survivors.append(r)
    if not survivors:  # only possible when n <= 0 or the dataset is empty
        rows = read_encoded(path, columns=["schema_ipc"]).take(1)
        if not rows:
            return pa.table({})
        schema = stripe_mod._deserialize_schema(rows[0]["schema_ipc"])
        names = columns if columns is not None else schema.names
        return pa.schema([schema.field(nm) for nm in names]).empty_table()

    units = ray.data.from_items(
        [{"path": r["path"], "stripe_key": r["stripe_key"]} for r in survivors],
        override_num_blocks=max(1, min(len(survivors), 64)),
    )
    fetched = units.map_batches(_FetchStripes(), batch_format="pyarrow")
    order = "descending" if descending else "ascending"
    sort_keys = [(lead, order)] + [(k, "ascending") for k in keys[1:]]
    # the sort keys must decode even when projected away; drop them after
    decode_cols = (
        None
        if columns is None
        else columns + [k for k in keys if k not in columns]
    )

    def topk(batch: pa.Table) -> pa.Table:
        parts = [
            stripe_mod.decode_stripe(row, decode_cols)
            for row in _iter_stripe_rows(batch)
        ]
        t = pa.concat_tables(parts)
        t = t.filter(pa.compute.is_valid(t.column(lead)))
        idx = pa.compute.sort_indices(t, sort_keys=sort_keys)[:n]
        return t.take(idx)

    blocks = list(
        fetched.map_batches(topk, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None
        )
    )
    tbl = pa.concat_tables([b for b in blocks if b.num_rows] or blocks[:1])
    idx = pa.compute.sort_indices(tbl, sort_keys=sort_keys)[:n]
    tbl = tbl.take(idx)
    return tbl.select(columns) if columns is not None else tbl


# ---------------------------------------------------------------- skew / shuffle

def add_host_bucket(
    ds: ray.data.Dataset,
    num_buckets: int,
    url_column: str = "url",
    hot_hosts: dict[str, int] | None = None,
    seed: int = 0,
) -> ray.data.Dataset:
    """Adds a `bucket` column = hash(host) % num_buckets, salting hosts
    listed in `hot_hosts` (host -> fanout) across `fanout` buckets —
    the north-rule skew control (BASELINE.json north_rule). Broadcast
    `hot_hosts` comes from a sampling pass (sample_host_frequencies).
    """
    hot = hot_hosts or {}

    def bucketize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        urls = batch.column(url_column)
        hosts = pc.replace_substring_regex(
            pc.replace_substring_regex(urls, r"^https?://", ""), r"/.*$", ""
        )
        base = hash_string_column(hosts)
        bucket = (base % np.uint64(num_buckets)).astype(np.int32)
        if hot:
            # deterministic per-row salt (url hash), so retries re-bucket identically
            url_salt = hash_string_column(urls)
            for h, fan in hot.items():
                mask = pc.equal(hosts, h).fill_null(False).to_numpy(zero_copy_only=False)
                if mask.any():
                    bucket[mask] = (
                        (base[mask] + url_salt[mask] % np.uint64(fan)) % np.uint64(num_buckets)
                    ).astype(np.int32)
        return batch.append_column("bucket", pa.array(bucket))

    return ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)


def hash_string_column(arr) -> np.ndarray:
    """Vectorized 64-bit hash of a string column (splitmix sample mix —
    the bloom-layer hash; fine for bucketing). Replaces the former
    per-row hashlib.md5 loop."""
    from . import bloom as bloom_mod
    from .column import _string_parts

    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    lengths, data = _string_parts(arr.fill_null(""))
    return bloom_mod.hash_bytes_columns(lengths, np.frombuffer(data, dtype=np.uint8))


def hash_host(host: str) -> int:
    return int(hash_string_column(pa.array([host]))[0])


_TARGET_BUCKET_BYTES = 128 << 20


def _auto_bucket_count(ds: ray.data.Dataset, target_bytes: int = _TARGET_BUCKET_BYTES) -> int:
    """Bucket count from the dataset's (metadata) size so one bucket —
    which one map_groups task materializes — stays ~target_bytes at any
    corpus scale, instead of a fixed constant that would grow to
    corpus/32 bytes per task."""
    try:
        size = ds.size_bytes()
    except Exception:
        size = None
    if not size:
        return 32
    return int(min(max(size // target_bytes + 1, 4), 65536))


def encode_clustered(
    ds: ray.data.Dataset,
    url_column: str = "url",
    num_buckets: int | None = None,
    opts: dict | None = None,
    sample_fraction: float = 0.05,
    hot_fraction: float = 0.02,
) -> ray.data.Dataset:
    """The north-rule skew-aware encode: sample host frequencies, salt
    hot hosts, hash-shuffle rows by url-host bucket, then encode each
    bucket's rows together (one shuffle; same-host pages share
    dictionaries/FSST symbols, which is also why the reference sorts
    its dictionaries — locality buys ratio).

    The shuffle is `groupby(bucket).map_groups(encode)` — Ray's hash
    exchange. Bucket count is derived from input size (~128 MB per
    bucket) so the per-task materialized group stays bounded at corpus
    scale; salting keeps hot hosts from pinning one bucket."""
    from . import plan as plan_mod

    if num_buckets is None:
        num_buckets = _auto_bucket_count(ds)
    hot = sample_host_frequencies(ds, url_column, sample_fraction, hot_fraction)
    codec_plan = plan_mod.plan_dataset(ds, sample_fraction)
    opts_all = codec_plan.to_opts(opts)
    bucketed = add_host_bucket(ds, num_buckets, url_column, hot_hosts=hot)

    # per-BUCKET FSST tables: strip the sampling-pass tables so each
    # bucket trains its own from its (host-clustered) pages — same-host
    # pages share symbols, which is the point of clustering; the
    # encoding CHOICE (fsst/dict/direct) still comes from the plan
    bucket_opts = {
        **opts_all,
        "column_plans": {
            c: {k: v for k, v in p.items() if k != "fsst_table"}
            for c, p in opts_all.get("column_plans", {}).items()
        },
    }

    def encode_bucket(group: pa.Table) -> pa.Table:
        bucket_id = group.column("bucket")[0].as_py() if group.num_rows else 0
        tbl = group.drop_columns(["bucket"])
        return stripe_mod.encode_batch(tbl, bucket_opts, key_prefix=f"b{bucket_id:04d}")

    return bucketed.groupby("bucket").map_groups(encode_bucket, batch_format="pyarrow")


def sample_host_frequencies(
    ds: ray.data.Dataset, url_column: str = "url", fraction: float = 0.05, hot_fraction: float = 0.01
) -> dict[str, int]:
    """Pass-1 sampling: find hosts that exceed `hot_fraction` of rows;
    returns {host: fanout} for salting (SURVEY.md §4.2 skew row)."""
    import pyarrow.compute as pc

    sample = ds.random_sample(fraction, seed=17)

    def hosts_only(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_column)
        hosts = pc.replace_substring_regex(
            pc.replace_substring_regex(urls, r"^https?://", ""), r"/.*$", ""
        )
        return pa.table({"host": hosts})

    counts = (
        sample.map_batches(hosts_only, batch_format="pyarrow").groupby("host").count()
    ).materialize()  # bounded by distinct hosts, stays in the object store
    total = counts.sum("count()") or 0
    if total == 0:
        return {}
    cutoff = total * hot_fraction
    # only the hot hosts (at most 1/hot_fraction rows) reach the driver;
    # vectorized batch filter (a row-lambda filter deserializes per row)
    import pyarrow.compute as pc

    hot = counts.map_batches(
        lambda t: t.filter(pc.greater(t.column("count()"), cutoff)),
        batch_format="pyarrow",
    ).to_pandas()
    return {
        row["host"]: max(2, int(row["count()"] / cutoff)) for _, row in hot.iterrows()
    }


# ---------------------------------------------------------------- convenience

def _rewrite_stripe_columns(batch: pa.Table, rename: dict | None, drop: set | None) -> pa.Table:
    """Per-stripe METADATA rewrite for schema evolution: every
    column-keyed structure (stream trees, stats, bloom index, row-group
    min/max, codec metrics, Arrow schema) re-keys / sheds entries; the
    BLOB passes through byte-identical — nothing decodes or re-encodes.
    A dropped column's stream bytes stay in the blob (unreferenced)
    until the next compaction/OPTIMIZE rewrite, mirroring how columnar
    stores make DROP O(metadata)."""
    rename = rename or {}
    drop = drop or set()

    def remap(d: dict) -> dict:
        return {rename.get(k, k): v for k, v in d.items() if k not in drop}

    metas, stats_out, schemas = [], [], []
    for i in range(batch.num_rows):
        meta = json.loads(batch.column("meta")[i].as_py())
        meta["columns"] = remap(meta["columns"])
        meta["blooms"] = remap(meta.get("blooms", {}))
        meta["tri_blooms"] = remap(meta.get("tri_blooms", {}))
        if "stats" in meta.get("row_groups", {}):
            meta["row_groups"]["stats"] = remap(meta["row_groups"]["stats"])
        if "codecs" in meta.get("metrics", {}):
            meta["metrics"]["codecs"] = remap(meta["metrics"]["codecs"])
        metas.append(json.dumps(meta))
        stats_out.append(json.dumps(remap(json.loads(batch.column("stats")[i].as_py()))))
        sch = stripe_mod._deserialize_schema(batch.column("schema_ipc")[i].as_py())
        fields = [
            f.with_name(rename.get(f.name, f.name))
            for f in sch
            if f.name not in drop
        ]
        schemas.append(stripe_mod._serialize_schema(pa.schema(fields)))
    out = batch.set_column(batch.column_names.index("meta"), "meta", pa.array(metas))
    out = out.set_column(out.column_names.index("stats"), "stats", pa.array(stats_out))
    return out.set_column(
        out.column_names.index("schema_ipc"), "schema_ipc", pa.array(schemas, pa.binary())
    )


def _encoded_column_names(path: str | list[str]) -> list[str]:
    """Column names of an encoded dataset from ONE stripe's meta (every
    column appears in meta['columns'] regardless of stats coverage)."""
    rows = read_encoded(path, metadata_only=True).limit(1).take_all()
    if not rows:
        return []
    return list(json.loads(rows[0]["meta"])["columns"].keys())


def rename_column_encoded(in_dir: str | list[str], out_dir: str, old: str, new: str) -> None:
    """COW schema evolution: RENAME a column on an encoded dataset with
    a streaming metadata-only rewrite (blob bytes copy through, no
    decode/re-encode). Output is a fresh encoded dataset directory.
    Validates up front: `old` must exist (a typo must not be a silent
    no-op) and `new` must not collide with an existing column (the
    remap would silently overwrite one column's streams with the
    other's and emit a duplicate-name schema)."""
    cols = _encoded_column_names(in_dir)
    if old not in cols:
        raise KeyError(f"column {old!r} not in encoded dataset (have {cols})")
    if new != old and new in cols:  # old == new: harmless identity rewrite
        raise ValueError(f"rename target {new!r} already exists (have {cols})")
    enc = read_encoded(in_dir)
    write_encoded(
        enc.map_batches(
            lambda b: _rewrite_stripe_columns(b, {old: new}, None),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        out_dir,
    )


def drop_column_encoded(
    in_dir: str | list[str], out_dir: str, names: list[str], reclaim: bool = False
) -> None:
    """COW schema evolution: DROP columns on an encoded dataset with a
    streaming metadata-only rewrite. By default dropped stream bytes
    remain in the blobs until an OPTIMIZE rewrite (documented in
    _rewrite_stripe_columns); `reclaim=True` additionally rebuilds each
    blob keeping only surviving streams (stripe.vacuum_stripe_blob) —
    still a pure memcpy with rebased offsets, never a decode or
    re-encode, so dropping a fat text column frees its bytes at I/O
    speed instead of OPTIMIZE's full re-encode cost."""
    cols = _encoded_column_names(in_dir)
    missing = [n for n in names if n not in cols]
    if missing:
        raise KeyError(f"columns {missing} not in encoded dataset (have {cols})")
    if not set(cols) - set(names):
        raise ValueError("cannot drop every column")

    def rewrite(b: pa.Table) -> pa.Table:
        out = _rewrite_stripe_columns(b, None, set(names))
        if not reclaim:
            return out
        rows = [
            stripe_mod.vacuum_stripe_blob(
                {c: out.column(c)[i].as_py() for c in out.column_names}
            )
            for i in range(out.num_rows)
        ]
        return pa.Table.from_pylist(rows, schema=stripe_mod.STRIPE_SCHEMA)

    enc = read_encoded(in_dir)
    write_encoded(
        enc.map_batches(rewrite, batch_format="pyarrow", zero_copy_batch=True),
        out_dir,
    )


def add_column_encoded(
    in_dir: str | list[str],
    out_dir: str,
    name: str,
    fn,
    input_columns: list[str],
    opts: dict | None = None,
) -> None:
    """COW schema evolution: ADD COLUMN on an encoded dataset, the
    column computed per stripe as `fn(projected_table) -> pa.Array`
    over `input_columns`. Completes the RENAME / DROP / CAST / UPDATE
    family: within each stripe only the input projection DECODES and
    only the new column's streams ENCODE — every existing column's
    bytes memcpy through with rebased offsets
    (stripe.replace_column_in_stripe add mode), so cost scales with
    the new column, not table width. Streaming, no shuffle; the
    reference writer is append-only (MothWriter.go) — this is the
    lakehouse extension of it."""
    cols = _encoded_column_names(in_dir)
    if name in cols:
        raise ValueError(f"column {name!r} already exists (have {cols})")
    missing = [c for c in input_columns if c not in cols]
    if missing:
        raise KeyError(f"input columns {missing} not in encoded dataset (have {cols})")

    def rewrite(b: pa.Table) -> pa.Table:
        rows = []
        for i in range(b.num_rows):
            row = {c: b.column(c)[i].as_py() for c in b.column_names}
            proj = stripe_mod.decode_stripe(row, columns=input_columns)
            values = fn(proj)
            if isinstance(values, pa.ChunkedArray):
                values = values.combine_chunks()
            row = stripe_mod.replace_column_in_stripe(
                row, name, values, opts, old_nbytes=0, add=True
            )
            row["stripe_key"] = row["stripe_key"] + "a"
            rows.append(row)
        return pa.Table.from_pylist(rows, schema=stripe_mod.STRIPE_SCHEMA)

    enc = read_encoded(in_dir)
    write_encoded(
        enc.map_batches(rewrite, batch_format="pyarrow", zero_copy_batch=True),
        out_dir,
    )


def read_text_source(
    path: str | list[str], format: str = "csv", schema: pa.Schema | None = None
) -> ray.data.Dataset:
    """CSV / JSONL ingestion source: Ray's native distributed readers
    (one task per file/split), composing with encode_dataset so corpora
    delivered as text dumps encode without a parquet conversion step.
    `schema` (pyarrow) pins column types — CSV/JSON type inference is
    per-file, and a column that happens to be all-null or all-digits in
    one shard must not change type across shards."""
    if format in ("csv", "tsv"):
        from pyarrow import csv as pacsv

        kwargs = {}
        if schema is not None:
            kwargs["convert_options"] = pacsv.ConvertOptions(
                column_types={f.name: f.type for f in schema}
            )
        if format == "tsv":
            kwargs["parse_options"] = pacsv.ParseOptions(delimiter="\t")
        return ray.data.read_csv(path, **kwargs)
    if format in ("jsonl", "json"):
        kwargs = {}
        if schema is not None:
            from pyarrow import json as pajson

            kwargs["parse_options"] = pajson.ParseOptions(explicit_schema=schema)
        return ray.data.read_json(path, **kwargs)
    raise ValueError(f"unsupported text source format: {format!r} (csv|tsv|jsonl)")


def make_warc(records: list[dict], http: bool = True) -> bytes:
    """Serialize records as a WARC/1.0 byte stream (ISO 28500 layout:
    version line, named headers, Content-Length, CRLF CRLF, payload,
    CRLF CRLF separator). Each record dict: url, date (ISO string),
    body (bytes), and optional type (default 'response'). With
    `http=True` response payloads carry a minimal HTTP/1.1 envelope the
    reader strips — the same shape Common Crawl archives use. Exists
    for tests and synthetic fixtures; the engine never writes WARC."""
    out = bytearray()
    for i, rec in enumerate(records):
        body = rec["body"] if isinstance(rec["body"], bytes) else rec["body"].encode()
        rtype = rec.get("type", "response")
        if http and rtype == "response":
            body = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: "
                + str(len(body)).encode()
                + b"\r\n\r\n"
                + body
            )
        hdr = (
            f"WARC/1.0\r\n"
            f"WARC-Type: {rtype}\r\n"
            f"WARC-Record-ID: <urn:uuid:{i:032x}>\r\n"
            f"WARC-Date: {rec['date']}\r\n"
            f"WARC-Target-URI: {rec['url']}\r\n"
            + ("Content-Type: application/http; msgtype=response\r\n" if http and rtype == "response" else "")
            + f"Content-Length: {len(body)}\r\n\r\n"
        ).encode()
        out += hdr + body + b"\r\n\r\n"
    return bytes(out)


def _parse_warc_stream(fh) -> Iterator[dict]:
    """Record iterator over one WARC stream: version line, header block
    to the blank line, Content-Length payload bytes, separator. HTTP
    response payloads strip their HTTP envelope (headers end at the
    first CRLFCRLF) so `html` is the document body, matching what a
    text-extraction stage expects. Malformed tails stop iteration
    rather than raising — a truncated fetch yields its complete prefix."""
    while True:
        line = fh.readline()
        if not line:
            return
        if not line.strip():
            continue  # inter-record padding
        if not line.startswith(b"WARC/"):
            return  # desynced: stop at the last complete record
        headers = {}
        while True:
            h = fh.readline()
            if not h or h in (b"\r\n", b"\n"):
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b""))
        except ValueError:
            return
        payload = fh.read(length)
        if len(payload) < length:
            return  # truncated
        ctype = headers.get(b"content-type", b"")
        if ctype.startswith(b"application/http"):
            sep = payload.find(b"\r\n\r\n")
            if sep >= 0:
                payload = payload[sep + 4 :]
        yield {
            "url": headers.get(b"warc-target-uri", b"").decode("utf-8", "replace"),
            "warc_date": headers.get(b"warc-date", b"").decode("ascii", "replace"),
            "warc_type": headers.get(b"warc-type", b"").decode("ascii", "replace"),
            "html": payload,
        }


def read_warc_source(
    path: str | list[str], record_types: tuple = ("response",)
) -> ray.data.Dataset:
    """WARC ingestion source (the container Common Crawl actually
    ships): the file list fans out one task per archive — the natural
    WARC split unit, since records are back-to-back with no index —
    and each task streams records (gzip-transparent: .warc.gz archives
    are concatenated gzip members, which Python's GzipFile walks) into
    (url, warc_ts, html) Arrow rows, HTTP envelopes stripped. Emits the
    north-rule page shape directly; compose with html_extract / langid
    / encode_dataset for the full CC pipeline. `record_types` filters
    (default: response records only — request/metadata records carry
    no page body)."""
    import glob as _glob
    import gzip

    if isinstance(path, str):
        if os.path.isdir(path):
            paths = sorted(
                p
                for pat in ("*.warc", "*.warc.gz")
                for p in _glob.glob(os.path.join(path, pat))
            )
        else:
            paths = [path]
    else:
        paths = list(path)
    if not paths:
        raise FileNotFoundError(f"no WARC files under {path!r}")
    want = set(record_types)

    def load(batch: pa.Table) -> Iterator[pa.Table]:
        for p in batch.column("path").to_pylist():
            opener = gzip.open if p.endswith(".gz") else open
            urls, dates, bodies = [], [], []
            with opener(p, "rb") as fh:
                for rec in _parse_warc_stream(fh):
                    if want and rec["warc_type"] not in want:
                        continue
                    urls.append(rec["url"])
                    dates.append(rec["warc_date"])
                    bodies.append(rec["html"])
            import pyarrow.compute as pc

            ts = pa.array(dates, pa.string())
            yield pa.table(
                {
                    "url": pa.array(urls, pa.string()),
                    "warc_ts": pc.strptime(
                        ts, format="%Y-%m-%dT%H:%M:%SZ", unit="us", error_is_null=True
                    ),
                    "html": pa.array(bodies, pa.binary()),
                }
            )

    units = ray.data.from_items([{"path": p} for p in paths])
    return units.map_batches(load, batch_format="pyarrow", batch_size=1)


def read_ipc_source(path: str | list[str]) -> ray.data.Dataset:
    """Arrow IPC / Feather ingestion: Ray has no native IPC reader, so
    the file list fans out as work items and each task memory-maps its
    file (zero-copy open) and emits the record batches — one task per
    file, the same per-shard parallelism contract as the CSV/JSONL
    sources. Accepts a directory (scans *.arrow / *.feather / *.ipc),
    a single file, or an explicit list."""
    import glob
    import os

    if isinstance(path, str):
        if os.path.isdir(path):
            paths = sorted(
                p
                for pat in ("*.arrow", "*.feather", "*.ipc")
                for p in glob.glob(os.path.join(path, pat))
            )
        else:
            paths = [path]
    else:
        paths = list(path)
    if not paths:
        raise FileNotFoundError(f"no Arrow IPC files under {path!r}")

    def load(batch: pa.Table) -> pa.Table:
        tables = []
        for p in batch.column("path").to_pylist():
            with pa.memory_map(p) as src:
                tables.append(pa.ipc.open_file(src).read_all())
        return pa.concat_tables(tables)

    units = ray.data.from_items([{"path": p} for p in paths])
    return units.map_batches(
        load, batch_format="pyarrow", batch_size=1, zero_copy_batch=True
    )


def read_input(path: str | list[str], columns: list[str] | None = None) -> ray.data.Dataset:
    """read_parquet with a block count sized to saturate the CPUs: the
    default (one block per file / large target blocks) starves wide
    nodes when the input has few files — 16 files cap the encode stage
    at 16 concurrent tasks regardless of cluster width."""
    import ray as ray_api

    ds = ray.data.read_parquet(path, columns=columns)
    try:
        ncpu = int(ray_api.cluster_resources().get("CPU", 8))
        size = ds.size_bytes()
    except Exception:
        return ds
    if not size:
        return ds
    target = int(min(max(size // (8 << 20), ncpu * 2), ncpu * 16))
    # splitting BELOW row-group granularity re-decompresses the row
    # group once per split (measured 3x wall at 64 splits of a 1-group
    # file) — cap near the row-group count, keeping a little
    # parallelism even for single-group files
    try:
        import pyarrow.dataset as pads

        total_rgs = sum(
            f.metadata.num_row_groups
            for f in pads.dataset(path, format="parquet").get_fragments()
        )
        target = min(target, max(total_rgs, max(ncpu // 4, 1)))
    except Exception:
        pass
    return ray.data.read_parquet(path, columns=columns, override_num_blocks=target)


def encode_parquet_to_dir(
    input_path: str | list[str],
    out_dir: str,
    opts: dict | None = None,
    columns: list[str] | None = None,
) -> None:
    """read_parquet -> encode -> write_parquet, fully streaming."""
    ds = read_input(input_path, columns=columns)
    encode_dataset(ds, opts).write_parquet(out_dir, **ENCODED_PARQUET_ARGS)


def verify_roundtrip(original: ray.data.Dataset, decoded: ray.data.Dataset, key: str) -> bool:
    """The reference's validateFile analog (MothReader.go:176-182):
    sort both sides by `key` and byte-compare every column. Use on
    small/test data — materializes both sides."""
    import pyarrow.compute as pc

    a = pa.concat_tables(original.iter_batches(batch_format="pyarrow", batch_size=None))
    b = pa.concat_tables(decoded.iter_batches(batch_format="pyarrow", batch_size=None))
    if a.num_rows != b.num_rows or set(a.column_names) != set(b.column_names):
        return False
    a = a.take(pc.sort_indices(a.column(key)))
    b = b.take(pc.sort_indices(b.column(key)))
    return all(
        a.column(c).combine_chunks().equals(b.column(c).combine_chunks())
        for c in a.column_names
    )


# stream blobs are already zstd/lz4-framed by the codec stack; parquet
# re-compressing them (default snappy) burns CPU on both the write and
# every later read for ~0.2% size. Keep the page-level default for the
# small JSON meta/stats columns only.
ENCODED_PARQUET_ARGS = {"compression": {"blob": "NONE", "blooms": "NONE"}}


def write_encoded(enc: ray.data.Dataset, out_dir: str, row_group_size: int = 8) -> None:
    """Write encoded stripe rows with SMALL parquet row groups (stripe
    rows are MB-sized; default writer row groups would put a whole
    block's blobs in one group, defeating prune_read's row-group-
    targeted fetch). The constant is deliberate: deriving it from
    measured stripe bytes would need count()/size_bytes(), which
    executes the (lazy) encode pipeline a second time — and 8 stripe
    rows ≈ 8-30 MB keeps both prune fetches and decode_files work
    units well-grained across stripe sizes."""
    enc.write_parquet(out_dir, row_group_size=row_group_size, **ENCODED_PARQUET_ARGS)


def encode_partitioned(
    ds: ray.data.Dataset, out_dir: str, partition_col: str, opts: dict | None = None
) -> None:
    """Hive-partitioned encoded sink: each batch splits by partition
    value IN-TASK (no shuffle — a task appends to several directories),
    every sub-batch encodes to its own single-valued stripes, and the
    stripe rows ride a `__part` column that write_parquet(partition_cols)
    turns into `out_dir/__part=<value>/` subdirectories. The partition
    column also stays INSIDE the encoded data, so decode round-trips
    without path parsing; the directory layout exists for whole-
    partition pruning and per-partition resume/compaction (the
    'resumable output: one directory per key range' rule).

    Partition values should be clean categorical scalars (lang codes,
    dates, buckets): they become directory names. Rows whose partition
    value is NULL route to the Hive-conventional
    `__HIVE_DEFAULT_PARTITION__` directory (they must not silently
    vanish from the encoded output)."""
    from . import stripe as stripe_mod_

    o = dict(opts or {})

    def enc(batch: pa.Table) -> pa.Table:
        col = batch.column(partition_col)
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        d = col.dictionary_encode()
        # fill_null(-1): null partition values yield null dictionary
        # indices, which to_numpy turns into NaN — NaN == ci is False for
        # every ci and the row would land in NO sub-batch (data loss)
        codes = d.indices.fill_null(-1).to_numpy(zero_copy_only=False)
        outs = []
        parts = [(ci, str(d.dictionary[ci].as_py())) for ci in range(len(d.dictionary))]
        if (codes == -1).any():
            parts.append((-1, "__HIVE_DEFAULT_PARTITION__"))
        for ci, v in parts:
            sub = batch.filter(pa.array(codes == ci))
            st = stripe_mod_.encode_batch(sub, o, key_prefix=_batch_key(sub))
            outs.append(st.append_column("__part", pa.array([v] * st.num_rows)))
        if not outs:
            empty = stripe_mod_.STRIPE_SCHEMA.empty_table()
            return empty.append_column("__part", pa.array([], pa.string()))
        return pa.concat_tables(outs)

    enc_ds = ds.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True)
    enc_ds.write_parquet(
        out_dir, partition_cols=["__part"], row_group_size=8, **ENCODED_PARQUET_ARGS
    )


def encode_bucketed(
    ds: ray.data.Dataset,
    out_dir: str,
    key_column: str,
    n_buckets: int,
    opts: dict | None = None,
) -> None:
    """Hash-bucketed encoded layout: bucket = FNV(str(key)) %
    n_buckets (the repo-wide fingerprint the SQL oracles replay)
    becomes the hive partition, so a point lookup or key-equality scan
    opens ONE bucket directory — 1/n_buckets of the table at any
    corpus size — before the normal skipping stack even starts. Two
    tables bucketed on their join key with equal n_buckets co-locate
    matching keys bucket-for-bucket (the shuffle-free bucket-join
    layout). Bucketing params persist in `_bucketing.json`; the
    `__bucket` column rides inside the data and is stripped by
    bucket_lookup."""
    import json as _json

    from .ops.sample import _key_fingerprints

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = _key_fingerprints(batch, key_column, "") % np.uint64(n_buckets)
        return batch.append_column(
            "__bucket",
            pa.array([f"b{int(x):05d}" for x in b], pa.string()),
        )

    encode_partitioned(
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True),
        out_dir,
        "__bucket",
        opts,
    )
    with open(os.path.join(out_dir, "_bucketing.json"), "w") as f:
        _json.dump({"key_column": key_column, "n_buckets": int(n_buckets)}, f)


def bucket_lookup(
    out_dir: str, value, columns: list[str] | None = None
) -> pa.Table:
    """Point lookup on an encode_bucketed layout: hash the probe key
    with the SAME fingerprint, open that one bucket directory, and run
    the full predicate-pushdown scan (zone maps, blooms, dictionary
    domain, late materialization) inside it. Returns the matching rows
    as a Table (point lookups are small by construction)."""
    import json as _json

    from .ops.sample import _key_fingerprints

    with open(os.path.join(out_dir, "_bucketing.json")) as f:
        spec = _json.load(f)
    key_column, n_buckets = spec["key_column"], spec["n_buckets"]
    probe = pa.table({key_column: pa.array([value])})
    b = int(_key_fingerprints(probe, key_column, "")[0] % np.uint64(n_buckets))
    dirs = encoded_partition_dirs(out_dir)
    d = dirs.get(f"b{b:05d}")
    if d is None:  # bucket never materialized: no such key
        return pa.table({})
    out = filter_encoded(d, key_column, "eq", value, columns).take_all()
    if not out:
        return pa.table({})
    t = pa.Table.from_pylist(out)
    if "__bucket" in t.column_names and (columns is None or "__bucket" not in columns):
        t = t.drop_columns(["__bucket"])
    return t


def encoded_partition_dirs(out_dir: str) -> dict[str, str]:
    """{partition value: directory} for an encode_partitioned dataset.
    Directory names are hive/URL-encoded by the writer ('a/b' →
    '__part=a%2Fb'); keys here are the ORIGINAL values."""
    from urllib.parse import unquote

    out = {}
    for name in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, name)
        if os.path.isdir(p) and name.startswith("__part="):
            out[unquote(name.split("=", 1)[1])] = p
    return out


def read_encoded_partitions(
    out_dir: str, values: list | None = None, metadata_only: bool = False
) -> ray.data.Dataset:
    """Encoded stripe rows of the named partitions only — unselected
    directories are never listed into the read (whole-partition
    pruning, the coarsest level of the skipping stack). values=None
    reads every partition."""
    dirs = encoded_partition_dirs(out_dir)
    if values is None:
        sel = list(dirs.values())
    else:
        missing = [v for v in values if str(v) not in dirs]
        if missing:
            raise KeyError(f"partitions not found: {missing}; have {sorted(dirs)}")
        sel = [dirs[str(v)] for v in values]
    # read_parquet expands a single directory but not directories
    # inside a path LIST: list the files explicitly
    paths = [
        os.path.join(d, f)
        for d in sel
        for f in sorted(os.listdir(d))
        if f.endswith(".parquet")
    ]
    return read_encoded(paths, metadata_only=metadata_only)


def dataset_content_hash(ds: ray.data.Dataset) -> tuple[int, int]:
    """Order-insensitive content fingerprint: (wrapping sum of per-row
    xxhash64 row hashes, row count). Computed distributed — one tiny
    row per batch reaches the driver — so dataset equality checks
    stream at any scale. Columns are hashed in sorted-name order so
    column order doesn't matter."""

    def h(batch: pa.Table) -> pa.Table:
        import polars as pl

        hv = pl.from_arrow(batch.select(sorted(batch.column_names))).hash_rows(seed=7).to_numpy()
        s = np.uint64(0) if len(hv) == 0 else np.sum(hv.astype(np.uint64), dtype=np.uint64)
        return pa.table({"h": pa.array([int(s)], type=pa.uint64()), "n": [batch.num_rows]})

    parts = ds.map_batches(h, batch_format="pyarrow").to_pandas()
    total = int(np.sum(parts["h"].to_numpy().astype(np.uint64), dtype=np.uint64))
    return total, int(parts["n"].sum())


def verify_roundtrip_streaming(original: ray.data.Dataset, decoded: ray.data.Dataset) -> bool:
    """Streaming equality check (multiset semantics): order-insensitive
    row-hash sums on both sides — nothing materializes on the driver,
    unlike verify_roundtrip's sort-and-compare. Use for large data; a
    matching fingerprint means equal row multisets up to 64-bit hash
    collision odds."""
    return dataset_content_hash(original) == dataset_content_hash(decoded)


def read_encoded(
    path: str | list[str],
    metadata_only: bool = False,
    include_paths: bool = False,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    if columns is not None:
        cols = columns
    else:
        cols = ["stripe_key", "n_rows", "raw_bytes", "enc_bytes", "meta", "stats", "blooms"] if metadata_only else None
    ipc_files = _discover_ipc_files(path)
    if ipc_files:
        # IPC interchange layout: mmap + column select — a metadata read
        # never faults in a blob page (lazy mapping), matching the
        # parquet path's column-projected scan
        def load(batch: pa.Table) -> Iterator[pa.Table]:
            for p in batch.column("path").to_pylist():
                t = pa.ipc.open_file(pa.memory_map(p)).read_all()
                if cols is not None:
                    t = t.select(cols)
                if include_paths:
                    t = t.append_column("path", pa.array([p] * t.num_rows))
                yield t

        units = ray.data.from_items(
            [{"path": p} for p in ipc_files],
            override_num_blocks=max(len(ipc_files), 1),
        )
        return units.map_batches(load, batch_format="pyarrow", batch_size=None)
    return ray.data.read_parquet(path, columns=cols, include_paths=include_paths)


def encoded_union_schema(in_dir: str | list[str]) -> pa.Schema:
    """UNION-BY-NAME schema of every stripe in an encoded dataset —
    the read-side half of schema evolution: a dataset whose early
    stripes predate an added column decodes uniformly by passing this
    as decode's `target_schema` (old stripes pad the new columns with
    typed nulls via decode_stripe's name-based field mapping;
    reference analog: NameBasedFieldMapper.go:23-31).

    Fields keep first-seen order; a name (case-insensitive) seen with
    two different types raises — silent coercion would corrupt data.
    Metadata-only: reads the schema_ipc column, never a blob byte."""
    from . import stripe as stripe_mod

    seen: dict[str, pa.Field] = {}
    order: list[str] = []
    rows = read_encoded(in_dir, columns=["schema_ipc"]).take_all()
    for r in rows:
        sch = stripe_mod._deserialize_schema(r["schema_ipc"])
        for f in sch:
            key = f.name.lower()
            if key not in seen:
                seen[key] = f
                order.append(key)
            elif seen[key].type != f.type:
                raise TypeError(
                    f"encoded_union_schema: column {f.name!r} stored as both "
                    f"{seen[key].type} and {f.type}; run cast_column to migrate "
                    "before a union read"
                )
    return pa.schema([seen[k] for k in order])
