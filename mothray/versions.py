"""Snapshot versioning / time travel for encoded datasets.

Copy-on-write at part-file granularity, exploiting the immutability
the encoded format already has: a version is a JSON manifest under
`<dir>/_versions/` listing the part files it is made of. A mutation
writes ONLY the files it changes (under fresh `-v{N}` names, so no
existing file is ever touched) and carries every unchanged file
forward BY NAME — shared, not copied. Reads resolve a manifest, then
run the normal encoded-read path over its file list, so pruning /
pushdown / decode all work unchanged on any version.

    v0: [part-00000, part-00001]            (adopt)
    v1: [part-00000-v1, part-00001]         (delete touched file 0)
    v2: [part-00000-v1, part-00001, part-v2-00000]   (append)

`vacuum` deletes files referenced by NO kept manifest. Concurrent
writers are out of scope (single-writer, like the reference's
MothWriter); the manifest write is atomic (tmp + rename) so readers
never see a torn version.

No reference analog — orc-go's writer is append-only with no table
state (reference: pkg/store/MothDataSink.go) — this is the
Delta/Iceberg-style extension of the engine, same spirit as FSST:
build ON the format what the format already makes cheap.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

_VDIR = "_versions"


def _vdir(table_dir: str) -> str:
    return os.path.join(table_dir, _VDIR)


def _vpath(table_dir: str, version: int) -> str:
    return os.path.join(_vdir(table_dir), f"v{version:06d}.json")


class VersionConflict(RuntimeError):
    """Another writer committed this version first. The losing commit's
    data files are orphans that vacuum() reclaims; retry the operation
    from the new head."""


def _write_manifest(table_dir: str, m: dict) -> None:
    """Optimistic-concurrency commit: the manifest lands via
    link(tmp, final), which FAILS IF THE VERSION EXISTS — two writers
    racing the same parent produce one winner and one VersionConflict
    instead of a silently overwritten history (the Iceberg/Delta
    atomic-commit contract, expressed with POSIX semantics)."""
    os.makedirs(_vdir(table_dir), exist_ok=True)
    path = _vpath(table_dir, m["version"])
    tmp = path + f".{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        json.dump(m, f, indent=1, sort_keys=True)
    try:
        os.link(tmp, path)  # atomic, exclusive: loser raises
    except FileExistsError:
        raise VersionConflict(
            f"version {m['version']} at {table_dir} was committed by another"
            " writer; re-read the head and retry"
        ) from None
    except OSError:
        # filesystem without hard links (some network/FUSE mounts):
        # reserve the name exclusively, then rename the payload over
        # the placeholder — exclusivity from O_EXCL, atomic content
        # from rename
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
        except FileExistsError:
            os.unlink(tmp)
            raise VersionConflict(
                f"version {m['version']} at {table_dir} was committed by"
                " another writer; re-read the head and retry"
            ) from None
        os.rename(tmp, path)
        return
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)


def latest_version(table_dir: str) -> int | None:
    import re

    d = _vdir(table_dir)
    if not os.path.isdir(d):
        return None
    # strict v<digits>.json match: a stray file in _versions/ must not
    # crash every entry point, and versions past 6 digits (the zero-pad
    # width) must parse whole, not as a truncated slice
    vs = [
        int(m.group(1))
        for f in os.listdir(d)
        if (m := re.fullmatch(r"v(\d+)\.json", f))
    ]
    return max(vs) if vs else None


def manifest(table_dir: str, version: int | None = None) -> dict:
    if version is None:
        version = latest_version(table_dir)
        if version is None:
            raise FileNotFoundError(f"no versions at {table_dir} (run adopt() first)")
    with open(_vpath(table_dir, version)) as f:
        return json.load(f)


def history(table_dir: str) -> list[dict]:
    """All SURVIVING manifests oldest-first, metrics included (the
    lineage log). vacuum() removes dropped versions' manifests, so the
    log may have holes — they are skipped, not crashed on."""
    last = latest_version(table_dir)
    if last is None:
        return []
    out = []
    for v in range(last + 1):
        if os.path.exists(_vpath(table_dir, v)):
            out.append(manifest(table_dir, v))
    return out


def files(table_dir: str, version: int | None = None) -> list[str]:
    return [os.path.join(table_dir, f) for f in manifest(table_dir, version)["files"]]


def adopt(table_dir: str, op: str = "adopt") -> dict:
    """Start the version log: v0 = the part files already present.
    No-op (returns the existing latest) if a log already exists."""
    cur = latest_version(table_dir)
    if cur is not None:
        return manifest(table_dir, cur)
    parts = sorted(f for f in os.listdir(table_dir) if f.endswith(".parquet"))
    m = {"version": 0, "parent": None, "op": op, "files": parts, "metrics": {"files": len(parts)}}
    _write_manifest(table_dir, m)
    return m


def read_version(table_dir: str, version: int | None = None, metadata_only: bool = False):
    """Dataset of stripe rows for one version (default latest). A
    version whose file list is empty (a DELETE matched every row) reads
    as an empty stripe-row Dataset, not a reader error."""
    import ray.data

    from . import pipeline
    from . import stripe as stripe_mod

    fs = files(table_dir, version)
    if not fs:
        return ray.data.from_arrow(stripe_mod.STRIPE_SCHEMA.empty_table())
    return pipeline.read_encoded(fs, metadata_only=metadata_only)


def decode_version(table_dir: str, version: int | None = None, columns: list[str] | None = None):
    """Dataset of ORIGINAL rows for one version — the time-travel read.
    Runs the fused read->decode path, so pruning and projection apply
    to historical versions exactly as to the head. An all-rows-deleted
    version decodes as an empty Dataset."""
    import ray.data

    from . import pipeline

    fs = files(table_dir, version)
    if not fs:
        return ray.data.from_items([])
    return pipeline.decode_files(fs, columns=columns)


def prune_read(table_dir: str, column: str, min_value=None, max_value=None,
               needle: str | None = None, version: int | None = None):
    """Pruned scan of ONE version. Always go through a manifest on a
    versioned table: a bare directory scan (pipeline.prune_read on the
    dir) would read every live version's files at once and duplicate
    rows shared history has rewritten."""
    from . import pipeline

    return pipeline.prune_read(files(table_dir, version), column, min_value, max_value, needle)


def _fold_outstanding(table_dir: str) -> dict:
    """COW rewrites read RAW part files, so outstanding merge-on-read
    deletes (positional DVs / equality-delete key files) would
    RESURRECT in the child version. Every COW op therefore folds them
    first via compact_deletes — one extra auditable version in the
    history — and proceeds from the compacted manifest."""
    parent = manifest(table_dir)
    if parent.get("deletes") or parent.get("eq_deletes"):
        return compact_deletes(table_dir)
    return parent


def delete_where(table_dir: str, column: str, min_value=None, max_value=None) -> dict:
    """Versioned DELETE of rows with `column` in [min_value, max_value]
    (SQL BETWEEN; nulls survive): the current version's files fan out
    as work units; files whose zone maps miss the range carry forward
    BY NAME (zero bytes moved — the COW win over the non-versioned
    delete_where, which must copy passthrough files into its out_dir);
    touched files rewrite under `-v{N}` names. Outstanding
    merge-on-read deletes fold first (_fold_outstanding). Commits and
    returns the new manifest."""
    import ray
    import ray.data
    import pyarrow.parquet as pq

    from . import pipeline

    parent = _fold_outstanding(table_dir)
    new_v = parent["version"] + 1
    if not parent["files"]:  # all rows already deleted: trivial child
        m = {
            "version": new_v, "parent": parent["version"],
            "op": f"delete_where({column} in [{min_value}, {max_value}])",
            "files": [],
            "metrics": {"files": 0, "files_rewritten": 0,
                        "stripes_rewritten": 0, "rows_deleted": 0},
        }
        _write_manifest(table_dir, m)
        return m

    def process(batch: pa.Table) -> pa.Table:
        out = []
        for name in batch.column("name").to_pylist():
            path = os.path.join(table_dir, name)
            changed, new_tbl, stripes, rows = pipeline._delete_in_file(
                path, column, min_value, max_value
            )
            if not changed:
                out.append((name, name, stripes, rows))
                continue
            if new_tbl is None:
                out.append((name, "", stripes, rows))  # whole file deleted
                continue
            stem = name[: -len(".parquet")]
            new_name = f"{stem}-v{new_v}.parquet"
            tmp = os.path.join(table_dir, new_name + ".tmp")
            pq.write_table(new_tbl, tmp, row_group_size=8, **pipeline.ENCODED_PARQUET_ARGS)
            os.rename(tmp, os.path.join(table_dir, new_name))
            out.append((name, new_name, stripes, rows))
        return pa.table(
            {
                "old": pa.array([o for o, _, _, _ in out]),
                "new": pa.array([n for _, n, _, _ in out]),
                "stripes_rewritten": pa.array([s for _, _, s, _ in out], pa.int64()),
                "rows_deleted": pa.array([r for _, _, _, r in out], pa.int64()),
            }
        )

    items = [{"name": n} for n in parent["files"]]
    units = ray.data.from_items(items, override_num_blocks=max(len(items), 1))
    res = units.map_batches(process, batch_format="pyarrow").to_pandas()
    by_old = dict(zip(res["old"], res["new"]))
    new_files = [by_old.get(n, n) for n in parent["files"] if by_old.get(n, n)]
    m = {
        "version": new_v,
        "parent": parent["version"],
        "op": f"delete_where({column} in [{min_value}, {max_value}])",
        "files": new_files,
        "metrics": {
            "files": len(new_files),
            # a fully-deleted file (new == "") is a DELETION, not a rewrite
            "files_rewritten": int(((res["old"] != res["new"]) & (res["new"] != "")).sum()),
            "files_deleted": int((res["new"] == "").sum()),
            "stripes_rewritten": int(res["stripes_rewritten"].sum()),
            "rows_deleted": int(res["rows_deleted"].sum()),
        },
    }
    _write_manifest(table_dir, m)
    return m


def upsert_keys(table_dir: str, new_rows: pa.Table, key: str) -> dict:
    """Versioned MERGE: rows whose `key` appears in `new_rows` are
    replaced, new keys appended — as a COW commit. The (broadcast)
    key set probes each current file's zone maps; files that cannot
    contain an upserted key carry forward BY NAME, touched files
    rewrite under `-v{N}` names, and the upsert batch encodes as one
    fresh part. Same kernel as the rewrite-style pipeline.upsert_keys
    (pipeline._upsert_in_file)."""
    import ray
    import ray.data
    import pyarrow.parquet as pq

    from . import pipeline, stripe as stripe_mod

    parent = _fold_outstanding(table_dir)
    new_v = parent["version"] + 1
    keys_ref = ray.put(new_rows.column(key).combine_chunks())
    if not parent["files"]:  # empty parent: the upsert batch is the table
        import pandas as _pd

        res = _pd.DataFrame({"old": [], "new": [], "stripes_rewritten": [],
                             "rows_replaced": []})
        new_files = []
    else:
        res = None

    def process(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        out = []
        for name in batch.column("name").to_pylist():
            path = os.path.join(table_dir, name)
            changed, new_tbl, stripes, rows = pipeline._upsert_in_file(path, keys, key)
            if not changed:
                out.append((name, name, stripes, rows))
                continue
            if new_tbl is None:
                out.append((name, "", stripes, rows))
                continue
            new_name = f"{name[: -len('.parquet')]}-v{new_v}.parquet"
            tmp = os.path.join(table_dir, new_name + ".tmp")
            pq.write_table(new_tbl, tmp, row_group_size=8, **pipeline.ENCODED_PARQUET_ARGS)
            os.rename(tmp, os.path.join(table_dir, new_name))
            out.append((name, new_name, stripes, rows))
        return pa.table(
            {
                "old": pa.array([o for o, _, _, _ in out]),
                "new": pa.array([n for _, n, _, _ in out]),
                "stripes_rewritten": pa.array([s for _, _, s, _ in out], pa.int64()),
                "rows_replaced": pa.array([r for _, _, _, r in out], pa.int64()),
            }
        )

    if res is None:
        units = ray.data.from_items(
            [{"name": n} for n in parent["files"]],
            override_num_blocks=max(len(parent["files"]), 1),
        )
        res = units.map_batches(process, batch_format="pyarrow").to_pandas()
        by_old = dict(zip(res["old"], res["new"]))
        new_files = [by_old.get(n, n) for n in parent["files"] if by_old.get(n, n)]

    up_name = f"part-v{new_v}-upsert.parquet"
    enc_new = stripe_mod.encode_batch(new_rows, key_prefix=f"v{new_v}upsert")
    tmp = os.path.join(table_dir, up_name + ".tmp")
    pq.write_table(enc_new, tmp, row_group_size=8, **pipeline.ENCODED_PARQUET_ARGS)
    os.rename(tmp, os.path.join(table_dir, up_name))
    new_files.append(up_name)

    m = {
        "version": new_v,
        "parent": parent["version"],
        "op": f"upsert_keys({key}, {new_rows.num_rows} rows)",
        "files": new_files,
        "metrics": {
            "files": len(new_files),
            # a fully-deleted file (new == "") is a deletion, not a rewrite
            "files_rewritten": int(((res["old"] != res["new"]) & (res["new"] != "")).sum()),
            "files_deleted": int((res["new"] == "").sum()),
            "stripes_rewritten": int(res["stripes_rewritten"].sum()),
            "rows_replaced": int(res["rows_replaced"].sum()),
            "rows_upserted": int(new_rows.num_rows),
        },
    }
    _write_manifest(table_dir, m)
    return m


def append(table_dir: str, ds, opts: dict | None = None) -> dict:
    """Versioned APPEND: encode `ds` (a Dataset of original rows)
    through the normal distributed sink into a staging subdir (no data
    ever flows through the driver), then rename the staged files to
    fresh `part-v{N}-*` names — a metadata-only commit step. Existing
    files are untouched; history stays readable."""
    import shutil

    from . import pipeline

    parent = manifest(table_dir)
    stage = os.path.join(table_dir, f"_staging_v{parent['version'] + 1}")
    shutil.rmtree(stage, ignore_errors=True)
    pipeline.write_encoded(pipeline.encode_dataset(ds, opts), stage)
    return _commit_staged(table_dir, stage, parent, "append", parent["files"], {})


def _commit_staged(table_dir: str, stage: str, parent: dict, op: str,
                   carry: list[str], metrics: dict) -> dict:
    """Rename staged part files to `part-v{N}-*` names and commit
    `carry + staged` as version N (metadata-only step, shared by the
    full-rewrite ops below)."""
    import shutil

    new_v = parent["version"] + 1
    added = []
    for i, f in enumerate(sorted(os.listdir(stage))):
        if not f.endswith(".parquet"):
            continue
        name = f"part-v{new_v}-{i:05d}.parquet"
        os.rename(os.path.join(stage, f), os.path.join(table_dir, name))
        added.append(name)
    shutil.rmtree(stage, ignore_errors=True)
    m = {
        "version": new_v,
        "parent": parent["version"],
        "op": op,
        "files": carry + added,
        "deletes": {k: v for k, v in (parent.get("deletes", {}) or {}).items()
                    if k in set(carry)},
        "eq_deletes": parent.get("eq_deletes", []) or [],
        "metrics": {**metrics, "files_added": len(added)},
    }
    _write_manifest(table_dir, m)
    return m


def optimize(table_dir: str, sort_by: str | list[str], opts: dict | None = None) -> dict:
    """Versioned OPTIMIZE (cluster-by / Z-order): re-encode the current
    version sorted by `sort_by` into staging, commit as a
    full-replacement version. History still reads the unclustered
    files; vacuum reclaims them when the old versions are dropped."""
    from . import pipeline

    parent = _fold_outstanding(table_dir)
    stage = os.path.join(table_dir, f"_staging_v{parent['version'] + 1}")
    import shutil

    shutil.rmtree(stage, ignore_errors=True)
    res = pipeline.optimize_encoded(files(table_dir), stage, sort_by=sort_by, opts=opts)
    keys = sort_by if isinstance(sort_by, str) else ",".join(sort_by)
    return _commit_staged(
        table_dir, stage, parent, f"optimize(sort_by={keys})", [],
        {k: v for k, v in (res or {}).items() if isinstance(v, (int, float, str))},
    )


def optimize_incremental(
    table_dir: str, target_bytes: int = 64 << 20, opts: dict | None = None
) -> dict:
    """Incremental OPTIMIZE (small-file compaction): merge only the
    part files SMALLER than target_bytes into fresh right-sized files;
    every large file carries forward BY NAME — zero bytes moved for
    them. This is the routine maintenance op after many appends /
    upserts, where the full `optimize` (a global sort) would move the
    whole table just to fix a tail of small files; at 100 TB the
    difference is the op being runnable at all. Outstanding
    merge-on-read deletes fold first (the COW rule). Merging fewer
    than 2 small files is a no-op that returns the current manifest
    without committing a version."""
    from . import pipeline

    parent = _fold_outstanding(table_dir)
    sizes = {f: os.path.getsize(os.path.join(table_dir, f)) for f in parent["files"]}
    small = [f for f in parent["files"] if sizes[f] < target_bytes]
    if len(small) < 2:
        return parent
    carry = [f for f in parent["files"] if sizes[f] >= target_bytes]
    stage = os.path.join(table_dir, f"_staging_v{parent['version'] + 1}")
    import shutil

    shutil.rmtree(stage, ignore_errors=True)
    ds = pipeline.decode_files([os.path.join(table_dir, f) for f in small])
    pipeline.write_encoded(pipeline.encode_dataset(ds, opts), stage)
    return _commit_staged(
        table_dir,
        stage,
        parent,
        f"optimize_incremental(target={target_bytes})",
        carry,
        {"files_merged": len(small), "bytes_merged": int(sum(sizes[f] for f in small))},
    )


def with_column(table_dir: str, name: str, fn, input_columns: list[str],
                opts: dict | None = None) -> dict:
    """Versioned derived-column append: every current file re-writes
    (the new column's streams append after the existing blob — other
    streams stay byte-identical inside the new files), committed as a
    full-replacement version; prior versions keep the old schema."""
    from . import pipeline

    parent = _fold_outstanding(table_dir)
    stage = os.path.join(table_dir, f"_staging_v{parent['version'] + 1}")
    import shutil

    shutil.rmtree(stage, ignore_errors=True)
    res = pipeline.with_column(files(table_dir), stage, name, fn, input_columns, opts)
    return _commit_staged(
        table_dir, stage, parent, f"with_column({name})", [],
        {k: v for k, v in (res or {}).items() if isinstance(v, (int, float, str))},
    )


def clone_version(
    table_dir: str, out_dir: str, version: int | None = None
) -> dict:
    """ZERO-COPY CLONE of one snapshot into a standalone table: every
    referenced part file (and live delete file) HARD-LINKS into
    out_dir — no data bytes move, the filesystem shares the blocks —
    and the clone starts its own version log AT THE SOURCE'S VERSION
    NUMBER — not v0. That continuation is load-bearing: mutation file
    names embed the committing version (part-v{N}-*, *-dv-v{N},
    eqdel-v{N}), so a clone restarting at v0 would eventually reuse a
    carried name and silently replace the shared entry; starting past
    the source's counter keeps every name in the lineage unique.
    Writers on either side never interfere: part files are immutable
    by construction (every mutation writes NEW names), so a shared
    inode can never be rewritten, and vacuum() unlinks only its own
    directory's names. The Delta SHALLOW CLONE shape, with POSIX links
    instead of a catalog. Falls back to copy if out_dir is on another
    filesystem."""
    import shutil

    m = manifest(table_dir, version)
    os.makedirs(out_dir, exist_ok=False)

    def link(src: str, dst: str) -> None:
        try:
            os.link(src, dst)
        except OSError:
            shutil.copy2(src, dst)  # cross-device: degrade to copy

    for f in m["files"]:
        link(os.path.join(table_dir, f), os.path.join(out_dir, f))
    dv_names = list((m.get("deletes", {}) or {}).values()) + [
        e["file"] for e in m.get("eq_deletes", []) or []
    ]
    if dv_names:
        os.makedirs(os.path.join(out_dir, _DV_DIR), exist_ok=True)
        for f in dv_names:
            link(_dv_path(table_dir, f), _dv_path(out_dir, f))
    child = {
        "version": m["version"],
        "parent": None,
        "op": f"clone({table_dir}@v{m['version']})",
        "files": list(m["files"]),
        "deletes": dict(m.get("deletes", {}) or {}),
        "eq_deletes": list(m.get("eq_deletes", []) or []),
        "metrics": {"files": len(m["files"]), "source_version": m["version"]},
    }
    _write_manifest(out_dir, child)
    return child


def vacuum(table_dir: str, keep_versions: list[int] | None = None) -> dict:
    """Delete part files referenced by NO kept manifest (default: keep
    only the latest) and drop the pruned manifests. The irreversible
    step is explicit and separate from every logical operation."""
    last = latest_version(table_dir)
    if last is None:
        return {"removed_files": 0, "removed_versions": 0}
    keep = sorted(set(keep_versions if keep_versions is not None else [last]))
    referenced: set[str] = set()
    for v in keep:
        referenced.update(manifest(table_dir, v)["files"])
    removed_files = 0
    for f in sorted(os.listdir(table_dir)):
        if f.endswith(".parquet") and f not in referenced:
            os.remove(os.path.join(table_dir, f))
            removed_files += 1
    # deletion vectors referenced by no kept manifest go the same way
    ref_dvs: set[str] = set()
    for v in keep:
        mv = manifest(table_dir, v)
        ref_dvs.update(mv.get("deletes", {}).values())
        ref_dvs.update(e["file"] for e in mv.get("eq_deletes", []) or [])
    dv_dir = os.path.join(table_dir, _DV_DIR)
    if os.path.isdir(dv_dir):
        for f in sorted(os.listdir(dv_dir)):
            if f.endswith(".parquet") and f not in ref_dvs:
                os.remove(os.path.join(dv_dir, f))
                removed_files += 1
    removed_versions = 0
    for v in range(last + 1):
        if v not in keep and os.path.exists(_vpath(table_dir, v)):
            os.remove(_vpath(table_dir, v))
            removed_versions += 1
    return {"removed_files": removed_files, "removed_versions": removed_versions}


# ------------------------------------------------------- deletion vectors

_DV_DIR = "_deletes"


def _dv_path(table_dir: str, name: str) -> str:
    return os.path.join(table_dir, _DV_DIR, name)


def _load_dv_map(table_dir: str, m: dict) -> dict:
    """{file_name: {stripe_key: sorted int64 positions}} for a
    manifest's deletion vectors. Size is bounded by rows deleted since
    the last compaction (compact_deletes), not by the table."""
    import numpy as np
    import pyarrow.parquet as pq

    out: dict = {}
    for fname, dvname in m.get("deletes", {}).items():
        t = pq.read_table(_dv_path(table_dir, dvname))
        keys = t.column("stripe_key").to_pylist()
        idx = t.column("row_idx").to_numpy(zero_copy_only=False)
        per: dict = {}
        import collections

        buckets = collections.defaultdict(list)
        for k, i in zip(keys, idx):
            buckets[k].append(int(i))
        for k, v in buckets.items():
            per[k] = np.array(sorted(v), dtype=np.int64)
        out[fname] = per
    return out


def delete_vector_where(table_dir: str, column: str, min_value=None,
                        max_value=None) -> dict:
    """Merge-on-read DELETE: rows with `column` in [min_value,
    max_value] (SQL BETWEEN; nulls survive) are recorded as per-stripe
    POSITION lists under `_deletes/` — no data file is rewritten (the
    Delta/Iceberg deletion-vector fast path; the COW `delete_where` is
    the compaction path). Zone maps route the scan: files whose stats
    miss the range contribute nothing and their DVs carry forward by
    name. Reads through `decode_version` / `scan_version` apply the
    mask at decode; metadata-only fast paths (stats/agg/profile over
    stripe rows) see pre-delete counts until `compact_deletes` folds
    the vectors into a rewrite — the standard merge-on-read tradeoff,
    stated here so it is a contract, not a surprise."""
    import numpy as np
    import ray
    import ray.data
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from . import pipeline
    from . import stripe as stripe_mod

    parent = manifest(table_dir)
    new_v = parent["version"] + 1
    parent_dvs = parent.get("deletes", {})
    os.makedirs(os.path.join(table_dir, _DV_DIR), exist_ok=True)

    def process(batch: pa.Table) -> pa.Table:
        out = []
        for name in batch.column("name").to_pylist():
            path = os.path.join(table_dir, name)
            prior_name = parent_dvs.get(name, "")
            meta_tbl = pq.read_table(path, columns=["stripe_key", "stats"])
            overlaps = [
                pipeline._stripe_overlaps(sj, column, min_value, max_value)
                for sj in meta_tbl.column("stats").to_pylist()
            ]
            if not any(overlaps):
                out.append((name, prior_name, 0))
                continue
            prior: dict = {}
            if prior_name:
                t = pq.read_table(_dv_path(table_dir, prior_name))
                for k, i in zip(
                    t.column("stripe_key").to_pylist(),
                    t.column("row_idx").to_numpy(zero_copy_only=False),
                ):
                    prior.setdefault(k, []).append(int(i))
            full = pq.read_table(path)
            new_keys: list = []
            new_idx: list = []
            n_new = 0
            for i in range(full.num_rows):
                row = {c: full.column(c)[i].as_py() for c in full.column_names}
                key = row["stripe_key"]
                have = set(prior.get(key, ()))
                if overlaps[i]:
                    dec = stripe_mod.decode_stripe(row, [column])
                    col = dec.column(column)
                    hit = pa.array(np.ones(dec.num_rows, dtype=bool))
                    if min_value is not None:
                        hit = pc.and_(hit, pc.greater_equal(col, min_value))
                    if max_value is not None:
                        hit = pc.and_(hit, pc.less_equal(col, max_value))
                    hit = pc.fill_null(hit, False)  # nulls survive
                    pos = np.nonzero(
                        hit.to_numpy(zero_copy_only=False).astype(bool)
                    )[0]
                    fresh = [p for p in pos.tolist() if p not in have]
                    n_new += len(fresh)
                    have.update(fresh)
                if have:
                    ordered = sorted(have)
                    new_keys.extend([key] * len(ordered))
                    new_idx.extend(ordered)
            if n_new == 0:
                out.append((name, prior_name, 0))
                continue
            stem = name[: -len(".parquet")]
            dv_name = f"{stem}-dv-v{new_v}.parquet"
            tmp = _dv_path(table_dir, dv_name) + ".tmp"
            pq.write_table(
                pa.table(
                    {
                        "stripe_key": pa.array(new_keys, pa.string()),
                        "row_idx": pa.array(new_idx, pa.int64()),
                    }
                ),
                tmp,
            )
            os.rename(tmp, _dv_path(table_dir, dv_name))
            out.append((name, dv_name, n_new))
        return pa.table(
            {
                "name": pa.array([n for n, _, _ in out]),
                "dv": pa.array([d for _, d, _ in out]),
                "rows_deleted": pa.array([r for _, _, r in out], pa.int64()),
            }
        )

    items = [{"name": n} for n in parent["files"]]
    if not items:
        m = {"version": new_v, "parent": parent["version"],
             "op": f"delete_vector({column} in [{min_value}, {max_value}])",
             "files": [], "deletes": {},
             "eq_deletes": parent.get("eq_deletes", []) or [],
             "metrics": {"files": 0, "rows_deleted": 0, "dv_files": 0}}
        _write_manifest(table_dir, m)
        return m
    units = ray.data.from_items(items, override_num_blocks=len(items))
    res = units.map_batches(process, batch_format="pyarrow").to_pandas()
    deletes = {
        n: d for n, d in zip(res["name"], res["dv"]) if d
    }
    m = {
        "version": new_v,
        "parent": parent["version"],
        "op": f"delete_vector({column} in [{min_value}, {max_value}])",
        "files": parent["files"],
        "deletes": deletes,
        "eq_deletes": parent.get("eq_deletes", []) or [],
        "metrics": {
            "files": len(parent["files"]),
            "rows_deleted": int(res["rows_deleted"].sum()),
            "dv_files": int((res["dv"] != "").sum()),
        },
    }
    _write_manifest(table_dir, m)
    return m


def _load_eq_deletes(table_dir: str, m: dict) -> list[tuple]:
    """[(column, key Array)] for a manifest's equality-delete files.
    Size is bounded by keys deleted since the last compaction."""
    import pyarrow.parquet as pq

    out = []
    for e in m.get("eq_deletes", []) or []:
        t = pq.read_table(_dv_path(table_dir, e["file"]))
        col = t.column(e["column"])
        out.append((e["column"], col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col))
    return out


def _apply_eq_deletes(ds, eqs: list[tuple], columns: list[str] | None):
    """Anti-filter a decoded Dataset against equality-delete key lists
    (SQL '=' semantics: NULL keys never match, so they survive). Key
    arrays broadcast ONCE via ray.put; the filter is one is_in kernel
    per delete file per batch, shuffle-free. When `columns` excludes a
    key column the caller decoded the union — drop the extras here."""
    import ray

    if not eqs:
        return ds
    ref = ray.put(eqs)
    drop = (
        [c for c, _ in eqs if columns is not None and c not in columns] if columns else []
    )

    def flt(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        for c, vals in ray.get(ref):
            hit = pc.fill_null(pc.is_in(batch.column(c), value_set=vals), False)
            batch = batch.filter(pc.invert(hit))
        if drop:
            batch = batch.drop_columns([c for c in drop if c in batch.column_names])
        return batch

    return ds.map_batches(flt, batch_format="pyarrow", zero_copy_batch=True)


def _decode_columns_for(m: dict, columns: list[str] | None) -> list[str] | None:
    """Projection to DECODE when equality deletes must evaluate: the
    requested columns plus every eq-delete key column (dropped again
    after the filter)."""
    if columns is None or not m.get("eq_deletes"):
        return columns
    need = {e["column"] for e in m["eq_deletes"]}
    return list(dict.fromkeys(list(columns) + sorted(need - set(columns))))


def equality_delete(table_dir: str, column: str, values) -> dict:
    """Iceberg-v2-style EQUALITY DELETE: drop every row whose `column`
    equals any of `values` by committing a tiny KEY FILE — no data
    file is opened, let alone rewritten (a positional deletion vector
    must first FIND the rows; an equality delete defers that lookup to
    read time). Reads through scan_version / scan_changes anti-filter
    against the broadcast key list; compact_deletes folds the keys
    into a copy-on-write rewrite and clears them. NULL keys never
    match (SQL '=' semantics). Commit cost is O(keys) regardless of
    table size — the delete-by-id primitive a 100 TB GDPR request
    needs."""
    import pyarrow.parquet as pq

    parent = manifest(table_dir)
    new_v = parent["version"] + 1
    os.makedirs(os.path.join(table_dir, _DV_DIR), exist_ok=True)
    arr = pa.array(values) if not isinstance(values, (pa.Array, pa.ChunkedArray)) else values
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # SQL '=' semantics: a NULL literal matches nothing — and pyarrow's
    # is_in treats a null IN the value set as matching null inputs, so
    # a null left in the key file would DELETE null-keyed rows
    arr = arr.drop_null()
    name = f"eqdel-v{new_v}.parquet"
    tmp = _dv_path(table_dir, f"{name}.{os.getpid()}.tmp")
    pq.write_table(pa.table({column: arr}), tmp)
    try:
        # exclusive, like the manifest commit: two writers racing the
        # same parent must not interleave on the version-named key file
        os.link(tmp, _dv_path(table_dir, name))
    except FileExistsError:
        raise VersionConflict(
            f"equality-delete key file for version {new_v} at {table_dir}"
            " was committed by another writer; re-read the head and retry"
        ) from None
    finally:
        os.unlink(tmp)
    m = {
        **parent,
        "version": new_v,
        "parent": parent["version"],
        "op": "equality_delete",
        "eq_deletes": list(parent.get("eq_deletes", []) or []) + [
            {"column": column, "file": name}
        ],
        "metrics": {"n_keys": len(arr), "column": column},
    }
    _write_manifest(table_dir, m)
    return m


def scan_version(table_dir: str, version: int | None = None,
                 columns: list[str] | None = None):
    """decode_version with deletion vectors applied (and the path every
    DV-aware read funnels through). Versions without DVs take the
    fused read->decode path unchanged."""
    import ray
    import ray.data

    from . import pipeline

    m = manifest(table_dir, version)
    eqs = _load_eq_deletes(table_dir, m)
    dec_cols = _decode_columns_for(m, columns)
    if not m.get("deletes"):
        return _apply_eq_deletes(
            decode_version(table_dir, version, dec_cols), eqs, columns
        )
    fs = files(table_dir, version)
    if not fs:
        return ray.data.from_items([])
    dv_map = _load_dv_map(table_dir, m)
    ref = ray.put(dv_map)

    def attach(batch: pa.Table) -> pa.Table:
        dvm = ray.get(ref)
        vals = []
        for p, k in zip(
            batch.column("path").to_pylist(),
            batch.column("stripe_key").to_pylist(),
        ):
            per = dvm.get(os.path.basename(p))
            pos = per.get(k) if per else None
            vals.append(pos.tolist() if pos is not None else None)
        return batch.append_column(
            "dv", pa.array(vals, pa.list_(pa.int64()))
        ).drop_columns(["path"])

    enc = pipeline.read_encoded(fs, include_paths=True).map_batches(
        attach, batch_format="pyarrow", zero_copy_batch=True
    )
    return _apply_eq_deletes(
        pipeline.decode_dataset(enc, columns=dec_cols), eqs, columns
    )


def _decode_files_with_dvs(table_dir: str, fs: list[str], m: dict, columns):
    """Fused decode of `fs` with manifest `m`'s deletion vectors
    applied — the scan_version kernel over an arbitrary file subset."""
    import ray
    import ray.data

    from . import pipeline

    if not fs:
        return ray.data.from_items([])
    eqs = _load_eq_deletes(table_dir, m)
    dec_cols = _decode_columns_for(m, columns)
    dv_map = {
        k: v
        for k, v in _load_dv_map(table_dir, m).items()
        if k in {os.path.basename(f) for f in fs}
    }
    if not dv_map:
        return _apply_eq_deletes(
            pipeline.decode_files(fs, columns=dec_cols), eqs, columns
        )
    ref = ray.put(dv_map)

    def attach(batch: pa.Table) -> pa.Table:
        dvm = ray.get(ref)
        vals = []
        for p, k in zip(
            batch.column("path").to_pylist(),
            batch.column("stripe_key").to_pylist(),
        ):
            per = dvm.get(os.path.basename(p))
            pos = per.get(k) if per else None
            vals.append(pos.tolist() if pos is not None else None)
        return batch.append_column(
            "dv", pa.array(vals, pa.list_(pa.int64()))
        ).drop_columns(["path"])

    from . import pipeline as pipeline_mod

    enc = pipeline_mod.read_encoded(fs, include_paths=True).map_batches(
        attach, batch_format="pyarrow", zero_copy_batch=True
    )
    return _apply_eq_deletes(
        pipeline_mod.decode_dataset(enc, columns=dec_cols), eqs, columns
    )


def scan_changes(table_dir: str, from_version: int, to_version: int | None = None,
                 columns: list[str] | None = None):
    """Row-level CHANGE FEED between two snapshots, planned from the
    manifests alone (the Iceberg/Delta changelog scan re-expressed over
    the COW manifest log): only part files that DIFFER between the
    versions — by name, or by deletion-vector — are ever decoded;
    carried-forward files cost zero bytes regardless of table size.

    Returns a Dataset of the table's columns plus `_change`
    ('insert' | 'delete'). Row-identical content on both sides cancels
    MULTISET-exactly via setops.except_all, so a pure-layout commit
    (OPTIMIZE / Z-ORDER / compact_deletes) or the untouched rows of a
    COW rewrite report zero changes; an upsert that replaced a row
    yields its preimage as 'delete' and postimage as 'insert'."""
    import pyarrow.compute as pc

    from .ops import setops

    ma = manifest(table_dir, from_version)
    mb = manifest(table_dir, to_version)
    A, B = set(ma["files"]), set(mb["files"])
    dva, dvb = ma.get("deletes", {}), mb.get("deletes", {})
    dv_changed = {f for f in A & B if dva.get(f) != dvb.get(f)}
    if (ma.get("eq_deletes") or []) != (mb.get("eq_deletes") or []):
        # an equality delete is a table-wide read-time filter: every
        # carried file can lose rows, so all common files must compare
        dv_changed = set(A & B)
    from_files = sorted((A - B) | dv_changed)
    to_files = sorted((B - A) | dv_changed)

    old = _decode_files_with_dvs(
        table_dir, [os.path.join(table_dir, f) for f in from_files], ma, columns
    )
    new = _decode_files_with_dvs(
        table_dir, [os.path.join(table_dir, f) for f in to_files], mb, columns
    )

    def tag(label: str):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "_change", pa.array([label] * batch.num_rows, pa.string())
            )

        return fn

    # pure appends / pure deletes skip the multiset-cancel shuffle
    # entirely (and an empty side would crash Ray's hash exchange)
    if not from_files and not to_files:
        import ray.data

        return ray.data.from_items([])
    if not from_files:
        return new.map_batches(tag("insert"), batch_format="pyarrow",
                               zero_copy_batch=True)
    if not to_files:
        return old.map_batches(tag("delete"), batch_format="pyarrow",
                               zero_copy_batch=True)
    ins = setops.except_all(new, old).map_batches(
        tag("insert"), batch_format="pyarrow", zero_copy_batch=True
    )
    dels = setops.except_all(old, new).map_batches(
        tag("delete"), batch_format="pyarrow", zero_copy_batch=True
    )
    return ins.union(dels)


def compact_deletes(table_dir: str, opts: dict | None = None) -> dict:
    """Fold deletion vectors into a copy-on-write rewrite: every file
    with a DV re-encodes its surviving rows under a `-v{N}` name; files
    without DVs carry forward by name. The child manifest has no
    `deletes` key, so metadata-only fast paths are exact again."""
    import numpy as np
    import ray
    import ray.data
    import pyarrow.parquet as pq

    from . import pipeline
    from . import stripe as stripe_mod

    parent = manifest(table_dir)
    dvs = parent.get("deletes", {})
    eqs = _load_eq_deletes(table_dir, parent)
    new_v = parent["version"] + 1
    if not dvs and not eqs:
        m = {**parent, "version": new_v, "parent": parent["version"],
             "op": "compact_deletes", "deletes": {}, "eq_deletes": [],
             "metrics": {"files_rewritten": 0, "rows_removed": 0}}
        _write_manifest(table_dir, m)
        return m
    dv_map = _load_dv_map(table_dir, parent)
    ref = ray.put(dv_map)
    # eq keys broadcast with driver-computed zone-map ranges so clean
    # stripes prove themselves from stats without decoding
    import pyarrow.compute as pc_

    eq_plans = []
    for col, vals in eqs:
        nn = vals.drop_null()
        if len(nn):
            mm = pc_.min_max(nn)
            eq_plans.append((col, vals, mm["min"].as_py(), mm["max"].as_py()))
    eq_ref = ray.put(eq_plans)

    def process(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        dvm = ray.get(ref)
        eqp = ray.get(eq_ref)
        out = []
        for name in batch.column("name").to_pylist():
            per = dvm.get(name)
            path = os.path.join(table_dir, name)
            if not per:
                # stats-only probe: a file no eq key range touches
                # carries forward without its blobs ever being read
                stats_tbl = pq.read_table(path, columns=["stats"])
                if not any(
                    pipeline._stripe_overlaps(sj, col, lo, hi)
                    for sj in stats_tbl.column("stats").to_pylist()
                    for col, _, lo, hi in eqp
                ):
                    out.append((name, name, 0))
                    continue
            full = pq.read_table(path)
            keep_rows = []
            removed = 0
            for i in range(full.num_rows):
                row = {c: full.column(c)[i].as_py() for c in full.column_names}
                pos = per.get(row["stripe_key"]) if per else None
                eq_hit = any(
                    pipeline._stripe_overlaps(row["stats"], col, lo, hi)
                    for col, _, lo, hi in eqp
                )
                if (pos is None or not len(pos)) and not eq_hit:
                    keep_rows.append(
                        pa.Table.from_pylist([row], schema=stripe_mod.STRIPE_SCHEMA)
                    )
                    continue
                dec = stripe_mod.decode_stripe(row)
                keep = np.ones(dec.num_rows, dtype=bool)
                if pos is not None and len(pos):
                    keep[pos] = False
                for col, vals, _, _ in eqp:
                    hit = pc.fill_null(pc.is_in(dec.column(col), value_set=vals), False)
                    keep &= ~np.asarray(hit.to_numpy(zero_copy_only=False), dtype=bool)
                removed += int((~keep).sum())
                if keep.all():
                    keep_rows.append(
                        pa.Table.from_pylist([row], schema=stripe_mod.STRIPE_SCHEMA)
                    )
                    continue
                kept = dec.filter(pa.array(keep))
                if kept.num_rows:
                    keep_rows.append(
                        stripe_mod.encode_batch(kept, key_prefix=f"{row['stripe_key']}c")
                    )
            if not keep_rows:
                out.append((name, "", removed))
                continue
            if removed == 0:
                # eq-range probe was a zone-map false positive: the
                # keys fell in range but none were present — carry the
                # file BY NAME, no rewrite
                out.append((name, name, 0))
                continue
            new_tbl = pa.concat_tables(keep_rows)
            stem = name[: -len(".parquet")]
            new_name = f"{stem}-v{new_v}.parquet"
            tmp = os.path.join(table_dir, new_name + ".tmp")
            pq.write_table(new_tbl, tmp, row_group_size=8,
                           **pipeline.ENCODED_PARQUET_ARGS)
            os.rename(tmp, os.path.join(table_dir, new_name))
            out.append((name, new_name, removed))
        return pa.table(
            {
                "old": pa.array([o for o, _, _ in out]),
                "new": pa.array([n for _, n, _ in out]),
                "rows_removed": pa.array([r for _, _, r in out], pa.int64()),
            }
        )

    items = [{"name": n} for n in parent["files"]]
    units = ray.data.from_items(items, override_num_blocks=max(len(items), 1))
    res = units.map_batches(process, batch_format="pyarrow").to_pandas()
    by_old = dict(zip(res["old"], res["new"]))
    new_files = [by_old.get(n, n) for n in parent["files"] if by_old.get(n, n)]
    m = {
        "version": new_v,
        "parent": parent["version"],
        "op": "compact_deletes",
        "files": new_files,
        "deletes": {},
        "eq_deletes": [],
        "metrics": {
            "files": len(new_files),
            "files_rewritten": int((res["old"] != res["new"]).sum()),
            "rows_removed": int(res["rows_removed"].sum()),
        },
    }
    _write_manifest(table_dir, m)
    return m
