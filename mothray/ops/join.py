"""Joins for training-data pipelines (metadata enrichment).

The reference has no joins (SURVEY.md §2.9); these follow the ray
guide's two patterns:

* broadcast_join — small side is `ray.put` ONCE as an Arrow table,
  gathered per task (zero-copy from the object store), joined per
  batch with Arrow's native hash join (Acero). No shuffle; the
  default for dimension tables / vocab / blocklists.
* partitioned_join — both sides large: Ray Data's hash-shuffle join
  (Dataset.join). Partition count is derived from the input size
  (target ~256 MB per partition) so per-task memory stays bounded at
  any corpus scale instead of a fixed bucket count; skewed keys can
  be salted upstream with add_host_bucket-style fanout.
"""

from __future__ import annotations

import pyarrow as pa

_JOIN_TYPES = {
    "inner": "inner",
    "left": "left_outer",
    "right": "right_outer",
    "outer": "full_outer",
    "left_outer": "left_outer",
    "right_outer": "right_outer",
    "full_outer": "full_outer",
    "left_semi": "left_semi",
    "left_anti": "left_anti",
    "right_semi": "right_semi",
    "right_anti": "right_anti",
}

_TARGET_PARTITION_BYTES = 256 << 20


def _auto_partitions(*datasets, target_bytes: int = _TARGET_PARTITION_BYTES) -> int:
    """Partition count from (metadata) sizes of both sides so one join
    partition holds ~target_bytes — scales with the data instead of a
    fixed constant that would put ~N/32 bytes in one task at corpus
    scale."""
    total = 0
    for ds in datasets:
        try:
            total += ds.size_bytes() or 0
        except Exception:
            pass
    if not total:
        return 32
    return int(min(max(total // target_bytes + 1, 2), 4096))


# Join types that are sound when evaluated independently per batch
# against the full broadcast side: each LEFT row is seen exactly once,
# so inner/left/left_semi/left_anti compose across batches. Right/full
# variants would emit unmatched SMALL-side rows once per batch
# (duplicates) — those must go through partitioned_join.
_BROADCAST_SOUND = {"inner", "left_outer", "left_semi", "left_anti"}


def broadcast_join(ds, small: pa.Table, on: str, how: str = "inner"):
    """Join a Dataset against a small in-memory table (broadcast once
    via ray.put; per-batch Arrow-native hash join, no pandas hop).

    Only per-batch-sound join types are accepted (inner/left/
    left_semi/left_anti); right/full-outer would duplicate unmatched
    small-side rows per batch — use partitioned_join for those."""
    import ray

    join_type = _JOIN_TYPES.get(how, how)
    if join_type not in _BROADCAST_SOUND:
        raise ValueError(
            f"broadcast_join cannot evaluate {how!r} per batch (unmatched "
            "small-side rows would be emitted once per batch); use "
            "partitioned_join for right/full outer/semi/anti variants"
        )
    small_ref = ray.put(small)
    # pyarrow.Table.join spells types with spaces ("left outer"),
    # Ray's Dataset.join with underscores ("left_outer")
    pa_join_type = join_type.replace("_", " ")

    def merge(batch: pa.Table) -> pa.Table:
        right = ray.get(small_ref)
        return batch.join(right, keys=on, join_type=pa_join_type)

    return ds.map_batches(merge, batch_format="pyarrow", zero_copy_batch=True)


def partitioned_join(left, right, on: str, num_buckets: int | None = None, how: str = "inner"):
    """Large x large: Ray Data hash-shuffle join. `num_buckets` (kept
    for API compatibility; now = join partitions) defaults to a
    size-derived count targeting ~256 MB per partition."""
    n = num_buckets or _auto_partitions(left, right)
    return left.join(
        right,
        join_type=_JOIN_TYPES.get(how, how),
        num_partitions=n,
        on=(on,),
    )
