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


def broadcast_join(ds, small: pa.Table, on: str, how: str = "inner"):
    """Join a Dataset against a small in-memory table (broadcast once
    via ray.put; per-batch Arrow-native hash join, no pandas hop)."""
    import ray

    small_ref = ray.put(small)
    join_type = _JOIN_TYPES.get(how, how)

    def merge(batch: pa.Table) -> pa.Table:
        right = ray.get(small_ref)
        return batch.join(right, keys=on, join_type=join_type)

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
