"""Joins for training-data pipelines (metadata enrichment).

The reference has no joins (SURVEY.md §2.9); these follow the ray
guide's two patterns:

* broadcast_join — small side is `ray.put` ONCE, gathered per task,
  joined per batch with a vectorized pandas merge. No shuffle; the
  default for dimension tables / vocab / blocklists.
* partitioned_join — both sides large: add `bucket = hash(key) % B`
  to both, union with a side tag, one groupby(bucket) shuffle, merge
  inside each bucket group. B bounds per-task memory; skewed keys can
  be salted upstream with add_host_bucket-style fanout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def broadcast_join(ds, small: pa.Table, on: str, how: str = "inner"):
    """Join a Dataset against a small in-memory table (broadcast)."""
    import ray

    small_ref = ray.put(small.to_pandas())

    def merge(batch: pa.Table) -> pa.Table:
        right = ray.get(small_ref)
        out = batch.to_pandas().merge(right, on=on, how=how)
        return pa.Table.from_pandas(out, preserve_index=False)

    return ds.map_batches(merge, batch_format="pyarrow")


def partitioned_join(left, right, on: str, num_buckets: int = 32, how: str = "inner"):
    """Large x large: explicit bucketed hash join (one shuffle)."""

    lschema = left.schema()
    rschema = right.schema()
    left_cols = list(lschema.names)
    right_cols = list(rschema.names)
    # unified schema so the two sides can union (missing columns ride
    # as typed nulls; staying in Arrow keeps int columns int)
    unified = [(n, t) for n, t in zip(lschema.names, lschema.types)]
    unified += [
        (n, t) for n, t in zip(rschema.names, rschema.types) if n not in left_cols
    ]

    def tag_and_bucket(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            keys = batch.column(on).to_numpy(zero_copy_only=False)
            bucket = (
                keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) >> np.uint64(32)
            ) % np.uint64(num_buckets)
            arrays = [
                batch.column(name) if name in batch.column_names else pa.nulls(n, type=t)
                for name, t in unified
            ]
            arrays += [
                pa.array(bucket.astype(np.int32)),
                pa.array(np.full(n, side, dtype=np.int8)),
            ]
            return pa.table(arrays, names=[n_ for n_, _ in unified] + ["__bucket", "__side"])

        return fn

    l = left.map_batches(tag_and_bucket(0), batch_format="pyarrow")
    r = right.map_batches(tag_and_bucket(1), batch_format="pyarrow")
    both = l.union(r)

    def merge_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lg = group.filter(pc.equal(group["__side"], 0)).select(left_cols)
        rg = group.filter(pc.equal(group["__side"], 1)).select(right_cols)
        out = lg.to_pandas().merge(rg.to_pandas(), on=on, how=how)
        return pa.Table.from_pandas(out, preserve_index=False)

    return both.groupby("__bucket").map_groups(merge_bucket, batch_format="pyarrow")
