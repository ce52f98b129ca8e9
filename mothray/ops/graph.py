"""Graph operators over edge-list Datasets.

connected_components: undirected connected components by distributed
min-label propagation with pointer-doubling path compression (the
MapReduce-CC family — Kiveris et al. 2014 "Connected Components in
MapReduce and Beyond" is the public reference for the round-complexity
argument; the reference engine has no graph operators, this extends the
engine the way the join family does).

Scale shape: state is one (node, label) Dataset, edges stream through
hash joins — nothing materializes on the driver. Each round costs two
distributed hash joins + two groupby-mins over rows of TWO int64s;
pointer doubling (lbl <- lbl[lbl]) shortcuts chains so convergence is
O(log diameter) rounds rather than O(diameter). Labels are monotone
non-increasing, so an unchanged label sum is a fixpoint certificate —
the loop stops there (cap `max_rounds` guards adversarial graphs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _auto_partitions(ds) -> int:
    import ray

    try:
        return max(int(ray.cluster_resources().get("CPU", 8)) // 2, 2)
    except Exception:
        return 8


def connected_components(
    edges,
    src: str,
    dst: str,
    num_partitions: int | None = None,
    max_rounds: int = 50,
):
    """Connected components of the undirected graph given as an edge
    list: returns a Dataset of (node, component) where `component` is
    the MINIMUM node id in the node's component (deterministic,
    partition-count independent). Node ids are int64 (other integer
    widths cast); edges with a null endpoint are ignored (SQL
    semantics), self-loops and duplicate edges are harmless. Isolated
    nodes never appear in an edge list, so they are not emitted."""
    import pyarrow.compute as pc

    n_parts = num_partitions or _auto_partitions(edges)

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column(src).cast(pa.int64())
        b = batch.column(dst).cast(pa.int64())
        ok = pc.and_(pc.is_valid(a), pc.is_valid(b))
        a, b = a.filter(ok), b.filter(ok)
        if isinstance(a, pa.ChunkedArray):
            a, b = a.combine_chunks(), b.combine_chunks()
        return pa.table(
            {
                "node": pa.concat_arrays([a, b]),
                "nbr": pa.concat_arrays([b, a]),
            }
        )

    sym_edges = edges.map_batches(sym, batch_format="pyarrow", zero_copy_batch=True).materialize()

    def _rename(cols: dict):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.select(list(cols)).rename_columns(list(cols.values()))

        return fn

    # initial labels: each node labels itself (distinct via groupby-min)
    labels = (
        sym_edges.groupby("node")
        .min("node")
        .map_batches(_rename({"node": "node", "min(node)": "lbl"}), batch_format="pyarrow")
        .materialize()
    )
    prev_sum = None
    for _ in range(max_rounds):
        # neighbor-min: every node offers its label to its neighbors
        offered = sym_edges.join(
            labels.map_batches(_rename({"node": "l_node", "lbl": "lbl"}), batch_format="pyarrow"),
            join_type="inner",
            num_partitions=n_parts,
            on=("node",),
            right_on=("l_node",),
        ).map_batches(_rename({"nbr": "node", "lbl": "lbl"}), batch_format="pyarrow")
        merged = (
            offered.union(labels)
            .groupby("node")
            .min("lbl")
            .map_batches(_rename({"node": "node", "min(lbl)": "lbl"}), batch_format="pyarrow")
        )
        # pointer doubling: lbl <- lbl[lbl] (labels always form a
        # forest rooted at component minima; the root's own label is
        # itself, so the left join below always matches)
        compressed = merged.join(
            merged.map_batches(_rename({"node": "p_node", "lbl": "p_lbl"}), batch_format="pyarrow"),
            join_type="inner",
            num_partitions=n_parts,
            on=("lbl",),
            right_on=("p_node",),
        ).map_batches(_rename({"node": "node", "p_lbl": "lbl"}), batch_format="pyarrow")
        labels = compressed.materialize()
        cur_sum = labels.sum("lbl")
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum

    return labels.map_batches(
        _rename({"node": "node", "lbl": "component"}), batch_format="pyarrow"
    )


def pagerank(
    edges,
    src: str,
    dst: str,
    damping: float = 0.85,
    iterations: int = 10,
    num_partitions: int | None = None,
):
    """PageRank over a DIRECTED edge list, fixed iteration count
    (deterministic — an unrolled SQL oracle can replay it). Returns a
    Dataset of (node, rank); ranks sum to 1. Parallel edges count like
    a multigraph, edges with a null endpoint are ignored, dangling
    nodes (no out-edges) redistribute their mass uniformly — the
    standard formulation, chosen so the rank vector stays a
    probability distribution.

    Scale shape: state is one (node, rank) Dataset; each iteration is
    ONE hash join (edge contributions) + one groupby-sum + a scalar
    reduce. The dangling mass needs no dangling-node join: every
    non-dangling node's rank arrives intact in the contribution sum,
    so dangling mass = 1 - sum(aggregated in-mass). Out-degrees join
    into the edge list ONCE before the loop."""
    import pyarrow.compute as pc

    n_parts = num_partitions or _auto_partitions(edges)

    def clean(batch: pa.Table) -> pa.Table:
        a = batch.column(src).cast(pa.int64())
        b = batch.column(dst).cast(pa.int64())
        ok = pc.and_(pc.is_valid(a), pc.is_valid(b))
        return pa.table({"s": a.filter(ok), "d": b.filter(ok)})

    e = edges.map_batches(clean, batch_format="pyarrow", zero_copy_batch=True).materialize()

    def _rename(cols: dict):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.select(list(cols)).rename_columns(list(cols.values()))

        return fn

    nodes = (
        e.map_batches(
            lambda t: pa.table(
                {"node": pa.concat_arrays([t.column("s").combine_chunks(), t.column("d").combine_chunks()])}
            ),
            batch_format="pyarrow",
        )
        .groupby("node")
        .min("node")
        .map_batches(_rename({"node": "node"}), batch_format="pyarrow")
        .materialize()
    )
    n = nodes.count()
    if n == 0:
        return nodes.map_batches(
            lambda t: t.append_column("rank", pa.array([], pa.float64())),
            batch_format="pyarrow",
        )
    deg = (
        e.groupby("s")
        .count()
        .map_batches(_rename({"s": "deg_s", "count()": "outdeg"}), batch_format="pyarrow")
    )
    # out-degree rides on each edge; computed once, reused every round
    e_deg = e.join(
        deg, join_type="inner", num_partitions=n_parts, on=("s",), right_on=("deg_s",)
    ).materialize()

    def init_rank(t: pa.Table) -> pa.Table:
        return t.append_column(
            "rank", pa.array(np.full(t.num_rows, 1.0 / n), pa.float64())
        )

    ranks = nodes.map_batches(init_rank, batch_format="pyarrow").materialize()
    zero = nodes.map_batches(
        lambda t: t.append_column("mass", pa.array(np.zeros(t.num_rows), pa.float64())),
        batch_format="pyarrow",
    ).materialize()
    d = float(damping)
    for _ in range(int(iterations)):
        contrib = e_deg.join(
            ranks.map_batches(_rename({"node": "r_node", "rank": "rank"}), batch_format="pyarrow"),
            join_type="inner",
            num_partitions=n_parts,
            on=("s",),
            right_on=("r_node",),
        ).map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("d"),
                    "mass": pc.divide(
                        t.column("rank"), pc.cast(t.column("outdeg"), pa.float64())
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        in_mass = (
            contrib.union(zero)
            .groupby("node")
            .sum("mass")
            .map_batches(_rename({"node": "node", "sum(mass)": "mass"}), batch_format="pyarrow")
            .materialize()
        )
        dangling = 1.0 - (in_mass.sum("mass") or 0.0)

        def step(t: pa.Table, _dm=dangling) -> pa.Table:
            m = t.column("mass").to_numpy(zero_copy_only=False)
            r = (1.0 - d) / n + d * (m + _dm / n)
            return pa.table({"node": t.column("node"), "rank": pa.array(r, pa.float64())})

        ranks = in_mass.map_batches(step, batch_format="pyarrow").materialize()
    return ranks
