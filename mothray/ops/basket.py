"""Market-basket co-occurrence mining: top-k item pairs that appear
together in the same basket (order), by basket count.

Classic frequent-itemset pair counting (the support-counting core of
Apriori) expressed Ray-Data-first: one null-safe groupby(basket)
exchange brings each basket's rows together; inside the group the
DISTINCT item set is a numpy unique and the C(m,2) ordered pairs
(a < b) are emitted via repeat/concatenate index math — no Python
loop over pairs; a per-batch pyarrow group_by combiner pre-counts
pairs before the final (item_a, item_b) groupby, so the second
exchange carries counted pairs, not raw occurrences. Deterministic
top-k via sort on (cnt DESC, item_a, item_b).

Scale note: pair fan-out is quadratic in basket SIZE (not corpus
size); baskets are small in practice (TPC-H <= 7 lines). `max_basket`
guards pathological baskets — larger ones are dropped, as Apriori
implementations cap transaction width.

No reference analog (orc-go has no analytics operators) — engine
extension alongside the funnel / cohort / markov family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def copurchase_pairs(
    ds,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    k: int = 50,
    max_basket: int = 1000,
):
    """(item_a, item_b, cnt BIGINT) for the k most frequent unordered
    distinct-item pairs per basket; item_a < item_b. Equivalent SQL:
    self-join of SELECT DISTINCT (basket, item) on basket with
    item_a < item_b, GROUP BY pair, ORDER BY cnt DESC LIMIT k."""

    def pairs(group: pa.Table) -> pa.Table:
        col = group.column(item_col)
        items = col.drop_null().to_numpy(zero_copy_only=False)
        items = np.unique(items)
        m = len(items)
        empty = pa.table(
            {
                "item_a": pa.array([], pa.int64()),
                "item_b": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if m < 2 or m > max_basket:
            return empty
        i, j = np.triu_indices(m, k=1)  # ordered pair indices (i < j)
        n = len(i)
        return pa.table(
            {
                "item_a": pa.array(items[i].astype(np.int64)),
                "item_b": pa.array(items[j].astype(np.int64)),
                "cnt": pa.array(np.ones(n, dtype=np.int64)),
            }
        )

    def combine(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["item_a", "item_b"]).aggregate([("cnt", "sum")])
        return g.rename_columns(["item_a", "item_b", "cnt"])

    from .nullkeys import null_safe_group_map

    proj = ds.select_columns(sorted({basket_col, item_col}))
    counted = (
        null_safe_group_map(proj, [basket_col], pairs)
        .map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["item_a", "item_b"])
        .sum("cnt")
        .map_batches(
            lambda t: t.rename_columns(["item_a", "item_b", "cnt"]),
            batch_format="pyarrow",
        )
    )
    return counted.sort(
        ["cnt", "item_a", "item_b"], descending=[True, False, False]
    ).limit(k)


def frequent_triples(
    ds,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    k: int = 50,
    max_basket: int = 200,
):
    """(item_a, item_b, item_c, cnt BIGINT) for the k most frequent
    unordered distinct-item TRIPLES per basket, item_a < item_b <
    item_c — the 3-itemset half of market-basket mining (copurchase_
    pairs is the 2-itemset half). Combination blow-up is C(m,3), so
    max_basket is tighter than the pair op; baskets above it drop
    (and at web scale you would pre-filter items below min-support
    first, apriori-style). Ties at the k boundary break on the item
    ids, matching the oracle's ORDER BY cnt DESC, a, b, c."""
    def bucket(batch: pa.Table) -> pa.Table:
        # shuffle on hash buckets, NOT raw baskets: one map_groups call
        # then handles ~|baskets|/4096 baskets, so the per-group UDF
        # dispatch cost (the 150k-call trap) amortizes 40x
        b = batch.column(basket_col)
        ok = pc.and_(pc.is_valid(b), pc.is_valid(batch.column(item_col)))
        t = batch.filter(ok)
        bk = t.column(basket_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bkt": pa.array((bk % 4096).astype(np.int64)),
                "b": pa.array(bk),
                "i": t.column(item_col).cast(pa.int64()),
            }
        )

    def triples(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("b", "ascending"), ("i", "ascending")])
        g = group.take(idx)
        b = g.column("b").to_numpy(zero_copy_only=False)
        it = g.column("i").to_numpy(zero_copy_only=False)
        # drop duplicate (basket, item) rows, then segment by basket
        keep = np.r_[True, (b[1:] != b[:-1]) | (it[1:] != it[:-1])]
        b, it = b[keep], it[keep]
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        ends = np.r_[starts[1:], len(b)]
        out_a, out_b, out_c = [], [], []
        for s, e in zip(starts, ends):
            m = e - s
            if m < 3 or m > max_basket:
                continue
            items = it[s:e]
            i, j = np.triu_indices(m, k=1)
            reps = m - 1 - j
            ok2 = reps > 0
            i, j, reps = i[ok2], j[ok2], reps[ok2]
            ii = np.repeat(i, reps)
            jj = np.repeat(j, reps)
            ll = (
                np.concatenate([np.arange(x + 1, m) for x in j])
                if len(j)
                else np.array([], np.int64)
            )
            out_a.append(items[ii])
            out_b.append(items[jj])
            out_c.append(items[ll])
        if not out_a:
            return pa.table(
                {
                    "item_a": pa.array([], pa.int64()),
                    "item_b": pa.array([], pa.int64()),
                    "item_c": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        a = np.concatenate(out_a)
        t = pa.table(
            {
                "item_a": pa.array(a.astype(np.int64)),
                "item_b": pa.array(np.concatenate(out_b).astype(np.int64)),
                "item_c": pa.array(np.concatenate(out_c).astype(np.int64)),
                "cnt": pa.array(np.ones(len(a), dtype=np.int64)),
            }
        )
        # combine inside the group before the exchange
        g2 = t.group_by(["item_a", "item_b", "item_c"]).aggregate([("cnt", "sum")])
        return g2.rename_columns(["item_a", "item_b", "item_c", "cnt"])

    def combine(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["item_a", "item_b", "item_c"]).aggregate([("cnt", "sum")])
        return g.rename_columns(["item_a", "item_b", "item_c", "cnt"])

    bucketed = ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
    counted = (
        bucketed.groupby("bkt")
        .map_groups(triples, batch_format="pyarrow")
        .map_batches(combine, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["item_a", "item_b", "item_c"])
        .sum("cnt")
        .map_batches(
            lambda t: t.rename_columns(["item_a", "item_b", "item_c", "cnt"]),
            batch_format="pyarrow",
        )
    )
    return counted.sort(
        ["cnt", "item_a", "item_b", "item_c"], descending=[True, False, False, False]
    ).limit(k)


def association_rules(
    ds,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    k: int = 20,
):
    """Association rules from the top-k co-occurring item pairs: each
    unordered pair yields both directed rules a -> b with

        support    = pair_cnt / n_baskets
        confidence = pair_cnt / ante_cnt
        lift       = pair_cnt * n_baskets / (ante_cnt * cons_cnt)

    over distinct-item baskets — the classic Agrawal-style rule read
    out once pair mining (copurchase_pairs) is done. Counts are
    integer-exact; the three ratios are single divisions. Output
    (ante, cons, pair_cnt, ante_cnt, cons_cnt int64; support,
    confidence, lift float64) sorted by (ante, cons).

    Scale: pair mining is the existing distributed top-k; the rule
    read-out touches only the 2k winning rows — item supports for
    JUST the winning items come from one filtered distinct-count
    aggregate, and n_baskets is one distinct-key count. Nothing
    basket-shaped reaches the driver."""
    import pyarrow.compute as pc

    top = copurchase_pairs(ds, basket_col, item_col, k).take_all()  # k rows
    if not top:
        return pa.table(
            {
                "ante": pa.array([], pa.int64()),
                "cons": pa.array([], pa.int64()),
                "pair_cnt": pa.array([], pa.int64()),
                "ante_cnt": pa.array([], pa.int64()),
                "cons_cnt": pa.array([], pa.int64()),
                "support": pa.array([], pa.float64()),
                "confidence": pa.array([], pa.float64()),
                "lift": pa.array([], pa.float64()),
            }
        )
    items = sorted({r["item_a"] for r in top} | {r["item_b"] for r in top})

    proj = ds.select_columns(sorted({basket_col, item_col}))

    def distinct_bi(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.is_valid(batch.column(basket_col)),
            pc.is_valid(batch.column(item_col)),
        )
        t = batch.filter(ok)
        return (
            t.select([basket_col, item_col])
            .group_by([basket_col, item_col], use_threads=False)
            .aggregate([])
        )

    bi = proj.map_batches(distinct_bi, batch_format="pyarrow", zero_copy_batch=True)
    n_baskets = (
        bi.groupby(basket_col).count().count()
    )
    wanted = pa.array(items, pa.int64())
    # the per-batch distinct is only LOCAL — a (basket, item) pair whose
    # rows span blocks would double-count, so re-distinct globally on
    # the winner-filtered (tiny) pair set before counting
    item_counts = {
        r[item_col]: r["count()"]
        for r in (
            bi.map_batches(
                lambda t: t.filter(
                    pc.is_in(pc.cast(t.column(item_col), pa.int64()), value_set=wanted)
                ),
                batch_format="pyarrow",
            )
            .groupby([basket_col, item_col])
            .count()
            .groupby(item_col)
            .count()
            .take_all()
        )
    }
    nb = float(n_baskets)
    ante, cons, pcnt, acnt, ccnt = [], [], [], [], []
    for r in top:
        for a, b in ((r["item_a"], r["item_b"]), (r["item_b"], r["item_a"])):
            ante.append(a)
            cons.append(b)
            pcnt.append(r["cnt"])
            acnt.append(item_counts[a])
            ccnt.append(item_counts[b])
    order = sorted(range(len(ante)), key=lambda i: (ante[i], cons[i]))
    ante = [ante[i] for i in order]
    cons = [cons[i] for i in order]
    pcnt = [pcnt[i] for i in order]
    acnt = [acnt[i] for i in order]
    ccnt = [ccnt[i] for i in order]
    support = [float(p) / nb for p in pcnt]
    confidence = [float(p) / float(a) for p, a in zip(pcnt, acnt)]
    lift = [
        float(p) * nb / (float(a) * float(c)) for p, a, c in zip(pcnt, acnt, ccnt)
    ]
    return pa.table(
        {
            "ante": pa.array(ante, pa.int64()),
            "cons": pa.array(cons, pa.int64()),
            "pair_cnt": pa.array(pcnt, pa.int64()),
            "ante_cnt": pa.array(acnt, pa.int64()),
            "cons_cnt": pa.array(ccnt, pa.int64()),
            "support": pa.array(support, pa.float64()),
            "confidence": pa.array(confidence, pa.float64()),
            "lift": pa.array(lift, pa.float64()),
        }
    )
