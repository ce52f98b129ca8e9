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
    from itertools import combinations as _comb  # noqa: F401  (documentation)

    def triples(group: pa.Table) -> pa.Table:
        items = np.unique(
            group.column(item_col).drop_null().to_numpy(zero_copy_only=False)
        )
        m = len(items)
        empty = pa.table(
            {
                "item_a": pa.array([], pa.int64()),
                "item_b": pa.array([], pa.int64()),
                "item_c": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if m < 3 or m > max_basket:
            return empty
        # vectorized index triples i<j<l
        i, j = np.triu_indices(m, k=1)
        # expand each (i,j) with every l > j
        reps = m - 1 - j
        keep = reps > 0
        i, j, reps = i[keep], j[keep], reps[keep]
        ii = np.repeat(i, reps)
        jj = np.repeat(j, reps)
        ll = np.concatenate([np.arange(b + 1, m) for b in j]) if len(j) else np.array([], np.int64)
        return pa.table(
            {
                "item_a": pa.array(items[ii].astype(np.int64)),
                "item_b": pa.array(items[jj].astype(np.int64)),
                "item_c": pa.array(items[ll].astype(np.int64)),
                "cnt": pa.array(np.ones(len(ii), dtype=np.int64)),
            }
        )

    def combine(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["item_a", "item_b", "item_c"]).aggregate([("cnt", "sum")])
        return g.rename_columns(["item_a", "item_b", "item_c", "cnt"])

    from .nullkeys import null_safe_group_map

    proj = ds.select_columns(sorted({basket_col, item_col}))
    counted = (
        null_safe_group_map(proj, [basket_col], triples)
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
