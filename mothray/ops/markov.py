"""First-order Markov transition matrix over per-key ordered event
sequences: (from_state, to_state, cnt, prob_r6).

For each key (user), events are ordered by (order_col, tiebreak_col)
and every consecutive state pair contributes one transition. `prob_r6`
is the row-stochastic probability cnt / sum(cnt per from_state),
rounded to 6 digits (values are in [0,1], so round-6 cells are stable
across merge orders).

Scale shape: only (key, order, tiebreak, state) columns are projected;
one null-safe groupby(key) exchange; inside each group a vectorized
sort + two shifted takes; per-group pairs are pre-counted before the
tiny (from,to) combiner groupby, so the second exchange carries at
most |states|^2 rows per group. The probability normalization runs on
the final matrix, which is at most |states|^2 rows — a repartition(1)
there is O(states^2), not O(data).

Null states are dropped BEFORE pairing (a null breaks the chain in
neither direction: its neighbors pair with each other) — mirrored in
the SQL oracle by filtering NULL states before the lag window.

No reference analog (orc-go has no analytics operators) — engine
extension alongside the funnel / cohort / window family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def transition_matrix(
    ds,
    key_col: str = "user_id",
    order_col: str = "ts",
    tiebreak_col: str = "event_id",
    state_col: str = "event_type",
    round_digits: int = 6,
):
    """(from_state, to_state, cnt BIGINT, prob_r6 DOUBLE), sorted by
    (from_state, to_state). Equivalent SQL: lag(state) OVER
    (PARTITION BY key ORDER BY order, tiebreak) + GROUP BY pair."""

    def pairs(group: pa.Table) -> pa.Table:
        g = group.filter(pc.is_valid(group.column(state_col)))
        if g.num_rows < 2:
            return pa.table(
                {
                    "from_state": pa.array([], pa.string()),
                    "to_state": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        idx = pc.sort_indices(
            g, sort_keys=[(order_col, "ascending"), (tiebreak_col, "ascending")]
        )
        st = g.column(state_col).take(idx).combine_chunks()
        # dictionary-encode once, count (from,to) code pairs in numpy
        dic = st.dictionary_encode()
        codes = np.asarray(dic.indices, dtype=np.int64)
        k = len(dic.dictionary)
        pair_ids = codes[:-1] * k + codes[1:]
        uniq, cnt = np.unique(pair_ids, return_counts=True)
        return pa.table(
            {
                "from_state": dic.dictionary.take(pa.array(uniq // k)),
                "to_state": dic.dictionary.take(pa.array(uniq % k)),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    def add_prob(t: pa.Table) -> pa.Table:
        # final matrix only (<= |states|^2 rows): row-normalize
        f = t.column("from_state").combine_chunks().dictionary_encode()
        codes = np.asarray(f.indices, dtype=np.int64)
        cnt = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
        totals = np.bincount(codes, weights=cnt, minlength=len(f.dictionary))
        prob = np.round(cnt / totals[codes], round_digits)
        return t.append_column("prob_r6", pa.array(prob, pa.float64()))

    from .nullkeys import null_safe_group_map

    proj = ds.select_columns(sorted({key_col, order_col, tiebreak_col, state_col}))
    counts = (
        null_safe_group_map(proj, [key_col], pairs)
        .groupby(["from_state", "to_state"])
        .sum("cnt")
        .map_batches(
            lambda t: t.rename_columns(["from_state", "to_state", "cnt"]),
            batch_format="pyarrow",
        )
    )
    return (
        counts.repartition(1)
        .map_batches(add_prob, batch_format="pyarrow")
        .sort(["from_state", "to_state"])
    )


def entropy_rate(
    ds,
    key_col: str = "user_id",
    order_col: str = "ts",
    tiebreak_col: str = "event_id",
    state_col: str = "event_type",
    round_digits: int = 6,
) -> pa.Table:
    """Entropy rate of the first-order Markov chain over per-key state
    sequences: H = -sum_ij (c_ij / N) * ln(c_ij / n_i) in nats, where
    c_ij is the corpus-wide (from, to) transition count, n_i the
    from-state row total and N the total transitions — the stationary
    weighting by observed visit frequency. The transition grid
    (<= |states|^2 cells) is the only driver-side state; counts come
    from transition_matrix's per-key pair pass. Terms are bit-identical
    doubles; round-6 absorbs the cell-sum order. Output one row
    (n_transitions, n_states, entropy_rate)."""
    grid = pa.Table.from_pylist(
        transition_matrix(
            ds, key_col, order_col, tiebreak_col, state_col
        ).take_all()
    )
    if grid.num_rows == 0:
        return pa.table(
            {
                "n_transitions": pa.array([0], pa.int64()),
                "n_states": pa.array([0], pa.int64()),
                "entropy_rate": pa.array([None], pa.float64()),
            }
        )
    f = grid.column("from_state").combine_chunks().dictionary_encode()
    codes = np.asarray(f.indices, dtype=np.int64)
    c = grid.column("cnt").to_numpy(zero_copy_only=False).astype(np.int64)
    ni = np.bincount(codes, weights=c.astype(np.float64), minlength=len(f.dictionary))
    n_total = int(c.sum())
    terms = (c / n_total) * np.log(c / ni[codes])
    h = float(np.round(-terms.sum(), round_digits))
    return pa.table(
        {
            "n_transitions": pa.array([n_total], pa.int64()),
            "n_states": pa.array([len(f.dictionary)], pa.int64()),
            "entropy_rate": pa.array([h], pa.float64()),
        }
    )


def prediction_accuracy(
    ds,
    key_col: str = "user_id",
    order_col: str = "ts",
    tiebreak_col: str = "event_id",
    state_col: str = "event_type",
):
    """First-order Markov next-event prediction accuracy: fit the
    global transition-count matrix (same per-key ordered extraction as
    `transition_matrix`), predict for every from_state the
    most-frequent to_state (ties broken by ascending state name), and
    report per from_state how often the actual next event equals the
    prediction. In-sample/descriptive by construction (the matrix is
    fit on the full stream).

    Output per from_state: (from_state, predicted, n, correct, acc)
    where n and correct are exact BIGINT transition counts and acc is
    the single int division correct/n — bit-deterministic. Scale
    shape: only the <= |states|^2 count matrix leaves the cluster; the
    per-key pair extraction is the proven transition_matrix combiner."""
    from .nullkeys import null_safe_group_map

    def pairs(group: pa.Table) -> pa.Table:
        g = group.filter(pc.is_valid(group.column(state_col)))
        if g.num_rows < 2:
            return pa.table(
                {
                    "from_state": pa.array([], pa.string()),
                    "to_state": pa.array([], pa.string()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        idx = pc.sort_indices(
            g, sort_keys=[(order_col, "ascending"), (tiebreak_col, "ascending")]
        )
        st = g.column(state_col).take(idx).combine_chunks()
        dic = st.dictionary_encode()
        codes = np.asarray(dic.indices, dtype=np.int64)
        k = len(dic.dictionary)
        pair_ids = codes[:-1] * k + codes[1:]
        uniq, cnt = np.unique(pair_ids, return_counts=True)
        return pa.table(
            {
                "from_state": dic.dictionary.take(pa.array(uniq // k)),
                "to_state": dic.dictionary.take(pa.array(uniq % k)),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    proj = ds.select_columns(sorted({key_col, order_col, tiebreak_col, state_col}))
    counts = (
        null_safe_group_map(proj, [key_col], pairs)
        .groupby(["from_state", "to_state"])
        .sum("cnt")
        .take_all()
    )
    per_from: dict[str, list[tuple[str, int]]] = {}
    for r in counts:
        per_from.setdefault(r["from_state"], []).append(
            (r["to_state"], int(r["sum(cnt)"]))
        )
    rows = []
    for f in sorted(per_from):
        cells = per_from[f]
        n = sum(c for _, c in cells)
        predicted, correct = min(cells, key=lambda tc: (-tc[1], tc[0]))
        rows.append((f, predicted, n, correct, correct / n))
    return pa.table(
        {
            "from_state": pa.array([r[0] for r in rows], pa.string()),
            "predicted": pa.array([r[1] for r in rows], pa.string()),
            "n": pa.array([r[2] for r in rows], pa.int64()),
            "correct": pa.array([r[3] for r in rows], pa.int64()),
            "acc": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
