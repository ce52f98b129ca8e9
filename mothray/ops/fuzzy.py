"""Fuzzy (edit-distance) string joins — entity resolution / record
linkage over short strings (names, titles, SKUs).

Candidate generation is FastSS deletion-neighborhood blocking
(Bocek et al. 2007, public): every string emits all variants
obtainable by deleting up to `max_dist` codepoints. If
ed(s, t) <= d, deleting from s the codepoints an optimal alignment
substitutes/deletes and from t the codepoints it substitutes/inserts
leaves the SAME string, so s and t share a variant — the blocking is
LOSSLESS. Unlike q-gram blocking it has no hot-key blowup on corpora
with a shared prefix (every TPC-H `Customer#...` name shares every
trigram, which would make trigram blocking a full cross product);
variant groups only gather true near-matches and exact duplicates.

Scale shape (100 TB note): three streaming stages —
  1. map_batches variant fan-out (Arrow slice+join kernels; the loop
     is over DELETE POSITIONS, bounded by the longest string in the
     batch, never over rows),
  2. one groupby(variant) exchange carrying (variant, id, value) —
     O(n * L^d) short rows; intended for short-string columns, the
     module guards against misuse on long text,
  3. one groupby(pair) distinct, then a map_batches banded-DP verify
     (O(L * (2d+1)) vectorized steps over the pair axis, values
     clamped at d+1).
Only candidate pairs — not the corpus — cross the second exchange.

Distance is CODEPOINT-level Levenshtein. (DuckDB's `levenshtein` is
byte-level, so SQL oracles use ASCII columns where the two agree;
unicode behavior is pinned by a Python reference in tests.)

The reference engine has no fuzzy join; this extends the join family
(SURVEY.md §2 joins) the same way asof/range joins do.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_LONG_CUTOFF = {1: 1024, 2: 128}


def _variant_arrays(vals: pa.Array, max_dist: int) -> list[tuple]:
    """All <=max_dist-deletion variants of each string: a list of
    (variant_array, row_mask) pairs — the loop is over delete
    positions (Arrow kernels across the whole column), and the mask
    keeps only rows long enough for that position. Without the mask a
    short string in a batch with one long string would emit
    (max_len - len) identical no-op copies, all landing in the SAME
    variant group and inflating in-group pairing quadratically
    (review finding, round 4)."""
    import pyarrow.compute as pc

    big = 1 << 30
    lens = pc.utf8_length(vals)
    max_len = pc.max(lens).as_py() or 0
    if max_len > _LONG_CUTOFF[max_dist]:
        raise ValueError(
            f"fuzzy join is for short-string columns: saw a {max_len}-codepoint "
            f"value (cutoff {_LONG_CUTOFF[max_dist]} at max_dist={max_dist}); "
            "near-dup long text belongs to the minhash/simhash family"
        )
    # one existence mask per position, hoisted out of the O(max_len^2)
    # two-deletion loop (the mask depends only on the LATER position)
    masks = [pc.greater(lens, j) for j in range(max_len)]
    out = [(vals, None)]  # 0 deletions: every row
    for p in range(max_len):
        out.append(
            (
                pc.binary_join_element_wise(
                    pc.utf8_slice_codeunits(vals, start=0, stop=p),
                    pc.utf8_slice_codeunits(vals, start=p + 1, stop=big),
                    "",
                ),
                masks[p],
            )
        )
    if max_dist >= 2:
        for p in range(max_len):
            for q in range(p + 1, max_len):
                out.append(
                    (
                        pc.binary_join_element_wise(
                            pc.utf8_slice_codeunits(vals, start=0, stop=p),
                            pc.utf8_slice_codeunits(vals, start=p + 1, stop=q),
                            pc.utf8_slice_codeunits(vals, start=q + 1, stop=big),
                            "",
                        ),
                        masks[q],  # the later position must exist
                    )
                )
    return out


def edit_distances(a, b, max_dist: int) -> np.ndarray:
    """Vectorized banded Levenshtein over pair axis: int64 distances,
    values beyond max_dist clamped to max_dist + 1. `a`/`b` are
    sequences of str."""
    d = max_dist
    inf = np.int64(d + 1)
    n = len(a)
    res = np.full(n, inf, dtype=np.int64)
    if n == 0:
        return res
    # exact codepoint lengths from the PYTHON strings: the numpy 'U'
    # buffer stores embedded and trailing U+0000 as real cells but
    # pads with the same 0, so lengths must come from len(), not a
    # nonzero count (review finding, round 4 — 'a\\x00' vs 'a' scored 0)
    la = np.fromiter((len(x) for x in a), dtype=np.int64, count=n)
    lb = np.fromiter((len(x) for x in b), dtype=np.int64, count=n)
    a = np.asarray(a, dtype="U")
    b = np.asarray(b, dtype="U")
    la_max = max(a.dtype.itemsize // 4, 1)
    lb_max = max(b.dtype.itemsize // 4, 1)
    A = np.ascontiguousarray(a.astype(f"U{la_max}")).view(np.uint32).reshape(n, la_max)
    B = np.ascontiguousarray(b.astype(f"U{lb_max}")).view(np.uint32).reshape(n, lb_max)
    live = np.abs(la - lb) <= d  # length filter: others stay at inf
    W = 2 * d + 1
    ks = np.arange(W)
    # row 0: dp[0][j] = j for j = k - d
    j0 = ks - d
    dp = np.where((j0 >= 0) & (j0[None, :] <= np.minimum(lb, inf)[:, None]), j0, inf)
    dp = np.minimum(dp, inf).astype(np.int64)
    at0 = live & (la == 0)
    if at0.any():
        res[at0] = dp[at0, lb[at0] + d]
    for i in range(1, int(la.max(initial=0)) + 1):
        j_arr = i + ks - d  # (W,) target column per band slot
        # diagonal (i-1, j-1): substitution cost
        jm1 = j_arr - 1
        valid_j = (jm1 >= 0) & (jm1 < lb_max)
        b_gather = B[:, np.clip(jm1, 0, lb_max - 1)]
        sub = (A[:, i - 1][:, None] != b_gather).astype(np.int64)
        diag = np.where(valid_j[None, :], dp + sub, inf)
        # deletion from a (i-1, j): band slot k+1
        dele = np.concatenate([dp[:, 1:], np.full((n, 1), inf)], axis=1) + 1
        cur = np.minimum(diag, dele)
        # invalid columns: j < 0 or j > lb
        cur[:, j_arr < 0] = inf
        cur[j_arr[None, :] > lb[:, None]] = inf
        # insertion into a (i, j-1): sequential along the W band slots
        for k in range(1, W):
            np.minimum(cur[:, k], cur[:, k - 1] + 1, out=cur[:, k])
        np.minimum(cur, inf, out=cur)
        dp = cur
        done = live & (la == i)
        if done.any():
            res[done] = dp[done, (lb - i + d)[done]]
    return res


def _pairs_table(group: pa.Table, id_column: str, two_sided: bool) -> pa.Table:
    """Unique candidate pairs within one variant group.

    Rows first reduce to DISTINCT ids (several delete positions of one
    string can hit the same variant — 'aa' minus either char is 'a' —
    and within a group an id always carries the same value, so the
    reduction is lossless; without it duplicate rows inflate pairing
    quadratically — review finding, round 4). NOTE: a group of m
    mutually-near values legitimately yields ~m^2/2 result rows —
    that is the join's OUTPUT (the SQL oracle emits the same pairs);
    corpora with massive exact-duplicate clusters should exact-dedup
    first."""
    schema = {
        "l_id": pa.int64(), "r_id": pa.int64(),
        "l_val": pa.string(), "r_val": pa.string(),
    }
    empty = pa.table({k: pa.array([], t) for k, t in schema.items()})
    ids = group.column(id_column).to_numpy(zero_copy_only=False)
    vals = group.column("__val").to_numpy(zero_copy_only=False)
    if two_sided:
        side = group.column("__side").to_numpy(zero_copy_only=False)
        # distinct (side, id), keeping the first row's value
        _, ui = np.unique(
            np.stack([side.astype(np.int64), ids.astype(np.int64)]), axis=1, return_index=True
        )
        side, ids, vals = side[ui], ids[ui], vals[ui]
        li, ri = np.nonzero(side == 0)[0], np.nonzero(side == 1)[0]
        if len(li) == 0 or len(ri) == 0:
            return empty
        gl = np.repeat(li, len(ri))
        gr = np.tile(ri, len(li))
    else:
        ids_u, ui = np.unique(ids, return_index=True)
        ids, vals = ids_u, vals[ui]
        m = len(ids)
        if m < 2:
            return empty
        gl, gr = np.triu_indices(m, k=1)
    return pa.table(
        {
            "l_id": pa.array(ids[gl].astype(np.int64)),
            "r_id": pa.array(ids[gr].astype(np.int64)),
            "l_val": pa.array(vals[gl], type=pa.string()),
            "r_val": pa.array(vals[gr], type=pa.string()),
        }
    )


def _fuzzy_candidates(variant_rows, id_column: str, two_sided: bool):
    """groupby(variant) -> in-group pairs -> global pair distinct."""
    pairs = variant_rows.groupby("__variant").map_groups(
        lambda g: _pairs_table(g, id_column, two_sided), batch_format="pyarrow"
    )

    def first_row(group: pa.Table) -> pa.Table:
        return group.slice(0, 1)

    return pairs.groupby(["l_id", "r_id"]).map_groups(first_row, batch_format="pyarrow")


def _verify(cands, max_dist: int):
    def dist_batch(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lv = batch.column("l_val").to_numpy(zero_copy_only=False)
        rv = batch.column("r_val").to_numpy(zero_copy_only=False)
        dist = edit_distances(lv, rv, max_dist)
        out = batch.append_column("dist", pa.array(dist))
        return out.filter(pc.less_equal(out["dist"], max_dist))

    return cands.map_batches(dist_batch, batch_format="pyarrow", zero_copy_batch=True)


def _variant_rows(ds, column: str, id_column: str, max_dist: int, side: int | None):
    import pyarrow.compute as pc

    def fan_out(batch: pa.Table) -> pa.Table:
        vals = batch.column(column).combine_chunks()
        keep = pc.is_valid(vals)  # SQL semantics: null never matches
        batch = batch.filter(keep)
        vals = vals.filter(keep)
        variants = _variant_arrays(vals, max_dist)
        ids = batch.column(id_column)
        parts = []
        for v, mask in variants:
            vv, ii, ww = v, ids, vals
            if mask is not None:
                vv, ii, ww = v.filter(mask), ids.filter(mask), vals.filter(mask)
            t = {"__variant": vv, id_column: ii, "__val": ww}
            if side is not None:
                t["__side"] = pa.array(np.full(len(vv), side, dtype=np.int8))
            parts.append(pa.table(t))
        return pa.concat_tables(parts)

    return ds.map_batches(fan_out, batch_format="pyarrow", zero_copy_batch=True)


def fuzzy_self_join(ds, column: str, id_column: str, max_dist: int = 1):
    """All id pairs (l_id < r_id) whose `column` values are within
    `max_dist` codepoint edits. Columns: l_id, r_id, l_val, r_val,
    dist. Deterministic; null values never match (SQL semantics)."""
    if max_dist not in (1, 2):
        raise ValueError("max_dist must be 1 or 2")
    rows = _variant_rows(ds, column, id_column, max_dist, side=None)
    return _verify(_fuzzy_candidates(rows, id_column, two_sided=False), max_dist)


def fuzzy_join(left, right, on: str, id_columns: tuple[str, str], max_dist: int = 1):
    """Two-sided fuzzy equi-join on edit distance: every (left, right)
    id pair with ed(l.on, r.on) <= max_dist. Both id columns are
    int64; the right id is carried through the exchange renamed."""
    if max_dist not in (1, 2):
        raise ValueError("max_dist must be 1 or 2")
    l_id, r_id = id_columns

    lrows = _variant_rows(
        left.select_columns([l_id, on]), on, l_id, max_dist, side=0
    ).map_batches(
        lambda t: t.rename_columns(["__variant", "__id", "__val", "__side"]),
        batch_format="pyarrow",
    )
    rrows = _variant_rows(
        right.select_columns([r_id, on]), on, r_id, max_dist, side=1
    ).map_batches(
        lambda t: t.rename_columns(["__variant", "__id", "__val", "__side"]),
        batch_format="pyarrow",
    )
    rows = lrows.union(rrows)
    return _verify(_fuzzy_candidates(rows, "__id", two_sided=True), max_dist)


def jaro_winkler_topk(ds, col: str, key_col: str, query: str, top_k: int = 15,
                      round_digits: int = 6):
    """Top-k rows of `col` by Jaro-Winkler similarity to ONE `query`
    string — the classic record-linkage scorer (Winkler 1990), pinned
    to DuckDB's exact variant so the SQL oracle value-matches:
    standard greedy Jaro matching with window max(|a|,|b|)//2 - 1,
    transpositions FLOORED (t = mismatches // 2 — DuckDB/RapidFuzz
    semantics, verified empirically on 16k random strings), prefix
    boost 0.1 * min(4, common_prefix) * (1 - jaro) applied when
    jaro > 0.7, equal strings = 1.0, either side empty = 0.0.
    Comparison is over UTF-8 bytes (identical to byte-based DuckDB
    for ASCII; callers with non-ASCII data should normalize first).

    Output: (key_col, jw_r6) — top_k by (jw_r6 DESC, key), the
    rounded score ordering both sides so the LIMIT boundary is
    deterministic.

    Scale shape: stateless map_batches — each batch scores ALL its
    rows against the single query with CHARACTER-LOOP vectorization
    (the greedy matcher runs len(query) numpy passes over the whole
    batch at once — no per-row Python); per-batch local top-k
    pre-truncation keeps the final sort's input at
    O(top_k * n_batches) rows."""
    import pyarrow.compute as pc

    q = query.encode("utf-8")
    m = len(q)
    qv = np.frombuffer(q, np.uint8)

    def score_batch(names: list[bytes]) -> np.ndarray:
        n = len(names)
        l2 = np.array([len(s) for s in names], np.int64)
        if m == 0 or n == 0:
            return np.zeros(n)
        L = max(1, int(l2.max()))
        M = np.full((n, L), 255, np.uint8)
        for r, s in enumerate(names):  # padding fill, O(rows) memcpy only
            M[r, : len(s)] = np.frombuffer(s, np.uint8)
        W = np.maximum(np.maximum(m, l2) // 2 - 1, 0)
        used = np.zeros((n, L), bool)
        match_pos = np.full((n, m), -1, np.int64)
        cols = np.arange(L)
        rows = np.arange(n)
        for i in range(m):
            lo = np.maximum(0, i - W)[:, None]
            hi = np.minimum(l2, i + W + 1)[:, None]
            cand = (M == qv[i]) & ~used & (cols >= lo) & (cols < hi)
            has = cand.any(axis=1)
            first = cand.argmax(axis=1)
            used[rows[has], first[has]] = True
            match_pos[has, i] = first[has]
        valid = match_pos >= 0
        mc = valid.sum(axis=1)
        # query-order matched chars, compacted left
        slot = np.cumsum(valid, axis=1) - 1
        qo = np.full((n, m), 255, np.uint8)
        no = np.full((n, m), 254, np.uint8)
        S = np.sort(np.where(valid, match_pos, 1 << 30), axis=1)
        for i in range(m):
            sel = valid[:, i]
            qo[rows[sel], slot[sel, i]] = qv[i]
        ok = S < (1 << 30)
        no[ok] = M[np.repeat(rows, m).reshape(n, m)[ok], S[ok]]
        k_mask = cols[:m][None, :] < mc[:, None]
        mism = ((qo != no) & k_mask).sum(axis=1)
        t = mism // 2
        with np.errstate(divide="ignore", invalid="ignore"):
            jar = np.where(
                mc > 0,
                (mc / m + mc / np.maximum(l2, 1) + (mc - t) / np.maximum(mc, 1)) / 3.0,
                0.0,
            )
        # prefix boost (Winkler), only above the 0.7 threshold
        pfx = np.zeros(n, np.int64)
        alive = np.ones(n, bool)
        for i in range(min(4, m)):
            alive &= (l2 > i) & (M[:, i] == qv[i]) if i < L else False
            pfx += alive
        jw = np.where(jar > 0.7, jar + 0.1 * pfx * (1.0 - jar), jar)
        exact = (l2 == m) & (M[:, :m] == qv).all(axis=1) if L >= m else np.zeros(n, bool)
        jw = np.where(exact, 1.0, jw)
        jw = np.where(l2 == 0, 0.0, jw)
        return jw

    def per_batch(batch: pa.Table) -> pa.Table:
        c = batch.column(col)
        ok = pc.is_valid(c)
        b = batch.select([key_col, col]).filter(ok)
        names = [s.encode("utf-8") for s in b.column(col).to_pylist()]
        s = np.round(score_batch(names), round_digits)
        t = pa.table({key_col: b.column(key_col), "jw_r6": pa.array(s, pa.float64())})
        if t.num_rows > top_k:  # local pre-truncation
            idx = pc.sort_indices(
                t, sort_keys=[("jw_r6", "descending"), (key_col, "ascending")]
            )[:top_k]
            t = t.take(idx)
        return t

    scored = ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)
    return scored.sort(key=["jw_r6", key_col], descending=[True, False]).limit(top_k)


def set_similarity_join(
    ds,
    id_col: str = "doc_id",
    column: str = "text",
    threshold_num: int = 9,
    threshold_den: int = 10,
):
    """EXACT set-similarity self-join (AllPairs/PPJoin prefix
    filtering, Bayardo et al. 2007): all document pairs whose
    single-space word SETS have Jaccard >= threshold_num /
    threshold_den. The threshold test is the integer cross-multiply
    i * den >= (n1 + n2 - i) * num — no float boundary anywhere; the
    reported jaccard column is one final division. Output (d1 < d2):
    (d1, d2, inter, n1, n2 int64, jaccard float64) sorted by (d1, d2).

    Distributed shape: distinct (doc, word-hash) combiner -> global
    document-frequency table (broadcast once via ray.put — vocabulary-
    sized, the standard AllPairs assumption) -> per-doc prefix
    emission in ascending-df order (prefix length n - ceil(t*n) + 1,
    so only the rarest slice of each doc enters the candidate join)
    -> prefix self-join + distinct -> packed sorted-hash blobs joined
    to candidates -> per-pair sorted-array intersection (C-level
    intersect1d). Only prefixes and candidate rows shuffle; full word
    sets move once as packed binary."""
    import math

    import pyarrow.compute as pc
    import ray

    from .join import partitioned_join
    from .text import fingerprint_batch

    def doc_words(batch: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.is_valid(batch.column(id_col)),
            pc.is_valid(batch.column(column)),
        )
        t = batch.select([id_col, column]).filter(ok)
        words = pc.split_pattern(t.column(column).combine_chunks(), " ")
        words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
        counts = np.diff(words.offsets.to_numpy(zero_copy_only=False))
        parent = np.repeat(np.arange(len(words), dtype=np.int64), counts)
        flat = words.flatten()
        keep = np.asarray(pc.utf8_length(flat).to_numpy(zero_copy_only=False) > 0)
        flat = flat.filter(pa.array(keep))
        parent = parent[keep]
        h = (
            fingerprint_batch(pa.table({"w": flat}), "w")
            .column("fingerprint")
            .to_numpy(zero_copy_only=False)
        )
        p = pa.table(
            {
                "d": t.column(id_col).combine_chunks().take(pa.array(parent)),
                "h": pa.array(h),
            }
        )
        return p.group_by(["d", "h"], use_threads=False).aggregate([])

    pairs = (
        ds.select_columns(sorted({id_col, column}))
        .map_batches(doc_words, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["d", "h"])
        .count()
        .drop_columns(["count()"])
        .materialize()
    )
    df_rows = pairs.groupby("h").count().take_all()  # vocabulary-sized
    hs = np.array([r["h"] for r in df_rows], dtype=np.int64)
    dfs = np.array([r["count()"] for r in df_rows], dtype=np.int64)
    order = np.argsort(hs, kind="stable")
    df_ref = ray.put((hs[order], dfs[order]))
    t_num, t_den = threshold_num, threshold_den

    def per_doc(group: pa.Table) -> pa.Table:
        h_sorted, df_sorted = ray.get(df_ref)
        h = group.column("h").to_numpy(zero_copy_only=False)
        df = df_sorted[np.searchsorted(h_sorted, h)]
        n = len(h)
        p = n - math.ceil(t_num * n / t_den) + 1
        ordk = np.lexsort((h, df))[:p]
        return pa.table(
            {
                "h": pa.array(h[ordk]),
                "d": group.column("d").slice(0, 1).take(
                    pa.array(np.zeros(len(ordk), dtype=np.int64))
                ),
                "n": pa.array(np.full(len(ordk), n, dtype=np.int64)),
            }
        )

    from .nullkeys import null_safe_group_map

    prefixes = null_safe_group_map(pairs, ["d"], per_doc).materialize()

    right = prefixes.map_batches(
        lambda t: pa.table({"h": t.column("h"), "d2": t.column("d"),
                            "n2": t.column("n")}),
        batch_format="pyarrow",
    )
    cands = (
        partitioned_join(prefixes, right, on="h")
        .map_batches(
            lambda t: t.filter(pc.less(t.column("d"), t.column("d2"))),
            batch_format="pyarrow",
        )
        .groupby(["d", "d2"])
        .min(["n", "n2"])
        .map_batches(
            lambda t: pa.table(
                {"d1": t.column("d"), "d2": t.column("d2"),
                 "n1": t.column("min(n)"), "n2": t.column("min(n2)")}
            ),
            batch_format="pyarrow",
        )
    )

    def blobs(group: pa.Table) -> pa.Table:
        h = np.sort(group.column("h").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "d": group.column("d").slice(0, 1),
                "blob": pa.array([h.tobytes()], pa.large_binary()),
            }
        )

    blob_ds = null_safe_group_map(pairs, ["d"], blobs).materialize()

    with_b1 = partitioned_join(
        cands,
        blob_ds.map_batches(
            lambda t: pa.table({"d1": t.column("d"), "b1": t.column("blob")}),
            batch_format="pyarrow",
        ),
        on="d1",
    )
    with_b2 = partitioned_join(
        with_b1,
        blob_ds.map_batches(
            lambda t: pa.table({"d2": t.column("d"), "b2": t.column("blob")}),
            batch_format="pyarrow",
        ),
        on="d2",
    )

    def verify(batch: pa.Table) -> pa.Table:
        b1 = batch.column("b1").to_pylist()
        b2 = batch.column("b2").to_pylist()
        inter = np.fromiter(
            (
                len(
                    np.intersect1d(
                        np.frombuffer(x, dtype=np.int64),
                        np.frombuffer(y, dtype=np.int64),
                        assume_unique=True,
                    )
                )
                for x, y in zip(b1, b2)
            ),
            dtype=np.int64,
            count=len(b1),
        )
        n1 = batch.column("n1").to_numpy(zero_copy_only=False)
        n2 = batch.column("n2").to_numpy(zero_copy_only=False)
        union = n1 + n2 - inter
        keep = inter * t_den >= union * t_num
        jac = inter.astype(np.float64) / union.astype(np.float64)
        return pa.table(
            {
                "d1": batch.column("d1").filter(pa.array(keep)),
                "d2": batch.column("d2").filter(pa.array(keep)),
                "inter": pa.array(inter[keep]),
                "n1": pa.array(n1[keep]),
                "n2": pa.array(n2[keep]),
                "jaccard": pa.array(jac[keep]),
            }
        )

    return with_b2.map_batches(
        verify, batch_format="pyarrow", zero_copy_batch=True
    ).sort(["d1", "d2"])
