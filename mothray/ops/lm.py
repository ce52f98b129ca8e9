"""Bigram language-model scoring — the CCNet-style perplexity quality
signal (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data"): score each document by the
cross-entropy of a small n-gram LM trained on the corpus itself; high
cross-entropy = unusual/garbage text, low = boilerplate.

Engineered to be EXACTLY SQL-reproducible so it carries a DuckDB value
oracle (the public KenLM is neither in this container nor
deterministic across builds):

* tokens = single-space split of lower(text) (the repo-wide contract);
* vocab  = top-V unigrams by (count DESC, token ASC) — deterministic
  tie-break; every other token maps to '<unk>';
* model  = add-alpha bigram: p(w2|w1) = (c2(w1,w2) + a) /
  (c1(w1) + a*(V+1)) over the MAPPED token stream;
* score  = cross_entropy = -mean(ln p) over a doc's adjacent pairs,
  rounded to 6 digits (sum order differs across engines).

Scale shape: training is two bounded exchanges — a unigram-count
combiner (distinct tokens per batch) and a bigram-count combiner
bounded by (V+1)^2 rows total; c1 of '<unk>' falls out of the totals,
so no extra pass. The model broadcasts once via ray.put; scoring
streams with zero shuffles. Vocab selection is the same top-k
machinery as text.token_top_k.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _token_stream(batch: pa.Table, column: str):
    """(flat tokens, parent doc index per token) for one batch."""
    texts = pc.utf8_lower(batch.column(column).combine_chunks().fill_null(""))
    toks = pc.split_pattern(texts, " ")
    return toks.flatten(), pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)


def _map_ids(tokens, vocab: np.ndarray) -> np.ndarray:
    """Token -> vocab id; misses map to id V (the '<unk>' slot)."""
    t = tokens.to_numpy(zero_copy_only=False)
    vi = np.searchsorted(vocab, t)
    vi_c = np.clip(vi, 0, len(vocab) - 1)
    found = (vi < len(vocab)) & (vocab[vi_c] == t) if len(vocab) else np.zeros(len(t), bool)
    return np.where(found, vi_c, len(vocab)).astype(np.int64)


def train_bigram_lm(ds, column: str = "text", vocab_size: int = 256, alpha: float = 0.5):
    """Returns the broadcastable model dict:
    vocab (sorted tokens), c1 (len V+1, last = '<unk>'), pair_keys
    (sorted w1*(V+1)+w2), pair_counts, alpha, V."""

    def uni_partial(batch: pa.Table) -> pa.Table:
        flat, _ = _token_stream(batch, column)
        vc = pc.value_counts(flat)
        return pa.table({"token": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())})

    uni = (
        ds.map_batches(uni_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .sum("cnt")
        .to_pandas()
    )
    uni = uni.rename(columns={"sum(cnt)": "cnt"})
    total_tokens = int(uni["cnt"].sum())
    top = uni.sort_values(["cnt", "token"], ascending=[False, True]).head(vocab_size)
    order = np.argsort(top["token"].to_numpy(dtype=object), kind="stable")
    vocab = top["token"].to_numpy(dtype=object)[order]
    c1 = np.empty(len(vocab) + 1, dtype=np.int64)
    c1[: len(vocab)] = top["cnt"].to_numpy(dtype=np.int64)[order]
    c1[len(vocab)] = total_tokens - int(top["cnt"].sum())  # '<unk>' mass

    V1 = len(vocab) + 1

    def bi_partial(batch: pa.Table) -> pa.Table:
        flat, didx = _token_stream(batch, column)
        ids = _map_ids(flat, vocab)
        if len(ids) < 2:
            return pa.table({"key": pa.array([], type=pa.int64()), "cnt": pa.array([], type=pa.int64())})
        same_doc = didx[1:] == didx[:-1]
        keys = ids[:-1][same_doc] * V1 + ids[1:][same_doc]
        uk, counts = np.unique(keys, return_counts=True)
        return pa.table({"key": pa.array(uk), "cnt": pa.array(counts.astype(np.int64))})

    bi = (
        ds.map_batches(bi_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("key")
        .sum("cnt")
        .to_pandas()
        .sort_values("key")
    )
    return {
        "vocab": vocab,
        "c1": c1,
        "pair_keys": bi["key"].to_numpy(dtype=np.int64),
        "pair_counts": bi["sum(cnt)"].to_numpy(dtype=np.int64),
        "alpha": alpha,
        "V": len(vocab),
    }


def lm_score(ds, model: dict, column: str = "text", id_column: str = "doc_id",
             round_digits: int = 6):
    """Streams the corpus through the broadcast model; output one row
    per doc: id, n_pairs, cross_entropy (null when the doc has < 2
    tokens)."""
    import ray

    m_ref = ray.put(model)

    def score(batch: pa.Table) -> pa.Table:
        m = ray.get(m_ref)
        vocab, c1 = m["vocab"], m["c1"]
        pk, pcnt = m["pair_keys"], m["pair_counts"]
        a, V1 = m["alpha"], m["V"] + 1
        flat, didx = _token_stream(batch, column)
        ids = _map_ids(flat, vocab)
        n = batch.num_rows
        if len(ids) >= 2:
            same_doc = didx[1:] == didx[:-1]
            w1 = ids[:-1][same_doc]
            keys = w1 * V1 + ids[1:][same_doc]
            pdoc = didx[:-1][same_doc]
            pos = np.searchsorted(pk, keys)
            pos_c = np.clip(pos, 0, max(len(pk) - 1, 0))
            hit = (pos < len(pk)) & (pk[pos_c] == keys) if len(pk) else np.zeros(len(keys), bool)
            c2 = np.where(hit, pcnt[pos_c] if len(pk) else 0, 0)
            lp = np.log((c2 + a) / (c1[w1] + a * V1))
            sums = np.zeros(n)
            np.add.at(sums, pdoc, lp)
            cnts = np.bincount(pdoc, minlength=n)
        else:
            sums, cnts = np.zeros(n), np.zeros(n, dtype=np.int64)
        has = cnts > 0
        ce = np.round(-sums / np.maximum(cnts, 1), round_digits)
        return pa.table(
            {
                id_column: batch.column(id_column),
                "n_pairs": pa.array(cnts.astype(np.int64)),
                "cross_entropy": pa.array(ce, type=pa.float64(), mask=~has),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)


def bigram_cross_entropy(ds, column: str = "text", id_column: str = "doc_id",
                         vocab_size: int = 256, alpha: float = 0.5):
    """Train-on-corpus + score-corpus in one call (the CCNet loop)."""
    return lm_score(ds, train_bigram_lm(ds, column, vocab_size, alpha),
                    column, id_column)
