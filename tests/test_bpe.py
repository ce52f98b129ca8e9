"""BPE trainer: parity with an independent naive Sennrich reference,
determinism across partitionings, the nonincreasing-frequency
property, and the apply round-trip."""

import numpy as np
import pyarrow as pa
import pytest

from mothray.ops import bpe

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "lower lowest lowering newer newest the the the",
    "hugging face tokenizers byte pair encoding test",
    "pair encoding pairs paired pairing encoded",
] * 2


def naive_bpe(word_counts, num_merges, min_freq=2):
    from collections import Counter

    vocab = {tuple(list(w) + ["</w>"]): c for w, c in word_counts.items()}
    merges = []
    for rank in range(num_merges):
        pc_ = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc_[(syms[i], syms[i + 1])] += c
        if not pc_:
            break
        best_cnt = max(pc_.values())
        if best_cnt < min_freq:
            break
        best = min(p for p, c in pc_.items() if c == best_cnt)
        merges.append((rank, best[0], best[1], best_cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _tbl():
    return pa.table({"doc_id": pa.array(range(len(TEXTS)), pa.int64()), "text": TEXTS})


def test_bpe_train_matches_naive_reference(ray_session):
    import ray.data

    got = bpe.bpe_train(ray.data.from_arrow(_tbl()).repartition(3), num_merges=40)
    got_rows = list(
        zip(
            got["rank"].to_pylist(),
            got["left"].to_pylist(),
            got["right"].to_pylist(),
            got["freq"].to_pylist(),
        )
    )
    from collections import Counter

    wc = Counter(w for t in TEXTS for w in t.lower().split())
    assert got_rows == naive_bpe(wc, 40)
    freqs = got["freq"].to_pylist()
    assert freqs == sorted(freqs, reverse=True)  # nonincreasing property


def test_bpe_train_partition_invariant(ray_session):
    import ray.data

    a = bpe.bpe_train(ray.data.from_arrow(_tbl()).repartition(2), num_merges=25)
    b = bpe.bpe_train(ray.data.from_arrow(_tbl()).repartition(7), num_merges=25)
    assert a.equals(b)


def test_bpe_apply_roundtrip(ray_session):
    import ray.data

    ds = ray.data.from_arrow(_tbl())
    merges = bpe.bpe_train(ds, num_merges=30)
    for r in bpe.bpe_apply(ds, merges).take_all():
        rebuilt = "".join(t.replace("</w>", " ") for t in r["bpe_tokens"]).split()
        assert rebuilt == r["text"].lower().split()


def test_bpe_min_freq_early_stop(ray_session):
    import ray.data

    tbl = pa.table({"text": ["ab cd ef", "gh ij kl"]})  # every pair unique
    merges = bpe.bpe_train(ray.data.from_arrow(tbl), num_merges=10, min_freq=2)
    assert merges.num_rows == 0


def test_greedy_merge_positions_overlap_runs():
    # "aaaa": matches at 0,1,2 -> greedy keeps 0 and 2
    m = np.array([True, True, True, False])
    assert bpe._greedy_merge_positions(m).tolist() == [0, 2]
    m = np.array([False, True, False, True, True, True, True, False])
    assert bpe._greedy_merge_positions(m).tolist() == [1, 3, 5]
    assert bpe._greedy_merge_positions(np.zeros(4, dtype=bool)).tolist() == []
