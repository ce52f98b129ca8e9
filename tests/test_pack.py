"""Sequence packing (ops.pack): concat-and-chunk vs a sequential
reference, invariance across bucket counts, degenerate inputs."""
import numpy as np
import pyarrow as pa
import pytest

from mothray.ops import pack


def _ref_pack(ids, texts, L):
    """Sequential reference: dict seq_id -> [n_docs, first, last]."""
    order = np.argsort(np.asarray(ids, dtype=object), kind="stable")
    out = {}
    cum = 0
    for i in order:
        t = texts[i]
        n = 0 if t is None else t.count(" ") + 1
        lo, hi = cum, cum + n
        cum = hi
        if n == 0:
            continue
        for s in range(lo // L, (hi - 1) // L + 1):
            if s not in out:
                out[s] = [0, ids[i], ids[i]]
            out[s][0] += 1
            out[s][1] = min(out[s][1], ids[i])
            out[s][2] = max(out[s][2], ids[i])
    total = cum
    return {
        s: (min((s + 1) * L, total) - s * L, d, f, l)
        for s, (d, f, l) in out.items()
    }


def _run(ds, L, n_buckets=None):
    rows = pack.pack_sequences(ds, L, n_buckets=n_buckets).take_all()
    return {
        r["seq_id"]: (r["n_tokens"], r["n_docs"], r["first_doc"], r["last_doc"])
        for r in rows
    }


@pytest.fixture()
def corpus():
    rng = np.random.default_rng(7)
    ids = rng.permutation(400).tolist()
    texts = [
        " ".join(f"w{j}" for j in range(int(rng.integers(1, 40))))
        for _ in range(400)
    ]
    return ids, texts


def test_pack_matches_reference(ray_session, corpus):
    import ray.data

    ids, texts = corpus
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    got = _run(ds, 64)
    assert got == _ref_pack(ids, texts, 64)


def test_sample_boundaries_kmv_on_few_big_blocks(ray_session):
    """A large corpus held in FEW big blocks must be KMV-estimated, not
    'exact' at the truncated sample size: each batch ships at most
    per_batch_k fingerprints, so 2 blocks x 50k rows once looked like
    a ~512-row corpus and collapsed the bucket count to 1."""
    import ray.data

    n = 100_000
    t = pa.table({"doc_id": pa.array(np.arange(n))})
    ds = ray.data.from_arrow(t).repartition(2)  # 2 big blocks
    bnd, n_buckets = pack.sample_boundaries(
        ds, "doc_id", rows_per_bucket=10_000, max_buckets=64
    )
    # KMV estimate of 100k rows / 10k per bucket → ~10 buckets (wide
    # tolerance: it is an estimate), emphatically not 1
    assert 4 <= n_buckets <= 40
    # small corpus in small blocks still reports EXACT size
    small = ray.data.from_arrow(pa.table({"doc_id": pa.array(np.arange(100))}))
    bnd2, nb2 = pack.sample_boundaries(small, "doc_id", rows_per_bucket=50)
    assert nb2 == 3  # 100 rows / 50 per bucket + 1 (exact path)


def test_pack_bucket_count_invariance(ray_session, corpus):
    import ray.data

    ids, texts = corpus
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    a = _run(ds, 37, n_buckets=1)
    b = _run(ds, 37, n_buckets=7)
    c = _run(ds, 37)  # KMV-derived
    assert a == b == c == _ref_pack(ids, texts, 37)


def test_pack_null_and_boundary_docs(ray_session):
    import ray.data

    # doc 2 is null (0 tokens, excluded); doc 1 ends exactly on a
    # sequence boundary; doc 3 spans two sequences
    ids = [1, 2, 3, 4]
    texts = ["a b c d", None, "e f g h i j", "k"]
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    got = _run(ds, 4)
    assert got == _ref_pack(ids, texts, 4)
    # explicit: seq 0 holds exactly doc 1; the null doc never appears
    assert got[0] == (4, 1, 1, 1)


def test_pack_empty_dataset(ray_session):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    assert _run(ds, 16) == {}


def _ref_pack_tokens(ids, texts, L):
    order = np.argsort(np.asarray(ids, dtype=object), kind="stable")
    stream = []
    for i in order:
        t = texts[i]
        if t is None:
            continue
        stream.extend(t.split(" "))
    return {
        s: stream[s * L : (s + 1) * L] for s in range((len(stream) + L - 1) // L)
    }


@pytest.mark.parametrize("nb", [None, 1, 5])
def test_pack_tokens_matches_reference(ray_session, corpus, nb):
    import ray.data

    ids, texts = corpus
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    rows = pack.pack_tokens(ds, 48, n_buckets=nb).take_all()
    got = {r["seq_id"]: list(r["tokens"]) for r in rows}
    assert all(r["n_tokens"] == len(r["tokens"]) for r in rows)
    assert got == _ref_pack_tokens(ids, texts, 48)


def test_pack_tokens_null_and_exact_boundary(ray_session):
    import ray.data

    ids = [1, 2, 3]
    texts = ["a b c d", None, "e f g h"]  # 8 tokens, L=4: two exact seqs
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    got = {r["seq_id"]: list(r["tokens"]) for r in pack.pack_tokens(ds, 4).take_all()}
    assert got == {0: ["a", "b", "c", "d"], 1: ["e", "f", "g", "h"]}
