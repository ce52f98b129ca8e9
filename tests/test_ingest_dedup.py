"""Ingest-time exact dedup against a persisted corpus hash index:
cross-corpus dups drop, in-batch dups keep the lowest id, definitely-new
docs pass the bloom gate, and appends extend the index."""
import numpy as np
import pyarrow as pa
import pytest

from mothray.ops import dedup


def _ds(ids, texts):
    import ray.data

    return ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))


@pytest.fixture()
def corpus_and_batch():
    rng = np.random.default_rng(3)
    corpus_texts = [f"corpus doc {i} " + "x" * int(rng.integers(1, 40)) for i in range(100)]
    batch_texts = (
        corpus_texts[10:30]  # 20 cross-corpus dups
        + [f"new doc {i}" for i in range(30)]  # 30 new
        + ["repeated in batch"] * 3  # in-batch dups: keep 1
    )
    batch_ids = list(range(100, 100 + len(batch_texts)))
    return corpus_texts, batch_ids, batch_texts


def test_ingest_dedup_end_to_end(ray_session, corpus_and_batch, tmp_path):
    corpus_texts, batch_ids, batch_texts = corpus_and_batch
    idx = str(tmp_path / "exact_idx")
    meta = dedup.build_exact_index(_ds(list(range(100)), corpus_texts), idx)
    assert meta["n_docs"] == 100

    kept = dedup.ingest_dedup(_ds(batch_ids, batch_texts), idx).take_all()
    kept_ids = sorted(r["doc_id"] for r in kept)
    # 20 cross dups dropped; 2 of the 3 in-batch repeats dropped
    want = sorted(batch_ids[20:50] + [batch_ids[50]])
    assert kept_ids == want
    # content check: no kept text exists in the corpus
    assert not ({r["text"] for r in kept} & set(corpus_texts))

    # append the survivors; a re-ingest of the same batch drops everything
    dedup.append_exact_index(_ds(kept_ids, [r["text"] for r in kept]), idx)
    again = dedup.ingest_dedup(_ds([900 + i for i in range(len(batch_texts))], batch_texts), idx)
    assert again.count() == 0


def test_ingest_dedup_all_new(ray_session, tmp_path):
    idx = str(tmp_path / "idx2")
    dedup.build_exact_index(_ds([1, 2], ["alpha", "beta"]), idx)
    out = dedup.ingest_dedup(_ds([3, 4], ["gamma", "delta"]), idx)
    assert sorted(r["doc_id"] for r in out.take_all()) == [3, 4]


def test_ingest_minhash_near_dup(ray_session, tmp_path):
    """Band-bucket collisions with the indexed corpus drop; distinct
    content survives; in-batch bucket dups keep the lowest id."""
    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(500)]

    def doc(k, n=80):
        r = np.random.default_rng(k)
        return " ".join(r.choice(words, size=n))

    corpus = [doc(i) for i in range(60)]
    idx = str(tmp_path / "mh_idx")
    dedup.build_minhash_index(_ds(list(range(60)), corpus), idx)

    near = corpus[5] + " tailword"  # near-dup of corpus doc 5
    fresh = [doc(1000 + i) for i in range(10)]
    batch_texts = [corpus[3], near] + fresh + [fresh[0]]  # exact corpus dup, near dup, 10 new, 1 in-batch dup
    ids = list(range(100, 100 + len(batch_texts)))
    kept = dedup.ingest_minhash_dedup(_ds(ids, batch_texts), idx).take_all()
    kept_ids = sorted(r["doc_id"] for r in kept)
    assert 100 not in kept_ids  # exact corpus dup dropped
    assert 101 not in kept_ids  # near-dup dropped (shares bands)
    assert ids[-1] not in kept_ids  # in-batch dup of fresh[0] dropped
    assert set(kept_ids) == set(ids[2:-1])  # the 10 fresh docs survive

    # re-ingest of the corpus itself drops everything
    again = dedup.ingest_minhash_dedup(_ds(list(range(500, 560)), corpus), idx)
    assert again.count() == 0


def test_ingest_simhash_near_dup(ray_session, tmp_path):
    """Co-partitioned probe: new docs within hamming<=3 of an indexed
    corpus doc drop (exact + near), distinct content survives, in-batch
    near-dups keep the lowest id, and a corpus re-ingest drops all."""

    def doc(k, n=120):
        r = np.random.default_rng(k)
        words = [f"tok{i}" for i in range(800)]
        return " ".join(r.choice(words, size=n))

    corpus = [doc(i) for i in range(60)]
    idx = str(tmp_path / "sh_idx")
    meta = dedup.build_simhash_index(_ds(list(range(60)), corpus), idx)
    assert meta["n_band_rows"] > 0

    near = corpus[5][:-8]  # tiny edit: simhash within a few bits
    fresh = [doc(2000 + i) for i in range(10)]
    batch_texts = [corpus[3], near] + fresh + [fresh[0]]
    ids = list(range(100, 100 + len(batch_texts)))
    kept = dedup.ingest_simhash_dedup(_ds(ids, batch_texts), idx).take_all()
    kept_ids = sorted(r["doc_id"] for r in kept)
    assert 100 not in kept_ids  # exact corpus dup (hamming 0)
    assert 101 not in kept_ids  # near corpus dup
    assert ids[-1] not in kept_ids  # in-batch exact dup of fresh[0]
    # every fresh doc survives
    assert set(kept_ids) == set(ids[2:-1])

    # batch-mode parity: the ingest drop set on (corpus ∪ batch) agrees
    # with simhash_dedup's verdict for the batch docs (same banding,
    # same hamming bound, corpus ids all lower than batch ids)
    both_ids = list(range(60)) + ids
    both_texts = corpus + batch_texts
    batch_kept_by_batchmode = {
        r["doc_id"]
        for r in dedup.simhash_dedup(_ds(both_ids, both_texts), max_hamming=3).take_all()
        if r["doc_id"] >= 100
    }
    assert set(kept_ids) == batch_kept_by_batchmode

    # re-ingest of the corpus itself drops everything (hamming 0 rows)
    again = dedup.ingest_simhash_dedup(_ds(list(range(700, 760)), corpus), idx)
    assert again.count() == 0

    # a FOREIGN index whose stripes lack bkey zone maps must still be
    # probed (unconditionally, not skipped): strip the stats and expect
    # the identical verdict
    import glob
    import json

    import pyarrow.parquet as pq

    for f in glob.glob(idx + "/*.parquet"):
        t = pq.read_table(f)
        stats = [
            json.dumps({k: v for k, v in json.loads(s).items() if k != "bkey"})
            for s in t.column("stats").to_pylist()
        ]
        t2 = t.set_column(t.column_names.index("stats"), "stats", pa.array(stats))
        pq.write_table(t2, f, row_group_size=8)
    kept_nostats = dedup.ingest_simhash_dedup(_ds(ids, batch_texts), idx).take_all()
    assert sorted(r["doc_id"] for r in kept_nostats) == kept_ids


def test_ingest_embedding_near_dup(ray_session, tmp_path):
    """Cosine-verified ingest: near-identical vectors drop, orthogonal-ish
    survive even when bucket-colliding rarely; in-batch near-dups keep
    the lowest id; re-ingest of the corpus drops everything."""
    import ray.data

    rng = np.random.default_rng(5)
    dim = 32
    corpus = rng.standard_normal((50, dim)).astype(np.float32)

    def ds_of(ids, mat):
        vecs = pa.FixedSizeListArray.from_arrays(pa.array(mat.ravel().astype(np.float32)), dim)
        return ray.data.from_arrow(pa.table({"vec_id": pa.array(ids, pa.int64()), "embedding": vecs}))

    idx = str(tmp_path / "emb_idx")
    dedup.build_embedding_index(ds_of(list(range(50)), corpus), idx)

    near = corpus[7] + rng.standard_normal(dim).astype(np.float32) * 1e-4  # ~identical
    fresh = rng.standard_normal((8, dim)).astype(np.float32)
    batch = np.vstack([corpus[3], near, fresh, fresh[0] * 1.001])
    ids = list(range(100, 100 + len(batch)))
    kept = dedup.ingest_embedding_dedup(ds_of(ids, batch), idx, threshold=0.99).take_all()
    kept_ids = sorted(r["vec_id"] for r in kept)
    assert 100 not in kept_ids  # exact corpus dup
    assert 101 not in kept_ids  # near corpus dup
    assert ids[-1] not in kept_ids  # in-batch scaled copy of fresh[0]
    assert set(kept_ids) == set(ids[2:-1])  # the 8 fresh vectors survive

    again = dedup.ingest_embedding_dedup(ds_of(list(range(600, 650)), corpus), idx)
    assert again.count() == 0
