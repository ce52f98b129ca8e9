"""Product quantization: codebook shape, code determinism under
repartitioning, ADC distance vs a direct numpy reference, and
self-retrieval / reconstruction-quality invariants."""

import numpy as np
import pyarrow as pa
import pytest

from mothray.ops import ann

SRC = "/root/testdata/sf0.001/embeddings.parquet"


def _ds(parts=None):
    import ray.data

    ds = ray.data.read_parquet(SRC, columns=["vec_id", "embedding"])
    return ds.repartition(parts) if parts else ds


def test_pq_codebook_shape_and_dim_guard(ray_session):
    import ray.data

    books = ann.train_pq(_ds(), m=8, ksub=16)
    m, k, dsub = books.shape
    assert m == 8 and k == 16
    bad = ray.data.from_arrow(
        pa.table({"vec_id": [1, 2, 3, 4], "embedding": [[1.0, 2.0, 3.0]] * 4})
    )
    with pytest.raises(ValueError, match="not divisible"):
        ann.train_pq(bad, m=2, sample_fraction=1.0)


def test_pq_codes_partition_invariant(ray_session):
    """Encoding is a pure per-row function of (vector, codebooks):
    1-block and 7-block runs must agree code-for-code."""
    books = ann.train_pq(_ds(), m=8, ksub=16)
    a = {r["vec_id"]: r["pq_code"] for r in ann.pq_encode(_ds(), books).take_all()}
    b = {
        r["vec_id"]: r["pq_code"]
        for r in ann.pq_encode(_ds(parts=7), books).take_all()
    }
    assert len(a) == len(b) and all(np.array_equal(a[i], b[i]) for i in a)


def test_pq_adc_matches_numpy_reference(ray_session):
    import pyarrow.parquet as pq

    books = ann.train_pq(_ds(), m=8, ksub=16)
    emb = pq.read_table(SRC, columns=["vec_id", "embedding"])
    ids = emb.column("vec_id").to_numpy(zero_copy_only=False)
    X = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
    q = X[0]
    qn = q / np.linalg.norm(q)
    m, k, dsub = books.shape
    # reference: encode + ADC entirely in numpy
    codes = np.empty((len(Xn), m), dtype=np.int64)
    for j in range(m):
        sub = Xn[:, j * dsub : (j + 1) * dsub]
        d = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = d.argmin(axis=1)
    table = np.stack(
        [((books[j] - qn[j * dsub : (j + 1) * dsub]) ** 2).sum(axis=1) for j in range(m)]
    )
    ref = table[np.arange(m)[None, :], codes].sum(axis=1)
    order = np.lexsort((ids, np.round(ref, 6)))
    want = [(int(ids[i]), round(float(ref[i]), 6)) for i in order[:10]]

    got_tbl = ann.pq_topk(ann.pq_encode(_ds(parts=5), books), books, q, k=10)
    got = [(r["vec_id"], r["adc_dist"]) for r in got_tbl.to_pylist()]
    assert got == want


def test_pq_self_retrieval_and_reconstruction(ray_session):
    """A corpus vector queries for itself: with 8x16 codebooks on 50
    vectors its own id must land in the ADC top-10; and quantized
    reconstruction must beat the single-mean-vector baseline by a wide
    margin (the codebooks actually learned something)."""
    import pyarrow.parquet as pq

    books = ann.train_pq(_ds(), m=8, ksub=16, sample_fraction=1.0)
    emb = pq.read_table(SRC, columns=["vec_id", "embedding"])
    ids = emb.column("vec_id").to_numpy(zero_copy_only=False)
    X = np.array(emb.column("embedding").to_pylist(), dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-30)
    codes_rows = {r["vec_id"]: r["pq_code"] for r in ann.pq_encode(_ds(), books).take_all()}
    top = ann.pq_topk(ann.pq_encode(_ds(), books), books, X[3], k=10).to_pylist()
    assert int(ids[3]) in [r["vec_id"] for r in top]

    m, k, dsub = books.shape
    codes = np.array([codes_rows[int(i)] for i in ids], dtype=np.int64)
    recon = np.concatenate([books[j][codes[:, j]] for j in range(m)], axis=1)
    mse_pq = ((Xn - recon) ** 2).mean()
    mse_mean = ((Xn - Xn.mean(axis=0)) ** 2).mean()
    assert mse_pq < 0.8 * mse_mean  # 16 centroids / 8-dim subspace on near-random data: theory gives ~0.5x


def test_ann_recall_full_probe_is_perfect(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mothray.ops import ann

    rng = np.random.default_rng(101)
    n, d = 2000, 16
    vecs = rng.normal(0, 1, (n, d)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    qs = vecs[:3].astype(np.float64)
    # probing EVERY bucket must reproduce brute force exactly
    out = ann.ann_recall(ds, qs, k=10, n_centroids=8, nprobe=8).to_pylist()
    assert all(r["recall"] == 1.0 for r in out if r["query_idx"] >= 0)
    # partial probe: recall in [0, 1], summary row = mean
    out2 = ann.ann_recall(ds, qs, k=10, n_centroids=8, nprobe=2).to_pylist()
    per = [r["recall"] for r in out2 if r["query_idx"] >= 0]
    mean = [r["recall"] for r in out2 if r["query_idx"] == -1][0]
    assert all(0.0 <= r <= 1.0 for r in per)
    assert abs(mean - sum(per) / len(per)) < 1e-9


def test_fisher_scores_separable_dimension(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from mothray.ops import ann

    rng = np.random.default_rng(111)
    n, d = 3000, 8
    lab = rng.integers(0, 3, n)
    vecs = rng.normal(0, 1, (n, d)).astype(np.float32)
    vecs[:, 2] += lab * 5.0  # dim 2 separates the classes strongly
    t = pa.table(
        {
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(lab, pa.int32()),
        }
    )
    out = ann.fisher_scores(
        ray.data.from_arrow(t).repartition(5), "embedding", "label"
    ).to_pylist()
    assert len(out) == d
    fs = {r["dim"]: r["f_stat"] for r in out}
    assert fs[2] > 100 * max(v for k, v in fs.items() if k != 2)
    # partition invariance
    out2 = ann.fisher_scores(
        ray.data.from_arrow(t).repartition(2), "embedding", "label"
    ).to_pylist()
    assert [r["dim"] for r in out] == [r["dim"] for r in out2]
    for a, b in zip(out, out2):
        assert abs(a["f_stat"] - b["f_stat"]) < 1e-4
