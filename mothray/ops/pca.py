"""Distributed PCA over an embedding column.

The standard dimensionality-reduction step before ANN indexing or
clustering at corpus scale (reduce d=768 -> k=64 and every downstream
distance computation gets ~12x cheaper). Shape:

* pca_fit — ONE streaming pass: each batch reduces to a covariance
  partial (n, sum x, sum x xT) of d + d^2 floats; partials combine
  within each block, and only one tiny row per block reaches the
  driver, where the (d x d) Gram matrix assembles and `eigh`
  diagonalizes it. Exact (no sampling), mergeable, and
  partition-invariant: a deterministic sign convention (largest-|.|
  component positive) removes the eigenvector sign ambiguity.
  Suitable for d up to ~1k (d^2 partial rows); beyond that, use a
  randomized range sketch instead (documented limitation).
* pca_transform — broadcast the (k x d) component matrix once via
  ray.put; each batch projects with one matmul. No shuffle anywhere
  in either pass.

No reference analog (orc-go has no linear algebra); engine extension
alongside k-means / ANN (`ops/ann.py`), same broadcast-partials shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .ann import _matrix


def pca_fit(ds, column: str = "embedding", k: int = 8) -> dict:
    """Fit PCA: returns {"mean": (d,), "components": (k, d) rows =
    principal axes, "explained_variance": (k,), "n": int}. Population
    (ddof=0) covariance, eigenvectors of the exact Gram matrix."""

    def partial(batch: pa.Table) -> pa.Table:
        m = _matrix(batch.column(column)).astype(np.float64)
        return pa.table(
            {
                "n": pa.array([m.shape[0]], pa.int64()),
                "s": pa.array([m.sum(axis=0).tobytes()], pa.binary()),
                "ss": pa.array([(m.T @ m).tobytes()], pa.binary()),
            }
        )

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows <= 1:
            return t
        n = int(np.sum(t.column("n").to_numpy(zero_copy_only=False)))
        s = np.sum([np.frombuffer(b.as_py()) for b in t.column("s")], axis=0)
        ss = np.sum([np.frombuffer(b.as_py()) for b in t.column("ss")], axis=0)
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "s": pa.array([s.tobytes()], pa.binary()),
                "ss": pa.array([ss.tobytes()], pa.binary()),
            }
        )

    rows = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(combine, batch_format="pyarrow")  # one row per block reaches the driver
        .take_all()
    )
    if not rows:
        raise ValueError("pca_fit: empty dataset")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.frombuffer(r["s"]) for r in rows], axis=0)
    ss = np.sum([np.frombuffer(r["ss"]) for r in rows], axis=0)
    d = len(s)
    mean = s / n
    cov = ss.reshape(d, d) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    # deterministic sign: the largest-|.| element of each axis positive
    flip = np.sign(comps[np.arange(len(comps)), np.argmax(np.abs(comps), axis=1)])
    comps = comps * flip[:, None]
    return {
        "mean": mean,
        "components": comps,
        "explained_variance": np.maximum(evals[order], 0.0),
        "n": int(n),
    }


def pca_transform(
    ds, model: dict, column: str = "embedding", out: str = "pca", round_digits: int | None = None
):
    """Project `column` onto the fitted axes: adds `out` as a
    list<float64> of len(components) scores per row. The model ships
    once via ray.put and is read per actor/task, never per batch
    re-serialized through the closure."""
    import ray

    ref = ray.put((model["mean"], model["components"]))

    def project(batch: pa.Table) -> pa.Table:
        mean, comps = ray.get(ref)
        m = _matrix(batch.column(column)).astype(np.float64)
        z = (m - mean) @ comps.T
        if round_digits is not None:
            z = np.round(z, round_digits)
        k = comps.shape[0]
        arr = pa.FixedSizeListArray.from_arrays(pa.array(z.ravel()), k)
        return batch.append_column(out, arr.cast(pa.list_(pa.float64())))

    return ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
