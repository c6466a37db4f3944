"""Distributed PCA over embedding columns (whitening / compression).

A training-data pipeline reduces or whitens embedding spaces before
clustering, dedup or ANN indexing. PCA at corpus scale is a textbook
two-level reduction, and that is exactly how this implements it:

1. **Per-partition moments** (the only pass over the data): an
   Arrow-batched ``mapInPandas`` computes each batch's count, feature
   sum and X·Xᵀ scatter with BLAS (``x.T @ x`` — d×d per batch, d=64 →
   32 KB), emitting ONE tiny row per batch. 100 TB of vectors reduce
   to #partitions rows of d²+d+1 doubles.
2. **Driver combine + eigh**: the moment rows sum on the driver
   (bounded by partition count), the d×d covariance factors with
   ``numpy.linalg.eigh`` — d is model-sized (64–4096), never
   corpus-sized, so the eigendecomposition is deliberately NOT
   distributed (the public ML stacks make the same call).
3. **Broadcast projection**: transform is one matmul per Arrow batch
   against the k×d component matrix shipped in the task closure.

Eigenvector sign is fixed deterministically (largest-magnitude
component positive) so fits are reproducible run to run.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["pca_fit", "pca_transform"]


def pca_fit(df: DataFrame, vec_col: str = "embedding", k: int = 8) -> dict:
    """Fit PCA: returns ``{"mean", "components" (k×d, rows =
    orthonormal principal axes, descending variance),
    "explained_variance", "explained_variance_ratio", "n"}``."""
    moment_schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("s", T.ArrayType(T.DoubleType())),
        T.StructField("ss", T.ArrayType(T.DoubleType())),
    ])

    def batch_moments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            yield pd.DataFrame({
                "n": [x.shape[0]],
                "s": [x.sum(axis=0).tolist()],
                "ss": [(x.T @ x).ravel().tolist()],
            })

    # bounded: one moment row per Arrow batch (~|partitions|), each
    # carrying only (n, d-vector sum, d*d Gram) — model-sized
    rows = df.select(vec_col).mapInPandas(
        batch_moments, schema=moment_schema
    ).collect()
    if not rows:
        raise ValueError("pca_fit: empty input")
    n = sum(r["n"] for r in rows)
    d = len(rows[0]["s"])
    s = np.zeros(d)
    ss = np.zeros((d, d))
    for r in rows:
        s += np.asarray(r["s"])
        ss += np.asarray(r["ss"]).reshape(d, d)
    if not (1 <= k <= d):
        raise ValueError(f"k must be in [1, {d}], got {k}")
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    vals, vecs = vals[order], vecs[:, order]
    # deterministic sign: each axis's largest-|.| coordinate positive
    for j in range(vecs.shape[1]):
        i = int(np.argmax(np.abs(vecs[:, j])))
        if vecs[i, j] < 0:
            vecs[:, j] = -vecs[:, j]
    total_var = float(np.trace(cov))
    return {
        "mean": mean.tolist(),
        "components": vecs.T.tolist(),
        "explained_variance": vals.tolist(),
        "explained_variance_ratio": (
            (vals / total_var).tolist() if total_var > 0 else [0.0] * k
        ),
        "n": int(n),
    }


def pca_transform(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
) -> DataFrame:
    """Project vectors onto the fitted axes: ``(x − mean) @ Wᵀ`` per
    Arrow batch (one BLAS matmul); ``whiten`` divides each component by
    its standard deviation (unit-variance output)."""
    mean = np.asarray(model["mean"])
    w = np.asarray(model["components"])  # k×d
    scale = None
    if whiten:
        ev = np.asarray(model["explained_variance"])
        scale = np.sqrt(np.maximum(ev, 1e-12))

    out_fields = df.schema.fields + [
        T.StructField(out_col, T.ArrayType(T.DoubleType()))
    ]
    in_cols = [f.name for f in df.schema.fields]

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            if len(pdf):
                y = (x - mean) @ w.T
                if scale is not None:
                    y = y / scale
                vals = [row.tolist() for row in y]
            else:
                vals = []
            pdf = pdf[in_cols].copy()
            pdf[out_col] = vals
            yield pdf

    return df.mapInPandas(project, schema=T.StructType(out_fields))
