"""Distributed PCA: the two-level moment reduction must agree with a
single-node numpy PCA on the same vectors; components orthonormal;
transform is the exact affine projection."""

from __future__ import annotations

import numpy as np
import pytest

from opensearch_dynamodb_etl_cdk_spark.operators.pca import (
    pca_fit,
    pca_transform,
)


@pytest.fixture(scope="module")
def vecs(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    x = np.asarray(
        [r["embedding"] for r in df.select("embedding").collect()],
        dtype=np.float64,
    )
    return df, x


def test_fit_matches_numpy_reference(vecs):
    df, x = vecs
    model = pca_fit(df, "embedding", k=8)
    assert model["n"] == x.shape[0]
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, bias=True)
    vals = np.sort(np.linalg.eigvalsh(cov))[::-1][:8]
    assert np.allclose(model["mean"], mean, rtol=1e-9, atol=1e-12)
    assert np.allclose(model["explained_variance"], vals,
                       rtol=1e-7, atol=1e-10)
    w = np.asarray(model["components"])
    # orthonormal axes
    assert np.allclose(w @ w.T, np.eye(8), atol=1e-9)
    # each is an eigenvector: cov @ v ≈ λ v
    for j in range(8):
        v = w[j]
        lam = model["explained_variance"][j]
        assert np.allclose(cov @ v, lam * v, atol=1e-7)
    # ratios sum below 1 and descend
    r = model["explained_variance_ratio"]
    assert all(a >= b - 1e-12 for a, b in zip(r, r[1:]))
    assert 0 < sum(r) <= 1 + 1e-9


def test_fit_deterministic_and_partition_invariant(vecs):
    df, _ = vecs
    a = pca_fit(df, "embedding", k=4)
    b = pca_fit(df.repartition(7), "embedding", k=4)
    assert np.allclose(a["components"], b["components"], atol=1e-8)
    assert np.allclose(a["explained_variance"], b["explained_variance"],
                       rtol=1e-9)


def test_transform_projects_exactly(vecs):
    df, x = vecs
    model = pca_fit(df, "embedding", k=8)
    out = pca_transform(df, model, "embedding", "p")
    got = {r["vec_id"]: np.asarray(r["p"])
           for r in out.select("vec_id", "p").collect()}
    mean = np.asarray(model["mean"])
    w = np.asarray(model["components"])
    for r in df.select("vec_id", "embedding").limit(20).collect():
        want = (np.asarray(r["embedding"]) - mean) @ w.T
        assert np.allclose(got[r["vec_id"]], want, atol=1e-10)
    # full-rank projection is a rotation: pairwise distances preserved
    full = pca_fit(df, "embedding", k=x.shape[1])
    rot = pca_transform(df, full, "embedding", "p")
    ids = sorted(got)[:10]
    p = {r["vec_id"]: np.asarray(r["p"])
         for r in rot.select("vec_id", "p").collect()}
    e = {r["vec_id"]: np.asarray(r["embedding"])
         for r in df.select("vec_id", "embedding").collect()}
    for i in ids[:5]:
        for j in ids[5:]:
            assert np.isclose(np.linalg.norm(p[i] - p[j]),
                              np.linalg.norm(e[i] - e[j]), rtol=1e-9)


def test_whiten_unit_variance(vecs):
    df, x = vecs
    model = pca_fit(df, "embedding", k=4)
    out = pca_transform(df, model, "embedding", "p", whiten=True)
    y = np.asarray([r["p"] for r in out.select("p").collect()])
    assert np.allclose(y.var(axis=0), 1.0, rtol=1e-6)


def test_errors(vecs):
    df, _ = vecs
    with pytest.raises(ValueError):
        pca_fit(df, "embedding", k=0)
    with pytest.raises(ValueError):
        pca_fit(df, "embedding", k=65)
    with pytest.raises(ValueError):
        pca_fit(df.limit(0), "embedding", k=2)
