"""Covariance + PCA: GEMM partials ≡ expression path, and the
eigen-invariants hold on the real corpus (`operators/pca.py`)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tripl_spark.operators.pca import (
    COV_SLICE,
    PCA_K,
    covariance_matrix,
    covariance_partials,
    pca_components,
    project,
)
from tripl_spark.session import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_small):
    return (
        load_table(spark, sf_small, "embeddings")
        .select(F.col("embedding").cast("array<double>").alias("v"))
        .localCheckpoint(eager=True)
    )


@pytest.fixture(scope="module")
def cov_n(spark, emb):
    return covariance_matrix(covariance_partials(emb))


def test_gemm_covariance_matches_expression_slice(spark, sf_small, cov_n):
    from tripl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    cov, _mu, _n = cov_n
    slice_rows = REGISTRY["sim_covariance_slice"].fn(spark, sf_small).collect()
    assert len(slice_rows) == COV_SLICE * (COV_SLICE + 1) // 2
    for r in slice_rows:
        assert cov[r["i"] - 1, r["j"] - 1] == pytest.approx(r["cov"], abs=2e-5)


def test_gemm_covariance_matches_numpy(emb, cov_n):
    cov, mu, n = cov_n
    x = np.stack([r["v"] for r in emb.collect()])
    want = np.cov(x, rowvar=False, bias=True)
    assert n == len(x)
    assert np.allclose(cov, want, atol=1e-9)
    assert np.allclose(mu, x.mean(axis=0), atol=1e-12)


def test_partials_are_split_invariant(spark, emb, cov_n):
    cov, _mu, _n = cov_n
    cov2, _mu2, _n2 = covariance_matrix(covariance_partials(emb.repartition(7)))
    assert np.allclose(cov, cov2, atol=1e-9)


def test_eigen_invariants_and_projection_variance(spark, emb, cov_n):
    cov, _mu, _n = cov_n
    w, v = pca_components(cov, PCA_K)
    assert all(w[i] >= w[i + 1] - 1e-12 for i in range(len(w) - 1))
    assert (w >= -1e-9).all()
    ratios = w / np.trace(cov)
    assert ((ratios >= 0) & (ratios <= 1)).all() and ratios.sum() <= 1 + 1e-9
    # orthonormal components
    assert np.allclose(v.T @ v, np.eye(PCA_K), atol=1e-9)
    # PCA's defining property, on the corpus itself: the variance of
    # the projection onto component c IS eigenvalue c
    proj = project(emb, v)
    var_exprs = [
        (F.avg(F.col(f"pc_{c + 1}") * F.col(f"pc_{c + 1}"))
         - F.avg(f"pc_{c + 1}") * F.avg(f"pc_{c + 1}")).alias(f"var_{c + 1}")
        for c in range(PCA_K)
    ]
    got = proj.agg(*var_exprs).collect()[0]
    for c in range(PCA_K):
        assert got[f"var_{c + 1}"] == pytest.approx(float(w[c]), rel=1e-6)


def test_whitened_corpus_has_identity_covariance(spark, emb, cov_n):
    from tripl_spark.operators.pca import whiten

    cov, mu, _n = cov_n
    white = whiten(emb, cov, mu).localCheckpoint(eager=True)
    wcov, wmu, _ = covariance_matrix(covariance_partials(white))
    assert np.allclose(wmu, 0.0, atol=1e-9)
    assert np.allclose(wcov, np.eye(len(wcov)), atol=1e-6)


def test_explained_variance_query_runs(spark, sf_small):
    from tripl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    df = REGISTRY["sim_pca_explained_variance"].fn(spark, sf_small)
    rows = df.collect()
    assert len(rows) == PCA_K
    assert [r["component"] for r in rows] == list(range(1, PCA_K + 1))
