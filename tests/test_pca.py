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


def test_explained_variance_spectrum_and_trace_gate(spark, sf_small, cov_n):
    from tripl_spark.operators.pca import explained_variance_spectrum
    from tripl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    rows = explained_variance_spectrum(spark, sf_small).collect()
    assert len(rows) == PCA_K
    assert [r["component"] for r in rows] == list(range(1, PCA_K + 1))
    # the registered projection: Σ all eigenvalues = trace (the
    # conservation law the driver hash gates)
    gate = REGISTRY["sim_pca_explained_variance"].fn(spark, sf_small).collect()
    assert len(gate) == 1
    cov, _mu, _n = cov_n
    assert gate[0]["eigen_sum"] == gate[0]["total_variance"]
    assert gate[0]["total_variance"] == pytest.approx(np.trace(cov), abs=1e-4)
    # the spectrum's top-k is a prefix of the same mass
    assert sum(r["eigenvalue"] for r in rows) <= gate[0]["eigen_sum"] + 1e-6


def test_whitened_lsh_recall_query_shape(spark, sf_small):
    """The registered whitening→ANN composition: both variants report
    a full panel of per-query recalls in [0, 1]."""
    from tripl_spark.operators.similarity import N_QUERIES
    from tripl_spark.queries.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    rows = REGISTRY["sim_whitened_lsh_recall"].fn(spark, sf_small).collect()
    by_variant: dict = {}
    for r in rows:
        by_variant.setdefault(r["variant"], []).append(r)
        assert 0.0 <= r["recall_at_k"] <= 1.0
    assert set(by_variant) == {"raw", "whitened"}
    assert len(by_variant["raw"]) == len(by_variant["whitened"]) == N_QUERIES


def test_whitening_rebalances_lsh_buckets_on_offset_corpus(spark):
    """The calibration claim that matters at 100 TB, pinned on a
    PLANTED miscalibrated corpus: give the embeddings a large mean
    offset (every real encoder drifts off-origin) plus a stretched
    axis, and ORIGIN-crossing sign planes put essentially the whole
    corpus in ONE bucket — the LSH candidate join degenerates to
    Σ|bucket|² ≈ n² (the quadratic class the occupancy rules exist to
    prevent). Whitening (center + rescale) restores ~uniform bucket
    occupancy, so per-bucket candidate work is bounded again.
    Deterministic seeded corpus; both occupancy profiles measured
    through the same bucket_key the registered queries use."""
    import random

    from tripl_spark.operators.pca import (
        covariance_matrix,
        covariance_partials,
        whiten,
    )
    from tripl_spark.operators.similarity import DIM, N_PLANES, bucket_key

    rng = random.Random(7)
    n = 400
    rows = []
    for i in range(n):
        # off-origin in EVERY dim (the constant term then dominates
        # every plane's dot product) + one stretched axis
        v = [rng.gauss(0.0, 1.0) + 10.0 for _ in range(DIM)]
        v[0] = (v[0] - 10.0) * 30.0 + 10.0
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, v array<double>") \
        .localCheckpoint(eager=True)

    def occupancy(bucketed):
        sizes = [
            r["c"]
            for r in bucketed.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ]
        return max(sizes), sum(s * s for s in sizes)

    raw_max, raw_work = occupancy(emb.withColumn("bucket", bucket_key(F.col("v"))))
    cov, mu, _n = covariance_matrix(covariance_partials(emb))
    white = whiten(emb, cov, mu, keep=["vec_id"])
    wh_max, wh_work = occupancy(white.withColumn("bucket", bucket_key(F.col("v"))))

    # raw: the offset puts (essentially) everything in one bucket —
    # the degenerate quadratic class
    assert raw_max >= 0.9 * n, (raw_max, n)
    # whitened: occupancy back near uniform (n / 2^planes), candidate
    # work collapses by an order of magnitude
    assert wh_max <= 3 * n / (2 ** N_PLANES), (wh_max, n)
    assert wh_work * 5 <= raw_work, (wh_work, raw_work)


def test_whiten_keep_order_is_caller_order(spark):
    """REGRESSION (r11 review): the mapInPandas schema binds Arrow
    columns POSITIONALLY, so a `keep` list spelled in a different
    order than the source schema must still come back with each
    column's own values."""
    from tripl_spark.operators.pca import covariance_matrix, covariance_partials, whiten

    emb = spark.createDataFrame(
        [(1, "a", [1.0, 2.0]), (2, "b", [3.0, 4.0])],
        "vec_id long, tag string, v array<double>",
    )
    cov, mu, _ = covariance_matrix(covariance_partials(emb))
    # keep order deliberately REVERSED vs the schema order
    out = {r["vec_id"]: r["tag"]
           for r in whiten(emb, cov, mu, keep=["tag", "vec_id"]).collect()}
    assert out == {1: "a", 2: "b"}
