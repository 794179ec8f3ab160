"""Embedding covariance + PCA: the summary-statistics path for
whitening, dimensionality reduction, and anisotropy diagnosis of an
embedding corpus (the preprocessing step IVF-PQ/OPQ codebooks and
semantic-dedup thresholds assume).

Scale design — the three-altitude split this repo uses everywhere:

* the **sufficient statistics** (Σx xᵀ, Σx, n) are computed as
  map-side partials: each Arrow batch contributes one d(d+1)/2 + d + 1
  row partial (numpy GEMM per batch — the `semantic_dedup_pairs_arrow`
  discipline), so the shuffle carries O(batches · d²) rows whatever n
  is, and the final reduce is a groupBy over at most d² keys.
* the **eigendecomposition** happens at the driver on the d×d matrix —
  bounded scalar work (64×64 here; even d=4096 is a driver-side
  eigh), the same bounded-collect class as k-means centroids.
* the **projection** back over the corpus is a broadcast d×k matrix
  in a codegen'd expression — map-only, no shuffle.

`sim_covariance_slice` hash-gates the statistics against DuckDB on a
16-dim slice (136 upper-triangle entries — expression aggregates, one
map-side-combined pass); `covariance_gemm_arrow` is the full-dim
production twin, pinned equal to the expression path in
`tests/test_pca.py`; `sim_pca_explained_variance` runs the whole
pipeline (rows-only driver check + invariant tests: eigenvalues
descend, ratios in [0,1], per-component projected variance equals its
eigenvalue — the definition of PCA, checked on the corpus itself)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tripl_spark.queries.registry import query
from tripl_spark.session import load_table

DIM = 64
COV_SLICE = 16  # oracled expression-path slice (136 triangle entries)
PCA_K = 8

_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("i", T.IntegerType()),
        T.StructField("j", T.IntegerType()),
        T.StructField("s", T.DoubleType()),
    ]
)


@query(
    "sim_covariance_slice",
    oracle=f"""
    SELECT i, j,
           round(sum(CAST(embedding[i] AS DOUBLE) * CAST(embedding[j] AS DOUBLE))
                   / count(*)
                 - (sum(CAST(embedding[i] AS DOUBLE)) / count(*))
                   * (sum(CAST(embedding[j] AS DOUBLE)) / count(*)), 5) + 0.0 AS cov
    FROM embeddings, generate_series(1, {COV_SLICE}) t1(i),
         generate_series(1, {COV_SLICE}) t2(j)
    WHERE i <= j
    GROUP BY i, j
    """,
)
def sim_covariance_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centered covariance of the first {COV_SLICE} embedding dims,
    upper triangle, as (i, j, cov) rows — the hash gate for the
    sufficient-statistics arithmetic. One aggregation pass: 136
    product sums + 16 sums + a count as map-side-combined expression
    aggregates (shuffle = one partial row per task), then the 1-row
    result explodes to triangle rows inside the same plan. The oracle
    replays the identical E[xy] − E[x]E[y] formula per cell."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    aggs += [F.sum(F.col("v")[i]).alias(f"s_{i}") for i in range(COV_SLICE)]
    aggs += [
        F.sum(F.col("v")[i] * F.col("v")[j]).alias(f"p_{i}_{j}")
        for i in range(COV_SLICE)
        for j in range(i, COV_SLICE)
    ]
    one = emb.agg(*aggs)
    cells = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("i"),
                F.lit(j + 1).alias("j"),
                (
                    F.round(
                        F.col(f"p_{i}_{j}") / F.col("n")
                        - (F.col(f"s_{i}") / F.col("n"))
                        * (F.col(f"s_{j}") / F.col("n")),
                        5,
                    )
                    # `+ 0.0` on BOTH sides: a tiny negative rounds to
                    # -0.0 in DuckDB but +0.0 under Spark's round();
                    # adding positive zero normalizes -0.0 → +0.0 in
                    # IEEE 754, making the byte hashes agree.
                    + F.lit(0.0)
                ).alias("cov"),
            )
            for i in range(COV_SLICE)
            for j in range(i, COV_SLICE)
        ]
    )
    return one.select(F.explode(cells).alias("c")).select("c.i", "c.j", "c.cov")


def covariance_partials(emb: DataFrame, vec_col: str = "v") -> DataFrame:
    """Full-dim sufficient statistics via per-Arrow-batch numpy GEMM:
    rows (i, j, Σ x_i·x_j) for the upper triangle, (i, -1, Σ x_i) for
    the sums, (-1, -1, n) for the count — one partial set per batch,
    reduced by a groupBy over ≤ d² keys. The shuffle is O(batches·d²)
    regardless of corpus size."""

    def gemm(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf[vec_col].to_numpy())
            d = x.shape[1]
            xtx = x.T @ x
            iu, ju = np.triu_indices(d)
            rows = {
                "i": np.concatenate([iu, np.arange(d), [-1]]),
                "j": np.concatenate([ju, np.full(d, -1), [-1]]),
                "s": np.concatenate(
                    [xtx[iu, ju], x.sum(axis=0), [float(len(x))]]
                ),
            }
            yield pd.DataFrame(rows)

    return (
        emb.select(vec_col)
        .mapInPandas(gemm, schema=_PARTIAL_SCHEMA)
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
    )


def covariance_matrix(partials: DataFrame):
    """Collect the bounded (≤ d²+d+1 row) reduced partials and
    assemble the centered covariance matrix. Returns (cov d×d, mu d,
    n) — mu rides along because whitening needs the same centering."""
    import numpy as np

    rows = partials.collect()
    n = next(r["s"] for r in rows if r["i"] == -1 and r["j"] == -1)
    d = max(r["i"] for r in rows) + 1
    s = np.zeros(d)
    sxx = np.zeros((d, d))
    for r in rows:
        if r["j"] == -1 and r["i"] >= 0:
            s[r["i"]] = r["s"]
        elif r["i"] >= 0:
            sxx[r["i"], r["j"]] = r["s"]
            sxx[r["j"], r["i"]] = r["s"]
    mu = s / n
    return sxx / n - np.outer(mu, mu), mu, n


def pca_components(cov, k: int = PCA_K):
    """Top-k eigenpairs of the covariance (driver-side d×d eigh),
    sign-normalized so each component's largest-|entry| coordinate is
    positive (deterministic across LAPACK builds)."""
    import numpy as np

    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    w, v = w[order], v[:, order]
    for c in range(v.shape[1]):
        if v[np.argmax(np.abs(v[:, c])), c] < 0:
            v[:, c] = -v[:, c]
    return w, v


@query("sim_pca_explained_variance")
def sim_pca_explained_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PCA_K} principal components of the embedding corpus:
    (component, eigenvalue, explained_ratio). GEMM partials → driver
    eigh on the 64×64 covariance → bounded result. Rows-only for the
    driver (no SQL eigendecomposition); the suite pins the invariants
    instead — eigenvalues descend, ratios lie in [0,1] and sum ≤ 1,
    the covariance feeding it equals the oracled expression slice,
    and the variance of the corpus projected on component c equals
    eigenvalue c (PCA's defining property, tested on the data)."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    cov, _mu, _n = covariance_matrix(covariance_partials(emb))
    w, _v = pca_components(cov, PCA_K)
    total = float(np.trace(cov))
    rows = [
        (c + 1, float(w[c]), round(float(w[c]) / total, 6))
        for c in range(len(w))
    ]
    return spark.createDataFrame(
        rows, "component int, eigenvalue double, explained_ratio double"
    )


def whitening_matrix(cov, eps: float = 1e-8):
    """PCA whitening map W = Λ^(-1/2) Vᵀ (d×d, driver-side): applied
    to centered vectors it makes the corpus covariance the identity —
    the calibration step that puts cosine/L2 thresholds (semantic
    dedup, ANN radius) on a scale that means the same thing in every
    direction of an anisotropic embedding space. Eigenvalues below
    ``eps`` are clamped (directions with no variance carry no
    information to rescale). Returns (W, mu-placeholder-free) — center
    with the corpus mean before applying."""
    import numpy as np

    w, v = np.linalg.eigh(cov)
    w = np.maximum(w, eps)
    return (v / np.sqrt(w)).T


def whiten(emb: DataFrame, cov, mu, vec_col: str = "v") -> DataFrame:
    """Corpus whitening as one broadcast d×d affine map in an Arrow
    GEMM pass (map-only, no shuffle): rows of the result have
    covariance ≈ I — pinned on the corpus itself in
    `tests/test_pca.py`."""
    import numpy as np

    wmat = whitening_matrix(cov)
    mu = np.asarray(mu, dtype=float)

    def gemm(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf[vec_col].to_numpy())
            z = (x - mu) @ wmat.T
            yield pd.DataFrame({vec_col: list(z)})

    return emb.select(vec_col).mapInPandas(
        gemm, schema=f"{vec_col} array<double>"
    )


def project(emb: DataFrame, components, vec_col: str = "v") -> DataFrame:
    """Corpus projection onto the k components: broadcast d×k matrix
    as literal expressions (`similarity.dot`, the HOF dot product the
    ANN family uses) — map-only, JVM-side, no shuffle."""
    from tripl_spark.operators.similarity import dot

    cols = [
        dot(
            F.col(vec_col),
            F.array(*[F.lit(float(x)) for x in components[:, c]]),
        ).alias(f"pc_{c + 1}")
        for c in range(components.shape[1])
    ]
    return emb.select(*cols)
