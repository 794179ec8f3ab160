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
from tripl_spark.session import load_table, local_df

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


def explained_variance_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(component, eigenvalue, explained_ratio) for the top-{PCA_K}
    principal components — the full per-component spectrum. GEMM
    partials → driver eigh on the 64×64 covariance → bounded result.
    Not SQL-expressible per component (no eigendecomposition in
    DuckDB), so the spectrum detail is pinned by invariants in
    tests/test_pca.py (eigenvalues descend, ratios in [0,1] and sum
    ≤ 1, per-component projected variance equals its eigenvalue); the
    registered `sim_pca_explained_variance` hash-gates the
    SQL-checkable projection of the same run instead."""
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
    return local_df(
        spark, rows, "component int, eigenvalue double, explained_ratio double"
    )


@query(
    "sim_pca_explained_variance",
    # Trace conservation is the eigendecomposition's mass-conservation
    # law: Σ all eigenvalues = trace(cov) exactly, and the trace IS
    # SQL-expressible (Σ per-dim variances over all 64 dims). The
    # oracle computes the trace once and emits it for BOTH columns, so
    # a Spark run whose eigh leaks or double-counts variance — or
    # whose covariance disagrees with the data — fails the hash. The
    # 1.0-style constant-by-law column follows the classifier oracle's
    # round(ln(2), 4) precedent.
    oracle=f"""
    SELECT CAST({DIM} AS BIGINT) AS n_components,
           round(t, 5) + 0.0 AS eigen_sum,
           round(t, 5) + 0.0 AS total_variance
    FROM (
      SELECT sum(sxx / n - (sx / n) * (sx / n)) AS t
      FROM (
        SELECT i,
               sum(CAST(embedding[i] AS DOUBLE)
                   * CAST(embedding[i] AS DOUBLE)) AS sxx,
               sum(CAST(embedding[i] AS DOUBLE)) AS sx,
               count(*) AS n
        FROM embeddings, generate_series(1, {DIM}) t1(i)
        GROUP BY i
      )
    )
    """,
)
def sim_pca_explained_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hash-gated projection of the full PCA run: eigendecompose
    the 64×64 corpus covariance (GEMM partials → driver eigh) and emit
    (n_components, Σ all eigenvalues, trace) — equal by the trace
    identity, and the trace replays in SQL as the sum of per-dim
    variances, so the driver hash gates the sufficient statistics AND
    the eigendecomposition's variance conservation on real data. The
    per-component spectrum (not SQL-expressible) stays in
    `explained_variance_spectrum`, invariant-tested in
    tests/test_pca.py."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    cov, _mu, _n = covariance_matrix(covariance_partials(emb))
    w, _v = pca_components(cov, DIM)  # full spectrum
    trace = float(np.trace(cov))
    # Σ eigenvalues == trace is a law (pinned in tests/test_pca.py),
    # but eigh's float sum drifts from the trace by ~1e-12 — enough to
    # round the two gated columns apart on a 5th-decimal half-boundary
    # (the knife-edge class SCALE.md's floor note covers). Assert the
    # law driver-side, then emit the ONE trace for both columns, which
    # is exactly what the oracle does.
    assert abs(float(np.sum(w)) - trace) < 1e-9 * max(1.0, abs(trace))
    return local_df(
        spark,
        [(DIM, round(trace, 5) + 0.0, round(trace, 5) + 0.0)],
        "n_components long, eigen_sum double, total_variance double",
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


def whiten(
    emb: DataFrame, cov, mu, vec_col: str = "v", keep: list[str] | None = None
) -> DataFrame:
    """Corpus whitening as one broadcast d×d affine map in an Arrow
    GEMM pass (map-only, no shuffle): rows of the result have
    covariance ≈ I — pinned on the corpus itself in
    `tests/test_pca.py`. ``keep`` carries id columns through the
    projection (the `doc_features` passthrough idiom) so consumers
    like the whitened-LSH rebuild don't need a re-join."""
    import numpy as np

    wmat = whitening_matrix(cov)
    mu = np.asarray(mu, dtype=float)
    keep = keep or []

    def gemm(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf[vec_col].to_numpy())
            z = (x - mu) @ wmat.T
            out = {k: pdf[k] for k in keep}
            out[vec_col] = list(z)
            yield pd.DataFrame(out)

    # Arrow batch columns match the declared schema POSITIONALLY, so
    # the schema must list the keep columns in the exact order the
    # generator yields them (the caller's `keep` order) — schema-order
    # iteration would silently miswire any keep list spelled in a
    # different order than emb's columns.
    by_name = {f.name: f for f in emb.schema.fields}
    keep_schema = "".join(
        f"{k} {by_name[k].dataType.simpleString()}, " for k in keep
    )
    return emb.select(*keep, vec_col).mapInPandas(
        gemm, schema=f"{keep_schema}{vec_col} array<double>"
    )


def project(emb: DataFrame, components, vec_col: str = "v") -> DataFrame:
    """Corpus projection onto the k components: broadcast d×k matrix
    as literal expressions (`similarity.dot`, the HOF dot product the
    ANN family uses) — map-only, JVM-side, no shuffle. Each component
    column renders as ONE SQL parse (``_sql_lit``'s bit-exact double
    rendering) instead of d ``F.lit`` py4j round trips per column —
    the same fix the k-means codebook literals got."""
    from pyspark.sql import types as T

    from tripl_spark.operators.similarity import dot
    from tripl_spark.session import _sql_lit

    arr_t = T.ArrayType(T.DoubleType())
    cols = [
        dot(
            F.col(vec_col),
            F.expr(_sql_lit([float(x) for x in components[:, c]], arr_t)),
        ).alias(f"pc_{c + 1}")
        for c in range(components.shape[1])
    ]
    return emb.select(*cols)


# ---------------------------------------------------------------------------
# Whitening composed with the ANN family — the calibration step the
# module docstring promises: rebuild the sign-LSH buckets in WHITENED
# space and report recall@k against exact raw-cosine ground truth,
# side by side with the unwhitened index.
# ---------------------------------------------------------------------------


def lsh_recall_rows(
    bucketed: DataFrame, exact: DataFrame, variant: str
) -> DataFrame:
    """(variant, query_id, n_hits, recall_at_k) for one bucketed index:
    same-bucket candidates per panel query, ranked by RAW cosine (the
    bucket assignment changes, the scoring metric the user cares about
    does not), top-k joined against the exact ground truth —
    `sim_recall_at_k_eval`'s compare join parameterized by the index.

    Scale shape: the panel is broadcast; candidates are bucket-pruned
    (~n/2^planes per query); the compare join touches ≤ 2·|panel|·k
    rows. ``bucketed`` must carry (vec_id, v, bucket)."""
    return _lsh_recall_rows_multi(
        bucketed.withColumn("variant", F.lit(variant)), exact, [variant]
    )


def _lsh_recall_rows_multi(
    bucketed: DataFrame, exact: DataFrame, variants: list[str]
) -> DataFrame:
    """`lsh_recall_rows` generalized to a variant-TAGGED union of
    bucketed indexes: one broadcast probe join (panel rows of every
    variant in one build), one top-k window partitioned by
    (variant, query_id), and ONE compare join against the exact ground
    truth — so the exact-kNN subtree (the brute-force pair join) is
    planned and executed once however many indexes are being A/B'd,
    instead of once per union branch. Per-variant rows are identical
    to the single-index form: the probe join adds a variant-equality
    conjunct, and the window partition key gains the variant column,
    so ranking within (variant, query) is unchanged."""
    from pyspark.sql import Window

    from tripl_spark.operators.similarity import TOP_K, cosine

    q = bucketed.filter(F.col("vec_id") < _N_QUERIES()).select(
        F.col("variant").alias("qvar"),
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qb"),
    )
    w = Window.partitionBy("qvar", "query_id").orderBy(F.desc("cosine"), "neighbor_id")
    approx = (
        bucketed.join(
            F.broadcast(q),
            (F.col("variant") == F.col("qvar"))
            & (F.col("bucket") == F.col("qb"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "qvar",
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (F.round(cosine(F.col("qv"), F.col("v")), 4) + F.lit(0.0)).alias("cosine"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select(
            F.col("qvar").alias("avar"),
            F.col("query_id").alias("aq"),
            F.col("neighbor_id").alias("an"),
        )
    )
    from tripl_spark.session import local_df

    vdim = local_df(
        exact.sparkSession, [(v,) for v in variants], "variant string"
    )
    return (
        exact.crossJoin(F.broadcast(vdim))
        .join(
            approx,
            (F.col("variant") == F.col("avar"))
            & (F.col("query_id") == F.col("aq"))
            & (F.col("neighbor_id") == F.col("an")),
            "left",
        )
        .groupBy("variant", "query_id")
        .agg(
            F.count("an").cast("long").alias("n_hits"),
            F.round(F.count("an") * 1.0 / TOP_K, 4).alias("recall_at_k"),
        )
        .select("variant", "query_id", "n_hits", "recall_at_k")
    )


def _N_QUERIES() -> int:
    from tripl_spark.operators.similarity import N_QUERIES

    return N_QUERIES


def whitened_vs_raw_lsh_recall(
    spark: SparkSession, emb: DataFrame, exact: DataFrame
) -> DataFrame:
    """(variant, query_id, n_hits, recall_at_k) for the raw-space and
    whitened-space sign-LSH indexes over the same corpus and ground
    truth. One covariance pass (O(batches·d²) shuffle), one map-only
    whitening pass — the RAW vector rides through it as a kept column,
    so recovering it for candidate scoring costs no re-join — and two
    bucket-pruned probe joins. The whitening matrix and mean are the
    broadcast driver-side d×d / d state — exactly the
    k-means-centroid state class."""
    from tripl_spark.operators.similarity import bucket_key

    cov, mu, _n = covariance_matrix(covariance_partials(emb))
    raw_b = emb.withColumn("bucket", bucket_key("v")).withColumn(
        "variant", F.lit("raw")
    )
    white = whiten(
        emb.withColumn("v_raw", F.col("v")), cov, mu,
        keep=["vec_id", "v_raw"],
    )
    # two steps, no shadowing: bucket from the whitened `v` first, THEN
    # rename the raw vector to the `v` slot lsh_recall_rows scores on —
    # correctness must not ride on select-binding order
    white_b = (
        white.select("vec_id", bucket_key("v").alias("bucket"), "v_raw")
        .withColumnRenamed("v_raw", "v")
        .withColumn("variant", F.lit("whitened"))
    )
    # both indexes ride ONE probe/compare pass as a variant-tagged
    # union: the exact brute-force ground-truth subtree used to be
    # re-planned (and re-executed) under each union branch — one
    # BroadcastNestedLoopJoin + top-k window pair per variant; now it
    # feeds a single compare join (one exact subtree in the plan)
    cols = ["variant", "vec_id", "v", "bucket"]
    return _lsh_recall_rows_multi(
        raw_b.select(*cols).unionByName(white_b.select(*cols)),
        exact,
        ["raw", "whitened"],
    )


@query(
    "sim_whitened_lsh_recall",
    doc="whitening composed with the ANN family: sign-LSH buckets "
    "rebuilt in whitened space vs the raw index, per-query recall@k "
    "against exact ground truth — rows-only (eigendecomposition is "
    "not SQL-expressible); the calibration win (bucket balance: an "
    "off-origin/anisotropic corpus collapses sign-LSH into one "
    "quadratic mega-bucket, whitening restores uniform occupancy) is "
    "pinned on a planted corpus in tests/test_pca.py",
)
def sim_whitened_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does whitening help the LSH index on THIS corpus? Rebuild the
    sign-LSH buckets over whitened vectors (anisotropic corpora waste
    sign bits on the dominant variance direction; whitening spends
    them evenly) and report per-query recall@k for both indexes
    against the same exact raw-cosine top-k — the index-rollout A/B
    this module's calibration story promises. Candidate scoring stays
    raw cosine in both variants: whitening changes WHERE vectors land
    (bucket balance), not the similarity the user asked for."""
    from tripl_spark.operators.similarity import sim_knn_bruteforce

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    exact = sim_knn_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    return whitened_vs_raw_lsh_recall(spark, emb, exact)
